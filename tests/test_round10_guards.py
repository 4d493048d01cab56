"""Round-10 hardening guards: the bounded-window guard on
make_transitions, the decision-log layout migration check, and the
bucketed state store's self-describing LSH parameterization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from welearn_datastack_spark.pipeline.state import make_transitions


def test_make_transitions_orders_small_batch(spark):
    ids = spark.createDataFrame([(7,), (3,), (5,)], ["document_id"])
    out = make_transitions(ids, "document_id", "url_retrieved", base_order=100)
    rows = {r["document_id"]: r["operation_order"] for r in out.collect()}
    # deterministic rank on the id, offset by base_order
    assert rows == {3: 101, 5: 102, 7: 103}


def test_make_transitions_guard_trips_on_unbounded_frame(spark):
    """Feeding an over-ceiling frame into the single-task global
    window must fail loudly (the 100 TB silent-serialization guard),
    not quietly produce a one-core plan."""
    from welearn_datastack_spark.operators.state_log import BOUNDED_INPUT_MAX_ROWS

    big = spark.range(BOUNDED_INPUT_MAX_ROWS + 1).select(
        F.col("id").alias("document_id")
    )
    out = make_transitions(big, "document_id", "url_retrieved", base_order=0)
    with pytest.raises(Exception, match="bounded_input"):
        out.agg(F.max("operation_order")).collect()


def test_decision_log_legacy_flat_layout_raises(tmp_path):
    """A pre-batch_id flat decision log must be rejected before the
    first micro-batch — mixing flat part-files with batch_id=N
    subdirectories breaks partition discovery for every reader."""
    from welearn_datastack_spark.streaming.state_machine import (
        _check_decision_log_layout,
    )

    out = tmp_path / "out"
    out.mkdir()
    (out / "part-00000-legacy.snappy.parquet").write_bytes(b"PAR1")
    with pytest.raises(RuntimeError, match="legacy flat"):
        _check_decision_log_layout(str(out))
    # the partitioned layout (and an empty dir) pass
    (out / "part-00000-legacy.snappy.parquet").unlink()
    (out / "batch_id=0").mkdir()
    _check_decision_log_layout(str(out))
    _check_decision_log_layout(str(tmp_path / "missing"))


def test_bucketed_store_params_roundtrip_and_conflict(spark, sf_dir):
    """The bucketed store is self-describing: build persists the LSH
    params as a band-store TBLPROPERTY, probe reads them back, and a
    conflicting explicit parameterization raises instead of silently
    probing with mismatched bands (which finds zero candidates)."""
    from welearn_datastack_spark.pipeline.ingest_increment import (
        LshParams,
        build_state_bucketed,
        load_table_params,
        probe_batch_bucketed,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    params = LshParams(shingle_n=2, n_hashes=12, rows_per_band=3)
    prefix = "params_roundtrip_test"
    build_state_bucketed(docs.filter(F.col("doc_id") % 5 != 0), prefix, params=params)
    try:
        assert load_table_params(spark, prefix) == params
        batch = docs.filter(F.col("doc_id") % 5 == 0)
        # no explicit params: the persisted ones govern
        dec = probe_batch_bucketed(spark, batch, prefix)
        assert dec.count() == batch.count()
        # matching explicit params are fine
        probe_batch_bucketed(spark, batch, prefix, params=params)
        with pytest.raises(ValueError, match="LSH params mismatch"):
            probe_batch_bucketed(spark, batch, prefix, params=LshParams())
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_doc_hashes")
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_band_store")


def test_decision_probe_matches_counting_probe(spark, sf_dir, tmp_path):
    """The decision-only probe (production default: left_semi band
    existence) and the counting diagnostic must yield IDENTICAL
    (doc_id, exact_dup_of, state) decisions — only the near leg's
    evidence differs (near_dup boolean vs partner multiplicity). The
    decision plan must actually BE a semi join: no candidate-pair
    aggregation may survive in it."""
    from welearn_datastack_spark.pipeline.ingest_increment import (
        build_state,
        probe_batch,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    state = str(tmp_path / "state")
    build_state(docs.filter(F.col("doc_id") % 5 != 0), state)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    decision = probe_batch(spark, batch, state)
    counting = probe_batch(spark, batch, state, count_candidates=True)

    plan = decision._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:1500]

    key = lambda r: (r["doc_id"], r["exact_dup_of"], r["state"])
    d = sorted(key(r) for r in decision.collect())
    c = sorted(key(r) for r in counting.collect())
    assert d == c
    # and the boolean agrees with the count
    nd = {r["doc_id"]: r["near_dup"] for r in decision.collect()}
    for r in counting.collect():
        assert nd[r["doc_id"]] == (r["n_near_candidates"] > 0), r


def test_fold_state_bucketed_carries_params(spark, sf_dir, tmp_path):
    """fold_state_bucketed moves the path store's lsh_params.json
    sidecar into the folded tables' TBLPROPERTY, so a later
    probe_batch_bucketed can never default-mismatch a non-default
    store (the exact failure the sidecar exists to prevent)."""
    from welearn_datastack_spark.pipeline.ingest_increment import (
        LshParams,
        build_state,
        fold_state_bucketed,
        load_table_params,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    params = LshParams(shingle_n=3, n_hashes=16, rows_per_band=4)
    state = str(tmp_path / "state")
    build_state(docs, state, params=params)
    prefix = "params_fold_test"
    fold_state_bucketed(spark, state, prefix)
    try:
        assert load_table_params(spark, prefix) == params
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_doc_hashes")
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_band_store")
