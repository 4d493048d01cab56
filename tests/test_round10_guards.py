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


def test_decision_log_counting_schema_raises(spark, tmp_path):
    """A decision log written by the counting-probe era
    (n_near_candidates) must be rejected too: mixing it with
    decision-only batches (near_dup) makes parquet schema resolution
    silently null one column for every reader."""
    from welearn_datastack_spark.streaming.state_machine import (
        _check_decision_log_layout,
    )

    out = tmp_path / "out"
    legacy = spark.createDataFrame(
        [(1, None, 2, "near_dup")],
        "doc_id long, exact_dup_of long, n_near_candidates long, state string",
    )
    legacy.coalesce(1).write.parquet(str(out / "batch_id=0"))
    with pytest.raises(RuntimeError, match="counting-probe schema"):
        _check_decision_log_layout(str(out))
    # the current decision schema passes
    import shutil

    shutil.rmtree(out)
    current = spark.createDataFrame(
        [(1, None, True, "near_dup")],
        "doc_id long, exact_dup_of long, near_dup boolean, state string",
    )
    current.coalesce(1).write.parquet(str(out / "batch_id=0"))
    _check_decision_log_layout(str(out))


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


def test_size_lsh_params_solves_the_s_curve():
    """The sizing helper inverts s50 = (1/b)^(1/r): known anchors map
    back exactly, the realized s50 lands near any target, more
    permissive targets never cost more hashes than stricter ones, and
    impossible targets fail loudly."""
    from welearn_datastack_spark.pipeline.ingest_increment import (
        LshParams,
        size_lsh_params,
    )

    # the production default is the 0.5 anchor: 4 bands x 2 rows
    assert size_lsh_params(0.5) == LshParams(3, 8, 2)
    # the documented second parameterization: 8 bands x 2 rows
    p = size_lsh_params(0.35)
    assert (p.n_hashes, p.rows_per_band) == (16, 2)
    assert abs(p.s50 - 0.35) < 0.01
    # realized s50 tracks the target across the range
    for t in (0.2, 0.3, 0.4, 0.6, 0.7, 0.8):
        got = size_lsh_params(t, max_hashes=256)
        assert abs(got.s50 - t) < 0.05, (t, got)
    # lower threshold (more recall) needs at least as many hashes
    assert size_lsh_params(0.3, max_hashes=256).n_hashes >= size_lsh_params(
        0.6, max_hashes=256
    ).n_hashes
    import pytest as _pytest

    with _pytest.raises(ValueError):
        size_lsh_params(0.05, max_hashes=8)  # unreachable in budget
    with _pytest.raises(ValueError):
        size_lsh_params(1.5)


def test_wide_banding_raises_mid_similarity_recall(spark):
    """The sizing helper's promise, validated empirically: moving
    from the default (b=4, r=2; s50~0.5) to the 0.35-target sizing
    (b=8, r=2; s50~0.354) must catch MORE mid-similarity pairs.
    Structurally, band k is built from seeds (rk .. rk+r-1), so the
    wide banding's first 4 bands ARE the default's bands — its
    candidate set is a superset by construction; the extra 4 bands
    buy the extra recall. Synthetic pairs near Jaccard ~0.35 (where
    the default's s-curve gives ~0.4 hit rate and the wide one ~0.65)
    make the gap deterministic and visible."""
    from welearn_datastack_spark.operators.dedup import (
        lsh_band_keys,
        lsh_candidates,
        minhash_signatures,
        word_shingles,
    )

    rows = []
    for i in range(60):
        base = [f"w{i}_{j}" for j in range(30)]
        # partner shares a prefix: trigram-shingle Jaccard lands in
        # the 0.3-0.45 band (shared shingles / union)
        partner = base[:16] + [f"x{i}_{j}" for j in range(14)]
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(partner)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = word_shingles(docs, "doc_id", "text", n=3)
    true_pairs = {(2 * i, 2 * i + 1) for i in range(60)}

    def caught(n_hashes: int) -> set:
        sigs = minhash_signatures(sh, "doc_id", n_hashes=n_hashes)
        cand = lsh_candidates(
            lsh_band_keys(sigs, "doc_id", rows_per_band=2), "doc_id"
        )
        got = {(r["a_id"], r["b_id"]) for r in cand.collect()}
        return got & true_pairs

    default_caught = caught(8)
    wide_caught = caught(16)
    # superset by construction (shared leading bands) ...
    assert default_caught <= wide_caught
    # ... and the extra bands genuinely move mid-band recall
    assert len(wide_caught) > len(default_caught), (
        len(default_caught), len(wide_caught),
    )
    print(
        f"mid-band recall: default {len(default_caught)}/60, "
        f"wide {len(wide_caught)}/60"
    )


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
