"""BLAS (numpy-matmul) ANN variant vs the JVM aggregate kernel.

The two paths must produce the same top-k sets and scores up to float
summation order (numpy pairwise vs JVM sequential fold) — a tolerance
equivalence, not an exact hash: a cosine exactly on the 6-digit
rounding boundary may round differently between the two.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from welearn_datastack_spark.session import get_spark

    return get_spark("test-blas")


def test_blas_topk_matches_jvm_kernel(spark):
    from welearn_datastack_spark.plans.q_ml import _split
    from welearn_datastack_spark.operators.similarity import blas_topk, brute_force_topk

    queries, corpus = _split(spark, SF_DIR)
    corpus = corpus.select("c_id", "embedding")
    jvm = {
        (r["q_id"], r["c_id"]): r["cosine"]
        for r in brute_force_topk(queries, corpus, k=5).collect()
    }
    blas = {
        (r["q_id"], r["c_id"]): r["cosine"]
        for r in blas_topk(queries, corpus, k=5).collect()
    }
    assert len(jvm) == len(blas)
    # same pairs selected (ties broken identically by c_id) ...
    assert set(jvm) == set(blas)
    # ... and scores equal to within the rounding tolerance
    for key, v in jvm.items():
        assert blas[key] == pytest.approx(v, abs=2e-6), key


def test_blas_topk_per_query_counts(spark):
    from welearn_datastack_spark.plans.q_ml import _split
    from welearn_datastack_spark.operators.similarity import blas_topk

    queries, corpus = _split(spark, SF_DIR)
    out = blas_topk(queries, corpus.select("c_id", "embedding"), k=5).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r["rnk"])
    assert len(by_q) == queries.count()
    for q, rnks in by_q.items():
        assert sorted(rnks) == [1, 2, 3, 4, 5], q
