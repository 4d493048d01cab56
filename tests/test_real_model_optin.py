"""OPT-IN real-model integration for the M1/M2 executor cache path.

Every in-repo run of embed_slices / bi_classify uses deterministic
stubs behind the real interface (functions/udfs.py) — faithful to
SURVEY §7's port strategy, and the only option in this sandbox (no
model artifacts, no HF downloads). What the stubs cannot prove is the
EXECUTOR CACHE CONTRACT with a real artifact: that a heavyweight model
loads once per python worker (get_cached_model), not once per task,
and that the real forward pass honors the shape/normalization contract
the downstream operators assume (unit-norm float32 array<float>;
boolean verdicts).

These tests close that gap when artifacts are available:

    export WELEARN_REAL_MODEL_DIR=/path/to/models
    #   $WELEARN_REAL_MODEL_DIR/embedder/          a sentence-transformers
    #                                              (or HF) model directory
    #   $WELEARN_REAL_MODEL_DIR/bi_classifier.joblib   sklearn binary model
    pytest tests/test_real_model_optin.py -v

Unset (the normal case, and CI here), every test skips — the suite's
green is unchanged.
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pytest
from pyspark.sql import functions as F

REAL_MODEL_DIR = os.environ.get("WELEARN_REAL_MODEL_DIR")

pytestmark = pytest.mark.skipif(
    not REAL_MODEL_DIR,
    reason="WELEARN_REAL_MODEL_DIR not set — real-model integration is opt-in",
)


def _embedder_path() -> str:
    return os.path.join(REAL_MODEL_DIR or "", "embedder")


def _bi_path() -> str:
    return os.path.join(REAL_MODEL_DIR or "", "bi_classifier.joblib")


def _load_marker_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("model_loads")
    return str(d)


def _tracking_embed_loader(marker_dir: str):
    """Loader for the REAL embedder that also drops a uuid marker per
    invocation — the per-worker load count is then observable from the
    driver as the marker-file count."""

    def loader():
        from sentence_transformers import SentenceTransformer

        with open(os.path.join(marker_dir, uuid.uuid4().hex), "w"):
            pass
        model = SentenceTransformer(_embedder_path())

        def embed(texts: list[str]) -> np.ndarray:
            return np.asarray(
                model.encode(list(texts), normalize_embeddings=True),
                dtype=np.float32,
            )

        return embed

    return loader


@pytest.mark.skipif(
    not (REAL_MODEL_DIR and os.path.isdir(_embedder_path())),
    reason="no embedder/ model directory under WELEARN_REAL_MODEL_DIR",
)
def test_real_embedder_shape_norm_and_one_load_per_worker(
    spark, tmp_path_factory
):
    pytest.importorskip("sentence_transformers")
    from welearn_datastack_spark.functions.udfs import embed_slices

    marker_dir = _load_marker_dir(tmp_path_factory)
    n_parts = 16
    docs = (
        spark.range(200)
        .select(
            F.col("id").alias("slice_id"),
            F.concat(F.lit("document body number "), F.col("id")).alias("body"),
        )
        .repartition(n_parts)
    )
    out = embed_slices(
        docs,
        model_name=f"real-embed-{uuid.uuid4().hex[:8]}",
        model_loader=_tracking_embed_loader(marker_dir),
    ).collect()

    # contract: one embedding per row, constant dim, unit L2 norm,
    # float32 payload (the reference pipeline's CLS-pool + normalize)
    assert len(out) == 200
    dims = {len(r["embedding"]) for r in out}
    assert len(dims) == 1 and dims.pop() > 0
    for r in out[:20]:
        v = np.asarray(r["embedding"], dtype=np.float32)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3
    # cache contract: loads happen once per python WORKER, never per
    # task — with 16 partitions an uncached loader would fire 16 times
    n_loads = len(glob.glob(os.path.join(marker_dir, "*")))
    assert 1 <= n_loads < n_parts, (
        f"{n_loads} model loads for {n_parts} tasks — "
        "executor cache is not deduplicating loads"
    )


@pytest.mark.skipif(
    not (REAL_MODEL_DIR and os.path.isfile(_bi_path())),
    reason="no bi_classifier.joblib under WELEARN_REAL_MODEL_DIR",
)
def test_real_bi_classifier_through_cache(spark):
    pytest.importorskip("joblib")
    from welearn_datastack_spark.functions.udfs import bi_classify

    def loader():
        import joblib

        model = joblib.load(_bi_path())

        def predict(mat: np.ndarray) -> np.ndarray:
            return np.asarray(model.predict(mat)).astype(bool)

        return predict

    # feed unit-norm vectors shaped like the embed stage's output
    rng_free = (
        spark.range(64)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 16), i -> "
                "cast(sin(id * i) as float))"
            ).alias("embedding"),
        )
    )
    out = bi_classify(
        rng_free,
        model_name=f"real-bi-{uuid.uuid4().hex[:8]}",
        model_loader=loader,
    ).collect()
    assert len(out) == 64
    assert {type(r["is_sdg"]) for r in out} == {bool}
