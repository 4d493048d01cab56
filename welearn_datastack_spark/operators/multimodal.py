"""Multimodal columns — image/audio/video as opaque ``binary``
columns with typed metadata (LLM-data-pipeline extension; the
reference's closest analog is the embedding LargeBinary codec,
embedding_model_helpers.py:111–121 ↔ sdgs_classifiers.py:39–41).

Design: media bytes ride in a BinaryType column; a typed metadata
struct (mime, n_bytes, checksum) travels beside it; decode /
feature-extract / resize / frame-sample are mapInPandas stages whose
Spark-side plumbing (schema, Arrow batch shape, partitioning) is real
while the codec itself is STUBBED — the image/audio libs aren't in
this container, so ``decode_fn=None`` uses a deterministic fake and a
real decoder (PIL/ffmpeg) drops in without touching the plan.

Scale notes: binary payloads make rows wide — keep
``spark.sql.files.maxPartitionBytes`` small for such tables, never
collect them, and push metadata-only predicates (mime, n_bytes)
BEFORE any decode stage so the binary column is pruned from scans
that don't need it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def attach_media(df: DataFrame, payload_col: str, mime: str) -> DataFrame:
    """Wrap a binary payload column with the typed metadata struct.
    (In tests the payload is synthesized from text via encode().)"""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("checksum"),
        ),
    )


DECODED_FIELDS = [
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
]


def stub_decoder(pdf_bytes: pd.Series) -> pd.DataFrame:
    """STUB decode: deterministic pseudo-dimensions derived from the
    payload hash — real decoders (PIL.Image.open, av.open) replace
    this function only; schema and batch shape stay identical."""

    def dims(b: bytes) -> tuple[int, int, int]:
        if b is None:
            return (None, None, None)
        h = int(hashlib.md5(b).hexdigest()[:8], 16)
        return (64 + h % 512, 64 + (h >> 9) % 512, 1 + (h >> 18) % 32)

    out = pdf_bytes.map(dims)
    return pd.DataFrame(
        {
            "width": out.map(lambda t: t[0]),
            "height": out.map(lambda t: t[1]),
            "n_frames": out.map(lambda t: t[2]),
        }
    )


def decode_media(
    df: DataFrame,
    payload_col: str,
    decode_fn: Callable[[pd.Series], pd.DataFrame] | None = None,
) -> DataFrame:
    """Decode stage: one mapInPandas pass adding (width, height,
    n_frames). Arrow moves the binary column zero-copy per batch."""
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    decode = decode_fn or stub_decoder
    schema = T.StructType(list(df.schema.fields) + DECODED_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = decode(pdf[payload_col])
            yield pd.concat([pdf.reset_index(drop=True), decoded.reset_index(drop=True)], axis=1)

    return df.mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame, every_n: int, n_frames_col: str = "n_frames"
) -> DataFrame:
    """Frame sampling as pure column logic: emit one row per sampled
    frame index (0, every_n, 2·every_n, …) — the UDTF-shaped fan-out
    a video pipeline needs before per-frame feature extraction.

    Zero/negative n_frames (still images, corrupt payloads from a real
    decoder) yield NO rows instead of killing the job —
    ``sequence(0, -1, n)`` is an illegal boundary in Spark, and R6
    says bad rows are data, not exceptions."""
    idx = F.when(
        F.col(n_frames_col) > 0,
        F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("frame_index", F.explode(idx))
