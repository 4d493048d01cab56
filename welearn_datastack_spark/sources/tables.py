"""Parquet table catalog over the driver's synthetic star schema.

Mirrors the reference's relational catalog (SQLAlchemy models per
alembic/versions/821173cf9c5d_initial_migration.py) as a thin loader:
the ``events`` table plays the ``process_state`` append-only log
(event_id ≈ operation_order, user_id ≈ document_id, event_type ≈ step,
ts ≈ created_at — see SURVEY.md §1.1), ``documents`` plays
``welearn_document`` content, ``embeddings`` plays ``document_slice``
embeddings.

At 100 TB these would be partitioned/bucketed parquet or Delta tables;
here we read plain files. Column pruning + predicate pushdown still
apply (Catalyst pushes filters into the parquet scan).
"""

from __future__ import annotations

import math
import os
import re
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to a session-tz TIMESTAMP no
    matter which physical encoding the parquet writer chose.

    Testdata generations have used two encodings:
    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
      with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as
      int64 nanos — convert to a timestamp (µs precision).
    - parquet ``timestamp[us]`` with no tz: Spark reads TIMESTAMP_NTZ.
      The session timezone is pinned to UTC (session.py), so casting
      to TIMESTAMP preserves the wall-clock instant exactly.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _size_to_bytes(val: str) -> int:
    """Parse a Spark size conf string ('134217728b', '128m', '1g')."""
    m = re.fullmatch(r"\s*(\d+)\s*([bkmgt]?)b?\s*", val.lower())
    if not m:
        return 128 << 20
    mult = {"": 1, "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    return int(m.group(1)) * mult[m.group(2)]


def fan_out_for_compute(df: DataFrame, bytes_per_task: int = 2 << 20) -> DataFrame:
    """Give a compute-dense downstream kernel parallelism independent
    of the scan's split count — a structural NO-OP on layouts that are
    already parallel enough.

    Spark sizes scan partitions by BYTES (`maxPartitionBytes`, 128 MB
    default), which is right for IO-bound plans but wrong for kernels
    doing O(dim²) / O(tokens) work per row: a 50 MB single-row-group
    parquet file (this repo's toy testdata layout — and any real-world
    "one giant file" drop) becomes ONE task, serializing the whole
    shingle/fold stage onto one core while 31 idle. Measured at sf10:
    `sq8_ann_topk` spent 170 s on a single task whose shuffle bytes
    were 1.2 KB — all compute, no parallelism.

    At production scale a 100 TB table arrives as thousands of splits,
    the estimated scan parallelism exceeds the byte-derived target,
    and this helper returns the input UNCHANGED — the serve-path
    shuffle story (|Q|·k rows, baked-literal folds) is untouched by
    design. Locally it pays one corpus-LINEAR round-robin exchange to
    unlock every core; linear bytes for a ~Nx wall win is the right
    trade, and the §13 byte audit sees it as an explicit, documented
    exchange rather than a mystery.

    The decision uses file metadata only (no Spark job):
    ``target = clamp(ceil(input_bytes / bytes_per_task), 1,
    defaultParallelism)``; estimated scan parallelism =
    Σ ceil(file_size / maxPartitionBytes), an upper bound on what the
    scan can yield (row-group granularity can only reduce it), so the
    guard never repartitions a layout that is already parallel. Files
    not visible from the driver (remote FS) fall back to the no-op —
    exactly the deployments where the layout provides splits anyway."""
    try:
        files = df.inputFiles()
        sizes = []
        for uri in files:
            path = unquote(urlparse(uri).path) if "://" in uri else uri
            if not os.path.exists(path):
                return df
            sizes.append(os.path.getsize(path))
        if not sizes:
            return df
        spark = df.sparkSession
        max_split = _size_to_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
        est_scan = sum(max(1, math.ceil(s / max_split)) for s in sizes)
        par = spark.sparkContext.defaultParallelism
        target = min(par, math.ceil(sum(sizes) / bytes_per_task))
        if target <= est_scan:
            return df
        return df.repartition(target)
    except Exception:  # pragma: no cover — metadata probe must never break a plan
        return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (for the spark.sql path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
