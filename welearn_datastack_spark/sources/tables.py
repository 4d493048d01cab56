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


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (for the spark.sql path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
