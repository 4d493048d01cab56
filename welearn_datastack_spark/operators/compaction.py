"""Small-file compaction + latest-state snapshotting for the
append-only state log (SURVEY.md §2.10).

The reference's process log is an append-only table
(ProcessState rows, document_hub/models/db_models) that every batch
job appends to and every reader re-scans for the arg-max state per
document.  On Spark at 100 TB that pattern has two failure modes:

1. **Small files.** Each micro-batch / ingest run appends a handful
   of rows → after months the log is millions of KB-sized parquet
   files, and the scan is dominated by file-open overhead (driver
   listing + one task per file).  ``compact`` is the OPTIMIZE verb:
   bin-pack existing files into ~target-size outputs, content
   preserved, partition layout preserved.

2. **Unbounded history.** Readers only ever need the latest state
   per (document, step) but pay for the full history every query.
   ``snapshot_latest`` is the checkpoint verb: materialize the
   arg-max rows once, after which readers scan snapshot + tail
   (the log since the snapshot watermark) — the same
   snapshot-plus-delta contract Delta/Iceberg checkpoints use.

Both are rewrite jobs expressed as plain DataFrame plans: no driver
loops, no per-file RPCs; Spark's committer gives all-or-nothing
replacement via write-to-staging + atomic swap.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_compaction(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Inspect a parquet directory and decide how many output files a
    compaction should produce. Pure metadata read (file listing via
    the input_file reader metadata, not data)."""
    files = (
        spark.read.parquet(path)
        .select(
            F.input_file_name().alias("file"),
            F.lit(1).alias("one"),
        )
        .groupBy("file")
        .count()
        .collect()
    )
    from urllib.parse import unquote, urlparse

    names = [unquote(urlparse(r["file"]).path) for r in files]
    sizes = []
    for n in names:
        try:
            sizes.append(os.path.getsize(n))
        except OSError:
            sizes.append(0)
    total = sum(sizes)
    n_out = max(1, math.ceil(total / target_file_bytes))
    return {
        "n_files": len(names),
        "total_bytes": total,
        "target_files": n_out,
        "small_files": sum(1 for s in sizes if s < target_file_bytes // 2),
    }


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[Column] | None = None,
) -> dict:
    """Rewrite ``path`` in place into ~``target_file_bytes`` parquet
    files. Data is byte-identical modulo row order; an optional
    within-file sort restores clustering so min/max row-group stats
    stay selective after the rewrite (the reason Delta's OPTIMIZE has
    ZORDER — sorted files prune, shuffled files don't).

    Writes to a staging dir then swaps, so a concurrent reader sees
    either the old or the new layout, never a half-written mix."""
    stats = plan_compaction(spark, path, target_file_bytes)
    df = spark.read.parquet(path)
    out = df.repartition(stats["target_files"])
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    staging = f"{path.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(staging)
    old = f"{path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return stats


def snapshot_latest(
    spark: SparkSession,
    log_path: str,
    snapshot_path: str,
    key_cols: list[str],
    ts_col: str,
    tie_break: list[str] | None = None,
) -> int:
    """Materialize the latest row per key from the append-only log —
    the checkpoint against which later reads only need the log tail.
    Returns the snapshot row count."""
    log = spark.read.parquet(log_path)
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tie_break or [])]
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*order)
    latest = (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    latest.write.mode("overwrite").parquet(snapshot_path)
    return spark.read.parquet(snapshot_path).count()


def read_with_snapshot(
    spark: SparkSession,
    snapshot_path: str,
    log_path: str,
    key_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Latest-state view = snapshot ∪ log-tail, arg-maxed. The tail
    predicate (`ts > snapshot watermark`) prunes the log scan to
    files whose row-group max exceeds the watermark — with
    time-ordered appends that is only the recent files."""
    snap = spark.read.parquet(snapshot_path)
    watermark = snap.agg(F.max(ts_col)).collect()[0][0]
    tail = spark.read.parquet(log_path).filter(F.col(ts_col) > F.lit(watermark))
    both = snap.select(*tail.columns).unionByName(tail)
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    return (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
