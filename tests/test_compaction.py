"""State-log compaction + snapshot checkpointing (operators/compaction)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from welearn_datastack_spark.operators.compaction import (
    compact,
    plan_compaction,
    read_with_snapshot,
    snapshot_latest,
)
from welearn_datastack_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _parquet_files(path):
    return [f for f in glob.glob(os.path.join(path, "*.parquet")) if os.path.isfile(f)]


@pytest.fixture()
def fragmented_log(spark, tmp_path):
    """An append-only log written as many tiny files (64 appends)."""
    path = str(tmp_path / "state_log")
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    events.repartition(64).write.mode("overwrite").parquet(path)
    return path


def test_compact_reduces_files_and_preserves_rows(spark, fragmented_log):
    before_files = len(_parquet_files(fragmented_log))
    assert before_files >= 32
    before = spark.read.parquet(fragmented_log)
    before_count = before.count()
    before_sum = before.agg(F.sum(F.hash("user_id", "event_type", "event_id"))).collect()[0][0]

    stats = compact(spark, fragmented_log, target_file_bytes=1 << 30)

    after_files = _parquet_files(fragmented_log)
    assert len(after_files) == 1  # everything fits one 1 GiB target file
    assert stats["n_files"] == before_files
    assert stats["target_files"] == 1
    after = spark.read.parquet(fragmented_log)
    assert after.count() == before_count
    # content identical (order-independent hash)
    after_sum = after.agg(F.sum(F.hash("user_id", "event_type", "event_id"))).collect()[0][0]
    assert after_sum == before_sum
    assert not glob.glob(fragmented_log + ".__*")  # staging cleaned up


def test_compact_respects_target_size(spark, fragmented_log):
    total = plan_compaction(spark, fragmented_log, 1 << 30)["total_bytes"]
    # target a quarter of the data per file → ~4 output files
    stats = compact(spark, fragmented_log, target_file_bytes=max(1, total // 4))
    assert stats["target_files"] in (4, 5)
    assert len(_parquet_files(fragmented_log)) == stats["target_files"]


def test_sorted_compaction_clusters_rows(spark, fragmented_log):
    compact(
        spark,
        fragmented_log,
        target_file_bytes=1 << 30,
        sort_within_by=[F.col("ts")],
    )
    df = spark.read.parquet(fragmented_log)
    rows = df.select("ts").collect()  # single file → read order = file order
    ts = [r["ts"] for r in rows]
    assert ts == sorted(ts)


def test_snapshot_plus_tail_equals_full_argmax(spark, tmp_path):
    log_path = str(tmp_path / "log")
    snap_path = str(tmp_path / "snap")
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    # first 80% of history, then snapshot, then a late tail append
    cutoff = events.selectExpr("percentile(cast(ts as long), 0.8) AS p").collect()[0]["p"]
    events.filter(F.col("ts").cast("long") <= cutoff).write.mode("overwrite").parquet(log_path)
    n = snapshot_latest(spark, log_path, snap_path, ["user_id"], "ts", ["event_id"])
    assert n == spark.read.parquet(log_path).select("user_id").distinct().count()

    events.filter(F.col("ts").cast("long") > cutoff).write.mode("append").parquet(log_path)

    via_snapshot = read_with_snapshot(spark, snap_path, log_path, ["user_id"], "ts")
    # oracle: plain arg-max over the full log
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
    full = (
        spark.read.parquet(log_path)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    got = {(r["user_id"], r["ts"]) for r in via_snapshot.select("user_id", "ts").collect()}
    want = {(r["user_id"], r["ts"]) for r in full.select("user_id", "ts").collect()}
    assert got == want


def test_recover_interrupted_compaction(spark, tmp_path):
    """Crash between compact()'s two renames leaves data under
    .__old_*; startup recovery must restore it and drop staging."""
    import os

    from welearn_datastack_spark.operators.compaction import (
        recover_interrupted_compaction,
    )

    base = str(tmp_path / "tbl")
    spark.range(10).write.parquet(base)
    # simulate the crash window: table moved aside, staging incomplete
    os.rename(base, base + ".__old_deadbeef")
    os.makedirs(base + ".__compact_cafe")
    restored = recover_interrupted_compaction(base)
    assert restored == "tbl.__old_deadbeef"
    assert spark.read.parquet(base).count() == 10
    assert not os.path.exists(base + ".__compact_cafe")
    # idempotent when nothing is wrong
    assert recover_interrupted_compaction(base) is None
    assert spark.read.parquet(base).count() == 10
