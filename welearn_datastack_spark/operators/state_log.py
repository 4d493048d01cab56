"""Append-only state-log operators — the reference's core query family.

The reference drives everything off an append-only ``process_state``
table; "current state" of a document is the row with the max
``operation_order`` (group-max self-join, reference
welearn_datastack/modules/retrieve_data_from_database.py:46–103). Every
batch generator (generate_to_collect/vectorize/classify/extract/
syncronize) is: latest-state arg-max → step/time filter → order →
limit → byte-budget cutoff → capped bucketing (reference
data/batch_generator.py:44–129).

Spark-first realization:
- latest-state = ranking window (one shuffle on the key; at 100 TB the
  log would be partitioned by key so the window is shuffle-free after
  the first clustering, and AQE handles skewed keys).
- byte-budget admission = prefix-sum window (reference loops row by
  row in Python, retrieve_data_from_database.py:225–240).
- capped bucketing = row_number arithmetic + filter (reference chunks
  a Python list and silently drops overflow, batch_generator.py:55–62).

Scale note: the ordered prefix-sum / global bucketing windows use an
un-partitioned Window, which Spark executes on a single task. That is
exactly the semantics the reference wants (a single global greedy
admission over at most PICK_QTY_MAX≈thousands of candidate rows —
always LIMIT-ed first), so the single-task window only ever sees a
small, pre-limited input. Never apply these to an unbounded table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_state(
    log: DataFrame,
    key: str = "user_id",
    order_col: str = "event_id",
    keep_cols: tuple[str, ...] = ("event_type", "ts"),
) -> DataFrame:
    """Latest event per key (reference J1/W1, the group-max self-join at
    retrieve_data_from_database.py:46–60 re-expressed as a ranking
    window). Returns one row per key: key, order_col, keep_cols.
    """
    w = Window.partitionBy(key).orderBy(F.desc(order_col))
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key, order_col, *keep_cols)
    )


def latest_state_in(
    log: DataFrame,
    steps: list[str],
    key: str = "user_id",
    order_col: str = "event_id",
    step_col: str = "event_type",
    time_col: str = "ts",
    before: str | None = None,
) -> DataFrame:
    """Keys whose *latest* state is in ``steps`` (and optionally older
    than ``before``) — the batch-generator predicate P2/P3 (reference
    retrieve_data_from_database.py:140–153; note the reference's
    "two_weeks_ago" variable actually subtracts 2 hours — we take the
    threshold as an explicit argument instead of wall-clock so tests
    and oracles are deterministic).
    """
    cur = latest_state(log, key=key, order_col=order_col, keep_cols=(step_col, time_col))
    out = cur.filter(F.col(step_col).isin(steps))
    if before is not None:
        out = out.filter(F.col(time_col) < F.lit(before).cast("timestamp"))
    return out


def byte_budget_admission(
    df: DataFrame,
    size_col: str,
    budget: int,
    order_by: list[Column],
    cum_col: str = "cum_size",
) -> DataFrame:
    """Greedy running-sum admission: keep rows, in ``order_by`` order,
    while the cumulative ``size_col`` stays ≤ budget (reference A3/W3,
    the Python accumulation loop at retrieve_data_from_database.py:
    204–247 → a prefix-sum window). The input must already be small
    (LIMIT-ed) — see module scale note.
    """
    w = Window.orderBy(*order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(cum_col, F.sum(size_col).over(w)).filter(F.col(cum_col) <= budget)


def capped_buckets(
    df: DataFrame,
    order_by: list[Column],
    threshold: int,
    max_buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Fixed-size work buckets with a hard cap; overflow rows are
    DROPPED, faithfully mirroring the reference's silent overflow drop
    (data/batch_generator.py:55–62: chunks of ``parallelism_threshold``,
    at most ``parallelism_max`` batches). Spark-side the bucket column
    replaces the reference's ``{i}_batch_ids.csv`` artifacts — downstream
    stages repartition on it instead of reading files.
    """
    w = Window.orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn(bucket_col, F.floor((F.col("__rn") - 1) / threshold).cast("int"))
        .filter(F.col(bucket_col) < max_buckets)
        .drop("__rn")
    )


def even_split(df: DataFrame, qty: int, order_by: list[Column], bucket_col: str = "bucket") -> DataFrame:
    """Ceil-split into exactly ``qty`` buckets (reference S14,
    utils_/database_utils.py:48–64) — ``ntile``.
    """
    return df.withColumn(bucket_col, F.ntile(qty).over(Window.orderBy(*order_by)))


def deterministic_sample(df: DataFrame, n: int, key_col: str) -> DataFrame:
    """Seeded stand-in for the reference's ``ORDER BY random() LIMIT n``
    (O4, retrieve_data_from_database.py:286–292). Ordering by a
    cryptographic hash of the key is uniform-ish, deterministic, and
    has an exact ANSI-SQL twin (md5 exists in both Spark and DuckDB) —
    production code may swap in ``F.rand(seed)``.
    """
    return (
        df.withColumn("__h", F.md5(F.col(key_col).cast("string")))
        .orderBy("__h", key_col)
        .limit(n)
        .drop("__h")
    )
