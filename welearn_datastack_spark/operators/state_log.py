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

Scale note: the ordered prefix-sum / global bucketing operators have
GLOBAL-ORDER semantics, which a naive un-partitioned Window executes
on a single task. They are implemented instead as a two-pass
range-partitioned prefix (see ``_ranged_prefix``): range-shuffle on
the ordering, partition-local prefix, and a broadcast per-partition
offset table whose only global window runs over #partitions rows —
bounded by cluster parallelism, never by data size. The results are
bit-identical to the global window (the oracles pin that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ranged_prefix(
    df: DataFrame,
    order_by: list[Column],
    value: Column,
    local_col: str,
    use_row_number: bool = False,
) -> DataFrame:
    """Two-pass global prefix over ``order_by`` without a global
    window: range-partition on the ordering (explicit partition count
    — a user-numbered repartition is exempt from AQE coalescing, so
    every read of the shuffle sees the SAME partition ids), compute
    the partition-local prefix (``row_number`` or running ``sum``),
    then add each partition's offset = cumulative total of all earlier
    partitions. The offset table has one row per partition; its
    cumsum window is bounded by parallelism, not data.

    Returns df + ``local_col`` (the GLOBAL prefix value) + ``__pid``
    (caller drops it).
    """
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = df.repartitionByRange(n_part, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_by)
    if use_row_number:
        local = part.withColumn(local_col, F.row_number().over(w_local).cast("long"))
        per_part = F.count(F.lit(1))
    else:
        local = part.withColumn(
            local_col,
            F.sum(value).over(
                w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        per_part = F.sum(value)
    totals = part.groupBy("__pid").agg(per_part.alias("__tot"))
    w_pid = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = totals.select(
        "__pid",
        (F.sum("__tot").over(w_pid) - F.col("__tot")).alias("__off"),
        F.sum("__tot").over(w_all).alias("__grand_total"),
    )
    return local.join(F.broadcast(offsets), "__pid").withColumn(
        local_col, F.col(local_col) + F.col("__off")
    )


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


# Debug ceiling for the bounded_input=True single-task window path: a
# batch-generator candidate frame is LIMIT-capped at a few hundred
# rows; anything past this ceiling means an unbounded table was fed
# into the one-task plan — fail the job loudly instead of silently
# serializing (and eventually OOMing) a 100 TB window on one core.
BOUNDED_INPUT_MAX_ROWS = 100_000


def _bounded_row_guard(order_by: list[Column], max_rows: int) -> Column:
    """A zero-cost runtime assertion for the single-task window path:
    row_number over the SAME global ordering (so it fuses into the
    window operator that is already there) must stay ≤ max_rows.
    assert_true yields NULL on success; coalesced to 0 so callers can
    ADD it to a kept column — making it unprunable by the optimizer —
    without changing the value."""
    rn = F.row_number().over(Window.orderBy(*order_by))
    return F.coalesce(
        F.assert_true(
            rn <= max_rows,
            F.lit(
                f"bounded_input=True was fed a frame larger than {max_rows} rows "
                "— use the default two-pass ranged prefix for unbounded tables"
            ),
        ).cast("long"),
        F.lit(0),
    )


def byte_budget_admission(
    df: DataFrame,
    size_col: str,
    budget: int,
    order_by: list[Column],
    cum_col: str = "cum_size",
    bounded_input: bool = False,
    max_bounded_rows: int = BOUNDED_INPUT_MAX_ROWS,
) -> DataFrame:
    """Greedy running-sum admission: keep rows, in ``order_by`` order,
    while the cumulative ``size_col`` stays ≤ budget (reference A3/W3,
    the Python accumulation loop at retrieve_data_from_database.py:
    204–247 → a prefix sum). Default: two-pass ranged prefix — safe
    on unbounded tables, identical to the global-window answer. Pass
    ``bounded_input=True`` only for frames already capped by a LIMIT
    (the batch generators), where one single-task window over the few
    hundred candidate rows beats three extra exchanges; a runtime
    guard fails the job if more than ``max_bounded_rows`` rows reach
    that single task.
    """
    if bounded_input:
        w = Window.orderBy(*order_by).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        guarded = F.sum(size_col).over(w) + _bounded_row_guard(order_by, max_bounded_rows)
        return df.withColumn(cum_col, guarded).filter(F.col(cum_col) <= budget)
    out = _ranged_prefix(df, order_by, F.col(size_col), cum_col)
    return (
        out.filter(F.col(cum_col) <= budget)
        .drop("__pid", "__off", "__grand_total")
    )


def capped_buckets(
    df: DataFrame,
    order_by: list[Column],
    threshold: int,
    max_buckets: int,
    bucket_col: str = "bucket",
    bounded_input: bool = False,
    max_bounded_rows: int = BOUNDED_INPUT_MAX_ROWS,
) -> DataFrame:
    """Fixed-size work buckets with a hard cap; overflow rows are
    DROPPED, faithfully mirroring the reference's silent overflow drop
    (data/batch_generator.py:55–62: chunks of ``parallelism_threshold``,
    at most ``parallelism_max`` batches). Spark-side the bucket column
    replaces the reference's ``{i}_batch_ids.csv`` artifacts — downstream
    stages repartition on it instead of reading files. With
    ``bounded_input=True`` the same runtime row-ceiling guard as
    byte_budget_admission protects the single-task window.
    """
    if bounded_input:
        out = df.withColumn(
            "__rn",
            F.row_number().over(Window.orderBy(*order_by)).cast("long")
            + _bounded_row_guard(order_by, max_bounded_rows),
        )
    else:
        out = _ranged_prefix(df, order_by, F.lit(1), "__rn", use_row_number=True).drop(
            "__pid", "__off", "__grand_total"
        )
    return (
        out.withColumn(bucket_col, F.floor((F.col("__rn") - 1) / threshold).cast("int"))
        .filter(F.col(bucket_col) < max_buckets)
        .drop("__rn")
    )


def even_split(df: DataFrame, qty: int, order_by: list[Column], bucket_col: str = "bucket") -> DataFrame:
    """Ceil-split into exactly ``qty`` buckets (reference S14,
    utils_/database_utils.py:48–64) — ``ntile`` semantics computed
    from the ranged global row number and total count: the first
    ``N mod qty`` tiles hold ``ceil(N/qty)`` rows, the rest
    ``floor(N/qty)``.
    """
    out = _ranged_prefix(df, order_by, F.lit(1), "__rn", use_row_number=True)
    n = F.col("__grand_total")
    rn = F.col("__rn")
    base = F.floor(n / qty)
    rem = n % qty
    cut = rem * (base + 1)
    bucket = (
        F.when(rn <= cut, F.floor((rn - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rn - 1 - cut) / base) + 1)
        .cast("int")
    )
    return out.withColumn(bucket_col, bucket).drop(
        "__rn", "__pid", "__off", "__grand_total"
    )


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
