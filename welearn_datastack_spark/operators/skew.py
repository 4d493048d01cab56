"""Skew-aware aggregation — salting for hot keys.

The reference never aggregates anything big enough to skew (Postgres
does its aggregation); at 100 TB a groupBy on a low-cardinality or
Zipf-distributed key (event_type has 5 values; corpus has ~15) sends
entire key populations to single reducers. Two standard fixes, both
here:

1. AQE skew-join splitting (on in session.py) handles skewed JOINS
   automatically.
2. Skewed AGGREGATIONS need the salt trick: phase 1 groups on
   (key, salt) — fan-out S× — phase 2 re-aggregates partials on key.
   Only algebraic aggregates (sum/count/min/max, and avg as
   sum+count) can split this way.

Note Spark's hash aggregation already does map-side partial combine,
which defuses most agg skew; explicit salting matters when the
*number of distinct groups per partition* is huge (partial hash
tables spill) or when combining with high-cardinality intermediate
state. The operator exists for those cases and as the documented
pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: returns per-key
    (sum_value, n_rows) — identical results to a direct groupBy, but
    no reducer ever sees more than ~1/n_salts of a hot key's rows in
    phase 1."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.sum(value_col).alias("__psum"), F.count(F.lit(1)).alias("__pcnt")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__psum").alias("sum_value"), F.sum("__pcnt").alias("n_rows")
    )
