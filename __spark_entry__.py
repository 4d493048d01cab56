"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over welearn_datastack_spark.plans.registry — the single
source of truth where every SURVEY.md §2 operator is registered as a
Spark builder + DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from welearn_datastack_spark.plans.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's full
    batch-generator pipeline in one dataflow — latest-state arg-max →
    step filter → document join → ordered limit → byte-budget
    prefix-sum admission → capped bucketing (SURVEY.md §7 step 1)."""
    return all_queries()["generate_vectorize_batch"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
