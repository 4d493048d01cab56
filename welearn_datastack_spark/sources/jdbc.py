"""JDBC source/sink (S15) — the reference's relational read/write
path re-expressed as Spark JDBC.

Reference: ``utils_/database_utils.py:20-45`` (``create_db_session``
engine setup) and every node's SELECT-by-id-list / bulk-add / commit
pattern (e.g. DocumentHubCollector/document_collector.py:61-99).

Spark-first mapping:
- reads go through ``spark.read.jdbc`` so Catalyst pushes filters and
  column pruning INTO the database (`PushedFilters` on the JDBC scan
  — asserted in tests/test_jdbc_roundtrip.py against an embedded
  Derby database, the one JDBC engine shipped with Spark);
- partitioned reads (`partitionColumn`/`numPartitions`) parallelize
  the scan across executors — the analog of the reference's id-batch
  SELECT loops, but planned instead of hand-rolled;
- writes use ``df.write.jdbc`` batched INSERTs — the analog of
  ``bulk_save_objects``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC table scan; with ``partition_column`` the read fans out as
    ``num_partitions`` range-bounded queries (the scale path for a
    large source table — each executor pulls its own slice)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 1000,
    column_types: str | None = None,
) -> None:
    """Batched JDBC write (bulk_save_objects analog).

    ``column_types``: DDL overrides for CREATE TABLE (e.g.
    ``"url VARCHAR(200)"``) — engines like Derby map StringType to
    CLOB by default, which cannot carry comparisons, so a pushed-down
    string predicate would fail server-side."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.save()
