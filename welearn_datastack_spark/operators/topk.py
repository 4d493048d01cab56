"""Per-group top-k / top-frequency operators.

Reference A2/W4: document-level SDG = the 2 most common slice SDGs,
computed with ``Counter(...).most_common(2)`` per document
(nodes_workflow/QdrantSyncronizer/qdrant_syncronizer.py:164–171).
``most_common`` tie-breaks by Python insertion order — we define the
deterministic tiebreak (value ascending) and document the deviation
(SURVEY.md §7 "exact-parity quirks").

Spark-first: count + ranking window. One shuffle for the groupBy; the
window reuses the same clustering (partial aggregation is map-side, so
the shuffle moves pre-aggregated (group, value, count) triples — at
100 TB this is the canonical scalable top-k shape, no driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_frequent(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int,
    count_col: str = "cnt",
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k most frequent ``value_col`` per ``group_col``; ties broken
    by ``value_col`` ascending. Returns (group, value, cnt, rnk)."""
    counts = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias(count_col))
    w = Window.partitionBy(group_col).orderBy(F.desc(count_col), F.asc(value_col))
    return counts.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def top_k_by(
    df: DataFrame,
    group_cols: list[str],
    order_by: list,
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Generic per-group top-k by an explicit ordering (used by the
    vector-search operators and the ordered-limit batch picks)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
