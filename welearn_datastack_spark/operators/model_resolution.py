"""Per-key "current model" resolution — reference J5/W1.

Reference: 3-way join Document ⋈ CorpusXModel ⋈ Model with
``model.lang == document.lang``, then
``row_number() OVER (PARTITION BY doc.id, corpus_id ORDER BY
used_since DESC) = 1`` (retrieve_data_from_database.py:330–358). The
reference already *is* a window query; here the dimension sides are
broadcast so the fact table never shuffles for the join — only the
ranking window clusters by the fact key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resolve_latest_per_key(
    facts: DataFrame,
    assoc: DataFrame,
    on: list[str] | str,
    partition_keys: list[str],
    recency_cols: list[Column],
    broadcast_assoc: bool = True,
) -> DataFrame:
    """Join facts to an association/dimension and keep, per
    ``partition_keys``, the single most recent row by ``recency_cols``
    (descending, with the caller appending a unique tie-break column).
    """
    right = F.broadcast(assoc) if broadcast_assoc else assoc
    joined = facts.join(right, on=on, how="inner")
    w = Window.partitionBy(*partition_keys).orderBy(*[c.desc() for c in recency_cols])
    return joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
