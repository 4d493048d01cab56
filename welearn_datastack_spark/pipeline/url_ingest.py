"""URL ingestion sink — reference insert_urls
(nodes_workflow/URLCollectors/nodes_helpers/collect.py:11–35): per-row
INSERT of document + ``url_retrieved`` state, with the URL unique
constraint + rollback-and-skip as the dedup mechanism (R4).

Spark shape: set-based and idempotent — dropDuplicates within the
batch, anti-join against the existing store, one append. No
transaction needed; re-running converges to the same state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import anti_join


def insert_urls(
    existing_docs: DataFrame, incoming: DataFrame, url_col: str = "url"
) -> DataFrame:
    """New document rows for URLs not yet in the store. ``incoming``
    needs (url, corpus); ids are deterministic (md5 of the url) so
    re-ingestion is idempotent — the Spark answer to the reference's
    unique-constraint-rollback dedup."""
    # P7 — faithfully the reference's *prefix* check (`startswith("https")`,
    # csv_collector.py:36–37), which also admits e.g. "httpsx://"; a
    # stricter deployment would use startswith("https://")
    https_only = incoming.filter(F.col(url_col).startswith("https"))
    deduped = https_only.dropDuplicates([url_col])
    fresh = anti_join(deduped, existing_docs.select(url_col), on=url_col)
    return fresh.withColumn("id", F.md5(F.col(url_col)))
