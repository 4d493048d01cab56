"""Collector stage — reference DocumentHubCollector
(nodes_workflow/DocumentHubCollector/document_collector.py:41–189):
group candidate documents by corpus, dispatch each group to its
per-corpus extraction plugin (modules/collector_selector.py:17–55),
validate mandatory fields, route failures to the error channel, and
enrich with computed metadata.

Spark shape: the plugin registry is a dict of per-corpus pandas
functions applied inside ONE mapInPandas stage after repartitioning
by corpus — per-partition heterogeneous dispatch instead of the
reference's Python group-loop. Errors are DATA (R6): every plugin
output row carries (http_error_code, error_info) instead of raising,
so one bad document never kills a 10k-document task at scale.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# plugin signature: pdf (all rows share one corpus) -> pdf with
# full_content/description/title/details filled + error columns
PluginFn = Callable[[pd.DataFrame], pd.DataFrame]

PLUGIN_OUTPUT_FIELDS = [
    T.StructField("id", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("corpus", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("full_content", T.StringType()),
    T.StructField("details", T.StringType()),
    T.StructField("http_error_code", T.IntegerType()),
    T.StructField("error_info", T.StringType()),
]
PLUGIN_OUTPUT_SCHEMA = T.StructType(PLUGIN_OUTPUT_FIELDS)


def stub_plugin(corpus: str) -> PluginFn:
    """STUB extraction plugin (the real ones do HTTP + HTML/XML/PDF
    parsing — plugins/rest_requesters/*, plugins/scrapers/*; network
    is unavailable here). Deterministically 'extracts' from the URL
    so plumbing and error routing are testable: URLs containing
    'bad' yield an error row (R6)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "id": pdf["id"],
                "url": pdf["url"],
                "corpus": pdf["corpus"],
                "title": pdf["url"].map(lambda u: f"title of {u}"),
                "description": pdf["url"].map(lambda u: f"description from {corpus}: {u}"),
                "full_content": pdf["url"].map(lambda u: f"content extracted by {corpus} plugin from {u}"),
                "details": pdf["url"].map(lambda u: '{"source":"%s"}' % corpus),
                "http_error_code": pd.array([None] * len(pdf), dtype="Int32"),
                "error_info": pd.array([None] * len(pdf), dtype=object),
            }
        )
        bad = out["url"].str.contains("bad")
        out.loc[bad, ["title", "description", "full_content"]] = None
        out.loc[bad, "http_error_code"] = 422
        out.loc[bad, "error_info"] = "extraction failed"
        return out

    return run


def collect_documents(
    candidates: DataFrame,
    plugins: dict[str, PluginFn] | None = None,
) -> DataFrame:
    """Dispatch per-corpus plugins over candidates (id, url, corpus).

    One mapInPandas stage after repartition("corpus"): each partition
    holds few corpora, the plugin lookup happens per pandas chunk.
    Unknown corpora become error rows (reference raises NoPluginFound
    — collector_selector.py:49–55; we dead-letter instead, R6)."""
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(candidates.sparkSession)
    plugins = plugins or {}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for corpus, group in pdf.groupby("corpus", sort=False):
                fn = plugins.get(corpus) or stub_plugin(corpus)
                yield fn(group)

    return (
        candidates.repartition(F.col("corpus"))
        .mapInPandas(run, schema=PLUGIN_OUTPUT_SCHEMA)
    )


def validate(extracted: DataFrame) -> DataFrame:
    """P10: mandatory description & full_content → otherwise 422 error
    row (modules/validation.py:6–13, document_collector.py:160–166)."""
    invalid = (
        F.col("http_error_code").isNull()
        & (
            F.col("description").isNull()
            | (F.trim("description") == "")
            | F.col("full_content").isNull()
            | (F.trim("full_content") == "")
        )
    )
    return extracted.withColumn(
        "http_error_code",
        F.when(invalid, F.lit(422)).otherwise(F.col("http_error_code")),
    ).withColumn(
        "error_info",
        F.when(invalid, F.lit("missing mandatory field")).otherwise(F.col("error_info")),
    )


def split_errors(validated: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Error side-output (R6): (good docs, error_retrieval rows)."""
    good = validated.filter(F.col("http_error_code").isNull())
    errors = validated.filter(F.col("http_error_code").isNotNull()).select(
        F.col("id").alias("document_id"), "http_error_code", "error_info"
    )
    return good, errors
