"""Vector-store sync stage — reference QdrantSyncronizer
(nodes_workflow/QdrantSyncronizer/qdrant_syncronizer.py:45–231 +
modules/qdrant_handler.py):

- route each document to a collection by (lang, model) with a
  multilingual fallback (qdrant_handler.py:16–65);
- document-level SDG = top-2 most frequent slice SDGs (A2,
  qdrant_syncronizer.py:164–171);
- build one point per slice: id, vector, payload struct
  (qdrant_handler.py:114–138);
- delete-by-document-filter then upsert ≡ overwrite-by-key (S16).

The real Qdrant client write would be a ``foreachPartition`` sink
chunked at QDRANT_CHUNK_SIZE=1000 (qdrant_syncronizer.py:57,79); the
in-engine simulation keeps the point table a DataFrame so the whole
sync is testable and idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import overwrite_by_key
from ..operators.topk import top_k_frequent


def route_collections(docs: DataFrame, collections: DataFrame) -> DataFrame:
    """Collection routing: exact (lang, model_name) match wins, else
    the model's multilingual collection (qdrant_handler.py:44–59 as a
    broadcast join + coalesce cascade)."""
    exact = collections.select(
        F.col("lang").alias("c_lang"), F.col("model_name").alias("c_model"), "collection"
    )
    multi = collections.filter(F.col("lang") == "multi").select(
        F.col("model_name").alias("m_model"), F.col("collection").alias("multi_collection")
    )
    return (
        docs.join(
            F.broadcast(exact),
            (docs.lang == exact.c_lang) & (docs.model_name == exact.c_model),
            "left",
        )
        .join(F.broadcast(multi), docs.model_name == multi.m_model, "left")
        .withColumn("target_collection", F.coalesce("collection", "multi_collection"))
        .drop("c_lang", "c_model", "collection", "m_model", "multi_collection")
    )


def doc_top2_sdgs(slice_sdgs: DataFrame) -> DataFrame:
    """A2: the 2 most frequent slice SDGs per document, deterministic
    tiebreak sdg asc, collected as an array."""
    top2 = top_k_frequent(
        slice_sdgs.filter(F.col("sdg").isNotNull()), "document_id", "sdg", k=2
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("rnk", "sdg"))), lambda s: s["sdg"]
    )
    return top2.groupBy("document_id").agg(ordered.alias("document_sdgs"))


def build_points(slices: DataFrame, docs: DataFrame, doc_sdgs: DataFrame) -> DataFrame:
    """One point per slice: (point_id, vector, payload struct) —
    payload fields mirror qdrant_handler.py:114–138 COMPLETELY:
    document_desc / document_details / document_scrape_date ride along
    when the docs side carries description / details / created_at
    (they default to null otherwise, e.g. in minimal test fixtures)."""
    opt = lambda name: (  # noqa: E731
        F.col(name) if name in docs.columns else F.lit(None).cast("string")
    )
    return (
        slices.join(docs, on="document_id")
        .join(doc_sdgs, on="document_id", how="left")
        .select(
            F.concat_ws(":", "document_id", "order_sequence").alias("point_id"),
            F.col("document_id"),
            F.col("embedding").alias("vector"),
            F.struct(
                F.col("title").alias("document_title"),
                F.col("document_id").alias("payload_document_id"),
                F.col("url").alias("document_url"),
                F.col("lang").alias("document_lang"),
                F.col("body").alias("slice_content"),
                F.col("corpus").alias("document_corpus"),
                opt("description").alias("document_desc"),
                opt("details").alias("document_details"),
                opt("created_at").cast("string").alias("document_scrape_date"),
                F.col("document_sdgs").alias("document_sdg"),
                F.col("sdg").alias("slice_sdg"),
            ).alias("payload"),
        )
    )


def sync(points_store: DataFrame, new_points: DataFrame) -> DataFrame:
    """S16: delete points whose document_id is in the batch, then
    upsert — overwrite-by-key MERGE."""
    return overwrite_by_key(points_store, new_points, key="document_id")
