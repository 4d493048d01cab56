"""Full-pipeline integration test over the real synthetic tables:
documents → slices → embeddings → classification → keywords →
vector-store points, all stages chained, all stub models — the
Spark analog of running every reference node back-to-back."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from welearn_datastack_spark.pipeline.classifier import classify_slices, document_verdicts
from welearn_datastack_spark.pipeline.keywords import extract_and_link
from welearn_datastack_spark.pipeline.qdrant_sync import (
    build_points,
    doc_top2_sdgs,
    route_collections,
    sync,
)
from welearn_datastack_spark.pipeline.vectorizer import vectorize
from welearn_datastack_spark.sources.tables import load_table


def test_full_enrichment_chain(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(60)
    n_docs = docs.count()

    # vectorize: slice + embed
    slices = vectorize(
        docs.select(F.col("doc_id").cast("string").alias("id"), F.col("text").alias("full_content")),
        slice_length=12,
    )
    assert slices.count() >= n_docs  # every doc yields ≥1 slice
    assert slices.select("document_id").distinct().count() == n_docs
    one = slices.first()
    assert abs(np.linalg.norm(np.array(one["embedding"])) - 1.0) < 1e-5

    # classify
    classified = classify_slices(
        slices.select("document_id", F.col("order_sequence").alias("slice_seq"), "embedding")
    )
    verdicts = document_verdicts(classified)
    assert verdicts.count() == n_docs

    # keywords
    dim, links = extract_and_link(
        docs.select(F.col("doc_id").cast("string").alias("document_id"), F.col("text").alias("description")),
        spark.createDataFrame([], "keyword string, id string"),
        spark.createDataFrame([], "document_id string, keyword_id string"),
    )
    assert links.select("document_id").distinct().count() == n_docs
    # dictionary ids are deterministic → re-extraction is a no-op
    dim2, _ = extract_and_link(
        docs.select(F.col("doc_id").cast("string").alias("document_id"), F.col("text").alias("description")),
        dim,
        links,
    )
    assert dim2.count() == dim.count()

    # vector-store sync: route, top-2, points, overwrite
    doc_meta = docs.select(
        F.col("doc_id").cast("string").alias("document_id"),
        F.lit("t").alias("title"),
        F.lit("https://x").alias("url"),
        "lang",
        F.col("source").alias("corpus"),
        F.lit("model-a").alias("model_name"),
    )
    collections = spark.createDataFrame(
        [("en", "model-a", "c_en"), ("multi", "model-a", "c_multi")],
        ["lang", "model_name", "collection"],
    )
    routed = route_collections(doc_meta, collections)
    assert routed.filter(F.col("target_collection").isNull()).count() == 0

    top2 = doc_top2_sdgs(classified.select("document_id", "sdg"))
    points = build_points(
        slices.select("document_id", "order_sequence", "body", "embedding").join(
            classified.select(
                "document_id", F.col("slice_seq").alias("order_sequence"), "sdg"
            ),
            on=["document_id", "order_sequence"],
        ),
        doc_meta,
        top2,
    )
    n_points = points.count()
    assert n_points == slices.count()

    store = sync(points.limit(0), points.select("point_id", "document_id", "vector", "payload"))
    assert store.count() == n_points
    # re-sync is idempotent
    again = sync(store, points.select("point_id", "document_id", "vector", "payload"))
    assert again.count() == n_points
