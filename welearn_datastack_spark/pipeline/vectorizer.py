"""Vectorizer stage — reference DocumentVectorizer
(nodes_workflow/DocumentVectorizer/document_vectorizer.py:41–132):
resolve the current embedding model per (corpus, lang), slice each
document into sentence-packed chunks, embed every slice, DELETE the
document's old slices, bulk-insert the new ones, append
``document_vectorized`` states.

Spark shape: model resolution is a broadcast ranked join (J5/W1),
slicing is an array-UDF + posexplode (F24/W5), embedding is one
mapInPandas stage with an executor-cached model (M1), and
delete+insert becomes overwrite-by-key (S16 semantics) — one
idempotent dataflow instead of four ORM round-trips.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import embed_slices, slice_documents
from ..operators.model_resolution import resolve_latest_per_key
from ..operators.relational import overwrite_by_key


def resolve_embedding_models(
    docs: DataFrame, corpus_models: DataFrame, models: DataFrame
) -> DataFrame:
    """J5/W1: Document ⋈ CorpusXModel (corpus_id) ⋈ Model (model_id,
    lang match) → latest by used_since per document (reference
    retrieve_models, retrieve_data_from_database.py:299–370)."""
    assoc = corpus_models.join(models, on="model_id")
    joined = resolve_latest_per_key(
        docs,
        assoc,
        on=[docs.corpus_id == assoc.corpus_id, docs.lang == assoc.lang],
        partition_keys=["id"],
        recency_cols=[F.col("used_since"), F.col("model_id")],
    )
    return joined.select(docs["*"], "model_id", "model_name")


def vectorize(
    docs: DataFrame,
    existing_slices: DataFrame | None = None,
    id_col: str = "id",
    text_col: str = "full_content",
    slice_length: int = 20,
    model_loader: Callable | None = None,
) -> DataFrame:
    """Slice + embed; replace any existing slices for these documents
    (reference deletes old slices first, document_vectorizer.py:92–95).
    Returns the new slice table (document_id, order_sequence, body,
    embedding)."""
    slices = slice_documents(docs, id_col=id_col, text_col=text_col, slice_length=slice_length)
    embedded = embed_slices(slices, text_col="body", model_loader=model_loader).withColumnRenamed(
        id_col, "document_id"
    )
    if existing_slices is None:
        return embedded
    return overwrite_by_key(existing_slices, embedded, key="document_id")
