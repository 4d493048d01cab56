"""Classifier stage — reference DocumentClassifier
(nodes_workflow/DocumentClassifier/document_classifier.py:39–194, M2–M4):

1. group slices per document;
2. forced corpora (FORCED_CORPUS_CLASSIFIED=['uved'], constants.py:359)
   and external SDGs (``details.external_sdg``) bypass the models;
3. otherwise bi-classify each slice (SDG vs not) — a document is SDG
   if ANY slice is (A7, sdgs_classifiers.py:16–28);
4. SDG slices get an n-classifier proba vector → restrict to the
   forced subset if any → argmax, accept if > 0.5 unless forced;
   ``n_classifier_id`` is NULLed when forced (quirk at
   sdgs_classifiers.py:81,121);
5. non-SDG documents → ``document_classified_non_sdg`` via set
   difference (J7).

Spark shape: two mapInPandas model stages and pure column logic for
everything else; the per-document grouping the reference does in
Python (A5 itertools.groupby) disappears — slice rows stay flat and
doc-level verdicts are groupBy aggregates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import bi_classify, n_classify_probas
from ..operators.relational import anti_join

ACCEPT_THRESHOLD = 0.5  # sdgs_classifiers.py:107


def classify_slices(
    slices: DataFrame,
    forced_doc_sdgs: DataFrame | None = None,
    bi_loader: Callable | None = None,
    n_loader: Callable | None = None,
) -> DataFrame:
    """Slice-level classification. Input: (document_id, slice_id,
    embedding). ``forced_doc_sdgs``: (document_id, forced_sdgs
    array<int>) for external/forced overrides. Output: slice rows +
    is_sdg, sdg (nullable int), n_classifier_id (nulled when forced).
    """
    scored = bi_classify(slices, model_loader=bi_loader)
    probad = n_classify_probas(scored, model_loader=n_loader)

    if forced_doc_sdgs is not None:
        probad = probad.join(F.broadcast(forced_doc_sdgs), on="document_id", how="left")
    else:
        probad = probad.withColumn("forced_sdgs", F.lit(None).cast("array<int>"))

    # restrict probas to the forced subset when present (sdgs_classifiers.py:81–107):
    # candidate set = forced_sdgs if non-empty else 1..17
    n = F.size("probas")
    candidates = F.when(
        F.col("forced_sdgs").isNotNull() & (F.size("forced_sdgs") > 0), F.col("forced_sdgs")
    ).otherwise(F.sequence(F.lit(1), n))
    zipped = F.filter(
        F.zip_with(
            F.sequence(F.lit(1), n), F.col("probas"), lambda i, p: F.struct(i.alias("sdg"), p.alias("p"))
        ),
        lambda s: F.array_contains(candidates, s["sdg"]),
    )
    # top-1 by proba (O6: sort desc, take head; tiebreak sdg asc)
    best = F.array_sort(
        zipped, lambda a, b: F.when(a["p"] > b["p"], -1).when(a["p"] < b["p"], 1).otherwise(
            F.when(a["sdg"] < b["sdg"], -1).otherwise(1)
        )
    )[0]
    single_forced = F.col("forced_sdgs").isNotNull() & (F.size("forced_sdgs") == 1)
    accepted = single_forced | (best["p"] > ACCEPT_THRESHOLD)
    return probad.select(
        "*",
        F.when(F.col("is_sdg") & accepted, best["sdg"]).alias("sdg"),
        F.when(single_forced, F.lit(None).cast("string"))
        .otherwise(F.lit("n-clf-v1"))
        .alias("n_classifier_id"),
    ).drop("probas", "forced_sdgs")


def document_verdicts(classified_slices: DataFrame) -> DataFrame:
    """Doc-level verdict: SDG iff any slice is (A7 → bool_or)."""
    return classified_slices.groupBy("document_id").agg(
        F.bool_or("is_sdg").alias("doc_is_sdg"),
    )


def non_sdg_documents(all_docs: DataFrame, classified_slices: DataFrame, id_col: str = "document_id") -> DataFrame:
    """J7: documents with no SDG slice → non-SDG state set."""
    sdg_docs = classified_slices.filter(F.col("sdg").isNotNull()).select(id_col).dropDuplicates()
    return anti_join(all_docs.select(id_col).dropDuplicates(), sdg_docs, on=id_col)
