"""PDF page refinement — repeated per-page header/footer detection
and strip, as pure DataFrame algebra.

Reference analog: ``modules/pdf_extractor.py`` pipes Tika page text
through ``refinedoc.RefinedDocument`` (:74-78), whose job is to drop
the headers/footers that repeat on every page (journal name, running
title, 'Page N'), then applies the character cleanup chain
(:227-258 — non-printables, ligatures, hyphens, accents; F19 covers
the character chain, functions/text.py:57 + plans/q_extra.py
``pdf_cleanup_chain``).

Algorithm (documented, deterministic): a line is boilerplate when its
NORMALIZED form (lowercased, digit runs → '#', whitespace collapsed —
so 'Page 3' ≡ 'Page 17') is the modal value at the same top/bottom
position across the document's pages and that mode covers ≥
``threshold`` of pages (with ≥2 pages). Stripping removes exactly the
lines matching their position's modal form, so one-off first-page
title lines survive.

Scale shape: one explode over the first/last ``k`` candidate lines
(not the whole page body), one groupBy on (doc, side, position,
norm) — key count bounded by |docs|·2k — a window for the mode, and
a broadcast-friendly join back. No pairwise page comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_boilerplate(col: Column) -> Column:
    """Position-stable form: case-, digit- and spacing-insensitive
    (page numbers and issue numbers vary per page)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), r"[0-9]+", "#"), r"\s+", " ")
    )


def detect_boilerplate_lines(
    pages: DataFrame,
    doc_col: str = "doc_id",
    lines_col: str = "lines",
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Per-document boilerplate line forms.

    Input: one row per page with ``lines: array<string>``.
    Output: (doc, side 'h'|'f', pos, norm) rows to strip.
    """
    n_pages = pages.groupBy(doc_col).agg(F.count(F.lit(1)).alias("_n_pages"))

    # ONE pass over pages: every (side, pos) candidate of a page is an
    # element of an inline array, exploded — a per-position unionAll
    # would rescan the input 2k times
    entries = []
    for side, idx in (("h", lambda p: F.lit(p)), ("f", lambda p: F.size(lines_col) - 1 - p)):
        for p in range(k):
            line = F.get(F.col(lines_col), idx(p))
            entries.append(
                F.struct(
                    F.lit(side).alias("side"),
                    F.lit(p).alias("pos"),
                    # a page shorter than 2k lines offers no candidate at
                    # this depth — guard against header/footer overlap
                    F.when(
                        F.size(lines_col) >= 2 * k, normalize_boilerplate(line)
                    ).alias("norm"),
                )
            )
    cand = pages.select(
        F.col(doc_col), F.explode(F.array(*entries)).alias("c")
    ).select(doc_col, "c.side", "c.pos", "c.norm")
    cand = cand.filter(F.col("norm").isNotNull() & (F.col("norm") != ""))

    counts = cand.groupBy(doc_col, "side", "pos", "norm").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w = Window.partitionBy(doc_col, "side", "pos").orderBy(
        F.desc("_cnt"), F.asc("norm")
    )
    modal = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .join(n_pages, doc_col)
        .filter(
            (F.col("_n_pages") >= 2)
            & (F.col("_cnt") >= F.ceil(F.lit(threshold) * F.col("_n_pages")))
        )
        .select(doc_col, "side", "pos", "norm")
    )
    return modal


def strip_headers_footers(
    pages: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page_no",
    lines_col: str = "lines",
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Drop detected boilerplate lines; returns pages with a cleaned
    ``lines`` array (original order preserved)."""
    boiler = detect_boilerplate_lines(pages, doc_col, lines_col, k, threshold)

    exploded = pages.select(
        doc_col, page_col, F.size(lines_col).alias("_n"), F.posexplode(lines_col)
    ).withColumnsRenamed({"pos": "_idx", "col": "_line"})
    tagged = exploded.select(
        doc_col,
        page_col,
        "_idx",
        "_line",
        F.when(F.col("_idx") < k, F.col("_idx")).alias("_hpos"),
        F.when(F.col("_idx") >= F.col("_n") - k, F.col("_n") - 1 - F.col("_idx")).alias(
            "_fpos"
        ),
        normalize_boilerplate(F.col("_line")).alias("_norm"),
    )

    hb = boiler.filter(F.col("side") == "h").withColumnsRenamed(
        {"pos": "_hpos", "norm": "_norm"}
    )
    fb = boiler.filter(F.col("side") == "f").withColumnsRenamed(
        {"pos": "_fpos", "norm": "_norm"}
    )
    kept = tagged.join(
        hb.select(doc_col, "_hpos", "_norm").withColumn("_is_h", F.lit(True)),
        [doc_col, "_hpos", "_norm"],
        "left",
    ).join(
        fb.select(doc_col, "_fpos", "_norm").withColumn("_is_f", F.lit(True)),
        [doc_col, "_fpos", "_norm"],
        "left",
    )
    kept = kept.filter(F.col("_is_h").isNull() & F.col("_is_f").isNull())

    return kept.groupBy(doc_col, page_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_idx").alias("i"), F.col("_line").alias("l")))
            ),
            lambda s: s["l"],
        ).alias(lines_col)
    )


def refine_pdf_pages(
    pages: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page_no",
    lines_col: str = "lines",
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Full RefinedDocument-equivalent: strip repeated headers/footers,
    join each page's lines with spaces, concatenate pages in order,
    collapse whitespace (ref get_pdf_content, pdf_extractor.py:227-258;
    the per-character F19 chain composes on top)."""
    stripped = strip_headers_footers(pages, doc_col, page_col, lines_col, k, threshold)
    page_text = stripped.select(
        doc_col, page_col, F.array_join(lines_col, " ").alias("_page_text")
    )
    assembled = (
        page_text.groupBy(doc_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(page_col).alias("p"), F.col("_page_text").alias("t")))
            ).alias("_pages")
        )
        .select(
            doc_col,
            F.trim(
                F.regexp_replace(
                    F.array_join(F.transform("_pages", lambda s: s["t"]), " "), r"\s+", " "
                )
            ).alias("text"),
        )
    )
    return assembled
