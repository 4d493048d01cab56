"""UNCC:eLearn extraction — course page HTML (+ optional pre-fetched
syllabus-PDF text) → WeLearn fields.

Reference: ``plugins/scrapers/unccelearn.py`` — ``_scrape_document``
(:185-215: Tika-extracted page title/description/og:image/keywords,
details div, syllabus PDF content with degraded description fallback),
``_get_details`` (:88-118: theme / duration / certification /
course-type), ``_convert_duration_to_seconds`` (:65-86: '3 hours',
'3,5 hours', '3-4 hours').

The reference sends the page to Tika's /meta for dc:title /
dc:description / og:image / keywords; for an HTML payload those are
exactly the <title> and <meta> elements, read here with the stdlib
DOM — no service round-trip.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .conversation import format_news_keywords
from .htmldom import Node, parse_html


def convert_duration_to_seconds(duration_str: str) -> int:
    """ref unccelearn.py:65-86."""
    s = duration_str.replace("hours", "").strip()
    if "," in s:
        s = s.replace(",", ".")
    if "-" in s:
        a, b = s.split("-")
        hours = (float(a) + float(b)) / 2
    else:
        hours = float(s)
    return int(hours * 3600)


def _details_from_page(root: Node) -> dict[str, Any]:
    """ref _get_details (:88-118)."""
    page_details = root.find("div", {"class": "details"})
    details: dict[str, Any] = {}
    if page_details is None:
        return details
    theme = page_details.find("p", {"class": "thematic-areas"})
    if theme is not None:
        details["theme"] = theme.text.strip().lower()
    duration = page_details.find("p", {"class": "time"})
    if duration is not None:
        details["duration"] = convert_duration_to_seconds(duration.text.strip())
    certification = page_details.find("p", {"class": "certification"})
    if certification is not None:
        details["certifying"] = (
            certification.text.strip().lower().startswith("with certification")
        )
    type_el = page_details.find("p", {"class": "type"})
    if type_el is not None:
        details["course-type"] = type_el.text.strip().lower()
    return details


def _meta_content(root: Node, **attr) -> str:
    el = root.find("meta", attr)
    return (el.get("content") or "") if el is not None else ""


def extract_unccelearn_page(
    html: str, url: str | None, pdf_text: str | None
) -> dict[str, Any]:
    root = parse_html(html)

    title_el = root.find("title")
    doc_title = title_el.text.strip() if title_el is not None else ""
    doc_desc = _meta_content(root, name="description")

    details = _details_from_page(root)
    details["image"] = _meta_content(root, property="og:image") or _meta_content(
        root, name="og:image"
    )
    details["keywords"] = format_news_keywords(
        _meta_content(root, name="keywords") or None
    )
    details["type"] = "MOOC"

    has_pdf_link = root.find("a", {"id": "overview_syllabus_download"}) is not None
    if has_pdf_link and pdf_text:
        content = pdf_text
        details["content_from_pdf"] = True
        details["produced_date"] = None  # Tika docinfo only exists with a live fetch
    else:
        # degraded mode (ref :199-206): description stands in
        content = doc_desc
        details["content_from_pdf"] = False

    return {
        "url": url,
        "title": doc_title,
        "description": doc_desc,
        "full_content": content,
        "details_json": json.dumps(details, ensure_ascii=False),
        "error_info": None,
    }


UNCC_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("details_json", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def extract_unccelearn(
    df: DataFrame,
    payload_col: str = "payload",
    url_col: str = "url",
    pdf_text_col: str | None = None,
) -> DataFrame:
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    has_url = url_col in df.columns
    cols = [f.name for f in UNCC_OUT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                url = r[url_col] if has_url else None
                text = r[pdf_text_col] if pdf_text_col else None
                try:
                    rows.append(extract_unccelearn_page(r[payload_col], url, text))
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        dict.fromkeys(cols)
                        | {"url": url, "error_info": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=UNCC_OUT_SCHEMA)
