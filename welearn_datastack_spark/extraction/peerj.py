"""PeerJ extraction — article HTML → WeLearn fields.

Reference: ``plugins/scrapers/peerj.py`` — ``_scrape_url``
(:188-245: main content after DOM cleanup, h1.article-title,
meta[name=description], DOI required), ``_get_document_details``
(:86-137: license span gate against the allow-list, citation_* meta
walk with author→institution cursor), ``_clean_dom`` (:139-166:
supplemental sections dropped, figures converted to sentence
paragraphs via ``_figure_to_paragraph`` :168-186, heading/table
remnants dropped).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .base import ref_clean_return_to_line_py
from .constants import AUTHORIZED_LICENSES
from .htmldom import Node, extract_property, parse_html


def _strip_markers(s: str) -> str:
    """ref peerj.py:30-36."""
    return s.strip(".,!? \n\t")


def figure_to_paragraph(fig: Node) -> str:
    """ref peerj.py:168-186: table figure → 'title: h: v, h: v.' rows."""
    title_el = fig.find("div", {"class": "title"})
    title = title_el.get_text() if title_el is not None else ""
    rows = fig.find_all("tr")
    if not rows:
        return ""
    headers = [_strip_markers(h.get_text()) for h in rows[0].find_all("th")]
    if not headers:
        return ""
    data = [[_strip_markers(c.get_text()) for c in row.find_all("td")] for row in rows[1:]]
    if not data:
        return ""
    sentence = ""
    for row in data:
        sentence += f"{_strip_markers(title)}: "
        for i, h in enumerate(headers):
            sentence += f"{h}: {row[i]}, "
        sentence = sentence[:-2] + ".\n"
    return sentence


def _clean_dom(main: Node) -> Node:
    """ref peerj.py:139-166."""
    for sec in main.find_all(
        "section", {"id": ["supplemental-information", "supplementary-material"]}
    ):
        sec.decompose()
    for fig in main.find_all("figure"):
        try:
            fig.replace_with_text(figure_to_paragraph(fig))
        except Exception:  # noqa: BLE001 — ref logs and decomposes
            fig.decompose()
    for el in main.find_all(["h1", "h2", "h3", "h4", "h5", "h6", "table", "figure"]):
        el.decompose()
    return main


def extract_peerj_page(html: str, url: str | None) -> dict[str, Any]:
    root = parse_html(html)

    # license gate first (ref :95-106)
    lic_span = root.find("span", {"class": "license-p"})
    if lic_span is None:
        raise ValueError("UnauthorizedLicense: No license span found")
    lic_a = lic_span.find("a")
    if lic_a is None:
        raise ValueError("UnauthorizedLicense: No license URL found")
    license_url = lic_a.get("href")
    if license_url not in AUTHORIZED_LICENSES:
        raise ValueError(f"UnauthorizedLicense: {license_url}")

    details: dict[str, Any] = {"license_url": license_url}
    authors_institutions: dict[str, list[str]] = {}
    cursor = ""
    for meta in root.find_all("meta"):
        content = meta.get("content")
        match meta.get("name"):
            case "citation_author":
                cursor = content
                authors_institutions[content] = []
            case "citation_author_institution":
                authors_institutions[cursor].append(content)
            case "citation_keywords":
                details["tags"] = [x.strip() for x in content.split(";")]
            case "citation_journal_title":
                details["journal"] = content
            case "citation_issn":
                details["issn"] = content
            case "citation_doi":
                details["doi"] = content
            case "citation_publisher":
                details["publisher"] = content
            case "citation_date":
                details["publication_date"] = (
                    dt.datetime.strptime(content, "%Y-%m-%d")
                    .replace(tzinfo=dt.timezone.utc)
                    .timestamp()
                )
    details["authors"] = [
        {"name": k, "misc": ", ".join(v)} for k, v in authors_institutions.items()
    ]

    main = root.find("main")
    if main is None:
        raise ValueError("content not found")
    content_txt = ref_clean_return_to_line_py(_clean_dom(main).text) or ""

    title = extract_property(
        root.find("h1", {"class": "article-title"}), error_property_name="title"
    )
    description = extract_property(
        root.find("meta", {"name": "description"}), error_property_name="description"
    )

    doi = details.get("doi")
    if not doi:
        raise ValueError(f"NoDOIFound: No DOI found for '{url}'")

    return {
        "url": url,
        "title": title,
        "description": description,
        "full_content": content_txt,
        "details": {
            "license_url": details.get("license_url"),
            "tags": details.get("tags"),
            "journal": details.get("journal"),
            "issn": details.get("issn"),
            "doi": doi,
            "publisher": details.get("publisher"),
            "publication_date": details.get("publication_date"),
            "authors": details["authors"],
        },
        "external_id": doi,
        "external_id_type": "DOI",
        "error_info": None,
    }


PEERJ_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField(
            "details",
            T.StructType(
                [
                    T.StructField("license_url", T.StringType()),
                    T.StructField("tags", T.ArrayType(T.StringType())),
                    T.StructField("journal", T.StringType()),
                    T.StructField("issn", T.StringType()),
                    T.StructField("doi", T.StringType()),
                    T.StructField("publisher", T.StringType()),
                    T.StructField("publication_date", T.DoubleType()),
                    T.StructField(
                        "authors",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("name", T.StringType()),
                                    T.StructField("misc", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("external_id", T.StringType()),
        T.StructField("external_id_type", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def extract_peerj(
    df: DataFrame, payload_col: str = "payload", url_col: str = "url"
) -> DataFrame:
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    has_url = url_col in df.columns
    cols = [f.name for f in PEERJ_OUT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                url = r[url_col] if has_url else None
                try:
                    rows.append(extract_peerj_page(r[payload_col], url))
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        dict.fromkeys(cols)
                        | {"url": url, "error_info": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=PEERJ_OUT_SCHEMA)


def peerj_simple_page_url(url: str) -> str:
    """ref peerj.py:196-202: ensure the .html 'simple page' variant."""
    if url.endswith(".html"):
        return url
    return (url[:-1] if url.endswith("/") else url) + ".html"
