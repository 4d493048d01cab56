"""Pressbooks extraction — wp-json post content + metadata JSON →
WeLearn fields.

Reference: ``plugins/rest_requesters/pressbooks.py`` — ``run``
(:229-352: license gate, composed title, content clean, first-three-
sentences description, author/editor/publisher details),
``_compose_title`` (:221-236), ``_extract_three_first_sentences``
(:74-84, spaCy sents — stubbed here with the repo's regex sentence
splitter, functions/udfs.py:split_sentences), URL helpers (:41-59).

Each row carries the post-content payload and the metadata payload
(the reference's two GETs against ``/wp-json/pressbooks/v2/<type>/
<id>`` and ``/metadata``); the post type comes from a column (the
reference derives it from a redirect, a network concern outside
extraction).

Deviation (documented): the reference's date parsing uses naive
``datetime.timestamp()`` (local timezone); pinned to UTC here.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any
from urllib.parse import urlparse, urlunparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.udfs import split_sentences
from .constants import AUTHORIZED_LICENSES
from .uved import clean_text


def book_main_url(url: str) -> str:
    """ref :46-54."""
    p = urlparse(url)
    return urlunparse((p.scheme, p.netloc, p.path, "", "", ""))


def post_id_from_url(url: str) -> str:
    """ref :56-59."""
    return urlparse(url).query.replace("p=", "")


def pressbook_id(main_url: str, post_id: int | str) -> str:
    """ref :41-43."""
    return f"{main_url}?p={post_id}"


def three_first_sentences(text: str) -> str:
    """ref :74-84 (spaCy stub → regex splitter)."""
    sentences = split_sentences(text)
    return " ".join(sentences[:3]) if len(sentences) >= 3 else text


def extract_pressbooks_post(
    content_payload: str, metadata_payload: str, url: str | None, post_type: str
) -> dict[str, Any]:
    import datetime as dt

    raw = json.loads(content_payload)
    meta = json.loads(metadata_payload)

    license_url = ((meta.get("license") or {}).get("url")) or ""
    if license_url not in AUTHORIZED_LICENSES:
        raise ValueError(f"UnauthorizedLicense: License {license_url} is not authorized")

    book_title = clean_text(meta.get("isPartOf"))
    element_title = clean_text(meta.get("name"))
    title = f"{book_title} - {element_title}" if book_title else element_title

    content = clean_text(((raw.get("content") or {}).get("raw")) or "")

    def ts(value: str | None, fmt: str) -> float | None:
        if not value:
            return None
        return (
            dt.datetime.strptime(value, fmt)
            .replace(tzinfo=dt.timezone.utc)
            .timestamp()
        )

    pubdate = ts(meta.get("date_gmt"), "%Y-%m-%dT%H:%M:%S") or ts(
        meta.get("datePublished"), "%Y-%m-%d"
    )
    update_date = ts(meta.get("modified_gmt"), "%Y-%m-%dT%H:%M:%S")

    authors = [
        {
            "name": clean_text(a.get("name")) or "",
            "misc": clean_text(a.get("contributor_institution")),
        }
        for a in meta.get("author") or []
    ]
    editors = [{"name": clean_text(e.get("name")) or ""} for e in meta.get("editor") or []]
    publisher = (meta.get("publisher") or {}).get("name")

    main_url = book_main_url(url) if url else None
    details = {
        "license": license_url,
        "update_date": update_date,
        "publication_date": pubdate,
        "authors": authors,
        "editors": editors,
        "publisher": publisher,
        "type": post_type,
        "partOf": {"element": main_url, "order": None},
    }
    return {
        "url": url,
        "title": title,
        "description": three_first_sentences(content),
        "full_content": content,
        "details_json": json.dumps(details, ensure_ascii=False),
        "error_info": None,
    }


PB_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("details_json", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def extract_pressbooks(
    df: DataFrame,
    content_col: str = "payload",
    metadata_col: str = "metadata_payload",
    url_col: str = "url",
    type_col: str | None = None,
) -> DataFrame:
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    has_url = url_col in df.columns
    cols = [f.name for f in PB_OUT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                url = r[url_col] if has_url else None
                ptype = r[type_col] if type_col else "chapters"
                try:
                    rows.append(
                        extract_pressbooks_post(r[content_col], r[metadata_col], url, ptype)
                    )
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        dict.fromkeys(cols)
                        | {"url": url, "error_info": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=PB_OUT_SCHEMA)
