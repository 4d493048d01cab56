"""The Conversation extraction — article HTML → WeLearn fields.

Reference: ``plugins/scrapers/conversation.py`` — ``_scrape_url``
(:111-148: h1[itemprop=headline], meta[og:description],
div[itemprop=articleBody]), ``_get_document_details`` (:53-108:
li.vcard authors with role, news_keywords split, commissioning
region, pubdate %Y%m%d, og:updated_time), lang sniff from the
``content_language`` inline script (:42-51).

HTML walks run in an Arrow-batched pandas UDF over the stdlib DOM
(extraction/htmldom.py) — same narrow-map scale shape as the other
scrapers.
"""

from __future__ import annotations

import datetime as dt
import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .base import ref_clean_return_to_line_py
from .htmldom import extract_property, parse_html

# ref regular_expression.py:17
_SINGLE_QUOTED_WORD = re.compile(r"'([A-Za-z]+)'")


def format_news_keywords(raw: str | None) -> list[str]:
    """ref conversation.py:25-32."""
    if raw is None:
        return []
    if "," in raw:
        return [k.strip() for k in raw.split(",")]
    return [raw.strip()]


def extract_conversation_page(html: str, url: str | None) -> dict[str, Any]:
    root = parse_html(html)

    title = extract_property(
        root.find("h1", {"itemprop": "headline"}), error_property_name="Title"
    )
    description = extract_property(
        root.find("meta", {"property": "og:description"}),
        error_property_name="Description",
    )
    content = extract_property(
        root.find("div", {"itemprop": "articleBody"}), error_property_name="content"
    )

    authors = []
    for vcard in root.find_all("li", {"class": "vcard"}):
        name_el = vcard.find("span")
        role_el = vcard.find("p", {"class": "role"})
        authors.append(
            {
                "name": ref_clean_return_to_line_py(name_el.text if name_el else "") or "",
                "misc": (ref_clean_return_to_line_py(role_el.text) or "").strip()
                if role_el
                else "",
            }
        )

    kw_meta = root.find("meta", {"name": "news_keywords"})
    news_keywords = format_news_keywords(kw_meta.get("content") if kw_meta else None)

    region_meta = root.find("meta", {"name": "commissioning-region"})
    region = region_meta.get("content") if region_meta else None

    pub_meta = root.find("meta", {"name": "pubdate"})
    publication_date = None
    if pub_meta is not None:
        publication_date = (
            dt.datetime.strptime(pub_meta.get("content"), "%Y%m%d")
            .replace(tzinfo=dt.timezone.utc)
            .timestamp()
        )
    upd_meta = root.find("meta", {"property": "og:updated_time"})
    update_date = None
    if upd_meta is not None:
        update_date = (
            dt.datetime.strptime(upd_meta.get("content"), "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=dt.timezone.utc)
            .timestamp()
        )

    lang = ""
    for script in root.find_all("script"):
        if "content_language" in script.text:
            m = _SINGLE_QUOTED_WORD.findall(script.text)
            if m:
                lang = m[0]
                break

    return {
        "url": url,
        "title": title,
        "description": description,
        "full_content": content,
        "lang": lang or None,
        "authors": authors,
        "news_keywords": news_keywords,
        "commissioning_region": region,
        "publication_date": publication_date,
        "update_date": update_date,
        "error_info": None,
    }


CONVERSATION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("lang", T.StringType()),
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
        T.StructField("news_keywords", T.ArrayType(T.StringType())),
        T.StructField("commissioning_region", T.StringType()),
        T.StructField("publication_date", T.DoubleType()),
        T.StructField("update_date", T.DoubleType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def extract_conversation(
    df: DataFrame, payload_col: str = "payload", url_col: str = "url"
) -> DataFrame:
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    has_url = url_col in df.columns
    cols = [f.name for f in CONVERSATION_OUT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                url = r[url_col] if has_url else None
                try:
                    rows.append(extract_conversation_page(r[payload_col], url))
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        dict.fromkeys(cols)
                        | {"url": url, "error_info": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=CONVERSATION_OUT_SCHEMA)
