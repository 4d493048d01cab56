"""IRD le Mag' extraction — article HTML → WeLearn fields.

Reference: ``plugins/scrapers/ird_le_mag.py`` — content lives in the
Drupal settings JSON ``<script data-drupal-selector=
"drupal-settings-json">`` under ``speakeasy.content`` (:53-84),
title/description from og: meta (:86-97, :126-135), author from
``li.info-item.name`` with the 'Auteur :' prefix stripped
(:99-110), ``time.datetime`` UTC publication instant (:112-124),
``correct_text_syntax`` typography repair chain (:137-147).
"""

from __future__ import annotations

import datetime as dt
import json
import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .base import ref_clean_return_to_line_py
from .htmldom import parse_html
from .uved import clean_text

_SCRIPT_MARK = '<script type="application/json" data-drupal-selector="drupal-settings-json">'

# ref scraping_utils.py:133-156
_CLOSING_SIGN = re.compile(r"([.»\")\]}])(?=[^\s.,;:!?)»\]}])")
_LOWER_UPPER = re.compile(r"([a-zàâäéèêëîïôöùûüÿç])([A-ZÀÂÄÉÈÊËÎÏÔÖÙÛÜÇ])")


def correct_text_syntax(content: str) -> str:
    """ref ird_le_mag.py:137-147."""
    s = ref_clean_return_to_line_py(clean_text(content)) or ""
    s = _CLOSING_SIGN.sub(r"\1 ", s)
    return _LOWER_UPPER.sub(r"\1 \2", s)


def extract_ird_content(page: str) -> str:
    """ref :53-84 — JSON island between the Drupal script tags."""
    try:
        island = page.split(_SCRIPT_MARK)[1].split("</script>")[0].strip()
        content_json = json.loads(island)
    except (IndexError, json.JSONDecodeError) as e:
        raise ValueError("NoContent") from e
    try:
        return content_json["speakeasy"]["content"]
    except KeyError as e:
        raise ValueError("NoContent") from e


def extract_ird_page(html: str, url: str | None) -> dict[str, Any]:
    root = parse_html(html)

    content = correct_text_syntax(extract_ird_content(html))

    title_tag = root.find("meta", {"property": "og:title"})
    if title_tag is None or "content" not in title_tag.attrs:
        raise ValueError("NoTitle")
    title = ref_clean_return_to_line_py(title_tag.get("content")) or ""

    desc_tag = root.find("meta", {"property": "og:description"})
    if desc_tag is None or "content" not in desc_tag.attrs:
        raise ValueError("NoDescriptionFound")
    description = correct_text_syntax(desc_tag.get("content"))

    author_li = root.find("li", {"class": "name"})
    authors: list[dict[str, str] | None]
    if author_li is not None and "info-item" in (author_li.get("class") or ""):
        name = author_li.text
        if name.startswith("Auteur :"):
            name = name.replace("Auteur :", "")
        authors = [{"name": name.strip(), "misc": ""}]
    else:
        authors = [None]  # ref :99-110 returns [None] when absent

    publication_date = None
    time_tag = root.find("time", {"class": "datetime"})
    if time_tag is not None and time_tag.get("datetime"):
        try:
            publication_date = int(
                dt.datetime.strptime(time_tag.get("datetime"), "%Y-%m-%dT%H:%M:%SZ")
                .replace(tzinfo=dt.timezone.utc)
                .timestamp()
            )
        except ValueError:
            publication_date = None

    return {
        "url": url,
        "title": title,
        "description": description,
        "full_content": content,
        "details_json": json.dumps(
            {
                "authors": authors,
                "type": "article",
                "license_url": "https://lemag.ird.fr/fr/mentions-legales-0",
                "publication_date": publication_date,
            },
            ensure_ascii=False,
        ),
        "error_info": None,
    }


IRD_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("details_json", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def extract_ird_le_mag(
    df: DataFrame, payload_col: str = "payload", url_col: str = "url"
) -> DataFrame:
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    has_url = url_col in df.columns
    cols = [f.name for f in IRD_OUT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                url = r[url_col] if has_url else None
                try:
                    rows.append(extract_ird_page(r[payload_col], url))
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        dict.fromkeys(cols)
                        | {"url": url, "error_info": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=IRD_OUT_SCHEMA)
