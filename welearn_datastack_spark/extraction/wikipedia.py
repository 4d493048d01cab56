"""Wikipedia extraction — page summary + recursively flattened
sections, language-specific boilerplate sections dropped.

Reference: ``plugins/rest_requesters/wikipedia.py`` —
``get_sections`` (:52-58, recursive flatten with per-lang blacklist),
``_get_article_content`` (:66-105: lang from URL, redirect rejection,
``full_content`` = summary + 'title text' per kept section).

The payload is the natural JSON serialization of a WikipediaPage
(title, summary, redirect flag, recursive ``sections`` tree) — the
shape a fetch stage persists from the MediaWiki API. The tree has
unbounded depth, so it flattens in an Arrow-batched pandas UDF; the
stage is still a narrow per-row map.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .constants import WIKIPEDIA_SECTIONS_BLACKLIST

# ref regular_expression.py:22 — first match, last two chars
_LANG_CODE_IN_URL = re.compile(r"https://([a-z]{2})")

WIKI_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def flatten_sections(
    sections: list[dict[str, Any]], lang: str, level: int = 0
) -> dict[str, str]:
    """ref get_sections (wikipedia.py:52-58): depth-first flatten,
    blacklist filter at every level, later duplicates overwrite
    (dict union semantics)."""
    blacklist = WIKIPEDIA_SECTIONS_BLACKLIST.get(lang, [])
    contents: dict[str, str] = {}
    for s in sections or []:
        if s.get("title") not in blacklist:
            contents[s.get("title") or ""] = s.get("text") or ""
        contents = contents | flatten_sections(s.get("sections") or [], lang, level + 1)
    return contents


def extract_wikipedia_page(payload: str, url: str) -> dict[str, Any]:
    """One serialized page → extracted fields
    (ref _get_article_content, wikipedia.py:66-105)."""
    m = _LANG_CODE_IN_URL.match(url or "")
    if not m:
        raise ValueError(f"no lang code in url {url!r}")
    lang = m.group(0)[-2:]

    page = json.loads(payload)
    if page.get("redirect"):
        raise ValueError(f"NoContent: Page {url} is a redirection, not an article")

    summary = page.get("summary") or ""
    contents = flatten_sections(page.get("sections") or [], lang)
    full_content = " ".join([summary] + [" ".join([k, v]) for k, v in contents.items()])
    return {
        "url": url,
        "title": page.get("title"),
        "description": summary,
        "full_content": full_content,
        "lang": lang,
        "error_info": None,
    }


def extract_wikipedia(
    df: DataFrame, payload_col: str = "payload", url_col: str = "url"
) -> DataFrame:
    """Serialized Wikipedia pages → extracted WeLearn rows."""
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    rows.append(extract_wikipedia_page(r[payload_col], r[url_col]))
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        {
                            "url": r[url_col],
                            "title": None,
                            "description": None,
                            "full_content": None,
                            "lang": None,
                            "error_info": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WIKI_OUT_SCHEMA.fields])

    return df.mapInPandas(run, schema=WIKI_OUT_SCHEMA)
