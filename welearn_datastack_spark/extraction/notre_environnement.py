"""notre-environnement extraction — article HTML → WeLearn fields.

Reference: ``plugins/scrapers/notre_environnement.py`` — full
content via trafilatura ``extract`` (:42-47), Dublin Core metadata
via extruct (:49-73: meta elements accumulated str-or-list), field
mapping ``_compute_metadata`` (:75-99: description / DC.title /
DC.date / DC.data.modified, '~' → ' ' in titles).

Third-party stand-ins (both pluggable):
- ``content_fn`` replaces trafilatura — the default STUB concatenates
  ``<p>`` text under article/main/body, which approximates the main-
  content extraction; swap in real trafilatura in production.
- Dublin Core metadata is read from ``<meta name="DC.*">`` /
  ``<meta name="description">`` elements (extruct's dublincore
  source) with the same str-or-list accumulation.
"""

from __future__ import annotations

import datetime as dt
import json
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .base import ref_clean_return_to_line_py
from .htmldom import Node, parse_html
from .uved import clean_text


def stub_main_content(root: Node) -> str | None:
    """Trafilatura stand-in: paragraph text under the most article-ish
    container. STUB — production injects trafilatura via content_fn."""
    for tag in ("article", "main", "body"):
        container = root.find(tag)
        if container is None:
            continue
        paras = [p.text.strip() for p in container.find_all("p")]
        # space-joined: the downstream clean_return_to_line REMOVES
        # newlines, which would glue paragraph boundaries together
        text = " ".join(p for p in paras if p)
        if text:
            return text
    return None


def dublin_core_metadata(root: Node) -> dict[str, Any]:
    """ref :49-73 — name→content with str-or-list accumulation."""
    ret: dict[str, Any] = {}
    for meta in root.find_all("meta"):
        name = meta.get("name") or ""
        content = meta.get("content") or ""
        if not name or not content:
            continue
        if not (name.lower().startswith("dc.") or name.lower() == "description"):
            continue
        if name in ret:
            if not isinstance(ret[name], list):
                ret[name] = [ret[name]]
            ret[name].append(content)
        else:
            ret[name] = content
    return ret


def extract_notre_environnement_page(
    html: str, url: str | None, content_fn: Callable[[Node], str | None]
) -> dict[str, Any]:
    root = parse_html(html)

    raw_content = content_fn(root)
    if not raw_content:
        raise ValueError("NoContent")
    full_content = clean_text(ref_clean_return_to_line_py(raw_content))

    md = dublin_core_metadata(root)
    title = None
    description = None
    details: dict[str, Any] = {}
    for name, value in md.items():
        low = name.lower()
        if low == "description":
            description = value
        elif low == "dc.title":
            title = value
        elif low == "dc.date":
            details["publication_date"] = int(
                dt.datetime.strptime(value, "%Y-%m-%d")
                .replace(tzinfo=dt.timezone.utc)
                .timestamp()
            )
        elif low == "dc.data.modified":
            details["update_date"] = int(
                dt.datetime.strptime(value, "%Y-%m-%d")
                .replace(tzinfo=dt.timezone.utc)
                .timestamp()
            )
    if isinstance(title, str):
        title = title.replace("~", " ")  # ref :99

    return {
        "url": url,
        "title": title,
        "description": description if isinstance(description, str) else None,
        "full_content": full_content,
        "details_json": json.dumps(details, ensure_ascii=False),
        "error_info": None,
    }


NE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("details_json", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def extract_notre_environnement(
    df: DataFrame,
    payload_col: str = "payload",
    url_col: str = "url",
    content_fn: Callable[[Node], str | None] | None = None,
) -> DataFrame:
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    has_url = url_col in df.columns
    fn = content_fn or stub_main_content
    cols = [f.name for f in NE_OUT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                url = r[url_col] if has_url else None
                try:
                    rows.append(
                        extract_notre_environnement_page(r[payload_col], url, fn)
                    )
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        dict.fromkeys(cols)
                        | {"url": url, "error_info": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=NE_OUT_SCHEMA)
