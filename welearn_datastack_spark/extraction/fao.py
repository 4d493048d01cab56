"""FAO Open Knowledge extraction — DSpace item JSON (+ pre-fetched
PDF text) → WeLearn fields.

Reference: ``plugins/rest_requesters/fao_open_knowledge.py`` — ``run``
(:264-310: license gate → withdrawn gate → embargo gate → PDF
content → abstract), ``_extract_licence`` (:97-110 with
``format_cc_license``), ``_extract_embargo_status`` (:112-121: any
value other than 'No' means embargoed), ``_extract_authors``
(:123-141: ';'-split), ``_extract_external_sdgs`` (:193-210: leading
number, zero-stripping quirk preserved), ``_extract_details``
(:212-253).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .constants import AUTHORIZED_LICENSES
from .uved import clean_text


def format_cc_license(license_str: str | None) -> str | None:
    """ref modules/scraping_utils.py:59-74."""
    if not isinstance(license_str, str):
        return license_str
    parts = license_str.split("-")
    version = parts[-1].strip()
    rights = "-".join(parts[1:-1]).strip().lower()
    return f"https://creativecommons.org/licenses/{rights}/{version.lower()}/"


def extract_external_sdgs(values: list[str]) -> list[int]:
    """ref fao_open_knowledge.py:193-210 — leading token, dots
    stripped; the reference's zero-strip quirk ('07'→'7' but '10'
    untouched) is preserved verbatim."""
    ret: list[int] = []
    for raw in values:
        first = raw.lower().strip().split(" ")[0].replace(".", "")
        if not first.isdigit():
            continue
        if first != "10" and "0" in first:
            first = first.replace("0", "")
        try:
            ret.append(int(first))
        except ValueError:
            continue
    return ret


def _md_values(md: dict, key: str) -> list[str]:
    return [e.get("value", "") for e in (md.get(key) or []) if isinstance(e, dict)]


def _md_first(md: dict, key: str) -> str:
    vals = _md_values(md, key)
    return vals[0] if vals else ""


def extract_fao_item(
    item: dict, pdf_text: str | None
) -> dict[str, Any]:
    import datetime as dt

    md = item.get("metadata") or {}

    raw_license = _md_first(md, "dc.rights.license")
    if not raw_license:
        raise ValueError("UnauthorizedLicense: No license found.")
    license_url = format_cc_license(raw_license.replace(" ", "-"))
    if license_url not in AUTHORIZED_LICENSES:
        raise ValueError(f"UnauthorizedLicense: License '{license_url}' is not authorized.")

    if item.get("withdrawn"):
        raise ValueError("UnauthorizedState: Document is withdrawn from source.")
    embargo = _md_first(md, "fao.embargo")
    if embargo and embargo.lower().strip() != "no":
        raise ValueError("UnauthorizedState: Document is under fao embargo.")

    if pdf_text is None or not pdf_text.strip():
        raise ValueError("NoContent: No content extracted from PDF.")
    full_content = clean_text(pdf_text)

    description = _md_first(md, "dc.description.abstract")
    if not description or description.isspace():
        raise ValueError("NoDescriptionFound: No description found.")

    authors = []
    for entry in _md_values(md, "dc.contributor.author"):
        for name in entry.split(";"):
            if name.strip():
                authors.append({"name": name.strip(), "misc": ""})

    def ts(key: str) -> float | None:
        v = _md_first(md, key)
        if not v:
            return None
        return (
            dt.datetime.strptime(v, "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=dt.timezone.utc)
            .timestamp()
        )

    details = {
        "publication_date": ts("dc.date.available"),
        "update_date": ts("dc.date.lastModified"),
        "isbn": _md_first(md, "dc.identifier.isbn"),
        "license_url": license_url,
        "authors": authors,
        "external_sdg": extract_external_sdgs(_md_values(md, "fao.sdgs")),
        "content_from_pdf": True,
        "doi": _md_first(md, "dc.identifier.doi"),
        "type": _md_first(md, "fao.taxonomy.type"),
    }
    return {
        "title": item.get("name"),
        "description": clean_text(description),
        "full_content": full_content,
        "details_json": json.dumps(details, ensure_ascii=False),
        "external_id": item.get("uuid"),
        "error_info": None,
    }


FAO_OUT_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("details_json", T.StringType()),
        T.StructField("external_id", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def extract_fao(
    df: DataFrame, payload_col: str = "payload", pdf_text_col: str | None = None
) -> DataFrame:
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    cols = [f.name for f in FAO_OUT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                text = r[pdf_text_col] if pdf_text_col else None
                try:
                    rows.append(extract_fao_item(json.loads(r[payload_col]), text))
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        dict.fromkeys(cols)
                        | {"error_info": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=FAO_OUT_SCHEMA)


_ = re  # imported for parity helpers that may extend this module
