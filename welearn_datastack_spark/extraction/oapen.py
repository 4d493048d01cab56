"""OAPEN extraction — DSpace REST item JSON → WeLearn fields.

Reference: ``plugins/rest_requesters/oapen.py`` —
``_update_welearn_document`` (:157-328: ORIGINAL/TEXT bitstream
selection, CC code → canonical URL license gate, abstract chosen by
matching its detected language against ``dc.language``, 'Last,
First' author/editor normalization, ';'-split tags),
``_format_metadata`` (:139-155: key→value with str-or-list
accumulation), ``clean_backline`` (:84-96).

str-or-list metadata folding plus language detection make this a
pandas-UDF plugin. Language ID uses the repo's stub detector markers
(functions/udfs.py — lingua stand-in); the real detector drops in
via ``detect_fn``.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.udfs import _MARKERS
from .constants import AUTHORIZED_LICENSES

BASE_URL = "https://library.oapen.org/"

# ref regular_expression.py:28,33,38
_WORD_CUT = re.compile(r"-\s*\n\s*")
_SOFT_BREAK = re.compile(r"(?<![\.\:\?\!])\s*\n\s*")
_BLANKS = re.compile(r"\s+")

# lingua Language.from_str(name) → iso639-1 (subset the corpus uses)
LANG_NAME_TO_ISO2 = {
    "english": "en", "french": "fr", "german": "de", "spanish": "es",
    "italian": "it", "dutch": "nl", "portuguese": "pt",
}


def clean_backline(text: str) -> str:
    """ref oapen.py:84-96."""
    text = _WORD_CUT.sub("", text)
    text = _SOFT_BREAK.sub(" ", text)
    text = text.replace("\n", " ")
    return _BLANKS.sub(" ", text).strip()


def _default_detect(text: str) -> str | None:
    """Marker-token vote — the same stub heuristic as
    functions/udfs.detect_language (lingua stand-in)."""
    toks = re.findall(r"\w+", (text or "").lower())
    if not toks:
        return None
    scores = {lang: sum(t in m for t in toks) for lang, m in _MARKERS.items()}
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] > 0 else None


def format_metadata(metadata: list[dict]) -> dict[str, Any]:
    """ref _format_metadata (:139-155): repeated keys accumulate into
    lists, single keys stay strings."""
    ret: dict[str, Any] = {}
    for m in metadata:
        key, value = m.get("key"), m.get("value")
        if key in ret:
            if isinstance(ret[key], list):
                ret[key].append(value)
            else:
                ret[key] = [ret[key], value]
        else:
            ret[key] = value
    return ret


def _person_list(raw: Any) -> list[dict[str, str]]:
    """'Last, First' → 'First Last' structs (ref :263-283); a
    comma-less name raises like the reference's split[1]."""
    if raw is None:
        return []
    items = [raw] if isinstance(raw, str) else list(raw)
    out = []
    for person in items:
        parts = person.split(", ")
        out.append({"name": f"{parts[1]} {parts[0]}", "misc": ""})
    return out


def extract_oapen_item(
    item: dict,
    content_text: str | None,
    detect_fn: Callable[[str], str | None],
) -> dict[str, Any]:
    title = item.get("name")
    handle = item.get("handle")
    url = f"{BASE_URL}handle/{handle}"

    is_txt = False
    well_formatted_license = ""
    for bitstream in item.get("bitstreams") or []:
        bundle = (bitstream.get("bundleName") or "").lower()
        if bundle == "original":
            code = (bitstream.get("code") or "").lower().replace("cc-", "")
            well_formatted_license = (
                f"https://creativecommons.org/licenses/{code}/4.0/"
            )
        elif bundle == "text":
            is_txt = True
    if well_formatted_license not in AUTHORIZED_LICENSES:
        raise ValueError(
            f"UnauthorizedLicense: License {well_formatted_license} is not authorized"
        )

    if content_text is None:
        raise ValueError("NoContent: content fetch is a separate stage")
    content = clean_backline(content_text) if is_txt else content_text

    md = format_metadata(item.get("metadata") or [])

    abstracts: list[str] = []
    if isinstance(md.get("dc.description.abstract"), str):
        abstracts.append(md["dc.description.abstract"])
    other = md.get("oapen.abstract.otherlanguage")
    if isinstance(other, str):
        abstracts.append(other)
    elif isinstance(other, list):
        abstracts.extend(other)
    if not abstracts:
        raise ValueError("NoDescriptionFound: No description found in this document")

    dc_lang = md.get("dc.language")
    if not isinstance(dc_lang, str):
        raise ValueError("TooMuchLanguages: Too much languages in metadata")
    lang = LANG_NAME_TO_ISO2.get(dc_lang.lower())
    if lang is None:
        raise ValueError(f"WrongLangFormat: This language cannot be handled : {dc_lang}")

    desc = ""
    for abstract in abstracts:
        if detect_fn(abstract) == lang:
            desc = abstract
            break
    if not desc:
        raise ValueError("NoDescriptionFound: No description found in this document")

    pub_date = None
    if isinstance(md.get("dc.date.available"), str):
        import datetime as dt

        pub_date = (
            dt.datetime.strptime(md["dc.date.available"], "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=dt.timezone.utc)
            .timestamp()
        )

    doi = ""
    if isinstance(md.get("dc.identifier.uri"), str):
        doi = md["dc.identifier.uri"].replace(BASE_URL + "handle/", "")

    classification = md.get("dc.subject.classification") or []
    if isinstance(classification, str):
        classification = [classification]

    tags: list[str] = []
    raw_tags = md.get("dc.subject.other")
    if isinstance(raw_tags, str):
        tags = raw_tags.lower().split(";")
    elif isinstance(raw_tags, list):
        for tag in raw_tags:
            tags.extend(tag.lower().split(";"))

    details = {
        "publisher": md.get("publisher.name", ""),
        "doi": doi,
        "type": md.get("dc.type", ""),
        "isbn": md.get("dc.identifier.isbn", ""),
        "publication_date": pub_date,
        "authors": _person_list(md.get("dc.contributor.author")),
        "editors": _person_list(md.get("dc.contributor.editor")),
        "license": well_formatted_license,
        "classification": classification,
        "tags": tags,
        "content_from_pdf": not is_txt,
        "content_from_txt": is_txt,
    }
    return {
        "url": url,
        "title": title,
        "description": desc,
        "full_content": content,
        "lang": lang,
        "details_json": json.dumps(details, ensure_ascii=False),
        "error_info": None,
    }


OAPEN_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("details_json", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def extract_oapen(
    df: DataFrame,
    payload_col: str = "payload",
    content_text_col: str | None = None,
    detect_fn: Callable[[str], str | None] | None = None,
) -> DataFrame:
    """DSpace item JSON rows (one item per row) → extracted rows."""
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    detect = detect_fn or _default_detect
    cols = [f.name for f in OAPEN_OUT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r[content_text_col] if content_text_col else None
                try:
                    rows.append(
                        extract_oapen_item(json.loads(r[payload_col]), content, detect)
                    )
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        dict.fromkeys(cols)
                        | {"error_info": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=OAPEN_OUT_SCHEMA)
