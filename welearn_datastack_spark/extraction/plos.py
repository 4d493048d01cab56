"""PLOS extraction — maps JATS manuscript XML to WeLearn document
fields.

Reference: ``plugins/scrapers/plos.py`` —
``extract_data_from_plos_xml`` (:233-269), ``_get_document_details``
(:56-121), authors (:169-200), categories (:202-214), license gate
(:136-151), epub date (:37-54), API-url derivation (:271-287).

The XML tree walk cannot be expressed in Catalyst, so it runs as an
Arrow-batched pandas UDF inside ``mapInPandas`` — stdlib
ElementTree, one parse per row, whole-row batches move zero-copy.
The surrounding plan stays a narrow map: predicates on url/corpus
still push into the scan, and the stage parallelizes per partition
like any other map at 100 TB.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .base import clean_doi_py, ref_clean_return_to_line_py
from .constants import ANTI_URL_REGEX, AUTHORIZED_LICENSES

_XLINK_HREF = "{http://www.w3.org/1999/xlink}href"
_ANTI_URL = re.compile(ANTI_URL_REGEX)

PLOS_DETAILS_SCHEMA = T.StructType(
    [
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
        T.StructField("doi", T.StringType()),
        T.StructField("published_id", T.StringType()),
        T.StructField("journal", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("publication_date", T.LongType()),
        T.StructField("issn", T.StringType()),
        T.StructField("license_url", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("publisher", T.StringType()),
    ]
)

PLOS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("details", PLOS_DETAILS_SCHEMA),
        T.StructField("external_id", T.StringType()),
        T.StructField("external_id_type", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def _text(elem: ET.Element | None) -> str:
    """bs4 ``.text`` equivalent: all inner text, document order."""
    return "" if elem is None else "".join(elem.itertext())


def _find_with_attr(root: ET.Element, tag: str, attr: str, value: str) -> ET.Element | None:
    for el in root.iter(tag):
        if el.get(attr) == value:
            return el
    return None


def _remove_titles(body: ET.Element) -> None:
    """``title.decompose()`` (ref plos.py:246-247) — drop every
    <title> subtree but keep its tail text (bs4 keeps the text that
    follows the removed node; ET attaches it to the removed element)."""
    parents = {c: p for p in body.iter() for c in p}
    for title in list(body.iter("title")):
        parent = parents.get(title)
        if parent is None:
            continue
        tail = title.tail or ""
        idx = list(parent).index(title)
        if idx > 0:
            prev = list(parent)[idx - 1]
            prev.tail = (prev.tail or "") + tail
        else:
            parent.text = (parent.text or "") + tail
        parent.remove(title)


def _epub_timestamp(article_meta: ET.Element) -> int | None:
    """pub-date[pub-type=epub] day/month/year → UTC epoch
    (ref plos.py:37-54)."""
    import datetime as dt

    pubdate = _find_with_attr(article_meta, "pub-date", "pub-type", "epub")
    if pubdate is None:
        return None
    parts = {c.tag: (c.text or "") for c in pubdate}
    try:
        return int(
            dt.datetime(
                year=int(parts.get("year", "")),
                month=int(parts.get("month", "")),
                day=int(parts.get("day", "")),
                tzinfo=dt.timezone.utc,
            ).timestamp()
        )
    except ValueError:
        return None


def _authors(article_meta: ET.Element) -> list[dict[str, str]]:
    """contrib[contrib-type=author] → [{name, misc}] (ref
    plos.py:169-200): name = joined <name> child parts, misc =
    addr-line of the xref'd affiliation."""
    authors = []
    affs = {
        aff.get("id"): aff for aff in article_meta.iter("aff") if aff.get("id")
    }
    for contrib in article_meta.iter("contrib"):
        if contrib.get("contrib-type") != "author":
            continue
        name_tag = contrib.find("name")
        name = " ".join(
            (part.text or "").strip() for part in (name_tag or []) if part.text
        ).strip()
        misc = ""
        xref = next(
            (x for x in contrib.iter("xref") if x.get("ref-type") == "aff"), None
        )
        if xref is not None and xref.get("rid") in affs:
            addr = affs[xref.get("rid")].find("addr-line")
            if addr is not None:
                misc = _text(addr)
        authors.append(
            {
                "name": ref_clean_return_to_line_py(name) or "",
                "misc": ref_clean_return_to_line_py(misc) or "",
            }
        )
    return authors


def _categories(article_meta: ET.Element) -> list[str]:
    """subjects whose parent subj-group carries subj-group-type
    (ref plos.py:202-214). The reference collects into a ``set``
    (arbitrary iteration order under hash randomization); here
    first-occurrence document order — deterministic, same membership."""
    parents = {c: p for p in article_meta.iter() for c in p}
    seen: dict[str, None] = {}
    for subject in article_meta.iter("subject"):
        parent = parents.get(subject)
        if parent is not None and parent.get("subj-group-type"):
            seen.setdefault(_text(subject).strip())
    return list(seen)


def extract_plos_xml(xml_text: str, url: str | None) -> dict[str, Any]:
    """One manuscript XML → extracted fields dict
    (ref extract_data_from_plos_xml + _get_document_details)."""
    root = ET.fromstring(xml_text)

    body = root.find(".//body")
    if body is None:
        raise ValueError("No body found")
    _remove_titles(body)
    messy = _text(body)
    content = _ANTI_URL.sub("", messy).strip()
    content = ref_clean_return_to_line_py(content)

    article_meta = root.find(".//article-meta")
    if article_meta is None:
        raise ValueError("No article meta found")
    journal_meta = root.find(".//journal-meta")
    if journal_meta is None:
        raise ValueError("No journal meta found")

    title_el = article_meta.find(".//article-title")
    if title_el is None:
        raise ValueError("No title found")
    abstract = article_meta.find(".//abstract")
    if abstract is None:
        raise ValueError("No description found")
    desc = " ".join(_text(p) for p in abstract.iter("p"))

    license_el = article_meta.find(".//license")
    if license_el is None:
        raise ValueError("UnauthorizedLicense: No license found")
    license_url = (license_el.get(_XLINK_HREF) or "").strip()
    if license_url not in AUTHORIZED_LICENSES:
        raise ValueError(f"UnauthorizedLicense: {license_url}")

    doi_el = _find_with_attr(article_meta, "article-id", "pub-id-type", "doi")
    doi = clean_doi_py(_text(doi_el)) or ""
    pub_id_el = _find_with_attr(article_meta, "article-id", "pub-id-type", "publisher-id")

    heading = None
    cats = article_meta.find(".//article-categories")
    if cats is not None:
        heading = _find_with_attr(cats, "subj-group", "subj-group-type", "heading")

    pub_name = journal_meta.find(".//publisher-name")
    pub_loc = journal_meta.find(".//publisher-loc")
    publisher = (
        f"{_text(pub_name)}, {_text(pub_loc)}"
        if pub_name is not None and pub_loc is not None
        else ""
    )

    details = {
        "authors": _authors(article_meta),
        "doi": doi,
        "published_id": _text(pub_id_el),
        "journal": _text(journal_meta.find(".//journal-title")),
        "type": ref_clean_return_to_line_py(_text(heading)) or "",
        "publication_date": _epub_timestamp(article_meta),
        "issn": _text(journal_meta.find(".//issn")),
        "license_url": license_url,
        "tags": _categories(article_meta),
        "publisher": publisher,
    }
    return {
        "url": url,
        "title": ref_clean_return_to_line_py(_text(title_el)),
        "description": ref_clean_return_to_line_py(desc),
        "full_content": content,
        "details": details,
        "external_id": doi,
        "external_id_type": "DOI",
        "error_info": None,
    }


def extract_plos(
    df: DataFrame, payload_col: str = "payload", url_col: str = "url"
) -> DataFrame:
    """PLOS manuscript XML payloads → extracted WeLearn rows."""
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    has_url = url_col in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                url = r[url_col] if has_url else None
                try:
                    rows.append(extract_plos_xml(r[payload_col], url))
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        {
                            "url": url,
                            "title": None,
                            "description": None,
                            "full_content": None,
                            "details": None,
                            "external_id": None,
                            "external_id_type": None,
                            "error_info": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in PLOS_OUT_SCHEMA.fields])

    return df.mapInPandas(run, schema=PLOS_OUT_SCHEMA)


def plos_api_url(url: str) -> str:
    """Article URL → manuscript-XML API URL (ref plos.py:271-287)."""
    from urllib.parse import urlparse, urlunparse

    p = urlparse(url)
    return urlunparse(
        (p.scheme, p.netloc, f"{p.path}/file", p.params, f"{p.query}&type=manuscript", p.fragment)
    )
