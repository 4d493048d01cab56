"""OpenEdition Books extraction — METS/Dublin-Core XML (+ chapter
HTML) → WeLearn fields.

Reference: ``plugins/scrapers/oe_books.py`` — ``_scrape_url``
(:33-263: book vs chapter dispatch on the document's dmdSec type,
chapter order via ID-sorted chapter dmdSecs, open-access +
license gates deciding whether the chapter body or only the
description is kept, span/a stripping before ``anchor-fulltext``
text), helpers ``_get_doi_and_isbn`` (:269-281 urn:doi/urn:isbn),
``_get_authors`` (:283-296 'Last, First'), ``_get_current_license``
(:298-303), ``_get_description`` (:305-320 abstract-by-lang with
description fallback), ``_is_open_access`` (:322-334); regex XML
walk ``modules/xml_extractor.py:55-101``.

Each row carries the (parent) METS payload and, for chapters, the
page HTML; fetching is outside extraction.
"""

from __future__ import annotations

import datetime as dt
import json
import re
from collections.abc import Iterator
from typing import Any, NamedTuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .constants import AUTHORIZED_LICENSES
from .htmldom import parse_html

OE_BASE = "https://books.openedition.org/"

# ref regular_expression.py:52 + :80-90
_ATTR_RE = re.compile(r'([\w:]+)="([^"]*)"')


class XmlData(NamedTuple):
    content: str
    attributes: dict[str, str]


def _tag_re(tag: str) -> re.Pattern:
    escaped = re.escape(tag)
    return re.compile(rf"<{escaped}\b([^>]*?)(?:\s*/>|>(.*?)</{escaped}>)", re.DOTALL)


def extract_content(xml: str, tag: str) -> list[XmlData]:
    """ref xml_extractor.py:55-78."""
    out = []
    for m in _tag_re(tag).findall(xml):
        out.append(XmlData(content=m[1].strip(), attributes=dict(_ATTR_RE.findall(m[0]))))
    return out


def extract_content_attr(
    xml: str, tag: str, attribute_name: str, attribute_value: str | None = None
) -> list[XmlData]:
    """ref xml_extractor.py:80-101."""
    ret = []
    for data in extract_content(xml, tag):
        if attribute_value is None:
            if attribute_name in data.attributes:
                ret.append(data)
        elif data.attributes.get(attribute_name) == attribute_value:
            ret.append(data)
    return ret


def _doi_isbn(xml: str) -> tuple[str, str]:
    doi = isbn = ""
    for urn in extract_content_attr(xml, "dcterms:identifier", "scheme", "URN"):
        if urn.content.startswith("urn:doi:"):
            doi = urn.content.replace("urn:doi:", "")
        elif urn.content.startswith("urn:isbn:"):
            isbn = urn.content.replace("urn:isbn:", "")
    return doi, isbn


def _authors(xml: str) -> list[dict[str, str]]:
    ret = []
    for author in extract_content(xml, "dcterms:creator"):
        first = author.content.split(",")[1].strip()
        last = author.content.split(",")[0].strip()
        ret.append({"name": f"{first} {last}", "misc": ""})
    return ret


def _description(xml: str, lang: str) -> str:
    abstracts = extract_content_attr(xml, "dcterms:abstract", "xml:lang", lang)
    if abstracts:
        return abstracts[0].content
    return extract_content(xml, "dcterms:description")[0].content


def _is_open_access(xml: str) -> bool:
    rights = extract_content(xml, "dcterms:accessRights")
    if not rights:
        return False
    return all(r.content.lower().split("/")[-1].strip() == "openaccess" for r in rights)


def extract_oe_record(
    url: str, mets_xml: str, page_html: str | None
) -> dict[str, Any]:
    md_id = url.replace(OE_BASE, "")
    dmdid = f"MD_OB_{md_id.replace('/', '_')}"

    dmds = extract_content(mets_xml, "mets:dmdSec")
    dmds.sort(key=lambda d: d.attributes.get("ID", ""))
    own = next((d for d in dmds if d.attributes.get("ID") == dmdid), None)
    resource_type = (
        extract_content(own.content, "dcterms:type")[0].content if own else ""
    )
    if not resource_type and page_html:
        root = parse_html(page_html)
        meta = root.find("meta", {"name": "citation_inbook_title"})
        resource_type = "chapter" if meta is not None else ""

    details: dict[str, Any] = {"partOf": []}
    title = desc = None
    content = ""

    if resource_type == "book":
        details["type"] = "book"
        book_dmd = next(
            (
                d
                for d in dmds
                if extract_content(d.content, "dcterms:type")
                and extract_content(d.content, "dcterms:type")[0].content == "book"
            ),
            None,
        )
        if book_dmd is None:
            raise ValueError("No book DMD section found")
        bx = book_dmd.content
        lang_items = extract_content_attr(bx, "dcterms:language", "xsi:type", "dcterms:RFC1766")
        desc_lang = lang_items[0].content if lang_items else ""
        details["license"] = extract_content(bx, "dcterms:rights")[0].content
        desc = _description(bx, desc_lang)
        content = desc
        title = extract_content(bx, "dcterms:title")[0].content
        details["authors"] = _authors(bx)
        details["doi"], details["isbn"] = _doi_isbn(bx)
    elif resource_type == "chapter":
        details["type"] = "chapter"
        if page_html is None:
            raise ValueError("chapter extraction needs the page HTML")
        root = parse_html(page_html)
        parent_link = root.find("link", {"rel": "Contents"})
        parent_url = parent_link.get("href") if parent_link is not None else None

        if not _is_open_access(mets_xml):
            raise ValueError("ClosedAccessContent: Access rights not open access")

        local = None
        order_i = 0
        for d in dmds:
            types = extract_content(d.content, "dcterms:type")
            if types and types[0].content == "chapter":
                if d.attributes.get("ID") == dmdid:
                    local = d.content
                    details["partOf"].append({"element": parent_url, "order": order_i})
                    order_i += 1
                    break
        if local is None:
            raise ValueError(f"The DMD section related to DMDID was not found {dmdid}")

        details["doi"], details["isbn"] = _doi_isbn(local)
        book_title = extract_content(mets_xml, "dcterms:title")[0].content
        chapter_title = extract_content(local, "dcterms:title")[0].content
        title = f"{book_title} - {chapter_title}"
        details["authors"] = _authors(local)
        desc_lang = extract_content_attr(
            local, "dcterms:language", "xsi:type", "dcterms:RFC1766"
        )[0].content
        current_license = extract_content(local, "dcterms:rights")[0].content.lower().strip()
        details["license"] = current_license
        access_rights = (
            extract_content(local, "dcterms:accessRights")[0]
            .content.lower()
            .split("/")[-1]
            .strip()
        )
        desc = _description(local, desc_lang)

        if access_rights != "openaccess" or current_license not in AUTHORIZED_LICENSES:
            content = desc  # ref :200-210 degraded mode
        else:
            for span in root.find_all("span"):
                span.decompose()
            for a in root.find_all("a"):
                a.decompose()
            anchor = root.find("div", {"id": "anchor-fulltext"})
            if anchor is None:
                raise ValueError("No anchor-fulltext found, so no content can be scraped")
            # bs4 get_text(separator='\n ') — one separator per string
            content = "\n ".join(
                t for t in (n.attrs.get("_text", "") for n in anchor.iter() if n.tag is None)
            ).strip()
    else:
        raise ValueError(f"Resource type not recognized: {resource_type}")

    # universal metadata (ref :229-252)
    tags = extract_content_attr(mets_xml, "dcterms:subject", "xml:lang", desc_lang)
    details["tags"] = [t.content.lower().strip() for t in tags]
    issued = extract_content(mets_xml, "dcterms:issued")[0].content
    details["publication_date"] = int(
        dt.datetime.strptime(issued, "%Y-%m-%dT%H:%M:%S%z").timestamp()
    )
    details["publisher"] = extract_content(mets_xml, "dcterms:publisher")[0].content

    if not title:
        raise ValueError("No title found")
    if not desc:
        raise ValueError("No description found")

    return {
        "url": url,
        "title": title,
        "description": desc,
        "full_content": content,
        "details_json": json.dumps(details, ensure_ascii=False),
        "error_info": None,
    }


OE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("details_json", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def extract_oe_books(
    df: DataFrame,
    mets_col: str = "mets_payload",
    html_col: str | None = "page_html",
    url_col: str = "url",
) -> DataFrame:
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    has_html = html_col is not None and html_col in df.columns
    cols = [f.name for f in OE_OUT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                html = r[html_col] if has_html else None
                try:
                    rows.append(extract_oe_record(r[url_col], r[mets_col], html))
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        dict.fromkeys(cols)
                        | {"url": r[url_col], "error_info": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=OE_OUT_SCHEMA)
