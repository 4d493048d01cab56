"""World Bank OKR extraction — OAI-PMH METS/MODS records → WeLearn
fields, as pure column expressions.

Reference: ``plugins/rest_requesters/world_bank_okr.py`` —
``_update_welearn_document`` (:206-235: title/abstract, license gate,
description used as full_content — PDF/TXT scraping is not permitted
for this source), ``_extract_licence`` (:86-103: 'CC BY 3.0 IGO' →
canonical URL), ``_process_authors`` (:72-84: 'Last, First' →
'First Last'), ``_build_details`` (:105-142); record parse
``data/source_models/world_bank_okr.py`` whose XMLExtractor is
regex-based — mirrored here by the F20 regex column extractors
(sources/collectors.py), so the whole plugin is Catalyst-side.

Deviation (documented): the reference's publication_date uses
``time.mktime`` (local timezone); pinned to UTC here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import clean_doi, remove_extra_whitespace
from ..sources.collectors import extract_xml_tag
from .constants import AUTHORIZED_LICENSES

# ref world_bank_okr.py:96 — cc code/version/igo
_CC_RE = r"^cc\s+([a-z\-]+)\s+(\d+(?:\.\d+)?)\s*(igo)?"


def _first_tag(col: Column, tag: str) -> Column:
    return F.get(extract_xml_tag(col, tag), 0)


def _identifier(col: Column, id_type: str) -> Column:
    """<mods:identifier type="...">value</> (ref
    world_bank_okr model ``_extract_identifiers``)."""
    return F.nullif(
        F.regexp_extract(
            col,
            rf'(?s)<mods:identifier[^>]*type="{id_type}"[^>]*>(.*?)</mods:identifier>',
            1,
        ),
        F.lit(""),
    )


def normalize_wb_license(access_condition: Column) -> Column:
    """ref _extract_licence (:86-103): 'CC BY 4.0' /
    'CC BY-NC-ND 3.0 IGO' → canonical creativecommons URL; non-CC
    strings pass through lowercased/stripped; null stays null
    (gate raises upstream)."""
    s = F.lower(F.trim(access_condition))
    code = F.regexp_extract(s, _CC_RE, 1)
    version = F.regexp_extract(s, _CC_RE, 2)
    igo = F.regexp_extract(s, _CC_RE, 3)
    canonical = F.concat(
        F.lit("https://creativecommons.org/licenses/"),
        code,
        F.lit("/"),
        version,
        F.when(igo == "igo", F.lit("/igo/")).otherwise(F.lit("/")),
    )
    return F.when(code != "", canonical).otherwise(s)


def _author_structs(name_parts: Column) -> Column:
    """'Last, First' → 'First Last' (ref :72-84), ws-collapsed."""

    def fix(n: Column) -> Column:
        first = remove_extra_whitespace(F.get(F.split(n, ","), 1))
        last = remove_extra_whitespace(F.get(F.split(n, ","), 0))
        return F.when(
            n.contains(","), F.concat(first, F.lit(" "), last)
        ).otherwise(remove_extra_whitespace(n))

    return F.transform(
        name_parts, lambda n: F.struct(fix(n).alias("name"), F.lit("").alias("misc"))
    )


def extract_world_bank_okr(
    responses: DataFrame,
    payload_col: str = "payload",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """OAI GetRecord METS payloads (one per row) → extracted rows.
    ``keep_cols`` pass through unchanged (ids, request metadata)."""
    x = F.col(payload_col)

    staged = responses.select(
        *[F.col(c) for c in (keep_cols or [])],
        _first_tag(x, "mods:title").alias("_title"),
        _first_tag(x, "mods:abstract").alias("_abstract"),
        _first_tag(x, "mods:accessCondition").alias("_access"),
        _first_tag(x, "mods:dateAvailable").alias("_date_avail"),
        extract_xml_tag(x, "mods:namePart").alias("_authors"),
        extract_xml_tag(x, "mods:topic").alias("_subjects"),
        _identifier(x, "uri").alias("_uri"),
        _identifier(x, "doi").alias("_doi_raw"),
    )

    license_url = normalize_wb_license(F.col("_access"))
    error = (
        F.when(F.col("_title").isNull(), "ValueError: No title in this document")
        .when(F.col("_abstract").isNull(), "ValueError: No abstract in this document")
        .when(F.col("_uri").isNull(), 'ValueError: Missing <mods:identifier type="uri">')
        .when(F.col("_access").isNull(), "NoLicenseFound: No licence found in the record")
        .when(
            ~license_url.isin(*AUTHORIZED_LICENSES),
            F.concat(F.lit("UnauthorizedLicense: "), license_url),
        )
    )

    # dateAvailable: ISO instant, else plain date (ref :111-124); UTC
    ts = F.coalesce(
        F.try_to_timestamp(F.col("_date_avail"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(F.col("_date_avail"), F.lit("yyyy-MM-dd")),
    )
    pub_ts = F.unix_timestamp(ts).cast("double")

    doi = clean_doi(F.col("_doi_raw"))
    details = F.struct(
        _author_structs(F.col("_authors")).alias("authors"),
        F.transform(
            F.col("_subjects"),
            lambda s: F.struct(
                F.lower(s).alias("name"),
                F.lit(0).alias("depth"),
                F.array().cast("array<string>").alias("directly_contained_in"),
                F.lit(None).cast("string").alias("external_id"),
                F.lit(None).cast("string").alias("external_depth_name"),
            ),
        ).alias("topics"),
        pub_ts.alias("publication_date"),
        doi.alias("doi"),
        F.lit(False).alias("content_from_pdf"),
        F.lit(False).alias("content_from_txt"),
        F.lit(True).alias("content_from_description"),
        license_url.alias("licence"),
    )

    ok = error.isNull()
    return staged.select(
        *[F.col(c) for c in (keep_cols or [])],
        F.when(ok, F.col("_uri")).alias("url"),
        F.when(ok, F.col("_title")).alias("title"),
        F.when(ok, F.col("_abstract")).alias("description"),
        # description doubles as full content for this source (ref :222-224)
        F.when(ok, F.col("_abstract")).alias("full_content"),
        F.when(ok, details).alias("details"),
        F.when(ok, doi).alias("external_id"),
        error.alias("error_info"),
    )
