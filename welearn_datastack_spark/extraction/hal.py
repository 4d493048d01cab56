"""HAL extraction — maps HAL search-API JSON to WeLearn document
fields with pure column expressions.

Reference: ``plugins/rest_requesters/hal.py`` — ``_get_jsons`` parses
the API response (:212-254), ``_update_welearn_document`` maps fields
(:155-210), ``_get_details_from_dict`` builds details (:126-153),
``_convert_hal_date_to_ts`` (:90-103).

Spark-first: the response JSON parses once with ``from_json`` under an
explicit schema (schema-on-read, codegen'd), docs explode to rows, and
every field map — type lookup, date→epoch, author structs, pdf-mode
license test — is a Catalyst expression. No Python runs per row, so
the same plan handles a 100 TB backfill of archived responses.

Error semantics (ref raises → we dead-letter, R6): missing halId /
title / abstract and the literal ``'absent'`` abstract produce rows
with ``error_info`` set and null fields, exactly the conditions of
hal.py:174-193.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .constants import (
    AUTHORIZED_LICENSES_WITHOUT_VERSION,
    HAL_EXPLICIT_TYPES,
    HAL_LOCAL_LICENSES,
    HAL_URL_BASE,
)

# fields requested via _query_params_fl (ref hal.py:80)
HAL_DOC_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.StringType()),
        T.StructField("authFullName_s", T.ArrayType(T.StringType())),
        T.StructField("docType_s", T.StringType()),
        T.StructField("title_s", T.ArrayType(T.StringType())),
        T.StructField("language_s", T.ArrayType(T.StringType())),
        T.StructField("publicationDate_tdate", T.StringType()),
        T.StructField("producedDate_tdate", T.StringType()),
        T.StructField("uri_s", T.StringType()),
        T.StructField("fulltext_t", T.StringType()),
        T.StructField("abstract_s", T.ArrayType(T.StringType())),
        T.StructField("licence_s", T.StringType()),
        T.StructField("fileMain_s", T.StringType()),
        T.StructField("halId_s", T.StringType()),
    ]
)

HAL_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField(
            "response",
            T.StructType(
                [
                    T.StructField("numFound", T.LongType()),
                    T.StructField("docs", T.ArrayType(HAL_DOC_SCHEMA)),
                ]
            ),
        )
    ]
)


def hal_date_to_ts(col: Column) -> Column:
    """HAL ISO date → UTC-midnight epoch seconds as double
    (ref hal.py:90-103: date part only, UTC). ``unix_date`` is
    timezone-free, so the session timezone cannot skew the result."""
    day = F.to_date(F.split(col, "T")[0])
    return F.when(
        col.isNotNull() & (col != ""), F.unix_date(day).cast("double") * 86400.0
    )


def _author_structs(names: Column) -> Column:
    """['A. Author', …] → [{name, misc:''}, …] (ref hal.py:146-152)."""
    return F.transform(
        F.coalesce(names, F.array().cast("array<string>")),
        lambda n: F.struct(n.alias("name"), F.lit("").alias("misc")),
    )


def _type_lookup(doc_type: Column) -> Column:
    """docType_s → explicit type, default 'UNDEFINED' (ref hal.py:144)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in HAL_EXPLICIT_TYPES.items() for x in kv]
    )
    return F.coalesce(mapping[F.coalesce(doc_type, F.lit(""))], F.lit("UNDEFINED"))


def parse_hal_response(
    responses: DataFrame,
    payload_col: str = "payload",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One row per API response → one row per HAL doc (raw columns).
    ``keep_cols`` ride along through the explode (e.g. pre-fetched
    PDF text, request metadata)."""
    parsed = responses.withColumn(
        "_parsed", F.from_json(F.col(payload_col), HAL_RESPONSE_SCHEMA)
    )
    extra = [F.col(c) for c in (keep_cols or [])]
    return parsed.select(
        F.explode(F.col("_parsed.response.docs")).alias("doc"), *extra
    ).select("doc.*", *[c for c in (keep_cols or [])])


def extract_hal(
    responses: DataFrame,
    payload_col: str = "payload",
    pdf_text_col: str | None = None,
) -> DataFrame:
    """HAL API responses → extracted WeLearn rows.

    ``pdf_text_col``: optional column on ``responses``' exploded rows
    holding pre-fetched Tika text for pdf-mode docs (the reference
    calls ``get_pdf_content`` inline, hal.py:195-198; fetching is a
    separate stage here). Absent → pdf-mode docs fall back to the
    abstract and ``content_from_pdf`` stays false, mirroring the
    reference's PDF-retrieval-failure path.
    """
    docs = parse_hal_response(
        responses, payload_col, keep_cols=[pdf_text_col] if pdf_text_col else None
    )

    abstract = F.array_join(F.col("abstract_s"), "")
    pdf_license_ok = F.col("licence_s").isin(
        *(AUTHORIZED_LICENSES_WITHOUT_VERSION + HAL_LOCAL_LICENSES)
    )
    has_pdf_text = (
        F.col(pdf_text_col).isNotNull() if pdf_text_col else F.lit(False)
    )
    pdf_mode = (
        pdf_license_ok & F.col("fileMain_s").isNotNull() & has_pdf_text
    )

    error = (
        F.when(F.col("halId_s").isNull(), "KeyError: no url")
        .when(
            F.col("title_s").isNull() | (F.size("title_s") == 0),
            "KeyError: no titles",
        )
        .when(
            F.col("abstract_s").isNull() | (F.size("abstract_s") == 0),
            "KeyError: no content",
        )
        .when(abstract == "absent", "NoContent: content is absent")
    )

    content = F.when(pdf_mode, F.col(pdf_text_col) if pdf_text_col else abstract).otherwise(abstract)
    desc = F.when(pdf_mode, abstract).otherwise(F.split(abstract, r"\.")[0])

    details = F.struct(
        F.coalesce(F.col("docid"), F.lit("")).alias("docid"),
        hal_date_to_ts(F.col("producedDate_tdate")).alias("produced_date"),
        _type_lookup(F.col("docType_s")).alias("type"),
        hal_date_to_ts(F.col("publicationDate_tdate")).alias("publication_date"),
        _author_structs(F.col("authFullName_s")).alias("authors"),
        pdf_mode.alias("content_from_pdf"),
    )

    ok = error.isNull()
    return docs.select(
        F.when(ok, F.concat(F.lit(HAL_URL_BASE), F.col("halId_s"))).alias("url"),
        F.when(ok, F.col("title_s")[0]).alias("title"),
        F.when(ok, desc).alias("description"),
        F.when(ok, content).alias("full_content"),
        F.when(ok, details).alias("details"),
        F.col("halId_s").alias("hal_id"),
        error.alias("error_info"),
    )
