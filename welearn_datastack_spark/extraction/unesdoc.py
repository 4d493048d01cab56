"""UNESDOC extraction — explore-API record JSON (+ optional
pre-fetched PDF text) → WeLearn fields, as pure column expressions.

Reference: ``plugins/rest_requesters/unesdoc.py`` — ``run``
(:252-290: license gate → ark→iid conversion → PDF content →
description fallback → iso3→iso2 lang), ``_extract_licence``
(:95-104: rights HTML anchor href), ``_get_description`` (:236-250:
per-language canned fallback), ``_convert_ark_id_to_iid`` (:190-210),
``_extract_metadata`` (:131-142), translations table (:43-56).

The record payload is one explore-API result object per row. PDF
text (Tika) is a separate fetch stage — pass ``pdf_text_col`` when
available; without it the PDF-content requirement dead-letters like
the reference's NoContent path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .constants import AUTHORIZED_LICENSES

# ref unesdoc.py:43-56
TRANSLATIONS = {
    "eng": "See the full text for more details.",
    "deu": "Lesen Sie den vollständigen Text für weitere Details.",
    "spa": "Consulte el texto completo para más detalles.",
    "fre": "Consultez le texte intégral pour plus de détails.",
    "jpn": "詳細については全文をご参照ください。",
    "por": "Consulte o texto completo para mais detalhes.",
    "ara": "لمزيد من التفاصيل يرجى الرجوع إلى النص الكامل",
    "ces": "Podrobnosti naleznete v plném znění textu.",
    "ita": "Consulti il testo completo per maggiori dettagli.",
    "kor": "자세한 내용은 전체 본문을 확인하세요.",
    "nld": "Raadpleeg de volledige tekst voor meer details.",
    "zho": "更多详情请参阅全文。",
}

# ref unesdoc.py:58-71
LANG_ISO3_TO_ISO2 = {
    "eng": "en", "deu": "de", "spa": "es", "fre": "fr", "jpn": "ja",
    "por": "pt", "ara": "ar", "ces": "cs", "ita": "it", "kor": "ko",
    "nld": "nl", "zho": "zh",
}

UNESDOC_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("year", T.ArrayType(T.StringType())),
        T.StructField("language", T.ArrayType(T.StringType())),
        T.StructField("title", T.StringType()),
        T.StructField("type", T.ArrayType(T.StringType())),
        T.StructField("description", T.StringType()),
        T.StructField("subject", T.ArrayType(T.StringType())),
        T.StructField("creator", T.StringType()),
        T.StructField("rights", T.StringType()),
    ]
)


def _map_lookup(mapping: dict[str, str], key: Column) -> Column:
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return m[key]


def ark_to_iid(ark_id: Column) -> Column:
    """ref _convert_ark_id_to_iid (:190-210): '48223/pf0000389119' →
    'p::usmarcdef_0000389119'; 3-part form appends '_lang'; other
    shapes → NULL (the caller dead-letters)."""
    parts = F.split(ark_id, "/")
    digits = F.regexp_replace(F.get(parts, 1), r"[A-Za-z]", "")
    two = F.concat(F.lit("p::usmarcdef_"), digits)
    three = F.concat(two, F.lit("_"), F.get(parts, 2))
    return (
        F.when(F.size(parts) == 2, two)
        .when(F.size(parts) == 3, three)
    )


def extract_unesdoc(
    records: DataFrame,
    payload_col: str = "payload",
    pdf_text_col: str | None = None,
) -> DataFrame:
    """Explore-API record JSON rows → extracted WeLearn rows."""
    parsed = records.withColumn(
        "_it", F.from_json(F.col(payload_col), UNESDOC_ITEM_SCHEMA)
    )
    it = F.col("_it")

    # rights is an HTML fragment; the license URL is the anchor href
    # (ref _extract_licence :95-104)
    license_url = F.nullif(
        F.regexp_extract(it["rights"], r'(?s)<a\b[^>]*href="([^"]*)"', 1), F.lit("")
    )
    lang3 = F.get(it["language"], 0)
    lang2 = _map_lookup(LANG_ISO3_TO_ISO2, lang3)
    ark_part = F.nullif(F.get(F.split(it["url"], "ark:/"), 1), F.lit(""))
    iid = ark_to_iid(ark_part)

    pdf_text = F.col(pdf_text_col) if pdf_text_col else F.lit(None).cast("string")
    # description: cleaned metadata text, else per-language canned
    # fallback (ref _get_description :236-250). clean_text here is the
    # ws-collapse leg (tags never appear in explore descriptions).
    fallback = _map_lookup(TRANSLATIONS, lang3)
    desc = F.when(
        it["description"].isNotNull() & (it["description"] != ""),
        F.trim(F.regexp_replace(it["description"], r"\s+", " ")),
    ).otherwise(fallback)

    error = (
        F.when(
            it["rights"].isNull() | license_url.isNull(),
            "NoLicenseFound: No license found in the document metadata.",
        )
        .when(
            ~license_url.isin(*AUTHORIZED_LICENSES),
            F.concat(F.lit("UnauthorizedLicense: "), license_url),
        )
        .when(ark_part.isNull(), "WrongExternalIdFormat: no ark:/ in url")
        .when(iid.isNull(), "WrongExternalIdFormat: invalid ark id")
        .when(pdf_text.isNull(), "NoContent: no PDF text available")
        .when(desc.isNull(), "NoDescriptionFound: no description or fallback")
        .when(lang2.isNull(), "WrongLangFormat: unmapped language")
    )

    details = F.struct(
        F.get(it["type"], 0).alias("type"),
        F.transform(
            F.coalesce(it["subject"], F.array().cast("array<string>")),
            lambda s: F.struct(
                F.lower(s).alias("name"),
                F.lit(0).alias("depth"),
                F.array().cast("array<string>").alias("directly_contained_in"),
                F.lit(None).cast("string").alias("external_id"),
                F.lit(None).cast("string").alias("external_depth_name"),
            ),
        ).alias("topics"),
        license_url.alias("licence_url"),
        F.array(
            F.struct(it["creator"].alias("name"), F.lit("").alias("misc"))
        ).alias("authors"),
    )

    ok = error.isNull()
    return parsed.select(
        F.when(ok, it["url"]).alias("url"),
        F.when(ok, it["title"]).alias("title"),
        F.when(ok, desc).alias("description"),
        F.when(ok, pdf_text).alias("full_content"),
        F.when(ok, details).alias("details"),
        F.when(ok, lang2).alias("lang"),
        iid.alias("iid"),
        error.alias("error_info"),
    )
