"""Extraction-plugin round-trips under the driver hash gate.

One query per remaining extraction plugin (the HAL / WorldBank / TED /
OpenAlex / UVED round-trips live in q_extra.py): a deterministic
source payload is SYNTHESIZED per ``documents`` row with pure column
expressions, pushed through the real extraction plugin (the same code
the pipeline runs), and the flattened output is value-hashed against
a DuckDB oracle that states the reference field-mapping semantics
directly — including each plugin's dead-letter rules, which must fire
on the same rows on both engines.

Reference plugins covered here (all under
``/root/reference/welearn_datastack/plugins/``):
UNESDOC   rest_requesters/unesdoc.py:252-290
OAPEN     rest_requesters/oapen.py:157-328
FAO       rest_requesters/fao_open_knowledge.py:264-310
Pressbooks rest_requesters/pressbooks.py:229-352
OE Books  scrapers/oe_books.py:33-263
PLOS      scrapers/plos.py:233-269
PeerJ     scrapers/peerj.py:86-245
Conversation scrapers/conversation.py:53-148
Wikipedia rest_requesters/wikipedia.py:66-105
UNCCeLearn scrapers/unccelearn.py:65-215
IRD le Mag scrapers/ird_le_mag.py:53-147
notre-environnement scrapers/notre_environnement.py:42-99
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fan_out_for_compute, load_table
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents table fanned out for the per-row text kernels in this
    module (token/shingle/regex work dominates the scan stage);
    fan_out_for_compute is a structural no-op on already-parallel
    layouts — see sources/tables.py."""
    return fan_out_for_compute(load_table(spark, sf_dir, "documents"))

_CC_BY = "https://creativecommons.org/licenses/by/4.0/"
_CC_BY_SA_IGO = "https://creativecommons.org/licenses/by-sa/3.0/igo/"


# ------------------------------------------------------------- UNESDOC


@register(
    "unesdoc_extraction_roundtrip",
    r"""
    WITH c AS (
      SELECT *, doc_id % 5 AS m,
             trim(regexp_replace(text, '\s+', ' ', 'g')) AS ctext
      FROM documents
    )
    SELECT 'p::usmarcdef_0000' || doc_id ||
             CASE WHEN m = 4 THEN '_fre' ELSE '' END AS iid,
           CASE WHEN m IN (1,2) THEN NULL
                ELSE 'https://unesdoc.unesco.org/ark:/48223/pf0000' || doc_id ||
                     CASE WHEN m = 4 THEN '/fre' ELSE '' END END AS url,
           CASE WHEN m IN (1,2) THEN NULL ELSE 'T' || doc_id END AS title,
           CASE WHEN m IN (1,2) THEN NULL
                WHEN m = 3 THEN 'Consultez le texte intégral pour plus de détails.'
                WHEN text = '' THEN 'See the full text for more details.'
                ELSE ctext END AS description,
           CASE WHEN m IN (1,2) THEN NULL
                ELSE CAST(length(text) + 4 AS INT) END AS n_content,
           CASE WHEN m IN (1,2) THEN NULL
                WHEN m = 3 THEN 'fr' ELSE 'en' END AS lang,
           CASE WHEN m IN (1,2) THEN NULL
                ELSE 'https://creativecommons.org/licenses/by-sa/3.0/igo/' END
             AS licence_url,
           CASE WHEN m IN (1,2) THEN NULL ELSE 'alpha' END AS topic0,
           CASE WHEN m IN (1,2) THEN NULL ELSE source END AS author0,
           CASE WHEN m = 1
                THEN 'UnauthorizedLicense: https://example.org/custom-license/'
                WHEN m = 2 THEN 'NoContent: no PDF text available'
           END AS error_info
    FROM c
    """,
    doc="Extraction gate: per document an UNESDOC explore-API record is "
    "synthesized (rights anchor / ark url / iso3 language cycling "
    "normal, unauthorized-license, missing-PDF, fallback-description, "
    "3-part-ark cases), run through the real extract_unesdoc "
    "(extraction/unesdoc.py — license gate, ark→iid, canned "
    "per-language description fallback, iso3→iso2; ref "
    "rest_requesters/unesdoc.py:252-290) and value-hashed against an "
    "oracle stating those semantics row-for-row.",
)
def unesdoc_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.unesdoc import extract_unesdoc

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 5
    lang3 = F.when(m == 3, "fre").otherwise("eng")
    lic = F.when(m == 1, "https://example.org/custom-license/").otherwise(
        _CC_BY_SA_IGO
    )
    url = F.concat(
        F.lit("https://unesdoc.unesco.org/ark:/48223/pf0000"),
        F.col("doc_id"),
        F.when(m == 4, F.lit("/fre")).otherwise(F.lit("")),
    )
    payload = F.to_json(
        F.struct(
            url.alias("url"),
            F.array(F.lit("2023")).alias("year"),
            F.array(lang3).alias("language"),
            F.concat(F.lit("T"), F.col("doc_id")).alias("title"),
            F.array(F.lit("doc")).alias("type"),
            F.when(m == 3, "").otherwise(F.col("text")).alias("description"),
            F.array(F.lit("Alpha"), F.lit("Beta")).alias("subject"),
            F.col("source").alias("creator"),
            F.concat(F.lit('<a href="'), lic, F.lit('">CC</a>')).alias("rights"),
        )
    )
    pdf_text = F.when(m != 2, F.concat(F.lit("PDF "), F.col("text")))
    out = extract_unesdoc(
        docs.select(payload.alias("payload"), pdf_text.alias("pdf_text")),
        pdf_text_col="pdf_text",
    )
    return out.select(
        "iid",
        "url",
        "title",
        "description",
        F.length("full_content").cast("int").alias("n_content"),
        "lang",
        F.col("details.licence_url").alias("licence_url"),
        F.col("details.topics")[0]["name"].alias("topic0"),
        F.col("details.authors")[0]["name"].alias("author0"),
        "error_info",
    )


# --------------------------------------------------------------- OAPEN


@register(
    "oapen_extraction_roundtrip",
    r"""
    WITH c AS (SELECT *, doc_id % 4 AS m FROM documents)
    SELECT CASE WHEN m IN (2,3) THEN NULL
                ELSE 'https://library.oapen.org/handle/20.500.12657/' || doc_id
           END AS url,
           CASE WHEN m IN (2,3) THEN NULL ELSE 'T' || doc_id END AS title,
           CASE WHEN m IN (2,3) THEN NULL ELSE 'en' END AS lang,
           CASE WHEN m IN (2,3) THEN NULL
                ELSE 'The work ' || doc_id END AS description,
           CASE WHEN m IN (2,3) THEN NULL
                WHEN m = 0 THEN trim(regexp_replace(text, '\s+', ' ', 'g'))
                ELSE text END AS full_content,
           CASE WHEN m IN (2,3) THEN NULL
                ELSE 'https://creativecommons.org/licenses/by/4.0/' END AS licence,
           CASE WHEN m IN (2,3) THEN NULL ELSE m = 0 END AS from_txt,
           CASE WHEN m IN (2,3) THEN NULL ELSE 'John ' || source END AS author0,
           CASE WHEN m IN (2,3) THEN NULL
                ELSE '20.500.12657/' || doc_id END AS doi,
           CASE WHEN m IN (2,3) THEN NULL ELSE 'gamma' END AS tag2,
           CASE WHEN m IN (2,3) THEN NULL
                ELSE CAST(1677628800 AS DOUBLE) END AS pub_ts,
           CASE WHEN m = 2 THEN 'ValueError: UnauthorizedLicense: License '
                  || 'https://creativecommons.org/licenses/by-nc/4.0/'
                  || ' is not authorized'
                WHEN m = 3 THEN 'ValueError: NoDescriptionFound: '
                  || 'No description found in this document'
           END AS error_info
    FROM c
    """,
    doc="Extraction gate: a DSpace item JSON is synthesized per document "
    "(ORIGINAL/TEXT bitstream cycling, CC code → canonical URL, "
    "str-or-list metadata with repeated dc.subject.other keys, "
    "language-matched abstract selection) and run through the real "
    "extract_oapen pandas-UDF plugin (extraction/oapen.py; ref "
    "rest_requesters/oapen.py:157-328). The by-nc quarter must "
    "dead-letter UnauthorizedLicense and the French-abstract quarter "
    "NoDescriptionFound on both engines.",
)
def oapen_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.oapen import extract_oapen

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 4
    orig = F.struct(
        F.lit("ORIGINAL").alias("bundleName"),
        F.when(m == 2, "CC-BY-NC").otherwise(F.lit("CC-BY")).alias("code"),
    )
    txt = F.struct(
        F.lit("TEXT").alias("bundleName"), F.lit(None).cast("string").alias("code")
    )
    bitstreams = F.when(m == 0, F.array(orig, txt)).otherwise(F.array(orig))
    # the abstract is language-detected against dc.language; keep it
    # text-independent so the marker-token vote (stub lingua) stays
    # deterministic on any corpus — document text still exercises the
    # content/clean_backline leg below
    abstract = F.when(m == 3, F.lit("le les et une dans est")).otherwise(
        F.concat(F.lit("The work "), F.col("doc_id"))
    )

    def kv(key, value):
        return F.struct(F.lit(key).alias("key"), value.alias("value"))

    metadata = F.array(
        kv("dc.description.abstract", abstract),
        kv("dc.language", F.lit("English")),
        kv("dc.contributor.author", F.concat(F.col("source"), F.lit(", John"))),
        kv("dc.date.available", F.lit("2023-03-01T00:00:00Z")),
        kv(
            "dc.identifier.uri",
            F.concat(
                F.lit("https://library.oapen.org/handle/20.500.12657/"),
                F.col("doc_id"),
            ),
        ),
        kv("dc.subject.other", F.lit("Alpha;Beta")),
        kv("dc.subject.other", F.lit("Gamma")),
        kv("publisher.name", F.lit("OAPEN Press")),
        kv("dc.type", F.lit("book")),
    )
    payload = F.to_json(
        F.struct(
            F.concat(F.lit("T"), F.col("doc_id")).alias("name"),
            F.concat(F.lit("20.500.12657/"), F.col("doc_id")).alias("handle"),
            bitstreams.alias("bitstreams"),
            metadata.alias("metadata"),
        )
    )
    out = extract_oapen(
        docs.select(payload.alias("payload"), F.col("text").alias("content")),
        content_text_col="content",
    )
    jd = F.col("details_json")
    return out.select(
        "url",
        "title",
        "lang",
        "description",
        "full_content",
        F.get_json_object(jd, "$.license").alias("licence"),
        F.get_json_object(jd, "$.content_from_txt").cast("boolean").alias("from_txt"),
        F.get_json_object(jd, "$.authors[0].name").alias("author0"),
        F.get_json_object(jd, "$.doi").alias("doi"),
        F.get_json_object(jd, "$.tags[2]").alias("tag2"),
        F.get_json_object(jd, "$.publication_date").cast("double").alias("pub_ts"),
        "error_info",
    )


# ----------------------------------------------------------------- FAO


@register(
    "fao_extraction_roundtrip",
    r"""
    WITH c AS (
      SELECT *, doc_id % 6 AS m,
             m = 0 AND trim(text, ' ' || chr(9) || chr(10) || chr(13)) <> '' AS ok
      FROM documents
    )
    SELECT CASE WHEN ok THEN 'uuid-' || doc_id END AS external_id,
           CASE WHEN ok THEN 'T' || doc_id END AS title,
           CASE WHEN ok
                THEN trim(regexp_replace(text, '\s+', ' ', 'g')) END AS description,
           CASE WHEN ok
                THEN 'PDF ' || trim(regexp_replace(text, '\s+', ' ', 'g')) END
             AS full_content,
           CASE WHEN ok THEN '10.4060/' || doc_id END AS doi,
           CASE WHEN ok THEN 'Report' END AS doc_type,
           CASE WHEN ok
                THEN 'https://creativecommons.org/licenses/by/4.0/' END
             AS license_url,
           CASE WHEN ok THEN source END AS author0,
           CASE WHEN ok THEN 'John Doe' END AS author1,
           CASE WHEN ok THEN CAST(doc_id % 17 + 1 AS BIGINT) END AS sdg0,
           CASE WHEN ok THEN CAST(1672531200 AS DOUBLE) END AS pub_ts,
           CASE WHEN m = 1 THEN 'ValueError: UnauthorizedLicense: License '
                  || '''https://creativecommons.org/licenses//license/'''
                  || ' is not authorized.'
                WHEN m = 2
                THEN 'ValueError: UnauthorizedState: Document is withdrawn from source.'
                WHEN m = 3
                THEN 'ValueError: UnauthorizedState: Document is under fao embargo.'
                WHEN m = 4
                THEN 'ValueError: NoContent: No content extracted from PDF.'
                WHEN m = 5 OR NOT ok
                THEN 'ValueError: NoDescriptionFound: No description found.'
           END AS error_info
    FROM c
    """,
    doc="Extraction gate: a FAO Open Knowledge DSpace record is "
    "synthesized per document and run through the real extract_fao "
    "(extraction/fao.py — format_cc_license, withdrawn/embargo gates, "
    "';'-split authors, the reference's SDG zero-strip quirk; ref "
    "rest_requesters/fao_open_knowledge.py:264-310). All five "
    "dead-letter classes cycle by doc_id and must fire identically "
    "on both engines; sdg0 exercises the '07'→7 / '10'→10 quirk "
    "across the full 1..17 range.",
)
def fao_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.fao import extract_fao

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 6

    def one(value):
        return F.array(F.struct(value.alias("value")))

    metadata = F.struct(
        one(
            F.when(m == 1, "NO-LICENSE").otherwise(F.lit("CC-BY-4.0"))
        ).alias("dc.rights.license"),
        one(F.concat(F.col("source"), F.lit(";John Doe"))).alias(
            "dc.contributor.author"
        ),
        one(F.when(m == 5, " ").otherwise(F.col("text"))).alias(
            "dc.description.abstract"
        ),
        one(F.concat(F.lit("10.4060/"), F.col("doc_id"))).alias("dc.identifier.doi"),
        one(F.lit("2023-01-01T00:00:00Z")).alias("dc.date.available"),
        one(F.lit("Report")).alias("fao.taxonomy.type"),
        one(
            F.concat(
                F.lpad((F.col("doc_id") % 17 + 1).cast("string"), 2, "0"),
                F.lit(" Topic"),
            )
        ).alias("fao.sdgs"),
        one(F.when(m == 3, "Yes").otherwise(F.lit("No"))).alias("fao.embargo"),
    )
    payload = F.to_json(
        F.struct(
            F.concat(F.lit("uuid-"), F.col("doc_id")).alias("uuid"),
            F.concat(F.lit("T"), F.col("doc_id")).alias("name"),
            (m == 2).alias("withdrawn"),
            metadata.alias("metadata"),
        )
    )
    pdf_text = F.when(m == 4, "   ").otherwise(F.concat(F.lit("PDF "), F.col("text")))
    out = extract_fao(
        docs.select(payload.alias("payload"), pdf_text.alias("pdf")),
        pdf_text_col="pdf",
    )
    jd = F.col("details_json")
    return out.select(
        "external_id",
        "title",
        "description",
        "full_content",
        F.get_json_object(jd, "$.doi").alias("doi"),
        F.get_json_object(jd, "$.type").alias("doc_type"),
        F.get_json_object(jd, "$.license_url").alias("license_url"),
        F.get_json_object(jd, "$.authors[0].name").alias("author0"),
        F.get_json_object(jd, "$.authors[1].name").alias("author1"),
        F.get_json_object(jd, "$.external_sdg[0]").cast("bigint").alias("sdg0"),
        F.get_json_object(jd, "$.publication_date").cast("double").alias("pub_ts"),
        "error_info",
    )


# ----------------------------------------------------------- Pressbooks


@register(
    "pressbooks_extraction_roundtrip",
    r"""
    WITH c AS (SELECT *, doc_id % 3 AS m FROM documents)
    SELECT 'https://press.example.org/book' || (doc_id % 7) || '/?p=' || doc_id
             AS url,
           CASE WHEN m = 2 THEN NULL
                WHEN m = 1 THEN 'T' || doc_id
                ELSE 'Book' || doc_id || ' - T' || doc_id END AS title,
           CASE WHEN m = 2 THEN NULL
                ELSE trim(regexp_replace(text, '\s+', ' ', 'g')) END AS description,
           CASE WHEN m = 2 THEN NULL
                ELSE trim(regexp_replace(text, '\s+', ' ', 'g')) END AS full_content,
           CASE WHEN m = 2 THEN NULL
                ELSE 'https://creativecommons.org/licenses/by/4.0/' END AS licence,
           CASE WHEN m = 2 THEN NULL
                ELSE CAST(1672628645 AS DOUBLE) END AS pub_ts,
           CASE WHEN m = 2 THEN NULL
                ELSE CAST(1675397106 AS DOUBLE) END AS upd_ts,
           CASE WHEN m = 2 THEN NULL ELSE 'John ' || source END AS author0_name,
           CASE WHEN m = 2 THEN NULL ELSE 'Inst' END AS author0_misc,
           CASE WHEN m = 2 THEN NULL ELSE 'Ed' END AS editor0,
           CASE WHEN m = 2 THEN NULL ELSE 'PB Pub' END AS publisher,
           CASE WHEN m = 2 THEN NULL ELSE 'chapters' END AS ptype,
           CASE WHEN m = 2 THEN NULL
                ELSE 'https://press.example.org/book' || (doc_id % 7) || '/' END
             AS part_of,
           CASE WHEN m = 2 THEN 'ValueError: UnauthorizedLicense: License '
                  || 'https://example.org/nope/ is not authorized'
           END AS error_info
    FROM c
    """,
    doc="Extraction gate: wp-json post-content + metadata payloads are "
    "synthesized per document (license cycling, isPartOf-composed "
    "titles, date_gmt/modified_gmt, author institution) and run "
    "through the real extract_pressbooks (extraction/pressbooks.py — "
    "license gate, composed title, three-first-sentences description, "
    "book_main_url partOf; ref rest_requesters/pressbooks.py:229-352).",
)
def pressbooks_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.pressbooks import extract_pressbooks

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 3
    content_payload = F.to_json(
        F.struct(F.struct(F.col("text").alias("raw")).alias("content"))
    )
    meta_payload = F.to_json(
        F.struct(
            F.struct(
                F.when(m == 2, "https://example.org/nope/")
                .otherwise(F.lit(_CC_BY))
                .alias("url")
            ).alias("license"),
            F.when(m == 1, "").otherwise(
                F.concat(F.lit("Book"), F.col("doc_id"))
            ).alias("isPartOf"),
            F.concat(F.lit("T"), F.col("doc_id")).alias("name"),
            F.lit("2023-01-02T03:04:05").alias("date_gmt"),
            F.lit("2023-02-03T04:05:06").alias("modified_gmt"),
            F.array(
                F.struct(
                    F.concat(F.lit("John "), F.col("source")).alias("name"),
                    F.lit("Inst").alias("contributor_institution"),
                )
            ).alias("author"),
            F.array(F.struct(F.lit("Ed").alias("name"))).alias("editor"),
            F.struct(F.lit("PB Pub").alias("name")).alias("publisher"),
        )
    )
    url = F.concat(
        F.lit("https://press.example.org/book"),
        F.col("doc_id") % 7,
        F.lit("/?p="),
        F.col("doc_id"),
    )
    out = extract_pressbooks(
        docs.select(
            content_payload.alias("payload"),
            meta_payload.alias("metadata_payload"),
            url.alias("url"),
        )
    )
    jd = F.col("details_json")
    return out.select(
        "url",
        "title",
        "description",
        "full_content",
        F.get_json_object(jd, "$.license").alias("licence"),
        F.get_json_object(jd, "$.publication_date").cast("double").alias("pub_ts"),
        F.get_json_object(jd, "$.update_date").cast("double").alias("upd_ts"),
        F.get_json_object(jd, "$.authors[0].name").alias("author0_name"),
        F.get_json_object(jd, "$.authors[0].misc").alias("author0_misc"),
        F.get_json_object(jd, "$.editors[0].name").alias("editor0"),
        F.get_json_object(jd, "$.publisher").alias("publisher"),
        F.get_json_object(jd, "$.type").alias("ptype"),
        F.get_json_object(jd, "$.partOf.element").alias("part_of"),
        "error_info",
    )


# ------------------------------------------------------------- OE Books


@register(
    "oe_books_extraction_roundtrip",
    r"""
    WITH c AS (
      SELECT *, doc_id % 3 AS m,
             -- the regex XML walk strips the abstract's edges; an
             -- all-whitespace abstract is a missing description
             trim(text, ' ' || chr(9) || chr(10) || chr(13)) AS stext,
             doc_id % 3 <> 2
               AND trim(text, ' ' || chr(9) || chr(10) || chr(13)) <> '' AS ok
      FROM documents
    )
    SELECT 'https://books.openedition.org/book/' || doc_id AS url,
           CASE WHEN ok THEN 'T' || doc_id END AS title,
           CASE WHEN ok THEN stext END AS description,
           CASE WHEN ok THEN stext END AS full_content,
           CASE WHEN ok
                THEN 'https://creativecommons.org/licenses/by/4.0/' END AS licence,
           CASE WHEN ok THEN 'John ' || source END AS author0,
           CASE WHEN ok THEN '10.4000/' || doc_id END AS doi,
           CASE WHEN ok THEN '978-' || doc_id END AS isbn,
           CASE WHEN ok THEN 'alpha' END AS tag0,
           CASE WHEN ok THEN CAST(1672531200 AS BIGINT) END AS pub_ts,
           CASE WHEN ok THEN 'OpenEdition' END AS publisher,
           CASE WHEN ok THEN 'book' END AS rtype,
           CASE WHEN m = 2
                THEN 'ValueError: Resource type not recognized: weird'
                WHEN NOT ok THEN 'ValueError: No description found'
           END AS error_info
    FROM c
    """,
    doc="Extraction gate: a METS/Dublin-Core record is synthesized per "
    "document (book dmdSec with RFC1766 language, URN doi/isbn "
    "identifiers, lang-filtered subjects, %z-offset issued date) and "
    "run through the real extract_oe_books regex-XML walk "
    "(extraction/oe_books.py; ref scrapers/oe_books.py:33-263 + "
    "modules/xml_extractor.py:55-101). The unknown-resource-type "
    "third dead-letters identically on both engines.",
)
def oe_books_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.oe_books import extract_oe_books

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 3
    rtype = F.when(m == 2, "weird").otherwise(F.lit("book"))
    mets = F.concat(
        F.lit("<mets:mets>"),
        F.lit('<mets:dmdSec ID="MD_OB_book_'),
        F.col("doc_id"),
        F.lit('"><dcterms:type>'),
        rtype,
        F.lit("</dcterms:type>"),
        F.lit('<dcterms:language xsi:type="dcterms:RFC1766">fr</dcterms:language>'),
        F.lit("<dcterms:rights>" + _CC_BY + "</dcterms:rights>"),
        F.lit('<dcterms:abstract xml:lang="fr">'),
        F.col("text"),
        F.lit("</dcterms:abstract><dcterms:title>T"),
        F.col("doc_id"),
        F.lit("</dcterms:title><dcterms:creator>"),
        F.col("source"),
        F.lit(", John</dcterms:creator>"),
        F.lit('<dcterms:identifier scheme="URN">urn:doi:10.4000/'),
        F.col("doc_id"),
        F.lit('</dcterms:identifier><dcterms:identifier scheme="URN">urn:isbn:978-'),
        F.col("doc_id"),
        F.lit("</dcterms:identifier></mets:dmdSec>"),
        F.lit('<dcterms:subject xml:lang="fr">Alpha</dcterms:subject>'),
        F.lit('<dcterms:subject xml:lang="en">Omega</dcterms:subject>'),
        F.lit("<dcterms:issued>2023-01-01T00:00:00+0000</dcterms:issued>"),
        F.lit("<dcterms:publisher>OpenEdition</dcterms:publisher>"),
        F.lit("</mets:mets>"),
    )
    url = F.concat(F.lit("https://books.openedition.org/book/"), F.col("doc_id"))
    out = extract_oe_books(
        docs.select(mets.alias("mets_payload"), url.alias("url")), html_col=None
    )
    jd = F.col("details_json")
    return out.select(
        "url",
        "title",
        "description",
        "full_content",
        F.get_json_object(jd, "$.license").alias("licence"),
        F.get_json_object(jd, "$.authors[0].name").alias("author0"),
        F.get_json_object(jd, "$.doi").alias("doi"),
        F.get_json_object(jd, "$.isbn").alias("isbn"),
        F.get_json_object(jd, "$.tags[0]").alias("tag0"),
        F.get_json_object(jd, "$.publication_date").cast("bigint").alias("pub_ts"),
        F.get_json_object(jd, "$.publisher").alias("publisher"),
        F.get_json_object(jd, "$.type").alias("rtype"),
        "error_info",
    )


# ----------------------------------------------------------------- PLOS


@register(
    "plos_extraction_roundtrip",
    r"""
    WITH c AS (
      SELECT *, doc_id % 3 AS m,
             -- clean_return_to_line: backlines REMOVED (not spaced),
             -- then stripped
             trim(regexp_replace(text, '[' || chr(10) || chr(9) || chr(13) || ']',
                                 '', 'g')) AS ctext
      FROM documents
    )
    SELECT 'https://journals.plos.org/plosone/article?id=10.1371/journal.'
             || doc_id AS url,
           CASE WHEN m = 2 THEN NULL ELSE 'T' || doc_id END AS title,
           CASE WHEN m = 2 THEN NULL ELSE ctext END AS description,
           CASE WHEN m = 2 THEN NULL ELSE ctext END AS full_content,
           CASE WHEN m = 2 THEN NULL
                ELSE '10.1371/journal.' || doc_id END AS external_id,
           CASE WHEN m = 2 THEN NULL ELSE 'DOI' END AS external_id_type,
           CASE WHEN m = 2 THEN NULL ELSE source || ' John' END AS author0_name,
           CASE WHEN m = 2 THEN NULL ELSE 'Paris' END AS author0_misc,
           CASE WHEN m = 2 THEN NULL ELSE 'PLOS ONE' END AS journal,
           CASE WHEN m = 2 THEN NULL ELSE 'Research Article' END AS heading,
           CASE WHEN m = 2 THEN NULL
                ELSE CAST(1673740800 AS BIGINT) END AS pub_ts,
           CASE WHEN m = 2 THEN NULL ELSE '1932-6203' END AS issn,
           CASE WHEN m = 2 THEN NULL
                ELSE 'https://creativecommons.org/licenses/by/4.0/' END
             AS license_url,
           CASE WHEN m = 2 THEN NULL ELSE 'Research Article' END AS tag0,
           CASE WHEN m = 2 THEN NULL ELSE 'PLOS, San Francisco' END AS publisher,
           CASE WHEN m = 2 THEN 'ValueError: UnauthorizedLicense: '
                  || 'https://creativecommons.org/licenses/by-nc/4.0/'
           END AS error_info
    FROM c
    """,
    doc="Extraction gate: a JATS manuscript XML is synthesized per "
    "document (article-meta/journal-meta, epub pub-date, author "
    "name+affiliation xref, heading subj-group, xlink license, body "
    "sec with dropped <title>) and run through the real extract_plos "
    "ElementTree walk (extraction/plos.py; ref scrapers/plos.py:"
    "233-269). The by-nc third dead-letters identically.",
)
def plos_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.plos import extract_plos

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 3
    lic = F.when(m == 2, "https://creativecommons.org/licenses/by-nc/4.0/").otherwise(
        F.lit(_CC_BY)
    )
    xml = F.concat(
        F.lit('<article xmlns:xlink="http://www.w3.org/1999/xlink"><front>'),
        F.lit(
            "<journal-meta><journal-title>PLOS ONE</journal-title>"
            "<issn>1932-6203</issn><publisher-name>PLOS</publisher-name>"
            "<publisher-loc>San Francisco</publisher-loc></journal-meta>"
        ),
        F.lit('<article-meta><article-id pub-id-type="doi">'
              "https://doi.org/10.1371/journal."),
        F.col("doc_id"),
        F.lit('</article-id><article-id pub-id-type="publisher-id">PONE-'),
        F.col("doc_id"),
        F.lit("</article-id><article-title>T"),
        F.col("doc_id"),
        F.lit(
            "</article-title><article-categories>"
            '<subj-group subj-group-type="heading">'
            "<subject>Research Article</subject></subj-group>"
            "</article-categories><contrib-group>"
            '<contrib contrib-type="author"><name><surname>'
        ),
        F.col("source"),
        F.lit(
            "</surname><given-names>John</given-names></name>"
            '<xref ref-type="aff" rid="aff1"/></contrib></contrib-group>'
            '<aff id="aff1"><addr-line>Paris</addr-line></aff><abstract><p>'
        ),
        F.col("text"),
        F.lit('</p></abstract><license xlink:href="'),
        lic,
        F.lit(
            '"/><pub-date pub-type="epub"><day>15</day><month>1</month>'
            "<year>2023</year></pub-date></article-meta></front><body>"
            "<sec><title>Intro</title><p>"
        ),
        F.col("text"),
        F.lit("</p></sec></body></article>"),
    )
    url = F.concat(
        F.lit("https://journals.plos.org/plosone/article?id=10.1371/journal."),
        F.col("doc_id"),
    )
    out = extract_plos(docs.select(xml.alias("payload"), url.alias("url")))
    return out.select(
        "url",
        "title",
        "description",
        "full_content",
        "external_id",
        "external_id_type",
        F.col("details.authors")[0]["name"].alias("author0_name"),
        F.col("details.authors")[0]["misc"].alias("author0_misc"),
        F.col("details.journal").alias("journal"),
        F.col("details.type").alias("heading"),
        F.col("details.publication_date").alias("pub_ts"),
        F.col("details.issn").alias("issn"),
        F.col("details.license_url").alias("license_url"),
        F.col("details.tags")[0].alias("tag0"),
        F.col("details.publisher").alias("publisher"),
        "error_info",
    )


# ---------------------------------------------------------------- PeerJ


@register(
    "peerj_extraction_roundtrip",
    r"""
    WITH c AS (SELECT *, doc_id % 4 AS m FROM documents)
    SELECT 'https://peerj.com/articles/' || doc_id AS url,
           CASE WHEN m = 3 THEN NULL ELSE 'T' || doc_id END AS title,
           CASE WHEN m = 3 THEN NULL ELSE 'D' || doc_id END AS description,
           CASE WHEN m = 3 THEN NULL
                ELSE trim(regexp_replace(text,
                          '[' || chr(10) || chr(9) || chr(13) || ']', '', 'g'))
           END AS full_content,
           CASE WHEN m = 3 THEN NULL
                ELSE '10.7717/peerj.' || doc_id END AS external_id,
           CASE WHEN m = 3 THEN NULL
                ELSE 'https://creativecommons.org/licenses/by/4.0/' END
             AS license_url,
           CASE WHEN m = 3 THEN NULL ELSE 'PeerJ' END AS journal,
           CASE WHEN m = 3 THEN NULL ELSE '2167-8359' END AS issn,
           CASE WHEN m = 3 THEN NULL ELSE 'PeerJ Inc.' END AS publisher,
           CASE WHEN m = 3 THEN NULL
                ELSE CAST(1673740800 AS DOUBLE) END AS pub_ts,
           CASE WHEN m = 3 THEN NULL ELSE 'Alpha' END AS tag0,
           CASE WHEN m = 3 THEN NULL ELSE 'Beta' END AS tag1,
           CASE WHEN m = 3 THEN NULL ELSE 'John ' || source END AS author0_name,
           CASE WHEN m = 3 THEN NULL ELSE 'Inst Paris' END AS author0_misc,
           CASE WHEN m = 3 THEN 'ValueError: UnauthorizedLicense: '
                  || 'https://example.org/closed/'
           END AS error_info
    FROM c
    """,
    doc="Extraction gate: an article HTML page is synthesized per "
    "document (license-p span gate, citation_* meta walk with the "
    "author→institution cursor, ';'-split keywords, main-content "
    "cleanup) and run through the real extract_peerj DOM plugin "
    "(extraction/peerj.py over the stdlib DOM; ref scrapers/"
    "peerj.py:86-245). The closed-license quarter dead-letters "
    "identically.",
)
def peerj_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.peerj import extract_peerj

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 4
    lic = F.when(m == 3, "https://example.org/closed/").otherwise(F.lit(_CC_BY))
    html = F.concat(
        F.lit('<html><head><meta name="citation_author" content="John '),
        F.col("source"),
        F.lit('"/><meta name="citation_author_institution" content="Inst Paris"/>'),
        F.lit('<meta name="citation_keywords" content="Alpha; Beta"/>'),
        F.lit('<meta name="citation_journal_title" content="PeerJ"/>'),
        F.lit('<meta name="citation_issn" content="2167-8359"/>'),
        F.lit('<meta name="citation_doi" content="10.7717/peerj.'),
        F.col("doc_id"),
        F.lit('"/><meta name="citation_publisher" content="PeerJ Inc."/>'),
        F.lit('<meta name="citation_date" content="2023-01-15"/>'),
        F.lit('<meta name="description" content="D'),
        F.col("doc_id"),
        F.lit('"/></head><body><span class="license-p"><a href="'),
        lic,
        F.lit('">CC</a></span><h1 class="article-title">T'),
        F.col("doc_id"),
        F.lit("</h1><main><p>"),
        F.col("text"),
        F.lit("</p></main></body></html>"),
    )
    url = F.concat(F.lit("https://peerj.com/articles/"), F.col("doc_id"))
    out = extract_peerj(docs.select(html.alias("payload"), url.alias("url")))
    return out.select(
        "url",
        "title",
        "description",
        "full_content",
        "external_id",
        F.col("details.license_url").alias("license_url"),
        F.col("details.journal").alias("journal"),
        F.col("details.issn").alias("issn"),
        F.col("details.publisher").alias("publisher"),
        F.col("details.publication_date").alias("pub_ts"),
        F.col("details.tags")[0].alias("tag0"),
        F.col("details.tags")[1].alias("tag1"),
        F.col("details.authors")[0]["name"].alias("author0_name"),
        F.col("details.authors")[0]["misc"].alias("author0_misc"),
        "error_info",
    )


# --------------------------------------------------------- Conversation


@register(
    "conversation_extraction_roundtrip",
    r"""
    WITH c AS (SELECT *, doc_id % 4 AS m FROM documents)
    SELECT 'https://theconversation.com/article-' || doc_id AS url,
           CASE WHEN m = 3 THEN NULL ELSE 'T' || doc_id END AS title,
           CASE WHEN m = 3 THEN NULL ELSE 'D' || doc_id END AS description,
           CASE WHEN m = 3 THEN NULL
                ELSE trim(text, ' ' || chr(9) || chr(10) || chr(13))
           END AS full_content,
           CASE WHEN m = 3 THEN NULL ELSE 'fr' END AS lang,
           CASE WHEN m = 3 THEN NULL ELSE 'John ' || source END AS author0_name,
           CASE WHEN m = 3 THEN NULL ELSE 'Professor' END AS author0_misc,
           CASE WHEN m = 3 THEN NULL ELSE 'Alpha' END AS kw0,
           CASE WHEN m = 3 THEN NULL ELSE 'Beta' END AS kw1,
           CASE WHEN m = 3 THEN NULL ELSE 'Europe' END AS region,
           CASE WHEN m = 3 THEN NULL
                ELSE CAST(1673740800 AS DOUBLE) END AS pub_ts,
           CASE WHEN m = 3 THEN NULL
                ELSE CAST(1675209600 AS DOUBLE) END AS upd_ts,
           CASE WHEN m = 3 THEN 'ValueError: Title not found' END AS error_info
    FROM c
    """,
    doc="Extraction gate: a The-Conversation article page is synthesized "
    "per document (headline h1, og:description, articleBody div, "
    "vcard author with role, news_keywords comma split, pubdate "
    "%Y%m%d, og:updated_time, content_language script sniff) and run "
    "through the real extract_conversation DOM plugin (extraction/"
    "conversation.py; ref scrapers/conversation.py:53-148). The "
    "missing-headline quarter dead-letters 'Title not found'.",
)
def conversation_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.conversation import extract_conversation

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 4
    headline = F.when(m == 3, F.lit("")).otherwise(
        F.concat(F.lit('<h1 itemprop="headline">T'), F.col("doc_id"), F.lit("</h1>"))
    )
    html = F.concat(
        F.lit('<html><head><meta property="og:description" content="D'),
        F.col("doc_id"),
        F.lit('"/><meta name="news_keywords" content="Alpha, Beta"/>'),
        F.lit('<meta name="commissioning-region" content="Europe"/>'),
        F.lit('<meta name="pubdate" content="20230115"/>'),
        F.lit('<meta property="og:updated_time" content="2023-02-01T00:00:00Z"/>'),
        F.lit("</head><body>"),
        headline,
        F.lit('<div itemprop="articleBody">'),
        F.col("text"),
        F.lit('</div><ul><li class="vcard"><span>John '),
        F.col("source"),
        F.lit('</span><p class="role">Professor</p></li></ul>'),
        F.lit("<script>var content_language = 'fr';</script></body></html>"),
    )
    url = F.concat(F.lit("https://theconversation.com/article-"), F.col("doc_id"))
    out = extract_conversation(docs.select(html.alias("payload"), url.alias("url")))
    return out.select(
        "url",
        "title",
        "description",
        "full_content",
        "lang",
        F.col("authors")[0]["name"].alias("author0_name"),
        F.col("authors")[0]["misc"].alias("author0_misc"),
        F.col("news_keywords")[0].alias("kw0"),
        F.col("news_keywords")[1].alias("kw1"),
        F.col("commissioning_region").alias("region"),
        F.col("publication_date").alias("pub_ts"),
        F.col("update_date").alias("upd_ts"),
        "error_info",
    )


# ------------------------------------------------------------ Wikipedia


@register(
    "wikipedia_extraction_roundtrip",
    r"""
    WITH c AS (SELECT *, doc_id % 4 AS m FROM documents)
    SELECT 'https://fr.wikipedia.org/wiki/T' || doc_id AS url,
           CASE WHEN m = 3 THEN NULL ELSE 'T' || doc_id END AS title,
           CASE WHEN m = 3 THEN NULL ELSE text END AS description,
           CASE WHEN m = 3 THEN NULL
                ELSE text || ' Contexte ctx ' || source || ' Histoire hist' END
             AS full_content,
           CASE WHEN m = 3 THEN NULL ELSE 'fr' END AS lang,
           CASE WHEN m = 3
                THEN 'ValueError: NoContent: Page https://fr.wikipedia.org/wiki/T'
                  || doc_id || ' is a redirection, not an article'
           END AS error_info
    FROM c
    """,
    doc="Extraction gate: a serialized WikipediaPage (summary + "
    "recursive section tree with a blacklisted 'Références' subtree "
    "and a redirect quarter) is synthesized per document and run "
    "through the real extract_wikipedia flattener (extraction/"
    "wikipedia.py — per-lang blacklist, depth-first dict-union "
    "flatten, redirect dead-letter; ref rest_requesters/"
    "wikipedia.py:52-105).",
)
def wikipedia_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.wikipedia import extract_wikipedia

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 4
    empty_sections = F.array().cast(
        "array<struct<title:string,text:string,sections:array<string>>>"
    )
    payload = F.to_json(
        F.struct(
            F.concat(F.lit("T"), F.col("doc_id")).alias("title"),
            F.col("text").alias("summary"),
            (m == 3).alias("redirect"),
            F.array(
                F.struct(
                    F.lit("Contexte").alias("title"),
                    F.concat(F.lit("ctx "), F.col("source")).alias("text"),
                    F.array(
                        F.struct(
                            F.lit("Références").alias("title"),
                            F.lit("refbody").alias("text"),
                            F.array().cast("array<string>").alias("sections"),
                        )
                    ).alias("sections"),
                ),
                F.struct(
                    F.lit("Histoire").alias("title"),
                    F.lit("hist").alias("text"),
                    empty_sections.alias("sections"),
                ),
            ).alias("sections"),
        )
    )
    url = F.concat(F.lit("https://fr.wikipedia.org/wiki/T"), F.col("doc_id"))
    out = extract_wikipedia(docs.select(payload.alias("payload"), url.alias("url")))
    return out.select(
        "url", "title", "description", "full_content", "lang", "error_info"
    )


# ----------------------------------------------------------- UNCCeLearn


@register(
    "unccelearn_extraction_roundtrip",
    r"""
    WITH c AS (SELECT *, doc_id % 4 AS m FROM documents)
    SELECT 'https://unccelearn.org/course/view.php?id=' || doc_id AS url,
           'T' || doc_id AS title,
           'D' || doc_id AS description,
           CASE WHEN m = 0 THEN 'PDF ' || text ELSE 'D' || doc_id END
             AS full_content,
           CASE WHEN m = 3 THEN NULL ELSE 'climate' END AS theme,
           CASE WHEN m = 3 THEN NULL
                WHEN m = 0 THEN CAST(10800 AS BIGINT)
                ELSE CAST(12600 AS BIGINT) END AS duration,
           CASE WHEN m = 3 THEN NULL ELSE TRUE END AS certifying,
           CASE WHEN m = 3 THEN NULL ELSE 'self-paced' END AS course_type,
           'https://img.example.org/' || doc_id || '.png' AS image,
           'Alpha' AS kw0,
           'MOOC' AS ctype,
           m = 0 AS from_pdf,
           CAST(NULL AS VARCHAR) AS error_info
    FROM c
    """,
    doc="Extraction gate: a UNCC:eLearn course page is synthesized per "
    "document (title/description/og:image/keywords metas, details div "
    "with the three duration formats '3 hours'/'3,5 hours'/'3-4 "
    "hours', syllabus-PDF link and degraded description fallback) and "
    "run through the real extract_unccelearn DOM plugin (extraction/"
    "unccelearn.py; ref scrapers/unccelearn.py:65-215).",
)
def unccelearn_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.unccelearn import extract_unccelearn

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 4
    duration = (
        F.when(m == 0, "3 hours").when(m == 1, "3,5 hours").otherwise(F.lit("3-4 hours"))
    )
    details_div = F.when(m == 3, F.lit("")).otherwise(
        F.concat(
            F.lit('<div class="details"><p class="thematic-areas">Climate</p>'),
            F.lit('<p class="time">'),
            duration,
            F.lit('</p><p class="certification">With certification</p>'),
            F.lit('<p class="type">Self-paced</p></div>'),
        )
    )
    pdf_link = F.when(
        (m == 0) | (m == 2),
        F.lit('<a id="overview_syllabus_download" href="x">Syllabus</a>'),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>T"),
        F.col("doc_id"),
        F.lit('</title><meta name="description" content="D'),
        F.col("doc_id"),
        F.lit('"/><meta property="og:image" content="https://img.example.org/'),
        F.col("doc_id"),
        F.lit('.png"/><meta name="keywords" content="Alpha, Beta"/></head><body>'),
        details_div,
        pdf_link,
        F.lit("</body></html>"),
    )
    url = F.concat(
        F.lit("https://unccelearn.org/course/view.php?id="), F.col("doc_id")
    )
    pdf_text = F.when(m == 0, F.concat(F.lit("PDF "), F.col("text")))
    out = extract_unccelearn(
        docs.select(
            html.alias("payload"), url.alias("url"), pdf_text.alias("pdf_text")
        ),
        pdf_text_col="pdf_text",
    )
    jd = F.col("details_json")
    return out.select(
        "url",
        "title",
        "description",
        "full_content",
        F.get_json_object(jd, "$.theme").alias("theme"),
        F.get_json_object(jd, "$.duration").cast("bigint").alias("duration"),
        F.get_json_object(jd, "$.certifying").cast("boolean").alias("certifying"),
        F.get_json_object(jd, "$['course-type']").alias("course_type"),
        F.get_json_object(jd, "$.image").alias("image"),
        F.get_json_object(jd, "$.keywords[0]").alias("kw0"),
        F.get_json_object(jd, "$.type").alias("ctype"),
        F.get_json_object(jd, "$.content_from_pdf").cast("boolean").alias("from_pdf"),
        "error_info",
    )


# ----------------------------------------------------------- IRD le Mag


@register(
    "ird_le_mag_extraction_roundtrip",
    r"""
    WITH c AS (SELECT *, doc_id % 4 AS m FROM documents)
    SELECT 'https://lemag.ird.fr/fr/article-' || doc_id AS url,
           CASE WHEN m = 3 THEN NULL ELSE 'T' || doc_id END AS title,
           CASE WHEN m = 3 THEN NULL ELSE 'D' || doc_id END AS description,
           CASE WHEN m = 3 THEN NULL
                ELSE trim(regexp_replace(text, '\s+', ' ', 'g')) END
             AS full_content,
           CASE WHEN m = 3 THEN NULL ELSE 'John ' || source END AS author0,
           CASE WHEN m = 3 THEN NULL
                ELSE CAST(1673740800 AS BIGINT) END AS pub_ts,
           CASE WHEN m = 3 THEN NULL
                ELSE 'https://lemag.ird.fr/fr/mentions-legales-0' END
             AS license_url,
           CASE WHEN m = 3 THEN NULL ELSE 'article' END AS rtype,
           CASE WHEN m = 3 THEN 'ValueError: NoContent' END AS error_info
    FROM c
    """,
    doc="Extraction gate: an IRD le Mag' article page is synthesized per "
    "document (Drupal settings-JSON island carrying speakeasy.content, "
    "og: metas, 'Auteur :' li, time.datetime) and run through the "
    "real extract_ird_le_mag DOM plugin (extraction/ird_le_mag.py — "
    "JSON-island content, typography repair, author prefix strip; ref "
    "scrapers/ird_le_mag.py:53-147). The quarter with no island "
    "dead-letters NoContent.",
)
def ird_le_mag_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extraction.ird_le_mag import extract_ird_le_mag

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 4
    island = F.when(m == 3, F.lit("")).otherwise(
        F.concat(
            F.lit(
                '<script type="application/json" '
                'data-drupal-selector="drupal-settings-json">'
            ),
            F.to_json(
                F.struct(
                    F.struct(F.col("text").alias("content")).alias("speakeasy")
                )
            ),
            F.lit("</script>"),
        )
    )
    html = F.concat(
        F.lit('<html><head><meta property="og:title" content="T'),
        F.col("doc_id"),
        F.lit('"/><meta property="og:description" content="D'),
        F.col("doc_id"),
        F.lit('"/></head><body>'),
        island,
        F.lit('<ul><li class="info-item name">Auteur : John '),
        F.col("source"),
        F.lit('</li></ul><time class="datetime" '
              'datetime="2023-01-15T00:00:00Z">15 jan</time></body></html>'),
    )
    url = F.concat(F.lit("https://lemag.ird.fr/fr/article-"), F.col("doc_id"))
    out = extract_ird_le_mag(docs.select(html.alias("payload"), url.alias("url")))
    jd = F.col("details_json")
    return out.select(
        "url",
        "title",
        "description",
        "full_content",
        F.get_json_object(jd, "$.authors[0].name").alias("author0"),
        F.get_json_object(jd, "$.publication_date").cast("bigint").alias("pub_ts"),
        F.get_json_object(jd, "$.license_url").alias("license_url"),
        F.get_json_object(jd, "$.type").alias("rtype"),
        "error_info",
    )


# ------------------------------------------------- notre-environnement


@register(
    "notre_environnement_extraction_roundtrip",
    r"""
    WITH c AS (SELECT *, doc_id % 4 AS m FROM documents)
    SELECT 'https://www.notre-environnement.gouv.fr/a-' || doc_id AS url,
           CASE WHEN m = 3 THEN NULL ELSE 'T ' || doc_id END AS title,
           CASE WHEN m = 3 THEN NULL ELSE 'D' || doc_id END AS description,
           -- paragraph text is edge-stripped, backlines are REMOVED
           -- (gluing), ' suite' appended, then whitespace-collapsed
           CASE WHEN m = 3 THEN NULL
                ELSE trim(regexp_replace(
                       regexp_replace(
                         trim(text, ' ' || chr(9) || chr(10) || chr(13)),
                         '[' || chr(10) || chr(9) || chr(13) || ']', '', 'g')
                       || ' suite',
                       '\s+', ' ', 'g')) END
             AS full_content,
           CASE WHEN m = 3 THEN NULL
                ELSE CAST(1673740800 AS BIGINT) END AS pub_ts,
           CASE WHEN m = 3 THEN NULL
                ELSE CAST(1675209600 AS BIGINT) END AS upd_ts,
           CASE WHEN m = 3 THEN 'ValueError: NoContent' END AS error_info
    FROM c
    """,
    doc="Extraction gate: a notre-environnement article page is "
    "synthesized per document (Dublin-Core metas with the '~'→' ' "
    "title repair, DC.date/DC.data.modified, article paragraphs for "
    "the trafilatura-stub main-content leg) and run through the real "
    "extract_notre_environnement DOM plugin (extraction/"
    "notre_environnement.py; ref scrapers/notre_environnement.py:"
    "42-99). The paragraph-less quarter dead-letters NoContent.",
)
def notre_environnement_extraction_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..extraction.notre_environnement import extract_notre_environnement

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id") % 4
    body = F.when(m == 3, F.lit("<article></article>")).otherwise(
        F.concat(
            F.lit("<article><p>"),
            F.col("text"),
            F.lit("</p><p>suite</p></article>"),
        )
    )
    html = F.concat(
        F.lit('<html><head><meta name="description" content="D'),
        F.col("doc_id"),
        F.lit('"/><meta name="DC.title" content="T~'),
        F.col("doc_id"),
        F.lit('"/><meta name="DC.date" content="2023-01-15"/>'),
        F.lit('<meta name="DC.data.modified" content="2023-02-01"/></head><body>'),
        body,
        F.lit("</body></html>"),
    )
    url = F.concat(
        F.lit("https://www.notre-environnement.gouv.fr/a-"), F.col("doc_id")
    )
    out = extract_notre_environnement(
        docs.select(html.alias("payload"), url.alias("url"))
    )
    jd = F.col("details_json")
    return out.select(
        "url",
        "title",
        "description",
        "full_content",
        F.get_json_object(jd, "$.publication_date").cast("bigint").alias("pub_ts"),
        F.get_json_object(jd, "$.update_date").cast("bigint").alias("upd_ts"),
        "error_info",
    )
