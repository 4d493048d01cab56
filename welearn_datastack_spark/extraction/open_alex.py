"""OpenAlex extraction — maps works-API JSON to WeLearn document
fields with pure column expressions.

Reference: ``plugins/rest_requesters/open_alex.py`` —
``_update_welearn_document`` (:177-196), ``_build_details``
(:198-228), ``_transform_topics`` (:103-142), license normalization
``_get_licence`` (:322-345), publisher gate
``_check_publisher_authorization`` + ``get_host_ids`` (:347-390),
``_remove_useless_first_word`` (:144-175), ``_invert_abstract``
(:63-67), authors (:237-247), date (:249-255).

All field maps are Catalyst expressions — including the hierarchical
topic dedup (array lambdas over ≤~16 entries/work) and the inverted
abstract — so extraction scales as a narrow map over the raw table.

Deviations (documented): (1) the reference's
``publication_date`` uses a naive ``datetime.timestamp()`` whose value
depends on the worker's local timezone; here it is pinned to UTC.
(2) ``_remove_useless_first_word`` raises IndexError on one-word
strings; here one-word strings pass through unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import clean_doi, inverted_abstract_to_text
from .constants import HTTPS_CREATIVE_COMMONS, PUBLISHERS_TO_AVOID

_SOURCE = T.StructType(
    [
        T.StructField("host_organization_name", T.StringType()),
        T.StructField("issn_l", T.StringType()),
        T.StructField("host_organization_lineage", T.ArrayType(T.StringType())),
    ]
)
_LEVEL = T.StructType(
    [T.StructField("id", T.StringType()), T.StructField("display_name", T.StringType())]
)

OPEN_ALEX_WORK_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField(
            "ids",
            T.StructType(
                [
                    T.StructField("openalex", T.StringType()),
                    T.StructField("doi", T.StringType()),
                ]
            ),
        ),
        T.StructField("language", T.StringType()),
        T.StructField(
            "abstract_inverted_index", T.MapType(T.StringType(), T.ArrayType(T.IntegerType()))
        ),
        T.StructField("publication_date", T.StringType()),
        T.StructField(
            "authorships",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "author",
                            T.StructType([T.StructField("display_name", T.StringType())]),
                        ),
                        T.StructField(
                            "raw_affiliation_strings", T.ArrayType(T.StringType())
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "open_access", T.StructType([T.StructField("is_oa", T.BooleanType())])
        ),
        T.StructField(
            "best_oa_location",
            T.StructType(
                [
                    T.StructField("pdf_url", T.StringType()),
                    T.StructField("license", T.StringType()),
                    T.StructField("source", _SOURCE),
                ]
            ),
        ),
        T.StructField("type", T.StringType()),
        T.StructField(
            "topics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("display_name", T.StringType()),
                        T.StructField("subfield", _LEVEL),
                        T.StructField("field", _LEVEL),
                        T.StructField("domain", _LEVEL),
                    ]
                )
            ),
        ),
        T.StructField(
            "keywords",
            T.ArrayType(T.StructType([T.StructField("display_name", T.StringType())])),
        ),
        T.StructField("referenced_works", T.ArrayType(T.StringType())),
        T.StructField("related_works", T.ArrayType(T.StringType())),
        T.StructField(
            "locations", T.ArrayType(T.StructType([T.StructField("source", _SOURCE)]))
        ),
    ]
)

OPEN_ALEX_RESPONSE_SCHEMA = T.StructType(
    [T.StructField("results", T.ArrayType(OPEN_ALEX_WORK_SCHEMA))]
)

_USELESS_FIRST_WORDS = ["background", "abstract", "introduction"]


def remove_useless_first_word(col: Column, rounds: int = 1) -> Column:
    """Strip leading 'Background'/'Abstract'/'Introduction' tokens when
    the first two words are both capitalized (ref open_alex.py:144-175).

    One ROUND of the reference's recursion. Do NOT inline multiple
    rounds into one expression: each round references the previous
    round's tree ~6 times, so ``rounds`` compose multiplicatively
    (~6^rounds nodes) and Catalyst analysis goes from milliseconds to
    seconds. Callers stage rounds as separate projections instead
    (see extract_open_alex), which keeps the tree linear in rounds."""
    out = col
    for _ in range(rounds):
        words = F.split(out, r"\s+")
        cap = lambda w: w.substr(1, 1).rlike(r"^\p{Lu}")  # noqa: E731
        strippable = (
            (F.size(words) >= 2)
            & cap(words[0])
            & cap(words[1])
            & F.lower(words[0]).isin(*_USELESS_FIRST_WORDS)
        )
        out = F.when(strippable, F.array_join(F.slice(words, 2, F.size(words) - 1), " ")).otherwise(out)
    return out


def normalize_license(license_col: Column) -> Column:
    """cc-* slug → canonical creativecommons URL; other values
    lowercase; null → '' (ref _get_licence, open_alex.py:322-345)."""
    return (
        F.when(license_col.isNull(), F.lit(""))
        .when(
            license_col.startswith("cc-"),
            F.concat(
                F.lit(f"{HTTPS_CREATIVE_COMMONS}/licenses/"),
                F.regexp_replace(license_col, "^cc-", ""),
                F.lit("/4.0/"),
            ),
        )
        .otherwise(F.lower(license_col))
    )


def _host_ids(locations: Column) -> Column:
    """locations[].source.host_organization_lineage URLs →
    openalex ids (path tail), skipping malformed hosts
    (ref get_host_ids + _extract_openalex_id_from_urls)."""
    urls = F.flatten(
        F.transform(
            locations,
            lambda l: F.coalesce(
                l["source"]["host_organization_lineage"],
                F.array().cast("array<string>"),
            ),
        )
    )
    return F.transform(
        F.filter(urls, lambda u: F.lower(u).rlike(r"^https?://openalex\.org/")),
        lambda u: F.element_at(F.split(u, "/"), -1),
    )


def _topic_levels(topics: Column) -> Column:
    """Per-work topic list → flattened 4-level hierarchy entries
    (domain/field/subfield/topic with depth + parent links), ref
    _transform_topics levels, open_alex.py:110-125."""
    empty = F.array().cast("array<string>")

    def level(id_c, name_c, depth: int, depth_name: str, parents) -> Column:
        return F.struct(
            id_c.alias("external_id"),
            name_c.alias("name"),
            F.lit(depth).alias("depth"),
            F.lit(depth_name).alias("external_depth_name"),
            parents.alias("directly_contained_in"),
        )

    return F.flatten(
        F.transform(
            F.coalesce(topics, F.array().cast(T.ArrayType(OPEN_ALEX_WORK_SCHEMA["topics"].dataType.elementType))),
            lambda t: F.array(
                level(t["domain"]["id"], t["domain"]["display_name"], 0, "domain", empty),
                level(t["field"]["id"], t["field"]["display_name"], 1, "field", F.array(t["domain"]["id"])),
                level(t["subfield"]["id"], t["subfield"]["display_name"], 2, "subfield", F.array(t["field"]["id"])),
                level(t["id"], t["display_name"], 3, "topic", F.array(t["subfield"]["id"])),
            ),
        )
    )


def _dedup_first_occurrence(levels: Column) -> Column:
    """First occurrence per external_id wins (ref open_alex.py:127-140).
    Linear fold with an accumulator — unlike a filter+exists pair this
    references the source array ONCE, keeping the codegen tree linear
    in size (a duplicated subtree here measurably blows up compile)."""
    elem_t = (
        "array<struct<external_id:string,name:string,depth:int,"
        "external_depth_name:string,directly_contained_in:array<string>>>"
    )
    return F.aggregate(
        levels,
        F.array().cast(elem_t),
        lambda acc, x: F.when(
            F.exists(acc, lambda y: y["external_id"] == x["external_id"]), acc
        ).otherwise(F.concat(acc, F.array(x))),
    )


def parse_open_alex_response(
    responses: DataFrame,
    payload_col: str = "payload",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One row per works-API response → one row per work.
    ``keep_cols`` ride along through the explode."""
    parsed = responses.withColumn(
        "_parsed", F.from_json(F.col(payload_col), OPEN_ALEX_RESPONSE_SCHEMA)
    )
    return parsed.select(
        F.explode("_parsed.results").alias("w"), *[F.col(c) for c in (keep_cols or [])]
    )


def extract_open_alex(
    responses: DataFrame,
    payload_col: str = "payload",
    pdf_text_col: str | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """OpenAlex works-API responses → extracted WeLearn rows.

    Gate order matches the reference (:180-182): publisher →
    open-access → license; a failed gate dead-letters the row with
    the reference's exception name in ``error_info``.
    ``keep_cols`` pass through the explode unchanged.
    """
    from .constants import AUTHORIZED_LICENSES

    keep = list(keep_cols or [])
    works = parse_open_alex_response(responses, payload_col, keep_cols=keep)
    w = F.col("w")

    # stage heavy array expressions as their own projections — each
    # appears exactly once in the plan instead of being re-inlined
    # into every downstream reference (codegen-size discipline, see
    # operators/dedup.py and the _dedup_first_occurrence note)
    pdf_text = F.col(pdf_text_col) if pdf_text_col else F.lit(None).cast("string")
    staged = works.select(
        *[F.col(c) for c in keep],
        w.alias("w"),
        pdf_text.alias("_pdf_text"),
        _host_ids(w["locations"]).alias("_host_ids"),
        normalize_license(w["best_oa_location"]["license"]).alias("_license_url"),
        F.coalesce(
            inverted_abstract_to_text(w["abstract_inverted_index"]), F.lit("")
        ).alias("_desc"),
        _topic_levels(w["topics"]).alias("_topic_levels"),
        clean_doi(w["ids"]["doi"]).alias("_doi"),
    )
    # the reference strips up to len(_USELESS_FIRST_WORDS)+1 leading
    # tokens; one projection per round keeps the expression tree
    # linear (see remove_useless_first_word docstring)
    for _ in range(4):
        staged = staged.withColumn(
            "_desc", remove_useless_first_word(F.col("_desc"))
        )

    bad_publisher = F.exists(
        F.col("_host_ids"), lambda h: F.upper(h).isin(*PUBLISHERS_TO_AVOID)
    )
    # _check_license compares the lowercased canonical URL against the
    # (all-lowercase) allow-list; cc-normalized URLs are lowercase by
    # construction
    license_ok = F.lower(F.col("_license_url")).isin(*AUTHORIZED_LICENSES)
    staged = staged.select(
        "*",
        (
            F.when(bad_publisher, "UnauthorizedPublisher")
            .when(
                ~F.coalesce(F.col("w")["open_access"]["is_oa"], F.lit(False)),
                "ClosedAccessContent",
            )
            .when(
                ~license_ok,
                F.concat(F.lit("UnauthorizedLicense: "), F.lower("_license_url")),
            )
        ).alias("_error"),
        _dedup_first_occurrence(F.col("_topic_levels")).alias("_topics"),
    )

    w = F.col("w")
    desc = F.col("_desc")
    pdf_mode = w["best_oa_location"]["pdf_url"].isNotNull() & F.col("_pdf_text").isNotNull()
    content = F.when(pdf_mode, F.col("_pdf_text")).otherwise(desc)
    pub_ts = F.unix_date(F.to_date(w["publication_date"])).cast("long") * 86400

    details = F.struct(
        pub_ts.alias("publication_date"),
        w["type"].alias("type"),
        F.col("_doi").alias("doi"),
        w["best_oa_location"]["source"]["host_organization_name"].alias("publisher"),
        F.col("_license_url").alias("license_url"),
        w["best_oa_location"]["source"]["issn_l"].alias("issn"),
        pdf_mode.alias("content_from_pdf"),
        F.col("_topics").alias("topics"),
        F.transform(
            F.coalesce(w["keywords"], F.array().cast(T.ArrayType(T.StructType([T.StructField("display_name", T.StringType())])))),
            lambda k: k["display_name"],
        ).alias("tags"),
        w["referenced_works"].alias("referenced_works"),
        w["related_works"].alias("related_works"),
        F.transform(
            F.coalesce(w["authorships"], F.array().cast(OPEN_ALEX_WORK_SCHEMA["authorships"].dataType)),
            lambda a: F.struct(
                a["author"]["display_name"].alias("name"),
                F.array_join(
                    F.coalesce(a["raw_affiliation_strings"], F.array().cast("array<string>")), ","
                ).alias("misc"),
            ),
        ).alias("authors"),
    )

    ok = F.col("_error").isNull()
    return staged.select(
        *[F.col(c) for c in keep],
        F.when(ok, w["ids"]["openalex"]).alias("url"),
        F.when(ok, w["title"]).alias("title"),
        F.when(ok, desc).alias("description"),
        F.when(ok, content).alias("full_content"),
        F.when(ok, details).alias("details"),
        F.when(ok, F.col("_doi")).alias("external_id"),
        F.when(ok, F.lit("DOI")).alias("external_id_type"),
        w["language"].alias("lang"),
        F.col("_error").alias("error_info"),
    )
