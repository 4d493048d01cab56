"""URL collectors (SURVEY.md §2.1 S1–S10) — file/payload-based Spark
readers mirroring the reference's collectors/ package, minus live
HTTP (tests feed captured fixtures, like the reference's golden
payload tests under tests/*/resources/).

Every collector returns a DataFrame of (url, corpus) candidate rows
feeding pipeline/url_ingest.insert_urls (S11).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F20 — regex XML extraction (reference modules/xml_extractor.py:55–101,
# pattern builder utils_/regular_expression.py:80–90)
# ---------------------------------------------------------------------------


def xml_tag_pattern(tag: str) -> str:
    """The reference's generated tag pattern: ``<tag ...>content</tag>``
    (regular_expression.py:simple_xml_tag_format_regex). (?s) so ``.``
    crosses newlines — real feeds put tags on their own lines, and
    without DOTALL every multi-line feed silently matches nothing.
    The ``\\b`` after the tag mirrors the reference exactly — without
    it ``<title>`` would also match ``<titleInfo>``."""
    return rf"(?s)<{re.escape(tag)}\b[^>]*>(.*?)</{re.escape(tag)}>"


def extract_xml_tag(col: Column, tag: str) -> Column:
    """All contents of ``<tag>`` in a string column (F20)."""
    return F.regexp_extract_all(col, F.lit(xml_tag_pattern(tag)), 1)


def extract_xml_attr(col: Column, tag: str, attr: str) -> Column:
    """All values of ``attr`` across ``<tag>`` occurrences."""
    return F.regexp_extract_all(
        col, F.lit(rf"(?s)<{re.escape(tag)}\b[^>]*{attr}=\"([^\"]*)\""), 1
    )


# ---------------------------------------------------------------------------
# F21 — URL normalization helpers (reference collectors/helpers/
# feed_helpers.py:9–50)
# ---------------------------------------------------------------------------


def normalize_to_https(col: Column) -> Column:
    """Rewrite http:// → https:// (feed_helpers.py scheme rewrite)."""
    return F.regexp_replace(col, r"^http://", "https://")


def filter_domain(df: DataFrame, url_col: str, domain: str) -> DataFrame:
    """Keep URLs on ``domain`` (feed_helpers.py domain filter) —
    ``parse_url`` is a Catalyst builtin, no UDF."""
    return df.filter(F.parse_url(F.col(url_col), F.lit("HOST")) == domain)


# ---------------------------------------------------------------------------
# S1 — CSV URL collector (reference collectors/csv_collector.py:11–44)
# ---------------------------------------------------------------------------


def collect_csv_urls(
    spark: SparkSession,
    path: str,
    corpus: str,
    url_column: str = "url",
    delimiter: str = ",",
    quotechar: str = '"',
) -> DataFrame:
    df = spark.read.csv(path, header=True, sep=delimiter, quote=quotechar)
    return (
        df.select(F.col(url_column).alias("url"))
        .filter(F.col("url").startswith("https"))  # P7, csv_collector.py:36–37
        .withColumn("corpus", F.lit(corpus))
    )


# ---------------------------------------------------------------------------
# S2 — JSON URL collector with recursive field search
# (reference collectors/json_collector.py:12–44 +
# helpers/json_helpers.py:4–17 search_url_field)
# ---------------------------------------------------------------------------


def collect_json_urls(spark: SparkSession, path: str, corpus: str, url_field: str = "url") -> DataFrame:
    """The reference walks arbitrary JSON for ``url_field`` at any
    depth (F22). Spark-side: read as text, regex-pull every
    ``"url_field": "value"`` occurrence — schema-free like the
    reference, no UDF."""
    raw = spark.read.text(path, wholetext=True)
    pat = rf'"{re.escape(url_field)}"\s*:\s*"([^"]*)"'
    return (
        raw.select(F.explode(F.regexp_extract_all("value", F.lit(pat), 1)).alias("url"))
        .filter(F.col("url").startswith("https"))
        .withColumn("corpus", F.lit(corpus))
    )


# ---------------------------------------------------------------------------
# S3/S4 — RSS / Atom feed collectors (reference collectors/
# rss_collector.py:24–51, atom_collector.py:41–81)
# ---------------------------------------------------------------------------


def collect_rss_urls(
    spark: SparkSession, path: str, corpus: str, domain: str | None = None
) -> DataFrame:
    """RSS: ``<item>…<link>url</link>…</item>`` (the reference
    hand-parses lines; we extract per-item links in one pass)."""
    raw = spark.read.text(path, wholetext=True)
    items = raw.select(F.explode(extract_xml_tag(F.col("value"), "item")).alias("item"))
    urls = items.select(
        F.explode(extract_xml_tag(F.col("item"), "link")).alias("url")
    ).select(normalize_to_https(F.col("url")).alias("url"))
    if domain:
        urls = filter_domain(urls, "url", domain)
    return urls.withColumn("corpus", F.lit(corpus))


def collect_atom_urls(spark: SparkSession, path: str, corpus: str) -> DataFrame:
    """Atom: ``<entry>`` then ``<link rel="alternate" href=…>``."""
    raw = spark.read.text(path, wholetext=True)
    entries = raw.select(F.explode(extract_xml_tag(F.col("value"), "entry")).alias("entry"))
    return (
        entries.select(
            F.explode(
                F.regexp_extract_all(
                    "entry", F.lit(r'<link[^>]*rel="alternate"[^>]*href="([^"]*)"'), 1
                )
            ).alias("url")
        )
        .withColumn("corpus", F.lit(corpus))
    )


# ---------------------------------------------------------------------------
# S5 — sitemap collector with one-level index recursion
# (reference collectors/sitemap_collector.py:29–85)
# ---------------------------------------------------------------------------


def collect_sitemap_urls(
    spark: SparkSession,
    path: str,
    corpus: str,
    fetch: "callable | None" = None,
) -> DataFrame:
    """``<sitemapindex>`` detection + one-level recursion: if the file
    is an index, its ``<loc>`` entries name sub-sitemaps which
    ``fetch(loc) -> xml_text`` resolves (tests inject a local-file
    fetch; production would GET inside mapInPandas per partition).
    Plain sitemap → the ``<loc>`` entries ARE the urls."""
    text = "\n".join(r["value"] for r in spark.read.text(path, wholetext=True).collect())
    locs = re.findall(xml_tag_pattern("loc"), text, re.S)
    if "<sitemapindex" in text:
        if fetch is None:
            raise ValueError("index sitemap needs a fetch callable")
        sub_texts = spark.createDataFrame([(fetch(u),) for u in locs], ["xml"])
        urls = sub_texts.select(F.explode(extract_xml_tag(F.col("xml"), "loc")).alias("url"))
    else:
        urls = spark.createDataFrame([(u,) for u in locs], ["url"])
    return urls.withColumn("corpus", F.lit(corpus))


# ---------------------------------------------------------------------------
# S6–S10 — API-paginated collectors (HAL, OpenAlex, TED, …). The
# pagination/cursor drivers are network loops (reference
# collectors/hal_collector.py, open_alex_collector.py); here the
# page payloads arrive as JSON files/strings and the *filter
# semantics* are DataFrame predicates (P8/P9 pushdown replay).
# ---------------------------------------------------------------------------

AUTHORIZED_LICENSES = (  # reference constants.py:169–185 (CC family + PD)
    "cc-by",
    "cc-by-sa",
    "cc0",
    "public-domain",
)


def openalex_filter(works: DataFrame, publishers_to_avoid: list[str]) -> DataFrame:
    """S8's server-side filter set replayed as Catalyst predicates
    (collectors/open_alex_collector.py:89–119): license allow-list,
    not-retracted, oa_status, predatory-publisher NOT-IN (P9), lang,
    type."""
    return works.filter(
        F.col("license").isin(*AUTHORIZED_LICENSES)
        & ~F.col("is_retracted")
        & F.col("oa_status").isin("gold", "diamond")
        & ~F.col("publisher_id").isin(*publishers_to_avoid)
        & F.col("lang").isin("en", "fr")
    )


def hal_date_to_epoch(col: Column) -> Column:
    """F16: HAL producedDate 'YYYY-MM-DDThh:mm:ss' → epoch seconds
    (reference rest_requesters/hal.py:86–100: split on 'T', parse
    date, UTC)."""
    return F.unix_timestamp(F.to_date(F.substring_index(col, "T", 1)))
