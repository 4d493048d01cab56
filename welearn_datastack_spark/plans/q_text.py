"""Text / metadata query group — the scalar-function surface
(SURVEY.md §2.8 F1–F21, §2.2 P10/P11) plus the training-data-pipeline
text-analysis operators (language-ID heuristic, quality scoring, token
counting, document fingerprinting) over the ``documents`` table.

Everything here is pure Catalyst column logic (whole-stage codegen,
zero Python) — the pandas-UDF variants of the non-expressible pieces
(Pyphen syllables, lingua lang-id, NFC) live in functions/udfs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.metadata import predict_duration, predict_readability
from ..functions.text import (
    lexicon_count,
    normalize_for_fingerprint,
    remove_extra_whitespace,
    sentence_count,
)
from ..sources.tables import fan_out_for_compute, load_table
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents table fanned out for the per-row text kernels in this
    module (token/shingle/regex work dominates the scan stage);
    fan_out_for_compute is a structural no-op on already-parallel
    layouts — see sources/tables.py."""
    return fan_out_for_compute(load_table(spark, sf_dir, "documents"))

# language-ID marker tokens (n-gram-heuristic langid; deliberately
# disjoint across languages so argmax+tiebreak is deterministic)
LANGID_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "to"],
    "fr": ["le", "les", "et", "une", "dans"],
    "es": ["el", "y", "que", "los", "para"],
    "de": ["der", "und", "das", "ein", "nicht"],
}

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "it"]


@register(
    "text_normalize",
    """
    SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text_norm
    FROM documents
    """,
    doc="F1/F3: whitespace collapse + trim (ref scraping_utils.py:26-37)",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", remove_extra_whitespace(F.col("text")).alias("text_norm"))


@register(
    "lexicon_metrics",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\w+')) AS INT) AS n_words,
           CAST(greatest(1, len(regexp_extract_all(text, '[^.!?]+[.!?]'))) AS INT) AS n_sentences,
           len(regexp_extract_all(text, '\\w+'))
             / greatest(1, len(regexp_extract_all(text, '[^.!?]+[.!?]'))) AS avg_sentence_len
    FROM documents
    """,
    doc="F9/F10/F11: lexicon count, sentence count (floor 1), avg sentence "
    "length (ref computed_metadata.py:68-112)",
)
def lexicon_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = lexicon_count(F.col("text"))
    sents = sentence_count(F.col("text"))
    return docs.select(
        "doc_id",
        words.alias("n_words"),
        sents.alias("n_sentences"),
        (words.cast("double") / sents.cast("double")).alias("avg_sentence_len"),
    )


# DuckDB twin of functions/metadata.py:predict_readability — vowel-group
# syllables, round-half-away, clamp [0,100], 2-dp decimal string.
_READABILITY_ORACLE = """
WITH m AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, '\\w+')) AS DOUBLE) AS words,
         CAST(greatest(1, len(regexp_extract_all(text, '[^.!?]+[.!?]'))) AS DOUBLE) AS sents,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS sylls
  FROM documents
), s AS (
  SELECT doc_id,
         CASE lang WHEN 'en' THEN 206.835 WHEN 'fr' THEN 207.0 WHEN 'es' THEN 206.84
                   WHEN 'de' THEN 180.0 WHEN 'it' THEN 217.0 WHEN 'nl' THEN 206.84 END
         - CASE lang WHEN 'en' THEN 1.015 WHEN 'fr' THEN 1.015 WHEN 'es' THEN 1.02
                     WHEN 'de' THEN 1.0 WHEN 'it' THEN 1.3 WHEN 'nl' THEN 0.93 END
           * (words / sents)
         - CASE lang WHEN 'en' THEN 84.6 WHEN 'fr' THEN 73.6 WHEN 'es' THEN 60.0
                     WHEN 'de' THEN 58.5 WHEN 'it' THEN 60.0 WHEN 'nl' THEN 77.0 END
           * (sylls / greatest(words, 1.0)) AS score
  FROM m
)
SELECT doc_id,
       CASE WHEN score IS NULL THEN NULL
            ELSE CAST(CAST(least(greatest(
                   floor(score * 100 + CASE WHEN score < 0 THEN -0.5 ELSE 0.5 END) / 100,
                   0.0), 100.0) AS DECIMAL(6,2)) AS VARCHAR)
       END AS readability
FROM s
"""


@register(
    "readability",
    _READABILITY_ORACLE,
    doc="F13: per-language Flesch readability, round-half-away, clamped, "
    "AS STRING; NULL for unsupported langs (ref computed_metadata.py:156-180)",
)
def readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # regex-heavy per-row work; small single-file scans arrive as one
    # partition — spread across cores first (see operators/dedup.py note)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return docs.select("doc_id", predict_readability(F.col("text"), F.col("lang")).alias("readability"))


@register(
    "reading_duration",
    """
    SELECT doc_id,
           CAST(CAST(trunc(
             len(regexp_extract_all(text, '\\w+'))
             / CAST(CASE lang WHEN 'en' THEN 228 WHEN 'fr' THEN 195 WHEN 'es' THEN 218
                              WHEN 'de' THEN 179 WHEN 'it' THEN 188 WHEN 'nl' THEN 202
                              ELSE 184 END AS DOUBLE) * 60
           ) AS INT) AS VARCHAR) AS duration
    FROM documents
    """,
    doc="F14: reading duration seconds = int(words/speed*60), default "
    "speed 184, AS STRING (ref computed_metadata.py:183-198)",
)
def reading_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", predict_duration(F.col("text"), F.col("lang")).alias("duration"))


@register(
    "json_field_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val
    FROM events
    """,
    doc="F5-adjacent: JSON field access over a string column "
    "(ref details->>'doi' in update_doi_from_details.sql)",
)
def json_field_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", F.get_json_object("props", "$.k").cast("int").alias("k_val"))


@register(
    "url_status_classify",
    """
    SELECT event_id, code,
           CASE WHEN code BETWEEN 200 AND 299 THEN 'VALID'
                WHEN code BETWEEN 300 AND 399 THEN 'TO_UPDATE'
                WHEN code BETWEEN 400 AND 499 THEN 'TO_DELETE'
                ELSE 'UNKNOWN' END AS url_status
    FROM (SELECT event_id,
                 200 + (CAST(json_extract_string(props, '$.k') AS INT) * 7) % 350 AS code
          FROM events)
    """,
    doc="P11: HTTP status → 3-way URL classification CASE "
    "(ref modules/url_checker.py:23-46)",
)
def url_status_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    code = (F.lit(200) + (F.get_json_object("props", "$.k").cast("int") * 7) % 350).alias("code")
    out = ev.select("event_id", code)
    return out.select(
        "event_id",
        "code",
        F.when(F.col("code").between(200, 299), "VALID")
        .when(F.col("code").between(300, 399), "TO_UPDATE")
        .when(F.col("code").between(400, 499), "TO_DELETE")
        .otherwise("UNKNOWN")
        .alias("url_status"),
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
    doc="Text-analysis: deterministic document fingerprint "
    "(normalize → md5; ref scraping_utils.py:186-195 normalize + dedup use)",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", F.md5(normalize_for_fingerprint(F.col("text"))).alias("fingerprint"))


@register(
    "token_counts",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT)
             AS bpe_ish_tokens
    FROM documents
    """,
    doc="Text-analysis: whitespace + BPE-ish regex token counting",
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)).alias(
            "bpe_ish_tokens"
        ),
    )


def _markers_sql(lang: str) -> str:
    toks = ", ".join(f"'{t}'" for t in LANGID_MARKERS[lang])
    return (
        f"len(list_filter(regexp_extract_all(lower(text), '\\w+'),"
        f" t -> list_contains([{toks}], t)))"
    )


@register(
    "langid_heuristic",
    f"""
    SELECT doc_id, pred_lang FROM (
      SELECT doc_id,
             CASE greatest({_markers_sql('en')}, {_markers_sql('fr')},
                           {_markers_sql('es')}, {_markers_sql('de')})
                  WHEN 0 THEN 'und'
                  WHEN {_markers_sql('de')} THEN 'de'
                  WHEN {_markers_sql('en')} THEN 'en'
                  WHEN {_markers_sql('es')} THEN 'es'
                  WHEN {_markers_sql('fr')} THEN 'fr'
             END AS pred_lang
      FROM documents)
    """,
    doc="Text-analysis / F15-shaped: marker-token language-ID heuristic "
    "(argmax score, ties broken by the fixed de<en<es<fr probe order; "
    "'und' when no markers hit). Ref computed_metadata.py:202-237 uses "
    "lingua — the model-based twin is a pandas UDF in functions/udfs.py.",
)
def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0)

    def score(lang: str):
        markers = F.array(*[F.lit(t) for t in LANGID_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))

    best = F.greatest(score("en"), score("fr"), score("es"), score("de"))
    pred = (
        F.when(best == 0, "und")
        .when(score("de") == best, "de")
        .when(score("en") == best, "en")
        .when(score("es") == best, "es")
        .otherwise("fr")
    )
    return docs.select("doc_id", pred.alias("pred_lang"))


_SW = ", ".join(f"'{t}'" for t in STOPWORDS_EN)


@register(
    "quality_score",
    f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\w+')) AS DOUBLE) AS words,
             CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha_chars,
             CAST(len(list_filter(regexp_extract_all(lower(text), '\\w+'),
                                  t -> list_contains([{_SW}], t))) AS DOUBLE) AS sw
      FROM documents)
    SELECT doc_id,
           CAST(words AS INT) AS n_words,
           ROUND(alpha_chars / greatest(words, 1.0) + 5e-10, 4) AS avg_word_len,
           ROUND(sw / greatest(words, 1.0) + 5e-10, 4) AS stopword_ratio,
           ROUND(0.4 * least(words / 100, 1.0)
                 + 0.3 * (1.0 - sw / greatest(words, 1.0))
                 + 0.3 * least(alpha_chars / greatest(words, 1.0) / 8, 1.0) + 5e-10, 4) AS quality
    FROM m
    """,
    doc="Text-analysis: quality scoring from length / word-shape / "
    "stopword-ratio signals (LLM-data-pipeline heuristic filter)",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = F.size(F.regexp_extract_all("text", F.lit(r"\w+"), 0)).cast("double")
    alpha = F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]"), 0)).cast("double")
    sw_arr = F.array(*[F.lit(t) for t in STOPWORDS_EN])
    sw = F.size(
        F.filter(
            F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0),
            lambda t: F.array_contains(sw_arr, t),
        )
    ).cast("double")
    g1 = F.greatest(words, F.lit(1.0))
    # +5e-10 before rounding: ratios like 39/10/8 land exactly on the
    # 4-dp half-way boundary, where Spark (binary-exact HALF_UP) and
    # DuckDB (decimal-string) disagree; the shared epsilon breaks the
    # tie identically in both engines.
    eps = F.lit(5e-10)
    return docs.select(
        "doc_id",
        words.cast("int").alias("n_words"),
        F.round(alpha / g1 + eps, 4).alias("avg_word_len"),
        F.round(sw / g1 + eps, 4).alias("stopword_ratio"),
        F.round(
            0.4 * F.least(words / 100, F.lit(1.0))
            + 0.3 * (1.0 - sw / g1)
            + 0.3 * F.least(alpha / g1 / 8, F.lit(1.0))
            + eps,
            4,
        ).alias("quality"),
    )


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT doc_id, term, tfidf, rnk FROM (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln((SELECT n_docs FROM n) / df.df), 6) AS tfidf,
             CAST(row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY ROUND(tf.tf * ln((SELECT n_docs FROM n) / df.df), 6) DESC,
                        tf.term ASC) AS INT) AS rnk
      FROM tf JOIN df ON df.term = tf.term
    ) WHERE rnk <= 5
    """,
    doc="Text-analysis: TF-IDF top-5 terms per document — term "
    "frequencies, document frequencies (broadcast), log-idf weighting, "
    "per-document ranking. The scalable keyword-scoring shape behind "
    "M5-style extraction (tf and df both combine map-side).",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import top_k_by

    docs = _docs(spark, sf_dir)
    # n_docs stays lazy (broadcast 1-row cross join) — an eager
    # .count() here would trigger a full table scan every time the
    # builder is called, before the query even runs
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    toks = docs.select(
        "doc_id", F.explode(F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency DERIVED FROM tf (count of (doc,term) rows per
    # term ≡ COUNT(DISTINCT doc_id) over toks): both consumers now
    # share tf's exchange, so the scan+regex+explode runs once and the
    # df branch is a ReusedExchange instead of a second full pass
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    return top_k_by(scored, ["doc_id"], [F.desc("tfidf"), F.asc("term")], k=5).select(
        "doc_id", "term", "tfidf", "rnk"
    )


@register(
    "sessionization",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM marked
    )
    SELECT user_id, CAST(session_seq AS INT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_seq
    """,
    doc="Event-time sessionization: 30-minute-gap session boundaries "
    "via lag + running sum of start markers, then per-session "
    "aggregates — the batch twin of the streaming session-window "
    "(same clustering reused by both windows and the final groupBy: "
    "one shuffle total)",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("us")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = 30 * 60 * 1_000_000  # 30 min in µs
    marked = ev.withColumn(
        "is_start",
        F.when(
            F.lag("us").over(w).isNull() | ((F.col("us") - F.lag("us").over(w)) > gap), 1
        ).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_seq",
        F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("int"),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# DuckDB twin of operators/dedup.py:hexint (md5 → int63)
_HEXINT_T = (
    "list_reduce([strpos('0123456789abcdef', c) - 1"
    " for c in regexp_extract_all(substr(md5({x}), 1, 15), '.')],"
    " (a, b) -> a * 16 + b)"
)


@register(
    "stratified_sample",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             {_HEXINT_T.format(x="CAST(doc_id AS VARCHAR)")} % 100 AS h
      FROM documents)
    WHERE h < CASE lang WHEN 'en' THEN 10 WHEN 'fr' THEN 50
                        WHEN 'es' THEN 50 WHEN 'de' THEN 50 ELSE 25 END
    """,
    doc="Training-data curation: deterministic hash-based stratified "
    "sampling — per-language keep rates (downsample dominant 'en', "
    "keep half of the rest) via md5-bucket membership, reproducible "
    "across runs/engines unlike rand()-based sampleBy",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import hexint

    docs = _docs(spark, sf_dir)
    h = hexint(F.col("doc_id").cast("string")) % 100
    quota = (
        F.when(F.col("lang") == "en", 10)
        .when(F.col("lang").isin("fr", "es", "de"), 50)
        .otherwise(25)
    )
    return docs.filter(h < quota).select("doc_id", "lang")


@register(
    "source_quota_mix",
    f"""
    SELECT doc_id, source, CAST(rnk AS INT) AS rnk FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_HEXINT_T.format(x="CAST(doc_id AS VARCHAR)")}, doc_id) AS rnk
      FROM documents)
    WHERE rnk <= CASE WHEN source IN ('src0', 'src1', 'src2') THEN 20 ELSE 5 END
    """,
    doc="Training-data curation: per-source quota mixing — rank each "
    "source's documents by deterministic hash (a reproducible shuffle) "
    "and keep a per-source quota, the dataset-mixing primitive for "
    "weighted source blends",
)
def source_quota_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import hexint
    from ..operators.topk import top_k_by

    docs = _docs(spark, sf_dir)
    ranked = top_k_by(
        docs.select("doc_id", "source", hexint(F.col("doc_id").cast("string")).alias("__h")),
        ["source"],
        [F.asc("__h"), F.asc("doc_id")],
        k=1000000,
        rank_col="rnk",
    ).drop("__h")
    quota = F.when(F.col("source").isin("src0", "src1", "src2"), 20).otherwise(5)
    return ranked.filter(F.col("rnk") <= quota).select("doc_id", "source", "rnk")


@register(
    "repetition_ratio",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents
    ), tri AS (
      SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS sh
      FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
      WHERE len(t) >= 3
    ), cnt AS (
      SELECT doc_id, sh, COUNT(*) AS c FROM tri GROUP BY doc_id, sh
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_trigrams,
           MAX(c) / CAST(SUM(c) AS DOUBLE) AS max_trigram_ratio
    FROM cnt GROUP BY doc_id
    """,
    doc="Quality filter: repeated-trigram ratio (Gopher-style repetition "
    "rule) — max trigram frequency over total trigrams; boilerplate and "
    "degenerate generations score high. Raw double division, no "
    "rounding needed: both engines divide identical integers.",
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tokenized = docs.select(
        "doc_id", F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0).alias("t")
    ).filter(F.size("t") >= 3)
    tri = tokenized.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 3),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i + 1), F.element_at("t", i + 2), F.element_at("t", i + 3)
                ),
            )
        ).alias("sh"),
    )
    cnt = tri.groupBy("doc_id", "sh").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_trigrams"),
        (F.max("c") / F.sum("c").cast("double")).alias("max_trigram_ratio"),
    )


@register(
    "pii_pattern_flags",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(t2, '[a-z0-9._]+@[a-z0-9.-]+')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t2, '[0-9]{3}[- ][0-9]{4}')) AS INT) AS n_phones,
           len(regexp_extract_all(t2, '[a-z0-9._]+@[a-z0-9.-]+')) > 0
             OR len(regexp_extract_all(t2, '[0-9]{3}[- ][0-9]{4}')) > 0 AS has_pii
    FROM (
      SELECT doc_id,
             text || CASE doc_id % 7 WHEN 0 THEN ' contact: a.b@example.com'
                                     WHEN 1 THEN ' call 555-1234' ELSE '' END AS t2
      FROM documents)
    """,
    doc="Quality/safety filter: PII pattern detection (email / phone "
    "regex counts + flag) — the scrub-or-drop signal a training-data "
    "pipeline computes before export (test rows synthesized "
    "deterministically since the corpus has no real PII)",
)
def pii_pattern_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    t2 = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, " contact: a.b@example.com")
        .when(F.col("doc_id") % 7 == 1, " call 555-1234")
        .otherwise(""),
    )
    emails = F.size(F.regexp_extract_all(t2, F.lit(r"[a-z0-9._]+@[a-z0-9.-]+"), 0))
    phones = F.size(F.regexp_extract_all(t2, F.lit(r"[0-9]{3}[- ][0-9]{4}"), 0))
    return docs.select(
        "doc_id",
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        ((emails > 0) | (phones > 0)).alias("has_pii"),
    )


@register(
    "length_percentiles",
    """
    WITH ranked AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN n_chars END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN n_chars END) AS p90,
           MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN n_chars END) AS p99
    FROM ranked GROUP BY lang
    """,
    doc="Corpus statistics: exact per-language length percentiles via "
    "rank-pick (percentile_disc semantics — engine-independent, unlike "
    "interpolating quantile functions). At 100 TB swap for "
    "approx_percentile with a documented error bound.",
)
def length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("n"),
    )
    pick = lambda p: F.max(
        F.when(F.col("rn") == F.ceil(p * F.col("n")).cast("bigint"), F.col("n_chars"))
    )
    return ranked.groupBy("lang").agg(
        pick(0.5).alias("p50"), pick(0.9).alias("p90"), pick(0.99).alias("p99")
    )


@register(
    "token_entropy",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c) + 5e-10, 4)
             AS token_entropy
    FROM tf GROUP BY doc_id
    """,
    doc="Quality signal: per-document Shannon entropy of the token "
    "unigram distribution (H = log2 n − Σ c·log2 c / n) — low entropy "
    "flags repetitive/generated gibberish, the same family of filter "
    "as the Gopher repetition rules but distribution-shaped. Two "
    "hash aggregations, both with map-side partial combine; the "
    "algebraic identity avoids materializing per-term probabilities, "
    "so the second agg carries three running sums. Docs with zero "
    "tokens produce no row (no distribution to score) on both sides.",
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    spark_par = spark.sparkContext.defaultParallelism
    toks = (
        docs.repartition(spark_par, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0)
            ).alias("tok"),
        )
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c") + F.lit(5e-10),
            4,
        ).alias("token_entropy"),
    )


@register(
    "pmi_cooccurrence",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
      FROM documents
    ), df AS (
      SELECT tok, COUNT(*) AS n_tok FROM toks GROUP BY tok
    ), total AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks
    ), pairs AS (
      SELECT a.tok AS tok1, b.tok AS tok2, COUNT(*) AS n_pair
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY a.tok, b.tok
    )
    SELECT tok1, tok2, CAST(n_pair AS BIGINT) AS n_pair,
           ROUND(n_pair::DOUBLE * n_docs / (d1.n_tok * d2.n_tok) + 5e-10, 4)
             AS lift
    FROM pairs
    JOIN df d1 ON d1.tok = pairs.tok1
    JOIN df d2 ON d2.tok = pairs.tok2
    CROSS JOIN total
    WHERE n_pair >= 50
    """,
    doc="Corpus analytics: pointwise co-occurrence lift for token "
    "pairs — P(t1,t2)/(P(t1)P(t2)) at document granularity, the "
    "exponentiated-PMI collocation score (kept as a ratio: ln() "
    "differs by ulps across engines, plain arithmetic hashes "
    "identically). Plan shape: per-doc distinct tokens stay "
    "clustered on doc_id so the pair self-join is exchange-free on "
    "both sides; pair counts partial-aggregate map-side; the "
    "document-frequency and total-docs sides are tiny and broadcast. "
    "At 100 TB the pair blow-up is bounded by capping the vocabulary "
    "(df filter) before pairing — here the synthetic vocab is ~40 "
    "terms, the n_pair >= 50 floor plays that role.",
)
def pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    spark_par = spark.sparkContext.defaultParallelism
    toks = (
        docs.repartition(spark_par, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0))
            ).alias("tok"),
        )
    )
    df_tok = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    total = toks.agg(F.count_distinct("doc_id").alias("n_docs"))
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.tok") < F.col("b.tok")))
        .groupBy(F.col("a.tok").alias("tok1"), F.col("b.tok").alias("tok2"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 50)
    )
    return (
        pairs.join(F.broadcast(df_tok.withColumnRenamed("tok", "tok1").withColumnRenamed("n_tok", "n1")), "tok1")
        .join(F.broadcast(df_tok.withColumnRenamed("tok", "tok2").withColumnRenamed("n_tok", "n2")), "tok2")
        .crossJoin(F.broadcast(total))
        .select(
            "tok1",
            "tok2",
            "n_pair",
            F.round(
                F.col("n_pair") * F.col("n_docs") / (F.col("n1") * F.col("n2")) + F.lit(5e-10),
                4,
            ).alias("lift"),
        )
    )


@register(
    "html_unescape_roundtrip",
    """
    SELECT doc_id,
           'T&A <tag> "q" été ' || chr(160) || 'x ' || text AS unescaped
    FROM documents
    """,
    doc="F2 (entity-unescape half) under the driver gate: a payload "
    "with named, numeric, and nbsp entities is synthesized per "
    "document, pushed through the html_unescape pandas UDF "
    "(functions/udfs.py — Python html.unescape, the part Catalyst "
    "cannot express; ref modules/scraping_utils.py:40-56), and "
    "value-hashed against an oracle holding the already-unescaped "
    "string.",
)
def html_unescape_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udfs import html_unescape

    docs = _docs(spark, sf_dir)
    payload = F.concat(
        F.lit("T&amp;A &lt;tag&gt; &quot;q&quot; &eacute;t&#233; &nbsp;x "),
        F.col("text"),
    )
    return docs.select("doc_id", html_unescape(payload).alias("unescaped"))


@register(
    "nfc_normalize_roundtrip",
    """
    SELECT doc_id,
           trim('Café ' || trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS normalized
    FROM documents
    """,
    doc="F8 under the driver gate: a payload with an NFD-decomposed "
    "e+combining-acute, an &nbsp; entity, and ragged whitespace is "
    "synthesized per document and pushed through the nfc_normalize "
    "pandas UDF (functions/udfs.py — unicodedata NFC + nbsp fold + "
    "collapse; ref scraping_utils.py:186-195). The oracle holds the "
    "NFC-composed result, so the hash only matches if the UDF really "
    "recomposed the code points.",
)
def nfc_normalize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udfs import nfc_normalize

    docs = _docs(spark, sf_dir)
    # "Cafe" + U+0301 combining acute (NFD) — NFC must fold to U+00E9
    payload = F.concat(
        F.lit("  Cafe\u0301&nbsp;&nbsp; "), F.col("text"), F.lit("  ")
    )
    return docs.select("doc_id", nfc_normalize(payload).alias("normalized"))


@register(
    "bpe_pair_merge",
    """
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '\\w+') AS t FROM documents
    ), words AS (
      SELECT t[i] AS w FROM toks, unnest(generate_series(1, len(t))) AS u(i)
    ), vocab AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM words GROUP BY w
    ), pairs AS (
      SELECT substr(w, i, 2) AS pair, n
      FROM vocab, unnest(generate_series(1, len(w) - 1)) AS u(i)
      WHERE len(w) >= 2
    ), counted AS (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM pairs GROUP BY pair
    )
    SELECT CAST(rank AS INT) AS rank, pair, cnt FROM (
      SELECT pair, cnt,
             row_number() OVER (ORDER BY cnt DESC, pair) AS rank
      FROM counted
    ) WHERE rank <= 20
    """,
    doc="Tokenizer induction: one BPE merge round (Sennrich et al. "
    "2016 — public method) over the corpus: the 20 most frequent "
    "adjacent character pairs, weighted by word frequency. The scale "
    "trick is the two-level rollup: word counts first (the heavy "
    "corpus pass collapses to a VOCAB-sized table), then char pairs "
    "are exploded over the vocabulary — O(|vocab|·wordlen), corpus-"
    "size independent — instead of over every token occurrence. An "
    "iterative BPE trainer applies this kernel per round (rewrite "
    "symbol sequences with the winning pair, recount), the same "
    "driver-loop discipline kmeans_3iter uses; the global top-20 is "
    "a 20-row sort on an already-tiny aggregate, not a corpus sort.",
)
def bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0)
        ).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    pairs = vocab.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "n",
    )
    counted = pairs.groupBy("pair").agg(F.sum("n").cast("long").alias("cnt"))
    rank = F.row_number().over(W.orderBy(F.desc("cnt"), F.asc("pair")))
    return (
        counted.select(rank.cast("int").alias("rank"), "pair", "cnt")
        .filter(F.col("rank") <= 20)
    )


def _bpe_rounds_cte() -> str:
    """The shared 3-round merge-induction CTE chain (c{i}/w{i}/v{i+1});
    expects a ``v1`` vocab CTE (w, n, s) upstream, leaves ``v4`` = the
    vocab after 3 applied merges. Reused by the induction oracle
    (bpe_merge_3rounds) and the encode oracles (bpe_encode_corpus,
    token_budget_packing_bpe) so all engines share one merge
    definition."""
    rounds = []
    for i in (1, 2, 3):
        # v{i+1} rewrites via LEFT JOIN ON TRUE, not a cross join: when
        # a round finds no adjacent pairs, w{i} is EMPTY and a cross
        # join would empty the vocab for every later round (the Spark
        # loop breaks and KEEPS it — divergence on degenerate corpora,
        # round-15 self-review). Left-joined, l/r are NULL, the CASE
        # condition is NULL, and the fold's else branch is the identity
        # re-join of s — the vocab survives a dry round unchanged.
        rounds.append(f"""
    c{i} AS (
      SELECT sp[i] AS l, sp[i + 1] AS r, CAST(SUM(n) AS BIGINT) AS cnt
      FROM (SELECT n, string_split(s, ' ') AS sp FROM v{i}),
           unnest(generate_series(1, len(sp) - 1)) AS u(i)
      WHERE len(sp) >= 2
      GROUP BY sp[i], sp[i + 1]
    ), w{i} AS (
      SELECT l, r FROM c{i} ORDER BY cnt DESC, l, r LIMIT 1
    ), v{i + 1} AS (
      SELECT w, n,
             list_reduce(string_split(s, ' '), (acc, x) ->
               CASE WHEN regexp_extract(acc, '[^ ]+$') = w{i}.l AND x = w{i}.r
                    THEN regexp_replace(acc, '[^ ]+$', w{i}.l || w{i}.r)
                    ELSE acc || ' ' || x END) AS s
      FROM v{i} LEFT JOIN w{i} ON TRUE
    )""")
    return ",".join(rounds)


# words CTE WITH doc_id (the encode oracles join tokens back per doc;
# the induction oracle's own words CTE only needs the token stream)
_BPE_WORDS_V1 = """
    WITH toks AS (
      SELECT doc_id, lang, regexp_extract_all(lower(text), '\\w+') AS t
      FROM documents
    ), words AS (
      SELECT doc_id, lang, t[i] AS w
      FROM toks, unnest(generate_series(1, len(t))) AS u(i)
    ), v1 AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
             array_to_string(
               list_transform(generate_series(1, length(w)), i -> substr(w, i, 1)),
               ' ') AS s
      FROM words GROUP BY w
    ),"""


def _bpe_round_sql() -> str:
    """Unrolled 3-round BPE-induction oracle: each round counts
    adjacent symbol pairs over the vocab, picks the argmax merge as a
    1-row CTE, and applies it with a list_reduce fold whose string
    accumulator IS the space-joined symbol sequence — the same greedy
    left-to-right non-overlapping merge the Spark side folds with
    ``aggregate`` (a chain of k identical symbols merges to
    floor(k/2) pairs; replace()-based rewrites get this wrong)."""
    tops = "\n      UNION ALL\n".join(
        f"""      SELECT CAST({i} AS INT) AS merge_round,
             CAST(row_number() OVER (ORDER BY cnt DESC, l, r) AS INT) AS rnk,
             l AS left_sym, r AS right_sym, cnt
      FROM c{i}"""
        for i in (1, 2, 3)
    )
    return f"""
    {_BPE_WORDS_V1}{_bpe_rounds_cte()}
    SELECT merge_round, rnk, left_sym, right_sym, cnt FROM (
{tops}
    ) WHERE rnk <= 10
    """


def _bpe_encode_sql() -> str:
    """Encode oracle: the induced-vocab rollup after 3 merges (v4)
    maps every distinct word to its BPE token count; joining the
    word stream back through that map gives per-document totals."""
    return f"""
    {_BPE_WORDS_V1}{_bpe_rounds_cte()},
    enc AS (
      SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS w_tokens FROM v4
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w_tokens) AS BIGINT) AS n_bpe_tokens
    FROM words JOIN enc USING (w)
    GROUP BY doc_id
    """


def _bpe_packing_sql() -> str:
    return f"""
    {_BPE_WORDS_V1}{_bpe_rounds_cte()},
    enc AS (
      SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS w_tokens FROM v4
    ), counts AS (
      SELECT doc_id, lang, CAST(SUM(w_tokens) AS BIGINT) AS n_tokens
      FROM words JOIN enc USING (w)
      GROUP BY doc_id, lang
    ), packed AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS cum_before
      FROM counts
    )
    SELECT doc_id, lang, n_tokens,
           CAST(cum_before // 4096 AS INT) AS batch_id
    FROM packed
    """


def _bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts over the (tiny) vocab rollup —
    O(|vocab|·wordlen), corpus-size independent."""
    return (
        vocab.withColumn("sp", F.split("s", " "))
        .filter(F.size("sp") >= 2)
        .select(
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(sp) - 1), i -> "
                    "struct(element_at(sp, i) AS l, element_at(sp, i + 1) AS r))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym"))
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def _bpe_apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one merge rule greedily left-to-right: a fold over the
    symbol sequence whose accumulator is the space-joined rewrite —
    the last token merges with x iff it EQUALS the rule's left symbol
    (a just-merged token is left||right ≠ left, so it can never
    re-merge within the round, exactly Sennrich-BPE semantics).
    Symbols come from \\w+ tokens, so inlining them as expression
    literals is injection-safe by construction."""
    merged = left + right
    return vocab.withColumn(
        "s",
        F.expr(
            "CASE WHEN size(split(s, ' ')) < 2 THEN s ELSE "
            "aggregate(slice(split(s, ' '), 2, size(split(s, ' ')) - 1), "
            "element_at(split(s, ' '), 1), (acc, x) -> "
            f"CASE WHEN regexp_extract(acc, '[^ ]+$', 0) = '{left}' AND x = '{right}' "
            f"THEN regexp_replace(acc, '[^ ]+$', '{merged}') "
            "ELSE concat(acc, ' ', x) END) END"
        ),
    )


def _bpe_vocab_rollup(docs: DataFrame) -> DataFrame:
    """The (w, n, s) vocab rollup every BPE query starts from — one
    tokenization convention for the whole family (round-15
    self-review: this block existed twice; a regex or lowercasing
    change must hit the induction AND the encode path, or the shared
    DuckDB CTE lies for one of them). localCheckpoint pins it so no
    merge round rescans the corpus (bounded: |distinct words| rows)."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0)
        ).alias("w")
    )
    return (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "s",
            F.expr(
                "concat_ws(' ', transform(sequence(1, length(w)), "
                "i -> substring(w, i, 1)))"
            ),
        )
        .localCheckpoint(eager=True)
    )


@register(
    "bpe_merge_3rounds",
    _bpe_round_sql(),
    doc="ITERATED tokenizer induction — 3 full BPE merge rounds "
    "(Sennrich et al. 2016, public method): count adjacent symbol "
    "pairs weighted by word frequency, pick the argmax merge "
    "(cnt DESC, symbol tiebreak), REWRITE the vocab's symbol "
    "sequences with that rule (greedy left-to-right fold), and "
    "recount — the merge→apply→recount cycle a real tokenizer "
    "trainer loops, unrolled k=3 with the kmeans_3iter driver-loop "
    "discipline: the corpus collapses to the vocab rollup ONCE "
    "(localCheckpoint pins it so no round rescans the corpus), each "
    "round's argmax is a 1-row bounded collect baked back as an "
    "expression literal, and per-round work is O(|vocab|·wordlen), "
    "corpus-size independent. Output: per-round top-10 pair counts "
    "(the round's rank-1 row IS the applied merge), so the oracle "
    "gates both the recount after every rewrite and the argmax "
    "choice. The DuckDB twin unrolls the same three rounds as CTEs "
    "with a list_reduce fold — no driver state crosses engines.",
)
def bpe_merge_3rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    vocab = _bpe_vocab_rollup(docs)
    out: DataFrame | None = None
    for rnd in (1, 2, 3):
        counted = _bpe_pair_counts(vocab)
        rank = F.row_number().over(
            W.orderBy(F.desc("cnt"), "left_sym", "right_sym")
        )
        # each round's top-10 is PINNED (eager checkpoint, ≤10 rows):
        # the round's winner then comes from the pinned rows instead
        # of a second TakeOrdered pass over the counts, and the final
        # sink unions three 10-row checkpoints instead of re-running
        # all three count+window plans (r15 opt: the sink recompute
        # was the single largest slice of this query's warm wall)
        ranked = (
            counted.select(
                F.lit(rnd).alias("merge_round"),
                rank.cast("int").alias("rnk"),
                "left_sym",
                "right_sym",
                "cnt",
            )
            .filter(F.col("rnk") <= 10)
            .localCheckpoint(eager=True)
        )
        out = ranked if out is None else out.unionByName(ranked)
        if rnd == 3:
            # the final round's winner is never applied (out is
            # complete) — skip the dead rewrite + checkpoint
            break
        # the round's winner: rank-1 of the pinned top-10 (bounded
        # fetch), baked into the next round's fold as literals —
        # kmeans centroid discipline. Empty only when no pairs exist
        # at all, in which case every later round is empty too (both
        # engines agree).
        top = ranked.filter(F.col("rnk") == 1).collect()
        if not top:
            break
        vocab = _bpe_apply_merge(
            vocab, top[0]["left_sym"], top[0]["right_sym"]
        ).localCheckpoint(eager=True)
    return out


def _bpe_encoded_words(docs: DataFrame) -> DataFrame:
    """Word stream joined through the induced word→token-count map:
    (doc_id, lang, w, w_tokens) — the shared corpus pass of both
    encode consumers (each adds one aggregate/window on top; unused
    columns prune out of the scan). AQE broadcasts the |vocab|-sized
    map while it fits; at 100 TB it degrades to a shuffle join on the
    word key, never a fold per occurrence."""
    enc = _bpe_encoded_vocab(docs).select(
        "w", F.size(F.split("s", " ")).cast("long").alias("w_tokens")
    )
    words = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0)
        ).alias("w"),
    )
    return words.join(enc, on="w")


def _bpe_encoded_vocab(docs: DataFrame) -> DataFrame:
    """Induce 3 BPE merges (the bpe_merge_3rounds kernel) and return
    the ENCODED vocab rollup (w, n, s) — the |vocab|-sized
    word→tokenization map. Every fold/explode happens on the rollup,
    never the corpus (SCALE.md §26): per-round cost is
    O(|vocab|·wordlen), corpus-size independent; the corpus is
    touched exactly once (the word count) plus once per encode
    consumer (the join back)."""
    vocab = _bpe_vocab_rollup(docs)
    for _ in (1, 2, 3):
        counted = _bpe_pair_counts(vocab)
        # 1-row bounded fetch: the round's argmax merge rule
        top = (
            counted.orderBy(F.desc("cnt"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not top:
            break
        vocab = _bpe_apply_merge(
            vocab, top[0]["left_sym"], top[0]["right_sym"]
        ).localCheckpoint(eager=True)
    return vocab


@register(
    "bpe_encode_corpus",
    _bpe_encode_sql(),
    doc="Tokenizer APPLY (round-14 verdict item 4): encode the corpus "
    "with the merges bpe_merge_3rounds induces. The greedy merge fold "
    "runs once per DISTINCT word on the vocab rollup (corpus-size "
    "independent — SCALE.md §26); the corpus pass is then a word "
    "explode + equi-join against that |vocab|-sized word→token-count "
    "map (AQE broadcasts it while it fits; at 100 TB it degrades to a "
    "shuffle join on the word key, never a fold per occurrence) and a "
    "per-doc sum. Output: real BPE token counts per document — what "
    "token_counts/token_budget_packing approximated with word counts. "
    "The DuckDB twin unrolls the same 3 induction rounds and the same "
    "join, so merge choice, fold semantics, AND the re-join are all "
    "value-hashed.",
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bpe_encoded_words(_docs(spark, sf_dir))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("w_tokens").cast("long").alias("n_bpe_tokens"),
        )
    )


@register(
    "token_budget_packing_bpe",
    _bpe_packing_sql(),
    doc="Sequence packing on REAL tokenizer counts (round-14 verdict "
    "item 4): token_budget_packing's per-language 4096-token greedy "
    "prefix-sum batches, with n_tokens = the BPE-encoded count from "
    "bpe_encode_corpus's vocab-rollup map instead of the whitespace-"
    "word proxy. Same scale shape: the window partitions by language, "
    "so each language packs independently in parallel.",
)
def token_budget_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    counts = (
        _bpe_encoded_words(_docs(spark, sf_dir))
        .groupBy("doc_id", "lang")
        .agg(F.sum("w_tokens").cast("long").alias("n_tokens"))
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return counts.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 4096)
        .cast("int")
        .alias("batch_id"),
    )
