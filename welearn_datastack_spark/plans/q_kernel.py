"""Kernel query group — the reference's state-log batch-generator
family (SURVEY.md §2: J1/W1, P2/P3, O1/O3/O4, A3/W3, S13/S14) mapped
onto the synthetic ``events``/``documents`` tables (events ≈
process_state: user_id ≈ document_id, event_id ≈ operation_order,
event_type ≈ step, ts ≈ created_at).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.state_log import (
    byte_budget_admission,
    capped_buckets,
    deterministic_sample,
    even_split,
    latest_state,
    latest_state_in,
)
from ..sources.tables import load_table
from .registry import register

TS_CUTOFF = "2024-01-20 00:00:00"


@register(
    "latest_event",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           ts AS last_ts
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="J1/W1: latest state per key (ref retrieve_data_from_database.py:46-103)",
)
def latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = load_table(spark, sf_dir, "events")
    return latest_state(log).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("ts").alias("last_ts"),
    )


@register(
    "latest_event_filtered",
    f"""
    SELECT user_id, ts AS last_ts
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND event_type IN ('click', 'view')
      AND ts < TIMESTAMP '{TS_CUTOFF}'
    """,
    doc="P2/P3: keys whose latest state ∈ steps and older than cutoff "
    "(ref retrieve_data_from_database.py:140-153)",
)
def latest_event_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = load_table(spark, sf_dir, "events")
    return latest_state_in(log, steps=["click", "view"], before=TS_CUTOFF).select(
        "user_id", F.col("ts").alias("last_ts")
    )


@register(
    "ordered_limit_pick",
    """
    SELECT user_id, last_event_id
    FROM (
      SELECT user_id, event_id AS last_event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY last_event_id DESC LIMIT 50
    """,
    doc="O1/O3: most-recent-first batch pick with LIMIT "
    "(ref retrieve_data_from_database.py:132,158)",
)
def ordered_limit_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = load_table(spark, sf_dir, "events")
    return (
        latest_state(log)
        .select("user_id", F.col("event_id").alias("last_event_id"))
        .orderBy(F.desc("last_event_id"))
        .limit(50)
    )


@register(
    "pseudo_random_sample",
    """
    SELECT doc_id FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 20
    """,
    doc="O4: ORDER BY random() LIMIT n, made deterministic via md5 ordering "
    "(ref retrieve_data_from_database.py:286-292)",
)
def pseudo_random_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, n=20, key_col="doc_id").select("doc_id")


@register(
    "byte_budget_admission",
    """
    SELECT doc_id, n_chars, cum_chars FROM (
      SELECT doc_id, n_chars,
             CAST(SUM(n_chars) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars
      FROM documents
    ) WHERE cum_chars <= 30000
    """,
    doc="A3/W3: greedy byte-budget admission as prefix-sum window "
    "(ref retrieve_data_from_database.py:204-247)",
)
def byte_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return byte_budget_admission(
        docs, size_col="n_chars", budget=30000, order_by=[F.asc("doc_id")], cum_col="cum_chars"
    ).select("doc_id", "n_chars", "cum_chars")


@register(
    "capped_buckets",
    """
    SELECT doc_id, bucket FROM (
      SELECT doc_id,
             CAST(FLOOR((row_number() OVER (ORDER BY doc_id) - 1) / 40) AS INT) AS bucket
      FROM documents
    ) WHERE bucket < 8
    """,
    doc="S13: fixed-size work buckets, hard cap, overflow dropped "
    "(ref data/batch_generator.py:44-129)",
)
def capped_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return capped_buckets(docs, order_by=[F.asc("doc_id")], threshold=40, max_buckets=8).select(
        "doc_id", "bucket"
    )


@register(
    "even_split_ntile",
    """
    SELECT doc_id, CAST(ntile(7) OVER (ORDER BY doc_id) AS INT) AS bucket
    FROM documents
    """,
    doc="S14: ceil-split into exactly N batches (ref utils_/database_utils.py:48-64)",
)
def even_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return even_split(docs, qty=7, order_by=[F.asc("doc_id")]).select("doc_id", "bucket")


@register(
    "generate_vectorize_batch",
    f"""
    WITH cur AS (
      SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY event_id DESC) AS rn
            FROM events) WHERE rn = 1
    ), candidates AS (
      SELECT c.user_id AS doc_id, c.last_event_id, d.n_chars
      FROM cur c JOIN documents d ON d.doc_id = c.user_id
      WHERE c.last_event_type IN ('view', 'click')
      ORDER BY c.last_event_id DESC
      LIMIT 100
    ), admitted AS (
      SELECT doc_id, last_event_id, n_chars,
             CAST(SUM(n_chars) OVER (ORDER BY last_event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars
      FROM candidates
    )
    SELECT doc_id, last_event_id, n_chars, cum_chars, bucket FROM (
      SELECT *, CAST(FLOOR((row_number() OVER (ORDER BY last_event_id DESC) - 1) / 10) AS INT)
                  AS bucket
      FROM admitted WHERE cum_chars <= 20000
    ) WHERE bucket < 8
    """,
    doc="FLAGSHIP (SURVEY §7 step 1) — the reference's end-to-end batch "
    "generator in one dataflow: latest-state arg-max (J1/W1) → step "
    "filter (P2) → document join (J2) → most-recent-first LIMIT "
    "(O1/O3) → byte-budget prefix-sum admission (A3/W3) → capped "
    "bucketing with overflow drop (S13). Mirrors "
    "generate_to_vectorize_batch.py:66-76 + "
    "retrieve_data_from_database.py:114-247 + batch_generator.py:44-129.",
)
def generate_vectorize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.state_log import byte_budget_admission as admit
    from ..operators.state_log import capped_buckets as buckets

    log = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    cur = latest_state(log, keep_cols=("event_type",))
    candidates = (
        cur.filter(F.col("event_type").isin("view", "click"))
        .join(docs, cur.user_id == docs.doc_id)
        .select("doc_id", F.col("event_id").alias("last_event_id"), "n_chars")
        .orderBy(F.desc("last_event_id"))
        .limit(100)
    )
    # bounded_input: candidates is LIMIT 100 — the single-task window
    # over ≤100 rows is the right plan; the ranged two-pass prefix is
    # for unbounded tables (see byte_budget_admission query)
    admitted = admit(
        candidates,
        size_col="n_chars",
        budget=20000,
        order_by=[F.desc("last_event_id")],
        cum_col="cum_chars",
        bounded_input=True,
    )
    return buckets(
        admitted,
        order_by=[F.desc("last_event_id")],
        threshold=10,
        max_buckets=8,
        bounded_input=True,
    ).select("doc_id", "last_event_id", "n_chars", "cum_chars", "bucket")
