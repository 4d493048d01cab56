"""Curation query group — the batch-assembly and hygiene operators a
training-data pipeline runs after dedup/quality filtering: token-budget
sequence packing, benchmark-contamination screening, and the stage
funnel report. No reference equivalent (its batching is id-count/byte
based, data/batch_generator.py:29–62 and
modules/retrieve_data_from_database.py:204–247); these extend that
admission machinery to the LLM-training shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import hexint, normalize_text, word_shingles
from ..sources.tables import fan_out_for_compute, load_table
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents table fanned out for the per-row text kernels in this
    module (token/shingle/regex work dominates the scan stage);
    fan_out_for_compute is a structural no-op on already-parallel
    layouts — see sources/tables.py."""
    return fan_out_for_compute(load_table(spark, sf_dir, "documents"))

_TOKENS = r"\w+"


@register(
    "token_budget_packing",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_before
      FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           CAST(cum_before // 4096 AS INT) AS batch_id
    FROM packed
    """,
    doc="Sequence packing: assign documents to fixed token-budget "
    "training batches (4096 tokens) by running prefix sum in stable "
    "doc_id order, PER LANGUAGE — the packing window is partitioned, "
    "so at 100 TB each language packs independently in parallel "
    "instead of one global sequential cumsum (the same reason "
    "byte_budget_admission partitions by corpus). A batch may "
    "overflow by at most its last document — the standard greedy "
    "packing contract.",
)
def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_TOKENS), 0))
        .cast("long")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 4096)
        .cast("int")
        .alias("batch_id"),
    )


@register(
    "contamination_flags",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ts FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4]
               AS shingle
      FROM toks, unnest(generate_series(1, len(ts) - 4)) AS g(i)
      WHERE len(ts) >= 5
    ), eval_sh AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
    )
    SELECT s.doc_id, CAST(COUNT(DISTINCT s.shingle) AS BIGINT) AS n_shared
    FROM sh s JOIN eval_sh e ON e.shingle = s.shingle
    WHERE s.doc_id % 50 <> 0
    GROUP BY s.doc_id
    """,
    doc="Benchmark-contamination screen: training documents sharing "
    "any 5-gram with the held-out eval set (doc_id % 50 = 0 stands in "
    "for the benchmark table), with the count of distinct shared "
    "5-grams. The eval shingle set is small → broadcast semi-ish "
    "join against it; the training side streams through map-side. "
    "Same shape as real decontamination (eval suites are KBs, the "
    "corpus is the 100 TB side).",
)
def contamination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sh = word_shingles(docs, "doc_id", "text", n=5)
    eval_sh = (
        sh.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(eval_sh), on="shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
    )


@register(
    "curation_funnel",
    """
    WITH base AS (SELECT * FROM documents),
    norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt,
             len(regexp_extract_all(lower(text), '\\w+')) AS words
      FROM base
    ),
    deduped AS (
      SELECT * FROM norm WHERE doc_id IN (
        SELECT MIN(doc_id) FROM norm GROUP BY md5(nt)
      )
    ),
    quality AS (SELECT * FROM deduped WHERE words >= 10)
    SELECT 'input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM base
    UNION ALL
    SELECT 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM deduped
    UNION ALL
    SELECT 'quality_min_words', CAST(COUNT(*) AS BIGINT) FROM quality
    """,
    doc="Curation funnel report: per-stage survivor counts for the "
    "dedup → quality chain (the jobs.py `curate` pipeline as a single "
    "observable query). Each stage is a COUNT over the previous — "
    "at scale the three counts share one scan via the common subplan, "
    "and the dedup keep-set is a hash-group min, never a pairwise op.",
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    norm = docs.select(
        "doc_id",
        normalize_text(F.col("text")).alias("nt"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_TOKENS), 0)).alias("words"),
    )
    keep = norm.groupBy(F.md5("nt")).agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    deduped = norm.join(keep, on="doc_id")
    quality = deduped.filter(F.col("words") >= 10)

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    return (
        stage("input", docs)
        .unionAll(stage("exact_dedup", deduped))
        .unionAll(stage("quality_min_words", quality))
    )


@register(
    "temperature_mixture_weights",
    """
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_extract_all(lower(text), '\\w+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), z AS (SELECT SUM(sqrt(n_tokens)) AS z FROM s)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
           ROUND(sqrt(n_tokens) / z + 5e-10, 6) AS mix_weight
    FROM s CROSS JOIN z
    """,
    doc="Dataset-mixing: temperature-scaled sampling weights per "
    "source, w_s ∝ n_tokens^α with α=0.5 (the multilingual-LM "
    "up/down-sampling rule; sqrt is IEEE correctly-rounded, so both "
    "engines compute it bit-identically, unlike pow/ln). One "
    "hash-agg over the corpus, then a single-row normalizer "
    "broadcast back — at 100 TB the per-source table is KBs "
    "regardless of corpus size, so the second pass is free. "
    "Composes with `source_quota_mix` (weights → quotas) and "
    "`stratified_sample` (quotas → hash-bucket keep rates).",
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(F.regexp_extract_all(F.lower("text"), F.lit(r"\w+"), 0)).cast("long")
        ).alias("n_tokens"),
    )
    z = s.agg(F.sum(F.sqrt(F.col("n_tokens"))).alias("z"))
    return s.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.sqrt(F.col("n_tokens")) / F.col("z") + F.lit(5e-10), 6).alias("mix_weight"),
    )


_HEXINT_SQL = (
    "list_reduce([strpos('0123456789abcdef', c) - 1"
    " for c in regexp_extract_all(substr(md5({x}), 1, 15), '.')],"
    " (a, b) -> a * 16 + b)"
)


@register(
    "leakage_safe_split",
    f"""
    WITH assigned AS (
      SELECT doc_id, source,
             {_HEXINT_SQL.format(x="'split:' || source")} % 10 AS h
      FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN h < 8 THEN 'train'
                WHEN h = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
    """,
    doc="Leakage-controlled train/val/test split: the split is assigned "
    "by hashing the GROUP key (source), never the document, so every "
    "document from one source — including its near-duplicates, which "
    "cluster within a source — lands in the same split and eval can "
    "never see a training near-dup. Deterministic md5 bucketing "
    "(80/10/10), no sampling state, reproducible across runs and "
    "engines; at 100 TB this is a map-only projection with zero "
    "shuffle.",
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    h = hexint(F.concat(F.lit("split:"), F.col("source"))) % 10
    return docs.select(
        "doc_id",
        "source",
        F.when(h < 8, "train").when(h == 8, "val").otherwise(F.lit("test")).alias("split"),
    )


@register(
    "shard_export_assignment",
    f"""
    WITH h AS (
      SELECT doc_id,
             {_HEXINT_SQL.format(x="'shard:' || CAST(doc_id AS VARCHAR)")} AS hv
      FROM documents
    )
    SELECT doc_id, CAST(hv % 16 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % 16
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM h
    """,
    doc="Training-export shard assignment: the deterministic global "
    "shuffle that turns a curated corpus into N balanced shards for "
    "the trainer. Shard = stable hash of the doc id (md5-based, "
    "engine-portable); within-shard position = rank by the SAME hash, "
    "so the write order is a reproducible pseudo-random permutation "
    "(no seed state, no driver-side shuffle). At 100 TB this is "
    "repartition(shard) + sortWithinPartitions(hash) feeding "
    "partitionBy(shard) parquet — one shuffle, and re-running the "
    "export bit-for-bit reproduces every shard. The hash-ordered "
    "position also de-clusters crawl locality (adjacent ids land in "
    "different shards and far-apart positions), which is what the "
    "trainer needs from a 'shuffled' dataset.",
)
def shard_export_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    hv = hexint(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    assigned = docs.select("doc_id", hv.alias("hv"), (hv % 16).cast("int").alias("shard"))
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return assigned.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )


@register(
    "dsir_importance_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents
    ), grams AS (
      SELECT doc_id, t[i] AS g
      FROM toks, unnest(generate_series(1, len(t))) AS u(i)
      UNION ALL
      SELECT doc_id, t[i] || ' ' || t[i + 1]
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ), feats AS (
      SELECT doc_id, {_HEXINT_SQL.format(x="g")} % 64 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM grams GROUP BY doc_id, bucket
    ), dist AS (
      SELECT bucket,
             SUM(CASE WHEN doc_id % 50 = 0 THEN c ELSE 0 END) AS t_c,
             SUM(CASE WHEN doc_id % 50 <> 0 THEN c ELSE 0 END) AS r_c
      FROM feats GROUP BY bucket
    ), tot AS (
      SELECT SUM(t_c) AS t_tot, SUM(r_c) AS r_tot FROM dist
    ), w AS (
      SELECT bucket,
             ln((t_c + 1) / (tot.t_tot + 64.0))
               - ln((r_c + 1) / (tot.r_tot + 64.0)) AS lw
      FROM dist, tot
    )
    SELECT f.doc_id,
           CAST(SUM(f.c) AS BIGINT) AS n_grams,
           ROUND(SUM(f.c * w.lw) + 5e-10, 6) AS log_weight
    FROM feats f JOIN w ON w.bucket = f.bucket
    WHERE f.doc_id % 50 <> 0
    GROUP BY f.doc_id
    """,
    doc="DSIR importance weights (Xie et al. 2023, Data Selection via "
    "Importance Resampling — public method): hashed-ngram bag features "
    "(unigrams + bigrams -> 64 md5 buckets), a target distribution "
    "estimated from the trusted subset (doc_id % 50 = 0, the same "
    "held-out convention contamination_flags uses) and a raw "
    "distribution from the rest, both add-1 smoothed; each raw "
    "document scores log w = sum_b c_b·(ln p_b − ln q_b). Resampling "
    "keeps the top-weight docs (rank/quantile downstream). Scale "
    "design: the learned 'model' is a 64-row broadcast — corpus-size "
    "independent — so the score pass is map-side; two passes over the "
    "gram pipeline total (one to learn dist, one to score), each a "
    "single (doc_id, bucket) hash-agg, no wide shuffle. Float note: "
    "only ln/x+y/ROUND(…,6) cross engines; per-doc sums span <=64 "
    "buckets so double error is ~1e-13, absorbed by the epsilon+round "
    "convention.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower("text"), F.lit(_TOKENS), 0).alias("t"),
    )
    # ONE explode over concat(unigrams, bigrams), not a unionAll of
    # two branches (r16 opt, guide §7.2): each union branch
    # re-evaluated the scan+tokenize subtree, so the checkpoint job
    # tokenized the corpus twice for the identical gram multiset.
    # The bigram transform is CASE-guarded (sequence(0, size-2) runs
    # DESCENDING for 1-token docs under ANSI — same hazard
    # word_shingles documents).
    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("t"),
                F.when(
                    F.size("t") >= 2,
                    F.expr(
                        "transform(sequence(0, size(t) - 2), "
                        "i -> concat(t[i], ' ', t[i + 1]))"
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("g"),
    )
    feats = (
        grams
        .groupBy("doc_id", (hexint(F.col("g")) % 64).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
        # pin the feature matrix (r15 opt): feats feeds THREE consumers
        # (the dist leg, its total under the broadcast, and the scoring
        # leg), and the measured sink plan re-expanded the full
        # scan→unigram/bigram-explode→hash-agg pipeline into each —
        # six parquet scans per sink. Pinned, the gram pipeline runs
        # once per build. feats is ≤ 64 narrow rows per doc (the DSIR
        # feature matrix) — linear in the corpus and far smaller than
        # the text it summarizes, the standard materialization any
        # DSIR implementation makes before the two-pass learn/score.
        .localCheckpoint(eager=True)
    )
    dist = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("doc_id") % 50 == 0, F.col("c")).otherwise(F.lit(0))).alias("t_c"),
        F.sum(F.when(F.col("doc_id") % 50 != 0, F.col("c")).otherwise(F.lit(0))).alias("r_c"),
    )
    tot = dist.agg(
        F.sum("t_c").alias("t_tot"), F.sum("r_c").alias("r_tot")
    )
    w = dist.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("t_c") + 1) / (F.col("t_tot") + F.lit(64.0)))
            - F.log((F.col("r_c") + 1) / (F.col("r_tot") + F.lit(64.0)))
        ).alias("lw"),
    )
    return (
        feats.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(w), on="bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("c") * F.col("lw")) + F.lit(5e-10), 6).alias("log_weight"),
        )
    )
