#!/usr/bin/env python
"""Print each volume-guarded op's pre-flight projection on a corpus —
the numbers SCALE.md §24's projected-vs-measured table records at sf3.

For every guarded diagnostic this runs EXACTLY the probe aggregation
its guard runs (same bucket frame, same cost model, same byte factor)
and prints the projection, whether the worst-case hint would have
skipped the probe under the given budget, and the guard's verdict at
that budget. Aggregation-only — no pair row is ever built.

Usage:
    python tools/guard_projections.py /tmp/welearn_sf3 [--budget 40g]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from welearn_datastack_spark.operators.dedup import (  # noqa: E402
    PAIR_GUARD_BYTES_PER_PAIR,
    REPL_GUARD_BYTES_PER_ROW,
    hashed_shingles,
    simhash,
    word_shingles,
)
from welearn_datastack_spark.session import get_spark  # noqa: E402
from welearn_datastack_spark.sources.tables import (  # noqa: E402
    fan_out_for_compute,
    load_table,
)


def _probe(bucketed, bucket_cols, expr) -> int:
    row = (
        bucketed.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(expr.alias("__u"))
        .first()
    )
    return int(row["__u"] or 0)


def PAIRS():
    return F.sum(F.col("__c") * (F.col("__c") - 1) / 2)


def repl(chunk_target: int):
    return F.sum(F.col("__c") * (F.ceil(F.col("__c") / chunk_target) + F.lit(1)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--budget", default=None, help="budget for the verdict column")
    args = ap.parse_args()
    spark = get_spark("guard-projections")
    from welearn_datastack_spark.plans.q_dedup import (
        _sampled_baseline_docs,
        minhash_band_frame,
    )
    from welearn_datastack_spark.sources.tables import _size_to_bytes

    budget = _size_to_bytes(args.budget) if args.budget else None

    docs = fan_out_for_compute(load_table(spark, args.sf_dir, "documents"))

    rows = []

    # 1. minhash candidates (quadratic pair model, 12 B/pair)
    bands = minhash_band_frame(docs, n_bands=4, rows_per_band=2)
    pairs = _probe(bands, ["band", "band_key"], PAIRS())
    rows.append(("minhash_lsh_candidates_hashed", "pairs", pairs,
                 pairs * PAIR_GUARD_BYTES_PER_PAIR))

    # 2. jaccard (quadratic pair model over shingle buckets, 24 B/pair,
    #    on the row-budget sample the registered queries run)
    sdocs, den = _sampled_baseline_docs(docs)
    sh = hashed_shingles(word_shingles(sdocs, "doc_id", "text", n=3), "doc_id")
    jp = _probe(sh, ["shingle"], PAIRS())
    rows.append((f"ngram_jaccard_pairs_hashed (den={den})", "pairs", jp, jp * 24))

    # 3. simhash (replicated chunk-split model, 48 B/row)
    fp = simhash(docs, "doc_id", "text", bits=16)
    width = 16 // 4
    banded = fp.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
        F.col("simhash"),
    ).withColumn(
        "band_key",
        F.expr(f"shiftright(simhash, band * {width})").bitwiseAND(F.lit((1 << width) - 1)),
    )
    sr = _probe(banded, ["band", "band_key"], repl(256))
    rows.append(("simhash_near_pairs", "repl_rows", sr, sr * REPL_GUARD_BYTES_PER_ROW))

    # 4. semantic dedup (replicated model over cluster assignment,
    #    320 B/row embedding payload)
    from welearn_datastack_spark.operators.similarity import (
        bucket_key_col,
        bucket_pruned_assign,
        derive_planes,
        l2_norm,
        sem_assign_bits,
        stride_centroid_params,
    )

    emb = load_table(spark, args.sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    n = emb.count()
    stride, off = stride_centroid_params(n)
    planes = derive_planes(seed=211, n_bits=sem_assign_bits(n), dims=64)
    tagged = emb.select(
        "vec_id",
        "embedding",
        l2_norm(F.col("embedding")).alias("nrm"),
        bucket_key_col(F.col("embedding"), planes).alias("bk"),
    )
    cents = tagged.filter(F.col("vec_id") % stride == off).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cnrm"),
        "bk",
    )
    best = bucket_pruned_assign(tagged, cents)
    assign = (
        emb.select("vec_id")
        .join(best, on="vec_id", how="left")
        .select("vec_id", F.coalesce("cent_id", "vec_id").alias("cent_id"))
    )
    sm = _probe(assign, ["cent_id"], repl(256))
    rows.append(("semantic_dedup_flags", "repl_rows", sm, sm * 320))

    for name, unit, units, projected in rows:
        rec = {
            "op": name,
            "unit": unit,
            "units": units,
            "projected_bytes": projected,
            "projected_mb": round(projected / 1e6, 1),
        }
        if budget:
            rec["verdict_at_budget"] = "fail" if projected > budget else "fits"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
