#!/usr/bin/env python
"""Headline benchmark. Runs representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full materialization,
no driver collect).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from welearn_datastack_spark.plans.registry import REGISTRY, _load_groups
from welearn_datastack_spark.session import get_spark

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_region_revenue",
    "tpch_q13_cust_distribution",
    "tpch_q14_promo_share",
    "tpch_q16_supplier_count",
    "tpch_q18_large_orders",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue",
    "latest_event",
    "generate_vectorize_batch",
    "top2_event_types",
    "group_counts",
    "model_resolution",
    "byte_budget_admission",
    "sessionization",
    "asof_join_last_click",
    "range_join_nearby_events",
    "salted_aggregation",
    "cosine_topk",
    "cosine_topk_blas",
    "grouped_vector_search",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "sq8_ann_topk",
    "word_window_slices",
    "tfidf_top_terms",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "exact_dup_flags",
    "readability",
    "quality_score",
    "token_budget_packing",
    "contamination_flags",
    "duplicate_span_fraction",
    "token_entropy",
    "pmi_cooccurrence",
    "ngram_novelty",
    "embedding_dispersion",
    "lsh_near_dup_pairs",
    "pdf_header_footer_strip",
    "simhash_near_pairs",
    "hal_extraction_roundtrip",
    "open_alex_extraction_roundtrip",
    "ted_extraction_roundtrip",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    _load_groups()
    spark = get_spark("welearn-bench")
    # warm the JVM + parquet footers so per-query times measure the plan
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # two executions per query, best-of-2 recorded: the first run pays
    # one-time whole-stage-codegen compile + JIT for that plan shape
    # (~0.5-1.7s, measured), which is noise at any real data scale —
    # the steady-state run is what a 1000-executor job repeats. The
    # cold (first-run) total is reported alongside so compile-time
    # regressions stay visible across rounds.
    # per-query failure isolation: one broken query must never erase
    # the whole performance signal — record {"err": ...} for it and
    # keep timing the rest (round-3 postmortem: a single
    # AnalysisException cost the round every number).
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    cold_total = 0.0
    for name in HEADLINE:
        spec = REGISTRY[name]
        best = float("inf")
        try:
            for i in range(3):
                t0 = time.time()
                spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = min(best, dt)
                if i == 0:
                    cold_total += dt
            times[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:300]
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "runs": 3,
        "stat": "min",
        "cold_total_sec": round(cold_total, 3),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
