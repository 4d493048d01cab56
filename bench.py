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
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q15_top_supplier",
    "tpch_q20_potential_promotion",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_global_sales_opportunity",
    "latest_event",
    "generate_vectorize_batch",
    "top2_event_types",
    "group_counts",
    "model_resolution",
    "byte_budget_admission",
    "sessionization",
    "asof_join_last_click",
    "asof_join_nearest_click",
    "range_join_nearby_events",
    "resample_1h_gapfill",
    "event_funnel_conversion",
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
    "minhash_lsh_candidates_hashed",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_hashed",
    "duplicate_span_fraction_hashed",
    "span_removal_rewrite",
    "span_removal_rewrite_hashed",
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
    "semantic_dedup_flags",
    "kmeans_3iter",
    "ivf_learned_topk",
    "bloom_prefilter_new_users",
    "cdc_chunk_dedup",
    "incremental_lsh_candidates",
    "incremental_semantic_dedup",
    "multimodal_pipeline",
    "dedup_canonical_pick",
    "snapshot_diff",
    "snapshot_tail_read",
    "shard_export_assignment",
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

    # VARIANCE PROTOCOL (round 6 — cross-round deltas were noise-
    # polluted two rounds running, with untouched queries drifting
    # ±20-85% between rounds on the shared sandbox): 5 executions per
    # query. Run 0 pays one-time whole-stage-codegen compile + JIT for
    # that plan shape (~0.5-1.7s, measured) and feeds only cold_total;
    # the 4 warm runs yield BOTH min (the steady-state floor a
    # 1000-executor job repeats — the headline stat, comparable to
    # prior rounds) and median (robust to one slow outlier), plus a
    # per-query relative spread (max-min)/median so a cross-round
    # delta can be judged against the same query's same-session
    # jitter before being called a regression. The 1-minute load
    # average is sampled before and after so sandbox contention is
    # visible in the record.
    # per-query failure isolation: one broken query must never erase
    # the whole performance signal — record {"err": ...} for it and
    # keep timing the rest (round-3 postmortem: a single
    # AnalysisException cost the round every number).
    # SPARK_GRAFT_BENCH_RUNS overrides the run count (min 2: one cold +
    # >=1 warm) — used by the sf1 scale rehearsal where 5 runs over a
    # 10x corpus would burn most of the signal-gathering budget.
    import statistics

    n_runs = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    times: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}
    cold_total = 0.0
    load_before = os.getloadavg()[0]
    for name in HEADLINE:
        spec = REGISTRY[name]
        warm: list[float] = []
        try:
            for i in range(n_runs):
                t0 = time.time()
                spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if i == 0:
                    cold_total += dt
                else:
                    warm.append(dt)
            med = statistics.median(warm)
            times[name] = round(min(warm), 3)
            medians[name] = round(med, 3)
            spreads[name] = round((max(warm) - min(warm)) / med, 3) if med > 0 else 0.0
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:300]
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "runs": n_runs,
        "stat": f"min-of-{n_runs - 1}-warm",
        "median_total_sec": round(sum(medians.values()), 3),
        "queries_median": medians,
        "queries_rel_spread": spreads,
        "cold_total_sec": round(cold_total, 3),
        "loadavg_1m": [round(load_before, 2), round(os.getloadavg()[0], 2)],
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
