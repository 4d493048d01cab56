#!/usr/bin/env python
"""Super-linear scaling audit over two bench artifacts.

Usage: python tools/audit_scaling.py bench_runs/r8_sf1_3runs.json \
           bench_runs/r8_sf3_3runs.json [data_ratio]

Prints every common query's median-time ratio (artifact B / artifact
A) sorted descending, plus shuffle-byte ratios when both artifacts
carry `queries_shuffle`, and flags queries whose time ratio exceeds
the data-growth ratio (default 3.0 — sf1→sf3). A flagged query is not
automatically wrong — output volume can legitimately grow faster than
input (pair-producing dedup ops on duplicate-heavy corpora) — but
every flag must be adjudicated in SCALE.md: either fixed, or explained
by measured output growth / a documented exact-baseline role.

The byte columns make the adjudication mechanical: time ratio >> byte
ratio → contention or driver-side cost, read the loop; byte ratio
tracking time ratio → the shuffle itself grew, read the plan.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    # full bench.py artifacts carry queries_median; ad-hoc family
    # artifacts (e.g. r7_sf3_dedup_family.json) are a flat name->sec map
    a_med = a.get("queries_median", a if "queries" not in a else a["queries"])
    b_med = b.get("queries_median", b if "queries" not in b else b["queries"])
    a_sh = a.get("queries_shuffle", {}) if isinstance(a.get("queries_shuffle"), dict) else {}
    b_sh = b.get("queries_shuffle", {}) if isinstance(b.get("queries_shuffle"), dict) else {}
    common = sorted(set(a_med) & set(b_med))
    rows = []
    for q in common:
        ta, tb = a_med[q], b_med[q]
        ratio = tb / ta if ta > 0 else float("inf")
        ba = a_sh.get(q, {}).get("shuffle_write_bytes")
        bb = b_sh.get(q, {}).get("shuffle_write_bytes")
        byte_ratio = (bb / ba) if ba and bb else None
        rows.append((ratio, q, ta, tb, byte_ratio))
    rows.sort(reverse=True)
    flagged = 0
    print(f"{'ratio':>7} {'flag':>4} {'t_a':>8} {'t_b':>8} {'bytes_r':>8}  query")
    for ratio, q, ta, tb, byte_ratio in rows:
        flag = "***" if ratio > data_ratio else ""
        flagged += bool(flag)
        br = f"{byte_ratio:8.1f}" if byte_ratio is not None else "       -"
        print(f"{ratio:7.2f} {flag:>4} {ta:8.2f} {tb:8.2f} {br}  {q}")
    tot_a = sum(a_med[q] for q in common)
    tot_b = sum(b_med[q] for q in common)
    print(
        f"\n{len(common)} common queries; totals {tot_a:.1f}s -> {tot_b:.1f}s "
        f"({tot_b / tot_a:.2f}x for {data_ratio:.0f}x data); "
        f"{flagged} super-linear (> {data_ratio:.1f}x)"
    )
    only_a = set(a_med) - set(b_med)
    only_b = set(b_med) - set(a_med)
    if only_a or only_b:
        print(f"only in A: {sorted(only_a)}\nonly in B: {sorted(only_b)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
