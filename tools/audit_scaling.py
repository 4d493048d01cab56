#!/usr/bin/env python
"""Super-linear scaling audit over two bench artifacts.

Usage: python tools/audit_scaling.py bench_runs/r8_sf1_3runs.json \
           bench_runs/r8_sf3_3runs.json [data_ratio] [--adjudicate]

Prints every common query's median-time ratio (artifact B / artifact
A) sorted descending, plus shuffle-byte ratios when both artifacts
carry `queries_shuffle`, and flags queries whose time ratio exceeds
the data-growth ratio (default 3.0 — sf1→sf3). A flagged query is not
automatically wrong — output volume can legitimately grow faster than
input (pair-producing dedup ops on duplicate-heavy corpora) — but
every flag must be adjudicated: either fixed, or explained by measured
output growth / a documented exact-baseline role.

The byte columns make the adjudication mechanical: time ratio >> byte
ratio → contention or driver-side cost, read the loop; byte ratio
tracking time ratio → the shuffle itself grew, read the plan.

--adjudicate AUTOMATES the session-state rule (SCALE.md §21.7, applied
by hand through round 10): a wall flag whose shuffle bytes stayed
linear (byte ratio ≤ data_ratio × --byte-tol) is a marathon-inflation
SUSPECT, not a scaling bug — the plan did not move, only the wall did.
The pass re-runs exactly those queries in a FRESH JVM (bench.py
subprocess against B's sf_dir, artifact redirected so canonical
subset_sf{sf}.json files are never clobbered) and issues a verdict per
query:

  session-state   isolated min-warm / A-median ≤ data_ratio ×
                  --restore-tol — the flag was session position, not
                  code; the isolated number is the real one.
  persists-isolated  the inflation survives a fresh JVM — treat as a
                  REAL scaling regression and read the plan.
  bytes-grew      byte ratio exceeded linear — not a session-state
                  candidate; adjudicate bytes-vs-output (the pre-§21.7
                  manual rule still applies).
  no-byte-evidence  one side lacks shuffle accounting — cannot apply
                  the rule mechanically.

The verdict block is WRITTEN INTO artifact B (key "adjudication") so
the decade stamps carry machine-made adjudication rows instead of
SCALE.md prose, and the isolated re-run detail is kept as its own
artifact next to B.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _calib_of(artifact: dict) -> float | None:
    """The artifact's box-speed stamp (bench.py calibration block):
    mean of the pre/post constant Spark micro-workload walls. None for
    pre-round-14 artifacts."""
    c = artifact.get("calibration")
    return c.get("spark_mean_sec") if isinstance(c, dict) else None


def _isolated_rerun(
    queries: list[str], sf_dir: str, runs: int, out_artifact: Path
) -> dict:
    """Run bench.py on just ``queries`` in a fresh JVM; return its
    detail artifact. Fresh process == fresh JVM == no session state —
    the whole point of the adjudication."""
    env = {
        **os.environ,
        "SPARK_GRAFT_BENCH_QUERIES": ",".join(queries),
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_RUNS": str(runs),
        "SPARK_GRAFT_BENCH_ARTIFACT": str(out_artifact),
    }
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        check=False,
    )
    if not out_artifact.exists():
        raise RuntimeError(
            f"isolated re-run produced no artifact (exit {proc.returncode}):\n"
            f"{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}"
        )
    return json.loads(out_artifact.read_text())


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("a", help="bench artifact A (smaller SF / prior round)")
    ap.add_argument("b", help="bench artifact B (larger SF / current round)")
    ap.add_argument(
        "data_ratio", nargs="?", type=float, default=3.0,
        help="data growth B/A; a time ratio above this is flagged",
    )
    ap.add_argument(
        "--adjudicate", action="store_true",
        help="auto re-run byte-linear flags in a fresh JVM and write "
        "verdicts into artifact B",
    )
    ap.add_argument(
        "--sf-dir", default=None,
        help="data dir for the isolated re-runs (default: B's sf_dir field)",
    )
    ap.add_argument("--runs", type=int, default=3, help="isolated re-run count")
    ap.add_argument(
        "--byte-tol", type=float, default=1.35,
        help="byte ratio ≤ data_ratio×tol counts as linear (session-state "
        "candidate); above it the flag is adjudicated bytes-vs-output",
    )
    ap.add_argument(
        "--restore-tol", type=float, default=1.25,
        help="isolated-min/A-median ≤ data_ratio×tol ⇒ verdict session-state",
    )
    args = ap.parse_args()

    a_path, b_path = args.a, args.b
    data_ratio = args.data_ratio
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
    # box-speed calibration (round-14): when both artifacts carry the
    # constant-workload stamp, report wall ratios DIVIDED by the box
    # ratio alongside raw — the flags stay raw (conservative), the
    # calibrated column is the number that transfers across days
    calib_a, calib_b = _calib_of(a), _calib_of(b)
    calib_ratio = (calib_b / calib_a) if calib_a and calib_b else None
    flagged: list[tuple[str, float, float, float | None]] = []
    cal_hdr = f" {'cal_r':>7}" if calib_ratio else ""
    print(f"{'ratio':>7}{cal_hdr} {'flag':>4} {'t_a':>8} {'t_b':>8} {'bytes_r':>8}  query")
    for ratio, q, ta, tb, byte_ratio in rows:
        flag = "***" if ratio > data_ratio else ""
        if flag:
            flagged.append((q, ratio, ta, byte_ratio))
        br = f"{byte_ratio:8.1f}" if byte_ratio is not None else "       -"
        cal = f" {ratio / calib_ratio:7.2f}" if calib_ratio else ""
        print(f"{ratio:7.2f}{cal} {flag:>4} {ta:8.2f} {tb:8.2f} {br}  {q}")
    tot_a = sum(a_med[q] for q in common)
    tot_b = sum(b_med[q] for q in common)
    print(
        f"\n{len(common)} common queries; totals {tot_a:.1f}s -> {tot_b:.1f}s "
        f"({tot_b / tot_a:.2f}x for {data_ratio:.0f}x data); "
        f"{len(flagged)} super-linear (> {data_ratio:.1f}x)"
    )
    if calib_ratio:
        print(
            f"box-speed calib: A {calib_a}s, B {calib_b}s -> box ratio "
            f"{calib_ratio:.2f}x; calibrated totals ratio "
            f"{(tot_b / tot_a) / calib_ratio:.2f}x for {data_ratio:.0f}x data"
        )
    else:
        missing = [n for n, c in (("A", calib_a), ("B", calib_b)) if not c]
        print(f"box-speed calib: absent on artifact(s) {missing} — raw ratios only")
    only_a = set(a_med) - set(b_med)
    only_b = set(b_med) - set(a_med)
    if only_a or only_b:
        print(f"only in A: {sorted(only_a)}\nonly in B: {sorted(only_b)}")

    if not args.adjudicate:
        return 0

    # ---- adjudication pass -------------------------------------------
    verdicts: dict[str, dict] = {}
    candidates: list[tuple[str, float, float]] = []
    for q, ratio, ta, byte_ratio in flagged:
        if byte_ratio is None:
            verdicts[q] = {
                "verdict": "no-byte-evidence",
                "time_ratio": round(ratio, 2),
            }
        elif byte_ratio > data_ratio * args.byte_tol:
            verdicts[q] = {
                "verdict": "bytes-grew",
                "time_ratio": round(ratio, 2),
                "byte_ratio": round(byte_ratio, 2),
                "note": "shuffle grew super-linearly; adjudicate bytes-vs-output",
            }
        else:
            candidates.append((q, ratio, ta))
    if candidates:
        sf_dir = args.sf_dir or b.get("sf_dir")
        if not sf_dir:
            print(
                "adjudicate: artifact B has no sf_dir field and --sf-dir "
                "not given; cannot re-run isolated",
                file=sys.stderr,
            )
            return 2
        names = [q for q, _, _ in candidates]
        iso_artifact = Path(b_path).with_name(
            Path(b_path).stem + "_adjudication_rerun.json"
        )
        print(
            f"\nadjudicating {len(names)} byte-linear flag(s) via isolated "
            f"fresh-JVM re-run against {sf_dir} ({args.runs} runs): {names}"
        )
        t0 = time.time()
        iso = _isolated_rerun(names, sf_dir, args.runs, iso_artifact)
        print(f"isolated re-run done in {time.time() - t0:.0f}s -> {iso_artifact}")
        iso_min = iso.get("queries", {})
        iso_med = iso.get("queries_median", {})
        for q, ratio, ta in candidates:
            if q not in iso_min:
                verdicts[q] = {
                    "verdict": "rerun-error",
                    "time_ratio": round(ratio, 2),
                    "err": iso.get("errors", {}).get(q, "missing from re-run"),
                }
                continue
            # compare like with like: artifact A's number is a MEDIAN,
            # so the restored test uses the isolated MEDIAN too — the
            # earlier min/median mix systematically biased verdicts
            # toward the session-state acquittal beyond what
            # --restore-tol models. The min is kept in the record as
            # the steady-state floor.
            iso_stat = iso_med.get(q, iso_min[q])
            iso_ratio = iso_stat / ta if ta > 0 else float("inf")
            restored = iso_ratio <= data_ratio * args.restore_tol
            verdicts[q] = {
                "verdict": "session-state" if restored else "persists-isolated",
                "time_ratio": round(ratio, 2),
                "isolated_min_sec": iso_min[q],
                "isolated_median_sec": iso_med.get(q),
                "isolated_ratio_vs_a": round(iso_ratio, 2),
                "threshold": round(data_ratio * args.restore_tol, 2),
            }
    meta = {
        "rule": "SCALE.md §21.7: wall flag + linear shuffle bytes + clean "
        "isolated fresh-JVM re-run ⇒ session state, not code",
        "calib_a_sec": calib_a,
        "calib_b_sec": calib_b,
        "calib_box_ratio": round(calib_ratio, 3) if calib_ratio else None,
        "verdict_stat": "isolated_median_sec / A-median (like vs like; "
        "isolated_min_sec recorded as the steady-state floor)",
        "a": str(a_path),
        "data_ratio": data_ratio,
        "byte_tol": args.byte_tol,
        "restore_tol": args.restore_tol,
        "runs": args.runs,
    }
    b["adjudication"] = {"_meta": meta, **verdicts}
    # atomic replace: artifact B is a canonical measurement record — a
    # mid-write interrupt must never leave it truncated
    tmp = Path(b_path).with_name(Path(b_path).name + ".tmp")
    tmp.write_text(json.dumps(b, indent=1))
    os.replace(tmp, b_path)
    print(f"\nadjudication written into {b_path}:")
    for q, v in verdicts.items():
        print(f"  {q}: {v['verdict']} ({json.dumps({k: x for k, x in v.items() if k != 'verdict'})})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
