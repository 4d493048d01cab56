#!/usr/bin/env python
"""Same-box bench control — institutionalizes the round-9 protocol.

Cross-day wall-clock on this box is NOT comparable (round 9: identical
code drifted +30% day-over-day with steal/iowait at 0 — invisible host
contention). The only sound cross-revision comparison is BOTH revisions
run on the SAME box on the SAME day: this tool checks a prior rev into
a temporary git worktree, runs ITS bench.py and the working tree's
bench.py back-to-back under identical settings, and emits a per-query
comparison artifact.

Usage:
    python tools/bench_control.py <rev> [--queries q1,q2,...]
        [--sf-dir DIR] [--runs N] [--out PATH]

Reads the same env the driver uses (SPARK_GRAFT_SF_DIR /
SPARK_GRAFT_BENCH_RUNS / SPARK_GRAFT_BENCH_QUERIES) as defaults; CLI
flags override. Caveat: bench.py grew subset support in round 9 —
older revisions run the FULL headline regardless of --queries; the
comparison joins on the queries both sides actually ran.

The artifact (default bench_runs/control_<rev>_sf<sf>.json) records
per-query min-warm walls for both sides, current/control ratios, and
box state, so a judge can separate code regressions from box drift.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(side_dir: Path, env_extra: dict[str, str]) -> dict:
    """Run one side's bench.py, return its full detail artifact (or
    the summary stdout line if the artifact cannot be located)."""
    env = {**os.environ, **env_extra}
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(side_dir / "bench.py")],
        cwd=side_dir,
        env=env,
        capture_output=True,
        text=True,
        check=False,
    )
    wall = time.time() - t0
    last = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        summary = json.loads(last)
    except json.JSONDecodeError:
        raise RuntimeError(
            f"bench.py in {side_dir} produced no JSON summary "
            f"(exit {proc.returncode}):\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
    detail = summary
    artifact_rel = summary.get("artifact")
    if artifact_rel:
        artifact = side_dir / artifact_rel
        if artifact.exists():
            detail = json.loads(artifact.read_text())
    detail["_bench_wall_sec"] = round(wall, 1)
    detail["_exit_code"] = proc.returncode
    return detail


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("rev", help="git revision to run as the control")
    ap.add_argument("--queries", default=os.environ.get("SPARK_GRAFT_BENCH_QUERIES", ""),
                    help="comma-separated subset (default: env, else full headline)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--runs", default=os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    ap.add_argument("--out", help="comparison artifact path")
    args = ap.parse_args()

    rev_sha = subprocess.run(
        ["git", "rev-parse", "--short", args.rev], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    cur_desc = subprocess.run(
        ["git", "describe", "--always", "--dirty"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    env_extra = {
        "SPARK_GRAFT_SF_DIR": args.sf_dir,
        "SPARK_GRAFT_BENCH_RUNS": str(args.runs),
        "SPARK_GRAFT_BENCH_QUERIES": args.queries,
    }

    wt = Path(tempfile.mkdtemp(prefix=f"bench_control_{rev_sha}_"))
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(wt), args.rev],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        print(f"[control] {rev_sha} in {wt} (loadavg {os.getloadavg()[0]:.2f})")
        control = _run_bench(wt, env_extra)
        print(f"[current] {cur_desc} in {REPO} (loadavg {os.getloadavg()[0]:.2f})")
        current = _run_bench(REPO, env_extra)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(wt)],
            cwd=REPO, check=False, capture_output=True,
        )

    cq = control.get("queries", {})
    nq = current.get("queries", {})
    common = sorted(set(cq) & set(nq))
    per_query = {
        q: {
            "control_sec": cq[q],
            "current_sec": nq[q],
            "ratio": round(nq[q] / cq[q], 3) if cq[q] > 0 else None,
        }
        for q in common
    }
    c_tot = round(sum(cq[q] for q in common), 3)
    n_tot = round(sum(nq[q] for q in common), 3)
    comparison = {
        "protocol": "same-box same-day control (SCALE.md §20)",
        "control_rev": rev_sha,
        "current_rev": cur_desc,
        "sf_dir": args.sf_dir,
        "runs": args.runs,
        "queries_requested": args.queries or "(full headline)",
        "n_common_queries": len(common),
        "common_total_control_sec": c_tot,
        "common_total_current_sec": n_tot,
        "common_total_ratio": round(n_tot / c_tot, 3) if c_tot else None,
        "per_query": per_query,
        "control_only": sorted(set(cq) - set(nq)),
        "current_only": sorted(set(nq) - set(cq)),
        "control_detail": control,
        "current_detail": current,
    }
    sf_stem = Path(args.sf_dir).name
    out = Path(args.out) if args.out else (
        REPO / "bench_runs" / f"control_{rev_sha}_{sf_stem}.json"
    )
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(comparison, indent=1))
    print(json.dumps({
        "control_rev": rev_sha,
        "current_rev": cur_desc,
        "n_common": len(common),
        "control_total_sec": c_tot,
        "current_total_sec": n_tot,
        "ratio": comparison["common_total_ratio"],
        "artifact": str(out),
    }))


if __name__ == "__main__":
    main()
