#!/usr/bin/env python
"""Round-close protocol, encoded (round-13 judge item 6: round 11 lost
the sf0.01 sweep to the wall clock; round 12 fixed it by hand-ordering;
this makes the order a command).

Runs, in the protocol order, AFTER the last query edit of the round:

  1. full oracle sweep at sf0.001  -> ORACLE_r{N}.txt
  2. full oracle sweep at sf0.01   -> ORACLE_r{N}_sf0.01.txt
  3. PLANS.md regeneration (tools/dump_plans.py)
  4. canonical bench re-stamps (sf0.1 always; any extra --stamp DIRs),
     quiet-box-gated by bench.py's pre-flight wait

Every step streams to its artifact as it runs (the sweeps tee
per-query lines; bench.py flushes its artifact after every query), so
a wall-clock kill mid-close keeps everything already finished. Steps
run sequentially — the sweeps are correctness gates and must not race
a timing stamp for the box.

Usage:
    python tools/round_close.py 13                 # sweeps + plans + sf0.1
    python tools/round_close.py 13 --stamp /tmp/welearn_sf3
    python tools/round_close.py 13 --skip-stamps   # sweeps + plans only
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _stream(cmd: list[str], out_path: Path | None, env: dict | None = None) -> int:
    """Run cmd, teeing stdout to out_path line-by-line (partial artifact
    survives a kill) and echoing progress to this process's stdout."""
    print(f"\n=== {' '.join(cmd)}" + (f" -> {out_path}" if out_path else ""), flush=True)
    t0 = time.time()
    proc = subprocess.Popen(
        cmd, cwd=REPO, env=env or os.environ.copy(),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    sink = open(out_path, "w") if out_path else None
    try:
        assert proc.stdout is not None
        for line in proc.stdout:
            if sink:
                sink.write(line)
                sink.flush()
            # keep the console tail light: sweep FAIL lines and bench
            # per-query lines matter; DuckDB/Spark noise does not
            if any(t in line for t in ("FAIL", "ERR", "[p", "OK]", "{", "wrote")):
                print(line.rstrip()[:200], flush=True)
    finally:
        if sink:
            sink.close()
    rc = proc.wait()
    print(f"=== exit {rc} in {time.time() - t0:.0f}s", flush=True)
    return rc


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("round", type=int, help="round number N for ORACLE_r{N} naming")
    ap.add_argument(
        "--stamp", action="append", default=[],
        help="extra sf dir(s) to re-stamp canonically (e.g. /tmp/welearn_sf3); "
        "sf0.1 is always stamped unless --skip-stamps",
    )
    ap.add_argument("--skip-stamps", action="store_true", help="sweeps + plans only")
    ap.add_argument("--skip-plans", action="store_true")
    ap.add_argument(
        "--force", action="store_true",
        help="proceed to plans/stamps even after oracle-sweep failures",
    )
    ap.add_argument(
        "--stamp-runs", type=int, default=3,
        help="bench passes per canonical stamp (sf0.1 uses bench.py's default 5)",
    )
    args = ap.parse_args()
    py = sys.executable
    failures: list[str] = []

    # 1+2: the oracle sweeps — the correctness artifacts come FIRST so
    # a wall-clock death never costs the round its gates again
    sweeps = [
        ("/root/testdata/sf0.001", REPO / f"ORACLE_r{args.round}.txt"),
        ("/root/testdata/sf0.01", REPO / f"ORACLE_r{args.round}_sf0.01.txt"),
    ]
    for sf_dir, out in sweeps:
        rc = _stream([py, str(REPO / "tools" / "check_oracle.py"), sf_dir], out)
        if rc != 0:
            failures.append(f"oracle sweep {sf_dir} (exit {rc}) — see {out}")

    # Correctness gates are red → do NOT burn hours of quiet-gated
    # bench time stamping canonicals for a broken build (and never
    # overwrite the latest_sf*.json series with its timings)
    if failures and not args.force:
        print("\nROUND-CLOSE ABORTED after sweep failures (use --force to "
              "override):\n  " + "\n  ".join(failures))
        return 1

    # 3: plan dump (changes whenever HEADLINE or a query plan moved)
    if not args.skip_plans:
        rc = _stream([py, str(REPO / "tools" / "dump_plans.py")], None)
        if rc != 0:
            failures.append(f"dump_plans (exit {rc})")

    # 4: canonical stamps, in ascending cost order; bench.py's quiet
    # gate fronts each one and records waited/overridden in the artifact
    if not args.skip_stamps:
        stamps = ["/root/testdata/sf0.1", *args.stamp]
        for sf_dir in stamps:
            env = os.environ.copy()
            env["SPARK_GRAFT_SF_DIR"] = sf_dir
            if sf_dir != "/root/testdata/sf0.1":
                env["SPARK_GRAFT_BENCH_RUNS"] = str(args.stamp_runs)
            rc = _stream([py, str(REPO / "bench.py")], None, env=env)
            if rc != 0:
                failures.append(f"bench stamp {sf_dir} (exit {rc})")

    if failures:
        print("\nROUND-CLOSE FAILURES:\n  " + "\n  ".join(failures))
        return 1
    print("\nround-close complete: sweeps, plans, stamps all green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
