#!/usr/bin/env python
"""Run every registered query against its DuckDB oracle and report
mismatches. Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from welearn_datastack_spark.plans.oracle_check import check_query, duckdb_conn
from welearn_datastack_spark.plans.registry import REGISTRY, _load_groups
from welearn_datastack_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    _load_groups()
    spark = get_spark("oracle-check")
    con = duckdb_conn(sf_dir)
    failed = []
    ran = 0
    for name, spec in REGISTRY.items():
        if names and name not in names:
            continue
        ran += 1
        t0 = time.time()
        try:
            issues = check_query(spark, spec, sf_dir, con)
        except Exception as e:  # noqa: BLE001
            issues = [f"EXCEPTION: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        status = "OK" if not issues else "FAIL"
        tag = "" if spec.oracle else " (rows-only)"
        print(f"[{status}] {name}{tag} ({dt:.1f}s)")
        for msg in issues:
            print(f"       {msg[:500]}")
        if issues:
            failed.append(name)
    scope = f" of {len(REGISTRY)} registered" if ran < len(REGISTRY) else ""
    print(f"\n{ran - len(failed)}/{ran} queries ran and match{scope}")
    if names:
        missing = sorted(set(names) - set(REGISTRY))
        if missing:
            print(f"unknown names (not run): {missing}")
            return 1
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
