#!/usr/bin/env python
"""Per-query overhead profiler (optimization round 15).

Splits a registered query's wall into the phases the bench's single
noop-sink timing cannot distinguish:

  build    - Python DSL time to construct the DataFrame (driver only;
             includes any .collect()-driven sub-jobs the builder runs,
             e.g. k-means iteration collects or quantizer seeds)
  analyze  - first .schema touch (Catalyst analysis of the final plan)
  exec0    - first noop sink (optimization + codegen compile + run)
  execN    - min of N repeat noop sinks on the SAME DataFrame object
             (steady-state execution: job scheduling + task run)
  rebuildN - min of N full rebuild+sink cycles (what bench.py times on
             warm passes: DSL + analysis + optimization + cached
             codegen + run)
  jobs     - Spark jobs launched by one rebuild cycle (status API)

Usage: python tools/profile_query.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_UI", "true")

from welearn_datastack_spark.plans.registry import REGISTRY, _load_groups
from welearn_datastack_spark.session import get_spark


def _job_count(spark) -> int | None:
    try:
        base = spark.sparkContext.uiWebUrl
        if not base:
            return None
        app_id = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app_id}/jobs"
        with urllib.request.urlopen(url, timeout=10) as r:
            return len(json.load(r))
    except Exception:  # noqa: BLE001
        return None


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def profile(spark, name: str, sf_dir: str, n: int = 3) -> dict:
    spec = REGISTRY[name]
    rec: dict = {"name": name}

    t0 = time.perf_counter()
    df = spec.build(spark, sf_dir)
    rec["build"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    _ = df.schema
    rec["analyze"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    _noop(df)
    rec["exec0"] = time.perf_counter() - t0

    execs = []
    for _ in range(n):
        t0 = time.perf_counter()
        _noop(df)
        execs.append(time.perf_counter() - t0)
    rec["execN"] = min(execs)

    rebuilds = []
    jobs_before = _job_count(spark)
    for i in range(n):
        t0 = time.perf_counter()
        df2 = spec.build(spark, sf_dir)
        _noop(df2)
        rebuilds.append(time.perf_counter() - t0)
        if i == 0 and jobs_before is not None:
            after = _job_count(spark)
            rec["jobs_per_cycle"] = None if after is None else after - jobs_before
    rec["rebuildN"] = min(rebuilds)
    return rec


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    _load_groups()
    spark = get_spark("profile-query")
    # warm parquet footers + JVM like bench.py
    for warm_table in ("lineitem", "documents", "events", "region"):
        if os.path.exists(f"{sf_dir}/{warm_table}.parquet"):
            spark.read.parquet(f"{sf_dir}/{warm_table}.parquet").count()
            break
    names = args or list(REGISTRY)
    print(
        f"{'query':36s} {'build':>7s} {'analyze':>7s} {'exec0':>7s}"
        f" {'execN':>7s} {'rebuildN':>8s} {'jobs':>5s}"
    )
    for name in names:
        if name not in REGISTRY:
            print(f"{name}: not registered", file=sys.stderr)
            continue
        r = profile(spark, name, sf_dir)
        print(
            f"{r['name']:36s} {r['build']:7.3f} {r['analyze']:7.3f}"
            f" {r['exec0']:7.3f} {r['execN']:7.3f} {r['rebuildN']:8.3f}"
            f" {str(r.get('jobs_per_cycle')):>5s}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
