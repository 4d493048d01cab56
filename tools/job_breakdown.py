#!/usr/bin/env python
"""Job-level breakdown of one registered query's build+sink cycle.

Runs the query once to warm codegen, then a second cycle with job
tracking: every Spark job launched during the cycle is listed with
its duration, task count, and description/call-site — the data needed
to decide which builder phases to merge or cheapen.

Usage: python tools/job_breakdown.py [sf_dir] name
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


def _jobs(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/jobs"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    name = args[0]
    _load_groups()
    spark = get_spark("job-breakdown")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spec = REGISTRY[name]

    # warm cycle (codegen compile, parquet footers)
    spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    before_ids = {j["jobId"] for j in _jobs(spark)}
    t0 = time.perf_counter()
    df = spec.build(spark, sf_dir)
    t_build = time.perf_counter() - t0
    df.write.format("noop").mode("overwrite").save()
    t_total = time.perf_counter() - t0

    from datetime import datetime

    def _ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    new = [j for j in _jobs(spark) if j["jobId"] not in before_ids]
    new.sort(key=lambda j: j["jobId"])
    total_job = 0.0
    prev_end = None
    print(f"{name}: build={t_build:.3f}s total={t_total:.3f}s jobs={len(new)}")
    print(f"{'job':>5s} {'dur_ms':>8s} {'gap_ms':>8s} {'tasks':>6s}  description")
    for j in new:
        sub = _ts(j["submissionTime"])
        dur = (_ts(j["completionTime"]) - sub) if j.get("completionTime") else -1
        gap = (sub - prev_end) * 1000 if prev_end else 0.0
        prev_end = _ts(j["completionTime"]) if j.get("completionTime") else prev_end
        total_job += max(dur, 0)
        desc = (j.get("description") or j.get("name") or "")[:90]
        print(
            f"{j['jobId']:5d} {dur * 1000:8.0f} {gap:8.0f} {j['numTasks']:6d}  {desc}"
        )
    print(f"sum(job durations)={total_job:.3f}s  wall={t_total:.3f}s "
          f"(driver gaps = {t_total - total_job:.3f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
