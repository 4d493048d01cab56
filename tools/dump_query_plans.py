#!/usr/bin/env python
"""Dump `.explain("formatted")` for the named queries into a directory
— the per-query before/after plan evidence for the optimization
rounds. Usage:

    python tools/dump_query_plans.py OUT_DIR SUFFIX query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query, built at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Builder-side jobs
(guard probes, iterative collects) run as part of build(), exactly as
the bench does; the dumped plan is the final sink plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from welearn_datastack_spark.plans.registry import REGISTRY, _load_groups
from welearn_datastack_spark.session import get_spark


def main() -> int:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _load_groups()
    spark = get_spark("plan-dump")
    rc = 0
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"[skip] {name}: not registered")
            rc = 1
            continue
        try:
            df = spec.build(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print(f"[ok] {name}")
        except Exception as e:  # noqa: BLE001
            print(f"[err] {name}: {type(e).__name__}: {e}")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
