#!/usr/bin/env python
"""Band-bucket candidate-volume probe — the Σ C(c,2) adjudication from
SCALE.md §22.6, promoted from an ad-hoc post-mortem to a tool.

Computes the EXACT number of candidate-pair rows the minhash LSH
diagnostic (`minhash_lsh_candidates_hashed`, plans/q_dedup.py) would
materialize on a corpus, WITHOUT building a single pair row: the same
shingle→minhash→band pipeline the query runs, then
groupBy(band, band_key) → count → Σ c·(c−1)/2. Aggregation only, so it
costs one linear pass at any scale — this is also exactly the probe
`pair_volume_guard` (operators/dedup.py) runs as its pre-flight gate;
the tool exists so corpus comparisons (legacy word-salad vs realistic
zipfian vocab, SCALE.md §23) are reproducible from the command line.

Usage:
    python tools/pair_probe.py DIR [DIR ...] [--bands 4] [--rows 2]

Prints one JSON line per directory:
    {"sf_dir": ..., "docs": N, "buckets": B, "max_bucket": M,
     "candidate_pairs": P, "est_shuffle_gb": P*12/1e9}
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from welearn_datastack_spark.plans.q_dedup import (  # noqa: E402
    minhash_band_frame,
)
from welearn_datastack_spark.session import get_spark  # noqa: E402
from welearn_datastack_spark.sources.tables import (  # noqa: E402
    fan_out_for_compute,
    load_table,
)


def probe(spark, sf_dir: str, n_bands: int, rows_per_band: int) -> dict:
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    # the SHARED pipeline builder the gated queries run — the probe
    # stays coupled to exactly what minhash_lsh_candidates_hashed
    # would materialize (round-12 ADVICE: a private re-derivation here
    # would silently stop measuring the query it claims to model)
    bands = minhash_band_frame(docs, n_bands=n_bands, rows_per_band=rows_per_band)
    row = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
            F.max("c").alias("max_bucket"),
            F.count(F.lit(1)).alias("buckets"),
        )
        .first()
    )
    from welearn_datastack_spark.operators.dedup import PAIR_GUARD_BYTES_PER_PAIR

    return {
        "sf_dir": sf_dir,
        "docs": docs.count(),
        "buckets": int(row["buckets"]),
        "max_bucket": int(row["max_bucket"]),
        "candidate_pairs": int(row["pairs"] or 0),
        "est_shuffle_gb": round(
            int(row["pairs"] or 0) * PAIR_GUARD_BYTES_PER_PAIR / 1e9, 2
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--rows", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark("pair-probe")
    for d in args.dirs:
        print(json.dumps(probe(spark, d, args.bands, args.rows)), flush=True)


if __name__ == "__main__":
    main()
