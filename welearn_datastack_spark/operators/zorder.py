"""Z-order (Morton) clustering key — multi-dimensional data layout
for scan pruning (LLM-data-pipeline extension; the reference has no
analog — this is the Delta OPTIMIZE ZORDER / Iceberg sort-order idea
expressed as a plain column).

Why it matters at 100 TB: parquet row-group pruning works off per-file
min/max stats, which are only selective along the SORT dimension.
Sorting by the interleaved-bit key keeps files tight in EVERY
participating dimension at once, so predicates on either column (or
both) prune files — `compact(sort_within_by=[zorder_key(...)])`
gives the layout without a table format.

Pure Catalyst bit arithmetic (unrolled shift/mask terms, whole-stage
codegen) — deterministic, and exactly reproducible in ANSI SQL for
the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integral
    columns: result bit 2i is a's bit i, bit 2i+1 is b's bit i.
    Clamps negatives to 0 (layout keys, not arithmetic)."""
    a = F.greatest(a.cast("bigint"), F.lit(0))
    b = F.greatest(b.cast("bigint"), F.lit(0))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` (shared semantics for the
    oracle gate)."""
    a = f"greatest(CAST({a_expr} AS BIGINT), 0)"
    b = f"greatest(CAST({b_expr} AS BIGINT), 0)"
    # CAST: DuckDB's list_sum widens to HUGEINT/DOUBLE
    return (
        f"CAST(list_sum(list_transform(generate_series(0, {bits - 1}),"
        f" i -> ((({a} >> i) & 1) << (2 * i))"
        f"    + ((({b} >> i) & 1) << (2 * i + 1)))) AS BIGINT)"
    )
