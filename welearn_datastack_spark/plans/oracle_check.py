"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a QuerySpec's Spark builder and its DuckDB oracle over the same
parquet tables and compares row count, column names, and
order-insensitive values. Used by tests/ and tools/check_oracle.py so
mismatches are caught before the driver's CORRECTNESS run.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from ..sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    registered = 0
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        # gen_sf.py --files-per-table writes <name>.parquet as a
        # DIRECTORY of part files (Spark-style layout); DuckDB's
        # read_parquet errors with "No files found" on a bare
        # directory path, so glob its members instead — this keeps
        # the correctness gate runnable against multi-file datasets.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            # slim corpora (gen_sf.py --tables documents,...) carry a
            # table subset; skip the missing views so single-table
            # gates (e.g. the midband recall re-run on a realistic-
            # vocab documents-only corpus) can still register. A query
            # that references a skipped table fails with DuckDB's
            # normal "table does not exist" — never silently.
            continue
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
        registered += 1
    if registered == 0:
        # per-table skips exist for genuine slim corpora (gen_sf.py
        # --tables); a dir with ZERO known tables is a typo'd sf_dir,
        # and surfacing it here beats N per-query 'table does not
        # exist' failures later (round-12 ADVICE)
        raise FileNotFoundError(
            f"duckdb_conn: no known table parquet found under {sf_dir!r} "
            f"(expected at least one of {sorted(TABLES)})"
        )
    return con


def _canon_cell(v: Any) -> Any:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, (int,)):
        return int(v)
    try:  # numpy scalars
        import numpy as np

        if isinstance(v, np.floating):
            return repr(float(v))
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.bool_):
            return bool(v)
        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v)
    except ImportError:
        pass
    return v


def canonicalize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    issues: list[str] = []
    s_cols, s_rows = canonicalize(spark_pdf)
    o_cols, o_rows = canonicalize(oracle_pdf)
    if s_cols != o_cols:
        issues.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return issues
    if len(s_rows) != len(o_rows):
        issues.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    for i, (sr, orr) in enumerate(zip(s_rows, o_rows)):
        if sr != orr:
            issues.append(f"first differing row #{i}: spark={sr} oracle={orr}")
            break
    return issues


def check_query(spark, spec, sf_dir: str, con: duckdb.DuckDBPyConnection | None = None) -> list[str]:
    own = con is None
    if own:
        con = duckdb_conn(sf_dir)
    try:
        spark_pdf = spec.build(spark, sf_dir).toPandas()
        if spec.oracle is None:
            # rows-only gate: the query must actually produce rows —
            # an empty frame would otherwise hide a regressed filter
            return [] if len(spark_pdf) > 0 else ["rows-only query returned 0 rows"]
        oracle_pdf = con.execute(spec.oracle).fetchdf()
        return compare_frames(spark_pdf, oracle_pdf)
    finally:
        if own:
            con.close()
