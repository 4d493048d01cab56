"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 is realized as a ``QuerySpec``: a
Spark DataFrame builder ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an ANSI-SQL oracle twin that DuckDB runs over the
same parquet tables. ``__spark_entry__.py`` re-exports this registry.

Column-name discipline: builder output and oracle output must have
IDENTICAL column names (the driver sorts columns by name before
hashing values). Float discipline: any aggregate over doubles is
rounded explicitly (same digits both sides) so partial-aggregation
order cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a builder under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_groups()
    return {name: spec.build for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_groups()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _load_groups() -> None:
    """Import all query-group modules (side effect: they register)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        q_curation,
        q_dedup,
        q_extra,
        q_extraction,
        q_kernel,
        q_ml,
        q_relational,
        q_text,
    )

    _LOADED = True
