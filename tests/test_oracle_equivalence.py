"""The local replica of the driver's correctness gate: every
registered query must hash-match its DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from welearn_datastack_spark.plans.oracle_check import check_query, duckdb_conn
from welearn_datastack_spark.plans.registry import REGISTRY, _load_groups

_load_groups()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, con, name):
    spec = REGISTRY[name]
    issues = check_query(spark, spec, sf_dir, con)
    assert not issues, f"{name}: {issues}"
