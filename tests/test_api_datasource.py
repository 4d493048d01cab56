"""Python DataSource V2 paginated-API readers (SURVEY.md §2.1 S7–S10,
§2.10 R1/R5): page-parallel batch scan + cursor-offset streaming."""

import os

import pytest
from pyspark.sql import functions as F

from welearn_datastack_spark.sources.api_datasource import (
    register_api_sources,
    write_page_fixtures,
)


@pytest.fixture(scope="module")
def api_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("api_pages")
    template = write_page_fixtures(str(d), num_pages=6, per_page=4)
    return template


def _read(spark, template, num_pages=6, **opts):
    register_api_sources(spark)
    r = spark.read.format("welearn_api").option("path", template).option(
        "num_pages", num_pages
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_reads_all_pages(spark, api_fixture):
    df = _read(spark, api_fixture)
    assert df.count() == 24
    rows = df.orderBy("url").collect()
    assert rows[0]["url"] == "https://example.org/works/W000000"
    assert rows[0]["lang"] == "en"
    assert rows[0]["page"] == 0
    assert rows[-1]["page"] == 5
    # one InputPartition per page → the scan parallelizes across the
    # page space (the reference's driver loop is 1-way by construction)
    assert df.rdd.getNumPartitions() == 6


def test_pages_per_partition_coalesces(spark, api_fixture):
    df = _read(spark, api_fixture, pages_per_partition=3)
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 24


def test_batch_composes_with_relational_ops(spark, api_fixture):
    df = _read(spark, api_fixture)
    by_lang = (
        df.filter(F.col("published_epoch") >= 1_600_000_000)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang")
    )
    assert [(r["lang"], r["n"]) for r in by_lang.collect()] == [
        ("en", 8),
        ("es", 8),
        ("fr", 8),
    ]


def test_missing_pages_yield_empty_not_error(spark, api_fixture):
    # num_pages beyond what exists: absent files → empty envelopes
    df = _read(spark, api_fixture, num_pages=10)
    assert df.count() == 24


def test_stream_cursor_picks_up_new_pages(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    template = write_page_fixtures(pages_dir, num_pages=3, per_page=2)
    register_api_sources(spark)

    def run_once():
        q = (
            spark.readStream.format("welearn_api_stream")
            .option("path", template)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out_dir)
    assert first.count() == 6
    assert {r["page"] for r in first.select("page").distinct().collect()} == {0, 1, 2}

    # two more pages land; the next trigger reads ONLY those — the
    # checkpoint carries the cursor offset, so nothing is re-fetched
    write_page_fixtures(pages_dir, num_pages=2, per_page=2, start_page=3)
    run_once()
    second = spark.read.parquet(out_dir)
    assert second.count() == 10
    per_page_counts = {
        r["page"]: r["n"]
        for r in second.groupBy("page").agg(F.count("*").alias("n")).collect()
    }
    assert per_page_counts == {0: 2, 1: 2, 2: 2, 3: 2, 4: 2}
