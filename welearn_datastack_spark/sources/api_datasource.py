"""Python DataSource V2 readers for paginated-API ingestion
(SURVEY.md §2.1 S7–S10).

The reference's REST collectors drive cursor/page loops on the DRIVER
(open_alex_collector.py:110–144: per_page=200, cursor="*", follow
meta.next_cursor for ceil(total/per_page) iterations) and accumulate
records in a Python list.  That shape caps ingestion at one HTTP
connection and one process — at 100 TB the catalog fetch alone would
take days.

Here the same scan is a first-class Spark source built on the Python
DataSource API (pyspark.sql.datasource, Spark 4): the page space is
split into InputPartitions, so 1000 executors fetch 1000 pages
concurrently, and the rows enter the plan as a normal DataFrame scan
(filter/projection over the result participates in Catalyst like any
other source).  A streaming variant exposes the cursor position as a
structured-streaming offset, turning "poll the API for new records"
into an incremental readStream with exactly-once bookkeeping in the
checkpoint, replacing the reference's re-run-the-whole-loop updater.

Transport is pluggable: pages resolve through a ``path`` template
(``.../page-{page}.json``).  Tests and this container use ``file:``
fixtures; a production deployment points the same template at an
https endpoint and swaps ``_fetch_page``'s opener (the HTTP client
itself is deliberately not baked in — see collectors.py for the
fixture-based policy).

Page payload shape mirrors the OpenAlex envelope the reference walks:
``{"meta": {...}, "results": [{...}, ...]}``.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

API_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("lang", StringType()),
        StructField("published_epoch", LongType()),
        StructField("page", LongType()),
    ]
)


def _fetch_page(path_template: str, page: int) -> dict:
    """Resolve one page of the API. File-backed here; the production
    opener would be an https GET with retry/backoff. Missing pages
    yield an empty envelope so a racing ``latestOffset`` never kills
    the stream."""
    path = path_template.format(page=page)
    if not os.path.exists(path):
        return {"meta": {}, "results": []}
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def _rows(envelope: dict, page: int) -> Iterator[tuple]:
    for rec in envelope.get("results", []):
        yield (
            rec.get("url"),
            rec.get("title"),
            rec.get("lang"),
            rec.get("published_epoch"),
            page,
        )


@dataclass
class PageRange(InputPartition):
    start: int
    end: int  # exclusive


class PaginatedApiReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.num_pages = int(options["num_pages"])
        self.pages_per_partition = int(options.get("pages_per_partition", 1))

    def partitions(self) -> Sequence[PageRange]:
        step = self.pages_per_partition
        return [
            PageRange(i, min(i + step, self.num_pages))
            for i in range(0, self.num_pages, step)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        for page in range(partition.start, partition.end):
            yield from _rows(_fetch_page(self.path, page), page)


class PaginatedApiDataSource(DataSource):
    """``spark.read.format("welearn_api").option("path", tmpl)
    .option("num_pages", n).load()`` — page-parallel API scan."""

    @classmethod
    def name(cls) -> str:
        return "welearn_api"

    def schema(self) -> StructType:
        return API_SCHEMA

    def reader(self, schema: StructType) -> PaginatedApiReader:
        return PaginatedApiReader(self.options)


class ApiCursorStreamReader(DataSourceStreamReader):
    """Streaming cursor over the same page space: the offset is the
    count of fully-published pages, discovered by probing the page
    template (the file-backed analogue of the reference's
    ``meta.next_cursor`` check at open_alex_collector.py:143–144).
    Each microbatch reads exactly the pages in (start, end] — new
    pages appearing between triggers arrive incrementally instead of
    re-running the whole collector."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.max_probe = int(options.get("max_probe", 10000))

    def initialOffset(self) -> dict:
        return {"pages": 0}

    def latestOffset(self) -> dict:
        pages = 0
        while pages < self.max_probe and os.path.exists(self.path.format(page=pages)):
            pages += 1
        return {"pages": pages}

    def partitions(self, start: dict, end: dict) -> Sequence[PageRange]:
        lo, hi = start["pages"], end["pages"]
        if hi <= lo:
            # Spark requires >=1 partition; an empty range is a no-op read
            return [PageRange(lo, lo)]
        return [PageRange(p, p + 1) for p in range(lo, hi)]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        for page in range(partition.start, partition.end):
            yield from _rows(_fetch_page(self.path, page), page)

    def commit(self, end: dict) -> None:
        # durable source-side bookkeeping lives in the checkpoint;
        # nothing to release for file-backed pages
        pass


class ApiCursorStreamDataSource(DataSource):
    """``spark.readStream.format("welearn_api_stream")...`` — the
    incremental variant (SURVEY.md §2.10 R1/R5)."""

    @classmethod
    def name(cls) -> str:
        return "welearn_api_stream"

    def schema(self) -> StructType:
        return API_SCHEMA

    def streamReader(self, schema: StructType) -> ApiCursorStreamReader:
        return ApiCursorStreamReader(self.options)


def register_api_sources(spark) -> None:
    """Register both formats. Ships the package to Python workers
    first — the DataSource class is cloudpickled by reference, so the
    executor must be able to import this module (same constraint as
    every mapInPandas entry point; see session.ensure_self_on_executors)."""
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(spark)
    spark.dataSource.register(PaginatedApiDataSource)
    spark.dataSource.register(ApiCursorStreamDataSource)


def write_page_fixtures(
    directory: str, num_pages: int, per_page: int = 5, start_page: int = 0
) -> str:
    """Deterministic OpenAlex-envelope fixtures for tests; returns the
    path template."""
    os.makedirs(directory, exist_ok=True)
    for page in range(start_page, start_page + num_pages):
        results = []
        for i in range(per_page):
            n = page * per_page + i
            results.append(
                {
                    "url": f"https://example.org/works/W{n:06d}",
                    "title": f"Work {n}",
                    "lang": ["en", "fr", "es"][n % 3],
                    "published_epoch": 1_600_000_000 + 86_400 * n,
                }
            )
        envelope = {
            "meta": {"page": page, "per_page": per_page},
            "results": results,
        }
        with open(os.path.join(directory, f"page-{page}.json"), "w", encoding="utf-8") as f:
            json.dump(envelope, f)
    return os.path.join(directory, "page-{page}.json")
