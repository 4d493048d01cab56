"""Partition-parallel external sinks — the operational form of S16.

The reference pushes points to Qdrant in chunks of
``QDRANT_CHUNK_SIZE=1000`` from a single Python process
(qdrant_syncronizer.py:57,79). Spark-side, the sink is a
``foreachPartition`` writer: every partition opens ONE client (not
one per row), buffers rows into chunks, and flushes — N partitions
write in parallel, each with bounded memory. The in-engine MERGE
simulation (operators/relational.overwrite_by_key) remains the
testable twin; this module is the boundary where rows leave Spark.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any, Protocol

from pyspark.sql import DataFrame


class ChunkWriter(Protocol):
    def upsert(self, chunk: list[Any]) -> None: ...
    def close(self) -> None: ...


def write_foreach_partition(
    df: DataFrame,
    writer_factory: Callable[[], ChunkWriter],
    chunk_size: int = 1000,
) -> None:
    """Stream every partition into ``writer_factory()`` in chunks of
    ``chunk_size`` rows (reference chunking semantics). The factory
    runs ON THE EXECUTOR — it must be picklable and must create the
    client lazily (connections don't survive serialization)."""

    def handle(rows: Iterator[Any]) -> None:
        client = writer_factory()
        try:
            buf: list[Any] = []
            for row in rows:
                buf.append(row)
                if len(buf) >= chunk_size:
                    client.upsert(buf)
                    buf = []
            if buf:
                client.upsert(buf)
        finally:
            client.close()

    df.foreachPartition(handle)
