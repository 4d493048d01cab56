"""foreachPartition sink test — per-partition client, bounded chunks."""

from __future__ import annotations

import json
import os
import uuid

from welearn_datastack_spark.sources.sinks import write_foreach_partition

_OUT_DIR = "/tmp/welearn_sink_test"


class FileChunkWriter:
    """Executor-side mock of a vector-store client: each upsert writes
    one JSON-lines file, so the test can audit chunking from outside."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.opened = True

    def upsert(self, chunk):
        path = os.path.join(self.out_dir, f"{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            for row in chunk:
                f.write(json.dumps(row.asDict(), default=str) + "\n")

    def close(self):
        self.opened = False


def _factory():
    os.makedirs(_OUT_DIR, exist_ok=True)
    return FileChunkWriter(_OUT_DIR)


def test_foreach_partition_chunked_sink(spark):
    import shutil

    shutil.rmtree(_OUT_DIR, ignore_errors=True)
    df = spark.range(0, 257).selectExpr("id", "concat('p-', id) AS point_id").repartition(4)
    write_foreach_partition(df, _factory, chunk_size=50)

    files = [os.path.join(_OUT_DIR, f) for f in os.listdir(_OUT_DIR)]
    rows, sizes = [], []
    for p in files:
        with open(p) as f:
            lines = f.readlines()
        sizes.append(len(lines))
        rows.extend(json.loads(ln)["id"] for ln in lines)
    assert sorted(rows) == list(range(257))  # every row delivered exactly once
    assert max(sizes) <= 50  # chunk bound respected
    assert len(files) >= 4  # at least one flush per partition
