"""Iterative graph traversal — the Wikipedia category crawl shape
(reference S6, collectors/wikipedia_collector.py:41–215: BFS over
categorymembers with a depth budget, frontier dedup via set()).

Spark-first: the frontier is a DataFrame; each level is one
equi-join + anti-join against the visited set. The loop lives on the
driver but every level's work is distributed — the classic iterative-
join pattern (GraphX-style without the dependency). At 100 TB the
edge table is pre-partitioned on ``src`` so every expansion joins
co-located; ``localCheckpoint`` after each level truncates the plan
lineage, which otherwise grows linearly with depth and would blow up
the optimizer past a few tens of levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_min_depth(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Minimum-depth reachability from ``seeds`` within ``max_depth``
    hops. ``edges``: (src, dst); ``seeds``: (node). Returns
    (node, depth) where depth is the BFS level the node was first
    reached (seeds at 0)."""
    visited = seeds.select(F.col(node_col), F.lit(0).alias("depth"))
    frontier = visited
    for level in range(1, max_depth + 1):
        expanded = (
            frontier.join(edges, frontier[node_col] == edges[src])
            .select(F.col(dst).alias(node_col))
            # NULL destinations would be re-added every level (an
            # anti-join never matches NULL keys) — drop them up front
            .filter(F.col(node_col).isNotNull())
            .dropDuplicates([node_col])
        )
        fresh = expanded.join(visited.select(node_col), on=node_col, how="left_anti").select(
            F.col(node_col), F.lit(level).alias("depth")
        )
        # truncate lineage: each level otherwise embeds the whole
        # previous plan, and the optimizer cost grows with depth
        fresh = fresh.localCheckpoint(eager=True)
        if fresh.isEmpty():
            break
        visited = visited.unionByName(fresh)
        frontier = fresh
    return visited
