"""Graph operators — BFS reachability and rank-limited tree walk.

Reference: ``/root/reference/preql/modules/graph.pql:3-36`` implements
``bfs``/``walk_tree`` as recursive CTEs.  Spark has no recursive CTE,
so these are driver-side iterative fixpoint loops over DataFrame
joins, with ``localCheckpoint`` every few rounds to cut lineage — the
standard Pregel-lite pattern.  Each iteration is one hash join on the
edge table (co-partitioned by src after the first shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs(edges: DataFrame, initial: DataFrame,
        src: str = "src", dst: str = "dst", node: str = "node",
        max_iter: int = 50, checkpoint_every: int = 4) -> DataFrame:
    """All nodes reachable from ``initial`` (inclusive) — parity with
    graph.pql bfs (recursive CTE with UNION-distinct semantics).

    ``edges``: (src, dst).  ``initial``: single-column node frame.
    Returns a single-column DataFrame named ``node``.
    """
    visited = initial.select(F.col(initial.columns[0]).alias(node)).distinct()
    frontier = visited
    for i in range(max_iter):
        nxt = (frontier.join(edges, frontier[node] == edges[src])
               .select(F.col(dst).alias(node)).distinct()
               .join(visited, node, "left_anti"))
        nxt = nxt.localCheckpoint(eager=True) if (i % checkpoint_every == checkpoint_every - 1) \
            else nxt.cache()
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def walk_tree(edges: DataFrame, initial: DataFrame, max_rank: int,
              src: str = "src", dst: str = "dst", node: str = "node",
              ) -> DataFrame:
    """BFS with a rank (depth) limit, revisits allowed — parity with
    graph.pql walk_tree (:19-36).  Returns (node, rank) with one row
    per visit, like the reference's UNION ALL recursion."""
    frontier = initial.select(F.col(initial.columns[0]).alias(node),
                              F.lit(0).alias("rank"))
    out = frontier
    for r in range(1, max_rank + 1):
        frontier = (frontier.join(edges, frontier[node] == edges[src])
                    .select(F.col(dst).alias(node), F.lit(r).alias("rank")))
        frontier = frontier.localCheckpoint(eager=True) if r % 4 == 0 else frontier
        if frontier.isEmpty():
            break
        out = out.unionByName(frontier)
    return out
