"""Graph table functions (SURVEY.md §2.10).

Reference: tf_graph_shortest_path / tf_graph_shortest_paths_distances
(QueryEngine/TableFunctions/SystemFunctions/os/Graph/GraphTableFunctions.hpp:280,348).

Spark-first: iterative frontier BFS over an edge DataFrame. Each hop is
one distributed join + union + min-aggregate; the driver only controls
the loop (standard Pregel-style pattern, same shape GraphFrames uses).
State stays a DataFrame throughout — no collect of nodes or edges.

Reused iteration state is localCheckpoint'ed rather than persist'ed:
checkpoint blocks are dropped by the ContextCleaner once the DataFrame
is garbage-collected, so repeated calls in one session don't accumulate
cache-registry entries (persist() entries live until explicit
unpersist, which a lazily-returned DataFrame cannot schedule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bfs(
    edges: DataFrame,
    source: int,
    src_col: str,
    dst_col: str,
    max_hops: int,
    directed: bool = True,
) -> DataFrame:
    """Frontier BFS from `source`; returns (node, dist, pred) where pred
    is the minimum-id predecessor on some shortest path (NULL at the
    source). Each hop is one join + min-aggregate, shuffle-bounded by
    the frontier size, not the graph size."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().localCheckpoint(eager=False)

    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(source, 0, None)], "node LONG, dist INT, pred LONG"
    )
    frontier = dist
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("src").alias("pred"))
            .join(dist.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("dist"), "pred")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt)
        frontier = nxt
    return dist


def shortest_paths_distances(
    edges: DataFrame,
    source: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 10,
    directed: bool = True,
) -> DataFrame:
    """Distances (in hops) from `source` to every reachable node —
    tf_graph_shortest_paths_distances analogue for unweighted graphs."""
    return _bfs(edges, source, src_col, dst_col, max_hops, directed).select(
        "node", "dist"
    )


def shortest_path(
    edges: DataFrame,
    source: int,
    target: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 10,
) -> DataFrame:
    """tf_graph_shortest_path analogue: one row per hop along a shortest
    source→target path.

    The BFS records each node's min-id predecessor, so reconstruction is
    a backward join chain over the (small) distance table — one Spark
    action for the target distance and one for the final collect, never
    a per-hop driver round-trip.
    """
    dist = _bfs(edges, source, src_col, dst_col, max_hops).localCheckpoint(
        eager=True
    )
    spark = dist.sparkSession
    t = dist.filter(F.col("node") == target).first()
    if t is None:
        return spark.createDataFrame([], "path_step INT, node LONG")
    d_target = t["dist"]
    # walk pred pointers in plan space: step k's row is the predecessor
    # of step k+1's — d_target self-joins on the checkpointed table,
    # collected once
    cur = dist.filter(F.col("node") == target)
    steps = [cur.select(F.lit(d_target).alias("path_step"), "node")]
    for k in range(d_target - 1, -1, -1):
        cur = dist.join(
            cur.select(F.col("pred").alias("node")), "node"
        )
        steps.append(cur.select(F.lit(k).alias("path_step"), "node"))
    out = steps[0]
    for s in steps[1:]:
        out = out.union(s)
    return out.orderBy("path_step")
