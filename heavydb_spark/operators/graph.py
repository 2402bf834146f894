"""Graph table functions (SURVEY.md §2.10).

Reference: tf_graph_shortest_path / tf_graph_shortest_paths_distances
(QueryEngine/TableFunctions/SystemFunctions/os/Graph/GraphTableFunctions.hpp:280,348).

Spark-first: iterative frontier BFS over an edge DataFrame. Each hop is
one distributed join + union + min-aggregate; the driver only controls
the loop (standard Pregel-style pattern, same shape GraphFrames uses).
State stays a DataFrame throughout — no collect of nodes or edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths_distances(
    edges: DataFrame,
    source: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 10,
    directed: bool = True,
) -> DataFrame:
    """Distances (in hops) from `source` to every reachable node.

    tf_graph_shortest_paths_distances analogue for unweighted graphs.
    Frontier BFS: hop k joins the current frontier against the edge
    list; `dist` table keeps the first (minimal) hop count per node.
    Each iteration is checkpoint-free and shuffle-bounded by the
    frontier size, not the graph size.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().persist()

    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0)], "node LONG, dist INT")
    frontier = dist
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        nxt = nxt.persist()
        if nxt.isEmpty():
            break
        dist = dist.union(nxt)
        frontier = nxt
    return dist


def shortest_path(
    edges: DataFrame,
    source: int,
    target: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 10,
) -> DataFrame:
    """tf_graph_shortest_path analogue: one row per hop along a shortest
    source→target path (path reconstructed by backward walk over the
    distance table — max_hops joins, all distributed)."""
    dist = shortest_paths_distances(
        edges, source, src_col, dst_col, max_hops
    ).persist()
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()

    t = dist.filter(F.col("node") == target)
    if t.isEmpty():
        return dist.sparkSession.createDataFrame([], "path_step INT, node LONG")
    d_target = t.first()["dist"]
    # walk backwards: at step k pick the min-id predecessor with dist k-1
    steps = [(d_target, target)]
    current = target
    for k in range(d_target, 0, -1):
        pred = (
            e.filter(F.col("dst") == current)
            .join(dist.filter(F.col("dist") == k - 1),
                  e["src"] == F.col("node"))
            .agg(F.min("node").alias("p"))
            .first()["p"]
        )
        steps.append((k - 1, int(pred)))
        current = int(pred)
    return dist.sparkSession.createDataFrame(
        sorted(steps), "path_step INT, node LONG"
    )