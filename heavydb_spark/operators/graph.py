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


def weighted_shortest_path(
    edges: DataFrame,
    source: int,
    target: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    max_iters: int = 50,
) -> DataFrame:
    """Single-source weighted shortest path source→target (Dijkstra
    analogue of graph_shortest_path_impl, GraphTableFunctions.hpp:519).

    Distributed Bellman-Ford with frontier pruning: each round relaxes
    only edges out of nodes whose distance improved last round (one
    join + union + min-aggregate). Converges in <= hop-diameter rounds
    on non-negative weights; `max_iters` bounds pathological chains.
    The state carries (dist, pred, hops) so path reconstruction needs
    exactly one driver action to read the target's hop count, then
    builds the pred-pointer walk as `hops` lazy joins — no per-hop
    driver round-trip. Returns (path_step, node), 1-based like the
    reference.

    Iteration state is localCheckpoint'ed every round (blocks freed by
    the ContextCleaner as superseded rounds are garbage-collected);
    the convergence probe batches every round on the already-
    materialized checkpoint, so each round is one relax job.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    ).localCheckpoint(eager=False)
    spark = edges.sparkSession

    dist = spark.createDataFrame(
        [(source, 0.0, None, 0)],
        "node LONG, dist DOUBLE, pred LONG, hops INT",
    ).localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_iters):
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
                F.col("src").alias("pred"),
                (F.col("hops") + 1).alias("hops"),
            )
        )
        # Tie-break lexicographically on (dist, hops, pred): among
        # equal-cost paths the fewest-hop one wins, so a node's stored
        # hops always equals its stored pred's hops + 1 at fixpoint —
        # the invariant the fixed-length pred walk below relies on.
        merged = (
            dist.select("node", "dist", "pred", "hops")
            .unionByName(cand)
            .groupBy("node")
            .agg(F.min(F.struct("dist", "hops", "pred")).alias("m"))
            .select(
                "node",
                F.col("m.dist").alias("dist"),
                F.col("m.pred").alias("pred"),
                F.col("m.hops").alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
        # Any tuple change re-enters the frontier (not only a strict
        # dist decrease): an equal-dist/fewer-hops or smaller-pred win
        # must be re-relaxed so dependents refresh their hop counts.
        improved = (
            merged.alias("n")
            .join(dist.alias("o"), "node", "left")
            .filter(
                F.col("o.dist").isNull()
                | (F.col("n.dist") != F.col("o.dist"))
                | (F.col("n.hops") != F.col("o.hops"))
                | ~F.col("n.pred").eqNullSafe(F.col("o.pred"))
            )
            .select(
                "node",
                F.col("n.dist").alias("dist"),
                F.col("n.pred").alias("pred"),
                F.col("n.hops").alias("hops"),
            )
        )
        dist = merged
        frontier = improved
        if improved.isEmpty():
            break
        # re-anchor the frontier on the checkpointed merged state so
        # next round's lineage starts from a materialized plan
        frontier = improved.localCheckpoint(eager=True)

    t = dist.filter(F.col("node") == target).first()
    if t is None:
        return spark.createDataFrame([], "path_step INT, node LONG")
    n_hops = t["hops"]
    # pred-pointer walk in plan space: `n_hops` lazy joins against the
    # checkpointed dist, one final collect by the caller
    cur = dist.filter(F.col("node") == target)
    steps = [cur.select(F.lit(n_hops + 1).alias("path_step"), "node")]
    for k in range(n_hops, 0, -1):
        cur = dist.join(cur.select(F.col("pred").alias("node")), "node")
        steps.append(cur.select(F.lit(k).alias("path_step"), "node"))
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out.orderBy("path_step")
