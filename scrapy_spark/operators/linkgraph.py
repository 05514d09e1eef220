"""Link-graph analytics: PageRank and HITS as iterative DataFrame joins.

Rebuilds the reference's LinkGraphAnalyzer
(``Scraping_project/src/common/link_graph.py``):
- PageRank: damping 0.85, convergence 1e-4, max-normalized
  (link_graph.py:182-247)
- HITS hub/authority: L2-normalized, convergence 1e-4 (link_graph.py:249-313)
- degree stats (link_graph.py:399-431)

Spark-first: each iteration is ``ranks ⋈ edges`` + ``groupBy(dst).sum`` —
partial (map-side) aggregation makes the per-iteration shuffle proportional
to the edge partition count, and the rank table (nodes only) stays small
relative to edges. Dangling-node mass is redistributed uniformly, matching
the uniform-teleport convention. Iteration count is fixed (deterministic
results) rather than convergence-tested when used in oracle-checked paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nodes_of(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """In/out degree per node (A8)."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("out_degree"))
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_degree"))
    return (
        nodes_of(edges)
        .join(out_d, "node", "left")
        .join(in_d, "node", "left")
        .fillna(0, ["out_degree", "in_degree"])
    )


def pagerank(
    edges: DataFrame, iterations: int = 10, damping: float = 0.85
) -> DataFrame:
    """Iterative PageRank; returns (node, rank) max-normalized to [0,1].

    edges: (src, dst) DataFrame. Deterministic for a fixed iteration count.
    """
    nodes = nodes_of(edges).cache()
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # edges with out-degree attached; cached — reused every iteration
    e = edges.join(out_deg, "src").cache()
    # dangling node set is static; compute once
    dangling_nodes = nodes.join(
        out_deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).cache()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        # truncate plan lineage each iteration — without this the logical plan
        # doubles per iteration and Catalyst re-derives the whole history
        # (on a cluster: reliable checkpoint dir instead of localCheckpoint)
        ranks = ranks.localCheckpoint(eager=True)
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        # dangling mass redistributed uniformly — kept as a 1-row broadcast
        # instead of a driver collect, so each iteration is ONE job (the
        # eager localCheckpoint), not two
        dmass = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dmass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .fillna(0.0, ["contrib"])
            .crossJoin(F.broadcast(dmass))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("_dmass") / F.lit(float(n))
                    + F.lit(damping) * F.col("contrib")
                ).alias("rank"),
            )
        )
    dangling_nodes.unpersist()
    # max-normalize (link_graph.py:244-247)
    mx = ranks.agg(F.max("rank")).collect()[0][0]
    out = ranks.select("node", (F.col("rank") / F.lit(mx)).alias("rank"))
    nodes.unpersist()
    e.unpersist()
    return out


def hits(edges: DataFrame, iterations: int = 10) -> DataFrame:
    """HITS hubs/authorities, L2-normalized per iteration (link_graph.py:249-313).

    Returns (node, hub, authority).
    """
    nodes = nodes_of(edges).cache()
    e = edges.cache()
    scores = nodes.select("node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority"))
    for _ in range(iterations):
        scores = scores.localCheckpoint(eager=True)  # truncate iterative lineage
        auth = (
            e.join(scores.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        a_norm = auth.agg(F.sqrt(F.sum(F.col("authority") ** 2))).collect()[0][0] or 1.0
        auth = auth.select("node", (F.col("authority") / F.lit(a_norm)).alias("authority"))
        hub = (
            e.join(auth.select(F.col("node").alias("dst"), "authority"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        h_norm = hub.agg(F.sqrt(F.sum(F.col("hub") ** 2))).collect()[0][0] or 1.0
        hub = hub.select("node", (F.col("hub") / F.lit(h_norm)).alias("hub"))
        scores = (
            nodes.join(hub, "node", "left").join(auth, "node", "left").fillna(
                0.0, ["hub", "authority"]
            )
        )
    nodes.unpersist()
    e.unpersist()
    return scores


def top_by(df: DataFrame, metric: str, k: int, key: str = "node") -> DataFrame:
    """Deterministic top-k by metric (W7, link_graph.py:366-397).

    Two-phase (operators/topk.py): local per-partition limit, then a merge of
    <= k*P rows — never a full-input single-partition sort."""
    from .topk import topk_total_order

    return topk_total_order(df, [F.col(metric).desc(), F.col(key).asc()], k)
