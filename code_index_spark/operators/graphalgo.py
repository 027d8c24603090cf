"""Graph analytics over the materialized KG: degree stats and PageRank.

PageRank as iterative DataFrame joins — same discipline as the
connected-components loop (canon.py): lineage truncated per round with
localCheckpoint, shuffle width sized to the edge count, fixed iteration
budget with an L1-convergence early exit. No GraphFrames dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-vertex total degree over the edges table."""
    ends = edges.select(F.col("src_entity").alias("v")).unionAll(
        edges.select(F.col("dst_entity").alias("v"))
    )
    return ends.groupBy("v").agg(F.count("*").alias("degree"))


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """(vertex, rank) over the undirected co-mention/edge graph.

    Normalized so ranks sum to 1. Deterministic: vertex set and
    contributions are pure aggregations of the input."""
    spark = edges.sparkSession
    und = (
        edges.select(F.col("src_entity").alias("src"), F.col("dst_entity").alias("dst"))
        .union(edges.select(F.col("dst_entity").alias("src"), F.col("src_entity").alias("dst")))
        .localCheckpoint(eager=True)
    )
    n_edges = und.count()
    # size the iteration's shuffles to the edge count PLAN-LOCALLY
    # (round-4 ADVICE: no session-conf mutation — it races concurrent
    # queries on the session): one explicit repartition on src that the
    # degree groupBy, vertex distinct, and link join all reuse
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    loop_parts = max(2, min(session_parts, n_edges // 500_000 + 1))
    und = und.repartition(loop_parts, "src")
    out_deg = und.groupBy("src").agg(F.count("*").alias("deg"))
    vertices = und.select(F.col("src").alias("v")).distinct().localCheckpoint(eager=True)
    n = vertices.count()
    if n == 0:
        return spark.createDataFrame([], "v long, rank double")
    ranks = vertices.withColumn("rank", F.lit(1.0 / n))
    links = und.join(out_deg, "src").localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        # NOTE: no repartition ahead of this groupBy — that would
        # defeat the map-side partial aggregation (|E| raw contribution
        # rows would cross the wire instead of ≤|V| partials per task);
        # AQE coalesces the reduce side when the graph is small
        contribs = (
            links.join(ranks, links.src == ranks.v)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # lazy checkpoint: the delta action below materializes the
        # round AND truncates lineage in the same single job
        new_ranks = (
            vertices.join(contribs, vertices.v == contribs.dst, "left")
            .select(
                "v",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), "v")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))).alias("d"))
            .first()["d"]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks
