"""Graph analytics over DataFrame edge lists (engine extension — the
reference processes one record at a time and has no whole-collection
operators, SURVEY.md §2.6).

PageRank here is the canonical iterative-dataflow shape: the driver loops,
the DATA never leaves the cluster — each iteration is one edge⋈rank join,
one dst-keyed aggregate, and one node-left-join, all hash-partitioned on
the node id so the iteration reuses a single partitioning. Only two O(1)
scalars (dangling mass, iteration count) touch the driver, the same
contract as operators/similarity.kmeans_assign.

Scale: state per iteration is |nodes| ranks + |edges| contributions; both
shuffle on node id. Persist + localCheckpoint every iteration truncates
the lineage so the plan stays O(1) deep instead of O(iterations). At real
scale the edge list is the big side — pre-partition it by src once and
every iteration's join is exchange-free on that side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Standard damped PageRank with dangling-mass redistribution.

    Returns (id, rank) with Σrank = 1 (up to float associativity — rank
    sums are parallel float adds, so exact determinism is NOT claimed;
    tests check against a numpy reference to 1e-9, and the contract query
    rounds to 6 decimals).
    """
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    ).persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    e = edges.select(F.col(src).alias("id"), F.col(dst).alias("dst")).persist()
    for _ in range(n_iter):
        with_deg = ranks.join(out_deg, "id", "left")
        # dangling mass: ranks of nodes with no out-edges, redistributed
        # uniformly — one O(1) scalar to the driver per iteration
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            e.join(with_deg.filter(F.col("deg").isNotNull()), "id")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # truncate lineage each iteration
        )
    return ranks
