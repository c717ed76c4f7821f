"""Graph analytics over DataFrame edge lists (engine extension — the
reference processes one record at a time and has no whole-collection
operators, SURVEY.md §2.6).

PageRank here is the canonical iterative-dataflow shape: the driver loops,
the DATA never leaves the cluster — each iteration is one edge⋈rank join,
one dst-keyed aggregate, and one node-left-join, all hash-partitioned on
the node id so the iteration reuses a single partitioning. The dangling
mass is a 1-row in-plan aggregate broadcast onto the rank update — the
only O(1) scalar that ever touches the driver is the node count, once,
before the loop.

Scale: state per iteration is |nodes| ranks + |edges| contributions; both
shuffle on node id. Persist + localCheckpoint every iteration truncates
the lineage so the plan stays O(1) deep instead of O(iterations). At real
scale the edge list is the big side — pre-partition it by src once and
every iteration's join is exchange-free on that side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udlang_spark.session import persist_tracked


# fixed-point rank unit: 1e-15. Ranks sum to ~1, so per-rank magnitude is
# ≤ SCALE and the damped inflow product stays < 100·SCALE « 2^63.
SCALE = 10**15


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Standard damped PageRank with dangling-mass redistribution.

    Rank arithmetic is fixed-point int64 in 1e-15 units: contributions are
    floor divisions (rank div out_deg), damping is integer percent
    arithmetic, and all sums are exact integer adds — the result is
    BIT-DETERMINISTIC under any partitioning, accumulation order, or
    replay (and therefore DuckDB-oracle-checkable via an unrolled CTE
    chain), unlike a float power iteration whose parallel adds drift.
    Quantization costs ≤ ~in_deg·n_iter units of 1e-15 per rank — far
    inside the 1e-9 agreement the numpy pytest asserts. Σrank falls short
    of 1 by the total floor loss (~1e-12), not by float error.

    Returns (id, rank double = fp/1e15).
    """
    if not (0 < damping < 1):
        raise ValueError("damping must be in (0, 1)")
    dnum = int(round(damping * 100))  # damping as integer percent
    if not (0 < dnum < 100) or abs(dnum - damping * 100) > 1e-9:
        # the fixed-point iteration runs damping as an integer percent;
        # refuse values it cannot represent rather than silently computing
        # a different algorithm (0.857 → 0.86) or a degenerate one
        # (0.004 → pure teleport, 0.999 → no teleport mass)
        raise ValueError(
            f"damping={damping} is not an exact integer percent in (0, 1); "
            "use a two-decimal damping (e.g. 0.85)"
        )
    # tracked persists: released by session.release_caches() between
    # queries (sweep drivers call it); raw .persist() would leak JVM-side
    nodes = persist_tracked(
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:  # empty graph → empty ranks (not a ZeroDivisionError)
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = persist_tracked(
        edges.groupBy(F.col(src).alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
    )
    base = (100 - dnum) * SCALE // (100 * n)
    ranks = nodes.withColumn("r", F.lit(SCALE // n).cast("long"))
    e = persist_tracked(
        edges.select(F.col(src).alias("id"), F.col(dst).alias("dst"))
    )
    for _ in range(n_iter):
        with_deg = ranks.join(out_deg, "id", "left")
        # dangling mass: ranks of nodes with no out-edges, redistributed
        # uniformly. Kept IN-PLAN as a 1-row aggregate broadcast onto the
        # rank update (`dang_share` = dangling div n, identical to the
        # former driver-side `dangling // n` for non-negative fixed-point
        # ranks) so each iteration is ONE action (the eager checkpoint)
        # instead of two — no per-iteration driver round-trip / cluster
        # barrier beyond the checkpoint itself.
        dang_share = with_deg.filter(F.col("deg").isNull()).agg(
            F.expr(
                f"coalesce(sum(r), CAST(0 AS BIGINT)) div {n}"
            ).alias("dang_share")
        )
        contribs = (
            e.join(with_deg.filter(F.col("deg").isNotNull()), "id")
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .crossJoin(F.broadcast(dang_share))  # 1 row, always present
            .select(
                "id",
                F.expr(
                    f"CAST({base} AS BIGINT) + (CAST({dnum} AS BIGINT) * "
                    f"(coalesce(inflow, CAST(0 AS BIGINT)) + dang_share)) "
                    f"div 100"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)  # truncate lineage each iteration
        )
    return ranks.select(
        "id", (F.col("r").cast("double") / F.lit(float(SCALE))).alias("rank")
    )
