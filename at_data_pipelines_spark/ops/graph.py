"""Distributed PageRank by power iteration over an edge DataFrame.

The companion of the dedup pipeline's connected components
(llmops/dedup.py: min-label + large/small-star contraction) for rank-
style graph analytics — e.g. scoring documents by citation/link
structure when curating a corpus, the original use of the algorithm
(Page et al. 1999).

Plan shape per iteration: one join (edges ⋈ ranks on src — a uniform
shuffle on node id), one groupBy(dst) sum, one tiny dangling-mass
aggregate broadcast back. Lineage is cut with ``localCheckpoint`` every
few iterations — without it the query plan doubles per iteration and
the driver dies planning iteration ~15 long before any executor works
(the standard iterative-DataFrame trap, same one the connected-
components loop handles).

Convention: ranks sum to N (the node count), i.e. the uniform rank is
1.0; damping d redistributes (1-d) uniformly plus the dangling-node
mass, so total mass is conserved every iteration (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1.0e-6,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Node ranks for a directed edge list. Returns (id, rank) with
    ranks summing to the node count. Stops at ``max_iter`` or when the
    mean absolute rank change drops below ``tol``. Duplicate edges act
    as parallel edges (they weight the transition)."""
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(1.0))
    out_deg = edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # static per-node structure: out-degree (0 for dangling nodes)
    base = nodes.join(out_deg, "id", "left").fillna({"out_deg": 0}).localCheckpoint()
    ranks = base.select("id", "out_deg", F.lit(1.0).alias("rank"))

    ed = edges.select(F.col(src).alias("id"), F.col(dst).alias("_dst"))
    for it in range(max_iter):
        contrib = (
            ed.join(ranks.filter(F.col("out_deg") > 0), "id")
            .select(
                F.col("_dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        dangling = (
            ranks.filter(F.col("out_deg") == 0).agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        uniform = (1.0 - damping) + damping * dangling / n
        new_ranks = (
            base.join(contrib, "id", "left")
            .select(
                "id",
                "out_deg",
                (
                    F.lit(uniform)
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            new_ranks = new_ranks.localCheckpoint()
            delta = (
                new_ranks.join(
                    ranks.select("id", F.col("rank").alias("_prev")), "id"
                )
                .agg(F.avg(F.abs(F.col("rank") - F.col("_prev"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks.select("id", "rank")
