"""Distributed PageRank by power iteration over an edge DataFrame.

The companion of the dedup pipeline's connected components
(llmops/dedup.py: min-label + large/small-star contraction) for rank-
style graph analytics — e.g. scoring documents by citation/link
structure when curating a corpus, the original use of the algorithm
(Page et al. 1999).

Plan shape per iteration: ONE job — the eager ``localCheckpoint`` of
the new ranks — containing one join (edges ⋈ ranks on src, a uniform
shuffle on node id), one groupBy(dst) sum, and the dangling-mass
aggregate folded into the same plan as a broadcast 1-row cross join
(never a driver collect: the r6 verdict flagged that a per-iteration
``collect()`` re-executed up to 3 iterations of un-checkpointed
lineage between every-4th checkpoints). Checkpointing every iteration
both cuts lineage (without it the plan doubles per iteration and the
driver dies planning iteration ~15 — the standard iterative-DataFrame
trap) and makes the previous ranks a cached scan for the two branches
(contribution + dangling) that read it. Convergence is checked every
``check_every`` iterations as one cheap extra job over two cached
frames.

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
    check_every: int = 4,
) -> DataFrame:
    """Node ranks for a directed edge list. Returns (id, rank) with
    ranks summing to the node count. Stops at ``max_iter`` or when the
    mean absolute rank change drops below ``tol`` (checked every
    ``check_every`` iterations). Duplicate edges act as parallel edges
    (they weight the transition)."""
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
        # dangling mass stays IN the plan: a 1-row aggregate broadcast-
        # cross-joined onto every node, so the whole iteration executes
        # as the single checkpoint job below (no driver collect, no
        # partial lineage re-execution). `ranks` is itself checkpointed,
        # so the two branches reading it are cached scans.
        dang = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        new_ranks = (
            base.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                "out_deg",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.col("_dang") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()  # the iteration's one job; cuts lineage
        )
        if (it + 1) % check_every == 0 or it == max_iter - 1:
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
