"""Bounded-iteration graph algorithms over edge DataFrames (SURVEY.md §2.9's
batch iterative-algorithm family, next to ``dedup.connected_components``).

PageRank here is the weighted, damped power iteration in its distributed
shape: the edge table stays partitioned (by ``src`` — bucket it at scale so
every iteration's join is exchange-free), the rank vector is a DataFrame
joined against it each round, and ``session.checkpoint`` truncates lineage so
round N never replays rounds 1..N-1 (same discipline as
``connected_components``; localCheckpoint locally, durable parquet
write-through under ``SPARK_GRAFT_DURABLE_CHECKPOINT``). On the fixture graph the rank vector is tiny and
broadcast; at web scale (rank vector ≫ broadcast threshold) drop the
``broadcast`` hints and co-bucket ranks with edges on the node key — the
loop structure is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import checkpoint


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
    damping: float = 0.85,
    iterations: int = 10,
    round_dp: int = 9,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution, fixed iteration
    count. Returns ``(node, r)``.

    Determinism contract (what makes this oracle-replayable): out-edge
    probabilities are exact integer ratios evaluated in double; each
    iteration's rank is rounded to ``round_dp`` decimals — double-sum order
    drift is ~1e-16 relative, so a 1e-9 round makes both engines' per-round
    vectors IDENTICAL, and identical inputs to round N+1 keep them so. The
    teleport term is computed as ``1.0 - damping`` in double on both sides.

    Per iteration: one broadcast join (edges ⋈ ranks) + one partial/final
    agg on ``dst``, one LEFT ANTI for dangling mass (1-row broadcast), one
    rebuild against the node list. ``iterations`` is fixed rather than
    convergence-tested so the oracle can unroll the same count.
    """
    en = checkpoint(
        edges.withColumn(
            "p", F.col(weight) / F.sum(weight).over(Window.partitionBy(src))
        ).select(src, dst, "p")
    )
    srcs = checkpoint(en.select(src).distinct())
    nn = nodes.agg(F.count("*").alias("n"))
    base = checkpoint(nodes.select(node).crossJoin(F.broadcast(nn)))
    teleport = F.lit(1.0) - F.lit(damping)
    ranks = base.select(node, (F.lit(1.0) / F.col("n")).alias("r"))
    for _ in range(iterations):
        contrib = (
            en.join(F.broadcast(ranks), F.col(src) == F.col(node))
            .groupBy(dst)
            .agg(F.sum(F.col("r") * F.col("p")).alias("con"))
        )
        dang = ranks.join(
            srcs, ranks[node] == srcs[src], "left_anti"
        ).agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        ranks = checkpoint(
            base.join(F.broadcast(contrib), F.col(node) == F.col(dst), "left")
            .crossJoin(F.broadcast(dang))
            .select(
                node,
                F.round(
                    teleport / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("con"), F.lit(0.0))
                        + F.col("dm") / F.col("n")
                    ),
                    round_dp,
                ).alias("r"),
            )
        )
    return ranks
