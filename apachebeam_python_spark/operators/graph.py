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
    small_graph_max_nodes: int = 65536,
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

    r11 (VERDICT r10 #5): the sf0.1 cost (~3.9 s) was ~10× fixed
    per-round scheduler/broadcast overhead, not data — the AGGREGATED
    graph is metadata-sized (|nations|² ≤ 625 weighted edges, 25-entry
    rank vector). Two levers were same-session A/B'd: checkpointing
    every 3 rounds instead of every round measured ≈ 1.02× (the eager
    jobs were not the cost; a 3-deep lazy plan pays it back in planning
    + nested broadcasts), and is NOT kept. What IS kept: when the node
    count is bounded (``small_graph_max_nodes``), the whole recurrence
    runs as ONE Arrow task (``applyInPandas`` numpy kernel, identical
    per-round half-away 9-dp rounding) — the heavy, data-sized work
    (the edge aggregation) stays distributed, and iterating a
    metadata-sized vector through 10 scheduler waves was the
    anti-pattern. At web scale (nodes ≫ threshold) the distributed
    loop below runs unchanged: bucket edges by ``src``, co-bucket the
    rank table, exchange-free rounds.
    """
    en = edges.withColumn(
        "p", F.col(weight) / F.sum(weight).over(Window.partitionBy(src))
    ).select(src, dst, "p")
    # small-graph kernel (r11): the aggregated (src, dst, p) table and the
    # rank vector are metadata-sized here — one bounded .count() picks the
    # path (the same bounded-metadata class as the k-means centroid
    # collects in tests/test_antipatterns.py's ledger)
    n_nodes = nodes.count()
    if n_nodes <= small_graph_max_nodes:
        # no checkpoint on this path (r11b): the kernel consumes `en`
        # exactly once, so the eager parquet write+read that cuts lineage
        # for the ITERATING path below is pure overhead here
        return _pagerank_small_graph(
            en, nodes, src=src, dst=dst, node=node,
            damping=damping, iterations=iterations, round_dp=round_dp,
        )
    en = checkpoint(en)
    srcs = checkpoint(en.select(src).distinct())
    nn = nodes.agg(F.count("*").alias("n"))
    base = checkpoint(nodes.select(node).crossJoin(F.broadcast(nn)))
    teleport = F.lit(1.0) - F.lit(damping)
    ranks = base.select(node, (F.lit(1.0) / F.col("n")).alias("r"))
    for i in range(iterations):
        contrib = (
            en.join(F.broadcast(ranks), F.col(src) == F.col(node))
            .groupBy(dst)
            .agg(F.sum(F.col("r") * F.col("p")).alias("con"))
        )
        dang = ranks.join(
            srcs, ranks[node] == srcs[src], "left_anti"
        ).agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        ranks = (
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
        ranks = checkpoint(ranks)
    return ranks


def _pagerank_small_graph(
    en: DataFrame,
    nodes: DataFrame,
    *,
    src: str,
    dst: str,
    node: str,
    damping: float,
    iterations: int,
    round_dp: int,
) -> DataFrame:
    """The metadata-sized fast path: the full power iteration inside ONE
    Arrow task. Arithmetic contract mirrors the distributed loop exactly —
    out-edge probabilities arrive precomputed in ``en``; each round is
    teleport/n + d·(Σ r·p per dst + dangling_mass/n), rounded HALF-AWAY to
    ``round_dp`` decimals (``floor(x·10^k + 0.5)`` — ranks are positive —
    the same decision F.round and DuckDB's round make away from the
    ~1-ulp half-boundary class, and the per-round 1e-9 round swallows
    numpy-vs-SQL sum-order drift exactly as it swallows Spark-vs-DuckDB
    drift in the distributed path). Edges whose endpoints are not in the
    node list are ignored, matching the distributed joins' semantics."""
    import numpy as np
    import pandas as pd

    damping_f, iters, dp = float(damping), int(iterations), int(round_dp)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes_a = np.sort(
            pdf.loc[pdf["kind"] == 0, "ksrc"].to_numpy(dtype="int64")
        )
        idx = {int(v): i for i, v in enumerate(nodes_a)}
        n = len(nodes_a)
        e = pdf[pdf["kind"] == 1]
        keep = e["ksrc"].isin(idx) & e["kdst"].isin(idx)
        e = e[keep]
        si = e["ksrc"].map(idx).to_numpy(dtype="int64")
        di = e["kdst"].map(idx).to_numpy(dtype="int64")
        p = e["kp"].to_numpy(dtype="float64")
        dangling = np.ones(n, dtype=bool)
        dangling[si] = False
        scale = 10.0 ** dp
        teleport = 1.0 - damping_f
        r = np.full(n, 1.0 / n)
        for _ in range(iters):
            con = np.zeros(n)
            np.add.at(con, di, r[si] * p)
            dm = float(r[dangling].sum())
            r = (
                np.floor(
                    (teleport / n + damping_f * (con + dm / n)) * scale + 0.5
                )
                / scale
            )
        return pd.DataFrame({"node": nodes_a, "r": r})

    tagged = nodes.select(
        F.col(node).cast("long").alias("ksrc"),
        F.lit(None).cast("long").alias("kdst"),
        F.lit(0.0).alias("kp"),
        F.lit(0).alias("kind"),
    ).unionByName(
        en.select(
            F.col(src).cast("long").alias("ksrc"),
            F.col(dst).cast("long").alias("kdst"),
            F.col("p").cast("double").alias("kp"),
            F.lit(1).alias("kind"),
        )
    )
    out = tagged.groupBy(F.lit(1).alias("g")).applyInPandas(
        kernel, schema=f"{node} long, r double"
    )
    return out


def dag_depths(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
    small_graph_max_nodes: int = 65536,
) -> DataFrame:
    """Longest-path (topological-layer) depth per node of a DAG — the
    distributed Bellman-Ford specialization q_dag_layers runs: depth
    relaxes d(v) ← max(d(v), d(u)+1) over incoming edges until a
    fixpoint, capped at ``max_rounds``. Returns ``(node, d)``. Nodes are
    src ∪ dst of the edge list.

    r11 (the q_pagerank kernel pattern): when the node count is bounded
    (``small_graph_max_nodes``, one bounded count decides) the whole
    fixpoint runs inside ONE Arrow task — each distributed round costs a
    broadcast join + union + max-groupBy + eager checkpoint + a Σd
    convergence action, ~10 scheduler waves to advance a ≤|V|-row table.
    The relaxation is integer and order-free, so both paths reach the
    IDENTICAL fixpoint by construction (pinned in
    tests/test_dag_layers_paths.py). Past the threshold the distributed
    loop runs unchanged: bucket edges by ``src`` at scale and the
    per-round join is exchange-free; depth tables shuffle on the node
    key with map-side max partials."""
    e = checkpoint(edges.select(src, dst), eager=False)
    nodes = (
        e.select(F.col(src).alias("v")).union(e.select(F.col(dst))).distinct()
    )
    if nodes.count() <= small_graph_max_nodes:
        return _dag_depth_small_graph(
            e, nodes, src=src, dst=dst, node="v", max_rounds=max_rounds
        )
    depth = nodes.select("v", F.lit(0).cast("long").alias("d"))
    prev = -1
    # terminates in ≤ diameter ≤ |V| rounds on a DAG; the cap is a backstop
    for _ in range(max_rounds):
        nd = e.join(F.broadcast(depth), F.col(src) == depth.v).select(
            F.col(dst).alias("v"), (F.col("d") + 1).alias("d")
        )
        depth = checkpoint(
            depth.union(nd).groupBy("v").agg(F.max("d").alias("d"))
        )
        cur = depth.agg(F.sum("d")).first()[0]
        if cur == prev:
            break
        prev = cur
    return depth.select(F.col("v").alias("node"), F.col("d").alias("d"))


def _dag_depth_small_graph(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_rounds: int = 64,
) -> DataFrame:
    """Longest-path (topological-layer) depth per node for a
    METADATA-SIZED DAG, computed inside ONE Arrow task — the r11
    q_pagerank kernel pattern applied to q_dag_layers' relaxation loop
    (each distributed round there was a broadcast join + union +
    max-groupBy + eager checkpoint + a Σd convergence action, all to
    advance a ≤|V|-row table one hop). Arithmetic contract mirrors the
    distributed loop exactly: simultaneous relaxation
    d(v) ← max(d(v), d(u)+1) over incoming edges until a fixpoint, capped
    at ``max_rounds`` (the loop's backstop) — integers, order-free, so
    the fixpoint is identical by construction. Edges whose endpoints are
    not in the node list are ignored, matching the join semantics."""
    import numpy as np
    import pandas as pd

    rounds = int(max_rounds)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes_a = np.sort(
            pdf.loc[pdf["kind"] == 0, "ksrc"].to_numpy(dtype="int64")
        )
        idx = {int(v): i for i, v in enumerate(nodes_a)}
        e = pdf[pdf["kind"] == 1]
        keep = e["ksrc"].isin(idx) & e["kdst"].isin(idx)
        e = e[keep]
        si = e["ksrc"].map(idx).to_numpy(dtype="int64")
        di = e["kdst"].map(idx).to_numpy(dtype="int64")
        d = np.zeros(len(nodes_a), dtype="int64")
        for _ in range(rounds):
            nd = d.copy()
            np.maximum.at(nd, di, d[si] + 1)
            if (nd == d).all():
                break
            d = nd
        return pd.DataFrame({"node": nodes_a, "d": d})

    tagged = nodes.select(
        F.col(node).cast("long").alias("ksrc"),
        F.lit(None).cast("long").alias("kdst"),
        F.lit(0).alias("kind"),
    ).unionByName(
        edges.select(
            F.col(src).cast("long").alias("ksrc"),
            F.col(dst).cast("long").alias("kdst"),
            F.lit(1).alias("kind"),
        )
    )
    return tagged.groupBy(F.lit(1).alias("g")).applyInPandas(
        kernel, schema="node long, d long"
    )
