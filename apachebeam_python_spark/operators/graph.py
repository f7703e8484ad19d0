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
from pyspark.sql import types as T

from ..session import checkpoint

#: node-id types the single-task kernels accept: the kernels never do
#: arithmetic on ids (only dictionary-encode them), but the id ordering a
#: kernel relies on (np.unique / Python ``<``) must MATCH Spark's ordering.
#: Integral: trivially identical. String: Python compares code points and
#: Spark compares UTF-8 bytes — equivalent orders, because UTF-8 byte order
#: preserves code-point order. Anything else (decimal, timestamp, binary,
#: struct) falls through to the distributed loop (ADVICE r11 #2).
_KERNEL_ID_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.StringType,
)


def _kernel_ids_ok(df: DataFrame, *cols: str) -> bool:
    by_name = {f.name: f.dataType for f in df.schema.fields}
    return all(isinstance(by_name[c], _KERNEL_ID_TYPES) for c in cols)


def _integral_ids(df: DataFrame, *cols: str) -> bool:
    """Stricter gate for kernels that CAST ids to long (the pagerank /
    dag-depths carriers): integral input only (ADVICE r11 #2)."""
    by_name = {f.name: f.dataType for f in df.schema.fields}
    return all(
        isinstance(by_name[c], _KERNEL_ID_TYPES[:-1]) for c in cols
    )


def _id_type(df: DataFrame, col: str) -> T.DataType:
    return {f.name: f.dataType for f in df.schema.fields}[col]


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
        e_all = pdf[pdf["kind"] == 1]
        # dangling mask from ALL edge srcs (r12, VERDICT r11 #7): the
        # distributed loop derives non-dangling from en.select(src).distinct()
        # BEFORE any dst filtering — a node whose only out-edge points
        # outside the node list is NOT dangling there, so not here either
        dangling = np.ones(n, dtype=bool)
        src_in = e_all.loc[e_all["ksrc"].isin(idx), "ksrc"]
        dangling[src_in.map(idx).to_numpy(dtype="int64")] = False
        e = e_all[e_all["ksrc"].isin(idx) & e_all["kdst"].isin(idx)]
        si = e["ksrc"].map(idx).to_numpy(dtype="int64")
        di = e["kdst"].map(idx).to_numpy(dtype="int64")
        p = e["kp"].to_numpy(dtype="float64")
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
    small_graph_max_edges: int = 1 << 22,
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
    # kernel gate (r12, ADVICE r11 #2/#3): ids must be integral (the kernel
    # casts them to long — strings/decimals fall through to the distributed
    # loop, which handles any type), and BOTH dimensions must be bounded —
    # node count caps the depth vector, edge count caps the one-task Arrow
    # payload (a dense small-node DAG could otherwise funnel ~|V|² edges
    # into a single executor)
    if (
        _integral_ids(e, src, dst)
        and nodes.count() <= small_graph_max_nodes
        and e.count() <= small_graph_max_edges
    ):
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
    # cast node to long for schema parity with the kernel path (ADVICE
    # r11 #2) — the kernel always emits long node ids
    return depth.select(
        F.col("v").cast("long").alias("node"), F.col("d").alias("d")
    )


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


# --------------------------------------------------------------------------
# r12 (VERDICT r11 #1): the remaining bounded-round graph loops, kerneled.
# Same pattern as pagerank/dag_depths above — the heavy, data-sized work
# (the 4-table edge aggregation) stays distributed; iterating a
# metadata-sized node/pair table through scheduler waves was the
# anti-pattern. Every kernel below is INTEGER counting over
# dictionary-encoded ids (no id arithmetic, no doubles), so the fixpoint /
# census is identical to the distributed loop by construction; node ids
# pass through with their input dtype (schema-preserving), gated on types
# whose kernel ordering matches Spark's (_KERNEL_ID_TYPES).
#
# Gate: ONE bounded count of the (distinct, checkpointed) edge list —
# |E| ≤ small_graph_max_edges. Distinct edges imply |V| ≤ 2·|E|, so the
# default gate (2048 edges ⇒ ≤4096 nodes) bounds the kernels' dense n×n
# work matrices at ~134 MB in one Arrow task (ADVICE r11 #3's
# both-dimensions rule, collapsed to one count because the input is
# distinct by construction). Past the gate the distributed loops run
# unchanged: edges bucketed by src at scale, per-round joins exchange-free,
# node-keyed state shuffles with map-side partials.
# --------------------------------------------------------------------------


def _ids_struct(dtype, *fields: str):
    return T.StructType([T.StructField(f, dtype) for f in fields])


def hop_distances(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_d: int = 9,
    small_graph_max_edges: int = 2048,
) -> DataFrame:
    """All-pairs shortest hop distances over the UNDIRECTED graph of a
    DIRECTED distinct edge list (symmetrized internally), bounded at
    ``max_d`` hops, source excluded. Returns ``(src, node, d)`` — one row
    per ordered pair with 1 ≤ d = shortest distance ≤ ``max_d``.

    This is q_closeness_centrality's multi-source BFS (and, at max_d=3,
    exactly q_harmonic_centrality's d1/d2/d3 level sets — BFS level k IS
    the distance-k class). Distributed shape per round: frontier ⋈ edges,
    anti-join visited, checkpoint, empty-probe — ~5 scheduler waves to
    advance a ≤|V|²-row pair table one hop. Small graphs run the whole
    BFS as ONE Arrow task on boolean adjacency matrices: frontier
    expansion is set algebra on exact integers, so visited/(src,node,d)
    is identical by construction (pinned in tests/test_graph_kernels.py).
    """
    e0 = checkpoint(edges.select(src, dst), eager=False)
    if _kernel_ids_ok(e0, src, dst) and e0.count() <= small_graph_max_edges:
        return _hop_distances_small_graph(e0, src=src, dst=dst, max_d=max_d)
    e = (
        e0.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(e0.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .transform(checkpoint, eager=False)
    )
    frontier = e.select(
        F.col("u").alias("src"), F.col("v").alias("node")
    ).withColumn("d", F.lit(1).cast("long"))
    visited = frontier
    for _ in range(max_d - 1):
        nxt = (
            frontier.join(e, frontier.node == e.u)
            .filter(F.col("v") != F.col("src"))
            .select(
                "src", F.col("v").alias("node"), (F.col("d") + 1).alias("d")
            )
            .distinct()
            .join(
                visited.select(
                    F.col("src").alias("vs"), F.col("node").alias("vn")
                ),
                (F.col("src") == F.col("vs")) & (F.col("node") == F.col("vn")),
                "left_anti",
            )
        )
        nxt = checkpoint(nxt)
        if nxt.limit(1).count() == 0:
            break
        visited = checkpoint(visited.unionByName(nxt))
        frontier = nxt
    return visited


def _hop_distances_small_graph(
    e0: DataFrame, *, src: str, dst: str, max_d: int
) -> DataFrame:
    import numpy as np
    import pandas as pd

    cap = int(max_d)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        u = pdf["ku"].to_numpy()
        v = pdf["kv"].to_numpy()
        nodes_a = np.unique(np.concatenate([u, v]))
        idx = {val: i for i, val in enumerate(nodes_a)}
        n = len(nodes_a)
        si = pdf["ku"].map(idx).to_numpy(dtype="int64")
        di = pdf["kv"].map(idx).to_numpy(dtype="int64")
        adj = np.zeros((n, n), dtype=bool)
        adj[si, di] = True
        adj[di, si] = True  # symmetrize (the distributed union ∪ reverse)
        np.fill_diagonal(adj, False)  # no self loops in a distinct src≠dst list
        adj_u8 = adj.astype(np.uint8)
        dist = np.zeros((n, n), dtype="int64")
        dist[adj] = 1
        reached = adj | np.eye(n, dtype=bool)  # v == src never enters visited
        frontier = adj
        for d in range(2, cap + 1):
            nxt = ((frontier.astype(np.uint8) @ adj_u8) > 0) & ~reached
            if not nxt.any():
                break
            dist[nxt] = d
            reached |= nxt
            frontier = nxt
        srcs, nodes = np.nonzero(dist)
        return pd.DataFrame(
            {
                "src": nodes_a[srcs],
                "node": nodes_a[nodes],
                "d": dist[srcs, nodes],
            }
        )

    id_t = _id_type(e0, src)
    schema = T.StructType(
        [
            T.StructField("src", id_t),
            T.StructField("node", id_t),
            T.StructField("d", T.LongType()),
        ]
    )
    ek = e0.select(F.col(src).alias("ku"), F.col(dst).alias("kv"))
    return ek.groupBy(F.lit(1).alias("g")).applyInPandas(kernel, schema=schema)


def closure_census(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
    small_graph_max_edges: int = 2048,
) -> DataFrame:
    """Directed transitive-closure census: per node of ``src ∪ dst``, the
    size of its reachable set (≥1 step) and whether it can reach itself
    (cycle membership). Returns ``(node, n_reachable long, on_cycle bool)``
    — q_cycle_nodes' computation.

    Distributed shape per round: pair-set ⋈ edges, union, distinct,
    checkpoint, count-stall probe. Small graphs run the closure as ONE
    Arrow task on a boolean reachability matrix (reach ∪= reach·adj — the
    same one-edge-extension recurrence, same ``max_rounds`` backstop);
    row sums and the diagonal are the census. Exact set algebra ⇒
    identical fixpoint by construction."""
    e = checkpoint(edges.select(src, dst), eager=False)
    if _kernel_ids_ok(e, src, dst) and e.count() <= small_graph_max_edges:
        return _closure_census_small_graph(
            e, src=src, dst=dst, max_rounds=max_rounds
        )
    paths = e.select(F.col(src).alias("s"), F.col(dst).alias("v"))
    prev = -1
    for _ in range(max_rounds):  # ≤ diameter rounds; |V|² cap keeps each tiny
        ext = paths.join(e, paths.v == F.col(src)).select(
            "s", F.col(dst).alias("v")
        )
        paths = checkpoint(paths.union(ext).distinct())
        cur = paths.count()
        if cur == prev:
            break
        prev = cur
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst)))
        .distinct()
    )
    reach = paths.groupBy("s").agg(F.count("*").alias("cnt"))
    cyc = paths.filter(F.col("s") == F.col("v")).select("s").distinct()
    return (
        nodes.join(reach, nodes.node == reach.s, "left")
        .drop("s")
        .join(
            cyc.withColumn("on_cycle", F.lit(True)),
            nodes.node == cyc.s,
            "left",
        )
        .select(
            "node",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_reachable"),
            F.coalesce(F.col("on_cycle"), F.lit(False)).alias("on_cycle"),
        )
    )


def _closure_census_small_graph(
    e: DataFrame, *, src: str, dst: str, max_rounds: int
) -> DataFrame:
    import numpy as np
    import pandas as pd

    rounds = int(max_rounds)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        u = pdf["ku"].to_numpy()
        v = pdf["kv"].to_numpy()
        nodes_a = np.unique(np.concatenate([u, v]))
        idx = {val: i for i, val in enumerate(nodes_a)}
        n = len(nodes_a)
        si = pdf["ku"].map(idx).to_numpy(dtype="int64")
        di = pdf["kv"].map(idx).to_numpy(dtype="int64")
        adj = np.zeros((n, n), dtype=bool)
        adj[si, di] = True
        adj_u8 = adj.astype(np.uint8)
        reach = adj.copy()
        for _ in range(rounds):
            nxt = reach | ((reach.astype(np.uint8) @ adj_u8) > 0)
            if (nxt == reach).all():
                break
            reach = nxt
        return pd.DataFrame(
            {
                "node": nodes_a,
                "n_reachable": reach.sum(axis=1).astype("int64"),
                "on_cycle": reach.diagonal().copy(),
            }
        )

    id_t = _id_type(e, src)
    schema = T.StructType(
        [
            T.StructField("node", id_t),
            T.StructField("n_reachable", T.LongType()),
            T.StructField("on_cycle", T.BooleanType()),
        ]
    )
    ek = e.select(F.col(src).alias("ku"), F.col(dst).alias("kv"))
    return ek.groupBy(F.lit(1).alias("g")).applyInPandas(kernel, schema=schema)


def kcore_census(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    rounds: int = 3,
    small_graph_max_edges: int = 2048,
) -> DataFrame:
    """Bounded k-core peel over the UNDIRECTED graph of a DIRECTED
    distinct edge list (symmetrized + deduped internally): ``rounds``
    unrolled peels of degree-< k nodes, returning the final survivors
    ``(node, core_degree long)`` — q_kcore's computation.

    Distributed shape per round: two semi-join filters against the
    survivor set + one degree groupBy. Small graphs peel inside ONE Arrow
    task with bincount degrees — integer counting over the identical
    edge/survivor sets, so every round's degree table matches the
    distributed one exactly."""
    e0 = checkpoint(edges.select(src, dst), eager=False)
    if _kernel_ids_ok(e0, src, dst) and e0.count() <= small_graph_max_edges:
        return _kcore_census_small_graph(
            e0, src=src, dst=dst, k=k, rounds=rounds
        )
    e = (
        e0.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(e0.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .transform(checkpoint, eager=False)
    )
    surv = None
    deg = None
    for _ in range(rounds):
        cur = e
        if surv is not None:
            cur = e.join(
                F.broadcast(surv), e.u == surv.node, "left_semi"
            ).join(
                F.broadcast(surv.select(F.col("node").alias("vn"))),
                F.col("v") == F.col("vn"),
                "left_semi",
            )
        deg = cur.groupBy("u").agg(F.count("*").alias("deg"))
        surv = deg.filter(F.col("deg") >= k).select(F.col("u").alias("node"))
    return deg.filter(F.col("deg") >= k).select(
        F.col("u").alias("node"), F.col("deg").cast("long").alias("core_degree")
    )


def _kcore_census_small_graph(
    e0: DataFrame, *, src: str, dst: str, k: int, rounds: int
) -> DataFrame:
    import numpy as np
    import pandas as pd

    kk, rr = int(k), int(rounds)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        u = pdf["ku"].to_numpy()
        v = pdf["kv"].to_numpy()
        nodes_a = np.unique(np.concatenate([u, v]))
        idx = {val: i for i, val in enumerate(nodes_a)}
        n = len(nodes_a)
        si0 = pdf["ku"].map(idx).to_numpy(dtype="int64")
        di0 = pdf["kv"].map(idx).to_numpy(dtype="int64")
        # symmetrize + dedupe (the distributed union ∪ reverse + distinct)
        pair = np.unique(
            np.concatenate(
                [si0 * n + di0, di0 * n + si0]
            )
        )
        su, sv = pair // n, pair % n
        alive = np.ones(n, dtype=bool)
        deg = np.zeros(n, dtype="int64")
        for _ in range(rr):
            m = alive[su] & alive[sv]
            deg = np.bincount(su[m], minlength=n).astype("int64")
            alive = deg >= kk
        keep = deg >= kk
        return pd.DataFrame(
            {"node": nodes_a[keep], "core_degree": deg[keep]}
        )

    id_t = _id_type(e0, src)
    schema = T.StructType(
        [
            T.StructField("node", id_t),
            T.StructField("core_degree", T.LongType()),
        ]
    )
    ek = e0.select(F.col(src).alias("ku"), F.col(dst).alias("kv"))
    return ek.groupBy(F.lit(1).alias("g")).applyInPandas(kernel, schema=schema)


def lpa_labels(
    edges: DataFrame,
    *,
    src: str = "u",
    dst: str = "v",
    rounds: int = 3,
    small_graph_max_edges: int = 2048,
) -> DataFrame:
    """Synchronous label propagation over the UNDIRECTED graph of an
    ORIENTED (u < v) distinct edge list: every node starts as its own
    label; each round it adopts the most frequent label among its
    neighbors, ties toward the SMALLEST label. Returns ``(node, label)``
    — q_communities_lpa's loop.

    Distributed shape per round: und ⋈ labels, (node,label) count,
    row_number argmax, checkpoint. Small graphs run all rounds inside ONE
    Arrow task: labels dictionary-encode to indices of the SORTED node
    array, so "smallest label" is "smallest index" and np.argmax's
    first-max-wins IS the tie-break; counting is exact integer scatter.
    String ids are safe here: the kernel orders via np.unique (code-point
    order) and Spark orders UTF-8 bytes — identical orders, since UTF-8
    byte order preserves code points."""
    e0 = checkpoint(edges.select(src, dst), eager=False)
    if _kernel_ids_ok(e0, src, dst) and e0.count() <= small_graph_max_edges:
        return _lpa_labels_small_graph(e0, src=src, dst=dst, rounds=rounds)
    und = (
        e0.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            e0.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .transform(checkpoint)
    )
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    wl = Window.partitionBy("node").orderBy(F.col("cnt").desc(), "label")
    for _ in range(rounds):
        cnt = (
            und.join(
                labels.select(F.col("node").alias("v"), F.col("label")), "v"
            )
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(wl))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .transform(checkpoint)
        )
    return labels


def _lpa_labels_small_graph(
    e0: DataFrame, *, src: str, dst: str, rounds: int
) -> DataFrame:
    import numpy as np
    import pandas as pd

    rr = int(rounds)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        u = pdf["ku"].to_numpy()
        v = pdf["kv"].to_numpy()
        nodes_a = np.unique(np.concatenate([u, v]))
        idx = {val: i for i, val in enumerate(nodes_a)}
        n = len(nodes_a)
        si = pdf["ku"].map(idx).to_numpy(dtype="int64")
        di = pdf["kv"].map(idx).to_numpy(dtype="int64")
        # und = oriented ∪ reversed (u < v ⇒ no dupes to dedupe)
        su = np.concatenate([si, di])
        sv = np.concatenate([di, si])
        lab = np.arange(n, dtype="int64")
        for _ in range(rr):
            cnt = np.zeros((n, n), dtype="int64")
            np.add.at(cnt, (su, lab[sv]), 1)
            # first max = smallest label index = smallest label (sorted ids)
            lab = cnt.argmax(axis=1)
        return pd.DataFrame({"node": nodes_a, "label": nodes_a[lab]})

    id_t = _id_type(e0, src)
    schema = _ids_struct(id_t, "node", "label")
    ek = e0.select(F.col(src).alias("ku"), F.col(dst).alias("kv"))
    return ek.groupBy(F.lit(1).alias("g")).applyInPandas(kernel, schema=schema)
