"""k-means + semantic dedup (operators/clustering.py) — objective-level
checks a SQL oracle can't express (SURVEY §5.2 rows-only policy):

1. exact recovery of well-separated synthetic blobs (purity 1.0);
2. agreement with a NumPy Lloyd reference replayed from the SAME seeds on
   the real embeddings fixture;
3. the Lloyd objective (inertia) must not increase with more iterations;
4. semantic_dedup drops injected exact duplicates, keeps the smallest id,
   and its within-cluster pair generation loses nothing the brute-force
   anchor finds inside the same cluster.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from apachebeam_python_spark.operators import clustering as CL
from apachebeam_python_spark.session import table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


def test_blob_recovery_exact(spark):
    # 3 tight blobs far apart: k-means MUST partition them perfectly
    rng = np.random.default_rng(7)
    rows = []
    for b, center in enumerate([0.0, 50.0, -50.0]):
        for i in range(40):
            v = (rng.normal(center, 0.5, 8)).tolist()
            rows.append((b * 100 + i, [float(x) for x in v], b))
    df = spark.createDataFrame(rows, "id long, vec array<float>, blob int")
    cents = CL.kmeans_centroids(df, "vec", "id", 3, n_iter=5)
    a = CL.assign_clusters(df, cents, "vec", "id").join(df.select("id", "blob"), "id")
    # every blob maps to exactly one cluster and vice versa
    m = a.groupBy("blob").agg(F.countDistinct("cluster").alias("k")).collect()
    assert all(r["k"] == 1 for r in m)
    assert a.select("cluster").distinct().count() == 3


def test_matches_numpy_reference(spark, emb):
    pdf = emb.select("vec_id", "embedding").toPandas()
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    k, n_iter = 10, 4

    # replay the SAME deterministic seeding (smallest xxhash64(vec_id))
    seed_ids = [
        r["vec_id"]
        for r in emb.select("vec_id", F.xxhash64("vec_id").alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    ]
    c = np.stack([X[np.where(ids == s)[0][0]] for s in seed_ids])
    for _ in range(n_iter):
        d = ((X[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        lab = d.argmin(1)
        for j in range(k):
            if (lab == j).any():
                c[j] = X[lab == j].mean(0)

    cents = CL.kmeans_centroids(emb, "embedding", "vec_id", k, n_iter=n_iter, tol=0.0)
    a = CL.assign_clusters(emb, cents, "embedding", "vec_id").toPandas()
    spark_lab = dict(zip(a["vec_id"], a["cluster"]))
    agree = np.mean([spark_lab[i] == l for i, l in zip(ids, lab)])
    # identical seeds + identical update rule; only float partial-sum order
    # differs → boundary points may flip, nothing else
    assert agree >= 0.95, f"agreement with NumPy Lloyd replay only {agree:.3f}"


def test_inertia_monotone(spark, emb):
    def inertia(n_iter):
        s = CL.kmeans_summary(emb, "embedding", "vec_id", 10, n_iter=n_iter)
        return s.agg(F.sum("inertia")).first()[0]

    i1, i6 = inertia(1), inertia(6)
    assert i6 <= i1 + 1e-9, f"Lloyd objective increased: {i1} -> {i6}"


def test_semantic_dedup_drops_injected_duplicates(spark, emb):
    base = emb.select("vec_id", "embedding")
    # clone 10 vectors under ids shifted past the max: exact duplicates
    clones = (
        base.filter(F.col("vec_id") % 50 == 0)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    n_clones = clones.count()
    df = base.unionByName(clones)
    out = CL.semantic_dedup(df, "embedding", "vec_id", k=10, threshold=0.999, n_iter=3)
    dropped = {r["vec_id"] for r in out.filter(~F.col("keep")).collect()}
    expect = {r["vec_id"] for r in clones.collect()}
    # every clone has an identical twin with a smaller id in the SAME
    # cluster (identical vectors can't land in different cells) → dropped
    assert expect <= dropped
    # and nothing outside near-dup groups was dropped at τ=0.999
    assert len(dropped) == n_clones
    # originals all kept
    kept = {r["vec_id"] for r in out.filter(F.col("keep")).collect()}
    assert {r["vec_id"] for r in base.collect()} <= kept


def test_within_cluster_pairs_vs_brute_force(spark, emb):
    """Clustering only PARTITIONS pair generation — inside one cluster it
    must find exactly the pairs brute force finds there."""
    from apachebeam_python_spark.operators import dedup as D

    cents = CL.kmeans_centroids(emb, "embedding", "vec_id", 10, n_iter=3)
    a = CL.assign_clusters(emb, cents, "embedding", "vec_id")
    brute = D.embedding_neardup_pairs(emb, "embedding", "vec_id", threshold=0.35)
    lab = {r["vec_id"]: r["cluster"] for r in a.collect()}
    same_cluster_brute = {
        (r["id_a"], r["id_b"])
        for r in brute.collect()
        if lab[r["id_a"]] == lab[r["id_b"]]
    }
    sem = CL.semantic_dedup(emb, "embedding", "vec_id", k=10, threshold=0.35, n_iter=3)
    sem_dropped = {r["vec_id"] for r in sem.filter(~F.col("keep")).collect()}
    # every same-cluster brute pair's larger id must be dropped
    assert {b for (_, b) in same_cluster_brute} <= sem_dropped


# ---------------------------------------------------------------------------
# PCA (operators/decomposition.py)
# ---------------------------------------------------------------------------

def test_pca_matches_full_numpy(spark, sf_dir):
    """Distributed moment-partials PCA ≡ single-shot numpy PCA (allclose:
    float partial sums may drift ~1e-12 across batchings)."""
    import numpy as np
    from apachebeam_python_spark.operators import decomposition as DC
    from apachebeam_python_spark.session import table

    emb = table(spark, sf_dir, "embeddings")
    mean, comps, evals = DC.pca_model(emb, "embedding", dim=64, k=4)

    V = np.stack([r.embedding for r in emb.select("embedding").collect()]).astype(
        "float64"
    )
    mu = V.mean(axis=0)
    cov = (V.T @ V) / len(V) - np.outer(mu, mu)
    ev_np, evec_np = np.linalg.eigh(cov)
    order = np.argsort(ev_np)[::-1][:4]

    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(evals, ev_np[order], atol=1e-9)
    for c, j in zip(comps, order):
        v = evec_np[:, j]
        v = v * np.sign(v[int(np.argmax(np.abs(v)))] or 1.0)
        assert np.allclose(c, v, atol=1e-6)


def test_pca_components_orthonormal_and_variance(spark, sf_dir):
    """Components are orthonormal; the variance of each projected
    coordinate equals its eigenvalue (the definition of PCA)."""
    import numpy as np
    from apachebeam_python_spark.operators import decomposition as DC
    from apachebeam_python_spark.session import table
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    mean, comps, evals = DC.pca_model(emb, "embedding", dim=64, k=3)
    C = np.array(comps)
    assert np.allclose(C @ C.T, np.eye(3), atol=1e-9)
    assert evals[0] >= evals[1] >= evals[2] > 0

    proj = DC.project(emb.select("embedding"), "embedding", mean, comps)
    got = proj.agg(
        *[F.var_pop(f"p{i}").alias(f"v{i}") for i in range(3)]
    ).collect()[0]
    for i in range(3):
        assert abs(got[f"v{i}"] - evals[i]) < 1e-6 * max(1.0, evals[i])


def test_pca_projection_plan_is_narrow(spark, sf_dir):
    """After the fit, the projection itself must be a zero-exchange
    codegen pipeline — no Python, no shuffle."""
    from apachebeam_python_spark.operators import decomposition as DC
    from apachebeam_python_spark.plans import inspect as P
    from apachebeam_python_spark.session import table

    emb = table(spark, sf_dir, "embeddings")
    mean, comps, _ = DC.pca_model(emb, "embedding", dim=64, k=2)
    proj = DC.project(emb.select("vec_id", "embedding"), "embedding", mean, comps)
    assert P.count_exchanges(proj) == 0, P.executed_plan(proj)


def test_pca_raises_on_tiny_input(spark):
    from apachebeam_python_spark.operators import decomposition as DC
    import pytest as _pt

    one = spark.createDataFrame(
        [(1, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    with _pt.raises(ValueError, match="needs >= 2"):
        DC.pca_model(one, "embedding", dim=64, k=2)


def test_kcenter_matches_numpy_replay(spark, sf_dir):
    """Greedy k-center must agree EXACTLY with a NumPy replay (same seed
    rule, same tie-break), its covering radius must be non-increasing
    after the seed row, and every vector must lie within the final radius
    of some selected center (the 2-approximation's cover property)."""
    import numpy as np

    from apachebeam_python_spark.operators.clustering import kcenter_select
    from apachebeam_python_spark.session import table

    e = table(spark, sf_dir, "embeddings")
    k = 8
    picks = kcenter_select(e, "embedding", "vec_id", k=k)

    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([[float(x) for x in r.embedding] for r in rows])
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]

    sel = [0]  # smallest id
    dmin = ((vecs - vecs[0]) ** 2).sum(axis=1)
    expect = [(int(ids[0]), 0.0)]
    for _ in range(1, k):
        far = int(np.lexsort((ids, -dmin))[0])
        expect.append((int(ids[far]), float(dmin[far])))
        sel.append(far)
        dmin = np.minimum(dmin, ((vecs - vecs[far]) ** 2).sum(axis=1))

    assert [p for p, _ in picks] == [p for p, _ in expect], (picks, expect)
    for (_, got), (_, want) in zip(picks[1:], expect[1:]):
        assert abs(got - want) <= 1e-6 * max(1.0, want)
    radii = [d for _, d in picks[1:]]
    assert all(a >= b - 1e-9 for a, b in zip(radii, radii[1:])), radii
    assert dmin.max() <= picks[-1][1] + 1e-9  # cover property
