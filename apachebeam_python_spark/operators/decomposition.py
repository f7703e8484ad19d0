"""Distributed PCA for embedding columns (SURVEY §2.11 north-star:
embedding dimensionality reduction before clustering / dedup / ANN).

Algorithm — the classic two-pass moment method, which is exactly one
shuffle of METADATA-sized partials:

1. per Arrow batch (``mapInPandas``), accumulate the batch count, the
   per-dimension sum vector, and the flattened Gram matrix ``Vᵀ·V``
   (dim² doubles) — numpy does the heavy lifting batch-side;
2. merge partials with a (position → sum) aggregation — the shuffle
   carries ``#batches × (dim² + dim)`` rows, independent of row count;
3. the driver eigendecomposes the 64×64 covariance (bounded metadata —
   same category as k-means centroid sums, see ALLOWED_COLLECTS) and
   broadcasts the top-k components back as column literals;
4. projection is a narrow ``aggregate(zip_with(...))`` dot product per
   component — pure codegen, zero Python, zero shuffle.

Determinism: eigenvectors are sign-fixed (largest-|coefficient| entry
made positive) and numpy's ``eigh`` is deterministic, so repeated runs on
the same partitioning agree bit-for-bit; across different partitionings
the float partial sums drift at ~1e-12, which is why PCA queries register
rows-only with tolerance-based pytest proofs (orthonormality, explained
variance ≡ eigenvalues, full-numpy replay) instead of a DuckDB hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def moment_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Stage 1+2: (n, mean vector, covariance matrix) as a dim²+dim+1-row
    table of (kind, pos, val) sums — the mergeable sufficient statistics
    of PCA."""
    import numpy as np
    import pandas as pd

    def batch_moments(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            yield pd.DataFrame(
                {
                    "n": [float(len(V))],
                    "sums": [V.sum(axis=0).tolist()],
                    "gram": [(V.T @ V).ravel().tolist()],
                }
            )

    parts = df.select(vec_col).mapInPandas(
        batch_moments, "n double, sums array<double>, gram array<double>"
    )
    # one (kind, pos)-keyed merge: #batches × (dim² + dim + 1) rows in,
    # dim² + dim + 1 rows out — data-size independent
    stacked = parts.select(
        F.explode(
            F.concat(
                F.array(F.struct(F.lit("n").alias("kind"), F.lit(0).alias("pos"), F.col("n").alias("val"))),
                F.transform(
                    F.col("sums"),
                    lambda v, i: F.struct(F.lit("sum").alias("kind"), i.alias("pos"), v.alias("val")),
                ),
                F.transform(
                    F.col("gram"),
                    lambda v, i: F.struct(F.lit("gram").alias("kind"), i.alias("pos"), v.alias("val")),
                ),
            )
        ).alias("s")
    ).select("s.kind", "s.pos", "s.val")
    return stacked.groupBy("kind", "pos").agg(F.sum("val").alias("val"))


def pca_model(df: DataFrame, vec_col: str, dim: int, k: int):
    """Fit: returns (mean: list, components: list[list], explained: list).

    The driver-side collection is BOUNDED: dim² + dim + 1 scalar rows
    (4,161 for dim=64) — eigensolve on a 64×64 matrix, the same
    metadata-scale pattern as k-means centroids (ALLOWED_COLLECTS).
    """
    import numpy as np

    rows = moment_partials(df, vec_col, dim).collect()
    n = 0.0
    sums = np.zeros(dim)
    gram = np.zeros((dim, dim))
    for r in rows:
        if r.kind == "n":
            n = r.val
        elif r.kind == "sum":
            sums[r.pos] = r.val
        else:
            gram[r.pos // dim, r.pos % dim] = r.val
    if n < 2:
        raise ValueError(f"PCA needs >= 2 vectors, got {int(n)}")
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for j in order:
        v = evecs[:, j]
        # sign fix: the largest-magnitude coefficient is made positive
        v = v * np.sign(v[int(np.argmax(np.abs(v)))] or 1.0)
        comps.append(v.tolist())
    return mean.tolist(), comps, [float(evals[j]) for j in order]


def project(df: DataFrame, vec_col: str, mean: list, components: list) -> DataFrame:
    """Stage 4: centered dot product against each literal component —
    narrow, codegen, zero shuffle. Appends ``p0..p{k-1}`` columns."""

    def dot(vec: Column, comp: list, mu: list) -> Column:
        centered = F.zip_with(
            vec,
            F.array(*[F.lit(float(m)) for m in mu]),
            lambda a, b: a.cast("double") - b,
        )
        return F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in comp]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    out = df
    for i, comp in enumerate(components):
        out = out.withColumn(f"p{i}", dot(F.col(vec_col), comp, mean))
    return out
