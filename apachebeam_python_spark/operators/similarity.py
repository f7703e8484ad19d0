"""Similarity search over embedding columns (SURVEY.md §2.11).

Two tiers:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline, and
  the right plan whenever the query set is small (queries broadcast; the
  corpus never shuffles; per-partition partial top-k via WindowGroupLimit).
- ``lsh_buckets`` / ``lsh_ann_topk``: sign-random-projection LSH — the scale
  path. Hyperplanes are *derived deterministically from xxhash64*, so the
  index is reproducible with no stored model and no driver-side randomness;
  candidates come from bucket collisions across ``n_tables`` hash tables,
  then exact cosine re-ranks. Recall tunes with (n_tables, n_bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..session import fan_out


def cosine_topk(corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str, k: int) -> DataFrame:
    """Exact top-k cosine neighbors (self-matches excluded).

    ``queries`` is broadcast (small side); per query, neighbors rank by
    (sim DESC, id) — a total order, so results are deterministic.
    """
    # norms are per-vector, not per-pair: precompute on each side once
    # (n_q + n_corpus sqrt-folds instead of 2 × n_q × n_corpus)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        V.norm(F.col(vec_col)).alias("qn"),
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        V.norm(F.col(vec_col)).alias("cn"),
    )
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.withColumn(
        "cos_sim", V.safe_cosine_from(V.dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _hyperplane_bit(vec: Column, table: int, bit: int) -> Column:
    """Sign of <v, w> for a pseudo-random hyperplane w whose component i is
    ±1 from xxhash64(table, bit, i) parity — deterministic, no stored model."""
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.transform(
                F.sequence(F.lit(1), F.size(vec)),
                # pmod, not %: Spark's % follows the dividend sign, so
                # (hash % 2)*2-1 would yield {-3,-1,+1} — a biased plane
                lambda i: F.pmod(F.xxhash64(F.lit(table), F.lit(bit), i), F.lit(2)).cast("double") * 2 - 1,
            ),
            lambda x, w: x.cast("double") * w,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (proj >= 0).cast("int")


def lsh_bucket(vec: Column, table: int, n_bits: int) -> Column:
    """n_bits-bit bucket id for one hash table."""
    bucket = F.lit(0)
    for b in range(n_bits):
        bucket = bucket * 2 + _hyperplane_bit(vec, table, b)
    return bucket


def lsh_buckets(df: DataFrame, vec_col: str, id_col: str, *, n_tables: int = 4, n_bits: int = 8) -> DataFrame:
    """Bucket assignment across n_tables hash tables (one row per (id, table))."""
    return fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("vec"),
        V.norm(F.col(vec_col)).alias("nrm"),  # once per vector, reused at re-rank
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), lsh_bucket(F.col(vec_col), t, n_bits).alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("doc_id", "vec", "nrm", "tb.tbl", "tb.bucket")


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str, k: int, *, n_tables: int = 4, n_bits: int = 8) -> DataFrame:
    """Approximate top-k: candidates = bucket collisions in ANY table, then
    exact cosine re-rank. The corpus shuffles on (tbl, bucket) — O(n·tables)
    rows of (id, vec) — instead of the n_q × n_corpus brute-force pairing."""
    cb = lsh_buckets(corpus, vec_col, id_col, n_tables=n_tables, n_bits=n_bits)
    qb = lsh_buckets(queries, vec_col, id_col, n_tables=n_tables, n_bits=n_bits).select(
        F.col("doc_id").alias("query_id"), F.col("vec").alias("qv"),
        F.col("nrm").alias("qn"), "tbl", "bucket",
    )
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            F.col("query_id"), F.col("doc_id").alias("neighbor_id"),
            "qv", F.col("vec").alias("cv"), "qn", F.col("nrm").alias("cn"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sims = cand.withColumn(
        "cos_sim",
        V.safe_cosine_from(V.dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )
