"""Keyword retrieval: BM25 scoring over the documents table (SURVEY.md
§2.11 — the lexical complement to embedding similarity search; real corpus
tooling needs both for hybrid retrieval and decontamination-by-query).

Plan shape (and the 100 TB story):

- tokens explode once; TWO hash-aggregations keyed on doc id (per-doc
  length, per-doc-term tf) — both partial-aggregated map-side, both hash on
  the SAME key so the tf⋈dl join adds no third exchange.
- query terms are a literal ``isin`` filter (no join), so tf only
  materializes rows for the ≤ |query| terms that matter.
- per-term document frequencies are ≤ |query| rows → broadcast.
- corpus constants (N, avgdl) ride a 1-row broadcast cross join.
- ranking rounds the score FIRST (6 dp) and tie-breaks on doc id: a total
  order that two engines computing at double precision agree on.

At 100 TB you'd materialize the tokenize+tf step once as an inverted-index
table (doc_id, term, tf, dl) bucketed by term — the scoring join then
prunes to the query's term buckets; this operator IS that scoring kernel
applied to an inline index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str,
    id_col: str,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k docs by BM25 (Robertson/Sparck-Jones idf variant:
    ln(1 + (N - df + 0.5)/(df + 0.5)), the Lucene formula)."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    dl = toks.groupBy("doc").agg(F.count("*").alias("dl"))
    consts = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(list(query_terms)))
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc").cast("double").alias("df"))
    scored = (
        tf.join(dl, "doc")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "idf", F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    per_doc = scored.groupBy("doc").agg(F.round(F.sum("contrib"), 6).alias("score"))
    # TakeOrderedAndProject (per-partition top-k + merge), THEN rank the k
    # survivors — the window sees k rows, never the corpus
    topk = per_doc.orderBy(F.col("score").desc(), F.col("doc")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc"))
    return topk.select(
        F.col("doc").alias(id_col),
        "score",
        F.row_number().over(w).alias("rank"),
    )
