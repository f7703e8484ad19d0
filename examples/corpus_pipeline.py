#!/usr/bin/env python
"""Example 3 — LLM training-corpus pipeline: dedup (exact + MinHash-LSH),
quality filtering, and embedding similarity search over the documents /
embeddings tables.

Run: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from apachebeam_python_spark.functions import text as T
from apachebeam_python_spark.operators import dedup as D
from apachebeam_python_spark.operators import similarity as SIM
from apachebeam_python_spark.session import get_spark, table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")

    exact = D.exact_dedup_groups(docs, "text", "doc_id")
    print("exact-dup groups with >1 copy:", exact.filter(F.col("n_copies") > 1).count())

    near = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.2)
    print("near-dup candidate pairs (MinHash-LSH, jaccard ≥ 0.2):", near.count())

    quality = docs.select(
        "doc_id", "lang", F.round(T.quality_score(F.col("text")), 4).alias("q")
    )
    kept = quality.filter(F.col("q") >= 0.72)
    print(f"quality filter keeps {kept.count()}/{docs.count()} docs")

    # substring-level signal doc-dedup can't see: boilerplate spans
    from apachebeam_python_spark.operators.curation import repeated_passages

    passages = repeated_passages(docs, "text", "doc_id", n=8, stride=4)
    print("cross-document repeated passages:", passages.count())

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    topk = SIM.cosine_topk(emb, queries, "embedding", "vec_id", k=3)
    print("nearest neighbors for sample queries:")
    topk.orderBy("query_id", "rank").show(9, truncate=False)

    # at corpus scale, swap brute force for an index: IVF cells (or LSH)
    ann = SIM.ivf_ann_topk(emb, queries, "embedding", "vec_id", k=3,
                           n_centroids=8, n_probe=3)
    print("same search via the IVF index (approximate):", ann.count(), "rows")

    # curation passes (operators.curation): scrub PII, drop repetitive docs,
    # remove benchmark contamination, reweight the domain mixture, split
    from apachebeam_python_spark.operators import curation as CU

    scrubbed = docs.withColumn("text", T.scrub_pii(F.col("text")))
    rep = CU.repetition_metrics(scrubbed, "text", "doc_id")
    low_rep = rep.filter((F.col("dup_frac") <= 0.05) & (F.col("top_frac") <= 0.10))
    print(f"repetition filter keeps {low_rep.count()}/{docs.count()} docs")

    bench = scrubbed.filter(F.pmod(F.col("doc_id"), F.lit(50)) == 0)
    corpus = scrubbed.filter(F.pmod(F.col("doc_id"), F.lit(50)) != 0)
    contam = CU.contamination_flags(corpus, bench, "text", "doc_id", n=3)
    clean = corpus.join(contam.select("doc_id"), "doc_id", "left_anti")
    print(f"decontamination keeps {clean.count()}/{corpus.count()} docs")

    rates = {f"src{i}": (100 - 4 * i) / 100.0 for i in range(20)}
    mixed = CU.mixture_resample(clean, "source", "doc_id", rates, modulus=100)
    final = CU.split_assign(mixed, "doc_id", [("train", 80), ("val", 10), ("test", 10)])
    final.groupBy("split").agg(F.count("*").alias("docs")).orderBy("split").show()

    # final step of a training-data pipeline: pack kept docs into
    # ~2000-token shards (window variant; see operators.packing for the
    # exact greedy form)
    from apachebeam_python_spark.operators import packing as PK

    toks = final.filter(F.col("split") == "train").select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("tokens")
    )
    shards = PK.pack_shards_window(toks, "tokens", "doc_id", budget=2000)
    stats = shards.groupBy("shard_id").agg(
        F.count("*").alias("docs"), F.sum("tokens").alias("tokens")
    )
    print("packed shards:", stats.count(), "— avg tokens/shard:",
          int(stats.agg(F.avg("tokens")).first()[0]))

    # the NEXT crawl arrives: dedupe it against this snapshot, not just
    # against itself (anti-join on content hash; at scale: bucketed
    # snapshot + runtime bloom — operators.dedup.incremental_new_rows)
    batch = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 18 == 0, F.concat(F.lit("v2 "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    fresh = D.incremental_new_rows(batch, docs, "text")
    print(f"incremental ingest: {fresh.count()}/{batch.count()} docs are new")

    # semantic dedup (SemDeDup shape): k-means cells, near-dup pairs only
    # within a cell — O(sum cell^2), not O(n^2)
    from apachebeam_python_spark.operators import clustering as CL

    sem = CL.semantic_dedup(emb, "embedding", "vec_id", k=8, threshold=0.35, n_iter=4)
    print("semantic dedup drops", sem.filter(~F.col("keep")).count(), "embeddings")

    # lexical retrieval next to the vector index: BM25 over the corpus
    from apachebeam_python_spark.operators.retrieval import bm25_topk

    hits = bm25_topk(docs, ["hash", "join", "scan"], "text", "doc_id", k=5)
    print("BM25 top-5 for query 'hash join scan':")
    hits.show(5, truncate=False)

    # rank the ingest batch by how much UNSEEN content it adds, then draw a
    # quality-weighted subsample of the corpus (deterministic, hash-seeded)
    from apachebeam_python_spark.operators.aggregations import weighted_sample
    from apachebeam_python_spark.operators.curation import novelty_scores

    nov = novelty_scores(
        docs.filter(F.col("doc_id") % 4 == 0),
        docs.filter(F.col("doc_id") % 4 != 0),
        "text",
        "doc_id",
    )
    print("ingest-batch novelty (top 3 most novel):")
    nov.orderBy(F.col("novelty").desc(), "doc_id").show(3)

    weighted = weighted_sample(
        docs.withColumn("q", T.quality_score(F.col("text"))), "q", "doc_id", 10
    )
    print("quality-weighted subsample:", weighted.count(), "docs")

    # dedup pipeline TAIL: clusters -> canonical survivor per cluster ->
    # the deduplicated corpus (filter kept)
    from apachebeam_python_spark.queries import QUERIES

    canon = QUERIES["q_dedup_canonical"](spark, sf_dir)
    # one action for both numbers — the LSH+components tail is the most
    # expensive stage here, don't materialize it twice
    totals = canon.agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
    ).collect()[0]
    print(f"canonical selection keeps {totals.n_kept}/{totals.n_total} docs")

    # tokenizer: learn 5 BPE merges on the word census, encode the corpus
    enc = QUERIES["q_bpe_apply"](spark, sf_dir)
    enc.agg(
        F.sum("n_tokens").alias("corpus_subwords"),
        F.round(F.avg("tokens_per_word"), 3).alias("avg_tokens_per_word"),
    ).show()

    # two-tier retrieval: binary sign codes prefilter (8 B/vector, integer
    # Hamming ranking), exact cosine re-ranks only the survivors — the
    # production split when the float vectors no longer fit the fast tier
    cand = SIM.binary_hamming_topk(emb, queries, "embedding", "vec_id",
                                   k=20, dim=64)
    survivors = emb.join(
        cand.select(F.col("neighbor_id").alias("vec_id")).distinct(), "vec_id"
    )
    rerank = SIM.cosine_topk(survivors, queries, "embedding", "vec_id", k=3)
    print("two-tier retrieval (binary top-20 -> exact top-3):",
          rerank.count(), "rows")

    # passage-level REWRITE: drop every repeated 8-token passage at all but
    # its first corpus occurrence, keep the per-doc survival stats
    rewrite = QUERIES["q_passage_dedup_rewrite"](spark, sf_dir)
    rewrite.agg(
        F.sum("n_chunks").alias("passages"),
        F.sum("n_kept").alias("kept"),
    ).show()

    # model-based quality banding (linear log-odds classifier) feeding the
    # mixture: band shares before temperature rebalancing
    bands = QUERIES["q_quality_classifier"](spark, sf_dir)
    bands.groupBy("quality_band").agg(F.count("*").alias("docs")).orderBy(
        "quality_band"
    ).show()
    mix = QUERIES["q_temperature_mix"](spark, sf_dir)
    print("temperature-rebalanced source census (T=2):", mix.count(), "sources")


if __name__ == "__main__":
    main()
