"""Semantics tests for operators.curation (decontamination, repetition
metrics, mixture resampling) on tiny inline frames — oracle parity at the
fixture sfs is covered by test_oracle_parity (q_decontaminate,
q_repetition_filter, q_mixture_resample)."""

from __future__ import annotations

from apachebeam_python_spark.operators import curation as C


def test_contamination_flags_exact_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # shares 'alpha beta gamma' + 'beta gamma delta'
            (2, "epsilon zeta eta theta"),      # disjoint
            (3, "beta gamma delta epsilon"),    # shares 'beta gamma delta'
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n_shared_grams
        for r in C.contamination_flags(corpus, bench, "text", "doc_id", n=3).collect()
    }
    assert got == {1: 2, 3: 2}  # doc 2 clean -> absent


def test_contamination_short_docs_never_flag(spark):
    corpus = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "alpha beta gamma")], "doc_id long, text string")
    assert C.contamination_flags(corpus, bench, "text", "doc_id", n=3).count() == 0


def test_repetition_metrics_known_fractions(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # bigrams: ab ba ab ba ab -> total 5, distinct 2, top 3
            (2, "x y z w"),      # 3 distinct bigrams, no repeats
            (3, "solo"),         # too short for a bigram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in C.repetition_metrics(df, "text", "doc_id", n=2).collect()}
    assert (got[1].total_grams, got[1].distinct_grams) == (5, 2)
    assert got[1].dup_frac == 0.6 and got[1].top_frac == 0.6
    assert (got[2].total_grams, got[2].dup_frac, got[2].top_frac) == (3, 0.0, round(1 / 3, 6))
    assert (got[3].total_grams, got[3].dup_frac, got[3].top_frac) == (0, 0.0, 0.0)


def test_mixture_flags_exact_cutoffs(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b") for i in range(20)], "doc_id long, src string"
    )
    out = C.mixture_flags(df, "src", "doc_id", {"a": 0.5}, modulus=10)
    kept = sorted(r.doc_id for r in out.filter("keep = 1").collect())
    # 'a' (ids 0..9): keep id % 10 < 5 -> 0..4; 'b' absent from rates -> all kept
    assert kept == [0, 1, 2, 3, 4] + list(range(10, 20))


def test_mixture_resample_filters(spark):
    df = spark.createDataFrame([(i, "a") for i in range(10)], "doc_id long, src string")
    out = C.mixture_resample(df, "src", "doc_id", {"a": 0.3}, modulus=10)
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 2]
    assert "keep" not in out.columns
