"""Semantics tests for operators.curation (decontamination, repetition
metrics, mixture resampling) on tiny inline frames — oracle parity at the
fixture sfs is covered by test_oracle_parity (q_decontaminate,
q_repetition_filter, q_mixture_resample)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_split_assign_bands_and_widths(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = C.split_assign(df, "doc_id", [("train", 80), ("val", 10), ("test", 10)])
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"train": 160, "val": 20, "test": 20}
    one = {r.doc_id: r.split for r in out.collect()}
    assert one[0] == "train" and one[79] == "train" and one[80] == "val" and one[90] == "test" and one[199] == "test"


def test_split_assign_rejects_bad_widths(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    try:
        C.split_assign(df, "doc_id", [("train", 80), ("val", 10)])
    except ValueError as e:
        assert "sum to modulus" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_scrub_pii_redacts_and_counts(spark):
    from apachebeam_python_spark.functions import text as T

    df = spark.createDataFrame(
        [(1, "mail me at jo.an_1@ex-ample.org or +44-20-7946-0958 thanks"),
         (2, "no pii here")],
        "doc_id long, text string",
    )
    counts = T.pii_counts(F.col("text"))
    out = {r.doc_id: r for r in df.select(
        "doc_id", counts["email"].alias("ne"), counts["phone"].alias("np"),
        T.scrub_pii(F.col("text")).alias("s")).collect()}
    assert (out[1].ne, out[1].np) == (1, 1)
    assert out[1].s == "mail me at <EMAIL> or <PHONE> thanks"
    assert (out[2].ne, out[2].np, out[2].s) == (0, 0, "no pii here")


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token appears in >=1 chunk; consecutive chunks overlap by
    chunk_tokens - stride; short docs yield exactly one full-doc chunk."""
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b")],
        "doc_id long, text string",
    )
    out = C.chunk_documents(df, "text", "doc_id", chunk_tokens=4, stride=3)
    rows = sorted(
        ((r.doc_id, r.chunk_start, r.chunk_len, r.chunk_text) for r in out.collect())
    )
    doc1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in doc1] == [1, 4, 7, 10]
    assert doc1[0][3] == "t0 t1 t2 t3" and doc1[1][3] == "t3 t4 t5 t6"
    assert doc1[-1] == (1, 10, 1, "t9")
    assert [r for r in rows if r[0] == 2] == [(2, 1, 2, "a b")]

    import pytest

    with pytest.raises(ValueError, match="stride"):
        C.chunk_documents(df, "text", "doc_id", chunk_tokens=4, stride=5)


def test_deterministic_shuffle_reproducible_and_seed_sensitive(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = [r.doc_id for r in C.deterministic_shuffle(df, "doc_id", seed=1).collect()]
    b = [r.doc_id for r in C.deterministic_shuffle(df, "doc_id", seed=1).collect()]
    c = [r.doc_id for r in C.deterministic_shuffle(df, "doc_id", seed=2).collect()]
    assert a == b                      # same seed -> same order
    assert a != c                      # new seed -> new permutation
    assert a != sorted(a)              # actually shuffled
    assert sorted(a) == list(range(50))


def test_split_assign_group_disjoint(spark):
    """Splitting on a GROUP id (not the row id) keeps every row of a group
    in one split — the url/source-disjoint holdout pattern."""
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(70)], "doc_id long, group_id long"
    )
    out = C.split_assign(df, "group_id", [("train", 80), ("val", 10), ("test", 10)])
    per_group = out.groupBy("group_id").agg(F.count_distinct("split").alias("k")).collect()
    assert all(r.k == 1 for r in per_group)


def test_check_constraints_counts_and_plan(spark):
    """Null rows violate; uniqueness counts repeats; the whole report is
    ONE aggregate pass (a single pair of exchanges, no per-check scans)."""
    from apachebeam_python_spark.operators.quality import check_constraints
    from apachebeam_python_spark.plans import inspect as P

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (2, -1.0), (3, 2.0)], "id long, v double"
    )
    out = check_constraints(
        df, {"v_not_null": F.col("v").isNotNull(), "v_positive": F.col("v") > 0},
        unique=["id"],
    )
    got = {r.check_name: (r.violations, r.passed) for r in out.collect()}
    assert got == {
        "v_not_null": (1, 0),
        "v_positive": (2, 0),   # the NULL row violates > 0 too
        "id_unique": (1, 0),
    }
    plan = P.executed_plan(out)
    assert plan.count("Scan ") <= 2, plan  # one logical scan (+reused)
