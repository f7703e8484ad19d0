"""Properties of the token-budget shard-packing operators and per-key
sampling (operators.packing). The window (boundary-split) variant is
oracle-checked via q_corpus_pack; these tests pin the semantic guarantees
the SQL hash can't express.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from apachebeam_python_spark.functions import text as T
from apachebeam_python_spark.operators import packing as P
from apachebeam_python_spark.session import table

BUDGET = 2000


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("tokens")
    )


def test_greedy_packing_never_overflows(spark, sf_dir):
    d = _docs(spark, sf_dir)
    packed = P.pack_shards_greedy(d, "tokens", "doc_id", budget=BUDGET).collect()
    # every input doc appears exactly once
    assert sorted(r.doc_id for r in packed) == sorted(r.doc_id for r in d.collect())
    fills = Counter()
    singles_over = 0
    for r in packed:
        fills[r.shard_id] += r.tokens
    shard_docs = Counter(r.shard_id for r in packed)
    for r in packed:
        if r.tokens > BUDGET:
            assert shard_docs[r.shard_id] == 1, "over-budget doc must sit alone"
            singles_over += 1
    for sid, tot in fills.items():
        if shard_docs[sid] > 1:
            assert tot <= BUDGET, f"shard {sid} overflows: {tot}"
    # at least one multi-doc shard exists at this budget (sanity: packing did pack)
    assert any(n > 1 for n in shard_docs.values())


def test_window_packing_bounded_overflow(spark, sf_dir):
    """Boundary-split shards may overflow, but only by less than one document
    (the straddling doc's tokens)."""
    d = _docs(spark, sf_dir)
    packed = P.pack_shards_window(d, "tokens", "doc_id", budget=BUDGET)
    fills = packed.groupBy("shard_id").agg(
        F.sum("tokens").alias("tot"), F.max("tokens").alias("mx")
    )
    bad = fills.filter(F.col("tot") >= F.lit(BUDGET) + F.col("mx")).count()
    assert bad == 0
    # shards are contiguous in doc order within each pack group
    rows = packed.orderBy("pack_group", "doc_id").collect()
    last = {}
    for r in rows:
        prev = last.get(r.pack_group)
        assert prev is None or r.shard_id >= prev, "shard ids must be monotone in doc order"
        last[r.pack_group] = r.shard_id


def test_sample_fixed_per_key(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    sampled = P.sample_fixed_per_key(e, ["event_type"], 10)
    counts = {r.event_type: r.n for r in
              sampled.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    totals = {r.event_type: r.n for r in
              e.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(totals)
    for k, n in counts.items():
        assert n == min(10, totals[k]), (k, n, totals[k])


def test_greedy_packing_matches_python_model(spark):
    """Property: the distributed greedy packer equals a sequential Python
    reference on randomized token lists (hypothesis)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        tokens=st.lists(st.integers(min_value=1, max_value=900), min_size=1, max_size=60),
        budget=st.integers(min_value=100, max_value=1500),
    )
    def check(tokens, budget):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(tokens)], "doc_id long, tokens long"
        )
        got = {
            r.doc_id: r.shard_id
            for r in P.pack_shards_greedy(
                df, "tokens", "doc_id", budget=budget, group_expr=F.lit(0)
            ).collect()
        }
        shard, fill, want = 0, 0, {}
        for i, t in enumerate(tokens):
            if fill and fill + t > budget:
                shard, fill = shard + 1, 0
            want[i] = shard
            fill += t
        assert got == want

    check()
