"""Property-based tests (hypothesis — SURVEY §5.2.3) for the round-6
operators whose correctness arguments are algebraic identities: the
floored-balance closed form, the greedy packing invariants, and the
crypto-shred unlinkability contract. Each is checked against an
independent naive model on random inputs, not against the oracle SQL
(the oracle replays the same algebra; these replay the DEFINITION)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)

# signed cent deltas, including runs of debits that slam into the floor
deltas = st.lists(
    st.integers(min_value=-500, max_value=500), min_size=1, max_size=40
)


@settings(max_examples=12, deadline=None)
@given(deltas=deltas)
def test_floored_balance_closed_form_matches_simulation(spark, deltas):
    """b_i = s_i − min(0, min_{j≤i} s_j) must equal the naive sequential
    clamp b_i = max(0, b_{i−1} + δ_i) on ANY delta sequence — the identity
    q_floored_running_balance rests on."""
    rows = [
        (1, i, BASE + dt.timedelta(seconds=i), int(d)) for i, d in enumerate(deltas)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, delta_c long"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s1 = df.select("event_id", F.sum("delta_c").over(w).alias("cum"), "ts", "user_id")
    got = {
        r.event_id: r.bal
        for r in s1.select(
            "event_id",
            (
                F.col("cum")
                - F.least(
                    F.lit(0).cast("long"),
                    F.min("cum").over(
                        Window.partitionBy("user_id")
                        .orderBy("ts", "event_id")
                        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                    ),
                )
            ).alias("bal"),
        ).collect()
    }
    b = 0
    for i, d in enumerate(deltas):
        b = max(0, b + d)
        assert got[i] == b, f"step {i}: closed form {got[i]} != simulated {b}"


tok_sizes = st.lists(
    st.one_of(
        st.integers(min_value=1, max_value=200),
        st.integers(min_value=450, max_value=600),  # near/over the 512 cap
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(sizes=tok_sizes)
def test_sequence_pack_invariants(spark, sizes):
    """Greedy packing invariants on random size mixes: (1) no bin exceeds
    the cap unless it holds exactly one oversized doc; (2) bins are dense
    (0..max, no gaps); (3) greedy tightness — a bin never closes early:
    the first doc of bin k+1 would NOT have fit in bin k; (4) every doc
    is packed exactly once."""
    import pandas as pd

    CAP = 512
    rows = [(0, i, int(s)) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "shard long, doc_id long, n_tok long")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        out = []
        bin_idx, fill = 0, 0
        first = True
        for doc_id, n_tok in zip(pdf["doc_id"], pdf["n_tok"]):
            if not first and fill + n_tok > CAP:
                bin_idx += 1
                fill = 0
            first = False
            fill += n_tok
            out.append((0, bin_idx, int(doc_id), int(n_tok)))
        return pd.DataFrame(out, columns=["shard", "bin_idx", "doc_id", "n_tok"])

    packed = sorted(
        df.groupBy("shard")
        .applyInPandas(pack, "shard long, bin_idx long, doc_id long, n_tok long")
        .collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.doc_id for r in packed] == list(range(len(sizes)))  # (4)
    by_bin: dict[int, list] = {}
    for r in packed:
        by_bin.setdefault(r.bin_idx, []).append(r)
    assert sorted(by_bin) == list(range(len(by_bin)))  # (2)
    for b in sorted(by_bin):
        tot = sum(r.n_tok for r in by_bin[b])
        if tot > CAP:
            assert len(by_bin[b]) == 1, f"bin {b} overflows with {len(by_bin[b])} docs"
        if b + 1 in by_bin:  # (3)
            nxt = min(by_bin[b + 1], key=lambda r: r.doc_id)
            assert tot + nxt.n_tok > CAP, f"bin {b} closed early"


@settings(max_examples=8, deadline=None)
@given(mod=st.integers(min_value=2, max_value=11))
def test_crypto_shred_unlinkability_contract(spark, mod):
    """For any forget-set (custkey % mod = 0): forgotten users token to
    NULL, retained users' tokens are unique per (salt, name), and no
    retained token collides with another user's — the unlinkability
    contract behind q_crypto_shred, independent of the fixture."""
    rows = [(k, f"name-{k % 7}") for k in range(1, 60)]
    c = spark.createDataFrame(rows, "custkey long, name string")
    reg = c.filter(F.col("custkey") % mod != 0).select(
        F.col("custkey").alias("k"),
        F.md5(F.concat(F.lit("k:"), F.col("custkey").cast("string"))).alias("salt"),
    )
    tok = c.join(reg, c.custkey == reg.k, "left").select(
        "custkey",
        F.when(
            F.col("salt").isNotNull(),
            F.md5(F.concat(F.col("salt"), F.lit(":"), F.col("name"))),
        ).alias("token"),
    )
    out = tok.collect()
    forgotten = {r.custkey for r in out if r.token is None}
    assert forgotten == {k for k, _ in rows if k % mod == 0}
    toks = [r.token for r in out if r.token is not None]
    # per-user salts make tokens unique even when NAMES collide (name-k%7)
    assert len(set(toks)) == len(toks), "token collision across users"
