"""Property-based checks (hypothesis) for the round-4 statistical tests.

Strategy: the driver's correctness chain is Spark ≡ DuckDB-oracle (hash
parity, tests/test_oracle_parity.py). These tests close the OTHER half:
DuckDB-oracle ≡ an independent pure-Python reference implementation on
randomized small datasets (ties and degenerate groups included). Running
the oracle SQL against a registered pandas frame needs no Spark job per
example, so hypothesis can afford real case counts. Together the two
halves give Spark ≡ textbook-formula by transitivity.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from apachebeam_python_spark import queries as q

# 2-dp positive values like the fixture; narrow range forces tie collisions
values = st.lists(
    st.integers(min_value=1, max_value=400).map(lambda c: c / 2.0),
    min_size=5,
    max_size=60,
)
TYPES = ["click", "view", "purchase", "error", "signup"]


def _events_frame(vals_by_type: dict[str, list[float]]) -> pd.DataFrame:
    rows = [
        {"event_type": t, "value": v, "event_id": i, "user_id": i}
        for i, (t, v) in enumerate(
            (t, v) for t, vs in vals_by_type.items() for v in vs
        )
    ]
    return pd.DataFrame(rows)


def _run_oracle(name: str, frame: pd.DataFrame) -> list[tuple]:
    con = duckdb.connect()
    con.register("events", frame)
    try:
        return con.execute(q.ORACLES[name]).fetchall()
    finally:
        con.close()


@settings(max_examples=30, deadline=None)
@given(a=values, b=values)
def test_mann_whitney_oracle_matches_reference(a, b):
    frame = _events_frame({"click": a, "view": b})
    (n1, n2, r1, u1, z), = _run_oracle("q_mann_whitney", frame)
    assert (n1, n2) == (len(a), len(b))

    pooled = sorted([(v, "click") for v in a] + [(v, "view") for v in b])
    # average ranks with ties
    ranks: dict[int, float] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        for k in range(i, j):
            ranks[k] = avg
        i = j
    ref_r1 = sum(ranks[k] for k in range(len(pooled)) if pooled[k][1] == "click")
    assert r1 == pytest.approx(ref_r1, abs=1e-6)
    ref_u1 = ref_r1 - len(a) * (len(a) + 1) / 2.0
    assert u1 == pytest.approx(ref_u1, abs=1e-6)

    n = len(a) + len(b)
    tie_sum = sum(t**3 - t for t in Counter(v for v, _ in pooled).values() if t > 1)
    var = len(a) * len(b) / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
    if var > 0:
        ref_z = (ref_u1 - len(a) * len(b) / 2.0) / math.sqrt(var)
        assert z == pytest.approx(ref_z, abs=1e-5)


@settings(max_examples=30, deadline=None)
@given(a=values, b=values)
def test_ks_oracle_matches_reference(a, b):
    frame = _events_frame({"click": a, "view": b})
    (n1, n2, d), = _run_oracle("q_ks_test", frame)
    ref_d = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in set(a) | set(b)
    )
    assert 0.0 <= d <= 1.0
    assert d == pytest.approx(ref_d, abs=1e-6)


@settings(max_examples=30, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(TYPES),
            st.integers(min_value=1, max_value=40000).map(lambda c: c / 100.0),
        ),
        min_size=10,
        max_size=80,
    )
)
def test_chi_square_oracle_matches_reference(vals):
    by_type: dict[str, list[float]] = {}
    for t, v in vals:
        by_type.setdefault(t, []).append(v)
    frame = _events_frame(by_type)
    (n, dof, chi2, cv), = _run_oracle("q_chi_square", frame)
    counted = Counter((t, "hi" if v >= 100 else "lo") for t, v in vals)
    rows = Counter()
    cols = Counter()
    for (t, band), o in counted.items():
        rows[t] += o
        cols[band] += o
    grand = sum(counted.values())
    # full-grid reference (round-4 review finding #5): empty cells of a
    # populated band contribute their expected count
    bands = [b for b in ("hi", "lo") if cols[b] > 0]
    ref = sum(
        (grand * counted.get((t, band), 0) - rows[t] * cols[band]) ** 2
        / (grand * rows[t] * cols[band])
        for t in rows
        for band in bands
    )
    ref_dof = (len(rows) - 1) * (len(bands) - 1)
    assert n == grand
    assert dof == ref_dof
    assert chi2 == pytest.approx(ref, abs=1e-5)
    assert chi2 >= 0
    if ref_dof > 0:
        assert cv == pytest.approx(math.sqrt(ref / grand), abs=1e-5)
    else:
        assert cv is None


@settings(max_examples=30, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(TYPES),
        st.lists(
            st.integers(min_value=1, max_value=40000).map(lambda c: c / 100.0),
            min_size=2,
            max_size=30,
        ),
        min_size=2,
        max_size=5,
    )
)
def test_anova_oracle_matches_reference(groups):
    frame = _events_frame(groups)
    (k, n, ssb, ssw, f_stat, eta), = _run_oracle("q_anova", frame)
    assert (k, n) == (len(groups), sum(len(v) for v in groups.values()))
    flat = [v for vs in groups.values() for v in vs]
    gm = sum(flat) / len(flat)
    ref_ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values())
    ref_ssw = sum(
        (v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs
    )
    assert ssb == pytest.approx(ref_ssb, abs=1e-3)
    assert ssw == pytest.approx(ref_ssw, abs=1e-3)
    if ref_ssw > 1e-9 and n > k:
        ref_f = (ref_ssb / (k - 1)) / (ref_ssw / (n - k))
        assert f_stat == pytest.approx(ref_f, rel=1e-4, abs=1e-4)
    if ref_ssb + ref_ssw > 1e-9:
        assert eta == pytest.approx(ref_ssb / (ref_ssb + ref_ssw), abs=1e-4)
