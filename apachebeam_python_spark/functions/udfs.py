"""User-defined function surface (SURVEY.md §2.10): the escape hatches for
logic Spark expressions can't say — each at the cheapest available tier.

Tier order (always prefer the lowest):
1. built-in expressions (everything in functions.text / functions.vectors);
2. Arrow-vectorized ``pandas_udf`` (scalar / GROUPED_AGG) — one
   Python-process hop per batch, not per row;
3. ``applyInPandas`` grouped map / ``mapInPandas`` UDTF-style (1→N);
4. row-at-a-time ``F.udf`` — never used in this engine.

The ``RunInference`` pattern (model loaded once per task, batched predict)
is ``elementwise.par_do`` with its ``setup`` hook; see
``queries/udfs.q_inference_stub``.
"""

from __future__ import annotations

from functools import cache

import pandas as pd

from pyspark.sql.functions import pandas_udf

# pandas_udf parses its DDL return type eagerly, which needs an active
# SparkSession — so UDF objects are built lazily (first use) and cached.


@cache
def relative_spread():
    """Scalar vectorized UDF: (hi-lo)/hi guarded against zero — an
    arbitrary-Python Map that still rides Arrow batches."""

    @pandas_udf("double")
    def _relative_spread(lo: pd.Series, hi: pd.Series) -> pd.Series:
        # result (not just the denominator) is zeroed when hi == 0, and
        # NULL/NaN inputs also coerce to 0.0 (pandas float series can't
        # round-trip SQL NULL; the oracle mirrors this with coalesce)
        return ((hi - lo) / hi).where(hi != 0, 0.0).fillna(0.0)

    return _relative_spread


@cache
def weighted_avg():
    """GROUPED_AGG pandas UDF — Beam ``CombineFn`` (custom UDAF): weighted
    mean. Spark evaluates it per group after the shuffle; unlike a built-in
    agg there is no partial/map-side step, which is the documented cost of
    leaving expression land (SURVEY §2.10)."""

    @pandas_udf("double")
    def _weighted_avg(value: pd.Series, weight: pd.Series) -> float:
        w = weight.sum()
        return float((value * weight).sum() / w) if w else 0.0

    return _weighted_avg


def zscore_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map (applyInPandas) kernel: per-key z-score normalization —
    the GroupByKey+per-group-Python Beam pattern. Population std (ddof=0)
    to match the SQL oracle's stddev_pop."""
    std = pdf["value"].std(ddof=0)
    pdf = pdf.copy()
    pdf["zscore"] = ((pdf["value"] - pdf["value"].mean()) / std if std > 0 else 0.0)
    return pdf[["event_id", "user_id", "zscore"]]


def nation_balance_recon(key, cust: pd.DataFrame, supp: pd.DataFrame) -> pd.DataFrame:
    """Cogrouped applyInPandas kernel (two-input grouped map, SURVEY §2.10 —
    Beam CoGroupByKey + per-key Python): per-nation reconciliation of the
    customer and supplier books. Receives BOTH sides' rows for one key as
    Arrow-backed pandas frames; either side may be empty. The sums round at
    2 decimals (the inputs' exact decimal depth) so the float fold order
    can't surface in the oracle compare."""
    return pd.DataFrame(
        [{
            "nationkey": key[0],
            "n_cust": len(cust),
            "n_supp": len(supp),
            "balance_gap": round(
                float(cust["c_acctbal"].sum()) - float(supp["s_acctbal"].sum()), 2
            ),
        }]
    )


@cache
def compression_ratio():
    """Scalar vectorized UDF: zlib-compressed length / raw byte length —
    the compression-ratio quality heuristic (RefinedWeb/DCLM style: highly
    repetitive text compresses far below normal prose; near-random noise
    doesn't compress at all). zlib level pinned to 6 so the output is a
    deterministic function of the bytes — the pytest oracle replays the
    identical call. Arrow-batched: one Python hop per batch; at 100 TB this
    is the same narrow-projection cost profile as any scalar UDF."""
    import zlib

    @pandas_udf("double")
    def _compression_ratio(text: pd.Series) -> pd.Series:
        def ratio(s):
            if s is None:
                return 0.0
            raw = s.encode("utf-8")
            if not raw:
                return 0.0
            return len(zlib.compress(raw, 6)) / len(raw)

        return text.map(ratio)

    return _compression_ratio


@cache
def dtw_band(radius: int = 7):
    """Scalar vectorized UDF: banded dynamic-time-warping distance between
    two integer series (arrays of cents) under a Sakoe-Chiba band —
    exact integer DP, |a−b| step cost. Not SQL-expressible (the DP cell
    recurrence is data-dependent), so this is the §2.10 escape hatch;
    q_dtw pins it against an independent numpy replay."""
    import numpy as np

    @pandas_udf("long")
    def _dtw_band(va: pd.Series, vb: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(va, vb):
            a = np.asarray(a, dtype=np.int64)
            b = np.asarray(b, dtype=np.int64)
            n, m = len(a), len(b)
            big = np.iinfo(np.int64).max // 4
            prev = np.full(m + 1, big, dtype=np.int64)
            prev[0] = 0
            for i in range(1, n + 1):
                cur = np.full(m + 1, big, dtype=np.int64)
                lo = max(1, i - radius)
                hi = min(m, i + radius)
                for j in range(lo, hi + 1):
                    cost = abs(int(a[i - 1]) - int(b[j - 1]))
                    cur[j] = cost + min(prev[j], prev[j - 1], cur[j - 1])
                prev = cur
            out.append(int(prev[m]))
        return pd.Series(out, dtype="int64")

    return _dtw_band
