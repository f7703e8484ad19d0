"""Skew-mitigation operators (SURVEY.md §4.2, scale_notes.md "Joins").

AQE's skew-join splitting handles moderate skew automatically; these are the
explicit patterns for pathological keys (one key = 30% of 100 TB):

- **salted aggregation**: two-stage combine — partial agg on (key, salt),
  final agg on key. The hot key's partial work spreads over ``n_salts``
  reducers; the final stage sees only n_salts rows per key. Works for any
  decomposable aggregate (sum/count/min/max; avg = sum+count recombined).
- **salted broadcast-side replication join**: fact rows get a deterministic
  salt from a high-cardinality column; the small side is replicated once per
  salt value; the join key becomes (key, salt) — the hot key now lands on
  n_salts partitions instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial_expr, final_expr) builders per decomposable aggregate.
#: Honesty note: for sum/count/min/max Catalyst's map-side partial
#: aggregation ALREADY neutralizes key skew — salting those is belt-and-
#: suspenders. The aggregate that genuinely needs salting is "collect":
#: a plain collect_list sends every row of the hot key to ONE reducer,
#: while the salted form materializes n_salts partial lists in parallel
#: and only flattens the (much smaller) list-of-lists at the end.
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "collect": (
        F.collect_list,
        lambda c: F.array_sort(F.flatten(F.collect_list(c))),
    ),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    salt_src: Column,
    n_salts: int,
    **aggs: tuple[str, str],
) -> DataFrame:
    """Two-stage skew-proof CombinePerKey.

    ``aggs`` maps output name → (column, kind) with kind in
    sum/count/min/max. ``salt_src`` must be high-cardinality (a row id);
    the salt is ``pmod(hash(salt_src), n_salts)`` — deterministic, no RNG.
    Result is row-identical to the direct ``groupBy(keys).agg``.
    """
    for name, (_, kind) in aggs.items():
        if kind not in _DECOMPOSABLE:
            raise ValueError(f"{name}: {kind!r} is not decomposable")
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _DECOMPOSABLE[kind][0](col).alias(f"_p_{name}")
            for name, (col, kind) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[kind][1](f"_p_{name}").alias(name)
            for name, (_, kind) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: Column,
    n_salts: int,
    how: str = "inner",
) -> DataFrame:
    """Replicate-small/salt-fact join for skewed keys.

    The small side is exploded ×n_salts (must be modest-sized — if it were
    broadcast-small you'd just broadcast; this targets the middle ground:
    too big to broadcast, joined against a skewed fact).

    Only fact-preserving join types are salt-safe: a right/full outer join
    would emit each unmatched small-side row once PER SALT replica."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join: how={how!r} is not salt-safe (unmatched "
                         "small-side rows would duplicate n_salts times)")
    salted_fact = fact.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(replicated, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def skew_report(df, keys, *, shuffle_partitions: int = 32):
    """Key-distribution diagnostic — run this BEFORE picking a join/agg
    strategy on a new key (the measurement half of the salting decision):

    - ``n_keys``, ``n_rows``: cardinality vs volume;
    - ``max_share``: the hottest key's fraction of all rows;
    - ``hot_partition_factor``: max_share × shuffle_partitions — how many
      partitions' worth of data the hottest key drags into ONE task (> ~2
      ⇒ AQE skew split will fire; ≫ that, or for aggregates, ⇒ salt);
    - ``entropy_bits`` vs ``uniform_bits`` (log2 n_keys): how far the
      distribution is from uniform;
    - ``top_keys``: the usual suspects, serialized (count DESC, key ASC).

    One count-per-key aggregate (partial-agg lifted), a 1-row broadcast of
    the total, and a summary over n_keys rows — safe at any scale where
    the KEY cardinality itself is aggregable, which is exactly when the
    report is meaningful.
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(*keys).agg(F.count("*").alias("_c"))
    total = counts.agg(F.sum("_c").alias("_t"))
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    p = F.col("_c") / F.col("_t")
    return (
        counts.crossJoin(F.broadcast(total))
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("_c").alias("n_rows"),
            F.round(F.max(p), 6).alias("max_share"),
            F.round(F.max(p) * shuffle_partitions, 2).alias("hot_partition_factor"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
            F.round(F.log2(F.count("*")), 6).alias("uniform_bits"),
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct((-F.col("_c")).alias("nc"), key_str.alias("k"))
                            )
                        ),
                        lambda s: s["k"],
                    ),
                    1,
                    5,
                ),
                ",",
            ).alias("top_keys"),
        )
    )
