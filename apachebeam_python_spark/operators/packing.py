"""Token-budget shard packing for training-corpus preparation (SURVEY §2.11
extension — the "sequence packing" step of a pretraining-data pipeline:
assign documents to shards so each shard holds ≈ budget tokens).

Two tiers, same trade Beam pipelines make:

- ``pack_shards_window``: boundary-split packing — shard id comes from the
  running token total (``floor((cumsum - tokens) / budget)``), so a document
  may straddle a budget boundary and a shard can overflow by < 1 document.
  Pure window expression: deterministic, SQL-portable, oracle-checkable, ONE
  shuffle per pack group. This is the 100 TB default.
- ``pack_shards_greedy``: exact greedy (close a shard when the next doc
  would overflow) — inherently sequential, so it runs per pack-group inside
  an Arrow-batched ``applyInPandas``; groups bound both memory and the lost
  parallelism. Shards never overflow (except a single over-budget doc).

Both partition the corpus into ``num_groups`` hash groups packed
independently — the standard scale move (per-partition packing, waste
bounded by num_groups × budget) because global packing serializes.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_GROUP_STRIDE = 1_000_000  # shard_id = group * stride + shard_in_group


def pack_shards_window(
    df: DataFrame, token_col: str, id_col: str, budget: int, num_groups: int = 8,
    group_expr: Optional[Column] = None,
) -> DataFrame:
    """Boundary-split packing: (id, tokens, pack_group, shard_id).

    Within each hash group, docs are ordered by id and a running token sum
    assigns ``shard = floor((cumsum - tokens) / budget)`` — the shard a doc
    STARTS in. Deterministic and window-expressible in any SQL engine.
    ``group_expr`` overrides the default xxhash64 grouping (e.g. a plain
    modulo when the oracle engine lacks xxhash64).
    """
    grp = group_expr if group_expr is not None else F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_groups))
    w = (
        Window.partitionBy("pack_group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), F.col(token_col), grp.alias("pack_group"))
        .withColumn("_cum", F.sum(token_col).over(w))
        .select(
            id_col,
            token_col,
            "pack_group",
            (
                F.col("pack_group") * _GROUP_STRIDE
                + F.floor((F.col("_cum") - F.col(token_col)) / F.lit(budget))
            ).cast("long").alias("shard_id"),
        )
    )


def pack_shards_greedy(
    df: DataFrame, token_col: str, id_col: str, budget: int, num_groups: int = 8,
    group_expr: Optional[Column] = None,
) -> DataFrame:
    """Exact greedy packing: never overflows a shard (a doc larger than the
    budget gets its own shard). Sequential per pack group via applyInPandas.
    """
    grp = group_expr if group_expr is not None else F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_groups))
    src = df.select(F.col(id_col).alias("id"), F.col(token_col).alias("tokens"), grp.alias("pack_group"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        group = int(pdf["pack_group"].iloc[0]) if len(pdf) else 0
        shard, fill, out = 0, 0, []
        for t in pdf["tokens"]:
            t = int(t)
            if fill and fill + t > budget:
                shard, fill = shard + 1, 0
            out.append(group * _GROUP_STRIDE + shard)
            fill += t
        pdf["shard_id"] = pd.Series(out, dtype="int64")
        return pdf[["id", "tokens", "pack_group", "shard_id"]]

    return src.groupBy("pack_group").applyInPandas(
        pack, schema="id long, tokens long, pack_group long, shard_id long"
    ).select(
        F.col("id").alias(id_col), F.col("tokens").alias(token_col), "pack_group", "shard_id"
    )


def sample_fixed_per_key(
    df: DataFrame, keys: list[str], n: int, seed: int = 42
) -> DataFrame:
    """Beam ``Sample.FixedSizePerKey(n)``: at most n rows per key, via a
    seeded-rand row_number ≤ n — WindowGroupLimit keeps only n rows per key
    per map task before the shuffle (same scale shape as top-k per key).
    Selection is nondeterministic across partition layouts (rows-only)."""
    w = Window.partitionBy(*keys).orderBy(F.rand(seed))
    return (
        df.withColumn("_srn", F.row_number().over(w))
        .filter(F.col("_srn") <= n)
        .drop("_srn")
    )
