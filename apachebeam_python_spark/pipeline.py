"""Fluent pipeline facade — the migration-friendly front door.

Users of the reference repo write Beam pipelines as transform chains; this
facade offers the same reading order over DataFrames, with each verb
delegating to the engine's operators (so there is exactly one implementation
of every operator — this file is sugar, not semantics):

    from apachebeam_python_spark.pipeline import Pipeline

    (Pipeline.read_parquet(spark, f"{sf}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .map(revenue=F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .combine_per_key(["l_returnflag"], total=F.sum("revenue"))
        .to_df())

It stays 100% lazy/declarative — ``to_df()`` hands back the underlying
DataFrame and Catalyst sees straight through the chain.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from .operators import aggregations as _agg
from .operators import elementwise as _ew
from .operators import event_time as _et
from .operators import joins as _joins
from .operators import setops as _setops


class Pipeline:
    """A thin, immutable wrapper: every verb returns a new Pipeline."""

    def __init__(self, df: DataFrame):
        self._df = df

    # ---- sources -------------------------------------------------------
    @classmethod
    def of(cls, df: DataFrame) -> "Pipeline":
        return cls(df)

    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str) -> "Pipeline":
        from .sources.io import read_parquet

        return cls(read_parquet(spark, path))

    @classmethod
    def create(cls, spark: SparkSession, data, schema) -> "Pipeline":
        """Beam ``Create``: in-memory source."""
        return cls(spark.createDataFrame(data, schema))

    # ---- element-wise --------------------------------------------------
    def map(self, **exprs: Column) -> "Pipeline":
        return Pipeline(_ew.with_columns(self._df, **exprs))

    def select(self, **exprs: Column) -> "Pipeline":
        return Pipeline(_ew.map_rows(self._df, **exprs))

    def filter(self, predicate: Column) -> "Pipeline":
        return Pipeline(_ew.filter_rows(self._df, predicate))

    def flat_map(self, array_col: Column, out_name: str, *keep: str) -> "Pipeline":
        return Pipeline(_ew.flat_map_explode(self._df, array_col, out_name, *keep))

    def par_do(self, fn: Callable, schema, *, setup=None) -> "Pipeline":
        return Pipeline(_ew.par_do(self._df, fn, schema, setup=setup))

    def reshuffle(self, n: int | None = None, *cols: str) -> "Pipeline":
        return Pipeline(_ew.reshuffle(self._df, n, *cols))

    def with_keys(self, key_expr: Column, key_col: str = "key") -> "Pipeline":
        """Beam ``WithKeys`` (round 6 facade completion)."""
        return Pipeline(_ew.with_keys(self._df, key_expr, key_col))

    def partition_into(
        self, bucket_expr: Column, n: int, bucket_col: str = "bucket"
    ) -> "list[Pipeline]":
        """Beam ``Partition(fn, n)`` — a list of n disjoint Pipelines
        (round 6 facade completion)."""
        return [
            Pipeline(d) for d in _ew.partition_into(self._df, bucket_expr, n, bucket_col)
        ]

    # ---- grouping / combining -----------------------------------------
    def combine_per_key(self, keys: Sequence[str], **aggs: Column) -> "Pipeline":
        return Pipeline(_agg.combine_per_key(self._df, keys, **aggs))

    def combine_globally(self, **aggs: Column) -> "Pipeline":
        return Pipeline(_agg.combine_globally(self._df, **aggs))

    def count_per_element(self, *cols: str) -> "Pipeline":
        return Pipeline(_agg.count_per_element(self._df, *cols))

    def distinct(self, *cols: str) -> "Pipeline":
        return Pipeline(_agg.distinct_rows(self._df, *cols))

    def top_k(self, order: Sequence[Column], k: int) -> "Pipeline":
        return Pipeline(_agg.top_k_global(self._df, order, k))

    def top_k_per_key(self, keys: Sequence[str], order: Sequence[Column], k: int) -> "Pipeline":
        return Pipeline(_agg.top_k_per_key(self._df, keys, order, k))

    def latest_per_key(
        self, keys: Sequence[str], value: str, ts: str, out: str = "latest"
    ) -> "Pipeline":
        """Beam ``Latest.PerKey`` (round 6 facade completion)."""
        return Pipeline(_agg.latest_per_key(self._df, keys, value, ts, out))

    def group_into_batches(
        self, keys: Sequence[str], value: str, batch_size: int, out: str = "batch"
    ) -> "Pipeline":
        """Beam ``GroupIntoBatches`` (round 6 facade completion)."""
        return Pipeline(_agg.group_into_batches(self._df, keys, value, batch_size, out))

    def sample_fixed(self, n: int, seed: int = 42) -> "Pipeline":
        """Beam ``Sample.FixedSizeGlobally`` (round 6 facade completion)."""
        return Pipeline(_agg.sample_fixed_global(self._df, n, seed))

    # ---- joins ---------------------------------------------------------
    def join(self, other: "Pipeline | DataFrame", on, how: str = "inner") -> "Pipeline":
        return Pipeline(_joins.equi_join(self._df, _unwrap(other), on, how))

    def join_broadcast(self, dim: "Pipeline | DataFrame", on, how: str = "inner") -> "Pipeline":
        return Pipeline(_joins.broadcast_join(self._df, _unwrap(dim), on, how))

    def cogroup(self, other: "Pipeline | DataFrame", keys, lv: str, rv: str) -> "Pipeline":
        return Pipeline(_joins.cogroup_by_key(self._df, _unwrap(other), keys, lv, rv))

    def join_semi(self, other: "Pipeline | DataFrame", on) -> "Pipeline":
        """EXISTS filter — Beam side-input membership (round 6 facade)."""
        return Pipeline(_joins.semi_join(self._df, _unwrap(other), on))

    def join_anti(self, other: "Pipeline | DataFrame", on) -> "Pipeline":
        """NOT EXISTS filter — the decontamination shape (round 6 facade)."""
        return Pipeline(_joins.anti_join(self._df, _unwrap(other), on))

    # ---- set ops -------------------------------------------------------
    def flatten(self, *others: "Pipeline | DataFrame") -> "Pipeline":
        return Pipeline(_setops.flatten(self._df, *[_unwrap(o) for o in others]))

    # ---- LLM-corpus operators -----------------------------------------
    def dedup_exact(self, text_col: str, id_col: str) -> "Pipeline":
        from .operators import dedup as _d

        return Pipeline(_d.exact_dedup_groups(self._df, text_col, id_col))

    def dedup_against(self, snapshot: "Pipeline | DataFrame", text_col: str) -> "Pipeline":
        """Incremental dedup: keep only rows whose content is absent from
        ``snapshot`` (operators.dedup.incremental_new_rows)."""
        from .operators import dedup as _d

        return Pipeline(_d.incremental_new_rows(self._df, _unwrap(snapshot), text_col))

    def neardup_pairs(self, text_col: str, id_col: str, *, threshold: float = 0.5) -> "Pipeline":
        from .operators import dedup as _d

        return Pipeline(_d.minhash_lsh_pairs(self._df, text_col, id_col, threshold=threshold))

    def bm25(self, terms: Sequence[str], text_col: str, id_col: str, *, k: int = 10) -> "Pipeline":
        from .operators.retrieval import bm25_topk

        return Pipeline(bm25_topk(self._df, list(terms), text_col, id_col, k=k))

    # ---- event-time windows -------------------------------------------
    def window_tumbling(self, ts: str, size: str, keys: Sequence[str] = (), **aggs: Column) -> "Pipeline":
        return Pipeline(_et.tumbling(self._df, ts, size, keys, **aggs))

    def window_sliding(self, ts: str, size: str, slide: str, keys: Sequence[str] = (), **aggs: Column) -> "Pipeline":
        return Pipeline(_et.sliding(self._df, ts, size, slide, keys, **aggs))

    def window_session(self, ts: str, gap: str, keys: Sequence[str], **aggs: Column) -> "Pipeline":
        return Pipeline(_et.session(self._df, ts, gap, keys, **aggs))

    # ---- sinks / escape hatch -----------------------------------------
    def to_df(self) -> DataFrame:
        return self._df

    def write_parquet(self, path: str, mode: str = "overwrite", partition_by: tuple[str, ...] = ()) -> None:
        from .sources.io import write_parquet

        write_parquet(self._df, path, mode, partition_by)

    # -- snapshot lake table (sources/laketable.py) ----------------------
    @classmethod
    def read_lake(
        cls, spark: SparkSession, path: str, version: int | None = None
    ) -> "Pipeline":
        """Time-travel read of a snapshot lake table."""
        from .sources.laketable import read_table

        return cls(read_table(spark, path, version=version))

    def lake_create(self, path: str) -> int:
        from .sources.laketable import create_table

        return create_table(self._df, path)

    def lake_append(self, path: str) -> int:
        from .sources.laketable import append

        return append(self._df, path)

    def lake_merge(self, path: str, key: str) -> int:
        """MERGE INTO (upsert) this pipeline's rows by ``key``."""
        from .sources.laketable import merge

        return merge(self._df.sparkSession, path, self._df, key)


def _unwrap(x: "Pipeline | DataFrame") -> DataFrame:
    return x._df if isinstance(x, Pipeline) else x
