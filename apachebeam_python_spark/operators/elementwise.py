"""Element-wise operators — the reference's ``Map`` / ``FlatMap`` / ``Filter`` /
``ParDo`` vocabulary (SURVEY.md §2.2), Spark-first.

Design stance: every helper returns a *declarative* DataFrame expression so
Catalyst can fuse it into whole-stage codegen (the reference runner's "ParDo
fusion", SURVEY §4.1, is free here). Arbitrary-Python paths (``par_do``)
cross the Arrow boundary once per batch via ``mapInPandas`` — the bundle
lifecycle (setup/start_bundle/.../teardown) maps onto the iterator-of-batches
form: setup = before the loop, finish = after.

Scale: all of these are narrow transformations — no shuffle, no driver-side
collection; they hold at 100 TB by construction.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def map_rows(df: DataFrame, **exprs: Column) -> DataFrame:
    """Beam ``Map`` as projection: 1→1, each kwarg an aliased output column."""
    return df.select(*[e.alias(n) for n, e in exprs.items()])


def with_columns(df: DataFrame, **exprs: Column) -> DataFrame:
    """Beam ``Map`` that augments rather than replaces (keep input columns)."""
    return df.withColumns(dict(exprs))


def filter_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """Beam ``Filter``: keep rows where predicate holds (pushdown-eligible)."""
    return df.filter(predicate)


def flat_map_explode(df: DataFrame, array_col: Column, out_name: str, *keep: str) -> DataFrame:
    """Beam ``FlatMap`` for the common 1→N case: explode an array expression.

    0-element arrays drop the row (Beam FlatMap emitting nothing); use
    ``explode_outer`` via :func:`flat_map_explode_outer` to keep them.
    """
    return df.select(*keep, F.explode(array_col).alias(out_name))


def flat_map_explode_outer(df: DataFrame, array_col: Column, out_name: str, *keep: str) -> DataFrame:
    return df.select(*keep, F.explode_outer(array_col).alias(out_name))


def par_do(
    df: DataFrame,
    fn: Callable[[Iterable], Iterator],
    schema: StructType | str,
    *,
    setup: Callable[[], object] | None = None,
) -> DataFrame:
    """Beam ``ParDo(DoFn)`` general form: arbitrary Python over Arrow batches.

    ``fn(batches)`` receives an iterator of ``pandas.DataFrame`` (≈ Beam
    bundles) and yields output frames matching ``schema``. ``setup`` runs
    once per task before the first bundle (Beam ``DoFn.setup``) — e.g. model
    load for RunInference-style usage (SURVEY §2.10).

    Slow path by design — prefer the declarative helpers above.
    """

    def run(batches: Iterator) -> Iterator:
        # dispatch on whether setup was PROVIDED — a setup() legitimately
        # returning None must still call the two-argument form
        if setup is not None:
            yield from fn(batches, setup())  # type: ignore[call-arg]
        else:
            yield from fn(batches)

    return df.mapInPandas(run, schema=schema)


def par_do_tagged(
    df: DataFrame, tag_expr: Column, tags: Iterable[str], tag_col: str = "tag"
) -> Mapping[str, DataFrame]:
    """Beam ``ParDo.with_outputs`` (TaggedOutput): one logical pass, N outputs.

    Implemented as a tag column + N filters; Catalyst shares the scan and the
    tag computation across outputs (SURVEY §1.1 "Multiple outputs").
    """
    tagged = df.withColumn(tag_col, tag_expr)
    return {t: tagged.filter(F.col(tag_col) == t) for t in tags}


def partition_into(df: DataFrame, bucket_expr: Column, n: int, bucket_col: str = "bucket"):
    """Beam ``Partition(fn, n)``: split into n DataFrames by bucket in [0, n).

    Out-of-range buckets raise at execution time (Beam's loud per-element
    error) rather than silently vanishing from every output split."""
    checked = F.when((bucket_expr >= 0) & (bucket_expr < n), bucket_expr).otherwise(
        F.raise_error(
            F.concat(F.lit(f"partition_into: bucket out of range [0, {n}): "),
                     bucket_expr.cast("string"))
        )
    )
    bucketed = df.withColumn(bucket_col, checked)
    return [bucketed.filter(F.col(bucket_col) == i) for i in range(n)]


def with_keys(df: DataFrame, key_expr: Column, key_col: str = "key") -> DataFrame:
    """Beam ``WithKeys``: attach a key column (keys are just columns here)."""
    return df.withColumn(key_col, key_expr)


def reshuffle(df: DataFrame, n: int | None = None, *cols: str) -> DataFrame:
    """Beam ``Reshuffle``: physical redistribution hint. With cols → hash
    partition on them (co-location for a later merge/join); else round-robin
    across the cluster's default parallelism (PySpark's ``repartition()``
    requires an explicit count)."""
    if cols:
        return df.repartition(n, *cols) if n else df.repartition(*cols)
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
