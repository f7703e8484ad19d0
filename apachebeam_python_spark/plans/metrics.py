"""Pipeline metrics (SURVEY.md §2 periphery): the Beam ``Metrics.counter`` /
``Metrics.distribution`` surface, Spark-style.

Beam DoFns bump named counters that the runner aggregates; Spark's idiomatic
equivalents, in preference order:

1. ``df.observe(name, exprs...)`` — metrics computed INSIDE the job on the
   rows actually flowing through that point of the plan, collected at action
   time with zero extra passes. This is the combiner-style counter.
2. ``spark.sparkContext.accumulator`` — imperative counters from Python UDF
   code (ParDo innards); at-least-once semantics under task retries, same
   caveat Beam's committed-vs-attempted metrics have.

``observed`` wraps (1) with a handle object usable in both batch and
foreachBatch streaming sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach an observation point: returns (df', observation). After an
    action runs on df', ``observation.get`` yields the metric dict — counts,
    sums, min/max of whatever flowed through — with NO extra scan."""
    obs = Observation(name)
    out = df.observe(obs, *[m.alias(n) for n, m in metrics.items()])
    return out, obs


def run_with_metrics(df: DataFrame, observations: dict[str, Observation]) -> dict:
    """Materialize ``df`` via the no-op sink (the cheapest full action) and
    harvest every observation point, merged into one flat dict with keys
    ``{point_name}_{metric_alias}``. 100 TB note: observed metrics are
    task-side partials merged as driver metadata — cost independent of data
    size; put a point at every stage boundary you would have put a Beam
    counter."""
    df.write.mode("overwrite").format("noop").save()
    out: dict = {}
    for name, obs in observations.items():
        for k, v in obs.get.items():
            out[f"{name}_{k}"] = v
    return out
