"""Beam ``Metrics`` (Counter / Distribution) → Spark ``Observation``.

SURVEY §2.2: Beam DoFns increment counters and distributions as a side
channel of the pipeline run (``Metrics.counter(...).inc()``); runners
surface them without a second pass over the data. Spark's idiomatic
equivalent is ``DataFrame.observe``: named aggregate expressions attached
to a plan node, harvested by the driver when an ACTION materializes the
query — zero extra jobs, zero extra scans, exactly Beam's cost model.
(Accumulators are the RDD-era alternative; observe is exact-once per
action and survives AQE re-planning, so it is the one we map to.)

100 TB note: observed metrics are partial-aggregated inside each task and
merged on the driver as metadata (one row of aggregates per observation
point) — cost is independent of data size. Put an observation at every
pipeline stage boundary you would have put a Beam counter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observe_point(df: DataFrame, name: str, *metrics: Column):
    """Attach a named metrics point to ``df`` (Beam: a DoFn's counters).

    Returns ``(df, observation)``; read ``observation.get`` AFTER an action
    has materialized the plan downstream of the observed node.
    """
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def run_with_metrics(df: DataFrame, observations: dict[str, Observation]) -> dict:
    """Materialize ``df`` via the no-op sink (the cheapest full action) and
    harvest every observation point, merged into one flat dict with keys
    ``{point_name}_{metric_alias}``.
    """
    df.write.mode("overwrite").format("noop").save()
    out: dict = {}
    for name, obs in observations.items():
        for k, v in obs.get.items():
            out[f"{name}_{k}"] = v
    return out
