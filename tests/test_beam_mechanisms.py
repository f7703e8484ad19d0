"""Remaining Beam-mechanism parity demos (SURVEY §1.1, §2 periphery):
Python-side counters via accumulators, and AsDict side inputs as broadcast
variables inside an Arrow-batched DoFn."""

from __future__ import annotations

from apachebeam_python_spark.operators import elementwise as ew
from apachebeam_python_spark.session import fan_out, table


def test_accumulator_counter_in_pardo(spark, sf_dir):
    """Beam Metrics.counter bumped inside a DoFn → Spark accumulator.
    At-least-once under retries (same caveat as Beam attempted metrics)."""
    rows_seen = spark.sparkContext.accumulator(0)

    def dofn(batches):
        for pdf in batches:
            rows_seen.add(len(pdf))
            yield pdf[["event_id"]]

    e = table(spark, sf_dir, "events").select("event_id")
    n = ew.par_do(fan_out(e), dofn, "event_id long").count()
    assert rows_seen.value == n == table(spark, sf_dir, "events").count()


def test_broadcast_dict_side_input_in_pardo(spark, sf_dir):
    """Beam AsDict side input: a small mapping broadcast to every worker,
    looked up inside the DoFn (when the lookup can't be a join — e.g. the
    dict drives branching Python logic)."""
    rates = spark.sparkContext.broadcast(
        {"click": 1.0, "view": 0.5, "purchase": 2.0, "signup": 5.0, "error": 0.0}
    )

    def dofn(batches):
        for pdf in batches:
            out = pdf[["event_id", "event_type"]].copy()
            out["weight"] = out["event_type"].map(lambda t: rates.value.get(t, -1.0))
            yield out[["event_id", "weight"]]

    e = table(spark, sf_dir, "events").select("event_id", "event_type")
    out = ew.par_do(fan_out(e), dofn, "event_id long, weight double")
    assert out.filter("weight < 0").count() == 0  # every type resolved
    assert out.count() == e.count()
