#!/usr/bin/env python
"""Round-11 plan audit over the full driver window (guide §1/§7.2):
for every DRIVER_ORDER query, build the DataFrame at sf0.1 and count the
plan-shape signals the optimization guide says to look for — Exchange
nodes, join strategies, Python-boundary nodes (BatchEvalPython /
ArrowEvalPython / MapInArrow / FlatMapGroupsInPandas), scans without
PushedFilters where the query filters, and WholeStageCodegen coverage.
Writes a JSON summary to plans/r12/audit.json for OPTIMIZATION_r11.md.

Timing is NOT done here (host-noise rules: only bench/-ab numbers are
quotable); this is the structural half of the measurement.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from apachebeam_python_spark import queries as q  # noqa: E402
from apachebeam_python_spark.operators.dedup import (  # noqa: E402
    release_signature_caches,
)
from apachebeam_python_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NODES = [
    ("exchanges", r"\bExchange\b"),
    ("broadcast_exchanges", r"\bBroadcastExchange\b"),
    ("bhj", r"\bBroadcastHashJoin\b"),
    ("smj", r"\bSortMergeJoin\b"),
    ("shj", r"\bShuffledHashJoin\b"),
    ("bnlj", r"\bBroadcastNestedLoopJoin\b"),
    ("cartesian", r"\bCartesianProduct\b"),
    ("batch_eval_python", r"\bBatchEvalPython\b"),
    ("arrow_eval_python", r"\bArrowEvalPython\b"),
    ("map_in_arrow_or_pandas", r"\bMapInPandas\b|\bMapInArrow\b|\bPythonMapInArrow\b"),
    ("grouped_map_pandas", r"\bFlatMapGroupsInPandas\b|\bFlatMapCoGroupsInPandas\b"),
    ("window_group_limit", r"\bWindowGroupLimit\b"),
    ("sorts", r"\bSort\b"),
]


def main() -> None:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in q.DRIVER_ORDER:
        try:
            df = q.QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
            entry = {k: len(re.findall(p, txt)) for k, p in NODES}
            entry["pushed_filters"] = len(
                re.findall(r"PushedFilters: \[[^\]]", txt)
            )
            entry["scans"] = len(re.findall(r"Scan parquet", txt))
            out[name] = entry
        except Exception as exc:  # noqa: BLE001
            out[name] = {"err": str(exc)[:200]}
        release_signature_caches()
        print(name, out[name], file=sys.stderr)
    with open(os.path.join(REPO, "plans", "r12", "audit.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
