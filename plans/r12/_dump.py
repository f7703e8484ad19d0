#!/usr/bin/env python
"""Dump `.explain("formatted")` for the round-12 plan evidence.

Writes plans/r12/<query>_before.txt (built from the round-open base ref's
code via the same module-isolated worktree import bench.py --ab uses) and
plans/r12/<query>_after.txt (HEAD working tree) for every query named on
the command line, or the bench headline set by default.

Usage:
    python plans/r12/_dump.py BASE_REF [q1 q2 ...]

Streaming queries dump their BATCH TWIN's plan (the drained memory sink's
own plan is a meaningless LocalTableScan — same convention as bench.py's
plan_sha).
"""

from __future__ import annotations

import contextlib
import io
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from bench import HEADLINE, HEADLINE2, _load_base_registry  # noqa: E402
from apachebeam_python_spark import queries as q  # noqa: E402
from apachebeam_python_spark.operators.dedup import (  # noqa: E402
    release_signature_caches,
)
from apachebeam_python_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

OUT_DIR = os.path.join(REPO, "plans", "r12")

#: streaming slots explain their batch twin (see module docstring)
BATCH_TWINS = {
    "q_stream_tumbling": (
        "apachebeam_python_spark.streaming.jobs",
        "tumbling_counts_batch_twin",
    ),
}


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _twin_or_query(name: str, modules: dict | None):
    """Resolve the callable for `name`, honoring the batch-twin table. When
    `modules` is given (base side), resolve through THAT module set."""
    if name in BATCH_TWINS:
        mod_name, fn_name = BATCH_TWINS[name]
        mod = (modules or sys.modules)[mod_name]
        return getattr(mod, fn_name)
    if modules is not None:
        qmod = modules["apachebeam_python_spark.queries"]
        return qmod.QUERIES[name]
    return q.QUERIES[name]


def main() -> None:
    base_ref = sys.argv[1]
    names = sys.argv[2:] or (HEADLINE + HEADLINE2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    base_dir = tempfile.mkdtemp(prefix="spark_graft_plans_base_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", base_dir, base_ref],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        base = _load_base_registry(base_dir)
        spark = get_spark("plan-dump")
        spark.sparkContext.setLogLevel("ERROR")
        head_mods = {
            k: v for k, v in sys.modules.items()
            if k.split(".")[0] == "apachebeam_python_spark"
        }

        @contextlib.contextmanager
        def base_modules():
            for k in [k for k in list(sys.modules)
                      if k.split(".")[0] == "apachebeam_python_spark"]:
                del sys.modules[k]
            sys.modules.update(base["modules"])
            try:
                yield
            finally:
                for k in [k for k in list(sys.modules)
                          if k.split(".")[0] == "apachebeam_python_spark"]:
                    del sys.modules[k]
                sys.modules.update(head_mods)

        for name in names:
            hdr = (
                f"-- {name} @ sf_dir={sf_dir}\n"
                + (
                    "-- NOTE: streaming query; this is its BATCH TWIN's plan "
                    "(bench.py plan_sha convention)\n"
                    if name in BATCH_TWINS else ""
                )
            )
            try:
                with base_modules():
                    fn = _twin_or_query(name, base["modules"])
                    txt = _explain(fn(spark, sf_dir))
                base["release"]()
                with open(os.path.join(OUT_DIR, f"{name}_before.txt"), "w") as fh:
                    fh.write(f"{hdr}-- base ref: {base_ref}\n\n{txt}")
            except Exception as exc:  # noqa: BLE001
                print(f"before {name}: FAILED {exc}", file=sys.stderr)
            try:
                fn = _twin_or_query(name, None)
                txt = _explain(fn(spark, sf_dir))
                release_signature_caches()
                with open(os.path.join(OUT_DIR, f"{name}_after.txt"), "w") as fh:
                    fh.write(f"{hdr}-- HEAD working tree\n\n{txt}")
            except Exception as exc:  # noqa: BLE001
                print(f"after {name}: FAILED {exc}", file=sys.stderr)
            print(f"dumped {name}", file=sys.stderr)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", base_dir],
            cwd=REPO, check=False, capture_output=True,
        )


if __name__ == "__main__":
    main()
