"""bench.py --ab registry-isolation invariants (r11, VERDICT r10 #3).

The interleaved A/B's correctness rests on two properties that failed
silently before they were pinned: (1) loading the base ref's registry must
not REPLACE head's modules — after the load, sys.modules must hold the
exact same module objects as before; (2) the loaded base registry must be a
real, populated registry with its own release hook. The module-SWAP around
base-side calls (the lazy-import fix — base builders do function-body
imports that resolve through sys.modules by name) lives inside run_ab and
is proven end-to-end by the committed A/B artifacts' differing plan shas
(BENCH_AB_r11_pagerank_kernel.json: plan_changed true).
"""

from __future__ import annotations

import json
import pathlib
import sys

import pytest

pytestmark = pytest.mark.driver  # fast-gate tier: pure-Python module checks

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_load_base_registry_restores_head_modules():
    import bench
    from apachebeam_python_spark import queries as q

    before = {
        k: v
        for k, v in sys.modules.items()
        if k.split(".")[0] == "apachebeam_python_spark"
    }
    # the repo root itself is a valid "base dir" for the isolation check:
    # the loader must import a SEPARATE module object set and put ours back
    base = bench._load_base_registry(str(REPO))
    after = {
        k: v
        for k, v in sys.modules.items()
        if k.split(".")[0] == "apachebeam_python_spark"
    }
    assert before.keys() == after.keys()
    for k in before:
        assert before[k] is after[k], f"head module {k} was replaced"
    # the base registry is real, populated, and DISTINCT from head's objects
    assert len(base["queries"]) >= 400
    assert callable(base["release"])
    assert base["queries"]["q_pricing_summary"] is not q.QUERIES["q_pricing_summary"]
    # and the captured base module set is the base's, not head's
    assert base["modules"]["apachebeam_python_spark"] is not sys.modules[
        "apachebeam_python_spark"
    ]


def test_ab_artifacts_record_the_isolation_caveat():
    """The committed A/B artifacts must carry the worker-module caveat and,
    for the pagerank lever, a changed plan sha — the signal whose ABSENCE
    exposed the lazy-import leak in the first place."""
    pr = json.loads((REPO / "BENCH_AB_r11_pagerank_kernel.json").read_text())
    assert "caveat" in pr and "worker" in pr["caveat"].lower()
    assert pr["queries"]["q_pagerank"]["plan_changed"] is True
    assert pr["queries"]["q_pagerank"]["ratio_base_over_head"] >= 1.3
