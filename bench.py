#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ...}

Output contract (round 6, VERDICT r5 #1): stdout carries ONLY that compact
headline line — round 5's line grew past the driver's output capture
(BENCH_r05.json came back ``parsed: null`` with just a tail), losing the
contractual metric. Everything else (cold/warm passes, plan fingerprints,
the plan-sha diff vs the committed baseline, the scaling curve) is written
to ``BENCH_DETAIL.json`` next to this script (override with
$SPARK_GRAFT_BENCH_DETAIL; set it empty to skip the file).

Each query materializes fully via the noop sink (count() alone would let
Catalyst prune work). Timings are wall-clock per query after a shared
session warm-up.

Warm-up includes LAYOUT MAINTENANCE (round 3, VERDICT r2 #2): fixture
parquet arrives as one giant row group per table — parquet's split unit —
which caps every scan at one task no matter how many cores exist. The
round-2 bench regression was exactly this serial-scan floor. The warm-up
rewrites the tables into multi-file copies under a temp dir via
``sources.layout.rewrite_for_parallel_scan`` (the lake-maintenance story
applied to the harness's own inputs) and times queries against those.
``SPARK_GRAFT_BENCH_COMPACT=0`` disables it to measure the raw layout.

Comparability across rounds (round 4, VERDICT r3 #5): the JSON carries
``plan_sha`` — a location-/exprId-stripped sha256 of each headline query's
executed plan. Same fingerprint + different timing ⇒ host noise; different
fingerprint ⇒ a real plan change. Round 3 spent an hour attributing
+25–49 % per-query deltas to a slower VM; the fingerprint makes that a
field compare. Streaming headlines fingerprint their batch twin (round 5,
VERDICT r4 #5) — the drained sink's own plan is a meaningless
LocalTableScan.

Scaling evidence (round 5, VERDICT r4 #7): the JSON carries ``scaling`` —
the headline set re-timed at sf0.01 with per-query scaling exponents and a
``superlinear`` flag list (the signature of an all-pairs plan that
correctness tests can't see). ``SPARK_GRAFT_BENCH_SF1=1`` adds a ~10×
key-shifted replica point; ``SPARK_GRAFT_BENCH_SCALING=0`` skips the
section. Scaling points measured by PRIOR runs are preserved (round 7,
VERDICT r6 #2): BENCH_DETAIL.json is merged by sf-key union instead of
overwritten, so a driver run without SPARK_GRAFT_BENCH_SF1 no longer
clobbers the committed sf1.0 evidence (carried points are listed in
``carried_sfs``; exponents always come from THIS run's fresh pair).

Host calibration (round 7, VERDICT r6 #1): the headline total drifted
8.42→8.44→9.87 s over rounds 4-6 with all 15 plan fingerprints unchanged —
"host noise" was load-bearing and unmeasured. The bench now times a fixed,
fixture-independent probe suite inside the same Spark JVM (32-way codegen
arithmetic, a single-partition sort, a shuffle round-trip; best-of-three
each) and reports it in the stdout line (``host_probe_sec``) plus a
``host_factor`` vs the committed anchor in PLAN_SHA_BASELINE.json.
BENCH_DETAIL.json carries the per-probe split and a probe-normalized
per-query table (``queries_normalized`` = raw / host_factor) so
round-over-round drift is attributable in one glance: normalized times
move ⇒ real change; only raw moves ⇒ the host did.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apachebeam_python_spark import queries as q  # noqa: E402
from apachebeam_python_spark.session import get_spark, table  # noqa: E402

HEADLINE = [
    "q_pricing_summary",
    "q_join_inner",
    "q_star_join",
    "q_join_broadcast",
    "q_join_asof",
    "q_win_running_sum",
    "q_topk_per_key",
    "q_tumbling_window",
    "q_session_window",
    "q_wordcount",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_cosine_topk",
    # the scale-safe ANN arm (round 7, VERDICT r6 #4): tracked ALONGSIDE the
    # quadratic exactness anchor q_cosine_topk, so the path that actually
    # survives 100 TB (packed sign codes, popcount(xor), WindowGroupLimit
    # top-k) has a recorded number and a pinned plan_sha of its own
    "q_binary_hamming",
    "q_multimodal_meta",
    "q_stream_tumbling",
]

#: Second pinned tier (round 9, VERDICT r8 #3): the original 16-query
#: headline is frozen at its round-1 composition for cross-round continuity,
#: but under-represents what the engine now is. Tier 2 adds one
#: representative of each major family the engine grew since: a TPC-H deep
#: multi-join (Q8 market share), an iterative graph algorithm (PageRank),
#: Arrow-batched model inference (RunInference lifecycle), an exact
#: set-similarity join (prefix-filtered), and a lake snapshot read
#: (manifest-pruned time travel). Same three-pass best-of-three protocol,
#: its own plan_sha pins and normalized round-over-round table; the tier-1
#: numbers and their baseline remain untouched.
HEADLINE2 = [
    "q_market_share",
    "q_pagerank",
    "q_run_inference",
    "q_setsim_join",
    "q_lake_snapshot",
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def host_probe(spark) -> dict:
    """Fixed host-calibration suite (round 7, VERDICT r6 #1): three
    fixture-independent workloads inside the bench's own Spark JVM, each
    best-of-three — same convention as the headline queries.

    - ``cpu32``: 2e8-row codegen modulo-sum across 32 partitions — parallel
      JVM arithmetic throughput (what scan+filter+project queries see).
    - ``sort1``: 3e6-row single-partition sort — single-thread speed (what
      per-key window sorts see).
    - ``shuffle``: 2e7 rows → 1e5-key groupBy — exchange write/read + hash
      agg machinery (what every shuffle boundary sees).

    The mix is deliberately the three resources headline plans spend; a
    uniform raw slowdown with an unchanged probe would be a real regression,
    a slowdown matched by the probe is the host."""

    def best_of(fn, n=3):
        best = None
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    cpu32 = best_of(
        lambda: spark.range(0, 200_000_000, 1, 32)
        .selectExpr("sum(id % 1000007) AS s")
        .collect()
    )
    sort1 = best_of(
        lambda: materialize(
            spark.range(0, 3_000_000, 1, 1)
            .selectExpr("id", "(id * 2654435761) % 1000003 AS k")
            .sortWithinPartitions("k")
        )
    )
    shuffle = best_of(
        lambda: materialize(
            spark.range(0, 20_000_000, 1, 32)
            .selectExpr("id % 100000 AS k")
            .groupBy("k")
            .count()
        )
    )
    return {
        "cpu32": cpu32,
        "sort1": sort1,
        "shuffle": shuffle,
        "total": round(cpu32 + sort1 + shuffle, 3),
    }


def _load_base_registry(base_dir: str) -> dict:
    """Import the BASE ref's query registry in-process, isolated from
    HEAD's modules: snapshot sys.modules, import the worktree's package,
    capture its registry + cache-release hook, then restore HEAD's modules.
    Both versions coexist afterwards as distinct module objects (each
    function keeps references to ITS OWN defining modules)."""
    import importlib

    saved = {
        k: v
        for k, v in sys.modules.items()
        if k.split(".")[0] == "apachebeam_python_spark"
    }
    for k in saved:
        del sys.modules[k]
    sys.path.insert(0, base_dir)
    try:
        bq = importlib.import_module("apachebeam_python_spark.queries")
        bd = importlib.import_module("apachebeam_python_spark.operators.dedup")
        base_mods = {
            k: v
            for k, v in sys.modules.items()
            if k.split(".")[0] == "apachebeam_python_spark"
        }
        return {
            "queries": dict(bq.QUERIES),
            "release": bd.release_signature_caches,
            # the full base module set: query builders routinely do LAZY
            # function-body imports (``from ..operators.x import y`` at
            # CALL time), which resolve through sys.modules by NAME — a
            # base call made under HEAD's modules silently executes HEAD
            # operators (caught r11: both q_pagerank sides produced the
            # SAME plan sha). run_ab swaps this set in around every base
            # call.
            "modules": base_mods,
        }
    finally:
        sys.path.remove(base_dir)
        for k in [
            k
            for k in list(sys.modules)
            if k.split(".")[0] == "apachebeam_python_spark"
        ]:
            del sys.modules[k]
        sys.modules.update(saved)


def run_ab(base_ref: str, names: list[str] | None = None) -> None:
    """Interleaved same-session A/B vs a base git ref (r11, VERDICT r10 #3).

    Cross-round bench totals are formally untrusted on this host (both r10
    runs flagged both tiers — probe-bracket spreads 14–32% within minutes),
    so the only valid optimization/regression evidence is base and HEAD
    timed ADJACENTLY in ONE Spark session, where host drift hits both sides
    equally. This mode standardizes the ad-hoc methodology that proved the
    r10 setsim levers:

    - the base ref is materialized via ``git worktree`` and its query
      registry imported in-process (module-isolated from HEAD's);
    - per query, three base/head pairs run back-to-back with the pair
      order alternating (BH, HB, BH) so a monotone host drift cancels;
    - the ratio is base_best / head_best (>1 ⇒ HEAD faster), written with
      both sides' raw passes and plan fingerprints to BENCH_AB.json;
    - the whole run is probe-bracketed; the bracket gates only the
      CROSS-run comparability of the absolute numbers — the ratios are
      within-session by construction.

    KNOWN CAVEAT (documented in the artifact): Spark's Python workers
    import modules by NAME, which resolves to HEAD's repo — so a base
    query whose lever lives in worker-side module-level Python (a Pandas
    UDF helper in sources/operators) may execute HEAD's worker code.
    Plan-level levers (join strategies, filters, persists, shuffles) are
    compared faithfully; worker-side-Python levers still need the inline
    two-variant method. Closures defined INSIDE query builders are pickled
    by value and stay faithful to their side.
    """
    import shutil
    import subprocess
    import tempfile

    from apachebeam_python_spark.operators.dedup import release_signature_caches
    from apachebeam_python_spark.plans.inspect import plan_fingerprint
    from apachebeam_python_spark.session import (
        DEFAULT_SF_DIR,
        TABLES,
        get_spark,
        table,
    )
    from apachebeam_python_spark.sources.layout import rewrite_for_parallel_scan

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    head_desc = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=repo_dir, capture_output=True, text=True, check=True,
    ).stdout.strip()
    dirty = bool(
        subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=repo_dir, capture_output=True, text=True, check=True,
        ).stdout.strip()
    )
    base_dir = tempfile.mkdtemp(prefix="spark_graft_ab_base_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", base_dir, base_ref],
        cwd=repo_dir, check=True, capture_output=True,
    )
    try:
        base = _load_base_registry(base_dir)
        spark = get_spark("bench-ab")
        spark.sparkContext.setLogLevel("ERROR")
        table(spark, sf_dir, "lineitem").count()  # warm-up
        bench_dir = tempfile.mkdtemp(prefix="spark_graft_bench_")
        rewrite_for_parallel_scan(spark, sf_dir, bench_dir, TABLES)
        if not names:
            names = [
                n for n in HEADLINE + HEADLINE2 if n in base["queries"]
            ]
        skipped = [n for n in names if n not in base["queries"]]
        names = [n for n in names if n in base["queries"]]

        import contextlib

        head_mods = {
            k: v
            for k, v in sys.modules.items()
            if k.split(".")[0] == "apachebeam_python_spark"
        }

        @contextlib.contextmanager
        def base_modules():
            """Swap the base ref's module set into sys.modules for the
            duration of a base-side call, so the builders' lazy
            function-body imports resolve to BASE code (see
            _load_base_registry)."""
            for k in [
                k
                for k in list(sys.modules)
                if k.split(".")[0] == "apachebeam_python_spark"
            ]:
                del sys.modules[k]
            sys.modules.update(base["modules"])
            try:
                yield
            finally:
                for k in [
                    k
                    for k in list(sys.modules)
                    if k.split(".")[0] == "apachebeam_python_spark"
                ]:
                    del sys.modules[k]
                sys.modules.update(head_mods)

        def run_one(fn, is_base: bool) -> float:
            ctx = base_modules() if is_base else contextlib.nullcontext()
            with ctx:
                t0 = time.monotonic()
                materialize(fn(spark, bench_dir))
                dt = round(time.monotonic() - t0, 3)
            base["release"]()
            release_signature_caches()
            return dt

        pb_before = host_probe(spark)
        per_query: dict[str, dict] = {}
        for name in names:
            b_fn, h_fn = base["queries"][name], q.QUERIES[name]
            # untimed warm-up pair: codegen/JIT/file-cache warm BOTH sides
            # before any timed pass, else the first-run side eats the cold
            # cost (measured: identical plans showed a spurious 1.38× on a
            # sub-second query without this)
            run_one(b_fn, True)
            run_one(h_fn, False)
            b_times, h_times = [], []
            for i in range(3):
                order = [("b", b_fn), ("h", h_fn)]
                if i == 1:  # alternate pair order: BH, HB, BH
                    order.reverse()
                for side, fn in order:
                    (b_times if side == "b" else h_times).append(
                        run_one(fn, side == "b")
                    )
            b_best, h_best = min(b_times), min(h_times)
            entry = {
                "base": b_times,
                "head": h_times,
                "base_best": b_best,
                "head_best": h_best,
                "ratio_base_over_head": round(b_best / h_best, 3)
                if h_best
                else None,
            }
            try:
                with base_modules():
                    sb = plan_fingerprint(
                        base["queries"][name](spark, sf_dir)
                    )
                sh = plan_fingerprint(q.QUERIES[name](spark, sf_dir))
                entry["plan_sha_base"] = sb
                entry["plan_sha_head"] = sh
                entry["plan_changed"] = sb != sh
            except Exception:
                pass
            base["release"]()
            release_signature_caches()
            per_query[name] = entry
            print(
                f"AB {name}: base {b_best} head {h_best} "
                f"ratio {entry['ratio_base_over_head']}",
                file=sys.stderr,
            )
        pb_after = host_probe(spark)
        lo, hi = sorted([pb_before["total"], pb_after["total"]])
        spread = round(hi / lo - 1.0, 3) if lo else None
        out = {
            "mode": "interleaved_ab",
            "base_ref": base_ref,
            "head": head_desc + ("+dirty" if dirty else ""),
            "sf_dir": sf_dir,
            "probe_bracket": {
                "before": pb_before,
                "after": pb_after,
                "spread": spread,
                # gates only cross-RUN use of the absolute numbers; the
                # per-query ratios are within-session by construction
                "trusted_for_comparison": spread is not None
                and spread <= 0.10,
            },
            "queries": per_query,
            "skipped_not_in_base": skipped,
            "caveat": (
                "python workers import modules by NAME (resolving to HEAD's "
                "repo): base-side worker-module Python may execute HEAD "
                "code — plan-level levers compare faithfully, worker-side-"
                "Python levers need the inline two-variant method"
            ),
        }
        ab_path = os.environ.get(
            "SPARK_GRAFT_BENCH_AB", os.path.join(repo_dir, "BENCH_AB.json")
        )
        with open(ab_path, "w") as fh:
            json.dump(out, fh, indent=2)
            fh.write("\n")
        shutil.rmtree(bench_dir, ignore_errors=True)
        print(
            json.dumps(
                {
                    "metric": "ab_ratio_base_over_head",
                    "base_ref": base_ref,
                    "queries": {
                        n: e["ratio_base_over_head"]
                        for n, e in per_query.items()
                    },
                    "probe_spread": spread,
                }
            )
        )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", base_dir],
            cwd=repo_dir, capture_output=True,
        )
        shutil.rmtree(base_dir, ignore_errors=True)


def main() -> None:
    from apachebeam_python_spark.session import DEFAULT_SF_DIR

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    m = re.match(r"sf([0-9.]+)$", os.path.basename(os.path.normpath(sf_dir)))
    try:
        sf = float(m.group(1)) if m else os.path.basename(os.path.normpath(sf_dir))
    except ValueError:
        sf = os.path.basename(os.path.normpath(sf_dir))
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, file cache, and the Python/Arrow worker pool (one-time
    # per-executor process spin-up — amortized noise at any real scale)
    table(spark, sf_dir, "lineitem").count()
    table(spark, sf_dir, "events").count()
    from apachebeam_python_spark.session import TABLES, fan_out

    # pass-through schema comes from the loaded table itself, so a fixture
    # schema change can't break the bench at warm-up time
    region = fan_out(table(spark, sf_dir, "region"))
    region.mapInPandas(lambda it: it, schema=region.schema).count()

    # host calibration (round 7, VERDICT r6 #1): measured after warm-up,
    # inside the same JVM the queries will use
    probe = host_probe(spark)

    # core-scaling probe (r12, VERDICT r11 #2): the host probe's cpu32 is
    # sized for drift detection and saturates at job overhead (measured
    # 0.191 s at 32 cores vs 0.198 s at 8 — ratio ≈ 1), so it cannot tell
    # the driver whether the bench honors $SPARK_GRAFT_CPUS. This probe is
    # 20× heavier (4e9-row codegen modulo-sum, 64 partitions, best-of-2 —
    # ~0.5 s at 32 cores), so its low/high-core ratio ≈ the core ratio on
    # a healthy harness while the sub-second tier queries remain
    # fixed-overhead-bound at sf0.1. Fixture-independent; additive to the
    # stdout contract ("scale_probe_sec"); NOT part of host_probe, whose
    # composition is pinned by the committed anchor in
    # PLAN_SHA_BASELINE.json.
    def _scale_probe() -> float:
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            spark.range(0, 4_000_000_000, 1, 64).selectExpr(
                "sum(id % 1000007) AS s"
            ).collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    scale_probe = _scale_probe()

    # layout maintenance (see module docstring): queries run against a
    # multi-row-group rewrite of the fixture so scans parallelize
    if os.environ.get("SPARK_GRAFT_BENCH_COMPACT", "1") != "0":
        import tempfile

        from apachebeam_python_spark.sources.layout import rewrite_for_parallel_scan

        bench_dir = tempfile.mkdtemp(prefix="spark_graft_bench_")
        cleanup_dir = bench_dir  # full fixture copy — remove on exit
        rewrite_for_parallel_scan(spark, sf_dir, bench_dir, TABLES)
    else:
        bench_dir = sf_dir
        cleanup_dir = None

    from apachebeam_python_spark.operators.dedup import release_signature_caches

    def run(name: str, in_dir: str = None) -> float:
        start = time.monotonic()
        materialize(q.QUERIES[name](spark, in_dir or bench_dir))
        elapsed = round(time.monotonic() - start, 3)
        # deterministic cache lifecycle (VERDICT r2 #7): signature tables
        # must not accumulate across queries/passes
        release_signature_caches()
        return elapsed

    # tier-SEQUENTIAL passes (r10 restructure, noted per ADVICE r10 #2):
    # tier 1 runs three full passes, THEN tier 2 runs three — so tier 2's
    # pass-0 "cold" run executes after six tier-1 passes and value_cold /
    # value_warm for tier 2 are not comparable to pre-r10 BENCH_DETAIL
    # files, beyond what the probe brackets flag. Best-of-three per query:
    # pass 1 is the cold run (codegen/JIT compile); passes 2-3 are steady
    # state. The
    # contract value is the per-query minimum — a real, fully-measured
    # wall-clock, the standard convention for damping transient host noise
    # (this box shows random multi-second steal-time stalls that can hit
    # ANY single pass; two passes were not enough to dodge them reliably).
    # Probe brackets (r10, VERDICT r9 #3): the single pre-run probe was
    # blind to sustained host steal landing DURING the tiers — sub-second
    # probe bursts dodge multi-second stalls that inflate 1–10 s queries
    # 15–30% (documented r9). Each tier is now bracketed by its own probe
    # burst (tier1: before/mid, tier2: mid/after — 4 bracket endpoints over
    # 3 bursts); a tier whose bracket totals disagree by >10% is flagged
    # untrusted-for-comparison in BENCH_DETAIL, machine-readable, so
    # round-over-round deltas on a degrading host can be discarded by field
    # instead of by README footnote.
    scaling = None
    probe_brackets = None
    try:
        pb_before = host_probe(spark)
        passes1 = [{name: run(name) for name in HEADLINE} for _ in range(3)]
        pb_mid = host_probe(spark)
        passes2 = [{name: run(name) for name in HEADLINE2} for _ in range(3)]
        pb_after = host_probe(spark)
        passes = [{**p1, **p2} for p1, p2 in zip(passes1, passes2)]
        best = {n: min(p[n] for p in passes1) for n in HEADLINE}
        best2 = {n: min(p[n] for p in passes2) for n in HEADLINE2}

        def _bracket(before: dict, after: dict) -> dict:
            lo, hi = sorted([before["total"], after["total"]])
            spread = round(hi / lo - 1.0, 3) if lo else None
            return {
                "before": before,
                "after": after,
                "spread": spread,
                "trusted_for_comparison": spread is not None and spread <= 0.10,
            }

        probe_brackets = {
            "tier1": _bracket(pb_before, pb_mid),
            "tier2": _bracket(pb_mid, pb_after),
        }

        # scaling curve (VERDICT r4 #7): re-time the headline set at a lower
        # sf (same parallel-scan layout) and report the per-query scaling
        # exponent alpha = ln(t_hi/t_lo)/ln(sf_hi/sf_lo) from the two LARGEST
        # measured points. alpha ≈ 1 = linear (what a scan/shuffle plan
        # should be), alpha > SUPERLINEAR_AT with non-trivial runtime is
        # flagged — the signature of an all-pairs or fan-out plan that
        # correctness tests can't see. SPARK_GRAFT_BENCH_SF1=1 adds a ~10×
        # key-shifted replica (sources.layout.replicate_scaled) as a third
        # point so the exponent comes from 0.1→~1 instead of 0.01→0.1.
        # guarded end to end (round-5 review #1): the scaling section is
        # EVIDENCE — it must never cost the bench its headline JSON. It
        # also needs two DISTINCT sf points: benching at sf0.01 itself
        # (sf == lo_sf) leaves one point, so the section is skipped there
        # rather than crashing after all passes were measured.
        try:
          if os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0" and isinstance(sf, float):
            import math
            import shutil
            import tempfile

            from apachebeam_python_spark.sources.layout import replicate_scaled

            SUPERLINEAR_AT = 1.15
            NOISE_FLOOR_SEC = 0.05  # exponents from sub-50ms points are timer noise
            lo_sf = 0.01
            lo_src = os.environ.get(
                "SPARK_GRAFT_BENCH_SCALE_LO", "/root/testdata/sf0.01"
            )
            points: list[tuple[float, str, str | None]] = []  # (sf, dir, cleanup)
            if abs(sf - lo_sf) > 1e-12 and os.path.isdir(lo_src):
                lo_dir = tempfile.mkdtemp(prefix="spark_graft_scale_lo_")
                rewrite_for_parallel_scan(spark, lo_src, lo_dir, TABLES)
                points.append((lo_sf, lo_dir, lo_dir))
            points.append((sf, bench_dir, None))
            if os.environ.get("SPARK_GRAFT_BENCH_SF1", "0") == "1":
                hi_dir = tempfile.mkdtemp(prefix="spark_graft_scale_hi_")
                replicate_scaled(spark, bench_dir, hi_dir, copies=10)
                points.append((sf * 10, hi_dir, hi_dir))
            try:
                times: dict[float, dict[str, float]] = {}
                for p_sf, p_dir, _ in points:
                    if p_dir == bench_dir:
                        # already measured, best-of-three (both tiers)
                        times[p_sf] = {**best, **best2}
                        continue
                    two = [
                        {n: run(n, p_dir) for n in HEADLINE + HEADLINE2}
                        for _ in range(2)
                    ]
                    times[p_sf] = {
                        n: min(t[n] for t in two) for n in HEADLINE + HEADLINE2
                    }
                sfs = sorted(times)
                if len(sfs) < 2:
                    raise ValueError("scaling needs two distinct sf points")
                hi, lo = sfs[-1], sfs[-2]
                ratio = math.log(hi / lo)
                per_q = {}
                superlinear = []
                for n in HEADLINE + HEADLINE2:
                    t_lo, t_hi = times[lo][n], times[hi][n]
                    alpha = (
                        round(math.log(t_hi / t_lo) / ratio, 3)
                        if min(t_lo, t_hi) >= NOISE_FLOOR_SEC
                        else None
                    )
                    per_q[n] = {
                        **{str(s): times[s][n] for s in sfs},
                        "exponent": alpha,
                    }
                    if alpha is not None and alpha > SUPERLINEAR_AT and t_hi > 0.3:
                        superlinear.append(n)
                scaling = {
                    "sfs": sfs,
                    "exponent_between": [lo, hi],
                    "queries": per_q,
                    "superlinear": superlinear,
                }
            finally:
                for _, _, cl in points:
                    if cl is not None:
                        shutil.rmtree(cl, ignore_errors=True)
        except Exception as exc:  # noqa: BLE001 — evidence, never the metric
            print(f"scaling section skipped: {exc}", file=sys.stderr)
            scaling = None
    finally:
        if cleanup_dir is not None:
            import shutil

            shutil.rmtree(cleanup_dir, ignore_errors=True)

    # plan fingerprints (VERDICT r3 #5): computed against the ORIGINAL
    # fixture dir (stable location-independent hash) so round-over-round
    # bench JSONs are comparable — a timing delta with an unchanged
    # fingerprint is host noise, with a changed one a plan regression.
    from apachebeam_python_spark.plans.inspect import plan_fingerprint

    # streaming slots fingerprint their BATCH TWIN (VERDICT r4 #5): building
    # the streamed DataFrame re-runs the whole drain and yields a memory-sink
    # LocalTableScan (real cost, meaningless sha), so the tripwire hashes the
    # same agg subtree expressed as a batch plan instead — the part whose
    # regression (lost partial agg, changed shuffle) would actually matter.
    from apachebeam_python_spark.streaming.jobs import tumbling_counts_batch_twin

    BATCH_TWINS = {"q_stream_tumbling": tumbling_counts_batch_twin}
    plan_sha = {}
    for name in HEADLINE + HEADLINE2:
        fn = BATCH_TWINS.get(name, q.QUERIES.get(name))
        try:
            plan_sha[name] = plan_fingerprint(fn(spark, sf_dir))
        except Exception:
            plan_sha[name] = None
    release_signature_caches()

    # plan-sha tripwire diff (round 6, VERDICT r5 #2): compare against the
    # committed, last-TRIAGED baseline so a plan change surfaces as a named
    # list in the detail artifact instead of a manual field compare. Changes
    # get a one-line cause in README's bench-comparability section, then the
    # baseline is updated.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    baseline_path = os.path.join(repo_dir, "PLAN_SHA_BASELINE.json")
    plan_sha_changed = None
    plan_sha_new = None
    baseline_round = None
    probe_baseline = None
    try:
        with open(baseline_path) as fh:
            baseline = json.load(fh)
        baseline_round = baseline.get("round")
        probe_baseline = baseline.get("host_probe")
        # "changed" means the baseline HAD a pin and the sha moved; a query
        # the baseline has never seen (a fresh tier-2 slot) is "new", not
        # a drift flag — it gets its pin at the next triaged baseline update
        baseline_sha = baseline.get("plan_sha", {})
        plan_sha_changed = sorted(
            n
            for n in HEADLINE + HEADLINE2
            if n in baseline_sha and plan_sha.get(n) != baseline_sha.get(n)
        )
        plan_sha_new = sorted(
            n for n in HEADLINE + HEADLINE2 if n not in baseline_sha
        )
    except OSError:
        plan_sha_new = None

    # host_factor: this run's probe total over the committed anchor's —
    # >1 ⇒ this host is that much slower than the one that set the anchor.
    # queries_normalized divides raw times by it, making round-over-round
    # tables comparable without arguing about VM speed.
    host_factor = (
        round(probe["total"] / probe_baseline["total"], 3)
        if probe_baseline and probe_baseline.get("total")
        else None
    )
    normalized = (
        {n: round(best[n] / host_factor, 3) for n in HEADLINE}
        if host_factor
        else None
    )
    normalized2 = (
        {n: round(best2[n] / host_factor, 3) for n in HEADLINE2}
        if host_factor
        else None
    )

    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", os.path.join(repo_dir, "BENCH_DETAIL.json")
    )
    if detail_path:
        # merge-by-sf-union (round 7, VERDICT r6 #2): a run without the sf1
        # replica must not clobber committed scaling evidence. Points from
        # the prior artifact that this run did not re-measure are carried
        # into the tables (named in carried_sfs); exponents/superlinear
        # always come from THIS run's fresh pair only.
        prior_detail = {}
        try:
            with open(detail_path) as fh:
                prior_detail = json.load(fh)
        except (OSError, ValueError):
            pass
        prior_scaling = prior_detail.get("scaling")
        if prior_scaling and prior_scaling.get("sfs"):
            if scaling is None:
                # No fresh pair this run: carry the POINTS but strip the
                # derived exponents/superlinear keys — they were computed
                # by an older run against possibly different code, and
                # republishing them verbatim would contradict the
                # "exponents from THIS run only" contract (ADVICE r7 #3).
                scaling = {
                    k: v
                    for k, v in prior_scaling.items()
                    if k not in ("exponent_between", "exponents", "superlinear")
                }
                scaling["carried_sfs"] = prior_scaling["sfs"]
                scaling["exponents"] = None
                scaling["superlinear"] = None
                scaling["exponents_note"] = (
                    "no fresh sf pair this run; carried points only"
                )
            else:
                carried = [
                    s for s in prior_scaling["sfs"] if s not in scaling["sfs"]
                ]
                for s in carried:
                    for n, pq in prior_scaling.get("queries", {}).items():
                        if str(s) in pq and n in scaling["queries"]:
                            scaling["queries"][n][str(s)] = pq[str(s)]
                if carried:
                    scaling["sfs"] = sorted(scaling["sfs"] + carried)
                    scaling["carried_sfs"] = sorted(
                        set(carried) | set(prior_scaling.get("carried_sfs", []))
                    )
        # Normalized round-over-round comparison (round 8, VERDICT r7 #2):
        # the host probe exists so consecutive rounds compare on PROBE-
        # normalized times, not raw ones. Per query: pct drift of this
        # run's normalized time vs the PRIOR committed BENCH_DETAIL's.
        # Regression budget: |drift| > 20% with an UNCHANGED plan_sha is
        # flagged by name — each flag needs a root cause in README's
        # bench-comparability section or the query is marked perf-weak.
        def _vs_prior(norm, prior_norm, names, prior_total_key):
            if not (norm and prior_norm):
                return None
            per_query = {
                n: round(100.0 * (norm[n] / prior_norm[n] - 1.0), 1)
                for n in names
                if n in prior_norm and prior_norm[n]
            }
            flagged = sorted(
                n
                for n, pct in per_query.items()
                if abs(pct) > 20.0
                and (plan_sha_changed is None or n not in plan_sha_changed)
            )
            return {
                "prior_value_normalized": prior_detail.get(prior_total_key),
                "per_query_pct": per_query,
                "budget_pct": 20.0,
                "drift_flagged_same_plan": flagged,
            }

        normalized_vs_prior = _vs_prior(
            normalized, prior_detail.get("queries_normalized"), HEADLINE,
            "value_normalized",
        )
        normalized_vs_prior_tier2 = _vs_prior(
            normalized2, prior_detail.get("queries_normalized_tier2"), HEADLINE2,
            "value_normalized_tier2",
        )
        with open(detail_path, "w") as fh:
            json.dump(
                {
                    "sf": sf,
                    "host_probe": probe,
                    "host_probe_baseline": probe_baseline,
                    "host_factor": host_factor,
                    "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                    "scale_probe_sec": scale_probe,
                    # per-tier probe brackets + trust flags (r10, VERDICT
                    # r9 #3) — cross-run comparisons must skip tiers where
                    # trusted_for_comparison is false
                    "probe_brackets": probe_brackets,
                    "untrusted_tiers": (
                        sorted(
                            t
                            for t, b in probe_brackets.items()
                            if not b["trusted_for_comparison"]
                        )
                        if probe_brackets
                        else None
                    ),
                    "value_cold": round(sum(passes[0].values()), 3),
                    "queries_cold": passes[0],
                    "value_warm": round(sum(passes[-1].values()), 3),
                    "queries_warm": passes[-1],
                    "queries_normalized": normalized,
                    "value_normalized": (
                        round(sum(normalized.values()), 3) if normalized else None
                    ),
                    "queries_tier2": best2,
                    "value_tier2": round(sum(best2.values()), 3),
                    "queries_normalized_tier2": normalized2,
                    "value_normalized_tier2": (
                        round(sum(normalized2.values()), 3) if normalized2 else None
                    ),
                    "plan_sha": plan_sha,
                    "plan_sha_baseline_round": baseline_round,
                    "plan_sha_changed": plan_sha_changed,
                    "plan_sha_new": plan_sha_new,
                    "normalized_vs_prior": normalized_vs_prior,
                    "normalized_vs_prior_tier2": normalized_vs_prior_tier2,
                    "scaling": scaling,
                },
                fh,
                indent=2,
            )
            fh.write("\n")

    # the ONE stdout line — compact by contract; keep it well under any
    # plausible output-capture limit. host_probe_sec/host_factor make the
    # headline self-calibrating: value moved but value/host_factor didn't
    # ⇒ host drift, not a plan regression.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime_best_of_three",
                "value": round(sum(best.values()), 3),
                "unit": "sec",
                "queries": best,
                "tier2_value": round(sum(best2.values()), 3),
                "tier2_queries": best2,
                "sf": sf,
                # scaling signal (r12, VERDICT r11 #2): echo the core count
                # the session actually ran with, and the compute-bound probe
                # (2e8-row codegen sum over 32 partitions, best-of-three) —
                # its low/high-core ratio tracks the core ratio on a healthy
                # harness, unlike the sub-second fixed-overhead-bound tier
                # queries whose low/high ratios sit near 1 at sf0.1
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "cpu_probe_sec": probe["cpu32"],
                "scale_probe_sec": scale_probe,
                "host_probe_sec": probe["total"],
                "host_factor": host_factor,
            }
        )
    )


if __name__ == "__main__":
    # --ab BASE_REF [--ab-queries q1,q2,...]: interleaved same-session A/B
    # (VERDICT r10 #3). Plain invocation stays the driver's bench contract.
    if "--ab" in sys.argv:
        i = sys.argv.index("--ab")
        ref = sys.argv[i + 1]
        ab_names = None
        if "--ab-queries" in sys.argv:
            ab_names = [
                s
                for s in sys.argv[sys.argv.index("--ab-queries") + 1].split(",")
                if s
            ]
        run_ab(ref, ab_names)
    else:
        main()
