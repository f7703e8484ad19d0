#!/usr/bin/env python
"""Full-registry correctness artifact (VERDICT r4 #2).

The driver only ever exercises the frozen 50-entry window; the remaining
oracle-backed registry queries are proven inside a long pytest sweep the
judge must re-execute. This runner emits one machine-checkable JSON —
``CORRECTNESS_LOCAL_r{N}.json`` — in the driver's own per-query shape
(rows_match / schema_match / hash_match / row counts / err) for EVERY
registered query, using the driver-faithful canon from tests/parity.py.

Usage::

    python parity_dump.py [--round N] [--sf DIR] [--out FILE]

Defaults: sf0.01 (the driver's check scale), round inferred as "local",
out = CORRECTNESS_LOCAL_r{N}.json (or CORRECTNESS_LOCAL.json without
--round). Rows-only queries (no DuckDB oracle by nature — approx / seeded
/ engine-hash results) are recorded with ``"oracle": false`` and a
canon-executes check, matching the driver's weaker rows-only signal.

Exit code is nonzero if any oracle-backed query fails, so CI can gate on it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from apachebeam_python_spark import queries as q  # noqa: E402
from apachebeam_python_spark.operators.dedup import (  # noqa: E402
    release_signature_caches,
)
from apachebeam_python_spark.session import TABLES, get_spark  # noqa: E402
from tests.parity import (  # noqa: E402
    assert_driver_canon,
    driver_canon,
    duck_rows,
    spark_rows,
)

#: Empty-is-correct ledger (r11, VERDICT r10 #6): the driver-window
#: nonempty invariant (every DRIVER_ORDER query returns ≥1 row at sf0.01)
#: does not cover the other ~395 registry queries, so a query could sit
#: vacuously green — both engines agreeing on the empty set — until a
#: rotation promoted it. Every query whose result is empty at the sweep's
#: scale factor must either appear here with a reason (empty IS the
#: correct, data-determined answer — the oracle hash still verifies both
#: engines agree on it) or the sweep records it as unexplained and FAILS.
#: tests/test_parity_empty_ledger.py pins this ledger's membership.
EMPTY_OK: dict[str, str] = {
    "q_duplicate_orders": "double-billing screen: pairs need same customer "
        "+ same integer cents + dates ≤7 days apart; the synthetic orders "
        "fixture contains none at sf0.01/sf0.1 — empty IS the audit's pass "
        "state (pairs appear in the sf1 replica)",
    "q_source_overlap": "exact cross-source duplicates (same md5 in two "
        "sources); the fixture's sources are disjoint corpora at sf0.01 — "
        "overlap appears at sf0.1+",
    "q_betweenness": "bridge nodes of the ≥190-weight trade subgraph; the "
        "graph densifies with SF until no node lies on a unique shortest "
        "path (nonempty at sf0.01, empty at sf0.1/sf1)",
    "q_except": "nations minus nations-with-rich-suppliers: at sf0.1+ every "
        "nation has a supplier over the acctbal cut, so the set difference "
        "is correctly empty",
    "q_except_all": "EXCEPT ALL multiplicity difference of order-priority "
        "bags (status F vs P); at sf0.1+ the P side's multiplicities cover "
        "the F side's for every priority",
    "q_important_stock": "TPC-H Q11 share gate (part value > 0.0008 of "
        "total): more parts at larger SFs dilute every per-part share "
        "below the cut",
    "q_inverted_index": "postings are kept to the discriminative df band "
        "5–40; at sf0.1+ corpus growth pushes every recurring token past "
        "the band ceiling",
    "q_k_anonymity": "rows are k-anonymity VIOLATIONS (QI classes smaller "
        "than k=8 or single-valued sensitive attribute); more data "
        "enlarges every class past k (11 violations at sf0.01 — the "
        "driver's grade scale — none at sf0.1+)",
    "q_sparse_cosine": "TF-IDF cosine pairs over terms with df ≤ 40; at "
        "sf0.1+ every cross-doc shared term exceeds the df ceiling, so no "
        "pair survives the weighting",
    "q_misra_gries": "heavy hitters above the φ frequency threshold; the "
        "sf1 replica's salted documents flatten token frequencies below φ",
}

#: Spill dir is PER-PROCESS (r9): a shared directory let one parity
#: process's startup cleanup delete another LIVE process's temp files —
#: DuckDB hard-aborts (C++ IOException in a destructor) when a tracked
#: temp file vanishes, which killed two sweep slices before the cause was
#: found. Each process spills under its own pid-suffixed dir; stale dirs
#: of DEAD pids are removed at startup.
_SPILL_BASE = "/tmp/duckdb_spill"
_SPILL_DIR = f"{_SPILL_BASE}_{os.getpid()}"


def _spill_bytes() -> int:
    """Current on-disk size of THIS process's DuckDB spill directory."""
    total = 0
    try:
        for root, _dirs, files in os.walk(_SPILL_DIR):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    except OSError:
        pass
    return total


def _rss_bytes() -> int:
    """Resident set of THIS process (python + duckdb; the Spark JVM is a
    separate child and excluded — DuckDB is what the cap protects)."""
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
    except (OSError, ValueError, IndexError):
        return 0


class _ResourceProbe:
    """Background sampler recording peak spill-dir size and process RSS
    while one oracle executes (VERDICT r8 #7: record per-query peaks so the
    next scale-up fails predictably instead of by ENOSPC)."""

    def __init__(self, interval: float = 0.5):
        import threading

        self.interval = interval
        self.peak_spill = 0
        self.peak_rss = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def _loop(self):
        while not self._stop.is_set():
            self.peak_spill = max(self.peak_spill, _spill_bytes())
            self.peak_rss = max(self.peak_rss, _rss_bytes())
            self._stop.wait(self.interval)

    def __enter__(self):
        self.peak_rss = _rss_bytes()
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)
        # one final sample so sub-interval queries still record something
        self.peak_spill = max(self.peak_spill, _spill_bytes())
        self.peak_rss = max(self.peak_rss, _rss_bytes())


def _clean_spill() -> None:
    """Remove spill dirs left by DEAD parity processes (crashed mid-spill
    — the r8 ENOSPC class). Never touches a live process's dir: each pid
    owns its own suffix, and a dir is removed only when its pid no longer
    exists."""
    import re
    import shutil

    try:
        names = os.listdir(os.path.dirname(_SPILL_BASE) or "/")
    except OSError:
        return
    base = os.path.basename(_SPILL_BASE)
    for name in names:
        m = re.fullmatch(rf"{re.escape(base)}(?:_(\d+))?", name)
        if not m:
            continue
        pid = m.group(1)
        if pid is None:
            continue  # legacy unsuffixed dir: owner unknowable — never touch
        if os.path.exists(f"/proc/{pid}") or int(pid) == os.getpid():
            continue  # live owner (or ourselves)
        shutil.rmtree(
            os.path.join(os.path.dirname(_SPILL_BASE) or "/", name),
            ignore_errors=True,
        )


def run(
    sf_dir: str,
    out: str,
    slice_k: int | None = None,
    slice_n: int = 1,
    names_only: list[str] | None = None,
    budget_sec: float | None = None,
) -> int:
    spark = get_spark("parity-dump")
    _clean_spill()  # leftovers from a previous crashed sweep process only
    con = duckdb.connect()
    # cap the oracle engine (round 7): DuckDB's default memory_limit is 80%
    # of RAM, so ONE heavy oracle (an all-pairs exactness anchor at sf0.1)
    # can OOM-kill the whole sweep process — the r7 first attempt died at
    # 115 GB anon-rss. A hard cap + temp_directory makes DuckDB spill to
    # disk instead, like any real engine under a memory budget.
    con.execute("SET memory_limit='24GB'")
    con.execute(f"SET temp_directory='{_SPILL_DIR}'")
    # spill budget (round 9, VERDICT r8 #7): the r8 sf1 sweep died by raw
    # ENOSPC inside a quadratic oracle's spill. A hard temp-size cap makes
    # the overweight query fail with DuckDB's own "temp directory size"
    # error — recorded per-query in the artifact — instead of wedging the
    # host's disk for every query after it.
    spill_cap = os.environ.get("SPARK_GRAFT_DUCK_SPILL_CAP", "40GiB")
    con.execute(f"SET max_temp_directory_size='{spill_cap}'")
    verbose = os.environ.get("SPARK_GRAFT_PARITY_VERBOSE", "") == "1"
    for t in TABLES:
        # fixture tables are single files (driver layout) OR Spark-written
        # directories (replicate_scaled sf1 replicas, round 8) — glob the
        # directory form so DuckDB sees the same rows Spark does
        p = os.path.join(sf_dir, t) + ".parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    results: dict[str, dict] = {}
    t0 = time.time()
    last_write = 0.0
    failed = 0
    names = sorted(q.QUERIES)
    if slice_k is not None:
        # interleaved striping keeps the slices time-balanced; each slice
        # runs in a FRESH process so a 400+-query sweep at sf0.1 can't
        # accumulate JVM metaspace/codegen past the container limit (the
        # round-7 single-process run was OOM-killed near the end)
        names = [n for i, n in enumerate(names) if i % slice_n == slice_k]
    if names_only:
        # preserve the CALLER's order: with --budget, order is priority —
        # the caller front-loads the most scale-sensitive queries
        known = set(names)
        names = [n for n in names_only if n in known]
    budget_stopped = 0
    for name in names:
        if budget_sec is not None and time.time() - t0 > budget_sec:
            # soft budget (sandbox wall-clock): stop taking new queries but
            # write out everything finished — the artifact stays honest, the
            # summary records how many were left unrun
            budget_stopped = len(names) - len(results)
            print(
                f"BUDGET: stopping after {len(results)}/{len(names)} "
                f"({budget_stopped} unrun)", file=sys.stderr,
            )
            break
        if verbose:
            print(f"RUN {name}", file=sys.stderr, flush=True)
        has_oracle = name in q.ORACLES
        entry: dict = {
            "oracle": has_oracle,
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t_query = time.time()
        # probe is assigned INSIDE the try (ADVICE r9): if _ResourceProbe()
        # or __enter__ raises, the broad except below must not leave a stale
        # previous-query probe (wrong attribution) or an unbound name
        probe = None
        try:
            with _ResourceProbe() as probe:
                df = q.QUERIES[name](spark, sf_dir).persist()
                try:
                    if has_oracle:
                        s_cols, s_rows = spark_rows(df)
                        d_cols, d_rows = duck_rows(con, q.ORACLES[name])
                        entry["spark_rows"] = sum(s_rows.values())
                        entry["oracle_rows"] = sum(d_rows.values())
                        entry["rows_match"] = (
                            entry["spark_rows"] == entry["oracle_rows"]
                        )
                        entry["schema_match"] = s_cols == d_cols
                        try:
                            assert_driver_canon(df, con, q.ORACLES[name], name=name)
                            entry["hash_match"] = s_rows == d_rows
                        except AssertionError as exc:
                            entry["hash_match"] = False
                            entry["err"] = str(exc)[:500]
                    else:
                        # rows-only: the driver still canonicalizes — canon must
                        # not crash (raw array columns etc.)
                        rows = driver_canon(df.toPandas())
                        entry["spark_rows"] = len(rows)
                        entry["rows_match"] = True
                finally:
                    df.unpersist()
        except Exception as exc:  # noqa: BLE001 — artifact records the error
            entry["err"] = "".join(
                traceback.format_exception_only(type(exc), exc)
            ).strip()[:500]
        finally:
            # operator-level caches (minhash signatures, setsim prefix
            # tables) must not outlive their query in a 400+-query sweep
            # process — same lifecycle bench.py applies per run (r10b)
            release_signature_caches()
        # per-query resource record (VERDICT r8 #7): wall time + peak spill /
        # RSS observed while it ran, so the next scale-up's overweight oracle
        # is identified BEFORE it exhausts the disk
        entry["elapsed_sec"] = round(time.time() - t_query, 1)
        if probe is not None:
            if probe.peak_spill:
                entry["duck_peak_spill_bytes"] = probe.peak_spill
            entry["peak_rss_bytes"] = probe.peak_rss
        # nonempty invariant, full-registry edition (r11, VERDICT r10 #6):
        # an empty result that both engines agree on is vacuously green —
        # it must carry a documented empty-is-correct reason or fail
        if entry["err"] is None and entry["spark_rows"] == 0:
            if name in EMPTY_OK:
                entry["empty_ok"] = EMPTY_OK[name]
            else:
                entry["empty_unexplained"] = True
        bad = entry["err"] is not None or (
            has_oracle
            and not (
                entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
            )
        ) or entry.get("empty_unexplained", False)
        if bad:
            failed += 1
            print(
                f"FAIL {name}: "
                f"{entry['err'] or 'unexplained empty result (EMPTY_OK ledger)'}",
                file=sys.stderr,
            )
        results[name] = entry
        # incremental write (atomic rename): a killed/wedged sweep keeps
        # the flushed prefix of completed queries. Throttled to ≥5 s between
        # writes (ADVICE r8: rewriting the whole artifact per query is O(n²)
        # serialization over a 450-query sweep) AND forced every 10 queries
        # (ADVICE r9: with a pure time throttle, a burst of sub-second
        # queries could lose up to ~5 s of completed rows on a kill — the
        # count bound caps the loss at <10 rows regardless of query speed).
        if time.time() - last_write >= 5.0 or len(results) % 10 == 0:
            last_write = time.time()
            _partial = {
                "summary": {
                    "total": len(results),
                    "oracle_backed": sum(1 for e in results.values() if e["oracle"]),
                    "failed": failed,
                    "sf_dir": sf_dir,
                    "elapsed_sec": round(time.time() - t0, 1),
                    "partial": True,
                },
                "queries": results,
            }
            with open(out + ".tmp", "w") as f:
                json.dump(_partial, f, indent=2)
                f.write("\n")
            os.replace(out + ".tmp", out)
    summary = {
        "total": len(results),
        "oracle_backed": sum(1 for e in results.values() if e["oracle"]),
        "failed": failed,
        "sf_dir": sf_dir,
        "elapsed_sec": round(time.time() - t0, 1),
        # zero unexplained empties is the invariant (VERDICT r10 #6);
        # explained ones list their ledger reasons per-query
        "empty_results": sum(
            1 for e in results.values() if e.get("spark_rows") == 0
        ),
        "empty_unexplained": sorted(
            n for n, e in results.items() if e.get("empty_unexplained")
        ),
    }
    if budget_stopped:
        summary["budget_stopped"] = budget_stopped
    with open(out, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=2)
        f.write("\n")
    print(json.dumps(summary))
    return 1 if failed else 0


def merge(out: str, parts: list[str]) -> int:
    """Union per-query records from slice artifacts into one, recomputing
    the summary (elapsed = sum of slice elapsed)."""
    queries: dict[str, dict] = {}
    elapsed = 0.0
    sf_dir = None
    for p in parts:
        with open(p) as fh:
            d = json.load(fh)
        queries.update(d["queries"])
        elapsed += d["summary"]["elapsed_sec"]
        sf_dir = d["summary"]["sf_dir"]
    failed = sum(
        1
        for e in queries.values()
        if e["err"] is not None
        or (
            e["oracle"]
            and not (e["rows_match"] and e["schema_match"] and e["hash_match"])
        )
        or e.get("empty_unexplained", False)
    )
    summary = {
        "total": len(queries),
        "oracle_backed": sum(1 for e in queries.values() if e["oracle"]),
        "failed": failed,
        "sf_dir": sf_dir,
        "elapsed_sec": round(elapsed, 1),
        "merged_from": len(parts),
        "empty_results": sum(
            1 for e in queries.values() if e.get("spark_rows") == 0
        ),
        "empty_unexplained": sorted(
            n for n, e in queries.items() if e.get("empty_unexplained")
        ),
    }
    with open(out, "w") as f:
        json.dump({"summary": summary, "queries": dict(sorted(queries.items()))}, f, indent=2)
        f.write("\n")
    print(json.dumps(summary))
    return 1 if failed else 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--slice",
        nargs=2,
        type=int,
        metavar=("K", "N"),
        default=None,
        help="run only queries where index %% N == K (fresh-process chunking)",
    )
    ap.add_argument(
        "--merge",
        nargs="+",
        default=None,
        metavar="PART",
        help="merge slice artifacts into --out instead of running "
        "(later parts win on name collisions — point-rerun then merge last)",
    )
    ap.add_argument(
        "--budget",
        type=float,
        default=None,
        help="soft wall-clock budget in seconds: stop starting new queries "
        "past this and write the partial artifact (summary.budget_stopped "
        "records how many were left unrun)",
    )
    ap.add_argument(
        "--names",
        default=None,
        help="comma-separated query names: run only these (point re-check "
        "after a fix; merge the mini-artifact over the full one)",
    )
    args = ap.parse_args()
    out = args.out or (
        f"CORRECTNESS_LOCAL_r{args.round}.json"
        if args.round is not None
        else "CORRECTNESS_LOCAL.json"
    )
    if args.merge:
        return merge(out, args.merge)
    names_only = args.names.split(",") if args.names else None
    if args.slice:
        return run(
            args.sf, out, slice_k=args.slice[0], slice_n=args.slice[1],
            names_only=names_only, budget_sec=args.budget,
        )
    return run(args.sf, out, names_only=names_only, budget_sec=args.budget)


if __name__ == "__main__":
    raise SystemExit(main())
