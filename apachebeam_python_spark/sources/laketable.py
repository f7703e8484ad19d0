"""Snapshot / time-travel transaction layer over plain parquet (SURVEY
§4.2 lake maintenance, taken to its conclusion: the Delta/Iceberg-shaped
capability a 100 TB training-data lake needs, with no table-format jar).

Layout::

    table/
      _log/00000000.json   one JSON manifest per committed version
      data/<commit-uuid>/part-*.parquet

Each manifest is the FULL snapshot: the list of live data files (paths
relative to the table root) plus per-file row counts and per-column
min/max stats. Readers never list directories — they read the manifest
and hand Spark an explicit file list, so a read is O(manifest) planning
regardless of how many dead files history holds.

Commit protocol (the part that matters for correctness under
concurrency): a writer stages its parquet under ``data/<uuid>/`` (names
are fresh — staging can never clobber live data), computes the next
version's manifest, and publishes it with ``open(..., "x")`` —
O_CREAT|O_EXCL, atomic on POSIX. If two writers race to version N,
exactly one ``open`` succeeds; the loser re-reads the log, rebases its
manifest on the winner's snapshot, and retries at N+1 (optimistic
concurrency, Delta-style). Data files are immutable once committed;
every mutation is copy-on-write.

Operations: ``create_table`` / ``append`` / ``overwrite`` /
``delete_where`` (copy-on-write rewrite of ONLY the files whose stats
admit matching rows) / ``read_table(version=)`` time travel /
``history`` / ``rollback`` (a NEW commit that restores an old file set —
history is never rewritten) / ``compact`` (small-file rewrite, logically
a no-op) / ``vacuum`` (drop data files unreachable from the kept tail of
the log).

At 100 TB: manifests hold one row per FILE (a 100 TB table at 512 MB
files is ~200k entries — a driver-trivial JSON); min/max stats give
file-level pruning BEFORE Spark ever lists or opens parquet footers
(``files_matching``), which is what keeps a point query from touching
200k footers. Production swaps this for Delta/Iceberg with the same call
shapes; the queries built on it do not change.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = "_log"
_DATA = "data"
#: stats are kept for these leaf types only — nested/binary columns add
#: manifest weight without prunable predicates
_STATS_TYPES = ("bigint", "int", "double", "float", "string", "date", "timestamp")


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _version_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:08d}.json")


def _versions(path: str) -> list[int]:
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json") and f[:-5].isdigit()
    )


def _read_manifest(path: str, version: int) -> dict:
    with open(_version_file(path, version)) as fh:
        return json.load(fh)


def current_version(path: str) -> int:
    vs = _versions(path)
    if not vs:
        raise ValueError(f"not a lake table (no {_LOG}/ manifests): {path}")
    return vs[-1]


def _stage_files(df: DataFrame, path: str) -> tuple[str, list[dict]]:
    """Write df's rows as immutable parquet under data/<uuid>/ and return
    (commit id, per-file entries with row counts + min/max stats). Stats
    come from ONE grouped pass over the staged files (`_metadata` path),
    not a per-file loop."""
    commit = uuid.uuid4().hex
    stage = os.path.join(path, _DATA, commit)
    df.write.mode("errorifexists").parquet(stage)
    spark = df.sparkSession
    staged = spark.read.parquet(stage)
    stat_cols = [
        f.name for f in staged.schema.fields if f.dataType.simpleString() in _STATS_TYPES
    ]
    aggs = [F.count("*").alias("__n")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    rows = (
        spark.read.parquet(stage)
        .select("*", F.col("_metadata.file_path").alias("__fp"))
        .groupBy("__fp")
        .agg(*aggs)
        .collect()
    )
    entries = []
    for r in rows:
        fp = r["__fp"]
        rel = os.path.join(_DATA, commit, os.path.basename(fp))
        stats = {
            c: [_json_safe(r[f"__min_{c}"]), _json_safe(r[f"__max_{c}"])]
            for c in stat_cols
        }
        entries.append({"path": rel, "rows": r["__n"], "stats": stats})
    return commit, sorted(entries, key=lambda e: e["path"])


def _json_safe(v):
    return v if v is None or isinstance(v, (int, float, str, bool)) else str(v)


def _commit(path: str, build_manifest, op: str) -> int:
    """Optimistic commit loop: build the manifest against the CURRENT
    snapshot, try to publish as version+1 with O_EXCL; on a race, re-read
    and rebase. ``build_manifest(current_files)`` returns the new file
    list (entries)."""
    os.makedirs(_log_dir(path), exist_ok=True)
    while True:
        vs = _versions(path)
        cur = vs[-1] if vs else None
        cur_files = _read_manifest(path, cur)["files"] if cur is not None else []
        next_v = (cur + 1) if cur is not None else 0
        manifest = {
            "version": next_v,
            "op": op,
            "files": build_manifest(cur_files),
        }
        try:
            with open(_version_file(path, next_v), "x") as fh:
                json.dump(manifest, fh)
            return next_v
        except FileExistsError:
            continue  # lost the race — rebase on the winner's snapshot


def create_table(df: DataFrame, path: str) -> int:
    """Version 0: stage df's files and publish the first manifest."""
    if _versions(path):
        raise ValueError(f"table already exists at {path}")
    _, entries = _stage_files(df, path)
    return _commit(path, lambda cur: entries, "create")


def append(df: DataFrame, path: str) -> int:
    """New snapshot = current files + the staged files. Files stage
    BEFORE the commit loop, so a lost race re-publishes the same staged
    files against the new base — no rewrite."""
    current_version(path)
    _, entries = _stage_files(df, path)
    return _commit(path, lambda cur: cur + entries, "append")


def overwrite(df: DataFrame, path: str) -> int:
    """New snapshot = only the staged files; prior files stay on disk for
    time travel until vacuumed."""
    current_version(path)
    _, entries = _stage_files(df, path)
    return _commit(path, lambda cur: entries, "overwrite")


def read_table(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Snapshot read: the manifest's explicit file list goes straight to
    the parquet reader — no directory listing, and time travel is just
    an older manifest."""
    v = current_version(path) if version is None else version
    m = _read_manifest(path, v)
    files = [os.path.join(path, e["path"]) for e in m["files"]]
    if not files:
        raise ValueError(f"version {v} of {path} has no files (empty snapshot)")
    return spark.read.parquet(*files)


def files_matching(path: str, column: str, lo, hi, version: int | None = None) -> list[dict]:
    """Manifest-level file pruning: entries whose [min,max] for ``column``
    intersects [lo, hi] — the files a filtered scan must open. Runs on
    the driver against the manifest alone (no footer reads)."""
    v = current_version(path) if version is None else version
    out = []
    for e in _read_manifest(path, v)["files"]:
        st = e["stats"].get(column)
        if st is None or st[0] is None:  # no stats → cannot prune
            out.append(e)
        elif not (st[1] < lo or st[0] > hi):
            out.append(e)
    return out


def delete_where(spark: SparkSession, path: str, predicate: str) -> int:
    """Copy-on-write delete: files whose stats CANNOT hold a matching row
    are carried over untouched; only genuinely affected files rewrite
    (their surviving rows re-stage as new files). At 100 TB this is the
    difference between rewriting a partition and rewriting the table."""
    v = current_version(path)
    m = _read_manifest(path, v)
    all_files = [os.path.join(path, e["path"]) for e in m["files"]]
    # which files actually contain matching rows — one pruned scan
    hit = {
        os.path.basename(r["__fp"])
        for r in spark.read.parquet(*all_files)
        .where(predicate)
        .select(F.col("_metadata.file_path").alias("__fp"))
        .distinct()
        .collect()
    }
    keep = [e for e in m["files"] if os.path.basename(e["path"]) not in hit]
    touched = [
        os.path.join(path, e["path"])
        for e in m["files"]
        if os.path.basename(e["path"]) in hit
    ]
    if not touched:
        return v  # nothing to delete — no empty commit
    survivors = spark.read.parquet(*touched).where(f"NOT ({predicate})")
    entries = _stage_files(survivors, path)[1] if survivors.limit(1).count() else []
    return _commit(path, lambda cur: keep + entries, "delete")


def merge(spark: SparkSession, path: str, source: DataFrame, key: str) -> int:
    """MERGE (latest-wins upsert) — the Delta ``MERGE INTO`` shape on the
    copy-on-write machinery: files whose key-range stats cannot contain a
    source key carry over untouched; hit files rewrite with their matched
    rows replaced by the source's; unmatched source rows append. One
    commit, snapshot-isolated.

    At 100 TB the stats prune is the whole game: a trickle of updates
    against a key-sorted table touches only the files whose [min,max] key
    ranges the batch intersects, not the table."""
    v = current_version(path)
    m = _read_manifest(path, v)
    bounds = source.agg(
        F.min(key).alias("lo"), F.max(key).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return v  # empty source — no-op
    candidates = [
        e
        for e in m["files"]
        if e["stats"].get(key) is None
        or e["stats"][key][0] is None
        or not (e["stats"][key][1] < bounds["lo"] or e["stats"][key][0] > bounds["hi"])
    ]
    cand_paths = {e["path"] for e in candidates}
    keep = [e for e in m["files"] if e["path"] not in cand_paths]
    src = source.cache()
    try:
        if candidates:
            cand_df = spark.read.parquet(
                *[os.path.join(path, e["path"]) for e in candidates]
            )
            # survivors of the hit files (non-matched rows) + ALL source rows
            merged = cand_df.join(
                F.broadcast(src.select(F.col(key).alias("__k"))),
                F.col(key) == F.col("__k"),
                "left_anti",
            ).unionByName(src)
        else:
            merged = src
        entries = _stage_files(merged, path)[1]
    finally:
        src.unpersist()
    return _commit(path, lambda cur: keep + entries, "merge")


def read_changes(
    spark: SparkSession, path: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Change feed: the rows ADDED between two snapshots = the data files
    present in ``to_version``'s manifest but not in ``from_version``'s
    (files are immutable, so file-set diff IS the row-level diff for
    append/merge workloads). The incremental-consumption primitive — a
    downstream job reads only the delta, never rescans the table."""
    to_v = current_version(path) if to_version is None else to_version
    old = {e["path"] for e in _read_manifest(path, from_version)["files"]}
    new_files = [
        os.path.join(path, e["path"])
        for e in _read_manifest(path, to_v)["files"]
        if e["path"] not in old
    ]
    if not new_files:
        return read_table(spark, path, version=to_v).limit(0)
    return spark.read.parquet(*new_files)


def rollback(path: str, to_version: int) -> int:
    """Publish a NEW version whose file set is ``to_version``'s — history
    stays append-only, so the bad version remains auditable."""
    target = _read_manifest(path, to_version)["files"]
    return _commit(path, lambda cur: target, "rollback")


def compact(spark: SparkSession, path: str, target_files: int = 1) -> int:
    """Rewrite the current snapshot into ``target_files`` files — the
    logical table is unchanged (same rows, one new version); old files
    stay for time travel until vacuum."""
    df = read_table(spark, path).coalesce(target_files)
    entries = _stage_files(df, path)[1]
    return _commit(path, lambda cur: entries, "compact")


def history(path: str) -> list[dict]:
    """Version → op / file count / row count, oldest first."""
    out = []
    for v in _versions(path):
        m = _read_manifest(path, v)
        out.append(
            {
                "version": v,
                "op": m["op"],
                "n_files": len(m["files"]),
                "n_rows": sum(e["rows"] for e in m["files"]),
            }
        )
    return out


def vacuum(path: str, keep_last: int = 1) -> int:
    """Delete data files unreachable from the last ``keep_last`` manifests
    (and drop the older manifests). Returns the number of files removed.
    The one DESTRUCTIVE operation — time travel shrinks to the kept tail."""
    vs = _versions(path)
    if keep_last < 1:
        raise ValueError("vacuum must keep at least the current version")
    kept, dropped = vs[-keep_last:], vs[:-keep_last]
    live = {
        e["path"] for v in kept for e in _read_manifest(path, v)["files"]
    }
    removed = 0
    data_root = os.path.join(path, _DATA)
    for commit_dir in os.listdir(data_root) if os.path.isdir(data_root) else []:
        for f in os.listdir(os.path.join(data_root, commit_dir)):
            rel = os.path.join(_DATA, commit_dir, f)
            if f.endswith(".parquet") and rel not in live:
                os.remove(os.path.join(path, rel))
                removed += 1
        if not os.listdir(os.path.join(data_root, commit_dir)):
            shutil.rmtree(os.path.join(data_root, commit_dir))
    for v in dropped:
        os.remove(_version_file(path, v))
    return removed
