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
exactly one ``open`` succeeds. The loser's fate depends on the op:
append/overwrite compose against ANY snapshot, so they rebase on the
winner's manifest and retry at N+1; snapshot-dependent ops (delete,
merge, compact, rollback) raise ConcurrentWriteError instead — their
file lists were computed against a snapshot that no longer exists, and
silently publishing them would drop the winner's rows (Delta's conflict
rules, same shape). Data files are immutable once committed; every
mutation is copy-on-write, and ``vacuum`` honors a retention window so
it can never delete files a concurrent writer has staged but not yet
published.

Operations: ``create_table`` / ``append`` / ``overwrite`` /
``delete_where`` (copy-on-write rewrite of ONLY the files whose stats
admit matching rows) / ``read_table(version=)`` time travel /
``history`` / ``rollback`` (a NEW commit that restores an old file set —
history is never rewritten) / ``restore`` (the same, either direction:
roll back OR roll forward past an adjudicated incident) /
``shallow_clone`` (zero-copy branch: a new table whose v0 references the
source snapshot's files) / ``compact`` (small-file rewrite, logically
a no-op) / ``compact_manifests`` (squash old manifests into a checkpoint
summary once commit count grows — audit history survives, file lists go)
/ ``vacuum`` (drop data files unreachable from the kept tail of the log).

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
_DV = "dv"
#: stats are kept for JSON-native, order-preserving leaf types only —
#: date/timestamp would stringify in the manifest and then compare
#: incorrectly (or raise) against native bounds; nested/binary columns add
#: manifest weight without prunable predicates
_STATS_TYPES = ("bigint", "int", "double", "float", "string")


class ConcurrentWriteError(RuntimeError):
    """A snapshot-dependent commit (delete/merge/compact/rollback) lost a
    race: the table advanced past the version the operation was computed
    against. Re-run the operation on the new snapshot — silently rebasing
    would drop the winner's rows (lost update)."""


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
    try:
        with open(_version_file(path, version)) as fh:
            try:
                return json.load(fh)
            except json.JSONDecodeError as e:
                # storage corruption must surface as a typed, table-naming
                # error — never as an empty/partial snapshot (round 8)
                raise ValueError(
                    f"corrupt manifest {_version_file(path, version)}: {e}"
                ) from e
    except FileNotFoundError:
        ck = _read_checkpoint(path)
        if ck and any(h["version"] == version for h in ck["history"]):
            live = _versions(path)
            raise ValueError(
                f"version {version} was compacted away by compact_manifests; "
                f"earliest time-travelable version is {live[0] if live else None} "
                "(its summary remains in history())"
            )
        raise


def _checkpoint_file(path: str) -> str:
    # underscore prefix keeps it invisible to _versions' \d{8}.json filter
    return os.path.join(_log_dir(path), "_checkpoint.json")


def _read_checkpoint(path: str) -> dict | None:
    try:
        with open(_checkpoint_file(path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _persist_replay_ids(path: str, manifests: list[dict]) -> None:
    """Exactly-once survives log maintenance (round 7, ADVICE r6): before
    ``compact_manifests``/``vacuum`` delete old manifest JSONs, the
    (op, batch_id, version) of every streaming commit among them is merged
    into the checkpoint's ``replay`` list — O(1) per squashed version — so
    a replayed micro-batch whose commit was squashed still SKIPS instead of
    silently double-applying its appends (or worse, its CDC upserts/deletes).
    Without this, the replay guard's manifest scan had a horizon equal to
    the log-maintenance window.

    Merging dedups on (op, batch_id), keeping the FIRST-persisted version
    (ADVICE r7 #4): a crash between persisting ids and deleting the
    squashed manifests makes the next maintenance op re-offer the same
    entries, and without the dedup the wholesale-rewritten list would grow
    by the full streaming history on every squash."""
    ids = [
        {"op": m["op"], "batch_id": m["batch_id"], "version": m["version"]}
        for m in manifests
        if m.get("batch_id") is not None
    ]
    if not ids:
        return
    prior = _read_checkpoint(path) or {}
    merged = list(prior.get("replay", []))
    seen = {(r["op"], r["batch_id"]) for r in merged}
    for r in ids:
        if (r["op"], r["batch_id"]) not in seen:
            merged.append(r)
            seen.add((r["op"], r["batch_id"]))
    prior["replay"] = merged
    os.makedirs(_log_dir(path), exist_ok=True)
    tmp = _checkpoint_file(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(prior, fh)
    os.replace(tmp, _checkpoint_file(path))


def _replayed_version(path: str, op: str, batch_id) -> int | None:
    """Idempotence lookup for foreachBatch replays: the version that already
    committed (op, batch_id), or None. Scans live manifests newest-first,
    then the checkpoint's persisted ``replay`` ids (commits squashed by
    compact_manifests / vacuum — see :func:`_persist_replay_ids`)."""
    for v in reversed(_versions(path)):
        m = _read_manifest(path, v)
        if m["op"] == op and m.get("batch_id") == batch_id:
            return v
    ck = _read_checkpoint(path)
    for r in reversed((ck or {}).get("replay", [])):
        if r["op"] == op and r["batch_id"] == batch_id:
            return r["version"]
    return None


def current_version(path: str) -> int:
    vs = _versions(path)
    if not vs:
        raise ValueError(f"not a lake table (no {_LOG}/ manifests): {path}")
    return vs[-1]


def _footer_entries(
    stage: str, commit: str, stat_cols: list[str]
) -> list[dict] | None:
    """Per-file row counts + min/max read from the staged parquet FOOTERS
    (pyarrow, driver-side) — the Iceberg/Delta stats design: O(files)
    metadata work instead of a second full Spark scan of the data per
    commit (round 11 optimization; the re-scan was one whole Spark job on
    every create/append/delete-rewrite/merge/compact).

    Exactness contract (must equal the Spark ``F.min/F.max`` aggregate the
    fallback path computes, or the manifest would prune differently):
    fixed-width numerics are always stored exact; parquet-mr (Spark's
    writer) stores string min/max untruncated by default and OMITS the
    stat entirely when a value exceeds its stats-size cap — omission,
    a missing null_count, or a NaN bound (float NaN ordering is
    writer-defined) returns None and the caller falls back to the exact
    Spark aggregation. Zero-row files yield no entry and all-null columns
    yield [None, None], exactly like the aggregate path."""
    import pyarrow.parquet as pq

    entries = []
    for fname in sorted(os.listdir(stage)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(stage, fname)).metadata
        if md.num_rows == 0:
            continue  # the grouped-scan path yields no row for empty files
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, list] = {}
        for c in stat_cols:
            j = idx.get(c)
            if j is None:
                return None
            lo = hi = None
            nonnull = 0
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(j)
                st = col.statistics
                if st is None or not st.has_null_count:
                    return None
                n_vals = md.row_group(rg).num_rows - st.null_count
                if n_vals == 0:
                    continue
                nonnull += n_vals
                if not st.has_min_max:
                    return None  # stat omitted (oversized value) — fall back
                # exactness flags (r12, ADVICE r11 #1): the parquet format
                # lets a writer TRUNCATE binary bounds (is_*_value_exact
                # false) — a valid bound for pruning but NOT equal to the
                # Spark aggregate this manifest contract promises. Newer
                # pyarrow surfaces the flags; absent attributes default to
                # exact, which is pinned for OUR writer by the docstring's
                # parquet-mr untruncated-by-default assumption and the
                # footer==aggregate equality test on the long text column.
                if not getattr(st, "is_min_value_exact", True) or not getattr(
                    st, "is_max_value_exact", True
                ):
                    return None  # truncated bound — exact aggregate instead
                mn, mx = st.min, st.max
                if isinstance(mn, bytes) or isinstance(mx, bytes):
                    return None  # non-UTF8 payload — not a prunable leaf
                if mn != mn or mx != mx:  # NaN bound — writer-defined order
                    return None
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if nonnull == 0:
                lo = hi = None
            stats[c] = [_json_safe(lo), _json_safe(hi)]
        entries.append(
            {
                "path": os.path.join(_DATA, commit, fname),
                "rows": md.num_rows,
                "stats": stats,
            }
        )
    return entries


def _stage_files(df: DataFrame, path: str) -> tuple[list[dict], str]:
    """Write df's rows as immutable parquet under data/<uuid>/ and return
    (per-file entries with row counts + min/max stats, schema JSON). Stats
    come from the staged files' own parquet footers (driver-side pyarrow,
    no second Spark job); when a footer cannot supply an exact stat the
    fallback is ONE grouped Spark pass over the staged files (`_metadata`
    path), not a per-file loop."""
    import shutil

    commit = uuid.uuid4().hex
    stage = os.path.join(path, _DATA, commit)
    df.write.mode("errorifexists").parquet(stage)
    spark = df.sparkSession
    if not any(f.endswith(".parquet") for f in os.listdir(stage)):
        # nothing referenced by any manifest — drop the orphan dir now
        # instead of waiting out vacuum's retention (r12, ADVICE r11 #4)
        shutil.rmtree(stage, ignore_errors=True)
        return [], df.schema.json()  # empty input — nothing staged
    stat_cols = [
        f.name for f in df.schema.fields if f.dataType.simpleString() in _STATS_TYPES
    ]
    entries = _footer_entries(stage, commit, stat_cols)
    if entries is not None:
        if not entries:
            # all files zero-row: the commit will reference nothing here
            shutil.rmtree(stage, ignore_errors=True)
        return sorted(entries, key=lambda e: e["path"]), df.schema.json()
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
    return sorted(entries, key=lambda e: e["path"]), df.schema.json()


def _json_safe(v):
    return v if v is None or isinstance(v, (int, float, str, bool)) else str(v)


#: sentinel for _commit: the op composes against ANY current snapshot
#: (append/overwrite), so losing a race rebases instead of failing
_ANY_BASE = object()


#: ops that ACCUMULATE into the current snapshot: their commit schema is the
#: UNION of the current manifest schema and the incoming batch's schema, so
#: a narrow-schema writer can never hide columns a schema-evolving merge
#: added (round-4 review finding #2). overwrite/create REPLACE the table, so
#: they replace the schema; compact/rollback carry their snapshot's schema.
_SCHEMA_UNION_OPS = frozenset({"append", "merge", "delete", "stream-append"})


def _union_schema(cur_json: str | None, new_json: str | None) -> str | None:
    """Current-manifest fields (authoritative order/types) + any new fields
    the incoming schema adds — the manifest-level half of schema evolution."""
    if not cur_json:
        return new_json
    if not new_json or new_json == cur_json:
        return cur_json
    cur = json.loads(cur_json)
    have = {f["name"] for f in cur["fields"]}
    added = [f for f in json.loads(new_json)["fields"] if f["name"] not in have]
    if not added:
        return cur_json
    cur["fields"] = cur["fields"] + added
    return json.dumps(cur)


def _commit(
    path: str, build_manifest, op: str, base, schema: str | None,
    extra: dict | None = None,
) -> int:
    """Optimistic commit loop: try to publish the next version with
    O_EXCL. On a lost race, ops whose result is a pure function of the
    new files (``base is _ANY_BASE``: append, overwrite, create-conflict
    handled separately) rebase on the winner's snapshot and retry;
    snapshot-DEPENDENT ops (delete/merge/compact/rollback, ``base`` =
    the version they were computed against) raise ConcurrentWriteError —
    silently rebasing those would drop the winner's commit (lost update).
    ``schema`` persists in the manifest (carried from the current one
    when this commit stages no files; UNIONED with it for accumulating
    ops, see ``_SCHEMA_UNION_OPS``) so empty snapshots stay readable and
    evolved columns survive narrow-schema writers."""
    os.makedirs(_log_dir(path), exist_ok=True)
    while True:
        vs = _versions(path)
        cur = vs[-1] if vs else None
        if base is not _ANY_BASE and cur != base:
            raise ConcurrentWriteError(
                f"{op} was computed against version {base} but the table "
                f"is now at {cur} — re-run against the current snapshot"
            )
        cur_m = _read_manifest(path, cur) if cur is not None else None
        cur_schema = (cur_m or {}).get("schema")
        if op in _SCHEMA_UNION_OPS:
            next_schema = _union_schema(cur_schema, schema)
        else:
            next_schema = schema or cur_schema
        next_v = (cur + 1) if cur is not None else 0
        manifest = {
            "version": next_v,
            "op": op,
            "schema": next_schema,
            "files": build_manifest(cur_m["files"] if cur_m else []),
            **(extra or {}),
        }
        try:
            with open(_version_file(path, next_v), "x") as fh:
                json.dump(manifest, fh)
            return next_v
        except FileExistsError:
            continue  # lost the race — loop re-reads (and re-checks base)


def create_table(df: DataFrame, path: str) -> int:
    """Version 0: stage df's files and publish the first manifest. Losing
    the version-0 race to another creator raises — it must not overwrite
    the winner's table as a later version."""
    if _versions(path):
        raise ValueError(f"table already exists at {path}")
    entries, schema = _stage_files(df, path)
    os.makedirs(_log_dir(path), exist_ok=True)
    try:
        with open(_version_file(path, 0), "x") as fh:
            json.dump(
                {"version": 0, "op": "create", "schema": schema, "files": entries}, fh
            )
    except FileExistsError:
        raise ValueError(f"table already exists at {path} (concurrent create)")
    return 0


def append(df: DataFrame, path: str) -> int:
    """New snapshot = current files + the staged files. Files stage
    BEFORE the commit loop, so a lost race re-publishes the same staged
    files against the winner's snapshot — no rewrite, and append order
    commutes so the rebase is always safe."""
    current_version(path)
    entries, schema = _stage_files(df, path)
    return _commit(path, lambda cur: cur + entries, "append", _ANY_BASE, schema)


def overwrite(df: DataFrame, path: str) -> int:
    """New snapshot = only the staged files; prior files stay on disk for
    time travel until vacuumed. Overwrite replaces WHATEVER is current by
    definition, so a lost race safely retries."""
    current_version(path)
    entries, schema = _stage_files(df, path)
    return _commit(path, lambda cur: entries, "overwrite", _ANY_BASE, schema)


def read_table(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Snapshot read: the manifest's explicit file list goes straight to
    the parquet reader — no directory listing, and time travel is just
    an older manifest.

    The read applies the MANIFEST's schema (round 4): after a
    schema-evolving MERGE the snapshot mixes old-schema carried-over files
    with new-schema rewrites, and the explicit schema makes the parquet
    reader fill the missing columns with NULL — Delta's read path for
    evolved tables, without rewriting history.

    Merge-on-read (round 5): file entries may carry ``dv`` sidecar refs
    (deletion vectors from ``delete_where_mor``). When any exist in the
    snapshot, the scan adds ``_metadata`` (file, row position) and LEFT
    ANTI joins the union of the referenced position sets — deleted rows
    vanish at read time without the files ever rewriting (Delta/Iceberg
    v2 merge-on-read). The join is distributed: positions are parquet,
    keyed (file, pos), broadcastable while small and shuffleable past
    that; DV-free snapshots keep the plain fast path."""
    from pyspark.sql.types import StructType

    v = current_version(path) if version is None else version
    m = _read_manifest(path, v)
    files = [os.path.join(path, e["path"]) for e in m["files"]]
    schema = StructType.fromJson(json.loads(m["schema"])) if m.get("schema") else None
    if not files:
        # empty snapshot (e.g. a delete matched every row): readable via
        # the schema the manifest carries
        return spark.createDataFrame([], schema)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    dv_dirs = sorted({d for e in m["files"] for d in e.get("dv", [])})
    if not dv_dirs:
        return reader.parquet(*files)
    base = reader.parquet(*files).select(
        "*",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("__f"),
        F.col("_metadata.row_index").alias("__p"),
    )
    dv = spark.read.parquet(*[os.path.join(path, d) for d in dv_dirs]).select(
        F.col("file").alias("__f"), F.col("pos").alias("__p")
    )
    cols = [f.name for f in (schema.fields if schema else base.schema.fields)
            if f.name not in ("__f", "__p")]
    return base.join(dv, ["__f", "__p"], "left_anti").select(*cols)


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


def _read_entries(spark: SparkSession, path: str, entries: list[dict], schema) -> DataFrame:
    """Read a SUBSET of a snapshot's file entries with their deletion
    vectors applied — the shared path every rewrite (COW delete, merge,
    compact-via-read_table) must use, or an entry's vectors would be
    silently dropped by the rewrite and the MOR-deleted rows resurrected."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    files = [os.path.join(path, e["path"]) for e in entries]
    df = reader.parquet(*files)
    dv_dirs = sorted({d for e in entries for d in e.get("dv", [])})
    if not dv_dirs:
        return df
    base = df.select(
        "*",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("__f"),
        F.col("_metadata.row_index").alias("__p"),
    )
    dv = spark.read.parquet(*[os.path.join(path, d) for d in dv_dirs]).select(
        F.col("file").alias("__f"), F.col("pos").alias("__p")
    )
    cols = [c for c in df.columns]
    return base.join(dv, ["__f", "__p"], "left_anti").select(*cols)


def delete_where(spark: SparkSession, path: str, predicate: str) -> int:
    """Copy-on-write delete: files whose stats CANNOT hold a matching row
    are carried over untouched; only genuinely affected files rewrite
    (their surviving rows re-stage as new files). At 100 TB this is the
    difference between rewriting a partition and rewriting the table.
    DELETE semantics: a row is removed iff the predicate is TRUE — NULL
    evaluations survive, regardless of which file they sit in."""
    from pyspark.sql.types import StructType

    v = current_version(path)
    m = _read_manifest(path, v)
    all_files = [os.path.join(path, e["path"]) for e in m["files"]]
    if not all_files:
        return v
    # reads apply the MANIFEST schema (round-4 review finding #1): after a
    # schema-evolving merge the snapshot mixes old- and new-schema files,
    # and an unschema'd read could adopt a narrow footer — dropping evolved
    # columns from restaged survivors and from the published schema
    schema = StructType.fromJson(json.loads(m["schema"])) if m.get("schema") else None
    reader = spark.read.schema(schema) if schema is not None else spark.read
    # which files actually contain matching rows — one pruned scan
    hit = {
        os.path.basename(r["__fp"])
        for r in reader.parquet(*all_files)
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
    # IS NOT TRUE: NULL-predicate rows are NOT deletions and must survive
    # the rewrite exactly as they survive in carried-over files; the read
    # applies the touched entries' deletion vectors (round 5) so a rewrite
    # can never resurrect MOR-deleted rows
    touched_entries = [
        e for e in m["files"] if os.path.basename(e["path"]) in hit
    ]
    survivors = _read_entries(spark, path, touched_entries, schema).where(
        f"({predicate}) IS NOT TRUE"
    )
    # stage unconditionally (round 11): the old `limit(1).count()` nonempty
    # probe was a whole extra Spark scan of the touched files per delete —
    # an all-rows-deleted rewrite now just stages zero data rows, which
    # _stage_files reports as no entries (footer num_rows == 0)
    entries, schema = _stage_files(survivors, path)
    if not entries:
        schema = None
    return _commit(path, lambda cur: keep + entries, "delete", v, schema)


def delete_where_mor(spark: SparkSession, path: str, predicate: str) -> int:
    """Merge-on-read delete (lake wave 4 — the Delta/Iceberg-v2 deletion
    vector): instead of rewriting hit files (``delete_where``'s
    copy-on-write), record the (file, row position) pairs the predicate
    matches as a parquet sidecar under ``dv/<uuid>/`` and attach the ref
    to each hit file's manifest entry. Data files NEVER rewrite; readers
    apply the vectors with one anti-join (see ``read_table``), and any
    rewrite of a file (``compact``, COW delete, merge) naturally purges
    its vectors because rewritten files are new entries.

    Why at 100 TB: a point-delete (GDPR erasure, bad-record purge) under
    copy-on-write rewrites every file that holds one matching row — a
    deletion vector is O(deleted rows) of sidecar parquet instead, written
    DISTRIBUTED (the positions never pass through the driver; only the
    O(files) hit-list does, to update manifest entries). Same NULL
    semantics as delete_where: a row is deleted iff the predicate is TRUE.
    Trade-off (documented, as in Delta): reads pay the anti-join until the
    next compaction — ``compact()`` is the DV purge.

    ``history()`` row counts remain PHYSICAL rows (files' footer counts);
    the logical count is physical minus live vector sizes."""
    from pyspark.sql.types import StructType

    v = current_version(path)
    m = _read_manifest(path, v)
    if not m["files"]:
        return v
    schema = StructType.fromJson(json.loads(m["schema"])) if m.get("schema") else None
    reader = spark.read.schema(schema) if schema is not None else spark.read
    files = [os.path.join(path, e["path"]) for e in m["files"]]
    hits = (
        reader.parquet(*files)
        .where(predicate)
        .select(
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
                "file"
            ),
            F.col("_metadata.row_index").alias("pos"),
        )
    )
    sidecar = uuid.uuid4().hex
    rel = os.path.join(_DV, sidecar)
    hits.write.mode("errorifexists").parquet(os.path.join(path, rel))
    # O(files)-sized metadata: which files the vector touches (drives the
    # manifest update; the positions themselves stay on disk)
    hit_files = {
        r["file"]
        for r in spark.read.parquet(os.path.join(path, rel))
        .select("file")
        .distinct()
        .collect()
    }
    if not hit_files:
        return v  # nothing matched — no commit (empty sidecar is inert)

    def build(cur):
        out = []
        for e in cur:
            e = dict(e)
            if os.path.basename(e["path"]) in hit_files:
                e["dv"] = list(e.get("dv", [])) + [rel]
            out.append(e)
        return out

    return _commit(path, build, "delete-mor", v, None)


def merge(spark: SparkSession, path: str, source: DataFrame, key: str) -> int:
    """MERGE (latest-wins upsert) — the Delta ``MERGE INTO`` shape on the
    copy-on-write machinery: files whose key-range stats cannot contain a
    source key carry over untouched; hit files rewrite with their matched
    rows replaced by the source's; unmatched source rows append. One
    commit, snapshot-isolated.

    At 100 TB the stats prune is the whole game: a trickle of updates
    against a key-sorted table touches only the files whose [min,max] key
    ranges the batch intersects, not the table.

    Schema evolution (round 4, Delta's ``mergeSchema`` on write): source
    columns absent from the target are ADDED to the table schema (existing
    rows read as NULL via the manifest-schema read — carried-over files
    never rewrite); target columns absent from the source are inserted as
    NULL for new rows and preserved verbatim for survivors. The evolved
    schema is committed in the manifest, so readers of the new snapshot see
    one consistent wide schema across old and new files."""
    from pyspark.sql.types import StructType

    v = current_version(path)
    m = _read_manifest(path, v)
    stats = source.agg(
        F.min(key).alias("lo"),
        F.max(key).alias("hi"),
        F.count("*").alias("n"),
        F.countDistinct(key).alias("nd"),
    ).collect()[0]
    if stats["n"] == 0:
        return v  # empty source — no-op
    if stats["nd"] != stats["n"]:
        # Delta MERGE errors on multiple source matches per key; silently
        # unioning duplicates would break the upsert's key uniqueness
        raise ValueError(f"merge source has duplicate {key!r} values")
    candidates = files_matching(path, key, stats["lo"], stats["hi"], version=v)
    cand_paths = {e["path"] for e in candidates}
    keep = [e for e in m["files"] if e["path"] not in cand_paths]
    # evolved schema: target fields (authoritative types) + new source fields
    tgt_schema = (
        StructType.fromJson(json.loads(m["schema"])) if m.get("schema") else source.schema
    )
    tgt_names = {f.name for f in tgt_schema.fields}
    evolved = StructType(
        list(tgt_schema.fields)
        + [f for f in source.schema.fields if f.name not in tgt_names]
    )
    src_names = set(source.columns)
    aligned_src = source.select(
        *[
            (F.col(f.name).cast(f.dataType) if f.name in src_names else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in evolved.fields
        ]
    )
    src = aligned_src.cache()
    try:
        if candidates:
            # evolved-schema read: hit files staged before the evolution
            # surface the new columns as NULL without a history rewrite
            # DV-aware read (round 5): survivors must respect vectors
            cand_df = _read_entries(spark, path, candidates, evolved)
            # survivors of the hit files (non-matched rows) + ALL source rows
            merged = cand_df.join(
                F.broadcast(src.select(F.col(key).alias("__k"))),
                F.col(key) == F.col("__k"),
                "left_anti",
            ).unionByName(src)
        else:
            merged = src
        entries, schema = _stage_files(merged, path)
    finally:
        src.unpersist()
    return _commit(path, lambda cur: keep + entries, "merge", v, schema or evolved.json())


def merge_apply(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key: str,
    op_col: str = "_op",
    batch_id: int | None = None,
) -> int:
    """CDC-apply MERGE (round 6) — the Delta ``WHEN MATCHED [AND cond]
    THEN DELETE`` shape: ``source`` carries an ``op_col`` of 'U' (upsert)
    or 'D' (delete). Matched 'D' keys are removed, 'U' rows replace their
    matches or insert, and a 'D' for an absent key is a no-op — exactly
    the contract a change-data-capture consumer needs to land a debezium/
    binlog batch in one snapshot-isolated commit.

    Same stats-prune skeleton as :func:`merge`: files whose key range
    misses every source key carry over untouched; only hit-range files
    rewrite (DV-aware read, so vectors never resurrect); inserts append.
    At 100 TB a CDC trickle touches O(changed key-ranges) files, and the
    one commit keeps downstream readers snapshot-consistent — no
    delete-then-insert window where a key is missing.

    Duplicate source keys are rejected like ``merge`` (a binlog batch
    must be pre-compacted to final-state-per-key — q_stream_cdc's job)."""
    from pyspark.sql.types import StructType

    # exactly-once under foreachBatch (round 6): a replayed micro-batch
    # (driver died between commit and checkpoint) finds its batch_id in a
    # prior merge-cdc manifest — or, post log maintenance, in the
    # checkpoint's persisted replay ids (round 7, ADVICE r6) — and SKIPS;
    # the same idempotence contract as append_stream_batch, extended to
    # the update/delete path where a double-apply is silent corruption.
    if batch_id is not None:
        pv = _replayed_version(path, "merge-cdc", batch_id)
        if pv is not None:
            return pv

    v = current_version(path)
    m = _read_manifest(path, v)
    stats = source.agg(
        F.min(key).alias("lo"),
        F.max(key).alias("hi"),
        F.count("*").alias("n"),
        F.countDistinct(key).alias("nd"),
    ).collect()[0]
    if stats["n"] == 0:
        return v
    if stats["nd"] != stats["n"]:
        raise ValueError(f"merge_apply source has duplicate {key!r} values")
    candidates = files_matching(path, key, stats["lo"], stats["hi"], version=v)
    cand_paths = {e["path"] for e in candidates}
    keep = [e for e in m["files"] if e["path"] not in cand_paths]
    tgt_schema = (
        StructType.fromJson(json.loads(m["schema"])) if m.get("schema") else None
    )
    if tgt_schema is None:
        raise ValueError("merge_apply target has no snapshot schema")
    upserts = source.filter(F.col(op_col) == "U").select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in source.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in tgt_schema.fields
        ]
    )
    all_keys = source.select(F.col(key).alias("__k"))
    # no cache (r12, VERDICT r11 #6 sweep): since the r11 probe removal the
    # upserts projection is consumed exactly once (the staged union) — the
    # persist was pure bookkeeping overhead on every CDC batch
    src = upserts
    if candidates:
        cand_df = _read_entries(spark, path, candidates, tgt_schema)
        survivors = cand_df.join(
            F.broadcast(all_keys), F.col(key) == F.col("__k"), "left_anti"
        )
        merged = survivors.unionByName(src)
    else:
        merged = src
    # stage unconditionally (round 11): same probe removal as
    # delete_where — the nonempty check re-ran the whole merge subtree
    entries, schema = _stage_files(merged, path)
    if not entries:
        schema = tgt_schema.json()
    return _commit(
        path, lambda cur: keep + entries, "merge-cdc", v,
        schema or tgt_schema.json(),
        extra=None if batch_id is None else {"batch_id": batch_id},
    )


def append_stream_batch(df: DataFrame, path: str, batch_id: int) -> int:
    """Exactly-once streaming append — the ``foreachBatch`` body for
    writing a stream into a lake table::

        stream.writeStream.foreachBatch(
            lambda df, bid: LT.append_stream_batch(df, table_path, bid)
        )

    Idempotence: each commit records its ``batch_id`` in the manifest; a
    replayed micro-batch (driver died between commit and checkpoint)
    finds its id already present and SKIPS — the transactional half of
    the checkpoint+idempotent-sink contract. Spark serializes foreachBatch
    invocations within a query, so the check-then-commit pair does not
    race with itself. Batch ids of commits squashed by compact_manifests /
    vacuum persist in the checkpoint's replay list (round 7, ADVICE r6),
    so log maintenance never shortens the replay horizon."""
    v = _replayed_version(path, "stream-append", batch_id)
    if v is not None:
        return v  # replayed batch — already committed
    entries, schema = _stage_files(df, path)
    os.makedirs(_log_dir(path), exist_ok=True)
    while True:
        vs = _versions(path)
        cur = vs[-1] if vs else None
        cur_m = _read_manifest(path, cur) if cur is not None else None
        next_v = (cur + 1) if cur is not None else 0
        manifest = {
            "version": next_v,
            "op": "stream-append",
            "batch_id": batch_id,
            # same union rule as _commit's accumulating ops: a narrow
            # micro-batch must not hide evolved columns
            "schema": _union_schema((cur_m or {}).get("schema"), schema),
            "files": (cur_m["files"] if cur_m else []) + entries,
        }
        try:
            with open(_version_file(path, next_v), "x") as fh:
                json.dump(manifest, fh)
            return next_v
        except FileExistsError:
            continue


def read_changes(
    spark: SparkSession, path: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Change feed: the rows in data files present in ``to_version``'s
    manifest but not in ``from_version``'s. Files are immutable, so for
    APPEND-ONLY workloads the file-set diff is exactly the row-level
    diff. For merge/delete windows the feed is AT-LEAST-ONCE: rewritten
    files re-emit their carried survivor rows alongside the actual
    changes (the standard CDF-without-row-tracking caveat — consumers
    needing exactly-once dedup on a key downstream)."""
    from pyspark.sql.types import StructType

    to_v = current_version(path) if to_version is None else to_version
    old = {e["path"] for e in _read_manifest(path, from_version)["files"]}
    to_m = _read_manifest(path, to_v)
    new_files = [
        os.path.join(path, e["path"])
        for e in to_m["files"]
        if e["path"] not in old
    ]
    if not new_files:
        return read_table(spark, path, version=to_v).limit(0)
    # to_version's manifest schema, for the same mixed-schema reason as
    # read_table/delete_where
    if to_m.get("schema"):
        return spark.read.schema(
            StructType.fromJson(json.loads(to_m["schema"]))
        ).parquet(*new_files)
    return spark.read.parquet(*new_files)


def rollback(path: str, to_version: int) -> int:
    """Publish a NEW version whose file set is ``to_version``'s — history
    stays append-only, so the bad version remains auditable. Conflicts
    with concurrent writers (the rollback decision was made against the
    current head)."""
    v = current_version(path)
    tm = _read_manifest(path, to_version)
    return _commit(path, lambda cur: tm["files"], "rollback", v, tm.get("schema"))


def restore(path: str, to_version: int) -> int:
    """Snapshot restore in EITHER direction (lake wave 3): publish a NEW
    commit whose file set is ``to_version``'s — rollBACK to an older
    snapshot or roll FORWARD to a newer one (e.g. back past a bad backfill,
    then forward again once it's adjudicated fine). History is append-only
    either way: every restored-over version stays readable, so the audit
    trail is never rewritten — the property that distinguishes this from an
    in-place reset. Conflicts with concurrent writers exactly like any
    snapshot-dependent op."""
    v = current_version(path)
    tm = _read_manifest(path, to_version)
    return _commit(path, lambda cur: tm["files"], "restore", v, tm.get("schema"))


def shallow_clone(
    spark: SparkSession, path: str, dst: str, version: int | None = None
) -> int:
    """Zero-copy BRANCH of a snapshot (lake wave 3; Delta SHALLOW CLONE /
    Iceberg branch shape): ``dst`` becomes a new table whose version-0
    manifest references the SOURCE's data files by absolute path — no data
    moves. Writes to the branch stage under the branch's own ``data/`` and
    never touch the source; writes to the source never appear in the
    branch. The experimentation workflow this enables at 100 TB: branch the
    corpus, run a risky dedup/requality pass on the branch, diff, then
    either promote (overwrite source from branch) or delete the branch dir.

    Caveat (same as Delta's): the source's ``vacuum`` does not know about
    branch references — vacuuming the source can delete files a branch
    still lists. Keep branches short-lived or vacuum with a retention
    window longer than branch lifetime."""
    v = current_version(path) if version is None else version
    m = _read_manifest(path, v)
    abs_entries = [
        {**e, "path": os.path.join(os.path.abspath(path), e["path"])}
        for e in m["files"]
    ]
    if _versions(dst):
        raise ValueError(f"clone target already exists: {dst}")
    os.makedirs(_log_dir(dst), exist_ok=True)
    try:
        with open(_version_file(dst, 0), "x") as fh:
            json.dump(
                {
                    "version": 0,
                    "op": "clone",
                    "schema": m.get("schema"),
                    "files": abs_entries,
                    "clone_of": {"path": os.path.abspath(path), "version": v},
                },
                fh,
            )
    except FileExistsError:
        raise ValueError(f"clone target already exists: {dst} (concurrent create)")
    return 0


def compact_manifests(path: str, keep_last: int = 10) -> int:
    """Log maintenance once commit count grows (lake wave 3): squash
    manifests older than the last ``keep_last`` into one checkpoint summary
    file and delete their JSONs. Every manifest here is already a FULL
    snapshot (reads never replay the log), so what grows with commit count
    is the _log/ listing itself — a 50k-commit table lists 50k files before
    every version lookup. After compaction: time travel reaches the kept
    tail; ``history()`` still reports every squashed version from the
    checkpoint's summaries (op / file count / row count — the audit trail
    survives, only the full file lists go); reading a squashed version
    raises a clear error naming the earliest travelable one. Returns the
    number of manifests squashed.

    Unlike ``vacuum`` this touches NO data files — pair it with vacuum,
    which already drops old manifests as a side effect of shrinking data."""
    vs = _versions(path)
    if keep_last < 1:
        raise ValueError("must keep at least the current version")
    dropped = vs[:-keep_last]
    if not dropped:
        return 0
    _persist_squashed(path, dropped)
    for v in dropped:
        os.remove(_version_file(path, v))
    return len(dropped)


def _persist_squashed(path: str, dropped: list[int]) -> None:
    """Before any maintenance op deletes old manifest JSONs, persist their
    audit summaries into the checkpoint's ``history`` (so a time-travel
    read of a squashed version raises the typed 'compacted away' error
    naming the earliest travelable one, and ``history()`` keeps the full
    trail) and their streaming batch_ids into the ``replay`` list (the
    exactly-once horizon — round 7, ADVICE r6). Shared by
    ``compact_manifests`` AND ``vacuum`` (round 8: vacuum previously
    skipped the history half, degrading its time-travel error to a bare
    FileNotFoundError). History appends dedup on version, so a crash
    between persist and delete is retry-safe."""
    prior = _read_checkpoint(path)
    history_rows = list(prior["history"]) if prior and "history" in prior else []
    seen_versions = {h["version"] for h in history_rows}
    manifests = [_read_manifest(path, v) for v in dropped]
    for v, m in zip(dropped, manifests):
        if v not in seen_versions:
            history_rows.append(
                {
                    "version": v,
                    "op": m["op"],
                    "n_files": len(m["files"]),
                    "n_rows": sum(e["rows"] for e in m["files"]),
                }
            )
    _persist_replay_ids(path, manifests)
    prior = _read_checkpoint(path) or {}
    prior.update({"upto": dropped[-1], "history": history_rows})
    tmp = _checkpoint_file(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(prior, fh)
    os.replace(tmp, _checkpoint_file(path))  # atomic publish, then prune


def compact(spark: SparkSession, path: str, target_files: int = 1) -> int:
    """Rewrite the current snapshot into ``target_files`` files — the
    logical table is unchanged (same rows, one new version); old files
    stay for time travel until vacuum. Conflicts with concurrent writers
    (the rewrite captured a specific snapshot)."""
    v = current_version(path)
    df = read_table(spark, path, version=v).coalesce(target_files)
    entries, schema = _stage_files(df, path)
    return _commit(path, lambda cur: entries, "compact", v, schema)


def compact_zorder(
    spark: SparkSession,
    path: str,
    x: str,
    y: str,
    target_files: int = 16,
    bits: int = 8,
) -> int:
    """``OPTIMIZE ZORDER BY (x, y)`` (round 7): rewrite the current
    snapshot clustered on the Morton curve of two integer columns, so each
    staged file's min/max stats form a compact 2-D tile and
    :func:`files_matching` prunes on EITHER column — the multi-dimensional
    extension of the single-key clustering a plain ``compact`` after a
    range-partitioned write gives. Same snapshot-dependent commit contract
    as ``compact``.

    At 100 TB: one z-clustered rewrite (a single range-shuffle) buys every
    later 2-D-filtered scan ~√F-of-F file opens instead of F — the
    standard Delta/Iceberg layout-maintenance trade. Columns must be
    integer-typed (route money through cents first)."""
    from ..operators.zorder import cluster_by_z

    v = current_version(path)
    df = cluster_by_z(
        read_table(spark, path, version=v), x, y, bits=bits, n_files=target_files
    )
    entries, schema = _stage_files(df, path)
    return _commit(path, lambda cur: entries, "compact-zorder", v, schema)


def history(path: str) -> list[dict]:
    """Version → op / file count / row count, oldest first — including
    versions squashed by ``compact_manifests`` (their summaries persist in
    the checkpoint; only their full file lists are gone)."""
    ck = _read_checkpoint(path)
    out = list(ck["history"]) if ck else []
    for v in _versions(path):
        m = _read_manifest(path, v)
        entry = {
            "version": v,
            "op": m["op"],
            "n_files": len(m["files"]),
            "n_rows": sum(e["rows"] for e in m["files"]),
        }
        # operation parameter (Delta-style): streaming commits carry their
        # micro-batch id — the audit surface for the exactly-once contract
        # (r9, tests/test_stream_chaos.py asserts no duplicate batch ids)
        if m.get("batch_id") is not None:
            entry["batch_id"] = m["batch_id"]
        out.append(entry)
    return out


def vacuum(path: str, keep_last: int = 1, retention_seconds: float = 600.0) -> int:
    """Delete data files unreachable from the last ``keep_last`` manifests
    (and drop the older manifests). Returns the number of parquet files
    removed. The one DESTRUCTIVE operation — time travel shrinks to the
    kept tail.

    ``retention_seconds`` is the standard vacuum safety window (Delta has
    the same): files younger than it are NEVER removed even if no kept
    manifest references them, because an in-flight writer may have staged
    them ahead of a commit that hasn't published yet. Pass 0 only when no
    writer can be concurrent (tests, single-process maintenance).

    Streaming batch_ids of the dropped manifests persist in the
    checkpoint's replay list before removal (round 7, ADVICE r6), so the
    exactly-once replay guard of append_stream_batch / merge_apply keeps
    its full horizon through log maintenance — no keep_last tuning
    against the streaming checkpoint's replay window is required."""
    import time

    vs = _versions(path)
    if keep_last < 1:
        raise ValueError("vacuum must keep at least the current version")
    kept, dropped = vs[-keep_last:], vs[:-keep_last]
    if dropped:
        # history + replay ids persist BEFORE anything is deleted (round 8:
        # previously vacuum persisted only replay ids, so time travel to a
        # vacuumed version raised bare FileNotFoundError instead of the
        # typed 'compacted away' error compact_manifests gives)
        _persist_squashed(path, dropped)
    live = {e["path"] for v in kept for e in _read_manifest(path, v)["files"]}
    now = time.time()
    removed = 0
    data_root = os.path.join(path, _DATA)
    for commit_dir in os.listdir(data_root) if os.path.isdir(data_root) else []:
        cdir = os.path.join(data_root, commit_dir)
        names = os.listdir(cdir)
        parquets = [f for f in names if f.endswith(".parquet")]
        live_here = any(os.path.join(_DATA, commit_dir, f) in live for f in parquets)
        young = any(
            now - os.path.getmtime(os.path.join(cdir, f)) < retention_seconds
            for f in names
        )
        if not live_here and not young:
            # whole commit dir is dead (incl. _SUCCESS/.crc sidecars)
            removed += len(parquets)
            shutil.rmtree(cdir)
            continue
        for f in parquets:
            rel = os.path.join(_DATA, commit_dir, f)
            full = os.path.join(cdir, f)
            if rel not in live and now - os.path.getmtime(full) >= retention_seconds:
                os.remove(full)
                removed += 1
                crc = os.path.join(cdir, f".{f}.crc")
                if os.path.exists(crc):
                    os.remove(crc)
    for v in dropped:
        os.remove(_version_file(path, v))
    return removed
