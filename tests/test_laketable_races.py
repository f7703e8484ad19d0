"""Lake concurrency matrix (round 6, VERDICT r5 #8): interleaved two-writer
schedules over the snapshot/commit protocol in sources/laketable.py.

Each schedule is a REAL interleaving, not a pre-published fake: writer A
computes its op against version v, then — via the ``_interleave`` hook —
writer B's full op lands at v+1 immediately before A's commit attempt, so
A's optimistic commit genuinely loses the race. The matrix pins which ops
must raise ``ConcurrentWriteError`` (snapshot-dependent: delete / merge /
compact) vs rebase (append), and that the RETRY against the new head
composes both writers' effects — in particular the risky pair called out
in the round-5 review: deletion-vector (MOR) commits stacking against a
copy-on-write rewrite must never resurrect or double-delete rows.
"""

from __future__ import annotations

import os

import pytest

from apachebeam_python_spark.sources import laketable as LT


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "race_tbl")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    LT.create_table(df.repartitionByRange(4, "id"), path)
    return path


def _ids(spark, path, version=None):
    return sorted(
        r.id for r in LT.read_table(spark, path, version=version).select("id").collect()
    )


def _interleave(monkeypatch, winner):
    """Arrange for writer B (``winner``, a real laketable op) to publish its
    commit immediately before the NEXT ``_commit`` attempt, producing a true
    compute-at-v / head-moved-to-v+1 schedule. The hook restores the real
    ``_commit`` before running the winner so B's own commit is unhooked."""
    orig = LT._commit
    fired = {"done": False}

    def wrapped(*args, **kwargs):
        # forward everything — merge_apply passes extra=, and future _commit
        # signature growth must not TypeError inside the race hook (ADVICE r6)
        if not fired["done"]:
            fired["done"] = True
            monkeypatch.setattr(LT, "_commit", orig)
            winner()
        return orig(*args, **kwargs)

    monkeypatch.setattr(LT, "_commit", wrapped)


def test_merge_loses_to_concurrent_dv_delete_then_retries_clean(
    spark, tbl, monkeypatch
):
    """MERGE computed at v0 while a deletion-vector delete lands at v1:
    the merge must raise (its survivor set was computed without the
    vectors — silently committing would resurrect MOR-deleted rows).
    The retry, computed against the DV snapshot, must keep the deletes."""
    src = spark.createDataFrame([(5, 999), (150, 111)], "id long, v long")

    _interleave(monkeypatch, lambda: LT.delete_where_mor(spark, tbl, "id IN (6, 7)"))
    with pytest.raises(LT.ConcurrentWriteError):
        LT.merge(spark, tbl, src, key="id")

    # retry against the head: upsert applies AND the MOR deletes hold
    LT.merge(spark, tbl, src, key="id")
    rows = {r.id: r.v for r in LT.read_table(spark, tbl).collect()}
    assert rows[5] == 999 and rows[150] == 111
    assert 6 not in rows and 7 not in rows
    assert len(rows) == 99  # 100 - 2 deleted + 1 inserted


def test_cow_rewrite_loses_to_concurrent_dv_then_composes(spark, tbl, monkeypatch):
    """THE risky pair (VERDICT r5 #8): a copy-on-write delete rewriting
    files while a DV commit stacks vectors onto the same snapshot. The COW
    writer computed survivors WITHOUT the new vectors, so it must lose;
    the retry must apply both deletes exactly once, keep the winner's dv
    refs on carried-over files, and leave rewritten files vector-free."""
    _interleave(monkeypatch, lambda: LT.delete_where_mor(spark, tbl, "id IN (2, 98)"))
    with pytest.raises(LT.ConcurrentWriteError):
        LT.delete_where(spark, tbl, "id < 10")

    LT.delete_where(spark, tbl, "id < 10")
    assert _ids(spark, tbl) == list(range(10, 98)) + [99]

    m = LT._read_manifest(tbl, LT.current_version(tbl))
    with_dv = [e for e in m["files"] if e.get("dv")]
    # id=98 sits in a carried-over (stats-missed) file: its vector survives
    assert with_dv, "carried-over file should keep the winner's dv ref"
    # rewritten survivor files never carry vectors (rewrite purges them)
    rewritten = [e for e in m["files"] if not e.get("dv")]
    assert rewritten, "the COW rewrite should have staged fresh files"


def test_dv_loses_to_concurrent_compact_then_retries_on_new_files(
    spark, tbl, monkeypatch
):
    """DV positions are (file, row_index) pairs — they are meaningless
    against files a concurrent compaction replaced, so the DV commit must
    lose; its retry recomputes positions against the compacted files."""
    _interleave(monkeypatch, lambda: LT.compact(spark, tbl, target_files=1))
    with pytest.raises(LT.ConcurrentWriteError):
        LT.delete_where_mor(spark, tbl, "id = 42")

    LT.delete_where_mor(spark, tbl, "id = 42")
    assert _ids(spark, tbl) == [i for i in range(100) if i != 42]
    # and a subsequent compact purges the vector (DV lifecycle end)
    LT.compact(spark, tbl, target_files=1)
    m = LT._read_manifest(tbl, LT.current_version(tbl))
    assert all(not e.get("dv") for e in m["files"])
    assert _ids(spark, tbl) == [i for i in range(100) if i != 42]


def test_compact_loses_to_concurrent_append_then_retry_includes_it(
    spark, tbl, monkeypatch
):
    """Compaction captured snapshot v0; an append rebases to v1 under it.
    Committing the compaction would DROP the appended rows (its file list
    replaces everything), so it must lose; the retry folds them in."""
    appended = spark.range(100, 110).selectExpr("id", "id * 2 AS v")
    _interleave(monkeypatch, lambda: LT.append(appended, tbl))
    with pytest.raises(LT.ConcurrentWriteError):
        LT.compact(spark, tbl, target_files=1)

    v = LT.compact(spark, tbl, target_files=1)
    m = LT._read_manifest(tbl, v)
    assert len(m["files"]) == 1
    assert _ids(spark, tbl) == list(range(110))


def test_two_appends_interleaved_both_land(spark, tbl, monkeypatch):
    """Appends are snapshot-INdependent: the loser rebases instead of
    raising, and both writers' rows are present — no lost update."""
    b = spark.range(200, 205).selectExpr("id", "id * 2 AS v")
    _interleave(monkeypatch, lambda: LT.append(b, tbl))
    a = spark.range(300, 305).selectExpr("id", "id * 2 AS v")
    LT.append(a, tbl)  # must NOT raise
    assert _ids(spark, tbl) == list(range(100)) + list(range(200, 205)) + list(
        range(300, 305)
    )
    assert [h["op"] for h in LT.history(tbl)][-2:] == ["append", "append"]


def test_vacuum_after_dv_and_compact_keeps_reads_consistent(spark, tbl):
    """DV → compact (vector purge) → vacuum(keep_last=1, retention 0):
    time travel shrinks to the head, the head still reads the logical
    table, and vacuum never touches the dv/ sidecar tree (vectors are
    already inert after the compact, but a kept version may reference
    them — deleting data files only is the safe contract)."""
    LT.delete_where_mor(spark, tbl, "id >= 90")
    LT.compact(spark, tbl, target_files=2)
    removed = LT.vacuum(tbl, keep_last=1, retention_seconds=0.0)
    assert removed > 0, "pre-compaction data files should be reclaimed"
    assert _ids(spark, tbl) == list(range(90))
    # dv sidecar tree untouched by vacuum
    dv_root = os.path.join(tbl, "dv")
    assert os.path.isdir(dv_root) and os.listdir(dv_root)
    # squashed versions are gone from time travel
    with pytest.raises(Exception):
        LT.read_table(spark, tbl, version=0).collect()


# --------------------------------------------------------------------------
# Reader-vs-writer schedules (round 7, VERDICT r6 #8): the matrix above
# pins writer-vs-writer; these pin the READ side of snapshot isolation —
# a reader pinned to a manifest must be immune to concurrent rewrites
# until vacuum's retention window passes, and must fail LOUDLY (never
# return partial data) once it has.
# --------------------------------------------------------------------------

def _ids_of(df):
    return sorted(r.id for r in df.select("id").collect())


def test_pinned_read_immune_to_compact_and_in_retention_vacuum(spark, tbl):
    """Time-travel reader pinned to v0 while a COW delete + compact rewrite
    the table AND vacuum runs inside the retention window: the
    manifest-listed read keeps collecting the exact v0 content. Rewrites
    only ADD files; the grace period guarantees the pinned reader's
    resolved files survive maintenance — Delta's retention contract."""
    pinned = LT.read_table(spark, tbl, version=0)  # file list resolved NOW
    LT.delete_where(spark, tbl, "id < 50")         # v1: copy-on-write rewrite
    LT.compact(spark, tbl, target_files=1)         # v2: another full rewrite
    assert LT.vacuum(tbl, keep_last=1, retention_seconds=3600) == 0  # young
    assert _ids_of(pinned) == list(range(100))     # snapshot intact
    assert _ids_of(LT.read_table(spark, tbl)) == list(range(50, 100))


def test_pinned_read_fails_loudly_past_retention(spark, tbl):
    """The grace period has a boundary: once retention passes
    (retention_seconds=0 simulates an expired window) vacuum may remove the
    pinned version's files — and the reader's collect must RAISE, never
    silently return a partial/empty snapshot (ignoreMissingFiles stays at
    Spark's false default)."""
    pinned = LT.read_table(spark, tbl, version=0)
    LT.compact(spark, tbl, target_files=1)  # v1
    assert LT.vacuum(tbl, keep_last=1, retention_seconds=0) > 0
    with pytest.raises(Exception, match="(?i)file|exist|found"):
        pinned.collect()


def test_pinned_read_ignores_later_mor_delete(spark, tbl):
    """A deletion-vector (MOR) delete lands AFTER the reader pinned the
    head: DVs attach to the new manifest, not to files, so the pinned
    snapshot must keep every row while a fresh read applies the vectors."""
    pinned = LT.read_table(spark, tbl)            # v0 head, no DVs
    LT.delete_where_mor(spark, tbl, "id >= 90")   # v1 adds vectors only
    assert _ids_of(pinned) == list(range(100))    # isolation: no read-time DV
    assert _ids_of(LT.read_table(spark, tbl)) == list(range(90))


def test_pinned_read_survives_manifest_squash(spark, tbl):
    """compact_manifests deletes the pinned version's manifest JSON out
    from under the reader: a DataFrame already BUILT from it keeps working
    (the file list was resolved at build time; data files are untouched) —
    only a NEW time-travel read of the squashed version raises the clear
    'compacted away' error naming the earliest travelable version."""
    pinned = LT.read_table(spark, tbl, version=0)
    for i in range(1, 5):
        LT.append(spark.createDataFrame([(1000 + i, 1)], "id long, v long"), tbl)
    assert LT.compact_manifests(tbl, keep_last=2) == 3  # v0..v2 squashed
    assert _ids_of(pinned) == list(range(100))
    with pytest.raises(ValueError, match="compacted away"):
        LT.read_table(spark, tbl, version=0)
