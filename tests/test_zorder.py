"""Z-order clustering (operators/zorder.py + laketable.compact_zorder,
round 7): bit-interleave correctness against a Python reference, the
multi-dimensional stats-pruning win over a linear layout, and the skip
census's layout-invariant row count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apachebeam_python_spark import queries as q
from apachebeam_python_spark.operators.zorder import (
    cluster_by_z,
    z_value_expr,
    z_value_sql,
)
from apachebeam_python_spark.sources import laketable as LT


def _z_ref(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_z_value_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 127, 128, 255) for y in (0, 3, 64, 200, 255)]
    df = spark.createDataFrame(rows, "xq long, yq long").select(
        "xq", "yq", z_value_expr(F.col("xq"), F.col("yq"), 8).alias("z")
    )
    for r in df.collect():
        assert r.z == _z_ref(r.xq, r.yq), (r.xq, r.yq)


def test_quantize_exact_beyond_double_precision(spark):
    """ADVICE r7 #1 regression: spans past 2^53 (nanosecond timestamps,
    wide surrogate ids) must quantize by EXACT integer floor division.
    The old (num - num%span)/span routed through a double whose rounding
    could truncate the quotient off-by-one; the decimal(38,0) lane cannot.
    Compared against Python's arbitrary-precision // on adversarial points
    (cell boundaries ±1 ulp-ish offsets) over a ~4.6e18 span."""
    from apachebeam_python_spark.operators.zorder import quantize_expr

    lo, hi = 0, (1 << 62) + 12345  # span ~4.6e18 >> 2^53
    bits = 8
    cells = (1 << bits) - 1
    span = hi - lo
    pts = [lo, hi, hi - 1, span // 2, span // 2 + 1]
    for k in (1, 2, 127, 254, 255):
        edge = k * span // cells
        pts += [edge - 1, edge, edge + 1]
    pts = sorted({p for p in pts if lo <= p <= hi})
    df = spark.createDataFrame([(p,) for p in pts], "v long").select(
        "v",
        quantize_expr(
            F.col("v"), F.lit(lo).cast("long"), F.lit(hi).cast("long"), bits
        ).alias("q"),
    )
    got = {r.v: r.q for r in df.collect()}
    for p in pts:
        want = (p - lo) * cells // span
        assert got[p] == want, (p, got[p], want)


def test_z_value_sql_twin_matches_spark(spark):
    """The oracle-side SQL generator and the Column builder must be the
    SAME function — evaluated via Spark's own SQL parser on a grid."""
    df = spark.createDataFrame(
        [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)],
        "xq long, yq long",
    )
    both = df.select(
        z_value_expr(F.col("xq"), F.col("yq"), 8).alias("za"),
        F.expr(z_value_sql("xq", "yq", 8)).alias("zb"),
    )
    assert both.filter(F.col("za") != F.col("zb")).count() == 0


def test_compact_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """A 64×64 uniform grid: after a LINEAR clustered rewrite (range by x)
    stats prune x-predicates but a y-box must open ~every file; after
    compact_zorder both dimensions prune. This is the whole point of the
    operator — manifest-level files_matching gets 2-D selectivity."""
    grid = spark.range(0, 4096).selectExpr(
        "id", "id % 64 AS x", "CAST(id / 64 AS LONG) AS y"
    )
    lin = str(tmp_path / "lin")
    LT.create_table(grid.repartitionByRange(16, "x").sortWithinPartitions("x"), lin)
    zt = str(tmp_path / "zt")
    LT.create_table(grid.repartition(16), zt)  # unclustered start
    LT.compact_zorder(spark, zt, "x", "y", target_files=16)

    n_lin = len(LT._read_manifest(lin, LT.current_version(lin))["files"])
    n_z = len(LT._read_manifest(zt, LT.current_version(zt))["files"])
    assert n_lin >= 8 and n_z >= 8  # both really are multi-file layouts

    lin_y = len(LT.files_matching(lin, "y", 10, 17))
    z_y = len(LT.files_matching(zt, "y", 10, 17))
    z_x = len(LT.files_matching(zt, "x", 10, 17))
    assert lin_y == n_lin, "linear-by-x layout cannot prune a y predicate"
    assert z_y < n_z, "z-order must prune on the off-axis dimension"
    assert z_x < n_z, "z-order must still prune on x"
    # the logical table is unchanged by the rewrite
    assert LT.read_table(spark, zt).count() == 4096
    got = sorted(
        (r.x, r.y) for r in LT.read_table(spark, zt).select("x", "y").collect()
    )
    assert got == sorted((i % 64, i // 64) for i in range(4096))


def test_cluster_by_z_preserves_rows_and_columns(spark):
    df = spark.range(0, 1000).selectExpr("id", "id % 10 AS x", "id % 7 AS y")
    out = cluster_by_z(df, "x", "y", n_files=4)
    assert out.columns == df.columns
    assert out.count() == 1000


def test_zorder_skip_census_invariants(spark, sf_dir):
    """Per predicate: rows_matching is layout-invariant (pruning never
    loses rows) and scanned rows always cover the matches. On the OFF-AXIS
    y_band — the predicate a linear-by-x layout cannot prune — z-order
    must scan no more files than linear, and strictly prune once the
    fixture is rich enough to fill the 2-D grid (memory: gate strict
    assertions on fixture richness; sf0.001 is too sparse to guarantee a
    strict win, sf0.01+ is not)."""
    rows = {
        (r.layout, r.pred): r
        for r in q.QUERIES["q_zorder_skip"](spark, sf_dir).collect()
    }
    assert len(rows) == 6
    for pred in ("x_band", "y_band", "box"):
        lin, zo = rows[("linear", pred)], rows[("zorder", pred)]
        assert lin.rows_matching == zo.rows_matching, pred
        assert lin.files_total == zo.files_total == 16, pred
        assert lin.rows_scanned >= lin.rows_matching, pred
        assert zo.rows_scanned >= zo.rows_matching, pred
    lin_y, zo_y = rows[("linear", "y_band")], rows[("zorder", "y_band")]
    assert zo_y.files_scanned <= lin_y.files_scanned
    if lin_y.rows_matching >= 1000:  # rich fixture: the strict 2-D win
        assert lin_y.files_scanned == 16, "linear-by-x cannot prune a y band"
        assert zo_y.files_scanned < 16, "z-order must prune the off-axis band"


def test_compact_zorder_is_snapshot_dependent(spark, tmp_path, monkeypatch):
    """Same optimistic-concurrency contract as compact: a rewrite computed
    against a stale snapshot must raise, not silently drop the winner."""
    path = str(tmp_path / "race")
    LT.create_table(
        spark.range(0, 100).selectExpr("id", "id % 10 AS x", "id % 7 AS y"), path
    )
    orig = LT._commit
    fired = {"done": False}

    def wrapped(*args, **kwargs):
        if not fired["done"]:
            fired["done"] = True
            monkeypatch.setattr(LT, "_commit", orig)
            LT.append(
                spark.range(100, 110).selectExpr("id", "id % 10 AS x", "id % 7 AS y"),
                path,
            )
        return orig(*args, **kwargs)

    monkeypatch.setattr(LT, "_commit", wrapped)
    with pytest.raises(LT.ConcurrentWriteError):
        LT.compact_zorder(spark, path, "x", "y", target_files=4)
    LT.compact_zorder(spark, path, "x", "y", target_files=4)  # retry lands
    assert LT.read_table(spark, path).count() == 110
