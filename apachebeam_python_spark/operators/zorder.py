"""Z-order (Morton) clustering — multi-dimensional data skipping.

SURVEY §2.11 lake-maintenance tier, round 7: single-column sorting gives
tight file min/max stats on ONE column; a scan filtering on any other
column opens every file. Interleaving the bits of two quantized sort keys
(the Morton curve) makes file key-ranges into small 2-D tiles, so
manifest-level stats pruning (``laketable.files_matching``) skips files
for predicates on EITHER column — Delta's ``OPTIMIZE ZORDER BY`` and
Iceberg's z-ordered rewrite use exactly this. At 100 TB the win is the
difference between a 2-D point lookup scanning ~√F of F files (z-order)
versus all F (linear layout, off-axis predicate).

Everything here is engine-exact integer arithmetic: quantization is
integer floor-division against data min/max, and the interleave is a
closed-form sum of shifted bits — both sides of the DuckDB oracle compute
identical int64s, so z-order queries hash-match like any other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_expr(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map an integer column into [0, 2**bits) cells by linear scaling:
    ``(col - lo) * (2**bits - 1) div (hi - lo)`` (floor division; a
    constant column when hi == lo). Inputs must already be integers
    (money goes through cents first — the repo's engine-parity rule).

    The whole computation runs in ``decimal(38,0)`` — Spark's exact
    128-bit integer lane — so there is genuinely no 2**53 cliff: the
    multiply ``(col - lo) * cells`` cannot overflow int64 into wraparound,
    and the division (made exact first via the modulo identity
    ``(n - n % d) / d``) never routes through a double. The quotient is a
    small integer (< 2**bits), exactly representable in the decimal
    result, and engine-identical to DuckDB's HUGEINT ``//``. Valid for
    any int64 input domain (nanosecond timestamps, wide surrogate ids)."""
    cells = (1 << bits) - 1
    dec = "decimal(38,0)"
    span = (hi.cast(dec) - lo.cast(dec))
    num = (col.cast(dec) - lo.cast(dec)) * F.lit(cells).cast(dec)
    exact_div = ((num - num % span) / span).cast("long")
    return F.when(span <= 0, F.lit(0).cast("long")).otherwise(exact_div)


def z_value_expr(xq: Column, yq: Column, bits: int = 8) -> Column:
    """Morton interleave of two ``bits``-bit cells: bit i of x lands at
    position 2i+1, bit i of y at 2i. Closed-form sum of shifted bits —
    whole-stage-codegen arithmetic, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xq, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(yq, i).bitwiseAND(F.lit(1)), 2 * i))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def z_value_sql(xq: str, yq: str, bits: int = 8) -> str:
    """The identical interleave as portable SQL (DuckDB oracle twin):
    ``((xq >> i) & 1) << (2i+1)`` terms summed. Both engines support the
    shift/and operators with these exact semantics on non-negative ints."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xq} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({yq} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_z(
    df: DataFrame, x: str, y: str, *, bits: int = 8, n_files: int = 16
) -> DataFrame:
    """Physically cluster ``df`` on the Morton curve of integer columns
    ``x`` and ``y``: quantize each against its own min/max (computed in
    one tiny agg, broadcast back), range-partition on the z-value into
    ``n_files`` partitions and sort within each — the write-side layout
    that makes every file a compact 2-D tile.

    Scale: the agg is 2 columns × 1 row; repartitionByRange samples the
    z distribution (one pass) and the sort is per-partition. One shuffle,
    same cost as any global sort — paid once at write time, amortized by
    every 2-D-filtered scan after (the OPTIMIZE ZORDER contract)."""
    bounds = df.agg(
        F.min(x).cast("long").alias("__xlo"),
        F.max(x).cast("long").alias("__xhi"),
        F.min(y).cast("long").alias("__ylo"),
        F.max(y).cast("long").alias("__yhi"),
    )
    with_z = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__z",
        z_value_expr(
            quantize_expr(F.col(x).cast("long"), F.col("__xlo"), F.col("__xhi"), bits),
            quantize_expr(F.col(y).cast("long"), F.col("__ylo"), F.col("__yhi"), bits),
            bits,
        ),
    )
    return (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__xlo", "__xhi", "__ylo", "__yhi")
    )
