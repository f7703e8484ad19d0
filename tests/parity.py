"""Local mirror of the driver's oracle compare (SURVEY.md §5.2).

Two layers, both run by ``assert_parity``:

1. Typed multiset compare (good diagnostics): both result sets normalized to
   an order-insensitive multiset of rows with columns sorted by name. Floats
   compared after the queries' own rounding (SURVEY §7.4.4) plus epsilon
   canonicalization; timestamps via isoformat; arrays as tuples.
2. Driver-canon compare (driver-faithful, VERDICT r1 #4): both sides
   materialized as PANDAS frames — Spark via ``toPandas()``, DuckDB via
   ``.df()`` (NOT ``fetchall()``: DuckDB HUGEINT becomes float64 in pandas
   but a Python int via fetchall, which hid the q_doc_stats dtype bug from
   round 1) — then ``sort_values`` over all columns and cell-stringified,
   exactly the shape of the driver's ``_canon``. This layer crashes on raw
   array columns (unhashable ndarray in sort_values) just like the driver
   does, and distinguishes ``123.0`` from ``123``.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter

import pandas as pd


def _norm_val(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_val(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v
    if isinstance(v, int):
        return int(v)
    return v


def spark_rows(df):
    cols = sorted(df.columns)
    return cols, Counter(tuple(_norm_val(r[c]) for c in cols) for r in df.collect())


def duck_rows(con, sql):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = Counter(tuple(_norm_val(row[i]) for i in order) for row in res.fetchall())
    return cols, rows


def _col_types(cols, rows):
    """Python type of the first non-null value per column (int vs float vs …).

    The driver's value-hash may stringify values, where 6 != 6.0 — so type
    parity matters even though Python's == would pass.
    """
    types = {}
    for row in rows:
        for c, v in zip(cols, row):
            if v is not None and c not in types:
                types[c] = type(v).__name__
        if len(types) == len(cols):
            break
    return types


def _canon_cell(v) -> str:
    """Stringify one pandas cell the way the driver's value-hash sees it.

    Scalars only — a list/ndarray cell raises (mirroring the driver's
    sort_values TypeError) because registered queries must serialize arrays.
    """
    if v is None:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError) as exc:  # ndarray/list cell
        raise TypeError(
            f"non-scalar cell {type(v).__name__} — registered queries must "
            "serialize array columns (array_join / to_json) in both engines"
        ) from exc
    if isinstance(v, float) and v == 0.0:
        v = 0.0  # -0.0 → 0.0, matches _norm_val
    return str(v)


def driver_canon(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """The driver's ``_canon`` shape: columns sorted by name, rows sorted by
    all columns (crashes on unhashable cells, as the driver does), every cell
    stringified. int64 6 → '6' but float64 6.0 → '6.0' — dtype drift between
    Spark and the DuckDB pandas materialization is a FAILURE here."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]


def assert_driver_canon(df, con, sql, name=""):
    """Layer 2: driver-faithful pandas canon compare (see module docstring)."""
    s_pdf = df.toPandas()
    d_pdf = con.execute(sql).df()
    try:
        s_canon = driver_canon(s_pdf)
    except (TypeError, ValueError) as exc:
        raise AssertionError(f"{name}: Spark result not driver-canonicalizable: {exc}") from exc
    try:
        d_canon = driver_canon(d_pdf)
    except (TypeError, ValueError) as exc:
        raise AssertionError(f"{name}: oracle result not driver-canonicalizable: {exc}") from exc
    if s_canon != d_canon:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: driver-canon mismatch "
            f"(spark={len(s_canon)} duck={len(d_canon)} rows)\n"
            f"  first diffs (row, spark, duck): {diffs}"
        )


def assert_parity(df, con, sql, name=""):
    """Both compare layers; returns the Spark-side row count so callers can
    layer row-count invariants (e.g. the driver-window nonempty check) on
    the same execution instead of re-running the query."""
    df = df.persist()  # both layers materialize the Spark side — compute once
    try:
        s_cols, s_rows = spark_rows(df)
        d_cols, d_rows = duck_rows(con, sql)
        assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
        s_t, d_t = _col_types(s_cols, s_rows), _col_types(d_cols, d_rows)
        assert s_t == d_t, f"{name}: value-type mismatch spark={s_t} duck={d_t}"
        if s_rows != d_rows:
            missing = d_rows - s_rows
            extra = s_rows - d_rows
            raise AssertionError(
                f"{name}: row multiset mismatch "
                f"(spark={sum(s_rows.values())} duck={sum(d_rows.values())} rows)\n"
                f"  only-in-duck (≤5): {list(missing.items())[:5]}\n"
                f"  only-in-spark (≤5): {list(extra.items())[:5]}"
            )
        assert_driver_canon(df, con, sql, name=name)
        return sum(s_rows.values())
    finally:
        df.unpersist()
