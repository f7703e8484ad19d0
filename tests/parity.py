"""Local mirror of the driver's oracle compare (SURVEY.md §5.2).

Normalizes both result sets to an order-insensitive multiset of rows with
columns sorted by name, then asserts equality. Floats are compared after the
queries' own rounding (SURVEY §7.4.4) plus a tiny epsilon-canonicalization to
absorb -0.0 / representation noise; timestamps via isoformat; arrays as
tuples.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter


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


def assert_parity(df, con, sql, name=""):
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
