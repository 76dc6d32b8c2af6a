"""Shared Spark-vs-DuckDB differential comparison (mirrors the driver gate)."""

from __future__ import annotations

import hashlib


def _fmt(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("\x1f".join(_fmt(row[i]) for i in order) for row in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def _isna(v):
    """Scalar NaN/NaT from a pandas fetch → None (Spark NULL equivalent)."""
    import pandas as pd

    try:
        return v is None or (
            not isinstance(v, (list, tuple, dict)) and pd.isna(v)
        )
    except (TypeError, ValueError):
        return False


def assert_oracle_match(sdf, duck, sql):
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = duck.execute(sql)
    desc = res.description
    # Fetch via Arrow/pandas like the driver's gate: DuckDB HUGEINT (an
    # un-cast SUM(BIGINT)) coerces to float64 here and hash-mismatches —
    # fetchall would silently hide that class of oracle bug.
    dpdf = res.df()
    dcols = list(dpdf.columns)
    date_cols = {d[0] for d in desc if str(d[1]).upper() == "DATE"}
    for c in date_cols & set(dcols):
        dpdf[c] = dpdf[c].dt.date
    drows = [
        tuple(None if _isna(v) else v for v in r)
        for r in dpdf.itertuples(index=False, name=None)
    ]
    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"row count differs: {len(srows)} vs {len(drows)}"
    sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
    if sh != dh:
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        a = sorted("\x1f".join(_fmt(t[i]) for i in order_s) for t in srows)
        b = sorted("\x1f".join(_fmt(t[i]) for i in order_d) for t in drows)
        diff = next(
            (x, y) for x, y in zip(a, b) if x != y
        )
        raise AssertionError(
            f"value hash differs; first diff:\n spark: {diff[0]}\n duck : {diff[1]}"
        )
