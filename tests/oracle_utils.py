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
    """Scalar NaN/NaT from a pandas fetch → None (Spark NULL equivalent).
    Sequence values (lists/tuples and the np.ndarray that duckdb ``.df()``
    returns for LIST columns) are never NULL — ``pd.isna`` on them yields
    an array, not a bool, so they must be excluded before the call."""
    import numpy as np
    import pandas as pd

    if v is None:
        return True
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        return False
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def fetch_duck(duck, sql):
    """(columns, rows) from DuckDB via the Arrow/pandas path the driver's
    gate uses: DuckDB HUGEINT (an un-cast SUM(BIGINT)) coerces to float64
    here and hash-mismatches — fetchall would silently hide that class of
    oracle bug. DATE columns are restored to date objects (pandas loads
    them as datetime64) and NaN/NaT becomes None. Shared by the unit tests
    and tools/compare_oracle.py so both replicas stay in lockstep."""
    res = duck.execute(sql)
    desc = res.description
    dpdf = res.df()
    dcols = list(dpdf.columns)
    date_cols = {d[0] for d in desc if str(d[1]).upper() == "DATE"}
    for c in date_cols & set(dcols):
        dpdf[c] = dpdf[c].dt.date
    drows = [
        tuple(None if _isna(v) else v for v in r)
        for r in dpdf.itertuples(index=False, name=None)
    ]
    return dcols, drows


def assert_oracle_match(sdf, duck, sql):
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    dcols, drows = fetch_duck(duck, sql)
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
