"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares row count, column names,
and an order-insensitive value hash. Usage:

    python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from tests.oracle_utils import fetch_duck
from youtube_api_batch_process_with_analytics_spark.session import get_spark
from youtube_api_batch_process_with_analytics_spark.sources import TABLES


def value_hash(rows, columns):
    """Order-insensitive hash: sort columns by name, format values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = []
    for row in rows:
        lines.append(
            "\x1f".join(_fmt(row[i]) for i in order)
        )
    lines.sort()
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def _fmt(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # generated tiers (tools/make_sf1.py) write each table as a
        # DIRECTORY of part files — the multi-split shape a real cluster
        # scan has; glob them for DuckDB (Spark reads the dir natively)
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    try:
        failures = _run(spark, con, qs, oracles, sf_dir, only)
    finally:
        # drop the session-staged artifacts (latch source, post-retention
        # layout) even when a query raises — tempdirs otherwise outlive
        # the process, one set per run
        from youtube_api_batch_process_with_analytics_spark.operators.memo import (
            release_session_frames,
        )

        release_session_frames()
        spark.stop()
    sys.exit(1 if failures else 0)


def _run(spark, con, qs, oracles, sf_dir, only):
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: spark_rows={len(srows)} (no oracle — rows-only)")
            continue
        # Arrow/pandas fetch shared with the unit tests (surfaces the
        # DuckDB HUGEINT→float64 coercion the driver's gate sees, restores
        # DATE columns, nulls NaN/NaT) — one implementation, two replicas.
        dcols, drows = fetch_duck(con, oracles[name])
        sh = value_hash([tuple(r) for r in srows], scols)
        dh = value_hash(drows, dcols)
        ok = len(srows) == len(drows) and sorted(scols) == sorted(dcols) and sh == dh
        status = "OK " if ok else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} "
            f"cols_match={sorted(scols) == sorted(dcols)} hash_match={sh == dh}"
        )
        if not ok:
            failures += 1
            if sorted(scols) != sorted(dcols):
                print(f"  spark cols: {sorted(scols)}")
                print(f"  duck  cols: {sorted(dcols)}")
            else:
                # show first differing row pair under column-sorted order
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                a = sorted(["\x1f".join(_fmt(t[i]) for i in order_s) for t in srows])
                b = sorted(["\x1f".join(_fmt(t[i]) for i in order_d) for t in drows])
                for x, y in zip(a, b):
                    if x != y:
                        print(f"  spark: {x.replace(chr(31), ' | ')}")
                        print(f"  duck : {y.replace(chr(31), ' | ')}")
                        break
    return failures


if __name__ == "__main__":
    main()
