"""DuckDB comparator timing — the other half of the bench pair.

Runs every ``oracle_sql()`` twin over the given sf directory on DuckDB,
min of N warm reps per query (mirroring ``bench.py``'s min-of-reps
steady-state policy), and prints ONE JSON line; full per-query detail
goes to a file next to the repo's other bench artifacts.

Usage:
    python tools/bench_duck.py [sf_dir] [out_name] [reps] [query ...]

A trailing query list restricts the run to that subset (the committed
scale-tier heavy-family passes, e.g. BENCH_DUCK_SF3.json).

Defaults: /root/testdata/sf0.1, BENCH_DUCK.json, 3 reps (min-of-3,
symmetric with bench.py's per-query rep policy). Round-6 verdict
task #3 asked for a committed comparator at sf1 so the 2x-at-same-scale
criterion is attested beyond sf0.1:
    python tools/bench_duck.py testdata_sf1 BENCH_DUCK_SF1.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from youtube_api_batch_process_with_analytics_spark.sources import TABLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_name = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DUCK.json"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    oracles = entrymod.oracle_sql()
    only = sys.argv[4:]  # optional query subset (scale-tier heavy passes)
    if only:
        unknown = [n for n in only if n not in oracles]
        if unknown:
            sys.exit(
                "unknown query name(s): "
                + ", ".join(unknown)
                + f" — pick from: {', '.join(sorted(oracles))}"
            )
        oracles = {n: oracles[n] for n in only}
    timings: dict[str, float] = {}
    for name in sorted(oracles):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            # .df() — the same Arrow/pandas materialization path the
            # correctness gate fetches through
            con.execute(oracles[name]).df()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "duck_suite_total",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), out_name
    )
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    compact = dict(payload)
    compact["queries"] = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    compact["queries_full"] = out_name
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
