"""Cross-engine ratio tripwire (round-10 verdict item 7).

`bm25_search` (5.7× DuckDB at sf1) and `benchmark_contamination` (3.36×
at sf3) were judge-found, not machine-found — this makes the per-query
spark/duck ratio check structural, the `growth_check.py` precedent:
given a Spark bench payload and its same-tier DuckDB payload (both from
the SAME session pair — host throughput drifts ±10% day-to-day, so only
back-to-back ratios are meaningful), compute

    ratio = t_spark / t_duck          per query

and flag data-path entries breaching the 2× letter. Floors are
ASYMMETRIC: the Spark side must be ≥ 1s (below that it is py4j plan
construction, not data-path cost), the DuckDB side ≥ 0.2s (below THAT
the ratio denominators are parse floor — but a duck under 1s is still a
meaningful comparator: bm25_search's 5.7× at sf1 had duck at 0.28s and
a both-sides-1s floor would have hidden it, the exact judge-found case
this tool exists to machine-flag). Declared streaming-engine
attestations (the quota latch runs a real Structured Streaming query;
DuckDB has no streaming engine to price) are annotated, not flagged.

Usage:
    python tools/ratio_check.py BENCH_SF1.json BENCH_DUCK_SF1.json [--apply]

--apply writes back into the SPARK payload: "ratios" (per-query, only
entries where both engines ≥ MIN_SEC) and "ratio_flags" (the >2× list).
Exit 0 always — a report, not a gate; round close fixes or declares
each flag.
"""

from __future__ import annotations

import json
import sys

RATIO_TRIPWIRE = 2.0   # the judge's >2× perf-weak letter
MIN_SPARK_SEC = 1.0    # below this the Spark time is orchestration floor
MIN_DUCK_SEC = 0.2     # below this the duck denominator is parse floor

# Declared costs, annotated instead of flagged (keep in sync with README):
DECLARED = {
    "quota_latch_final": "real Structured Streaming engine attestation",
    "ann_vectorized_bound": (
        "differential attestation device: executes BOTH the fold-exact "
        "path and the GEMM kernel and cross-checks rank-wise; the twin "
        "computes only the exact side"
    ),
}


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--apply"]
    apply = "--apply" in sys.argv[1:]
    if len(args) != 2:
        sys.exit("usage: ratio_check.py SPARK_BENCH.json DUCK_BENCH.json [--apply]")
    spark = json.load(open(args[0]))
    duck = json.load(open(args[1]))
    sq, dq = spark.get("queries", {}), duck.get("queries", {})
    ratios: dict[str, float] = {}
    flags: list[str] = []
    declared: dict[str, str] = {}
    for name in sorted(set(sq) & set(dq)):
        ts, td = sq[name], dq[name]
        if ts < MIN_SPARK_SEC or td < MIN_DUCK_SEC:
            continue  # orchestration/parse floor
        r = round(ts / td, 2)
        ratios[name] = r
        if r > RATIO_TRIPWIRE:
            if name in DECLARED:
                declared[name] = DECLARED[name]
            else:
                flags.append(name)
    width = max((len(n) for n in ratios), default=10)
    for name, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        mark = (
            " <-- FLAG"
            if name in flags
            else (" (declared)" if name in declared else "")
        )
        print(f"{name:{width}s} spark={sq[name]:7.2f} duck={dq[name]:7.2f} "
              f"ratio={r:5.2f}{mark}")
    print(f"\n{len(ratios)} comparable (spark>={MIN_SPARK_SEC}s, "
          f"duck>={MIN_DUCK_SEC}s); "
          f"flags: {flags or 'none'}; declared: {sorted(declared) or 'none'}")
    if apply:
        spark["ratios"] = ratios
        spark["ratio_flags"] = flags
        spark["ratio_declared"] = declared
        with open(args[0], "w") as f:
            json.dump(spark, f, indent=1)
        print(f"applied to {args[0]}")


if __name__ == "__main__":
    main()
