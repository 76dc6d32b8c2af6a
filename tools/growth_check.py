"""Scale-growth tripwire (round-9 verdict item 8).

semantic_dedup's super-linear tier growth was only visible because the
sf3 suite happened to be extended — this makes the check structural:
given two bench payloads at different scale factors, compute each
query's normalized growth

    growth = (t_hi / t_lo) / (sf_hi / sf_lo)

(1.0 = perfectly linear in data, <1 = amortizing fixed cost — the
signature the suite should show, >1 = super-linear) and flag anything
above the tripwire. Sub-second hi-tier queries are reported but never
flagged: their timings are orchestration noise, not data-path growth.

Usage:
    python tools/growth_check.py BENCH_SF1.json BENCH_SF3.json [--apply]

--apply writes the table back into the HIGHER tier's payload under
"growth" (per-query normalized ratios) and "superlinear" (the flagged
list), so the committed BENCH_SF3.json carries its own tripwire.
Exit code 0 always — the tripwire is a report, not a gate; the round
close reads the flag list and either fixes or declares each entry.
"""

from __future__ import annotations

import json
import sys

TRIPWIRE = 1.5      # normalized growth above this is super-linear
MIN_HI_SEC = 1.0    # hi-tier queries faster than this are noise, not data


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--apply"]
    apply = "--apply" in sys.argv[1:]
    if len(args) != 2:
        sys.exit("usage: growth_check.py LO_BENCH.json HI_BENCH.json [--apply]")
    lo = json.load(open(args[0]))
    hi = json.load(open(args[1]))
    sf_lo, sf_hi = float(lo["sf"]), float(hi["sf"])
    if sf_hi <= sf_lo:
        sys.exit("second payload must be the higher scale factor")
    data_ratio = sf_hi / sf_lo

    growth: dict[str, float] = {}
    flagged: list[str] = []
    for name, t_hi in sorted(hi["queries"].items()):
        t_lo = lo["queries"].get(name)
        if not t_lo:
            continue
        g = round((t_hi / t_lo) / data_ratio, 3)
        growth[name] = g
        if g > TRIPWIRE and t_hi >= MIN_HI_SEC:
            flagged.append(name)

    print(f"data ratio sf{sf_lo} -> sf{sf_hi}: {data_ratio:g}x")
    for name in sorted(growth, key=growth.get, reverse=True)[:15]:
        mark = "  << SUPER-LINEAR" if name in flagged else ""
        print(
            f"  {name}: {growth[name]:.3f}  "
            f"({lo['queries'][name]:.2f}s -> {hi['queries'][name]:.2f}s){mark}"
        )
    print(f"flagged (> {TRIPWIRE} normalized, hi >= {MIN_HI_SEC}s): {flagged}")

    if apply:
        hi["growth"] = growth
        hi["growth_vs_sf"] = sf_lo
        hi["superlinear"] = flagged
        with open(args[1], "w") as f:
            json.dump(hi, f, indent=1)
        print(f"written into {args[1]}")


if __name__ == "__main__":
    main()
