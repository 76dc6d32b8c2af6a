"""A/B the connected-components iteration schedule (round-12 verdict item 8).

dedup_connected_components is barrier-dominated (8-vs-32-core ratio 0.75):
each min-label propagation hop costs a full Spark job (persist-filling
count) plus a persist swap, over an edge list that is tiny relative to the
corpus. Two levers, both label-preserving by construction (monotone
non-increasing labels, unchanged fixpoint):

- SPARK_GRAFT_CC_HOPS=H    fold H hops into one checked job (H× fewer
                           jobs/persists, ≤ H-1 no-op hops after fixpoint)
- SPARK_GRAFT_CC_DOUBLE=1  pointer doubling (label <- label(label) each
                           hop; exponential propagation along chains)

This tool times each requested mode in a FRESH process (the knobs are
read at import) over the same sf dir, min-of-N warm reps after a warm-up,
and cross-checks an order-insensitive hash of (doc_id, component_id,
cluster_size, is_canonical) across modes — a mode that changes ANY label
is reported and must not ship.

Usage:
    python tools/ab_cc_rounds.py <sf_dir> [reps] [mode ...]

Modes are "H" or "Hd" (d = doubling), e.g.:  1 2 3 2d. Default: 1 2 2d 3.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(sf_dir: str, reps: int) -> None:
    from youtube_api_batch_process_with_analytics_spark.operators import dedup
    from youtube_api_batch_process_with_analytics_spark.session import get_spark

    spark = get_spark(app_name="ab_cc_rounds")

    def run() -> float:
        t0 = time.monotonic()
        out = dedup.dedup_connected_components(spark, sf_dir)
        out.write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        dedup.release_cc_caches()
        return dt

    run()  # warm-up (session + parquet footers + codegen)
    times = [run() for _ in range(reps)]
    out = dedup.dedup_connected_components(spark, sf_dir)
    rows = sorted(
        (r.doc_id, r.component_id, r.cluster_size, r.is_canonical)
        for r in out.collect()
    )
    dedup.release_cc_caches()
    digest = hashlib.md5(repr(rows).encode()).hexdigest()
    print(
        json.dumps(
            {
                "hops": dedup.CC_HOPS_PER_CHECK,
                "doubling": dedup.CC_POINTER_DOUBLING,
                "reps": times,
                "min": min(times),
                "last_hops": dedup.CC_LAST_ROUNDS,
                "labels_md5": digest,
                "n_rows": len(rows),
            }
        )
    )


def main() -> None:
    if sys.argv[1:2] == ["--worker"]:
        worker(sys.argv[2], int(sys.argv[3]))
        return
    if len(sys.argv) < 2:
        sys.exit("usage: ab_cc_rounds.py <sf_dir> [reps] [mode ...]")
    sf_dir = sys.argv[1]
    rest = sys.argv[2:]
    reps = int(rest.pop(0)) if rest and rest[0].isdigit() and len(rest[0]) == 1 else 3
    modes = rest or ["1", "2", "2d", "3"]
    results = []
    for mode in modes:
        env = dict(os.environ)
        env["SPARK_GRAFT_CC_HOPS"] = mode.rstrip("d")
        env["SPARK_GRAFT_CC_DOUBLE"] = "1" if mode.endswith("d") else "0"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", sf_dir, str(reps)],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"mode {mode}: FAILED\n{proc.stderr[-2000:]}")
            continue
        res = json.loads(line[-1])
        res["mode"] = mode
        results.append(res)
        print(
            f"mode {mode:>3}: min={res['min']:7.3f}s reps={[round(t,3) for t in res['reps']]} "
            f"hops={res['last_hops']} labels={res['labels_md5'][:10]} rows={res['n_rows']}"
        )
    hashes = {r["labels_md5"] for r in results}
    print(
        "labels identical across modes"
        if len(hashes) <= 1
        else f"LABEL MISMATCH across modes: { {r['mode']: r['labels_md5'] for r in results} }"
    )


if __name__ == "__main__":
    main()
