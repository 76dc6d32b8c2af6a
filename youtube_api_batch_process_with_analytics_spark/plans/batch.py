"""Heterogeneous batch execution (SURVEY.md §2.11 C1/C3, §3.2).

The reference's ``/api/batch`` dispatches up to 20 typed requests
sequentially with per-item error isolation (api_server.py:473-570), and
``batch_process_mixed_requests`` runs the same dispatch across a ≤5-thread
pool (youtube_api_handler.py:891-924).

Spark analog: each request is an independent DataFrame query; a driver-side
thread pool submits them concurrently and Spark's scheduler interleaves the
jobs across the cluster (enable the FAIR scheduler for true sharing).
Failures are isolated per request — one bad query yields an error entry,
not a failed batch (mirroring api_server.py:556-562).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

MAX_BATCH_REQUESTS = 20  # api_server.py:504-514
MAX_CONCURRENT_WORKERS = 5  # config.py:40
FUTURE_TIMEOUT_S = 30.0  # youtube_api_handler.py:918


@dataclass
class BatchRequest:
    """One typed request: a registered query name + optional params."""

    type: str
    params: dict[str, Any] = field(default_factory=dict)


def run_batch(
    spark: SparkSession,
    sf_dir: str,
    requests: list[BatchRequest],
    registry: dict[str, Callable[[SparkSession, str], DataFrame]],
    max_workers: int = MAX_CONCURRENT_WORKERS,
    collect: bool = False,
) -> dict[str, dict[str, Any]]:
    """Execute a mixed batch; results keyed ``f"{type}_{i}"``
    (api_server.py:523).

    Returns per-request dicts with ``status``/``data``/``error``. With
    ``collect=False`` the value is the (lazy) DataFrame — callers sink it
    themselves; ``collect=True`` materializes counts for smoke use.
    """
    if len(requests) > MAX_BATCH_REQUESTS:
        raise ValueError(
            f"batch size {len(requests)} exceeds limit {MAX_BATCH_REQUESTS}"
        )

    def one(i: int, req: BatchRequest) -> tuple[str, dict[str, Any]]:
        key = f"{req.type}_{i}"
        try:
            fn = registry[req.type]
            df = fn(spark, sf_dir, **req.params)
            data: Any = df
            if collect:
                data = {"rows": df.count(), "columns": df.columns}
            return key, {"status": "success", "data": data, "error": None}
        except Exception as exc:  # per-item isolation (api_server.py:556-562)
            return key, {"status": "error", "data": None, "error": str(exc)}

    results: dict[str, dict[str, Any]] = {}
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {
            pool.submit(one, i, req): i for i, req in enumerate(requests)
        }
        for fut in as_completed(futures, timeout=FUTURE_TIMEOUT_S * len(requests)):
            key, value = fut.result()
            results[key] = value
    return results
