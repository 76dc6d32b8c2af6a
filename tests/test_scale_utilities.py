"""Tests for the scale utilities: sketches bound their error vs the exact
answer; salted plans must be bit-identical to their unsalted twins; the
streaming log sink (S6) must round-trip records into parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.operators.sketches import (
    approx_usage_sketch,
    usage_sketch_raw,
)
from youtube_api_batch_process_with_analytics_spark.operators.skew import (
    salted_agg_count_sum,
    salted_join,
)
from youtube_api_batch_process_with_analytics_spark.sources import load_table


def test_approx_sketch_attestation_booleans(spark, sf_dir):
    """The gated within-bound query must attest TRUE for every key (its
    oracle emits constant TRUE, so a False here is a red gate row)."""
    rows = approx_usage_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.hll_within_bound and r.p50_within_bound, r


def test_approx_sketch_error_bounds(spark, sf_dir):
    got = {r.event_type: r for r in usage_sketch_raw(spark, sf_dir).collect()}
    exact = {
        r.event_type: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for et, e in exact.items():
        g = got[et]
        # HLL++ at 2% rsd: allow 5 sigma
        assert abs(g.approx_distinct_users - e.d) <= max(3, 0.1 * e.d)
        assert g.n_events == e.n
        # percentile_approx with accuracy 10k on small data ≈ exact
        assert abs(g.p50 - e.p50) <= 0.05 * abs(e.p50) + 1.0


def test_salted_agg_matches_unsalted(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    salted = {
        r.event_type: (r.n, r.total)
        for r in salted_agg_count_sum(
            events, "event_type", "value", "event_id"
        ).collect()
    }
    plain = {
        r.event_type: (r.n, r.total)
        for r in events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert salted == plain  # bit-identical: DECIMAL partials are exact


def test_salted_join_matches_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "user_total")
    )
    salted = salted_join(events, users, "user_id", "event_id")
    plain = events.join(users, "user_id")
    assert salted.count() == plain.count()
    assert (
        salted.exceptAll(plain).count() == 0
        and plain.exceptAll(salted).count() == 0
    )


def test_streaming_log_sink_parquet(spark, sf_dir, tmp_path):
    """S6 (sqlite_logger.py:65-110): append-mode log sink, streaming form —
    foreachBatch writing parquet. Unlike the reference's lossy non-blocking
    SQLite sink (drops lines on contention, sqlite_logger.py:105-107), the
    exactly-once file sink loses nothing; the round-trip count pins that."""
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    out = str(tmp_path / "log_sink")
    ckpt = str(tmp_path / "ckpt")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    def write_batch(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    sunk = spark.read.parquet(out)
    assert sunk.count() == events.count()
    assert "batch_id" in sunk.columns


def test_run_batch_mixed_requests(spark, sf_dir):
    """§3.2 batch envelope: concurrent dispatch, per-item error isolation,
    reference-style result keys (api_server.py:523)."""
    import __spark_entry__ as entrymod
    from youtube_api_batch_process_with_analytics_spark.plans.batch import (
        BatchRequest,
        run_batch,
    )

    registry = entrymod.queries()
    out = run_batch(
        spark,
        sf_dir,
        [
            BatchRequest("log_level_stats"),
            BatchRequest("video_type_distribution"),
            BatchRequest("no_such_query"),
        ],
        registry,
        collect=True,
    )
    assert set(out) == {
        "log_level_stats_0",
        "video_type_distribution_1",
        "no_such_query_2",
    }
    assert out["log_level_stats_0"]["status"] == "success"
    assert out["log_level_stats_0"]["data"]["rows"] > 0
    assert out["video_type_distribution_1"]["status"] == "success"
    assert out["no_such_query_2"]["status"] == "error"
    assert out["no_such_query_2"]["error"]


def test_run_batch_bounds_concurrency(spark, sf_dir):
    """C4's dispatch bound: the batch envelope must never run more than
    MAX_CONCURRENT_WORKERS requests simultaneously — the reference's
    ≤5-thread pool (config.py:40, youtube_api_handler.py:895), pinned by
    a high-water-mark counter inside a registry stub."""
    import threading
    import time

    from youtube_api_batch_process_with_analytics_spark.plans.batch import (
        MAX_CONCURRENT_WORKERS,
        BatchRequest,
        run_batch,
    )

    lock = threading.Lock()
    state = {"now": 0, "peak": 0}

    def tracked(spark_, sf_dir_):
        with lock:
            state["now"] += 1
            state["peak"] = max(state["peak"], state["now"])
        time.sleep(0.05)  # hold the slot so overlap is observable
        with lock:
            state["now"] -= 1
        return spark_.range(1)

    out = run_batch(
        spark,
        sf_dir,
        [BatchRequest("tracked") for _ in range(15)],
        {"tracked": tracked},
        collect=True,
    )
    assert all(v["status"] == "success" for v in out.values())
    assert state["peak"] <= MAX_CONCURRENT_WORKERS, state
    # and the pool genuinely overlaps work (not serialized dispatch)
    assert state["peak"] >= 2, state
