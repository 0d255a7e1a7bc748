"""Watermarks + late data, streaming dedup, stream-stream interval join —
the Table-B streaming rows the reference lacks entirely (no event time,
SURVEY.md §2: 'Streaming: watermarks — absent') and the engine gets from
Structured Streaming.

File-source micro-batches (maxFilesPerTrigger=1) stand in for Kafka: the
watermark advances between batches exactly as with a live source.
"""

from __future__ import annotations

import pytest

# slow tier (VERDICT r12 #6): live watermarked window/session/dedup streams -- seconds-per-test by
# nature (micro-batch scheduling waits, not compute). Full suite
# stays the pre-commit gate; `-m "not slow"` is the fast lane.
pytestmark = pytest.mark.slow

from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(sec: int) -> datetime:
    """Naive UTC timestamp `sec` seconds past 2024-01-01 00:00:00."""
    return datetime(2024, 1, 1, sec // 3600, (sec // 60) % 60, sec % 60)


def test_watermark_drops_late_rows(spark, tmp_path):
    """The late batch must arrive in a *later trigger* than the one that
    advanced the watermark, so the second file is written while the query
    runs (availableNow coalesces all pending files into one batch)."""
    import time

    src = str(tmp_path / "src")
    # batch 1: two rows in window [0,60) + one at 150s (watermark -> 140s)
    spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(20)), (3, _ts(150))], "id long, ts timestamp"
    ).coalesce(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "60 seconds"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("w"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and (q.lastProgress or {}).get("batchId", -1) < 1:
            time.sleep(0.3)
        # batch 2: a late row at 30s (< watermark 140s -> dropped) + 180s
        spark.createDataFrame(
            [(4, _ts(30)), (5, _ts(180))], "id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)
        deadline = time.time() + 90
        while time.time() < deadline:
            time.sleep(0.3)
            if spark.sql("SELECT * FROM wm_out").count() > 0:
                time.sleep(1.0)  # allow any further (unexpected) emissions
                break
    finally:
        q.stop()
        q.awaitTermination(30)
    rows = {r.w.second + 60 * r.w.minute: r.n for r in spark.sql("SELECT * FROM wm_out").collect()}
    # window [0,60) finalized with ONLY the two on-time rows; the late id=4
    # (event time 30s, behind the 140s watermark) was dropped
    assert rows.get(0) == 2, rows


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("k1", _ts(10)), ("k2", _ts(20))], "key string, ts timestamp"
    ).coalesce(1).write.parquet(src)
    # duplicate k1 arriving in a later batch, within the watermark window
    spark.createDataFrame(
        [("k1", _ts(15)), ("k3", _ts(40))], "key string, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    deduped = stream.withWatermark("ts", "1 minute").dropDuplicatesWithinWatermark(["key"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    keys = sorted(r.key for r in spark.sql("SELECT * FROM dd_out").collect())
    assert keys == ["k1", "k2", "k3"], keys


def test_stream_stream_interval_join(spark, tmp_path):
    """Clicks joined to purchases within a 60-second interval — the
    watermark-bounded stream-stream join (Table B 'range/interval joins',
    streaming form of operators.relational.asof_join)."""
    left_src = str(tmp_path / "left")
    right_src = str(tmp_path / "right")
    spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(100)), (3, _ts(300))], "user long, click_ts timestamp"
    ).write.parquet(left_src)
    spark.createDataFrame(
        [(1, _ts(40)), (2, _ts(250)), (4, _ts(310))], "user long, buy_ts timestamp"
    ).write.parquet(right_src)

    clicks = (
        spark.readStream.schema(spark.read.parquet(left_src).schema)
        .parquet(left_src)
        .withWatermark("click_ts", "5 minutes")
    )
    buys = (
        spark.readStream.schema(spark.read.parquet(right_src).schema)
        .parquet(right_src)
        .withWatermark("buy_ts", "5 minutes")
    )
    joined = clicks.join(
        buys,
        (clicks.user == buys.user)
        & (buys.buy_ts >= clicks.click_ts)
        & (buys.buy_ts <= clicks.click_ts + F.expr("INTERVAL 60 seconds")),
    )
    q = (
        joined.select(clicks.user.alias("u"), "click_ts", "buy_ts")
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    users = sorted(r.u for r in spark.sql("SELECT * FROM ssj_out").collect())
    # user 1: buy 30s after click -> match; user 2: buy 150s later -> no;
    # user 3 never buys; user 4 never clicks
    assert users == [1], users


def test_sliding_pane_merge_streaming(spark, tmp_path):
    """The events_time_windows pane/slice optimization runs under
    Structured Streaming: tumbling 5-minute aggregate (watermarked) →
    chained 10-minute/5-minute window re-aggregation of the tiny panes
    (Spark's multiple-stateful-operator support, window() over the window
    column). Closed windows must equal the batch pane-merge on the same
    input — the docstring claim VERDICT r03 flagged as unverified (item 3)."""
    src = str(tmp_path / "src")
    data = [
        ("a", _ts(10), 5),
        ("a", _ts(70), 7),
        ("b", _ts(200), 1),
        ("a", _ts(320), 11),
        ("b", _ts(610), 2),
    ]
    late = [("a", _ts(900), 3), ("b", _ts(1210), 9)]
    schema = "event_type string, ts timestamp, value long"
    # one initial file: the "late" rows are future events (ahead of the
    # first batch's max ts), so landing them with the first batch changes
    # nothing semantically — window closure is driven entirely by the
    # sentinel batches — and saves one dual-stateful micro-batch
    spark.createDataFrame(data + late, schema).coalesce(1).write.parquet(src)
    # two sentinel batches: the first advances the watermark past every
    # real window; the second makes Spark run one more batch so the
    # emission actually happens (watermark updates apply next-batch)
    spark.createDataFrame(
        [("s", datetime(2024, 1, 2), 0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("s", datetime(2024, 1, 3), 0)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    base = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n0"), F.sum("value").alias("sv0"))
    )
    sliding = (
        base.groupBy(
            F.window(F.col("window"), "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.sum("n0").alias("n"), F.sum("sv0").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    q = (
        sliding.writeStream.format("memory")
        .queryName("pane_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    cutoff = datetime(2024, 1, 1, 12)
    got = {
        (r.window_start, r.event_type, r.n, r.total_value)
        for r in spark.sql("SELECT * FROM pane_out").collect()
        if r.window_start < cutoff
    }

    batch = spark.createDataFrame(data + late, schema)
    expected = {
        (r.window_start, r.event_type, r.n, r.total_value)
        for r in (
            batch.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
            .collect()
        )
    }
    assert got == expected, (sorted(got), sorted(expected))


def test_session_window_streaming_equals_batch(spark, tmp_path):
    """Native session_window under a watermark: closed sessions emitted
    on the stream must equal the batch session_window aggregate on the
    same rows — the 'streaming-ready' claim events_session_window's
    docstring makes, run live. Covers the merge case (two events 10 min
    apart fusing into one session) and the split case (gap > 30 min)."""
    src = str(tmp_path / "src")
    data = [
        (1, _ts(0)), (1, _ts(600)),      # one session [0, 600+1800)
        (1, _ts(3000)),                  # gap 2400s > 1800 -> new session
        (2, _ts(100)),                   # singleton
    ]
    schema = "user_id long, ts timestamp"
    spark.createDataFrame(data, schema).coalesce(1).write.parquet(src)
    # sentinel pair: advance the watermark past every session end, then
    # run one more batch so the eviction emits (same discipline as
    # test_sliding_pane_merge_streaming)
    for day in (2, 3):
        spark.createDataFrame(
            [(SENT := 999, datetime(2024, 1, day))], schema
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sw_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(
            tuple,
            spark.sql(f"SELECT * FROM sw_out WHERE user_id <> {SENT}").collect(),
        )
    )
    batch = spark.createDataFrame(data, schema)
    want = sorted(
        map(
            tuple,
            batch.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
            .collect(),
        )
    )
    assert got == want
    assert [(r[0], r[3]) for r in got] == [(1, 2), (1, 1), (2, 1)]
