"""Streaming last-touch attribution (streaming/attribution.py): the live
per-user state machine must equal the batch as-of attribution on the
same events — ties, lookback boundary, touchless purchases."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pytest

# slow tier (VERDICT r12 #6): live streaming attribution == batch cross-plan runs -- seconds-per-test by
# nature (micro-batch scheduling waits, not compute). Full suite
# stays the pre-commit gate; `-m "not slow"` is the fast lane.
pytestmark = pytest.mark.slow

from kafka_workers_spark.streaming.attribution import (
    attribution_tasks_batch,
    streaming_attribution,
)


def _ts(s: float) -> datetime:
    return datetime(2024, 1, 1, 0, 0, 0) + timedelta(seconds=s)


_EVENTS = [
    # u1: click then purchase within lookback → 'click'
    (1, 10.0, "click", 100), (1, 20.0, "purchase", 101),
    # u2: touchless purchase → 'organic', NULL touch
    (2, 10.0, "purchase", 200),
    # u3: click AT the purchase instant counts (allow_exact_matches)
    (3, 10.0, "click", 300), (3, 10.0, "purchase", 301),
    # u4: click outside the 30s lookback → touch reported, 'organic';
    #     then a second purchase re-touched within → 'click'
    (4, 0.0, "click", 400), (4, 45.0, "purchase", 401),
    (4, 50.0, "click", 402), (4, 60.0, "purchase", 403),
    # u5: clicks only → no output rows
    (5, 10.0, "click", 500),
]


def _df(spark):
    return spark.createDataFrame(
        [(u, _ts(s), e, i) for (u, s, e, i) in _EVENTS],
        "user_id long, ts timestamp, event_type string, event_id long",
    )


def test_attribution_batch_task_semantics(spark):
    """The batch entry's rows match the correlated-MAX contract case by
    case (same arms the events_attribution oracle pins)."""
    rows = {
        r.event_id: r
        for r in attribution_tasks_batch(_df(spark), lookback_seconds=30).collect()
    }
    assert rows[101].attribution == "click" and rows[101].touch_ts == _ts(10)
    assert rows[200].attribution == "organic" and rows[200].touch_ts is None
    assert rows[301].attribution == "click" and rows[301].touch_ts == _ts(10)
    assert rows[401].attribution == "organic" and rows[401].touch_ts == _ts(0)
    assert rows[403].attribution == "click" and rows[403].touch_ts == _ts(50)
    assert 500 not in rows and len(rows) == 5


def test_streaming_attribution_equals_batch(spark, tmp_path):
    """E2E: the live stream (two micro-batches split mid-history, state
    carrying the last touch across them) emits exactly the batch rows."""
    src = str(tmp_path / "src")
    df = _df(spark)
    df.filter("ts <= timestamp'2024-01-01 00:00:30'").coalesce(1).write.parquet(src)
    df.filter("ts > timestamp'2024-01-01 00:00:30'").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = "user_id long, ts timestamp, event_type string, event_id long"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_attribution(stream, lookback_seconds=30)
    q = (
        out.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM attr_out").collect()))
    want = sorted(
        map(tuple, attribution_tasks_batch(df, lookback_seconds=30).collect())
    )
    assert got == want and len(got) == 5


def test_attribution_rejects_bad_lookback(spark):
    with pytest.raises(ValueError, match="lookback"):
        attribution_tasks_batch(_df(spark), lookback_seconds=0)


def test_attribution_pre_epoch_click_is_a_real_touch(spark):
    """A negative-epoch-micros click is a genuine touch: the old -1
    no-touch sentinel classified every pre-1970 click as organic
    (ADVICE r09; the int64-min sentinel cannot collide with any
    representable timestamp)."""
    pre = datetime(1969, 12, 31, 23, 59, 0)  # -60s epoch
    purchase = datetime(1969, 12, 31, 23, 59, 30)
    df = spark.createDataFrame(
        [(1, pre, "click", 10), (1, purchase, "purchase", 11)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    rows = {r.event_id: r for r in attribution_tasks_batch(df, lookback_seconds=3600).collect()}
    assert rows[11].attribution == "click" and rows[11].touch_ts == pre
