"""Live streaming z² anomaly screen (streaming/drift.py): the per-key
WorkerTask ring state machine must emit exactly the batch-entry rows on
the same events — including a bucket whose events split ACROSS
micro-batches (the carried open bucket supplies the continuation) and
gap zeros spanning a batch boundary. The markov/funnel live==batch
discipline applied to the drift family."""

from __future__ import annotations

import pytest

# slow tier (VERDICT r12 #6): live micro-batch runs — seconds-per-test by
# nature (scheduling waits, not compute).
pytestmark = pytest.mark.slow

from datetime import datetime, timedelta

from kafka_workers_spark.streaming.drift import (
    anomaly_tasks_batch,
    anomaly_worker_task,
    streaming_anomaly_zscore,
)

SCHEMA = "k string, ts timestamp, event_id long"


def _ts(h: float) -> datetime:
    return datetime(2024, 1, 1) + timedelta(hours=h)


def _rows(counts_by_hour: dict[int, int], key: str = "a", base_id: int = 0):
    rows, eid = [], base_id
    for h, n in sorted(counts_by_hour.items()):
        for i in range(n):
            rows.append((key, _ts(h + i / max(n, 1) * 0.5), eid))
            eid += 1
    return rows


def _canon(df):
    return sorted(
        (r.k, r.bucket_start, r.n_events, r.n_window, r.dev_num, r.var_num,
         r.is_anomaly)
        for r in df.collect()
    )


def test_streaming_equals_batch_with_split_bucket_and_gap(spark, tmp_path):
    """Batch file 1 ends MID-bucket (hour 5 has events in both files) and
    file 2 starts after a 3-hour silence — the live run must close hour
    5 with the union count and back-fill hours 6-8 with zeros when hour
    9's first event arrives, exactly as the full-history batch replay
    does."""
    src = str(tmp_path / "src")
    f1 = _rows({0: 3, 1: 3, 2: 3, 3: 3, 4: 3}) + [("a", _ts(5.0), 100)]
    # the hour-10 sentinel closes the hour-9 flood; hour 10 itself stays
    # open and must be absent from BOTH plans
    f2 = (
        [("a", _ts(5.4), 101), ("a", _ts(5.6), 102)]
        + _rows({9: 40}, base_id=200)
        + [("a", _ts(10.2), 999)]
    )
    spark.createDataFrame(f1, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(f2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    live = streaming_anomaly_zscore(
        stream, ["k"], "ts", tiebreak_col="event_id",
        bucket_seconds=3600, window=4, min_n=3,
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        live.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = anomaly_tasks_batch(
        spark.createDataFrame(f1 + f2, SCHEMA), ["k"], "ts",
        tiebreak_col="event_id", bucket_seconds=3600, window=4, min_n=3,
    )
    got = _canon(spark.read.parquet(out_dir))
    want = _canon(batch)
    assert got == want
    by_hour = {r[1].hour: r for r in got}
    # hour 5's count is the cross-batch union (1 from file 1 + 2 from 2)
    assert by_hour[5][2] == 3
    # the batch-boundary gap hours closed as zeros
    assert by_hour[6][2] == 0 and by_hour[8][2] == 0
    # the flood at hour 9 flags against the quiet trailing window
    assert by_hour[9][6] is True
    # the open hour-10 bucket never closed: absent from the live output
    assert max(by_hour) == 9


def test_stream_task_closes_final_bucket_only_on_next_event(spark):
    """The documented divergence: the final bucket never closes. Driving
    the task directly: after events in buckets 0 and 1, only bucket 0
    emitted; a later batch with a bucket-2 event closes bucket 1."""
    import pandas as pd

    task = anomaly_worker_task(["k"], "ts", 3600, window=4, min_n=2)
    pdf1 = pd.DataFrame({"k": ["a"] * 3, "ts": [_ts(0), _ts(0.5), _ts(1)],
                         "event_id": [1, 2, 3]})
    out1, st = task.process(("a",), pdf1, {})
    assert out1["bucket_idx"].tolist() == [pdf1["ts"][0].value // 10**9 // 3600]
    assert out1["n_events"].tolist() == [2]
    pdf2 = pd.DataFrame({"k": ["a"], "ts": [_ts(2)], "event_id": [4]})
    out2, st = task.process(("a",), pdf2, st)
    assert out2["n_events"].tolist() == [1]  # bucket 1 closed by bucket 2
    assert st["cur_n"] == 1  # bucket 2 open in state
    # validation parity with the batch operator
    with pytest.raises(ValueError, match="z_den"):
        anomaly_worker_task(["k"], z_den=0)
    with pytest.raises(ValueError, match="min_n"):
        anomaly_worker_task(["k"], min_n=1)


def test_batch_entry_equals_relational_minus_open_buckets(spark):
    """anomaly_tasks_batch == operators.drift.anomaly_zscore minus each
    key's max bucket (the never-closed one), bit for bit — the
    cross-plan identity the registered oracle encodes, checked here
    directly between the two SPARK plans on multi-key data with gaps."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.drift import anomaly_zscore

    rows = (
        _rows({0: 2, 1: 2, 2: 2, 3: 2, 4: 2, 7: 30, 8: 1}, key="a")
        + _rows({0: 5, 2: 5, 3: 5, 5: 5, 6: 6}, key="b", base_id=1000)
    )
    ev = spark.createDataFrame(rows, SCHEMA)
    via_task = anomaly_tasks_batch(
        ev, ["k"], "ts", tiebreak_col="event_id",
        bucket_seconds=3600, window=4, min_n=3,
    )
    rel = anomaly_zscore(ev, ["k"], "ts", 3600, window=4, min_n=3)
    rel_closed = (
        rel.withColumn(
            "__mx", F.max("bucket_start").over(W.partitionBy("k"))
        )
        .filter(F.col("bucket_start") < F.col("__mx"))
        .drop("__mx")
    )
    assert _canon(via_task) == _canon(rel_closed)
