"""Streaming next-event transitions (streaming/markov.py): the live
per-user last-event state machine must emit exactly the batch-window
transitions on the same events — including a chain split ACROSS
micro-batches, where the carried state supplies the predecessor."""

from __future__ import annotations

import pytest

# slow tier (VERDICT r12 #6): live streaming markov == batch cross-plan runs -- seconds-per-test by
# nature (micro-batch scheduling waits, not compute). Full suite
# stays the pre-commit gate; `-m "not slow"` is the fast lane.
pytestmark = pytest.mark.slow

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from kafka_workers_spark.streaming.markov import (
    markov_tasks_batch,
    streaming_markov_transitions,
)


def _ts(s: float) -> datetime:
    return datetime(2024, 1, 1, 0, 0, 0) + timedelta(seconds=s)


_EVENTS = [
    # u1: a->b->a->c chain, split mid-way by the micro-batch boundary
    (1, 10.0, "a", 100), (1, 20.0, "b", 101),
    (1, 40.0, "a", 102), (1, 50.0, "c", 103),
    # u2: single event -> no transitions ever
    (2, 15.0, "a", 200),
    # u3: same-ts pair disambiguated by event_id (the tiebreak rule)
    (3, 10.0, "b", 300), (3, 10.0, "a", 301),
    # u4: whole chain inside the SECOND batch
    (4, 40.0, "c", 400), (4, 45.0, "c", 401),
]

SCHEMA = "user_id long, ts timestamp, event_type string, event_id long"


def _df(spark):
    return spark.createDataFrame(
        [(u, _ts(s), e, i) for (u, s, e, i) in _EVENTS], SCHEMA
    )


def _canon(rows):
    return sorted((r.user_id, r.event_id, r.prev_state, r.next_state) for r in rows)


def test_markov_batch_task_semantics(spark):
    """The batch entry's transitions match the lag-window contract case
    by case: first events emit nothing, the event_id tiebreak orders
    equal timestamps, chains are per-user."""
    got = _canon(markov_tasks_batch(_df(spark)).collect())
    assert got == [
        (1, 101, "a", "b"),
        (1, 102, "b", "a"),
        (1, 103, "a", "c"),
        (3, 301, "b", "a"),
        (4, 401, "c", "c"),
    ]


def test_streaming_markov_equals_batch_across_restart_boundary(spark, tmp_path):
    """E2E: two micro-batches split mid-chain — u1's (b -> a) transition
    spans the boundary, so it only exists if the carried state supplies
    the predecessor. The live output must equal the batch entry exactly,
    and aggregating it reproduces the relational matrix."""
    from kafka_workers_spark.operators.relational import markov_transitions

    src = str(tmp_path / "src")
    df = _df(spark)
    df.filter("ts <= timestamp'2024-01-01 00:00:30'").coalesce(1).write.parquet(src)
    df.filter("ts > timestamp'2024-01-01 00:00:30'").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_markov_transitions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("markov_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = spark.sql("select * from markov_out")
    assert _canon(live.collect()) == _canon(markov_tasks_batch(df).collect())
    # the boundary-spanning transition is present — the carried state worked
    assert (1, 102, "b", "a") in _canon(live.collect())
    # aggregate of the live stream == the relational window operator
    live_matrix = sorted(
        map(
            tuple,
            live.groupBy("prev_state", "next_state")
            .agg(F.count("*").cast("long").alias("n"))
            .collect(),
        )
    )
    want_matrix = sorted(
        map(
            tuple,
            markov_transitions(df, ["user_id"], ["ts", "event_id"], "event_type")
            .select("prev_state", "next_state", "n")
            .collect(),
        )
    )
    assert live_matrix == want_matrix


def test_markov_batch_entry_accepts_epoch_long_ts(spark):
    """Review r12: the output schema derives ts's type from the input —
    an epoch-millis `ts long` feed (the common Kafka shape) must work,
    since nothing in the task needs timestamp semantics, only order."""
    rows = [(1, 10_000, "a", 1), (1, 20_000, "b", 2), (1, 30_000, "a", 3)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, event_id long"
    )
    got = _canon(markov_tasks_batch(ev).collect())
    assert got == [(1, 2, "a", "b"), (1, 3, "b", "a")]
