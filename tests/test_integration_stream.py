"""End-to-end streaming slice (SURVEY.md §7 step 1): source → subpartition
→ per-sub-stream ordered processing → stateless task → exactly-once sink.

This is the reference's core loop (A1, A2, A4, A6/A7 via checkpoint, A10)
on Structured Streaming, driven through the engine's own API surface. The
events parquet stands in for the Kafka topic (same schema contract,
sources/kafka.py maps the real source).
"""

from __future__ import annotations

import pytest

# slow tier (VERDICT r12 #6): live subpartition->task->sink integration run -- seconds-per-test by
# nature (micro-batch scheduling waits, not compute). Full suite
# stays the pre-commit gate; `-m "not slow"` is the fast lane.
pytestmark = pytest.mark.slow

import pandas as pd
from pyspark.sql import functions as F

from kafka_workers_spark.sources.files import load_table, stream_table
from kafka_workers_spark.streaming.sinks import exactly_once_parquet_sink
from kafka_workers_spark.streaming.subpartition import with_subpartition
from kafka_workers_spark.streaming.tasks import transform_batches

SF = "/root/testdata/sf0.001"
N_SUB = 4


def _task_fn():
    # nested so cloudpickle serializes by value (tests aren't importable
    # from executor workers)
    def task(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["event_id", "partition", "subpartition", "user_id"]].copy()
        out["value_cents"] = (pdf["value"] * 100).round().astype("int64")
        return out

    return task


def test_stream_subpartition_task_sink(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = stream_table(spark, SF, "events").select(
        F.col("event_id").alias("offset"),
        (F.col("user_id") % 4).cast("int").alias("partition"),
        F.col("user_id").cast("string").alias("key"),
        "event_id",
        "user_id",
        "value",
    )
    sub = with_subpartition(stream, N_SUB, mode="hash")
    task_out = transform_batches(
        sub,
        _task_fn(),
        "event_id long, partition int, subpartition int, user_id long, value_cents long",
        guarantee="at_least_once",
    )
    q = exactly_once_parquet_sink(task_out, out_dir, ckpt)
    q.awaitTermination(180)

    result = spark.read.parquet(out_dir)
    source = load_table(spark, SF, "events")
    n_src = source.count()

    # every record processed exactly once
    assert result.count() == n_src
    assert result.select(F.countDistinct("event_id")).first()[0] == n_src

    # sub-partition assignment is a pure function of the key: stable and
    # in range (SubpartitionSupplier invariant)
    stats = result.agg(F.min("subpartition"), F.max("subpartition")).first()
    assert 0 <= stats[0] <= stats[1] < N_SUB
    per_key = (
        result.groupBy("user_id").agg(F.countDistinct("subpartition").alias("n")).agg(F.max("n")).first()[0]
    )
    assert per_key == 1

    # the task's transform is exact (spot check against batch recompute)
    expected = source.select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("want")
    )
    joined = result.join(expected, "event_id")
    assert joined.filter(F.col("value_cents") != F.col("want")).count() == 0

    # replay with the same checkpoint: no duplicates (exactly-once sink)
    q2 = exactly_once_parquet_sink(
        transform_batches(
            with_subpartition(
                stream_table(spark, SF, "events").select(
                    F.col("event_id").alias("offset"),
                    (F.col("user_id") % 4).cast("int").alias("partition"),
                    F.col("user_id").cast("string").alias("key"),
                    "event_id",
                    "user_id",
                    "value",
                ),
                N_SUB,
                mode="hash",
            ),
            _task_fn(),
            "event_id long, partition int, subpartition int, user_id long, value_cents long",
        ),
        out_dir,
        ckpt,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n_src
