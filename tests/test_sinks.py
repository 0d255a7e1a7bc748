"""Sink layer: foreachBatch exactly-once parquet sink — replaying a batch
must not duplicate output (the idempotent-path upgrade over the
reference's at-least-once ceiling, SURVEY.md §2 Table B)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_workers_spark.streaming.sinks import exactly_once_parquet_sink


def test_exactly_once_parquet_sink(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v")).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = exactly_once_parquet_sink(stream, out, ckpt)
    q.awaitTermination(120)

    result = spark.read.parquet(out)
    assert result.count() == 100
    assert result.select(F.sum("v")).first()[0] == sum(2 * i for i in range(100))

    # restart with the same checkpoint: no new data -> no duplication
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = exactly_once_parquet_sink(stream2, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 100
