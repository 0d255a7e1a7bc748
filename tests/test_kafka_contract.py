"""Kafka end-to-end contract test — self-activating (VERDICT r03 item 6).

The reference's integration layer runs against an embedded broker
(/root/reference/src/test/java/com/rtbhouse/kafka/workers/integration/
utils/KafkaServerRule.java, RequiresKafkaServer.java). This container
ships neither the Spark Kafka connector jar nor a broker, so these tests
SKIP here with explicit reasons — but they are real produce/consume +
commit-semantics tests that activate unmodified in any environment that
provides both:

- connector jar on the session classpath (e.g.
  ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``)
- a reachable broker named by ``KWS_KAFKA_BOOTSTRAP`` (host:port)

What they then pin: the builder's option mapping drives a real source
(A1), produced records round-trip with the opaque-bytes schema contract
(SURVEY.md §1.2), and a checkpointed streaming read resumes from the
committed offset prefix — re-running after more produces yields only the
new records (A6/A7 semantics on a live broker).
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

from kafka_workers_spark.session import WorkersConfig
from kafka_workers_spark.sources.kafka import KAFKA_SOURCE_SCHEMA, kafka_reader

BOOTSTRAP_ENV = "KWS_KAFKA_BOOTSTRAP"


def _connector_loaded(spark) -> bool:
    """True iff the kafka data source resolves (jar on the classpath).
    load() only builds the plan — no broker contact happens here."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:1"
        ).option("subscribe", "probe").load()
        return True
    except Exception as exc:  # noqa: BLE001
        if "Failed to find data source" in str(exc):
            return False
        return True  # jar present; some other (config-level) complaint


def _broker_reachable() -> str | None:
    addr = os.environ.get(BOOTSTRAP_ENV)
    if not addr:
        return None
    host, _, port = addr.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=5):
            return addr
    except OSError:
        return None


@pytest.fixture(scope="module")
def kafka_env(spark):
    if not _connector_loaded(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")
    addr = _broker_reachable()
    if addr is None:
        pytest.skip(f"no reachable broker ({BOOTSTRAP_ENV} unset or connect failed)")
    return addr


def test_produce_consume_roundtrip_schema_contract(spark, kafka_env):
    """Batch produce → batch consume: payload bytes round-trip and the
    source exposes exactly the reference's record model (opaque key/value
    bytes + topic/partition/offset/timestamp metadata)."""
    topic = f"kws_contract_{uuid.uuid4().hex[:8]}"
    rows = [(str(i), f"payload-{i}") for i in range(20)]
    (
        spark.createDataFrame(rows, "key string, value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", kafka_env)
        .option("topic", topic)
        .save()
    )
    got = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", kafka_env)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    expected_cols = [f.split()[0] for f in KAFKA_SOURCE_SCHEMA.split(", ")]
    assert [c for c in expected_cols if c not in got.columns] == []
    vals = sorted(r.value.decode() for r in got.select("value").collect())
    assert vals == sorted(v for _, v in rows)


def test_streaming_commit_prefix_resumes_after_restart(spark, kafka_env, tmp_path):
    """A checkpointed streaming read consumes everything once; after more
    records are produced, restarting from the same checkpoint emits ONLY
    the new records — the committed-offset-prefix contract (A6/A7) on a
    real broker."""
    topic = f"kws_commit_{uuid.uuid4().hex[:8]}"
    ckpt = str(tmp_path / "ckpt")

    def produce(lo: int, hi: int) -> None:
        (
            spark.createDataFrame(
                [(str(i), f"v-{i}") for i in range(lo, hi)], "key string, value string"
            )
            .write.format("kafka")
            .option("kafka.bootstrap.servers", kafka_env)
            .option("topic", topic)
            .save()
        )

    def drain(query_name: str) -> list[str]:
        cfg = WorkersConfig(topics=[topic])
        stream = kafka_reader(spark, cfg, kafka_env).load()
        q = (
            stream.selectExpr("CAST(value AS STRING) AS v")
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.v for r in spark.sql(f"SELECT v FROM {query_name}").collect())

    produce(0, 10)
    assert drain("kws_drain1") == sorted(f"v-{i}" for i in range(10))
    produce(10, 15)
    # fresh query, same checkpoint: only the uncommitted suffix comes out
    assert drain("kws_drain2") == sorted(f"v-{i}" for i in range(10, 15))
