"""Kafka source/sink builders: the reference's consumer surface on the
Structured Streaming Kafka connector.

Reference config → Spark option mapping (api/WorkersConfig.java,
README.md:105-283):

- ``consumer.topics``                → ``subscribe``
- ``consumer.kafka.*`` passthrough   → ``kafka.*`` passthrough
  (WorkersConfig strips the prefix the same way, WorkersConfig.java:39)
- ``queue.total.size.heap.ratio`` (A8 backpressure) →
  ``maxOffsetsPerTrigger`` / ``maxBytesPerTrigger``: Spark bounds the
  micro-batch instead of pausing partitions behind in-heap queues — there
  is no unbounded queue to protect.
- ``consumer.commit.interval.ms`` (A7) → trigger interval; offsets commit
  to the checkpoint per completed batch (exact at-least-once, stronger
  ordering guarantee than the reference's async commit, SURVEY.md §3.2).
- key/value deserializers → none: the source yields ``key``/``value`` as
  BINARY (the reference's opaque-bytes model, SURVEY.md §1.2); decode with
  ``from_json`` / ``from_avro`` / ``decode`` downstream.

The Kafka connector jar is not bundled in this container, so
:func:`kafka_stream` builds the fully-configured reader without loading
it; tests cover the option mapping (tests/test_lifecycle.py:
test_kafka_options_mapping and siblings) and the
identical downstream surface is exercised through the file source
(sources/files.stream_table), which yields the same schema contract.
tests/test_kafka_contract.py holds the SELF-ACTIVATING end-to-end
contract (produce/consume round-trip + checkpointed commit-prefix
resume): it skips here with explicit reasons and runs unmodified in any
environment with the connector jar + a broker in KWS_KAFKA_BOOTSTRAP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.readwriter import DataStreamReader

from kafka_workers_spark.session import WorkersConfig

KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


#: Kafka SOURCE-level option names: a kafka_conf key matching one of these
#: is passed through un-prefixed (everything else is a consumer property
#: and gets the kafka. prefix, mirroring the reference's consumer.kafka.*)
_SOURCE_OPTIONS = frozenset(
    {
        "startingoffsets", "endingoffsets", "startingoffsetsbytimestamp",
        "startingtimestamp", "failondataloss", "maxoffsetspertrigger",
        "minoffsetspertrigger", "maxtriggerdelay", "maxbytespertrigger",
        "minpartitions", "includeheaders",
    }
)


def kafka_options(config: WorkersConfig, kafka_conf: dict[str, str] | None = None) -> dict[str, str]:
    """The reference→Spark option mapping as a plain dict (unit-testable
    without the connector jar).

    ``kafka_conf`` keys naming Kafka SOURCE options (startingOffsets,
    minPartitions, ...) override the defaults un-prefixed; all other keys
    are consumer properties and get the ``kafka.`` prefix (the reference's
    ``consumer.kafka.*`` passthrough)."""
    if not config.topics:
        raise ValueError("consumer.topics is required (WorkersConfig.topics)")
    opts: dict[str, str] = {
        "subscribe": ",".join(config.topics),
        "startingOffsets": "earliest",
        # A10 at_least_once: fail on data loss so redelivery is surfaced,
        # guarantee 'none' tolerates missing offsets (skip-and-continue)
        "failOnDataLoss": "true" if config.guarantee == "at_least_once" else "false",
    }
    if config.max_bytes_per_trigger is not None and (
        config.max_offsets_per_trigger is not None or config.min_offsets_per_trigger is not None
    ):
        # the connector's getDefaultReadLimit rejects either offsets bound
        # combined with the byte bound ("Max offset and max bytes per
        # trigger can't be set at the same time" / the min-offsets twin) —
        # fail here with the config vocabulary instead of at stream start
        # with the connector's
        raise ValueError(
            "set max/min_offsets_per_trigger OR max_bytes_per_trigger, not both: "
            "the Kafka source rejects the combination"
        )
    if config.max_trigger_delay is not None and config.min_offsets_per_trigger is None:
        # same inertness trap the byte-bound NOTE below documents: the
        # connector silently ignores maxTriggerDelay without the floor
        raise ValueError("max_trigger_delay requires min_offsets_per_trigger")
    if config.max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(config.max_offsets_per_trigger)
    if config.min_offsets_per_trigger is not None:
        # batch-sizing floor (+ bounded wait): the queue-fill analog —
        # min and max offsets together form a composite read limit
        opts["minOffsetsPerTrigger"] = str(config.min_offsets_per_trigger)
        opts["maxTriggerDelay"] = config.max_trigger_delay or "15m"
    if config.max_bytes_per_trigger is not None:
        # NOTE: no maxTriggerDelay here — the connector only honors it
        # alongside minOffsetsPerTrigger; setting it with only a byte
        # bound would be inert and misleading
        opts["maxBytesPerTrigger"] = str(config.max_bytes_per_trigger)
    for k, v in (kafka_conf or {}).items():
        key = k.removeprefix("consumer.kafka.")
        if key.lower() in _SOURCE_OPTIONS:
            opts[key] = v
        else:
            opts[f"kafka.{key}" if not key.startswith("kafka.") else key] = v
    return opts


def kafka_reader(
    spark: SparkSession,
    config: WorkersConfig,
    bootstrap_servers: str,
    kafka_conf: dict[str, str] | None = None,
) -> DataStreamReader:
    """Configured ``readStream`` builder (call ``.load()`` where the Kafka
    connector jar is on the classpath)."""
    reader = spark.readStream.format("kafka").option(
        "kafka.bootstrap.servers", bootstrap_servers
    )
    for k, v in kafka_options(config, kafka_conf).items():
        reader = reader.option(k, v)
    return reader


def kafka_stream(
    spark: SparkSession,
    config: WorkersConfig,
    bootstrap_servers: str,
    kafka_conf: dict[str, str] | None = None,
) -> DataFrame:
    return kafka_reader(spark, config, bootstrap_servers, kafka_conf).load()


def kafka_sink_options(topic: str) -> dict[str, str]:
    """Kafka-to-Kafka produce (the MergerTest pattern: task produces to an
    output topic, MergerTest.java:165-182). Use with
    ``df.writeStream.format('kafka')`` — requires ``key``/``value`` binary
    or string columns; ``topic`` may also be a per-row column."""
    return {"topic": topic}
