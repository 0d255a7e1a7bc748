"""Sources: batch/stream readers.

The reference's only source is Kafka (ConsumerThread,
/root/reference/src/main/java/com/rtbhouse/kafka/workers/impl/consumer/ConsumerThread.java:84-137).
Here: a Kafka stream builder with sub-partitioning (sources.kafka), plus
file-based batch/stream sources (sources.files) used by tests and the
correctness harness (no Kafka broker is available in this container — the
file stream source exercises the identical DataFrame surface).
"""

from kafka_workers_spark.sources.files import load_table, load_tables, stream_table

__all__ = ["load_table", "load_tables", "stream_table"]
