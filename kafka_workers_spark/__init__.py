"""kafka_workers_spark — a PySpark-native streaming/analytics engine.

A from-scratch re-expression of the capabilities of RTBHOUSE/kafka-workers
(a JVM Kafka stream-processing library; see /root/reference) on top of
Apache Spark: Structured Streaming for the dataflow/stream surface, the
DataFrame/SQL API (Catalyst + Tungsten) for the relational surface, plus
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Design stance (SURVEY.md §7): declare logical plans with DataFrame/SQL and
let Catalyst pick physical strategies; Pandas UDFs only where built-ins
cannot express the semantics; no driver-side per-record loops; everything
partitions and scales to a multi-executor cluster even though tests run on
local[N].
"""

from kafka_workers_spark.session import WorkersConfig, build_session

__version__ = "0.1.0"

__all__ = ["WorkersConfig", "build_session", "__version__"]
