"""Value-decode surface: the reference's pluggable deserializers, Spark-first.

The reference never inspects payloads — deserialization is delegated to
Kafka deserializer classes configured under the consumer prefix
(/root/reference/src/main/java/com/rtbhouse/kafka/workers/api/
WorkersConfig.java:39 CONSUMER_PREFIX; README.md:83-84
``consumer.kafka.key.deserializer`` / ``value.deserializer``). The Spark
equivalent is schema-on-read: the Kafka source yields ``value binary``, and
the user attaches a decoder expression. This module maps the deserializer
concept onto the native decoders so a config string picks the format.

All decoders are Catalyst expressions (whole-stage codegen; ``from_json``/
``from_csv`` are JVM-side) — decode happens inside the scan stage with no
extra pass and no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: format name → decoder; mirrors the reference's deserializer-class config
FORMATS = ("json", "csv", "string", "binary")


def decode_value(
    df: DataFrame,
    fmt: str,
    schema: str | None = None,
    column: str = "value",
    out: str = "decoded",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Attach a decoded struct/string column for the raw payload column.

    fmt='json'|'csv' parse ``column`` (cast to string) against a DDL
    ``schema`` into a struct named ``out``; malformed rows yield a null
    struct (PERMISSIVE), the schema-on-read analog of the reference's
    guarantee='none' skip path — pair with ``streaming.tasks.split_dlq``
    to route them. fmt='string' is the StringDeserializer analog;
    fmt='binary' the pass-through ByteArrayDeserializer.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unknown value format: {fmt!r}; expected one of {FORMATS}")
    c = F.col(column)
    dec: Column
    if fmt == "json":
        if schema is None:
            raise ValueError("fmt='json' requires a DDL schema")
        dec = F.from_json(c.cast("string"), schema, options or {})
    elif fmt == "csv":
        if schema is None:
            raise ValueError("fmt='csv' requires a DDL schema")
        dec = F.from_csv(c.cast("string"), F.lit(schema), options or {})
    elif fmt == "string":
        dec = c.cast("string")
    else:  # binary
        dec = c
    return df.withColumn(out, dec)
