"""Streaming deduplication with a batch-replayable contract.

The reference delivers at-least-once and leaves duplicate suppression to
user tasks (README.md:9 "at least once"; duplicates acknowledged at
/root/reference/src/main/java/com/rtbhouse/kafka/workers/impl/consumer/
ConsumerThread.java:184-186). The Spark-first engine offers it as an
operator: ``dropDuplicatesWithinWatermark`` bounds dedup state by event
time, so state size tracks the watermark delay instead of the key space —
the property that makes streaming dedup viable at 100 TB/day.

Streaming keeps the FIRST arrival per key (processing order). A batch
replay of the same data has no arrival order, so the batch path pins the
deterministic equivalent: the row with the minimum (ts, tiebreaker) per
key. For sources where arrival order follows event time (Kafka per
partition), the two agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    delay: str = "1 minute",
    tiebreaker: str | None = None,
) -> DataFrame:
    """One key → one row, bounded-state on streams, deterministic on batch.

    Streaming: ``withWatermark(ts, delay).dropDuplicatesWithinWatermark(keys)``
    — state for a key is dropped once the watermark passes its event time
    plus ``delay``; a duplicate arriving later than that re-emits (the
    documented at-least-once boundary, same as the reference's).

    Batch: earliest row per key by (ts, tiebreaker) via one window shuffle
    on the keys — the deterministic replay of "first arrival".
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    order = [F.col(ts_col).asc()] + ([F.col(tiebreaker).asc()] if tiebreaker else [])
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
