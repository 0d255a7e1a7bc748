"""Streaming layer: the reference's worker model re-expressed on Structured
Streaming.

Reference surface → module map (SURVEY.md §2 Table A):

- ``WorkerPartitioner`` (A2)            → :mod:`.subpartition`
- ``WorkerTask.process`` + guarantees (A4, A10) → :mod:`.tasks`
- per-key state + punctuate (A5, A11)   → :mod:`.stateful`
- time-aware ordered merge (A16)        → :mod:`.merge`
- offset-range commit semantics (A6)    → :mod:`.offsets` (semantic model
  + test oracle; at runtime Spark's checkpoint commit log owns this)
- lifecycle + deadline + metrics (A14, A9, A15) → :mod:`.lifecycle`
"""

from kafka_workers_spark.streaming.merge import merge_ordered
from kafka_workers_spark.streaming.offsets import ClosedRange, OffsetsState, SortedRanges
from kafka_workers_spark.streaming.subpartition import murmur2, with_subpartition

__all__ = [
    "ClosedRange",
    "OffsetsState",
    "SortedRanges",
    "merge_ordered",
    "murmur2",
    "with_subpartition",
]
