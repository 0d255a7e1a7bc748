"""Stream-stream interval join with a batch-replayable contract.

The reference merges multiple topics into one ordered stream and leaves
correlation across streams to user tasks (the N-way `MergerTest` pattern;
/root/reference/src/main/java/com/rtbhouse/kafka/workers/impl/util/ —
payloads stay opaque, api/record/WorkerRecord.java). The Spark-first
engine offers the correlation itself as an operator: a watermarked
stream-stream join with an event-time interval predicate — the canonical
"view joined to the purchase that followed within N minutes" shape of
attribution and training-label generation.

Semantics (identical on both paths): left row L matches right row R when
``L.key == R.key`` and ``R.ts ∈ [L.ts + lower_s, L.ts + upper_s]``
(microsecond-exact timestamp interval arithmetic — no floats anywhere).

Streaming is the bounded-state path: watermarks on BOTH sides plus the
interval condition let Spark drop left state once the watermark passes
``L.ts + upper_s`` and right state once it passes ``R.ts - lower_s``
(state tracks the interval width × arrival rate, not the key space — the
property that makes the join viable on an unbounded stream). ``inner``
emits eagerly on match; ``left_outer`` additionally emits null-padded
left rows once their window closes, so late output lags the watermark by
design; ``left_semi`` emits each matched left row once (the "views that
converted" filter — left columns only, no fan-out per match).

Batch is the deterministic replay: the same join expression on static
DataFrames — Catalyst plans the equi-key part as a hash/SMJ join and
evaluates the interval as a post-join filter, so payload columns never
fan out past the key match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOW = {"inner", "left_outer", "left_semi"}


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int = 0,
    upper_s: int = 600,
    how: str = "inner",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Join ``right`` rows landing within ``[lower_s, upper_s]`` seconds
    after each ``left`` row with the same ``key``.

    ``left`` and ``right`` must share ONLY the ``key`` column name (the
    join keeps one copy of it); all other column names must be disjoint —
    asserted up front so the error names the clash instead of failing
    analysis mid-plan. ``left_ts``/``right_ts`` name each side's event
    time. On streaming inputs both sides get ``watermark_delay``
    watermarks (required for state cleanup, and for ``left_outer``
    correctness — unmatched rows emit only once the watermark passes).

    Scale shape: the equi-key part shuffles both sides on ``key`` once
    (stream-stream state is likewise key-partitioned); the interval is a
    residual predicate, so no time-bucket explode and no nested-loop —
    contrast :func:`~kafka_workers_spark.operators.relational.interval_overlap_join`,
    which trades a bucket fan-out for joins with NO equi-key at all.
    """
    if how not in _HOW:
        raise ValueError(f"how={how!r}; expected one of {sorted(_HOW)}")
    if int(lower_s) > int(upper_s):
        raise ValueError(f"lower_s ({lower_s}) must be <= upper_s ({upper_s})")
    clash = (set(left.columns) & set(right.columns)) - {key}
    if clash:
        raise ValueError(
            f"left/right share non-key columns {sorted(clash)}; rename one side"
        )
    if left.isStreaming or right.isStreaming:
        left = left.withWatermark(left_ts, watermark_delay)
        right = right.withWatermark(right_ts, watermark_delay)
    lk, rk = F.col(f"__l.{key}"), F.col(f"__r.{key}")
    lt, rt = F.col(f"__l.{left_ts}"), F.col(f"__r.{right_ts}")
    cond = (
        (lk == rk)
        & (rt >= lt + F.expr(f"INTERVAL {int(lower_s)} SECOND"))
        & (rt <= lt + F.expr(f"INTERVAL {int(upper_s)} SECOND"))
    )
    joined = left.alias("__l").join(right.alias("__r"), cond, how)
    keep = [lk.alias(key)] + [
        F.col(f"__l.{c}") for c in left.columns if c != key
    ]
    if how != "left_semi":  # semi output carries the left side only
        keep += [F.col(f"__r.{c}") for c in right.columns if c != key]
    return joined.select(*keep)
