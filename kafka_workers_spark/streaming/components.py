"""Live dedup-group maintenance: fold each micro-batch of candidate
pairs into the STORED components artifact (operators/components.py —
components_write layout), so the dedup groups a 100 TB pipeline's
consumers read (survivor selection, split leakage guards, group-capped
sampling) stay current as pairs stream in, without ever re-deriving the
historical pair set.

This is the round-13 components store taken to its production
conclusion: pair generation runs incrementally (the stored band-index
ingest of ``pipeline.near_dedup_incremental`` / the RHP index of
``near_dedup_embeddings_incremental`` emit exactly such per-batch pair
deltas), and each batch folds into the labeling via
:func:`~kafka_workers_spark.operators.components.components_merge` —
star contraction makes the merge O(|nodes| + |batch pairs|) edges
converging in ~2-3 rounds, never a closure over history.

Discipline inherited from streaming/maintenance.py (the stored-offsets
contract, reference impl/offsets/DefaultOffsetsState.java): the batch
marker (batch id + checkpoint lineage) commits ATOMICALLY with the data
via the swap_output rename dance, a replayed batch id is a no-op, a
foreign lineage fails loudly, and a torn swap heals before any read.
One divergence worth naming: unlike merge_scd2, the components merge is
REPLAY-IDEMPOTENT by construction (edge union is commutative and
idempotent, labels are a pure function of the accumulated edge set), so
the marker here is belt-and-suspenders — it skips redundant work and
keeps the lineage contract identical across all maintenance folds, but
a double-applied batch could never corrupt the labeling.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from kafka_workers_spark.operators.components import (
    components_merge,
    components_read,
    components_write,
    connected_components,
)
from kafka_workers_spark.pipeline import swap_output
from kafka_workers_spark.streaming.maintenance import (
    _heal_torn_swap,
    _last_applied,
    _MARKER,
)


def components_fold(
    spark: SparkSession,
    store_dir: str,
    src: str = "doc_a",
    dst: str = "doc_b",
    lineage: str | None = None,
    max_rounds: int = 50,
    loop_shuffle_partitions: int | str | None = "auto",
) -> Callable[[DataFrame, int], None]:
    """The per-batch fold, exposed so tests and backfills can drive it
    directly (the scd2_fold shape): first batch closes over its own
    pairs, every later batch star-merges into the stored labeling and
    republishes the full (node, comp) mapping with one atomic swap.

    The published store is the components_write layout (``mapping`` +
    version-checked ``meta``) plus the maintenance ``_kw_batch`` marker
    and a top-level ``_SUCCESS`` — readable by ``components_read`` like
    any other components artifact, and by :func:`read_components_store`
    which also heals torn swaps first.

    Shape at scale: the mapping is two longs per ever-paired node —
    publishing it whole per batch is O(paired nodes), the same cost
    class as the labeling itself; when the node set grows into the
    billions, the bucketed-store pattern (streaming/maintenance.py)
    applies verbatim since the mapping is key-hashed like any table."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _heal_torn_swap(store_dir)
        if batch_id <= _last_applied(store_dir, lineage):
            return  # replay of an already-published batch
        if batch_df.isEmpty():
            return
        pairs = batch_df.select(src, dst)
        if os.path.exists(os.path.join(store_dir, "_SUCCESS")):
            stored = components_read(spark, store_dir)
            merged = components_merge(
                stored,
                pairs,
                src=src,
                dst=dst,
                max_rounds=max_rounds,
                loop_shuffle_partitions=loop_shuffle_partitions,
            )
        else:
            merged = connected_components(
                pairs,
                src=src,
                dst=dst,
                max_rounds=max_rounds,
                loop_shuffle_partitions=loop_shuffle_partitions,
            )
        tmp = f"{store_dir}.tmp-{batch_id}"
        components_write(merged, tmp, mode="overwrite", fingerprint=lineage or "")
        # swap_output's half-written-job refusal keys on a top-level
        # _SUCCESS; components_write's two inner parquet jobs each left
        # their own, so stamp the store-level one only after both exist
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass
        with open(os.path.join(tmp, _MARKER), "w") as fh:
            json.dump({"batch_id": batch_id, "lineage": lineage}, fh)
        swap_output(tmp, store_dir)

    return fold


def read_components_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Read the live (node, comp) mapping of a streaming components
    store — heals a torn swap first (the read_bucketed_store rule: the
    heal must run before anything trusts the directory), then defers to
    ``components_read``'s version check."""
    _heal_torn_swap(store_dir)
    return components_read(spark, store_dir)


def streaming_components_maintenance(
    pairs: DataFrame,
    store_dir: str,
    checkpoint: str,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
) -> StreamingQuery:
    """Run the components store live: every micro-batch of candidate
    pairs folds into ``store_dir``; restarting from the same checkpoint
    resumes exactly where it stopped; a DIFFERENT checkpoint pointed at
    the same store fails loudly at the first batch (the lineage
    contract all maintenance folds share)."""
    fold = components_fold(
        pairs.sparkSession,
        store_dir,
        src=src,
        dst=dst,
        lineage=os.path.abspath(checkpoint),
        max_rounds=max_rounds,
    )
    return (
        pairs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
