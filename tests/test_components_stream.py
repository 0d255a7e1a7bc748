"""Live components-store maintenance (streaming/components.py): pair
batches fold into the stored (node, comp) labeling through
components_merge, with a checkpoint restart in the middle — the final
store must equal the one-shot closure over every pair ever landed, a
replayed batch must be a no-op, a foreign lineage must fail loudly, and
a torn swap must heal. The scd2/upsert maintenance contract, applied to
the round-13 components artifact."""

from __future__ import annotations

import pytest

# slow tier (VERDICT r12 #6): live foreachBatch runs with restart/replay —
# seconds-per-test by nature (micro-batch scheduling waits, not compute).
pytestmark = pytest.mark.slow

from kafka_workers_spark.operators.components import connected_components
from kafka_workers_spark.streaming.components import (
    components_fold,
    read_components_store,
    streaming_components_maintenance,
)

PAIR_SCHEMA = "doc_a long, doc_b long"

# three batches whose union exercises the merge shapes: extension of an
# existing component, a bridge that merges two stored components, and
# brand-new nodes
B1 = [(1, 2), (10, 11), (30, 31)]
B2 = [(2, 3), (50, 51)]          # extends {1,2}; new component {50,51}
B3 = [(3, 10), (60, 61)]         # bridges {1,2,3}-{10,11}; new {60,61}


def _canon(df):
    return sorted((r.node, r.comp) for r in df.collect())


def test_streaming_components_with_restart_equals_one_shot(spark, tmp_path):
    """Batches 1-2 land in run 1; the query stops; batch 3 lands in run 2
    restarted from the SAME checkpoint. The stored labeling then equals
    the one-shot connected_components over all pairs exactly."""
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    spark.createDataFrame(B1, PAIR_SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(B2, PAIR_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(PAIR_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_components_maintenance(stream, store, ckpt)
        q.awaitTermination(120)

    run()  # run 1: folds batches 0 and 1
    mid = _canon(read_components_store(spark, store))
    want_mid = _canon(
        connected_components(
            spark.createDataFrame(B1 + B2, PAIR_SCHEMA), src="doc_a", dst="doc_b"
        )
    )
    assert mid == want_mid

    spark.createDataFrame(B3, PAIR_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    run()  # run 2: checkpoint restart — only the new file is processed

    want = _canon(
        connected_components(
            spark.createDataFrame(B1 + B2 + B3, PAIR_SCHEMA), src="doc_a", dst="doc_b"
        )
    )
    assert _canon(read_components_store(spark, store)) == want
    # the bridge really merged: 1,2,3,10,11 share one component minimum
    got = dict(_canon(read_components_store(spark, store)))
    assert {got[n] for n in (1, 2, 3, 10, 11)} == {1}


def test_components_fold_replay_and_lineage(spark, tmp_path):
    """A replayed batch id is a no-op (store untouched); a fold under a
    DIFFERENT lineage raises instead of silently skipping; and although
    the merge is replay-idempotent by construction, a replay must not
    even republish (mtime unchanged — the marker skips the work)."""
    import os

    store = str(tmp_path / "store")
    fold = components_fold(spark, store, lineage="ckpt-A")
    fold(spark.createDataFrame(B1, PAIR_SCHEMA), 0)
    fold(spark.createDataFrame(B2, PAIR_SCHEMA), 1)
    after = _canon(read_components_store(spark, store))
    mtime = os.path.getmtime(os.path.join(store, "_kw_batch"))
    fold(spark.createDataFrame(B1, PAIR_SCHEMA), 0)  # replay: skipped
    assert _canon(read_components_store(spark, store)) == after
    assert os.path.getmtime(os.path.join(store, "_kw_batch")) == mtime
    with pytest.raises(RuntimeError, match="lineage"):
        components_fold(spark, store, lineage="ckpt-B")(
            spark.createDataFrame(B3, PAIR_SCHEMA), 0
        )
    # empty batch: no-op, no publish
    fold(spark.createDataFrame([], PAIR_SCHEMA), 2)
    assert _canon(read_components_store(spark, store)) == after


def test_components_fold_heals_torn_swap(spark, tmp_path):
    """Kill window between swap_output's park and publish renames:
    backup present, final missing. Both the next fold and the reader
    must restore the parked store first — a fold that read an absent
    base would close over ONLY the new batch and silently drop every
    historical component."""
    import os

    store = str(tmp_path / "store")
    fold = components_fold(spark, store, lineage="L")
    fold(spark.createDataFrame(B1, PAIR_SCHEMA), 0)
    after = _canon(read_components_store(spark, store))
    os.rename(store, store + ".pre-swap")  # simulate the torn window
    assert _canon(read_components_store(spark, store)) == after  # reader heals
    os.rename(store, store + ".pre-swap")
    fold(spark.createDataFrame(B2, PAIR_SCHEMA), 1)  # fold heals, then merges
    want = _canon(
        connected_components(
            spark.createDataFrame(B1 + B2, PAIR_SCHEMA), src="doc_a", dst="doc_b"
        )
    )
    assert _canon(read_components_store(spark, store)) == want


def test_incremental_pair_deltas_close_to_one_shot_groups(spark, tmp_path):
    """The full production loop, end to end: documents land in three
    batches; each batch emits its near-dup PAIR DELTA against the
    accumulated band index (pipeline.dedup_pairs_incremental) and folds
    into the components store (components_fold). The final labeling
    must equal the ONE-SHOT connected_components over the full corpus's
    band-collision pairs — the identity that makes incremental dedup
    groups exact: every colliding pair (i, j) is emitted exactly once,
    in the later member's batch. Uses the real sf0.001 documents so the
    collision structure is the corpus's own, not synthetic."""
    import os

    from pyspark.sql import functions as F

    from kafka_workers_spark.pipeline import build_dedup_index, dedup_pairs_incremental
    from kafka_workers_spark.sources.files import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    store = str(tmp_path / "cc_store")
    fold = components_fold(spark, store, lineage="inc")

    index = None
    for bid, pred in enumerate(
        ["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]
    ):
        batch = docs.filter(pred)
        if index is None:
            empty = build_dedup_index(batch.limit(0))
            index = empty
        pairs, new_rows = dedup_pairs_incremental(batch, index)
        fold(pairs, bid)
        # accumulate the index the way a real ingest would (append);
        # materialize to break the growing lineage across batches
        index_path = os.path.join(str(tmp_path), "band_index")
        new_rows.write.mode("append").parquet(index_path)
        index = spark.read.parquet(index_path)

    got = sorted(
        (r.node, r.comp) for r in read_components_store(spark, store).collect()
    )
    full_bands = build_dedup_index(docs)
    a, b = full_bands.alias("a"), full_bands.alias("b")
    one_shot_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    want = sorted(
        (r.node, r.comp)
        for r in connected_components(
            one_shot_pairs, src="doc_a", dst="doc_b"
        ).collect()
    )
    assert got == want and len(got) > 0
