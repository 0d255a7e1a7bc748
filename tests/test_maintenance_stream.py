"""Live SCD2/SCD1 warehouse maintenance (streaming/maintenance.py):
foreachBatch folds each micro-batch into a stored table through
merge_scd2 / merge_upsert, with a checkpoint restart in the middle —
the final store must equal the one-shot build over the full stream,
and a replayed batch must never double-apply (VERDICT r09 #3; the
stored-offsets contract, reference impl/offsets/DefaultOffsetsState.java)."""

from __future__ import annotations

import pytest

# slow tier (VERDICT r12 #6): live foreachBatch maintenance folds with
# restart/replay -- seconds-per-test by nature (micro-batch scheduling
# waits, not compute). Full suite stays the pre-commit gate;
# `-m "not slow"` is the fast lane.
pytestmark = pytest.mark.slow

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from kafka_workers_spark.streaming.maintenance import (
    scd2_fold,
    streaming_scd2_maintenance,
    streaming_upsert_maintenance,
    upsert_fold,
)

OBS_SCHEMA = "user_id long, ts timestamp, event_type string, event_id long"


def _ts(s: float) -> datetime:
    return datetime(2024, 1, 1) + timedelta(seconds=s)


def _obs_batches():
    """Three time-ordered observation batches with collapses, extensions
    across batch boundaries, and new keys appearing late."""
    b1 = [(1, _ts(0), "a", 1), (1, _ts(10), "a", 2),  # collapse within batch
          (2, _ts(5), "x", 3)]
    b2 = [(1, _ts(20), "b", 4),                        # change across batches
          (2, _ts(25), "x", 5),                        # extends open version
          (3, _ts(22), "p", 6)]                        # new key mid-stream
    b3 = [(1, _ts(30), "b", 7),                        # extends again
          (2, _ts(35), "y", 8), (3, _ts(40), "q", 9)]
    return b1, b2, b3


def _canon(df):
    return sorted(
        (r.user_id, r.event_type, r.valid_from, r.valid_to) for r in df.collect()
    )


def test_streaming_scd2_maintenance_with_restart_equals_one_shot(spark, tmp_path):
    """Batches 1-2 land in run 1; the query stops; batch 3 lands in run 2
    restarted from the SAME checkpoint (processing only the new file).
    The stored history then equals the one-shot scd2_history over all
    observations exactly."""
    from kafka_workers_spark.pipeline import scd2_history

    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    b1, b2, b3 = _obs_batches()
    spark.createDataFrame(b1, OBS_SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, OBS_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(OBS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_scd2_maintenance(
            stream, store, ckpt, ["user_id"], "ts", ["event_type"], "event_id"
        )
        q.awaitTermination(120)

    run()  # run 1: folds batches 0 and 1, then availableNow stops it
    mid = spark.read.parquet(store)
    assert mid.filter(F.col("valid_to").isNull()).count() == 3  # u1,u2,u3 open

    spark.createDataFrame(b3, OBS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    run()  # run 2: checkpoint restart — only the new file is processed

    full = spark.createDataFrame(b1 + b2 + b3, OBS_SCHEMA)
    want = scd2_history(full, ["user_id"], "ts", ["event_type"], "event_id")
    assert _canon(spark.read.parquet(store)) == _canon(want)


def test_scd2_fold_replayed_batch_is_a_noop(spark, tmp_path):
    """merge_scd2 is NOT replay-idempotent (old observations would
    re-detect historical changes) — the batch-id marker makes the fold
    exactly-once: replaying an applied batch id leaves the store
    byte-identical, while a genuinely NEW batch id with the same data
    (the misuse the marker cannot see) would duplicate."""
    store = str(tmp_path / "store")
    b1, b2, _ = _obs_batches()
    fold = scd2_fold(spark, store, ["user_id"], "ts", ["event_type"], "event_id")
    fold(spark.createDataFrame(b1, OBS_SCHEMA), 0)
    fold(spark.createDataFrame(b2, OBS_SCHEMA), 1)
    after = _canon(spark.read.parquet(store))
    fold(spark.createDataFrame(b2, OBS_SCHEMA), 1)  # replay: skipped
    fold(spark.createDataFrame(b1, OBS_SCHEMA), 0)  # older replay: skipped
    assert _canon(spark.read.parquet(store)) == after


def test_fold_from_different_lineage_fails_loudly(spark, tmp_path):
    """ADVICE r10: batch ids are monotonic only within one checkpoint
    lineage. A fresh checkpoint (or a direct fold) pointed at a store
    built under another lineage would restart ids at 0 and the replay
    guard would silently skip real batches — the fold must instead
    raise at the FIRST batch, naming both lineages."""
    import pytest

    store = str(tmp_path / "store")
    b1, b2, _ = _obs_batches()
    args = (["user_id"], "ts", ["event_type"], "event_id")
    fold_a = scd2_fold(spark, store, *args, lineage="ckpt-A")
    fold_a(spark.createDataFrame(b1, OBS_SCHEMA), 0)
    before = _canon(spark.read.parquet(store))

    # a second query / fresh checkpoint restarts batch ids at 0 — loud
    fold_b = scd2_fold(spark, store, *args, lineage="ckpt-B")
    with pytest.raises(RuntimeError, match="ckpt-A.*ckpt-B"):
        fold_b(spark.createDataFrame(b2, OBS_SCHEMA), 0)
    # direct driving (lineage=None) is its own lineage — also loud
    fold_none = scd2_fold(spark, store, *args)
    with pytest.raises(RuntimeError, match="lineage"):
        fold_none(spark.createDataFrame(b2, OBS_SCHEMA), 1)
    # the store is untouched by the refused folds
    assert _canon(spark.read.parquet(store)) == before
    # the original lineage continues unharmed
    fold_a(spark.createDataFrame(b2, OBS_SCHEMA), 1)
    assert len(_canon(spark.read.parquet(store))) > len(before)
    # upsert fold carries the same contract
    ustore = str(tmp_path / "ustore")
    ufold = upsert_fold(spark, ustore, ["k"], "version", lineage="ckpt-A")
    ufold(spark.createDataFrame([(1, 1, "v1")], "k long, version long, v string"), 0)
    ufold2 = upsert_fold(spark, ustore, ["k"], "version", lineage="ckpt-B")
    with pytest.raises(RuntimeError, match="lineage"):
        ufold2(spark.createDataFrame([(1, 2, "v2")], "k long, version long, v string"), 0)


def test_legacy_marker_without_lineage_is_adopted_and_stamped(spark, tmp_path):
    """ADVICE r11: markers written before the lineage stamp have NO
    'lineage' key. Such a store must be ADOPTED (with a warning), not
    refused — the old behavior raised exactly when the user followed the
    error's own advice (resume the original checkpoint) while a direct
    fold silently adopted. Adoption honors the stored batch id (replays
    still skip), and the next publish stamps the adopter's lineage, after
    which a different lineage fails loudly as usual."""
    import json
    import os
    import warnings

    import pytest

    store = str(tmp_path / "store")
    b1, b2, b3 = _obs_batches()
    args = (["user_id"], "ts", ["event_type"], "event_id")
    fold_a = scd2_fold(spark, store, *args, lineage="ckpt-A")
    fold_a(spark.createDataFrame(b1, OBS_SCHEMA), 0)
    # simulate a pre-upgrade store: strip the lineage key from the marker
    marker_path = os.path.join(store, "_kw_batch")
    with open(marker_path) as fh:
        marker = json.load(fh)
    del marker["lineage"]
    with open(marker_path, "w") as fh:
        json.dump(marker, fh)

    # resuming the ORIGINAL checkpoint now adopts instead of raising...
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        fold_a(spark.createDataFrame(b1, OBS_SCHEMA), 0)  # replay: still skipped
        assert any("pre-lineage" in str(w.message) for w in caught)
    before = _canon(spark.read.parquet(store))
    assert before == _canon(spark.read.parquet(store))  # replay was a no-op
    fold_a(spark.createDataFrame(b2, OBS_SCHEMA), 1)  # new batch: applied + stamped
    with open(marker_path) as fh:
        assert json.load(fh)["lineage"] == "ckpt-A"
    # ...and once stamped, a foreign lineage is loud again
    fold_b = scd2_fold(spark, store, *args, lineage="ckpt-B")
    with pytest.raises(RuntimeError, match="ckpt-A.*ckpt-B"):
        fold_b(spark.createDataFrame(b3, OBS_SCHEMA), 0)


def test_streaming_upsert_maintenance_latest_wins_with_restart(spark, tmp_path):
    """SCD1 twin: the stored snapshot equals merge_upsert folded over
    everything — latest version per key across batches and a restart."""
    from kafka_workers_spark.pipeline import merge_upsert

    schema = "k long, version long, payload string"
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    b1 = [(1, 1, "one-v1"), (2, 1, "two-v1")]
    b2 = [(1, 3, "one-v3"), (3, 1, "three-v1")]
    b3 = [(1, 2, "one-v2-late"), (2, 2, "two-v2")]  # stale update for k=1
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = streaming_upsert_maintenance(stream, store, ckpt, ["k"], "version")
        q.awaitTermination(120)

    run()
    spark.createDataFrame(b3, schema).coalesce(1).write.mode("append").parquet(src)
    run()  # checkpoint restart

    got = sorted(map(tuple, spark.read.parquet(store).collect()))
    base = spark.createDataFrame(b1, schema)
    want = merge_upsert(
        merge_upsert(base, spark.createDataFrame(b2, schema), ["k"], "version"),
        spark.createDataFrame(b3, schema),
        ["k"],
        "version",
    )
    assert got == sorted(map(tuple, want.collect()))
    assert got == [(1, 3, "one-v3"), (2, 2, "two-v2"), (3, 1, "three-v1")]


def test_upsert_fold_replay_is_idempotent_even_without_marker_skip(spark, tmp_path):
    """merge_upsert replay is idempotent by construction (max-wins);
    the marker just skips the redundant rewrite. Driving the fold with
    a replayed id leaves the snapshot unchanged."""
    schema = "k long, version long, payload string"
    store = str(tmp_path / "store")
    fold = upsert_fold(spark, store, ["k"], "version")
    fold(spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], schema), 0)
    fold(spark.createDataFrame([(1, 2, "a2")], schema), 1)
    after = sorted(map(tuple, spark.read.parquet(store).collect()))
    fold(spark.createDataFrame([(1, 2, "a2")], schema), 1)
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == after
    assert after == [(1, 2, "a2"), (2, 1, "b")]


# ---------------------------------------------------------------------------
# Bucketed incremental publish (VERDICT r10 #5 / r11 #6)
# ---------------------------------------------------------------------------


def _bucket_markers(store):
    """{bucket_dir_name: batch_id} for every published bucket."""
    import json
    import os

    out = {}
    for d in sorted(os.listdir(store)):
        p = os.path.join(store, d, "_kw_batch")
        if d.startswith("b=") and os.path.exists(p):
            with open(p) as fh:
                out[d] = json.load(fh)["batch_id"]
    return out


def _bucket_files(store):
    """{bucket_dir_name: sorted parquet file names} per published bucket."""
    import os

    return {
        d: sorted(f for f in os.listdir(os.path.join(store, d)) if f.endswith(".parquet"))
        for d in sorted(os.listdir(store))
        if d.startswith("b=")
    }


def test_bucketed_scd2_fold_equals_whole_rewrite_and_touches_only_its_buckets(
    spark, tmp_path
):
    """The bucketed fold's contract: (a) end state row-identical to the
    whole-store fold and the one-shot history; (b) a batch rewrites ONLY
    the buckets its keys hash to — untouched buckets keep their marker
    batch id AND their parquet files byte-for-byte (same names, same
    listing), which is the O(touched)-not-O(table) I/O claim."""
    from kafka_workers_spark.pipeline import scd2_history
    from kafka_workers_spark.streaming.maintenance import (
        read_bucketed_store,
        scd2_fold_bucketed,
    )

    whole, bucketed = str(tmp_path / "whole"), str(tmp_path / "bucketed")
    b1, b2, b3 = _obs_batches()
    args = (["user_id"], "ts", ["event_type"], "event_id")
    wfold = scd2_fold(spark, whole, *args, lineage="L")
    bfold = scd2_fold_bucketed(spark, bucketed, *args, n_buckets=8, lineage="L")
    for i, batch in enumerate((b1, b2)):
        df = spark.createDataFrame(batch, OBS_SCHEMA)
        wfold(df, i)
        bfold(df, i)
    markers_before = _bucket_markers(bucketed)
    files_before = _bucket_files(bucketed)

    # batch 3 restricted to user 1 — exactly one key, so exactly one bucket
    only_u1 = [r for r in b3 if r[0] == 1]
    wfold(spark.createDataFrame(only_u1, OBS_SCHEMA), 2)
    bfold(spark.createDataFrame(only_u1, OBS_SCHEMA), 2)

    got = _canon(read_bucketed_store(spark, bucketed))
    assert got == _canon(spark.read.parquet(whole))
    one_shot = scd2_history(
        spark.createDataFrame(b1 + b2 + only_u1, OBS_SCHEMA), *args
    )
    assert got == _canon(one_shot)

    markers_after = _bucket_markers(bucketed)
    files_after = _bucket_files(bucketed)
    changed = [d for d in markers_after if markers_after[d] != markers_before.get(d)]
    assert len(changed) == 1, f"one key must touch one bucket, got {changed}"
    for d in markers_after:
        if d not in changed:
            assert files_after[d] == files_before[d], f"untouched bucket {d} rewritten"
            assert markers_after[d] == markers_before[d]


def test_bucketed_streaming_restart_replay_crash_and_lineage(spark, tmp_path):
    """The bucketed store under the REAL streaming entry point with a
    checkpoint restart equals the one-shot history; a replayed batch id
    is a per-bucket no-op; a crash between bucket swaps (simulated by
    rolling one bucket back to its pre-batch state) heals on replay —
    only the rolled-back bucket re-merges; and a foreign lineage fails
    loudly against the bucketed store too."""
    import shutil

    import pytest

    from kafka_workers_spark.pipeline import scd2_history
    from kafka_workers_spark.streaming.maintenance import (
        read_bucketed_store,
        scd2_fold_bucketed,
        streaming_scd2_maintenance,
    )

    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    b1, b2, b3 = _obs_batches()
    spark.createDataFrame(b1, OBS_SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, OBS_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(OBS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_scd2_maintenance(
            stream, store, ckpt, ["user_id"], "ts", ["event_type"], "event_id",
            n_buckets=8,
        )
        q.awaitTermination(120)

    run()  # batches 0 and 1
    spark.createDataFrame(b3, OBS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    run()  # checkpoint restart: only the new file folds

    want = scd2_history(
        spark.createDataFrame(b1 + b2 + b3, OBS_SCHEMA),
        ["user_id"], "ts", ["event_type"], "event_id",
    )
    assert _canon(read_bucketed_store(spark, store)) == _canon(want)

    # replay guard, driven directly under the SAME lineage
    import os

    lineage = os.path.abspath(ckpt)
    fold = scd2_fold_bucketed(
        spark, store, ["user_id"], "ts", ["event_type"], "event_id",
        n_buckets=8, lineage=lineage,
    )
    after = _canon(read_bucketed_store(spark, store))
    fold(spark.createDataFrame(b3, OBS_SCHEMA), 2)  # already applied everywhere
    assert _canon(read_bucketed_store(spark, store)) == after

    # crash-between-swaps: apply batch 3 to TWO users' buckets, then roll
    # one bucket back (as if the crash hit before its swap) and replay
    next_batch = [(1, _ts(50), "c", 10), (2, _ts(55), "z", 11)]
    markers = _bucket_markers(store)
    snapshot = {d: str(tmp_path / f"snap-{d}") for d in markers}
    for d, s in snapshot.items():
        shutil.copytree(os.path.join(store, d), s)
    fold(spark.createDataFrame(next_batch, OBS_SCHEMA), 3)
    full = _canon(read_bucketed_store(spark, store))
    changed = [
        d for d, bid in _bucket_markers(store).items() if bid != markers.get(d)
    ]
    assert len(changed) == 2, changed
    victim = changed[0]
    shutil.rmtree(os.path.join(store, victim))
    shutil.copytree(snapshot[victim], os.path.join(store, victim))
    assert _canon(read_bucketed_store(spark, store)) != full  # torn state
    fold(spark.createDataFrame(next_batch, OBS_SCHEMA), 3)  # replay heals
    assert _canon(read_bucketed_store(spark, store)) == full
    # the bucket that was NOT rolled back kept its files through the replay
    # (its marker already carried batch 3 — the per-bucket skip)
    # foreign lineage: loud, store untouched
    fold_b = scd2_fold_bucketed(
        spark, store, ["user_id"], "ts", ["event_type"], "event_id",
        n_buckets=8, lineage="other-ckpt",
    )
    with pytest.raises(RuntimeError, match="lineage"):
        fold_b(spark.createDataFrame([(1, _ts(60), "d", 12)], OBS_SCHEMA), 0)
    assert _canon(read_bucketed_store(spark, store)) == full
    # n_buckets mismatch: loud
    with pytest.raises(RuntimeError, match="n_buckets"):
        scd2_fold_bucketed(
            spark, store, ["user_id"], "ts", ["event_type"], "event_id",
            n_buckets=16, lineage=lineage,
        )(spark.createDataFrame([(1, _ts(70), "e", 13)], OBS_SCHEMA), 4)


def test_bucketed_upsert_fold_equals_whole_fold(spark, tmp_path):
    from kafka_workers_spark.streaming.maintenance import (
        read_bucketed_store,
        upsert_fold_bucketed,
    )

    S = "k long, version long, v string"
    whole, bucketed = str(tmp_path / "uw"), str(tmp_path / "ub")
    wfold = upsert_fold(spark, whole, ["k"], "version", lineage="L")
    bfold = upsert_fold_bucketed(
        spark, bucketed, ["k"], "version", n_buckets=4, lineage="L"
    )
    batches = [
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")],
        [(1, 3, "a2"), (2, 2, "b2")],
        [(1, 2, "stale"), (4, 1, "d")],  # stale version ignored, new key lands
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, S)
        wfold(df, i)
        bfold(df, i)
    got = sorted(map(tuple, read_bucketed_store(spark, bucketed).collect()))
    assert got == sorted(map(tuple, spark.read.parquet(whole).collect()))
    assert dict((k, (ver, v)) for k, ver, v in got) == {
        1: (3, "a2"), 2: (2, "b2"), 3: (1, "c"), 4: (1, "d")
    }


def test_torn_swap_heals_instead_of_erasing_history(spark, tmp_path):
    """Review r12: a crash between swap_output's park and publish leaves
    backup-present/final-missing. The fold must RESTORE the parked store
    before deciding its merge base — the pre-fix behavior read an empty
    base and erased the bucket's (or store's) whole history on the next
    publish. Covers the whole-store fold, the bucketed fold, and the
    bucketed reader's stale-backup case (backup AND final present: the
    backup must be reaped, never read as a second copy)."""
    import os
    import shutil

    from kafka_workers_spark.streaming.maintenance import (
        read_bucketed_store,
        scd2_fold_bucketed,
    )

    b1, b2, b3 = _obs_batches()
    args = (["user_id"], "ts", ["event_type"], "event_id")

    # whole-store fold: park happened, publish didn't
    store = str(tmp_path / "whole")
    fold = scd2_fold(spark, store, *args, lineage="L")
    fold(spark.createDataFrame(b1, OBS_SCHEMA), 0)
    before = _canon(spark.read.parquet(store))
    os.rename(store, store + ".pre-swap")  # simulated torn swap
    fold(spark.createDataFrame(b1, OBS_SCHEMA), 0)  # replay of batch 0
    assert _canon(spark.read.parquet(store)) == before  # healed, skipped
    fold(spark.createDataFrame(b2, OBS_SCHEMA), 1)
    assert len(_canon(spark.read.parquet(store))) > len(before)

    # bucketed fold: tear ONE bucket the same way mid-batch
    bstore = str(tmp_path / "bucketed")
    bfold = scd2_fold_bucketed(spark, bstore, *args, n_buckets=4, lineage="L")
    bfold(spark.createDataFrame(b1, OBS_SCHEMA), 0)
    full = _canon(read_bucketed_store(spark, bstore))
    victim = next(d for d in sorted(os.listdir(bstore)) if d.startswith("b="))
    os.rename(
        os.path.join(bstore, victim), os.path.join(bstore, victim + ".pre-swap")
    )
    bfold(spark.createDataFrame(b1, OBS_SCHEMA), 0)  # replay heals the tear
    assert _canon(read_bucketed_store(spark, bstore)) == full
    bfold(spark.createDataFrame(b2, OBS_SCHEMA), 1)
    healed = _canon(read_bucketed_store(spark, bstore))
    assert len(healed) > len(full), "history was erased by the torn swap"

    # stale backup NEXT TO a live bucket: reader must not double-count
    shutil.copytree(
        os.path.join(bstore, victim), os.path.join(bstore, victim + ".pre-swap")
    )
    assert _canon(read_bucketed_store(spark, bstore)) == healed
    assert not os.path.exists(os.path.join(bstore, victim + ".pre-swap"))
