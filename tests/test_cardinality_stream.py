"""Live distinct-count maintenance (streaming/cardinality.py): per-key
KMV sketch rows fold per micro-batch into a stored table through the
maintenance contract — restart mid-stream, replay no-op, foreign
lineage raise, torn-swap heal — and the folded store is pinned
BIT-EXACT equal (hash-for-hash) to the one-shot kmv_build over every
event ever landed: the merge-exactness of bottom-k is what makes a
maintained cardinality store verifiable at all."""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from kafka_workers_spark.functions.sketches import kmv_build
from kafka_workers_spark.sources.files import load_table
from kafka_workers_spark.streaming.cardinality import (
    cardinality_fold,
    read_cardinality_store,
    streaming_cardinality_maintenance,
)

K = 4  # tiny k so the sf0.001 user set (15 users) SATURATES some keys


def _events(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    return ev.select(
        "event_id",
        "event_type",
        "user_id",
        F.expr("unix_micros(ts) DIV 86400000000").alias("day_idx"),
    )


def _canon(df):
    return sorted(
        (r.event_type, r.day_idx, tuple(r.hashes), r.n_distinct_capped, r.k)
        for r in df.collect()
    )


def _one_shot(spark, ev):
    return _canon(
        kmv_build(ev, "user_id", k=K, group_cols=["event_type", "day_idx"])
    )


def test_cardinality_fold_restart_replay_lineage(spark, tmp_path):
    """Three batches through the fold with a 'restart' (fresh fold
    instance) before the last: folded store == one-shot build over all
    events, hash-for-hash; a replayed batch id is a no-op (marker mtime
    untouched); a foreign lineage raises; an empty batch is a no-op;
    unsaturated keys carry the EXACT distinct count."""
    ev = _events(spark)
    store = str(tmp_path / "store")
    fold = cardinality_fold(
        spark, store, ["event_type", "day_idx"], "user_id", k=K, lineage="A"
    )
    fold(ev.filter("event_id % 3 = 0"), 0)
    fold(ev.filter("event_id % 3 = 1"), 1)
    fold2 = cardinality_fold(  # restart: nothing carried in memory
        spark, store, ["event_type", "day_idx"], "user_id", k=K, lineage="A"
    )
    fold2(ev.filter("event_id % 3 = 2"), 2)

    got = _canon(read_cardinality_store(spark, store))
    assert got == _one_shot(spark, ev) and len(got) > 0
    # saturation exercised both ways
    assert any(r[3] == K for r in got) and any(r[3] < K for r in got)
    # unsaturated keys are EXACT distinct counts
    exact = {
        (r.event_type, r.day_idx): r.n
        for r in ev.groupBy("event_type", "day_idx")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, day, _h, cap, _k in got:
        if cap < K:
            assert cap == exact[(et, day)]
    # replay: no republish
    marker = os.path.join(store, "_kw_batch")
    mtime = os.path.getmtime(marker)
    fold2(ev.filter("event_id % 3 = 1"), 1)
    assert os.path.getmtime(marker) == mtime
    assert _canon(read_cardinality_store(spark, store)) == got
    # empty batch: no-op
    fold2(ev.limit(0), 3)
    assert _canon(read_cardinality_store(spark, store)) == got
    # foreign lineage fails loudly
    with pytest.raises(RuntimeError, match="lineage"):
        cardinality_fold(
            spark, store, ["event_type", "day_idx"], "user_id", k=K, lineage="B"
        )(ev.limit(5), 0)
    with pytest.raises(ValueError, match="partition_cols"):
        cardinality_fold(spark, store, [], "user_id")


def test_cardinality_fold_mixed_k_raises_and_torn_swap_heals(spark, tmp_path):
    """A fold whose k differs from the store's stamped sketches raises
    in-plan (kmv_merge's mixed-k guard — the blocking-parameter
    discipline); a torn swap (park done, publish missing) heals on the
    next read and the next fold."""
    ev = _events(spark)
    store = str(tmp_path / "store")
    fold = cardinality_fold(
        spark, store, ["event_type"], "user_id", k=K, lineage="L"
    )
    fold(ev.filter("event_id % 2 = 0"), 0)
    before = sorted(
        (r.event_type, tuple(r.hashes)) for r in read_cardinality_store(spark, store).collect()
    )
    with pytest.raises(Exception, match="mixed k"):
        cardinality_fold(
            spark, store, ["event_type"], "user_id", k=K * 2, lineage="L"
        )(ev.filter("event_id % 2 = 1"), 1)
    # torn swap: park exists, final missing
    os.rename(store, store + ".pre-swap")
    healed = sorted(
        (r.event_type, tuple(r.hashes)) for r in read_cardinality_store(spark, store).collect()
    )
    assert healed == before
    os.rename(store, store + ".pre-swap")
    fold(ev.filter("event_id % 2 = 1"), 1)  # fold heals, then merges
    assert sorted(
        (r.event_type, tuple(r.hashes), r.n_distinct_capped, r.k)
        for r in read_cardinality_store(spark, store).collect()
    ) == sorted(
        (r.event_type, tuple(r.hashes), r.n_distinct_capped, r.k)
        for r in kmv_build(ev, "user_id", k=K, group_cols=["event_type"]).collect()
    )


def test_streaming_cardinality_with_restart_equals_one_shot(spark, tmp_path):
    """The live wrapper: event files stream one-per-trigger with a
    checkpoint restart mid-corpus; the final store equals the one-shot
    build hash-for-hash, and the estimate column from the reader is the
    exact count on unsaturated keys and within the k=4 error envelope
    on saturated ones."""
    ev = _events(spark)
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    ev.filter("event_id % 3 = 0").coalesce(1).write.parquet(src)
    ev.filter("event_id % 3 = 1").coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, user_id long, day_idx long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_cardinality_maintenance(
            stream, store, ckpt, ["event_type", "day_idx"], "user_id", k=K
        )
        q.awaitTermination(120)

    run()
    ev.filter("event_id % 3 = 2").coalesce(1).write.mode("append").parquet(src)
    run()  # checkpoint restart: only the new file folds
    got = _canon(read_cardinality_store(spark, store))
    assert got == _one_shot(spark, ev)
    est = read_cardinality_store(spark, store, k=K)
    exact = {
        (r.event_type, r.day_idx): r.n
        for r in ev.groupBy("event_type", "day_idx")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in est.collect():
        want = exact[(r.event_type, r.day_idx)]
        if r.n_distinct_capped < K:
            assert r.est_distinct == want
        else:
            # Beyer et al.: relative error ~ 1/sqrt(k-2); allow 4 sigma
            assert abs(r.est_distinct - want) <= want * 4 / (K - 2) ** 0.5, (
                r.event_type, r.day_idx, r.est_distinct, want,
            )
