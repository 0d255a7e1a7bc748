"""Live streaming z² anomaly screen (streaming/drift.py): the per-key
WorkerTask ring state machine must emit exactly the batch-entry rows on
the same events — including a bucket whose events split ACROSS
micro-batches (the carried open bucket supplies the continuation) and
gap zeros spanning a batch boundary. The markov/funnel live==batch
discipline applied to the drift family."""

from __future__ import annotations

import pytest

# slow tier (VERDICT r12 #6): live micro-batch runs — seconds-per-test by
# nature (scheduling waits, not compute).
pytestmark = pytest.mark.slow

from datetime import datetime, timedelta

from kafka_workers_spark.streaming.drift import (
    anomaly_tasks_batch,
    anomaly_worker_task,
    mad_tasks_batch,
    mad_worker_task,
    streaming_anomaly_mad,
    streaming_anomaly_zscore,
)

SCHEMA = "k string, ts timestamp, event_id long"


def _ts(h: float) -> datetime:
    return datetime(2024, 1, 1) + timedelta(hours=h)


def _rows(counts_by_hour: dict[int, int], key: str = "a", base_id: int = 0):
    rows, eid = [], base_id
    for h, n in sorted(counts_by_hour.items()):
        for i in range(n):
            rows.append((key, _ts(h + i / max(n, 1) * 0.5), eid))
            eid += 1
    return rows


def _canon(df):
    return sorted(
        (r.k, r.bucket_start, r.n_events, r.n_window, r.dev_num, r.var_num,
         r.is_anomaly)
        for r in df.collect()
    )


def test_streaming_equals_batch_with_split_bucket_and_gap(spark, tmp_path):
    """Batch file 1 ends MID-bucket (hour 5 has events in both files) and
    file 2 starts after a 3-hour silence — the live run must close hour
    5 with the union count and back-fill hours 6-8 with zeros when hour
    9's first event arrives, exactly as the full-history batch replay
    does."""
    src = str(tmp_path / "src")
    f1 = _rows({0: 3, 1: 3, 2: 3, 3: 3, 4: 3}) + [("a", _ts(5.0), 100)]
    # the hour-10 sentinel closes the hour-9 flood; hour 10 itself stays
    # open and must be absent from BOTH plans
    f2 = (
        [("a", _ts(5.4), 101), ("a", _ts(5.6), 102)]
        + _rows({9: 40}, base_id=200)
        + [("a", _ts(10.2), 999)]
    )
    spark.createDataFrame(f1, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(f2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    live = streaming_anomaly_zscore(
        stream, ["k"], "ts", tiebreak_col="event_id",
        bucket_seconds=3600, window=4, min_n=3,
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        live.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = anomaly_tasks_batch(
        spark.createDataFrame(f1 + f2, SCHEMA), ["k"], "ts",
        tiebreak_col="event_id", bucket_seconds=3600, window=4, min_n=3,
    )
    got = _canon(spark.read.parquet(out_dir))
    want = _canon(batch)
    assert got == want
    by_hour = {r[1].hour: r for r in got}
    # hour 5's count is the cross-batch union (1 from file 1 + 2 from 2)
    assert by_hour[5][2] == 3
    # the batch-boundary gap hours closed as zeros
    assert by_hour[6][2] == 0 and by_hour[8][2] == 0
    # the flood at hour 9 flags against the quiet trailing window
    assert by_hour[9][6] is True
    # the open hour-10 bucket never closed: absent from the live output
    assert max(by_hour) == 9


def test_stream_task_closes_final_bucket_only_on_next_event(spark):
    """The documented divergence: the final bucket never closes. Driving
    the task directly: after events in buckets 0 and 1, only bucket 0
    emitted; a later batch with a bucket-2 event closes bucket 1."""
    import pandas as pd

    task = anomaly_worker_task(["k"], "ts", 3600, window=4, min_n=2)
    pdf1 = pd.DataFrame({"k": ["a"] * 3, "ts": [_ts(0), _ts(0.5), _ts(1)],
                         "event_id": [1, 2, 3]})
    out1, st = task.process(("a",), pdf1, {})
    assert out1["bucket_idx"].tolist() == [pdf1["ts"][0].value // 10**9 // 3600]
    assert out1["n_events"].tolist() == [2]
    pdf2 = pd.DataFrame({"k": ["a"], "ts": [_ts(2)], "event_id": [4]})
    out2, st = task.process(("a",), pdf2, st)
    assert out2["n_events"].tolist() == [1]  # bucket 1 closed by bucket 2
    assert st["cur_n"] == 1  # bucket 2 open in state
    # validation parity with the batch operator
    with pytest.raises(ValueError, match="z_den"):
        anomaly_worker_task(["k"], z_den=0)
    with pytest.raises(ValueError, match="min_n"):
        anomaly_worker_task(["k"], min_n=1)


def test_batch_entry_equals_relational_minus_open_buckets(spark):
    """anomaly_tasks_batch == operators.drift.anomaly_zscore minus each
    key's max bucket (the never-closed one), bit for bit — the
    cross-plan identity the registered oracle encodes, checked here
    directly between the two SPARK plans on multi-key data with gaps."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.drift import anomaly_zscore

    rows = (
        _rows({0: 2, 1: 2, 2: 2, 3: 2, 4: 2, 7: 30, 8: 1}, key="a")
        + _rows({0: 5, 2: 5, 3: 5, 5: 5, 6: 6}, key="b", base_id=1000)
    )
    ev = spark.createDataFrame(rows, SCHEMA)
    via_task = anomaly_tasks_batch(
        ev, ["k"], "ts", tiebreak_col="event_id",
        bucket_seconds=3600, window=4, min_n=3,
    )
    rel = anomaly_zscore(ev, ["k"], "ts", 3600, window=4, min_n=3)
    rel_closed = (
        rel.withColumn(
            "__mx", F.max("bucket_start").over(W.partitionBy("k"))
        )
        .filter(F.col("bucket_start") < F.col("__mx"))
        .drop("__mx")
    )
    assert _canon(via_task) == _canon(rel_closed)


# ---------------------------------------------------------------------------
# Robust median/MAD live arm (VERDICT r13 #2): the z² trio discipline
# applied to the outlier-resistant screen, on the fixture that motivates
# it — an in-window flood that masks the z² screen but not this one.
# ---------------------------------------------------------------------------


def _canon_mad(df):
    return sorted(
        (r.k, r.bucket_start, r.n_events, r.n_window, r.med, r.mad, r.is_anomaly)
        for r in df.collect()
    )


def test_streaming_mad_equals_batch_on_masking_fixture(spark, tmp_path):
    """Live == batch for the MAD screen across a micro-batch split, ON
    the masking fixture: 11 quiet hours + a 300-count flood land in file
    1, 12 more quiet hours + a 40-count spike (+ a sentinel to close it)
    in file 2 — the carried ring holds the flood when the spike arrives.
    The spike must flag under MAD (med/mad shrug off the flood) while
    the SAME live events stay silent under z² (sigma blown up) — the
    two live screens adjudicated side by side on one stream."""
    src = str(tmp_path / "src")
    f1 = _rows({h: 5 for h in range(11)}) + _rows({11: 300}, base_id=500)
    f2 = (
        _rows({h: 5 for h in range(12, 24)}, base_id=2000)
        + _rows({24: 40}, base_id=3000)
        + [("a", _ts(25.1), 9999)]
    )
    spark.createDataFrame(f1, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(f2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    def run_live(fn):
        stream = (
            spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
        )
        live = fn(
            stream, ["k"], "ts", tiebreak_col="event_id",
            bucket_seconds=3600, window=24, min_n=8,
        )
        out_dir = str(tmp_path / f"out_{fn.__name__}")
        ckpt = str(tmp_path / f"ckpt_{fn.__name__}")
        q = (
            live.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    got = _canon_mad(run_live(streaming_anomaly_mad))
    batch = mad_tasks_batch(
        spark.createDataFrame(f1 + f2, SCHEMA), ["k"], "ts",
        tiebreak_col="event_id", bucket_seconds=3600, window=24, min_n=8,
    )
    assert got == _canon_mad(batch)
    by_hour = {r[1].hour + 24 * (r[1].day - 1): r for r in got}
    # the spike at hour 24 flags: window med=5, mad=0 (flood is one of
    # 24, medians untouched) -> any rise fires... mad=0 path: (40-5)*2 >
    # 9*0 holds
    assert by_hour[24][6] is True
    # the flood itself flagged too (quiet history at hour 11)
    assert by_hour[11][6] is True
    # the z² live screen on the SAME stream stays masked at the spike
    z = {r[1].hour + 24 * (r[1].day - 1): r
         for r in _canon(run_live(streaming_anomaly_zscore))}
    assert z[24][6] is False


def test_mad_batch_entry_equals_relational_minus_open_buckets(spark):
    """mad_tasks_batch == operators.drift.anomaly_mad minus each key's
    max bucket, bit for bit — med/mad NULLs on empty trailing frames
    included — on multi-key data with gaps and the masking flood."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.drift import anomaly_mad

    rows = (
        _rows({0: 5, 1: 5, 2: 300, 5: 5, 6: 5, 7: 5, 8: 5, 9: 5, 10: 40, 11: 1},
              key="a")
        + _rows({0: 2, 3: 2, 4: 2, 5: 2, 6: 9, 7: 1}, key="b", base_id=5000)
    )
    ev = spark.createDataFrame(rows, SCHEMA)
    via_task = mad_tasks_batch(
        ev, ["k"], "ts", tiebreak_col="event_id",
        bucket_seconds=3600, window=6, min_n=4, z_num=9, z_den=2,
    )
    rel = anomaly_mad(ev, ["k"], "ts", 3600, window=6, min_n=4, z_num=9, z_den=2)
    rel_closed = (
        rel.withColumn("__mx", F.max("bucket_start").over(W.partitionBy("k")))
        .filter(F.col("bucket_start") < F.col("__mx"))
        .drop("__mx")
    )
    assert _canon_mad(via_task) == _canon_mad(rel_closed)


def test_drift_tasks_reject_backwards_buckets(spark):
    """ADVICE r13 #4: the per-key ordering contract is ENFORCED — a
    batch whose bucket precedes the carried open bucket raises instead
    of silently rewinding the ring and re-emitting earlier buckets with
    a corrupted trailing window. Both screens share the fold, so both
    fail loudly; in-order continuation still works after a clean batch."""
    import pandas as pd

    for maker in (anomaly_worker_task, mad_worker_task):
        task = maker(["k"], "ts", 3600, window=4, min_n=2)
        pdf1 = pd.DataFrame({"k": ["a"] * 2, "ts": [_ts(5), _ts(6)],
                             "event_id": [1, 2]})
        _, st = task.process(("a",), pdf1, {})
        back = pd.DataFrame({"k": ["a"], "ts": [_ts(3)], "event_id": [3]})
        with pytest.raises(ValueError, match="nondecreasing"):
            task.process(("a",), back, st)
        # a backwards bucket WITHIN one batch trips the same guard
        task2 = maker(["k"], "ts", 3600, window=4, min_n=2)
        mixed = pd.DataFrame({"k": ["a"] * 2, "ts": [_ts(6), _ts(5)],
                              "event_id": [1, 2]})
        with pytest.raises(ValueError, match="nondecreasing"):
            task2.process(("a",), mixed, {})
    # MAD param validation parity
    with pytest.raises(ValueError, match="z_num"):
        mad_worker_task(["k"], z_num=0)


# ---------------------------------------------------------------------------
# CUSUM live arm (round 14): warmup completes MID-stream (the phase-I
# buffer flushes in a later micro-batch), the shift accrues across the
# batch boundary, and a key that never completes warmup emits nothing.
# ---------------------------------------------------------------------------

from kafka_workers_spark.streaming.drift import (  # noqa: E402
    cusum_tasks_batch,
    cusum_worker_task,
    streaming_anomaly_cusum,
)


def _canon_cusum(df):
    return sorted(
        (r.k, r.bucket_start, r.n_events, r.med, r.mad, r.s_up, r.s_dn,
         r.is_shift_up, r.is_shift_dn)
        for r in df.collect()
    )


def test_streaming_cusum_equals_batch_with_midstream_warmup(spark, tmp_path):
    """Warmup=6: file 1 holds only 4 baseline buckets of key 'a' (phase I
    cannot complete — the live run emits NOTHING for it yet), file 2
    completes the warmup and carries a sustained +1 shift; key 'b' has
    3 buckets total and never completes warmup (absent from the live
    output AND from the batch entry, present in the relational plan).
    Live == batch bit-for-bit; batch == relational under the composed
    final-bucket + warmup-complete filters; the shift flags once its
    accumulation crosses h·mad·k_den."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.drift import anomaly_cusum

    src = str(tmp_path / "src")
    base = {h: c for h, c in enumerate([9, 10, 11, 9])}
    f1 = _rows(base) + _rows({0: 2, 1: 2, 2: 2}, key="b", base_id=9000)
    live_counts = {h: c for h, c in enumerate([10, 11] + [11] * 16, start=4)}
    f2 = _rows(live_counts, base_id=1000) + [("a", _ts(22.5), 9999)]
    spark.createDataFrame(f1, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(f2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    live = streaming_anomaly_cusum(
        stream, ["k"], "ts", tiebreak_col="event_id",
        bucket_seconds=3600, warmup=6, k_num=1, k_den=2, h_num=5, h_den=1,
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        live.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _canon_cusum(spark.read.parquet(out_dir))

    all_events = spark.createDataFrame(f1 + f2, SCHEMA)
    batch = cusum_tasks_batch(
        all_events, ["k"], "ts", tiebreak_col="event_id",
        bucket_seconds=3600, warmup=6, k_num=1, k_den=2, h_num=5, h_den=1,
    )
    assert got == _canon_cusum(batch)
    # key 'b' never completed warmup: absent live, present relationally
    assert not any(r[0] == "b" for r in got)
    rel = anomaly_cusum(all_events, ["k"], "ts", 3600, warmup=6,
                        k_num=1, k_den=2, h_num=5, h_den=1)
    assert rel.filter("k = 'b'").count() == 3
    rel_closed = (
        rel.withColumn("__mx", F.max("bucket_start").over(W.partitionBy("k")))
        .withColumn("__nb", F.count("*").over(W.partitionBy("k")))
        .filter((F.col("bucket_start") < F.col("__mx")) & (F.col("__nb") >= 7))
        .drop("__mx", "__nb")
    )
    assert got == _canon_cusum(rel_closed)
    # warmup rows flushed with the frozen reference (med=10, mad=1 over
    # [9,10,11,9,10,11]); the sustained +1 shift flags at s_up > 10
    by_hour = {r[1].hour: r for r in got if r[0] == "a"}
    assert (by_hour[0][3], by_hour[0][4]) == (10, 1)
    assert by_hour[0][5] is None and by_hour[0][7] is False
    flagged = [h for h, r in by_hour.items() if r[7]]
    assert flagged and min(flagged) == 16  # 11th shifted bucket (6..21)
    # CUSUM task validates params like the batch operator
    with pytest.raises(ValueError, match="warmup"):
        cusum_worker_task(["k"], warmup=1)


# ---------------------------------------------------------------------------
# Seasonal z² live arm (VERDICT r14 #3): the phase-sliced ring streams
# through the shared bucket-fold machine — pinned across micro-batch
# splits with the season boundary mid-stream.
# ---------------------------------------------------------------------------

from kafka_workers_spark.streaming.drift import (  # noqa: E402
    seasonal_tasks_batch,
    seasonal_worker_task,
    streaming_anomaly_seasonal,
)


def test_streaming_seasonal_equals_batch_across_season_boundary(spark, tmp_path):
    """Season=4, window=3: a 'nightly batch' spike every 4th bucket plus
    a flood at a quiet phase. File 1 ends MID-SEASON (bucket 9, phase 1)
    so the carried ring crosses the season boundary between micro-
    batches. Live == batch bit-for-bit; batch == relational
    (anomaly_zscore with season) minus each key's final bucket; the
    recurring phase-0 spike does NOT flag seasonally (its same-phase
    baseline IS the spike) while the flat screen on the same stream
    flags it; the quiet-phase flood flags seasonally."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.drift import anomaly_zscore

    counts = {b: (20 if b % 4 == 0 else 2) for b in range(21)}
    counts[21] = 30  # flood at phase 1 (quiet phase)
    f1 = _rows({b: c for b, c in counts.items() if b < 10})
    f2 = _rows({b: c for b, c in counts.items() if b >= 10}, base_id=5000) + [
        ("a", _ts(22.2), 9999)  # sentinel closes bucket 21; 22 stays open
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(f1, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(f2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    kw = dict(bucket_seconds=3600, window=3, min_n=2, season=4)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    live = streaming_anomaly_seasonal(
        stream, ["k"], "ts", tiebreak_col="event_id", **kw
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        live.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _canon(spark.read.parquet(out_dir))

    all_events = spark.createDataFrame(f1 + f2, SCHEMA)
    batch = seasonal_tasks_batch(
        all_events, ["k"], "ts", tiebreak_col="event_id", **kw
    )
    assert got == _canon(batch)
    rel = anomaly_zscore(all_events, ["k"], "ts", 3600, window=3, min_n=2,
                         season=4)
    rel_closed = (
        rel.withColumn("__mx", F.max("bucket_start").over(W.partitionBy("k")))
        .filter(F.col("bucket_start") < F.col("__mx"))
        .drop("__mx")
    )
    assert got == _canon(rel_closed)
    by_hour = {r[1].hour: r for r in got}
    # the recurring nightly spike: same-phase baseline is [20,20,20] ->
    # dev 0, silent seasonally...
    assert by_hour[12][6] is False and by_hour[16][6] is False
    # ...but the FLAT live screen on the same stream flags it (window=3
    # of quiet 2s right before each spike)
    flat = streaming_anomaly_zscore(
        (spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
         .parquet(src)),
        ["k"], "ts", tiebreak_col="event_id",
        bucket_seconds=3600, window=3, min_n=2,
    )
    out2, ckpt2 = str(tmp_path / "out_flat"), str(tmp_path / "ckpt_flat")
    q2 = (
        flat.writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    flat_by_hour = {r[1].hour: r for r in _canon(spark.read.parquet(out2))}
    assert flat_by_hour[12][6] is True
    # the quiet-phase flood flags seasonally: same-phase baseline [2,2,2]
    assert by_hour[21][6] is True
    # validation parity with the batch operator
    with pytest.raises(ValueError, match="season"):
        seasonal_worker_task(["k"], season=1)


def test_worker_task_gap_guard_bounds_backfill(spark):
    """VERDICT r14 #4, live side: the shared machine refuses a silent
    run past max_gap_buckets (a year-silent key at hourly buckets)
    instead of materializing it as synthetic zeros; the default stays
    unbounded; the same guard rides the cusum machine's own loop."""
    import pandas as pd

    for maker in (anomaly_worker_task, mad_worker_task,
                  cusum_worker_task, seasonal_worker_task):
        task = maker(["k"], "ts", 3600, max_gap_buckets=1000)
        pdf = pd.DataFrame({
            "k": ["a", "a"],
            "ts": [_ts(0), _ts(365 * 24)],
            "event_id": [1, 2],
        })
        with pytest.raises(ValueError, match="max_gap_buckets"):
            task.process(("a",), pdf, {})
        # default: the year of zeros closes (absence is evidence)
        free = maker(["k"], "ts", 3600)
        out, _ = free.process(("a",), pdf, {})
        if out is not None:  # cusum may buffer phase-I rows
            assert len(out) >= 1
