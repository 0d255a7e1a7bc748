"""Drift/anomaly operators (operators/drift.py): pure-semantics pins for
the rolling z-score flag, PSI, and KL mixture — the cross-engine oracle
parity itself rides tests/test_oracle_extra.py like every EXTRA query.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from kafka_workers_spark.operators.drift import anomaly_zscore, kl_mixture, psi_drift

T0 = datetime(2024, 1, 1)


def _events(spark, counts_per_hour, key="a"):
    """One event row per count unit, hour h gets counts_per_hour[h] rows."""
    rows = []
    for h, c in enumerate(counts_per_hour):
        for i in range(c):
            rows.append((key, T0 + timedelta(hours=h, seconds=i)))
    return spark.createDataFrame(rows, "k string, ts timestamp")


def _flags(df):
    return {
        (r.k, r.bucket_start.hour + 24 * (r.bucket_start.day - 1)): (
            r.n_events,
            r.n_window,
            r.is_anomaly,
        )
        for r in df.collect()
    }


def test_anomaly_flags_spike_not_noise(spark):
    # 24h of steady 10±1, then a 30-count spike: mean 10, sd <= 1 -> z >> 3
    base = [10, 11, 9, 10, 10, 11, 9, 10] * 3
    df = _events(spark, base + [30])
    got = _flags(anomaly_zscore(df, ["k"], "ts", 3600, window=24, min_n=8))
    assert got[("a", 24)][2] is True  # the spike
    assert all(not v[2] for k, v in got.items() if k != ("a", 24))
    # same history, a 12-count hour: dev = 24*12 - 240 = 48;
    # var_num = 24*2414 - 240^2 = 336; 48^2=2304 < 9*336*... -> compute:
    # 2304 > 9*336 = 3024 is FALSE -> not an anomaly
    got2 = _flags(anomaly_zscore(_events(spark, base + [12]), ["k"], "ts", 3600))
    assert got2[("a", 24)][2] is False


def test_anomaly_zero_variance_history_flags_any_rise(spark):
    df = _events(spark, [5] * 24 + [6])
    got = _flags(anomaly_zscore(df, ["k"], "ts", 3600))
    assert got[("a", 24)] == (6, 24, True)  # var 0, dev > 0 -> z = inf
    df2 = _events(spark, [5] * 24 + [5])
    assert _flags(anomaly_zscore(df2, ["k"], "ts", 3600))[("a", 24)][2] is False


def test_anomaly_warmup_and_gap_semantics(spark):
    # fewer than min_n history buckets -> never flagged, however extreme
    df = _events(spark, [1, 1, 1, 100])
    got = _flags(anomaly_zscore(df, ["k"], "ts", 3600, min_n=8))
    assert not any(v[2] for v in got.values())
    # silent hours count as zeros: 8 quiet-but-nonempty bookends around
    # 16 SILENT hours, then a burst — the gap-filled mean is low, flags
    counts = [3] + [0] * 16 + [3, 3, 3, 3, 3, 3, 3] + [40]
    got = _flags(anomaly_zscore(_events(spark, counts), ["k"], "ts", 3600))
    assert got[("a", 24)][2] is True
    assert got[("a", 24)][1] == 24  # window spans the silent hours too


def test_anomaly_validates_params(spark):
    df = _events(spark, [1])
    with pytest.raises(ValueError, match="window"):
        anomaly_zscore(df, ["k"], "ts", 3600, window=0)
    with pytest.raises(ValueError, match="min_n"):
        anomaly_zscore(df, ["k"], "ts", 3600, min_n=1)
    # ADVICE r12 #2: z_den = 0 silently disables the test; negatives
    # invert it after squaring — both rejected up front
    with pytest.raises(ValueError, match="z_den"):
        anomaly_zscore(df, ["k"], "ts", 3600, z_den=0)
    with pytest.raises(ValueError, match="z_num"):
        anomaly_zscore(df, ["k"], "ts", 3600, z_num=0)
    with pytest.raises(ValueError, match="z_num"):
        anomaly_zscore(df, ["k"], "ts", 3600, z_num=-3)


def test_anomaly_overflow_guard_fires_in_plan(spark):
    """ADVICE r12 #1: the int64 bound window·max_cnt·max(z_num,z_den) ≤
    ⌊√(2⁶³−1)⌋ is enforced IN-PLAN. An absurd z_num drives the per-bucket
    count limit to 0, so any nonempty bucket must raise at runtime —
    through the emitted is_anomaly column, where no filter can prune the
    assert away — instead of wrapping silently in the BIGINT predicate.
    A run at the same counts with a sane z stays clean (the guard is
    inert on valid data, so oracle hashes are untouched)."""
    df = _events(spark, [3, 3, 3, 3])
    hot = anomaly_zscore(df, ["k"], "ts", 3600, window=2, min_n=2,
                         z_num=3_037_000_499, z_den=1)
    with pytest.raises(Exception, match="int64-safe limit"):
        hot.collect()
    ok = anomaly_zscore(df, ["k"], "ts", 3600, window=2, min_n=2)
    assert len(ok.collect()) == 4


def test_anomaly_overflow_guard_covers_window_and_numerators(spark):
    """ADVICE r13 #1: a too-hot bucket poisons the Σx/Σx² of its
    `window` FOLLOWERS, so the guard must fire for those rows even when
    (a) a pushed-down filter drops the hot row itself and (b) the
    consumer projects only var_num, never is_anomaly. Counts [3,3,9,3]
    with a limit of 4 (z_num chosen so count_limit = 3_037_000_499 //
    (2·379625062) = 4): hour 2 is hot; filtering to hour 3 — whose own
    count is fine but whose window includes hour 2 — and selecting
    var_num alone must still raise."""
    from pyspark.sql import functions as F

    df = _events(spark, [3, 3, 9, 3])
    out = anomaly_zscore(df, ["k"], "ts", 3600, window=2, min_n=2,
                         z_num=379_625_062, z_den=1)
    late = out.filter(F.hour("bucket_start") == 3).select("var_num")
    with pytest.raises(Exception, match="int64-safe limit"):
        late.collect()
    # rows whose window predates the hot bucket stay clean under the
    # same filter-and-project shape
    early = out.filter(F.hour("bucket_start") == 1).select("var_num")
    assert early.collect()[0].var_num is not None


# ---------------------------------------------------------------------------


def _sided(spark, ref_vals, cur_vals, grp="g"):
    rows = [(grp, float(v), "ref") for v in ref_vals] + [
        (grp, float(v), "cur") for v in cur_vals
    ]
    return spark.createDataFrame(rows, "grp string, v double, side string")


def test_psi_zero_when_identical(spark):
    vals = list(range(1, 101))
    out = psi_drift(_sided(spark, vals, vals), "grp", "v", "side").collect()
    assert len(out) == 10
    psi = out[0].psi12
    # identical populations: every bin's p_cur == p_ref -> ln ratio
    # quantizes to 0 or -1 (floor), |psi| bounded by quantization slack
    assert abs(psi) < 100_000, psi  # < 1e-7 in PSI units
    assert sum(r.n_ref for r in out) == 100 and sum(r.n_cur for r in out) == 100


def test_psi_detects_shift_and_is_nonnegative_up_to_quantization(spark):
    vals = list(range(1, 101))
    shifted = [v + 80 for v in vals]
    out = psi_drift(_sided(spark, vals, shifted), "grp", "v", "side").collect()
    psi = out[0].psi12
    assert psi > 1_000_000_000_000  # > 1.0: a gross shift
    assert all(r.term12 >= -1 for r in out)  # terms >= 0 modulo floor


def test_psi_validates_bins(spark):
    with pytest.raises(ValueError, match="n_bins"):
        psi_drift(_sided(spark, [1.0], [1.0]), "grp", "v", "side", n_bins=1)


# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_kl_zero_for_single_source_and_positive_for_skew(spark):
    # one source: p == q exactly -> every ln ratio is 0 or floors to -1
    out = kl_mixture(_docs(spark, [("s1", "a b c a b a")] * 4), top_v=8).collect()
    assert len(out) == 1 and abs(out[0].kl12) < 100_000
    # two sources with disjoint-ish vocab: both diverge from the mixture
    docs = [("s1", "a a a a b")] * 5 + [("s2", "z z z z y")] * 5
    out = {r.source: r for r in kl_mixture(_docs(spark, docs), top_v=8).collect()}
    assert out["s1"].kl12 > 100_000_000_000 and out["s2"].kl12 > 100_000_000_000
    # smoothing uses the REALIZED vocab (4 terms here, not top_v=8):
    # Gibbs holds, so no negative KL even with the cap unreachable
    assert all(r.kl12 >= -1_000_000 for r in out.values())


def test_kl_validates_top_v(spark):
    with pytest.raises(ValueError, match="top_v"):
        kl_mixture(_docs(spark, [("s", "a")]), top_v=0)


def test_anomaly_seasonal_baseline_vs_flat(spark):
    """Daily pattern: hour 3 always runs hot (batch window, 50/hour),
    other hours run 5/hour. On day 8: hour 3 at its usual 50 must NOT
    flag under season=24 (same-phase history expects 50) though the
    FLAT screen would call it a spike; hour 12 at 50 must flag under
    BOTH. Also pins the season validation."""
    counts = []
    for day in range(8):
        for h in range(24):
            if day == 7 and h == 12:
                counts.append(50)          # the real anomaly
            elif h == 3:
                counts.append(50)          # the nightly batch
            else:
                counts.append(5)
    counts = counts[: 7 * 24 + 13]         # stop right after day-8 hour 12
    df = _events(spark, counts)
    seasonal = _flags(
        anomaly_zscore(df, ["k"], "ts", 3600, window=7, min_n=4, season=24)
    )
    flat = _flags(anomaly_zscore(df, ["k"], "ts", 3600, window=24, min_n=8))
    hot_phase = ("a", 7 * 24 + 3)          # day-8 hour 3
    real = ("a", 7 * 24 + 12)              # day-8 hour 12
    assert seasonal[hot_phase][2] is False  # usual nightly spike: quiet
    assert flat[hot_phase][2] is True       # the flat screen false-alarms
    assert seasonal[real][2] is True and flat[real][2] is True
    import pytest

    with pytest.raises(ValueError, match="season"):
        anomaly_zscore(df, ["k"], "ts", 3600, season=1)


def test_anomaly_mad_resists_in_window_flood_masking(spark):
    """The reason the MAD screen exists (Leys et al. 2013): a flood
    INSIDE the trailing window inflates sigma and masks the next flood
    for the z² screen, while the median/MAD statistics shrug it off.
    History: 11 quiet hours (counts 5), one 300-count flood, 12 more
    quiet hours, then a 40-count spike. The trailing-24 window at the
    spike contains the flood: the z² screen stays silent (sigma blown
    up), the MAD screen flags. Also pins the known-answer med/mad and
    the raw Python replay of the lower-median rule."""
    from kafka_workers_spark.operators.drift import anomaly_mad

    counts = [5] * 11 + [300] + [5] * 12 + [40]
    df = _events(spark, counts)
    spike = ("a", len(counts) - 1)
    z = _flags(anomaly_zscore(df, ["k"], "ts", 3600, window=24, min_n=8))
    assert z[spike][2] is False  # masked: the flood inflated sigma
    mad_rows = {
        (r.k, int(r.bucket_start.timestamp() // 3600)): r
        for r in anomaly_mad(df, ["k"], "ts", 3600, window=24, min_n=8,
                             z_num=9, z_den=2).collect()
    }
    base = min(b for _, b in mad_rows)
    r = mad_rows[("a", base + len(counts) - 1)]
    assert r.is_anomaly is True          # robust screen still fires
    # python replay of the trailing stats: 23 fives and one 300
    trail = sorted([5] * 23 + [300])
    med = trail[(len(trail) + 1) // 2 - 1]
    mad = sorted(abs(v - med) for v in trail)[(len(trail) + 1) // 2 - 1]
    assert (r.med, r.mad) == (med, mad) == (5, 0)
    # parameter validation parity with the z² screen
    import pytest

    with pytest.raises(ValueError, match="z_den"):
        anomaly_mad(df, ["k"], "ts", 3600, z_den=0)
    with pytest.raises(ValueError, match="window"):
        anomaly_mad(df, ["k"], "ts", 3600, window=0)


def test_anomaly_mad_median_rule_nonzero_mad(spark):
    """Non-degenerate MAD: history alternating 4s and 10s gives med=4
    (lower median of 12x4+12x10), mad=0... use 11x4+13x10 -> med=10,
    mad=0? Construct a genuinely mixed window: counts cycling 2,4,6
    eight times -> sorted trail has med=4, deviations {2,0,2}*8 ->
    mad=2; a count of 14 fires at 9/2 ((14-4)*2=20 > 9*2=18) while 12
    does not ((12-4)*2=16 < 18) — the exact integer boundary."""
    from kafka_workers_spark.operators.drift import anomaly_mad

    base = [2, 4, 6] * 8
    for probe, want in ((14, True), (12, False)):
        df = _events(spark, base + [probe])
        rows = {
            int(r.bucket_start.timestamp() // 3600): r
            for r in anomaly_mad(df, ["k"], "ts", 3600, window=24, min_n=8,
                                 z_num=9, z_den=2).collect()
        }
        last = rows[max(rows)]
        assert (last.med, last.mad) == (4, 2)
        assert last.is_anomaly is want, (probe, last)


def test_cusum_catches_sustained_shift_missed_by_per_bucket_screens(spark):
    """The CUSUM screen's reason to exist (Page 1954): a +1 sustained
    shift on a baseline alternating 9/10/11 (med=10, mad=1). Per bucket
    the shift is invisible — z² (σ≈0.8, z≈1.2) and MAD ((x−med)·2 = 2 <
    9·mad) never flag ANY bucket — but the shifted drift accumulates
    d = k_den·(x−med) − k_num·mad = 1 per bucket, crossing h·mad·k_den =
    10 at exactly the 11th shifted bucket. The down-arm mirrors it on a
    −1 fade. Warmup rows carry NULL s and false flags."""
    from kafka_workers_spark.operators.drift import anomaly_cusum

    base = [9, 10, 11] * 8
    for shift, flag_col, s_col in ((+1, "is_shift_up", "s_up"),
                                   (-1, "is_shift_dn", "s_dn")):
        counts = base + [10 + shift] * 14
        df = _events(spark, counts)
        # neither per-bucket screen flags anywhere
        z = _flags(anomaly_zscore(df, ["k"], "ts", 3600, window=24, min_n=8))
        assert not any(v[2] for v in z.values())
        from kafka_workers_spark.operators.drift import anomaly_mad

        m = anomaly_mad(df, ["k"], "ts", 3600, window=24, min_n=8,
                        z_num=9, z_den=2)
        assert m.filter("is_anomaly").count() == 0
        out = anomaly_cusum(df, ["k"], "ts", 3600, warmup=24,
                            k_num=1, k_den=2, h_num=5, h_den=1)
        rows = {int(r.bucket_start.timestamp() // 3600): r
                for r in out.collect()}
        lo = min(rows)
        assert (rows[lo].med, rows[lo].mad) == (10, 1)
        # warmup: NULL s, false flags
        assert rows[lo].s_up is None and rows[lo][flag_col] is False
        # the 11th shifted bucket is the first flag; the 10th is not
        first_live = lo + 24
        assert rows[first_live + 10][flag_col] is True
        assert rows[first_live + 9][flag_col] is False
        # s accumulates linearly at 1 per shifted bucket (scaled k_den=2)
        assert rows[first_live + 10][s_col] == 11


def test_cusum_prefix_identity_matches_recursion(spark):
    """Property pin: the windowed prefix-sum form S_t = P_t − min(0,
    min P_i) must equal the textbook max(0, S_{t−1} + d_t) recursion,
    replayed in raw Python over random count sequences (3 keys in one
    frame — the identity must hold per key under partitioning)."""
    import random

    from kafka_workers_spark.operators.drift import anomaly_cusum

    rng = random.Random(14)
    warmup, k_num, k_den, h_num, h_den = 6, 1, 2, 5, 1
    seqs = {
        f"k{i}": [rng.randrange(0, 20) for _ in range(warmup + rng.randrange(5, 25))]
        for i in range(3)
    }
    rows = []
    for key, counts in seqs.items():
        for h, c in enumerate(counts):
            for i in range(c):
                rows.append((key, T0 + timedelta(hours=h, seconds=i)))
    # NOTE: zero-count hours are genuine gaps here; the operator's grid
    # starts at each key's first NONEMPTY bucket, so replay from the
    # first nonzero count
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    epoch0 = int(T0.timestamp() // 3600)  # fixture hour 0 in epoch hours
    got = {
        (r.k, int(r.bucket_start.timestamp() // 3600) - epoch0): (
            r.med, r.mad, r.s_up, r.s_dn, r.is_shift_up, r.is_shift_dn)
        for r in anomaly_cusum(df, ["k"], "ts", 3600, warmup=warmup,
                               k_num=k_num, k_den=k_den,
                               h_num=h_num, h_den=h_den).collect()
    }
    for key, counts in seqs.items():
        first = next(i for i, c in enumerate(counts) if c > 0)
        last = max(i for i, c in enumerate(counts) if c > 0)
        grid = counts[first:last + 1]
        warm = grid[:warmup]
        srt = sorted(warm)
        i1 = (len(srt) + 1) // 2 - 1
        med = srt[i1]
        mad = sorted(abs(v - med) for v in warm)[i1]
        su = sd = 0
        for t, x in enumerate(grid):
            want_key = (key, first + t)
            if t < warmup:
                assert got[want_key] == (med, mad, None, None, False, False), want_key
                continue
            su = max(0, su + k_den * (x - med) - k_num * mad)
            sd = max(0, sd + k_den * (med - x) - k_num * mad)
            if mad > 0:
                up = su * h_den > h_num * mad * k_den
                dn = sd * h_den > h_num * mad * k_den
            else:
                up, dn = su > 0, sd > 0
            assert got[want_key] == (med, mad, su, sd, up, dn), want_key


def test_cusum_validates_params(spark):
    from kafka_workers_spark.operators.drift import anomaly_cusum

    df = _events(spark, [1, 1, 1])
    with pytest.raises(ValueError, match="warmup"):
        anomaly_cusum(df, ["k"], "ts", 3600, warmup=1)
    with pytest.raises(ValueError, match="allowance"):
        anomaly_cusum(df, ["k"], "ts", 3600, k_num=-1)
    with pytest.raises(ValueError, match="allowance"):
        anomaly_cusum(df, ["k"], "ts", 3600, k_den=0)
    with pytest.raises(ValueError, match="threshold"):
        anomaly_cusum(df, ["k"], "ts", 3600, h_num=0)


def test_gap_fill_max_gap_buckets_guard(spark):
    """VERDICT r14 #4: a key silent past the bound raises in-plan (the
    overflow-guard style) instead of exploding an unbounded run of
    synthetic zero rows — here a YEAR-silent key on hourly buckets.
    Within the bound (and with the default None) behavior is unchanged."""
    from datetime import timedelta

    from kafka_workers_spark.operators.relational import gap_fill

    year_silent = spark.createDataFrame(
        [("a", T0), ("a", T0 + timedelta(hours=365 * 24))],
        "k string, ts timestamp",
    )
    with pytest.raises(Exception, match="max_gap_buckets"):
        gap_fill(year_silent, ["k"], "ts", 3600, max_gap_buckets=1000).collect()
    # default None: the year of zeros IS the requested grid
    assert gap_fill(year_silent, ["k"], "ts", 3600).count() == 365 * 24 + 1
    # a gap within the bound passes and still zero-fills
    ok = spark.createDataFrame(
        [("a", T0), ("a", T0 + timedelta(hours=5))], "k string, ts timestamp"
    )
    out = gap_fill(ok, ["k"], "ts", 3600, max_gap_buckets=10)
    assert out.count() == 6 and out.filter("n_rows = 0").count() == 4
    with pytest.raises(ValueError, match="max_gap_buckets"):
        gap_fill(ok, ["k"], "ts", 3600, max_gap_buckets=0)


def test_drift_screens_pass_gap_bound_through(spark):
    """The three batch screens forward max_gap_buckets to gap_fill: the
    year-silent key raises through every arm; the bounded-but-legal
    fixture is unchanged vs the unbounded plan."""
    from datetime import timedelta

    from kafka_workers_spark.operators.drift import anomaly_cusum, anomaly_mad

    year_silent = spark.createDataFrame(
        [("a", T0 + timedelta(hours=h), h) for h in range(8)]
        + [("a", T0 + timedelta(hours=365 * 24), 99)],
        "k string, ts timestamp, event_id long",
    )
    for call in (
        lambda: anomaly_zscore(
            year_silent, ["k"], "ts", 3600, window=4, min_n=2,
            max_gap_buckets=1000,
        ),
        lambda: anomaly_mad(
            year_silent, ["k"], "ts", 3600, window=4, min_n=2,
            max_gap_buckets=1000,
        ),
        lambda: anomaly_cusum(
            year_silent, ["k"], "ts", 3600, warmup=4, max_gap_buckets=1000,
        ),
    ):
        with pytest.raises(Exception, match="max_gap_buckets"):
            call().collect()
    # a legal gap: bounded plan == unbounded plan
    ev = _events(spark, [5, 5, 0, 0, 5, 5, 30, 5])
    bounded = anomaly_zscore(ev, ["k"], "ts", 3600, window=4, min_n=2,
                             max_gap_buckets=10)
    free = anomaly_zscore(ev, ["k"], "ts", 3600, window=4, min_n=2)
    assert sorted(map(tuple, bounded.collect())) == sorted(
        map(tuple, free.collect())
    )
