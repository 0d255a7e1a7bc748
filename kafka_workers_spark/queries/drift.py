"""Drift / anomaly queries (operators/drift.py): rolling z-score volume
spikes, PSI between order-date halves, and per-source KL against the
corpus unigram mixture. All three oracles are rendered from the SAME
constants as the Spark plans (scales, bin counts, split dates) so the
two sides cannot desync — the sql_minhash_signature pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_workers_spark.operators.drift import LOG_SCALE
from kafka_workers_spark.operators.text import sql_normalized
from kafka_workers_spark.queries import register
from kafka_workers_spark.sources.files import load_table

_AZ_BUCKET_S = 3600
_AZ_BUCKET_US = _AZ_BUCKET_S * 1_000_000
_AZ_WINDOW = 24
_AZ_MIN_N = 8
_AZ_Z = 3  # z_den = 1


def _sql_anomaly_zscore(window: int, min_n: int, phase_sql: str = "") -> str:
    """Shared oracle renderer for the flat and seasonal z² screens —
    one SQL body, parameterized by (window, min_n, phase partition), so
    a fix to the bucket math or the predicate can never desync the two
    (the _sql_kcore_ctes discipline; review r12). ``phase_sql`` is an
    extra PARTITION BY term ('' = flat)."""
    part = f"event_type{phase_sql}"
    return f"""
    WITH per AS (
      SELECT event_type,
             (epoch_us(ts) - ((epoch_us(ts) % {_AZ_BUCKET_US})
                              + {_AZ_BUCKET_US}) % {_AZ_BUCKET_US})
               // {_AZ_BUCKET_US} AS bkt,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT event_type, MIN(bkt) AS lo, MAX(bkt) AS hi FROM per GROUP BY 1
    ), grid AS (
      SELECT event_type, UNNEST(generate_series(lo, hi)) AS bkt FROM span
    ), g AS (
      SELECT grid.event_type, grid.bkt, CAST(COALESCE(per.c, 0) AS BIGINT) AS x
      FROM grid LEFT JOIN per
        ON per.event_type = grid.event_type AND per.bkt = grid.bkt
    ), w AS (
      SELECT event_type, bkt, x,
             CAST(COUNT(*) OVER f AS BIGINT) AS n,
             CAST(COALESCE(SUM(x) OVER f, 0) AS BIGINT) AS s,
             CAST(COALESCE(SUM(x * x) OVER f, 0) AS BIGINT) AS q
      FROM g
      WINDOW f AS (PARTITION BY {part} ORDER BY bkt
                   ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           make_timestamp(bkt * {_AZ_BUCKET_US}) AS bucket_start,
           x AS n_events,
           n AS n_window,
           CAST(n * x - s AS BIGINT) AS dev_num,
           CAST(n * q - s * s AS BIGINT) AS var_num,
           (n >= {min_n} AND (n * x - s) > 0
            AND (n * q - s * s = 0
                 OR (n * x - s) * (n * x - s) > {_AZ_Z * _AZ_Z} * (n * q - s * s)))
             AS is_anomaly
    FROM w
    """


@register(
    "events_anomaly_zscore",
    _sql_anomaly_zscore(_AZ_WINDOW, _AZ_MIN_N),
    category="drift",
    windowed=False,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score volume-spike screen (operators.drift.anomaly_zscore):
    hourly per-event-type counts on the gap-filled grid, flagged when a
    bucket sits more than 3 population standard deviations above the
    trailing 24-bucket mean — the z² test as a pure BIGINT predicate
    (no sqrt, no division, no floats; the agg_percentile_disc school of
    exactness applied to second moments). Silent hours count 0 — a flood
    after a quiet day flags; a missing-row grid would hide it."""
    from kafka_workers_spark.operators.drift import anomaly_zscore

    ev = load_table(spark, sf_dir, "events")
    return anomaly_zscore(
        ev,
        ["event_type"],
        "ts",
        bucket_seconds=_AZ_BUCKET_S,
        window=_AZ_WINDOW,
        min_n=_AZ_MIN_N,
        z_num=_AZ_Z,
        z_den=1,
    )


_PSI_BINS = 10
_PSI_SPLIT = "1995-06-01"
_PSI_EDGE_SQL = ", ".join(
    f"MIN(CASE WHEN rn = ({i} * n + {_PSI_BINS - 1}) // {_PSI_BINS} THEN v END)"
    for i in range(1, _PSI_BINS)
)


@register(
    "quality_psi_drift",
    f"""
    WITH t AS (
      SELECT o_orderpriority AS grp, o_totalprice AS v,
             CASE WHEN o_orderdate < DATE '{_PSI_SPLIT}' THEN 'ref' ELSE 'cur' END AS side
      FROM orders
    ), ranked AS (
      SELECT grp, v,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM t WHERE side = 'ref'
    ), edges AS (
      SELECT grp, [{_PSI_EDGE_SQL}] AS es FROM ranked GROUP BY grp
    ), binned AS (
      SELECT t.grp, t.side,
             CAST(len(list_filter(es, e -> t.v > e)) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM t JOIN edges ON t.grp = edges.grp
      GROUP BY 1, 2, 3
    ), grid AS (
      SELECT grp, UNNEST(generate_series(0, {_PSI_BINS - 1})) AS bin
      FROM (SELECT DISTINCT grp FROM t)
    ), counts AS (
      SELECT g.grp, g.bin,
             CAST(COALESCE(r.c, 0) AS BIGINT) AS n_ref,
             CAST(COALESCE(cu.c, 0) AS BIGINT) AS n_cur
      FROM grid g
      LEFT JOIN (SELECT grp, bin, c FROM binned WHERE side = 'ref') r
        ON r.grp = g.grp AND r.bin = g.bin
      LEFT JOIN (SELECT grp, bin, c FROM binned WHERE side = 'cur') cu
        ON cu.grp = g.grp AND cu.bin = g.bin
    ), tot AS (
      SELECT grp, SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM counts GROUP BY 1
    ), terms AS (
      SELECT c.grp, c.bin, c.n_ref, c.n_cur,
             CAST(c.n_cur + 1 AS DOUBLE) / CAST(t.tc + {_PSI_BINS} AS DOUBLE) AS pc,
             CAST(c.n_ref + 1 AS DOUBLE) / CAST(t.tr + {_PSI_BINS} AS DOUBLE) AS pr
      FROM counts c JOIN tot t ON c.grp = t.grp
    ), quant AS (
      SELECT grp, bin, n_ref, n_cur,
             CAST(floor({LOG_SCALE}.0 * ln(pc / pr)) AS BIGINT) AS l6,
             CAST(floor(((pc - pr)
                         * CAST(CAST(floor({LOG_SCALE}.0 * ln(pc / pr)) AS BIGINT) AS DOUBLE))
                        * {LOG_SCALE}.0) AS BIGINT) AS term12
      FROM terms
    )
    SELECT grp, bin, n_ref, n_cur, l6, term12,
           CAST(SUM(term12) OVER (PARTITION BY grp) AS BIGINT) AS psi12
    FROM quant
    """,
    category="drift",
    windowed=False,
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift screen (operators.drift.psi_drift): o_totalprice
    distribution per order priority, pre- vs post-{split} orders, over
    exact rank-selected decile edges of the reference half. The single
    libm ln() is quantized to BIGINT at 1e6 BEFORE any arithmetic; the
    per-bin term and the per-group psi12 total (PSI·1e12) are exact
    integer sums — the driver's value-hash sees no raw transcendental."""
    from kafka_workers_spark.operators.drift import psi_drift

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("date"), "ref")
        .otherwise("cur")
        .alias("side"),
    )
    return psi_drift(o, "grp", "v", "side", n_bins=_PSI_BINS)


_KL_V = 256


@register(
    "corpus_kl_mixture",
    f"""
    WITH toked AS (
      SELECT source, UNNEST(string_split({sql_normalized("text")}, ' ')) AS term
      FROM documents
    ), tok AS (
      SELECT source, term FROM toked WHERE length(term) > 0
    ), gcnt AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS g_cnt FROM tok GROUP BY 1
    ), vocab AS (
      SELECT term, g_cnt FROM gcnt ORDER BY g_cnt DESC, term ASC LIMIT {_KL_V}
    ), scnt AS (
      SELECT source, tok.term, CAST(COUNT(*) AS BIGINT) AS s_cnt
      FROM tok JOIN vocab ON tok.term = vocab.term GROUP BY 1, 2
    ), nd AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
    ), cells AS (
      SELECT g.source, g.term, g.g_cnt, CAST(COALESCE(s.s_cnt, 0) AS BIGINT) AS s_cnt
      FROM (SELECT nd.source, vocab.term, vocab.g_cnt FROM nd CROSS JOIN vocab) g
      LEFT JOIN scnt s ON s.source = g.source AND s.term = g.term
    ), tots AS (
      SELECT source, CAST(SUM(s_cnt) AS BIGINT) AS vocab_tokens FROM cells GROUP BY 1
    ), gtot AS (
      SELECT CAST(SUM(g_cnt) AS BIGINT) AS gt, CAST(COUNT(*) AS BIGINT) AS vs
      FROM vocab
    ), probs AS (
      SELECT c.source,
             CAST(c.s_cnt + 1 AS DOUBLE) / CAST(t.vocab_tokens + g.vs AS DOUBLE) AS p,
             CAST(c.g_cnt + 1 AS DOUBLE) / CAST(g.gt + g.vs AS DOUBLE) AS q
      FROM cells c JOIN tots t ON c.source = t.source CROSS JOIN gtot g
    ), k AS (
      SELECT source,
             CAST(SUM(CAST(floor((p * CAST(CAST(floor({LOG_SCALE}.0 * ln(p / q)) AS BIGINT)
                                       AS DOUBLE))
                                 * {LOG_SCALE}.0) AS BIGINT)) AS BIGINT) AS kl12
      FROM probs GROUP BY 1
    )
    SELECT nd.source, nd.n_docs, tots.vocab_tokens, k.kl12
    FROM nd JOIN tots ON nd.source = tots.source JOIN k ON nd.source = k.source
    """,
    category="drift",
    windowed=False,
)
def corpus_kl_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence vs the corpus unigram mixture
    (operators.drift.kl_mixture — the DoReMi/CCNet source-weighting
    diagnostic, arXiv:2305.10429): shared top-256 vocabulary by exact
    distributed top-k, Laplace-smoothed over the REALIZED vocab size
    (the synthetic corpus has fewer distinct tokens than 256; smoothing
    by the requested cap would denormalize both distributions and void
    Gibbs' KL ≥ 0), KL·1e12 as an exact BIGINT sum with ln() quantized
    first. A boilerplate-flooded or truncated source shows up as a KL
    outlier before it pollutes the next training mixture."""
    from kafka_workers_spark.operators.drift import kl_mixture

    d = load_table(spark, sf_dir, "documents")
    return kl_mixture(d, group_col="source", text_col="text", top_v=_KL_V)


_SA_WINDOW = 7  # trailing same-phase days
_SA_MIN_N = 4
_SA_SEASON = 24


@register(
    "events_seasonal_anomaly",
    _sql_anomaly_zscore(
        _SA_WINDOW,
        _SA_MIN_N,
        phase_sql=f", ((bkt % {_SA_SEASON}) + {_SA_SEASON}) % {_SA_SEASON}",
    ),
    category="drift",
    windowed=False,
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal volume-spike screen (operators.drift.anomaly_zscore with
    season=24): each hourly bucket is tested against the SAME HOUR of
    the trailing {w} days, not the trailing {w} hours — the
    daily-seasonality baseline that stops a nightly batch window from
    flagging and still catches a flood during the quiet hour. Same
    pure-BIGINT z² predicate; the phase is exact integer bucket
    arithmetic (pmod of the bucket index) on both engines."""
    from kafka_workers_spark.operators.drift import anomaly_zscore

    ev = load_table(spark, sf_dir, "events")
    return anomaly_zscore(
        ev,
        ["event_type"],
        "ts",
        bucket_seconds=_AZ_BUCKET_S,
        window=_SA_WINDOW,
        min_n=_SA_MIN_N,
        z_num=_AZ_Z,
        z_den=1,
        season=_SA_SEASON,
    )


@register(
    "stream_anomaly_seasonal",
    f"""
    WITH base AS ({_sql_anomaly_zscore(
        _SA_WINDOW,
        _SA_MIN_N,
        phase_sql=f", ((bkt % {_SA_SEASON}) + {_SA_SEASON}) % {_SA_SEASON}",
    )})
    SELECT event_type, bucket_start, n_events, n_window,
           dev_num, var_num, is_anomaly
    FROM (
      SELECT *, MAX(bucket_start) OVER (PARTITION BY event_type) AS __mx
      FROM base
    ) WHERE bucket_start < __mx
    """,
    category="drift",
    windowed=False,  # new round 15 — EXTRA until rotated in
)
def stream_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_seasonal_anomaly computed through the WorkerTask state
    machine (streaming/drift.py seasonal_tasks_batch — VERDICT r14 #3):
    the carried ring holds window·season closed counts and the stats
    plug-in strides it at ``season``, so buf[-season] is exactly the
    same-phase previous bucket on the dense grid — the phase-sliced
    frame of the relational plan as a stride over ONE ring, no second
    data structure. Completes the trio discipline for the seasonal arm:
    the oracle composes the registered seasonal SQL with the stream's
    one documented divergence (each key's final bucket never closes);
    the LIVE micro-batch form — with the season boundary split across
    batches — is pinned equal in tests/test_drift_stream.py."""
    from kafka_workers_spark.streaming.drift import seasonal_tasks_batch

    ev = load_table(spark, sf_dir, "events")
    return seasonal_tasks_batch(
        ev,
        ["event_type"],
        "ts",
        tiebreak_col="event_id",
        bucket_seconds=_AZ_BUCKET_S,
        window=_SA_WINDOW,
        min_n=_SA_MIN_N,
        z_num=_AZ_Z,
        z_den=1,
        season=_SA_SEASON,
    )


@register(
    "stream_anomaly_zscore",
    f"""
    WITH base AS ({_sql_anomaly_zscore(_AZ_WINDOW, _AZ_MIN_N)})
    SELECT event_type, bucket_start, n_events, n_window,
           dev_num, var_num, is_anomaly
    FROM (
      SELECT *, MAX(bucket_start) OVER (PARTITION BY event_type) AS __mx
      FROM base
    ) WHERE bucket_start < __mx
    """,
    category="drift",
    windowed=False,  # new round 13 — EXTRA until rotated in
)
def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_anomaly_zscore computed through the WorkerTask state
    machine instead of the gap-fill + window (streaming/drift.py
    anomaly_tasks_batch — per-key carried ring of trailing bucket
    counts, replayed over full history via applyInPandas): the
    imperative per-key task vs the relational grid, ONE oracle — the
    markov/funnel cross-plan pattern applied to the drift family. The
    oracle composes the registered flat-arm SQL with the stream's one
    documented divergence (each key's final bucket never closes, so it
    never emits); the LIVE streaming form of the same task — including
    a bucket and its gap zeros split across micro-batches — is pinned
    equal in tests/test_drift_stream.py."""
    from kafka_workers_spark.streaming.drift import anomaly_tasks_batch

    ev = load_table(spark, sf_dir, "events")
    return anomaly_tasks_batch(
        ev,
        ["event_type"],
        "ts",
        tiebreak_col="event_id",
        bucket_seconds=_AZ_BUCKET_S,
        window=_AZ_WINDOW,
        min_n=_AZ_MIN_N,
        z_num=_AZ_Z,
        z_den=1,
    )


# MAD threshold as an exact rational: the Gaussian consistency constant
# is sigma ~= 1.4826 * MAD, so the 3-sigma-equivalent robust cut is
# ~4.45 * MAD — carried as 9/2 (integer comparison, no floats). Raw
# 3 * MAD would re-flag ~24% of grid buckets on this corpus (MAD
# understates spread on skewed discrete counts); 9/2 puts the robust
# screen on the same sensitivity scale as the z² screen while keeping
# its in-window breakdown resistance.
_MAD_Z_NUM, _MAD_Z_DEN = 9, 2

# shared oracle body for the batch AND streaming MAD screens (the
# _sql_anomaly_zscore pattern: one renderer, two registrations, no way
# to desync the predicate between them)
_SQL_ANOMALY_MAD = f"""
    WITH per AS (
      SELECT event_type,
             (epoch_us(ts) - ((epoch_us(ts) % {_AZ_BUCKET_US})
                              + {_AZ_BUCKET_US}) % {_AZ_BUCKET_US})
               // {_AZ_BUCKET_US} AS bkt,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT event_type, MIN(bkt) AS lo, MAX(bkt) AS hi FROM per GROUP BY 1
    ), grid AS (
      SELECT event_type, UNNEST(generate_series(lo, hi)) AS bkt FROM span
    ), g AS (
      SELECT grid.event_type, grid.bkt, CAST(COALESCE(per.c, 0) AS BIGINT) AS x
      FROM grid LEFT JOIN per
        ON per.event_type = grid.event_type AND per.bkt = grid.bkt
    ), w AS (
      SELECT event_type, bkt, x,
             list_sort(list(x) OVER f) AS arr
      FROM g
      WINDOW f AS (PARTITION BY event_type ORDER BY bkt
                   ROWS BETWEEN {_AZ_WINDOW} PRECEDING AND 1 PRECEDING)
    ), m AS (
      SELECT event_type, bkt, x, arr,
             -- an empty trailing frame yields a NULL list in DuckDB
             -- (Spark's collect_list yields []): coalesce n to 0
             CAST(COALESCE(len(arr), 0) AS BIGINT) AS n,
             CAST(arr[(len(arr) + 1) // 2] AS BIGINT) AS med
      FROM w
    )
    SELECT event_type,
           make_timestamp(bkt * {_AZ_BUCKET_US}) AS bucket_start,
           x AS n_events,
           n AS n_window,
           med,
           CAST(list_sort([abs(v - med) FOR v IN arr])[(len(arr) + 1) // 2]
                AS BIGINT) AS mad,
           CASE WHEN n > 0 THEN
             (n >= {_AZ_MIN_N} AND (x - med) > 0
              AND (x - med) * {_MAD_Z_DEN} > {_MAD_Z_NUM} *
                  list_sort([abs(v - med) FOR v IN arr])[(len(arr) + 1) // 2])
           ELSE FALSE END AS is_anomaly
    FROM m
"""


@register(
    "events_anomaly_mad",
    _SQL_ANOMALY_MAD,
    category="drift",
    # rotated IN round 14 (VERDICT r13 #1): the robust screen joins the
    # driver window alongside its new live arm
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust median/MAD volume-spike screen
    (operators.drift.anomaly_mad — Leys et al. 2013): the
    outlier-resistant sibling of events_anomaly_zscore on the same
    gap-filled hourly grid. Where a flood INSIDE the trailing window
    inflates σ and masks the next flood (the mean/σ screen's ~25%
    breakdown point), the median and the median absolute deviation
    tolerate up to half the window being junk. Pure int64 comparisons on
    exact counts (no squares, so no overflow guard needed at any
    realistic count); 'lower median' = element ⌈n/2⌉ of the ascending
    sort, replayed verbatim by the oracle's list_sort indexing."""
    from kafka_workers_spark.operators.drift import anomaly_mad

    ev = load_table(spark, sf_dir, "events")
    return anomaly_mad(
        ev,
        ["event_type"],
        "ts",
        bucket_seconds=_AZ_BUCKET_S,
        window=_AZ_WINDOW,
        min_n=_AZ_MIN_N,
        z_num=_MAD_Z_NUM,
        z_den=_MAD_Z_DEN,
    )


@register(
    "stream_anomaly_mad",
    f"""
    WITH base AS ({_SQL_ANOMALY_MAD})
    SELECT event_type, bucket_start, n_events, n_window,
           med, mad, is_anomaly
    FROM (
      SELECT *, MAX(bucket_start) OVER (PARTITION BY event_type) AS __mx
      FROM base
    ) WHERE bucket_start < __mx
    """,
    category="drift",
    windowed=False,  # new round 14 — EXTRA until rotated in
)
def stream_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_anomaly_mad computed through the WorkerTask state machine
    (streaming/drift.py mad_tasks_batch — the carried trailing-count
    ring, replayed over full history via applyInPandas): the robust
    screen's LIVE arm under the z² trio discipline (VERDICT r13 #2 —
    the screen's whole point is floods, and floods arrive on the
    stream). Oracle composes the registered batch-arm SQL with the one
    documented stream divergence (each key's final bucket never closes,
    so it never emits); the live micro-batch form — including the
    masking fixture where an in-window flood silences z² but not MAD —
    is pinned equal in tests/test_drift_stream.py."""
    from kafka_workers_spark.streaming.drift import mad_tasks_batch

    ev = load_table(spark, sf_dir, "events")
    return mad_tasks_batch(
        ev,
        ["event_type"],
        "ts",
        tiebreak_col="event_id",
        bucket_seconds=_AZ_BUCKET_S,
        window=_AZ_WINDOW,
        min_n=_AZ_MIN_N,
        z_num=_MAD_Z_NUM,
        z_den=_MAD_Z_DEN,
    )


# CUSUM parameters: 24-bucket phase-I reference; allowance k = MAD/2
# (drift smaller than half the routine spread accrues nothing — the
# standard half-sigma allowance transplanted to the robust scale);
# threshold h = 5·MAD (the SPC h=5σ convention, robust-scaled).
_CU_WARMUP = 24
_CU_K_NUM, _CU_K_DEN = 1, 2
_CU_H_NUM, _CU_H_DEN = 5, 1

_SQL_CUSUM = f"""
    WITH per AS (
      SELECT event_type,
             (epoch_us(ts) - ((epoch_us(ts) % {_AZ_BUCKET_US})
                              + {_AZ_BUCKET_US}) % {_AZ_BUCKET_US})
               // {_AZ_BUCKET_US} AS bkt,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT event_type, MIN(bkt) AS lo, MAX(bkt) AS hi FROM per GROUP BY 1
    ), grid AS (
      SELECT event_type, UNNEST(generate_series(lo, hi)) AS bkt FROM span
    ), g AS (
      SELECT grid.event_type, grid.bkt,
             CAST(COALESCE(per.c, 0) AS BIGINT) AS x,
             ROW_NUMBER() OVER (PARTITION BY grid.event_type
                                ORDER BY grid.bkt) AS rn
      FROM grid LEFT JOIN per
        ON per.event_type = grid.event_type AND per.bkt = grid.bkt
    ), warm AS (
      SELECT event_type, list_sort(list(x)) AS arr
      FROM g WHERE rn <= {_CU_WARMUP} GROUP BY 1
    ), ref0 AS (
      SELECT event_type, arr,
             CAST(arr[(len(arr) + 1) // 2] AS BIGINT) AS med
      FROM warm
    ), ref AS (
      SELECT event_type, med,
             CAST(list_sort([abs(v - med) FOR v IN arr])[(len(arr) + 1) // 2]
                  AS BIGINT) AS mad
      FROM ref0
    ), d AS (
      SELECT g.event_type, bkt, x, rn, med, mad,
             CASE WHEN rn > {_CU_WARMUP}
                  THEN {_CU_K_DEN} * (x - med) - {_CU_K_NUM} * mad
                  ELSE 0 END AS d_up,
             CASE WHEN rn > {_CU_WARMUP}
                  THEN {_CU_K_DEN} * (med - x) - {_CU_K_NUM} * mad
                  ELSE 0 END AS d_dn
      FROM g JOIN ref ON g.event_type = ref.event_type
    ), cum AS (
      SELECT *, CAST(SUM(d_up) OVER w AS BIGINT) AS pu,
                CAST(SUM(d_dn) OVER w AS BIGINT) AS pd
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s AS (
      SELECT *, CAST(pu - LEAST(0, MIN(pu) OVER w) AS BIGINT) AS su,
                CAST(pd - LEAST(0, MIN(pd) OVER w) AS BIGINT) AS sd
      FROM cum
      WINDOW w AS (PARTITION BY event_type ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           make_timestamp(bkt * {_AZ_BUCKET_US}) AS bucket_start,
           x AS n_events, med, mad,
           CASE WHEN rn > {_CU_WARMUP} THEN su END AS s_up,
           CASE WHEN rn > {_CU_WARMUP} THEN sd END AS s_dn,
           CASE WHEN rn > {_CU_WARMUP} THEN
             CASE WHEN mad > 0
                  THEN su * {_CU_H_DEN} > {_CU_H_NUM} * mad * {_CU_K_DEN}
                  ELSE su > 0 END
           ELSE FALSE END AS is_shift_up,
           CASE WHEN rn > {_CU_WARMUP} THEN
             CASE WHEN mad > 0
                  THEN sd * {_CU_H_DEN} > {_CU_H_NUM} * mad * {_CU_K_DEN}
                  ELSE sd > 0 END
           ELSE FALSE END AS is_shift_dn
    FROM s
"""


@register(
    "events_cusum_shift",
    _SQL_CUSUM,
    category="drift",
    # rotated IN round 15 (VERDICT r14 #1): the family's only
    # sustained-shift screen enters the driver window
)
def events_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM mean-shift screen (operators.drift.anomaly_cusum
    — Page 1954): the drift family's third failure mode. The z² and MAD
    screens test each hourly bucket in isolation, so a source that
    silently drifts +40% AND STAYS THERE never flags (every bucket is
    individually unremarkable and the rolling baseline adapts within one
    window); CUSUM accumulates the drift against a phase-I robust
    reference (med/MAD of the first 24 buckets) and the down-arm
    symmetrically catches a source quietly fading out. Pure BIGINT via
    the prefix-sum identity S_t = P_t - min(0, min P_i) — the max(0,·)
    recursion as two stacked window aggregates over one shuffle, no
    loop, no UDF."""
    from kafka_workers_spark.operators.drift import anomaly_cusum

    ev = load_table(spark, sf_dir, "events")
    return anomaly_cusum(
        ev,
        ["event_type"],
        "ts",
        bucket_seconds=_AZ_BUCKET_S,
        warmup=_CU_WARMUP,
        k_num=_CU_K_NUM,
        k_den=_CU_K_DEN,
        h_num=_CU_H_NUM,
        h_den=_CU_H_DEN,
    )


@register(
    "stream_cusum_shift",
    f"""
    WITH base AS ({_SQL_CUSUM})
    SELECT event_type, bucket_start, n_events, med, mad,
           s_up, s_dn, is_shift_up, is_shift_dn
    FROM (
      SELECT *, MAX(bucket_start) OVER (PARTITION BY event_type) AS __mx,
             COUNT(*) OVER (PARTITION BY event_type) AS __nb
      FROM base
    ) WHERE bucket_start < __mx AND __nb >= {_CU_WARMUP + 1}
    """,
    category="drift",
    windowed=False,  # new round 14 — EXTRA until rotated in
)
def stream_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_cusum_shift computed through the WorkerTask state machine
    (streaming/drift.py cusum_tasks_batch — four carried longs per key
    in phase II, phase-I rows buffered until the robust reference
    freezes): the sequential screen's LIVE arm, completing the trio
    discipline for all three drift failure modes (spike / masked spike /
    sustained shift). Oracle composes the registered batch-arm SQL with
    the stream's two documented divergences: each key's final bucket
    never closes, and a key whose warmup never completes has emitted
    nothing (the phase-I buffer only flushes when the reference
    freezes). Live micro-batch form — including a warmup that completes
    MID-stream and a shift split across batches — pinned equal in
    tests/test_drift_stream.py."""
    from kafka_workers_spark.streaming.drift import cusum_tasks_batch

    ev = load_table(spark, sf_dir, "events")
    return cusum_tasks_batch(
        ev,
        ["event_type"],
        "ts",
        tiebreak_col="event_id",
        bucket_seconds=_AZ_BUCKET_S,
        warmup=_CU_WARMUP,
        k_num=_CU_K_NUM,
        k_den=_CU_K_DEN,
        h_num=_CU_H_NUM,
        h_den=_CU_H_DEN,
    )
