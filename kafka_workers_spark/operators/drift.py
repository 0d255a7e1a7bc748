"""Distribution-drift and anomaly screens for a continuously-ingesting
corpus: rolling z-score spike detection, the robust median/MAD sibling,
two-sided CUSUM mean-shift detection (the sequential screen for small
SUSTAINED shifts both per-bucket tests miss), PSI (population stability
index) between a reference and a current population, and per-source KL
divergence against the corpus unigram mixture (the DoReMi/CCNet-style
source-weighting diagnostic).

The reference engine has no statistics surface at all (payloads are
opaque bytes, api/record/WorkerRecord.java) — this module is engine
extension, same class as the dedup family: the screens a 100 TB training
-data pipeline runs per ingest batch to catch a broken upstream source
BEFORE it contaminates a mixture.

Cross-engine exactness discipline (the repo rule every oracle-checked
operator follows):

- Rolling z-score: NO sqrt, NO division — the flag is the integer
  predicate ``dev² · z_den² > z_num² · (n·Σx² − (Σx)²)`` with
  ``dev = n·x − Σx``, all BIGINT (z² = dev²/(n·Σx²−(Σx)²) exactly).
- PSI / KL: the only transcendental, ``ln``, is libm and NOT
  bit-reproducible across engines — it is quantized FIRST
  (``floor(1e6·ln(ratio))`` → BIGINT, the text_tfidf_topk discipline);
  everything after is exactly-rounded IEEE arithmetic on exact inputs,
  floored to BIGINT terms whose SUM is associative and
  partition-order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_workers_spark.operators.relational import gap_fill

#: ln() quantization scale shared by psi_drift / kl_mixture and their
#: SQL twins — render oracles FROM this constant so the two sides can
#: never desync (the sql_minhash_signature pattern).
LOG_SCALE = 1_000_000


def anomaly_zscore(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    bucket_seconds: int = 3600,
    window: int = 24,
    min_n: int = 8,
    z_num: int = 3,
    z_den: int = 1,
    season: int | None = None,
    max_gap_buckets: int | None = None,
) -> DataFrame:
    """Per-key volume-spike detection: bucket counts on a GAP-FILLED
    grid (silent buckets count 0 — absence is evidence, not a missing
    row), then flag buckets whose count sits more than ``z_num/z_den``
    population standard deviations ABOVE the mean of the trailing
    ``window`` buckets.

    The z² comparison is pure BIGINT: with n, Σx, Σx² over the trailing
    frame and dev = n·x − Σx,

        z² = dev² / (n·Σx² − (Σx)²)        (exactly — no n missing:
        (x−μ)² / σ²_pop = ((n·x−Σx)/n)² · n²/(n·Σx²−(Σx)²))

    so the flag is ``dev > 0 AND dev²·z_den² > z_num²·(n·Σx²−(Σx)²)``,
    with a zero-variance history flagging any strictly-higher count
    (z = ∞). No sqrt, no division, no floats — bit-identical on any
    engine with 64-bit integers. Overflow bound (ADVICE r12 #1 — the
    tight term is ``z_num²·var_num ≤ z_num²·window²·max_cnt²``, not
    dev² alone): ``window · max_cnt · max(z_num, z_den) ≤ ⌊√(2⁶³−1)⌋ =
    3 037 000 499`` must hold, i.e. max per-bucket count ≲ 4.2·10⁷ at
    window=24, z=3 — pre-aggregate coarser buckets first if a source
    runs hotter. The bound is ENFORCED in-plan: an ``assert_true`` rides
    the emitted columns, so a too-hot bucket raises at runtime instead
    of wrapping silently under non-ANSI arithmetic. Two hardenings
    (ADVICE r13 #1): the guard tests the MAX over the trailing frame as
    well as the row's own count — a hot bucket contaminates the window
    sums (Σx, Σx²) of its ``window`` FOLLOWERS, so those rows must raise
    too even when a pushed-down filter drops the hot row itself — and it
    anchors on ``dev_num``/``var_num``/``is_anomaly`` alike, so a
    consumer projecting only the numerators cannot read a silently
    wrapped value.

    Emits EVERY grid bucket: ``(key_cols..., bucket_start, n_events,
    n_window, dev_num, var_num, is_anomaly)`` — n_window < min_n rows
    carry ``is_anomaly = false`` (warmup, not evidence).

    ``season`` turns the screen SEASONAL: the trailing frame holds only
    buckets at the same phase (``bucket_index % season`` — e.g. season=24
    on hourly buckets compares 3 a.m. against the PREVIOUS DAYS' 3 a.m.,
    so a nightly batch spike stops tripping the flat baseline and a
    flood during the quiet hour still does). The frame stays rows-bounded
    because the phase grid is as dense as the full grid, one row per
    season step.

    Scale shape: rides :func:`gap_fill` (hash aggregate + bucket-index
    grid, payload-free), then ONE window shuffle on the keys; the frame
    is rows-bounded on the dense grid so ROWS == RANGE and state is
    O(window) per key.

    ``max_gap_buckets`` bounds the largest back-filled silent run per key
    (raises past it — see :func:`~kafka_workers_spark.operators.relational.
    gap_fill`); None (default) keeps absence-is-evidence semantics.
    """
    if window < 1:
        raise ValueError(f"window ({window}) must be >= 1")
    if min_n < 2:
        raise ValueError(f"min_n ({min_n}) must be >= 2 (variance needs 2 points)")
    if season is not None and season < 2:
        raise ValueError(f"season ({season}) must be >= 2 when given")
    # ADVICE r12 #2: z_den = 0 silently disables the z-test (the
    # comparison degenerates to dev²·0 > z²·var, never true) and a
    # negative numerator/denominator inverts it after squaring hides
    # the sign — both are caller bugs, not thresholds.
    if z_num < 1:
        raise ValueError(f"z_num ({z_num}) must be >= 1")
    if z_den < 1:
        raise ValueError(f"z_den ({z_den}) must be >= 1")
    # int64 safety: every product in the predicate is bounded by
    # (window · max_cnt · max(z_num, z_den))² — enforce the linear bound
    # per row (see docstring; ⌊√(2⁶³−1)⌋ = 3_037_000_499).
    count_limit = 3_037_000_499 // (window * max(z_num, z_den))
    grid = gap_fill(
        events, key_cols, ts_col, bucket_seconds, max_gap_buckets=max_gap_buckets,
    )
    x = F.col("n_events")
    parts = [F.col(c) for c in key_cols]
    if season is not None:
        # phase = bucket index mod season; unix_micros is exact and the
        # grid's bucket_start is already bucket-aligned, so DIV + pmod
        # replay identically in the oracle
        phase = F.expr(
            f"pmod(unix_micros(bucket_start) DIV {bucket_seconds * 1_000_000}, {season})"
        )
        parts = [*parts, phase]
    frame = (
        W.partitionBy(*parts)
        .orderBy("bucket_start")
        .rowsBetween(-window, -1)
    )
    g = grid.select(
        *key_cols,
        "bucket_start",
        F.col("n_rows").alias("n_events"),
    ).select(
        "*",
        F.count("*").over(frame).cast("bigint").alias("n_window"),
        F.coalesce(F.sum("n_events").over(frame), F.lit(0)).cast("bigint").alias("__s"),
        F.coalesce(F.sum(F.col("n_events") * F.col("n_events")).over(frame), F.lit(0))
        .cast("bigint")
        .alias("__q"),
        F.coalesce(F.max("n_events").over(frame), F.lit(0))
        .cast("bigint")
        .alias("__m"),
    )
    n, s, q = F.col("n_window"), F.col("__s"), F.col("__q")
    dev = (n * x - s).cast("bigint")
    var_num = (n * q - s * s).cast("bigint")
    flag = (
        (n >= min_n)
        & (dev > 0)
        & (
            (var_num == 0)  # zero-variance history: any rise is z = ∞
            | (dev * dev * (z_den * z_den) > F.lit(z_num * z_num) * var_num)
        )
    )
    # overflow guard rides the OUTPUT columns (assert_true is NULL on
    # pass, so `when` takes the value branch on every valid row; a hot
    # bucket raises instead of wrapping) — anchored on EVERY column the
    # squared terms feed (dev_num, var_num, is_anomaly), not just the
    # flag, so a consumer projecting a numerator alone still trips it;
    # and the tested count is greatest(own count, trailing-frame max)
    # because a hot bucket also poisons the Σx/Σx² of its `window`
    # followers (ADVICE r13 #1 — a filter dropping the hot row must not
    # silence the guard for the rows whose statistics still include it)
    hot = F.greatest(x, F.col("__m"))
    guard = F.assert_true(
        hot <= F.lit(count_limit),
        F.concat(
            F.lit(
                f"anomaly_zscore: a per-bucket count in this row's window "
                f"exceeds the int64-safe limit {count_limit} at "
                f"window={window}, z={z_num}/{z_den} (got "
            ),
            hot.cast("string"),
            F.lit("); pre-aggregate coarser buckets"),
        ),
    )
    return g.select(
        *key_cols,
        "bucket_start",
        x.cast("bigint").alias("n_events"),
        "n_window",
        F.when(guard.isNull(), dev).alias("dev_num"),
        F.when(guard.isNull(), var_num).alias("var_num"),
        F.when(guard.isNull(), flag).alias("is_anomaly"),
    )


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    side_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index per group between the ``side = 'ref'``
    and ``side = 'cur'`` rows of ``df`` (the model-monitoring standard:
    PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

    Bin edges are EXACT order statistics of the reference side —
    quantile i·n/n_bins selected by rank (the agg_percentile_disc
    integer-ceil discipline), never interpolated — and binning is pure
    comparison: ``bin(x) = |{edges e : x > e}|``. Proportions are
    Laplace-smoothed ((count+1)/(total+n_bins)) so empty bins stay
    finite. Each bin's PSI term quantizes as

        term = floor( (p_cur − p_ref) · floor(1e6·ln(p_cur/p_ref)) · 1e6 )

    — ln first (the only libm call, quantized to BIGINT), then
    exactly-rounded double arithmetic on exact inputs, floored to a
    BIGINT whose per-group SUM (``psi12``, PSI scaled by 1e12) is
    associative. PSI terms are ≥ 0 ((p_cur−p_ref) and ln share sign),
    so flooring never flips a sign.

    Returns one row per (group, bin): ``(group, bin, n_ref, n_cur,
    l6, term12, psi12)`` with ``psi12`` the group total replicated per
    row (window sum over exact BIGINTs).

    Scale shape: one window shuffle on the group key for the ranks (the
    exact-percentile cost — swap in approx edges past ~10⁸ rows/group),
    one hash aggregate for bin counts over a dense group×bin grid
    (n_bins rows/group — broadcast-joined edges, no fan-out of the data
    rows), and a 9-element array comparison per row.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins ({n_bins}) must be >= 2")
    ref = df.filter(F.col(side_col) == "ref")
    wr = W.partitionBy(group_col).orderBy(value_col)
    wall = W.partitionBy(group_col)
    ranked = ref.select(
        group_col,
        F.col(value_col).alias("__v"),
        F.row_number().over(wr).alias("__rn"),
        F.count("*").over(wall).alias("__n"),
    )

    def edge(i: int) -> Column:
        rank = F.expr(f"({i} * __n + {n_bins - 1}) DIV {n_bins}")
        return F.min(F.when(F.col("__rn") == rank, F.col("__v"))).alias(f"__e{i}")

    edges = ranked.groupBy(group_col).agg(*[edge(i) for i in range(1, n_bins)])
    edges = edges.select(
        group_col, F.array(*[f"__e{i}" for i in range(1, n_bins)]).alias("__edges")
    )
    binned = (
        df.join(F.broadcast(edges), group_col)
        .select(
            group_col,
            F.col(side_col).alias("__side"),
            F.size(
                F.filter("__edges", lambda e: F.col(value_col) > e)
            ).cast("bigint").alias("bin"),
        )
        .groupBy(group_col, "__side", "bin")
        .agg(F.count("*").cast("bigint").alias("__c"))
    )
    grid = (
        df.select(group_col)
        .distinct()
        .select(group_col, F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"))
    )
    counts = (
        grid.join(
            binned.filter(F.col("__side") == "ref").select(
                group_col, "bin", F.col("__c").alias("n_ref")
            ),
            [group_col, "bin"],
            "left",
        )
        .join(
            binned.filter(F.col("__side") == "cur").select(
                group_col, "bin", F.col("__c").alias("n_cur")
            ),
            [group_col, "bin"],
            "left",
        )
        .select(
            group_col,
            "bin",
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
        )
    )
    tot = counts.groupBy(group_col).agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    t = counts.join(F.broadcast(tot), group_col)
    pr = (F.col("n_ref") + 1).cast("double") / (F.col("__tr") + n_bins).cast("double")
    pc = (F.col("n_cur") + 1).cast("double") / (F.col("__tc") + n_bins).cast("double")
    l6 = F.floor(F.lit(float(LOG_SCALE)) * F.log(pc / pr)).cast("bigint")
    term12 = F.floor((pc - pr) * l6.cast("double") * F.lit(float(LOG_SCALE))).cast(
        "bigint"
    )
    out = t.select(group_col, "bin", "n_ref", "n_cur", l6.alias("l6"), term12.alias("term12"))
    return out.select(
        "*", F.sum("term12").over(W.partitionBy(group_col)).cast("bigint").alias("psi12")
    )


def kl_mixture(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_v: int = 256,
) -> DataFrame:
    """Per-source KL divergence KL(p_source ‖ q_corpus) over the shared
    top-``top_v`` unigram vocabulary — the mixture diagnostic behind
    DoReMi-style source reweighting (Xie et al. 2023, arXiv:2305.10429:
    excess per-source divergence drives the domain weights) and CCNet's
    per-shard LM screening: a source whose token distribution sits far
    from the corpus mixture is either gold (novel domain) or broken
    (boilerplate flood) — both need a human before the next mixture.

    Vocabulary = top_v terms by (global count DESC, term ASC) — an
    exact distributed top-k (TakeOrderedAndProject), no single-partition
    window. Distributions are Laplace-smoothed over the vocab —
    (count+1)/(in_vocab_total+|vocab|), restricted to in-vocab mass so p
    and q share a support by construction. |vocab| is the REALIZED size
    (an in-plan COUNT riding the same broadcast as the mass total), not
    top_v: a corpus with fewer distinct terms than top_v would otherwise
    leave both distributions summing below 1 and Gibbs' inequality void —
    "KL" goes negative (caught by the sf0.01 oracle while wiring this:
    the synthetic corpus has ~31 distinct normalized tokens). Per term,

        term = floor( p · floor(1e6·ln(p/q)) · 1e6 )    (BIGINT)

    — same quantize-ln-first discipline as :func:`psi_drift`; terms can
    be negative (p < q) and floor is toward −∞ on both engines. Returns
    one row per source: ``(source, n_docs, vocab_tokens, kl12)`` with
    kl12 = KL·1e12 as an exact BIGINT sum.

    Scale shape: one token-keyed partial aggregate for global counts
    (the phrase_scores shuffle), a top-k, one (source, token) aggregate
    blocked to the broadcast vocab (map-side filter BEFORE the shuffle —
    out-of-vocab tokens never shuffle), and a source×vocab dense grid of
    |sources|·top_v longs.
    """
    if top_v < 1:
        raise ValueError(f"top_v ({top_v}) must be >= 1")
    from kafka_workers_spark.operators.text import normalized

    toked = docs.select(
        F.col(group_col).alias("source"),
        F.explode(F.split(normalized(F.col(text_col)), " ")).alias("term"),
    ).filter(F.length("term") > 0)
    gcnt = toked.groupBy("term").agg(F.count("*").cast("bigint").alias("g_cnt"))
    vocab = gcnt.orderBy(F.col("g_cnt").desc(), F.col("term").asc()).limit(top_v)
    scnt = (
        toked.join(F.broadcast(vocab.select("term")), "term")
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("s_cnt"))
    )
    n_docs = docs.groupBy(F.col(group_col).alias("source")).agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    grid = n_docs.select("source").crossJoin(F.broadcast(vocab))
    cells = grid.join(scnt, ["source", "term"], "left").select(
        "source",
        "term",
        "g_cnt",
        F.coalesce("s_cnt", F.lit(0)).cast("bigint").alias("s_cnt"),
    )
    totals = cells.groupBy("source").agg(
        F.sum("s_cnt").cast("bigint").alias("vocab_tokens")
    )
    gtot = vocab.agg(
        F.sum("g_cnt").cast("bigint").alias("__g"),
        F.count("*").cast("bigint").alias("__v"),
    )
    t = cells.join(F.broadcast(totals), "source").crossJoin(F.broadcast(gtot))
    p = (F.col("s_cnt") + 1).cast("double") / (
        F.col("vocab_tokens") + F.col("__v")
    ).cast("double")
    q = (F.col("g_cnt") + 1).cast("double") / (F.col("__g") + F.col("__v")).cast(
        "double"
    )
    l6 = F.floor(F.lit(float(LOG_SCALE)) * F.log(p / q)).cast("bigint")
    term = F.floor(p * l6.cast("double") * F.lit(float(LOG_SCALE))).cast("bigint")
    kl = t.groupBy("source").agg(
        F.max("vocab_tokens").alias("vocab_tokens"),
        F.sum(term).cast("bigint").alias("kl12"),
    )
    return n_docs.join(kl, "source").select(
        "source", "n_docs", "vocab_tokens", "kl12"
    )


def anomaly_mad(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    bucket_seconds: int = 3600,
    window: int = 24,
    min_n: int = 8,
    z_num: int = 3,
    z_den: int = 1,
    max_gap_buckets: int | None = None,
) -> DataFrame:
    """Robust volume-spike detection: the median/MAD sibling of
    :func:`anomaly_zscore` (Leys et al. 2013, "Detecting outliers: do
    not use standard deviation around the mean, use absolute deviation
    around the median"). The mean/σ screen has a ~25% breakdown point —
    a history window already containing a flood inflates σ and MASKS the
    next flood; the median and the median absolute deviation tolerate up
    to half the window being junk, so this is the screen to run where
    incidents cluster.

    Per gap-filled bucket (same grid as the z² screen — silent buckets
    count 0), over the trailing ``window`` CLOSED buckets:

        med = lower median of the trailing counts
        mad = lower median of |count − med|
        flag ⟺ n ≥ min_n AND (x − med) > 0
               AND (x − med)·z_den > z_num·mad   (mad = 0 ⇒ any rise)

    Everything is int64 comparisons on exact counts — no scaling is even
    needed (contrast the z² screen's squared terms): the products are
    bounded by window·max_count·max(z_num, z_den). "Lower median" =
    element ⌈n/2⌉ of the ascending sort, the agg_percentile_disc
    discipline, replayed verbatim by the oracle.

    Emits ``(key_cols..., bucket_start, n_events, n_window, med, mad,
    is_anomaly)``.

    Shape at scale: rides :func:`gap_fill`, then ONE window shuffle; the
    trailing counts materialize as a per-row array of ≤ ``window`` longs
    (collect_list over the rows-bounded frame — the exact-order-statistic
    cost, fine at any corpus size because the array is bounded by the
    parameter, not the data; a 10⁶-bucket window would want a sketch
    instead, and the z² screen for that regime)."""
    if window < 1:
        raise ValueError(f"window ({window}) must be >= 1")
    if min_n < 2:
        raise ValueError(f"min_n ({min_n}) must be >= 2")
    if z_num < 1:
        raise ValueError(f"z_num ({z_num}) must be >= 1")
    if z_den < 1:
        raise ValueError(f"z_den ({z_den}) must be >= 1")
    grid = gap_fill(
        events, key_cols, ts_col, bucket_seconds, max_gap_buckets=max_gap_buckets,
    )
    frame = (
        W.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy("bucket_start")
        .rowsBetween(-window, -1)
    )
    g = grid.select(
        *key_cols,
        "bucket_start",
        F.col("n_rows").cast("bigint").alias("n_events"),
    ).select(
        "*",
        F.sort_array(
            F.collect_list(F.col("n_events")).over(frame)
        ).alias("__arr"),
    )
    n = F.size("__arr").cast("bigint")
    # lower median: 1-based element ceil(n/2) of the ascending sort;
    # guarded — element_at index 0 (empty trailing frame, the first
    # bucket) is an error, not NULL, so the access sits under a `when`
    idx = ((F.size("__arr") + 1) / 2).cast("int")
    med = F.when(F.size("__arr") > 0, F.element_at("__arr", idx))
    g = g.select("*", n.alias("n_window"), med.cast("bigint").alias("med"))
    devs = F.sort_array(
        F.transform("__arr", lambda v: F.abs(v - F.col("med")))
    )
    mad = F.when(F.size("__arr") > 0, F.element_at(devs, idx))
    g = g.select(
        *key_cols,
        "bucket_start",
        "n_events",
        "n_window",
        "med",
        mad.cast("bigint").alias("mad"),
    )
    dev = F.col("n_events") - F.col("med")
    flag = (
        (F.col("n_window") >= min_n)
        & (dev > 0)
        & (dev * z_den > F.lit(z_num) * F.col("mad"))
    )
    return g.select(
        *key_cols,
        "bucket_start",
        "n_events",
        "n_window",
        "med",
        "mad",
        F.when(F.col("n_window") > 0, flag).otherwise(F.lit(False)).alias("is_anomaly"),
    )


def anomaly_cusum(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    bucket_seconds: int = 3600,
    warmup: int = 24,
    k_num: int = 1,
    k_den: int = 2,
    h_num: int = 5,
    h_den: int = 1,
    max_gap_buckets: int | None = None,
) -> DataFrame:
    """Two-sided CUSUM mean-shift screen (Page 1954): the sequential
    sibling of :func:`anomaly_zscore` / :func:`anomaly_mad`, which test
    each bucket IN ISOLATION and therefore miss the third failure mode —
    a SMALL, SUSTAINED level shift. A source that silently drifts +40%
    and stays there never trips a per-bucket screen (every bucket is
    individually unremarkable, and the rolling baseline adapts within
    one window), but its drift ACCUMULATES here; symmetrically, the
    down-arm catches a source quietly fading out — the classic
    "upstream died and nobody noticed" incident.

    SPC phase discipline on the gap-filled per-key grid: the first
    ``warmup`` buckets are phase I — they freeze a ROBUST reference
    (lower median ``med`` and MAD ``mad`` of the warmup counts, the
    :func:`anomaly_mad` order statistics) and never flag. From bucket
    warmup+1 (phase II), with allowance k = (k_num/k_den)·mad and
    threshold h = (h_num/h_den)·mad, the classic recursions

        S⁺_t = max(0, S⁺_{t-1} + (x_t − med) − k)
        S⁻_t = max(0, S⁻_{t-1} + (med − x_t) − k)

    are computed WITHOUT recursion via the prefix-sum identity
    ``S_t = P_t − min(0, min_{i≤t} P_i)`` with ``P_t = Σ d_i`` — two
    stacked window aggregates over ONE shuffle, no iterative loop, no
    UDF. Everything is BIGINT at scale k_den: ``d = k_den·(x − med) −
    k_num·mad``, emitted ``s_up``/``s_dn`` are S·k_den, and the flag is
    the integer predicate ``s·h_den > h_num·mad·k_den`` (mad = 0 — a
    constant warmup — degenerates to ``s > 0``: any net drift flags,
    the zero-variance convention of the sibling screens). int64 bound:
    |P| ≤ buckets·(k_den·max_cnt + k_num·mad) — ~10¹⁴ at a million
    buckets of 10⁷ events, comfortably inside 2⁶³.

    No post-alarm reset (a deliberate divergence from chart-keeping SPC
    practice, where S rezeros after each alarm): the flag here reads
    "the level still differs from the phase-I reference", which is the
    question a pipeline monitor actually asks — it stays up until the
    source recovers (S drains at k per bucket once the level returns),
    rather than re-alarming on a fixed cadence during one long incident.

    Emits EVERY grid bucket: ``(key_cols..., bucket_start, n_events,
    med, mad, s_up, s_dn, is_shift_up, is_shift_dn)`` — warmup rows
    carry NULL s and false flags (phase I is calibration, not
    evidence). Keys with ≤ warmup grid buckets never leave phase I.

    Scale shape: rides :func:`gap_fill`, ONE window shuffle on the keys
    (row-number, prefix sums, and prefix mins share the partitioning
    and sort), plus a broadcast of the one-row-per-key reference."""
    if warmup < 2:
        raise ValueError(f"warmup ({warmup}) must be >= 2")
    if k_num < 0 or k_den < 1:
        raise ValueError(
            f"allowance k ({k_num}/{k_den}) needs k_num >= 0 and k_den >= 1"
        )
    if h_num < 1 or h_den < 1:
        raise ValueError(
            f"threshold h ({h_num}/{h_den}) needs h_num >= 1 and h_den >= 1"
        )
    grid = gap_fill(
        events, key_cols, ts_col, bucket_seconds, max_gap_buckets=max_gap_buckets,
    )
    wk = W.partitionBy(*[F.col(c) for c in key_cols]).orderBy("bucket_start")
    g = grid.select(
        *key_cols,
        "bucket_start",
        F.col("n_rows").cast("bigint").alias("n_events"),
    ).select("*", F.row_number().over(wk).alias("__rn"))
    # phase-I reference: lower med/MAD of each key's first `warmup`
    # buckets (one row per key -> broadcast back)
    ref = (
        g.filter(F.col("__rn") <= warmup)
        .groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list("n_events")).alias("__arr"))
    )
    idx = ((F.size("__arr") + 1) / 2).cast("int")
    ref = ref.select(
        *key_cols, F.element_at("__arr", idx).cast("bigint").alias("med"), "__arr"
    )
    ref = ref.select(
        *key_cols,
        "med",
        F.element_at(
            F.sort_array(F.transform("__arr", lambda v: F.abs(v - F.col("med")))), idx
        ).cast("bigint").alias("mad"),
    )
    j = g.join(F.broadcast(ref), key_cols)
    x, med, mad = F.col("n_events"), F.col("med"), F.col("mad")
    live = F.col("__rn") > warmup
    # warmup rows contribute ZERO drift so one window pass covers both
    # phases (no union, no second scan of the grid)
    d_up = F.when(live, k_den * (x - med) - k_num * mad).otherwise(F.lit(0))
    d_dn = F.when(live, k_den * (med - x) - k_num * mad).otherwise(F.lit(0))
    frame = wk.rowsBetween(W.unboundedPreceding, W.currentRow)
    c = j.select(
        *key_cols,
        "bucket_start",
        "n_events",
        "med",
        "mad",
        "__rn",
        F.sum(d_up).over(frame).cast("bigint").alias("__pu"),
        F.sum(d_dn).over(frame).cast("bigint").alias("__pd"),
    )
    s = c.select(
        *key_cols,
        "bucket_start",
        "n_events",
        "med",
        "mad",
        "__rn",
        (F.col("__pu") - F.least(F.lit(0), F.min("__pu").over(frame)))
        .cast("bigint")
        .alias("__su"),
        (F.col("__pd") - F.least(F.lit(0), F.min("__pd").over(frame)))
        .cast("bigint")
        .alias("__sd"),
    )

    def shift(col: Column) -> Column:
        return F.when(
            F.col("__rn") > warmup,
            F.when(mad > 0, col * h_den > F.lit(h_num) * mad * k_den).otherwise(
                col > 0
            ),
        ).otherwise(F.lit(False))

    live_out = F.col("__rn") > warmup
    return s.select(
        *key_cols,
        "bucket_start",
        "n_events",
        "med",
        "mad",
        F.when(live_out, F.col("__su")).alias("s_up"),
        F.when(live_out, F.col("__sd")).alias("s_dn"),
        shift(F.col("__su")).alias("is_shift_up"),
        shift(F.col("__sd")).alias("is_shift_dn"),
    )
