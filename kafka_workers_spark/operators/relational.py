"""Relational operators Spark lacks natively: as-of join, range join.

The reference's only join-like construct is the time-aware merge pattern
(/root/reference/src/test/java/com/rtbhouse/kafka/workers/integration/MergerTest.java:136-201);
as-of is its batch analog (SURVEY.md §2 Table B, "range / interval / as-of").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_alias: str = "asof_ts",
    how: str = "inner",
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right timestamp per ``on``
    key: the greatest right ts <= left ts (``direction='backward'``, the
    default), the smallest right ts >= left ts (``'forward'``), or the
    closer of the two (``'nearest'``, ties to backward) — the pandas
    ``merge_asof`` direction surface (tests cross-check against it).

    Implementation: union the two sides tagged 0/1, one shuffle on the key,
    then ``last``/``first`` (ignoring nulls) over the interleaved ordered
    timeline. Scales linearly: no per-key fanout, no nested-loop join, and
    skewed keys are handled by AQE since this is a plain window shuffle;
    every direction shares the single exchange (differently-ordered
    window sorts run on the same partitioning). Ties (right ts == left
    ts) count as a match in every direction, like
    ``merge_asof(allow_exact_matches=True)``.

    NULL join keys never match (SQL equi-join semantics): right rows with
    a NULL key are dropped up front — Window.partitionBy would otherwise
    group all NULL keys into one partition and match them to each other,
    which ``ASOF JOIN ... ON l.key = r.key`` never does.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    lcols = left.columns
    tagged_l = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    tagged_r = (
        right.filter(F.col(on).isNotNull())
        .select(F.col(on), F.col(right_ts).alias("__ts"))
        .withColumn("__side", F.lit(0))
    )
    # align columns for unionByName
    for c in lcols:
        if c not in tagged_r.columns:
            tagged_r = tagged_r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = tagged_l.unionByName(tagged_r.select(tagged_l.columns))
    # backward: rights at equal ts sort BEFORE the left row, so the
    # trailing window sees them (ties match)
    w_back = (
        W.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    back = F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w_back)
    # forward-inclusive: rights at equal ts sort AFTER the left row
    # (desc side), so the leading window sees them (ties match)
    w_fwd = (
        W.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    fwd = F.first(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w_fwd)
    if direction == "backward":
        chosen = back
    elif direction == "forward":
        chosen = fwd
    else:
        # nearest: closer of the two; exact ties (equal distance) go
        # backward, matching pandas merge_asof(direction='nearest')
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when((fwd - F.col("__ts")) < (F.col("__ts") - back), fwd)
            .otherwise(back)
        )
    matched = unioned.withColumn(right_alias, chosen).filter(F.col("__side") == 1)
    out = matched.select(*lcols, right_alias)
    if tolerance is not None:
        # the matched value is the extremal right ts in its direction, so
        # if it falls outside the tolerance window no better value could
        # be inside it either — nulling is exact, not approximate
        out = out.withColumn(
            right_alias,
            F.when(
                (F.col(right_alias) >= F.col(left_ts) - tolerance)
                & (F.col(right_alias) <= F.col(left_ts) + tolerance),
                F.col(right_alias),
            ),
        )
    if how == "inner":
        out = out.filter(F.col(right_alias).isNotNull())
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join that avoids the nested-loop plan.

    Explodes each right interval into the buckets it overlaps, then
    equi-joins on bucket + residual filter — the standard bucketized range
    join; shuffle cost is O(intervals × avg_buckets) instead of |L|×|R|.
    """
    bw = F.lit(bucket_width)
    r = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bw).cast("long"),
                F.floor(F.col(right_hi) / bw).cast("long"),
            )
        ),
    )
    l = left.withColumn("__bucket", F.floor(F.col(left_point) / bw).cast("long"))
    return (
        l.join(r, "__bucket")
        .filter((F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi)))
        .drop("__bucket")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-resilient equi-join: spread a hot key across ``salt`` shuffle
    partitions.

    A single dominant key turns a shuffle join into one straggler task.
    AQE's skew-join split (enabled in session defaults) handles the plain
    sort-merge case at runtime; this operator covers the plans AQE cannot
    split (skewed key feeding an aggregate, disabled AQE, non-SMJ shapes):
    the left (big/skewed) side gets a per-row salt, the right side
    replicates each row ``salt`` times, and the join key becomes
    (key, salt) — the hot key's rows land on ``salt`` different reducers.
    Cost: right side bytes × salt (keep the replicated side small); result
    is row-identical to the unsalted join for every join type that keys
    only on ``on`` (inner/left).

    The salt mixes a content hash with ``spark_partition_id()`` so that
    (a) it stays DETERMINISTIC under task retry — a per-row random or
    monotonic id re-draws salts when a map task reruns, and a reducer mix
    of attempt-1 and attempt-2 outputs then silently loses or duplicates
    rows (the indeterminate-shuffle-key class of bug Spark guards its own
    round-robin repartition against) — and (b) identical rows of a hot
    key still split whenever they span input partitions (the common
    identical-row skew case: a replicated/deduplicated feed read from
    many splits). Residual caveat: identical rows within ONE input
    partition share a salt; if a single split holds the whole hot key,
    pre-spread the input or dedup-and-weight instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    left_s = left.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in left.columns]), F.spark_partition_id()),
            F.lit(salt),
        ).cast("int"),
    )
    right_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left_s.join(right_s, [*on, "__salt"], how).drop("__salt")


def funnel_steps(
    events: DataFrame,
    step_values: list,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel resolution (the event-analytics staple — e.g.
    ClickHouse's windowFunnel / sequenceMatch family, re-expressed as
    relational aggregates): per user, the EARLIEST-GREEDY completion of
    the step sequence — ``t_1`` = first step-1 event, ``t_i`` = first
    step-i event STRICTLY after ``t_{i-1}``. Returns one row per user
    who reached step 1: ``(user_col, t_1..t_k, depth)``, NULL
    timestamps past the reached depth (prefix property: depth = count
    of non-NULL stages). Time-windowed funnels compose by filtering
    ``events`` to the window first.

    Semantics notes: earliest-greedy is the standard unambiguous choice
    (any completion implies the greedy one, stage by stage — the greedy
    chain is dominated by every other chain); equal timestamps do NOT
    advance a stage (strict ``>``), so a view and a click in the same
    microsecond don't form a sequence. ``within_seconds`` bounds the
    whole chain to ``t_1 + within`` (ClickHouse windowFunnel's window):
    stages outside the window don't count. Windowed-greedy is itself
    greedy per stage — like windowFunnel, it reports the chain anchored
    at the FIRST step-1 event, not the best-anchored chain; a user
    whose completing chain starts at a later step-1 occurrence reports
    the shallower depth (the standard, documented trade).

    Shape at scale: k chained (filter → user-keyed min-aggregate)
    passes — each is one partial-aggregatable shuffle of (user, ts)
    pairs with the step predicate pushed to the scan, joined to the
    previous stage's user-keyed frame (broadcast when small). No
    windows, no per-user sort, no session state."""
    if not step_values:
        raise ValueError("step_values must be non-empty")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError(f"within_seconds ({within_seconds}) must be positive")
    cur = (
        events.filter(F.col(type_col) == step_values[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, v in enumerate(step_values[1:], start=2):
        prev_t = f"t_{i - 1}"
        nxt = events.filter(F.col(type_col) == v).join(
            cur.select(user_col, "t_1", prev_t), user_col
        ).filter(F.col(ts_col) > F.col(prev_t))
        if within_seconds is not None:
            nxt = nxt.filter(
                F.col(ts_col).cast("long") - F.col("t_1").cast("long")
                <= within_seconds
            )
        nxt = nxt.groupBy(user_col).agg(F.min(ts_col).alias(f"t_{i}"))
        cur = cur.join(nxt, user_col, "left")
    depth = None
    for i in range(1, len(step_values) + 1):
        term = F.col(f"t_{i}").isNotNull().cast("bigint")
        depth = term if depth is None else depth + term
    return cur.select(
        user_col, *[f"t_{i}" for i in range(1, len(step_values) + 1)], depth.alias("depth")
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch sessionization by inactivity gap — the batch twin of
    Spark's streaming ``session_window`` (and of the reference-era
    per-key state pattern a WorkerTask would hand-roll): a new session
    starts where the gap from the previous event of the same user
    exceeds ``gap_seconds``. Implemented as the classic two-window
    chain — ``lag`` marks session starts, a running sum of start flags
    numbers them — both windows partitioned by ``user_col`` over ONE
    user-keyed shuffle (identical partitioning ⇒ single Exchange;
    per-user event counts bound the sort). Returns the input plus
    ``session_id`` (0-based per user, ordered by time).

    Equal timestamps: gap 0 never starts a session; ``lag`` over the
    (ts, tiebreak-free) order is deterministic only if (user, ts) is
    unique per event — pass pre-deduplicated events or include a
    tiebreak in ``ts_col`` granularity (the testdata's event_id-unique
    micros satisfy this).
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds ({gap_seconds}) must be positive")
    w = W.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    is_start = (
        prev.isNull()
        | ((F.col(ts_col).cast("long") - prev.cast("long")) > gap_seconds)
    ).cast("bigint")
    return events.withColumn(
        "session_id",
        (F.sum(is_start).over(w.rowsBetween(W.unboundedPreceding, 0)) - 1).cast(
            "bigint"
        ),
    )


def gap_fill(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    bucket_seconds: int,
    aggs: list[Column] | None = None,
    max_gap_buckets: int | None = None,
) -> DataFrame:
    """Time-series resample with gap filling (the warehouse
    date-spine/resample idiom — e.g. ClickHouse WITH FILL, InfluxQL
    GROUP BY time() fill(0)): bucket events into fixed windows of
    ``bucket_seconds`` and emit EVERY bucket between each key's first
    and last event — zero ``n_rows`` (and NULL custom aggregates) for
    silent buckets, so downstream rate/trend math never mistakes
    absence for a missing row. Returns
    ``(key_cols..., bucket_start, n_rows, aggs...)``.

    Bucketing is integer floor-division of epoch micros (cross-engine
    exact; never date_trunc, whose tz semantics differ per engine).
    Shape at scale: one hash aggregate over the events (map-side
    partial), a tiny per-key span aggregate OVER the bucketed frame
    (never the raw events), a sequence-explode of bucket INDICES (longs
    — bounded by span/bucket, not by event count), one equi-join back.
    The grid explode fans out per key-bucket, so pick ``bucket_seconds``
    to bound span/bucket; payloads never enter the grid.

    ``max_gap_buckets`` (VERDICT r14 #4) bounds the largest SILENT RUN
    the grid back-fills: if any key has two consecutive observed buckets
    more than ``max_gap_buckets`` apart, the plan raises at runtime
    (in-plan ``assert_true``, the anomaly_zscore overflow-guard style)
    instead of exploding an unbounded run of synthetic zero rows — a
    year-silent key on hourly buckets is 8 759 non-evidence rows per
    key; on 1-second buckets it is 31 M. Default None keeps the
    family's semantics: absence is evidence. The guard is one ``lag``
    window over the per-bucket aggregate (buckets, never raw events) and
    mirrors the identical bound in the live drift machines, so live ==
    batch holds for the guard too."""
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds ({bucket_seconds}) must be positive")
    if max_gap_buckets is not None and max_gap_buckets < 1:
        raise ValueError(
            f"max_gap_buckets ({max_gap_buckets}) must be >= 1 or None"
        )
    step_us = bucket_seconds * 1_000_000
    # FLOOR division, not DIV (truncate-toward-zero): pre-epoch
    # timestamps have negative micros, and truncation would merge the
    # hour before the epoch into bucket 0 with a bucket_start AFTER the
    # event (round-9 self-review; pmod formula per the repo's
    # cross-engine floor-div rule)
    bucket = F.expr(
        f"(unix_micros({ts_col}) - pmod(unix_micros({ts_col}), {step_us})) DIV {step_us}"
    )
    per = events.groupBy(
        *key_cols, bucket.alias("__b")
    ).agg(F.count("*").cast("bigint").alias("n_rows"), *(aggs or []))
    if max_gap_buckets is not None:
        gap = (
            F.col("__b")
            - F.coalesce(
                F.lag("__b").over(W.partitionBy(*key_cols).orderBy("__b")),
                F.col("__b"),
            )
            - 1
        )
        guard = F.assert_true(
            gap <= F.lit(max_gap_buckets),
            F.concat(
                F.lit(
                    "gap_fill: a key is silent for "
                ),
                gap.cast("string"),
                F.lit(
                    f" consecutive buckets (> max_gap_buckets="
                    f"{max_gap_buckets}) — back-filling that run would emit "
                    "unbounded synthetic zero rows; pick coarser buckets, "
                    "raise the bound, or retire the key"
                ),
            ),
        )
        # assert_true is NULL on pass, so `when` takes the value branch on
        # every valid row — the guard rides n_rows (every consumer reads
        # it) and cannot be projection-pruned away
        per = per.select(
            *key_cols,
            "__b",
            F.when(guard.isNull(), F.col("n_rows")).alias("n_rows"),
            *[c for c in per.columns if c not in (*key_cols, "__b", "n_rows")],
        )
    span = per.groupBy(*key_cols).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = span.select(
        *key_cols, F.explode(F.sequence("__lo", "__hi")).alias("__b")
    )
    out_aggs = [c for c in per.columns if c not in (*key_cols, "__b")]
    return (
        grid.join(per, [*key_cols, "__b"], "left")
        .select(
            *key_cols,
            F.timestamp_seconds(F.col("__b") * bucket_seconds).alias("bucket_start"),
            F.coalesce("n_rows", F.lit(0)).cast("bigint").alias("n_rows"),
            *[c for c in out_aggs if c != "n_rows"],
        )
    )


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column profiling (the data-quality summary every warehouse
    ingest runs — row count, null count, EXACT distinct count, min/max
    per column): one aggregate pass over the table, then the single
    stats row unpivots into one output row per column —
    ``(column, n_rows, n_nonnull, n_distinct, min_value, max_value)``
    with min/max rendered as strings so heterogeneous column types
    share one schema (cast AFTER the typed min/max, so numeric order is
    numeric — never lexicographic).

    Shape at scale: one pass; count + min/max combine map-side, and the
    k exact count-distincts share Catalyst's expand-based multi-distinct
    rewrite (k× row expansion in the partial aggregate — the price of
    EXACT distincts; swap in approx_count_distinct when ±2% is
    acceptable). The unpivot is a one-row explode on the driver-sized
    result, not a data-path operation. Double columns should be passed
    pre-cast to DECIMAL (string rendering of raw doubles is
    engine-specific)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count("*").cast("bigint").alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).cast("bigint").alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nonnull"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(entries).alias("__e")).select("__e.*")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_seconds: int,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Banded interval-overlap join (the temporal-join staple — Bouros &
    Mamoulis' forward-scan family, SIGMOD 2017, re-expressed as a
    blocking equi-join the way every pair operator in this engine is):
    all row pairs whose CLOSED intervals ``[start, end]`` overlap
    (``a_start <= b_end AND b_start <= a_end``), never a
    CartesianProduct. Column names must be caller-disjoint (rename for
    self-joins); ``extra_cond`` carries equi-keys and ordering
    predicates (e.g. ``key_a == key_b``, ``id_a < id_b``) and is pushed
    into the join.

    Blocking: each interval explodes to the width-``bucket_seconds``
    time buckets it spans, the two sides equi-join on the bucket, and a
    pair is kept only in its CANONICAL bucket — the bucket of the later
    start, which every true overlap contains on both sides — so each
    pair emerges exactly once with no dropDuplicates shuffle. Pick
    ``bucket_seconds`` near the typical interval length: the explode
    factor is span/bucket + 1 per row, and candidate cost is
    Σ per-bucket |a|×|b| (concurrency-bounded), never |a|×|b| global.
    Invalid intervals (end < start) are dropped on both sides —
    filter/repair upstream if they should be errors.

    Measured (scripts/stress_dedup.py --intervals, PLANS.md §Round 12):
    on 500k ~60 s intervals + a 20k-interval ~600 s concurrent cluster
    inside one hour, bucket = the CLUSTER's interval length (600 s) is
    the optimum; bucket 6× larger packs the whole cluster into 1-2
    buckets and ONE task runs ~90% of the wall (3.6× slower end-to-end —
    the straggler a 1000-executor cluster cannot hide), while bucket 10×
    smaller pays the explode factor (~1.5× slower). Rule of thumb: size
    the bucket to the LONGEST population you expect to spike
    concurrently, not to the global median; the skew diagnostic is
    max_task/wall from the stress rep. Bucket choice never changes the
    answer (pair counts pinned identical across choices)."""
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds ({bucket_seconds}) must be positive")
    step_us = bucket_seconds * 1_000_000

    def bkt(col: str) -> str:
        return f"unix_micros({col}) DIV {step_us}"

    ax = a.filter(F.col(a_end) >= F.col(a_start)).withColumn(
        "__bkt_a", F.explode(F.expr(f"sequence({bkt(a_start)}, {bkt(a_end)})"))
    )
    bx = b.filter(F.col(b_end) >= F.col(b_start)).withColumn(
        "__bkt_b", F.explode(F.expr(f"sequence({bkt(b_start)}, {bkt(b_end)})"))
    )
    cond = (
        (F.col("__bkt_a") == F.col("__bkt_b"))
        # exact overlap on band-collided candidates
        & (F.col(a_start) <= F.col(b_end))
        & (F.col(b_start) <= F.col(a_end))
        # canonical bucket: the later start's bucket — contained in both
        # intervals whenever they overlap, so each pair survives exactly once
        & (
            F.col("__bkt_a")
            == F.expr(
                f"unix_micros(greatest({a_start}, {b_start})) DIV {step_us}"
            )
        )
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return ax.join(bx, cond).drop("__bkt_a", "__bkt_b")


def group_ols(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group simple linear regression (OLS slope + intercept — the
    trend-per-entity aggregate of any analytics store): y = a·x + b fit
    from the sufficient statistics ``(n, Σx, Σy, Σxy, Σx²)``, ALL
    exact — inputs go to ``1/scale`` fixed point (floor, bigint),
    per-row products and sums ride DECIMAL(38,0) (== DuckDB HUGEINT,
    the Kneser-Ney discipline), and the slope is materialized as the
    EXACT scaled integer ``slope9 = (1e9 · (nΣxy − ΣxΣy)) DIV
    (nΣx² − (Σx)²)`` — integral DIV truncates toward zero exactly like
    DuckDB's HUGEINT ``//`` — with no wide-decimal→double cast
    whose last-ulp rounding could differ across engines. The reported
    ``slope`` (= slope9/1e9) and ``intercept`` (ȳ − slope·x̄, computed
    fixed-order in doubles from int64-exact parts) therefore ride the
    cross-engine value-hash oracle bit for bit. The fixed-point scale
    cancels in the slope (both axes scale together).

    Degenerate groups (zero x variance) report NULL slope/intercept.
    Range discipline (with the default scale=100): |x| ≲ 1e7, |y| ≲
    1e9 at a billion rows per group keeps ``1e9·num`` inside
    DECIMAL(38,0); widen/narrow ``scale`` per the data.

    Shape at scale: ONE partial-aggregatable hash aggregate — five
    sums shuffle per group per map partition; nothing else moves."""
    xi = F.floor(F.col(x_col) * scale).cast("long")
    yi = F.floor(F.col(y_col) * scale).cast("long")
    d38 = "decimal(38,0)"
    stats = df.select(
        *key_cols,
        xi.alias("__x"),
        yi.alias("__y"),
    ).groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("__x").cast(d38)).alias("__sx"),
        F.sum(F.col("__y").cast(d38)).alias("__sy"),
        F.sum((F.col("__x").cast(d38) * F.col("__y").cast(d38))).alias("__sxy"),
        F.sum((F.col("__x").cast(d38) * F.col("__x").cast(d38))).alias("__sxx"),
    )
    n38 = F.col("n").cast(d38)
    num = n38 * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = n38 * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope9 = F.when(
        den != 0,
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * __sxy - __sx * __sy) * 1000000000 AS DECIMAL(38,0)) "
            "DIV (CAST(n AS DECIMAL(38,0)) * __sxx - __sx * __sx)"
        ).cast("long"),
    )
    with_slope = stats.select(*key_cols, "n", "__sx", "__sy", slope9.alias("slope9"))
    slope = F.col("slope9").cast("double") / F.lit(1e9)
    intercept = (
        F.col("__sy").cast("double")
        - slope * F.col("__sx").cast("double")
    ) / (F.col("n").cast("double") * F.lit(float(scale)))
    return with_slope.select(
        *key_cols,
        "n",
        "slope9",
        slope.alias("slope"),
        F.when(F.col("slope9").isNotNull(), intercept).alias("intercept"),
    )


def mad_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier summary via MAD (median absolute
    deviation — Hampel's robust scale; the data-quality screen that,
    unlike mean±σ, is not dragged by the very outliers it hunts):
    per group, the exact discrete median (rank selection at ceil(n/2),
    the agg_percentile_disc discipline), the exact median of
    ``|x − median|``, and the count of rows with ``|x − median| >
    k·MAD``. Returns ``(key_cols..., n, median, mad, n_outliers)``.

    Everything is deterministic and cross-engine exact: medians are
    rank-SELECTED data values (never interpolated), deviations are one
    IEEE subtraction, and the flag threshold is one multiply-compare —
    no float aggregates anywhere. A zero MAD (over half the group
    identical) flags every row differing from the median, the standard
    degenerate-MAD behavior.

    Shape at scale: two group-keyed window ranks (median, then
    deviation median — the second sorts the SAME partitioning, one
    extra sort no extra exchange class) and two broadcast joins of
    one-row-per-group frames; per-group sort cost bounds the group
    size like every exact-percentile path (swap in approx_percentile
    when strata outgrow a task)."""
    if k <= 0:
        raise ValueError(f"k ({k}) must be positive")
    w1 = W.partitionBy(*key_cols).orderBy(value_col, tiebreak_col)
    wall = W.partitionBy(*key_cols)
    ranked = df.select(*key_cols, value_col, tiebreak_col).select(
        "*",
        F.row_number().over(w1).alias("__rn"),
        F.count("*").over(wall).alias("__n"),
    )
    med = (
        ranked.filter(F.col("__rn") == F.expr("(__n + 1) DIV 2"))
        .select(*key_cols, F.col(value_col).alias("__med"), F.col("__n").alias("n"))
    )
    dev = df.select(*key_cols, value_col, tiebreak_col).join(
        F.broadcast(med), key_cols
    ).withColumn("__dev", F.abs(F.col(value_col) - F.col("__med")))
    w2 = W.partitionBy(*key_cols).orderBy("__dev", tiebreak_col)
    dev_ranked = dev.select(
        "*", F.row_number().over(w2).alias("__drn")
    )
    mad = (
        dev_ranked.filter(F.col("__drn") == F.expr("(n + 1) DIV 2"))
        .select(*key_cols, F.col("__dev").alias("__mad"))
    )
    flagged = dev.join(F.broadcast(mad), key_cols)
    return flagged.groupBy(*key_cols).agg(
        F.max("n").alias("n"),
        F.max("__med").alias("median"),
        F.max("__mad").alias("mad"),
        F.sum(
            (F.col("__dev") > F.lit(float(k)) * F.col("__mad")).cast("bigint")
        ).alias("n_outliers"),
    )


#: Benford expected first-digit frequencies, parts-per-million —
#: floor(1e6·log10(1+1/d)) computed ONCE in Python and inlined as
#: literals on both engines (no runtime log10, no libm drift)
BENFORD_PPM = {
    d: int(__import__("math").log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)
}


def benford_profile(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford first-digit screen (Newcomb 1881 / Benford 1938; the
    classic forensic data-quality test for 'organically grown' numeric
    columns — fabricated or truncated data flunks it): the distribution
    of leading digits of ``|value|`` against Benford's law, one row per
    digit with the observed count and the EXACT parts-per-million
    deviation ``|observed·1e6 − expected_ppm·n|`` — integer arithmetic
    throughout (the expected frequencies are Python-computed literals
    shared verbatim with the oracle), so the profile rides the
    value-hash oracle. Zero/NULL values are excluded (no leading
    digit), and so are non-finite doubles (NaN/Infinity render with no
    1-9 digit — they must not surface as a NULL-digit row). The output
    is always the full 1..9 grid — a digit with zero observations
    reports observed=0 with its full expected deviation, never a
    missing row a chi-square consumer could mistake for conformance
    (ADVICE r09). The total count ``n`` is surfaced as an output column
    because the deviation is n-scaled: on an empty/fully-filtered input
    every deviation_ppm_n is 0, which means NO EVIDENCE, not perfect
    conformance — a chi-square consumer must divide by n and treat n=0
    as "no data" (ADVICE r10). One hash aggregate; nothing else
    moves."""
    # leading SIGNIFICANT digit via string strip — values must render in
    # plain decimal notation (scientific-notation rendering differs
    # across engines; keep |v| roughly within [1e-3, 1e15])
    # nullif guards the ANSI cast: NaN/Inf render with no 1-9 digit,
    # stripping to '' (same NULLIF in the oracle SQL)
    digit = F.nullif(
        F.substring(
            F.regexp_replace(F.abs(F.col(value_col)).cast("string"), r"[^1-9]", ""), 1, 1
        ),
        F.lit(""),
    ).cast("int")
    base = (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) != 0))
        .select(digit.alias("digit"))
        .filter(F.col("digit").isNotNull())  # NaN/Inf/digitless renderings
    )
    counts = base.groupBy("digit").agg(F.count("*").cast("bigint").alias("observed"))
    total = counts.groupBy().agg(
        F.coalesce(F.sum("observed"), F.lit(0)).cast("bigint").alias("__n")
    )
    grid = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    expected = F.array(*[F.lit(BENFORD_PPM[d]).cast("bigint") for d in range(1, 10)])
    return (
        grid.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("observed"), F.lit(0)).cast("bigint").alias("observed"),
            F.element_at(expected, F.col("digit")).alias("expected_ppm"),
            F.col("__n").alias("n"),
            F.abs(
                F.coalesce(F.col("observed"), F.lit(0)) * F.lit(1_000_000).cast("bigint")
                - F.element_at(expected, F.col("digit")) * F.col("__n")
            ).alias("deviation_ppm_n"),
        )
    )


def markov_transitions(
    events: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key ordered event
    sequences — the "what happens after X" complement to the funnel
    (fixed step chain) and attribution (last touch) analytics: per
    consecutive pair within a key, count (prev_state → next_state) and
    estimate ``P(next | prev) = n / n_from``. The probability is ONE
    IEEE division of two exact long counts, so the whole matrix rides a
    cross-engine value hash (the phrase_scores float rule).
    ``order_cols`` must make the per-key order total (the sessionize
    rule — pass a unique tiebreaker).

    Shape at scale: one key-partitioned window for the lag (per-key
    sort, the events already cluster by key in any sessionized layout),
    one hash aggregate keyed by the (prev, next) pair, and one window
    over the TINY state×state matrix for the row totals. No payload
    columns survive past the lag. Returns
    ``(prev_state, next_state, n, n_from, prob)``."""
    from pyspark.sql import Window as W

    if not key_cols or not order_cols:
        raise ValueError("key_cols and order_cols must be non-empty")
    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    trans = (
        events.select(
            *key_cols,
            *order_cols,
            F.col(state_col).alias("__next"),
        )
        .select(
            F.lag("__next").over(w).alias("__prev"),
            "__next",
        )
        .filter(F.col("__prev").isNotNull())
    )
    return transition_matrix(
        trans.select(
            F.col("__prev").alias("prev_state"), F.col("__next").alias("next_state")
        )
    )


def transition_matrix(transitions: DataFrame) -> DataFrame:
    """Aggregate a ``(prev_state, next_state)`` transition stream into
    the Markov matrix ``(prev_state, next_state, n, n_from, prob)`` —
    shared by :func:`markov_transitions` and the WorkerTask batch entry
    (queries ``stream_markov_state``), so both plans feeding the same
    registered oracle can never drift apart (review r12). ``prob`` is
    ONE IEEE division of exact long counts."""
    from pyspark.sql import Window as W

    counts = transitions.groupBy("prev_state", "next_state").agg(
        F.count("*").cast("long").alias("n")
    )
    w_from = W.partitionBy("prev_state")
    n_from = F.sum("n").over(w_from).cast("long")
    return counts.select(
        "prev_state",
        "next_state",
        "n",
        n_from.alias("n_from"),
        (F.col("n").cast("double") / n_from.cast("double")).alias("prob"),
    )


def pit_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
    dim_ts: str,
    attrs: list[str],
    dim_tiebreak: str | None = None,
    dim_valid_to: str | None = None,
) -> DataFrame:
    """Point-in-time dimension enrichment WITHOUT a join: stamp every
    fact row with the dimension attributes valid AT its event time —
    the SCD2 lookup (``valid_from <= ts < valid_to``) every feature
    pipeline runs to avoid label leakage (training features must be the
    values known AT the event, not today's).

    The naive plan is an interval-containment join (fact × history
    range predicate). This operator instead UNIONS the two frames —
    dimension versions as state-change markers, facts as probes — and
    takes the last version over one (key)-partitioned window ordered by
    (ts, side): a single shuffle, NO join, no interval fan-out, the
    asof_join union trick generalized to versioned dimensions. At equal
    timestamps the dimension row sorts FIRST, so a version is visible
    from its own ``valid_from`` inclusive. The DuckDB oracle for
    join_scd2_pointintime deliberately replays the CONTAINMENT-JOIN
    form, so the two formulations are held equal cross-engine — a
    cross-PLAN check, not a replay of the same shape.

    The window carries each version as ONE STRUCT (attrs + valid_from
    [+ valid_to]), not per-attribute last-ignore-nulls: a version whose
    attribute is legitimately NULL stays NULL (scd2_history supports
    value→NULL transitions; skipping nulls per-attribute would resurrect
    an OLDER version's value and could stitch attributes from different
    versions — review r12). With ``dim_valid_to`` set, enrichment is the
    EXACT half-open containment: a fact after the latest version's
    ``valid_to`` (expired entity, or a gap between versions) gets NULL
    attributes, same as the containment join. Without it, versions are
    treated as open-ended (pure as-of: latest valid_from ≤ ts wins).

    ``dim`` must carry unique ``(key, dim_ts)`` versions, or pass
    ``dim_tiebreak`` (e.g. ``valid_to`` ascending-nulls-last for SCD2
    histories with zero-width versions: the version whose interval
    extends furthest is the visible one). Facts earlier than every
    version get NULL attributes (the LEFT-join semantics). Fact and
    dimension column names must be disjoint apart from ``key``.

    Shape at scale: one window shuffle on ``key`` over facts+versions —
    versions are a vanishing fraction of facts, so the cost is one sort
    of the fact stream; payloads ride the window but never replicate
    (contrast the containment join, whose range predicate needs a
    bucket explode or a nested loop when the optimizer can't see the
    partition-by-time structure)."""
    clash = (set(facts.columns) & set(dim.columns)) - {key}
    if clash:
        raise ValueError(
            f"facts/dim share non-key columns {sorted(clash)}; rename one side"
        )
    # ADVICE r12 #5: the plan synthesizes `valid_since` plus __-prefixed
    # internals (__t/__side/__dtb/__ver/__pit and the struct fields) —
    # an input column with one of those names would silently duplicate
    # or shadow an output column, so reject up front on BOTH sides.
    reserved = {"__t", "__side", "__dtb", "__ver", "__pit"}
    for side, frame in (("facts", facts), ("dim", dim)):
        bad = sorted(c for c in frame.columns if c in reserved or c.startswith("__"))
        if bad:
            raise ValueError(
                f"{side} columns {bad} collide with pit_enrich's reserved "
                "__-prefixed internals; rename them first"
            )
    if "valid_since" in facts.columns:
        raise ValueError(
            "facts column 'valid_since' collides with pit_enrich's "
            "synthesized output column; rename it first"
        )
    if "valid_since" in attrs:
        raise ValueError(
            "attr 'valid_since' collides with pit_enrich's synthesized "
            "output column; rename the dim attribute first"
        )
    for a in attrs:
        if a not in dim.columns:
            raise ValueError(f"attr {a!r} not in dim columns {dim.columns}")
    if dim_valid_to is not None and dim_valid_to not in dim.columns:
        raise ValueError(f"dim_valid_to {dim_valid_to!r} not in dim columns")
    from pyspark.sql import Window as W

    # the version rides the window as one struct so (attrs, valid_since,
    # valid_to) always come from the SAME version row
    vt = (
        F.col(dim_valid_to)
        if dim_valid_to is not None
        else F.lit(None).cast(dim.schema[dim_ts].dataType)
    )
    ver_struct = F.struct(
        *[F.col(a).alias(a) for a in attrs],
        F.col(dim_ts).alias("__vf"),
        vt.alias("__vt"),
    )
    d = dim.select(
        F.col(key),
        F.col(dim_ts).alias("__t"),
        F.lit(0).alias("__side"),
        (
            F.col(dim_tiebreak)
            if dim_tiebreak
            else F.lit(None).cast("long")
        ).alias("__dtb"),
        ver_struct.alias("__ver"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c)
          for c in facts.columns if c != key],
    )
    f = facts.select(
        F.col(key),
        F.col(fact_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(d.schema["__dtb"].dataType).alias("__dtb"),
        F.lit(None).cast(d.schema["__ver"].dataType).alias("__ver"),
        *[F.col(c) for c in facts.columns if c != key],
    )
    w = (
        W.partitionBy(key)
        .orderBy(
            F.col("__t").asc(),
            F.col("__side").asc(),
            F.col("__dtb").asc_nulls_last(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = d.unionByName(f).select(
        "*", F.last("__ver", ignorenulls=True).over(w).alias("__pit")
    )
    # expiry/gap: the latest version only applies while the fact sits
    # inside its [valid_from, valid_to) interval (valid_to NULL = open)
    in_interval = F.col("__pit").isNotNull() & (
        F.col("__pit.__vt").isNull() | (F.col("__t") < F.col("__pit.__vt"))
    )
    return enriched.filter(F.col("__side") == 1).select(
        key,
        *[F.col(c) for c in facts.columns if c != key],
        *[
            F.when(in_interval, F.col(f"__pit.{a}")).alias(a)
            for a in attrs
        ],
        F.when(in_interval, F.col("__pit.__vf")).alias("valid_since"),
    )


MARKOV_SCALE = 10**9


def markov_stationary(
    transitions: DataFrame,
    iters: int = 4,
) -> DataFrame:
    """Stationary distribution of the first-order Markov chain by
    fixed-iteration power method in exact scaled integers (the pagerank
    discipline applied to :func:`transition_matrix`'s chain): transition
    probabilities quantize once as ``q9 = (n · 10^9) DIV n_from`` and
    each round folds ``π'(s') = Σ_s (π(s) · q9(s,s')) DIV 10^9`` — every
    intermediate in the RECURRENCE is ≤ 10^18, so the iteration itself
    never overflows int64 regardless of corpus scale. The one-time
    quantization carries its own ceiling (ADVICE r12 #3): ``n · 10^9``
    overflows int64 when a single (prev, next) transition count exceeds
    ⌊(2⁶³−1)/10⁹⌋ ≈ 9.2·10⁹ — the same ceiling the rejected raw-count
    fold hits every round, here hit once and ENFORCED by an in-plan
    ``assert_true`` riding the ``__q9`` column (raises instead of
    wrapping under non-ANSI arithmetic; past it, pre-aggregate counts
    to a coarser unit before calling). The long-run state mix is the journey-level
    complement of the per-transition matrix: where does a user
    population settle.

    ``iters`` is FIXED and the oracle unrolls the same count (the
    pagerank/kcore discipline). States with no outgoing transition leak
    their mass (the dangling-node behavior pagerank documents); DIV
    flooring bleeds ≤ 1 unit of 10⁻⁹ per TRANSITION EDGE per round (each
    (π·q9) DIV fold floors once). Returns ``(state, pi9)`` with π scaled
    by 10^9.

    Shape at scale: the transition matrix aggregates once (state-pair
    keyed, tiny); each round is one broadcast-size join of the π vector
    to the matrix plus one aggregate over (state, long) rows — the
    Pregel-on-SQL shape on a |states|² frame, independent of event
    count."""
    if iters < 1:
        raise ValueError(f"iters ({iters}) must be >= 1")
    from pyspark.sql import Window as W

    counts = transitions.groupBy(
        F.col("prev_state").alias("__p"), F.col("next_state").alias("__x")
    ).agg(F.count("*").cast("long").alias("__n"))
    q = counts.select(
        "__p",
        "__x",
        "__n",
        F.sum("__n").over(W.partitionBy("__p")).cast("long").alias("__nf"),
    ).select(
        "__p",
        "__x",
        # quantization ceiling guard (docstring): __n · 10⁹ must fit
        # int64; anchored on the emitted __q9 so it cannot be pruned
        F.when(
            F.assert_true(
                F.col("__n") <= F.lit((2**63 - 1) // MARKOV_SCALE),
                F.concat(
                    F.lit(
                        "markov_stationary: a (prev,next) transition count "
                        f"exceeds the quantization ceiling {(2**63 - 1) // MARKOV_SCALE} (got "
                    ),
                    F.col("__n").cast("string"),
                    F.lit("); pre-aggregate to a coarser unit first"),
                ),
            ).isNull(),
            F.expr(f"(__n * {MARKOV_SCALE}) DIV __nf"),
        ).alias("__q9"),
    )
    states = (
        transitions.select(F.col("prev_state").alias("state"))
        .unionAll(transitions.select(F.col("next_state").alias("state")))
        .distinct()
    )
    ns = states.agg(F.count("*").cast("long").alias("__c"))
    pi = states.crossJoin(F.broadcast(ns)).select(
        "state", F.expr(f"{MARKOV_SCALE} DIV __c").cast("long").alias("pi9")
    )
    for _ in range(iters):
        contrib = (
            pi.join(q, pi["state"] == q["__p"])
            .groupBy(F.col("__x").alias("state"))
            .agg(
                F.sum(F.expr(f"(pi9 * __q9) DIV {MARKOV_SCALE}"))
                .cast("long")
                .alias("__s")
            )
        )
        pi = states.join(contrib, "state", "left").select(
            "state", F.coalesce("__s", F.lit(0)).cast("long").alias("pi9")
        )
    return pi
