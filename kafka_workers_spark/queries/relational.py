"""Relational operator inventory (SURVEY.md §2 Table B).

The reference has no relational operators — anything relational lived in
user code inside ``WorkerTask.process()``
(/root/reference/src/main/java/com/rtbhouse/kafka/workers/api/task/WorkerTask.java:50).
The new engine exposes the full surface natively via Spark SQL; each query
below is one checklist row, written plan-first: filters/projections push to
the parquet scan, small dimensions broadcast, aggregations get map-side
partials, window functions use a single shuffle on their partition keys.

Cross-engine float determinism: see queries/__init__ docstring (DECIMAL
sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_workers_spark.queries import register
from kafka_workers_spark.sources.files import load_table, register_views


from kafka_workers_spark.functions.determinism import dsum, sql_dsum  # noqa: E402
from kafka_workers_spark.functions.sketches import (  # noqa: E402
    sql_hdr_bucket,
    sql_hdr_bucket_low,
)


# --------------------------------------------------------------------------
# Aggregation: hash aggregate with partial+final (TPC-H Q1 shaped) — flagship
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Projection & filter (pushed to the parquet scan: PushedFilters/ReadSchema)
# --------------------------------------------------------------------------


@register(
    "scan_project_filter",
    """
    SELECT o_orderkey, o_custkey,
           o_totalprice * 0.9 AS discounted_price,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0
    """,
    windowed=False,  # rotated out round 12 (cheap veteran; pytest holds the oracle)
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate in one scan: both push to the parquet reader
    (PushedFilters + pruned ReadSchema, asserted in tests/test_plans.py) —
    the scan reads exactly the referenced columns and skips row groups via
    min/max stats on the filter columns. FLOOR before the integer cast:
    bare CAST(double AS BIGINT) truncates in Spark but rounds in DuckDB."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000.0)).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") * 0.9).alias("discounted_price"),
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
    )


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------


@register(
    "join_inner_broadcast",
    windowed=False,  # rotated out round 15 (cheap veteran; pytest holds the oracle)
    oracle=f"""
    SELECT n_name, {sql_dsum('o_totalprice', 'total_sales', 2)}, COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact orders ⋈ broadcast(customer) ⋈ broadcast(nation).

    At 100 TB the fact side streams through map tasks while the dims ship to
    every executor — zero shuffle on the fact table; Catalyst/AQE picks this
    automatically under the broadcast threshold but we hint explicitly.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum("o_totalprice", "total_sales", 2), F.count("*").alias("n_orders"))
    )


@register(
    "join_left_outer",
    """
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    # rotated OUT round 7 for ann_near_dedup_rhp (outer-join family still
    # driver-covered by join_full_outer); same oracle, run by pytest
    windowed=False,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi_anti",
    """
    SELECT 'semi' AS op, c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
    UNION ALL
    SELECT 'anti' AS op, c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
    """,
    windowed=False,  # rotated out round 8 for text_cluster_topics (VERDICT r07 #5)
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti against the same filtered build side, tagged
    — the two partitions of customer by EXISTS, so the union is exactly one
    row per customer (a structural invariant of the pair)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.lit("semi").alias("op"), "c_custkey", "c_name"
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("anti").alias("op"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


@register(
    "join_nonequi_range",
    """
    SELECT p_partkey, p_name, COUNT(*) AS n_suppliers_cheaper
    FROM part JOIN supplier ON s_acctbal < p_retailprice / 100.0
    GROUP BY p_partkey, p_name
    """,
    windowed=False,  # rotated out round 15 second swap (cheap veteran; the
    # theta/range family stays windowed via join_range_bucketed +
    # join_interval_overlap; pytest holds the oracle)
)
def join_nonequi_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join → BroadcastNestedLoopJoin (supplier side is tiny; at scale
    a range/theta join should bucketize the range key first — see
    operators.relational.range_join for the scale path)."""
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    return (
        p.join(F.broadcast(s), s.s_acctbal < p.p_retailprice / 100.0)
        .groupBy("p_partkey", "p_name")
        .agg(F.count("*").alias("n_suppliers_cheaper"))
    )


@register(
    "join_asof",
    """
    SELECT 'plain' AS variant, p.event_id, p.user_id, p.ts, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    UNION ALL
    SELECT 'tolerance' AS variant, p.event_id, p.user_id, p.ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.event_type = 'click' AND c.user_id = p.user_id
              AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE) AS click_ts
    FROM events p
    WHERE p.event_type = 'purchase'
      AND EXISTS (SELECT 1 FROM events c
                  WHERE c.event_type = 'click' AND c.user_id = p.user_id
                    AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE)
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, plain + 30-minute-tolerance variants, tagged (A16-
    adjacent; SURVEY §2 Table B "range/as-of").

    Spark lacks a native as-of join; composed as union + ordered window:
    one shuffle on user_id, then last(click ts) over the interleaved
    timeline. Scales: no per-key fanout, no nested loop. The tolerance
    variant nulls out stale matches — exact, because any older match is
    further outside the window; its oracle is the correlated-subquery
    formulation (DuckDB ASOF JOIN has no tolerance clause).
    """
    from kafka_workers_spark.operators.relational import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    plain = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", right_alias="click_ts"
    )
    tol = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_alias="click_ts",
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    )

    def tag(df: DataFrame, variant: str) -> DataFrame:
        return df.select(F.lit(variant).alias("variant"), *df.columns)

    return tag(plain, "plain").unionByName(tag(tol, "tolerance"))


# --------------------------------------------------------------------------
# Aggregation variants
# --------------------------------------------------------------------------


@register(
    "agg_distinct_collect",
    """
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_types,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS event_types,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
    # rotated OUT round 7 for corpus_decontaminate_bloom (agg family still
    # driver-covered by q1/rollup_cube/moments/percentile); pytest oracle
    windowed=False,
)
def agg_distinct_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation + array aggregation (collect_set) in one hash
    aggregate. The set is sorted then joined to a string so the result is
    deterministic regardless of partition arrival order and hash-comparable
    across engines (array cells materialize differently in pandas)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types"),
        F.count("*").alias("n_events"),
    )


@register(
    "agg_grouping_rollup_cube",
    f"""
    SELECT 'gsets' AS mode, l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    UNION ALL
    SELECT 'rollup' AS mode, l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS mode, l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three multi-grouping shapes tagged in one result: non-hierarchical
    GROUPING SETS ((rf),(ls)), hierarchical ROLLUP, and full CUBE.

    ONE scan of the fact table: the finest-granularity (rf, ls) aggregate
    is computed once (partial+final hash agg, decimal partials kept EXACT
    — not yet cast to double) and each mode re-aggregates that
    ~|rf|×|ls|-row intermediate with the real rollup()/cube() operators.
    Decimal re-aggregation of exact partials equals a direct aggregate, so
    the oracle (which aggregates the fact table per mode) hash-matches.
    The naive form scans the fact table three times — 3× the I/O at 100 TB
    for byte-identical output.

    The shared base carries NO explicit pin: the four consumers' base
    aggregate subtrees canonicalize identically, so AQE's runtime stage
    reuse materializes the exchange ONCE and feeds every branch from it
    (executed plan shows 3 ReusedExchange nodes — asserted in
    tests/test_plans.py::test_multi_consumer_base_reuses_exchange_at_runtime).
    One fact scan at any scale, full lineage, and none of the persist
    write/read overhead that made the pinned form the round-4 bench
    mover (measured medians sf0.1×5: pinned 1.11 s vs 0.66 s unpinned —
    PLANS.md round-5 addendum)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n0"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sq0"),
        )
    )
    agg = [
        F.sum("n0").alias("n"),
        F.sum("sq0").cast("double").alias("sum_qty"),
    ]
    out_cols = ["mode", "l_returnflag", "l_linestatus", "n", "sum_qty"]

    def tagged(df: DataFrame, mode: str) -> DataFrame:
        return df.withColumn("mode", F.lit(mode)).select(*out_cols)

    by_rf = base.groupBy("l_returnflag").agg(*agg).withColumn("l_linestatus", F.lit(None).cast("string"))
    by_ls = base.groupBy("l_linestatus").agg(*agg).withColumn("l_returnflag", F.lit(None).cast("string"))
    gsets = tagged(by_rf, "gsets").unionByName(tagged(by_ls, "gsets"))
    rollup = tagged(base.rollup("l_returnflag", "l_linestatus").agg(*agg), "rollup")
    cube = tagged(base.cube("l_returnflag", "l_linestatus").agg(*agg), "cube")
    return gsets.unionByName(rollup).unionByName(cube)


@register(
    "pivot_status",
    f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'O')},
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'F')}
    FROM lineitem GROUP BY l_returnflag
    """,
    windowed=False,  # rotated out round 6 for cap_per_key/split_corpus/merge_ordered_many (VERDICT r05 #1)
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"))
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_frames_first_last",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    windowed=False,  # rotated out late round 6 for ann_pq_adc_topk (window coverage stays via window_topk_per_group/agg families)
)
def window_frames_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frames (growing + full) with positional navigation
    (first/last/nth) — one shuffle on o_custkey serves all four windows
    (identical partitioning/ordering, different frames)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(wrun).cast("double").alias("running_total"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k
# --------------------------------------------------------------------------


@register(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    # rotated to EXTRA round 7 (text_bm25_topk took the driver row);
    # the TakeOrderedAndProject shape stays plan-asserted in test_plans
    # and this query stays under the identical oracle via pytest's
    # rotated-query test
    windowed=False,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heap +
    driver merge of k rows, no global sort shuffle. Unique tiebreaker keeps
    the result deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    ).limit(25)


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@register(
    "set_ops",
    """
    SELECT 'union' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union_all' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL SELECT s_nationkey FROM supplier)
    """,
    windowed=False,  # rotated out of the driver window round 5 (VERDICT r04 #4)
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (set semantics) plus UNION ALL (bag
    semantics — no distinct shuffle) over the same two inputs, tagged.
    Catalyst plans the three set-semantic branches as hash aggregates /
    joins; the bag branch is a pure concatenation with no exchange."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(F.lit(op).alias("op"), "nationkey")

    return (
        tag(c.union(s).distinct(), "union")
        .unionByName(tag(c.intersect(s), "intersect"))
        .unionByName(tag(c.subtract(s), "except"))
        .unionByName(tag(c.unionByName(s), "union_all"))
    )


# --------------------------------------------------------------------------
# Scalar function families (string / date / math / json / array)
# --------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           LENGTH(c_name) AS name_len,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           REPLACE(c_name, '#', '-') AS name_dashed,
           CONCAT(c_name, ':', c_mktsegment) AS name_seg,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           TRIM(c_name) AS name_trim
    FROM customer
    """,
    windowed=False,  # rotated out of the driver window round 5 (VERDICT r04 #4)
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        # exact CONCAT parity: DuckDB CONCAT skips NULL arguments but keeps
        # the ':' literal; concat_ws would drop the separator with the value
        # and F.concat would null the whole result
        F.concat(
            F.coalesce(F.col("c_name"), F.lit("")),
            F.lit(":"),
            F.coalesce(F.col("c_mktsegment"), F.lit("")),
        ).alias("name_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.trim(F.col("c_name")).alias("name_trim"),
    )


@register(
    "scalar_date_conditional",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS order_day,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS order_quarter,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
           strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS order_month_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000 THEN 'medium'
                ELSE 'small' END AS size_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           IF(o_orderpriority = '1-URGENT', 'urgent', 'routine') AS urgency,
           LEAST(o_totalprice, 100000.0) AS price_capped,
           NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio_or_null
    FROM orders
    """,
    windowed=False,  # rotated out round 6 for cap_per_key/split_corpus/merge_ordered_many (VERDICT r05 #1)
)
def scalar_date_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/calendar family + conditional family (CASE/COALESCE/NULLIF/IF/
    LEAST) in one per-row pass over orders. Date-valued outputs are
    formatted as strings: Spark DATE and DuckDB DATE materialize
    differently in pandas (date object vs midnight datetime64), which
    would break the driver's value hash."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.date_trunc("month", "o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status_label"),
        F.when(F.col("o_orderpriority") == "1-URGENT", "urgent").otherwise("routine").alias("urgency"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("price_capped"),
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias("prio_or_null"),
    )


@register(
    "scalar_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_round,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_kceil,
           SQRT(l_quantity) AS qty_sqrt,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate
    FROM lineitem
    """,
    windowed=False,  # rotated out of the driver window round 5 (VERDICT r04 #4)
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ROUND goes through DECIMAL: rounding raw doubles at a .x5 boundary is
    # engine-dependent; decimal HALF_UP is identical in Spark and DuckDB.
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double").alias("price_round"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000.0).cast("bigint").alias("price_kceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "scalar_json_timestamp",
    windowed=False,
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS ev_hour,
           CAST(EXTRACT(MINUTE FROM ts) AS BIGINT) AS ev_minute,
           CAST(EXTRACT(SECOND FROM ts) AS BIGINT) AS ev_second,
           CAST(EXTRACT(DOW FROM ts) AS BIGINT) AS ev_dow,
           date_trunc('hour', ts) AS ev_hour_start,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ev_epoch_s,
           epoch_us(ts) AS ev_epoch_us
    FROM events
    """,
)
def scalar_json_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + the timestamp function family over event time
    (UTC-pinned session) in one per-row pass. DOW convention aligned:
    DuckDB Sunday=0 == Spark dayofweek-1. Array functions live in
    text_profile (documents); full schema-on-read decode in
    value_decode_json."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.hour("ts").cast("bigint").alias("ev_hour"),
        F.minute("ts").cast("bigint").alias("ev_minute"),
        F.second("ts").cast("bigint").alias("ev_second"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("ev_dow"),
        F.date_trunc("hour", "ts").alias("ev_hour_start"),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).cast("bigint").alias("ev_epoch_s"),
        F.unix_micros("ts").alias("ev_epoch_us"),
    )


# --------------------------------------------------------------------------
# Event-stream analytics expressed in batch (same plans run under
# Structured Streaming with a watermark — see streaming/)
# --------------------------------------------------------------------------


@register(
    "events_time_windows",
    f"""
    SELECT 'tumbling' AS kind,
           make_timestamp(CAST(FLOOR(epoch(ts) / 300) * 300 AS BIGINT) * 1000000) AS window_start,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value', 'total_value')}
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS kind,
           make_timestamp((CAST(FLOOR(epoch(ts) / 300) * 300 AS BIGINT) - k.k) * 1000000) AS window_start,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value', 'total_value')}
    FROM events CROSS JOIN (SELECT UNNEST([0, 300]) AS k) k
    GROUP BY 2, 3
    """,
)
def events_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute + sliding 10-minute/5-minute window aggregates,
    tagged. Spark's window() aligns to the epoch origin, matching the
    oracle's FLOOR(epoch/300)*300; each event lands in exactly two sliding
    windows (duration/slide = 2 — the oracle's UNNEST([0,300]) fan-out).

    ONE scan: the 5-minute tumbling aggregate (decimal partials kept
    exact) is the base; each 10-minute sliding window is the sum of its
    two constituent 5-minute buckets, so the sliding branch re-aggregates
    the tiny base instead of re-scanning the fact table — the standard
    pane/slice optimization for overlapping windows. The same tumbling
    base + pane-merge runs under Structured Streaming with a watermark
    (pinned by tests/test_watermark.py::test_sliding_pane_merge_streaming).

    No explicit pin: both consumers' tumbling-aggregate subtrees
    canonicalize identically, so AQE's runtime stage reuse feeds the
    sliding branch from the tumbling branch's shuffle stage
    (ReusedExchange in the executed plan — asserted in
    tests/test_plans.py::test_multi_consumer_base_reuses_exchange_at_runtime).
    One fact scan at any scale with full lineage; the round-4
    persist(MEMORY_AND_DISK) pin was the bench mover here (sf0.1×5
    medians: 1.71 s pinned, 1.50 s MEMORY_ONLY, 1.05 s unpinned —
    PLANS.md round-5 addendum)."""
    ev = load_table(spark, sf_dir, "events")
    base = (
        ev.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n0"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv0"),
        )
        .select(F.col("window.start").alias("bucket"), "event_type", "n0", "sv0")
    )
    tumbling = base.select(
        F.lit("tumbling").alias("kind"),
        F.col("bucket").alias("window_start"),
        "event_type",
        F.col("n0").alias("n"),
        F.col("sv0").cast("double").alias("total_value"),
    )
    sliding = (
        base.select(
            "bucket", "event_type", "n0", "sv0",
            F.explode(F.array(F.lit(0), F.lit(300))).alias("k"),
        )
        .select(
            F.timestamp_seconds(F.unix_timestamp("bucket") - F.col("k")).alias("window_start"),
            "event_type",
            "n0",
            "sv0",
        )
        .groupBy("window_start", "event_type")
        .agg(F.sum("n0").alias("n"), F.sum("sv0").cast("double").alias("total_value"))
        .select(F.lit("sliding").alias("kind"), "window_start", "event_type", "n", "total_value")
    )
    return tumbling.unionByName(sliding)


# --------------------------------------------------------------------------
# Subqueries (scalar / IN) — Catalyst rewrites these into joins; the
# engine's surface includes them because users write them (Table B)
# --------------------------------------------------------------------------


_SUBQUERY_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice,
           o_totalprice / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(*) FROM orders) AS price_vs_avg
    FROM orders
    WHERE o_totalprice > 250000.0
      AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """


@register("subquery_scalar_in", _SUBQUERY_SQL, windowed=False)
def subquery_scalar_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + IN-subquery in one statement. Catalyst plans the
    scalar aggregate as a tiny broadcast subquery (no shuffle of the fact)
    and rewrites IN into a left-semi hash join on the filtered
    (broadcastable) customer set."""
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(_SUBQUERY_SQL)


@register(
    "join_full_outer",
    """
    WITH clickers AS (
      SELECT user_id, COUNT(*) AS n_clicks FROM events WHERE event_type = 'click' GROUP BY 1
    ), erroring AS (
      SELECT user_id, COUNT(*) AS n_errors FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT COALESCE(c.user_id, e.user_id) AS user_id, c.n_clicks, e.n_errors
    FROM clickers c FULL OUTER JOIN erroring e ON c.user_id = e.user_id
    """,
    windowed=False,  # rotated out round 8 for graph_pagerank (VERDICT r07 #5 continuation)
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(F.count("*").alias("n_clicks"))
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_errors"))
        .withColumnRenamed("user_id", "e_user_id")
    )
    return clicks.join(errors, clicks.user_id == errors.e_user_id, "full_outer").select(
        F.coalesce(clicks.user_id, F.col("e_user_id")).alias("user_id"), "n_clicks", "n_errors"
    )


@register(
    "window_analytic",
    """
    SELECT o_orderkey, o_orderpriority,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    windowed=False,  # rotated out round 6 for cap_per_key/split_corpus/merge_ordered_many (VERDICT r05 #1)
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution (ntile/percent_rank/cume_dist) + navigation (lag/lead)
    window functions over one shared window; the unique (price, orderkey)
    sort key makes every output deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "events_session_window",
    f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       -- exact microsecond gap >= 30min: Spark sessions merge only
                       -- while the next event is strictly inside prev_ts + gap;
                       -- date_diff('second') counts boundary crossings and would
                       -- diverge on sub-second timestamps near the 1800s edge
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new,
             event_id
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap): identical grouping to the
    manual lag/cumsum sessionization — the oracle
    derives the same sessions and reproduces Spark's window bounds
    (end = last event + gap). Streaming-ready: the same expression works
    under a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "lateral_explode_tokens",
    """
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
    category="text",
    # rotated to EXTRA round 7 (dedup_edit_pairs took the driver row);
    # text_phrase_mining/corpus_vocab_df keep explode-into-aggregate
    # shapes windowed, and this query stays under the identical oracle
    # via pytest's rotated-query test
    windowed=False,
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/lateral-view surface (explode): corpus-wide top-20 token
    frequencies — explode feeds a partial+final hash aggregate, then a
    20-row TakeOrdered; the shuffle carries (token, partial count) only."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Statistical aggregates — computed from exact integer moments so the
# result is deterministic across engines, partitionings, and AQE re-plans
# (built-in var_samp/stddev over doubles is order-dependent in last bits)
# --------------------------------------------------------------------------


@register(
    "agg_moments_histogram",
    """
    SELECT 'moments' AS section, l_returnflag AS grp, n,
           s1 / 1000000.0 / n AS x1,
           (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
             / (n - 1) / 1000000.0 / 1000000.0 AS x2,
           sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                / (n - 1)) / 1000000.0 AS x3
    FROM (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(floor(l_discount * 1000000) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(floor(l_discount * 1000000) AS BIGINT)
                      * CAST(floor(l_discount * 1000000) AS BIGINT)) AS BIGINT) AS s2
      FROM lineitem GROUP BY l_returnflag
    )
    UNION ALL
    SELECT 'hist' AS section, CAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS VARCHAR) AS grp,
           COUNT(*) AS n,
           MIN(o_totalprice) AS x1,
           MAX(o_totalprice) AS x2,
           CAST(NULL AS DOUBLE) AS x3
    FROM orders
    GROUP BY 2
    """,
    windowed=False,  # rotated out round 14 (cheap veteran; pytest holds the oracle)
)
def agg_moments_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two statistical-aggregate families in one tagged result.

    'moments': sample mean/variance/stddev (x1/x2/x3) from exact integer
    moments (Σx, Σx²) of the ×1e6 fixed-point discount — one partial+final
    hash aggregate carrying two bigints per group; the double arithmetic
    happens once per group in a fixed expression tree.
    'hist': fixed-width histogram of order totals — floor-bucket key, one
    hash aggregate; x1/x2 = bucket min/max, x3 null."""
    li = load_table(spark, sf_dir, "lineitem")
    q6 = F.floor(F.col("l_discount") * 1_000_000).cast("bigint")
    moments = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q6).cast("bigint").alias("s1"),
        F.sum(q6 * q6).cast("bigint").alias("s2"),
    )
    var = (
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n"))
        / (F.col("n") - 1)
    )
    moments_out = moments.select(
        F.lit("moments").alias("section"),
        F.col("l_returnflag").alias("grp"),
        "n",
        (F.col("s1") / 1_000_000.0 / F.col("n")).alias("x1"),
        (var / 1_000_000.0 / 1_000_000.0).alias("x2"),
        (F.sqrt(var) / 1_000_000.0).alias("x3"),
    )
    o = load_table(spark, sf_dir, "orders")
    hist_out = (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").cast("string").alias("grp"))
        .agg(F.count("*").alias("n"), F.min("o_totalprice").alias("x1"), F.max("o_totalprice").alias("x2"))
        .select(
            F.lit("hist").alias("section"),
            "grp",
            "n",
            "x1",
            "x2",
            F.lit(None).cast("double").alias("x3"),
        )
    )
    return moments_out.unionByName(hist_out)


@register(
    "join_range_bucketed",
    """
    SELECT s_suppkey, c_custkey, c_acctbal
    FROM supplier JOIN customer
      ON c_acctbal >= s_acctbal - 500.0 AND c_acctbal <= s_acctbal + 500.0
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via operators.relational.range_join: each
    interval explodes into the fixed-width buckets it overlaps, then an
    equi-join on bucket + residual filter — O(|intervals|·buckets + pairs)
    instead of the |L|×|R| nested loop the naive theta join plans. The
    oracle is the brute-force inequality join (same result set)."""
    from kafka_workers_spark.operators.relational import range_join

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 500.0).alias("lo"),
        (F.col("s_acctbal") + 500.0).alias("hi"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    joined = range_join(c, s, left_point="c_acctbal", right_lo="lo", right_hi="hi", bucket_width=1000.0)
    return joined.select("s_suppkey", "c_custkey", "c_acctbal")


@register(
    "agg_percentile_disc",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           MIN(CASE WHEN rn = (1 * n + 1) // 2 THEN o_totalprice END) AS p50,
           MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN o_totalprice END) AS p90,
           MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN o_totalprice END) AS p99,
           MAX(n) AS n
    FROM ranked
    GROUP BY o_orderpriority
    """,
    windowed=False,  # rotated out round 15 (cheap veteran; pytest holds the oracle)
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles by rank selection (value at ceil(p·n)) —
    deterministic across engines, unlike interpolated/approximate
    percentile functions. The target rank is computed in pure integer
    arithmetic, ceil(num·n/den) = (num·n + den - 1) DIV den, so boundary
    counts where p·n is an exact integer (p90 with n=10) never drift a
    rank due to float error (0.9*10 -> 9.000000000000002). One window
    shuffle on the group key; at scale prefer approx_percentile for a
    single pass, this is the exact oracle form."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wall = W.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wall).alias("n"),
    )

    def pick(num: int, den: int, alias: str):
        rank = F.expr(f"({num} * n + {den - 1}) DIV {den}")
        return F.min(F.when(F.col("rn") == rank, F.col("o_totalprice"))).alias(alias)

    return ranked.groupBy("o_orderpriority").agg(
        pick(1, 2, "p50"), pick(9, 10, "p90"), pick(99, 100, "p99"), F.max("n").alias("n")
    )


_HDR_B = 5  # 2^-5 ≈ 3% relative error
_HDR_QS = [0.5, 0.9, 0.99]
# the oracle renders its bucket arithmetic FROM the same helpers the
# operator documents (the sql_minhash_signature pattern), so changing
# _HDR_B can never desync the two sides
_HDR_BUCKET_SQL = sql_hdr_bucket("v", _HDR_B)
_HDR_LOW_SQL = sql_hdr_bucket_low("b", _HDR_B)
_HDR_QS_SQL = "[" + ", ".join(str(q) for q in _HDR_QS) + "]"


@register(
    "agg_hdr_quantiles",
    f"""
    WITH cents AS (
      SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem
    ), bux AS (
      SELECT l_returnflag, {_HDR_BUCKET_SQL} AS b FROM cents
    ), cnt AS (
      SELECT l_returnflag, b, COUNT(*) AS c FROM bux GROUP BY 1, 2
    ), tot AS (
      SELECT l_returnflag, SUM(c) AS n FROM cnt GROUP BY 1
    ), cum AS (
      SELECT l_returnflag, b,
             SUM(c) OVER (PARTITION BY l_returnflag ORDER BY b) AS cum
      FROM cnt
    ), ranks AS (
      SELECT t.l_returnflag, CAST(q.q AS DOUBLE) AS q, t.n,
             GREATEST(CAST(ceil(CAST(q.q AS DOUBLE) * t.n) AS BIGINT), 1) AS r
      FROM tot t CROSS JOIN (SELECT UNNEST({_HDR_QS_SQL}) AS q) q
    ), hit AS (
      SELECT r.l_returnflag, r.q, r.n, MIN(c.b) AS b
      FROM ranks r
      JOIN cum c ON c.l_returnflag = r.l_returnflag AND c.cum >= r.r
      GROUP BY 1, 2, 3
    )
    SELECT l_returnflag, q, CAST(n AS BIGINT) AS n_values,
           {_HDR_LOW_SQL} AS value
    FROM hit
    """,
    category="relational",
    windowed=False,
)
def agg_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped quantiles from the mergeable HDR sketch
    (functions/sketches.py hdr_build / hdr_quantiles — HdrHistogram
    bucketing, Tene): per-returnflag price-cents sketches, p50/p90/p99
    extracted by rank walk, every value an exact bucket lower bound so
    the DuckDB oracle replays the whole chain bit for bit (the MSB comes
    from binary string length in BOTH engines — never libm log2). The
    sketch's integer surface is what the oracle pins; the ≤ 2^-5
    relative-error guarantee against exact quantiles is property-tested
    in tests/test_sketches.py.

    Scale shape: one codegen'd bucket expression, one (group, bucket)
    hash aggregate with map-side partials — the shuffle carries bounded
    partial rows, never values — then sketch-local rank walks. The
    fixed-size rows merge exactly (hdr_merge), so per-shard sketches
    roll up without rescanning history — the quantile analog of the
    stored Bloom/CMS rows."""
    from kafka_workers_spark.functions.sketches import hdr_build, hdr_quantiles

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    cents = li.select(
        "l_returnflag", F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("v")
    )
    sk = hdr_build(cents, "v", sig_bits=_HDR_B, max_bits=40, group_cols=["l_returnflag"])
    q = hdr_quantiles(sk, _HDR_QS, sig_bits=_HDR_B)
    zipped = F.arrays_zip(
        F.array(*[F.lit(float(x)) for x in _HDR_QS]).alias("q"),
        F.col("quantiles").alias("value"),
    )
    return q.select(
        "l_returnflag", "n_values", F.explode(zipped).alias("z")
    ).select(
        "l_returnflag",
        F.col("z.q").alias("q"),
        "n_values",
        F.col("z.value").alias("value"),
    )


@register(
    "value_decode_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_decoded,
           CAST(string_split(CAST(user_id AS VARCHAR) || ',' || event_type, ',')[1] AS BIGINT) AS uid_decoded,
           string_split(CAST(user_id AS VARCHAR) || ',' || event_type, ',')[2] AS et_decoded
    FROM events
    """,
    windowed=False,  # rotated out round 8 for text_lm_kneser_ney (VERDICT r07 #5 continuation)
)
def value_decode_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read value decode (sources/decode.py): the reference's
    pluggable deserializer config (api/WorkersConfig.java:39,
    README.md:83-84 consumer.kafka.value.deserializer) re-expressed as
    from_json / from_csv decoders over payload columns — the JSON `props`
    column and a CSV-shaped payload built from the row. Both parse inside
    the scan stage (codegen), no extra pass."""
    from kafka_workers_spark.sources.decode import decode_value

    ev = load_table(spark, sf_dir, "events").withColumn(
        "csv_payload", F.concat(F.col("user_id").cast("string"), F.lit(","), F.col("event_type"))
    )
    decoded = decode_value(
        decode_value(ev, "json", "k bigint", column="props", out="j"),
        "csv",
        "uid bigint, et string",
        column="csv_payload",
        out="c",
    )
    return decoded.select(
        "event_id",
        F.col("j.k").alias("k_decoded"),
        F.col("c.uid").alias("uid_decoded"),
        F.col("c.et").alias("et_decoded"),
    )


# --------------------------------------------------------------------------
# Ordered funnel over the events stream table
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "events_funnel",
    f"""
    WITH s1 AS (SELECT user_id, MIN(ts) AS t_1 FROM events
                WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t_2 FROM events e
           JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t_1
           WHERE e.event_type = '{_FUNNEL_STEPS[1]}' GROUP BY 1),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t_3 FROM events e
           JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t_2
           WHERE e.event_type = '{_FUNNEL_STEPS[2]}' GROUP BY 1)
    SELECT s1.user_id, t_1, t_2, t_3,
           CAST(1 + CAST(t_2 IS NOT NULL AS INT) + CAST(t_3 IS NOT NULL AS INT)
                AS BIGINT) AS depth
    FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
            LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
    windowed=False,  # new round 8 — EXTRA until rotated in
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest-greedy ordered funnel view→click→purchase
    (operators.relational.funnel_steps): per user, the first chain of
    the three steps in strict time order, with reached depth. The
    oracle replays the chained min-aggregates; strict `>` means equal
    timestamps never advance a stage on either engine."""
    from kafka_workers_spark.operators.relational import funnel_steps

    ev = load_table(spark, sf_dir, "events")
    return funnel_steps(ev, list(_FUNNEL_STEPS))


_SESSION_GAP_S = 1800  # 30-minute inactivity gap


@register(
    "events_sessionize",
    f"""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(LAG(ts) OVER w) > {_SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
      SELECT user_id, event_id, ts,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - 1 AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_id
    """,
    windowed=False,  # rotated out round 15 second swap (its twin
    # events_session_window keeps the sessionization family windowed;
    # pytest holds the oracle)
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (operators.relational.sessionize,
    30-minute inactivity): lag marks session starts, a running sum
    numbers them — one user-keyed shuffle for both windows — then
    per-session stats. The oracle replays the same two-window chain.
    The streaming counterpart is the driver-windowed
    events_session_window (session_window aggregate); this is the
    batch/backfill path over the same table."""
    from kafka_workers_spark.operators.relational import sessionize

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    s = sessionize(ev, gap_seconds=_SESSION_GAP_S)
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "events_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    windowed=False,  # new round 8 — EXTRA until rotated in
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the third leg of the event-analytics
    triad (funnel, sessions, retention): users cohorted by their
    first-activity ISO week, counted distinct per (cohort, week offset).
    Week arithmetic is exact integer day-diff DIV 7 (offsets are whole
    weeks by construction — both weeks are Monday-truncated), so the
    matrix replays bit-for-bit. Shape: two user-keyed aggregates (the
    firsts frame broadcasts) + one distinct — no windows."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_week",
            # DIV, never float-divide-then-cast (the cross-engine rule):
            # offsets are exact multiples of 7 days, keep them integer
            F.expr("CAST(datediff(active_week, cohort_week) DIV 7 AS BIGINT)").alias(
                "week_offset"
            ),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
    )


@register(
    "agg_winsorize",
    f"""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    bounds AS (
      SELECT l_returnflag,
             MIN(CASE WHEN rn = (1 * n + 99) // 100 THEN l_extendedprice END) AS lo,
             MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN l_extendedprice END) AS hi
      FROM ranked GROUP BY l_returnflag
    )
    SELECT li.l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
           {sql_dsum('LEAST(GREATEST(l_extendedprice, lo), hi)', 'sum_clipped')}
    FROM lineitem li JOIN bounds ON bounds.l_returnflag = li.l_returnflag
    GROUP BY li.l_returnflag
    """,
    windowed=False,  # new round 8 — EXTRA until rotated in
)
def agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization at exact p01/p99
    (pipeline.clip_percentiles — rank-selected discrete percentiles, no
    interpolation): clip counts and the DECIMAL-exact clipped sum per
    return flag. Clipped values are actual row values, so the whole
    chain replays; the sum rides the dsum discipline."""
    from kafka_workers_spark.pipeline import clip_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    c = clip_percentiles(
        li,
        "l_extendedprice",
        group_cols=["l_returnflag"],
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )
    return c.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice_clipped_was_low").cast("bigint")).alias("n_clipped_low"),
        F.sum(F.col("l_extendedprice_clipped_was_high").cast("bigint")).alias("n_clipped_high"),
        dsum("l_extendedprice_clipped", "sum_clipped"),
    )


_ATTR_LOOKBACK_S = 3600  # last-touch lookback: 1 hour


@register(
    "events_attribution",
    f"""
    WITH purchases AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.event_id, p.ts,
           (SELECT MAX(c.click_ts) FROM clicks c
            WHERE c.user_id = p.user_id AND c.click_ts <= p.ts) AS touch_ts,
           CASE WHEN (SELECT MAX(c.click_ts) FROM clicks c
                      WHERE c.user_id = p.user_id AND c.click_ts <= p.ts)
                     >= p.ts - INTERVAL {_ATTR_LOOKBACK_S} SECONDS
                THEN 'click' ELSE 'organic' END AS attribution
    FROM purchases p
    """,
    windowed=False,  # new round 8 — EXTRA until rotated in
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution (operators.relational.asof_join applied to
    the event stream): each purchase attaches the latest preceding
    click per user; purchases whose touch is older than the 1-hour
    lookback (or touchless) are 'organic'. The engine runs the single-
    shuffle union-interleave as-of plan; the oracle verifies its
    SEMANTICS with a correlated MAX subquery — as-of == correlated-max
    is exactly the claim under test (ties: a click at the purchase
    instant counts, merge_asof allow_exact_matches semantics)."""
    from kafka_workers_spark.operators.relational import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    j = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_alias="touch_ts",
        how="left",
    )
    recent = F.col("touch_ts").isNotNull() & (
        F.col("touch_ts").cast("long") >= F.col("ts").cast("long") - _ATTR_LOOKBACK_S
    )
    return j.select(
        "user_id",
        "event_id",
        "ts",
        "touch_ts",
        F.when(recent, F.lit("click")).otherwise(F.lit("organic")).alias("attribution"),
    )


_GAP_BUCKET_S = 3600  # hourly resample buckets


@register(
    "events_gap_fill",
    f"""
    WITH b AS (
      -- floor division (DuckDB // truncates toward zero like Spark DIV;
      -- the pmod form floors, exact for pre-epoch timestamps too)
      SELECT user_id,
             (epoch_us(ts) - ((epoch_us(ts) % {_GAP_BUCKET_S * 1_000_000})
                              + {_GAP_BUCKET_S * 1_000_000}) % {_GAP_BUCKET_S * 1_000_000})
               // {_GAP_BUCKET_S * 1_000_000} AS bkt,
             value
      FROM events
    ), per AS (
      SELECT user_id, bkt, COUNT(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM b GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(bkt) AS lo, MAX(bkt) AS hi FROM per GROUP BY 1
    ), grid AS (
      SELECT user_id, UNNEST(generate_series(lo, hi)) AS bkt FROM span
    )
    SELECT g.user_id,
           make_timestamp(g.bkt * {_GAP_BUCKET_S * 1_000_000}) AS bucket_start,
           COALESCE(p.n_rows, 0) AS n_rows,
           p.sum_value AS sum_value
    FROM grid g LEFT JOIN per p ON p.user_id = g.user_id AND p.bkt = g.bkt
    """,
    windowed=False,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user resample with gap filling
    (operators.relational.gap_fill): every hour between a user's first
    and last event, zero-count rows for silent hours, value sums
    through the DECIMAL discipline (NULL on silent hours — absence of
    data, vs 0 events). Bucketing is integer epoch-micros floor
    division on both engines (never date_trunc — tz semantics)."""
    from kafka_workers_spark.functions.determinism import dsum
    from kafka_workers_spark.operators.relational import gap_fill

    ev = load_table(spark, sf_dir, "events")
    return gap_fill(
        ev, ["user_id"], "ts", _GAP_BUCKET_S, aggs=[dsum("value", "sum_value")]
    )


@register(
    "events_scd2_history",
    """
    WITH obs AS (
      -- NULL-safe change predicate + row_number first-row detection to
      -- mirror the engine's eqNullSafe/row_number exactly (ADVICE r09)
      SELECT user_id, ts, event_type, event_id,
             LAG(event_type) OVER w AS prev,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, ts, event_type, event_id FROM obs
      WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
    FROM changes
    """,
    windowed=False,
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build from an observation stream
    (pipeline.scd2_history, Kimball SCD2): per user, consecutive equal
    event_type observations collapse; each change opens a validity
    interval closed by the next (open version: NULL valid_to). The
    incremental fold (pipeline.merge_scd2: closed versions pass
    through, open version + batch re-enter detection) is pinned ==
    this one-shot build in tests/test_pipeline.py."""
    from kafka_workers_spark.pipeline import scd2_history

    ev = load_table(spark, sf_dir, "events")
    return scd2_history(
        ev.select("user_id", "ts", "event_type", "event_id"),
        ["user_id"],
        "ts",
        ["event_type"],
        "event_id",
    )


@register(
    "profile_orders",
    """
    SELECT 'o_orderkey' AS column, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_nonnull,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
           COUNT(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))),
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*), COUNT(o_orderdate),
           COUNT(DISTINCT CAST(o_orderdate AS DATE)),
           CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR),
           CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
    windowed=False,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling over orders (operators.relational.profile_table):
    row/null/EXACT-distinct counts and typed min/max rendered as
    strings, one aggregate pass then a one-row unpivot. The double
    price column is pre-cast to DECIMAL(18,2) (raw double→string
    rendering is engine-specific); the timestamp date column to DATE
    (both engines print ISO dates)."""
    from kafka_workers_spark.operators.relational import profile_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    return profile_table(
        o, ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
    )


#: 64-day bands ≈ the max transit window (quantity ≤ 50 days): explode
#: factor ≤ 2 buckets per interval
_IVL_BUCKET_S = 86400 * 64


@register(
    "join_interval_overlap",
    """
    WITH iv AS (
      SELECT l_orderkey * 10 + l_linenumber AS iid, l_partkey AS k,
             l_shipdate AS s,
             l_shipdate + to_days(CAST(floor(l_quantity) AS INT)) AS e
      FROM lineitem
    )
    SELECT a.iid AS id_a, b.iid AS id_b, a.k AS k,
           CAST((epoch_us(LEAST(a.e, b.e)) - epoch_us(GREATEST(a.s, b.s)))
                // 86400000000 AS BIGINT) AS overlap_days
    FROM iv a JOIN iv b
      ON a.k = b.k AND a.iid < b.iid AND a.s <= b.e AND b.s <= a.e
    """,
    # rotated IN round 12, fresh off its hot-bucket skew measurement
    # (PLANS.md §Round 12)
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join (operators.relational.
    interval_overlap_join): per part, pairs of lineitems whose transit
    windows [shipdate, shipdate + quantity days] overlap, with the
    overlap length in whole days. The engine runs the banded
    canonical-bucket plan (each pair exactly once, no pair dedup); the
    oracle replays the overlap predicate as a direct range join — the
    banding-is-exact claim IS what's under test."""
    from kafka_workers_spark.operators.relational import interval_overlap_join

    li = load_table(spark, sf_dir, "lineitem")
    iv = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("iid"),
        F.col("l_partkey").alias("k"),
        F.col("l_shipdate").alias("s"),
        F.expr("l_shipdate + make_interval(0, 0, 0, CAST(floor(l_quantity) AS INT), 0, 0, 0)").alias("e"),
    )
    a = iv.select(
        F.col("iid").alias("id_a"), F.col("k").alias("k"),
        F.col("s").alias("s_a"), F.col("e").alias("e_a"),
    )
    b = iv.select(
        F.col("iid").alias("id_b"), F.col("k").alias("k_b"),
        F.col("s").alias("s_b"), F.col("e").alias("e_b"),
    )
    pairs = interval_overlap_join(
        a, b, "s_a", "e_a", "s_b", "e_b", _IVL_BUCKET_S,
        extra_cond=(F.col("k") == F.col("k_b")) & (F.col("id_a") < F.col("id_b")),
    )
    overlap = F.expr(
        "(unix_micros(least(e_a, e_b)) - unix_micros(greatest(s_a, s_b))) DIV 86400000000"
    )
    return pairs.select("id_a", "id_b", "k", overlap.cast("bigint").alias("overlap_days"))


_SCD2_SPLIT = "2024-01-15 00:00:00"  # mid-corpus batch boundary


@register(
    "events_scd2_merge",
    """
    WITH obs AS (
      SELECT user_id, ts, event_type, event_id,
             LAG(event_type) OVER w AS prev,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, ts, event_type, event_id FROM obs
      WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
    FROM changes
    """,
)
def events_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL SCD2 path, driver-visible (pipeline.merge_scd2):
    build the history over the first half of the stream, then fold the
    second half in as an update batch — closed versions pass through
    untouched, the open version re-enters change detection. The oracle
    is the ONE-SHOT history over the whole stream: incremental ==
    one-shot is exactly the claim under test (the same
    persistence-equivalence the BM25/posindex/KMV merge rows pin for
    their stores)."""
    from kafka_workers_spark.pipeline import merge_scd2, scd2_history

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    base = scd2_history(
        ev.filter(F.col("ts") <= _SCD2_SPLIT), ["user_id"], "ts",
        ["event_type"], "event_id",
    )
    return merge_scd2(
        base, ev.filter(F.col("ts") > _SCD2_SPLIT), ["user_id"], "ts",
        ["event_type"], "event_id",
    )


@register(
    "agg_group_ols",
    """
    WITH fx AS (
      SELECT l_returnflag, l_linestatus,
             CAST(floor(l_quantity * 100) AS HUGEINT) AS x,
             CAST(floor(l_extendedprice * 100) AS HUGEINT) AS y
      FROM lineitem
    ), stats AS (
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM fx GROUP BY 1, 2
    ), sloped AS (
      SELECT l_returnflag, l_linestatus, n, sx, sy,
             CASE WHEN n * sxx - sx * sx <> 0
                  THEN CAST(((n * sxy - sx * sy) * 1000000000)
                            // (n * sxx - sx * sx) AS BIGINT)
             END AS slope9
      FROM stats
    )
    SELECT l_returnflag, l_linestatus, n, slope9,
           CAST(slope9 AS DOUBLE) / 1e9 AS slope,
           CASE WHEN slope9 IS NOT NULL THEN
             (CAST(sy AS DOUBLE)
              - (CAST(slope9 AS DOUBLE) / 1e9) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * 100.0)
           END AS intercept
    FROM sloped
    """,
)
def agg_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression (operators.relational.group_ols):
    extended price on quantity per (returnflag, linestatus), from
    exact DECIMAL(38,0)/HUGEINT sufficient statistics with the slope
    materialized as a truncated scaled integer (DIV == //), so slope
    AND intercept doubles ride the value-hash oracle — the entire
    regression chain is cross-engine exact, the Kneser-Ney discipline
    applied to linear algebra."""
    from kafka_workers_spark.operators.relational import group_ols

    li = load_table(spark, sf_dir, "lineitem")
    return group_ols(
        li, ["l_returnflag", "l_linestatus"], "l_quantity", "l_extendedprice"
    )


@register(
    "agg_mad_outliers",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ), med AS (
      SELECT o_orderpriority, o_totalprice AS med, n
      FROM ranked WHERE rn = (n + 1) // 2
    ), dev AS (
      SELECT o.o_orderpriority, o.o_orderkey, m.n, m.med,
             ABS(o.o_totalprice - m.med) AS d
      FROM orders o JOIN med m ON m.o_orderpriority = o.o_orderpriority
    ), dev_ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY d, o_orderkey) AS drn
      FROM dev
    ), mad AS (
      SELECT o_orderpriority, d AS mad FROM dev_ranked WHERE drn = (n + 1) // 2
    )
    SELECT dev.o_orderpriority,
           CAST(MAX(dev.n) AS BIGINT) AS n,
           MAX(dev.med) AS median,
           MAX(mad.mad) AS mad,
           CAST(SUM(CASE WHEN dev.d > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev JOIN mad ON mad.o_orderpriority = dev.o_orderpriority
    GROUP BY 1
    """,
    windowed=False,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD-based robust outlier screen (operators.relational.
    mad_outliers, Hampel filter): per order priority, the exact
    rank-selected median of the total price, the exact median absolute
    deviation, and how many orders sit beyond 3 MADs — every number a
    selected data value, an IEEE subtraction, or an integer count, so
    the whole summary rides the value-hash oracle."""
    from kafka_workers_spark.operators.relational import mad_outliers

    o = load_table(spark, sf_dir, "orders")
    return mad_outliers(o, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=3.0)


from kafka_workers_spark.operators.relational import BENFORD_PPM  # noqa: E402

_BENFORD_SQL = ", ".join(f"({d}, {v}::BIGINT)" for d, v in BENFORD_PPM.items())


@register(
    "quality_benford",
    f"""
    WITH exp AS (SELECT * FROM (VALUES {_BENFORD_SQL}) AS t(digit, expected_ppm)),
    base AS (
      SELECT CAST(NULLIF(substr(regexp_replace(CAST(ABS(o_totalprice) AS VARCHAR),
                                        '[^1-9]', '', 'g'), 1, 1), '') AS INTEGER) AS digit
      FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice <> 0
    ), counts AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed FROM base
      WHERE digit IS NOT NULL GROUP BY 1
    ), tot AS (SELECT CAST(COALESCE(SUM(observed), 0) AS BIGINT) AS n FROM counts)
    SELECT e.digit, CAST(COALESCE(c.observed, 0) AS BIGINT) AS observed, e.expected_ppm,
           tot.n AS n,
           ABS(COALESCE(c.observed, 0) * 1000000 - e.expected_ppm * tot.n) AS deviation_ppm_n
    FROM exp e LEFT JOIN counts c ON e.digit = c.digit CROSS JOIN tot
    """,
    windowed=False,
)
def quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen over order totals
    (operators.relational.benford_profile): observed leading-digit
    counts against the Benford expectation, deviation in exact
    integer ppm·n — the expected frequencies are Python-computed
    literals inlined on BOTH engines, so the whole forensic profile
    rides the value-hash oracle with no runtime log10 anywhere."""
    from kafka_workers_spark.operators.relational import benford_profile

    o = load_table(spark, sf_dir, "orders")
    return benford_profile(o, "o_totalprice")


# ---------------------------------------------------------------------------
# Markov next-event transition matrix
# ---------------------------------------------------------------------------


_MARKOV_ORACLE = """
    WITH t AS (
      SELECT event_type AS next_state,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events
    ),
    c AS (
      SELECT prev_state, next_state, CAST(COUNT(*) AS BIGINT) AS n
      FROM t WHERE prev_state IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_state, next_state, n,
           CAST(SUM(n) OVER (PARTITION BY prev_state) AS BIGINT) AS n_from,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev_state) AS DOUBLE) AS prob
    FROM c
    """


@register(
    "events_markov_transitions",
    _MARKOV_ORACLE,
    category="relational",
    windowed=False,  # new round 12 — EXTRA until rotated in
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event matrix per user journey
    (operators.relational.markov_transitions): what follows each
    event_type, with P(next|prev) as one IEEE division of exact long
    counts — the "what happens after X" complement to the funnel and
    attribution rows. Order within a user is (ts, event_id) — the
    sessionize total-order rule."""
    from kafka_workers_spark.operators.relational import markov_transitions

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return markov_transitions(ev, ["user_id"], ["ts", "event_id"], "event_type")


@register(
    "stream_markov_state",
    _MARKOV_ORACLE,  # the IDENTICAL oracle — state machine vs window, cross-plan
    category="streaming",
    windowed=False,  # new round 12 — EXTRA until rotated in
)
def stream_markov_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_markov_transitions computed through the WorkerTask state
    machine instead of the window (streaming/markov.py
    markov_tasks_batch — the per-user carried last-event-type state,
    replayed over full history via applyInPandas), then aggregated into
    the same matrix. Imperative task API vs relational lag+aggregate,
    one oracle — the funnel/attribution cross-plan pattern; the LIVE
    streaming form of the same task is pinned equal in
    tests/test_markov_stream.py."""
    from kafka_workers_spark.operators.relational import transition_matrix
    from kafka_workers_spark.streaming.markov import markov_tasks_batch

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return transition_matrix(
        markov_tasks_batch(ev).select("prev_state", "next_state")
    )


_RATE_WINDOW_US = 24 * 3600 * 1_000_000  # trailing day
_RATE_LIMIT = 5  # flag the 6th+ event of the trailing day


@register(
    "window_trailing_range",
    f"""
    SELECT user_id, event_id, ts,
           n_prev_24h,
           sum_value_24h,
           n_prev_24h >= {_RATE_LIMIT} AS over_limit
    FROM (
      SELECT user_id, event_id, ts,
             CAST(COUNT(*) OVER f - 1 AS BIGINT) AS n_prev_24h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER f
                  - CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS sum_value_24h
      FROM events
      WINDOW f AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN {_RATE_WINDOW_US} PRECEDING AND CURRENT ROW)
    )
    """,
    windowed=False,
)
def window_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame (the velocity-feature / sliding rate-limit
    idiom: per event, how many same-user events and how much value landed
    in the trailing day): a RANGE BETWEEN frame over exact integer epoch
    micros — never an interval frame over raw timestamps, whose tz
    semantics differ per engine — with the DECIMAL discipline on the
    value sum. The frame is [ts − 24h, ts] INCLUSIVE of peers (rows with
    the identical timestamp share the frame on both engines, which makes
    the result deterministic even under ts ties: 'count minus self'
    rather than an order-dependent running count); ``over_limit`` flags
    the {_RATE_LIMIT}+1-th event of any trailing day — the streaming
    rate limiter's batch-replayable form.

    Scale shape: ONE window shuffle on user_id; the range frame is
    evaluated with a sliding two-pointer over each partition's sort —
    no self-join, no bucket explode (contrast interval_overlap_join,
    which needs buckets precisely because it has no equi-key)."""
    ev = load_table(spark, sf_dir, "events")
    f = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_RATE_WINDOW_US, 0)
    )
    dec = F.col("value").cast("decimal(18,6)")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.count("*").over(f) - 1).cast("bigint").alias("n_prev_24h"),
        (F.sum(dec).over(f) - dec).cast("double").alias("sum_value_24h"),
    ).select(
        "*", (F.col("n_prev_24h") >= _RATE_LIMIT).alias("over_limit")
    )


@register(
    "join_scd2_pointintime",
    """
    WITH obs AS (
      SELECT user_id, ts, event_type, event_id,
             LAG(event_type) OVER w AS prev,
             ROW_NUMBER() OVER w AS rn
      FROM events WHERE event_type <> 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, ts, event_type, event_id FROM obs
      WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    ), history AS (
      SELECT user_id, event_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM changes
    ), p AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.purchase_id, p.purchase_ts,
           h.event_type AS state, h.valid_from AS valid_since
    FROM p LEFT JOIN history h
      ON h.user_id = p.user_id
     AND h.valid_from <= p.purchase_ts
     AND (h.valid_to IS NULL OR p.purchase_ts < h.valid_to)
    """,
    windowed=False,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 lookup (operators.relational.pit_enrich over
    pipeline.scd2_history): every purchase stamped with the user's state
    — the most recent non-purchase event_type version valid AT purchase
    time — the label-leakage-safe feature join. The Spark plan is the
    JOIN-FREE union-window form (one key shuffle, versions as
    change markers, last-ignore-nulls); the oracle deliberately replays
    the interval-CONTAINMENT-JOIN form over the same SCD2 history, so
    the two formulations are held equal cross-engine (a cross-plan
    check, the stream_funnel_state pairing). Purchases before a user's
    first observation keep NULL state (LEFT semantics on both forms);
    ties at valid_from are dim-first on the window side and
    valid_from <= ts on the join side — the same half-open interval."""
    from kafka_workers_spark.operators.relational import pit_enrich
    from kafka_workers_spark.pipeline import scd2_history

    ev = load_table(spark, sf_dir, "events")
    dim = scd2_history(
        ev.filter(F.col("event_type") != "purchase").select(
            "user_id", "ts", "event_type", "event_id"
        ),
        ["user_id"],
        "ts",
        ["event_type"],
        "event_id",
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return pit_enrich(
        facts,
        dim.select("user_id", "valid_from", "valid_to", "state"),
        key="user_id",
        fact_ts="purchase_ts",
        dim_ts="valid_from",
        attrs=["state"],
        dim_tiebreak="valid_to",
        dim_valid_to="valid_to",
    ).select("user_id", "purchase_id", "purchase_ts", "state", "valid_since")


_MST_ITERS = 4
_MST_SCALE = 10**9  # == operators.relational.MARKOV_SCALE (asserted in tests)


def _sql_markov_stationary_ctes(iters: int) -> str:
    """Unroll the scaled-integer power iteration as a LINEAR CTE chain
    (each p{i} referenced once — the graph_kcore lesson)."""
    s = _MST_SCALE
    ctes = [
        """t AS (
      SELECT event_type AS nxt,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prv
      FROM events
    )""",
        "c AS (SELECT prv, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM t WHERE prv IS NOT NULL GROUP BY 1, 2)",
        f"q AS (SELECT prv, nxt, (n * {s}) // CAST(SUM(n) OVER (PARTITION BY prv) AS BIGINT) AS q9 FROM c)",
        "states AS (SELECT prv AS state FROM c UNION SELECT nxt FROM c)",
        "ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM states)",
        f"p0 AS (SELECT state, CAST({s} // cnt AS BIGINT) AS pi9 FROM states CROSS JOIN ns)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT q.nxt AS state, SUM((p.pi9 * q.q9) // {s}) AS sm"
            f" FROM p{i - 1} p JOIN q ON p.state = q.prv GROUP BY 1)"
        )
        ctes.append(
            f"p{i} AS (SELECT states.state, CAST(COALESCE(c{i}.sm, 0) AS BIGINT) AS pi9"
            f" FROM states LEFT JOIN c{i} ON c{i}.state = states.state)"
        )
    return ",\n    ".join(ctes)


@register(
    "events_markov_stationary",
    f"""
    WITH {_sql_markov_stationary_ctes(_MST_ITERS)}
    SELECT state, pi9 FROM p{_MST_ITERS}
    """,
    category="relational",
    windowed=False,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-run state mix of the user-journey Markov chain
    (operators.relational.markov_stationary): {iters} power-method
    rounds in exact scaled integers — transition probabilities quantize
    ONCE as (n·10⁹) DIV n_from, each round folds (π·q9) DIV 10⁹, every
    intermediate ≤ 10¹⁸ so the recurrence is int64-safe at any corpus
    scale. Completes the Markov trio's matrix with where the population
    settles; the oracle unrolls the identical rounds as a linear CTE
    chain (the pagerank/kcore discipline)."""
    from kafka_workers_spark.operators.relational import markov_stationary

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.lag("event_type").over(w).alias("prev_state"),
        F.col("event_type").alias("next_state"),
    ).filter(F.col("prev_state").isNotNull())
    return markov_stationary(trans, iters=_MST_ITERS)


_KA_K = 5


@register(
    "quality_k_anonymity",
    f"""
    WITH g AS (
      SELECT o_orderpriority, o_orderstatus,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM orders
      GROUP BY 1, 2, 3
    )
    SELECT o_orderpriority, o_orderstatus, order_year, group_size,
           group_size < {_KA_K} AS is_violating,
           CAST(MIN(group_size) OVER () AS BIGINT) AS k_anonymity
    FROM g
    """,
    category="relational",
    windowed=False,  # new round 15 — EXTRA until rotated in
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002, the data-governance screen a
    dataset release runs next to text_redact_pii): group sizes over the
    quasi-identifier tuple (priority, status, order year) — a group
    smaller than k={_KA_K} re-identifies its members by QI alone, so
    each group row carries its size, the violation flag, and the
    table-level k-anonymity (the global minimum, the number the release
    checklist quotes). One hash aggregate over the QI columns; the
    global minimum attaches as a one-row aggregate BROADCAST back (the
    pagerank in-plan-N discipline — never a partitionless window, even
    over the QI-sized group table); year() is UTC-pinned by load_table
    so both engines extract the same calendar year."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(
        "o_orderpriority",
        "o_orderstatus",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
    ).agg(F.count("*").cast("bigint").alias("group_size"))
    k_min = g.groupBy().agg(F.min("group_size").cast("bigint").alias("k_anonymity"))
    return g.crossJoin(F.broadcast(k_min)).select(
        "o_orderpriority",
        "o_orderstatus",
        "order_year",
        "group_size",
        (F.col("group_size") < _KA_K).alias("is_violating"),
        "k_anonymity",
    )


_LD_L = 4  # sf0.001's min distinct-customer count is exactly 3 -> the flag fires


@register(
    "quality_l_diversity",
    f"""
    WITH g AS (
      SELECT o_orderpriority, o_orderstatus,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_sensitive
      FROM orders
      GROUP BY 1, 2, 3
    )
    SELECT o_orderpriority, o_orderstatus, order_year, group_size,
           n_sensitive, n_sensitive < {_LD_L} AS is_violating,
           CAST(MIN(n_sensitive) OVER () AS BIGINT) AS l_diversity
    FROM g
    """,
    category="relational",
    windowed=False,  # new round 15 — EXTRA until rotated in
)
def quality_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2006) — the companion
    screen quality_k_anonymity's docstring points a release checklist
    at next: a QI group can be large (k-safe) yet expose its members
    anyway if the SENSITIVE attribute barely varies inside it, so each
    group row carries its distinct-sensitive count (customer identity as the
    sensitive column — a group whose orders all trace to one customer
    re-identifies that customer), the l={_LD_L} violation flag, and the
    table-level l-diversity (the global minimum). Same shape as the
    k screen: one hash aggregate over the QI columns (COUNT DISTINCT
    is exact — the governance number must not be a sketch), global
    minimum attached as a one-row broadcast, never a partitionless
    window."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(
        "o_orderpriority",
        "o_orderstatus",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
    ).agg(
        F.count("*").cast("bigint").alias("group_size"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_sensitive"),
    )
    l_min = g.groupBy().agg(F.min("n_sensitive").cast("bigint").alias("l_diversity"))
    return g.crossJoin(F.broadcast(l_min)).select(
        "o_orderpriority",
        "o_orderstatus",
        "order_year",
        "group_size",
        "n_sensitive",
        (F.col("n_sensitive") < _LD_L).alias("is_violating"),
        "l_diversity",
    )


_TC_T9 = 200_000_000  # t = 0.2 at the 10^9 scale


@register(
    "quality_t_closeness",
    f"""
    WITH base AS (
      SELECT o_orderpriority,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
             o_orderstatus
      FROM orders
    ),
    g AS (SELECT o_orderpriority, order_year, CAST(COUNT(*) AS BIGINT) AS group_size
          FROM base GROUP BY 1, 2),
    cat AS (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS m_c FROM base GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_tot FROM base),
    gc AS (SELECT o_orderpriority, order_year, o_orderstatus,
                  CAST(COUNT(*) AS BIGINT) AS n_gc
           FROM base GROUP BY 1, 2, 3),
    tv AS (
      SELECT g.o_orderpriority, g.order_year, g.group_size,
             SUM(ABS(COALESCE(gc.n_gc, 0) * tot.m_tot - cat.m_c * g.group_size))
               AS tv_num
      FROM g CROSS JOIN cat CROSS JOIN tot
      LEFT JOIN gc ON gc.o_orderpriority = g.o_orderpriority
                  AND gc.order_year = g.order_year
                  AND gc.o_orderstatus = cat.o_orderstatus
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT o_orderpriority, order_year, group_size,
             CAST(CAST(tv_num AS HUGEINT) * 1000000000
                  // (2 * CAST(group_size AS HUGEINT) * (SELECT m_tot FROM tot))
                  AS BIGINT) AS t9
      FROM tv
    )
    SELECT o_orderpriority, order_year, group_size, t9,
           t9 > {_TC_T9} AS is_violating,
           CAST(MAX(t9) OVER () AS BIGINT) AS t_closeness9
    FROM scored
    """,
    category="relational",
    windowed=False,  # new round 15 — EXTRA until rotated in
)
def quality_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    third leg of the governance trio: a group can be k-safe AND
    l-diverse yet still leak when its sensitive DISTRIBUTION skews far
    from the table's. For the categorical sensitive column
    (order status) the earth-mover distance degenerates to total
    variation, computed EXACTLY in integers: per (group, category),
    |n_gc·M − m_c·N_g| cross-multiplies the two distributions onto a
    common denominator, the sum scales to t9 = tv·10^9 DIV (2·N_g·M)
    (HUGEINT/DECIMAL(38,0) — the product passes int64), and the
    table-level worst group attaches as a one-row broadcast MAX.
    Missing (group, category) combos contribute m_c·N_g via the
    zero-filled cross — the term a naive join would silently drop.
    Threshold t = 0.2; sf0.001's skewest year-groups genuinely
    violate."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderpriority",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        "o_orderstatus",
    )
    g = base.groupBy("o_orderpriority", "order_year").agg(
        F.count("*").cast("bigint").alias("group_size")
    )
    cat = base.groupBy("o_orderstatus").agg(F.count("*").cast("bigint").alias("m_c"))
    tot = base.groupBy().agg(F.count("*").cast("bigint").alias("m_tot"))
    gc = base.groupBy("o_orderpriority", "order_year", "o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n_gc")
    )
    tv = (
        g.crossJoin(F.broadcast(cat))
        .crossJoin(F.broadcast(tot))
        .join(gc, ["o_orderpriority", "order_year", "o_orderstatus"], "left")
        .select(
            "o_orderpriority",
            "order_year",
            "group_size",
            F.abs(
                F.coalesce("n_gc", F.lit(0)) * F.col("m_tot")
                - F.col("m_c") * F.col("group_size")
            ).alias("d"),
        )
        .groupBy("o_orderpriority", "order_year", "group_size")
        .agg(F.sum("d").alias("tv_num"))
    )
    scored = tv.crossJoin(F.broadcast(tot)).select(
        "o_orderpriority",
        "order_year",
        "group_size",
        F.expr(
            "CAST(CAST(tv_num AS DECIMAL(38,0)) * 1000000000"
            " DIV (2 * CAST(group_size AS DECIMAL(38,0))"
            " * CAST(m_tot AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("t9"),
    )
    t_max = scored.groupBy().agg(F.max("t9").cast("bigint").alias("t_closeness9"))
    return scored.crossJoin(F.broadcast(t_max)).select(
        "o_orderpriority",
        "order_year",
        "group_size",
        "t9",
        (F.col("t9") > _TC_T9).alias("is_violating"),
        "t_closeness9",
    )
