"""Mergeable sketch aggregates (functions/sketches.py): estimate accuracy,
the partial-union == whole-pass identity, and heavy-hitter exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_workers_spark.functions.sketches import (
    approx_quantiles,
    distinct_estimate,
    distinct_sketch,
    heavy_hitters,
    incremental_distinct_rollup,
    merge_distinct_sketches,
)
from kafka_workers_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def test_distinct_sketch_estimate_accuracy(spark):
    li = load_table(spark, SF, "lineitem")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    est = li.select(
        distinct_estimate(distinct_sketch("l_orderkey")).alias("e")
    ).collect()[0].e
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_incremental_rollup_matches_whole_pass(spark):
    """The 100 TB contract: merging per-partition sketches gives the SAME
    estimate as sketching everything in one pass (HLL register merge is
    associative), so rollups never need the raw history."""
    li = load_table(spark, SF, "lineitem")
    whole = li.select(
        distinct_estimate(distinct_sketch("l_orderkey")).alias("e")
    ).collect()[0].e
    daily = incremental_distinct_rollup(li, ["l_linestatus"], "l_orderkey")
    assert daily.count() > 1  # genuinely partial
    merged = daily.select(
        distinct_estimate(merge_distinct_sketches("distinct_sketch")).alias("e")
    ).collect()[0].e
    # DataSketches sparse/dense transitions shift the merged estimate a
    # few counts vs the single pass; the error bound is what is invariant
    assert abs(merged - whole) / whole < 0.01, (merged, whole)
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    assert abs(merged - exact) / exact < 0.05, (merged, exact)


def test_approx_quantiles_rank_error(spark):
    li = load_table(spark, SF, "lineitem")
    qs = li.select(
        approx_quantiles("l_extendedprice", [0.5, 0.9], accuracy=10_000).alias("q")
    ).collect()[0].q
    n = li.count()
    below_mid = li.filter(F.col("l_extendedprice") <= qs[0]).count()
    below_p90 = li.filter(F.col("l_extendedprice") <= qs[1]).count()
    assert abs(below_mid / n - 0.5) < 0.01
    assert abs(below_p90 / n - 0.9) < 0.01


def test_heavy_hitters_exact(spark):
    li = load_table(spark, SF, "lineitem")
    got = [
        (r.l_returnflag, r.hh_count) for r in heavy_hitters(li, ["l_returnflag"], k=3).collect()
    ]
    pdf = li.groupBy("l_returnflag").count().toPandas()
    want = sorted(
        ((r.l_returnflag, r["count"]) for _, r in pdf.iterrows()),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert got == [(m, n) for m, n in want]
