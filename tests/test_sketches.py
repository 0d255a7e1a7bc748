"""Mergeable sketch aggregates (functions/sketches.py): estimate accuracy,
the partial-union == whole-pass identity, and heavy-hitter exactness."""

from __future__ import annotations

import pytest
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


def test_frequent_items_misra_gries_guarantees(spark):
    """Bounded-memory frequent items: planted heavy values are all
    present with count_min <= true <= count_max; ranking by count_min
    puts the heaviest first; tail values above the n/(capacity+1)
    threshold cannot be missed."""
    from kafka_workers_spark.functions.sketches import frequent_items

    heavy = {"alpha": 5000, "beta": 3000, "gamma": 1500}
    rows = [(v,) for v, n in heavy.items() for _ in range(n)]
    rows += [(f"tail{i}",) for i in range(4000)]  # 4000 singletons
    df = spark.createDataFrame(rows, "v string").repartition(8)

    out = {r.item: (r.count_min, r.count_max) for r in frequent_items(df, "v", capacity=64, k=10).collect()}
    n = len(rows)
    for item, true in heavy.items():
        assert item in out, (item, out)
        lo, hi = out[item]
        assert lo <= true <= hi, (item, lo, true, hi)
        assert hi - lo <= n  # sanity: bound is finite and global
    top = sorted(out.items(), key=lambda kv: -kv[1][0])[:3]
    assert [t[0] for t in top] == ["alpha", "beta", "gamma"]


def test_frequent_items_exact_when_capacity_suffices(spark):
    """With capacity >= distinct count nothing decrements: counts are
    exact and count_min == count_max."""
    from kafka_workers_spark.functions.sketches import frequent_items

    rows = [("a",)] * 10 + [("b",)] * 5 + [("c",)] * 2
    df = spark.createDataFrame(rows, "v string").repartition(4)
    out = {r.item: (r.count_min, r.count_max) for r in frequent_items(df, "v", capacity=16, k=5).collect()}
    assert out == {"a": (10, 10), "b": (5, 5), "c": (2, 2)}


def test_assert_scale_safe_flags_cartesian(spark):
    import pytest

    from kafka_workers_spark.plans import assert_scale_safe

    a = spark.range(10)
    b = spark.range(10)
    clean = a.join(b.withColumnRenamed("id", "id2"), a.id == F.col("id2"))
    assert_scale_safe(clean)  # equi-join: fine
    # force the true cartesian operator (a plain crossJoin of two tiny
    # ranges plans as a broadcast nested loop, which is not the n² shape
    # the guard exists for)
    cart = a.hint("shuffle_replicate_nl").crossJoin(b.withColumnRenamed("id", "id2"))
    with pytest.raises(AssertionError, match="CartesianProduct"):
        assert_scale_safe(cart)
    assert_scale_safe(cart, allow_cartesian=True)


def test_frequent_items_empty_and_all_null(spark):
    from kafka_workers_spark.functions.sketches import frequent_items

    empty = spark.createDataFrame([], "v string")
    assert frequent_items(empty, "v").count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "v string")
    assert frequent_items(nulls, "v").count() == 0


def test_skew_report_surfaces_hot_keys(spark):
    from kafka_workers_spark.functions.sketches import skew_report

    rows = [("hot",)] * 5000 + [(f"k{i}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "v string").repartition(8)
    rep = skew_report(df, ["v"], capacity=64, k=3).collect()
    assert rep[0].key == "hot"
    assert rep[0].fraction_min > 0.4  # ~50% of rows on one key


def test_bloom_no_false_negatives_and_low_fp(spark):
    """The Bloom contract: every inserted value probes True (one-sided
    error — a membership drop can over-drop but never leak a member);
    non-members false-positive at well under the scheme's analytic rate."""
    from kafka_workers_spark.functions.sketches import bloom_build, bloom_probe

    members = spark.range(0, 1000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("v")
    )
    bloom = bloom_build(members, "v", n_bits=1 << 16, n_hashes=4)
    probes = spark.range(0, 6000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("v")
    )
    got = bloom_probe(probes, bloom, "v")
    hits = {r.v: r.might_contain for r in got.collect()}
    assert all(hits[f"doc-{i}"] for i in range(1000))  # no false negatives
    fps = sum(1 for i in range(1000, 6000) if hits[f"doc-{i}"])
    # analytic FPR at m/n=65.5, k=4 is ~1e-5; allow generous slack
    assert fps / 5000 < 0.01, fps


def test_bloom_probe_tolerates_probe_side_words_column(spark):
    """A probe frame that ALREADY has a `words` column must not collide
    with the sketch's word array (it joins in as the reserved
    `__bloom_words` and is dropped again) — the caller's column survives
    untouched (ADVICE r04)."""
    from kafka_workers_spark.functions.sketches import bloom_build, bloom_probe

    members = spark.range(0, 100).select(F.col("id").cast("string").alias("v"))
    bloom = bloom_build(members, "v", n_bits=1 << 12, n_hashes=3)
    probes = spark.range(0, 200).select(
        F.col("id").cast("string").alias("v"),
        F.array(F.col("id")).alias("words"),  # caller's own, unrelated
    )
    got = {r.v: (r.might_contain, r.words) for r in bloom_probe(probes, bloom, "v").collect()}
    assert all(got[str(i)][0] for i in range(100))  # no false negatives
    assert got["150"][1] == [150]  # caller's words column intact


def test_bloom_merge_is_exact_union(spark):
    """Bitwise-OR merge of two sketches IS the sketch of the union —
    exactly, word for word (the property that makes per-day sketches
    roll up losslessly)."""
    from kafka_workers_spark.functions.sketches import bloom_build, bloom_merge

    a = spark.range(0, 300).select(F.col("id").cast("string").alias("v"))
    b = spark.range(200, 500).select(F.col("id").cast("string").alias("v"))
    merged = bloom_merge(
        bloom_build(a, "v", n_bits=1 << 12, n_hashes=3).unionByName(
            bloom_build(b, "v", n_bits=1 << 12, n_hashes=3)
        )
    ).collect()[0]
    whole = bloom_build(
        a.unionByName(b), "v", n_bits=1 << 12, n_hashes=3
    ).collect()[0]
    assert merged.words == whole.words
    assert (merged.n_bits, merged.n_hashes) == (whole.n_bits, whole.n_hashes)


def test_bloom_grouped_and_null_semantics(spark):
    """Grouped sketches: probes join their own group's filter; a probe in
    a group with no sketch row is definitely absent (left join, False);
    NULL values are excluded on build and probe False."""
    from kafka_workers_spark.functions.sketches import bloom_build, bloom_probe

    df = spark.createDataFrame(
        [("en", "alpha"), ("en", "beta"), ("de", "gamma")], "lang string, v string"
    )
    bloom = bloom_build(df, "v", n_bits=1 << 10, n_hashes=3, group_cols=["lang"])
    probes = spark.createDataFrame(
        [("en", "alpha"), ("en", "gamma"), ("de", "gamma"), ("fr", "alpha"), ("en", None)],
        "lang string, v string",
    )
    got = {
        (r.lang, r.v): r.might_contain
        for r in bloom_probe(probes, bloom, "v", group_cols=["lang"]).collect()
    }
    assert got[("en", "alpha")] is True
    assert got[("de", "gamma")] is True
    assert got[("en", "gamma")] is False  # gamma only in de's filter
    assert got[("fr", "alpha")] is False  # no sketch for fr at all
    assert got[("en", None)] is False


def test_bloom_scheme_mismatch_raises(spark):
    from kafka_workers_spark.functions.sketches import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    a = spark.range(0, 10).select(F.col("id").cast("string").alias("v"))
    mixed = bloom_build(a, "v", n_bits=1 << 10, n_hashes=3).unionByName(
        bloom_build(a, "v", n_bits=1 << 10, n_hashes=4)
    )
    import pytest

    with pytest.raises(ValueError, match="distinct"):
        bloom_merge(mixed)
    with pytest.raises(ValueError, match="distinct"):
        bloom_probe(a, mixed, "v")
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(a, "v", n_bits=100)


def test_bloom_probe_plan_is_scale_safe(spark):
    """The probe is a broadcast of the sketch row + a row-local codegen
    conjunction: no cartesian product, no Python eval, no shuffle of the
    probe side."""
    from kafka_workers_spark.functions.sketches import bloom_build, bloom_probe
    from kafka_workers_spark.plans import audit

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("v")
    )
    bloom = bloom_build(li.limit(100), "v", n_bits=1 << 12, n_hashes=4)
    plan = audit(bloom_probe(li, bloom, "v"))
    assert plan.cartesian_products == 0 and plan.python_evals == 0


def test_bloom_build_rejects_oversized_sketch(spark):
    import pytest

    from kafka_workers_spark.functions.sketches import bloom_build

    df = spark.range(1).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="2\\^28"):
        bloom_build(df, "v", n_bits=1 << 29)


def test_bloom_probe_rejects_unmerged_multi_row_global_sketch(spark):
    """An ungrouped probe against a multi-row sketch table would cross-
    join every probe row per sketch row (silently multiplying the
    output); it must raise and point at bloom_merge."""
    import pytest

    from kafka_workers_spark.functions.sketches import bloom_build, bloom_probe

    a = spark.range(0, 10).select(F.col("id").cast("string").alias("v"))
    two_rows = bloom_build(a, "v", n_bits=1 << 10).unionByName(
        bloom_build(a, "v", n_bits=1 << 10)
    )
    with pytest.raises(ValueError, match="bloom_merge"):
        bloom_probe(a, two_rows, "v")


def test_bloom_probe_rejects_duplicate_group_sketch_rows(spark):
    import pytest

    from kafka_workers_spark.functions.sketches import bloom_build, bloom_probe

    df = spark.createDataFrame([("en", "a"), ("en", "b")], "lang string, v string")
    doubled = bloom_build(df, "v", n_bits=1 << 10, group_cols=["lang"]).unionByName(
        bloom_build(df, "v", n_bits=1 << 10, group_cols=["lang"])
    )
    with pytest.raises(ValueError, match="bloom_merge"):
        bloom_probe(df, doubled, "v", group_cols=["lang"])


def test_cms_never_underestimates_and_is_exact_when_wide(spark):
    """The count-min contract: estimate >= true count for EVERY value
    (one-sided error), and with a width far above the cardinality no
    collision occurs so the estimate is exact."""
    from kafka_workers_spark.functions.sketches import cms_build, cms_probe

    vals = spark.range(0, 2000).select(
        F.concat(F.lit("v"), (F.col("id") % 97)).alias("v")
    )
    exact = vals.groupBy("v").agg(F.count("*").alias("n"))
    tight = cms_probe(exact, cms_build(vals, "v", width=16, depth=4), "v")
    rows = tight.collect()
    assert all(r.cms_count >= r.n for r in rows)
    wide = cms_probe(exact, cms_build(vals, "v", width=4096, depth=4), "v")
    assert all(r.cms_count == r.n for r in wide.collect())


def test_cms_merge_equals_whole_pass_exactly(spark):
    """Element-wise addition of shard sketches reproduces the single-pass
    sketch bit for bit (exact merge — the property HLL's representation
    transitions give up), regardless of how the data was split."""
    from kafka_workers_spark.functions.sketches import cms_build, cms_merge

    vals = spark.range(0, 3000).select(
        F.concat(F.lit("k"), (F.col("id") % 211)).alias("v"), F.col("id")
    )
    whole = cms_build(vals, "v", width=32, depth=3).collect()[0].counts
    shards = [
        cms_build(vals.where(F.col("id") % 3 == i), "v", width=32, depth=3)
        for i in range(3)
    ]
    u = shards[0].unionByName(shards[1]).unionByName(shards[2])
    merged = cms_merge(u).collect()[0].counts
    assert merged == whole


def test_cms_grouped_probe_and_missing_group(spark):
    """Per-group sketches probe through the group-keyed broadcast join;
    a probe row whose group has NO sketch gets estimate 0 (left join),
    never a NULL or a wrong group's counts."""
    from kafka_workers_spark.functions.sketches import cms_build, cms_probe

    vals = spark.createDataFrame(
        [("a", "x")] * 5 + [("a", "y")] * 2 + [("b", "x")] * 7, ["g", "v"]
    )
    cms = cms_build(vals, "v", width=64, depth=3, group_cols=["g"])
    probes = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("c", "x")], ["g", "v"]
    )
    got = {(r.g, r.v): r.cms_count for r in cms_probe(probes, cms, "v", group_cols=["g"]).collect()}
    assert got[("a", "x")] == 5 and got[("a", "y")] == 2 and got[("b", "x")] == 7
    assert got[("c", "x")] == 0


def test_cms_scheme_mismatch_and_oversize_raise(spark):
    """Mixed (width, depth) schemes must raise eagerly in probe AND merge
    (a mismatched lookup returns garbage silently), and a sketch past the
    cell bound is rejected at build."""
    import pytest

    from kafka_workers_spark.functions.sketches import cms_build, cms_merge, cms_probe

    vals = spark.range(0, 50).select(F.col("id").cast("string").alias("v"))
    a = cms_build(vals, "v", width=32, depth=2)
    b = cms_build(vals, "v", width=64, depth=2)
    mixed = a.unionByName(b)
    with pytest.raises(Exception, match="distinct"):
        cms_merge(mixed).collect()
    with pytest.raises(Exception, match="distinct"):
        cms_probe(vals, mixed, "v").collect()
    with pytest.raises(ValueError, match="cell bound"):
        cms_build(vals, "v", width=1 << 22, depth=2)


def test_cms_probe_tolerates_probe_side_counts_column(spark):
    """A probe frame that ALREADY has a `counts` column must not collide
    with the sketch array (it joins in as the reserved `__cms_counts`
    and is dropped again) — the caller's column survives untouched (the
    bloom_probe `__bloom_words` contract)."""
    from kafka_workers_spark.functions.sketches import cms_build, cms_probe

    vals = spark.range(0, 50).select(F.col("id").cast("string").alias("v"))
    cms = cms_build(vals, "v", width=256, depth=3)
    probes = spark.range(0, 10).select(
        F.col("id").cast("string").alias("v"), F.array(F.col("id")).alias("counts")
    )
    got = {r.v: (r.cms_count, r.counts) for r in cms_probe(probes, cms, "v").collect()}
    assert got["7"] == (1, [7])


# ---------------------------------------------------------------------------
# HDR quantile sketch
# ---------------------------------------------------------------------------


def test_hdr_bucket_known_answers_and_bucket_low_roundtrip(spark):
    """Exact region: idx == value; log region: known grid; bucket_low is
    the bucket's smallest member (low <= v and bucket(low) == bucket(v))."""
    from kafka_workers_spark.functions.sketches import hdr_bucket, hdr_bucket_low

    b = 5
    vals = [0, 1, 31, 63, 64, 65, 127, 128, 1 << 20, (1 << 20) + 12345, (1 << 39) + 7]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select(
        "v",
        hdr_bucket(F.col("v"), b).alias("idx"),
        hdr_bucket_low(hdr_bucket(F.col("v"), b), b).alias("low"),
    ).collect()
    got = {r.v: (r.idx, r.low) for r in rows}
    # exact region (v < 64): identity
    for v in (0, 1, 31, 63):
        assert got[v] == (v, v)
    # v=64: e=6, shift=1, idx = 32 + 32 = 64; low = (64-32)<<1 = 64
    assert got[64] == (64, 64)
    assert got[65] == (64, 64)  # 65>>1 = 32 -> same bucket as 64
    assert got[127] == (95, 126)  # shift=1, idx=32+63=95, low=63<<1
    assert got[128] == (96, 128)  # shift=2, idx=64+32=96, low=32<<2
    for v in vals:
        idx, low = got[v]
        assert low <= v
        # relative error bound: v - low < 2^-b * v (log region)
        if v >= (1 << (b + 1)):
            assert (v - low) / v <= 2 ** -b


def test_hdr_quantiles_error_bound_and_merge(spark):
    """Sketch quantiles are within 2^-sig_bits relative error of the
    exact inverted-CDF quantile; shard-merge equals the whole-pass
    sketch bit for bit; empty input yields NULL quantiles."""
    import random

    from kafka_workers_spark.functions.sketches import (
        hdr_build,
        hdr_merge,
        hdr_quantiles,
    )

    rng = random.Random(11)
    vals = [rng.randrange(0, 1 << 30) for _ in range(4000)] + list(range(64))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    qs = [0.0, 0.5, 0.9, 0.99, 1.0]
    sk = hdr_build(df, "v", sig_bits=5, max_bits=40)
    row = hdr_quantiles(sk, qs, sig_bits=5).collect()[0]
    assert row.n_values == len(vals)
    import math

    svals = sorted(vals)
    for q, got in zip(qs, row.quantiles):
        # exact rank the operator's way: ceil(q*N) clamped >= 1
        exact = svals[max(1, math.ceil(q * len(svals))) - 1]
        if exact > 0:
            assert abs(got - exact) / exact <= 2 ** -5, (q, got, exact)
        else:
            assert got == 0
    halves = hdr_build(df.filter("v % 2 = 0"), "v", 5, 40).unionByName(
        hdr_build(df.filter("v % 2 = 1"), "v", 5, 40)
    )
    assert hdr_merge(halves).collect()[0].counts == sk.collect()[0].counts
    # global-aggregate build over empty input: Spark's global aggregate
    # yields ONE row — an all-zeros sketch whose quantiles are NULL
    empty = hdr_quantiles(
        hdr_build(df.filter("v < 0"), "v", 5, 40), [0.5], sig_bits=5
    ).collect()
    assert len(empty) == 1 and empty[0].n_values == 0
    assert empty[0].quantiles == [None]


def test_hdr_guards(spark):
    """Out-of-range values raise in-plan at first action; mixed merge
    schemes raise; bad params raise eagerly."""
    from kafka_workers_spark.functions.sketches import (
        hdr_build,
        hdr_merge,
    )

    neg = spark.createDataFrame([(-1,)], "v long")
    with pytest.raises(Exception, match="out of"):
        hdr_build(neg, "v", 5, 40).collect()
    big = spark.createDataFrame([(1 << 41,)], "v long")
    with pytest.raises(Exception, match="out of"):
        hdr_build(big, "v", 5, 40).collect()
    ok = spark.createDataFrame([(5,)], "v long")
    with pytest.raises(ValueError, match="sig_bits"):
        hdr_build(ok, "v", 0, 40)
    with pytest.raises(ValueError, match="max_bits"):
        hdr_build(ok, "v", 5, 63)
    mixed = hdr_build(ok, "v", 5, 40).unionByName(hdr_build(ok, "v", 5, 41), allowMissingColumns=False)
    with pytest.raises(Exception, match="mixed"):
        hdr_merge(mixed).collect()
    from kafka_workers_spark.functions.sketches import hdr_quantiles

    with pytest.raises(Exception, match="does not match"):
        hdr_quantiles(hdr_build(ok, "v", 6, 40), [0.5], sig_bits=5).collect()
    with pytest.raises(Exception, match="zero input"):
        hdr_merge(hdr_build(ok, "v", 5, 40).filter("sig_bits < 0")).collect()


def test_hdr_bucket_cross_engine_parity_random(spark):
    """The HDR bucket index and bucket lower bound agree BIT FOR BIT
    between Spark and DuckDB on random values across the full [0, 2^40)
    domain plus the exact/log boundary — the cross-engine surface the
    agg_hdr_quantiles oracle rides."""
    import random

    import duckdb

    from kafka_workers_spark.functions.sketches import (
        hdr_bucket,
        hdr_bucket_low,
        sql_hdr_bucket,
        sql_hdr_bucket_low,
    )

    rng = random.Random(29)
    vals = sorted(
        {rng.randrange(0, 1 << 40) for _ in range(2000)}
        | set(range(0, 130))
        | {(1 << 40) - 1, 1 << 20, (1 << 20) - 1}
    )
    b = 5
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.v: (r.idx, r.low)
        for r in df.select(
            "v",
            hdr_bucket(F.col("v"), b).alias("idx"),
            hdr_bucket_low(hdr_bucket(F.col("v"), b), b).alias("low"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    idx_sql = sql_hdr_bucket("v", b)
    duck = {
        v: (i, lo)
        for v, i, lo in con.execute(
            f"SELECT v, {idx_sql}, {sql_hdr_bucket_low(f'({idx_sql})', b)} FROM t"
        ).fetchall()
    }
    con.close()
    assert got == duck
    # the lower bound never exceeds its value (it IS the bucket's
    # smallest member — the roundtrip test pins bucket(low) == bucket(v))
    for v, (_idx, low) in got.items():
        assert low <= v


def test_kmv_build_merge_equals_whole_pass_and_estimates(spark):
    """Shard-merge == whole-pass bit for bit (the cms/bloom contract);
    the estimate is exact below k and within the ~1/sqrt(k-2) band
    above it; mixed-k merges raise."""
    import pytest as _pt

    from kafka_workers_spark.functions.sketches import (
        kmv_build,
        kmv_distinct_estimate,
        kmv_jaccard,
        kmv_merge,
    )

    n = 5000
    df = spark.createDataFrame(
        [(i % 2, f"v{i % 1250}") for i in range(n)], "g int, v string"
    )
    k = 64
    whole = kmv_build(df, "v", k=k)  # global group: 1250 distincts
    shards = kmv_build(df, "v", k=k, group_cols=["g"]).drop("g")
    merged = kmv_merge(shards)
    w, m = whole.collect()[0], merged.collect()[0]
    assert w.hashes == m.hashes and w.k == m.k == k
    est = whole.select(kmv_distinct_estimate("hashes", k).alias("e")).collect()[0].e
    assert abs(est - 1250) / 1250 < 4 / (k - 2) ** 0.5
    # unsaturated: exact
    small = kmv_build(df.filter("v IN ('v1','v2','v3')"), "v", k=k)
    got = small.select(kmv_distinct_estimate("hashes", k).alias("e")).collect()[0].e
    assert got == 3.0
    # jaccard: identical sets -> 1.0; disjoint -> 0.0
    a = kmv_build(df, "v", k=k).select(F.col("hashes").alias("ha"))
    b = kmv_build(df, "v", k=k).select(F.col("hashes").alias("hb"))
    j = a.crossJoin(b).select(kmv_jaccard("ha", "hb", k).alias("j")).collect()[0].j
    assert j == 1.0
    c = kmv_build(
        spark.createDataFrame([(f"w{i}",) for i in range(500)], "v string"), "v", k=k
    ).select(F.col("hashes").alias("hb"))
    j0 = a.crossJoin(c).select(kmv_jaccard("ha", "hb", k).alias("j")).collect()[0].j
    assert j0 == 0.0
    mixed = kmv_build(df, "v", k=k).unionByName(kmv_build(df, "v", k=32))
    with _pt.raises(Exception, match="mixed k"):
        kmv_merge(mixed).collect()


def test_kmv_jaccard_tracks_true_overlap(spark):
    from kafka_workers_spark.functions.sketches import kmv_build, kmv_jaccard

    # |A|=1000, |B|=1000, |A∩B|=500 -> true J = 500/1500
    k = 128
    a_vals = [(f"x{i}",) for i in range(1000)]
    b_vals = [(f"x{i}",) for i in range(500, 1500)]
    a = kmv_build(spark.createDataFrame(a_vals, "v string"), "v", k=k).select(
        F.col("hashes").alias("ha")
    )
    b = kmv_build(spark.createDataFrame(b_vals, "v string"), "v", k=k).select(
        F.col("hashes").alias("hb")
    )
    j = a.crossJoin(b).select(kmv_jaccard("ha", "hb", k).alias("j")).collect()[0].j
    assert abs(j - 1 / 3) < 4 / (k ** 0.5)


@pytest.mark.slow
def test_streaming_kmv_rollup_equals_whole_pass(spark, tmp_path):
    """The index-once/update-incrementally shape for KMV under
    Structured Streaming: each micro-batch builds its own sketch in
    foreachBatch and appends it to a stored sketch table; merging the
    stored rows afterwards equals the whole-pass sketch over all data
    BIT FOR BIT (kmv_merge exactness is what makes per-batch rollup
    sound — the streaming analog of the shard-merge pin)."""
    from kafka_workers_spark.functions.sketches import kmv_build, kmv_merge

    src = str(tmp_path / "src")
    store = str(tmp_path / "sketches")
    k = 32
    spark.createDataFrame(
        [(f"v{i}",) for i in range(300)], "v string"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(f"v{i}",) for i in range(150, 450)], "v string"
    ).coalesce(1).write.mode("append").parquet(src)

    def land(batch_df, batch_id):
        kmv_build(batch_df, "v", k=k).write.mode("append").parquet(store)

    stream = (
        spark.readStream.schema("v string").option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stored = spark.read.parquet(store)
    assert stored.count() >= 2  # one sketch row per non-empty micro-batch
    merged = kmv_merge(stored).collect()[0]
    whole = kmv_build(spark.read.parquet(src), "v", k=k).collect()[0]
    assert merged.hashes == whole.hashes and merged.k == whole.k == k


def test_bloom_pruned_join_identical_results_and_prunes(spark):
    """Pruned join == plain join exactly (FPs are dropped by the exact
    join); the probe really prunes (survivor count ~ matching fraction);
    outer joins refuse."""
    from kafka_workers_spark.functions.sketches import bloom_pruned_join

    big = spark.createDataFrame(
        [(i, f"p{i}") for i in range(5000)], "k long, payload string"
    )
    small = spark.createDataFrame(
        [(i * 50, f"d{i}") for i in range(40)], "k long, dim string"
    )
    got = sorted(map(tuple, bloom_pruned_join(big, small, "k").collect()))
    want = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == want and len(want) == 40
    semi = sorted(
        r.k for r in bloom_pruned_join(big, small, "k", how="left_semi").collect()
    )
    assert semi == sorted(r.k for r in big.join(small, "k", "left_semi").collect())
    import pytest as _pt

    with _pt.raises(ValueError, match="inner/left_semi"):
        bloom_pruned_join(big, small, "k", how="left")


def test_kmv_merge_mixed_k_raises_even_under_column_pruning(spark):
    """The mixed-k guard must survive a consumer that selects ONLY the
    hashes column — a projected raise would be elided by column pruning
    (the pq_encode lazy-guard lesson); the filter-guard is not."""
    import pytest as _pt

    from kafka_workers_spark.functions.sketches import kmv_build, kmv_merge

    df = spark.createDataFrame([(f"v{i}",) for i in range(200)], "v string")
    mixed = kmv_build(df, "v", k=64).unionByName(kmv_build(df, "v", k=32))
    with _pt.raises(Exception, match="mixed k"):
        kmv_merge(mixed).select("hashes").collect()


def test_kmv_containment_detects_subset_where_jaccard_hides_it(spark):
    """A 200-element set fully inside a 4000-element set: Jaccard ~ 0.05
    but containment ~ 1.0; reversed containment ~ |A|/|B|; disjoint -> 0."""
    from kafka_workers_spark.functions.sketches import (
        kmv_build,
        kmv_containment,
        kmv_jaccard,
    )

    k = 128
    small = kmv_build(
        spark.createDataFrame([(f"x{i}",) for i in range(200)], "v string"), "v", k=k
    ).select(F.col("hashes").alias("ha"))
    bigd = kmv_build(
        spark.createDataFrame([(f"x{i}",) for i in range(4000)], "v string"), "v", k=k
    ).select(F.col("hashes").alias("hb"))
    row = small.crossJoin(bigd).select(
        kmv_containment("ha", "hb", k).alias("c_small_in_big"),
        kmv_containment("hb", "ha", k).alias("c_big_in_small"),
        kmv_jaccard("ha", "hb", k).alias("j"),
    ).collect()[0]
    assert row.c_small_in_big > 0.9
    assert abs(row.c_big_in_small - 200 / 4000) < 0.15
    assert row.j < 0.2
    other = kmv_build(
        spark.createDataFrame([(f"z{i}",) for i in range(300)], "v string"), "v", k=k
    ).select(F.col("hashes").alias("hb"))
    j0 = small.crossJoin(other).select(
        kmv_containment("ha", "hb", k).alias("c")
    ).collect()[0].c
    assert j0 == 0.0
