#!/usr/bin/env python
"""Round-16 optimization probe: isolated sub-stage timings (noop sink,
cache-cleared) + plan checks for the r16 targets. Not part of the bench
contract.

Usage: python scripts/probe_r16.py <probe> [...]   (see PROBES below)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_workers_spark import WorkersConfig, build_session
from kafka_workers_spark.sources.files import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# heavy sf0.1 rows (dedup_set_similarity) die on the default heap with
# GCLocker retries (the r15 verify-recipe gotcha) — size like the bench
spark = build_session(
    WorkersConfig(
        app_name="probe_r16",
        extra_confs={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")},
    )
)


def t(label, df, reps=1):
    best = None
    for _ in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.2f}s  {label}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def w(label, fn, reps=1):
    best = None
    for _ in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.2f}s  {label}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def _pairs():
    from kafka_workers_spark.queries.dedup import (
        MINHASH_K, LSH_BANDS, LSH_ROWS,
    )
    from kafka_workers_spark.operators.dedup import barrier, lsh_bands
    from kafka_workers_spark.operators.text import tokenize_stage, shingle_stage

    d = load_table(spark, SF, "documents")
    staged = shingle_stage(tokenize_stage(d.select("doc_id", "text")), 3)
    exploded = staged.select("doc_id", F.explode_outer("shingles").alias("__sh"))
    sig_mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("__sh")))).alias(f"__mh{i}")
        for i in range(MINHASH_K)
    ]
    per_doc = exploded.groupBy("doc_id").agg(
        *sig_mins,
        F.min(F.substring(F.md5("__sh"), 1, 16)).alias("block_key"),
    )
    per_doc = barrier(
        per_doc.select(
            "doc_id",
            F.array(*[F.col(f"__mh{i}") for i in range(MINHASH_K)]).alias("sig"),
            "block_key",
        )
    )
    bands = per_doc.select(
        "doc_id", F.explode(lsh_bands(F.col("sig"), LSH_BANDS, LSH_ROWS)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    mh = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    keyed = per_doc.filter(F.col("block_key").isNotNull())
    ka, kb = keyed.alias("ka"), keyed.alias("kb")
    ng = ka.join(
        kb,
        (F.col("ka.block_key") == F.col("kb.block_key"))
        & (F.col("ka.doc_id") < F.col("kb.doc_id")),
    ).select(F.col("ka.doc_id").alias("doc_a"), F.col("kb.doc_id").alias("doc_b"))
    return mh.union(ng)


def probe_cc(reps=2):
    """CC loop: rounds, wall, label checksum (order-independent)."""
    from kafka_workers_spark.operators.components import connected_components

    pairs = _pairs()
    stats = {}

    def loop():
        comp = connected_components(pairs, src="doc_a", dst="doc_b", stats=stats)
        row = comp.agg(
            F.count("*"), F.sum("comp"), F.sum(F.col("node") * F.col("comp"))
        ).collect()[0]
        print("   labels checksum:", tuple(row), "rounds:", stats.get("rounds"))

    w("cc loop (+checksum)", loop, reps=reps)


def probe_cc_row(reps=2):
    from kafka_workers_spark.queries import load_all
    fn = load_all()["dedup_components_rebuild"].fn
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        print(f"{time.perf_counter()-t0:8.2f}s  dedup_components_rebuild row", flush=True)


def probe_pairs(reps=2):
    t("pairs (mh+ng)", _pairs(), reps=reps)


def probe_graph(reps=2):
    from kafka_workers_spark.queries import load_all
    reg = load_all()
    for name in ("graph_bfs_reach", "graph_pagerank"):
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            reg[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
            print(f"{time.perf_counter()-t0:8.2f}s  {name}", flush=True)


def probe_setsim_ratio():
    """Candidate:survivor ratio for dedup_set_similarity (VERDICT r15 #3).

    Counts the candidate pairs the prefix join emits (post length +
    positional filters, post dedup) vs the verified output pairs."""
    from pyspark.sql import Window as W
    from kafka_workers_spark.queries import load_all
    from kafka_workers_spark.queries.dedup import _SSJ_NUM, _SSJ_DEN, normalized
    from kafka_workers_spark.operators.dedup import barrier

    num, den = _SSJ_NUM, _SSJ_DEN
    print("threshold:", num, "/", den)
    d = load_table(spark, SF, "documents")
    toked = barrier(
        d.select(
            "doc_id", F.array_distinct(F.split(normalized(F.col("text")), " ")).alias("toks")
        ).filter(F.length(normalized(F.col("text"))) > 0)
    )
    dig = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    toks = toked.select("doc_id", F.explode("toks").alias("__raw")).select(
        "doc_id", dig(F.col("__raw")).alias("__tok")
    )
    dfc = toks.groupBy("__tok").agg(F.count("*").alias("__df"))
    wp = W.partitionBy("doc_id").orderBy("__df", "__tok")
    ordered = toks.join(dfc, "__tok").select(
        "doc_id", "__tok",
        F.row_number().over(wp).alias("__pos"),
        F.count("*").over(W.partitionBy("doc_id")).alias("__n"),
    )
    prefix = ordered.filter(
        F.col("__pos") <= F.col("__n") - F.expr(f"({num} * __n + {den} - 1) DIV {den}") + 1
    ).select("doc_id", "__tok", "__n", "__pos")
    a = prefix.select(F.col("doc_id").alias("__ida"), F.col("__tok").alias("__t"),
                      F.col("__n").alias("__na"), F.col("__pos").alias("__pa"))
    b = prefix.select(F.col("doc_id").alias("__idb"), F.col("__tok").alias("__t"),
                      F.col("__n").alias("__nb"), F.col("__pos").alias("__pb"))
    alpha = F.expr(f"({num} * (__na + __nb) + {num} + {den} - 1) DIV ({num} + {den})")
    base = a.join(b, "__t").filter(
        (F.col("__ida") < F.col("__idb"))
        & (F.lit(den) * F.least("__na", "__nb") >= F.lit(num) * F.greatest("__na", "__nb"))
    )
    no_pos = base.select("__ida", "__idb").dropDuplicates(["__ida", "__idb"])
    with_pos = base.filter(
        1 + F.least(F.col("__na") - F.col("__pa"), F.col("__nb") - F.col("__pb")) >= alpha
    ).select("__ida", "__idb").dropDuplicates(["__ida", "__idb"])
    print("candidates (no positional filter):", no_pos.count())
    print("candidates (with positional filter):", with_pos.count())
    out = load_all()["dedup_set_similarity"].fn(spark, SF)
    print("survivors:", out.count())


def probe_cluster(reps=2):
    from kafka_workers_spark.queries import load_all
    reg = load_all()
    for name in ("text_cluster_topics", "ann_ivf_topk", "ann_pq_adc_topk"):
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            reg[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
            print(f"{time.perf_counter()-t0:8.2f}s  {name}", flush=True)


def probe_row():
    """Time arbitrary registered rows: probe_r16.py row <name> [reps]"""
    from kafka_workers_spark.queries import load_all, load_extra
    reg = load_all()
    reg.update(load_extra())
    args = [a for a in sys.argv[2:]]
    reps = int(args[-1]) if args and args[-1].isdigit() else 2
    names = [a for a in args if not a.isdigit()]
    for name in names:
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            reg[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
            print(f"{time.perf_counter()-t0:8.2f}s  {name}", flush=True)


PROBES = {
    "cc": probe_cc,
    "ccrow": probe_cc_row,
    "pairs": probe_pairs,
    "graph": probe_graph,
    "setsim": probe_setsim_ratio,
    "cluster": probe_cluster,
    "row": probe_row,
}



def probe_cc_ab():
    """Interleaved same-session A/B of the CC loop variants (box noise is
    ±20% across sessions): steps-per-action x pin-intermediate."""
    from kafka_workers_spark.operators import components as C

    pairs = _pairs()
    variants = [(1, False), (2, True), (2, False), (3, True)]
    results = {v: [] for v in variants}
    rounds_of = {}
    for rep in range(3):
        for v in variants:
            C._CC_STEPS_PER_ACTION, C._CC_PIN_INTERMEDIATE = v
            spark.catalog.clearCache()
            stats = {}
            t0 = time.perf_counter()
            comp = C.connected_components(pairs, src="doc_a", dst="doc_b", stats=stats)
            row = comp.agg(
                F.count("*"), F.sum("comp"), F.sum(F.col("node") * F.col("comp"))
            ).collect()[0]
            dt = time.perf_counter() - t0
            results[v].append(dt)
            rounds_of[v] = (stats.get("rounds"), tuple(row))
            print(f"  rep{rep} steps={v[0]} pin={v[1]}: {dt:6.2f}s rounds={stats.get('rounds')}", flush=True)
    C._CC_STEPS_PER_ACTION, C._CC_PIN_INTERMEDIATE = 2, True  # adopted defaults
    for v in variants:
        print(f"steps={v[0]} pin={v[1]}: min {min(results[v]):6.2f}s med {sorted(results[v])[1]:6.2f}s rounds/checksum {rounds_of[v]}")


PROBES["cc_ab"] = probe_cc_ab


def probe_kmeans_ab():
    """Interleaved A/B: _KMEANS_PIN_WIDE off/on over the kmeans consumers."""
    from kafka_workers_spark.operators import similarity as S
    from kafka_workers_spark.queries import load_all
    reg = load_all()
    names = ("text_cluster_topics", "ann_ivf_topk", "ann_semantic_dedup")
    res = {}
    for rep in range(3):
        for pin in (False, True):
            S._KMEANS_PIN_WIDE = pin
            for name in names:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                reg[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
                res.setdefault((name, pin), []).append(time.perf_counter() - t0)
    S._KMEANS_PIN_WIDE = True  # adopted default
    for (name, pin), xs in sorted(res.items()):
        print(f"{name} pin={pin}: min {min(xs):6.2f} med {sorted(xs)[len(xs)//2]:6.2f} {['%.2f'%x for x in xs]}")


PROBES["kmeans_ab"] = probe_kmeans_ab


def probe_bpe_ab():
    """Interleaved A/B: _BPE_PIN_SYMS0 off/on on the text_bpe_train row."""
    from kafka_workers_spark.operators import text as T
    from kafka_workers_spark.queries import load_all
    fn = load_all()["text_bpe_train"].fn
    res = {}
    for rep in range(3):
        for pin in (False, True):
            T._BPE_PIN_SYMS0 = pin
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            res.setdefault(pin, []).append(time.perf_counter() - t0)
    T._BPE_PIN_SYMS0 = True  # adopted default
    for pin, xs in res.items():
        print(f"bpe pin={pin}: min {min(xs):6.2f} med {sorted(xs)[len(xs)//2]:6.2f} {['%.2f'%x for x in xs]}")


PROBES["bpe_ab"] = probe_bpe_ab

if __name__ == "__main__":
    names = [a for a in sys.argv[1:] if a in PROBES] or ["cc"]
    for name in names:
        print(f"=== probe {name} (SF={SF}) ===", flush=True)
        PROBES[name]()
    spark.stop()
