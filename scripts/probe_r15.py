#!/usr/bin/env python
"""Round-15 optimization probe: time isolated sub-stages of the heavy
windowed queries (noop sink, cache-cleared) so optimization targets the
operator that actually costs, per guide §1. Not part of the bench contract.

Usage: python scripts/probe_r15.py <probe> [...]   (see PROBES below)
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

spark = build_session(WorkersConfig(app_name="probe_r15"))


def t(label, df):
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{dt:8.2f}s  {label}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


def w(label, fn):
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"{dt:8.2f}s  {label}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


def probe_cc_rebuild():
    """dedup_components_rebuild decomposition."""
    from kafka_workers_spark.operators.dedup import barrier
    from kafka_workers_spark.queries.dedup import (
        MINHASH_K, LSH_BANDS, LSH_ROWS, _cc_groups, _corpus_fingerprint,
    )
    from kafka_workers_spark.operators.dedup import lsh_bands
    from kafka_workers_spark.operators.text import tokenize_stage, shingle_stage

    w("fingerprint scan", lambda: _corpus_fingerprint(spark, SF))
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
    t("per_doc signatures", per_doc)
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
    pairs = mh.union(ng)
    t("pairs (mh+ng)", pairs)
    from kafka_workers_spark.operators.components import connected_components

    stats = {}
    w("cc loop", lambda: t(
        "cc result", connected_components(pairs, src="doc_a", dst="doc_b", stats=stats)
    ))
    print("cc rounds:", stats)
    w("full _cc_groups", lambda: t("cc_groups result", _cc_groups(spark, SF)))


def probe_frame_dedup():
    from kafka_workers_spark.operators.multimodal import (
        _frame_signatures, frame_dedup_pairs,
    )
    d = load_table(spark, SF, "documents")
    media = d.select("doc_id", F.to_binary(F.col("text"), F.lit("utf-8")).alias("payload"))
    sigs = _frame_signatures(media, 64, 1, "payload", "doc_id")
    t("frame signatures", sigs)
    t("full frame_dedup_pairs", frame_dedup_pairs(media, frame_len=64, every_nth=1,
                                                  max_hamming=3, min_match_frac=0.5))


def probe_graph():
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    t("edges build (no distinct)", edges)
    t("edges distinct", edges.distinct())
    from kafka_workers_spark.operators.components import bfs_hops, pagerank
    seeds = (
        load_table(spark, SF, "supplier")
        .select("s_suppkey", "s_acctbal")
        .orderBy("s_acctbal", "s_suppkey")
        .limit(3)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    t("bfs_hops 4", bfs_hops(edges, seeds, max_hops=4))
    t("pagerank 3", pagerank(edges, iters=3, damping_num=17, damping_den=20))


def probe_cluster():
    from kafka_workers_spark.operators.text import hashed_doc_vectors
    from kafka_workers_spark.operators.similarity import kmeans_fixed
    from pyspark.storagelevel import StorageLevel
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    vecs = hashed_doc_vectors(docs, dim=16, max_df_fraction=0.8).select(
        F.col("doc_id").alias("vec_id"), "i", "x"
    )
    t("hashed vectors", vecs)
    vecsP = vecs.persist(StorageLevel.MEMORY_AND_DISK)

    def lloyd():
        cents, assign = kmeans_fixed(vecsP, k=4, iters=2)
        assign.write.format("noop").mode("overwrite").save()

    w("lloyd loop (vecs pinned)", lloyd)
    from kafka_workers_spark.queries import load_all
    t("full text_cluster_topics", load_all()["text_cluster_topics"].fn(spark, SF))


def probe_simhash():
    from kafka_workers_spark.queries import load_all
    t("dedup_simhash_pairs", load_all()["dedup_simhash_pairs"].fn(spark, SF))


PROBES = {
    "cc": probe_cc_rebuild,
    "frame": probe_frame_dedup,
    "graph": probe_graph,
    "cluster": probe_cluster,
    "simhash": probe_simhash,
}

if __name__ == "__main__":
    for name in sys.argv[1:] or ["cc"]:
        print(f"=== probe {name} (SF={SF}) ===", flush=True)
        PROBES[name]()
    spark.stop()
