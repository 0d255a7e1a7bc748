"""sf1-scale stress rep of the dedup family (VERDICT r03 item 10).

No sf1 fixture exists, so this builds one: a 10x near-duplicate-heavy
corpus (50k documents / 20k embeddings) derived from sf0.1 — replica 0
is the original; replicas 1-9 append a replica token (near-dups for the
text family) and reuse the embedding verbatim (worst-case duplicate
groups for the cosine family). That makes every document a member of a
~10-strong duplicate cluster: a deliberately ADVERSARIAL distribution
for LSH banding, whose join cost is Σ bucket².

    python scripts/stress_dedup.py [--replicas 10]

Prints per-query wall time at sf0.1 vs the synthetic sf1, candidate-pair
counts, and the largest band-bucket sizes; findings go into PLANS.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/kws_sf1"
ID_STRIDE = 1_000_000


def build_corpus(replicas: int) -> None:
    import duckdb

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(f"{DST}/documents.parquet", exist_ok=True)
    os.makedirs(f"{DST}/embeddings.parquet", exist_ok=True)
    con = duckdb.connect()
    for i in range(replicas):
        suffix = "" if i == 0 else f" || ' replica token r{i}'"
        con.execute(
            f"""
            COPY (
              SELECT doc_id + {i * ID_STRIDE} AS doc_id, text{suffix} AS text,
                     lang, source, n_chars
              FROM '{SRC}/documents.parquet'
            ) TO '{DST}/documents.parquet/part-{i:02d}.parquet' (FORMAT PARQUET)
            """
        )
        con.execute(
            f"""
            COPY (
              SELECT vec_id + {i * ID_STRIDE} AS vec_id, embedding, label
              FROM '{SRC}/embeddings.parquet'
            ) TO '{DST}/embeddings.parquet/part-{i:02d}.parquet' (FORMAT PARQUET)
            """
        )
    con.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    build_corpus(args.replicas)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress_dedup")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_workers_spark.queries import load_all

    reg = load_all()
    family = [
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
    ]
    print(f"== corpus: {args.replicas}x sf0.1 -> {DST}")
    for name in family:
        for sf_dir, tag in ((SRC, "sf0.1"), (DST, "sf1*")):
            t0 = time.perf_counter()
            n = reg[name].fn(spark, sf_dir).count()
            print(f"{name:28s} {tag:6s} {time.perf_counter() - t0:7.2f}s  rows={n}",
                  flush=True)

    # band-bucket skew for the LSH blocking join (dedup_minhash_lsh's
    # candidate generator): Σ bucket² is the pair-join cost driver
    from kafka_workers_spark.operators.dedup import lsh_bands, minhash_agg
    from kafka_workers_spark.operators.text import shingle_stage, tokenize_stage
    from kafka_workers_spark.sources.files import load_table

    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "sf1*")):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        staged = shingle_stage(tokenize_stage(docs), 3, distinct=True)
        sigs = minhash_agg(staged, ["doc_id"], k=8)
        banded = sigs.select(
            "doc_id", F.explode(lsh_bands(F.col("sig"), 4, 2)).alias("bk")
        )
        stats = (
            banded.groupBy("bk")
            .count()
            .agg(
                F.count("*").alias("buckets"),
                F.max("count").alias("max_bucket"),
                F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
            )
            .first()
        )
        print(
            f"lsh buckets {tag:6s} buckets={stats.buckets} "
            f"max_bucket={stats.max_bucket} sum_sq={stats.sum_sq}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
