"""int8-quantized-storage recall rep (VERDICT r04 item 8).

Measures what int8 storage (operators.similarity.quantize_embeddings)
costs in recall@k when the quantized corpus feeds IVF search, on the
same synthetic sf1* corpus as scripts/stress_dedup.py (20k vectors =
10 replicas of sf0.1's embeddings — verbatim replicas, so the corpus is
duplicate-cluster-heavy and near-ties abound; an adversarial setting
for quantization, which perturbs exactly those near-ties).

Three comparisons against the exact float brute-force top-k (ivf_topk
probing ALL lists reproduces brute force — its documented property):

  - float IVF at nprobe 1/2/4: the probe-pruning cost alone
  - int8->dequantized IVF at the same nprobes: storage + pruning
  - int8->dequantized probing ALL lists: the pure storage cost

One KMeans model (trained on the float corpus, fixed seed) assigns both
corpora, so list membership is identical and the delta isolates the
quantized vectors' effect on scoring, not on clustering.

    python scripts/recall_quantized.py [--replicas 10]

Round-6 (--jitter, VERDICT r05 #6): the round-5 zero-recall-cost
finding is duplicate-heavy-specific — verbatim replicas give the top-10
wide cosine margins that int8's O(1/255) distortion cannot flip. The
jitter mode perturbs each REPLICA's components with deterministic
per-(vec_id, dim) noise of relative size eps, so a query's replica
cluster becomes a band of near-ties with margins that TIGHTEN as eps
shrinks, and sweeps eps for the first nonzero int8 delta at full probe
(the pure storage cost):

    python scripts/recall_quantized.py --jitter 0.001,0.003,0.01,0.03

Round-6 (--pq): the same question for product quantization
(operators.similarity.pq_train / pq_adc_topk), whose distortion is far
coarser than int8's (m·log2(k) BITS per vector, not 8 bits per
component) — so unlike int8 it should show recall loss even on the
wide-margin replica corpus, and the measurement grades the documented
production discipline instead: ADC top-k raw, ADC shortlist→exact
re-rank (rerank_exact), and the IVFADC composition (ivf_pq_topk) at a
narrow nprobe. Exact baseline = brute-force integer squared L2 (the
metric ADC approximates).

    python scripts/recall_quantized.py --pq

Numbers go into PLANS.md (round-5 + round-6 addenda).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP_K = 10
K_LISTS = 32
N_QUERIES = 32


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument(
        "--jitter",
        type=str,
        default=None,
        help="comma-separated relative-noise eps values; sweeps the pure "
        "int8 storage cost on margin-tightened replica corpora",
    )
    ap.add_argument(
        "--pq",
        action="store_true",
        help="measure PQ ADC / shortlist-rerank / IVFADC recall vs exact L2",
    )
    args = ap.parse_args()

    from scripts.stress_dedup import DST, build_corpus

    build_corpus(args.replicas)

    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("recall_quantized")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_workers_spark.operators.similarity import (
        dequantize_embeddings,
        ivf_topk,
        quantize_embeddings,
        recall_at_k,
        train_ivf,
    )
    from kafka_workers_spark.sources.files import load_table

    emb = load_table(spark, DST, "embeddings").select("vec_id", "embedding")
    qids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(N_QUERIES).collect()]

    if args.pq:
        from pyspark.sql import functions as F  # noqa: F811

        from kafka_workers_spark.operators.dedup import embedding_fixed, explode_fixed
        from kafka_workers_spark.operators.similarity import (
            ivf_pq_topk,
            kmeans_fixed,
            pq_adc_topk,
            pq_train,
            rerank_exact,
        )

        vecs = emb.select("vec_id", embedding_fixed(F.col("embedding")).alias("v6"))
        comp = explode_fixed(vecs, ["vec_id"]).persist()
        comp.count()
        q = comp.filter(F.col("vec_id").isin(qids))

        # exact integer squared-L2 top-k — the metric ADC approximates
        t0 = time.perf_counter()
        qside = q.select(F.col("vec_id").alias("query_id"), "i", F.col("x").alias("qx"))
        diff = F.col("qx") - F.col("x")
        from pyspark.sql import Window as W

        wex = W.partitionBy("query_id").orderBy(F.asc("d6"), F.asc("neighbor_id"))
        exact = (
            comp.join(F.broadcast(qside), "i")
            .filter(F.col("query_id") != F.col("vec_id"))
            .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
            .agg(F.sum(diff * diff).alias("d6"))
            .withColumn("rank", F.row_number().over(wex))
            .filter(F.col("rank") <= TOP_K)
            .persist()
        )
        exact.count()
        print(f"exact L2 brute-force ({time.perf_counter() - t0:.1f}s)")

        for m, k in ((4, 16), (8, 64)):
            t0 = time.perf_counter()
            cents, codes = pq_train(
                comp, m=m, dim=64, k=k, iters=2,
                train=comp.filter(F.col("vec_id") % 4 == 0),
            )
            cents = cents.persist()
            codes = codes.persist()
            codes.count()
            t_train = time.perf_counter() - t0

            t0 = time.perf_counter()
            adc = pq_adc_topk(codes, cents, q, dsub=64 // m, k_top=TOP_K)
            r_adc = recall_at_k(adc, exact, TOP_K)
            t_adc = time.perf_counter() - t0

            t0 = time.perf_counter()
            short = pq_adc_topk(codes, cents, q, dsub=64 // m, k_top=5 * TOP_K)
            rr = rerank_exact(short, comp, q, k_top=TOP_K)
            r_rr = recall_at_k(rr, exact, TOP_K)
            t_rr = time.perf_counter() - t0

            print(
                f"PQ m={m} k={k:<3d} train={t_train:.1f}s  "
                f"ADC recall@{TOP_K}={r_adc:.4f} ({t_adc:.1f}s)  "
                f"ADC top-{5 * TOP_K}→exact-rerank recall@{TOP_K}={r_rr:.4f} ({t_rr:.1f}s)",
                flush=True,
            )

            if (m, k) == (8, 64):
                ivf_cents, assign = kmeans_fixed(
                    comp, k=K_LISTS, iters=2,
                    train=comp.filter(F.col("vec_id") % 4 == 0),
                )
                ivf_cents = ivf_cents.persist()
                assign = assign.persist()
                assign.count()
                for nprobe in (4, K_LISTS):
                    t0 = time.perf_counter()
                    comp_topk = ivf_pq_topk(
                        codes, cents, assign, ivf_cents, q,
                        dsub=64 // m, nprobe=nprobe, k_top=TOP_K,
                    )
                    r_c = recall_at_k(comp_topk, exact, TOP_K)
                    print(
                        f"IVFADC m={m} k={k} nprobe={nprobe:<3d} "
                        f"recall@{TOP_K}={r_c:.4f} ({time.perf_counter() - t0:.1f}s)",
                        flush=True,
                    )
                ivf_cents.unpersist()
                assign.unpersist()
            cents.unpersist()
            codes.unpersist()
        return 0

    if args.jitter is not None:
        from scripts.stress_dedup import ID_STRIDE

        def jittered(eps: float):
            """Replica components scaled by (1 + eps*u), u deterministic
            per (vec_id, dim) in [-1, 1]; replica 0 stays verbatim so
            every query keeps an exact self-match."""
            u = lambda i: (  # noqa: E731
                F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(2001)) - 1000
            ).cast("double") / 1000.0
            pert = F.transform(
                F.col("embedding"),
                lambda x, i: (x.cast("double") * (1.0 + eps * u(i))).cast("float"),
            )
            return emb.select(
                "vec_id",
                F.when(F.col("vec_id") >= ID_STRIDE, pert)
                .otherwise(F.col("embedding"))
                .alias("embedding"),
            )

        for eps in [float(e) for e in args.jitter.split(",")]:
            corpus = jittered(eps)
            model, af = train_ivf(corpus, k=K_LISTS)
            af = af.persist()
            deq = dequantize_embeddings(
                quantize_embeddings(corpus).drop("embedding"), out_col="embedding"
            )
            feats = deq.withColumn(
                "__features", array_to_vector(F.col("embedding").cast("array<double>"))
            )
            aq = (
                model.transform(feats)
                .withColumn("list_id", F.col("__list").cast("int"))
                .drop("__features", "__list")
                .persist()
            )
            exact = ivf_topk(af, qids, nprobe=K_LISTS, top_k=TOP_K).persist()
            exact.count()
            r_store = recall_at_k(
                ivf_topk(aq, qids, nprobe=K_LISTS, top_k=TOP_K), exact, TOP_K
            )
            r_probe4 = recall_at_k(
                ivf_topk(aq, qids, nprobe=4, top_k=TOP_K), exact, TOP_K
            )
            print(
                f"eps={eps:<7g} int8 all-lists recall@{TOP_K}={r_store:.4f} "
                f"(pure storage)  int8 nprobe=4 recall@{TOP_K}={r_probe4:.4f}",
                flush=True,
            )
            for df in (af, aq, exact):
                df.unpersist()
        return 0

    model, assigned_f = train_ivf(emb, k=K_LISTS)
    assigned_f = assigned_f.persist()

    # int8 storage round-trip, assigned by the SAME model (list parity)
    deq = dequantize_embeddings(
        quantize_embeddings(emb).drop("embedding"), out_col="embedding"
    )
    feats = deq.withColumn(
        "__features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    assigned_q = (
        model.transform(feats)  # train_ivf's model predicts into "__list"
        .withColumn("list_id", F.col("__list").cast("int"))
        .drop("__features", "__list")
        .persist()
    )

    t0 = time.perf_counter()
    exact = ivf_topk(assigned_f, qids, nprobe=K_LISTS, top_k=TOP_K).persist()
    exact.count()
    print(f"exact float brute-force ({time.perf_counter() - t0:.1f}s)")

    rows = []
    for label, assigned in (("float", assigned_f), ("int8", assigned_q)):
        for nprobe in (1, 2, 4, K_LISTS):
            t0 = time.perf_counter()
            approx = ivf_topk(assigned, qids, nprobe=nprobe, top_k=TOP_K)
            r = recall_at_k(approx, exact, TOP_K)
            rows.append((label, nprobe, r))
            print(
                f"{label:6s} nprobe={nprobe:3d} recall@{TOP_K}={r:.4f} "
                f"({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
