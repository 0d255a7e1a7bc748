"""ANN indexing operators: IVF with trained centroids.

The registered query (queries/similarity.py ann_ivf_topk) demonstrates the
IVF plan shape with oracle-checkable arithmetic; this module supplies the
production pieces that are not SQL-expressible: a coarse quantizer trained
with pyspark.ml KMeans, ingest-time list assignment, and a generic probed
search usable with any list assignment.

Scale shape (10⁹ vectors): training samples the corpus (KMeans on a
fraction is standard); assignment is one broadcast-scored map pass at
ingest; search touches ~nprobe/k of the data via an equi-join on the list
id. Probing every list degrades gracefully to the exact baseline — pinned
by the recall@k test (tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_workers_spark.operators.dedup import (
    cosine_from_fixed,
    embedding_fixed,
    explode_fixed,
    norms_fixed,
)


def train_ivf(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 7,
    list_col: str = "list_id",
):
    """Train a KMeans coarse quantizer and assign every vector to a list.

    Returns ``(model, assigned)`` where ``assigned`` is ``df`` plus an
    integer ``list_col``. Deterministic for a fixed seed. At scale, fit on
    ``df.sample(...)`` and reuse the model for streaming ingest via
    ``model.transform`` (a broadcast-scored map pass, no shuffle).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=k, seed=seed, featuresCol="__features", predictionCol="__list").fit(feats)
    assigned = (
        model.transform(feats)
        .withColumn(list_col, F.col("__list").cast("int"))
        .drop("__features", "__list")
    )
    return model, assigned


def ivf_topk(
    assigned: DataFrame,
    query_ids: list[int],
    nprobe: int,
    top_k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "list_id",
) -> DataFrame:
    """Cosine top-k over the ``nprobe`` inverted lists nearest each query.

    List ranking uses query·(list mean) — at KMeans convergence the list
    mean IS the trained centroid, so this probes exactly the model's
    nearest lists without shipping the model into the plan. All stages are
    codegen'd relational ops on fixed-point integers (operators/dedup.py);
    probing all lists reproduces the exact brute-force result.
    """
    vecs = assigned.select(id_col, list_col, embedding_fixed(F.col(vec_col)).alias("v6"))
    exploded = explode_fixed(vecs, [id_col, list_col])
    norms = norms_fixed(exploded, [id_col])

    cents = exploded.groupBy(list_col, "i").agg(
        F.sum("x").alias("sx"), F.count("*").alias("cnt")
    )
    q = exploded.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("i").alias("qi"), F.col("x").alias("qx")
    )
    pscore = (
        cents.join(F.broadcast(q), F.col("qi") == F.col("i"))
        .groupBy("query_id", list_col)
        .agg((F.sum(F.col("qx") * F.col("sx")).cast("double") / F.max("cnt")).alias("score"))
    )
    wprobe = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc(list_col))
    probe = (
        pscore.withColumn("pr", F.row_number().over(wprobe))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", F.col(list_col).alias("__plist"))
    )
    qp = q.join(F.broadcast(probe), "query_id")
    dots = (
        exploded.join(
            F.broadcast(qp),
            (F.col("qi") == F.col("i"))
            & (F.col("__plist") == F.col(list_col))
            & (F.col("query_id") != F.col(id_col)),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("qx") * F.col("x")).alias("dot6"))
    )
    qn = norms.withColumnRenamed(id_col, "query_id").withColumnRenamed("norm6", "qn")
    scored = (
        dots.join(F.broadcast(qn), "query_id")
        .join(F.broadcast(norms), id_col)
        .select(
            "query_id",
            id_col,
            cosine_from_fixed(F.col("dot6"), F.col("qn"), F.col("norm6")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "cosine")
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> float:
    """Mean fraction of the exact top-k recovered per query (driver-side —
    a test/evaluation metric over tiny top-k result sets, not a pipeline
    stage)."""
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    by_q: dict[int, int] = {}
    total: dict[int, int] = {}
    for r in exact.collect():
        total[r.query_id] = total.get(r.query_id, 0) + 1
        if (r.query_id, r.neighbor_id) in a:
            by_q[r.query_id] = by_q.get(r.query_id, 0) + 1
    if not total:
        return 0.0
    return sum(by_q.get(qid, 0) / min(k, n) for qid, n in total.items()) / len(total)
