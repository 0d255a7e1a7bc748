"""Similarity search over the `embeddings` table (64-dim float vectors).

Brute-force cosine top-k is the exact baseline; the IVF variant prunes the
candidate set to the query's coarse cluster (the `label` column stands in
for a k-means assignment — at 100 TB you'd train centroids with
pyspark.ml KMeans and assign once at ingest). Both use the fixed-point
integer dot products from operators/dedup.py so the DuckDB oracle is
bit-identical.

Scale shape: queries are a tiny table → broadcast; candidates stream
through map tasks (no shuffle of the big side); top-k is a per-query
window over (query_id) — shuffle proportional to queries × candidates
only AFTER the cheap filter, and the IVF path cuts candidates ~10× per
probe before any distance math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_workers_spark.operators.dedup import (
    barrier,
    cosine_from_fixed,
    embedding_fixed,
    explode_fixed,
    norms_fixed,
    sql_cosine_from_fixed,
    sql_dot_fixed,
    sql_embedding_fixed,
)
from kafka_workers_spark.queries import register
from kafka_workers_spark.sources.files import load_table

_DIM = 64
_EMB6 = sql_embedding_fixed("embedding")
N_QUERIES = 8
TOP_K = 5


def _vectors_exploded(spark: SparkSession, sf_dir: str):
    """(long-format vectors, norms) — the join-aggregate dot-product inputs
    (see operators.dedup.pairwise_dots_fixed for why this shape: all
    codegen, no interpreted lambdas, no Python in the hot path)."""
    e = load_table(spark, sf_dir, "embeddings")
    vecs = barrier(
        e.select("vec_id", "label", embedding_fixed(F.col("embedding")).alias("v6"))
    )
    exploded = explode_fixed(vecs, ["vec_id", "label"])
    norms = norms_fixed(exploded, ["vec_id"])
    return exploded, norms


def _ann_scored(exploded: DataFrame, norms: DataFrame, same_label: bool) -> DataFrame:
    q = (
        exploded.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("i").alias("qi"),
            F.col("x").alias("qx"),
        )
    )
    cond = (F.col("qi") == F.col("i")) & (F.col("query_id") != F.col("vec_id"))
    if same_label:
        cond = cond & (F.col("qlabel") == F.col("label"))
    dots = (
        exploded.join(F.broadcast(q), cond)
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("qx") * F.col("x")).alias("dot6"))
    )
    qn = norms.withColumnRenamed("vec_id", "query_id").withColumnRenamed("norm6", "qn")
    return (
        dots.join(F.broadcast(qn), "query_id")
        .join(F.broadcast(norms), "vec_id")
        .select(
            "query_id",
            "vec_id",
            cosine_from_fixed(F.col("dot6"), F.col("qn"), F.col("norm6")).alias("cosine"),
        )
    )


def _topk(pairs: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cosine")
    )


_SQL_VECS = f"""
      SELECT vec_id, label, {_EMB6} AS v6,
             {sql_dot_fixed(_EMB6, _EMB6, _DIM)} AS norm6
      FROM embeddings
"""


@register(
    "ann_cosine_topk",
    f"""
    WITH vecs AS ({_SQL_VECS}),
    queries AS (SELECT * FROM vecs WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {sql_cosine_from_fixed(sql_dot_fixed('q.v6', 'c.v6', _DIM), 'q.norm6', 'c.norm6')} AS cosine
      FROM queries q JOIN vecs c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, vec_id AS neighbor_id, rank, cosine FROM (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    category="similarity",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 8 vectors as queries.

    Plan: broadcast the (tiny) query vectors in long format against the
    candidate stream, codegen'd SUM per (query, candidate), then one
    window shuffle keyed by query_id for the top-k heap."""
    exploded, norms = _vectors_exploded(spark, sf_dir)
    return _topk(_ann_scored(exploded, norms, same_label=False), TOP_K)


NPROBE = 2


@register(
    "ann_ivf_topk",
    f"""
    WITH vecs AS ({_SQL_VECS}),
    queries AS (SELECT * FROM vecs WHERE vec_id < {N_QUERIES}),
    comp AS (
      SELECT label, r.i AS i, v6[r.i + 1] AS x FROM vecs, range({_DIM}) r(i)
    ),
    cents AS (
      SELECT label, i, SUM(x) AS sx, COUNT(*) AS cnt FROM comp GROUP BY label, i
    ),
    qcomp AS (
      SELECT vec_id AS query_id, r.i AS i, v6[r.i + 1] AS qx
      FROM queries, range({_DIM}) r(i)
    ),
    pscore AS (
      SELECT q.query_id, c.label,
             CAST(SUM(q.qx * c.sx) AS DOUBLE) / MAX(c.cnt) AS score
      FROM qcomp q JOIN cents c ON q.i = c.i
      GROUP BY q.query_id, c.label
    ),
    probe AS (
      SELECT query_id, label FROM (
        SELECT query_id, label,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, label) AS pr
        FROM pscore
      ) WHERE pr <= {NPROBE}
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {sql_cosine_from_fixed(sql_dot_fixed('q.v6', 'c.v6', _DIM), 'q.norm6', 'c.norm6')} AS cosine
      FROM queries q
      JOIN probe p ON p.query_id = q.vec_id
      JOIN vecs c ON c.label = p.label AND c.vec_id <> q.vec_id
    )
    SELECT query_id, vec_id AS neighbor_id, rank, cosine FROM (
      SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    category="similarity",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVF ANN with nprobe={NPROBE}: a coarse quantizer ranks the
    inverted lists by query·centroid (centroid = exact per-label component
    mean — integer sums, one double division, bit-identical across
    engines), then only the top-nprobe lists are scanned for exact cosines.

    Plan shape at 10⁹ vectors: the centroid table is n_clusters×dim (tiny,
    broadcast both ways), the candidate join is an equi-join on the list
    id, so each query touches ~nprobe/n_clusters of the data. Recall < 1.0
    by construction; ann_cosine_topk is the exact baseline, and
    operators/similarity.py trains real KMeans centroids for ingest-time
    assignment (recall@k pinned in tests/test_similarity.py)."""
    exploded, norms = _vectors_exploded(spark, sf_dir)
    cents = exploded.groupBy("label", "i").agg(
        F.sum("x").alias("sx"), F.count("*").alias("cnt")
    )
    q = exploded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("i").alias("qi"),
        F.col("x").alias("qx"),
    )
    pscore = (
        cents.join(F.broadcast(q), F.col("qi") == F.col("i"))
        .groupBy("query_id", "label")
        .agg(
            (F.sum(F.col("qx") * F.col("sx")).cast("double") / F.max("cnt")).alias("score")
        )
    )
    wprobe = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("label"))
    probe = (
        pscore.withColumn("pr", F.row_number().over(wprobe))
        .filter(F.col("pr") <= NPROBE)
        .select("query_id", F.col("label").alias("plabel"))
    )
    qp = q.join(F.broadcast(probe), "query_id")
    dots = (
        exploded.join(
            F.broadcast(qp),
            (F.col("qi") == F.col("i"))
            & (F.col("plabel") == F.col("label"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("qx") * F.col("x")).alias("dot6"))
    )
    qn = norms.withColumnRenamed("vec_id", "query_id").withColumnRenamed("norm6", "qn")
    scored = (
        dots.join(F.broadcast(qn), "query_id")
        .join(F.broadcast(norms), "vec_id")
        .select(
            "query_id",
            "vec_id",
            cosine_from_fixed(F.col("dot6"), F.col("qn"), F.col("norm6")).alias("cosine"),
        )
    )
    return _topk(scored, TOP_K)
