"""End-to-end corpus curation: the composition a training-data pipeline
actually runs, built from this engine's operators.

quality-filter → exact dedup → near-dup (MinHash-LSH) removal → chunking.
Every stage is a DataFrame→DataFrame transform (no collect, no driver
loops), so the whole pipeline is one lazy plan the optimizer sees
end-to-end; at 100 TB each stage's shape is the one audited in
tests/test_plans.py (blocking-key equi-joins, codegen'd signature
aggregates, single-scan profiling).

The reference has no content operators (payloads are opaque bytes —
api/task/WorkerTask.java:50 leaves all of this to user code); this module
is the engine's answer to what that user code would need at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_workers_spark.operators.dedup import exact_dedup, lsh_bands, minhash_agg
from kafka_workers_spark.operators.text import (
    STOPWORDS,
    chunk_documents,
    normalized,
    shingle_stage,
    stopword_hits,
    tokenize_stage,
    tokens,
)


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    min_stop_ratio: float = 0.0,
    max_stop_ratio: float = 1.0,
) -> DataFrame:
    """Cheap heuristic pre-filter (length + stopword density) — the first
    pass of every corpus pipeline; pure column expressions, single scan."""
    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("bigint")
    stop_ratio = stopword_hits(toks, STOPWORDS["en"]).cast("double") / n
    return docs.filter(
        (n >= min_tokens) & (stop_ratio >= min_stop_ratio) & (stop_ratio <= max_stop_ratio)
    )


def near_dedup_lsh(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Drop near-duplicates: MinHash signatures → LSH banding → keep only
    documents that do not collide with a lower-id document.

    The survivor rule is the standard greedy one (any doc colliding with a
    lower id is dropped) — one left-anti join against the candidate-pair
    set, no connected components; a doc bridging two clusters removes both
    tails, which over-deletes slightly and never under-deletes. Pair cost
    is Σ bucket² via the band equi-join (operators/dedup.py scale notes).
    """
    staged = shingle_stage(tokenize_stage(docs.select(id_col, text_col)), shingle_n, distinct=True)
    sigs = minhash_agg(staged, [id_col], k=k)
    banded = sigs.select(
        id_col, F.explode(lsh_bands(F.col("sig"), n_bands, rows_per_band)).alias("bk")
    )
    a, b = banded.alias("a"), banded.alias("b")
    losers = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return docs.join(losers, id_col, "left_anti")


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """quality-filter → exact dedup (normalized text) → LSH near-dedup →
    overlapping chunks. Returns chunk rows ready for tokenization."""
    filtered = quality_filter(docs, text_col, min_tokens=min_tokens)
    exact = exact_dedup(
        filtered.withColumn("__norm", normalized(F.col(text_col))),
        content_col="__norm",
        id_col=id_col,
    ).drop("__norm")
    near = near_dedup_lsh(exact, id_col=id_col, text_col=text_col)
    return chunk_documents(near, text_col=text_col, id_col=id_col,
                           chunk_tokens=chunk_tokens, overlap=overlap)


def curate_corpus_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    min_tokens: int = 5,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Streaming curation: quality-filter → exact dedup within the
    watermark → chunking, all streaming-safe stages.

    Exact dedup uses the bounded-state streaming operator
    (streaming/dedup.py) keyed on the normalized-content digest, so state
    size tracks the watermark delay, not corpus size. LSH near-dedup is
    deliberately NOT in the streaming path: candidate pairing is a
    self-join over the whole corpus — in production it runs as a periodic
    batch compaction over the landed output (use :func:`near_dedup_lsh`
    there), not per micro-batch, which would only dedup within a batch
    and silently miss cross-batch near-duplicates.
    """
    from kafka_workers_spark.streaming.dedup import dedup_within_watermark

    filtered = quality_filter(docs, text_col, min_tokens=min_tokens)
    hashed = filtered.withColumn("__digest", F.md5(normalized(F.col(text_col))))
    exact = dedup_within_watermark(
        hashed, keys=["__digest"], ts_col=ts_col, delay=watermark, tiebreaker=id_col
    ).drop("__digest")
    return chunk_documents(exact, text_col=text_col, id_col=id_col,
                           chunk_tokens=chunk_tokens, overlap=overlap)
