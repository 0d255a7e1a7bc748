"""Model-scoring stage (operators/scoring.py): Arrow-batched scoring with
injectable models — broadcast bytes, per-worker lazy load, composition
with quality-threshold sampling."""

from __future__ import annotations

import pandas as pd
import pytest

from kafka_workers_spark.operators.scoring import heuristic_scorer, score_documents
from kafka_workers_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def test_score_documents_default_heuristic(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    out = score_documents(docs)
    rows = out.collect()
    assert out.columns == ["doc_id", "text", "score"]
    assert len(rows) == docs.count()
    assert all(r.score is not None and 0.0 <= r.score <= 1.0 for r in rows)
    # deterministic: pandas-side recompute matches exactly
    pdf = docs.toPandas().sort_values("doc_id")
    want = heuristic_scorer(pdf["text"])
    got = {r.doc_id: r.score for r in rows}
    for doc_id, w in zip(pdf["doc_id"], want):
        assert got[doc_id] == pytest.approx(w, abs=1e-12)


def test_score_documents_injected_model_loader(spark):
    """model_loader receives the broadcast bytes once per worker and the
    returned scorer runs per batch — the real-model plumbing, with a
    fake 'model' that scores by a parameter carried in the bytes."""
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbbbbbb")], "doc_id long, text string"
    )

    def loader(blob: bytes):
        factor = float(blob.decode())

        def scorer(texts: pd.Series) -> pd.Series:
            return texts.str.len() * factor

        return scorer

    out = {r.doc_id: r.score for r in score_documents(
        docs, model_loader=loader, model_bytes=b"0.5").collect()}
    assert out == {1: 2.0, 2: 4.0}


def test_model_payload_degrades_without_spark_context(spark):
    """Spark Connect has no sparkContext: the model bytes must ship in
    the closure instead of a broadcast (the per-process load cache
    still deduplicates the expensive LOAD). The payload decision is the
    Connect-sensitive part, so it is tested directly against a session
    double with no sparkContext — the same guard family as
    operators.dedup.spread (ADVICE r05)."""
    from kafka_workers_spark.operators.scoring import _model_payload

    loader = object()
    # classic: broadcast, nothing in the closure
    bc, closure = _model_payload(spark, loader, b"m")
    assert bc is not None and bc.value == b"m" and closure is None
    bc.unpersist()

    class NoContext:  # Connect double: the attribute simply doesn't exist
        pass

    bc, closure = _model_payload(NoContext(), loader, b"m")
    assert bc is None and closure == b"m"
    # no model at all: nothing ships either way
    assert _model_payload(NoContext(), None, None) == (None, None)


def test_score_documents_feeds_quality_sampling(spark):
    from kafka_workers_spark.pipeline import sample_by_quality

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    scored = score_documents(docs)
    kept = sample_by_quality(scored, "score", 0.5)
    n, total = kept.count(), docs.count()
    assert 0 < n <= total * 0.6


def test_score_documents_rejects_column_collision(spark):
    docs = spark.createDataFrame([(1, "x", 0.1)], "doc_id long, text string, score double")
    with pytest.raises(ValueError, match="already exists"):
        score_documents(docs)
