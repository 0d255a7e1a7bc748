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


# --- multinomial Naive Bayes (operators/classify.py) -----------------------

_FRUIT = ["apple banana cherry mango", "banana mango apple", "cherry apple banana mango banana"]
_METAL = ["iron copper zinc steel", "copper steel iron", "zinc iron copper steel copper"]


def _nb_corpus(spark):
    rows = [(i, t, "fruit") for i, t in enumerate(_FRUIT * 8)] + [
        (100 + i, t, "metal") for i, t in enumerate(_METAL * 8)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_nb_learns_separable_classes_and_breaks_ties_deterministically(spark):
    """On a separable corpus the classifier must be perfect on held-out
    docs from either vocabulary; a document carrying NO features scores
    priors only, and an exact posterior tie resolves to the smallest
    label string — never arbitrarily."""
    from kafka_workers_spark.operators.classify import nb_classify, nb_train

    model = nb_train(_nb_corpus(spark), "lang", n_buckets=512)
    test = spark.createDataFrame(
        [(900, "apple mango"), (901, "steel zinc"), (902, "mango banana cherry"),
         (903, "iron iron copper"), (904, None)],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.predicted_label for r in nb_classify(test, model).collect()}
    assert got[900] == "fruit" and got[902] == "fruit"
    assert got[901] == "metal" and got[903] == "metal"
    # 904: no features, equal priors (24 docs each) → exact tie → min label
    assert got[904] == "fruit"


def test_nb_score_matches_python_reference(spark):
    """log_posterior differential test vs a plain-Python NB (the DSIR
    float discipline): same md5 feature hashing, add-α smoothing,
    smoothed floor for buckets a label never saw."""
    import hashlib
    import math
    import re
    from collections import Counter

    from kafka_workers_spark.operators.classify import nb_score, nb_train

    n_buckets, alpha = 512, 1.0

    def feats(text):
        t = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()
        ts = [w for w in t.split(" ") if w]
        fs = ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        return [int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % n_buckets for f in fs]

    corpus = _nb_corpus(spark)
    train_rows = corpus.collect()
    counts: dict[str, Counter] = {}
    docs_per: Counter = Counter()
    toks_per: Counter = Counter()
    for r in train_rows:
        bs = feats(r.text)
        counts.setdefault(r.lang, Counter()).update(bs)
        docs_per[r.lang] += 1
        toks_per[r.lang] += len(bs)
    total_docs = sum(docs_per.values())

    def ref_lp(text, label):
        lp = math.log(docs_per[label]) - math.log(total_docs)
        for b in feats(text):
            lp += math.log(counts[label][b] + alpha) - math.log(
                toks_per[label] + alpha * n_buckets
            )
        return lp

    test = spark.createDataFrame(
        [(900, "apple mango"), (901, "steel zinc apple")], ["doc_id", "text"]
    )
    model = nb_train(corpus, "lang", n_buckets=n_buckets, alpha=alpha)
    for r in nb_score(test, model).collect():
        txt = {900: "apple mango", 901: "steel zinc apple"}[r.doc_id]
        assert abs(r.log_posterior - ref_lp(txt, r.label)) < 1e-9, (r.doc_id, r.label)


def test_nb_train_excludes_null_labels_and_validates_params(spark):
    from kafka_workers_spark.operators.classify import nb_train

    df = spark.createDataFrame(
        [(0, "apple", "a"), (1, "iron", None)], ["doc_id", "text", "lang"]
    )
    model = nb_train(df, "lang")
    assert [r.label for r in model.class_stats.collect()] == ["a"]
    with pytest.raises(ValueError, match="n_buckets"):
        nb_train(df, "lang", n_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        nb_train(df, "lang", alpha=0.0)


def test_nb_score_plan_is_broadcast_only(spark):
    """The scoring plan must carry NO token/bucket-keyed shuffle: the
    model sides join as broadcasts (the fixed-size-model contract);
    the only exchange is the (doc, label) aggregate's."""
    from kafka_workers_spark.operators.classify import nb_score, nb_train

    model = nb_train(_nb_corpus(spark), "lang", n_buckets=512)
    test = spark.createDataFrame([(1, "apple iron")], ["doc_id", "text"])
    plan = nb_score(test, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_nb_score_raises_on_labelless_model(spark):
    """A model trained on zero labeled rows must raise at first action —
    never silently score nothing (the semantic_dedup/pq_train lazy
    raise_error contract)."""
    from kafka_workers_spark.operators.classify import nb_score, nb_train

    unlabeled = spark.createDataFrame(
        [(0, "apple", None)], "doc_id bigint, text string, lang string"
    )
    model = nb_train(unlabeled, "lang")
    test = spark.createDataFrame([(1, "apple")], ["doc_id", "text"])
    with pytest.raises(Exception, match="no labels"):
        nb_score(test, model).collect()
