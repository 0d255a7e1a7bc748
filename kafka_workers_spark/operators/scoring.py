"""Model-scoring stage: attach a per-document model score (quality,
toxicity, language confidence, ...) with Arrow-batched execution — the
stage between heuristic filtering (operators.text.gopher_rules) and
score-threshold sampling (pipeline.sample_by_quality) in a modern
curation pipeline.

Same engineering stance as operators/multimodal.py: the model libraries
(fasttext, torch, onnxruntime, ...) are not in this container, so model
loading is INJECTABLE and the default is a deterministic heuristic
scorer — the Spark-side plumbing (broadcast of model bytes, per-worker
lazy load, Arrow batch shape, schema) is real and tested; swap the
loader where the dependency exists.

Scale shape: mapInPandas with a per-worker-process model instance
(module-level cache keyed by model digest — survives Spark's Python
worker reuse across tasks, so the model loads once per process, not per
task or batch); model bytes travel by broadcast, not in the closure
pickle; scoring is embarrassingly parallel — no shuffle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import hashlib
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

#: module-level model cache: Spark reuses Python worker PROCESSES across
#: tasks (spark.python.worker.reuse), and module state survives reuse —
#: so a loaded model is shared by every task this worker ever runs,
#: keyed by the model bytes' digest. A closure-local cache would reload
#: per task (the closure is re-deserialized with each task).
_MODEL_CACHE: dict[str, Any] = {}


def heuristic_scorer(texts: pd.Series) -> pd.Series:
    """The default (dependency-free, deterministic) document scorer: a
    [0, 1] quality proxy from length and alphabetic density — stands in
    for a real model; same signature a fasttext/torch scorer adapter
    would have (pd.Series[str] -> pd.Series[float])."""
    s = texts.fillna("")
    n = s.str.len().clip(lower=1)
    alpha = s.str.count(r"[A-Za-z]")
    words = s.str.count(r"\s+") + 1
    length_term = (n.clip(upper=2000) / 2000.0) * 0.5
    alpha_term = (alpha / n) * 0.3
    word_len = (n / words).clip(upper=12) / 12.0 * 0.2
    return (length_term + alpha_term + word_len).astype("float64")


def _model_payload(spark, model_loader, model_bytes):
    """(broadcast, closure_bytes) for shipping model bytes to workers.

    ``sparkContext.broadcast`` is classic-only; under Spark Connect (no
    ``sparkContext`` attribute) the bytes ship in the task closure
    instead — pickled per task, but the per-worker ``_MODEL_CACHE``
    still makes the LOAD happen once per process, which is the
    expensive part. Same degrade-conservatively Connect stance as
    ``operators.dedup.spread`` (ADVICE r05)."""
    if model_loader is None:
        return None, None
    sc = getattr(spark, "sparkContext", None)
    if sc is None:
        return None, model_bytes
    return sc.broadcast(model_bytes), None


def score_documents(
    df: DataFrame,
    text_col: str = "text",
    score_col: str = "score",
    scorer: Callable[[pd.Series], pd.Series] | None = None,
    model_loader: Callable[[bytes | None], Callable[[pd.Series], pd.Series]] | None = None,
    model_bytes: bytes | None = None,
) -> DataFrame:
    """Add ``score_col`` (double) from a batch scorer over ``text_col``.

    Three ways to supply the model, in precedence order:

    - ``scorer``: a ready ``pd.Series -> pd.Series`` callable (must be
      small and picklable — it ships in the task closure).
    - ``model_loader`` (+ optional ``model_bytes``): for real models.
      The bytes broadcast ONCE; the loader runs lazily per worker
      process (module-level cache keyed by the bytes' digest, so worker
      reuse carries the loaded model across tasks) — the model never
      rides in the closure and never reloads per batch or task.
    - neither: :func:`heuristic_scorer`.

    Output rows/columns are the input plus the score — no reorder, no
    shuffle; ``pipeline.sample_by_quality(df, score_col, frac)`` is the
    intended consumer.
    """
    cols = df.columns
    if score_col in cols:
        raise ValueError(f"score column {score_col!r} already exists")
    spark = df.sparkSession
    bc, closure_bytes = _model_payload(spark, model_loader, model_bytes)
    model_key = hashlib.md5(model_bytes or b"").hexdigest() if model_loader else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if scorer is not None:
            fn = scorer
        elif model_loader is not None:
            if model_key not in _MODEL_CACHE:  # once per worker PROCESS
                payload = bc.value if bc is not None else closure_bytes
                _MODEL_CACHE[model_key] = model_loader(payload)
            fn = _MODEL_CACHE[model_key]
        else:
            fn = heuristic_scorer
        for pdf in batches:
            out = pdf.copy()
            out[score_col] = fn(pdf[text_col]).astype("float64")
            yield out

    return df.mapInPandas(run, ", ".join([f"`{c}` {t}" for c, t in df.dtypes] + [f"{score_col} double"]))
