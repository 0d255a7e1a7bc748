"""Probabilistic record linkage (Fellegi & Sunter, JASA 1969; the
Splink-style pipeline shape): blocked candidate pairs → per-field
agreement vectors (the FS "gamma") → pattern frequency table → EM for
the m/u probabilities → per-pair match weights.

Engine split (the part that matters at 100 TB vs the part that is
tiny by construction):

- Pair generation and gamma computation are DATA-scale: a blocking
  equi-join (never all-pairs — the house rule every dedup family
  follows) and one integer-coded agreement vector per pair, then ONE
  hash aggregate down to at most 2^k pattern rows. Payloads carry only
  the k compare columns.
- EM runs on the PATTERN TABLE — ≤ 2^k rows regardless of corpus size
  — so it is a documented driver-side numpy loop (the pinned-params
  collect class of functions/sketches, not a hidden driver bottleneck):
  the classic FS/ECM iteration (Winkler 1988's EM formulation).
- Scoring broadcasts the fitted m/u as literals back over the pair
  table: log2(m/u) per agreeing field, log2((1-m)/(1-u)) per
  disagreeing — a fixed-order scalar expression per row (no float
  aggregate), summed into the familiar match weight.

The exact surface (pattern counts) is DuckDB-oracled via the
``linkage_patterns`` registry row; EM recovery and score ranking are
pinned on a planted-duplicate corpus in tests/test_linkage.py (floats
stay OUT of the oracle — cross-libm log differences).

Reference: the framework has no content operators (WorkerTask.java:50 —
user space); this is engine extension surface like the dedup families.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def linkage_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Blocked candidate pairs with the FS agreement vector: join on
    equality of ``block_cols`` (NULL-safe, each block bounded), order
    pairs ``id_a < id_b``, and emit one bit per compare column
    (NULL-safe equality) plus the packed ``gamma_code`` integer.
    Returns ``(id_a, id_b, g_<col>..., gamma_code)``.

    Σ block² cost, never n² — pick blocks the way the dedup families
    pick band keys. Compare columns ride the join (k small values);
    nothing else fans out."""
    if not block_cols or not compare_cols:
        raise ValueError("block_cols and compare_cols must be non-empty")
    if len(compare_cols) > 20:
        raise ValueError(f"{len(compare_cols)} compare columns: gamma_code packs at most 20")
    a = df.select(
        F.col(id_col).alias("__id_a"),
        *[F.col(c).alias(f"__blk_{c}") for c in block_cols],
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
    )
    b = df.select(
        F.col(id_col).alias("__id_b"),
        *[F.col(c).alias(f"__blkb_{c}") for c in block_cols],
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
    )
    cond = F.col("__id_a") < F.col("__id_b")
    for c in block_cols:
        cond = cond & F.col(f"__blk_{c}").eqNullSafe(F.col(f"__blkb_{c}"))
    bits = [
        F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}")).cast("int").alias(f"g_{c}")
        for c in compare_cols
    ]
    pairs = a.join(b, cond).select(
        F.col("__id_a").alias("id_a"), F.col("__id_b").alias("id_b"), *bits
    )
    code = None
    for i, c in enumerate(compare_cols):
        term = F.col(f"g_{c}").cast("bigint") * F.lit(1 << i).cast("bigint")
        code = term if code is None else code + term
    return pairs.withColumn("gamma_code", code)


def linkage_pattern_counts(pairs: DataFrame) -> DataFrame:
    """Pattern frequency table: ``(gamma_code, n_pairs)`` — at most 2^k
    rows; one partial-aggregatable hash aggregate."""
    return pairs.groupBy("gamma_code").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )


def linkage_em(
    pattern_counts: list[tuple[int, int]],
    n_fields: int,
    match_prior: float = 0.1,
    iters: int = 50,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Fellegi-Sunter EM over the tiny pattern table (Winkler's ECM):
    returns ``(m, u, lam)`` — per-field P(agree | match),
    P(agree | non-match), and the match proportion. Pure numpy on
    ≤ 2^k rows; deterministic (fixed init, fixed iteration count)."""
    codes = np.array([c for c, _ in pattern_counts], dtype=np.int64)
    counts = np.array([n for _, n in pattern_counts], dtype=np.float64)
    gam = ((codes[:, None] >> np.arange(n_fields)) & 1).astype(np.float64)
    m = np.full(n_fields, 0.9)
    u = np.full(n_fields, 0.1)
    lam = float(match_prior)
    for _ in range(iters):
        pm = lam * np.prod(np.where(gam == 1, m, 1 - m), axis=1)
        pu = (1 - lam) * np.prod(np.where(gam == 1, u, 1 - u), axis=1)
        w = pm / np.maximum(pm + pu, 1e-300)
        tot_m = float((w * counts).sum())
        tot_u = float(((1 - w) * counts).sum())
        m = ((w * counts)[:, None] * gam).sum(axis=0) / max(tot_m, 1e-300)
        u = (((1 - w) * counts)[:, None] * gam).sum(axis=0) / max(tot_u, 1e-300)
        m = np.clip(m, 1e-6, 1 - 1e-6)
        u = np.clip(u, 1e-6, 1 - 1e-6)
        lam = tot_m / max(tot_m + tot_u, 1e-300)
    return m, u, lam


def linkage_score(
    pairs: DataFrame,
    compare_cols: list[str],
    m: "np.ndarray",
    u: "np.ndarray",
) -> DataFrame:
    """Match weight per pair: Σ_i log2(m_i/u_i) on agreement,
    log2((1-m_i)/(1-u_i)) on disagreement — the fitted m/u enter as
    LITERALS (driver-fitted, broadcast by constant folding), and the
    sum is a fixed-order scalar expression, not a float aggregate.
    Returns the pair frame plus ``match_weight``."""
    import math

    w = None
    for i, c in enumerate(compare_cols):
        agree = math.log2(float(m[i]) / float(u[i]))
        disagree = math.log2((1 - float(m[i])) / (1 - float(u[i])))
        term = F.when(F.col(f"g_{c}") == 1, F.lit(agree)).otherwise(F.lit(disagree))
        w = term if w is None else w + term
    return pairs.withColumn("match_weight", w)
