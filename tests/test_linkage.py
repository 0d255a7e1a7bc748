"""Fellegi-Sunter record linkage (operators/linkage.py): gamma coding,
pattern counts, EM recovery of m/u on a planted-duplicate corpus, and
match-weight ranking. The exact pattern surface is also DuckDB-oracled
via the linkage_patterns registry row (tests/test_oracle_extra.py)."""

from __future__ import annotations

import random

import pytest

from kafka_workers_spark.operators.linkage import (
    linkage_em,
    linkage_pairs,
    linkage_pattern_counts,
    linkage_score,
)

FIELDS = ["f1", "f2", "f3"]


def _planted_corpus():
    """120 entities × 2 records each, all in one block per 10 entities:
    duplicate pairs agree on each field w.p. 0.9; cross-entity pairs
    agree w.p. ~0.1 (values drawn from a 10-symbol alphabet)."""
    rng = random.Random(7)
    rows, truth = [], set()
    rid = 0
    for ent in range(120):
        block = ent % 12
        vals = [rng.randrange(10) for _ in FIELDS]
        ids = []
        for _copy in range(2):
            rec = [v if rng.random() < 0.95 else rng.randrange(10) for v in vals]
            rows.append((rid, block, *rec))
            ids.append(rid)
            rid += 1
        truth.add((min(ids), max(ids)))
    return rows, truth


def test_linkage_em_recovers_mu_and_ranks_planted_duplicates(spark):
    rows, truth = _planted_corpus()
    df = spark.createDataFrame(rows, "id long, blk int, f1 int, f2 int, f3 int")
    pairs = linkage_pairs(df, "id", ["blk"], FIELDS)
    counts = [
        (r.gamma_code, r.n_pairs) for r in linkage_pattern_counts(pairs).collect()
    ]
    assert sum(n for _, n in counts) == pairs.count()
    m, u, lam = linkage_em(counts, len(FIELDS))
    # duplicates agree ~0.9+ per field; random pairs ~0.1
    assert all(mi > 0.75 for mi in m), m
    assert all(ui < 0.35 for ui in u), u
    # 120 true pairs out of 120 * C(20,2)/... — lam small but nonzero
    assert 0.005 < lam < 0.2, lam
    scored = linkage_score(pairs, FIELDS, m, u)
    top = scored.orderBy("match_weight", ascending=False).limit(len(truth)).collect()
    hits = sum((min(r.id_a, r.id_b), max(r.id_a, r.id_b)) in truth for r in top)
    # full-agreement non-matches exist by chance; ranking must still put
    # a large majority of planted pairs in the top-|truth|
    assert hits >= int(0.75 * len(truth)), f"{hits}/{len(truth)}"
    # agreement monotonicity: weight strictly increases with gamma bits set
    by_code = {r.gamma_code: r.match_weight for r in scored.collect()}
    assert by_code[7] == max(by_code.values())
    assert by_code[0] == min(by_code.values())


def test_linkage_pairs_guards_and_nullsafe(spark):
    df = spark.createDataFrame(
        [(0, 1, None), (1, 1, None), (2, 1, 5)], "id long, blk int, f1 int"
    )
    pairs = {
        (r.id_a, r.id_b): r.g_f1
        for r in linkage_pairs(df, "id", ["blk"], ["f1"]).collect()
    }
    # NULL == NULL agrees (eqNullSafe); NULL vs value disagrees
    assert pairs[(0, 1)] == 1 and pairs[(0, 2)] == 0 and pairs[(1, 2)] == 0
    with pytest.raises(ValueError, match="non-empty"):
        linkage_pairs(df, "id", [], ["f1"])
    with pytest.raises(ValueError, match="packs at most"):
        linkage_pairs(df, "id", ["blk"], [f"c{i}" for i in range(21)])
