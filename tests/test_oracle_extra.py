"""DuckDB-oracle checks for operators OUTSIDE the 50-query driver window.

The registry is capped at the driver's correctness window, so newer
operators can't earn driver rows — these tests give them the same
cross-engine verification locally: run the Spark operator and an
independent DuckDB SQL implementation over the same parquet table and
compare values exactly. (redact_pii is excluded by construction: its
rules use lookbehind, which DuckDB's RE2 engine does not support.)
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def test_dedup_paragraphs_matches_duckdb_oracle(spark):
    """Global paragraph dedup replayed independently in DuckDB SQL
    (split → ordinality-unnest → digest window → filtered ordered
    string_agg): per-document reassembled text and drop counts must
    match exactly on the real documents table."""
    from kafka_workers_spark.operators.text import dedup_paragraphs
    from kafka_workers_spark.sources.files import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    got = {
        r.doc_id: (r.text, r.n_paragraphs, r.n_dropped)
        for r in dedup_paragraphs(docs).collect()
    }

    con = duckdb.connect()
    oracle = con.execute(
        f"""
        WITH splitted AS (
          SELECT doc_id, string_split(text, chr(10)) AS parts FROM '{DOCS}'
        ),
        exploded AS (
          SELECT doc_id,
                 UNNEST([{{'pos': i - 1, 'para': parts[i]}}
                         FOR i IN generate_series(1, len(parts))],
                        recursive := true)
          FROM splitted
        ),
        marked AS (
          SELECT *, length(trim(para)) >= 1 AS meaningful, md5(para) AS digest
          FROM exploded
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id, pos) AS rn
          FROM marked
        )
        SELECT doc_id,
               COALESCE(string_agg(para, chr(10) ORDER BY pos)
                        FILTER (WHERE (NOT meaningful) OR rn = 1), '') AS text,
               COUNT(*) AS n_paragraphs,
               COUNT(*) FILTER (WHERE meaningful AND rn > 1) AS n_dropped
        FROM ranked GROUP BY doc_id
        """
    ).fetchall()
    con.close()
    want = {r[0]: (r[1], r[2], r[3]) for r in oracle}
    assert set(got) == set(want)
    mismatches = {d: (got[d], want[d]) for d in got if got[d] != want[d]}
    assert not mismatches, list(mismatches.items())[:3]


def test_dedup_paragraphs_document_scope_matches_duckdb_oracle(spark):
    """The within-document scope replayed in DuckDB: identical to the
    corpus-scope oracle except the occurrence window partitions by
    (doc_id, digest)."""
    from kafka_workers_spark.operators.text import dedup_paragraphs
    from kafka_workers_spark.sources.files import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    got = {
        r.doc_id: (r.text, r.n_paragraphs, r.n_dropped)
        for r in dedup_paragraphs(docs, scope="document").collect()
    }

    con = duckdb.connect()
    oracle = con.execute(
        f"""
        WITH splitted AS (
          SELECT doc_id, string_split(text, chr(10)) AS parts FROM '{DOCS}'
        ),
        exploded AS (
          SELECT doc_id,
                 UNNEST([{{'pos': i - 1, 'para': parts[i]}}
                         FOR i IN generate_series(1, len(parts))],
                        recursive := true)
          FROM splitted
        ),
        marked AS (
          SELECT *, length(trim(para)) >= 1 AS meaningful, md5(para) AS digest
          FROM exploded
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, digest ORDER BY doc_id, pos) AS rn
          FROM marked
        )
        SELECT doc_id,
               COALESCE(string_agg(para, chr(10) ORDER BY pos)
                        FILTER (WHERE (NOT meaningful) OR rn = 1), '') AS text,
               COUNT(*) AS n_paragraphs,
               COUNT(*) FILTER (WHERE meaningful AND rn > 1) AS n_dropped
        FROM ranked GROUP BY doc_id
        """
    ).fetchall()
    con.close()
    want = {r[0]: (r[1], r[2], r[3]) for r in oracle}
    assert set(got) == set(want)
    mismatches = {d: (got[d], want[d]) for d in got if got[d] != want[d]}
    assert not mismatches, list(mismatches.items())[:3]


def test_split_corpus_matches_duckdb_oracle(spark):
    """The salted md5 split coin replays exactly in DuckDB (same
    conv/'0x'-cast trick as the registered sample_coin oracle): every
    document's split assignment must match."""
    from kafka_workers_spark.pipeline import split_corpus
    from kafka_workers_spark.sources.files import load_table

    docs = load_table(spark, SF, "documents").select("doc_id")
    got = {
        r.doc_id: r.split
        for r in split_corpus(docs, weights={"train": 90, "val": 5, "test": 5}).collect()
    }
    con = duckdb.connect()
    oracle = con.execute(
        f"""
        SELECT doc_id,
               CASE WHEN coin < 90 THEN 'train'
                    WHEN coin < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)
                      AS BIGINT) % 100 AS coin
          FROM '{DOCS}'
        )
        """
    ).fetchall()
    con.close()
    want = dict(oracle)
    assert got == want


def test_semantic_dedup_matches_duckdb_oracle(spark):
    """semantic_dedup replayed end-to-end in DuckDB: the trained
    quantizer is the SAME unrolled Lloyd's-KMeans CTE chain the
    registered ann_ivf_topk oracle uses (exact integer arithmetic →
    bit-identical lists on both engines), followed by the within-list
    pair join, fixed-point cosine verify, and greedy survivor rule.
    Survivor id sets must match exactly on the real embeddings table —
    and the threshold is chosen so a large fraction actually drops."""
    from kafka_workers_spark.operators.dedup import sql_cosine_from_fixed, sql_dot_fixed
    from kafka_workers_spark.operators.similarity import semantic_dedup
    from kafka_workers_spark.queries.similarity import _DIM, _SQL_VECS, _sql_kmeans_ctes
    from kafka_workers_spark.sources.files import load_table

    K, ITERS, MIN_COS = 8, 2, 0.3
    emb = load_table(spark, SF, "embeddings")
    got = sorted(
        r.vec_id
        for r in semantic_dedup(
            emb, dim=_DIM, k=K, min_cosine=MIN_COS, iters=ITERS, train_mod=4
        ).collect()
    )

    ctes, _, assign = _sql_kmeans_ctes(K, ITERS)
    vecs_sql = _SQL_VECS.replace("embeddings", f"'{SF}/embeddings.parquet'")
    con = duckdb.connect()
    oracle = con.execute(
        f"""
        WITH vecs AS ({vecs_sql}),
        {ctes},
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM {assign} a JOIN {assign} b
            ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        ),
        ver AS (
          SELECT id_a, id_b FROM pairs
          JOIN vecs va ON va.vec_id = pairs.id_a
          JOIN vecs vb ON vb.vec_id = pairs.id_b
          WHERE {sql_cosine_from_fixed(
              sql_dot_fixed('va.v6', 'vb.v6', _DIM), 'va.norm6', 'vb.norm6'
          )} >= {MIN_COS}
        )
        SELECT vec_id FROM vecs
        WHERE vec_id NOT IN (SELECT id_b FROM ver)
        ORDER BY vec_id
        """
    ).fetchall()
    con.close()
    want = [r[0] for r in oracle]
    assert len(want) < 500  # the threshold really dedups, this isn't vacuous
    assert got == want


def test_cap_per_key_matches_duckdb_oracle(spark):
    """cap_per_key's selection (smallest md5(seed|id) coin per key, cap
    survivors) replayed as a plain window in DuckDB on the real documents
    table, capping docs per source: identical surviving id sets — the
    two-path plan (under-cap bypass + window on over-cap keys only) must
    be indistinguishable from the naive global window."""
    from kafka_workers_spark.pipeline import cap_per_key
    from kafka_workers_spark.sources.files import load_table

    CAP = 10  # every source holds 25 docs at this SF, so the cap binds
    docs = load_table(spark, SF, "documents")
    got = sorted(
        r.doc_id
        for r in cap_per_key(docs, ["source"], CAP, id_col="doc_id").collect()
    )

    con = duckdb.connect()
    oracle = con.execute(
        f"""
        SELECT doc_id FROM (
          SELECT doc_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('cap|' || CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rn
          FROM '{DOCS}'
        ) WHERE rn <= {CAP}
        ORDER BY doc_id
        """
    ).fetchall()
    con.close()
    want = [r[0] for r in oracle]
    # the cap binds on at least one source, or the test proves nothing
    assert len(want) < 500
    assert got == want


def test_cap_per_key_two_path_semantics(spark):
    """Under-cap keys pass through untouched (every row kept); over-cap
    keys keep exactly cap rows; the survivor subset is stable across
    runs and changes with the seed."""
    from kafka_workers_spark.pipeline import cap_per_key

    from pyspark.sql import functions as F

    rows = [(i, "hot") for i in range(40)] + [(100 + i, "cold") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_key(df, ["source"], 10)
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"hot": 10, "cold": 3}
    again = sorted(r.doc_id for r in cap_per_key(df, ["source"], 10).collect())
    assert again == sorted(r.doc_id for r in out.collect())
    other = sorted(
        r.doc_id for r in cap_per_key(df, ["source"], 10, seed="cap2").collect()
    )
    assert other != again  # different seed, independent subset


def test_merge_ordered_many_matches_duckdb_oracle(spark):
    """The N-way merge release rule replayed in SQL: rows <= the minimum
    per-group frontier, only for groups where every side is present."""
    from kafka_workers_spark.streaming.merge import merge_ordered_many

    rows = {
        "a": [(g, t) for g in range(4) for t in range(0, 50, 7)],
        "b": [(g, t) for g in range(3) for t in range(3, 40, 5)],
        "c": [(g, t) for g in range(5) for t in range(1, 60, 11)],
    }
    dfs = {
        name: spark.createDataFrame(data, "g int, t long") for name, data in rows.items()
    }
    got = sorted(
        (r.g, r.t, r.side) for r in merge_ordered_many(dfs, "g", "t").collect()
    )

    con = duckdb.connect()
    values = ", ".join(
        f"({g}, {t}, '{name}')" for name, data in rows.items() for g, t in data
    )
    oracle = con.execute(
        f"""
        WITH u(g, t, side) AS (VALUES {values}),
        fr AS (
          SELECT g, MIN(mx) AS lw, COUNT(*) AS n FROM (
            SELECT g, side, MAX(t) AS mx FROM u GROUP BY 1, 2
          ) GROUP BY g
        )
        SELECT u.g, u.t, u.side FROM u JOIN fr ON u.g = fr.g
        WHERE fr.n >= 3 AND u.t <= fr.lw
        ORDER BY 1, 2, 3
        """
    ).fetchall()
    con.close()
    assert got == [tuple(r) for r in oracle]


def test_cap_per_key_caps_null_keys_too(spark):
    """NULL is a real group (messy metadata is where domination hides):
    an over-cap NULL-key group must be capped like any other, not slip
    through the equi-join."""
    from pyspark.sql import functions as F

    from kafka_workers_spark.pipeline import cap_per_key

    rows = [(i, None) for i in range(8)] + [(100 + i, "hot") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_key(df, ["source"], 3)
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {None: 3, "hot": 3}, counts


def test_tfidf_topk_matches_duckdb_oracle(spark):
    """The sparse TF-IDF search replayed end-to-end in DuckDB: same
    normalization, tokenization, df/tf counts, floor'd fixed-point idf,
    exact integer dots, and IEEE-exact cosine (one division + sqrt over
    identical integers), so full (query, neighbor, rank, cosine) tuples
    must match on the real documents table."""
    from kafka_workers_spark.operators.text import sql_normalized, tfidf_topk
    from kafka_workers_spark.sources.files import load_table

    # 0.8: the synthetic docs share template vocabulary, so a 0.5 cut
    # leaves three of the four query docs with no surviving terms
    TOP_K, QUERIES, MAX_DF = 5, [0, 1, 2, 3], 0.8
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cosine, 9))
        for r in tfidf_topk(docs, QUERIES, top_k=TOP_K, max_df_fraction=MAX_DF).collect()
    )

    con = duckdb.connect()
    n_docs = con.execute(f"SELECT COUNT(*) FROM '{DOCS}'").fetchone()[0]
    oracle = con.execute(
        f"""
        WITH toked AS (
          SELECT doc_id, UNNEST(string_split({sql_normalized('text')}, ' ')) AS term
          FROM '{DOCS}'
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toked
          WHERE length(term) > 0 GROUP BY 1, 2
        ),
        dft AS (
          SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
          HAVING COUNT(*) >= 1 AND COUNT(*) <= {int(MAX_DF * n_docs)}
        ),
        w AS (
          SELECT doc_id, tf.term,
                 tf * CAST(floor(1000000.0 * ln({float(n_docs + 1)} / (df + 1))
                                + 1000000.0) AS BIGINT) AS w6
          FROM tf JOIN dft ON tf.term = dft.term
        ),
        norms AS (SELECT doc_id, SUM(w6 * w6) AS norm6 FROM w GROUP BY 1),
        q AS (SELECT doc_id AS query_id, term, w6 AS qw6 FROM w
              WHERE doc_id IN ({', '.join(map(str, QUERIES))})),
        dots AS (
          SELECT query_id, w.doc_id, SUM(qw6 * w6) AS dot6
          FROM w JOIN q ON w.term = q.term AND w.doc_id <> q.query_id
          GROUP BY 1, 2
        ),
        scored AS (
          SELECT dots.query_id, dots.doc_id,
                 CAST(dot6 AS DOUBLE)
                   / sqrt(CAST(qn.norm6 AS DOUBLE) * CAST(cn.norm6 AS DOUBLE)) AS cosine
          FROM dots
          JOIN norms qn ON qn.doc_id = dots.query_id
          JOIN norms cn ON cn.doc_id = dots.doc_id
        )
        SELECT query_id, rank, doc_id AS neighbor_id, cosine FROM (
          SELECT query_id, doc_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, doc_id) AS rank
          FROM scored
        ) WHERE rank <= {TOP_K}
        """
    ).fetchall()
    con.close()
    want = sorted((r[0], r[1], r[2], round(r[3], 9)) for r in oracle)
    assert len(want) == len(QUERIES) * TOP_K
    assert got == want


def test_cap_per_key_plan_shape(spark):
    """The skew-aware two-path claim, plan-asserted: both branch joins
    are BROADCAST hash joins on the pinned over-cap key list (eqNullSafe
    compiles to coalesce/isnull hash keys, not a nested loop), the
    passthrough branch reaches the union with no data exchange, and the
    hot branch's single exchange is preceded by a partial
    WindowGroupLimit — each map task forwards at most cap rows per key,
    so even the hot keys' shuffle is cap-bounded, not data-bounded."""
    from kafka_workers_spark.pipeline import cap_per_key
    from kafka_workers_spark.plans import audit
    from kafka_workers_spark.sources.files import load_table

    docs = load_table(spark, SF, "documents")
    a = audit(cap_per_key(docs, ["source"], 10))
    assert a.cartesian_products == 0 and a.python_evals == 0
    assert a.nested_loop_joins == 0
    assert a.broadcast_joins == 2  # anti + semi, both on the tiny key list
    # counts-aggregate exchange(s) + the hot-branch window exchange; the
    # exact count varies with session state (the pinned key list may or
    # may not have materialized when the plan is captured), but the
    # passthrough DATA path contributes none: its branch is scan →
    # broadcast anti-join → union with no Exchange in between
    assert a.exchanges <= 3, a.exchanges
    passthrough_branch = a.text.split("BroadcastHashJoin LeftAnti")[0]
    assert "Exchange" not in passthrough_branch.split("Union")[-1]
    assert "WindowGroupLimit" in a.text
