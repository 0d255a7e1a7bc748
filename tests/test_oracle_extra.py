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


# AQE off module-wide — shared conftest fixture, see its docstring
_no_aqe = pytest.fixture(scope="module", autouse=True)(lambda no_aqe: None)


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


def _extra_specs():
    from kafka_workers_spark.queries import load_extra

    return [s for s in load_extra().values() if s.oracle is not None]


def test_rotated_out_queries_still_match_oracle(spark):
    """Queries rotated OUT of the driver's 50-query window (round-5
    rotation, VERDICT r04 #4) keep the identical QuerySpec contract and
    stay held to the same DuckDB oracle here — rotation changes who runs
    the check, never whether it runs. All EXTRA rows run concurrently
    on 6 threads (Spark jobs and per-thread DuckDB connections are both
    thread-safe; one thread per query would oversubscribe the local
    executor pool) — the failure message still names every failing
    query with its assertion."""
    from concurrent.futures import ThreadPoolExecutor

    from tests.oracle import compare_query

    def run(spec):
        try:
            compare_query(spark, SF, spec)
            return None
        except Exception as exc:  # noqa: BLE001 — reported per query below
            return f"{spec.name}: {str(exc)[:300]}"

    with ThreadPoolExecutor(max_workers=6) as pool:
        failures = [f for f in pool.map(run, _extra_specs()) if f]
    assert not failures, "\n".join(failures)


def test_dedup_substrings_document_scope_matches_duckdb_oracle(spark):
    """The within-document scope replayed in DuckDB: identical to the
    corpus-scope oracle (the registered text_dedup_substrings query)
    except the occurrence window partitions by (doc_id, wh)."""
    K = 8
    from kafka_workers_spark.operators.text import dedup_substrings
    from kafka_workers_spark.sources.files import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    got = {
        r.doc_id: (r.text, r.n_tokens, r.n_removed)
        for r in dedup_substrings(docs, k=K, scope="document").collect()
    }

    con = duckdb.connect()
    oracle = con.execute(
        f"""
        WITH base AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM '{DOCS}'
        ),
        occ AS (
          SELECT doc_id,
                 UNNEST([{{'pos': i - 1,
                          'wh': substr(md5(array_to_string(toks[i:i+{K - 1}], ' ')), 1, 16)}}
                         FOR i IN generate_series(1, len(toks) - {K - 1})],
                        recursive := true)
          FROM base WHERE len(toks) >= {K}
        ),
        ranked AS (
          SELECT doc_id, pos, wh,
                 ROW_NUMBER() OVER (PARTITION BY doc_id, wh ORDER BY pos) AS rn,
                 COUNT(*) OVER (PARTITION BY doc_id, wh) AS cnt
          FROM occ
        ),
        cov AS (
          SELECT doc_id,
                 list_distinct(flatten(list(generate_series(pos, pos + {K - 1})))) AS cov
          FROM ranked WHERE cnt > 1 AND rn > 1
          GROUP BY doc_id
        )
        SELECT b.doc_id,
               COALESCE(array_to_string([b.toks[i] FOR i IN generate_series(1, len(b.toks))
                                         IF c.cov IS NULL OR NOT list_contains(c.cov, i - 1)],
                                        ' '), '') AS text,
               CAST(len(b.toks) AS BIGINT) AS n_tokens,
               CAST(COALESCE(len(c.cov), 0) AS BIGINT) AS n_removed
        FROM base b LEFT JOIN cov c USING (doc_id)
        """
    ).fetchall()
    expected = {r[0]: (r[1], r[2], r[3]) for r in oracle}
    assert got == expected
