"""Pipeline-operator queries rotated INTO the driver window (round 6).

Three operators that until now were only DuckDB-oracled locally
(tests/test_oracle_extra.py) earn driver-checked rows: the leakage-safe
split coin (`pipeline.split_corpus`), the skew-aware per-key cap
(`pipeline.cap_per_key`), and the N-way ordered merge release rule
(`streaming.merge.merge_ordered_many` — the reference's
TimeAwareMergerTask semantics generalized to N feeds,
src/main/java/com/rtbhouse/kafka/workers/impl/task/ merger classes).
Each wrapper runs the REAL pipeline operator over the driver's parquet
tables; the oracle replays its exact semantics in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_workers_spark.queries import register
from kafka_workers_spark.sources.files import load_table

# These constants interpolate into BOTH the Spark wrapper and the oracle
# SQL f-strings below — the pairing is intentional, so changing one
# changes both sides of the cross-engine check together. Never "fix"
# just the SQL side.
_CAP = 10
_MERGE_SIDES = 3


@register(
    "split_corpus",
    """
    SELECT doc_id,
           CASE WHEN coin < 90 THEN 'train'
                WHEN coin < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 100 AS coin
      FROM documents
    )
    """,
    category="pipeline",
    # rotated OUT of the driver window round 13 (VERDICT r12 #3) to make
    # room for multimodal_frame_dedup — still held to this oracle every
    # pytest run by test_rotated_out_queries_still_match_oracle
    windowed=False,
)
def split_corpus_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (pipeline.split_corpus):
    every document's split is a pure function of md5('split|' || id) — no
    RNG state, so re-runs, backfills, and engine swaps assign identically.
    The oracle replays the identical coin via DuckDB's '0x' hex cast.

    Scale: pure column expressions over a pushed-down 1-column scan — no
    shuffle, no window, no collect. The leakage-safe variant (dup_pairs →
    component-id coin) adds one join against the pairs-sized component
    table and is exercised by tests/test_pipeline.py.
    """
    from kafka_workers_spark.pipeline import split_corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return split_corpus(docs, weights={"train": 90, "val": 5, "test": 5})


@register(
    "cap_per_key",
    f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('cap|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= {_CAP}
    """,
    category="pipeline",
    # rotated OUT of the driver window round 13 (VERDICT r12 #3) to make
    # room for stream_interval_join — still held to this oracle every
    # pytest run by test_rotated_out_queries_still_match_oracle
    windowed=False,
)
def cap_per_key_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-domain-dominance cap (pipeline.cap_per_key): at most
    {_CAP} documents per source, survivors chosen by the smallest
    md5('cap|' || id) coin — deterministic across runs and engines. The
    oracle is the NAIVE global window; the operator's skew-aware two-path
    plan (under-cap rows bypass the shuffle entirely, over-cap keys rank
    behind a partial WindowGroupLimit so hot keys ship cap×tasks rows,
    never their full row set — plan-asserted in
    tests/test_oracle_extra.py::test_cap_per_key_plan_shape) must be
    indistinguishable from it row-for-row.
    """
    from kafka_workers_spark.pipeline import cap_per_key

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_key(docs, ["source"], _CAP, id_col="doc_id")


@register(
    "merge_ordered_many",
    f"""
    WITH u AS (
      SELECT event_id, event_type, ts,
             's' || CAST(event_id % {_MERGE_SIDES} AS VARCHAR) AS side
      FROM events
    ),
    fr AS (
      SELECT event_type, MIN(mx) AS lw, COUNT(mx) AS n FROM (
        SELECT event_type, side, MAX(ts) AS mx FROM u GROUP BY 1, 2
      ) GROUP BY 1
    )
    SELECT u.event_id, u.event_type, u.ts, u.side
    FROM u JOIN fr ON u.event_type = fr.event_type
    WHERE fr.n >= {_MERGE_SIDES} AND u.ts <= fr.lw
    """,
    category="pipeline",
    windowed=False,  # rotated out round 12 (merge family stays via stream_ordered_merge)
)
def merge_ordered_many_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-way time-aware ordered merge (streaming.merge.merge_ordered_many):
    the events table is split into {_MERGE_SIDES} feeds by event_id mod,
    and the merge releases, per event_type group, exactly the rows at or
    below the group's low watermark — min over sides of max(seen ts) —
    with every side's frontier known (the reference's
    accept()-while-sibling-unknown rule, MergerTest's release sequence,
    generalized from 2 to N). The oracle replays the release rule as two
    aggregates + a join.

    Scale: frontier state is one row per (group, side) — tiny at any
    scale — broadcast back into the release filter; the payload is never
    shuffled. The three side scans share the one parquet file with the
    mod filter pushed down.
    """
    from kafka_workers_spark.streaming.merge import merge_ordered_many

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    sides = {
        f"s{i}": ev.filter(F.col("event_id") % _MERGE_SIDES == i)
        for i in range(_MERGE_SIDES)
    }
    return merge_ordered_many(sides, "event_type", "ts")


@register(
    "corpus_diff",
    """
    WITH old AS (
      SELECT doc_id, md5(text) AS d FROM documents WHERE doc_id % 7 <> 0
    ),
    new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [edited]'
                      ELSE text END) AS d
      FROM documents WHERE doc_id % 5 <> 0
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.d IS NULL THEN 'added'
                WHEN n.d IS NULL THEN 'removed'
                WHEN o.d <> n.d THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
    """,
    category="pipeline",
    windowed=False,
)
def corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differ (pipeline.diff_corpora): two synthetic snapshots of
    the documents table — the 'old' drops doc_id % 7 == 0, the 'new'
    drops doc_id % 5 == 0 and edits doc_id % 11 == 0 — produce the full
    added/removed/changed/unchanged changelog, every status class
    populated. The full-outer join shuffles 16-byte digests + ids only,
    never two copies of the text; the oracle replays the digest compare
    exactly."""
    from kafka_workers_spark.pipeline import diff_corpora

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
        ).otherwise(F.col("text")),
    )
    return diff_corpora(old, new)


# ---------------------------------------------------------------------------
# Z-order key oracle (VERDICT r06 #1c): the min/max scale + Morton bit
# interleave replayed as pure integer/double arithmetic in DuckDB.
# ---------------------------------------------------------------------------

_ZBITS = 8
_ZCOLS = 3  # o_custkey, o_totalprice, o_orderdate
_ZTOP = (1 << _ZBITS) - 1


def _sql_z_interleave() -> str:
    """The unrolled Morton interleave over codes k0..k2 — bit b of code j
    lands at position b*ncols + j, exactly zorder_key's loop."""
    return " | ".join(
        f"(((k{j} >> {b}) & 1) << {b * _ZCOLS + j})"
        for b in range(_ZBITS)
        for j in range(_ZCOLS)
    )


def _sql_z_code(j: int, expr: str) -> str:
    """One column's scaled code: linear min/max scale to _ZBITS bits with
    zorder_key's exact NULL/degenerate-span handling and clamp order."""
    mn, mx = f"mn{j}", f"mx{j}"
    return (
        f"CASE WHEN {expr} IS NULL OR {mn} IS NULL OR ({mx} - {mn}) <= 0 THEN 0 "
        f"ELSE CAST(LEAST(GREATEST(FLOOR(({expr} - {mn}) / ({mx} - {mn}) * {_ZTOP}), 0), "
        f"{_ZTOP}) AS BIGINT) END AS k{j}"
    )


_ZEXPRS = [
    "CAST(o_custkey AS DOUBLE)",
    "o_totalprice",
    "CAST(epoch_us(o_orderdate) AS DOUBLE)",
]


@register(
    "zorder_key_orders",
    f"""
    WITH s AS (
      SELECT {', '.join(f'MIN({e}) AS mn{j}, MAX({e}) AS mx{j}' for j, e in enumerate(_ZEXPRS))}
      FROM orders
    ),
    codes AS (
      SELECT o_orderkey,
             {', '.join(_sql_z_code(j, e) for j, e in enumerate(_ZEXPRS))}
      FROM orders, s
    )
    SELECT o_orderkey, {_sql_z_interleave()} AS z FROM codes
    """,
    category="pipeline",
    windowed=False,
)
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over three differently-typed
    columns (sources.files.zorder_key — the lakehouse OPTIMIZE ... ZORDER
    BY layout key, which Spark OSS lacks): o_custkey (bigint→double),
    o_totalprice (double), o_orderdate (timestamp→epoch micros). Each
    scales linearly to {_ZBITS} bits between its global min/max (a
    one-row broadcast carried in-plan — job-free build) and the codes'
    bits interleave into one long. The oracle replays scale, clamp, NULL
    handling, and the bit interleave exactly: the scale is IEEE double
    arithmetic in the same operation order on both engines and the
    interleave is pure integer bit-math, so keys match bit for bit.

    Scale shape: all codegen column arithmetic, no shuffle — the
    downstream write (sources.files.write_zordered) adds the single
    range-partition + in-partition sort that produces the clustered
    layout."""
    from kafka_workers_spark.sources.files import zorder_key

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    return zorder_key(
        orders, ["o_custkey", "o_totalprice", "o_orderdate"], bits=_ZBITS
    ).select("o_orderkey", F.col("__z").alias("z"))
