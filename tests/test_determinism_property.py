"""Cluster-size independence as a TESTED property, not a design claim.

ARCHITECTURE.md §4.7 promises results are stable across engines AND
cluster sizes: double sums go through DECIMAL, hashes are md5-derived,
quantized-ln/fixed-point arithmetic everywhere, unique tiebreakers on
every top-k. The DuckDB oracle checks the cross-engine half; this module
checks the cluster-shape half directly — run the same query under very
different parallelism (shuffle partition count AND scan split size, the
two knobs that change partitioning, aggregation order, and AQE's
runtime choices) and require bit-identical canonical output.

The roster deliberately over-samples the FLOAT-bearing and
order-sensitive families (decimal-summed aggregates, quantized-ln
ranking, IEEE-division estimates, window top-k, iterative graph
rounds): those are exactly where a partition-order dependence would
hide.
"""

from __future__ import annotations

import pytest

from kafka_workers_spark.queries import load_all, load_extra
from tests.oracle import canonicalize

SF = "/root/testdata/sf0.001"

#: (query, why it's in the roster)
ROSTER = [
    ("q1_pricing_summary", "DECIMAL-summed double aggregates"),
    ("agg_moments_histogram", "higher moments — classic float-order trap"),
    ("agg_group_ols", "per-group regression slopes"),
    ("text_bm25_topk", "quantized-ln ranking + top-k ties"),
    ("corpus_weighted_sample", "quantized-ln sampling keys"),
    ("corpus_source_similarity", "KMV union-sample IEEE divisions"),
    ("text_hybrid_rrf", "integer rank fusion over two plans"),
    ("graph_pagerank", "iterative integer rounds"),
    ("graph_label_propagation", "iterative argmax rounds"),
    ("multimodal_frame_dedup", "banded pair plan + offset vote"),
    ("events_markov_transitions", "lag over explicit total order"),
    ("window_topk_per_group", "window top-k tiebreakers"),
    ("stream_distinct_rollup", "KMV shard-merge + (k-1)/U_(k) IEEE division"),
    ("graph_shortest_cost", "iterative MIN-relaxation rounds"),
]

_POOL = {**load_all(), **load_extra()}


@pytest.mark.parametrize("name", [n for n, _ in ROSTER])
def test_result_is_identical_across_parallelism(spark, name):
    spec = _POOL[name]
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_bytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64k")
        narrow = canonicalize(spec.fn(spark, SF).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        wide = canonicalize(spec.fn(spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_bytes)
    assert len(narrow) == len(wide) and narrow == wide, (
        f"{name}: output depends on partitioning — first diff: "
        f"{next((a, b) for a, b in zip(narrow, wide) if a != b) if len(narrow) == len(wide) else (len(narrow), len(wide))}"
    )


@pytest.mark.parametrize(
    "name",
    ["events_time_windows", "events_markov_transitions", "join_asof", "events_scd2_merge"],
)
def test_result_is_identical_under_foreign_session_timezone(spark, name):
    """The verify recipe's timezone probe, pinned: a session whose
    timeZone was switched to America/New_York must produce the same
    timestamp-bearing results, because load_table re-pins UTC on every
    call (sources/files.py — timestamps are instants; a non-UTC session
    would shift every rendered value away from the UTC-naive oracle)."""
    spec = _POOL[name]
    base = canonicalize(spec.fn(spark, SF).toPandas())
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        shifted = canonicalize(spec.fn(spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert shifted == base, f"{name}: session timezone leaked into results"
