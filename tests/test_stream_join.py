"""Stream-stream interval join (streaming/joins.py): the LIVE watermarked
path must equal the batch replay of the same join — eagerly for inner,
watermark-delayed for left_outer — plus pure contract tests of the
interval predicate's boundary inclusivity and the column-clash guard.

Reference analog: correlation across merged topics is user-task work in
the reference (payloads opaque, api/record/WorkerRecord.java); this pins
the engine-level operator that replaces it.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from kafka_workers_spark.streaming.joins import interval_join

T0 = datetime(2024, 1, 1, 0, 0, 0)
SENTINEL = 999_999


def _ts(s: float) -> datetime:
    return T0 + timedelta(seconds=s)


# (user_id, view_id, view_ts_s)
_VIEWS = [
    (1, 10, 0.0),    # matched by purchase at 30 (lag 30) and 60 (boundary in)
    (1, 11, 100.0),  # purchase at 200 is outside 60s -> outer row
    (2, 20, 0.0),    # purchase at 0 (lag 0, boundary in); 61 is out
    (3, 30, 50.0),   # no purchase at all -> outer row
]
# (user_id, purchase_id, purchase_ts_s)
_PURCHASES = [
    (1, 100, 30.0),
    (1, 101, 60.0),
    (1, 102, 200.0),
    (2, 200, 0.0),
    (2, 201, 61.0),
    (4, 400, 10.0),  # no view -> never emitted (left_outer keeps LEFT only)
]

_LEFT_SCHEMA = "user_id long, view_id long, view_ts timestamp"
_RIGHT_SCHEMA = "user_id long, purchase_id long, purchase_ts timestamp"


def _left_df(spark, rows):
    return spark.createDataFrame([(u, i, _ts(s)) for u, i, s in rows], _LEFT_SCHEMA)


def _right_df(spark, rows):
    return spark.createDataFrame([(u, i, _ts(s)) for u, i, s in rows], _RIGHT_SCHEMA)


def _join(left, right, how):
    return interval_join(
        left,
        right,
        key="user_id",
        left_ts="view_ts",
        right_ts="purchase_ts",
        lower_s=0,
        upper_s=60,
        how=how,
        watermark_delay="10 seconds",
    )


# ---------------------------------------------------------------------------
# batch contract
# ---------------------------------------------------------------------------


def test_batch_inner_boundaries(spark):
    got = sorted(
        (r.user_id, r.view_id, r.purchase_id)
        for r in _join(_left_df(spark, _VIEWS), _right_df(spark, _PURCHASES), "inner").collect()
    )
    # lag 0 and lag 60 are IN (closed interval), 61 and 100 are OUT
    assert got == [(1, 10, 100), (1, 10, 101), (2, 20, 200)]


def test_batch_left_outer_pads_unmatched_views(spark):
    got = sorted(
        (r.user_id, r.view_id, r.purchase_id)
        for r in _join(
            _left_df(spark, _VIEWS), _right_df(spark, _PURCHASES), "left_outer"
        ).collect()
    )
    assert got == [
        (1, 10, 100),
        (1, 10, 101),
        (1, 11, None),
        (2, 20, 200),
        (3, 30, None),
    ]


def test_column_clash_and_bounds_rejected(spark):
    left = _left_df(spark, _VIEWS).withColumnRenamed("view_ts", "ts")
    right = _right_df(spark, _PURCHASES).withColumnRenamed("purchase_ts", "ts")
    with pytest.raises(ValueError, match="share non-key columns"):
        interval_join(left, right, key="user_id", left_ts="ts", right_ts="ts")
    with pytest.raises(ValueError, match="must be <="):
        _ = interval_join(
            _left_df(spark, _VIEWS),
            _right_df(spark, _PURCHASES),
            key="user_id",
            left_ts="view_ts",
            right_ts="purchase_ts",
            lower_s=10,
            upper_s=5,
        )
    with pytest.raises(ValueError, match="expected one of"):
        _ = _join(_left_df(spark, _VIEWS), _right_df(spark, _PURCHASES), "full")


# ---------------------------------------------------------------------------
# live streaming == batch replay
# ---------------------------------------------------------------------------


def _write_stream_sources(spark, tmp_path):
    """Three files per side so the sentinel's watermark advance (batch 2)
    has a following batch (3) in which evicted state emits outer rows."""
    lsrc, rsrc = str(tmp_path / "views"), str(tmp_path / "purch")
    sent_l = [(SENTINEL, 0, 100_000.0), (SENTINEL, 1, 200_000.0)]
    sent_r = [(SENTINEL, 0, 100_000.0), (SENTINEL, 1, 200_000.0)]
    for i, (lrows, rrows) in enumerate(
        [
            (_VIEWS, _PURCHASES),
            (sent_l[:1], sent_r[:1]),
            (sent_l[1:], sent_r[1:]),
        ]
    ):
        mode = "overwrite" if i == 0 else "append"
        _left_df(spark, lrows).coalesce(1).write.mode(mode).parquet(lsrc)
        _right_df(spark, rrows).coalesce(1).write.mode(mode).parquet(rsrc)
    return lsrc, rsrc


def _run_live(spark, tmp_path, how, name, cols="user_id, view_id, purchase_id"):
    lsrc, rsrc = _write_stream_sources(spark, tmp_path)
    left = (
        spark.readStream.schema(_LEFT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(lsrc)
    )
    right = (
        spark.readStream.schema(_RIGHT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(rsrc)
    )
    out = _join(left, right, how)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        f"SELECT {cols} FROM {name} WHERE user_id <> {SENTINEL}"
    ).collect()
    return sorted(map(tuple, rows))


@pytest.mark.parametrize("how", ["inner", "left_outer"])
@pytest.mark.slow
def test_streaming_equals_batch(spark, tmp_path, how):
    got = _run_live(spark, tmp_path, how, f"ij_{how}")
    want = sorted(
        (r.user_id, r.view_id, r.purchase_id)
        for r in _join(_left_df(spark, _VIEWS), _right_df(spark, _PURCHASES), how).collect()
    )
    assert got == want


def test_batch_left_semi_emits_converted_views_once(spark):
    """left_semi: each view with >=1 in-window purchase appears exactly
    once, left columns only (view 10 matches TWO purchases yet emits one
    row)."""
    out = _join(_left_df(spark, _VIEWS), _right_df(spark, _PURCHASES), "left_semi")
    assert sorted(out.columns) == ["user_id", "view_id", "view_ts"]
    got = sorted((r.user_id, r.view_id) for r in out.collect())
    assert got == [(1, 10), (2, 20)]


@pytest.mark.slow
def test_streaming_left_semi_equals_batch(spark, tmp_path):
    got = _run_live(spark, tmp_path, "left_semi", "ij_semi", cols="user_id, view_id")
    want = sorted(
        (r.user_id, r.view_id)
        for r in _join(
            _left_df(spark, _VIEWS), _right_df(spark, _PURCHASES), "left_semi"
        ).collect()
    )
    assert got == want


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_events_strategy = st.lists(
    st.tuples(st.integers(min_value=1, max_value=3), st.integers(min_value=0, max_value=100)),
    min_size=0,
    max_size=12,
)


@settings(max_examples=5, deadline=None)
@given(
    lrows=_events_strategy,
    rrows=_events_strategy,
    lower=st.integers(min_value=0, max_value=30),
    width=st.integers(min_value=0, max_value=30),
)
def test_interval_join_equals_brute_force(spark, lrows, rrows, lower, width):
    """Hypothesis boundary sweep: random (user, ts) sets and random
    CLOSED bounds [lower, lower+width] must reproduce the brute-force
    predicate pair-for-pair — including zero-width windows (lower ==
    upper: only exact-lag matches) and duplicate timestamps."""
    upper = lower + width
    left = _left_df(spark, [(u, i, float(s)) for i, (u, s) in enumerate(lrows)])
    right = _right_df(spark, [(u, 100 + i, float(s)) for i, (u, s) in enumerate(rrows)])
    got = sorted(
        (r.user_id, r.view_id, r.purchase_id)
        for r in interval_join(
            left, right, key="user_id", left_ts="view_ts", right_ts="purchase_ts",
            lower_s=lower, upper_s=upper, how="inner",
        ).collect()
    )
    want = sorted(
        (ul, il, 100 + ir)
        for il, (ul, sl) in enumerate(lrows)
        for ir, (ur, sr) in enumerate(rrows)
        if ul == ur and sl + lower <= sr <= sl + upper
    )
    assert got == want
