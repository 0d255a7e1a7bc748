"""Port of the reference's offsets-core test suite: the commit semantics
the Spark engine inherits from Structured Streaming's atomic batch commits.

Reference: OffsetsStateTest.java (numbers quoted per case below),
RangeUtilsTest.java:17-39. Commit offsets use the Kafka next-offset
convention throughout (DefaultOffsetsState.java:266).
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_workers_spark.streaming.offsets import (
    BadOffsetError,
    ClosedRange,
    OffsetsState,
    ProcessingTimeoutError,
    SortedRanges,
    ranges_from_offsets,
)

TP = "topic-0"


def make_state(*consumed: tuple[int, int], at: float = 0.0) -> OffsetsState:
    s = OffsetsState()
    s.register(TP)
    for lo, hi in consumed:
        s.add_consumed(TP, ClosedRange(lo, hi), consumed_at=at)
    return s


# --- RangeUtilsTest.java:17-39 -------------------------------------------


@pytest.mark.parametrize(
    ("offsets", "expected"),
    [
        ([], []),
        ([0], [(0, 0)]),
        ([0, 1, 2], [(0, 2)]),
        ([0, 2, 3, 5], [(0, 0), (2, 3), (5, 5)]),
        ([1, 2, 5, 6, 7, 9], [(1, 2), (5, 7), (9, 9)]),
    ],
)
def test_ranges_from_offsets(offsets, expected):
    assert [(r.lower, r.upper) for r in ranges_from_offsets(offsets)] == expected


def test_ranges_from_offsets_rejects_non_ascending():
    with pytest.raises(BadOffsetError):
        ranges_from_offsets([3, 2])


# --- SortedRanges merge/split (SortedRanges.java:84-145) ------------------


def test_sorted_ranges_merges_touching():
    sr = SortedRanges()
    sr.add(1)
    sr.add(3)
    sr.add(2)  # bridges [1,1] and [3,3]
    assert [(r.lower, r.upper) for r in sr] == [(1, 3)]


def test_sorted_ranges_rejects_overlap():
    sr = SortedRanges()
    sr.add_range(ClosedRange(1, 5))
    with pytest.raises(BadOffsetError):
        sr.add(3)


def test_sorted_ranges_remove_below_splits():
    sr = SortedRanges()
    sr.add_range(ClosedRange(0, 9))
    sr.remove_below(4)
    assert [(r.lower, r.upper) for r in sr] == [(5, 9)]


# --- OffsetsStateTest invariants ------------------------------------------


def test_duplicate_consume_rejected():  # OffsetsStateTest.java:56-101
    s = make_state((0, 5))
    with pytest.raises(BadOffsetError):
        s.add_consumed(TP, ClosedRange(3, 7))


def test_out_of_order_processing_commits_contiguous_prefix():
    # OffsetsStateTest.java:114-138 — processing 0..5 shuffled commits 6
    s = make_state((0, 9))
    for off in [3, 0, 5, 1, 4, 2]:
        s.update_processed(TP, off)
    assert s.get_offsets_to_commit() == {TP: 6}


def test_gap_blocks_commit():
    # OffsetsStateTest.java:140-167 — consumed 0-6, processed {0-2,4-6} → 3
    s = make_state((0, 6))
    for off in [0, 1, 2, 4, 5, 6]:
        s.update_processed(TP, off)
    assert s.get_offsets_to_commit() == {TP: 3}


def test_never_consumed_gap_does_not_block():
    # OffsetsStateTest.java:332-349 — gaps between consumed ranges are fine
    s = make_state((0, 2), (5, 6))
    for off in [0, 1, 2, 5, 6]:
        s.update_processed(TP, off)
    assert s.get_offsets_to_commit() == {TP: 7}


def test_partition_independence():  # OffsetsStateTest.java:169-198
    s = OffsetsState()
    s.register("a-0")
    s.register("a-1")
    s.add_consumed("a-0", ClosedRange(0, 3))
    s.add_consumed("a-1", ClosedRange(0, 3))
    s.update_processed("a-0", 0)
    s.update_processed("a-0", 1)
    s.update_processed("a-1", 0)
    assert s.get_offsets_to_commit() == {"a-0": 2, "a-1": 1}


def test_not_consumed_rejected():  # OffsetsStateTest.java:222-264
    s = make_state((0, 3))
    with pytest.raises(BadOffsetError):
        s.update_processed(TP, 9)


def test_double_processed_rejected():
    s = make_state((0, 3))
    s.update_processed(TP, 1)
    with pytest.raises(BadOffsetError):
        s.update_processed(TP, 1)


def test_remove_committed_then_continue():
    s = make_state((0, 9))
    for off in range(5):
        s.update_processed(TP, off)
    commits = s.get_offsets_to_commit()
    assert commits == {TP: 5}
    s.remove_committed(commits)
    assert s.get_offsets_to_commit() == {}  # no new progress
    for off in range(5, 10):
        s.update_processed(TP, off)
    assert s.get_offsets_to_commit() == {TP: 10}


def test_timeout_selection():  # OffsetsStateTest.java:266-303
    s = OffsetsState()
    s.register(TP)
    s.add_consumed(TP, ClosedRange(0, 4), consumed_at=100.0)
    s.add_consumed(TP, ClosedRange(5, 9), consumed_at=200.0)
    for off in range(0, 5):
        s.update_processed(TP, off)
    s.timeout_records_consumed_before(150.0)  # first range fully processed
    with pytest.raises(ProcessingTimeoutError):
        s.timeout_records_consumed_before(250.0)  # second range pending


# --- randomized processing orders (OffsetsStateTest.java:305-412 uses
# ListShuffler forward/reversed/random; hypothesis generalizes it) ---------


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=40),
    k=st.integers(min_value=0, max_value=40),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_commit_is_longest_prefix_under_any_processing_order(n, k, seed):
    k = min(k, n)
    s = make_state((0, n - 1))
    order = list(range(n))
    random.Random(seed).shuffle(order)
    done = sorted(order[:k])
    for off in order[:k]:
        s.update_processed(TP, off)
    # expected: longest prefix 0..p-1 fully processed
    p = 0
    while p < n and p in set(done):
        p += 1
    expected = {} if p == 0 else {TP: p}
    assert s.get_offsets_to_commit() == expected
