"""Offset-range commit semantics: the reference's core invariant as a
pure-Python semantic model.

Reference: ``OffsetsState`` / ``DefaultOffsetsState``
(/root/reference/src/main/java/com/rtbhouse/kafka/workers/impl/offsets/
DefaultOffsetsState.java:142-339), ``ClosedRange``
(impl/range/ClosedRange.java:3-28), ``SortedRanges``
(impl/range/SortedRanges.java:19-193).

At runtime the Spark engine does NOT need any of this: a Structured
Streaming micro-batch commits its end offsets atomically after every task
succeeds, which reproduces "commit = longest processed prefix of consumed
offsets" by construction (SURVEY.md §3.2). This module exists because the
semantics still need to be *stated and tested* — it is the oracle for the
engine's delivery guarantees (tests/test_offsets.py ports
OffsetsStateTest's invariants, including randomized processing orders).

Error parity (impl/errors/BadOffsetException.java):
- consuming an offset twice raises
- processing an unconsumed offset raises
- processing an offset twice raises
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field


class BadOffsetError(ValueError):
    """Parity with the reference's BadOffsetException."""


class ProcessingTimeoutError(TimeoutError):
    """Parity with the reference's ProcessingTimeoutException (A9)."""


@dataclass(frozen=True, order=True)
class ClosedRange:
    """Inclusive [lower, upper] offset range (ClosedRange.java:3-28)."""

    lower: int
    upper: int

    def __post_init__(self) -> None:
        if self.lower > self.upper:
            raise ValueError(f"range lower {self.lower} > upper {self.upper}")

    def __contains__(self, offset: int) -> bool:
        return self.lower <= offset <= self.upper

    def size(self) -> int:
        return self.upper - self.lower + 1


def ranges_from_offsets(offsets: list[int]) -> list[ClosedRange]:
    """Compress an ascending offset list into maximal contiguous ranges
    (RangeUtils.java:12-37)."""
    out: list[ClosedRange] = []
    for off in offsets:
        if out and out[-1].upper + 1 == off:
            out[-1] = ClosedRange(out[-1].lower, off)
        elif out and off <= out[-1].upper:
            raise BadOffsetError(f"offsets not ascending at {off}")
        else:
            out.append(ClosedRange(off, off))
    return out


class SortedRanges:
    """Sorted disjoint ranges with merge-on-insert of touching neighbours
    (SortedRanges.java:84-117) — list + bisect instead of a TreeSet."""

    def __init__(self) -> None:
        self._lowers: list[int] = []
        self._ranges: list[ClosedRange] = []

    def __len__(self) -> int:
        return len(self._ranges)

    def __iter__(self):
        return iter(self._ranges)

    def add(self, offset: int) -> None:
        self.add_range(ClosedRange(offset, offset))

    def add_range(self, r: ClosedRange) -> None:
        i = bisect.bisect_left(self._lowers, r.lower)
        # overlap checks against neighbours
        if i > 0 and self._ranges[i - 1].upper >= r.lower:
            raise BadOffsetError(f"range {r} overlaps {self._ranges[i - 1]}")
        if i < len(self._ranges) and self._ranges[i].lower <= r.upper:
            raise BadOffsetError(f"range {r} overlaps {self._ranges[i]}")
        # merge with touching left/right neighbours
        lower, upper = r.lower, r.upper
        if i > 0 and self._ranges[i - 1].upper + 1 == lower:
            lower = self._ranges[i - 1].lower
            del self._ranges[i - 1], self._lowers[i - 1]
            i -= 1
        if i < len(self._ranges) and upper + 1 == self._ranges[i].lower:
            upper = self._ranges[i].upper
            del self._ranges[i], self._lowers[i]
        merged = ClosedRange(lower, upper)
        self._ranges.insert(i, merged)
        self._lowers.insert(i, lower)

    def contains(self, offset: int) -> bool:
        i = bisect.bisect_right(self._lowers, offset)
        return i > 0 and offset in self._ranges[i - 1]

    def run_containing(self, offset: int) -> ClosedRange | None:
        """The contiguous processed run containing `offset`, if any
        (commit calc, DefaultOffsetsState.java:277-302)."""
        i = bisect.bisect_right(self._lowers, offset)
        if i == 0:
            return None
        r = self._ranges[i - 1]
        return r if offset in r else None

    def remove_below(self, offset: int) -> None:
        """Drop all state <= offset (removeCommitted,
        DefaultOffsetsState.java:319-339)."""
        while self._ranges and self._ranges[0].upper <= offset:
            del self._ranges[0], self._lowers[0]
        if self._ranges and self._ranges[0].lower <= offset:
            r = self._ranges[0]
            self._ranges[0] = ClosedRange(offset + 1, r.upper)
            self._lowers[0] = offset + 1


@dataclass
class _ConsumedRange:
    range: ClosedRange
    consumed_at: float  # seconds


@dataclass
class _PartitionState:
    consumed: list[_ConsumedRange] = field(default_factory=list)  # ascending, disjoint
    processed: SortedRanges = field(default_factory=SortedRanges)
    last_committed: int | None = None


class OffsetsState:
    """Consume/process/commit bookkeeping for one consumer group.

    commit(tp) = the longest *processed prefix of consumed offsets*:
    never-consumed gaps between consumed ranges do not block the commit
    (OffsetsStateTest.java:332-349), out-of-order processing commits only
    the contiguous prefix (OffsetsStateTest.java:114-138).
    """

    def __init__(self) -> None:
        self._parts: dict[str, _PartitionState] = {}

    def register(self, tp: str) -> None:
        self._parts.setdefault(tp, _PartitionState())

    def unregister(self, tp: str) -> None:
        self._parts.pop(tp, None)

    def _state(self, tp: str) -> _PartitionState:
        if tp not in self._parts:
            raise BadOffsetError(f"partition {tp} not registered")
        return self._parts[tp]

    def add_consumed(self, tp: str, r: ClosedRange, consumed_at: float = 0.0) -> None:
        st = self._state(tp)
        if st.consumed and r.lower <= st.consumed[-1].range.upper:
            raise BadOffsetError(f"{tp}: offset {r.lower} already consumed")
        if st.processed.contains(r.lower):
            raise BadOffsetError(f"{tp}: offset {r.lower} already processed")
        st.consumed.append(_ConsumedRange(r, consumed_at))

    def update_processed(self, tp: str, offset: int) -> None:
        st = self._state(tp)
        if not any(offset in cr.range for cr in st.consumed):
            raise BadOffsetError(f"{tp}: offset {offset} processed but not consumed")
        st.processed.add(offset)  # raises on double-process (overlap)

    def get_offsets_to_commit(self) -> dict[str, int]:
        """Per partition: the offset to commit in Kafka convention (next
        offset to consume = last offset of the longest processed prefix of
        consumed offsets, plus one — DefaultOffsetsState.java:266,277-302),
        omitting partitions with no new progress."""
        out: dict[str, int] = {}
        for tp, st in self._parts.items():
            commit = self._commit_for(st)
            if commit is not None and commit != st.last_committed:
                out[tp] = commit
        return out

    @staticmethod
    def _commit_for(st: _PartitionState) -> int | None:
        """Walk consumed ranges in order; extend the processed prefix while
        each range's head run is processed. Gaps *between* consumed ranges
        never block (they were never consumed, OffsetsStateTest.java:332-349);
        a gap *inside* a consumed range stops the prefix."""
        last: int | None = None
        for cr in st.consumed:
            r = cr.range
            run = st.processed.run_containing(r.lower)
            if run is None:
                break
            end = min(run.upper, r.upper)
            last = end
            if end < r.upper:
                break
        return None if last is None else last + 1

    def remove_committed(self, committed: dict[str, int]) -> None:
        """Drop state strictly below the committed (next-to-consume) offset
        (removeCommitted, DefaultOffsetsState.java:319-339)."""
        for tp, next_offset in committed.items():
            st = self._state(tp)
            done = next_offset - 1
            st.processed.remove_below(done)
            new: list[_ConsumedRange] = []
            for cr in st.consumed:
                r = cr.range
                if r.upper <= done:
                    continue
                if r.lower <= done:
                    new.append(_ConsumedRange(ClosedRange(done + 1, r.upper), cr.consumed_at))
                else:
                    new.append(cr)
            st.consumed = new
            st.last_committed = next_offset

    def timeout_records_consumed_before(self, deadline: float) -> None:
        """A9: if any consumed-but-unprocessed record was consumed before
        `deadline`, raise (DefaultOffsetsState.java:223-256)."""
        for tp, st in self._parts.items():
            for cr in st.consumed:
                if cr.consumed_at >= deadline:
                    continue
                r = cr.range
                run = st.processed.run_containing(r.lower)
                fully = run is not None and run.upper >= r.upper
                if not fully:
                    first = r.lower if run is None else min(run.upper + 1, r.upper)
                    raise ProcessingTimeoutError(
                        f"{tp}: offset {first} consumed at {cr.consumed_at} "
                        f"not processed before {deadline}"
                    )
