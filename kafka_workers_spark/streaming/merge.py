"""Time-aware ordered merge of two streams (the reference's hardest
semantic, SURVEY.md §7 step 4).

Reference: the Merger pattern — pause the faster of two paired streams
until the slower one catches up, so paired partitions emit in global
timestamp order
(/root/reference/src/test/java/com/rtbhouse/kafka/workers/integration/
MergerTest.java:136-201; accept() at :152-162 releases a record only when
the sibling partition's last-seen timestamp >= its own; motivation
README.md:22).

Release rule (equivalent formulation): a record with timestamp t in pair
group g may be emitted iff t <= min over sides of max(seen ts) in g —
the "low watermark" of the pair. The tail above the slower side's frontier
stays buffered (reference: stays queued in the paused sub-partition).

Two implementations:

- :func:`merge_ordered` (batch/micro-batch): pure DataFrame ops — compute
  each side's frontier per group (one partial-agg shuffle on small state),
  broadcast-join the frontiers back, filter ts <= frontier, sort within
  group. No Python, no per-key loop; at 100 TB the frontier table is tiny
  (one row per pair group) and broadcasts.

- :func:`merge_ordered_stream` (Structured Streaming): per-group buffered
  state via applyInPandasWithState — rows accumulate in state until the
  group's low watermark passes them, then emit in ts order. Matches the
  reference's incremental pause/resume behavior; buffering is bounded by
  stream skew exactly as the reference's queues are.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def merge_ordered(
    left: DataFrame,
    right: DataFrame,
    group: str,
    ts: str,
    side_col: str = "side",
    single_scan: bool = False,
) -> DataFrame:
    """Batch ordered merge: union both sides, release rows up to the pair's
    low watermark min(max_left_ts, max_right_ts) per group.

    Returns the released ROW SET with a ``side`` tag; physical row order
    is not part of the batch contract (Spark output order is
    partition-dependent) — consumers needing the merged order sort by
    (ts, side), which reproduces the reference's golden sequence
    (MergerTest.java:118: ties emit the earlier-seen side; the side tag is
    the deterministic tiebreak). The streaming form emits in that order
    per batch by construction.

    Scan strategy — two shapes, both audited in ``tests/test_merge.py``:

    - default (``single_scan=False``): the union is consumed twice
      (frontier aggregate + release join), but the frontier subtree's scan
      is column-pruned to (group, side, ts) and its shuffle is a tiny
      partial aggregate; the broadcast join never shuffles the payload.
      Right when payload bytes dominate (wide rows): the "second scan"
      reads three narrow columns.
    - ``single_scan=True``: per-side frontiers computed as window maxima
      over ``partitionBy(group)`` — ONE scan per input, ONE full-data
      exchange, no join. Right for narrow rows where a second scan costs
      as much as the shuffle (ReusedExchange cannot fire on the join
      shape: the release side's ``ts <= watermark`` condition pushes an
      ``isnotnull(ts)`` filter the frontier subtree lacks, so the two
      exchanges are never structurally identical).
    """
    l_tag = left.withColumn(side_col, F.lit("left"))
    r_tag = right.withColumn(side_col, F.lit("right"))
    unioned = l_tag.unionByName(r_tag)
    if single_scan:
        from pyspark.sql import Window as W

        w = W.partitionBy(group)
        l_max = F.max(F.when(F.col(side_col) == "left", F.col(ts))).over(w)
        r_max = F.max(F.when(F.col(side_col) == "right", F.col(ts))).over(w)
        return (
            unioned.withColumn("__lw", F.when(l_max.isNotNull() & r_max.isNotNull(), F.least(l_max, r_max)))
            .filter(F.col(ts) <= F.col("__lw"))
            .drop("__lw")
        )
    frontiers = (
        unioned.groupBy(group, side_col)
        .agg(F.max(ts).alias("__max_ts"))
        .groupBy(group)
        # count NON-NULL frontiers: a side whose ts values are all NULL has
        # an unknown frontier (max ignores nulls) and must buffer its
        # sibling, exactly like a side with no rows — matching the
        # single_scan branch's isNotNull guard and the reference's accept()
        # while timestamps.get(otherPartition) == null
        .agg(F.min("__max_ts").alias("__low_watermark"), F.count("__max_ts").alias("__n_sides"))
    )
    released = (
        unioned.join(F.broadcast(frontiers), group)
        # a group with only one side present has no sibling frontier yet:
        # everything stays buffered, like the reference's accept() returning
        # false while timestamps.get(otherPartition) == null
        .filter((F.col("__n_sides") >= 2) & (F.col(ts) <= F.col("__low_watermark")))
        .drop("__low_watermark", "__n_sides")
        # join(group) moves the group column first; restore the union's
        # column order so both scan strategies yield one schema shape
        # (positional consumers: union by position, insertInto)
        .select(*unioned.columns)
    )
    return released


def merge_ordered_stream(
    left: DataFrame,
    right: DataFrame,
    group: str,
    ts: str,
    output_schema: str,
    side_col: str = "side",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming ordered merge with per-group buffering.

    State per group: {"buf": [{side, ts, payload...} ...], "max": {side: ts}}.
    Each micro-batch: fold new rows into the buffer, advance each side's
    frontier to max(seen), emit buffered rows with ts <= min(frontiers)
    in (ts, side) order, keep the rest buffered.

    TTL semantics (divergence from the reference, which keeps paused
    records queued indefinitely — README.md:22): when ``state_ttl_ms``
    expires, the remaining buffer is FLUSHED in (ts, side) order rather
    than dropped, so the path stays at-least-once; ordering relative to a
    sibling that never arrived is necessarily violated (there is nothing
    to order against).

    ``output_schema`` must name the group column, ``side``, ``ts`` and
    every payload column of the inputs — applyInPandasWithState assigns
    output struct fields BY NAME, so the declaration order in the schema
    string is free (the conventional shape is "<group>, side, <ts>,
    payload..."). Every non-group column (the full record, like the
    reference's queued WorkerRecords) rides through the buffer; payload
    values must be JSON-serializable (numbers/strings/bools — decode
    binary/timestamp columns to primitives before the merge).
    """
    l_tag = left.withColumn(side_col, F.lit("left"))
    r_tag = right.withColumn(side_col, F.lit("right"))
    unioned = l_tag.unionByName(r_tag)
    cols = [c for c in unioned.columns if c != group]  # side, ts, payload...

    def _emit(key: tuple, recs: list[dict]) -> pd.DataFrame:
        return pd.DataFrame(
            {group: [key[0]] * len(recs), **{c: [r[c] for r in recs] for c in cols}}
        )

    def handle(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "max": {}}
        if state.hasTimedOut:
            # flush (not drop) the unreleased tail — at-least-once on TTL
            leftovers = sorted(st["buf"], key=lambda r: (r[ts], r[side_col]))
            state.remove()
            if leftovers:
                yield _emit(key, leftovers)
            return
        for pdf in pdfs:
            # to_dict keeps arbitrary column names (itertuples mangles
            # non-identifier names like "user-agent" into _N positions)
            for raw in pdf[cols].to_dict("records"):
                rec = {
                    c: (v.item() if hasattr(v, "item") else v) for c, v in raw.items()
                }
                rec[ts] = int(rec[ts])
                st["buf"].append(rec)
                side = rec[side_col]
                st["max"][side] = max(st["max"].get(side, rec[ts]), rec[ts])
        if len(st["max"]) >= 2:
            low = min(st["max"].values())
            ready = sorted(
                [r for r in st["buf"] if r[ts] <= low], key=lambda r: (r[ts], r[side_col])
            )
            st["buf"] = [r for r in st["buf"] if r[ts] > low]
            if ready:
                yield _emit(key, ready)
        state.update((json.dumps(st),))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)

    timeout = GroupStateTimeout.ProcessingTimeTimeout if state_ttl_ms else GroupStateTimeout.NoTimeout
    return unioned.groupBy(group).applyInPandasWithState(
        handle,
        outputStructType=output_schema,
        stateStructType="state STRING",
        outputMode="append",
        timeoutConf=timeout,
    )
