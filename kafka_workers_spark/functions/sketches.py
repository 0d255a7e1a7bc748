"""Mergeable sketch aggregates: the incremental-rollup surface of a
100 TB analytics pipeline.

At scale you do not re-scan history to answer "distinct users this
quarter" — you keep a per-day (or per-partition) SKETCH column and merge
sketches. HLL register-merge is associative and commutative, so a union
of partial sketches estimates the same set within the same error bound
no matter how the data was partitioned (DataSketches' sparse→dense
representation transitions make the merged bytes — and the last decimals
of the estimate — differ slightly from a single pass, but the relative
standard error bound is unchanged): rollups read only pre-aggregated
rows, never raw history. Spark exposes Apache DataSketches HLL
(hll_sketch_agg / hll_union_agg / hll_sketch_estimate) natively — these
wrappers pin the engine's chosen defaults and shape the rollup pattern.

The reference framework has no aggregate surface at all (opaque payloads,
user tasks); this module is part of the engine's analytical extension,
like the dedup/similarity families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: log2 of HLL register count: 4KB sketches, ~1.6% relative standard error
DEFAULT_LG_K = 12


def distinct_sketch(col: Column | str, lg_k: int = DEFAULT_LG_K) -> Column:
    """HLL sketch (binary, mergeable) of a column's distinct values —
    store this per partition/day instead of raw values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.hll_sketch_agg(c, F.lit(lg_k))


def merge_distinct_sketches(
    sketch_col: Column | str, allow_different_lg_k: bool = False
) -> Column:
    """Union previously-stored sketches (register max-merge — associative,
    so any grouping of partials estimates within the same bound).

    ``allow_different_lg_k=False`` (default) makes a precision mismatch
    ERROR instead of silently downgrading the union to the lowest
    precision present — a backfill written at a smaller lg_k would
    otherwise quietly void the error bound of every rollup touching it.
    """
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.hll_union_agg(c, F.lit(allow_different_lg_k))


def distinct_estimate(sketch_col: Column | str) -> Column:
    """Cardinality estimate from a sketch column (bigint)."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.hll_sketch_estimate(c)


def incremental_distinct_rollup(
    df: DataFrame,
    partition_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    out: str = "distinct_sketch",
) -> DataFrame:
    """The store-this shape: one mergeable sketch row per partition.

    Downstream, any partition subset rolls up without touching raw data::

        daily = incremental_distinct_rollup(events, ["day"], "user_id")
        q = daily.where(...).agg(
            distinct_estimate(merge_distinct_sketches("distinct_sketch"))
              .alias("distinct_users"))
    """
    return df.groupBy(*partition_cols).agg(distinct_sketch(value_col, lg_k).alias(out))


def approx_quantiles(
    col: Column | str, probabilities: list[float], accuracy: int = 10_000
) -> Column:
    """Mergeable approximate quantiles (Greenwald-Khanna variant behind
    percentile_approx): rank error <= 1/accuracy. The partial+final merge
    is automatic — partition-count independent within the error bound."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(
        c, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )


def heavy_hitters(
    df: DataFrame, cols: list[str], k: int, min_count: int = 1, out: str = "hh_count"
) -> DataFrame:
    """Exact top-k frequent values with scale-correct shape: the groupBy
    count runs with map-side partial aggregation (shuffle carries one
    partial count per distinct value per partition, never raw rows) and
    the top-k is a TakeOrdered, not a global sort. Deterministic
    tiebreak on the value itself. ``out`` names the count column
    (collision-checked against the grouping columns)."""
    if out in cols:
        raise ValueError(f"count column name {out!r} collides with a grouping column")
    counts = df.groupBy(*cols).agg(F.count("*").alias(out)).filter(F.col(out) >= min_count)
    return counts.orderBy(F.desc(out), *[F.asc(c) for c in cols]).limit(k)


def frequent_items(
    df: DataFrame,
    col: str,
    capacity: int = 1024,
    k: int = 20,
) -> DataFrame:
    """Approximate top-k frequent values in BOUNDED memory — the mergeable
    companion to :func:`heavy_hitters` for ultra-high-cardinality columns,
    where even the exact groupBy's per-partition partial map is the
    problem (one entry per distinct value per partition).

    Misra-Gries summaries (batched form: fold each Arrow batch's
    value_counts into <= ``capacity`` counters, subtracting the minimum
    count whenever the table overflows), one per partition, then an
    exact count-sum merge — summing MG underestimates is itself a valid
    MG merge, so the guarantees compose: every item with true count
    > n/(capacity+1) is PRESENT, and for each returned item
    ``count_min <= true count <= count_max`` (count_max adds the total
    decrement mass, tracked per partition and summed).

    Values are compared as strings (cast before the sketch) so one
    implementation serves any input type. The per-partition summary is
    <= capacity rows — the merge input is partitions x capacity rows, not
    data-sized.
    """
    import pandas as pd

    src = df.select(F.col(col).cast("string").alias("__v"))

    def mg(batches):
        counters: dict[str, int] = {}
        dec = 0
        for pdf in batches:
            vc = pdf["__v"].dropna().value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            while len(counters) > capacity:
                m = min(counters.values())
                dec += m
                counters = {key: c - m for key, c in counters.items() if c > m}
        out = pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "cnt": [int(c) for c in counters.values()] + [0],
                "dec": [0] * len(counters) + [dec],
            }
        )
        yield out

    from pyspark.storagelevel import StorageLevel

    # two consumers (bound aggregate + count merge) — pin the tiny
    # summaries (<= partitions x capacity rows) so the data scan runs
    # once, with lineage retained (ARCHITECTURE.md §4 rule 3)
    summaries = src.mapInPandas(mg, "item string, cnt long, dec long").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # the decrement bound is global: broadcast the one-row aggregate back
    bound = summaries.agg(F.sum("dec").alias("__bound"))
    merged = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("count_min"))
        .crossJoin(F.broadcast(bound))
        .select(
            "item",
            "count_min",
            (F.col("count_min") + F.col("__bound")).alias("count_max"),
        )
    )
    return merged.orderBy(F.desc("count_min"), F.asc("item")).limit(k)


def skew_report(
    df: DataFrame,
    cols: list[str],
    capacity: int = 1024,
    k: int = 10,
) -> DataFrame:
    """Pre-join skew diagnostic: the top-k heaviest key values of a
    prospective join/groupBy key with their corpus fraction — read this
    BEFORE shipping a join at 100 TB (a key holding 10% of rows makes
    one task do 10% of the shuffle; that's a salting candidate, see
    operators/relational.py's salted join). Bounded memory via
    :func:`frequent_items`; fractions use count_min (conservative:
    reported fraction never exceeds truth by more than the MG bound).
    """
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    items = frequent_items(df.select(key.alias("__key")), "__key", capacity=capacity, k=k)
    total = df.count()
    return items.select(
        F.col("item").alias("key"),
        "count_min",
        "count_max",
        (F.col("count_min") / F.lit(max(total, 1))).alias("fraction_min"),
    )
