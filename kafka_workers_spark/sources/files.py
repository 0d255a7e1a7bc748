"""File-based sources over the driver-generated parquet test tables.

Batch: plain ``spark.read.parquet`` — columnar scan with predicate pushdown
and column pruning (verify with ``df.explain``: PushedFilters/ReadSchema).

Streaming: ``spark.readStream.format("parquet")`` over the same files, used
where the reference would consume Kafka — the downstream operator surface is
identical (same DataFrame schema), per SURVEY.md §1.1.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_GENERATE_FILTER_RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


@contextmanager
def _nanos_as_long(spark: SparkSession):
    """Scope spark.sql.legacy.parquet.nanosAsLong=true to one relation
    resolution (restores the previous value, set or unset, after)."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _tune_runtime(spark: SparkSession) -> None:
    """Apply scheduler settings that matter even on externally-built
    sessions (the driver harness constructs its own): locality waits are
    read live from SparkConf per task set, and a non-zero wait stalls
    JVM shuffle stages for seconds per task slot once any Python-UDF stage
    has registered worker-affined locations (see session.py)."""
    try:
        spark.sparkContext._jsc.sc().conf().set("spark.locality.wait", "0s")  # noqa: SLF001
    except Exception:  # noqa: BLE001 — best-effort on exotic session types
        pass
    # The test tables store naive timestamp[us], which Spark would infer as
    # TIMESTAMP_NTZ (isAdjustedToUTC=false + inferTimestampNTZ default true);
    # NTZ rejects instant-typed functions (unix_micros, to_utc_timestamp).
    # Read timestamps as instants instead — with the session timezone pinned
    # to UTC the rendered/epoch values are identical to the naive oracle.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # InferFiltersFromGenerate turns explode(computed_array) into a
    # size>0 filter that sinks below repartition exchanges with the whole
    # array-expression tree inlined — re-deriving interpreted shingle
    # transforms at the scan, once per consuming branch (see
    # operators.dedup.barrier). The rule only ever skips empty-array rows
    # before a generate; for this engine's computed arrays that saves
    # nothing and costs O(shingles × tokens) per row.
    current = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    rules = [r for r in (current or "").split(",") if r]
    if _GENERATE_FILTER_RULE not in rules:
        rules.append(_GENERATE_FILTER_RULE)
        spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(rules))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch-read one test table (columnar, pushdown-capable).

    ``events.ts`` is physically timestamp[ns], which the Spark parquet
    reader rejects; read nanos as long and convert to a microsecond
    timestamp (the generator's sub-microsecond part is zero, so this is
    lossless).

    The session timezone is pinned to UTC (runtime-settable): parquet
    timestamps are instants, and a non-UTC session would shift every
    rendered/epoch-converted value away from the UTC-naive oracle.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _tune_runtime(spark)
    if name == "events":
        # nanosAsLong only while resolving THIS relation (the schema is
        # inferred eagerly at read.parquet); leaking it session-wide would
        # silently type every later user parquet read's timestamp[ns]
        # columns as bigint
        with _nanos_as_long(spark):
            df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            # integer DIV: float division loses precision at ns-epoch magnitude
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can be expressed in SQL too."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """General batch file reader: parquet / orc / json / csv / text (avro
    requires the external spark-avro package — raise a clear error rather
    than a Py4J stack when it is absent).

    Column pruning and (for columnar formats) predicate pushdown come from
    the DataSource V2 scan; for json/csv supply ``schema`` — inference
    costs a full extra pass over the data, which at 100 TB is the
    difference between one scan and two.
    """
    fmt = fmt.lower()
    if fmt not in ("parquet", "orc", "json", "csv", "text", "avro"):
        raise ValueError(f"unsupported format: {fmt!r}")
    _tune_runtime(spark)  # naive-timestamp handling applies to any reader
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    try:
        return reader.load(path)
    except Exception as exc:  # noqa: BLE001
        # data-source resolution happens at load(), not format(): map the
        # raw Py4J "Failed to find data source: avro" to a clear error
        if fmt == "avro" and "data source" in str(exc).lower():
            raise RuntimeError(
                "avro requires the spark-avro package (org.apache.spark:spark-avro)"
            ) from exc
        raise


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sorted) table.

    Equi-joins and aggregations on the bucket keys between tables bucketed
    the same way read co-located — NO shuffle on either side (asserted in
    tests/test_plans.py). At 100 TB this is the difference between a
    one-off layout cost at ingest and re-shuffling the fact table on every
    join; bucket count should be sized so one bucket ≈ one task's worth of
    data at the target scale.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def write_sized(
    df: DataFrame,
    path: str,
    target_mb: int = 256,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write with files sized for the target scale — the small-files /
    giant-files answer for 100 TB outputs.

    Uses the AQE ``REBALANCE`` hint: the exchange is sized AT RUNTIME
    from the actual shuffle statistics (advisoryPartitionSizeInBytes =
    ``target_mb``), splitting skewed partitions and coalescing tiny ones
    — strictly better than a static ``repartition(n)`` guess, which
    under- or over-shoots the moment the input volume drifts. A curation
    pipeline that filtered 90% of its input would otherwise write
    thousands of near-empty files (metadata pressure on every downstream
    scan); an unfiltered one would write multi-GB files (no scan
    parallelism without splitting).

    With ``partition_by``, rebalances ON those columns so each Hive
    partition's rows land together before the write (one file per
    partition-value per ~target, not one per task per value — the
    classic partitioned-write file explosion).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(target_mb * 1024 * 1024)
    )
    try:
        balanced = df.hint("rebalance", *(partition_by or []))
        writer = balanced.write.format(fmt).mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        else:
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming read of a test table (file source, one-file micro-batch).

    Stand-in for ``readStream.format("kafka")`` in this container; schema is
    taken from the batch read so the stream needs no inference. The
    ``events`` nanos-timestamp handling mirrors :func:`load_table`.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _tune_runtime(spark)
    path = table_path(sf_dir, name)
    if name == "events":
        with _nanos_as_long(spark):
            schema = spark.read.parquet(path).schema
    else:
        schema = spark.read.parquet(path).schema
    # the test tables are single parquet FILES; the file stream source
    # derives basePath from the glob-free prefix of the pattern and requires
    # it to be a directory, so force one glob char to anchor basePath at the
    # SF directory while still matching only this table's file
    pattern = os.path.join(sf_dir, f"{name}.parque[t]")
    df = spark.readStream.schema(schema).parquet(pattern)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "__z"
) -> DataFrame:
    """Add a Z-order (Morton) key over ``cols`` — the multi-column
    data-skipping layout key (the lakehouse OPTIMIZE ... ZORDER BY
    technique; Spark OSS has no built-in). Each column is linearly
    scaled to a ``bits``-bit integer code between its global min and max
    (one tiny min/max aggregate carried in-plan as a one-row broadcast —
    job-free build, the package contract), and the codes' bits are
    interleaved into one long. Sorting by the key clusters rows that are
    close in EVERY dimension, so parquet row-group min/max stats become
    tight bounding boxes and a scan with predicates on any subset of the
    columns prunes row groups it could never prune under a single-column
    sort.

    Numeric, date and timestamp columns only (dates scale as epoch days,
    timestamps as epoch microseconds, numerics as doubles); NULLs code to 0
    (they sort with the minimum — filter them out first if that pollutes
    the boxes). Linear scaling is skew-sensitive: a heavily clustered
    column spends few distinct codes where the data lives.
    ``bits × len(cols)`` must fit a signed long (<= 63). The whole key
    is codegen'd column arithmetic — no Python, no extra shuffle beyond
    the caller's sort.
    """
    if not cols:
        raise ValueError("zorder_key: need at least one column")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(
            f"zorder_key: bits*len(cols) must be in [1, 63], got {bits}*{len(cols)}"
        )
    numeric = ("int", "bigint", "smallint", "tinyint", "float", "double")
    types = dict(df.dtypes)

    def scalar(c: str):
        t = types.get(c)
        if t is None:
            raise ValueError(f"zorder_key: no such column {c}")
        if t in numeric or t.startswith("decimal"):
            return F.col(c).cast("double")
        if t == "date":
            return F.unix_date(F.col(c)).cast("double")
        if t in ("timestamp", "timestamp_ntz"):
            # ntz interprets in the session zone — a fixed offset, so
            # ordering (all the code needs) is unchanged
            return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        raise ValueError(f"zorder_key: unsupported column type {c}: {t}")

    scalars = {c: scalar(c) for c in cols}
    top = (1 << bits) - 1
    stats = df.agg(
        *[F.min(scalars[c]).alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(scalars[c]).alias(f"__mx_{i}") for i, c in enumerate(cols)],
    )
    out = df.crossJoin(F.broadcast(stats))
    codes = []
    for i, c in enumerate(cols):
        mn, mx = F.col(f"__mn_{i}"), F.col(f"__mx_{i}")
        span = mx - mn
        scaled = F.floor((scalars[c] - mn) / span * top)
        code = (
            F.when(F.col(c).isNull() | mn.isNull() | (span <= 0.0), F.lit(0))
            .otherwise(F.least(F.greatest(scaled, F.lit(0)), F.lit(top)))
            .cast("bigint")
        )
        codes.append(code)
    z = F.lit(0).cast("bigint")
    n = len(cols)
    one = F.lit(1).cast("bigint")
    for b in range(bits):
        for j, code in enumerate(codes):
            # Column & / | are LOGICAL operators in PySpark; the bitwise
            # forms are methods
            bit = F.shiftright(code, b).bitwiseAND(one)
            z = z.bitwiseOR(F.shiftleft(bit, b * n + j))
    return out.withColumn(key_col, z).drop(
        *[f"__mn_{i}" for i in range(n)], *[f"__mx_{i}" for i in range(n)]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    n_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-order-clustered on ``zorder_by``: range-partition
    on the interleaved key (:func:`zorder_key`), sort within partitions,
    drop the key, write. Each output file then covers a tight
    multi-dimensional bounding box, and any later scan filtering on the
    z-ordered columns skips whole row groups via parquet min/max stats —
    at 100 TB the difference between touching a few files and scanning
    the table for a point-ish predicate on a non-partition column.
    ``n_files`` defaults to the session's shuffle parallelism; size it
    so one file ≈ one task's worth at the target scale (or compact with
    :func:`write_sized` semantics afterwards).
    """
    spark = df.sparkSession
    n = n_files or int(spark.conf.get("spark.sql.shuffle.partitions"))
    keyed = zorder_key(df, zorder_by, bits=bits)
    (
        keyed.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )
