"""Source surface: multi-format file readers and the value-decode
deserializer mapping (SURVEY.md §2 Table B "File formats" row;
reference delegates all payload decoding to pluggable deserializers,
api/WorkersConfig.java:39, README.md:83-84).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_workers_spark.sources.decode import decode_value
from kafka_workers_spark.sources.files import load_table, read_files

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["json", "csv", "orc"])
def test_read_files_roundtrip(spark, tmp_path, fmt):
    """nation written as json/csv/orc reads back value-identical to the
    parquet original (schema supplied — no inference pass)."""
    src = load_table(spark, SF, "nation")
    path = str(tmp_path / fmt)
    writer = src.coalesce(1).write.format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)

    opts = {"header": "true"} if fmt == "csv" else None
    back = read_files(spark, path, fmt, schema=src.schema, options=opts)
    want = sorted(tuple(r) for r in src.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want


def test_read_files_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_files(spark, "/tmp/x", "xml")


def test_decode_value_json_and_csv(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 7, "b": "x"}', "7,x"), (2, "not json", "8,y")],
        "id long, vjson string, vcsv string",
    )
    j = decode_value(df, "json", "a bigint, b string", column="vjson", out="d")
    rows = {r.id: r.d for r in j.collect()}
    assert rows[1].a == 7 and rows[1].b == "x"
    assert rows[2].a is None  # malformed -> null struct fields (PERMISSIVE)

    c = decode_value(df, "csv", "a bigint, b string", column="vcsv", out="d")
    rows = {r.id: r.d for r in c.collect()}
    assert rows[1].a == 7 and rows[2].b == "y"


def test_decode_value_binary_and_string_passthrough(spark):
    df = spark.createDataFrame([(b"payload",)], "value binary")
    assert decode_value(df, "string").select("decoded").first()[0] == "payload"
    assert decode_value(df, "binary").select("decoded").first()[0] == bytearray(b"payload")


def test_decode_value_requires_schema(spark):
    df = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(ValueError, match="requires a DDL schema"):
        decode_value(df, "json")


def test_avro_missing_package_clear_error(spark, tmp_path):
    """Data-source resolution happens at load(): without the external
    spark-avro package the reader must surface the documented RuntimeError,
    not a raw Py4J stack."""
    import pytest

    from kafka_workers_spark.sources.files import read_files

    with pytest.raises(RuntimeError, match="spark-avro"):
        read_files(spark, str(tmp_path / "x.avro"), "avro")


def test_write_sized_coalesces_tiny_output(spark, tmp_path):
    """write_sized: a many-partition tiny DataFrame lands in few
    right-sized files (AQE REBALANCE coalesces), not one near-empty file
    per task — and the content round-trips."""
    import os

    from kafka_workers_spark.sources.files import write_sized

    out = str(tmp_path / "sized")
    df = spark.range(10_000).repartition(32).selectExpr("id", "id * 2 AS v")
    before = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    write_sized(df, out, target_mb=64)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert 1 <= len(files) <= 4, files  # 32 tiny tasks coalesced
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.selectExpr("sum(v)").first()[0] == 10_000 * 9_999
    # the advisory size conf is restored to its pre-call value
    after = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    assert after == before


def test_write_sized_partitioned_no_file_explosion(spark, tmp_path):
    """partition_by rebalances on the partition columns first: each
    Hive-partition directory holds ONE file here, not one per input
    task (the classic partitioned-write explosion)."""
    import os

    from kafka_workers_spark.sources.files import write_sized

    out = str(tmp_path / "byk")
    df = spark.range(5_000).repartition(16).selectExpr("id", "id % 3 AS k")
    write_sized(df, out, target_mb=64, partition_by=["k"])
    for k in (0, 1, 2):
        d = os.path.join(out, f"k={k}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (k, files)
    assert spark.read.parquet(out).count() == 5_000


# ---------------------------------------------------------------------------
# Z-order layout (zorder_key / write_zordered)
# ---------------------------------------------------------------------------


def _file_boxes(path, cols):
    """Per-parquet-file (min, max) spans for ``cols`` from footer stats."""
    import os

    import pyarrow.parquet as pq

    boxes = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        if all(lo[c] is not None for c in cols):
            boxes.append({c: (lo[c], hi[c]) for c in cols})
    return boxes


def test_write_zordered_tightens_file_bounding_boxes(spark, tmp_path):
    """The point of the layout: with the same file count, z-ordered files
    cover small multi-dimensional boxes (so min/max row-group skipping
    can prune on EITHER column), while the natural write's files each
    span nearly the full range of both. Row set round-trips exactly."""
    from kafka_workers_spark.sources.files import load_table, write_zordered

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    natural = str(tmp_path / "natural")
    zordered = str(tmp_path / "zordered")
    orders.repartition(8).write.parquet(natural)
    write_zordered(orders, zordered, ["o_custkey", "o_totalprice"], n_files=8)

    # identical content
    back = spark.read.parquet(zordered)
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0

    cols = ["o_custkey", "o_totalprice"]
    spans = {}
    for tag, path in (("natural", natural), ("zorder", zordered)):
        boxes = _file_boxes(path, cols)
        assert len(boxes) >= 4, f"{tag}: expected several files, got {len(boxes)}"
        # normalized box area summed over files (fraction of the full
        # 2-D range each file covers, averaged)
        full = {c: (min(b[c][0] for b in boxes), max(b[c][1] for b in boxes)) for c in cols}
        area = 0.0
        for b in boxes:
            frac = 1.0
            for c in cols:
                lo, hi = full[c]
                frac *= (b[c][1] - b[c][0]) / (hi - lo) if hi > lo else 1.0
            area += frac
        spans[tag] = area / len(boxes)
    # natural files each cover ~the whole plane (mean area ≈ 1); z-order
    # boxes must be at least 3x tighter on average
    assert spans["zorder"] < spans["natural"] / 3.0, spans


def test_zorder_key_validation_and_job_free_build(spark):
    import pytest

    from kafka_workers_spark.sources.files import load_table, zorder_key

    orders = load_table(spark, SF, "orders")
    sc = spark.sparkContext
    sc.setJobGroup("zorder-build-probe", "assert no eager action")
    try:
        keyed = zorder_key(orders, ["o_custkey", "o_totalprice"])
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("zorder-build-probe")) == []
    assert "__z" in keyed.columns
    with pytest.raises(ValueError, match="unsupported column type"):
        zorder_key(orders, ["o_orderstatus"])  # string column
    with pytest.raises(ValueError, match="bits"):
        zorder_key(orders, ["o_custkey", "o_totalprice"], bits=32)
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key(orders, [])


def test_zorder_key_interleaves_known_answers(spark):
    """Bit-interleave pinned on a hand-computed grid: codes scale 0..3
    (bits=2) over [0,3]x[0,3]; Morton order of (x,y) with x in bit 0."""
    from kafka_workers_spark.sources.files import zorder_key

    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {(r.x, r.y): r["__z"] for r in zorder_key(df, ["x", "y"], bits=2).collect()}
    def morton(x, y):
        z = 0
        for b in range(2):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z
    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_zorder_key_date_timestamp_and_missing_column(spark):
    """Date and timestamp columns scale via epoch days/micros (a straight
    cast crashes — pinned here), and a nonexistent column raises the
    operator's own ValueError, not a bare KeyError."""
    from kafka_workers_spark.sources.files import zorder_key

    df = spark.createDataFrame(
        [(1, "2024-01-01", "2024-01-01 00:00:00"),
         (2, "2024-06-01", "2024-06-01 12:00:00"),
         (3, "2025-01-01", "2025-01-01 23:59:59")],
        "id int, d string, ts string",
    ).select("id", F.col("d").cast("date"), F.col("ts").cast("timestamp"))
    keyed = zorder_key(df, ["d", "ts"], bits=4).select("id", "__z").collect()
    zs = {r.id: r["__z"] for r in keyed}
    # both columns increase together, so the Morton key is monotone here
    assert zs[1] < zs[2] < zs[3]
    with pytest.raises(ValueError, match="no such column"):
        zorder_key(df, ["nope"])
    with pytest.raises(ValueError, match="unsupported column type"):
        zorder_key(df.select("id", F.expr("INTERVAL 1 DAY AS iv")), ["iv"])
