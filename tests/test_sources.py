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
