"""A8 weigher parity: the record-weight expressions reproduce the
reference's BaseRecordWeigherTest known-answer tables bit-for-bit
(src/test/java/.../api/record/weigher/BaseRecordWeigherTest.java), and
the admission plan reproduces QueuesManager's sizing arithmetic
(impl/queues/QueuesManager.java:76-88)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_workers_spark.streaming.weigher import (
    admission_plan,
    mean_record_weight,
    record_weight_bytes,
    record_weight_latin1,
)

# BaseRecordWeigherTest.shouldWeighByteArrays (key_len, value_len, weight)
BYTES_TABLE = [
    (0, 0, 280), (1, 0, 288), (0, 1, 288), (7, 0, 288), (0, 7, 288),
    (3, 4, 296), (4, 3, 296), (7, 7, 296), (111, 222, 616), (222, 111, 616),
]
# shouldWeighStrings (LATIN1 coder)
STRINGS_TABLE = [(0, 0, 344), (1, 0, 352), (0, 1, 352), (7, 0, 352), (3, 4, 360)]


def test_record_weight_bytes_matches_reference_table(spark):
    rows = [
        (i, bytearray(b"k" * kl), bytearray(b"v" * vl), "", want)
        for i, (kl, vl, want) in enumerate(BYTES_TABLE)
    ]
    df = spark.createDataFrame(
        rows, "i int, key binary, value binary, topic string, want long"
    )
    got = df.select(
        "i", "want", record_weight_bytes("key", "value", "topic").alias("w")
    ).collect()
    for r in got:
        assert r.w == r.want, (r.i, r.w, r.want)


def test_record_weight_latin1_matches_reference_table(spark):
    rows = [
        (i, "A" * kl, "A" * vl, "", want)
        for i, (kl, vl, want) in enumerate(STRINGS_TABLE)
    ]
    df = spark.createDataFrame(
        rows, "i int, key string, value string, topic string, want long"
    )
    got = df.select(
        "i", "want", record_weight_latin1("key", "value", "topic").alias("w")
    ).collect()
    for r in got:
        assert r.w == r.want, (r.i, r.w, r.want)


def test_record_weight_utf8_brackets_latin1(spark):
    """The octet-length variant equals the LATIN1 weigher on pure-ASCII
    payloads and strictly exceeds it once any multi-byte character
    appears — the documented fix for the silent UTF16 under-estimate
    (ADVICE r04)."""
    from kafka_workers_spark.streaming.weigher import record_weight_utf8

    df = spark.createDataFrame(
        [("ascii", "plain value"), ("utf", "żółćé世")],
        "key string, value string",
    ).withColumn("topic", F.lit("t"))
    got = {
        r.key: (r.l1, r.u8)
        for r in df.select(
            "key",
            record_weight_latin1("key", "value", "topic").alias("l1"),
            record_weight_utf8("key", "value", "topic").alias("u8"),
        ).collect()
    }
    assert got["ascii"][0] == got["ascii"][1]
    assert got["utf"][1] > got["utf"][0]


def test_record_weight_utf16_bound_dominates_all(spark):
    """The hard-bound arm (ADVICE r05): 2×char-count arrays sit at or
    above the true backing array for EVERY coder, so the bound weigher
    must dominate latin1 AND utf8 on every payload — including the
    UTF16-coded mostly-ASCII mix where utf8 under-estimates (one
    non-Latin-1 char in a long ASCII string: real array 2n, octets
    ~n+1)."""
    from kafka_workers_spark.streaming.weigher import (
        record_weight_utf8,
        record_weight_utf16_bound,
    )

    mostly_ascii = "x" * 400 + "ż"  # flips the JVM coder to UTF16
    emoji = "\U0001f600" * 8  # supplementary plane: 2 code units/char
    df = spark.createDataFrame(
        [
            ("ascii", "plain value"),
            ("utf", "żółćé世"),
            ("mix", mostly_ascii),
            ("emoji", emoji),
        ],
        "key string, value string",
    ).withColumn("topic", F.lit("t"))
    rows = df.select(
        "key",
        record_weight_latin1("key", "value", "topic").alias("l1"),
        record_weight_utf8("key", "value", "topic").alias("u8"),
        record_weight_utf16_bound("key", "value", "topic").alias("u16"),
    ).collect()
    for r in rows:
        assert r.u16 >= r.u8 >= r.l1 or (r.u16 >= r.l1 and r.u16 >= r.u8), r
    # the mix payload is the documented failure mode: utf8 barely moves
    # (~n+1 octets) while the true UTF16 array is 2n — only the bound
    # weigher covers it
    mix = {r.key: r for r in rows}["mix"]
    assert mix.u8 < mix.u16  # utf8 under the hard bound
    # the bound doubles the char-count ARRAY (not the fixed overheads):
    # the long value string alone adds ~len extra bytes over latin1
    assert mix.u16 - mix.l1 >= len(mostly_ascii) - 8
    # supplementary chars are TWO code units each: the bound must weigh
    # the value array at 4 bytes per emoji (2 units x 2 bytes), i.e.
    # strictly above 2x the code-POINT count — the code-review r06
    # counter-example to a 2*length() implementation
    em = {r.key: r for r in rows}["emoji"]
    n_pts = 8
    # value-array bytes inside u16 for the emoji value = 4*n_pts; with
    # a 2*length() bound it would be 2*n_pts — assert the gap
    assert em.u16 - em.l1 >= 2 * n_pts  # 4B/emoji vs latin1's length-byte est.
    assert em.u16 >= em.u8  # utf8 is 4B/emoji too; bound never below it


def test_record_weight_null_fields_weigh_zero(spark):
    """Null key/value weigh 0, like the reference's weighers
    (ByteArrayWeigher.java:14-16, StringWeigher.java:14-16)."""
    df = spark.createDataFrame(
        [(None, bytearray(b""), "")], "key binary, value binary, topic string"
    )
    w = df.select(record_weight_bytes("key", "value", "topic").alias("w")).first().w
    # 280 minus the empty key array's 16 bytes
    assert w == 264


def test_weight_expression_is_codegen(spark):
    from kafka_workers_spark.plans import audit

    df = spark.createDataFrame(
        [(bytearray(b"k"), bytearray(b"v"), "t")], "key binary, value binary, topic string"
    )
    a = audit(df.select(record_weight_bytes("key", "value", "topic")))
    assert a.python_evals == 0


def test_admission_plan_reference_arithmetic(spark):
    """1 GiB heap, default ratios, 8 sub-partitions: total = 512 MiB,
    per-queue pause = 64 MiB, resume = 57.6 MiB — QueuesManager's exact
    division chain; offsets derive from the measured mean weight."""
    heap = 1 << 30
    df = spark.createDataFrame(
        [(bytearray(b"k" * 111), bytearray(b"v" * 222), "")],
        "key binary, value binary, topic string",
    )
    mean = mean_record_weight(df)
    assert mean == 616.0  # the reference's (111, 222) known answer
    plan = admission_plan(heap, 8, mean)
    assert plan["queues_total_size_bytes"] == 1 << 29
    assert plan["queue_size_bytes_to_pause"] == (1 << 29) // 8
    assert plan["queue_size_bytes_to_resume"] == int(0.9 * ((1 << 29) // 8))
    # options are applicable verbatim: the byte bound only — the source
    # rejects maxBytesPerTrigger + maxOffsetsPerTrigger together, so the
    # offsets form is a separate advisory figure, never a second option
    assert plan["source_options"] == {"maxBytesPerTrigger": str(1 << 29)}
    assert plan["max_offsets_equivalent"] == int((1 << 29) / 616.0)

    with pytest.raises(ValueError):
        admission_plan(0, 8, mean)
    # unknown mean weight -> bytes-only plan (no offsets recommendation)
    assert "max_offsets_equivalent" not in admission_plan(heap, 8, 0.0)
