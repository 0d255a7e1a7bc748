"""Multimodal plumbing: decode stage (fake codec), stub behavior, frame
sampling — the Spark-side machinery is real even though codecs are stubbed
(operators/multimodal.py)."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.sql import functions as F

from kafka_workers_spark.operators.multimodal import (
    decode_media,
    fake_decode,
    sample_frames,
)


def _media_df(spark, n=30):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "image").otherwise("audio").alias("media_type"),
        F.to_binary(F.concat(F.lit("payload-"), F.col("id")), F.lit("utf-8")).alias("payload"),
    )


def test_decode_media_with_injected_decoder(spark):
    out = decode_media(_media_df(spark), decoder=fake_decode).collect()
    assert len(out) == 30
    for row in out:
        assert row.n_bytes > 0
        assert 64 <= row.width < 256
        assert 64 <= row.height < 256
        assert 1 <= row.n_channels <= 3
    # deterministic: same payload -> same features
    again = {r.doc_id: (r.width, r.height) for r in decode_media(_media_df(spark), decoder=fake_decode).collect()}
    assert all((r.width, r.height) == again[r.doc_id] for r in out)


def test_decode_media_stub_raises_without_codec(spark):
    with pytest.raises((Py4JJavaError, Exception)) as exc_info:
        decode_media(_media_df(spark)).collect()
    assert "CodecNotAvailable" in str(exc_info.value) or "no codec" in str(exc_info.value)


def test_sample_frames_every_nth(spark):
    df = spark.createDataFrame([(1, 10), (2, 1), (3, 5)], "doc_id long, n_frames long")
    rows = sample_frames(df, every_nth=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_no)
    assert sorted(by_doc[1]) == [0, 3, 6, 9]
    assert sorted(by_doc[2]) == [0]
    assert sorted(by_doc[3]) == [0, 3]
