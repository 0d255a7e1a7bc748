"""Multimodal-column queries: binary payloads + typed metadata.

The test corpus has no real media files, so the binary payload is derived
deterministically from `documents.text` (utf-8 bytes) — the point is the
*column machinery*: binary type handling, metadata-only plans that never
touch payload bytes, and frame-index fan-out. The decode stage itself is
exercised in tests/test_multimodal.py via the injected fake decoder
(operators/multimodal.py: real codecs are stubbed in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_workers_spark.queries import register
from kafka_workers_spark.sources.files import load_table


@register(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum,
           CAST(octet_length(encode(text)) // 100 + 1 AS BIGINT) AS n_frames
    FROM documents
    """,
    category="multimodal",
    windowed=False,  # rotated out round 10 (VERDICT r09 #1)
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata columns. The plan computes metadata from
    the payload once at ingest; downstream metadata-only queries prune the
    payload column entirely (ReadSchema excludes it)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.to_binary(F.col("text"), F.lit("utf-8"))
    n_bytes = F.length(payload).cast("bigint")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        n_bytes.alias("n_bytes"),
        F.md5(F.col("text")).alias("checksum"),
        (F.floor(n_bytes / 100) + 1).cast("bigint").alias("n_frames"),
    )


@register(
    "multimodal_frame_sample",
    """
    WITH media AS (
      SELECT doc_id, CAST(octet_length(encode(text)) // 100 + 1 AS BIGINT) AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_no
    FROM media
    """,
    category="multimodal",
    windowed=False,  # rotated out round 9 — oracle-checked by tests/test_oracle_extra.py
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling fan-out for the 'video' payloads: sequence +
    explode in codegen; ids and indices only — payload bytes join back
    later by doc_id if a decoder needs them."""
    from kafka_workers_spark.operators.multimodal import sample_frames

    meta = multimodal_binary_meta(spark, sf_dir).filter(F.col("media_type") == "video")
    frames = sample_frames(meta, every_nth=2)
    return frames.select("doc_id", "n_frames", F.col("frame_no").cast("bigint"))


@register(
    "multimodal_decode",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           64 + CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) % 192 AS width,
           64 + CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) % 192 AS height,
           1 + CAST(('0x' || substr(md5(text), 5, 2)) AS INTEGER) % 3 AS n_channels
    FROM documents
    """,
    category="multimodal",
    windowed=False,  # rotated out round 8 for text_nb_score (VERDICT r07 #5)
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode stage itself, oracle-checked: the fake codec
    derives features from the payload digest, which the oracle replays from
    md5 hex (payload = utf-8 text, so digest bytes == md5(text)). Proves
    the Arrow batch plumbing end to end, not just the metadata columns."""
    from kafka_workers_spark.operators.multimodal import decode_media, fake_decode

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.to_binary(F.col("text"), F.lit("utf-8")).alias("payload"),
    )
    return decode_media(media, decoder=fake_decode).select(
        "doc_id",
        "n_bytes",
        F.col("width").cast("int"),
        F.col("height").cast("int"),
        F.col("n_channels").cast("int"),
    )


from kafka_workers_spark.operators.multimodal import sql_perceptual_hash  # noqa: E402

_PH_SQL = sql_perceptual_hash("encode(text)")


@register(
    "multimodal_near_dup",
    f"""
    WITH sigs AS (
      SELECT doc_id, {_PH_SQL} AS ph FROM documents
    ), bands AS (
      SELECT doc_id, ph, b, (ph >> (b * 8)) & 255 AS band_val
      FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.ph AS ph_a, b.ph AS ph_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(ph_a, ph_b)) AS INTEGER) AS hamming
    FROM pairs
    WHERE bit_count(xor(ph_a, ph_b)) <= 3
    """,
    category="multimodal",
)
def multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate pairs over the binary payload column
    (operators.multimodal.perceptual_hash — aHash-style cell-average
    threshold in exact integer arithmetic, VERDICT r08 #5): fingerprint,
    block on the SimHash 4×8-bit bands (pigeonhole-complete at Hamming
    ≤ 3), verify exact Hamming on band-collided candidates. The oracle
    replays fingerprint + banding + verify bit for bit."""
    from kafka_workers_spark.operators.multimodal import media_near_dup

    d = load_table(spark, sf_dir, "documents")
    media = d.select("doc_id", F.to_binary(F.col("text"), F.lit("utf-8")).alias("payload"))
    return media_near_dup(media, max_hamming=3)


from kafka_workers_spark.operators.multimodal import sql_frame_dedup_pairs  # noqa: E402

_FRAME_LEN = 64  # ~300-byte docs → ~4 complete frames each; <64-byte docs drop


@register(
    "multimodal_frame_dedup",
    sql_frame_dedup_pairs(
        "encode(text)",
        "doc_id",
        "FROM documents",
        frame_len=_FRAME_LEN,
        every_nth=1,
        max_hamming=3,
        min_match_frac=0.5,
    ),
    category="multimodal",
    # rotated INTO the driver window round 13 (VERDICT r12 #3) after one
    # round of EXTRA seasoning (r12: green at sf0.001 + sf0.01 + sf0.1)
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal frame-alignment near-dup over video-like payloads
    (operators.multimodal.frame_dedup_pairs, VERDICT r10 #1 / r11 #1):
    split each payload into 64-byte frames, perceptual-hash every frame,
    band-block frame signatures, then vote on the temporal offset —
    pairs score by matched frames at the modal offset against the
    shorter clip. The DuckDB oracle replays the same fingerprint and
    vote through a DIFFERENT pair plan (brute-force Hamming join instead
    of band blocking — pigeonhole completeness at Hamming ≤ 3 is what
    makes the two plans provably equal, so banding exactness itself is
    under the value hash)."""
    from kafka_workers_spark.operators.multimodal import frame_dedup_pairs

    d = load_table(spark, sf_dir, "documents")
    media = d.select("doc_id", F.to_binary(F.col("text"), F.lit("utf-8")).alias("payload"))
    return frame_dedup_pairs(
        media, frame_len=_FRAME_LEN, every_nth=1, max_hamming=3, min_match_frac=0.5
    )


from kafka_workers_spark.operators.multimodal import sql_scene_cuts  # noqa: E402

_CUT_HAMMING = 16  # median consecutive-frame hamming on this corpus is 15


@register(
    "multimodal_scene_cuts",
    sql_scene_cuts(
        "encode(text)",
        "doc_id",
        "FROM documents",
        frame_len=_FRAME_LEN,
        cut_hamming=_CUT_HAMMING,
    ),
    category="multimodal",
    windowed=False,
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over video-like payloads
    (operators.multimodal.scene_cuts): every 64-byte frame
    perceptual-hashed through the SAME fingerprint stage as
    multimodal_frame_dedup, a cut flagged where consecutive frames'
    Hamming distance exceeds {cut} — the pairwise shot-boundary
    detector, with the running cut count as the per-media scene number
    (GROUP BY (doc_id, scene_no) is the scene-stratified frame-sampling
    key). The oracle replays fingerprint, lag and cumsum; hamming_prev
    is NULL on each media's first frame on both engines."""
    from kafka_workers_spark.operators.multimodal import scene_cuts

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id", F.to_binary(F.col("text"), F.lit("utf-8")).alias("payload")
    )
    return scene_cuts(media, frame_len=_FRAME_LEN, cut_hamming=_CUT_HAMMING)
