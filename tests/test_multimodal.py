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


def test_resize_media_binary_roundtrip(spark):
    """Resize stage: binary out sized to the target area, deterministic per
    payload, id/media_type preserved."""
    from kafka_workers_spark.operators.multimodal import fake_resize, resize_media

    out = resize_media(_media_df(spark, 10), 64, 32, resizer=fake_resize)
    rows = out.collect()
    assert len(rows) == 10
    expected_len = (64 * 32) // 64
    assert all(len(r.payload) == expected_len for r in rows)
    assert all(r.width == 64 and r.height == 32 for r in rows)
    # deterministic: same input -> same bytes
    again = {r.doc_id: bytes(r.payload) for r in resize_media(
        _media_df(spark, 10), 64, 32, resizer=fake_resize).collect()}
    assert {r.doc_id: bytes(r.payload) for r in rows} == again


def test_resize_media_stub_raises_without_codec(spark):
    from kafka_workers_spark.operators.multimodal import resize_media

    with pytest.raises((Py4JJavaError, Exception), match="CodecNotAvailable|no codec"):
        resize_media(_media_df(spark, 3), 8, 8).collect()


def test_extract_features_feeds_similarity_search(spark):
    """Feature extraction emits array<float> embeddings that plug straight
    into the ANN operators: brute-force cosine self-top-1 of an exact
    duplicate payload is the duplicate (cosine == 1)."""
    from kafka_workers_spark.operators.multimodal import (
        extract_features,
        fake_extract_features,
    )
    from kafka_workers_spark.operators.similarity import ivf_topk

    media = _media_df(spark, 20)
    # plant an exact duplicate payload: doc 100 copies doc 0's bytes
    dup = media.filter(F.col("doc_id") == 0).select(
        F.lit(100).cast("long").alias("doc_id"), "media_type", "payload"
    )
    emb = extract_features(media.unionByName(dup), dim=16, extractor=fake_extract_features)
    assert dict(emb.dtypes)["embedding"] == "array<float>"
    vecs = emb.select(
        F.col("doc_id").alias("vec_id"), F.lit(0).alias("list_id"), "embedding"
    )
    top = ivf_topk(vecs, [100], nprobe=1, top_k=1)
    rows = top.collect()
    assert len(rows) == 1
    assert rows[0].neighbor_id == 0  # the payload twin
    assert rows[0].cosine > 0.999999


def test_decode_media_renamed_columns_and_null_payload(spark):
    """id_col/media_type_col are honored in the output schema, and NULL
    payloads yield NULL features instead of crashing the decoder."""
    from kafka_workers_spark.operators.multimodal import decode_media, fake_decode

    df = spark.createDataFrame(
        [(1, "image", bytearray(b"abc")), (2, "image", None)],
        "img_id long, kind string, payload binary",
    )
    out = decode_media(
        df, decoder=fake_decode, id_col="img_id", media_type_col="kind"
    ).orderBy("img_id")
    rows = out.collect()
    assert out.columns[:2] == ["img_id", "kind"]
    assert rows[0].n_bytes == 3 and rows[0].width is not None
    assert rows[1].n_bytes is None and rows[1].width is None


# ---------------------------------------------------------------------------
# Perceptual fingerprint + near-dup banding (VERDICT r08 #5)
# ---------------------------------------------------------------------------


def _ref_phash(p: bytes) -> int:
    """Literal Python replay of perceptual_hash's integer arithmetic."""
    n = len(p)
    if n == 0:
        return 0
    tot = sum(p)
    fp = 0
    for c in range(32):
        lo, hi = (n * c) // 32, (n * (c + 1)) // 32
        if sum(p[lo:hi]) * n > tot * (hi - lo):
            fp |= 1 << c
    return fp


def _spark_phash(spark, payloads):
    from kafka_workers_spark.operators.multimodal import perceptual_hash

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )
    rows = df.select("doc_id", perceptual_hash(F.col("payload")).alias("ph")).collect()
    return {r.doc_id: r.ph for r in rows}


def test_perceptual_hash_matches_python_reference(spark):
    """Spark expression == literal integer replay on crafted payloads:
    ramps, constants, short (< 32 bytes → empty cells), empty, NULL."""
    payloads = [
        bytes(range(256)) * 3,
        bytes([7] * 100),            # constant: no cell beats the mean → 0
        bytes([255, 0] * 64),
        bytes(range(10)),            # n < 32: some cells empty
        b"",
        bytes([1]),
    ]
    got = _spark_phash(spark, payloads)
    for i, p in enumerate(payloads):
        assert got[i] == _ref_phash(p), f"payload {i}"
    # constant payload: mean never strictly exceeded anywhere
    assert got[1] == 0
    # NULL payload → NULL hash
    from kafka_workers_spark.operators.multimodal import perceptual_hash

    df = spark.createDataFrame([(0, None)], "doc_id long, payload binary")
    assert df.select(perceptual_hash(F.col("payload")).alias("ph")).first().ph is None


def test_media_near_dup_equal_and_perturbed_payloads(spark):
    """Equal payloads collide at Hamming 0; a one-cell perturbation
    lands within the banding radius (its exact distance pinned via the
    Python reference); an unrelated payload produces no pair."""
    from kafka_workers_spark.operators.multimodal import media_near_dup

    base = bytes(range(256)) * 2
    # bump one 16-byte cell hard: flips that cell's bit, moves the
    # global mean a little — reference replay confirms the radius
    perturbed = bytearray(base)
    for i in range(16):
        perturbed[i] = 255
    perturbed = bytes(perturbed)
    dist = bin(_ref_phash(base) ^ _ref_phash(perturbed)).count("1")
    assert 1 <= dist <= 3, f"crafted perturbation drifted: distance {dist}"
    other = bytes([(i * 37 + 11) % 256 for i in range(300)])
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, perturbed), (3, other)],
        "doc_id long, payload binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in media_near_dup(df, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] == dist and pairs[(1, 2)] == dist
    assert not any(3 in k for k in pairs)


def test_media_near_dup_rejects_threshold_past_pigeonhole(spark):
    from kafka_workers_spark.operators.multimodal import media_near_dup

    df = spark.createDataFrame([(0, b"x")], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="pigeonhole"):
        media_near_dup(df, max_hamming=4)


# ---------------------------------------------------------------------------
# Content-defined chunking (Gear CDC)
# ---------------------------------------------------------------------------


def _ref_cdc(p: bytes, bits: int):
    """Literal sequential Gear chunker (the definition the closed-form
    windowed sum must equal): h = (h<<1 + G[b]) mod 2^31; boundary when
    h & (2^bits - 1) == 0 or at payload end."""
    import hashlib as _h

    from kafka_workers_spark.operators.multimodal import _GEAR

    mask, bmask = 0x7FFFFFFF, (1 << bits) - 1
    h, start, out = 0, 0, []
    for i, b in enumerate(p, start=1):
        h = ((h << 1) + _GEAR[b]) & mask
        if (h & bmask) == 0 or i == len(p):
            out.append((len(out), _h.md5(p[start:i].hex().upper().encode()).hexdigest(), i - start))
            start = i
    return out


def test_cdc_chunks_match_sequential_reference_and_reassemble(spark):
    from kafka_workers_spark.operators.multimodal import cdc_chunks

    payloads = [bytes([(i * 31 + 7) % 256 for i in range(n)]) for n in (1, 40, 300, 997)]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )
    got = {}
    for r in cdc_chunks(df, boundary_bits=4).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_no, r.chunk_digest, r.chunk_len))
    for i, p in enumerate(payloads):
        want = _ref_cdc(p, 4)
        assert sorted(got[i]) == want, f"payload {i}"
        # chunks tile the payload exactly
        assert sum(c[2] for c in got[i]) == len(p)


def test_cdc_chunks_resynchronize_after_insertion(spark):
    """THE content-defined property (vs fixed-size blocks): inserting
    one byte near the front changes only the chunk it lands in — every
    boundary after the next sync point is identical, so most chunk
    digests survive the edit."""
    from kafka_workers_spark.operators.multimodal import cdc_chunks

    base = bytes([(i * 131 + 17) % 256 for i in range(1200)])
    edited = base[:5] + b"\x42" + base[5:]
    df = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, payload binary"
    )
    rows = cdc_chunks(df, boundary_bits=5).collect()
    a = {r.chunk_digest for r in rows if r.doc_id == 0}
    b = {r.chunk_digest for r in rows if r.doc_id == 1}
    shared = len(a & b)
    assert shared >= int(0.7 * len(a)), f"only {shared}/{len(a)} chunks survived the edit"
    import pytest as _pt

    with _pt.raises(ValueError, match="boundary_bits"):
        cdc_chunks(df, boundary_bits=0)


# ---------------------------------------------------------------------------
# Temporal frame dedup (frame_dedup_pairs)
# ---------------------------------------------------------------------------

_FL = 64  # frame length for the frame-dedup pins


def _clip(seed: str, frames) -> bytes:
    """Deterministic pseudo-random clip: one md5-derived 64-byte block per
    frame index — equal (seed, frame) always yields equal frame bytes."""
    import hashlib as _h

    out = bytearray()
    for f in frames:
        block = b""
        while len(block) < _FL:
            block += _h.md5(f"{seed}:{f}:{len(block)}".encode()).digest()
        out += block[:_FL]
    return bytes(out)


def _frame_media_rows():
    base = _clip("base", range(10))  # frames A0..A9
    shifted = _clip("base", range(1, 10)) + _clip("tail", [0])  # A1..A9 + new tail
    pert = bytearray(base)
    pert[4 * _FL] ^= 0xFF  # one byte in frame 4
    d3, d4 = _clip("rand3", range(8)), _clip("rand4", range(12))
    trail = base + b"\x07" * 10  # partial trailing frame (dropped)
    return [
        (0, base),
        (1, shifted),
        (2, bytes(pert)),
        (3, d3),
        (4, d4),
        (5, trail),
        (6, None),  # NULL payload contributes nothing
    ]


def test_frame_dedup_shifted_clip_matches_at_offset_minus_one(spark):
    """THE temporal-alignment property (the frame_dedup_pairs docstring's
    pin): a clip whose frames are shifted by one still matches — at the
    modal offset −1 with fraction (n−1)/n — while per-frame hashing with
    no alignment would see 0/10 position-wise agreement. Also pins: a
    one-byte perturbation stays within the Hamming radius (full 10/10
    match), a partial trailing frame is dropped (base == base+10 stray
    bytes), random distractors and a NULL payload produce no pairs."""
    from kafka_workers_spark.operators.multimodal import frame_dedup_pairs

    df = spark.createDataFrame(_frame_media_rows(), "doc_id long, payload binary")
    got = {
        (r.id_a, r.id_b): (r.best_offset, r.n_matched, r.n_common)
        for r in frame_dedup_pairs(
            df, _FL, every_nth=1, max_hamming=3, min_match_frac=0.5
        ).collect()
    }
    assert got[(0, 1)] == (-1, 9, 10), "shifted clip must match at offset -1, (n-1)/n"
    assert got[(0, 2)] == (0, 10, 10), "one-byte perturbation stays in the radius"
    assert got[(0, 5)] == (0, 10, 10), "partial trailing frame must be dropped"
    # transitivity of the crafted corpus: shifted also pairs with pert/trail
    assert got[(1, 2)] == (1, 9, 10) and got[(1, 5)] == (1, 9, 10)
    assert not any(3 in k or 4 in k for k in got), "distractors must not pair"
    assert not any(6 in k for k in got), "NULL payload must not pair"


def test_frame_dedup_matches_duckdb_replay_including_every_nth(spark):
    """Cross-plan equality: Spark's band-blocked + offset-vote plan ==
    the DuckDB brute-force-Hamming replay (sql_frame_dedup_pairs), exact
    on every row, at every_nth=1 AND every_nth=2. The nth=2 lane also
    pins the sampling-parity semantics: a one-frame shift falls between
    stride-2 samples, so the shifted pair (0,1) disappears while the
    offset-0 pairs survive at 5/5 sampled frames."""
    import duckdb
    import pandas as pd

    from kafka_workers_spark.operators.multimodal import (
        frame_dedup_pairs,
        sql_frame_dedup_pairs,
    )

    rows = _frame_media_rows()
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    for nth in (1, 2):
        got = sorted(
            tuple(r)
            for r in frame_dedup_pairs(
                df, _FL, every_nth=nth, max_hamming=3, min_match_frac=0.5
            ).collect()
        )
        con = duckdb.connect()
        con.register("media_t", pd.DataFrame(rows, columns=["doc_id", "payload"]))
        want = sorted(
            tuple(int(x) for x in w)
            for w in con.execute(
                sql_frame_dedup_pairs(
                    "payload",
                    "doc_id",
                    "FROM media_t",
                    _FL,
                    every_nth=nth,
                    max_hamming=3,
                    min_match_frac=0.5,
                )
            ).fetchall()
        )
        con.close()
        assert got == want, f"every_nth={nth}: {got[:5]} vs {want[:5]}"
        if nth == 2:
            keys = {(g[0], g[1]) for g in got}
            assert (0, 1) not in keys, "stride-2 sampling must miss the odd shift"
            assert {(0, 2), (0, 5), (2, 5)} <= keys


def test_frame_dedup_parameter_validation(spark):
    from kafka_workers_spark.operators.multimodal import frame_dedup_pairs

    df = spark.createDataFrame([(0, b"x" * 128)], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="frame_len"):
        frame_dedup_pairs(df, 0)
    with pytest.raises(ValueError, match="every_nth"):
        frame_dedup_pairs(df, 64, every_nth=0)
    with pytest.raises(ValueError, match="pigeonhole"):
        frame_dedup_pairs(df, 64, max_hamming=4)
    with pytest.raises(ValueError, match="min_match_frac"):
        frame_dedup_pairs(df, 64, min_match_frac=0.0)


def test_scene_cuts_flags_boundary_and_numbers_scenes(spark):
    """Two constant 'shots' with a hard boundary: identical frames inside
    a shot (hamming 0, no cut), one cut at the transition, scene_no
    increments exactly there; first frame has NULL hamming and opens
    scene 0; a payload shorter than one frame drops."""
    from kafka_workers_spark.operators.multimodal import scene_cuts

    # patterned frames, not constant ones: aHash thresholds each cell
    # against the FRAME mean, so a flat frame hashes identically at any
    # brightness (all cells == mean) — a dark->bright flat transition is
    # invisible to it (found writing this test); opposite gradients give
    # complementary bits and a maximal Hamming jump instead
    frame_a = bytes(range(16))            # ascending gradient
    frame_b = bytes(reversed(range(16)))  # descending gradient
    rows = [
        (1, frame_a * 3 + frame_b * 2),  # cut between frame 2 and 3
        (2, frame_a),                    # single frame: one scene, no cut
        (3, b"\x01" * 7),                # shorter than a frame -> dropped
        (4, None),                       # NULL payload -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = scene_cuts(df, frame_len=16, cut_hamming=8)
    got = {
        (r.doc_id, r.frame_no): (r.hamming_prev, r.is_cut, r.scene_no)
        for r in out.collect()
    }
    assert set(got) == {(1, 0), (1, 1), (1, 2), (1, 3), (1, 4), (2, 0)}
    assert got[(1, 0)] == (None, False, 0)
    assert got[(1, 1)] == (0, False, 0)
    assert got[(1, 2)] == (0, False, 0)
    assert got[(1, 3)][1] is True and got[(1, 3)][2] == 1  # the cut
    assert got[(1, 4)] == (0, False, 1)
    assert got[(2, 0)] == (None, False, 0)
    import pytest

    with pytest.raises(ValueError, match="cut_hamming"):
        scene_cuts(df, frame_len=16, cut_hamming=40)
