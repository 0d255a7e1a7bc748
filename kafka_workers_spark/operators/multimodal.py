"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The reference never inspects payloads — K/V are opaque bytes with pluggable
deserializers (/root/reference/src/main/java/com/rtbhouse/kafka/workers/api/
WorkersConfig.java:39, README.md:83-84). That is exactly the right model
for multimodal data at 100 TB: a ``binary`` payload column plus typed
metadata columns, decoded lazily and only where needed.

Spark-side design (all real and tested):
- schema: payload BINARY + flat metadata (media_type, n_bytes, checksum,
  width/height/duration...) — flat beats nested structs for pushdown and
  for column pruning on metadata-only queries (the scan never touches the
  payload bytes).
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: the iterator shape processes one Arrow batch at
  a time so payload bytes never accumulate on any single node, and the
  stage preserves partitioning (no shuffle).
- the actual codec call is pluggable. The container has no image/audio
  libraries, so the default decoder is a STUB: :class:`CodecNotAvailable`
  is raised unless a decoder function is injected, and tests use
  :func:`fake_decode` (deterministic md5-derived features) to exercise
  the full plumbing — schema, batching, partition preservation.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decode_media's output shape with default column names (the function
#: interpolates id_col/media_type_col, so renamed inputs stay supported)
DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, width int, height int, n_channels int"
)


class CodecNotAvailable(NotImplementedError):
    """Raised by the stub decoder: no image/audio codec in this container.

    Inject a real decoder (e.g. PIL/libav-backed) via the ``decoder``
    argument of :func:`decode_media`.
    """


def _stub_decoder(payload: bytes, media_type: str) -> dict:
    raise CodecNotAvailable(
        f"no codec for {media_type}: install an image/audio library and pass decoder="
    )


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in decoder: derives plausible dimensions from
    the payload digest — exercises the full Spark plumbing without codecs."""
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_channels": 1 + h[2] % 3,
    }


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes, str], dict] | None = None,
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode stage: binary payload → typed features, one Arrow batch at a
    time. No shuffle; scales with input partitions. NULL payloads pass
    through with NULL features (the decoder is never called on them)."""
    decode = decoder or _stub_decoder
    _none = {"width": None, "height": None, "n_channels": None}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _none if p is None else decode(p, m)
                for p, m in zip(pdf[payload_col], pdf[media_type_col])
            ]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    media_type_col: pdf[media_type_col].values,
                    "n_bytes": [None if p is None else len(p) for p in pdf[payload_col]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_channels": [f["n_channels"] for f in feats],
                }
            )
            yield out

    schema = (
        f"{id_col} bigint, {media_type_col} string, n_bytes bigint, "
        "width int, height int, n_channels int"
    )
    return df.mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    every_nth: int,
    n_frames_col: str = "n_frames",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling for video-like payloads: one output row per sampled
    frame index (0, n, 2n, ...). Pure ``sequence`` + ``explode`` — stays in
    codegen; the payload column is NOT carried through the explode (join
    frames back by id when the decoder needs bytes), so the fan-out
    shuffles only ids and indices."""
    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")
    # n_frames = 0 (or NULL) must yield zero frames, not a runtime error:
    # sequence(0, -1, +step) throws, so gate it to NULL and let the
    # explode drop the row
    idx = F.when(
        F.col(n_frames_col) > 0,
        F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_nth)),
    )
    return df.select(
        id_col,
        F.col(n_frames_col),
        F.explode(idx).alias("frame_no"),
    )


RESIZED_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, width int, height int"
)


def fake_resize(payload: bytes, media_type: str, width: int, height: int) -> bytes:
    """Deterministic stand-in resizer: digest-seeded bytes of a size
    proportional to the target area — exercises the binary-out plumbing
    (Arrow bytes round-trip) without codecs."""
    h = hashlib.md5(payload).digest()
    n = max(1, (width * height) // 64)
    return (h * (n // len(h) + 1))[:n]


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, str, int, int], bytes] | None = None,
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize stage: binary in → binary out at the target dimensions, one
    Arrow batch at a time, no shuffle. The codec is injected like
    :func:`decode_media`'s (stub raises :class:`CodecNotAvailable`)."""

    def _stub(payload: bytes, media_type: str, w: int, h: int) -> bytes:
        raise CodecNotAvailable(
            f"no codec for {media_type}: install an image library and pass resizer="
        )

    fn = resizer or _stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = [
                None if p is None else fn(p, m, width, height)
                for p, m in zip(pdf[payload_col], pdf[media_type_col])
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    media_type_col: pdf[media_type_col].values,
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                }
            )

    schema = (
        f"{id_col} bigint, {media_type_col} string, payload binary, width int, height int"
    )
    return df.mapInPandas(run, schema)


def fake_extract_features(payload: bytes, media_type: str, dim: int) -> list[float]:
    """Deterministic stand-in embedding extractor: md5-expanded bytes
    scaled to [-1, 1) — same payload, same vector, every engine."""
    out: list[float] = []
    block = hashlib.md5(payload).digest()
    while len(out) < dim:
        for b in block:
            out.append((b - 128) / 128.0)
            if len(out) == dim:
                break
        block = hashlib.md5(block).digest()
    return out


def extract_features(
    df: DataFrame,
    dim: int = 64,
    extractor: Callable[[bytes, str, int], list[float]] | None = None,
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-extraction stage: binary payload → ``array<float>``
    embedding column, Arrow-batched, no shuffle. The output feeds the
    similarity operators directly (operators/similarity.py expects
    (id, embedding) — see tests/test_multimodal.py for the wiring); the
    model call is injected like the codecs (stub raises
    :class:`CodecNotAvailable`)."""

    def _stub(payload: bytes, media_type: str, d: int) -> list[float]:
        raise CodecNotAvailable(
            f"no model for {media_type}: install an inference runtime and pass extractor="
        )

    fn = extractor or _stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    media_type_col: pdf[media_type_col].values,
                    "embedding": [
                        None if p is None else fn(p, m, dim)
                        for p, m in zip(pdf[payload_col], pdf[media_type_col])
                    ],
                }
            )

    return df.mapInPandas(run, f"{id_col} bigint, {media_type_col} string, embedding array<float>")
