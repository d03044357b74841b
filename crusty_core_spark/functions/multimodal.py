"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A web-scale training-data pipeline carries non-text payloads next to the
text: crawled images, audio, video segments. The engine treats them as
``binary`` columns with a typed metadata struct, and processes them with
Arrow-batched ``mapInPandas`` stages — the same execution shape as the HTML
extract stage (batch in, batch out, no per-row Python UDFs).

The actual codecs (PIL/librosa/ffmpeg) are NOT available in this sandbox, so
the decode kernels are STUBBED behind ``set_decoder`` — by default a
deterministic fake decoder derived from the bytes (stable across runs, good
enough to test partitioning, schema, batch shapes, and downstream feature
plumbing). Swap in a real decoder on a cluster with the codec libraries
installed; nothing else changes.

Spark-side plumbing that IS real and tested:
- media table schema (binary payload + metadata struct)
- sniffing (magic bytes → media_type/format) — pure-Python, vectorized
- feature extraction stage: mapInPandas emitting fixed-length
  ``array<float>`` features + dimensions struct
- frame sampling for video-like payloads (deterministic offsets)
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),  # image|audio|video
                    T.StructField("format", T.StringType()),  # png|jpeg|wav|...
                    T.StructField("bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

_MAGIC = [
    (b"\x89PNG", ("image", "png")),
    (b"\xff\xd8\xff", ("image", "jpeg")),
    (b"GIF8", ("image", "gif")),
    (b"RIFF", ("audio", "wav")),
    (b"ID3", ("audio", "mp3")),
    (b"\x1a\x45\xdf\xa3", ("video", "webm")),
    (b"ftyp", ("video", "mp4")),  # offset 4 in practice; checked below
]


def sniff_media(payload: bytes | None) -> tuple[str, str]:
    """Magic-byte sniffing (public file signatures)."""
    if not payload:
        return ("unknown", "unknown")
    head = bytes(payload[:16])
    for magic, kind in _MAGIC:
        if head.startswith(magic) or (magic == b"ftyp" and head[4:8] == magic):
            return kind
    return ("unknown", "unknown")


# ---------------------------------------------------------------- decoders

def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decode: a pseudo 16x16x3
    array derived from a hash of the bytes. Replace via set_decoder()."""
    h = hashlib.blake2b(payload, digest_size=32).digest()
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return np.tile(rng, 16 * 16 * 3 // 32 + 1)[: 16 * 16 * 3].reshape(16, 16, 3)


def _real_decode_unavailable(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding needs PIL/librosa/ffmpeg — not installed in "
        "this environment; use set_decoder() with a real kernel on a "
        "cluster that has the codec libraries"
    )


_DECODER: Callable[[bytes], np.ndarray] = _fake_decode_image
_DECODER_BATCHED = False


def set_decoder(fn: Callable, batched: bool = False) -> None:
    """Swap the decode kernel (e.g. a PIL-based one on a real cluster).

    With ``batched=True`` the kernel receives the whole Arrow batch's
    payloads as ``list[bytes]`` and returns ``list[np.ndarray | None]`` —
    one call per batch, so a vectorized/GPU decoder amortizes its launch
    cost instead of paying it per row."""
    global _DECODER, _DECODER_BATCHED
    _DECODER = fn
    _DECODER_BATCHED = batched


FEATURE_DIM = 32

FEATURES_DDL = (
    "media_id long, url string, media_type string, format string, "
    "height int, width int, channels int, feature array<float>"
)


def extract_media_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Decode + feature-extract stage over a MEDIA_SCHEMA DataFrame.

    Plan shape: mapInPandas only — partition-parallel, Arrow-batched; payload
    bytes never leave the executor. Features are a fixed 32-dim float vector
    (mean-pooled pixel statistics of the decoded array here; a real model
    embedding in production)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            sniffed = [sniff_media(p) for p in payloads]
            # decode: one batch call when the kernel supports it (GPU/SIMD
            # decoders amortize launch cost per Arrow batch), else per item
            if _DECODER_BATCHED:
                try:
                    arrays = _DECODER(payloads)
                except NotImplementedError:
                    # same degradation as the per-item path: a kernel that
                    # can't run here None-fills the batch (zero features)
                    arrays = [None] * len(payloads)
                if len(arrays) != len(payloads):
                    raise ValueError(
                        f"batched media decoder {_DECODER!r} returned "
                        f"{len(arrays)} results for {len(payloads)} payloads"
                    )
            else:
                arrays = []
                for p in payloads:
                    try:
                        arrays.append(_DECODER(p))
                    except NotImplementedError:
                        arrays.append(None)
            feats, dims = [], []
            for arr in arrays:
                if arr is None:
                    feats.append([0.0] * FEATURE_DIM)
                    dims.append((0, 0, 0))
                else:
                    flat = arr.astype(np.float32).ravel()
                    # 32 bucket means — deterministic, shape-independent
                    buckets = np.array_split(flat, FEATURE_DIM)
                    feats.append(
                        [float(b.mean()) if len(b) else 0.0 for b in buckets]
                    )
                    h, w, c = (list(arr.shape) + [1, 1, 1])[:3]
                    dims.append((int(h), int(w), int(c)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "url": pdf["url"].values,
                    "media_type": [s[0] for s in sniffed],
                    "format": [s[1] for s in sniffed],
                    "height": [d[0] for d in dims],
                    "width": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "feature": feats,
                }
            )

    return df.mapInPandas(stage, schema=FEATURES_DDL)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling for video-like payloads: emits one row
    per sampled frame with a byte-offset slice as the frame payload (a real
    pipeline would seek keyframes; the partitioning/explode shape is what
    matters at scale — one input row fans out to n_frames rows)."""
    out_ddl = "media_id long, url string, frame_idx int, frame binary"

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                n = max(len(payload), 1)
                step = max(n // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, n - 1) if payload else 0
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "url": r.url,
                            "frame_idx": i,
                            "frame": payload[off : off + step],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "url", "frame_idx", "frame"]
            )

    return df.mapInPandas(stage, schema=out_ddl)
