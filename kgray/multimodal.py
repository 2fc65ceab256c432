"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus metadata columns;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages with SMALL batch sizes (a batch x concurrency of
large payloads must fit a worker heap — see batch_size defaults).

The container has no image/audio codecs, so the actual decode is STUBBED:
``DecodeStub`` raises ``NotImplementedError`` unless constructed with
``fake=True``, in which case it produces a deterministic fake decode
(payload-hash-seeded dimensions/features). The Ray-side plumbing — schema,
actor signature, batch sizing, output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),       # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),    # opaque encoded bytes
        ("mime", pa.string()),
        ("n_bytes", pa.int64()),
    ]
)

FEATURE_DIM = 16


def _payload_seed(payload: bytes) -> int:
    h = 1469598103934665603
    for b in payload[:64]:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFF


class DecodeStub:
    """Actor stage: decode binary payloads into (width, height, n_frames).

    Real decode requires PIL/ffmpeg (not in this container) — construct
    with ``fake=True`` for the deterministic fake path; the default raises
    ``NotImplementedError`` exactly where a codec would plug in.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "media decode needs PIL/ffmpeg; construct DecodeStub(fake=True) "
                "for the deterministic fake decode path"
            )
        payloads = batch["payload"].to_pylist()
        seeds = np.array([_payload_seed(p or b"") for p in payloads], dtype=np.int64)
        return (
            batch.append_column("width", pa.array(16 + seeds % 1024, type=pa.int32()))
            .append_column("height", pa.array(16 + (seeds // 7) % 1024, type=pa.int32()))
            .append_column("n_frames", pa.array(1 + seeds % 4, type=pa.int32()))
        )


class FeatureExtractStub:
    """Actor stage: payload -> deterministic fake feature vector (the
    "model" loads once in __init__ — here just the projection matrix)."""

    def __init__(self, dim: int = FEATURE_DIM):
        rng = np.random.RandomState(24601)
        self._proj = rng.standard_normal((64, dim))
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            raw = np.frombuffer((p or b"\0" * 64)[:64].ljust(64, b"\0"), dtype=np.uint8)
            feats.append((raw.astype(np.float64) @ self._proj).round(6).tolist())
        return batch.append_column(
            "features", pa.array(feats, type=pa.list_(pa.float64()))
        )


class ResizeStub:
    """Actor stage: (width, height) -> scaled-to-fit target box. The
    geometry math is real (aspect-preserving fit); only the pixel resample
    would need a codec. Runs after ``DecodeStub``."""

    def __init__(self, target: int = 224):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = self.target / np.maximum(w, h)
        return (
            batch.append_column(
                "resized_w", pa.array(np.round(w * scale).astype(np.int32))
            ).append_column(
                "resized_h", pa.array(np.round(h * scale).astype(np.int32))
            )
        )


class FrameSampleStub:
    """Actor stage: pick ``n`` evenly-spaced frame indices per video
    (deterministic; the indices are the real sampling plan a decoder
    would execute). Non-video rows get an empty list."""

    def __init__(self, n: int = 4):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        frames = batch["n_frames"].to_pylist()
        out = []
        for kind, nf in zip(kinds, frames):
            if kind != "video" or not nf:
                out.append([])
            else:
                k = min(self.n, nf)
                out.append([int(i * nf // k) for i in range(k)])
        return batch.append_column(
            "sample_frames", pa.array(out, type=pa.list_(pa.int32()))
        )


def decode_media(ds, fake: bool = False, batch_size: int = 64, concurrency=(1, 4)):
    """Wire the decode actor pool. Small batch_size on purpose: payload
    bytes x batch x concurrency is the heap bound for media stages."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_features(ds, batch_size: int = 64, concurrency=(1, 4)):
    return ds.map_batches(
        FeatureExtractStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthetic_media_table(n: int = 32) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.RandomState(7)
    payloads = [rng.bytes(128 + int(i) * 7) for i in range(n)]
    kinds = ["image", "audio", "video"]
    return pa.table(
        {
            "media_id": pa.array([f"m{i:04d}" for i in range(n)]),
            "kind": pa.array([kinds[i % 3] for i in range(n)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["application/octet-stream"] * n),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )
