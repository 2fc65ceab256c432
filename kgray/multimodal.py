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


# ---------------------------------------------------------------------------
# REAL decode path for the engine's own raw-RGB format ("KGRW"): a 4-byte
# magic + uint16 width + uint16 height header, then w*h*3 raw RGB bytes.
# No external codec needed, so decode / resize / features below are real
# pixel kernels — the NotImplementedError stub remains only where a true
# JPEG/PNG/ffmpeg codec would plug in (DecodeStub above).
# ---------------------------------------------------------------------------

_RAW_MAGIC = b"KGRW"


def encode_raw_image(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> KGRW bytes (magic, w:uint16le, h:uint16le, RGB)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return (
        _RAW_MAGIC
        + int(w).to_bytes(2, "little")
        + int(h).to_bytes(2, "little")
        + arr.tobytes()
    )


def decode_raw_image(payload: bytes) -> np.ndarray:
    """KGRW bytes -> (h, w, 3) uint8 view (zero-copy over the payload)."""
    if payload[:4] != _RAW_MAGIC:
        raise ValueError("not a KGRW payload")
    w = int.from_bytes(payload[4:6], "little")
    h = int.from_bytes(payload[6:8], "little")
    body = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=8)
    return body.reshape(h, w, 3)


class RawImagePipeline:
    """Actor stage: decode KGRW payloads, nearest-neighbor resize to fit a
    target box, and extract exact integer channel statistics — all real
    pixel work (numpy gathers and sums), one actor init for the whole
    chain. Emits (width, height, resized_w, resized_h, r_sum, g_sum,
    b_sum) per image; sums are over the ORIGINAL pixels, so they are
    parallelism- and resize-invariant ground truth for the row."""

    def __init__(self, target: int = 64):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        dims, rdims, sums = [], [], []
        for p in batch["payload"].to_pylist():
            img = decode_raw_image(p)
            h, w, _ = img.shape
            scale = self.target / max(w, h)
            tw, th = max(1, round(w * scale)), max(1, round(h * scale))
            yi = (np.arange(th) * h) // th
            xi = (np.arange(tw) * w) // tw
            _resized = img[yi][:, xi]  # real nearest-neighbor resample
            dims.append((w, h))
            rdims.append((tw, th))
            sums.append(img.reshape(-1, 3).sum(axis=0, dtype=np.int64))
        sums = np.array(sums, dtype=np.int64).reshape(-1, 3)
        return (
            batch.append_column("width", pa.array([d[0] for d in dims], pa.int64()))
            .append_column("height", pa.array([d[1] for d in dims], pa.int64()))
            .append_column("resized_w", pa.array([d[0] for d in rdims], pa.int64()))
            .append_column("resized_h", pa.array([d[1] for d in rdims], pa.int64()))
            .append_column("r_sum", pa.array(sums[:, 0]))
            .append_column("g_sum", pa.array(sums[:, 1]))
            .append_column("b_sum", pa.array(sums[:, 2]))
        )


def synthetic_raw_media_table(n: int = 32) -> pa.Table:
    """Deterministic KGRW image corpus: seeded gradient images of varying
    sizes (8..71 px per side)."""
    payloads = []
    for i in range(n):
        w, h = 8 + (i * 7) % 64, 8 + (i * 13) % 64
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (x * 255 // max(w - 1, 1)).astype(np.uint8),
                (y * 255 // max(h - 1, 1)).astype(np.uint8),
                np.full((h, w), i % 256, dtype=np.uint8),
            ],
            axis=2,
        )
        payloads.append(encode_raw_image(img))
    return pa.table(
        {
            "media_id": pa.array([f"r{i:04d}" for i in range(n)]),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/x-kgrw"] * n),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


def raw_image_features(ds, target: int = 64, batch_size: int = 64, concurrency=(1, 4)):
    """Wire the real-decode actor pool (same heap-bounding discipline as
    ``decode_media``: payload bytes x batch x concurrency per worker)."""
    return ds.map_batches(
        RawImagePipeline,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
