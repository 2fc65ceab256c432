"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus metadata columns;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages with SMALL batch sizes (a batch x concurrency of
large payloads must fit a worker heap — see batch_size defaults).

Decode is a CODEC CHAIN, resolved once per actor in ``__init__``:

1. PIL, when importable (not in this container — the import-try is the
   real extension point for a deployment that ships codecs);
2. the built-in pure-stdlib PNG decoder below (zlib inflate + full
   filter reconstruction) — REAL decode of standard 8-bit
   grey/RGB/RGBA non-interlaced PNGs with no external dependency;
3. the engine's own KGRW raw-RGB format;
4. the built-in uncompressed-BMP (8/24/32-bit BITMAPINFOHEADER) and
   binary-PNM (P5 grey / P6 RGB, 8-bit) decoders — REAL decode, pure
   struct + numpy;
5. otherwise: the deterministic fake path when constructed with
   ``fake=True``, else ``NotImplementedError`` naming the supported
   formats.

Audio: PCM16 RIFF/WAVE decodes for REAL via the minimal codec below
(``decode_wav`` / ``AudioFeaturePipeline`` — struct chunk walk + numpy
DSP). Video and compressed audio (mp3/aac/opus) genuinely need
ffmpeg-class codecs and stay stubbed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

try:  # the deployment extension point; absent in this container
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - exercised implicitly everywhere
    _PILImage = None

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


# ---------------------------------------------------------------------------
# Built-in PNG codec (pure stdlib zlib + numpy) — 8-bit grey / grey+alpha /
# RGB / RGBA, non-interlaced (the overwhelmingly common case). Public spec:
# RFC 2083 / W3C PNG. Exists so the decode stage does REAL work on standard
# inputs even in codec-less containers; a PIL import supersedes it.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        yield ctype, data
        pos += 12 + ln  # len + type + data + crc


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) or (h, w, ch) uint8 array. Supports bit depth
    8, color types 0/2/4/6, non-interlaced; full filter reconstruction
    (None/Sub/Up/Average/Paeth). Sub uses a per-byte-lane cumsum;
    Average/Paeth carry a left dependency and scan the row."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    w = h = ch = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"png: depth={depth} color={color} interlace={interlace} "
                    "unsupported (8-bit non-interlaced grey/GA/RGB/RGBA only)"
                )
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("png: decompressed length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            rec = row.reshape(w, ch).cumsum(axis=0) % 256
            rec = rec.reshape(stride)
        elif ft == 2:  # Up
            rec = (row + prev) % 256
        elif ft == 3:  # Average (left dep -> row scan)
            rec = row
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + (a + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth (left dep -> row scan)
            rec = row
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                b = int(prev[x])
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                rec[x] = (rec[x] + pred) % 256
        else:
            raise ValueError(f"png: unknown filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = out[y].astype(np.int32)
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w) / (h, w, ch in {1,2,3,4}) -> PNG bytes, every row
    filtered with ``filter_type`` (0..4; non-zero types exist so decoder
    tests can exercise the full reconstruction paths)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    assert arr.dtype == np.uint8 and ch in (1, 2, 3, 4)
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    px = arr.reshape(h, w * ch).astype(np.int32)
    zero = np.zeros(w * ch, dtype=np.int32)
    rows = []
    for y in range(h):
        cur, up = px[y], (px[y - 1] if y else zero)
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int32), up[:-ch]])
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            f = cur - left
        elif filter_type == 2:
            f = cur - up
        elif filter_type == 3:
            f = cur - (left + up) // 2
        elif filter_type == 4:
            p = left + up - ul
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, up, ul)
            )
            f = cur - pred
        else:
            raise ValueError(f"png: unknown filter {filter_type}")
        rows.append(bytes([filter_type]) + (f % 256).astype(np.uint8).tobytes())
    idat = zlib.compress(b"".join(rows))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed BMP (BITMAPINFOHEADER+, 8-bit palette-index / 24-bit
    BGR / 32-bit BGRA) -> uint8 (h, w[, ch]) array, RGB channel order.
    Rows are 4-byte aligned and stored bottom-up unless height < 0."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (8, 24, 32) or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up, h = h > 0, abs(h)
    stride = (w * bpp // 8 + 3) & ~3
    rows = np.frombuffer(
        payload, np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    if bpp == 8:
        img = rows[:, :w]
    elif bpp == 24:
        img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    else:
        img = rows[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(img[::-1] if bottom_up else img)


def decode_pnm(payload: bytes) -> np.ndarray:
    """Binary PNM (P5 grey / P6 RGB, maxval <= 255) -> uint8 (h, w[, 3])
    array. Header is whitespace-separated tokens with # comments."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    toks, i = [], 2
    while len(toks) < 3 and i < len(payload):
        if payload[i : i + 1].isspace():
            i += 1
        elif payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            toks.append(int(payload[i:j]))
            i = j
    if len(toks) < 3:
        raise ValueError("truncated PNM header")
    w, h, maxv = toks
    i += 1  # exactly one whitespace byte separates maxval from raster
    if maxv > 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PNM (maxval={maxv})")
    ch = 1 if magic == b"P5" else 3
    arr = np.frombuffer(payload, np.uint8, count=w * h * ch, offset=i)
    return arr.reshape((h, w) if ch == 1 else (h, w, ch)).copy()


class DecodeStub:
    """Actor stage: decode binary payloads into (width, height, n_frames).

    Codec chain resolved once at actor init (module docstring): PIL when
    importable, the built-in PNG / BMP / PNM decoders, the KGRW raw
    format; payloads
    none of those recognise fall to the deterministic fake path when
    ``fake=True``, else raise ``NotImplementedError`` — video/audio
    genuinely need ffmpeg-class codecs.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake
        self._pil = _PILImage  # import resolved at module load, bound per actor

    def _decode_one(self, p: bytes):
        """-> (width, height, n_frames) or None when no codec matches."""
        if p[:8] == _PNG_SIG:
            if self._pil is not None:
                import io

                im = self._pil.open(io.BytesIO(p))
                return im.width, im.height, getattr(im, "n_frames", 1)
            img = decode_png(p)
            return img.shape[1], img.shape[0], 1
        if p[:4] == _RAW_MAGIC:
            img = decode_raw_image(p)
            return img.shape[1], img.shape[0], 1
        if p[:2] == b"BM":
            try:
                img = decode_bmp(p)
                return img.shape[1], img.shape[0], 1
            except ValueError:
                pass  # odd BMP variants fall to PIL / the fake path
        if p[:2] in (b"P5", b"P6"):
            try:
                img = decode_pnm(p)
                return img.shape[1], img.shape[0], 1
            except ValueError:
                pass
        if self._pil is not None:
            import io

            try:
                im = self._pil.open(io.BytesIO(p))
                return im.width, im.height, getattr(im, "n_frames", 1)
            except Exception:
                return None
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = np.empty(len(payloads), dtype=np.int64)
        heights = np.empty(len(payloads), dtype=np.int64)
        frames = np.empty(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            got = self._decode_one(p or b"")
            if got is None:
                if not self.fake:
                    raise NotImplementedError(
                        "no codec for payload (supported here: PNG, BMP, "
                        "PNM, KGRW"
                        + (", PIL formats" if self._pil is not None else "")
                        + "); PCM WAV decodes via audio_features, video "
                        "and compressed audio need ffmpeg-class codecs — "
                        "construct DecodeStub(fake=True) for the "
                        "deterministic fake decode path"
                    )
                seed = _payload_seed(p or b"")
                got = (16 + seed % 1024, 16 + (seed // 7) % 1024, 1 + seed % 4)
            widths[i], heights[i], frames[i] = got
        return (
            batch.append_column("width", pa.array(widths.astype(np.int32)))
            .append_column("height", pa.array(heights.astype(np.int32)))
            .append_column("n_frames", pa.array(frames.astype(np.int32)))
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


def decode_image(payload: bytes) -> np.ndarray:
    """Codec chain for still images: PNG (built-in decoder) or KGRW ->
    (h, w, 3) uint8. Grey/alpha PNGs normalize to RGB (alpha dropped,
    grey replicated) so downstream kernels see one layout."""
    if payload[:8] == _PNG_SIG:
        img = decode_png(payload)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        elif img.shape[2] == 2:  # grey+alpha
            img = np.repeat(img[:, :, :1], 3, axis=2)
        elif img.shape[2] == 4:  # RGBA
            img = img[:, :, :3]
        return np.ascontiguousarray(img)
    return decode_raw_image(payload)


class RawImagePipeline:
    """Actor stage: decode PNG/KGRW payloads, nearest-neighbor resize to
    fit a target box, and extract exact integer channel statistics — all
    real pixel work (zlib inflate + filter reconstruction for PNG, numpy
    gathers and sums), one actor init for the whole chain. Emits (width,
    height, resized_w, resized_h, r_sum, g_sum, b_sum) per image; sums
    are over the ORIGINAL pixels, so they are parallelism- and
    resize-invariant ground truth for the row."""

    def __init__(self, target: int = 64):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        dims, rdims, sums = [], [], []
        for p in batch["payload"].to_pylist():
            img = decode_image(p)
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


def synthetic_png_media_table(n: int = 32) -> pa.Table:
    """Deterministic REAL-PNG image corpus: the same seeded gradient
    images as ``synthetic_raw_media_table`` but encoded as standard
    8-bit RGB PNGs, cycling through all five scanline filter types so a
    decode exercises every reconstruction path."""
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
        payloads.append(encode_png(img, filter_type=i % 5))
    return pa.table(
        {
            "media_id": pa.array([f"p{i:04d}" for i in range(n)]),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/png"] * n),
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


# ---------------------------------------------------------------------------
# REAL audio path: a minimal RIFF/WAVE PCM16 codec (pure stdlib struct +
# numpy — the WAV container is simple enough that no external library is
# needed), plus a DSP feature stage whose outputs are real signal math
# (RMS energy, zero crossings, dominant rFFT bin). Compressed audio
# (mp3/aac/opus) still needs ffmpeg-class codecs and stays stubbed.
# ---------------------------------------------------------------------------

_WAV_RIFF = b"RIFF"
_WAV_WAVE = b"WAVE"


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples, shape (n,) mono or (n, channels) -> PCM16 WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    assert samples.dtype == np.int16
    n, ch = samples.shape
    data = np.ascontiguousarray(samples).tobytes()  # interleaved LE PCM16
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (
        _WAV_WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _WAV_RIFF + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes -> ((n, channels) int16 array, sample_rate).

    Walks the RIFF chunk list (tolerating extra chunks like LIST/fact);
    raises ValueError on non-RIFF input or non-PCM16 encodings.
    """
    if payload[:4] != _WAV_RIFF or payload[8:12] != _WAV_WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    rate = ch = bits = None
    data = None
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            codec, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if codec != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV encoding (codec={codec}, bits={bits}); "
                    "only PCM16 decodes here"
                )
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    return arr.reshape(-1, ch).astype(np.int16), int(rate)


class AudioFeaturePipeline:
    """Actor stage: decode PCM16 WAV payloads and extract real DSP
    features — duration, integer RMS energy, zero-crossing count of the
    channel-mean mix, peak amplitude, and the dominant rFFT bin (DC
    excluded) with its millihertz frequency. All signal math is numpy;
    integer outputs keep the row deterministic across platforms."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {
            "sample_rate": [], "n_samples": [], "n_channels": [],
            "duration_ms": [], "rms_milli": [], "zero_crossings": [],
            "peak": [], "dom_bin": [], "dom_freq_mhz": [],
        }
        for p in batch["payload"].to_pylist():
            arr, rate = decode_wav(p)
            n, ch = arr.shape
            mix = arr.astype(np.float64).mean(axis=1)
            rms = float(np.sqrt(np.mean(mix * mix))) if n else 0.0
            sign = np.sign(mix)
            nz = sign != 0
            zc = int(np.count_nonzero(np.diff(sign[nz]) != 0))
            spec = np.abs(np.fft.rfft(mix))
            dom = int(spec[1:].argmax()) + 1 if len(spec) > 1 else 0
            cols["sample_rate"].append(rate)
            cols["n_samples"].append(n)
            cols["n_channels"].append(ch)
            cols["duration_ms"].append((1000 * n) // rate)
            cols["rms_milli"].append(int(round(1000 * rms)))
            cols["zero_crossings"].append(zc)
            cols["peak"].append(int(np.abs(arr).max()) if n else 0)
            cols["dom_bin"].append(dom)
            cols["dom_freq_mhz"].append((dom * rate * 1000) // n if n else 0)
        for name, vals in cols.items():
            batch = batch.append_column(name, pa.array(vals, type=pa.int64()))
        return batch


def audio_features(ds, batch_size: int = 64, concurrency=(1, 4)):
    """Wire the real WAV decode + DSP actor pool (heap bound: payload
    bytes x batch x concurrency per worker, same as the image stages)."""
    return ds.map_batches(
        AudioFeaturePipeline,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthetic_wav_media_table(n: int = 32) -> pa.Table:
    """Deterministic REAL-WAV audio corpus: pure sine tones placed exactly
    on rFFT bin ``20 + 3i`` (so the dominant-bin feature recovers the
    generating frequency exactly), amplitude ``8000 + 100i``, 2048 samples
    at 8 kHz; every third clip is stereo with a half-amplitude right
    channel."""
    payloads = []
    rate, ns = 8000, 2048
    t = np.arange(ns)
    for i in range(n):
        bin_i = 20 + 3 * i
        amp = 8000 + 100 * i
        tone = np.round(
            amp * np.sin(2 * np.pi * bin_i * t / ns)
        ).astype(np.int16)
        if i % 3 == 0:
            tone = np.stack([tone, (tone // 2).astype(np.int16)], axis=1)
        payloads.append(encode_wav(tone, rate))
    return pa.table(
        {
            "media_id": pa.array([f"a{i:04d}" for i in range(n)]),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["audio/wav"] * n),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )
