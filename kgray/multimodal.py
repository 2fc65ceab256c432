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
3. the built-in pure-numpy JPEG codec (``decode_jpeg`` /
   ``encode_jpeg`` / ``encode_jpeg_progressive``) — REAL decode of
   ITU-T T.81 baseline sequential AND progressive (SOF2) JFIF:
   canonical-Huffman entropy decode with byte unstuffing and restart
   markers, the full spectral-selection + successive-approximation
   scan machine (DC/AC first + refinement passes, EOB runs,
   correction bits), dequant + vectorized IDCT, 4:4:4/4:2:2/4:2:0
   chroma upsampling, JFIF YCbCr->RGB. Arithmetic-coded and
   hierarchical JPEG raise ``NotImplementedError``;
4. the engine's own KGRW raw-RGB format;
5. the built-in uncompressed-BMP (8/24/32-bit BITMAPINFOHEADER) and
   binary-PNM (P5 grey / P6 RGB, 8-bit) decoders — REAL decode, pure
   struct + numpy;
6. otherwise: the deterministic fake path when constructed with
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
        if p[:2] == b"\xff\xd8":
            if self._pil is not None:
                import io

                im = self._pil.open(io.BytesIO(p))
                return im.width, im.height, getattr(im, "n_frames", 1)
            img = decode_jpeg(p)
            return img.shape[1], img.shape[0], 1
        if p[:6] in (b"GIF87a", b"GIF89a"):
            if self._pil is not None:
                import io

                im = self._pil.open(io.BytesIO(p))
                return im.width, im.height, getattr(im, "n_frames", 1)
            fr = decode_gif(p)
            return fr.shape[2], fr.shape[1], fr.shape[0]
        if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
            fr = decode_avi_mjpeg(p)
            return fr.shape[2], fr.shape[1], fr.shape[0]
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
                        "no codec for payload (supported here: PNG, "
                        "baseline JPEG, BMP, PNM, KGRW"
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
    """Codec chain for still images: PNG, baseline JPEG (both built-in
    decoders) or KGRW -> (h, w, 3) uint8. Grey/alpha images normalize
    to RGB (alpha dropped, grey replicated) so downstream kernels see
    one layout."""
    if payload[:8] == _PNG_SIG:
        img = decode_png(payload)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        elif img.shape[2] == 2:  # grey+alpha
            img = np.repeat(img[:, :, :1], 3, axis=2)
        elif img.shape[2] == 4:  # RGBA
            img = img[:, :, :3]
        return np.ascontiguousarray(img)
    if payload[:2] == b"\xff\xd8":
        img = decode_jpeg(payload)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
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


def mulaw_expand(b: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> linear sample (classic CCITT reference
    arithmetic, public domain g711.c): pure integer shifts, so a SQL
    oracle reproduces every sample exactly."""
    u = (~b.astype(np.int64)) & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def alaw_expand(b: np.ndarray) -> np.ndarray:
    """G.711 A-law byte -> linear sample (CCITT reference arithmetic):
    sign bit SET is positive, per the spec's even-bit inversion."""
    a = b.astype(np.int64) ^ 0x55
    m = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, m + 8, (m + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) int16 array, sample_rate).

    Walks the RIFF chunk list (tolerating extra chunks like LIST/fact).
    Codecs: 1 = PCM16; 6 = G.711 A-law; 7 = G.711 mu-law (8-bit
    companded telephony audio, expanded via the exact CCITT integer
    arithmetic); 17 = mono IMA/DVI ADPCM (4-bit, block-structured).
    Anything else raises ValueError naming the codec.
    """
    if payload[:4] != _WAV_RIFF or payload[8:12] != _WAV_WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    rate = ch = bits = codec = None
    block_align = 0
    data = None
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            codec, ch, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if not ((codec == 1 and bits == 16)
                    or (codec in (6, 7) and bits == 8)
                    or (codec == 17 and bits == 4 and ch == 1)):
                raise ValueError(
                    f"unsupported WAV encoding (codec={codec}, bits={bits}, "
                    f"channels={ch}); PCM16, 8-bit G.711 A-law/mu-law and "
                    "mono IMA ADPCM decode here (perceptual codecs like "
                    "MP3/AAC need ffmpeg)"
                )
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if codec == 1:
        arr = np.frombuffer(data, dtype="<i2").astype(np.int16)
    elif codec == 17:
        arr = ima_adpcm_decode(data, block_align)
    else:
        raw = np.frombuffer(data, dtype=np.uint8)
        arr = mulaw_expand(raw) if codec == 7 else alaw_expand(raw)
    return arr.reshape(-1, ch), int(rate)


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
            cols["peak"].append(
                int(np.abs(arr.astype(np.int64)).max()) if n else 0
            )
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

# ---------------------------------------------------------------------------
# Built-in baseline JPEG codec (ITU-T T.81 baseline sequential DCT, JFIF) —
# pure numpy + stdlib. Decoder: SOF0/SOF1, grayscale or YCbCr with sampling
# factors up to 2 (4:4:4 / 4:2:2 / 4:2:0), restart markers, byte unstuffing,
# canonical-Huffman entropy decode, dequant + vectorized IDCT, nearest
# chroma upsampling, JFIF YCbCr->RGB. Encoder: grayscale / 4:4:4 / 4:2:0
# with the Annex K quantization + Huffman tables and the libjpeg quality
# scaling. Progressive (SOF2) is fully implemented on both sides
# (``decode_jpeg`` scan machine below, ``encode_jpeg_progressive``);
# arithmetic coding, 12-bit precision, hierarchical and lossless modes
# stay NotImplementedError — the honest remainder of the stub family.
# ---------------------------------------------------------------------------

_JPEG_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_JPEG_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_JPEG_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_JPEG_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_JPEG_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II basis: C[u, x] = s(u) cos((2x+1)u pi/16);
    forward F = C f C^T, inverse f = C^T F C."""
    u = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    c = np.cos((2 * x + 1) * u * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


_JPEG_C = _jpeg_dct_matrix()


def jpeg_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: scale = 5000//Q below 50 else 200-2Q;
    q = clip((base*scale + 50)//100, 1, 255). Integer math throughout so
    an oracle can recompute any entry exactly."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _huff_encode_table(bits, vals):
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _jpeg_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF color transform, float then banker's round, clipped uint8
    planes stacked on axis 2."""
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=2)), 0, 255)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _jpeg_block_coeffs(plane: np.ndarray, qt: np.ndarray):
    """Float plane (already level-shifted) padded to 8 x 8 tiles ->
    (n_blocks_y, n_blocks_x, 64) quantized int32 coefficients in NATURAL
    order — one vectorized einsum for every block at once."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    tiles = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ux,nmxy,vy->nmuv", _JPEG_C, tiles, _JPEG_C)
    q = np.round(f / qt.reshape(8, 8).astype(np.float64))
    return q.astype(np.int32).reshape(by, bx, 64)


def _jpeg_plan(arr: np.ndarray, quality: int, subsample: str):
    """Shared encoder front half: color transform, subsampling,
    quantized coefficient blocks padded to MCU coverage. Returns
    (comps [(hi, vi, tq)], blocks [(gy, gx, 64) int32 zigzag-ready],
    qt0, qt1, hmax, vmax, mcux, mcuy, h, w, gray)."""
    assert arr.dtype == np.uint8
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qt0 = jpeg_quant_table(_JPEG_Q_LUM, quality)
    qt1 = jpeg_quant_table(_JPEG_Q_CHR, quality)
    if gray:
        comps = [(1, 1, 0)]
        planes = [arr.astype(np.float64) - 128.0]
        hmax = vmax = 1
    else:
        ycc = _rgb_to_ycbcr(arr)
        if subsample == "444":
            hmax = vmax = 1
            planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
            sf = [(1, 1), (1, 1), (1, 1)]
        elif subsample == "420":
            hmax = vmax = 2
            ph, pw = -h % 2, -w % 2
            full = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
            sub = np.round(
                (full[0::2, 0::2] + full[1::2, 0::2]
                 + full[0::2, 1::2] + full[1::2, 1::2]) / 4.0
            )
            planes = [ycc[:, :, 0], sub[:, :, 1], sub[:, :, 2]]
            sf = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError("subsample must be '444' or '420'")
        comps = [(sf[i][0], sf[i][1], 0 if i == 0 else 1) for i in range(3)]
        planes = [p - 128.0 for p in planes]

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    blocks = []
    for (hi, vi, tq), plane in zip(comps, planes):
        cb = _jpeg_block_coeffs(plane, qt0 if tq == 0 else qt1)
        # pad block grid to full MCU coverage (replicate edge blocks)
        need_y, need_x = mcuy * vi, mcux * hi
        gy, gx = cb.shape[:2]
        if gy < need_y:
            cb = np.concatenate(
                [cb, np.repeat(cb[-1:], need_y - gy, axis=0)], axis=0
            )
        if gx < need_x:
            cb = np.concatenate(
                [cb, np.repeat(cb[:, -1:], need_x - gx, axis=1)], axis=1
            )
        blocks.append(cb)
    return comps, blocks, qt0, qt1, hmax, vmax, mcux, mcuy, h, w, gray


def _jpeg_headers(comps, qt0, qt1, h, w, gray, sof_marker: bytes,
                  restart_interval: int = 0) -> bytearray:
    """SOI + APP0 + DQT + SOF (+DRI) — shared by both encoders."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, qt in ((0, qt0),) if gray else ((0, qt0), (1, qt1)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in qt[_JPEG_ZIGZAG])
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (hi, vi, tq) in enumerate(comps):
        sof += struct.pack(">BBB", ci + 1, (hi << 4) | vi, tq)
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out


def _seq_emit_block(bw, zz, pred: int, dc_tab, ac_tab) -> int:
    """Full-band sequential Huffman serialization of ONE zigzagged
    block (T.81 F.1.2): DC category + diff bits, AC run/size pairs
    with ZRL and EOB. Returns the new DC predictor. Shared by the
    interleaved and non-interleaved sequential encoders."""
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    cat = _jpeg_category(diff)
    code, ln = dc_tab[cat]
    bw.write(code, ln)
    if cat:
        bits = diff if diff >= 0 else diff + (1 << cat) - 1
        bw.write(bits, cat)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        cat = _jpeg_category(v)
        code, ln = ac_tab[(run << 4) | cat]
        bw.write(code, ln)
        bits = v if v >= 0 else v + (1 << cat) - 1
        bw.write(bits, cat)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]
        bw.write(code, ln)
    return pred


def encode_jpeg(arr: np.ndarray, quality: int = 75,
                subsample: str = "444", restart_interval: int = 0) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes.

    Annex K quantization (quality-scaled, `jpeg_quant_table`) + Huffman
    tables; grayscale is one non-interleaved-equivalent scan, color is
    interleaved YCbCr at 4:4:4 (``subsample="444"``) or 4:2:0
    (``"420"``, chroma = banker's-rounded 2 x 2 box mean).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (predictor reset + byte alignment, T.81 semantics)."""
    (comps, blocks, qt0, qt1, hmax, vmax, mcux, mcuy, h, w, gray
     ) = _jpeg_plan(arr, quality, subsample)

    dc_tabs = [
        _huff_encode_table(*_JPEG_DC_LUM), _huff_encode_table(*_JPEG_DC_CHR)
    ]
    ac_tabs = [
        _huff_encode_table(*_JPEG_AC_LUM), _huff_encode_table(*_JPEG_AC_CHR)
    ]
    bw = _BitWriter()
    pred = [0] * len(comps)
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                bw.flush()  # byte-align, 1-padded
                bw.buf += bytes(
                    [0xFF, 0xD0 + ((mcu_idx // restart_interval - 1) % 8)]
                )
                pred = [0] * len(comps)
            mcu_idx += 1
            for ci, (hi, vi, tq) in enumerate(comps):
                td = 0 if ci == 0 else 1
                for by in range(vi):
                    for bx in range(hi):
                        zz = blocks[ci][my * vi + by, mx * hi + bx][_JPEG_ZIGZAG]
                        pred[ci] = _seq_emit_block(
                            bw, zz, pred[ci], dc_tabs[td], ac_tabs[td]
                        )
    bw.flush()

    out = _jpeg_headers(comps, qt0, qt1, h, w, gray, b"\xff\xc0",
                        restart_interval)
    specs = [(0x00, _JPEG_DC_LUM), (0x10, _JPEG_AC_LUM)]
    if not gray:
        specs += [(0x01, _JPEG_DC_CHR), (0x11, _JPEG_AC_CHR)]
    for tc, (bits, vals) in specs:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    ncomp = 1 if gray else 3
    sos = bytes([ncomp])
    for ci in range(ncomp):
        td = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | td])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_noninterleaved(arr: np.ndarray, quality: int = 75,
                               subsample: str = "444") -> bytes:
    """Sequential JFIF with ONE SCAN PER COMPONENT (T.81 lets a frame
    split its components over several scans; a single-component scan's
    MCU is one data unit, walked in raster order over the component's
    OWN block grid — never the MCU-padded grid). Quantized
    coefficients are byte-identical to :func:`encode_jpeg`'s, so
    ``decode_jpeg(encode_jpeg_noninterleaved(x)) ==
    decode_jpeg(encode_jpeg(x))`` bit-for-bit — the parity that pins
    the decoder's own-grid walk for sequential multi-scan files (with
    ``subsample="420"`` the padded-MCU walk would consume a different
    block count and garble, which is exactly the regression tested)."""
    (comps, blocks, qt0, qt1, hmax, vmax, _mcux, _mcuy, h, w, gray
     ) = _jpeg_plan(arr, quality, subsample)
    out = _jpeg_headers(comps, qt0, qt1, h, w, gray, b"\xff\xc0")
    specs = [(0x00, _JPEG_DC_LUM), (0x10, _JPEG_AC_LUM)]
    if not gray:
        specs += [(0x01, _JPEG_DC_CHR), (0x11, _JPEG_AC_CHR)]
    for tc, (bits, vals) in specs:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    dc_tabs = [
        _huff_encode_table(*_JPEG_DC_LUM), _huff_encode_table(*_JPEG_DC_CHR)
    ]
    ac_tabs = [
        _huff_encode_table(*_JPEG_AC_LUM), _huff_encode_table(*_JPEG_AC_CHR)
    ]
    for ci, (hi, vi, _tq) in enumerate(comps):
        td = 0 if ci == 0 else 1
        sos = bytes([1, ci + 1, (td << 4) | td, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        bw = _BitWriter()
        pred = 0
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                zz = blocks[ci][by, bx][_JPEG_ZIGZAG]
                pred = _seq_emit_block(bw, zz, pred, dc_tabs[td], ac_tabs[td])
        bw.flush()
        out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-coded-segment reader: byte-unstuffs 0xFF00 lazily, stops
    at any real marker (caller handles RSTn segmentation)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("jpeg: entropy stream truncated")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            else:
                raise ValueError("jpeg: hit marker inside entropy segment")
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self):
        self.acc = 0
        self.nbits = 0


def _huff_decode_table(bits, vals):
    """Canonical Huffman decode state per T.81 F.2.2.3:
    (mincode, maxcode, valptr, huffval) indexed by code length 1..16."""
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code, k = 0, 0
    for ln in range(1, 17):
        if bits[ln - 1]:
            valptr[ln] = k
            mincode[ln] = code
            code += bits[ln - 1]
            k += bits[ln - 1]
            maxcode[ln] = code - 1
        else:
            maxcode[ln] = -1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


def _huff_decode(br: _BitReader, tab) -> int:
    mincode, maxcode, valptr, vals = tab
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        if maxcode[ln] >= 0 and code <= maxcode[ln]:
            return vals[valptr[ln] + code - mincode[ln]]
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def _jpeg_reconstruct(frame, qt, coeff, hmax, vmax):
    """Accumulated coefficient arrays -> decoded image (dequant, one
    vectorized IDCT over every block, nearest chroma upsample, crop,
    YCbCr->RGB or grayscale plane)."""
    fh, fw, comps = frame
    planes = {}
    for cid, hi, vi, tq_ in comps:
        cz = coeff[cid]
        nat = np.zeros_like(cz)
        nat[:, :, _JPEG_ZIGZAG] = cz
        gy, gx = nat.shape[:2]
        f = (nat.reshape(gy, gx, 8, 8)
             * qt[tq_].reshape(8, 8)).astype(np.float64)
        px = np.einsum("ux,nmuv,vy->nmxy", _JPEG_C, f, _JPEG_C)
        plane = px.transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8)
        plane = np.clip(np.round(plane + 128.0), 0, 255)
        ry, rx = vmax // vi, hmax // hi
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes[cid] = plane[:fh, :fw]
    if len(comps) == 1:
        return planes[comps[0][0]].astype(np.uint8)
    if len(comps) == 3:
        ids = [c[0] for c in comps]
        return _ycbcr_to_rgb(planes[ids[0]], planes[ids[1]], planes[ids[2]])
    raise NotImplementedError(
        f"jpeg: {len(comps)}-component images unsupported"
    )


def _skip_to_marker(payload: bytes, pos: int) -> int:
    """Advance past entropy-coded data to the next real marker (skips
    stuffed 0xFF00 and RSTn)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00 \
                and not (0xD0 <= payload[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return n


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline AND progressive JFIF bytes -> (h, w) uint8 grayscale or
    (h, w, 3) uint8 RGB.

    Sequential (SOF0/SOF1): Huffman entropy decode per F.2, restart
    intervals, sampling factors up to 2 (4:4:4 / 4:2:2 / 4:2:0).
    Progressive (SOF2): full spectral-selection + successive-
    approximation scan machine per T.81 G.1.2 — DC first/refine scans
    (interleaved), per-component AC first scans with EOB-run decoding,
    and AC refinement scans with correction-bit consumption. Any
    non-interleaved scan — sequential multi-scan files included —
    walks the component's OWN block grid in raster order (T.81 A.2.2),
    not the MCU padding. Arithmetic coding (SOF9+) and hierarchical
    modes raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    progressive = False
    restart = 0
    scanned: set = set()
    coeff: dict = {}
    hmax = vmax = mcux = mcuy = 0
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (may hold several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                o += 1
                if pq:
                    vals = np.frombuffer(body[o:o + 128], ">u2").astype(np.int64)
                    o += 128
                else:
                    vals = np.frombuffer(body[o:o + 64], np.uint8).astype(np.int64)
                    o += 64
                nat = np.zeros(64, np.int64)
                nat[_JPEG_ZIGZAG] = vals
                qt[tq] = nat
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq_ = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq_))
            frame = (fh, fw, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            coeff = {
                cid: np.zeros((mcuy * vi, mcux * hi, 64), np.int32)
                for cid, hi, vi, _tq in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF{marker - 0xC0} (arithmetic/hierarchical/"
                "lossless) unsupported — sequential + progressive DCT only"
            )
        elif marker == 0xC4:  # DHT (may hold several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1:o + 17])
                cnt = sum(bits)
                vals = list(body[o + 17:o + 17 + cnt])
                o += 17 + cnt
                tab = _huff_decode_table(bits, vals)
                (huff_ac if tc else huff_dc)[th] = tab
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si:3 + 2 * si]
                scan.append((cs, tdta >> 4, tdta & 15))
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            order = []
            fh, fw, comps = frame
            for cs, td, ta in scan:
                for cid, hi, vi, tq_ in comps:
                    if cid == cs:
                        order.append((cid, hi, vi, tq_, td, ta))
                        break
                else:
                    raise ValueError("jpeg: scan names unknown component")
            pos = _jpeg_decode_scan(
                payload, pos, order, coeff, huff_dc, huff_ac,
                ss, se, ah, al, restart, progressive,
                hmax, vmax, mcux, mcuy, fh, fw,
            )
            scanned.update(cs for cs, _, _ in scan)
            # a sequential frame may split its components over several
            # non-interleaved scans — reconstruct only once every
            # frame component has been entropy-decoded
            if not progressive and all(
                cid in scanned for cid, _, _, _ in comps
            ):
                return _jpeg_reconstruct(frame, qt, coeff, hmax, vmax)
        # APPn / COM / others: skipped via seglen
    if progressive and frame is not None and coeff:
        return _jpeg_reconstruct(frame, qt, coeff, hmax, vmax)
    raise ValueError("jpeg: no SOS marker found")


def _jpeg_decode_scan(
    payload, pos, order, coeff, huff_dc, huff_ac,
    ss, se, ah, al, restart, progressive, hmax, vmax, mcux, mcuy, fh, fw,
):
    """Decode ONE entropy-coded scan into the coefficient arrays and
    return the byte offset of the next marker.

    Sequential: full-band interleaved MCU walk. Progressive: four scan
    kinds per T.81 G.1.2 (DC first / DC refine, interleaved; AC first /
    AC refine, single-component over its OWN block grid with EOB-run
    state carried across blocks inside the scan)."""
    br = _BitReader(payload, pos)
    interleaved = len(order) > 1
    pred = {cid: 0 for cid, *_ in order}
    eobrun = 0
    p1 = 1 << al
    m1 = -1 << al

    def units():
        """Yield per-restart-unit block lists: one MCU (interleaved
        scan) or one block of the single component's OWN grid (ANY
        non-interleaved scan, sequential or progressive — T.81 A.2.2:
        a single-component scan's MCU is one data unit and the walk is
        raster order over the component's real block coverage, never
        the MCU-padded grid; for the common unsubsampled case the two
        grids coincide, but a subsampled component in a multi-scan
        sequential file differs)."""
        if interleaved:
            for my in range(mcuy):
                for mx in range(mcux):
                    blocks = []
                    for cid, hi, vi, _tq, td, ta in order:
                        for by in range(vi):
                            for bx in range(hi):
                                blocks.append(
                                    (cid, my * vi + by, mx * hi + bx, td, ta)
                                )
                    yield blocks
        else:
            cid, hi, vi, _tq, td, ta = order[0]
            # own grid: ceil(ceil(fw*hi/hmax)/8) x ceil(ceil(fh*vi/vmax)/8)
            cw = -(-fw * hi // hmax)
            ch = -(-fh * vi // vmax)
            bw_, bh_ = -(-cw // 8), -(-ch // 8)
            for by in range(bh_):
                for bx in range(bw_):
                    yield [(cid, by, bx, td, ta)]

    def _seq_ac(zz, ta):
        k = 1
        while k < 64:
            sym = _huff_decode(br, huff_ac[ta])
            if sym == 0x00:
                break
            if sym == 0xF0:
                k += 16
                continue
            k += sym >> 4
            size = sym & 15
            if k > 63:
                raise ValueError("jpeg: AC index overflow")
            zz[k] = _extend(br.receive(size), size)
            k += 1

    def ac_first(zz, ta):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            sym = _huff_decode(br, huff_ac[ta])
            r, s = sym >> 4, sym & 15
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.receive(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("jpeg: AC index overflow")
            zz[k] = _extend(br.receive(s), s) << al
            k += 1

    def ac_refine(zz, ta):
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _huff_decode(br, huff_ac[ta])
                r, s = sym >> 4, sym & 15
                val = 0
                if s:
                    if s != 1:
                        raise ValueError("jpeg: bad refinement size")
                    val = p1 if br.read_bit() else m1
                else:
                    if r < 15:
                        eobrun = (1 << r)
                        if r:
                            eobrun += br.receive(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history positions
                # advance over r zero-history coefficients, applying
                # correction bits to every nonzero-history one passed
                while k <= se:
                    if zz[k] != 0:
                        if br.read_bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    if br.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            eobrun -= 1

    unit_no = 0
    for blocks in units():
        if restart and unit_no and unit_no % restart == 0:
            br.align()
            if (payload[br.pos] == 0xFF
                    and 0xD0 <= payload[br.pos + 1] <= 0xD7):
                br.pos += 2
                pred = {cid: 0 for cid, *_ in order}
                eobrun = 0
            else:
                raise ValueError("jpeg: expected restart marker")
        unit_no += 1
        for cid, by, bx, td, ta in blocks:
            zz = coeff[cid][by, bx]
            if not progressive:
                cat = _huff_decode(br, huff_dc[td])
                diff = _extend(br.receive(cat), cat) if cat else 0
                pred[cid] += diff
                zz[0] = pred[cid]
                _seq_ac(zz, ta)
            elif ss == 0 and ah == 0:  # DC first
                cat = _huff_decode(br, huff_dc[td])
                diff = _extend(br.receive(cat), cat) if cat else 0
                pred[cid] += diff
                zz[0] = pred[cid] << al
            elif ss == 0:  # DC refine: one raw bit per block
                if br.read_bit():
                    zz[0] |= p1
            elif ah == 0:
                ac_first(zz, ta)
            else:
                ac_refine(zz, ta)
    return _skip_to_marker(payload, br.pos)



def synthetic_jpeg_media_table(n: int = 48) -> pa.Table:
    """Deterministic REAL-JPEG corpus: grayscale images built from 8 x 8
    constant blocks with value ``(37i + 17bx + 29by) % 256``, encoded as
    JFIF at quality 34 — baseline (every third image with a restart
    interval, exercising RSTn handling), and every fifth image
    PROGRESSIVE (SOF2 successive-approximation scan chain; quantized
    coefficients are identical, so the same closed-form oracle checks
    both decode paths).

    Block-constant inputs make baseline JPEG CLOSED-FORM: all AC
    coefficients are exactly 0 and the DC round-trip reduces to
    ``clamp(3 * round_even((v - 128) / 3) + 128)`` (quality 34 =>
    luminance q00 = 24 = 8 * 3), so a SQL oracle can recompute every
    decoded pixel — and both float rounding steps sit >= 1/6 away from
    any tie (vs ~1e-13 DCT float error), measured in
    tests/test_dedup_similarity.py. Sizes are multiples of 8, so no
    padding ambiguity either."""
    payloads = []
    for i in range(n):
        w, h = 8 * (2 + (i * 3) % 6), 8 * (2 + (i * 5) % 6)
        by, bx = np.mgrid[0: h // 8, 0: w // 8]
        v = (37 * i + 17 * bx + 29 * by) % 256
        img = np.kron(v, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        if i % 5 == 2:
            payloads.append(
                encode_jpeg_progressive(
                    img, quality=34, eob_cap=1 if i % 10 == 2 else 32767
                )
            )
        else:
            payloads.append(
                encode_jpeg(img, quality=34,
                            restart_interval=2 if i % 3 == 0 else 0)
            )
    return pa.table(
        {
            "media_id": pa.array([f"j{i:04d}" for i in range(n)]),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/jpeg"] * n),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Built-in GIF codec (pure stdlib + numpy) — GIF87a/89a with global/local
# color tables, animation frames, interlacing, and graphic-control disposal
# methods 0/1/2. This gives the media chain a REAL multi-frame decode, so
# the frame-sampling plan (FrameSampleStub) operates on real frames instead
# of fake counts. Restore-to-previous disposal (3) raises — rare and the
# honest edge. LZW is implemented from the spec (variable code width,
# clear/end codes, 4096-entry table).
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> np.ndarray:
    """GIF LZW: concatenated sub-block payload -> index stream."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(expect, dtype=np.uint8)
    n_out = 0
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = end + 1

    width = min_code_size + 1
    next_code = end + 1
    reset()
    acc = nbits = 0
    prev: "bytes | None" = None
    pos = 0
    while pos < len(data) or nbits >= width:
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits  # LSB-first packing
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            prev = None
            continue
        if code == end:
            break
        if code < next_code and code < len(table):
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"gif: bad LZW code {code}")
        k = len(entry)
        if n_out + k > expect:
            entry = entry[: expect - n_out]
            k = len(entry)
        out[n_out: n_out + k] = np.frombuffer(entry, np.uint8)
        n_out += k
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if n_out >= expect:
            break
    if n_out != expect:
        raise ValueError(f"gif: LZW produced {n_out} of {expect} pixels")
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> (n_frames, h, w, 3) uint8 composed frame stack.

    Frames compose onto the logical screen per the graphic-control
    disposal method (0/1 leave, 2 restore-to-background); transparency
    keeps the underlying pixel. Interlaced images are de-interlaced."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[bg]
    frames: list[np.ndarray] = []
    disposal = 0
    transparent = -1
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = payload[pos]
                gflags, _delay, tidx = struct.unpack(
                    "<BHB", payload[pos + 1: pos + 5]
                )
                disposal = (gflags >> 2) & 7
                transparent = tidx if gflags & 1 else -1
                pos += 1 + sz
                if payload[pos] != 0:
                    raise ValueError("gif: unterminated GCE")
                pos += 1
                if disposal == 3:
                    raise NotImplementedError(
                        "gif: restore-to-previous disposal unsupported"
                    )
            else:  # skip sub-blocks (comment / app / plain text)
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
        elif b0 == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack(
                "<HHHHB", payload[pos: pos + 9]
            )
            pos += 9
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("gif: no color table")
            mcs = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), mcs, iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                deinter = np.empty_like(idx)
                rows = np.concatenate([
                    np.arange(0, ih, 8), np.arange(4, ih, 8),
                    np.arange(2, ih, 4), np.arange(1, ih, 2),
                ])
                deinter[rows] = idx
                idx = deinter
            region = canvas[iy: iy + ih, ix: ix + iw]
            rgb = ct[np.minimum(idx, len(ct) - 1)]
            if transparent >= 0:
                mask = (idx != transparent)[:, :, None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            if disposal == 2:  # restore to background
                canvas[iy: iy + ih, ix: ix + iw] = (
                    gct[bg] if gct is not None else 0
                )
            disposal = 0
            transparent = -1
        else:
            raise ValueError(f"gif: unknown block 0x{b0:02x}")
    if not frames:
        raise ValueError("gif: no image data")
    return np.stack(frames)


def encode_gif(
    index_frames: np.ndarray, palette: np.ndarray, interlace_first: bool = False
) -> bytes:
    """(n_frames, h, w) uint8 palette indices + (n, 3) palette ->
    animated GIF89a bytes. The LZW stream uses the spec's clear-code
    discipline (emit CLEAR whenever the table would overflow its
    current width ceiling) with literal codes only — a valid stream any
    decoder accepts, kept simple on purpose; pixel fidelity is exact."""
    nf, h, w = index_frames.shape
    n_colors = len(palette)
    depth = max(2, (n_colors - 1).bit_length())
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[:n_colors] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for fi in range(nf):
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"  # GCE: no disposal, 4cs
        iflags = 0x40 if (interlace_first and fi == 0) else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        idx = index_frames[fi]
        if iflags & 0x40:
            rows = np.concatenate([
                np.arange(0, h, 8), np.arange(4, h, 8),
                np.arange(2, h, 4), np.arange(1, h, 2),
            ])
            idx = idx[rows]
        mcs = depth
        clear, end = 1 << mcs, (1 << mcs) + 1
        width = mcs + 1
        acc = nbits = 0
        data = bytearray()

        def emit(code, w_):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += w_
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear, width)
        next_code = end + 1
        first = True
        for px in idx.reshape(-1):
            emit(int(px), width)
            # literal-only stream: the decoder adds a table entry for
            # every code AFTER the first since CLEAR — mirror that
            # count and widen/CLEAR in lockstep with its table
            if first:
                first = False
                continue
            next_code += 1
            if next_code == (1 << width):
                if width < 12:
                    width += 1
                else:
                    emit(clear, width)
                    width = mcs + 1
                    next_code = end + 1
                    first = True
        emit(end, width)
        if nbits:
            data.append(acc & 0xFF)
        out += bytes([mcs])
        for s in range(0, len(data), 255):
            chunk = data[s: s + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def synthetic_mixed_media_table(n: int = 64) -> pa.Table:
    """Deterministic MIXED-CODEC media corpus — one real in-container
    codec per row, rotating PNG / baseline-JPEG / animated-GIF / KGRW
    (``i % 4``), so the general media chain (`DecodeStub` with
    ``fake=False`` -> resize plan -> frame sampling) runs every real
    decoder in one pipeline. Geometry is formula-driven and therefore
    SQL-closed-form: ``w = 8*(2+(3i)%6)``, ``h = 8*(2+(5i)%6)``
    (multiples of 8; no resize ratio lands on an exact .5 at target
    64, so ROUND-parity holds), GIF rows are ``kind='video'`` with
    ``1 + i%4`` constant-color frames; pixel-level exactness per codec
    is hash-checked separately by the `{png,jpeg,gif,raw}
    _media_features` oracles."""
    pal = np.stack([
        np.arange(8) * 32 + 16,
        255 - np.arange(8) * 32,
        (np.arange(8) * 64 + 96) % 256,
    ], axis=1).astype(np.uint8)
    payloads, kinds, mimes = [], [], []
    for i in range(n):
        w, h = 8 * (2 + (i * 3) % 6), 8 * (2 + (i * 5) % 6)
        codec = i % 4
        if codec == 0:
            img = np.full((h, w, 3), i % 256, dtype=np.uint8)
            payloads.append(encode_png(img, filter_type=i % 5))
            kinds.append("image")
            mimes.append("image/png")
        elif codec == 1:
            by, bx = np.mgrid[0: h // 8, 0: w // 8]
            v = (37 * i + 17 * bx + 29 * by) % 256
            img = np.kron(v, np.ones((8, 8), dtype=np.int64)).astype(
                np.uint8
            )
            payloads.append(encode_jpeg(img, quality=34))
            kinds.append("image")
            mimes.append("image/jpeg")
        elif codec == 2:
            nf = 1 + i % 4
            frames = np.stack([
                np.full((h, w), (i + f) % 8, dtype=np.uint8)
                for f in range(nf)
            ])
            payloads.append(encode_gif(frames, pal))
            kinds.append("video")
            mimes.append("image/gif")
        else:
            img = np.full((h, w, 3), (i * 3) % 256, dtype=np.uint8)
            payloads.append(encode_raw_image(img))
            kinds.append("image")
            mimes.append("application/x-kgrw")
    return pa.table(
        {
            "media_id": pa.array([f"x{i:04d}" for i in range(n)]),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(mimes),
            "n_bytes": pa.array(
                [len(p) for p in payloads], type=pa.int64()
            ),
        }
    )


def synthetic_gif_media_table(n: int = 24) -> pa.Table:
    """Deterministic animated-GIF corpus: each clip has ``2 + i % 5``
    frames of constant palette color ``(i + 3f) % 8`` over an 8-color
    palette with closed-form RGB ``(32c+16, 255-32c, (64c+96) % 256)``
    — every decoded pixel of every frame is SQL-derivable. Every fourth
    clip interlaces its first frame to exercise de-interlacing."""
    pal = np.stack([
        np.arange(8) * 32 + 16,
        255 - np.arange(8) * 32,
        (np.arange(8) * 64 + 96) % 256,
    ], axis=1).astype(np.uint8)
    payloads = []
    meta = []
    for i in range(n):
        w_, h_ = 8 + (i * 5) % 24, 8 + (i * 7) % 24
        nf = 2 + i % 5
        frames = np.stack([
            np.full((h_, w_), (i + 3 * f) % 8, dtype=np.uint8)
            for f in range(nf)
        ])
        payloads.append(encode_gif(frames, pal, interlace_first=i % 4 == 0))
        meta.append((w_, h_, nf))
    return pa.table(
        {
            "media_id": pa.array([f"g{i:04d}" for i in range(n)]),
            "kind": pa.array(["video"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/gif"] * n),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class GifFramePipeline:
    """Actor stage: decode animated GIFs, run the REAL frame-sampling
    plan (``n`` evenly-spaced frames), and emit exact integer stats of
    the SAMPLED frames — (width, height, n_frames, sample count and
    per-channel pixel sums over sampled frames). The video analog of
    ``RawImagePipeline``."""

    def __init__(self, n_sample: int = 4):
        self.n_sample = n_sample

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict = {k: [] for k in (
            "width", "height", "n_frames", "n_sampled",
            "r_sum", "g_sum", "b_sum",
        )}
        for p in batch["payload"].to_pylist():
            fr = decode_gif(p)
            nf, h, w, _ = fr.shape
            k = min(self.n_sample, nf)
            sel = [int(i * nf // k) for i in range(k)]
            sub = fr[sel].astype(np.int64)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["n_frames"].append(nf)
            cols["n_sampled"].append(k)
            cols["r_sum"].append(int(sub[..., 0].sum()))
            cols["g_sum"].append(int(sub[..., 1].sum()))
            cols["b_sum"].append(int(sub[..., 2].sum()))
        for name, vals in cols.items():
            batch = batch.append_column(name, pa.array(vals, pa.int64()))
        return batch


def gif_frame_features(ds, n_sample: int = 4, batch_size: int = 64,
                       concurrency=(1, 4)):
    """Wire the GIF decode + frame-sample actor pool (same heap
    discipline as the other media stages)."""
    return ds.map_batches(
        GifFramePipeline,
        fn_constructor_kwargs={"n_sample": n_sample},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _flat_huff_spec(symbols):
    """Canonical single-length Huffman spec over the USED symbol set:
    all codes the same length l with 2^l - 1 >= U (the all-ones code
    stays unused, as T.81 requires). Not optimal — progressive scans
    here care about correctness, not ratio."""
    syms = sorted(set(symbols))
    if not syms:
        syms = [0x00]
    u = len(syms)
    length = 2
    while (1 << length) - 1 < u:
        length += 1
    bits = [0] * 16
    bits[length - 1] = u
    return bits, syms


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 75, subsample: str = "444",
    eob_cap: int = 32767,
) -> bytes:
    """uint8 grayscale/RGB -> PROGRESSIVE JFIF bytes (SOF2), exercising
    the full T.81 G.1.2 scan machine: an interleaved DC first scan at
    successive-approximation Al=1, a DC refinement scan (raw bits), a
    per-component AC first scan (Ss=1..63, Al=1) with EOB-run coding
    (runs up to ``eob_cap``; cap=1 degenerates to per-block EOB), and a
    per-component AC refinement scan (Ah=1, Al=0) with correction-bit
    buffering per the spec's encoder discipline. Quantized coefficients
    are IDENTICAL to the baseline encoder's, so for any input
    ``decode_jpeg(encode_jpeg_progressive(x)) ==
    decode_jpeg(encode_jpeg(x))`` bit-for-bit — the parity the tests
    pin. Per-scan Huffman tables are built over the used symbols
    (``_flat_huff_spec``) and re-emitted before each scan."""
    (comps, blocks, qt0, qt1, hmax, vmax, mcux, mcuy, h, w, gray
     ) = _jpeg_plan(arr, quality, subsample)
    ncomp = len(comps)
    zz = [b[:, :, _JPEG_ZIGZAG].astype(np.int64) for b in blocks]
    out = _jpeg_headers(comps, qt0, qt1, h, w, gray, b"\xff\xc2")

    def emit_scan(scan_comps, ss, se, ah, al, events, dc_tables,
                  ac_tables):
        """Append DHT(s) + SOS + serialized entropy data for one scan.
        ``events``: ('sym', cls, s, kind) / ('bits', v, n)."""
        for cls, (bits_, vals) in dc_tables.items():
            body = bytes([cls]) + bytes(bits_) + bytes(vals)
            out.extend(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)
        for cls, (bits_, vals) in ac_tables.items():
            body = bytes([0x10 | cls]) + bytes(bits_) + bytes(vals)
            out.extend(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)
        sos = bytes([len(scan_comps)])
        for ci in scan_comps:
            cls = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (cls << 4) | cls])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
        enc_dc = {c: _huff_encode_table(*t) for c, t in dc_tables.items()}
        enc_ac = {c: _huff_encode_table(*t) for c, t in ac_tables.items()}
        bw = _BitWriter()
        for ev in events:
            if ev[0] == "bits":
                bw.write(ev[1], ev[2])
            else:
                _tag, cls, s, kind = ev
                code, ln = (enc_dc if kind == "dc" else enc_ac)[cls][s]
                bw.write(code, ln)
        bw.flush()
        out.extend(bw.buf)

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hi, vi, _tq) in enumerate(comps):
                    for by in range(vi):
                        for bx in range(hi):
                            yield ci, my * vi + by, mx * hi + bx

    def own_blocks(ci):
        hi, vi, _tq = comps[ci]
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield by, bx

    al1 = 1  # successive-approximation split

    # --- scan 1: DC first, interleaved, Al=1 ------------------------------
    ev: list = []
    pred = [0] * ncomp
    dc_syms: dict = {0: [], 1: []} if ncomp > 1 else {0: []}
    plan = list(mcu_blocks())
    for ci, by, bx in plan:
        cls = 0 if ci == 0 else 1
        v = int(zz[ci][by, bx, 0]) >> al1  # arithmetic shift (T.81 DC PT)
        diff = v - pred[ci]
        pred[ci] = v
        cat = _jpeg_category(diff)
        dc_syms[cls].append(cat)
        ev.append(("sym", cls, cat, "dc"))
        if cat:
            ev.append(("bits",
                       diff if diff >= 0 else diff + (1 << cat) - 1, cat))
    emit_scan(list(range(ncomp)), 0, 0, 0, al1, ev,
              {c: _flat_huff_spec(s) for c, s in dc_syms.items()}, {})

    # --- scan 2: DC refinement, interleaved, Ah=1 Al=0 (raw bits) ---------
    ev = [("bits", int(zz[ci][by, bx, 0]) & 1, 1) for ci, by, bx in plan]
    emit_scan(list(range(ncomp)), 0, 0, al1, 0, ev, {}, {})

    # --- per component: AC first then AC refinement -----------------------
    for ci in range(ncomp):
        cls = 0 if ci == 0 else 1
        # AC first: Ss=1 Se=63 Ah=0 Al=1, EOB runs up to eob_cap
        ev = []
        syms: list = []
        eobrun = 0

        def flush_eob(extra_bits=None):
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                syms.append(nb << 4)
                ev.append(("sym", cls, nb << 4, "ac"))
                if nb:
                    ev.append(("bits", eobrun - (1 << nb), nb))
                if extra_bits is not None:
                    for b in extra_bits:
                        ev.append(("bits", b, 1))
                    extra_bits.clear()
                eobrun = 0
            elif extra_bits:
                # corrections with no pending EOB ride the next symbol
                pass

        for by, bx in own_blocks(ci):
            band = zz[ci][by, bx]
            t = [
                (1 if band[k] > 0 else -1) * (abs(int(band[k])) >> al1)
                for k in range(64)
            ]
            nzs = [k for k in range(1, 64) if t[k] != 0]
            if not nzs:
                eobrun += 1
                if eobrun == eob_cap:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for k in range(1, nzs[-1] + 1):
                if t[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    syms.append(0xF0)
                    ev.append(("sym", cls, 0xF0, "ac"))
                    run -= 16
                cat = abs(t[k]).bit_length()
                sym = (run << 4) | cat
                syms.append(sym)
                ev.append(("sym", cls, sym, "ac"))
                v = t[k]
                ev.append(("bits",
                           v if v >= 0 else v + (1 << cat) - 1, cat))
                run = 0
            if nzs[-1] < 63:
                eobrun += 1
                if eobrun == eob_cap:
                    flush_eob()
        flush_eob()
        emit_scan([ci], 1, 63, 0, al1, ev, {}, {cls: _flat_huff_spec(syms)})

        # AC refinement: Ss=1 Se=63 Ah=1 Al=0 — correction-bit buffering
        ev = []
        syms = []
        eobrun = 0
        be: list = []  # corrections buffered under the pending EOB run

        def flush_eob_refine():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                syms.append(nb << 4)
                ev.append(("sym", cls, nb << 4, "ac"))
                if nb:
                    ev.append(("bits", eobrun - (1 << nb), nb))
                for b in be:
                    ev.append(("bits", b, 1))
                be.clear()
                eobrun = 0

        for by, bx in own_blocks(ci):
            band = zz[ci][by, bx]
            a = [abs(int(band[k])) for k in range(64)]  # Al=0
            last_new = 0
            for k in range(1, 64):
                if a[k] == 1:
                    last_new = k
            r = 0
            br_bits: list = []
            for k in range(1, last_new + 1):
                if a[k] == 0:
                    r += 1
                    continue
                # ANY nonzero flushes pending ZRLs first (T.81 G.1.2.3 /
                # libjpeg's `while (r > 15 && k <= EOB)`): the ZRL may
                # carry only the correction bits of nonzeros BEFORE its
                # 16-zero window — this coefficient's bits ride the
                # next symbol, keeping the decoder's per-window
                # correction consumption in sync
                while r > 15:
                    flush_eob_refine()
                    syms.append(0xF0)
                    ev.append(("sym", cls, 0xF0, "ac"))
                    for b in br_bits:
                        ev.append(("bits", b, 1))
                    br_bits = []
                    r -= 16
                if a[k] > 1:
                    br_bits.append(a[k] & 1)
                    continue
                flush_eob_refine()
                sym = (r << 4) | 1
                syms.append(sym)
                ev.append(("sym", cls, sym, "ac"))
                ev.append(("bits", 1 if band[k] > 0 else 0, 1))
                for b in br_bits:
                    ev.append(("bits", b, 1))
                br_bits = []
                r = 0
            tail = [a[k] & 1 for k in range(last_new + 1, 64) if a[k] > 1]
            if last_new < 63:
                eobrun += 1
                be.extend(br_bits + tail)
                if eobrun == eob_cap:
                    flush_eob_refine()
        flush_eob_refine()
        emit_scan([ci], 1, 63, al1, 0, ev, {}, {cls: _flat_huff_spec(syms)})

    out.extend(b"\xff\xd9")
    return bytes(out)


# ---------------------------------------------------------------------------
# Built-in AVI/MJPEG codec (pure stdlib + the JPEG codec above) — a REAL
# video container+codec pair: RIFF 'AVI ' with an MJPEG 'vids' stream whose
# '00dc' chunks are ordinary JFIF frames (the format of countless cameras
# and capture cards). Decode walks the RIFF tree, collects the movi chunks
# and runs each through decode_jpeg — so baseline AND progressive frames
# both work. Inter-frame codecs (H.264 etc.) remain the honest stub.
# ---------------------------------------------------------------------------


def encode_avi_mjpeg(frames: "list[bytes]", width: int, height: int,
                     fps: int = 10) -> bytes:
    """JPEG frame payloads -> AVI bytes (RIFF hdrl/avih + strl/strh/strf
    with 'MJPG' fourcc, LIST movi of '00dc' chunks, idx1 index)."""
    if not frames:
        raise ValueError("avi: need at least one frame")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_sz = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, max_sz * fps, 0, 0x10, len(frames), 0, 1,
        max_sz, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG" + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
            max_sz, 0xFFFFFFFF, 0,
        ) + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    idx, off = b"", 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(payload: bytes) -> np.ndarray:
    """AVI/MJPEG bytes -> (n_frames, h, w, 3) uint8 stack. Walks the
    RIFF chunk tree to LIST movi and decodes every '00dc'/'00db' chunk
    through the built-in JPEG decoder (baseline or progressive frames);
    grayscale frames replicate to RGB. Non-MJPEG streams raise
    NotImplementedError naming the fourcc."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames: list = []

    def walk(pos: int, end: int):
        while pos + 8 <= end:
            fourcc = payload[pos:pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            body_start = pos + 8
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)
            elif fourcc == b"strh":
                if payload[body_start:body_start + 4] == b"vids":
                    handler = payload[body_start + 4:body_start + 8]
                    if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
                        raise NotImplementedError(
                            f"avi: video codec {handler!r} unsupported — "
                            "MJPEG only (inter-frame codecs need "
                            "ffmpeg-class decoders)"
                        )
            elif fourcc[2:4] in (b"dc", b"db") and size:
                img = decode_jpeg(payload[body_start:body_start + size])
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
                frames.append(img)
            pos = body_start + size + (size % 2)

    walk(12, 8 + struct.unpack("<I", payload[4:8])[0])
    if not frames:
        raise ValueError("avi: no video frames found")
    return np.stack(frames)


def decode_video(payload: bytes) -> np.ndarray:
    """Codec chain for multi-frame media: animated GIF or AVI/MJPEG ->
    (n_frames, h, w, 3) uint8."""
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return decode_avi_mjpeg(payload)
    raise ValueError("no video codec for payload (GIF, AVI/MJPEG here)")


def synthetic_avi_media_table(n: int = 16) -> pa.Table:
    """Deterministic AVI/MJPEG corpus: clip i has ``2 + i % 4`` frames,
    each an 8x8-block-constant grayscale JPEG at quality 34 with block
    value ``(37i + 11f + 17bx + 29by) % 256`` — the jpeg_media closed
    form extended by a frame index, so every decoded pixel of every
    frame is SQL-derivable. Every third clip's frames are PROGRESSIVE
    (SOF2) JPEGs: real mixed-codec video."""
    payloads = []
    for i in range(n):
        w, h = 8 * (2 + (i * 3) % 4), 8 * (2 + (i * 5) % 4)
        nf = 2 + i % 4
        frames = []
        for f in range(nf):
            by, bx = np.mgrid[0: h // 8, 0: w // 8]
            v = (37 * i + 11 * f + 17 * bx + 29 * by) % 256
            img = np.kron(v, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
            if i % 3 == 2:
                frames.append(encode_jpeg_progressive(img, quality=34))
            else:
                frames.append(encode_jpeg(img, quality=34))
        payloads.append(encode_avi_mjpeg(frames, w, h))
    return pa.table(
        {
            "media_id": pa.array([f"v{i:04d}" for i in range(n)]),
            "kind": pa.array(["video"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["video/x-msvideo"] * n),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class VideoFramePipeline:
    """Actor stage: decode GIF or AVI/MJPEG video, run the REAL
    frame-sampling plan and emit exact integer stats of the sampled
    frames — the general-video sibling of ``GifFramePipeline``."""

    def __init__(self, n_sample: int = 4):
        self.n_sample = n_sample

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict = {k: [] for k in (
            "width", "height", "n_frames", "n_sampled",
            "r_sum", "g_sum", "b_sum",
        )}
        for p in batch["payload"].to_pylist():
            fr = decode_video(p)
            nf, h, w, _ = fr.shape
            k = min(self.n_sample, nf)
            sel = [int(i * nf // k) for i in range(k)]
            sub = fr[sel].astype(np.int64)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["n_frames"].append(nf)
            cols["n_sampled"].append(k)
            cols["r_sum"].append(int(sub[..., 0].sum()))
            cols["g_sum"].append(int(sub[..., 1].sum()))
            cols["b_sum"].append(int(sub[..., 2].sum()))
        for name, vals in cols.items():
            batch = batch.append_column(name, pa.array(vals, pa.int64()))
        return batch


def video_frame_features(ds, n_sample: int = 4, batch_size: int = 64,
                         concurrency=(1, 4)):
    """Wire the general video decode + frame-sample actor pool."""
    return ds.map_batches(
        VideoFramePipeline,
        fn_constructor_kwargs={"n_sample": n_sample},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def encode_wav_g711(companded: np.ndarray, rate: int, law: str) -> bytes:
    """uint8 companded samples, (n,) mono or (n, ch) -> G.711 WAV bytes
    (codec 7 = mu-law, 6 = A-law; 8 bits per sample)."""
    if companded.ndim == 1:
        companded = companded[:, None]
    assert companded.dtype == np.uint8
    n, ch = companded.shape
    codec = {"mulaw": 7, "alaw": 6}[law]
    data = np.ascontiguousarray(companded).tobytes()
    fmt = struct.pack("<HHIIHH", codec, ch, rate, rate * ch, ch, 8)
    body = (
        _WAV_WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _WAV_RIFF + struct.pack("<I", len(body)) + body


def synthetic_g711_media_table(n: int = 32) -> pa.Table:
    """Deterministic G.711 telephony-audio corpus: companded BYTES come
    straight from the formula ``(7i + 13t) % 256`` (mu-law clips) or
    ``(11i + 17t) % 256`` (A-law clips, alternating), 1024 samples at
    8 kHz — so the expansion arithmetic, not a lossy compress step, is
    what the oracle re-derives. Every fourth clip is stereo (the second
    channel offset by +1 before the modulus)."""
    payloads = []
    rate, ns = 8000, 1024
    t = np.arange(ns, dtype=np.int64)
    for i in range(n):
        law = "mulaw" if i % 2 == 0 else "alaw"
        base = (7 * i + 13 * t) % 256 if law == "mulaw" \
            else (11 * i + 17 * t) % 256
        if i % 4 == 0:
            comp = np.stack([base, (base + 1) % 256], axis=1)
        else:
            comp = base[:, None]
        payloads.append(encode_wav_g711(comp.astype(np.uint8), rate, law))
    return pa.table(
        {
            "media_id": pa.array([f"t{i:04d}" for i in range(n)]),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["audio/basic"] * n),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV codec 17) — a REAL 4:1 compressed-audio codec: 4-bit
# nibbles drive an integer predictor/step-index state machine (public IMA
# spec / multimedia dvi-adpcm reference arithmetic). Pure integer shifts
# and clamps, so a SQL oracle replays the whole state machine.
# ---------------------------------------------------------------------------

_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def ima_adpcm_decode(data: bytes, block_align: int) -> np.ndarray:
    """Mono IMA ADPCM data chunk -> int16 samples. Each block: 4-byte
    header (predictor int16le, step index uint8, reserved) whose
    predictor IS the first output sample, then (block_align - 4) bytes
    of nibbles, LOW nibble first — the standard WAV layout."""
    out = []
    for base in range(0, len(data) - 3, block_align):
        block = data[base: base + block_align]
        pred = struct.unpack("<h", block[0:2])[0]
        idx = block[2]
        if idx > 88:
            raise ValueError(f"adpcm: step index {idx} out of range")
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = int(_IMA_STEP_TABLE[idx])
                vpdiff = step >> 3
                if nib & 4:
                    vpdiff += step
                if nib & 2:
                    vpdiff += step >> 1
                if nib & 1:
                    vpdiff += step >> 2
                pred = pred - vpdiff if nib & 8 else pred + vpdiff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(_IMA_INDEX_TABLE[nib & 7])))
                out.append(pred)
    return np.asarray(out, dtype=np.int16)


def encode_wav_adpcm(blocks: "list[tuple[int, int, bytes]]",
                     rate: int, block_align: int) -> bytes:
    """Assemble a mono IMA-ADPCM WAV from raw blocks of
    ``(predictor, step_index, nibble_bytes)`` — the corpus generator's
    entry point (payload-level, no lossy encode step to mirror)."""
    data = b"".join(
        struct.pack("<hBB", pred, idx, 0) + nibbles
        for pred, idx, nibbles in blocks
    )
    spb = (block_align - 4) * 2 + 1
    fmt = struct.pack("<HHIIHH", 17, 1, rate,
                      rate * block_align // spb, block_align, 4)
    # codec-17 fmt carries cbSize + samples-per-block extension
    fmt += struct.pack("<HH", 2, spb)
    body = (
        _WAV_WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _WAV_RIFF + struct.pack("<I", len(body)) + body


def synthetic_adpcm_media_table(n: int = 16) -> pa.Table:
    """Deterministic IMA-ADPCM corpus: mono clips of 2 blocks at
    block_align 68 (129 samples/block), header predictor
    ``(997 * i + 313 * blk) % 60000 - 30000``, step index
    ``(5 * i + 7 * blk) % 89``, nibble t of block blk =
    ``(3i + 5blk + 11t) % 16`` — every decoded sample is a pure
    function of (i, blk, t) that a recursive-CTE oracle replays."""
    payloads = []
    rate, ba = 8000, 68
    for i in range(n):
        blocks = []
        for blk in range(2):
            pred = (997 * i + 313 * blk) % 60000 - 30000
            idx = (5 * i + 7 * blk) % 89
            nibs = [(3 * i + 5 * blk + 11 * t) % 16
                    for t in range((ba - 4) * 2)]
            by = bytes(
                nibs[2 * j] | (nibs[2 * j + 1] << 4)
                for j in range(ba - 4)
            )
            blocks.append((pred, idx, by))
        payloads.append(encode_wav_adpcm(blocks, rate, ba))
    return pa.table(
        {
            "media_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["audio/x-adpcm"] * n),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


def shard_media_features(
    shard_paths,
    out_dir: str,
    suffix: str = "jpg",
    target: int = 64,
    batch_size: int = 128,
    concurrency=(1, 8),
) -> dict:
    """RESUMABLE WebDataset -> features pipeline: decode every ``.jpg``
    member of every tar shard through the actor-pool image chain and
    write ONE Parquet file per input shard under
    ``out_dir/shard=<shard-stem>/features.parquet``.

    The shard is the resume unit (the repo-wide "resumable output"
    rule applied to media): a shard whose output file already exists is
    SKIPPED driver-side before any byte of it is read, so a crashed
    100 TB run re-does only unfinished shards. Each output file is
    written task-side via a stage+rename (tmp file, ``os.replace``), so
    a crash mid-write never leaves a half-file that would be mistaken
    for done. Returns ``{"processed": n, "skipped": n, "out_dir": ...,
    "rows": n}``.

    Distribution shape: the tar walk is one task per shard; the decode
    chain is the shared actor pool (which re-batches ACROSS shard
    blocks — so the tiny feature rows take one shard-keyed bucket
    shuffle before writing, guaranteeing every shard's rows land in
    exactly one writer task; writing from the actor stream directly
    would let a shard span two output blocks and the atomic rename
    would keep only the LAST partial). The driver handles only shard
    NAMES and the (shard, rows) manifest."""
    import os

    import pyarrow.parquet as pq

    import ray.data  # noqa: F401  (session owned by the caller)

    def _stem(p: str) -> str:
        b = os.path.basename(p)
        for ext in (".tar.gz", ".tar"):
            if b.endswith(ext):
                return b[: -len(ext)]
        return b

    os.makedirs(out_dir, exist_ok=True)
    shard_paths = sorted(str(p) for p in shard_paths)
    todo, skipped = [], 0
    for p in shard_paths:
        dest = os.path.join(out_dir, f"shard={_stem(p)}", "features.parquet")
        if os.path.exists(dest):
            skipped += 1
        else:
            todo.append(p)
    if not todo:
        return {"processed": 0, "skipped": skipped,
                "out_dir": out_dir, "rows": 0}

    from .graph_io import read_tar_shards

    ds = read_tar_shards(todo, suffixes=(suffix,), include_shard=True)
    ds = ds.map_batches(
        lambda t, _s=suffix: pa.table(
            {
                "shard": t["shard"],
                "media_id": t["key"],
                "payload": t[_s],
            }
        ),
        batch_format="pyarrow",
        num_cpus=0.99,  # keep the one-shard-per-block structure unfused
    )
    feats = ds.map_batches(
        RawImagePipeline,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    from .relational import hash_bucketed_groupby

    def write_bucket(df) -> "object":
        import pandas as pd

        outs_shard, outs_rows = [], []
        for shard, g in df.groupby("shard", sort=True):
            sub = pa.Table.from_pandas(
                g.drop(columns=["payload"], errors="ignore"),
                preserve_index=False,
            )
            d = os.path.join(out_dir, f"shard={_stem(shard)}")
            os.makedirs(d, exist_ok=True)
            dest = os.path.join(d, "features.parquet")
            tmp = dest + ".tmp"
            pq.write_table(sub, tmp)
            os.replace(tmp, dest)  # atomic: done == file exists
            outs_shard.append(shard)
            outs_rows.append(sub.num_rows)
        return pd.DataFrame({"shard": outs_shard, "rows": outs_rows})

    slim = feats.map_batches(
        lambda t: t.drop_columns(["payload"]), batch_format="pyarrow"
    )
    manifest = hash_bucketed_groupby(
        slim, ["shard"], write_bucket, num_buckets=64
    ).take_all()
    return {
        "processed": len({m["shard"] for m in manifest}),
        "skipped": skipped,
        "out_dir": out_dir,
        "rows": int(sum(m["rows"] for m in manifest)),
    }
