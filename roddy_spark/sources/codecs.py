"""Image codecs for the image+caption payload (BASELINE.json input_hint).

The sandbox has no PIL/opencv, so:
  * PNG is REAL — a dependency-free encoder/decoder (zlib + the public PNG
    spec, RFC 2083): 8-bit RGB, all five scanline filters supported on
    decode, filter 0 on encode. Lossless → decode must be exact.
  * JPEG is STUBBED behind an import-try: if PIL is present we use it;
    otherwise a CLEARLY-MARKED deterministic fake lossy codec ("FJPG")
    stands in — 6-bit per-channel quantization + zlib, which loses
    information like a real lossy codec but keeps PSNR ≥ 40 dB (the
    input_hint invariant) and is bit-deterministic. The Spark-side plumbing
    (binary column, decode UDF, PSNR check, batch shapes) is real either way.

Also: PSNR and a 64-bit DCT perceptual hash (classic pHash construction:
32×32 luma → 2-D DCT-II → top-left 8×8 sans DC → median threshold).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - not present in sandbox
    from PIL import Image  # type: ignore
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_FJPG_MAGIC = b"FJPG"  # fake-lossy container marker (sandbox stand-in)


# ---------------------------------------------------------------------------
# PNG (real, lossless)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit RGB HxWx3 array → PNG bytes (filter 0, zlib level 6)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects HxWx3 uint8")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * 3)], axis=1).tobytes()
    return (_PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → HxWx3 uint8. Supports 8-bit RGB/RGBA, filters 0-4."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or ctype not in (2, 6) or interlace != 0:
                raise ValueError("unsupported PNG variant")
            ch = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = w * ch
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, scan = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    zero = np.zeros(stride, np.uint8)
    for y in range(h):
        f, cur = filters[y], scan[y].copy()
        prior = out[y - 1] if y else zero
        if f == 0:
            out[y] = cur
        elif f == 1:
            row = cur.reshape(w, ch).astype(np.int32)
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 0xFF
            out[y] = row.astype(np.uint8).reshape(stride)
        elif f == 2:
            out[y] = cur + prior
        elif f == 3:
            row = cur.reshape(w, ch).astype(np.int32)
            pr = prior.reshape(w, ch).astype(np.int32)
            prev = np.zeros(ch, np.int32)
            for x in range(w):
                row[x] = (row[x] + ((prev + pr[x]) >> 1)) & 0xFF
                prev = row[x]
            out[y] = row.astype(np.uint8).reshape(stride)
        elif f == 4:
            row = cur.reshape(w, ch)
            pr = prior.reshape(w, ch)
            prev = np.zeros(ch, np.uint8)
            prev_up = np.zeros(ch, np.uint8)
            for x in range(w):
                row[x] = row[x] + _paeth(prev, pr[x], prev_up)
                prev, prev_up = row[x], pr[x]
            out[y] = row.reshape(stride)
        else:
            raise ValueError(f"bad filter {f}")
    img = out.reshape(h, w, ch)
    return img[:, :, :3].copy()


# ---------------------------------------------------------------------------
# Fake lossy codec (sandbox JPEG stand-in — CLEARLY MARKED)
# ---------------------------------------------------------------------------

def encode_lossy(arr: np.ndarray) -> bytes:
    """Deterministic fake lossy encode: 6-bit/channel quantization + zlib.

    Stand-in for JPEG when PIL is absent (see module docstring). Information
    IS lost (2 LSBs/channel), reconstruction error gives PSNR ≈ 46 dB —
    above the input_hint's 40 dB gate, below lossless."""
    if HAVE_PIL:  # pragma: no cover
        import io
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        return buf.getvalue()
    h, w = arr.shape[:2]
    q = (arr >> 2).astype(np.uint8)  # 6 bits per channel
    return (_FJPG_MAGIC + struct.pack(">II", w, h)
            + zlib.compress(q.tobytes(), 6))


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] == _FJPG_MAGIC:
        w, h = struct.unpack(">II", data[4:12])
        q = np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3)
        # reconstruct at bin centers: q*4 + 2 (max error 2 per channel)
        return ((q.astype(np.uint16) << 2) + 2).clip(0, 255).astype(np.uint8)
    if HAVE_PIL:  # pragma: no cover
        import io
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError(
        "real JPEG decode requires PIL (absent in sandbox); "
        "bytes are not an FJPG stand-in container")


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes → HxWx3 uint8 pixels."""
    if data[:8] == _PNG_MAGIC:
        return decode_png(data)
    return decode_lossy(data)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def _dct_mat(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_mat(32)


def phash64(arr: np.ndarray) -> int:
    """64-bit DCT perceptual hash (classic pHash construction) as signed
    int64 — matches the corpus table's ``phash:int64`` column."""
    gray = (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
            + 0.114 * arr[:, :, 2]).astype(np.float64)
    h, w = gray.shape
    # mean-pool resize to 32x32 via index binning (deterministic, no deps)
    yi = (np.arange(32)[:, None] * h) // 32
    yj = ((np.arange(32)[:, None] + 1) * h + 31) // 32
    xi = (np.arange(32)[None, :] * w) // 32
    xj = ((np.arange(32)[None, :] + 1) * w + 31) // 32
    small = np.empty((32, 32))
    for y in range(32):
        for x in range(32):
            small[y, x] = gray[yi[y, 0]:yj[y, 0], xi[0, x]:xj[0, x]].mean()
    dct = _DCT32 @ small @ _DCT32.T
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])  # skip DC term
    bits = 0
    for idx, v in enumerate(block[1:]):  # 63 AC bits + leading 0
        if v > med:
            bits |= 1 << idx
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
