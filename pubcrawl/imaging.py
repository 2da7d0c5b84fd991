"""Image payload codecs + perceptual hash (input_hint columns bytes/w/h/fmt/phash).

The sandbox has no image libraries (no PIL), so:

- ``png``  — a real, spec-compliant PNG codec implemented here over zlib
  (RGB8, filter types 0-4 on decode, filter 0 on encode). Lossless.
- ``jpeg`` — STAND-IN LOSSY CODEC: when PIL is importable we use real JPEG;
  otherwise a deterministic uniform-quantization codec (quantize pixels to a
  step derived from quality, then PNG-encode, wrapped in a b'FJPG' container).
  Quantization step <= 6 keeps PSNR >= 43 dB, satisfying the >= 40 dB
  decoded-pixel invariant the north_rule demands for lossy formats. The
  Ray-side plumbing (binary column, decode stage, verify stage) is identical
  for the real codec.

Reference behavior: the reference streams PDFs to disk as opaque bytes
(/root/reference/src/utils/downloader.py:31-36); here the binary payload is an
image carried as an Arrow ``binary`` column through zero-copy batches.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # real JPEG when available; the sandbox lacks PIL
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FJPG_SIG = b"FJPG"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """RGB uint8 HxWx3 → PNG bytes (filter 0, one IDAT)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 1)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        else:  # Sub (1), Average (3), Paeth (4) need left-to-right recurrence
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    cc = prev[x - bpp] if x >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    cur[x] = (line[x] + pred) & 0xFF
            out[y] = cur
    return out


def png_decode(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    off = 8
    w = h = 0
    idat = b""
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            assert depth == 8 and ctype == 2, "codec only handles 8-bit RGB"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        off += 12 + ln
    stride = w * 3
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, stride + 1)
    if (raw[:, 0] == 0).all():  # fast path: our encoder's filter-0 output
        return raw[:, 1:].reshape(h, w, 3).copy()
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


def _quant_step(quality: int) -> int:
    # q in [70, 95] → step in [2, 5]; MSE ≈ step²/12 → PSNR ≥ 43 dB
    return max(2, round(2 + (95 - quality) / 8))


def jpeg_encode(img: np.ndarray, quality: int = 85) -> bytes:
    if _HAVE_PIL:
        import io

        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, "JPEG", quality=quality)
        return buf.getvalue()
    step = _quant_step(quality)
    q = ((img.astype(np.int32) + step // 2) // step * step).clip(0, 255).astype(np.uint8)
    return _FJPG_SIG + bytes([quality]) + png_encode(q)


def jpeg_decode(data: bytes) -> np.ndarray:
    if data[:4] == _FJPG_SIG:
        return png_decode(data[5:])
    if _HAVE_PIL:
        import io

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError("real JPEG bytes but PIL is unavailable")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return png_decode(data) if fmt == "png" else jpeg_decode(data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------------- perceptual hash

_DCT32 = None


def _dct_basis(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)
        _DCT32 = np.cos(np.pi / n * (k[None, :] + 0.5) * k[:, None])
    return _DCT32


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash (classic pHash recipe: 32x32 luma → 2D DCT →
    top-left 8x8 minus DC → bits = coeff > median). Returns signed int64."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    small = gray[np.ix_(ys, xs)]
    d = _dct_basis()
    coeffs = d @ small @ d.T
    block = coeffs[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = np.uint64(0)
    for i, v in enumerate(block):
        if v > med:
            bits |= np.uint64(1) << np.uint64(i)
    return int(np.int64(bits))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# ---------------------------------------------------------------- procedural gen


def procedural_image(key: int, min_side: int = 16, max_side: int = 96) -> tuple[np.ndarray, str, int]:
    """Deterministic RGB image for the synthetic web: sinusoid + gradient mix
    seeded by ``key``. Returns (pixels, fmt, quality). Sizes default small so
    test webs stay cheap; the bench generator widens them."""
    rng = np.random.default_rng(np.uint64(key))
    w = int(rng.integers(min_side, max_side + 1))
    h = int(rng.integers(min_side, max_side + 1))
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        fx, fy = rng.uniform(0.02, 0.3, size=2)
        ph = rng.uniform(0, 2 * np.pi)
        base = 127 + 60 * np.sin(2 * np.pi * (fx * xx + fy * yy) + ph)
        grad = rng.uniform(-40, 40) * (xx / max(w - 1, 1) - 0.5)
        img[:, :, c] = np.clip(base + grad + rng.integers(-20, 20), 0, 255).astype(np.uint8)
    if rng.random() < 0.5:
        return img, "png", 100
    return img, "jpeg", int(rng.integers(70, 96))


def encode_image(img: np.ndarray, fmt: str, quality: int) -> bytes:
    return png_encode(img) if fmt == "png" else jpeg_encode(img, quality)
