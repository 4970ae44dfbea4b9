"""Image codecs + perceptual hash for the image+caption payload path.

The sandbox has no PIL/libjpeg, so:

* ``png`` is REAL: a minimal but spec-correct PNG encoder/decoder
  (8-bit RGB, filter 0, zlib) — lossless round-trip, byte-exact pixels.
* ``jpeg`` is a clearly-marked DETERMINISTIC STAND-IN for a lossy codec:
  pixels are quantized (step 4 → PSNR ≈ 47 dB, satisfying the ≥40 dB
  per-row invariant) and stored in the same PNG container with a
  ``jpegstub`` marker chunk. Swap ``encode``/``decode`` for a real
  libjpeg binding outside the sandbox — the Ray-side plumbing (binary
  Arrow columns, batch sizes, actor signatures) is real and tested.

``phash`` is a real 64-bit 8×8-DCT perceptual hash (pure numpy).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LOSSY_QUANT = 4  # quantization step for the jpeg stand-in


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB → PNG bytes (color type 2, filter 0)."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNGs produced by :func:`encode_png` (filter 0, RGB8)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", body[:10])
            if bits != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if not (raw[:, 0] == 0).all():
        raise ValueError("only filter 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode pixels in ``fmt`` ('png' lossless | 'jpeg' lossy stand-in)."""
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        # STUB lossy path: quantize → PNG container + marker chunk.
        q = _LOSSY_QUANT
        quant = ((pixels.astype(np.int32) + q // 2) // q * q).clip(0, 255).astype(np.uint8)
        png = encode_png(quant)
        return png[:-12] + _chunk(b"jpGs", b"stub") + png[-12:]
    raise NotImplementedError(f"codec {fmt!r} not available in this sandbox")


def decode(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode image bytes → (h, w, 3) uint8. fmt is advisory (container sniffed)."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    raise NotImplementedError("non-PNG-container codecs unavailable in sandbox")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# --- perceptual hash (8×8 DCT of 32×32 grayscale, median threshold) -----

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)
        _DCT32 = np.cos(np.pi / n * (k[None, :] + 0.5) * k[:, None])
    return _DCT32


def box_resize(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box-filter resize (h, w, 3) uint8 → (out_h, out_w, 3) uint8.

    True area averaging when downscaling (each output pixel is the mean
    of its integer source box — anti-aliased, unlike the index-map
    sampling used for hashes), nearest-neighbor when upscaling a
    dimension. Pure numpy via two reduceat passes; deterministic."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3
    h, w, c = pixels.shape
    # integer box edges per output row/col (monotone, cover [0, h))
    ye = (np.arange(out_h + 1) * h // out_h).clip(0, h)
    xe = (np.arange(out_w + 1) * w // out_w).clip(0, w)
    # upscale guard: empty boxes (ye[i]==ye[i+1]) → nearest sample
    if (np.diff(ye) == 0).any() or (np.diff(xe) == 0).any():
        yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
        xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
        return pixels[np.ix_(yi, xi)]
    acc = np.add.reduceat(pixels.astype(np.float64), ye[:-1], axis=0)
    acc = np.add.reduceat(acc, xe[:-1], axis=1)
    area = np.diff(ye)[:, None, None] * np.diff(xe)[None, :, None]
    return np.rint(acc / area).clip(0, 255).astype(np.uint8)


def _gray32(pixels: np.ndarray, n: int = 32) -> np.ndarray:
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    yi = (np.arange(n) * h // n).clip(0, h - 1)
    xi = (np.arange(n) * w // n).clip(0, w - 1)
    return gray[np.ix_(yi, xi)]


def _bits_to_u64(bits: np.ndarray) -> int:
    out = np.uint64(0)
    for b in bits.astype(np.uint64).ravel():
        out = np.uint64(out << np.uint64(1)) | np.uint64(b)
    return int(out)


def ahash64(pixels: np.ndarray) -> int:
    """64-bit average hash: 8×8 gray downsample, bit = pixel > mean."""
    small = _gray32(pixels, 8)
    return _bits_to_u64(small > small.mean())


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash: 9×8 gray downsample, bit = px[y,x+1] > px[y,x]."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    yi = (np.arange(8) * h // 8).clip(0, h - 1)
    xi = (np.arange(9) * w // 9).clip(0, w - 1)
    small = gray[np.ix_(yi, xi)]
    return _bits_to_u64(small[:, 1:] > small[:, :-1])


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: resize→32×32 gray, 2-D DCT, top-left 8×8
    (skipping DC), bits = coefficient > median."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # box-resample to 32×32 via index mapping (no scipy)
    yi = (np.arange(32) * h // 32).clip(0, h - 1)
    xi = (np.arange(32) * w // 32).clip(0, w - 1)
    small = gray[np.ix_(yi, xi)]
    d = _dct_matrix()
    coef = d @ small @ d.T
    block = coef[:8, :8].flatten()
    vals = block[1:]  # skip DC
    med = np.median(vals)
    bits = (vals > med).astype(np.uint64)
    out = np.uint64(0)
    for b in bits:
        out = np.uint64(out << np.uint64(1)) | np.uint64(b)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
