"""Image codecs + perceptual hash for the image+caption payload path.

The sandbox has no PIL/libjpeg, but all four formats are REAL here:

* ``png``: a minimal but spec-correct PNG encoder/decoder
  (8-bit RGB, filter 0, zlib) — lossless round-trip, byte-exact pixels.
* ``jpeg``: a real baseline-sequential JFIF codec (jpegcodec.py, pure
  numpy — Annex-K tables, zigzag, Huffman, byte stuffing). Default
  quality 98 / 4:4:4 keeps the per-row PSNR ≥ 40 dB invariant with
  margin (min ≈ 43 dB over the synthetic-web corpus). Progressive
  SOF2 streams decode too (jpegprog.py). Rounds 1–3 used a
  quantize+PNG stand-in; ``decode`` still sniffs and reads those
  legacy containers for archives written by earlier rounds.
* ``gif``: real LZW with median-cut quantization and animation
  compositing (gifcodec.py).
* ``bmp``: 24-bit BI_RGB encode; decode also reads 32-bit, top-down,
  and 8-bit palettized (uncompressed or the MS-RLE8 run-length codec
  shared with videocodec.py).

``phash`` is a real 64-bit 8×8-DCT perceptual hash (pure numpy).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from crawlkit import jpegcodec

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_QUALITY = 98  # keeps min PSNR ≈ 43 dB on the noisy synthetic corpus


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


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit BI_RGB Windows BMP (BITMAPINFOHEADER, bottom-up rows,
    BGR byte order, rows padded to 4 bytes) — lossless, uncompressed;
    the other container real crawls hand back for small graphics."""
    h, w = pixels.shape[:2]
    row = w * 3
    stride = row + ((-row) % 4)
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row] = pixels[::-1, :, ::-1].reshape(h, row)
    data = body.tobytes()
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP → (h, w, 3) uint8. Supports the shapes found in the wild:
    BITMAPINFOHEADER(+), 24/32-bit BI_RGB (bottom-up or top-down), and
    8-bit palettized — uncompressed or BI_RLE8 (the real Microsoft
    run-length codec, videocodec.rle8_decode_indices). Raises
    ValueError otherwise."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP stream")
    (offset,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h_signed = struct.unpack("<Iii", data[14:26])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack("<HHI", data[26:34])
    h, top_down = abs(h_signed), h_signed < 0
    if planes != 1 or (bpp, compression) not in ((24, 0), (32, 0), (8, 0), (8, 1)):
        raise ValueError(f"unsupported BMP bpp={bpp} compression={compression}")
    if bpp == 8:
        n_pal = (offset - 14 - hdr_size) // 4
        if n_pal <= 0:
            raise ValueError("8-bit BMP without a palette")
        quads = np.frombuffer(data, np.uint8, n_pal * 4, 14 + hdr_size).reshape(-1, 4)
        palette = quads[:, 2::-1].copy()  # BGRx → RGB
        if compression == 1:  # BI_RLE8 (bottom-up by definition)
            from crawlkit.videocodec import rle8_decode_indices

            return palette[rle8_decode_indices(data[offset:], w, h)]
        stride = (w + 3) // 4 * 4
        if len(data) < offset + stride * h:
            raise ValueError("truncated BMP pixel data")
        idx = np.frombuffer(data, np.uint8, stride * h, offset).reshape(h, stride)
        idx = idx[:, :w]
        return palette[idx if top_down else idx[::-1]]
    nbytes = bpp // 8
    stride = (w * nbytes + 3) // 4 * 4
    if len(data) < offset + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, np.uint8, stride * h, offset).reshape(h, stride)
    px = rows[:, : w * nbytes].reshape(h, w, nbytes)
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) → RGB, alpha dropped


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode pixels in ``fmt`` ('png' lossless | 'jpeg' real baseline
    JPEG | 'gif' real LZW — palette-quantized first when >256 colors,
    so like jpeg it is lossy for rich sources; decode-exactness is
    available by quantizing the source up front)."""
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return jpegcodec.encode_jpeg(pixels, quality=JPEG_QUALITY)
    if fmt == "gif":
        from crawlkit import gifcodec

        return gifcodec.encode_gif(gifcodec.quantize_median_cut(pixels))
    if fmt == "bmp":
        return encode_bmp(pixels)
    if fmt == "tiff":
        from crawlkit import tiffcodec

        return tiffcodec.encode_tiff(pixels, compression="lzw", predictor=2)
    raise NotImplementedError(f"codec {fmt!r} not available in this sandbox")


def encode_with_decoded(pixels: np.ndarray, fmt: str) -> tuple[bytes, np.ndarray]:
    """(encoded bytes, decoder-exact decoded pixels) without re-parsing:
    png is lossless (decoded == input); jpeg reconstructs from its own
    quantized coefficients (byte-exact vs ``decode``, test-pinned)."""
    if fmt == "png":
        return encode_png(pixels), pixels
    if fmt == "jpeg":
        return jpegcodec.encode_jpeg(pixels, quality=JPEG_QUALITY, return_decoded=True)
    if fmt == "gif":
        from crawlkit import gifcodec

        q = gifcodec.quantize_median_cut(pixels)
        return gifcodec.encode_gif(q), q
    if fmt == "bmp":
        return encode_bmp(pixels), pixels
    if fmt == "tiff":
        return encode(pixels, "tiff"), pixels  # lossless
    raise NotImplementedError(f"codec {fmt!r} not available in this sandbox")


def encode_batch(
    pixel_list: list[np.ndarray], fmts: list[str]
) -> tuple[list[bytes], list[np.ndarray]]:
    """Batched (bytes, decoded) for mixed png/jpeg records — the crawl
    hot path (stages/fetch.py fused image task). jpeg images go through
    one vectorized ``encode_jpeg_batch`` call; png is per-image zlib.
    Byte-identical to per-image ``encode``/``encode_with_decoded``."""
    out_bytes: list[bytes | None] = [None] * len(pixel_list)
    out_dec: list[np.ndarray | None] = [None] * len(pixel_list)
    jpeg_idx = [i for i, f in enumerate(fmts) if f == "jpeg"]
    if jpeg_idx:
        datas, decs = jpegcodec.encode_jpeg_batch(
            [pixel_list[i] for i in jpeg_idx],
            quality=JPEG_QUALITY,
            return_decoded=True,
        )
        for i, d, r in zip(jpeg_idx, datas, decs):
            out_bytes[i] = d
            out_dec[i] = r
    for i, f in enumerate(fmts):
        if f == "png":
            out_bytes[i] = encode_png(pixel_list[i])
            out_dec[i] = pixel_list[i]
        elif f == "gif":
            from crawlkit import gifcodec

            q = gifcodec.quantize_median_cut(pixel_list[i])
            out_bytes[i] = gifcodec.encode_gif(q)
            out_dec[i] = q
        elif f == "bmp":
            out_bytes[i] = encode_bmp(pixel_list[i])
            out_dec[i] = pixel_list[i]
        elif f == "tiff":
            out_bytes[i] = encode(pixel_list[i], "tiff")
            out_dec[i] = pixel_list[i]
        elif f != "jpeg":
            raise NotImplementedError(f"codec {f!r} not available in this sandbox")
    return out_bytes, out_dec


def decode(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode image bytes → (h, w, 3) uint8. fmt is advisory (container
    sniffed): JFIF/JPEG (FF D8), PNG, GIF87a/89a (first composited
    frame — gifcodec.py, real LZW), BMP (24/32-bit BI_RGB), TIFF
    (II/MM — tiffcodec.py: none/PackBits/LZW+predictor strips), or the
    legacy round-1..3 lossy stand-in (a PNG container carrying
    pre-quantized pixels)."""
    if data[:2] == b"\xff\xd8":
        return jpegcodec.decode_jpeg(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from crawlkit import gifcodec

        return gifcodec.decode_gif(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        from crawlkit import tiffcodec

        return tiffcodec.decode_tiff(data)
    raise NotImplementedError("unrecognized image container")


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
    """MSB-first fold of ≤64 bits into an int (packbits pads the TAIL,
    so shift the pad back out — value-identical to the old per-bit
    loop, test-pinned)."""
    b = np.asarray(bits, dtype=bool).ravel()
    out = int.from_bytes(np.packbits(b).tobytes(), "big") >> ((-len(b)) % 8)
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
    return _bits_to_u64(vals > med)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
