"""GIF codec: LZW/interlace/palette/animation decode pinned by
round-trips, an independently hand-assembled stream, and the
imagecodec seam (sniffed decode, quantize-exact encode)."""

import numpy as np
import pytest

from crawlkit import imagecodec
from crawlkit.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    _sub_blocks,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
    quantize_median_cut,
)


def _rng_img(seed: int, h: int, w: int, colors: int) -> np.ndarray:
    """Deterministic (h,w,3) image drawing from exactly ≤`colors` colors."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(colors, 3), dtype=np.uint8)
    idx = rng.integers(0, colors, size=(h, w))
    return pal[idx]


# ------------------------------------------------------------- round trips


@pytest.mark.parametrize("colors", [2, 3, 4, 16, 130, 256])
def test_roundtrip_palette_sizes(colors):
    img = _rng_img(colors, 23, 31, colors)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_interlaced():
    for h in (1, 2, 5, 8, 37):  # odd heights hit every interlace pass edge
        img = _rng_img(h, h, 19, 7)
        data = encode_gif(img, interlace=True)
        assert np.array_equal(decode_gif(data), img)


def test_roundtrip_large_grows_code_width():
    # enough pixels/colors to push the dictionary well past 512 entries
    img = _rng_img(9, 120, 150, 256)
    data = encode_gif(img)
    assert np.array_equal(decode_gif(data), img)


def test_lzw_dictionary_full_reset_path():
    # worst-case incompressible stream at max palette → >4096 entries,
    # forcing the encoder's clear-reset and the decoder's re-init path
    img = _rng_img(11, 200, 220, 256)
    data = encode_gif(img)
    assert np.array_equal(decode_gif(data), img)


def test_flat_image_single_color():
    img = np.full((9, 9, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


# ------------------------------------------- decoder vs independent stream


def _uncompressed_gif(idx: np.ndarray, pal: np.ndarray) -> bytes:
    """Hand-assemble a GIF using the classic 'uncompressed LZW' trick:
    8-bit roots emitted at width 9 with a clear before the dictionary
    ever grows past 511 — a code layout my encoder never produces."""
    import struct

    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)
    padded = np.zeros((256, 3), dtype=np.uint8)
    padded[: len(pal)] = pal
    out += padded.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)  # min code size
    acc = 0
    nbits = 0
    body = bytearray()

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(256)  # clear
    for i, v in enumerate(idx.ravel().tolist()):
        if i and i % 100 == 0:
            put(256)  # re-clear long before width would grow
        put(v)
    put(257)  # EOI
    if nbits:
        body.append(acc & 0xFF)
    out += _sub_blocks(bytes(body))
    out.append(0x3B)
    return bytes(out)


def test_decode_independent_uncompressed_stream():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(17, 23)).astype(np.uint8)
    assert np.array_equal(decode_gif(_uncompressed_gif(idx, pal)), pal[idx])


def test_lzw_kwkwk_case():
    # 'aaaa...' forces code==next_code (KwKwK) immediately
    idx = np.zeros(50, dtype=np.uint8)
    data = _lzw_encode(idx, 2)
    assert np.array_equal(_lzw_decode(2, data, 50), idx)


def test_lzw_missing_eoi_tolerated():
    idx = np.arange(16, dtype=np.uint8) % 4
    data = _lzw_encode(idx, 2)
    # chop the EOI code's final byte — wild GIFs often truncate here
    assert np.array_equal(_lzw_decode(2, data[:-1], 16)[:15], idx[:15])


# ------------------------------------------------------------- animation


def test_animation_frames_disposal_keep():
    base = _rng_img(21, 12, 16, 8)
    f2 = base.copy()
    f2[3:6, 4:9] = [255, 0, 0]
    f3 = f2.copy()
    f3[0:2, 0:2] = [0, 255, 0]
    data = encode_gif_animation([base, f2, f3], delays=[5, 10, 15], loop=3)
    frames, delays, loop = decode_gif_frames(data)
    assert delays == [5, 10, 15] and loop == 3
    for got, want in zip(frames, [base, f2, f3]):
        assert np.array_equal(got, want)


def test_animation_delta_subrect_transparency():
    base = _rng_img(33, 20, 24, 6)
    f2 = base.copy()
    f2[7:12, 3:19] = [9, 9, 9]
    f3 = f2.copy()
    f3[0, 23] = [200, 100, 50]
    data = encode_gif_animation([base, f2, f3], delta=True)
    frames, _, _ = decode_gif_frames(data)
    for got, want in zip(frames, [base, f2, f3]):
        assert np.array_equal(got, want)


def test_animation_disposal_background_restore():
    pal_img = np.zeros((8, 8, 3), dtype=np.uint8)  # bg color = black idx0
    f1 = pal_img.copy()
    f1[2:5, 2:5] = [255, 255, 255]
    f2 = np.zeros((8, 8, 3), dtype=np.uint8)
    f2[0, 0] = [10, 20, 30]
    data = encode_gif_animation([f1, f2], disposals=[2, 1])
    frames, _, _ = decode_gif_frames(data)
    assert np.array_equal(frames[0], f1)
    # disposal 2 restored f1's rect to background before f2 painted
    assert np.array_equal(frames[1], f2)


def test_identical_consecutive_frames_delta():
    img = _rng_img(3, 10, 10, 4)
    data = encode_gif_animation([img, img.copy()], delta=True)
    frames, _, _ = decode_gif_frames(data)
    assert len(frames) == 2
    assert np.array_equal(frames[1], img)


# ------------------------------------------------------------- quantize


def test_quantize_small_palette_identity():
    img = _rng_img(7, 15, 15, 64)
    assert np.array_equal(quantize_median_cut(img, 256), img)


def test_quantize_rich_image_bounds_and_determinism():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    q1 = quantize_median_cut(img, 256)
    q2 = quantize_median_cut(img, 256)
    assert np.array_equal(q1, q2)
    packed = (
        q1[:, :, 0].astype(np.uint32) << 16
        | q1[:, :, 1].astype(np.uint32) << 8
        | q1[:, :, 2].astype(np.uint32)
    )
    assert len(np.unique(packed)) <= 256
    # mean color preserved within a channel step or so
    assert abs(float(q1.mean()) - float(img.mean())) < 4.0


def test_quantize_then_gif_is_lossless():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(30, 30, 3), dtype=np.uint8)
    q = quantize_median_cut(img)
    assert np.array_equal(decode_gif(encode_gif(q)), q)


# ---------------------------------------------------------- imagecodec seam


def test_imagecodec_sniffs_gif():
    img = _rng_img(29, 14, 14, 32)
    data = encode_gif(img)
    assert np.array_equal(imagecodec.decode(data), img)
    assert np.array_equal(imagecodec.decode(data, "gif"), img)


def test_imagecodec_encode_gif_matches_decoded():
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(25, 25, 3), dtype=np.uint8)
    data, dec = imagecodec.encode_with_decoded(img, "gif")
    assert np.array_equal(imagecodec.decode(data), dec)
    assert imagecodec.psnr(img, dec) > 25.0  # palette-lossy but sane


def test_imagecodec_encode_batch_gif_mixed():
    rng = np.random.default_rng(37)
    imgs = [rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8) for _ in range(3)]
    fmts = ["png", "gif", "jpeg"]
    datas, decs = imagecodec.encode_batch(imgs, fmts)
    for d, dec in zip(datas, decs):
        assert np.array_equal(imagecodec.decode(d), dec)


def test_malformed_gif_raises():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 10)
    with pytest.raises((ValueError, NotImplementedError)):
        imagecodec.decode(b"NOTANIMAGE")
