"""TIFF codec: PackBits/LZW/predictor/strip decode pinned by
round-trips, hand-assembled streams (bit order, early change, byte
orders, photometrics), and the imagecodec seam (sniffed decode)."""

import struct

import numpy as np
import pytest

from crawlkit import imagecodec
from crawlkit.tiffcodec import (
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)


def _rng_img(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------- PackBits


@pytest.mark.parametrize("n", [0, 1, 2, 3, 127, 128, 129, 1000])
def test_packbits_roundtrip_sizes(n):
    rng = np.random.default_rng(n)
    for hi in (2, 5, 256):  # runs common → rare
        data = bytes(rng.integers(0, hi, n, dtype=np.uint8))
        assert packbits_decode(packbits_encode(data), n) == data


def test_packbits_decode_spec_cases():
    # literal run: control 2 → 3 literals
    assert packbits_decode(b"\x02abc", 3) == b"abc"
    # repeat run: control 0xFE (257-254=3) → b'x'*3
    assert packbits_decode(b"\xfex", 3) == b"xxx"
    # -128 control byte is a no-op
    assert packbits_decode(b"\x80\x00a", 1) == b"a"


def test_packbits_long_runs_split_at_128():
    data = b"z" * 500
    enc = packbits_encode(data)
    assert packbits_decode(enc, 500) == data
    assert len(enc) <= 2 * ((500 + 127) // 128)


# ---------------------------------------------------------- TIFF-LZW core


def test_lzw_bit_order_fixture():
    """Hand-assembled 9-bit MSB-first stream: Clear(256), 'A'(65),
    EOI(257) — pins code numbering and bit packing independently of
    the encoder."""
    bits = "100000000" + "001000001" + "100000001"
    bits += "0" * (-len(bits) % 8)
    fix = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert lzw_decode(fix, 1) == b"A"
    # and the encoder produces exactly this minimal stream
    assert lzw_encode(b"A") == fix


def test_lzw_kwkwk_case():
    """'ababab…' exercises the code==len(table) (KwKwK) branch."""
    data = b"ab" * 40
    assert lzw_decode(lzw_encode(data), len(data)) == data


@pytest.mark.parametrize("n", [0, 1, 700, 3000, 80000, 200000])
def test_lzw_roundtrip_widths(n):
    """Streams long enough to cross the 9→10→11→12 early-change
    boundaries (≈253/765/1789 new entries) and, at 200k low-entropy
    bytes, a 4094-entry table reset."""
    rng = np.random.default_rng(n)
    data = bytes(rng.integers(0, 256 if n < 3000 else 6, max(n, 1), dtype=np.uint8))[:n]
    assert lzw_decode(lzw_encode(data), n) == data


def test_lzw_early_change_exact_position():
    """Byte-exact pin of the 9→10 early change. For data
    bytes(range(256)) + b'\\x00' every consecutive pair is novel, so
    the emitted code sequence is exactly Clear, 0, 1, …, 255, 0, EOI
    with an entry added after each of the 256 in-loop emissions
    (ids 258…513). next_id hits 511 = 2^9-1 after the 253rd data code,
    so data codes 1–253 (values 0–252) are 9-bit and codes 254–257
    (values 253, 254, 255, 0) plus EOI are 10-bit — one code EARLIER
    than a non-TIFF (late-change) encoder would switch. The expected
    stream is assembled here independently, bit by bit."""
    data = bytes(range(256)) + b"\x00"
    values = [256] + list(range(256)) + [0, 257]  # Clear, data…, EOI
    widths = [9] * 254 + [10] * 5  # Clear + 253 codes, then 4 + EOI
    assert len(values) == len(widths)
    bits = "".join(format(v, f"0{w}b") for v, w in zip(values, widths))
    bits += "0" * (-len(bits) % 8)
    expected = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert lzw_encode(data) == expected
    assert lzw_decode(expected, len(data)) == data


# ------------------------------------------------------------ RGB streams


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("pred", [1, 2])
def test_tiff_rgb_roundtrip(comp, pred):
    for shape in ((1, 1), (5, 7), (33, 101), (64, 48)):
        px = _rng_img(shape[0] * 100 + shape[1], *shape)
        out = decode_tiff(encode_tiff(px, compression=comp, predictor=pred))
        assert np.array_equal(out, px), (comp, pred, shape)


def test_tiff_multi_strip():
    px = _rng_img(5, 70, 23)
    for rps in (1, 7, 32, 70, 100):
        blob = encode_tiff(px, compression="lzw", predictor=2, rows_per_strip=rps)
        assert np.array_equal(decode_tiff(blob), px)


def test_tiff_sniffed_through_imagecodec():
    px = _rng_img(11, 40, 52)
    blob = imagecodec.encode(px, "tiff")
    assert blob[:4] == b"II\x2a\x00"
    assert np.array_equal(imagecodec.decode(blob), px)
    data, dec = imagecodec.encode_with_decoded(px, "tiff")
    assert data == blob and np.array_equal(dec, px)


# ------------------------------------- hand-built foreign-shape streams


def _build_tiff(e: str, tags: list[tuple[int, int, list[int]]], data: bytes,
                data_off: int) -> bytes:
    """Minimal single-IFD builder for shapes our writer never emits
    (big-endian, grayscale, palette). All tag values must pack ≤4 B."""
    fmt = {3: "H", 4: "I"}
    hdr = (b"MM\x00\x2a" if e == ">" else b"II\x2a\x00") + struct.pack(e + "I", 8)
    body = struct.pack(e + "H", len(tags))
    for tag, typ, vals in tags:
        val = struct.pack(e + str(len(vals)) + fmt[typ], *vals).ljust(4, b"\x00")
        body += struct.pack(e + "HHI", tag, typ, len(vals)) + val
    body += struct.pack(e + "I", 0)
    blob = hdr + body
    assert len(blob) <= data_off
    return blob + b"\x00" * (data_off - len(blob)) + data


def test_tiff_big_endian_gray():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    blob = _build_tiff(
        ">",
        [(256, 4, [4]), (257, 4, [3]), (258, 3, [8]), (259, 3, [1]),
         (262, 3, [1]), (273, 4, [200]), (277, 3, [1]), (278, 4, [3]),
         (279, 4, [12])],
        g.tobytes(), 200,
    )
    out = decode_tiff(blob)
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_tiff_white_is_zero():
    g = np.array([[0, 128], [255, 1]], dtype=np.uint8)
    blob = _build_tiff(
        "<",
        [(256, 4, [2]), (257, 4, [2]), (258, 3, [8]), (259, 3, [1]),
         (262, 3, [0]), (273, 4, [200]), (277, 3, [1]), (278, 4, [2]),
         (279, 4, [4])],
        g.tobytes(), 200,
    )
    assert np.array_equal(decode_tiff(blob)[:, :, 0], 255 - g)


def test_tiff_palette():
    # 2×2 indices into a 256-entry colormap (SHORT values, 257×8-bit)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    pal8 = np.zeros((256, 3), dtype=np.uint8)
    pal8[:4] = [[10, 20, 30], [40, 50, 60], [70, 80, 90], [200, 210, 220]]
    cmap16 = (pal8.T.astype(np.uint32) * 257).flatten()  # RRR…GGG…BBB…
    e = "<"
    hdr = b"II\x2a\x00" + struct.pack("<I", 8)
    tags = [(256, 4, [2]), (257, 4, [2]), (258, 3, [8]), (259, 3, [1]),
            (262, 3, [3]), (273, 4, [2000]), (277, 3, [1]), (278, 4, [2]),
            (279, 4, [4]), (320, 3, None)]
    body = struct.pack(e + "H", len(tags))
    cmap_off = 1000
    for tag, typ, vals in tags:
        if tag == 320:
            body += struct.pack(e + "HHI", tag, typ, len(cmap16)) + struct.pack(
                e + "I", cmap_off
            )
        else:
            val = struct.pack(
                e + str(len(vals)) + {3: "H", 4: "I"}[typ], *vals
            ).ljust(4, b"\x00")
            body += struct.pack(e + "HHI", tag, typ, len(vals)) + val
    body += struct.pack(e + "I", 0)
    blob = bytearray((hdr + body).ljust(2000 + 4, b"\x00"))
    blob[cmap_off : cmap_off + len(cmap16) * 2] = struct.pack(
        e + str(len(cmap16)) + "H", *cmap16
    )
    blob[2000:2004] = idx.tobytes()
    assert np.array_equal(decode_tiff(bytes(blob)), pal8[idx])


# -------------------------------------------------------------- bad input


def test_tiff_rejects_garbage_and_truncation():
    px = _rng_img(3, 20, 20)
    blob = encode_tiff(px, compression="lzw", predictor=2)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_tiff(b"XX" + blob[2:])
    # truncations must raise or return an image, never crash the process
    for cut in (4, 9, 30, len(blob) // 2, len(blob) - 3):
        try:
            out = decode_tiff(blob[:cut])
            assert out.shape == (20, 20, 3)
        except (ValueError, NotImplementedError, KeyError, struct.error,
                IndexError):
            pass
