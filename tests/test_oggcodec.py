"""Ogg container + Ogg-FLAC mapping: page/packet round-trips across
lacing edges, CRC verification, a hand-assembled page, and the
decode_audio sniff seam."""

import struct

import numpy as np
import pytest

from crawlkit.audiocodec import decode_audio
from crawlkit.flaccodec import encode_flac, encode_flac_parts
from crawlkit.oggcodec import (
    decode_ogg_flac,
    encode_ogg_flac,
    ogg_crc,
    ogg_decode_packets,
    ogg_encode_packets,
)


def _pcm(seed: int, n: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(-12000, 12000, n).astype(np.int16)


# ------------------------------------------------------------ page layer


@pytest.mark.parametrize(
    "sizes",
    [[0], [1], [254], [255], [256], [510], [65025], [70000],
     [3, 0, 255, 1], [255] * 300],
)
def test_packet_roundtrip_lacing_edges(sizes):
    rng = np.random.default_rng(sum(sizes) + len(sizes))
    pk = [bytes(rng.integers(0, 256, s, dtype=np.uint8)) for s in sizes]
    assert ogg_decode_packets(ogg_encode_packets(pk)) == pk


def test_crc_is_oggs_direct_crc32():
    """Known-answer: the direct (non-reflected) CRC-32 of '123456789'
    with poly 0x04C11DB7, init 0, no final xor is 0x89A1897F."""
    assert ogg_crc(b"123456789") == 0x89A1897F


def test_corrupt_page_detected():
    blob = bytearray(ogg_encode_packets([b"hello ogg"]))
    blob[-1] ^= 0xFF  # flip a payload byte → CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        ogg_decode_packets(bytes(blob))
    with pytest.raises(ValueError, match="sync"):
        ogg_decode_packets(b"XggS" + bytes(blob[4:]))


def test_hand_assembled_page():
    """One page built field-by-field: BOS|EOS, two packets (3 + 2
    bytes), CRC computed over the zeroed-CRC image."""
    hdr = (
        b"OggS\x00\x06"
        + struct.pack("<q", 2)
        + struct.pack("<III", 7, 0, 0)
        + bytes([2, 3, 2])
    )
    body = b"abcde"
    crc = ogg_crc(hdr + body)
    page = hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body
    assert ogg_decode_packets(page) == [b"abc", b"de"]


def test_second_stream_serial_ignored():
    """Pages of a second logical stream interleave transparently."""
    a = ogg_encode_packets([b"first-stream"], serial=1)
    b = ogg_encode_packets([b"other"], serial=2)
    # interleave: all of a's pages, then b's (a's serial seen first)
    assert ogg_decode_packets(a + b) == [b"first-stream"]


# ------------------------------------------------------- Ogg-FLAC mapping


@pytest.mark.parametrize("n", [1, 100, 4096, 9000, 20000])
def test_ogg_flac_roundtrip_mono(n):
    x = _pcm(n, n)
    out, rate = decode_ogg_flac(encode_ogg_flac(x, 16000))
    assert rate == 16000 and np.array_equal(out.ravel(), x)


def test_ogg_flac_roundtrip_stereo_decorrelated():
    x = _pcm(3, 9000)
    st = np.stack([x, x // 3], axis=1).astype(np.int16)
    for mode in ("independent", "left-side", "mid-side"):
        out, rate = decode_ogg_flac(encode_ogg_flac(st, 8000, stereo_mode=mode))
        assert np.array_equal(out, st), mode


def test_parts_join_is_encode_flac():
    x = _pcm(4, 12345)
    h, frames = encode_flac_parts(x, 12000)
    assert h + b"".join(frames) == encode_flac(x, 12000)
    assert len(frames) == (12345 + 4095) // 4096


def test_decode_audio_sniffs_ogg():
    x = _pcm(5, 6000)
    out, rate = decode_audio(encode_ogg_flac(x, 12000))
    assert rate == 12000 and np.array_equal(out.ravel(), x)


def test_ogg_flac_mapping_conformance():
    """Emitted streams follow the Xiph mapping: header count 1, a
    VORBIS_COMMENT header packet, STREAMINFO last-metadata flag clear."""
    x = _pcm(7, 5000)
    pk = ogg_decode_packets(encode_ogg_flac(x, 16000))
    p0 = pk[0]
    assert p0[:5] == b"\x7fFLAC" and p0[5:7] == b"\x01\x00"
    (nheaders,) = struct.unpack_from(">H", p0, 7)
    assert nheaders == 1
    assert p0[9:13] == b"fLaC"
    assert p0[13] == 0x00  # STREAMINFO block header: last flag CLEAR, type 0
    assert pk[1][0] == 0x84  # VORBIS_COMMENT block, last flag SET
    from crawlkit.audiometa import parse_vorbis_comment

    vendor, comments = parse_vorbis_comment(pk[1][4:])
    assert vendor == "crawlkit" and comments == {}


def test_ogg_flac_legacy_nheaders0_decodes():
    """Self-produced pre-conformance streams (nheaders=0, STREAMINFO
    last flag set, no VORBIS_COMMENT packet) still decode."""
    x = _pcm(8, 7000)
    h, frames = encode_flac_parts(x, 16000)
    first = b"\x7fFLAC\x01\x00" + struct.pack(">H", 0) + h
    granules = [0] + [min((i + 1) * 4096, 7000) for i in range(len(frames))]
    blob = ogg_encode_packets([first] + frames, granules=granules)
    out, rate = decode_ogg_flac(blob)
    assert rate == 16000 and np.array_equal(out.ravel(), x)


def test_ogg_flac_bogus_header_count_rejected():
    x = _pcm(9, 2000)
    h, frames = encode_flac_parts(x, 16000)
    first = b"\x7fFLAC\x01\x00" + struct.pack(">H", 999) + h
    blob = ogg_encode_packets([first] + frames)
    with pytest.raises(ValueError, match="header count"):
        decode_ogg_flac(blob)


def test_truncation_never_crashes():
    blob = encode_ogg_flac(_pcm(6, 15000), 16000)
    for cut in (3, 20, 27, len(blob) // 2, len(blob) - 4):
        try:
            decode_ogg_flac(blob[:cut])
        except ValueError:
            pass
