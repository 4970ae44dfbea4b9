"""ISO-BMFF (MP4/MOV) mux/demux: round-trips per sample codec, the
box-walk contract (largesize, fixed stsz, co64, foreign fourcc), the
decode_video sniff seam, and truncation behavior."""

import struct

import numpy as np
import pytest

from crawlkit import jpegcodec
from crawlkit.mp4codec import _box, _full, mp4_decode, mp4_encode
from crawlkit.videocodec import avi_encode, decode_video


def _frames(seed: int, n: int, h: int = 24, w: int = 32):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_raw_roundtrip_exact():
    fr = _frames(1, 6)
    out, fps = mp4_decode(mp4_encode(fr, fps=24, codec="raw"))
    assert fps == 24 and len(out) == 6
    for a, b in zip(out, fr):
        assert np.array_equal(a, b)


def test_mjpeg_matches_per_frame_jpeg():
    fr = _frames(2, 4)
    out, fps = mp4_decode(mp4_encode(fr, fps=10, codec="mjpeg"))
    assert fps == 10
    expected = [jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(f)) for f in fr]
    for a, b in zip(out, expected):
        assert np.array_equal(a, b)


def test_single_frame_and_odd_dims():
    fr = _frames(3, 1, h=17, w=31)
    out, _ = mp4_decode(mp4_encode(fr, codec="raw"))
    assert len(out) == 1 and np.array_equal(out[0], fr[0])


def test_decode_video_sniffs_both_containers():
    fr = _frames(4, 3)
    avi = avi_encode(fr, fps=10, codec="raw")
    mp4 = mp4_encode(fr, fps=10, codec="raw")
    for blob in (avi, mp4):
        frames, fps = decode_video(blob)
        assert len(frames) == 3 and np.array_equal(frames[0], fr[0])
    with pytest.raises(ValueError):
        decode_video(b"\x00" * 64)


def test_foreign_fourcc_is_the_documented_seam():
    """An avc1 (h264) track demuxes fine but decode names the missing
    codec — the out-of-sandbox swap point, not a silent wrong answer."""
    blob = bytearray(mp4_encode(_frames(5, 2), codec="mjpeg"))
    idx = blob.find(b"jpeg", 16)  # sample-entry fourcc inside stsd
    assert idx > 0
    blob[idx : idx + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4_decode(bytes(blob))


def test_fixed_stsz_and_co64_paths():
    """Hand-assembled variant: fixed-size stsz and a co64 (64-bit)
    chunk-offset table — shapes real muxers emit that ours doesn't."""
    fr = _frames(6, 3, h=8, w=8)
    samples = [np.ascontiguousarray(f).tobytes() for f in fr]
    sz = len(samples[0])
    ftyp = _box("ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    mdat = _box("mdat", b"".join(samples))
    off = len(ftyp) + 8
    entry = _box(
        "raw ",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 8, 8) + b"\x00" * 46,
    )
    stbl = _box(
        "stbl",
        _full("stsd", 0, 0, struct.pack(">I", 1) + entry)
        + _full("stts", 0, 0, struct.pack(">III", 1, 3, 1))
        + _full("stsc", 0, 0, struct.pack(">IIII", 1, 1, 3, 1))
        + _full("stsz", 0, 0, struct.pack(">II", sz, 3))  # fixed size
        + _full("co64", 0, 0, struct.pack(">IQ", 1, off)),
    )
    minf = _box("minf", stbl)
    hdlr = _full("hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 13)
    mdhd = _full("mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 15, 3, 0x55C4, 0))
    moov = _box("moov", _box("trak", _box("mdia", mdhd + hdlr + minf)))
    frames, fps = mp4_decode(ftyp + mdat + moov)
    assert fps == 15 and len(frames) == 3
    for a, b in zip(frames, fr):
        assert np.array_equal(a, b)


def test_largesize_box():
    """A 64-bit largesize mdat (size field == 1) still demuxes."""
    blob = bytearray(mp4_encode(_frames(7, 2, h=8, w=8), codec="raw"))
    # find mdat and rewrite as largesize: insert 8 bytes, patch stco
    pos = 0
    while True:
        size, typ = struct.unpack_from(">I4s", blob, pos)
        if typ == b"mdat":
            break
        pos += size
    payload = bytes(blob[pos + 8 : pos + size])
    big = struct.pack(">I4sQ", 1, b"mdat", 16 + len(payload)) + payload
    out = bytearray(bytes(blob[:pos]) + big + bytes(blob[pos + size :]))
    # stco offsets shifted by +8 for data after the header swap
    sidx = out.find(b"stco")
    (n,) = struct.unpack_from(">I", out, sidx + 8)
    for i in range(n):
        o = sidx + 12 + 4 * i
        (v,) = struct.unpack_from(">I", out, o)
        struct.pack_into(">I", out, o, v + 8)
    frames, _ = mp4_decode(bytes(out))
    assert len(frames) == 2


def test_truncation_never_crashes():
    blob = mp4_encode(_frames(8, 3), codec="mjpeg")
    for cut in (3, 8, 30, len(blob) // 3, len(blob) - 5):
        try:
            mp4_decode(blob[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_foreign_fourcc_row_becomes_error_row():
    """A sample codec we can't decode (avc1) must produce the T4
    error row (frame_idx = -1), not crash the stage."""
    import pyarrow as pa

    from crawlkit.pipelines.multimodal import VideoSceneCuts

    good = mp4_encode(_frames(9, 3), codec="mjpeg")
    bad = bytearray(good)
    idx = bad.find(b"jpeg", 16)
    bad[idx : idx + 4] = b"avc1"
    t = pa.table({"video_id": ["ok", "h264"], "bytes": [good, bytes(bad)]})
    out = VideoSceneCuts()(t).to_pydict()
    by_vid = {}
    for vid, fi in zip(out["video_id"], out["frame_idx"]):
        by_vid.setdefault(vid, []).append(fi)
    assert by_vid["h264"] == [-1]
    assert all(fi >= 1 for fi in by_vid["ok"])


def test_corrupt_sample_bytes_raise_valueerror_only():
    """Corrupt MJPEG sample headers must surface as ValueError (the
    error contract VideoSceneCuts / SigExplode rely on), never
    struct.error / KeyError / IndexError — fuzzed over 400 seeds."""
    fr = _frames(21, 3, h=16, w=16)
    base = mp4_encode(fr, codec="mjpeg")
    soi = base.find(b"\xff\xd8\xff")
    for seed in range(400):
        r = np.random.default_rng(seed)
        blob = bytearray(base)
        for _ in range(3):
            p = soi + int(r.integers(2, 120))
            blob[p] = int(r.integers(0, 256))
        try:
            mp4_decode(bytes(blob))
        except (ValueError, NotImplementedError):
            pass  # the contract
