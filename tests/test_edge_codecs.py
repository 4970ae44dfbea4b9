"""Adversarial edge pass over the round-4 codec surface (the
edge-oracle-harness methodology applied where DuckDB can't follow):
truncated TIFF strips, EXIF with absent GPS / truncated IFDs, Ogg
continuation pages (packets spanning page boundaries), VORBIS_COMMENT
malformed/unicode entries, and mixed-container batches through the
scrub/feature stages — every case asserts either an exact independent
recompute or the ValueError/NotImplementedError + T4-error-row
contract the stages rely on."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from crawlkit import (
    audiocodec,
    audiometa,
    exifmeta,
    flaccodec,
    imagecodec,
    jpegcodec,
    oggcodec,
    tiffcodec,
)


def _px(seed: int = 1, h: int = 40, w: int = 56) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _pcm(seed: int, n: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(-12000, 12000, n).astype(np.int16)


# ------------------------------------------------------------- TIFF strips


@pytest.mark.parametrize("compression,predictor", [
    ("none", 1), ("packbits", 1), ("lzw", 1), ("lzw", 2),
])
def test_truncated_tiff_strips_raise_valueerror(compression, predictor):
    """Cutting inside strip DATA (after the IFD parses) must raise
    ValueError, never struct.error/IndexError — per strip variant."""
    blob = tiffcodec.encode_tiff(
        _px(3), compression=compression, predictor=predictor, rows_per_strip=8
    )
    assert np.array_equal(tiffcodec.decode_tiff(blob), _px(3))  # sanity
    for cut in (9, 30, len(blob) // 4, len(blob) // 2, len(blob) - 7):
        try:
            tiffcodec.decode_tiff(blob[:cut])
        except (ValueError, NotImplementedError):
            pass  # the contract; anything else propagates and fails


def test_tiff_zero_length_and_swapped_byteorder():
    with pytest.raises(ValueError):
        tiffcodec.decode_tiff(b"")
    blob = tiffcodec.encode_tiff(_px(4), compression="none")
    # flip the byte-order mark II -> MM without fixing the integers:
    # must error out cleanly, not return garbage pixels silently
    broken = b"MM" + blob[2:]
    with pytest.raises((ValueError, NotImplementedError)):
        tiffcodec.decode_tiff(broken)


# ----------------------------------------------------- EXIF absent-GPS edges


FIELDS = {"make": "CamCo1", "model": "M-7", "orientation": 3,
          "datetime": "2025:01:02 03:04:05"}
GPS = ("N", [(10, 1), (20, 1), (30000, 1000)], "E", [(40, 1), (50, 1), (9000, 1000)])


def test_gps_only_scrub_without_gps_preserves_camera_fields_and_pixels():
    """gps_only scrub of EXIF that HAS no GPS: camera fields survive
    the rebuild, pixels byte-identical, had-gps stays false on
    re-extract — the absent-GPS branch of the release gate."""
    base = jpegcodec.encode_jpeg(_px(5))
    tagged = exifmeta.exif_inject(base, FIELDS)
    scrubbed = exifmeta.exif_strip(tagged, gps_only=True)
    got = exifmeta.exif_extract(scrubbed)
    assert got["make"] == FIELDS["make"] and got["model"] == FIELDS["model"]
    assert got["orientation"] == FIELDS["orientation"]
    assert "gps" not in got
    assert np.array_equal(
        jpegcodec.decode_jpeg(scrubbed), jpegcodec.decode_jpeg(base)
    )


def test_gps_only_scrub_is_idempotent():
    tagged = exifmeta.exif_inject(jpegcodec.encode_jpeg(_px(6)), {**FIELDS, "gps": GPS})
    once = exifmeta.exif_strip(tagged, gps_only=True)
    assert exifmeta.exif_strip(once, gps_only=True) == once


def test_exif_scrub_stage_mixed_batch_absent_gps_and_truncation():
    """One batch mixing: EXIF-with-GPS, EXIF-without-GPS, no EXIF at
    all, truncated GPS sub-IFD — each row lands in its own contract
    branch, none crashes the stage."""
    from crawlkit.pipelines.multimodal import ImageExifScrub

    with_gps = exifmeta.exif_inject(jpegcodec.encode_jpeg(_px(7)), {**FIELDS, "gps": GPS})
    no_gps = exifmeta.exif_inject(jpegcodec.encode_jpeg(_px(8)), FIELDS)
    plain = jpegcodec.encode_jpeg(_px(9))
    # corrupt the GPS pointer: point tag 0x8825's value past the buffer
    trunc = bytearray(with_gps)
    app1 = trunc.find(b"\xff\xe1")
    gps_tag = bytes(trunc).find(struct.pack("<H", 0x8825), app1)
    assert gps_tag > 0
    trunc[gps_tag + 8 : gps_tag + 12] = struct.pack("<I", 2**24)  # far offset
    t = pa.table(
        {
            "image_id": ["gps", "nogps", "plain", "trunc"],
            "fmt": ["jpeg"] * 4,
            "bytes": [with_gps, no_gps, plain, bytes(trunc)],
        }
    )
    rows = {r["image_id"]: r for r in ImageExifScrub(mode="gps_only")(t).to_pylist()}
    assert rows["gps"]["had_gps"] and rows["gps"]["lat_milli_arcsec"] != 0
    assert not rows["nogps"]["had_gps"] and rows["nogps"]["make"] == FIELDS["make"]
    assert rows["plain"]["orientation"] == 0 and rows["plain"]["bytes"] == plain
    assert rows["trunc"]["orientation"] == -1  # sentinel, bytes untouched
    assert rows["trunc"]["bytes"] == bytes(trunc)


# ------------------------------------------- Ogg continuation-page edges


def test_ogg_flac_packets_spanning_pages_roundtrip():
    """Frames bigger than one Ogg page (255 lacing segments ≈ 65 KB)
    force continuation pages mid-packet; the reassembled stream must
    stay sample-exact."""
    x = _pcm(11, 100_000)
    blob = oggcodec.encode_ogg_flac(x, 16000, blocksize=32768, subframe="verbatim")
    # prove the fixture really exercises continuation: some page after
    # the first carries the continued-packet flag (0x01)
    flags, pos = [], 0
    while pos + 27 <= len(blob):
        assert blob[pos : pos + 4] == b"OggS"
        flags.append(blob[pos + 5])
        nsegs = blob[pos + 26]
        lacing = blob[pos + 27 : pos + 27 + nsegs]
        pos += 27 + nsegs + sum(lacing)
    assert any(f & 0x01 for f in flags[1:]), "fixture never spanned a page"
    out, rate = oggcodec.decode_ogg_flac(blob)
    assert rate == 16000 and np.array_equal(out.ravel(), x)


def test_ogg_truncation_mid_continuation_detected():
    x = _pcm(12, 100_000)
    blob = oggcodec.encode_ogg_flac(x, 16000, blocksize=32768, subframe="verbatim")
    # drop the final page: the stream now ends mid-packet or mid-chain
    last = blob.rfind(b"OggS")
    assert last > 0
    with pytest.raises(ValueError):
        oggcodec.decode_ogg_flac(blob[:last])


def test_ogg_interleaved_second_stream_with_continuations():
    """A second logical stream's pages interleaved between the first
    stream's continuation pages must be skipped transparently."""
    x = _pcm(13, 120_000)
    a = oggcodec.encode_ogg_flac(x, 16000, blocksize=32768, subframe="verbatim")
    b = oggcodec.ogg_encode_packets([b"other-stream-payload"], serial=0x0DD)
    # walk the page structure (payload bytes may contain 'OggS'; only
    # header offsets count) and splice stream b between pages 2 and 3 —
    # i.e. mid-continuation of one of a's spanning packets
    idx, pos = [], 0
    while pos + 27 <= len(a):
        assert a[pos : pos + 4] == b"OggS"
        idx.append(pos)
        nsegs = a[pos + 26]
        pos += 27 + nsegs + sum(a[pos + 27 : pos + 27 + nsegs])
    assert len(idx) >= 3
    spliced = a[: idx[2]] + b + a[idx[2] :]
    out, rate = oggcodec.decode_ogg_flac(spliced)
    assert rate == 16000 and np.array_equal(out.ravel(), x)


# ------------------------------------------- VORBIS_COMMENT scrub edges


def test_vorbis_comment_unicode_empty_and_multivalue():
    x = _pcm(14, 3000)
    tagged = audiometa.flac_comments_inject(
        flaccodec.encode_flac(x, 8000),
        "vend🎵r",
        {"TITLE": "Grüße=мир", "ARTIST": ["a", "b"], "EMPTY": ""},
    )
    vendor, comments = audiometa.flac_comments_extract(tagged)
    assert vendor == "vend🎵r"
    assert comments["TITLE"] == ["Grüße=мир"]  # '=' splits on FIRST only
    assert comments["ARTIST"] == ["a", "b"]
    assert comments["EMPTY"] == [""]
    # strip is case-insensitive and keeps the rest
    stripped = audiometa.flac_comments_strip(tagged, keys=["artist"])
    _, after = audiometa.flac_comments_extract(stripped)
    assert "ARTIST" not in after and after["TITLE"] == ["Grüße=мир"]
    out, rate = flaccodec.decode_flac(stripped)
    assert np.array_equal(out.ravel(), x) and rate == 8000


def test_vorbis_comment_malformed_entries_contract():
    """Pin the malformed-entry contract: an entry with no '=' parses
    LENIENTLY (key with empty value — real crawled tags contain these),
    while a TRUNCATED entry raises ValueError (the error the scrub
    stage catches)."""
    body = bytearray(audiometa.build_vorbis_comment("v", {"GOOD": "x"}))
    bad = b"no-equals-here"
    body += struct.pack("<I", len(bad)) + bad
    cnt_off = 4 + struct.unpack_from("<I", body, 0)[0]
    n = struct.unpack_from("<I", body, cnt_off)[0]
    body[cnt_off : cnt_off + 4] = struct.pack("<I", n + 1)
    _, comments = audiometa.parse_vorbis_comment(bytes(body))
    assert comments["NO-EQUALS-HERE"] == [""] and comments["GOOD"] == ["x"]
    with pytest.raises(ValueError):
        audiometa.parse_vorbis_comment(bytes(body[:-4]))  # cut inside entry


def test_audio_tags_scrub_mixed_container_batch():
    """FLAC-with-tags, WAV (no comment layer), Ogg-FLAC, truncated
    FLAC in ONE batch: per-row contract, no stage crash."""
    from crawlkit.pipelines.multimodal import AudioTagsScrub

    x = _pcm(15, 4000)
    tagged = audiometa.flac_comments_inject(
        flaccodec.encode_flac(x, 16000), "v", {"TITLE": "t", "LOCATION": "pii"}
    )
    wav = audiocodec.wav_encode(x, 16000)
    ogg = oggcodec.encode_ogg_flac(x, 16000)
    t = pa.table(
        {
            "audio_id": ["flac", "wav", "ogg", "trunc"],
            "bytes": [tagged, wav, ogg, tagged[:50]],
        }
    )
    rows = {r["audio_id"]: r for r in AudioTagsScrub()(t).to_pylist()}
    assert rows["flac"]["title"] == "t" and rows["flac"]["had_pii"]
    # scrubbed flac still decodes to the same samples
    out, _ = audiocodec.decode_audio(rows["flac"]["bytes"])
    assert np.array_equal(out.ravel(), x)
    for name in ("wav", "ogg", "trunc"):
        assert not rows[name]["had_pii"]
        assert rows[name]["bytes"] == t["bytes"][list(t["audio_id"].to_pylist()).index(name)].as_py()


# ------------------------------------------- mixed image batch + features


def test_image_features_mixed_formats_agree_on_identical_pixels():
    """The SAME pixels via png/bmp/tiff produce IDENTICAL feature rows
    (lossless paths must agree bit-for-bit through the stage)."""
    from crawlkit.pipelines.multimodal import ImageFeatures

    px = _px(16, 32, 48)
    t = pa.table(
        {
            "image_id": ["png", "bmp", "tiff"],
            "fmt": ["png", "bmp", "tiff"],
            "bytes": [
                imagecodec.encode_png(px),
                imagecodec.encode(px, "bmp"),
                tiffcodec.encode_tiff(px, compression="lzw", predictor=2),
            ],
        }
    )
    rows = ImageFeatures()(t).to_pylist()
    ref = {k: v for k, v in rows[0].items() if k not in ("image_id", "fmt")}
    for r in rows[1:]:
        assert {k: v for k, v in r.items() if k not in ("image_id", "fmt")} == ref
