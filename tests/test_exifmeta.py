"""EXIF (TIFF-IFD-in-APP1) metadata: build/parse round-trip, JPEG
segment surgery with pixel invariance, GPS scrub, and the corpus
pipeline."""

import numpy as np
import pytest

from crawlkit import exifmeta, imagecodec, jpegcodec

FIELDS = {
    "make": "CamCo3",
    "model": "M-42",
    "orientation": 6,
    "datetime": "2025:03:14 15:09:26",
}
GPS = ("N", [(37, 1), (46, 1), (29500, 1000)], "W", [(122, 1), (25, 1), (9800, 1000)])


def _jpeg(seed: int = 1) -> bytes:
    rng = np.random.default_rng(seed)
    return jpegcodec.encode_jpeg(rng.integers(0, 256, (40, 56, 3), dtype=np.uint8))


def test_build_parse_roundtrip():
    for fields in (FIELDS, {**FIELDS, "gps": GPS}, {"orientation": 1}):
        out = exifmeta.parse_exif(exifmeta.build_exif(fields))
        for k, v in fields.items():
            if k == "gps":
                expected = (v[0], [tuple(r) for r in v[1]],
                            v[2], [tuple(r) for r in v[3]])
                assert out[k] == expected
            else:
                assert out[k] == v, k


def test_inject_extract_and_pixels_untouched():
    blob = _jpeg()
    base = jpegcodec.decode_jpeg(blob)
    tagged = exifmeta.exif_inject(blob, {**FIELDS, "gps": GPS})
    got = exifmeta.exif_extract(tagged)
    assert got["make"] == "CamCo3" and got["orientation"] == 6
    assert got["gps"][0] == "N" and got["gps"][1][0] == (37, 1)
    assert np.array_equal(jpegcodec.decode_jpeg(tagged), base)
    # re-inject replaces, not duplicates
    again = exifmeta.exif_inject(tagged, {"make": "Other"})
    assert exifmeta.exif_extract(again)["make"] == "Other"
    assert again.count(b"Exif\x00\x00") == 1


def test_strip_gps_only_keeps_camera_fields():
    tagged = exifmeta.exif_inject(_jpeg(2), {**FIELDS, "gps": GPS})
    scrubbed = exifmeta.exif_strip(tagged, gps_only=True)
    got = exifmeta.exif_extract(scrubbed)
    assert got is not None and "gps" not in got
    assert got["make"] == "CamCo3" and got["model"] == "M-42"
    assert np.array_equal(
        jpegcodec.decode_jpeg(scrubbed), jpegcodec.decode_jpeg(tagged)
    )


def test_strip_full_removes_app1():
    tagged = exifmeta.exif_inject(_jpeg(3), FIELDS)
    bare = exifmeta.exif_strip(tagged)
    assert exifmeta.exif_extract(bare) is None
    assert b"Exif\x00\x00" not in bare
    assert np.array_equal(jpegcodec.decode_jpeg(bare), jpegcodec.decode_jpeg(tagged))


def test_extract_none_on_plain_jpeg_and_bad_input():
    assert exifmeta.exif_extract(_jpeg(4)) is None
    with pytest.raises(ValueError):
        exifmeta.exif_extract(b"not a jpeg")
    with pytest.raises(ValueError):
        exifmeta.parse_exif(b"Exif\x00\x00garbage!!")


def test_exif_scrub_pipeline(ray_session):
    from crawlkit.pipelines import multimodal

    corpus = multimodal.synthetic_images_exif(n=24).to_pandas()
    out = multimodal.image_exif_scrub(n=24).to_pandas().set_index("image_id")
    assert len(out) == 24
    jpeg_rows = corpus[corpus["fmt"] == "jpeg"]
    assert len(jpeg_rows) > 0
    saw_gps = 0
    for _, row in corpus.iterrows():
        o = out.loc[row["image_id"]]
        if row["fmt"] != "jpeg":
            assert o["orientation"] == 0 and bytes(o["bytes"]) == bytes(row["bytes"])
            continue
        assert 1 <= o["orientation"] <= 8 and o["make"].startswith("CamCo")
        scrubbed = bytes(o["bytes"])
        re_ext = exifmeta.exif_extract(scrubbed)
        assert re_ext is not None and "gps" not in re_ext
        if o["had_gps"]:
            saw_gps += 1
            assert o["lat_milli_arcsec"] != 0 or o["lon_milli_arcsec"] != 0
        # pixels byte-identical to the tagged source
        assert np.array_equal(
            imagecodec.decode(scrubbed), imagecodec.decode(bytes(row["bytes"]))
        )
    assert saw_gps > 0


# ----------------------------------------------- malformed-input contract


def test_parse_exif_truncated_raises_valueerror():
    """Truncated IFDs surface as ValueError (never struct.error) — the
    error contract the scrub stages rely on."""
    payload = exifmeta.build_exif({**FIELDS, "gps": GPS})
    for cut in (10, 14, 20, len(payload) // 2, len(payload) - 3):
        try:
            exifmeta.parse_exif(payload[:cut])
        except ValueError:
            pass  # expected flavor
        # anything else (struct.error, IndexError) propagates and fails


def test_exif_scrub_stage_survives_malformed_rows():
    """ImageExifScrub emits a pass-through sentinel row (orientation
    -1, original bytes) for rows whose EXIF is truncated or whose
    make/model is non-ASCII, instead of crashing the batch."""
    import pyarrow as pa

    from crawlkit.pipelines.multimodal import EXIF_SCRUB_SCHEMA, ImageExifScrub

    good = exifmeta.exif_inject(_jpeg(11), {**FIELDS, "gps": GPS})
    # truncate the APP1 payload in place: shrink the segment length so
    # the TIFF body is cut mid-IFD but the JPEG marker walk stays valid
    tagged = bytearray(exifmeta.exif_inject(_jpeg(12), FIELDS))
    app1 = tagged.find(b"\xff\xe1")
    assert app1 >= 0
    ln = int.from_bytes(tagged[app1 + 2 : app1 + 4], "big")
    keep = 26  # length bytes + 'Exif\0\0' + TIFF header + partial IFD
    bad = bytes(tagged[: app1 + 2]) + keep.to_bytes(2, "big") + bytes(
        tagged[app1 + 4 : app1 + 2 + keep]
    ) + bytes(tagged[app1 + 2 + ln :])
    # non-ASCII make bytes (as real crawled EXIF carries): extract
    # decodes them with 'replace' → U+FFFD, which breaks the gps_only
    # ASCII rebuild. Byte-patch a valid payload (same length).
    nonascii = exifmeta.exif_inject(
        _jpeg(13), {**FIELDS, "make": "CamXY", "gps": GPS}
    ).replace(b"CamXY", b"Cam\xc3\xa9")
    t = pa.table(
        {
            "image_id": ["ok", "trunc", "nonascii"],
            "fmt": ["jpeg"] * 3,
            "bytes": [good, bad, nonascii],
        }
    )
    out = ImageExifScrub(mode="gps_only")(t)
    assert out.schema == EXIF_SCRUB_SCHEMA
    rows = {r["image_id"]: r for r in out.to_pylist()}
    assert rows["ok"]["had_gps"] and rows["ok"]["orientation"] == FIELDS["orientation"]
    assert rows["trunc"]["orientation"] == -1
    assert rows["trunc"]["bytes"] == bad  # untouched pass-through
    assert rows["nonascii"]["orientation"] == -1
    assert rows["nonascii"]["bytes"] == nonascii


def test_audio_tags_scrub_survives_truncated_blocks():
    import pyarrow as pa

    from crawlkit import audiometa, flaccodec
    from crawlkit.pipelines.multimodal import AUDIO_TAGS_SCHEMA, AudioTagsScrub

    x = np.random.default_rng(5).integers(-9000, 9000, 4000).astype(np.int16)
    tagged = audiometa.flac_comments_inject(
        flaccodec.encode_flac(x, 16000), "v", {"TITLE": "t", "ARTIST": "pii"}
    )
    bad = tagged[:60]  # cut inside the metadata chain
    t = pa.table({"audio_id": ["ok", "trunc"], "bytes": [tagged, bad]})
    out = AudioTagsScrub()(t)
    assert out.schema == AUDIO_TAGS_SCHEMA
    rows = {r["audio_id"]: r for r in out.to_pylist()}
    assert rows["ok"]["title"] == "t" and rows["ok"]["had_pii"]
    assert rows["trunc"]["bytes"] == bad and not rows["trunc"]["had_pii"]
