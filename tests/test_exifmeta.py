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
