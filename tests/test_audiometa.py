"""FLAC VORBIS_COMMENT metadata: build/parse round-trip, block-chain
surgery with frame invariance, key-selective scrub, and the corpus
pipeline."""

import numpy as np
import pytest

from crawlkit import audiometa
from crawlkit.flaccodec import decode_flac, encode_flac

TAGS = {"TITLE": "take-7", "DATE": "2024", "ARTIST": "speaker-3",
        "LOCATION": "37.775N"}


def _flac(seed: int = 1, n: int = 6000) -> bytes:
    x = np.random.default_rng(seed).integers(-9000, 9000, n).astype(np.int16)
    return encode_flac(x, 16000)


def test_build_parse_roundtrip():
    body = audiometa.build_vorbis_comment("vend/1.0", TAGS)
    vendor, got = audiometa.parse_vorbis_comment(body)
    assert vendor == "vend/1.0"
    assert got == {k: [v] for k, v in TAGS.items()}
    # multi-valued + case-insensitive keys
    body = audiometa.build_vorbis_comment("v", {"Artist": ["a", "b"]})
    assert audiometa.parse_vorbis_comment(body)[1] == {"ARTIST": ["a", "b"]}


def test_inject_extract_and_frames_untouched():
    blob = _flac()
    base, rate = decode_flac(blob)
    tagged = audiometa.flac_comments_inject(blob, "crawlkit", TAGS)
    vendor, got = audiometa.flac_comments_extract(tagged)
    assert vendor == "crawlkit" and got["TITLE"] == ["take-7"]
    out, rate2 = decode_flac(tagged)
    assert rate2 == rate and np.array_equal(out, base)
    # re-inject replaces, not duplicates
    again = audiometa.flac_comments_inject(tagged, "v2", {"TITLE": "x"})
    vendor, got = audiometa.flac_comments_extract(again)
    assert vendor == "v2" and got == {"TITLE": ["x"]}


def test_strip_selective_and_full():
    tagged = audiometa.flac_comments_inject(_flac(2), "v", TAGS)
    scrubbed = audiometa.flac_comments_strip(tagged, keys=["artist", "LOCATION"])
    vendor, got = audiometa.flac_comments_extract(scrubbed)
    assert set(got) == {"TITLE", "DATE"}
    assert np.array_equal(decode_flac(scrubbed)[0], decode_flac(tagged)[0])
    bare = audiometa.flac_comments_strip(tagged)
    assert audiometa.flac_comments_extract(bare) is None
    assert np.array_equal(decode_flac(bare)[0], decode_flac(tagged)[0])


def test_extract_none_and_bad_input():
    assert audiometa.flac_comments_extract(_flac(3)) is None
    with pytest.raises(ValueError):
        audiometa.flac_comments_extract(b"RIFFxxxx")
    with pytest.raises(ValueError):
        audiometa.parse_vorbis_comment(b"\xff\xff\xff\xff")


def test_audio_tags_scrub_pipeline(ray_session):
    from crawlkit.pipelines import multimodal

    corpus = multimodal.synthetic_audio_tagged(n=18).to_pandas()
    out = multimodal.audio_tags_scrub(n=18).to_pandas().set_index("audio_id")
    assert len(out) == 18
    saw_pii = 0
    for _, row in corpus.iterrows():
        o = out.loc[row["audio_id"]]
        assert o["title"].startswith("take-") and o["date"].startswith("202")
        scrubbed = bytes(o["bytes"])
        got = audiometa.flac_comments_extract(scrubbed)
        assert got is not None
        assert "ARTIST" not in got[1] and "LOCATION" not in got[1]
        if o["had_pii"]:
            saw_pii += 1
        assert np.array_equal(
            decode_flac(scrubbed)[0], decode_flac(bytes(row["bytes"]))[0]
        )
    assert saw_pii > 0
