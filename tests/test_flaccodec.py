"""FLAC codec + mixed-container audio pipeline tests.

Pins: lossless round-trips through every subframe kind (CONSTANT /
VERBATIM / FIXED / LPC) and every stereo channel assignment
(independent + the three decorrelations), multi-frame streams with a
short tail block, error paths on malformed streams, and — the
pipeline contract — audio_features / audio_segments producing
IDENTICAL rows over WAV and FLAC encodings of the same corpus
(FLAC is lossless, so any drift is a codec bug).
"""

from __future__ import annotations

import numpy as np
import pytest

from crawlkit.audiocodec import decode_audio, wav_encode
from crawlkit.flaccodec import decode_flac, encode_flac


def _signal(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (3000 * np.sin(t / 50) + rng.integers(-50, 51, n)).astype(np.int16)


@pytest.mark.parametrize("subframe", ["fixed2", "lpc2", "verbatim"])
def test_mono_roundtrip_lossless(subframe):
    x = _signal()
    y, rate = decode_flac(encode_flac(x, 16000, blocksize=1024, subframe=subframe))
    assert rate == 16000 and y.shape == x.shape and (y == x).all()


def test_constant_blocks_and_short_tail():
    x = np.full(1000, -123, dtype=np.int16)
    data = encode_flac(x, 8000, blocksize=300)
    assert len(data) < 120  # constant subframes actually compress
    y, _ = decode_flac(data)
    assert (y == x).all()
    x2 = _signal(1025)
    y2, _ = decode_flac(encode_flac(x2, 8000, blocksize=1024))
    assert (y2 == x2).all()  # 1-sample tail block


@pytest.mark.parametrize(
    "mode", ["independent", "left-side", "right-side", "mid-side"]
)
def test_stereo_channel_assignments(mode):
    x = _signal(3000)
    st = np.stack([x, (x // 2 + 7).astype(np.int16)], axis=1)
    y, rate = decode_flac(encode_flac(st, 44100, blocksize=512, stereo_mode=mode))
    assert rate == 44100 and y.shape == st.shape and (y == st).all()


def test_flac_actually_compresses():
    x = _signal(8000)
    flac = encode_flac(x, 16000, subframe="fixed2")
    assert len(flac) < len(wav_encode(x, 16000)) * 0.6


def test_malformed_streams_raise():
    good = encode_flac(_signal(500), 8000)
    for bad in (b"RIFF1234WAVE", b"fLaC", good[:30], good[:-40]):
        with pytest.raises(ValueError):
            decode_flac(bad)


def test_decode_audio_sniffs_container():
    x = _signal(800)
    assert (decode_audio(wav_encode(x, 12000))[0] == x).all()
    assert (decode_audio(encode_flac(x, 12000))[0] == x).all()
    with pytest.raises(ValueError):
        decode_audio(b"ID3\x04mp3-ish")


def test_audio_pipeline_identical_across_codecs(ray_session):
    """The stage contract: WAV corpus and FLAC corpus of the same
    signals produce identical feature and segment rows."""
    from crawlkit.pipelines import multimodal

    def canon_all(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    f_wav = canon_all(multimodal.audio_features("unused", n=12, codec="wav"))
    f_flac = canon_all(multimodal.audio_features("unused", n=12, codec="flac"))
    assert (f_wav["duration_ms"] >= 0).all()  # every FLAC row decoded
    assert f_wav.equals(f_flac)
    s_wav = canon_all(multimodal.audio_segments("unused", n=12, codec="wav"))
    s_flac = canon_all(multimodal.audio_segments("unused", n=12, codec="flac"))
    assert s_wav.equals(s_flac)
