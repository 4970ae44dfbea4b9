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


# --- G.711 (µ-law / A-law) — lossy telephony WAV, format tags 7/6 ---


def test_g711_codeword_idempotent():
    """encode(decode(code)) == code for ALL 256 codewords, both laws —
    the standard's defining property (decode hits quantizer centers)."""
    from crawlkit.audiocodec import alaw_decode, alaw_encode, mulaw_decode, mulaw_encode

    codes = np.arange(256, dtype=np.uint8)
    mu = mulaw_encode(mulaw_decode(codes))
    # 0x7F and 0xFF both decode to 0 which re-encodes to 0xFF (positive 0)
    ok = (mu == codes) | ((codes == 0x7F) & (mu == 0xFF))
    assert ok.all()
    assert (alaw_encode(alaw_decode(codes)) == codes).all()


def test_g711_known_values():
    from crawlkit.audiocodec import alaw_decode, mulaw_decode, mulaw_encode

    assert int(mulaw_encode(np.array([0]))[0]) == 0xFF
    assert int(mulaw_decode(np.array([0xFF], dtype=np.uint8))[0]) == 0
    assert int(mulaw_decode(np.array([0x00], dtype=np.uint8))[0]) == -32124
    assert int(mulaw_decode(np.array([0x80], dtype=np.uint8))[0]) == 32124
    assert int(alaw_decode(np.array([0xD5], dtype=np.uint8))[0]) == 8  # +0 code
    assert int(alaw_decode(np.array([0x55], dtype=np.uint8))[0]) == -8  # -0 code
    assert int(alaw_decode(np.array([0x2A], dtype=np.uint8))[0]) == -32256  # neg max


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_g711_wav_roundtrip_snr(law):
    from crawlkit.audiocodec import wav_decode, wav_encode_g711

    x = _signal(8000).astype(np.float64)
    y, rate = wav_decode(wav_encode_g711(x.astype(np.int16), 8000, law))
    assert rate == 8000 and y.dtype == np.int16 and len(y) == len(x)
    snr = 10 * np.log10(np.sum(x * x) / np.sum((x - y) ** 2))
    assert snr > 30  # G.711 spec-grade companding quality


def test_g711_pipeline_and_mixed_corpus(ray_session):
    """g711/adpcm + mixed corpora decode end-to-end through the audio
    stages; mixed actually contains all four encodings."""
    from crawlkit.pipelines import multimodal

    for codec in ("g711", "adpcm"):
        f = multimodal.audio_features("unused", n=12, codec=codec).to_pandas()
        assert len(f) == 12 and (f["duration_ms"] > 0).all()
    corpus = multimodal.synthetic_audio(32, codec="mixed").to_pandas()
    kinds = set()
    for b in corpus["bytes"]:
        if b[:4] == b"fLaC":
            kinds.add("flac")
        elif b[:4] == b"OggS":
            kinds.add("oggflac")
        else:
            import struct as _s

            tag = _s.unpack("<H", b[20:22])[0]
            kinds.add({1: "wav", 6: "g711", 7: "g711", 0x11: "adpcm"}[tag])
    assert kinds == {"wav", "flac", "g711", "adpcm", "oggflac"}
    fm = multimodal.audio_features("unused", n=24, codec="mixed").to_pandas()
    assert len(fm) == 24 and (fm["duration_ms"] > 0).all()


# --- IMA ADPCM (WAV format tag 0x11, 4-bit, block-restart) ---


def test_adpcm_roundtrip_snr_and_ratio():
    from crawlkit.audiocodec import decode_audio, wav_encode_ima_adpcm

    x = _signal(16000).astype(np.float64)
    blob = wav_encode_ima_adpcm(x.astype(np.int16), 8000)
    assert len(blob) < len(x) * 2 * 0.3  # ~4:1 vs 16-bit PCM
    y, rate = decode_audio(blob)
    assert rate == 8000 and len(y) == len(x)  # fact chunk trims pad
    snr = 10 * np.log10(np.sum(x * x) / np.sum((x - y.astype(np.float64)) ** 2))
    assert snr > 25


def test_adpcm_blocks_are_independent():
    """Each 256-byte block restarts predictor+index from its header, so
    a prefix of blocks decodes to a prefix of samples — the property
    the vectorized lockstep decode relies on."""
    from crawlkit.audiocodec import _ima_adpcm_decode, wav_encode_ima_adpcm

    x = _signal(5050)
    blob = wav_encode_ima_adpcm(x, 8000)
    payload = blob[blob.index(b"data") + 8 :]
    full = _ima_adpcm_decode(payload, None)
    part = _ima_adpcm_decode(payload[: 256 * 4], None)
    assert np.array_equal(full[: len(part)], part)
    with pytest.raises(ValueError):
        _ima_adpcm_decode(payload[:100], None)  # sub-block truncation


def test_adpcm_extreme_amplitudes():
    from crawlkit.audiocodec import wav_decode, wav_encode_ima_adpcm

    x = np.tile(np.array([32767, -32768, 32767, -32768], dtype=np.int16), 300)
    y, _ = wav_decode(wav_encode_ima_adpcm(x, 8000))
    assert y.dtype == np.int16 and len(y) == len(x)  # clamps, never wraps
