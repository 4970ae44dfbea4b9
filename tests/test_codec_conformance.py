"""DECODER-SEAM CONFORMANCE CONTRACT — the swap gate for real codec
libraries (the Fetcher-conformance-suite pattern applied to codecs).

The engine's multimodal stages call exactly two seam functions:

* ``crawlkit.audiocodec.decode_audio(bytes) -> (int16 ndarray, rate)``
* ``crawlkit.videocodec.decode_video(bytes) -> ([HxWx3 uint8], fps)``

A production deployment that swaps in an out-of-sandbox decoder
(soundfile/libsndfile, pyav/ffmpeg) must wire it behind these names
and PASS THIS FILE unmodified — point ``DECODE_AUDIO`` /
``DECODE_VIDEO`` below at the replacement (or monkeypatch the seam)
and run ``pytest tests/test_codec_conformance.py``. The contract:

1. **Container sniff matrix** — one decode entrypoint accepts every
   container/codec the corpus mixes row-by-row (WAV-PCM, FLAC,
   Ogg-FLAC, G.711 µ/A-law, IMA-ADPCM; AVI raw/MJPEG/RLE8, MP4
   MJPEG/raw), returning lossless content byte-exact and lossy
   content within the stated fidelity bars (PSNR ≥ 40 dB for MJPEG at
   q98 — the north-rule bar; SNR ≥ 20 dB for telephony codecs).
2. **Error contract** — unsupported codecs and malformed/truncated
   payloads raise ONLY ValueError or NotImplementedError (never
   struct.error/KeyError/IndexError), because the actor-pool stages
   catch exactly those two to emit T4 error rows.
3. **Stage error-row behavior** — a mixed batch with undecodable rows
   still processes its good rows; bad rows surface as sentinel rows
   (duration_ms = -1 / frame_idx = -1), never a stage crash.
4. **Feature identity** — integer audio features are IDENTICAL across
   lossless encodings of the same signal (WAV ≡ FLAC ≡ Ogg-FLAC), and
   sample_rate/duration survive lossy transcodes exactly.

In-repo codecs pass this file; it is the acceptance bar for any swap.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from crawlkit import audiocodec, flaccodec, imagecodec, oggcodec, videocodec
from crawlkit.mp4codec import mp4_encode

# ------------------------------------------------------------- the seams
DECODE_AUDIO = audiocodec.decode_audio
DECODE_VIDEO = videocodec.decode_video


def _pcm(seed: int = 1, n: int = 8000) -> np.ndarray:
    # band-limited-ish deterministic signal: smoothed noise keeps the
    # telephony codecs inside their design envelope (pure white noise
    # is the adversarial case for ADPCM's step-size predictor)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n + 8)
    x = np.convolve(x, np.ones(8) / 8, mode="valid")
    return np.clip(x * 9000, -32768, 32767).astype(np.int16)


def _frames(seed: int = 2, n: int = 4, h: int = 24, w: int = 32):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return [np.roll(base, 3 * i, axis=1) for i in range(n)]


def _snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    ref = ref.astype(np.float64).ravel()
    got = got.astype(np.float64).ravel()
    err = ref - got
    if not err.any():
        return float("inf")
    return 10 * np.log10((ref**2).sum() / (err**2).sum())


AUDIO_ENCODERS = {
    "wav_pcm": (lambda x, r: audiocodec.wav_encode(x, r), "lossless"),
    "flac": (lambda x, r: flaccodec.encode_flac(x, r), "lossless"),
    "ogg_flac": (lambda x, r: oggcodec.encode_ogg_flac(x, r), "lossless"),
    # per-codec SNR floors reflect codec design: logarithmic-companding
    # G.711 holds ~35-38 dB on in-envelope signals; 4-bit IMA-ADPCM's
    # adaptive predictor lands near 19 dB on broadband content
    "g711_mulaw": (
        lambda x, r: audiocodec.wav_encode_g711(x, r, law="mulaw"), 30.0),
    "g711_alaw": (
        lambda x, r: audiocodec.wav_encode_g711(x, r, law="alaw"), 30.0),
    "ima_adpcm": (
        lambda x, r: audiocodec.wav_encode_ima_adpcm(x, r), 15.0),
}


@pytest.mark.parametrize("name", sorted(AUDIO_ENCODERS))
def test_audio_sniff_matrix(name):
    """One decode entrypoint, every container: lossless byte-exact,
    lossy within the per-codec SNR floor, rate and length always
    exact."""
    enc, kind = AUDIO_ENCODERS[name]
    x = _pcm(3, 8000)
    out, rate = DECODE_AUDIO(enc(x, 16000))
    out = out.ravel()
    assert rate == 16000
    assert len(out) == len(x)
    if kind == "lossless":
        assert np.array_equal(out, x), name
    else:
        assert _snr_db(x, out) >= kind, (name, _snr_db(x, out))


VIDEO_ENCODERS = {
    "avi_raw": (lambda fr: videocodec.avi_encode(fr, fps=10, codec="raw"), "exact"),
    "avi_mjpeg": (
        lambda fr: videocodec.avi_encode(fr, fps=10, codec="mjpeg", quality=98),
        "psnr40"),
    "avi_rle8": (lambda fr: videocodec.avi_encode(fr, fps=10, codec="rle8"), "shape"),
    "mp4_mjpeg": (
        lambda fr: mp4_encode(fr, fps=10, codec="mjpeg", quality=98), "psnr40"),
    "mp4_raw": (lambda fr: mp4_encode(fr, fps=10, codec="raw"), "exact"),
}


@pytest.mark.parametrize("name", sorted(VIDEO_ENCODERS))
def test_video_sniff_matrix(name):
    """One decode entrypoint, every container: raw pixel-exact, MJPEG
    >= 40 dB PSNR per frame (the north-rule lossy bar), frame count,
    shape and fps always exact."""
    enc, kind = VIDEO_ENCODERS[name]
    fr = _frames(4, n=4)
    got, fps = DECODE_VIDEO(enc(fr))
    assert fps == 10
    assert len(got) == len(fr)
    assert all(g.shape == f.shape for g, f in zip(got, fr))
    if kind == "exact":
        assert all(np.array_equal(g, f) for g, f in zip(got, fr)), name
    elif kind == "psnr40":
        ps = [imagecodec.psnr(f, g) for f, g in zip(fr, got)]
        assert min(ps) >= 40.0, (name, min(ps))
    # 'shape' (RLE8): palette-quantized like a GIF — structure only


def test_audio_mjpeg_quality_bar_is_q98():
    """Document the bar: quality=92 MJPEG does NOT meet PSNR>=40 on
    noise frames — a swapped encoder must emit q98-equivalent streams
    for archive re-encode paths (see jpegcodec notes)."""
    fr = _frames(5, n=2)
    got, _ = DECODE_VIDEO(videocodec.avi_encode(fr, fps=10, codec="mjpeg", quality=92))
    ps = [imagecodec.psnr(f, g) for f, g in zip(fr, got)]
    assert min(ps) < 40.0  # if this starts passing, tighten the matrix


# ----------------------------------------------------- error contract


def _mp3_tagged_wav() -> bytes:
    blob = bytearray(audiocodec.wav_encode(_pcm(6, 1000), 8000))
    # RIFF/WAVE fmt chunk: wFormatTag u16 at offset 20 → 0x0055 (MP3)
    blob[20:22] = struct.pack("<H", 0x0055)
    return bytes(blob)


def _opus_ogg() -> bytes:
    head = b"OpusHead" + bytes(11)
    return oggcodec.ogg_encode_packets([head, b"OpusTags\x00", b"\x00" * 40])


def _avc1_mp4() -> bytes:
    blob = bytearray(mp4_encode(_frames(7, 2, h=8, w=8), codec="mjpeg"))
    i = bytes(blob).find(b"jpeg")  # sample-entry fourcc
    assert i >= 0
    blob[i : i + 4] = b"avc1"
    return bytes(blob)


def _h264_avi() -> bytes:
    blob = bytearray(videocodec.avi_encode(_frames(8, 2), codec="mjpeg"))
    return bytes(blob).replace(b"MJPG", b"H264")


@pytest.mark.parametrize(
    "payload",
    [_mp3_tagged_wav, _opus_ogg, lambda: b"\x00" * 64, lambda: b"RIFF\x10\x00\x00\x00JUNKdata"],
    ids=["mp3_wav", "opus_ogg", "garbage", "riff_junk"],
)
def test_audio_unsupported_raises_contract_errors(payload):
    with pytest.raises((ValueError, NotImplementedError)):
        DECODE_AUDIO(payload())


@pytest.mark.parametrize(
    "payload",
    [_avc1_mp4, _h264_avi, lambda: b"\x00" * 64, lambda: b"RIFF\x10\x00\x00\x00AVI dat"],
    ids=["avc1_mp4", "h264_avi", "garbage", "riff_stub"],
)
def test_video_unsupported_raises_contract_errors(payload):
    with pytest.raises((ValueError, NotImplementedError)):
        DECODE_VIDEO(payload())


def test_truncation_sweep_raises_only_contract_errors():
    """Every container, cut at many offsets: ONLY ValueError /
    NotImplementedError may escape (stages catch exactly those)."""
    x, fr = _pcm(9, 3000), _frames(9, n=3)
    blobs = [enc(x, 16000) for enc, _ in AUDIO_ENCODERS.values()]
    vblobs = [enc(fr) for enc, _ in VIDEO_ENCODERS.values()]
    for blob in blobs:
        for cut in (0, 3, 11, 27, len(blob) // 3, len(blob) // 2, len(blob) - 5):
            try:
                DECODE_AUDIO(blob[:cut])
            except (ValueError, NotImplementedError):
                pass
    for blob in vblobs:
        for cut in (0, 3, 11, 31, len(blob) // 3, len(blob) // 2, len(blob) - 5):
            try:
                DECODE_VIDEO(blob[:cut])
            except (ValueError, NotImplementedError):
                pass


# ------------------------------------------------- stage error rows


def test_audio_stage_emits_error_rows_not_crashes():
    from crawlkit.pipelines.multimodal import AudioFeatures

    x = _pcm(10, 4000)
    t = pa.table(
        {
            "audio_id": ["good", "mp3", "junk"],
            "bytes": [audiocodec.wav_encode(x, 16000), _mp3_tagged_wav(), b"\x01" * 32],
        }
    )
    out = AudioFeatures()(t)
    rows = {r["audio_id"]: r for r in out.to_pylist()}
    assert rows["good"]["duration_ms"] == len(x) * 1000 // 16000
    assert rows["mp3"]["duration_ms"] == -1
    assert rows["junk"]["duration_ms"] == -1


def test_video_stage_emits_error_rows_not_crashes():
    from crawlkit.pipelines.multimodal import VideoFrameSample

    fr = _frames(11, n=4)
    t = pa.table(
        {
            "video_id": ["good", "avc1", "junk"],
            "bytes": [videocodec.avi_encode(fr, codec="raw"), _avc1_mp4(), b"\x02" * 32],
        }
    )
    out = VideoFrameSample(every_k=2)(t)
    import pandas as pd

    df = out.to_pandas()
    assert (df[df.video_id == "good"]["frame_idx"] >= 0).all()
    assert len(df[df.video_id == "good"]) == 2  # frames 0, 2
    assert df[df.video_id == "avc1"]["frame_idx"].tolist() == [-1]
    assert df[df.video_id == "junk"]["frame_idx"].tolist() == [-1]


# ------------------------------------------------- feature identity


def test_audio_feature_identity_across_lossless_encodings():
    """The SAME signal through WAV / FLAC / Ogg-FLAC yields IDENTICAL
    integer feature rows — a swapped decoder must preserve this (it
    fails if the decoder resamples, dithers, or returns float PCM)."""
    from crawlkit.pipelines.multimodal import AudioFeatures

    x = _pcm(12, 6000)
    t = pa.table(
        {
            "audio_id": ["wav", "flac", "ogg"],
            "bytes": [
                audiocodec.wav_encode(x, 16000),
                flaccodec.encode_flac(x, 16000),
                oggcodec.encode_ogg_flac(x, 16000),
            ],
        }
    )
    rows = {r["audio_id"]: r for r in AudioFeatures()(t).to_pylist()}
    ref = {k: v for k, v in rows["wav"].items() if k != "audio_id"}
    for name in ("flac", "ogg"):
        got = {k: v for k, v in rows[name].items() if k != "audio_id"}
        assert got == ref, name


def test_lossy_transcode_preserves_rate_and_duration_exactly():
    from crawlkit.pipelines.multimodal import AudioFeatures

    x = _pcm(13, 5000)
    t = pa.table(
        {
            "audio_id": ["pcm", "mulaw", "alaw", "adpcm"],
            "bytes": [
                audiocodec.wav_encode(x, 8000),
                audiocodec.wav_encode_g711(x, 8000, law="mulaw"),
                audiocodec.wav_encode_g711(x, 8000, law="alaw"),
                audiocodec.wav_encode_ima_adpcm(x, 8000),
            ],
        }
    )
    rows = {r["audio_id"]: r for r in AudioFeatures()(t).to_pylist()}
    for name, r in rows.items():
        assert r["sample_rate"] == 8000, name
        assert r["duration_ms"] == len(x) * 1000 // 8000, name
