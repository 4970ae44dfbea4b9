"""Property-based round-trip + truncation fuzz for the session-16
codecs (BMP, RLE8, G.711, IMA ADPCM). Contract pinned for every
decoder in the engine: arbitrary prefixes / byte-flips of valid
streams either decode or raise ValueError — never IndexError,
struct.error, or a silent wrong shape. (The multimodal stages catch
ValueError per row to emit error rows; any other exception type would
kill the whole batch task.)"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlkit.audiocodec import (
    alaw_decode,
    alaw_encode,
    decode_audio,
    mulaw_decode,
    mulaw_encode,
    wav_encode_g711,
    wav_encode_ima_adpcm,
)
from crawlkit.imagecodec import decode_bmp, encode_bmp
from crawlkit.videocodec import rle8_decode_indices, rle8_encode_indices


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 17),
    w=st.integers(1, 19),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_any_shape(h, w, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 40),
    n_vals=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_rle8_roundtrip_any_indices(h, w, n_vals, seed):
    """Low-cardinality index maps (runs) and high-cardinality ones
    (literals) both survive encode→decode exactly."""
    idx = np.random.default_rng(seed).integers(0, n_vals, (h, w), dtype=np.uint8)
    assert np.array_equal(rle8_decode_indices(rle8_encode_indices(idx), w, h), idx)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 3000))
def test_g711_bounded_error(seed, n):
    """Both laws: reconstruction error bounded by the top segment's
    step size at every sample (the companding guarantee)."""
    x = np.random.default_rng(seed).integers(-32768, 32768, n).astype(np.int16)
    for enc, dec, bound in ((mulaw_encode, mulaw_decode, 1024),
                            (alaw_encode, alaw_decode, 1024)):
        y = dec(enc(x)).astype(np.int32)
        assert np.abs(y - x.astype(np.int32)).max() <= bound


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), cut=st.floats(0.0, 1.0))
def test_truncated_audio_never_crashes(seed, cut):
    rng = np.random.default_rng(seed)
    x = rng.integers(-3000, 3000, 1200).astype(np.int16)
    blob = (wav_encode_ima_adpcm(x, 8000) if seed % 2
            else wav_encode_g711(x, 8000, "alaw"))
    prefix = blob[: int(len(blob) * cut)]
    try:
        out, rate = decode_audio(prefix)
        assert rate > 0 and out.dtype == np.int16
    except ValueError:
        pass


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), cut=st.floats(0.0, 1.0))
def test_truncated_bmp_never_crashes(seed, cut):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    blob = encode_bmp(px)
    prefix = blob[: int(len(blob) * cut)]
    try:
        decode_bmp(prefix)
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=200), w=st.integers(1, 16),
       h=st.integers(1, 16))
def test_rle8_garbage_never_crashes(data, w, h):
    try:
        out = rle8_decode_indices(data, w, h)
        assert out.shape == (h, w)
    except ValueError:
        pass


@settings(max_examples=20, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**31 - 1),
       comp=st.sampled_from(["none", "packbits", "lzw"]), pred=st.sampled_from([1, 2]))
def test_tiff_roundtrip_any_shape(h, w, seed, comp, pred):
    from crawlkit.tiffcodec import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff(px, compression=comp, predictor=pred)), px
    )


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), cut=st.floats(0.0, 1.0))
def test_truncated_tiff_never_crashes(seed, cut):
    from crawlkit.tiffcodec import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    blob = encode_tiff(px, compression="lzw", predictor=2)
    prefix = blob[: int(len(blob) * cut)]
    try:
        out = decode_tiff(prefix)
        assert out.shape == (9, 11, 3)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_tiff_lzw_roundtrip_any_bytes(data):
    from crawlkit.tiffcodec import lzw_decode, lzw_encode

    assert lzw_decode(lzw_encode(data), len(data)) == data
