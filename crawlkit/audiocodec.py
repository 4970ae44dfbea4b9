"""Real PCM WAV (RIFF) codec — stdlib-only, like imagecodec.py's PNG.

Reference parity note: the reference engine (e8kor/crawler) has no
audio path at all; this exists for the training-data-pipeline side of
the engine (feature extraction over opaque binary audio columns). The
codec is a genuine RIFF/WAVE implementation for 16-bit PCM — the one
audio container that needs no external library — so the AudioFeatures
stage is a REAL decode, not a stub. FLAC is ALSO real since round 4
(flaccodec.py; dispatch via ``decode_audio``), as is G.711 µ-law /
A-law telephony WAV (format tags 7/6, below); perceptual codecs
(mp3/opus) still need soundfile/librosa outside the sandbox —
``wav_decode`` raises cleanly on them (unknown format tag).

Layout (canonical 44-byte header):
  "RIFF" <u32 size> "WAVE"
  "fmt " <u32 16> <u16 fmt=1 PCM> <u16 channels> <u32 rate>
         <u32 byte_rate> <u16 block_align> <u16 bits=16>
  "data" <u32 nbytes> <int16-LE samples, channel-interleaved>
Chunks other than fmt/data (LIST, fact, ...) are skipped per spec.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono 16-bit PCM WAV bytes from an int16 (or int-castable) array."""
    x = np.asarray(samples)
    if x.dtype != np.int16:
        x = np.clip(x, -32768, 32767).astype(np.int16)
    data = x.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """(samples int16 ndarray [n, channels] squeezed to 1-D for mono,
    sample_rate). Raises ValueError on non-RIFF or non-16-bit-PCM."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    rate = channels = bits = fmt = nsamp = None
    block_align = 0
    payload = None
    try:
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + ln]
            if cid == b"fmt ":
                fmt, channels, rate = struct.unpack("<HHI", body[:8])
                block_align, bits = struct.unpack("<HH", body[12:16])
                if not (
                    (fmt == 1 and bits == 16)  # linear PCM
                    or (fmt in (6, 7) and bits == 8)  # G.711 A-law / µ-law
                    or (fmt == 0x11 and bits == 4 and channels == 1)  # IMA ADPCM
                ):
                    raise ValueError(f"unsupported WAV format tag={fmt} bits={bits}")
            elif cid == b"fact":
                (nsamp,) = struct.unpack("<I", body[:4])
            elif cid == b"data":
                payload = body
            pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    except struct.error as e:  # truncated chunk → the documented ValueError
        raise ValueError(f"truncated WAV chunk: {e}") from e
    if rate is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    if rate <= 0:
        raise ValueError(f"invalid sample rate {rate}")
    if fmt == 0x11:
        return _ima_adpcm_decode(payload, nsamp, block_align), int(rate)
    if fmt == 7:
        x = mulaw_decode(np.frombuffer(payload, dtype=np.uint8))
    elif fmt == 6:
        x = alaw_decode(np.frombuffer(payload, dtype=np.uint8))
    else:
        x = np.frombuffer(payload, dtype="<i2")
    if channels and channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels)
    return x, int(rate)


# --- G.711 companding (µ-law / A-law) — the telephony-corpus codecs.
# Vectorized transcriptions of the canonical public reference
# implementation (Sun Microsystems' g711.c, as shipped in the CCITT
# G.191 software tool library); decode expansion is the standard's
# exact table semantics.

_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF])
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear → µ-law uint8 (G.711; 14-bit, bias 33, clip 8159)."""
    pcm = np.asarray(x, dtype=np.int32) >> 2
    mask = np.where(pcm < 0, 0x7F, 0xFF)
    pcm = np.where(pcm < 0, -pcm, pcm)
    pcm = np.minimum(pcm, 8159) + 33
    seg = np.searchsorted(_SEG_UEND, pcm, side="left")
    uval = (seg << 4) | ((pcm >> (seg + 1)) & 0xF)
    return (np.where(seg >= 8, 0x7F, uval) ^ mask).astype(np.uint8)


def mulaw_decode(u: np.ndarray) -> np.ndarray:
    """µ-law uint8 → int16 linear (exact standard expansion)."""
    v = ~np.asarray(u, dtype=np.uint8) & 0xFF
    t = (((v & 0xF).astype(np.int32) << 3) + 0x84) << ((v & 0x70) >> 4)
    return np.where(v & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear → A-law uint8 (G.711; 13-bit, 0x55 bit inversion)."""
    pcm = np.asarray(x, dtype=np.int32) >> 3
    mask = np.where(pcm >= 0, 0xD5, 0x55)
    pcm = np.where(pcm >= 0, pcm, -pcm - 1)
    seg = np.searchsorted(_SEG_AEND, pcm, side="left")
    low = np.where(seg < 2, (pcm >> 1) & 0xF, (pcm >> np.minimum(seg, 7)) & 0xF)
    aval = (seg << 4) | low
    return (np.where(seg >= 8, 0x7F, aval) ^ mask).astype(np.uint8)


def alaw_decode(a: np.ndarray) -> np.ndarray:
    """A-law uint8 → int16 linear (exact standard expansion)."""
    v = (np.asarray(a, dtype=np.uint8) ^ 0x55).astype(np.int32)
    t = (v & 0xF) << 4
    seg = (v & 0x70) >> 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(v & 0x80, t, -t).astype(np.int16)


def wav_encode_g711(samples: np.ndarray, sample_rate: int, law: str = "mulaw") -> bytes:
    """Mono G.711 WAV (format tag 7 = µ-law, 6 = A-law, 8-bit codes) —
    the telephony-corpus container shape. Lossy: ~38 dB SNR."""
    x = np.asarray(samples)
    if x.dtype != np.int16:
        x = np.clip(x, -32768, 32767).astype(np.int16)
    if law == "mulaw":
        tag, codes = 7, mulaw_encode(x)
    elif law == "alaw":
        tag, codes = 6, alaw_encode(x)
    else:
        raise ValueError(f"unknown G.711 law {law!r}")
    data = codes.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, tag, 1, sample_rate, sample_rate, 1, 8)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


# --- IMA ADPCM (WAV format tag 0x11) — 4 bits/sample, the classic
# speech-corpus compression. Tables and step logic are the IMA
# (Interactive Multimedia Association) reference algorithm as published
# in the IMA Recommended Practices / Microsoft WAVE documentation.
# Blocks are INDEPENDENT (each restarts predictor+index from its 4-byte
# header), so both directions vectorize across blocks: the sample loop
# runs once per in-block position over an n_blocks-wide numpy row.

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)
_IMA_STEP = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32,
)
_IMA_BLOCK_ALIGN = 256  # → 505 samples per block


def _ima_step_apply(pred, index, nib):
    """One IMA update, vectorized over blocks: (pred', index') after
    emitting/absorbing nibble ``nib`` — the standard's exact
    shift-accumulated diff (this IS the decoder; the encoder mirrors
    it so both sides stay in lockstep)."""
    step = _IMA_STEP[index]
    diff = step >> 3
    diff += np.where(nib & 1, step >> 2, 0)
    diff += np.where(nib & 2, step >> 1, 0)
    diff += np.where(nib & 4, step, 0)
    pred = pred + np.where(nib & 8, -diff, diff)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + _IMA_INDEX[nib], 0, 88)
    return pred, index


def wav_encode_ima_adpcm(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono IMA-ADPCM WAV (format tag 0x11, 4-bit, block_align 256,
    505 samples/block). Lossy ~4:1; blocks restart cleanly so decode
    is block-parallel."""
    x = np.asarray(samples)
    if x.dtype != np.int16:
        x = np.clip(x, -32768, 32767).astype(np.int16)
    spb = (_IMA_BLOCK_ALIGN - 4) * 2 + 1
    n = len(x)
    nblk = max(1, -(-n // spb))
    padded = np.zeros(nblk * spb, dtype=np.int16)
    padded[:n] = x
    blocks = padded.reshape(nblk, spb).astype(np.int32)

    pred = blocks[:, 0].copy()  # block header carries sample 0 verbatim
    index = np.zeros(nblk, dtype=np.int32)
    nibs = np.empty((spb - 1, nblk), dtype=np.uint8)
    for t in range(1, spb):
        step = _IMA_STEP[index]
        diff = blocks[:, t] - pred
        nib = np.where(diff < 0, 8, 0).astype(np.int32)
        diff = np.abs(diff)
        for bit, sh in ((4, 0), (2, 1), (1, 2)):
            ge = diff >= (step >> sh)
            nib |= np.where(ge, bit, 0)
            diff -= np.where(ge, step >> sh, 0)
        pred, index = _ima_step_apply(pred, index, nib)
        nibs[t - 1] = nib.astype(np.uint8)
    # pack: per block, 4-byte header then nibble pairs low-first
    lo, hi = nibs[0::2], nibs[1::2]
    payload = (lo | (hi << 4)).T.copy()  # (nblk, 252) bytes
    hdrs = np.zeros((nblk, 4), dtype=np.uint8)
    hdrs[:, 0] = blocks[:, 0] & 0xFF
    hdrs[:, 1] = (blocks[:, 0] >> 8) & 0xFF
    data = np.concatenate([hdrs, payload], axis=1).tobytes()
    fmt = struct.pack(
        "<IHHIIHHHH",
        20, 0x11, 1, sample_rate,
        sample_rate * _IMA_BLOCK_ALIGN // spb,  # avg byte rate
        _IMA_BLOCK_ALIGN, 4, 2, spb,
    )
    fact = struct.pack("<II", 4, n)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 52 + len(data))
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"fact"
        + fact
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def _ima_adpcm_decode(
    payload: bytes, n_samples: int | None, block_align: int = _IMA_BLOCK_ALIGN
) -> np.ndarray:
    """IMA-ADPCM data chunk → int16 samples (mono)."""
    ba = block_align or _IMA_BLOCK_ALIGN
    if ba < 8 or ba % 4:
        raise ValueError(f"bad ADPCM block_align {ba}")
    nblk = len(payload) // ba
    if nblk == 0:
        raise ValueError("truncated ADPCM data chunk")
    raw = np.frombuffer(payload, np.uint8, nblk * ba).reshape(nblk, ba)
    pred = (raw[:, 0].astype(np.int32) | (raw[:, 1].astype(np.int32) << 8))
    pred = (pred ^ 0x8000) - 0x8000  # sign-extend int16
    index = np.clip(raw[:, 2].astype(np.int32), 0, 88)
    body = raw[:, 4:]
    spb = (ba - 4) * 2 + 1
    out = np.empty((nblk, spb), dtype=np.int16)
    out[:, 0] = pred
    nibs = np.empty((nblk, spb - 1), dtype=np.uint8)
    nibs[:, 0::2] = body & 0xF
    nibs[:, 1::2] = body >> 4
    for t in range(1, spb):
        pred, index = _ima_step_apply(pred, index, nibs[:, t - 1].astype(np.int32))
        out[:, t] = pred
    flat = out.reshape(-1)
    return flat[:n_samples] if n_samples is not None else flat


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Container-sniffing audio decode: RIFF/WAVE (PCM, G.711, IMA
    ADPCM — per the fmt tag) or FLAC (flaccodec — real compressed
    lossless decode since round 4).
    The stages use this so audio columns can mix formats row-by-row,
    the way real corpora do (LibriSpeech ships FLAC)."""
    if data[:4] == b"RIFF":
        return wav_decode(data)
    if data[:4] == b"fLaC":
        from .flaccodec import decode_flac

        return decode_flac(data)
    if data[:4] == b"OggS":
        from .oggcodec import decode_ogg_flac

        return decode_ogg_flac(data)
    raise ValueError("unrecognized audio container")
