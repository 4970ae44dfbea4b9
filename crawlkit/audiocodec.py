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
    rate = channels = bits = fmt = None
    payload = None
    try:
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + ln]
            if cid == b"fmt ":
                fmt, channels, rate = struct.unpack("<HHI", body[:8])
                bits = struct.unpack("<H", body[14:16])[0]
                if not (
                    (fmt == 1 and bits == 16)  # linear PCM
                    or (fmt in (6, 7) and bits == 8)  # G.711 A-law / µ-law
                ):
                    raise ValueError(f"unsupported WAV format tag={fmt} bits={bits}")
            elif cid == b"data":
                payload = body
            pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    except struct.error as e:  # truncated chunk → the documented ValueError
        raise ValueError(f"truncated WAV chunk: {e}") from e
    if rate is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    if rate <= 0:
        raise ValueError(f"invalid sample rate {rate}")
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


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Container-sniffing audio decode: RIFF/WAVE (PCM) or FLAC
    (flaccodec — real compressed-lossless decode since round 4).
    The stages use this so audio columns can mix formats row-by-row,
    the way real corpora do (LibriSpeech ships FLAC)."""
    if data[:4] == b"RIFF":
        return wav_decode(data)
    if data[:4] == b"fLaC":
        from .flaccodec import decode_flac

        return decode_flac(data)
    raise ValueError("unrecognized audio container")
