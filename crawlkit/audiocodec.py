"""Real PCM WAV (RIFF) codec — stdlib-only, like imagecodec.py's PNG.

Reference parity note: the reference engine (e8kor/crawler) has no
audio path at all; this exists for the training-data-pipeline side of
the engine (feature extraction over opaque binary audio columns). The
codec is a genuine RIFF/WAVE implementation for 16-bit PCM — the one
audio container that needs no external library — so the AudioFeatures
stage is a REAL decode, not a stub. FLAC is ALSO real since round 4
(flaccodec.py; dispatch via ``decode_audio``); lossy codecs
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
    rate = channels = bits = None
    payload = None
    try:
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + ln]
            if cid == b"fmt ":
                fmt, channels, rate = struct.unpack("<HHI", body[:8])
                bits = struct.unpack("<H", body[14:16])[0]
                if fmt != 1 or bits != 16:
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
    x = np.frombuffer(payload, dtype="<i2")
    if channels and channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels)
    return x, int(rate)


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
