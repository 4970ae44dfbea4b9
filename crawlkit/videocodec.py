"""Real minimal AVI (RIFF) container codec — uncompressed DIB and
Motion-JPEG video, the video sibling of audiocodec.py's PCM WAV.

Reference parity note: the reference engine (e8kor/crawler) has no
video path; this exists for the training-data-pipeline side (frame
sampling over opaque binary video columns). The container is a
spec-shaped RIFF 'AVI ' with a LIST hdrl (avih + strl{strh 'vids',
strf BITMAPINFOHEADER}) and a LIST movi of frame chunks:

* 'DIB ' streams: '00db' chunks of uncompressed bottom-up BGR DIB
  frames with 4-byte-aligned rows ("raw video" to any demuxer).
* 'MJPG' streams: '00dc' chunks, each an independent baseline JFIF
  JPEG from the real codec (jpegcodec.py) — a REAL compressed video
  format, decodable by any AVI demuxer + JPEG decoder.

Inter-frame codecs (h264/vp9/...) still need pyav/ffmpeg outside the
sandbox; ``avi_decode`` raises cleanly on their biCompression values.
"""

from __future__ import annotations

import struct

import numpy as np


def _dib_from_frame(px: np.ndarray) -> bytes:
    """HxWx3 RGB uint8 → DIB bytes (bottom-up rows, BGR, rows padded
    to 4 bytes)."""
    h, w, _ = px.shape
    bgr = px[::-1, :, ::-1]  # bottom-up, channel-swapped
    row = np.zeros((h, (w * 3 + 3) & ~3), dtype=np.uint8)
    row[:, : w * 3] = bgr.reshape(h, w * 3)
    return row.tobytes()


def _frame_from_dib(data: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()


_MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian — Motion-JPEG in AVI


def avi_encode(
    frames: list[np.ndarray], fps: int = 10, codec: str = "raw", quality: int = 92
) -> bytes:
    """AVI bytes from a list of same-shape HxWx3 RGB uint8 frames.

    codec='raw' writes uncompressed DIB ('00db' chunks, biCompression
    0); codec='mjpeg' writes Motion-JPEG — each frame an independent
    baseline JFIF stream from the real JPEG codec (jpegcodec.py) in
    '00dc' chunks with biCompression 'MJPG', the standard interchange
    form any AVI demuxer + JPEG decoder plays. MJPEG frames go through
    ONE vectorized encode_jpeg_batch call (the codec's hot-path shape),
    so per-frame numpy overhead doesn't scale with clip length."""
    if not frames:
        raise ValueError("empty frame list")
    h, w, _ = frames[0].shape
    if codec == "mjpeg":
        from .jpegcodec import encode_jpeg_batch

        payloads = encode_jpeg_batch(frames, quality=quality)
        fourcc, comp, chunk_id = b"MJPG", _MJPG_FOURCC, b"00dc"
        frame_sz = max(len(p) for p in payloads)
    elif codec == "raw":
        payloads = [_dib_from_frame(f) for f in frames]
        fourcc, comp, chunk_id = b"DIB ", 0, b"00db"
        frame_sz = len(payloads[0])
    else:
        raise ValueError(f"unsupported codec {codec!r} (raw | mjpeg)")

    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, comp, frame_sz, 0, 0, 0, 0)
    strh = (
        b"vids"
        + fourcc
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      frame_sz, 0xFFFFFFFF, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl" \
        + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_sz * fps, 0, 0x10, len(frames), 0, 1,
        frame_sz, w, h, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) + b"hdrl" \
        + b"avih" + struct.pack("<I", len(avih)) + avih + strl

    movi_body = b"".join(
        chunk_id + struct.pack("<I", len(p)) + p + (b"\x00" if len(p) & 1 else b"")
        for p in payloads
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body

    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(data: bytes) -> tuple[list[np.ndarray], int]:
    """(frames as HxWx3 RGB uint8 list, fps). Walks the standard chunk
    layout; raises ValueError on non-RIFF-AVI or compressed streams."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    w = h = None
    fps = 0
    mjpeg = False
    payloads: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal w, h, fps, mjpeg
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + ln]
            if cid == b"LIST":
                walk(body[4:])  # skip the list type tag
            elif cid == b"strf":
                _, w, h, _, bits, comp = struct.unpack("<IiiHHI", body[:20])
                if comp == _MJPG_FOURCC:
                    mjpeg = True
                elif comp != 0 or bits != 24:
                    raise ValueError(
                        f"unsupported AVI codec (biCompression={comp}, bits={bits})"
                    )
            elif cid == b"strh" and body[:4] == b"vids":
                scale, rate = struct.unpack("<II", body[20:28])
                fps = rate // scale if scale else 0
            elif cid[2:4] in (b"db", b"dc"):
                payloads.append(body)
            pos += 8 + ln + (ln & 1)

    try:
        walk(data[12:])
    except struct.error as e:  # truncated chunk → the documented ValueError
        raise ValueError(f"truncated AVI chunk: {e}") from e
    if w is None or h is None:
        raise ValueError("missing strf header")
    if mjpeg:
        from .jpegcodec import decode_jpeg

        return [decode_jpeg(p) for p in payloads], fps
    return [_frame_from_dib(p, w, abs(h)) for p in payloads], fps
