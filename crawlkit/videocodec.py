"""Real minimal AVI (RIFF) container codec — uncompressed DIB,
Motion-JPEG, and MS-RLE8 video, the video sibling of audiocodec.py's
PCM WAV.

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
* 'MRLE' streams (biCompression=1): 8-bit palettized frames in the
  Microsoft RLE8 wire format (encoded runs, absolute runs, EOL / EOB
  / delta escapes) with the palette in strf — the classic Video for
  Windows codec; decode honors all four escapes.

Inter-frame transform codecs (h264/vp9/...) still need pyav/ffmpeg
outside the sandbox; ``avi_decode`` raises cleanly on their
biCompression values.
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
_BI_RLE8 = 1  # biCompression for Microsoft RLE8


def rle8_encode_indices(idx: np.ndarray) -> bytes:
    """One 8-bit palettized frame (h, w) → MS-RLE8 bytes. Emits encoded
    runs (count, index), absolute runs (0, n>=3, n indices, word-pad)
    for literal stretches, EOL (0,0) after every row but the last-
    written one, and EOB (0,1). Bottom-up row order, per the DIB spec."""
    h, w = idx.shape
    out = bytearray()
    for r in range(h - 1, -1, -1):
        row = idx[r]
        # run-length split of the row
        cut = np.flatnonzero(row[1:] != row[:-1]) + 1
        starts = np.concatenate([[0], cut])
        ends = np.concatenate([cut, [w]])
        i = 0
        n_runs = len(starts)
        while i < n_runs:
            ln = int(ends[i] - starts[i])
            if ln >= 3 or n_runs == 1:
                while ln > 255:
                    out += bytes((255, int(row[starts[i]])))
                    ln -= 255
                if ln:
                    out += bytes((ln, int(row[starts[i]])))
                i += 1
                continue
            # gather short runs into one absolute block (min 3 pixels)
            j = i
            px = 0
            while j < n_runs and px + (ends[j] - starts[j]) <= 254:
                if ends[j] - starts[j] >= 6:  # long run: stop the literal
                    break
                px += int(ends[j] - starts[j])
                j += 1
            seg = row[starts[i] : starts[i] + px]
            if px >= 3:
                out += bytes((0, px)) + seg.tobytes()
                if px & 1:
                    out += b"\x00"  # absolute runs are word-aligned
            else:  # 1-2 leftover pixels → encoded runs of length 1-2
                for v, ln2 in zip(seg, np.ones(px, int)):
                    out += bytes((1, int(v)))
            i = j if j > i else i + 1
        if r != 0:
            out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    return bytes(out)


def rle8_decode_indices(data: bytes, w: int, h: int) -> np.ndarray:
    """MS-RLE8 bytes → (h, w) uint8 palette indices (top-down array).
    Honors encoded runs, absolute runs, EOL, EOB, and delta (0,2)."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x, y = 0, h - 1  # DIB rows are bottom-up
    pos, n = 0, len(data)
    while pos + 2 <= n:
        c, v = data[pos], data[pos + 1]
        pos += 2
        if c:  # encoded run
            end = min(x + c, w)
            idx[y, x:end] = v
            x = end
        elif v == 0:  # EOL
            x, y = 0, y - 1
            if y < 0:  # EOL after the last row: only EOB may follow
                if data[pos : pos + 2] == b"\x00\x01":
                    return idx
                raise ValueError("RLE8 ran past the last row")
        elif v == 1:  # EOB
            return idx
        elif v == 2:  # delta: skip (dx, dy) — skipped cells stay 0
            if pos + 2 > n:
                raise ValueError("truncated RLE8 delta")
            x = min(x + data[pos], w)
            y -= data[pos + 1]
            pos += 2
            if y < 0:
                raise ValueError("RLE8 delta ran off the bitmap")
        else:  # absolute run of v indices, word-aligned
            if pos + v > n:
                raise ValueError("truncated RLE8 absolute run")
            end = min(x + v, w)
            idx[y, x:end] = np.frombuffer(data, np.uint8, end - x, pos)
            x = end
            pos += v + (v & 1)
    raise ValueError("RLE8 stream ended without EOB")


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
    so per-frame numpy overhead doesn't scale with clip length.
    codec='rle8' writes Microsoft RLE8 (biCompression 1, 8-bit): all
    frames share one median-cut palette (carried in strf) and each
    frame is an independent RLE8 bitmap — lossy via the quantize, like
    a GIF of every frame."""
    if not frames:
        raise ValueError("empty frame list")
    h, w, _ = frames[0].shape
    pal_bytes = b""
    if codec == "mjpeg":
        from .jpegcodec import encode_jpeg_batch

        payloads = encode_jpeg_batch(frames, quality=quality)
        fourcc, comp, chunk_id, bits = b"MJPG", _MJPG_FOURCC, b"00dc", 24
        frame_sz = max(len(p) for p in payloads)
    elif codec == "rle8":
        from .gifcodec import _build_palette, quantize_median_cut

        stack = quantize_median_cut(np.concatenate(frames, axis=0))
        pal, idx_all = _build_palette(stack)
        payloads = [
            rle8_encode_indices(idx_all[i * h : (i + 1) * h])
            for i in range(len(frames))
        ]
        rgbquad = np.zeros((256, 4), dtype=np.uint8)
        rgbquad[: len(pal), 0] = pal[:, 2]  # B
        rgbquad[: len(pal), 1] = pal[:, 1]  # G
        rgbquad[: len(pal), 2] = pal[:, 0]  # R
        pal_bytes = rgbquad.tobytes()
        fourcc, comp, chunk_id, bits = b"MRLE", _BI_RLE8, b"00dc", 8
        frame_sz = max(len(p) for p in payloads)
    elif codec == "raw":
        payloads = [_dib_from_frame(f) for f in frames]
        fourcc, comp, chunk_id, bits = b"DIB ", 0, b"00db", 24
        frame_sz = len(payloads[0])
    else:
        raise ValueError(f"unsupported codec {codec!r} (raw | mjpeg | rle8)")

    strf = (
        struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bits, comp, frame_sz, 0, 0,
            256 if pal_bytes else 0, 0,
        )
        + pal_bytes
    )
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
    kind = "raw"
    palette = None
    payloads: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal w, h, fps, kind, palette
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
                    kind = "mjpeg"
                elif comp == _BI_RLE8 and bits == 8:
                    kind = "rle8"
                    quads = np.frombuffer(body, np.uint8, len(body) - 40, 40)
                    quads = quads[: (len(quads) // 4) * 4].reshape(-1, 4)
                    palette = quads[:, 2::-1].copy()  # BGRx → RGB
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
    if kind == "mjpeg":
        from .jpegcodec import decode_jpeg

        return [decode_jpeg(p) for p in payloads], fps
    if kind == "rle8":
        if palette is None or not len(palette):
            raise ValueError("RLE8 stream without a palette")
        return [
            palette[rle8_decode_indices(p, w, abs(h))] for p in payloads
        ], fps
    return [_frame_from_dib(p, w, abs(h)) for p in payloads], fps


def decode_video(data: bytes) -> tuple[list[np.ndarray], int]:
    """Container-sniffing video decode → ([frames], fps): RIFF-AVI
    (raw DIB / MJPEG / MS-RLE8, above) or ISO-BMFF MP4/MOV
    ('jpeg'/'raw ' sample entries — mp4codec.py). The per-row sniff
    mirrors decode_audio's WAV/FLAC contract so mixed-container video
    corpora flow through one stage."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return avi_decode(data)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        from .mp4codec import mp4_decode

        return mp4_decode(data)
    raise ValueError("unrecognized video container")
