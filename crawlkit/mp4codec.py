"""Minimal ISO-BMFF (MP4/MOV) video mux/demux (pure stdlib + numpy).

Real container plumbing for the multimodal video tier: modern crawls
hand back MP4, not AVI, so the frame-sample / scene-cut / near-dup
stages must demux the real box structure (ftyp/moov/trak/mdia/stbl)
even where the sample payload codec is out of sandbox scope (h264 —
documented seam). Two sample-entry codecs decode for real end-to-end:

- ``jpeg``: Motion-JPEG samples — each sample is a full baseline JFIF
  stream through crawlkit.jpegcodec (real entropy coding both ways).
- ``raw ``: uncompressed 24-bit RGB rows, top-down.

The muxer writes ftyp + mdat + moov with a single video track: mvhd/
tkhd/mdhd at version 0, one stts run, one chunk (stsc), per-sample
stsz, one stco offset. The demuxer walks the real box tree (64-bit
largesize and to-end boxes included), picks the first ``vide`` track,
and rebuilds sample extents from stts/stsc/stsz/stco — the same walk
a real-codec deployment would keep, swapping only the frame decode.
"""

from __future__ import annotations

import struct

import numpy as np

from crawlkit import jpegcodec

_CONTAINERS = {"moov", "trak", "mdia", "minf", "stbl", "dinf"}


def _box(typ: str, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), typ.encode("ascii")) + payload


def _full(typ: str, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def mp4_encode(
    frames: list[np.ndarray], fps: int = 10, codec: str = "mjpeg",
    quality: int = 92,
) -> bytes:
    """Mux (h, w, 3) uint8 frames → single-video-track MP4 bytes.
    ``codec``: 'mjpeg' (real JFIF samples) | 'raw' (RGB24 samples).
    ``quality``: MJPEG JFIF quality (same knob as avi_encode; q98 is
    the PSNR>=40dB archive bar, see jpegcodec notes)."""
    assert frames, "need at least one frame"
    h, w, _ = frames[0].shape
    if codec == "mjpeg":
        fourcc = "jpeg"
        samples = jpegcodec.encode_jpeg_batch(frames, quality=quality)
    elif codec == "raw":
        fourcc = "raw "
        samples = [np.ascontiguousarray(f).tobytes() for f in frames]
    else:
        raise ValueError(f"mp4 codec {codec!r} unsupported (mjpeg|raw)")
    n = len(samples)

    ftyp = _box("ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat = _box("mdat", b"".join(samples))
    mdat_payload_off = len(ftyp) + 8

    # ---- sample tables
    name = b"\x0ccrawlkit mux" + b"\x00" * 19  # 32-byte pascal-ish field
    sample_entry = _box(
        fourcc,
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + name
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full("stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full("stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full("stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        "stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full("stco", 0, 0, struct.pack(">II", 1, mdat_payload_off))
    stbl = _box("stbl", stsd + stts + stsc + stsz + stco)

    url = _full("url ", 0, 1, b"")  # self-contained
    dref = _full("dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box("dinf", dref)
    vmhd = _full("vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box("minf", vmhd + dinf + stbl)
    hdlr = _full(
        "hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    mdhd = _full(
        "mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0),  # timescale=fps, Δ=1
    )
    mdia = _box("mdia", mdhd + hdlr + minf)
    tkhd = _full(
        "tkhd", 0, 7,
        struct.pack(">III", 0, 0, 1)  # times, track id
        + struct.pack(">I", 0)  # reserved
        + struct.pack(">I", n)  # duration
        + b"\x00" * 8
        + struct.pack(">hhhH", 0, 0, 0, 0)  # layer/group/volume
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box("trak", tkhd + mdia)
    mvhd = _full(
        "mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    moov = _box("moov", mvhd + trak)
    return ftyp + mdat + moov


# ----------------------------------------------------------------- demux


def _walk(data: bytes, lo: int, hi: int):
    """Yield (type, payload_lo, payload_hi) for boxes in data[lo:hi]."""
    pos = lo
    while pos + 8 <= hi:
        size, typ = struct.unpack_from(">I4s", data, pos)
        body = pos + 8
        if size == 1:
            if pos + 16 > hi:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = hi - pos
        if size < body - pos or pos + size > hi:
            raise ValueError("malformed box size")
        yield typ.decode("latin1"), body, pos + size
        pos += size


def _find(data: bytes, lo: int, hi: int, *path: str):
    """Descend a box path; returns (payload_lo, payload_hi) or None."""
    for name in path:
        found = None
        for typ, blo, bhi in _walk(data, lo, hi):
            if typ == name:
                found = (blo, bhi)
                break
        if found is None:
            return None
        lo, hi = found
    return lo, hi


def _u32s(data: bytes, off: int, n: int):
    return struct.unpack_from(">" + str(n) + "I", data, off)


def mp4_decode(data: bytes) -> tuple[list[np.ndarray], int]:
    """Demux+decode MP4/MOV bytes → ([frames], fps). Picks the first
    ``vide`` track; supports 'jpeg' (MJPEG) and 'raw ' (RGB24) sample
    entries — any other fourcc raises NotImplementedError with the
    fourcc named (the documented compressed-codec seam)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream")
    try:
        moov = _find(data, 0, len(data), "moov")
        if moov is None:
            raise ValueError("no moov box")
        vide = None
        for typ, blo, bhi in _walk(data, *moov):
            if typ != "trak":
                continue
            mdia = _find(data, blo, bhi, "mdia")
            if mdia is None:
                continue
            hdlr = _find(data, *mdia, "hdlr")
            if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
                continue
            vide = mdia
            break
        if vide is None:
            raise ValueError("no video track")
        mdhd = _find(data, *vide, "mdhd")
        timescale = 0
        if mdhd is not None:
            ver = data[mdhd[0]]
            timescale = _u32s(data, mdhd[0] + (20 if ver == 1 else 12), 1)[0]
        stbl = _find(data, *vide, "minf", "stbl")
        if stbl is None:
            raise ValueError("no sample table")
        boxes = {t: (blo, bhi) for t, blo, bhi in _walk(data, *stbl)}
        for req in ("stsd", "stsz", "stco" if "stco" in boxes else "co64"):
            if req not in boxes:
                raise ValueError(f"missing {req}")

        sd = boxes["stsd"][0] + 8  # skip fullbox hdr + entry_count
        entry_size, fourcc = struct.unpack_from(">I4s", data, sd)
        fourcc = fourcc.decode("latin1")
        w, h = struct.unpack_from(">HH", data, sd + 32)

        # stsz → sample sizes
        szlo = boxes["stsz"][0] + 4
        fixed, count = _u32s(data, szlo, 2)
        sizes = (
            [fixed] * count if fixed else list(_u32s(data, szlo + 8, count))
        )
        # stco/co64 → chunk offsets
        if "stco" in boxes:
            clo = boxes["stco"][0] + 4
            (nchunks,) = _u32s(data, clo, 1)
            offsets = list(_u32s(data, clo + 4, nchunks))
        else:
            clo = boxes["co64"][0] + 4
            (nchunks,) = _u32s(data, clo, 1)
            offsets = list(struct.unpack_from(">" + str(nchunks) + "Q", data, clo + 4))
        # stsc → samples per chunk (runs)
        runs = []
        if "stsc" in boxes:
            slo = boxes["stsc"][0] + 4
            (nruns,) = _u32s(data, slo, 1)
            for i in range(nruns):
                first, spc, _ = _u32s(data, slo + 4 + 12 * i, 3)
                runs.append((first, spc))
        else:
            runs = [(1, count)]

        # expand chunk → sample mapping
        extents: list[tuple[int, int]] = []
        si = 0
        for ci in range(nchunks):
            spc = 0
            for first, v in runs:
                if ci + 1 >= first:
                    spc = v
            pos = offsets[ci]
            for _ in range(spc):
                if si >= count:
                    break
                extents.append((pos, sizes[si]))
                pos += sizes[si]
                si += 1
        if si < count:
            raise ValueError("sample table covers fewer samples than stsz")
    except struct.error as exc:
        raise ValueError(f"truncated MP4: {exc}") from exc

    frames = []
    # sample decode honors the same ValueError/NotImplementedError-only
    # error contract as the box walk: a corrupt MJPEG sample raises
    # struct.error deep in the entropy decoder — normalize it here so
    # VideoSceneCuts / SigExplode (which catch ValueError) survive it
    try:
        for off, size in extents:
            blob = data[off : off + size]
            if len(blob) < size:
                raise ValueError("sample extends past end of file")
            if fourcc == "jpeg":
                frames.append(jpegcodec.decode_jpeg(blob))
            elif fourcc == "raw ":
                if size < h * w * 3:
                    raise ValueError("raw sample too small")
                frames.append(
                    np.frombuffer(blob, np.uint8, h * w * 3).reshape(h, w, 3).copy()
                )
            else:
                raise NotImplementedError(
                    f"mp4 sample codec {fourcc!r} needs an out-of-sandbox decoder"
                )
    except (struct.error, KeyError, IndexError) as exc:
        # fuzzing shows corrupt JFIF headers also surface as KeyError
        # (huffman/component id lookups) and IndexError, not just
        # struct.error — normalize all three
        raise ValueError(f"corrupt MP4 sample: {exc!r}") from exc
    return frames, int(timescale) if timescale else 10
