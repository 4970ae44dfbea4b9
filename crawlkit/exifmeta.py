"""EXIF metadata for JPEG images: extract / inject / privacy-scrub.

EXIF is a TIFF IFD embedded in a JPEG APP1 segment (``Exif\\0\\0`` +
a full II/MM TIFF header) — the reader reuses tiffcodec's IFD walk.
The scrub operator is the realistic crawl-pipeline use: image corpora
must strip GPS (and optionally all metadata) before training-data
release, WITHOUT touching the entropy-coded pixel stream. Segment
surgery here edits only the marker stream before SOS, so decoded
pixels are byte-identical (test-pinned).

Supported fields (the common, deterministic subset): Make(271),
Model(272), Orientation(274), DateTime(306), and a GPS sub-IFD
(pointer tag 34853) with latitude/longitude refs + 3-rational values.
Unknown IFD0 tags survive extract (reported raw) and are dropped on
rebuild — scrubbing is allowed to be lossy for exotic tags, never for
pixels.
"""

from __future__ import annotations

import struct

from crawlkit.tiffcodec import _read_ifd

_EXIF_SIG = b"Exif\x00\x00"

# tags we name in extract() output
_IFD0_TAGS = {271: "make", 272: "model", 274: "orientation", 306: "datetime"}
_GPS_PTR = 34853


# ------------------------------------------------------------ IFD builder


def _entry(tag: int, typ: int, vals, data_area: bytearray, data_base: int):
    """One 12-byte IFD entry; values >4 bytes go to the data area."""
    if typ == 2:  # ASCII (NUL-terminated)
        blob = vals.encode("ascii") + b"\x00"
        count = len(blob)
    elif typ == 3:
        blob = struct.pack("<" + str(len(vals)) + "H", *vals)
        count = len(vals)
    elif typ == 4:
        blob = struct.pack("<" + str(len(vals)) + "I", *vals)
        count = len(vals)
    elif typ == 5:  # RATIONAL pairs
        flat = [x for pair in vals for x in pair]
        blob = struct.pack("<" + str(len(flat)) + "I", *flat)
        count = len(vals)
    else:
        raise ValueError(f"unsupported EXIF type {typ}")
    if len(blob) <= 4:
        val = blob.ljust(4, b"\x00")
    else:
        val = struct.pack("<I", data_base + len(data_area))
        data_area += blob
    return struct.pack("<HHI", tag, typ, count) + val


def _build_ifd(entries: list[tuple[int, int, object]], base: int) -> bytes:
    """Serialize one little-endian IFD at absolute offset ``base``
    (entries sorted by tag, data area appended, no next-IFD)."""
    entries = sorted(entries)
    hdr_len = 2 + 12 * len(entries) + 4
    data_area = bytearray()
    body = b""
    for tag, typ, vals in entries:
        body += _entry(tag, typ, vals, data_area, base + hdr_len)
    return (
        struct.pack("<H", len(entries)) + body + struct.pack("<I", 0) + bytes(data_area)
    )


def build_exif(fields: dict) -> bytes:
    """fields → APP1 payload (``Exif\\0\\0`` + TIFF). Recognized keys:
    make, model, orientation, datetime, gps=(lat_ref, lat3, lon_ref,
    lon3) with lat3/lon3 = three (num, den) rationals."""
    tiff_base = len(_EXIF_SIG)  # offsets inside the TIFF stream
    ifd0: list[tuple[int, int, object]] = []
    if "make" in fields:
        ifd0.append((271, 2, fields["make"]))
    if "model" in fields:
        ifd0.append((272, 2, fields["model"]))
    if "orientation" in fields:
        ifd0.append((274, 3, [int(fields["orientation"])]))
    if "datetime" in fields:
        ifd0.append((306, 2, fields["datetime"]))
    gps = fields.get("gps")
    if gps is not None:
        ifd0.append((_GPS_PTR, 4, [0]))  # patched once IFD0 size known
    # IFD0 starts at TIFF offset 8; iterate to fix the GPS pointer
    ifd0_off = 8
    ifd0_bytes = _build_ifd(ifd0, ifd0_off)
    if gps is not None:
        gps_off = ifd0_off + len(ifd0_bytes)
        ifd0 = [e if e[0] != _GPS_PTR else (_GPS_PTR, 4, [gps_off]) for e in ifd0]
        ifd0_bytes = _build_ifd(ifd0, ifd0_off)
        assert ifd0_off + len(ifd0_bytes) == gps_off  # size is value-stable
        lat_ref, lat3, lon_ref, lon3 = gps
        gps_ifd = _build_ifd(
            [(1, 2, lat_ref), (2, 5, lat3), (3, 2, lon_ref), (4, 5, lon3)],
            gps_off,
        )
    else:
        gps_ifd = b""
    tiff = b"II\x2a\x00" + struct.pack("<I", ifd0_off) + ifd0_bytes + gps_ifd
    return _EXIF_SIG + tiff


def parse_exif(payload: bytes) -> dict:
    """APP1 payload → field dict (inverse of :func:`build_exif` for
    the supported tags; unknown IFD0 tags land under ``raw``)."""
    if not payload.startswith(_EXIF_SIG):
        raise ValueError("not an EXIF payload")
    t = payload[len(_EXIF_SIG) :]
    if t[:4] == b"II\x2a\x00":
        e = "<"
    elif t[:4] == b"MM\x00\x2a":
        e = ">"
    else:
        raise ValueError("EXIF payload lacks a TIFF header")
    # truncated/malformed IFDs surface as struct.error from _read_ifd —
    # normalize to ValueError so callers have a single error contract
    try:
        (ifd_off,) = struct.unpack_from(e + "I", t, 4)
        tags = _read_ifd(t, e, ifd_off)
    except struct.error as exc:
        raise ValueError(f"malformed EXIF IFD: {exc}") from exc
    out: dict = {"raw": {}}
    for tag, vals in tags.items():
        if tag in (271, 272, 306):
            out[_IFD0_TAGS[tag]] = vals[0].split(b"\x00")[0].decode("ascii", "replace")
        elif tag == 274:
            out["orientation"] = int(vals[0])
        elif tag == _GPS_PTR:
            try:
                g = _read_ifd(t, e, int(vals[0]))
            except struct.error as exc:
                raise ValueError(f"malformed EXIF GPS IFD: {exc}") from exc
            if 1 in g and 2 in g and 3 in g and 4 in g:
                out["gps"] = (
                    g[1][0].split(b"\x00")[0].decode("ascii", "replace"),
                    [tuple(map(int, r)) for r in g[2]],
                    g[3][0].split(b"\x00")[0].decode("ascii", "replace"),
                    [tuple(map(int, r)) for r in g[4]],
                )
        else:
            out["raw"][tag] = vals
    return out


# --------------------------------------------------------- JPEG surgery


def _segments(data: bytes):
    """Yield (marker, seg_start, seg_end) for marker segments after SOI
    up to (not including) SOS/EOI; entropy data is never scanned."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("lost JPEG marker sync")
        marker = data[pos + 1]
        if marker in (0xDA, 0xD9):  # SOS / EOI: stop before entropy data
            return
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        yield marker, pos, pos + 2 + ln
        pos += 2 + ln


def exif_extract(data: bytes) -> dict | None:
    """First EXIF APP1 in a JPEG → field dict, or None."""
    for marker, lo, hi in _segments(data):
        if marker == 0xE1 and data[lo + 4 : lo + 10] == _EXIF_SIG:
            return parse_exif(data[lo + 4 : hi])
    return None


def exif_inject(data: bytes, fields: dict) -> bytes:
    """Insert (or replace) the EXIF APP1. Placed after a leading APP0
    (JFIF wants APP0 first) else right after SOI; pixels untouched."""
    payload = build_exif(fields)
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    out = bytearray()
    inserted = False
    pos = 2
    out += data[:2]
    for marker, lo, hi in _segments(data):
        if marker == 0xE1 and data[lo + 4 : lo + 10] == _EXIF_SIG:
            if not inserted:
                out += seg
                inserted = True
            pos = hi  # drop the old EXIF
            continue
        out += data[lo:hi]
        pos = hi
        if marker == 0xE0 and not inserted:  # after APP0
            out += seg
            inserted = True
    if not inserted:
        out = bytearray(data[:2]) + seg
        pos = 2
        for _, lo, hi in _segments(data):
            out += data[lo:hi]
            pos = hi
    out += data[pos:]
    return bytes(out)


def exif_strip(data: bytes, gps_only: bool = False) -> bytes:
    """Remove EXIF: the whole APP1 (default) or just the GPS sub-IFD
    (``gps_only`` — rebuilds the APP1 from its recognized fields).
    The entropy-coded stream is copied verbatim either way."""
    out = bytearray(data[:2])
    pos = 2
    for marker, lo, hi in _segments(data):
        if marker == 0xE1 and data[lo + 4 : lo + 10] == _EXIF_SIG:
            if gps_only:
                fields = parse_exif(data[lo + 4 : hi])
                fields.pop("gps", None)
                fields.pop("raw", None)
                payload = build_exif(fields)
                out += b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
            pos = hi
            continue
        out += data[lo:hi]
        pos = hi
    out += data[pos:]
    return bytes(out)
