"""VORBIS_COMMENT metadata for FLAC streams: extract / inject / scrub.

The audio parallel of exifmeta.py. FLAC carries tags in a
VORBIS_COMMENT metadata block (type 4): little-endian length-prefixed
UTF-8 ``KEY=value`` strings plus a vendor string. Crawled audio
corpora must strip identifying tags (ARTIST, LOCATION, …) before
training-data release WITHOUT touching the audio frames — block
surgery here edits only the metadata chain, so decoded samples are
identical (test-pinned).

Keys are case-insensitive per the Vorbis spec (stored as given,
matched uppercased).
"""

from __future__ import annotations

import struct

_VC_TYPE = 4


def build_vorbis_comment(vendor: str, comments: dict[str, list[str] | str]) -> bytes:
    """(vendor, {key: value(s)}) → VORBIS_COMMENT block body."""
    vb = vendor.encode("utf-8")
    out = struct.pack("<I", len(vb)) + vb
    items: list[bytes] = []
    for k, vs in comments.items():
        if isinstance(vs, str):
            vs = [vs]
        for v in vs:
            items.append(f"{k}={v}".encode("utf-8"))
    out += struct.pack("<I", len(items))
    for it in items:
        out += struct.pack("<I", len(it)) + it
    return out


def parse_vorbis_comment(body: bytes) -> tuple[str, dict[str, list[str]]]:
    """Inverse of :func:`build_vorbis_comment`; keys uppercased."""
    try:
        (vlen,) = struct.unpack_from("<I", body, 0)
        vendor = body[4 : 4 + vlen].decode("utf-8", "replace")
        pos = 4 + vlen
        (count,) = struct.unpack_from("<I", body, pos)
        pos += 4
        comments: dict[str, list[str]] = {}
        for _ in range(count):
            (ln,) = struct.unpack_from("<I", body, pos)
            pos += 4
            item_b = body[pos : pos + ln]
            if len(item_b) < ln:
                raise ValueError("truncated comment")
            pos += ln
            key, _, val = item_b.decode("utf-8", "replace").partition("=")
            comments.setdefault(key.upper(), []).append(val)
    except struct.error as exc:
        raise ValueError(f"malformed VORBIS_COMMENT: {exc}") from exc
    return vendor, comments


# ------------------------------------------------------ FLAC block chain


def _blocks(data: bytes):
    """Yield (btype, is_last, body_lo, body_hi) over the metadata
    chain; stops after the last block (frames follow)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        hdr = data[pos]
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        lo, hi = pos + 4, pos + 4 + ln
        if hi > len(data):
            raise ValueError("truncated metadata block body")
        yield hdr & 0x7F, bool(hdr & 0x80), lo, hi
        pos = hi
        if hdr & 0x80:
            return


def _reassemble(data: bytes, keep: list[tuple[int, bytes]], frames_at: int) -> bytes:
    out = bytearray(b"fLaC")
    for i, (btype, body) in enumerate(keep):
        last = 0x80 if i == len(keep) - 1 else 0
        out += bytes([last | btype]) + len(body).to_bytes(3, "big") + body
    return bytes(out) + data[frames_at:]


def flac_comments_extract(data: bytes) -> tuple[str, dict[str, list[str]]] | None:
    """First VORBIS_COMMENT block → (vendor, comments), or None."""
    for btype, _last, lo, hi in _blocks(data):
        if btype == _VC_TYPE:
            return parse_vorbis_comment(data[lo:hi])
    return None


def flac_comments_inject(
    data: bytes, vendor: str, comments: dict[str, list[str] | str]
) -> bytes:
    """Insert (or replace) the VORBIS_COMMENT block after STREAMINFO;
    audio frames copied verbatim."""
    body = build_vorbis_comment(vendor, comments)
    keep: list[tuple[int, bytes]] = []
    frames_at = 4
    placed = False
    for btype, _last, lo, hi in _blocks(data):
        frames_at = hi
        if btype == _VC_TYPE:
            if not placed:
                keep.append((_VC_TYPE, body))
                placed = True
            continue
        keep.append((btype, data[lo:hi]))
        if btype == 0 and not placed:  # right after STREAMINFO
            keep.append((_VC_TYPE, body))
            placed = True
    if not placed:
        keep.append((_VC_TYPE, body))
    return _reassemble(data, keep, frames_at)


def flac_comments_strip(data: bytes, keys: list[str] | None = None) -> bytes:
    """Remove tags: the whole VORBIS_COMMENT block (default) or only
    the given keys (case-insensitive; vendor and other keys kept).
    Audio frames copied verbatim either way."""
    drop = {k.upper() for k in keys} if keys is not None else None
    keep: list[tuple[int, bytes]] = []
    frames_at = 4
    for btype, _last, lo, hi in _blocks(data):
        frames_at = hi
        if btype == _VC_TYPE:
            if drop is None:
                continue
            vendor, comments = parse_vorbis_comment(data[lo:hi])
            kept = {k: v for k, v in comments.items() if k not in drop}
            keep.append((_VC_TYPE, build_vorbis_comment(vendor, kept)))
            continue
        keep.append((btype, data[lo:hi]))
    if not keep:
        raise ValueError("cannot strip: no metadata blocks at all")
    return _reassemble(data, keep, frames_at)
