"""Ogg container (RFC 3533) + the Xiph Ogg-FLAC mapping (pure stdlib
+ numpy).

The audio parallel of mp4codec.py: modern crawls hand back Ogg streams
(Opus/Vorbis/FLAC), so the audio stages must demux real pages —
capture pattern, lacing, packet continuation, page CRC — even where
the payload codec stays an out-of-sandbox seam (Opus/Vorbis:
table-heavy perceptual specs). One mapping decodes end-to-end for
real: Ogg FLAC (first packet ``0x7F FLAC`` + native header, one native
FLAC frame per packet), through crawlkit.flaccodec.

Page CRC is Ogg's direct (non-reflected) CRC-32, poly 0x04C11DB7,
init 0, no final xor — verified on decode and emitted on encode.
"""

from __future__ import annotations

import struct

import numpy as np

_CAPTURE = b"OggS"

# direct CRC-32 table (MSB-first, poly 0x04C11DB7)
_CRC_TABLE = np.zeros(256, dtype=np.uint32)
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
        _r &= 0xFFFFFFFF
    _CRC_TABLE[_i] = _r
_CRC_LIST = [int(v) for v in _CRC_TABLE]


def ogg_crc(data: bytes) -> int:
    crc = 0
    tab = _CRC_LIST
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ tab[((crc >> 24) & 0xFF) ^ b]
    return crc


def _page(
    serial: int, seq: int, flags: int, granule: int, segments: list[bytes]
) -> bytes:
    lacing = bytearray()
    for seg in segments:
        lacing.append(len(seg))
    hdr = (
        _CAPTURE
        + b"\x00"
        + bytes([flags])
        + struct.pack("<q", granule)
        + struct.pack("<III", serial, seq, 0)
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    body = b"".join(segments)
    crc = ogg_crc(hdr + body)
    return hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body


def ogg_encode_packets(
    packets: list[bytes],
    serial: int = 0x6372776C,
    granules: list[int] | None = None,
) -> bytes:
    """Lay packets into Ogg pages: lacing values of 255 continue a
    packet, <255 terminate it (a multiple-of-255 packet gets a
    terminating 0 lacing value); ≤255 segments per page, packets
    spanning pages set the continued flag. ``granules[i]`` is the
    granule position after packet i completes (default: packet index);
    a page ending mid-packet carries granule -1 per the RFC."""
    if granules is None:
        granules = list(range(1, len(packets) + 1))
    # flatten into (lacing value, payload, completes_packet_index|None)
    segs: list[tuple[bytes, int | None]] = []
    for pi, p in enumerate(packets):
        pos = 0
        while True:
            chunk = p[pos : pos + 255]
            pos += len(chunk)
            if len(chunk) == 255:
                segs.append((chunk, None))
                if pos == len(p):  # exact multiple: 0-lacing terminator
                    segs.append((b"", pi))
                    break
            else:
                segs.append((chunk, pi))
                break
    pages = []
    seq = 0
    i = 0
    continued = False
    while i < len(segs) or seq == 0:
        batch = segs[i : i + 255]
        i += len(batch)
        flags = 0x01 if continued else 0x00
        if seq == 0:
            flags |= 0x02  # BOS
        if i >= len(segs):
            flags |= 0x04  # EOS
        done = [pi for _, pi in batch if pi is not None]
        granule = granules[done[-1]] if done else -1
        pages.append(_page(serial, seq, flags, granule, [s for s, _ in batch]))
        continued = bool(batch) and batch[-1][1] is None
        seq += 1
        if not batch:
            break
    return b"".join(pages)


def ogg_decode_packets(data: bytes) -> list[bytes]:
    """Parse pages of the FIRST logical stream (serial of the first
    BOS page) → complete packets, verifying capture pattern, version
    and CRC page by page."""
    packets: list[bytes] = []
    partial = bytearray()
    pos = 0
    serial = None
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != _CAPTURE:
            raise ValueError("lost Ogg capture sync")
        version = data[pos + 4]
        if version != 0:
            raise ValueError(f"Ogg version {version} unsupported")
        flags = data[pos + 5]
        pserial, _seq, crc = struct.unpack_from("<III", data, pos + 14)
        nsegs = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + nsegs]
        if len(lacing) < nsegs:
            raise ValueError("truncated Ogg lacing table")
        body_len = sum(lacing)
        page_end = pos + 27 + nsegs + body_len
        if page_end > len(data):
            raise ValueError("truncated Ogg page body")
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        if serial is None:
            if not flags & 0x02:
                raise ValueError("first page is not BOS")
            serial = pserial
        if pserial == serial:
            if not flags & 0x01 and partial:
                # new page must continue the pending packet
                raise ValueError("packet truncated at page boundary")
            off = pos + 27 + nsegs
            for lv in lacing:
                partial += data[off : off + lv]
                off += lv
                if lv < 255:
                    packets.append(bytes(partial))
                    partial.clear()
        pos = page_end
    if partial:
        raise ValueError("stream ends mid-packet")
    return packets


# ------------------------------------------------------- Ogg-FLAC mapping

_OGG_FLAC_MAGIC = b"\x7fFLAC"


def encode_ogg_flac(samples: np.ndarray, rate: int, **kw) -> bytes:
    """int16 PCM → Ogg FLAC per the Xiph mapping: first packet is the
    mapping header (0x7F 'FLAC' ver 1.0, header count, native
    'fLaC'+STREAMINFO with the last-metadata flag CLEAR), followed by
    the mandatory VORBIS_COMMENT header packet (vendor only, last flag
    set), then one native FLAC frame per packet. Header packets carry
    granule 0; audio packets carry cumulative samples."""
    from .audiometa import build_vorbis_comment
    from .flaccodec import encode_flac_parts

    header, frames = encode_flac_parts(samples, rate, **kw)
    # STREAMINFO is no longer the last metadata block: clear bit 7 of
    # its block header (byte 4, after 'fLaC').
    si = bytearray(header)
    si[4] &= 0x7F
    vc_body = build_vorbis_comment("crawlkit", {})
    vc_block = bytes([0x84]) + struct.pack(">I", len(vc_body))[1:] + vc_body
    first = _OGG_FLAC_MAGIC + b"\x01\x00" + struct.pack(">H", 1) + bytes(si)
    x = np.asarray(samples)
    n = x.shape[0]
    blocksize = kw.get("blocksize", 4096)
    granules = [0, 0] + [min((i + 1) * blocksize, n) for i in range(len(frames))]
    return ogg_encode_packets([first, vc_block] + frames, granules=granules)


def decode_ogg_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Ogg FLAC → (samples int16, rate). Reassembles the native FLAC
    stream from packets (mapping header + frames) and hands it to
    flaccodec — tolerant of any frame-per-packet granularity."""
    packets = ogg_decode_packets(data)
    if not packets or not packets[0].startswith(_OGG_FLAC_MAGIC):
        raise ValueError("not an Ogg FLAC stream")
    p0 = packets[0]
    if len(p0) < 9:
        raise ValueError("truncated Ogg FLAC mapping header")
    # Header packets are verbatim native FLAC metadata blocks, so the
    # native stream is simply every packet spliced back together; the
    # count field is only a sanity hint (0x0000 means 'unknown' per the
    # mapping), NOT a skip count — conformant streams clear
    # STREAMINFO's last-metadata flag and rely on the chain to end at
    # the block whose flag is set.
    (nheaders,) = struct.unpack_from(">H", p0, 7)
    if nheaders > len(packets) - 1:
        raise ValueError("Ogg FLAC header count exceeds packet count")
    native = p0[9:] + b"".join(packets[1:])
    from .flaccodec import decode_flac

    return decode_flac(native)
