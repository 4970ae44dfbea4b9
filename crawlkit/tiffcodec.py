"""Baseline TIFF 6.0 codec (pure stdlib + numpy).

Real wire format for the crawl's image tier (reference stores scraped
images as opaque blobs — otodom/flat_crawler/handler.go:92-122; the
engine's multimodal stages sniff containers per row, SURVEY §2
multimodal). Scope:

- decode: classic TIFF, both byte orders (``II``/``MM``); striped
  baseline images; Compression 1 (none), 32773 (PackBits), 5 (LZW,
  MSB-first codes with the TIFF early-change rule); Predictor 2
  (horizontal differencing); PhotometricInterpretation 0 (WhiteIsZero),
  1 (BlackIsZero), 2 (RGB), 3 (palette via ColorMap); 8 bits/sample,
  chunky planar config.
- encode: little-endian RGB, single or multi strip, compression
  ``none`` | ``packbits`` | ``lzw`` (optionally with predictor 2).

Lossless: decode(encode(px)) == px exactly (test-pinned), so TIFF rows
in the mixed corpus keep their phash. LZW here is the TIFF variant —
MSB-first bit packing, 9→12-bit codes, Clear=256/EOI=257, width bump
one code EARLY — deliberately not shared with gifcodec's LSB-first
variant (the two differ in bit order, early-change, and block framing).
"""

from __future__ import annotations

import struct

import numpy as np

_II = b"II\x2a\x00"
_MM = b"MM\x00\x2a"

# type id -> byte size (BYTE, ASCII, SHORT, LONG, RATIONAL, SBYTE,
# UNDEFINED, SSHORT, SLONG, SRATIONAL)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}

_CLEAR = 256
_EOI = 257


# ------------------------------------------------------------- PackBits


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9). -128 control bytes are no-ops."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n and len(out) < expected:
        c = data[pos]
        pos += 1
        if c < 128:  # literal run of c+1 bytes
            out += data[pos : pos + c + 1]
            pos += c + 1
        elif c > 128:  # repeat next byte 257-c times
            out += data[pos : pos + 1] * (257 - c)
            pos += 1
        # c == 128: no-op
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs ≥3 become repeats, else literals ≤128."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        # measure run length at pos
        run = 1
        while pos + run < n and run < 128 and data[pos + run] == data[pos]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[pos])
            pos += run
            continue
        # literal: extend until a run of ≥3 starts or 128 bytes
        lit_start = pos
        pos += run
        while pos < n and pos - lit_start < 128:
            run = 1
            while pos + run < n and run < 3 and data[pos + run] == data[pos]:
                run += 1
            if run >= 3:
                break
            pos += run
        chunk = data[lit_start : min(pos, lit_start + 128)]
        pos = lit_start + len(chunk)
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


# ------------------------------------------------------ TIFF-variant LZW


def lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF LZW (6.0 §13): MSB-first codes, initial width 9, table
    starts at 258, width bumps at 510/1022/2046 (early change)."""
    buf = data + b"\x00\x00"  # 3-byte read window never overruns
    nbits = len(data) * 8
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    pos = 0
    prev: bytes | None = None
    while pos + width <= nbits and len(out) < expected:
        i = pos >> 3
        window = (buf[i] << 16) | (buf[i + 1] << 8) | buf[i + 2]
        code = (window >> (24 - (pos & 7) - width)) & ((1 << width) - 1)
        pos += width
        if code == _EOI:
            break
        if code == _CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if code > len(table) or (prev is None and code >= len(table)):
            raise ValueError("corrupt LZW stream: code beyond table")
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by one entry, so it bumps at 2^w - 2 (510/1022/2046)
        # where the encoder bumps at 2^w - 1 (511/1023/2047)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out[:expected])


def lzw_encode(data: bytes) -> bytes:
    """Inverse of :func:`lzw_decode` (same early-change discipline)."""
    out_bits: list[tuple[int, int]] = []  # (code, width)
    # table keyed by (current_code << 8) | next_byte — avoids building
    # byte-string keys in the per-byte hot loop
    table: dict[int, int] = {}
    next_code = 258
    width = 9
    out_bits.append((_CLEAR, width))
    w = -1  # current table code; literals are their own codes
    for ch in data:
        if w < 0:
            w = ch
            continue
        key = (w << 8) | ch
        nxt = table.get(key)
        if nxt is not None:
            w = nxt
            continue
        out_bits.append((w, width))
        table[key] = next_code
        next_code += 1
        # early change, encoder side: bump when the next id to assign
        # reaches 2^width - 1 (TIFF 6.0 §13: 511/1023/2047, one early)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: reset
            out_bits.append((_CLEAR, width))
            table = {}
            next_code = 258
            width = 9
        w = ch
    if w >= 0:
        out_bits.append((w, width))
    out_bits.append((_EOI, width))
    # MSB-first bit packing
    acc = 0
    nacc = 0
    out = bytearray()
    for code, cw in out_bits:
        acc = (acc << cw) | code
        nacc += cw
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


# Early-change consistency: the decoder adds entries one step behind
# the encoder (it can only add after seeing the next code), so its
# 2^w - 2 bump lands on the same code position in the stream as the
# encoder's 2^w - 1 bump; the round-trip property test sweeps streams
# long enough to cross the 9→10→11→12 boundaries and a table reset.


# ----------------------------------------------------------------- read


def _read_ifd(data: bytes, e: str, off: int) -> dict[int, list]:
    (count,) = struct.unpack_from(e + "H", data, off)
    tags: dict[int, list] = {}
    for i in range(count):
        tag, typ, n = struct.unpack_from(e + "HHI", data, off + 2 + 12 * i)
        vpos = off + 2 + 12 * i + 8
        size = _TYPE_SIZE.get(typ, 1) * n
        if size > 4:
            (vpos,) = struct.unpack_from(e + "I", data, vpos)
        if typ in _TYPE_FMT:
            vals = list(struct.unpack_from(e + str(n) + _TYPE_FMT[typ], data, vpos))
        elif typ in (5, 10):  # (S)RATIONAL pairs
            flat = struct.unpack_from(
                e + str(2 * n) + ("I" if typ == 5 else "i"), data, vpos
            )
            vals = [(flat[2 * k], flat[2 * k + 1]) for k in range(n)]
        else:  # ASCII / UNDEFINED: raw bytes
            vals = [data[vpos : vpos + n]]
        tags[tag] = vals
    return tags


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode TIFF bytes → (h, w, 3) uint8 RGB (first IFD only)."""
    if data[:4] == _II:
        e = "<"
    elif data[:4] == _MM:
        e = ">"
    else:
        raise ValueError("not a TIFF stream")
    try:
        (ifd_off,) = struct.unpack_from(e + "I", data, 4)
        tags = _read_ifd(data, e, ifd_off)
        w = int(tags[256][0])
        h = int(tags[257][0])
        offsets = [int(x) for x in tags[273]]
    except (struct.error, KeyError, IndexError) as exc:
        raise ValueError(f"truncated/malformed TIFF: {exc}") from exc
    bps = [int(x) for x in tags.get(258, [8])]
    spp = int(tags.get(277, [len(bps)])[0])
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"BitsPerSample {bps} unsupported (8 only)")
    if int(tags.get(284, [1])[0]) != 1:
        raise NotImplementedError("planar (non-chunky) TIFF unsupported")
    comp = int(tags.get(259, [1])[0])
    photometric = int(tags.get(262, [1])[0])
    predictor = int(tags.get(317, [1])[0])
    counts = [int(x) for x in tags.get(279, [len(data) - offsets[0]])]
    rows_per_strip = int(tags.get(278, [h])[0])

    row_bytes = w * spp
    raw = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        expected = nrows * row_bytes
        strip = data[o : o + c]
        if comp == 1:
            raw += strip[:expected]
        elif comp == 32773:
            raw += packbits_decode(strip, expected)
        elif comp == 5:
            raw += lzw_decode(strip, expected)
        else:
            raise NotImplementedError(f"TIFF compression {comp} unsupported")
    px = np.frombuffer(bytes(raw), dtype=np.uint8)
    if len(px) < h * row_bytes:  # tolerate truncated final strip
        px = np.concatenate([px, np.zeros(h * row_bytes - len(px), np.uint8)])
    px = px[: h * row_bytes].reshape(h, w, spp)
    if predictor == 2:
        px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")

    if photometric == 2:  # RGB (extra samples ignored)
        if spp < 3:
            raise ValueError("RGB photometric with <3 samples")
        return np.ascontiguousarray(px[:, :, :3])
    if photometric in (0, 1):  # grayscale
        g = px[:, :, 0]
        if photometric == 0:
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if photometric == 3:  # palette
        if 320 not in tags:
            raise ValueError("palette TIFF without ColorMap")
        cmap = tags[320]
        n = len(cmap) // 3
        pal = (np.array(cmap, dtype=np.uint32).reshape(3, n).T // 257).astype(
            np.uint8
        )
        return pal[px[:, :, 0]]
    raise NotImplementedError(f"TIFF photometric {photometric} unsupported")


# ---------------------------------------------------------------- write


def encode_tiff(
    pixels: np.ndarray,
    compression: str = "none",
    predictor: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB → little-endian striped TIFF.

    ``compression``: ``none`` | ``packbits`` | ``lzw``; ``predictor=2``
    (horizontal differencing, LZW/PackBits only per TIFF convention,
    though the format allows any combo) is applied per strip row.
    """
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w, _ = pixels.shape
    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    if rows_per_strip is None:
        rows_per_strip = h if compression == "none" else max(1, min(h, 32))

    src = pixels
    if predictor == 2:
        d = pixels.astype(np.int16)
        d[:, 1:, :] -= pixels[:, :-1, :].astype(np.int16)
        src = (d & 0xFF).astype(np.uint8)
    elif predictor != 1:
        raise ValueError("predictor must be 1 or 2")

    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = src[y0 : y0 + rows_per_strip].tobytes()
        if comp_tag == 1:
            strips.append(raw)
        elif comp_tag == 32773:
            strips.append(packbits_encode(raw))
        else:
            strips.append(lzw_encode(raw))

    nstrips = len(strips)
    # layout: header(8) | IFD | overflow values | strip data
    entries = []  # (tag, type, count, packed-value-or-None, overflow bytes)

    def entry(tag, typ, vals):
        fmt = _TYPE_FMT[typ]
        size = _TYPE_SIZE[typ] * len(vals)
        blob = struct.pack("<" + str(len(vals)) + fmt, *vals)
        entries.append((tag, typ, len(vals), blob if size <= 4 else None, blob))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8, 8, 8])
    entry(259, 3, [comp_tag])
    entry(262, 3, [2])
    entry(273, 4, [0] * nstrips)  # patched below
    entry(277, 3, [3])
    entry(278, 4, [rows_per_strip])
    entry(279, 4, [len(s) for s in strips])
    if predictor == 2:
        entry(317, 3, [2])

    n = len(entries)
    ifd_off = 8
    over_off = ifd_off + 2 + 12 * n + 4
    # pass 1: assign overflow offsets (blob lengths are already final —
    # tag 273's placeholder blob has the real length), find strip data
    over_pos = over_off
    offs = {}
    for tag, typ, cnt, packed, blob in entries:
        if packed is None:
            offs[tag] = over_pos
            over_pos += len(blob)
    data_off = over_pos
    strip_offs = []
    pos = data_off
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    # pass 2: serialize with the real strip offsets in tag 273
    body = struct.pack("<H", n)
    overflow = bytearray()
    for tag, typ, cnt, packed, blob in entries:
        if tag == 273:
            blob = struct.pack("<" + str(nstrips) + "I", *strip_offs)
            packed = blob if len(blob) <= 4 else None
        if packed is not None:
            val = packed.ljust(4, b"\x00")
        else:
            val = struct.pack("<I", offs[tag])
            overflow += blob
        body += struct.pack("<HHI", tag, typ, cnt) + val
    body += struct.pack("<I", 0)  # no next IFD
    return _II + struct.pack("<I", ifd_off) + body + bytes(overflow) + b"".join(
        strips
    )
