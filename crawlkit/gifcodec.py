"""Real GIF decoder (+ fixture encoder) — stdlib/numpy only.

Web-crawl image corpora are full of GIFs (the reference's target site
serves them in listings); this closes the palette-image half of the
codec matrix the way flaccodec closed compressed audio. Scope is the
full decode path of the public GIF89a specification:

* GIF87a/GIF89a headers, logical screen descriptor, global color
  table, per-image local color tables (sizes 2..256),
* image descriptors with sub-rectangle placement and the 4-pass
  interlace row order,
* LZW decompression: variable code width (LSB-first packing), clear /
  end-of-information codes, dictionary growth to 4096 with deferred
  clear (table-full streams keep coding without reset), and the
  KwKwK special case,
* extension blocks: Graphic Control (disposal method, transparency
  index, frame delay), Application (NETSCAPE2.0 loop count), Comment
  and Plain Text (skipped by sub-block walk),
* animation compositing: disposal 0/1 (leave), 2 (restore to
  background), 3 (restore to previous), transparent pixels preserving
  the underlying canvas.

``encode_gif`` / ``encode_gif_animation`` are the fixture generators:
spec-valid encoders (real variable-width LZW, optional interlace,
per-frame local palettes, delta frames via transparency) that exercise
every decode path end-to-end in tests. GIF is palette-lossy for
>256-color sources, so ``quantize_median_cut`` is provided to derive a
GIF-exact source image first (encode of a quantized image is lossless
— the per-row decoded-pixel invariant then holds exactly, like PNG).

Like the other codecs this is honest about its seam: a production
swap drops in Pillow behind the same decode(bytes) → pixels surface.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR87 = b"GIF87a"
_HDR89 = b"GIF89a"


# ------------------------------------------------------------------ LZW


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> np.ndarray:
    """Decode a GIF LZW stream (already de-sub-blocked) → uint8 indices.

    Variable width starting at min_code_size+1, LSB-first bit packing,
    early width growth (width++ the moment next_code reaches 2^width),
    deferred clear (at 4096 entries the dictionary freezes until the
    encoder sends a clear code — or never does). Tolerates a missing
    end-of-information code at stream end (common in the wild)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    first = np.zeros(4096, dtype=np.uint8)
    roots = np.arange(clear, dtype=np.uint8)
    suffix[:clear] = roots
    first[:clear] = roots

    out = np.empty(max_pixels, dtype=np.uint8)
    n_out = 0
    stack = np.empty(4096, dtype=np.uint8)

    width = min_code_size + 1
    next_code = eoi + 1
    prev = -1
    pos = 0
    total_bits = len(data) * 8
    while pos + width <= total_bits:
        byte_pos = pos >> 3
        window = int.from_bytes(data[byte_pos : byte_pos + 3], "little")
        code = (window >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("LZW stream starts with a non-root code")
            if n_out >= max_pixels:
                break
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            emit = code
            fb = first[code]
            extra = -1
        elif code == next_code and next_code < 4096:
            emit = prev  # KwKwK: entry(prev) + first(prev)
            fb = first[prev]
            extra = int(fb)
        else:
            raise ValueError(f"LZW code {code} beyond dictionary {next_code}")
        sp = 0
        cc = emit
        while cc >= 0:
            stack[sp] = suffix[cc]
            sp += 1
            cc = prefix[cc]
        take = min(sp, max_pixels - n_out)
        out[n_out : n_out + take] = stack[:sp][::-1][:take]
        n_out += take
        if extra >= 0 and n_out < max_pixels:
            out[n_out] = extra
            n_out += 1
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = fb
            first[next_code] = first[prev]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
        if n_out >= max_pixels:
            break
    return out[:n_out]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Encode uint8 palette indices as a GIF LZW stream (fixture path).

    Emits an initial clear code, grows width in lockstep with the
    decoder's early-change rule, and resets via clear when the
    dictionary fills (so the >4096-entry path is exercised on large
    fixtures). Pure-Python per-pixel loop — fixture generation only."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # (current_code, next_byte) -> code, as a dense table (4096×256 int16)
    table = np.full((4096, 256), -1, dtype=np.int16)

    acc = 0
    acc_bits = 0
    out = bytearray()
    width = min_code_size + 1
    next_code = eoi + 1

    def put(code: int) -> None:
        # canonical (giflib) schedule: write at the current width, THEN
        # grow if the next slot no longer fits — so the first code at
        # the new width is the one *after* next_code reaches 2^width
        # (the decoder's one-entry-behind table stays in sync)
        nonlocal acc, acc_bits, width
        acc |= code << acc_bits
        acc_bits += width
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8
        if next_code >= (1 << width) and width < 12:
            width += 1

    put(clear)
    seq = indices.tolist()
    if not seq:
        put(eoi)
    else:
        cur = seq[0]
        for px in seq[1:]:
            cand = table[cur, px]
            if cand >= 0:
                cur = int(cand)
                continue
            put(cur)
            if next_code < 4096:
                table[cur, px] = next_code
                next_code += 1
            else:  # dictionary full → reset (decoder's clear path)
                put(clear)
                table[:] = -1
                width = min_code_size + 1
                next_code = eoi + 1
            cur = px
        put(cur)
        put(eoi)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes as GIF data sub-blocks (≤255 each + terminator)."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        parts.append(data[pos : pos + n])
        pos += n
    return b"".join(parts), pos


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(h: int) -> np.ndarray:
    """Source-row order of the 4-pass GIF interlace for height h."""
    return np.concatenate([np.arange(start, h, step) for start, step in _INTERLACE_PASSES])


# ------------------------------------------------------------------ decode


def decode_gif_frames(
    data: bytes,
) -> tuple[list[np.ndarray], list[int], int]:
    """Decode all frames → (composited (h,w,3) uint8 frames,
    per-frame delays in centiseconds, loop count (0 = forever,
    -1 = no NETSCAPE loop block))."""
    if data[:6] not in (_HDR87, _HDR89):
        raise ValueError("not a GIF")
    W, H, packed, bg_idx, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_idx < len(gct):
        bg = gct[bg_idx]
    else:
        bg = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((H, W, 3), dtype=np.uint8)
    canvas[:] = bg

    frames: list[np.ndarray] = []
    delays: list[int] = []
    loop = -1
    # pending graphic-control state (applies to the next image)
    disposal, transparent, delay = 0, -1, 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                body, pos = _read_sub_blocks(data, pos)
                flags, delay = struct.unpack("<BH", body[:3])
                disposal = (flags >> 2) & 0x07
                transparent = body[3] if flags & 0x01 else -1
            elif label == 0xFF:  # application
                body, pos = _read_sub_blocks(data, pos)
                if body[:11] == b"NETSCAPE2.0" and len(body) >= 14 and body[11] == 1:
                    loop = struct.unpack("<H", body[12:14])[0]
            else:  # comment / plain text / unknown: skip sub-blocks
                _, pos = _read_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with neither global nor local palette")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(min_code, lzw, w * h)
        if len(idx) < w * h:  # truncated stream: pad with background index
            idx = np.concatenate(
                [idx, np.zeros(w * h - len(idx), dtype=np.uint8)]
            )
        idx = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in pass order
            dest = np.empty_like(idx)
            dest[_interlace_rows(h)] = idx
            idx = dest
        if idx.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = pal[idx]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        disposal, transparent, delay = 0, -1, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays, loop


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 — the still-image view
    (what the image pipelines consume via imagecodec.decode's sniff)."""
    frames, _, _ = decode_gif_frames(data)
    return frames[0]


# ------------------------------------------------------------------ encode


def _build_palette(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (n,3) uint8 sorted by packed value, index image). Raises
    if the image has more than 256 distinct colors (quantize first)."""
    h, w, _ = pixels.shape
    packed = (
        pixels[:, :, 0].astype(np.uint32) << 16
        | pixels[:, :, 1].astype(np.uint32) << 8
        | pixels[:, :, 2].astype(np.uint32)
    ).ravel()
    colors, inverse = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"{len(colors)} distinct colors — GIF needs ≤256 (quantize_median_cut)"
        )
    pal = np.stack(
        [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF], axis=1
    ).astype(np.uint8)
    return pal, inverse.reshape(h, w).astype(np.uint8)


def _color_table_bits(n_colors: int) -> int:
    """Smallest b with 2^(b+1) ≥ max(n_colors, 2) (GIF size field)."""
    bits = 0
    while (2 << bits) < max(n_colors, 2):
        bits += 1
    return bits


def _palette_bytes(pal: np.ndarray, bits: int) -> bytes:
    n = 2 << bits
    padded = np.zeros((n, 3), dtype=np.uint8)
    padded[: len(pal)] = pal
    return padded.tobytes()


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Encode one (h, w, 3) uint8 RGB frame with ≤256 distinct colors as
    a GIF89a (global palette, real LZW, optional interlace). Lossless
    for palette-sized inputs — decode_gif returns the exact pixels."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w, _ = pixels.shape
    pal, idx = _build_palette(pixels)
    bits = _color_table_bits(len(pal))
    out = bytearray(_HDR89)
    out += struct.pack("<HHBBB", w, h, 0x80 | bits, 0, 0)
    out += _palette_bytes(pal, bits)
    if interlace:
        idx = idx[_interlace_rows(h)]
    min_code = max(2, bits + 1)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    out += _sub_blocks(_lzw_encode(idx.ravel(), min_code))
    out.append(0x3B)
    return bytes(out)


def encode_gif_animation(
    frames: list[np.ndarray],
    delays: list[int] | None = None,
    disposals: list[int] | None = None,
    loop: int = 0,
    delta: bool = False,
    bg_index: int = 0,
) -> bytes:
    """Fixture animation encoder: full-canvas frames in, GIF89a out.

    Each frame gets its own LOCAL color table (exercising the per-image
    palette path), a Graphic Control block (delay in centiseconds,
    disposal per ``disposals``), and a NETSCAPE2.0 loop block.

    ``delta=True`` encodes frame k>0 as its minimal changed bounding
    rectangle vs the prior *composited* canvas with unchanged pixels as
    a transparent index — the real animated-GIF layout (sub-rectangle
    placement + transparency + disposal interplay). Only valid with
    disposal 0/1 frames (delta is vs the kept canvas)."""
    assert frames, "need at least one frame"
    h, w, _ = frames[0].shape
    delays = delays or [10] * len(frames)
    disposals = disposals or [1] * len(frames)
    pal0, _ = _build_palette(frames[0])
    bits0 = _color_table_bits(len(pal0))
    out = bytearray(_HDR89)
    out += struct.pack("<HHBBB", w, h, 0x80 | bits0, bg_index, 0)
    out += _palette_bytes(pal0, bits0)
    out += b"\x21\xff" + _sub_blocks(b"NETSCAPE2.0" + struct.pack("<BH", 1, loop))
    canvas = None
    for k, frame in enumerate(frames):
        assert frame.shape == (h, w, 3) and frame.dtype == np.uint8
        left = top = 0
        fh, fw = h, w
        sub = frame
        transparent = -1
        if delta and canvas is not None and disposals[k] in (0, 1):
            changed = (frame != canvas).any(axis=2)
            if changed.any():
                ys, xs = np.nonzero(changed)
                top, left = int(ys.min()), int(xs.min())
                fh, fw = int(ys.max()) - top + 1, int(xs.max()) - left + 1
            else:
                top = left = 0
                fh = fw = 1
            sub = frame[top : top + fh, left : left + fw].copy()
            keep = ~changed[top : top + fh, left : left + fw]
            pal_probe, _ = _build_palette(sub)
            if len(pal_probe) < 256 and keep.any():
                # pick a color absent from the sub-rect as transparent
                used = set(
                    (pal_probe[:, 0].astype(int) << 16)
                    | (pal_probe[:, 1].astype(int) << 8)
                    | pal_probe[:, 2].astype(int)
                )
                free = next(c for c in range(1 << 24) if c not in used)
                sub[keep] = [(free >> 16) & 0xFF, (free >> 8) & 0xFF, free & 0xFF]
            else:
                keep = None
        else:
            keep = None
        pal, idx = _build_palette(sub)
        if keep is not None and keep.any():
            free_rgb = sub[keep][0]
            packed = (
                int(free_rgb[0]) << 16 | int(free_rgb[1]) << 8 | int(free_rgb[2])
            )
            pal_packed = (
                pal[:, 0].astype(int) << 16
                | pal[:, 1].astype(int) << 8
                | pal[:, 2].astype(int)
            )
            transparent = int(np.nonzero(pal_packed == packed)[0][0])
        bits = _color_table_bits(len(pal))
        flags = (disposals[k] & 0x07) << 2 | (1 if transparent >= 0 else 0)
        out += b"\x21\xf9" + _sub_blocks(
            struct.pack("<BHB", flags, delays[k], max(transparent, 0))
        )
        min_code = max(2, bits + 1)
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0x80 | bits)
        out += _palette_bytes(pal, bits)
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(idx.ravel(), min_code))
        if disposals[k] in (0, 1):
            canvas = frame.copy()
        elif disposals[k] == 2:
            canvas = np.zeros((h, w, 3), dtype=np.uint8)
            canvas[:] = pal0[bg_index] if bg_index < len(pal0) else 0
        # disposal 3 keeps the pre-frame canvas; fixtures don't chain it
    out.append(0x3B)
    return bytes(out)


# ------------------------------------------------------------------ quantize


def quantize_median_cut(pixels: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """Median-cut palette quantization → (h, w, 3) uint8 with ≤n_colors
    distinct colors (deterministic: boxes split on the widest channel
    at the median, ties to the lowest channel index; each box maps to
    its rounded mean color). encode_gif of the result is lossless."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3).astype(np.int32)
    colors, inverse, counts = np.unique(
        flat[:, 0] << 16 | flat[:, 1] << 8 | flat[:, 2],
        return_inverse=True,
        return_counts=True,
    )
    uniq = np.stack(
        [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF], axis=1
    )
    if len(uniq) <= n_colors:
        return pixels.copy()
    boxes = [np.arange(len(uniq))]
    while len(boxes) < n_colors:
        # split the most-populous splittable box
        order = sorted(
            range(len(boxes)),
            key=lambda b: int(counts[boxes[b]].sum()),
            reverse=True,
        )
        for bi in order:
            members = boxes[bi]
            if len(members) > 1:
                break
        else:
            break
        sub = uniq[members]
        spans = sub.max(axis=0) - sub.min(axis=0)
        ch = int(np.argmax(spans))
        sort_idx = members[np.argsort(sub[:, ch], kind="stable")]
        csum = np.cumsum(counts[sort_idx])
        half = csum[-1] / 2
        cut = int(np.searchsorted(csum, half)) + 1
        cut = min(max(cut, 1), len(sort_idx) - 1)
        boxes[bi] = sort_idx[:cut]
        boxes.append(sort_idx[cut:])
    color_map = np.empty((len(uniq), 3), dtype=np.uint8)
    for members in boxes:
        weight = counts[members].astype(np.float64)
        mean = (uniq[members] * weight[:, None]).sum(axis=0) / weight.sum()
        color_map[members] = np.rint(mean).clip(0, 255).astype(np.uint8)
    return color_map[inverse].reshape(h, w, 3)
