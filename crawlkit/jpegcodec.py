"""Real baseline-sequential JPEG codec (pure numpy, no libjpeg).

Replaces the round-1..3 "quantize + PNG container" lossy stand-in
(VERDICT r3 item #9): the bytes produced here are spec-valid JFIF
baseline JPEG — SOI/APP0/DQT/SOF0/DHT/SOS/EOI, Annex-K quantization
and Huffman tables, zigzag, DC prediction, byte stuffing — decodable
by any standards-compliant reader (libjpeg, browsers, PIL).

Design constraints (from the crawl hot path, stages/fetch.py:598 —
~1.2M `image_record` calls per frontier1m run):

* ``encode_jpeg`` is fully vectorized across ALL blocks of the image:
  batched DCT (one einsum), vectorized run-length coding (nonzero
  scatter + cumsum offsets, no per-symbol Python), and 16-pass bit
  packing (one vectorized pass per bit of the widest field). ~1 ms
  for the 32..128-px synthetic-web images.
* ``encode_jpeg(..., return_decoded=True)`` also returns the decoded
  pixels for free (dequantize + IDCT of the just-quantized
  coefficients) so the hot path never parses the bitstream it just
  wrote. The reconstruction is the SAME function the bitstream
  decoder uses, so ``decode_jpeg(encode_jpeg(px)) == decoded``
  byte-exactly (test-pinned).
* ``decode_jpeg`` handles baseline SOF0 (grayscale or YCbCr, per-
  component sampling factors 1..2 — 4:4:4 / 4:2:2 / 4:2:0), DRI/RST
  restart intervals, and arbitrary DQT/DHT segments from other
  encoders. Huffman decoding uses a precomputed 2^16 (symbol, length)
  LUT over a vectorized sliding 16-bit window, so the per-symbol loop
  is a handful of array indexings.

Reference parity note: the reference engine (e8kor/crawler,
flat_crawler/handler.go) never decodes images — it stores bytes as
fetched; the codec exists on OUR side for the north-rule per-row
invariant (decoded-pixel PSNR ≥ 40 dB for lossy formats + phash).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)  # natural position -> zigzag index inverse

# ITU-T T.81 Annex K.1 quantization tables (natural order).
QTAB_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QTAB_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables: (bits[1..16] counts, values).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]):
    """Canonical Huffman code assignment per T.81 Annex C.

    Returns (code[symbol], length[symbol]) arrays indexed by symbol
    value (0..255). Validates the table is a feasible prefix code.
    """
    assert len(bits) == 16 and sum(bits) == len(vals), "malformed Huffman spec"
    code_arr = np.zeros(256, dtype=np.uint32)
    len_arr = np.zeros(256, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            assert len_arr[sym] == 0, "duplicate symbol in Huffman spec"
            code_arr[sym] = code
            len_arr[sym] = length
            code += 1
            k += 1
        assert code <= (1 << length), "Huffman spec overflows code space"
        code <<= 1
    return code_arr, len_arr


_ENC_TABLES = {
    ("dc", 0): _canonical_codes(DC_LUM_BITS, DC_LUM_VALS),
    ("dc", 1): _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS),
    ("ac", 0): _canonical_codes(AC_LUM_BITS, AC_LUM_VALS),
    ("ac", 1): _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS),
}
# (table_id, symbol) gather forms — one fancy-index instead of two
# masked passes in the hot entropy path
_DC_CODE = np.stack([_ENC_TABLES[("dc", t)][0] for t in (0, 1)]).astype(np.int32)
_DC_LEN = np.stack([_ENC_TABLES[("dc", t)][1] for t in (0, 1)]).astype(np.int32)
_AC_CODE = np.stack([_ENC_TABLES[("ac", t)][0] for t in (0, 1)]).astype(np.int32)
_AC_LEN = np.stack([_ENC_TABLES[("ac", t)][1] for t in (0, 1)]).astype(np.int32)

_DCT8 = None


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: D @ s @ D.T == the T.81 FDCT
    (1/4 C(u)C(v) Σ…) exactly, and D.T @ S @ D is the IDCT."""
    global _DCT8
    if _DCT8 is None:
        n = np.arange(8)
        d = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
        d[0] *= np.sqrt(1.0 / 8.0)
        d[1:] *= np.sqrt(2.0 / 8.0)
        _DCT8 = d
    return _DCT8


def scaled_qtables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling of the Annex-K base tables."""
    q = int(min(100, max(1, quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QTAB_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((QTAB_CHROM * scale + 50) // 100, 1, 255)
    return lum, chrom


# ---------------------------------------------------------------- color

_RGB2Y = np.array([0.299, 0.587, 0.114])
_RGB2CB = np.array([-0.168735892, -0.331264108, 0.5])
_RGB2CR = np.array([0.5, -0.418687589, -0.081312411])


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    y = f @ _RGB2Y
    cb = f @ _RGB2CB + 128.0
    cr = f @ _RGB2CR + 128.0
    return np.stack([y, cb, cr], axis=0)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _pad_replicate(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Pad a 2-D plane to multiples of (mh, mw) by edge replication."""
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        plane = _edge_pad(plane, h + ph, w + pw)
    return plane


def _edge_pad(plane: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Edge-replicate ``plane`` up to (th, tw) — a direct allocate+
    broadcast (np.pad's generic machinery measured ~9% of batch encode
    at 378 small-plane calls per 126-image chunk)."""
    h, w = plane.shape
    out = np.empty((th, tw), dtype=plane.dtype)
    out[:h, :w] = plane
    if tw > w:
        out[:h, w:] = plane[:, w - 1 : w]
    if th > h:
        out[h:, :] = out[h - 1 : h, :]
    return out


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W % 8 == 0 → (nby*nbx, 64) raster-ordered blocks."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 64)
    )


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    """(nby*nbx, 64) raster blocks → (h, w) plane (h, w % 8 == 0)."""
    return (
        blocks.reshape(h // 8, w // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )


# ---------------------------------------------------------------- encode


def _size_category(v: np.ndarray) -> np.ndarray:
    """Bit-size category (integer bit length) of each coefficient.
    np.frexp is exact on integer magnitudes: |v| = m·2^e, 0.5 ≤ m < 1
    → e is the bit length (0 for v == 0)."""
    return np.frexp(np.abs(v))[1].astype(np.int32)


def _pack_fields_multi(
    vals: np.ndarray, lens: np.ndarray, fbounds: np.ndarray
) -> list[bytes]:
    """Pack variable-length big-endian bit fields into per-image
    entropy segments in ONE vectorized pass.

    fbounds[i]..fbounds[i+1] delimit image i's fields. Each image's
    stream starts byte-aligned, is 1-padded to a whole byte (T.81
    F.1.2.3), and is byte-stuffed (0xFF → 0xFF 0x00). Fields occupy
    disjoint bit ranges, so the value can be shifted into a 40-bit
    window aligned to its start byte (bit offset ≤ 7 + merged length
    ≤ 26 → 33 bits) and summed across 5 byte lanes (disjoint bits ⇒
    per-byte sum ≡ OR, max 255 — exact in bincount's float64).
    """
    nimg = len(fbounds) - 1
    cum = np.cumsum(lens, dtype=np.int64)
    g_start = cum - lens  # global bit start, pre-alignment
    first_f = fbounds[:-1]
    last_f = fbounds[1:] - 1
    img_bit_base = g_start[first_f]
    bits_per_img = cum[last_f] - img_bit_base
    bytes_per_img = (bits_per_img + 7) >> 3
    byte_off = np.concatenate([[0], np.cumsum(bytes_per_img)])
    img_of_field = np.repeat(np.arange(nimg), np.diff(fbounds))
    starts = g_start - img_bit_base[img_of_field] + (byte_off[:-1][img_of_field] << 3)

    byte_start = starts >> 3
    shift = 40 - (starts & 7) - lens
    shifted = (vals & ((np.int32(1) << lens) - 1)).astype(np.int64) << shift
    total_bytes = int(byte_off[-1])
    acc = np.bincount(
        byte_start, weights=(shifted >> 32) & 0xFF, minlength=total_bytes + 5
    )
    for lane, sh in ((1, 24), (2, 16), (3, 8), (4, 0)):
        acc += np.bincount(
            byte_start + lane, weights=(shifted >> sh) & 0xFF,
            minlength=total_bytes + 5,
        )
    packed = acc[:total_bytes].astype(np.uint8)
    # per-image tail 1-padding
    pads = (bytes_per_img << 3) - bits_per_img
    tail_idx = byte_off[1:] - 1
    packed[tail_idx] |= ((1 << pads) - 1).astype(np.uint8)
    # global byte stuffing, then split at stuff-adjusted image bounds
    ff = packed == 0xFF
    stuff_prefix = np.concatenate([[0], np.cumsum(ff)])
    if stuff_prefix[-1]:
        out = np.zeros(total_bytes + int(stuff_prefix[-1]), dtype=np.uint8)
        out[np.arange(total_bytes) + stuff_prefix[:-1]] = packed
    else:
        out = packed
    adj = byte_off + stuff_prefix[byte_off]
    return [out[adj[i] : adj[i + 1]].tobytes() for i in range(nimg)]


def _entropy_fields(qblocks: np.ndarray, table_ids: np.ndarray):
    """Vectorized baseline entropy coding of zigzagged quantized blocks
    → (field_values, field_lengths, fields_per_block), field order
    exactly the T.81 interleaved-scan order.

    qblocks: (nb, 64) int in MCU-interleaved order (DC already
    differenced). table_ids: (nb,) 0=luma tables, 1=chroma tables.
    """
    nb = qblocks.shape[0]
    dc = qblocks[:, 0]
    ac = qblocks[:, 1:]

    # ---- DC fields: huffman(size) + size magnitude bits
    dc_sz = _size_category(dc)
    dc_code = _DC_CODE[table_ids, dc_sz]
    dc_clen = _DC_LEN[table_ids, dc_sz]
    dc_extra = np.where(dc < 0, dc + (1 << dc_sz) - 1, dc).astype(np.int32)

    # ---- AC symbols: (run, size) with ZRL split + EOB
    b_idx, p_idx = np.nonzero(ac)  # block id, 0-based pos in 1..63 stream
    v = ac[b_idx, p_idx]  # int32 coefficients
    n_nz = len(b_idx)
    p1 = p_idx + 1  # zigzag position 1..63
    first = np.ones(n_nz, dtype=bool)
    first[1:] = b_idx[1:] != b_idx[:-1]
    prev = np.roll(p1, 1)
    prev[first] = 0
    run = p1 - prev - 1
    nzrl = run >> 4
    run16 = run & 15
    sz = _size_category(v)
    sym = (run16 << 4) | sz
    ac_tid = table_ids[b_idx]

    ac_code = _AC_CODE[ac_tid, sym]
    ac_clen = _AC_LEN[ac_tid, sym]
    zrl_code, zrl_len = _AC_CODE[:, 0xF0], _AC_LEN[:, 0xF0]
    eob_code, eob_len = _AC_CODE[:, 0x00], _AC_LEN[:, 0x00]
    ac_extra = np.where(v < 0, v + (1 << sz) - 1, v)

    # EOB for blocks whose last nonzero isn't position 63 (incl all-zero)
    last_nz = np.zeros(nb, dtype=np.int64)
    if n_nz:
        last_mask = np.ones(n_nz, dtype=bool)
        last_mask[:-1] = b_idx[:-1] != b_idx[1:]
        last_nz[b_idx[last_mask]] = p1[last_mask]
    has_eob = last_nz < 63

    # ---- direct field placement (no sort): the output field order is
    # block-major, and within a block: DC (code+extra merged into one
    # ≤20-bit field), then per nonzero (in zigzag order): nzrl ZRLs,
    # the (run,size) code + extra bits merged (≤26 bits); finally EOB
    # if present. All offsets are cumsums.
    dc_val = (dc_code << dc_sz) | dc_extra
    dc_len = dc_clen + dc_sz
    ac_val = (ac_code << sz) | ac_extra
    ac_len = ac_clen + sz

    per_nz_fields = nzrl + 1
    first_idx = np.flatnonzero(first)
    if n_nz:
        cum = np.cumsum(per_nz_fields)
        grp_start = np.empty(n_nz, dtype=np.int64)
        grp_start[0] = 0
        grp_start[1:] = cum[:-1]
        # per-block AC field counts: cum at block-last minus cum before
        # the block (= global grp_start at block-first)
        last_idx = np.flatnonzero(last_mask)
        ac_fields_per_block = np.zeros(nb, dtype=np.int64)
        ac_fields_per_block[b_idx[first_idx]] = cum[last_idx] - grp_start[first_idx]
        before_block = np.zeros(n_nz, dtype=np.int64)
        before_block[first_idx] = grp_start[first_idx]
        np.maximum.accumulate(before_block, out=before_block)
        grp_start -= before_block  # now relative to the block's AC area
    else:
        ac_fields_per_block = np.zeros(nb, dtype=np.int64)

    fields_per_block = 1 + ac_fields_per_block + has_eob
    block_off = np.concatenate([[0], np.cumsum(fields_per_block)])
    total_fields = int(block_off[-1])

    fv = np.zeros(total_fields, dtype=np.int32)
    fl = np.zeros(total_fields, dtype=np.int32)
    fv[block_off[:-1]] = dc_val
    fl[block_off[:-1]] = dc_len

    if n_nz:
        abs_start = block_off[b_idx] + 1 + grp_start
        tot_zrl = int(nzrl.sum())
        if tot_zrl:
            zpos = np.repeat(abs_start, nzrl) + (
                np.arange(tot_zrl) - np.repeat(np.cumsum(nzrl) - nzrl, nzrl)
            )
            zt = np.repeat(ac_tid, nzrl)
            fv[zpos] = zrl_code[zt]
            fl[zpos] = zrl_len[zt]
        fv[abs_start + nzrl] = ac_val
        fl[abs_start + nzrl] = ac_len

    eb = np.flatnonzero(has_eob)
    if len(eb):
        epos = block_off[1:][eb] - 1
        et = table_ids[eb]
        fv[epos] = eob_code[et]
        fl[epos] = eob_len[et]

    return fv, fl, fields_per_block


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">HH", tag, len(body) + 2) + body


def _dht_body(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


# Batch-encode internal chunk size: the per-nonzero working set falls
# out of cache past this many dense-coefficient images (see
# encode_jpeg_batch); module-level so perf probes can tune it.
# Re-probed after the int32/bincount entropy path: 4 beats 8/16
# (interleaved best-of-6: 1.45 vs 1.80/1.97 ms per mixed-size image).
_CHUNK = 4

_MARKER_CACHE: dict[int, tuple] = {}


def _marker_parts(quality: int):
    """(pre_sof_bytes, post_sof_bytes, lum_q, chrom_q) — the quality-
    dependent but image-independent marker segments, cached."""
    parts = _MARKER_CACHE.get(quality)
    if parts is None:
        lum_q, chrom_q = scaled_qtables(quality)
        pre = (
            b"\xff\xd8"
            + _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + _marker(0xFFDB, b"\x00" + bytes(lum_q[ZIGZAG].astype(np.uint8)))
            + _marker(0xFFDB, b"\x01" + bytes(chrom_q[ZIGZAG].astype(np.uint8)))
        )
        sos = bytes([3]) + b"".join(
            bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in range(3)
        ) + b"\x00\x3f\x00"
        post = (
            _marker(0xFFC4, _dht_body(0, 0, DC_LUM_BITS, DC_LUM_VALS))
            + _marker(0xFFC4, _dht_body(1, 0, AC_LUM_BITS, AC_LUM_VALS))
            + _marker(0xFFC4, _dht_body(0, 1, DC_CHROM_BITS, DC_CHROM_VALS))
            + _marker(0xFFC4, _dht_body(1, 1, AC_CHROM_BITS, AC_CHROM_VALS))
            + _marker(0xFFDA, sos)
        )
        _MARKER_CACHE[quality] = parts = (pre, post, lum_q, chrom_q)
    return parts


def encode_jpeg_batch(
    images: list[np.ndarray],
    quality: int = 92,
    subsampling: str = "444",
    return_decoded: bool = False,
):
    """Encode many (h, w, 3) uint8 RGB images → list of baseline JFIF
    JPEG byte strings, in ONE vectorized pass over the concatenated
    blocks of every image (DCT, quantize, run-length, bit-pack). This
    is the crawl hot path's entry point — per-image numpy overhead on
    32..128-px images dominates single-image encoding, so the fused
    image stage batches.

    Byte-identical to ``encode_jpeg`` per image (test-pinned).
    With return_decoded=True also returns the decoder-exact
    reconstructions (dequant+IDCT of the just-quantized coefficients —
    no bitstream re-parse)."""
    if subsampling == "444":
        sampling = [(1, 1), (1, 1), (1, 1)]
    elif subsampling == "420":
        sampling = [(2, 2), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if not images:
        return ([], []) if return_decoded else []
    # Chunk large batches: the per-nonzero working set (≈25 arrays ×
    # n_nz) falls out of L3 past ~20 images of dense q98 coefficients
    # and fancy-index/scatter ops go DRAM-latency-bound (measured 4×
    # slowdown at batch 64 vs 16). Entropy streams are per-image, so
    # chunking changes no bytes.
    if len(images) > _CHUNK:
        datas_all: list[bytes] = []
        decs_all: list[np.ndarray] = []
        for lo in range(0, len(images), _CHUNK):
            part = images[lo : lo + _CHUNK]
            if return_decoded:
                ds, rs = encode_jpeg_batch(part, quality, subsampling, True)
                datas_all.extend(ds)
                decs_all.extend(rs)
            else:
                datas_all.extend(encode_jpeg_batch(part, quality, subsampling))
        return (datas_all, decs_all) if return_decoded else datas_all
    pre, post, lum_q, chrom_q = _marker_parts(quality)
    d = _dct_matrix()
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)

    raw = []  # per (image, comp) float blocks, raster order
    metas = []  # (h, w, shapes, raw_offsets)
    key_mcu = []
    key_seq = []
    key_comp = []
    key_img = []
    n_so_far = 0
    for ii, px in enumerate(images):
        assert px.dtype == np.uint8 and px.ndim == 3 and px.shape[2] == 3
        h, w, _ = px.shape
        ycc = _rgb_to_ycbcr(px)
        if sampling[0] == (1, 1):
            planes = [ycc[0], ycc[1], ycc[2]]
        else:
            cbp = _pad_replicate(ycc[1], 2, 2)
            crp = _pad_replicate(ycc[2], 2, 2)
            cb = (cbp[0::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
            planes = [ycc[0], cb, cr]
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
        shapes = []
        offsets = []
        seq_base = 0
        for ci, (plane, (sh, sv)) in enumerate(zip(planes, sampling)):
            target_h = mcus_y * 8 * sv
            target_w = mcus_x * 8 * sh
            ph, pw = plane.shape
            if target_h != ph or target_w != pw:
                plane = _edge_pad(plane, target_h, target_w)
            raw.append(_to_blocks(plane))
            shapes.append(plane.shape)
            nby, nbx = target_h // 8, target_w // 8
            nb = nby * nbx
            offsets.append((n_so_far, n_so_far + nb))
            by, bx = np.divmod(np.arange(nb, dtype=np.int64), nbx)
            key_mcu.append((by // sv) * mcus_x + bx // sh)
            key_seq.append(seq_base + (by % sv) * sh + bx % sh)
            key_comp.append(np.full(nb, ci, dtype=np.int64))
            key_img.append(np.full(nb, ii, dtype=np.int64))
            seq_base += sh * sv
            n_so_far += nb
        metas.append((h, w, shapes, offsets))

    blocks = np.concatenate(raw, axis=0)
    comp_of = np.concatenate(key_comp)
    img_of = np.concatenate(key_img)
    mcu_of = np.concatenate(key_mcu)
    seq_of = np.concatenate(key_seq)
    tid = (comp_of > 0).astype(np.int64)

    coef = (d @ (blocks - 128.0).reshape(-1, 8, 8) @ d.T).reshape(-1, 64)
    qmat = np.stack([lum_q, chrom_q]).astype(np.float64)
    qz = np.rint(coef / qmat[tid]).astype(np.int32)[:, ZIGZAG]

    order = np.lexsort((seq_of, mcu_of, img_of))
    stream_q = qz[order]
    stream_comp = comp_of[order]
    stream_img = img_of[order]
    # DC differencing per (image, component) along the stream
    dc = stream_q[:, 0].astype(np.int64)
    for ci in range(3):
        m = stream_comp == ci
        vals = dc[m]
        imgs = stream_img[m]
        diff = np.empty_like(vals)
        diff[0] = vals[0]
        diff[1:] = vals[1:] - vals[:-1]
        firsts = np.zeros(len(vals), dtype=bool)
        firsts[0] = True
        firsts[1:] = imgs[1:] != imgs[:-1]
        diff[firsts] = vals[firsts]
        dc[m] = diff
    stream_q[:, 0] = dc  # DC diffs fit int32; entropy coding upcasts lazily

    fv, fl, fields_per_block = _entropy_fields(
        stream_q, (stream_comp > 0).astype(np.int64)
    )
    nimg = len(images)
    img_block_start = np.searchsorted(stream_img, np.arange(nimg + 1))
    block_off = np.concatenate([[0], np.cumsum(fields_per_block)])
    fbounds = block_off[img_block_start]
    ent_list = _pack_fields_multi(fv, fl, fbounds)

    datas = []
    for (h, w, shapes, offsets), ent in zip(metas, ent_list):
        sof = struct.pack(">BHHB", 8, h, w, 3) + b"".join(
            bytes([ci + 1, sh << 4 | sv, 0 if ci == 0 else 1])
            for ci, (sh, sv) in enumerate(sampling)
        )
        datas.append(pre + _marker(0xFFC0, sof) + post + ent + b"\xff\xd9")
    if not return_decoded:
        return datas

    # ---- batched reconstruction (decoder-exact; same expressions as
    # _reconstruct, one IDCT matmul over every block of every image)
    coefr = np.zeros((len(qz), 64), dtype=np.float64)
    coefr[:, ZIGZAG] = qz * qmat[tid][:, ZIGZAG]
    spatial = (d.T @ coefr.reshape(-1, 8, 8) @ d).reshape(-1, 64) + 128.0
    decs = []
    for h, w, shapes, offsets in metas:
        planes = []
        for ci, ((ph, pw), (lo, hi), (sh, sv)) in enumerate(zip(shapes, offsets, sampling)):
            plane = _from_blocks(spatial[lo:hi], ph, pw)
            plane = np.repeat(np.repeat(plane, vmax // sv, axis=0), hmax // sh, axis=1)
            planes.append(plane)
        decs.append(_ycbcr_to_rgb(planes[0], planes[1], planes[2])[:h, :w])
    return datas, decs


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 92,
    subsampling: str = "444",
    return_decoded: bool = False,
):
    """Encode (h, w, 3) uint8 RGB → baseline JFIF JPEG bytes.

    subsampling: '444' (no chroma subsampling) or '420' (2×2).
    With return_decoded=True also returns the decoder-exact
    reconstruction (h, w, 3) uint8 — computed from the quantized
    coefficients without re-parsing the bitstream."""
    if return_decoded:
        datas, decs = encode_jpeg_batch(
            [pixels], quality, subsampling, return_decoded=True
        )
        return datas[0], decs[0]
    return encode_jpeg_batch([pixels], quality, subsampling)[0]


# ---------------------------------------------------------------- decode


def _reconstruct(zz_blocks, shapes, sampling, qtabs, h, w, gray):
    """Dequantize + IDCT + upsample + color-convert. Shared by the
    bitstream decoder and encode_jpeg(return_decoded=True) so the two
    are byte-exact."""
    d = _dct_matrix()
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    planes = []
    for zz, (ph, pw), (sh, sv), q in zip(zz_blocks, shapes, sampling, qtabs):
        coef = np.zeros((len(zz), 64), dtype=np.float64)
        coef[:, ZIGZAG] = zz * q[ZIGZAG][None, :].astype(np.float64)
        spatial = (d.T @ coef.reshape(-1, 8, 8) @ d).reshape(-1, 64) + 128.0
        plane = _from_blocks(spatial, ph, pw)
        # upsample to full resolution by pixel replication
        ry = hmax // sh
        # note: sampling h is horizontal, v vertical
        plane = np.repeat(np.repeat(plane, vmax // sv, axis=0), hmax // sh, axis=1)
        planes.append(plane[: h, : w] if gray else plane)
    if gray:
        yp = np.clip(np.rint(planes[0][:h, :w]), 0, 255).astype(np.uint8)
        return np.stack([yp, yp, yp], axis=-1)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])[:h, :w]


class _BitReader:
    """Vectorized-window bit reader over an entropy-coded segment."""

    __slots__ = ("win16", "nbits", "pos")

    def __init__(self, data: np.ndarray):
        bits = np.unpackbits(data)
        self.nbits = len(bits)
        padded = np.concatenate([bits, np.zeros(16, dtype=np.uint8)])
        w = np.zeros(self.nbits + 1, dtype=np.uint16)
        for k in range(16):
            w = (w << 1) | padded[k : k + self.nbits + 1]
        self.win16 = w
        self.pos = 0


def _build_dec_lut(bits: list[int], vals: list[int]) -> np.ndarray:
    """65536-entry LUT: next-16-bits → (symbol << 8) | code_length."""
    lut = np.zeros(1 << 16, dtype=np.uint16)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut[lo:hi] = (sym << 8) | length
            code += 1
            k += 1
        code <<= 1
    return lut


def _split_entropy(data: bytes, start: int):
    """From SOS payload start, return (segments, end_pos). Segments are
    destuffed byte arrays split at RSTn markers; end_pos is the offset
    of the terminating marker (EOI or next header)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    n = len(buf)
    segments = []
    seg_start = start
    # walk only the 0xFF positions (vectorized scan; stuffed 0xFF 0x00
    # pairs are the common case and stay inside the current segment)
    ff_pos = start + np.flatnonzero(buf[start:] == 0xFF)
    for i in map(int, ff_pos):
        if i < seg_start:  # consumed as part of a previous FF pair
            continue
        nxt = int(buf[i + 1]) if i + 1 < n else None
        if nxt == 0x00:
            continue  # stuffed data byte
        if nxt is not None and 0xD0 <= nxt <= 0xD7:  # RSTn
            segments.append(_destuff(buf[seg_start:i]))
            seg_start = i + 2
            continue
        segments.append(_destuff(buf[seg_start:i]))
        return segments, i
    segments.append(_destuff(buf[seg_start:n]))
    return segments, n


def _destuff(seg: np.ndarray) -> np.ndarray:
    ff = seg == 0xFF
    if not ff.any():
        return seg
    # drop the 0x00 following each 0xFF
    drop = np.zeros(len(seg), dtype=bool)
    ff_pos = np.flatnonzero(ff[:-1] & (seg[1:] == 0x00))
    drop[ff_pos + 1] = True
    return seg[~drop]


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode JFIF JPEG bytes → (h, w, 3) uint8 RGB.

    Supports SOF0/SOF1 baseline and SOF2 progressive (spectral
    selection + successive approximation, via jpegprog.decode_scan),
    1 (grayscale) or 3 (YCbCr) components, per-component sampling
    factors 1..2, restart intervals, and arbitrary DQT/DHT tables
    (8-bit precision)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_luts: dict[int, np.ndarray] = {}
    ac_luts: dict[int, np.ndarray] = {}
    frame = None
    prog_state = None  # progressive: accumulated coefficient grids
    restart_interval = 0
    n = len(data)
    while pos < n:
        if pos + 2 > n:
            raise ValueError("truncated JPEG (mid-marker)")
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("truncated JPEG (mid-segment-length)")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if pos + 2 + seglen > n:
            raise ValueError("truncated JPEG (segment overruns stream)")
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(body):
                pq = body[off] >> 4
                tq = body[off] & 15
                if pq == 0:
                    tab = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8).astype(np.int64)
                    off += 65
                else:
                    tab = np.frombuffer(body[off + 1 : off + 129], dtype=">u2").astype(np.int64)
                    off += 129
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tab  # DQT stores zigzag order
                qtables[tq] = nat
        elif marker == 0xC4:  # DHT (may hold several tables)
            off = 0
            while off < len(body):
                tc = body[off] >> 4
                th = body[off] & 15
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                lut = _build_dec_lut(bits, vals)
                (dc_luts if tc == 0 else ac_luts)[th] = lut
                off += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline/progressive huffman JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si : 3 + 2 * si]
                scan.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 15})
            segments, endpos = _split_entropy(data, pos + 2 + seglen)
            if frame is not None and frame.get("progressive"):
                # progressive: scans ACCUMULATE coefficients; the image
                # reconstructs at EOI (jpegprog owns the scan kinds)
                from . import jpegprog

                if prog_state is None:
                    prog_state = jpegprog.init_state(frame)
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                try:
                    jpegprog.decode_scan(
                        frame, prog_state, scan, ss, se, ahal >> 4, ahal & 15,
                        dc_luts, ac_luts, segments, restart_interval,
                    )
                except (IndexError, StopIteration) as exc:
                    raise ValueError("truncated/corrupt entropy stream") from exc
                pos = endpos
                continue
            try:
                return _decode_scan(
                    frame, scan, qtables, dc_luts, ac_luts, segments, restart_interval
                )
            except (IndexError, StopIteration) as exc:
                raise ValueError("truncated/corrupt entropy stream") from exc
        pos += 2 + seglen
    if prog_state is not None:
        comps = frame["comps"]
        gray = len(comps) == 1
        sampling = [(c["h"], c["v"]) for c in comps]
        shapes = [(gy * 8, gx * 8) for gy, gx in prog_state["nblk"]]
        qtabs = [qtables[c["tq"]] for c in comps]
        if gray:
            return _reconstruct(
                prog_state["coef"], shapes, [(1, 1)], qtabs,
                frame["h"], frame["w"], gray=True,
            )
        return _reconstruct(
            prog_state["coef"], shapes, sampling, qtabs,
            frame["h"], frame["w"], gray=False,
        )
    raise ValueError("no SOS marker found")


def _decode_scan(frame, scan, qtables, dc_luts, ac_luts, segments, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcus = mcus_x * mcus_y
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    # per-scan-component lut handles, matched to frame component order
    order = []  # (comp_index, dc_lut, ac_lut) × blocks per MCU
    for s in scan:
        ci = by_id[s["cs"]]
        c = comps[ci]
        for _ in range(c["h"] * c["v"]):
            order.append((ci, dc_luts[s["td"]], ac_luts[s["ta"]]))
    blocks_per_mcu = len(order)

    # output coefficient stores, raster order per component
    nblk = [
        (mcus_y * c["v"], mcus_x * c["h"]) for c in comps
    ]  # block-grid dims per component
    coef = [np.zeros((gy * gx, 64), dtype=np.int64) for gy, gx in nblk]

    mcu_i = 0
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    dc_pred = [0] * len(comps)
    win = reader.win16
    pos = reader.pos
    nbits = reader.nbits
    while mcu_i < n_mcus:
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            reader = _BitReader(next(seg_iter))
            win = reader.win16
            pos = reader.pos
            nbits = reader.nbits
            dc_pred = [0] * len(comps)
        my, mx = divmod(mcu_i, mcus_x)
        seq_per_comp = [0] * len(comps)
        for ci, dlut, alut in order:
            c = comps[ci]
            gy, gx = nblk[ci]
            s = seq_per_comp[ci]
            by = my * c["v"] + s // c["h"]
            bx = mx * c["h"] + s % c["h"]
            seq_per_comp[ci] = s + 1
            bidx = by * gx + bx
            out = coef[ci]
            # ---- DC
            e = int(dlut[win[pos]])
            sz = e >> 8
            pos += e & 0xFF
            if sz:
                extra = int(win[pos]) >> (16 - sz)
                pos += sz
                if extra < (1 << (sz - 1)):
                    extra -= (1 << sz) - 1
            else:
                extra = 0
            dc_pred[ci] += extra
            out[bidx, 0] = dc_pred[ci]
            # ---- AC
            k = 1
            while k < 64:
                e = int(alut[win[pos]])
                sym = e >> 8
                ln = e & 0xFF
                if ln == 0:
                    raise ValueError("invalid Huffman code in AC scan")
                pos += ln
                if sym == 0x00:  # EOB
                    break
                run = sym >> 4
                sz = sym & 15
                if sz == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    raise ValueError("invalid AC symbol")
                k += run
                if k > 63:
                    raise ValueError("AC run overflows block")
                extra = int(win[pos]) >> (16 - sz)
                pos += sz
                if extra < (1 << (sz - 1)):
                    extra -= (1 << sz) - 1
                out[bidx, k] = extra
                k += 1
            if pos > nbits:
                raise ValueError("entropy segment truncated")
        mcu_i += 1

    gray = len(comps) == 1
    sampling = [(c["h"], c["v"]) for c in comps]
    shapes = [(gy * 8, gx * 8) for gy, gx in nblk]
    qtabs = [qtables[c["tq"]] for c in comps]
    if gray:
        return _reconstruct(coef, shapes, [(1, 1)], qtabs, h, w, gray=True)
    return _reconstruct(coef, shapes, sampling, qtabs, h, w, gray=False)
