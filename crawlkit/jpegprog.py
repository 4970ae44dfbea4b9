"""Progressive JPEG (SOF2) support: scan decoding + a fixture encoder.

Real web image corpora are a mix of baseline and progressive JPEG —
a crawler that only decodes SOF0 drops roughly a tenth of real JPEGs.
This module adds the progressive half of ITU-T T.81:

* ``decode_scan`` implements the four progressive scan kinds of Annex
  G.2 — DC first (spectral band 0, successive-approximation bit Al),
  DC refinement (one raw bit per block), AC first (per-component
  spectral bands with EOB runs), and AC refinement (correction bits
  for history coefficients + sign bits for newly-significant ones).
  ``jpegcodec.decode_jpeg`` drives it from its marker loop: scans
  accumulate into per-component coefficient grids and the image
  reconstructs at EOI with the SAME dequant+IDCT the baseline path
  uses, so a progressive stream of the same quantized coefficients
  decodes byte-identically to its baseline twin (test-pinned).
* ``encode_jpeg_progressive`` is the test-fixture generator: a
  spec-valid progressive encoder (the standard 10-scan luma/chroma
  script: DC-first at Al=1, split AC bands, successive-approximation
  refinements) with per-scan flat Huffman tables built from each
  scan's own symbol histogram. It is deliberately simple Python —
  the crawl hot path keeps the vectorized BASELINE encoder; this
  exists so the decoder has real progressive bitstreams to chew on
  without libjpeg in the sandbox.

Both directions follow the public T.81 algorithm (G.1.2.2-3 point
transforms: DC uses an arithmetic shift, AC shifts the MAGNITUDE and
re-applies the sign; EOB-run correction bits buffer across skipped
blocks and flush with the EOBn symbol).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegcodec import (
    ZIGZAG,
    _BitReader,
    _dct_matrix,
    _dht_body,
    _marker,
    _marker_parts,
    _pad_replicate,
    _rgb_to_ycbcr,
    _to_blocks,
)

# ---------------------------------------------------------------- decode


class _Bits:
    """Scalar-read cursor over a _BitReader's 16-bit sliding windows."""

    __slots__ = ("win", "pos", "nbits")

    def __init__(self, reader: _BitReader):
        self.win = reader.win16
        self.pos = 0
        self.nbits = reader.nbits

    def get(self, n: int) -> int:
        v = int(self.win[self.pos]) >> (16 - n)
        self.pos += n
        return v

    def bit(self) -> int:
        v = int(self.win[self.pos]) >> 15
        self.pos += 1
        return v

    def huff(self, lut: np.ndarray) -> int:
        e = int(lut[self.win[self.pos]])
        ln = e & 0xFF
        if ln == 0:
            raise ValueError("invalid Huffman code in progressive scan")
        self.pos += ln
        return e >> 8

    def check(self) -> None:
        if self.pos > self.nbits:
            raise ValueError("entropy segment truncated")


def _extend(v: int, sz: int) -> int:
    if sz and v < (1 << (sz - 1)):
        return v - (1 << sz) + 1
    return v


def init_state(frame: dict) -> dict:
    """Per-component coefficient grids (MCU-padded, zigzag order) that
    progressive scans accumulate into."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    nblk = [(mcus_y * c["v"], mcus_x * c["h"]) for c in comps]
    return {
        "hmax": hmax,
        "vmax": vmax,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "nblk": nblk,
        "coef": [np.zeros((gy * gx, 64), dtype=np.int64) for gy, gx in nblk],
    }


def _subgrid(frame: dict, state: dict, ci: int) -> tuple[int, int]:
    """Non-interleaved scans cover the component's OWN block grid
    (ceil of its scaled dimensions), not the MCU-padded one."""
    c = frame["comps"][ci]
    cw = -(-frame["w"] * c["h"] // state["hmax"])
    ch = -(-frame["h"] * c["v"] // state["vmax"])
    return -(-ch // 8), -(-cw // 8)


def decode_scan(
    frame: dict,
    state: dict,
    scan: list[dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_luts: dict,
    ac_luts: dict,
    segments: list,
    restart_interval: int,
) -> None:
    """Decode one progressive scan into ``state['coef']`` (T.81 G.2)."""
    comps = frame["comps"]
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    sel = [by_id[s["cs"]] for s in scan]

    seg_iter = iter(segments)
    bits = _Bits(_BitReader(next(seg_iter)))

    if ss == 0:  # ---- DC scan (first or refinement)
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        if ah == 0:
            luts = [dc_luts[s["td"]] for s in scan]
        pred = [0] * len(comps)
        interleaved = len(scan) > 1
        if interleaved:
            units = state["mcus_x"] * state["mcus_y"]
        else:
            gy, gx = _subgrid(frame, state, sel[0])
            units = gy * gx
        for u in range(units):
            if restart_interval and u and u % restart_interval == 0:
                bits = _Bits(_BitReader(next(seg_iter)))
                pred = [0] * len(comps)
            if interleaved:
                my, mx = divmod(u, state["mcus_x"])
                targets = []
                for si, ci in enumerate(sel):
                    c = comps[ci]
                    _, pgx = state["nblk"][ci]
                    for s in range(c["h"] * c["v"]):
                        by = my * c["v"] + s // c["h"]
                        bx = mx * c["h"] + s % c["h"]
                        targets.append((si, ci, by * pgx + bx))
            else:
                ci = sel[0]
                _, pgx = state["nblk"][ci]
                by, bx = divmod(u, _subgrid(frame, state, ci)[1])
                targets = [(0, ci, by * pgx + bx)]
            for si, ci, bidx in targets:
                out = state["coef"][ci]
                if ah == 0:
                    sz = bits.huff(luts[si])
                    pred[ci] += _extend(bits.get(sz), sz) if sz else 0
                    out[bidx, 0] = pred[ci] << al
                else:  # refinement: one raw bit at position Al
                    if bits.bit():
                        out[bidx, 0] |= 1 << al
            bits.check()
        return

    # ---- AC scan: single component only (T.81 G.1.1.1.1)
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    ci = sel[0]
    out = state["coef"][ci]
    _, pgx = state["nblk"][ci]
    gy, gx = _subgrid(frame, state, ci)
    lut = ac_luts[scan[0]["ta"]]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    for u in range(gy * gx):
        if restart_interval and u and u % restart_interval == 0:
            bits = _Bits(_BitReader(next(seg_iter)))
            eobrun = 0
        by, bx = divmod(u, gx)
        bidx = by * pgx + bx
        row = out[bidx]
        if ah == 0:  # ---- AC first
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = bits.huff(lut)
                r, sz = sym >> 4, sym & 15
                if sz:
                    k += r
                    if k > se:
                        raise ValueError("AC run overflows band")
                    row[k] = _extend(bits.get(sz), sz) << al
                    k += 1
                else:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += bits.get(r)
                        eobrun -= 1  # current block is part of the run
                        break
                    k += 16  # ZRL
            bits.check()
        else:  # ---- AC refinement
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = bits.huff(lut)
                    r, sz = sym >> 4, sym & 15
                    newval = 0
                    if sz:
                        if sz != 1:
                            raise ValueError("AC refinement size must be 1")
                        newval = p1 if bits.bit() else m1
                    elif r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += bits.get(r)
                        break  # tail handler consumes this block
                    # advance over the band: history coefs take correction
                    # bits; zero-history positions consume the run
                    while k <= se:
                        if row[k]:
                            if bits.bit() and not (row[k] & p1):
                                row[k] += p1 if row[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval:
                        row[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:  # correction bits for the rest of the band
                    if row[k]:
                        if bits.bit() and not (row[k] & p1):
                            row[k] += p1 if row[k] >= 0 else m1
                    k += 1
                eobrun -= 1
            bits.check()


# ---------------------------------------------------------------- encode


class _OpStream:
    """Two-pass scan emitter: record (symbol, extra-bit) ops, histogram
    the symbols, then materialize with a flat canonical Huffman table."""

    def __init__(self):
        self.ops: list[tuple] = []  # ("s", sym) | ("b", value, nbits)
        self.freq: dict[int, int] = {}

    def sym(self, s: int) -> None:
        self.ops.append(("s", s))
        self.freq[s] = self.freq.get(s, 0) + 1

    def put(self, value: int, nbits: int) -> None:
        if nbits:
            self.ops.append(("b", value & ((1 << nbits) - 1), nbits))

    def table(self) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
        """(bits[1..16], vals, sym→(code, length)) — all symbols at one
        length L with 2^L > nsym, so the all-ones code stays unused."""
        vals = sorted(self.freq)
        n = max(1, len(vals))
        length = max(1, n.bit_length()) if n < (1 << n.bit_length()) else n.bit_length() + 1
        while (1 << length) <= n:
            length += 1
        bits = [0] * 16
        bits[length - 1] = len(vals)
        codes = {s: (i, length) for i, s in enumerate(vals)}
        return bits, vals, codes

    def to_bytes(self, codes: dict[int, tuple[int, int]]) -> bytes:
        acc = 0
        nacc = 0
        out = bytearray()
        for op in self.ops:
            if op[0] == "s":
                v, nb = codes[op[1]]
            else:
                _, v, nb = op
            acc = (acc << nb) | v
            nacc += nb
            while nacc >= 8:
                nacc -= 8
                b = (acc >> nacc) & 0xFF
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)  # byte stuffing
        if nacc:
            b = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def _signed_bits(v: int, sz: int) -> int:
    return v if v >= 0 else v + (1 << sz) - 1


_STD_SCRIPT_COLOR = [
    # the standard cjpeg progressive script: DC first at Al=1, split
    # luma AC bands, chroma AC, then successive-approximation refines
    {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 1},
    {"comps": [0], "ss": 1, "se": 5, "ah": 0, "al": 2},
    {"comps": [2], "ss": 1, "se": 63, "ah": 0, "al": 1},
    {"comps": [1], "ss": 1, "se": 63, "ah": 0, "al": 1},
    {"comps": [0], "ss": 6, "se": 63, "ah": 0, "al": 2},
    {"comps": [0], "ss": 1, "se": 63, "ah": 2, "al": 1},
    {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 1, "al": 0},
    {"comps": [2], "ss": 1, "se": 63, "ah": 1, "al": 0},
    {"comps": [1], "ss": 1, "se": 63, "ah": 1, "al": 0},
    {"comps": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
]


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 92, subsampling: str = "444"
) -> bytes:
    """Encode (h, w, 3) uint8 RGB → progressive (SOF2) JFIF bytes.

    Quantized coefficients are computed exactly as the baseline encoder
    computes them (same color transform, padding, DCT, tables), so
    ``decode_jpeg`` of this stream must equal the baseline
    reconstruction at the same quality — the round-trip test's anchor.
    Fixture-grade throughput (per-block Python); the crawl hot path
    stays on the vectorized baseline encoder."""
    if subsampling == "444":
        sampling = [(1, 1), (1, 1), (1, 1)]
    elif subsampling == "420":
        sampling = [(2, 2), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w, _ = pixels.shape
    pre, _, lum_q, chrom_q = _marker_parts(quality)
    d = _dct_matrix()
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    ycc = _rgb_to_ycbcr(pixels)
    if sampling[0] == (1, 1):
        planes = [ycc[0], ycc[1], ycc[2]]
    else:
        cbp = _pad_replicate(ycc[1], 2, 2)
        crp = _pad_replicate(ycc[2], 2, 2)
        cb = (cbp[0::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
        cr = (crp[0::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
        planes = [ycc[0], cb, cr]

    qz = []  # per comp: (nblocks, 64) int zigzag coefs on the padded grid
    grids = []  # per comp: (gy, gx) padded block grid
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, sampling)):
        th, tw = mcus_y * 8 * sv, mcus_x * 8 * sh
        ph, pw = plane.shape
        if (th, tw) != (ph, pw):
            from .jpegcodec import _edge_pad

            plane = _edge_pad(plane, th, tw)
        blocks = _to_blocks(plane)
        coef = (d @ (blocks - 128.0).reshape(-1, 8, 8) @ d.T).reshape(-1, 64)
        q = (lum_q if ci == 0 else chrom_q).astype(np.float64)
        qz.append(np.rint(coef / q).astype(np.int64)[:, ZIGZAG])
        grids.append((th // 8, tw // 8))

    sof = struct.pack(">BHHB", 8, h, w, 3) + b"".join(
        bytes([ci + 1, sh << 4 | sv, 0 if ci == 0 else 1])
        for ci, (sh, sv) in enumerate(sampling)
    )
    out = bytearray(pre + _marker(0xFFC2, sof))

    for sc in _STD_SCRIPT_COLOR:
        comps_in, ss, se, ah, al = sc["comps"], sc["ss"], sc["se"], sc["ah"], sc["al"]
        if ss == 0:
            streams = _encode_dc_scan(
                qz, grids, sampling, comps_in, ah, al, mcus_x, mcus_y
            )
        else:
            ci = comps_in[0]
            gy, gx = _comp_subgrid(h, w, sampling[ci], hmax, vmax)
            streams = _encode_ac_scan(qz[ci], grids[ci], gy, gx, ss, se, ah, al)
        # materialize: DHT (one table per used slot) + SOS + entropy
        dht = b""
        codes_by_slot = {}
        for (tc, th_slot), ops in streams["tables"].items():
            bits, vals, codes = ops.table()
            dht += _marker(0xFFC4, _dht_body(tc, th_slot, bits, vals))
            codes_by_slot[(tc, th_slot)] = codes
        sosb = bytes([len(comps_in)])
        for ci in comps_in:
            td = streams["td"].get(ci, 0)
            ta = streams["ta"].get(ci, 0)
            sosb += bytes([ci + 1, td << 4 | ta])
        sosb += bytes([ss, se, ah << 4 | al])
        if len(codes_by_slot) > 1:  # interleaved DC: per-op table slots
            ent = _materialize_multi(streams, codes_by_slot)
        else:
            codes = next(iter(codes_by_slot.values()), {})
            ent = streams["ops"].to_bytes(codes)
        out += dht + _marker(0xFFDA, sosb) + ent
    out += b"\xff\xd9"
    return bytes(out)


def _comp_subgrid(h, w, sampling_c, hmax, vmax):
    cw = -(-w * sampling_c[0] // hmax)
    ch = -(-h * sampling_c[1] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _encode_dc_scan(qz, grids, sampling, comps_in, ah, al, mcus_x, mcus_y):
    interleaved = len(comps_in) > 1
    ops = _OpStream()
    # per-op table slots for the interleaved case: record (slot, op-index)
    slot_of_sym_op: list[int] = []
    pred = {ci: 0 for ci in comps_in}
    if interleaved:
        units = mcus_x * mcus_y
    else:
        units = grids[comps_in[0]][0] * grids[comps_in[0]][1]

    def emit_block(ci, bidx):
        slot = 0 if ci == 0 else 1
        val = int(qz[ci][bidx, 0])
        if ah == 0:
            t = val >> al  # arithmetic shift (G.1.2.1 point transform)
            diff = t - pred[ci]
            pred[ci] = t
            sz = abs(diff).bit_length()
            ops.sym(sz)
            slot_of_sym_op.append(slot)
            ops.put(_signed_bits(diff, sz), sz)
        else:
            ops.put((val >> al) & 1, 1)

    for u in range(units):
        if interleaved:
            my, mx = divmod(u, mcus_x)
            for ci in comps_in:
                sh, sv = sampling[ci]
                _, pgx = grids[ci]
                for s in range(sh * sv):
                    by = my * sv + s // sh
                    bx = mx * sh + s % sh
                    emit_block(ci, by * pgx + bx)
        else:
            ci = comps_in[0]
            _, pgx = grids[ci]
            by, bx = divmod(u, grids[ci][1])
            emit_block(ci, by * pgx + bx)

    tables = {}
    td = {}
    if ah == 0:
        # split the one op stream's symbol histogram by slot
        used_slots = sorted(set(slot_of_sym_op)) or [0]
        for slot in used_slots:
            t = _OpStream()
            for s, sl in zip((op[1] for op in ops.ops if op[0] == "s"), slot_of_sym_op):
                if sl == slot:
                    t.freq[s] = t.freq.get(s, 0) + 1
            tables[(0, slot)] = t
        for ci in comps_in:
            td[ci] = 0 if ci == 0 else 1
    return {"ops": ops, "tables": tables, "td": td, "ta": {}, "slots": slot_of_sym_op}


def _materialize_multi(streams, codes_by_slot) -> bytes:
    """Bit-pack an op stream whose huffman symbols use per-op table
    slots (interleaved DC scans: slot 0 = luma, 1 = chroma)."""
    acc = 0
    nacc = 0
    out = bytearray()
    slots = iter(streams["slots"])
    for op in streams["ops"].ops:
        if op[0] == "s":
            slot = next(slots)
            v, nb = codes_by_slot[(0, slot)][op[1]]
        else:
            _, v, nb = op
        acc = (acc << nb) | v
        nacc += nb
        while nacc >= 8:
            nacc -= 8
            b = (acc >> nacc) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
    if nacc:
        b = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


def _encode_ac_scan(qzc, grid, gy, gx, ss, se, ah, al):
    """AC scan ops for one component (T.81 G.1.2.2 first / G.1.2.3
    refinement, libjpeg buffering discipline)."""
    _, pgx = grid
    ops = _OpStream()
    eobrun = 0
    be: list[int] = []  # buffered correction bits tied to the EOB run

    def flush_eobrun():
        nonlocal eobrun
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            ops.sym(r << 4)
            if r:
                ops.put(eobrun - (1 << r), r)
            eobrun = 0
        for b in be:
            ops.put(b, 1)
        be.clear()

    for u in range(gy * gx):
        by, bx = divmod(u, gx)
        row = qzc[by * pgx + bx]
        if ah == 0:  # ---- first pass
            run = 0
            for k in range(ss, se + 1):
                v = int(row[k])
                mag = (v if v >= 0 else -v) >> al
                if mag == 0:
                    run += 1
                    continue
                flush_eobrun()
                while run > 15:
                    ops.sym(0xF0)
                    run -= 16
                sz = mag.bit_length()
                ops.sym(run << 4 | sz)
                ops.put(_signed_bits(mag if v >= 0 else -mag, sz), sz)
                run = 0
            if run > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()
        else:  # ---- refinement pass (G.1.2.3 buffering discipline)
            br = []  # this block's buffered history-correction bits
            absv = [abs(int(row[k])) >> al for k in range(ss, se + 1)]
            eob_idx = -1  # index of the LAST newly-significant coef
            for i, t in enumerate(absv):
                if t == 1:
                    eob_idx = i
            run = 0
            for i, t in enumerate(absv):
                if t == 0:
                    run += 1
                    continue
                # at EVERY nonzero position: emit pending ZRLs first —
                # only while a newly-significant coef still follows
                # (trailing spans fold into the EOB run instead); each
                # ZRL flushes the corrections buffered before it
                while run > 15 and i <= eob_idx:
                    flush_eobrun()
                    ops.sym(0xF0)
                    run -= 16
                    for b in br:
                        ops.put(b, 1)
                    br.clear()
                if t > 1:  # history coefficient: buffer its bit
                    br.append(t & 1)
                    continue
                # newly significant (t == 1)
                flush_eobrun()
                ops.sym(run << 4 | 1)
                ops.put(1 if int(row[ss + i]) >= 0 else 0, 1)
                run = 0
                for b in br:
                    ops.put(b, 1)
                br.clear()
            if run > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF or len(be) > 900:
                    flush_eobrun()
    flush_eobrun()
    return {"ops": ops, "tables": {(1, 0): ops}, "td": {}, "ta": {}, "slots": []}
