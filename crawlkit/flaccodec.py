"""Real FLAC decoder (+ fixture encoder) — stdlib/numpy only.

Speech/audio training corpora (LibriSpeech, Common Voice exports) ship
FLAC, not WAV; this closes the compressed-audio half of the codec
matrix the way MJPEG closed video. Scope is the lossless decode path
of the public FLAC format spec:

* STREAMINFO + metadata-block walk (unknown blocks skipped by length),
* frame headers: blocking strategy, coded block size / sample rate,
  channel assignments INCLUDING the stereo decorrelations
  (left-side / right-side / mid-side), UTF-8-coded frame numbers,
* subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients + shift), wasted-bits unary prefix,
* residuals: RICE / RICE2 partitioned coding with escape-to-raw
  partitions, zigzag mapping.

CRC-8/CRC-16 fields are parsed past but not verified (decode errors
surface as ValueError from structural checks instead — same policy as
the JPEG decoder; a bit-flip typically lands there).

``encode_flac`` is the fixture generator: a spec-valid encoder
emitting CONSTANT / VERBATIM / FIXED(order 2)+Rice / LPC(order 2)+Rice
subframes over independent channels — enough to exercise every decode
path end-to-end in tests. int16 samples (the engine's WAV convention,
audiocodec.py).

Like the other codecs this is honest about its seam: a production
swap drops in libsndfile/soundfile behind the same decode(bytes) →
(samples, rate) surface.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- bits


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def u(self, n: int) -> int:
        """Read n bits unsigned (n may exceed 56 only for UTF-8 fields)."""
        if self.pos + n > len(self.bits):
            raise ValueError("truncated FLAC stream")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count 0-bits until the terminating 1."""
        bits = self.bits
        i = self.pos
        try:
            j = i + int(np.argmax(bits[i:]))  # first 1 (argmax on 0/1)
        except ValueError:
            raise ValueError("truncated FLAC stream")
        if j >= len(bits) or bits[j] != 1:
            raise ValueError("truncated unary code")
        self.pos = j + 1
        return j - i

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self):
        self.chunks: list[tuple[int, int]] = []

    def u(self, v: int, n: int) -> None:
        self.chunks.append((v & ((1 << n) - 1), n))

    def s(self, v: int, n: int) -> None:
        self.u(v & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.u(0, 32)
            q -= 32
        self.u(1, q + 1)

    def align(self) -> None:
        total = sum(n for _, n in self.chunks) & 7
        if total:
            self.u(0, 8 - total)

    def to_bytes(self) -> bytes:
        acc = 0
        nacc = 0
        out = bytearray()
        for v, n in self.chunks:
            acc = (acc << n) | v
            nacc += n
            while nacc >= 8:
                nacc -= 8
                out.append((acc >> nacc) & 0xFF)
        if nacc:
            out.append((acc << (8 - nacc)) & 0xFF)
        return bytes(out)


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v << 1, (-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


# ---------------------------------------------------------------- decode

_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SSIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = r.u(8)
        if c & 0xC0 != 0x80:
            raise ValueError("malformed frame-number coding")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residual(r: _BitReader, blocksize: int, order: int) -> list[int]:
    method = r.u(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.u(4)
    npart = 1 << po
    if blocksize % npart or blocksize >> po <= order and npart > 1 or blocksize >> po < order:
        # partition arithmetic must stay integral; first partition must
        # have a non-negative sample count
        if blocksize % npart:
            raise ValueError("partition order does not divide block size")
    out: list[int] = []
    for p in range(npart):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("negative partition length")
        k = r.u(pbits)
        if k == escape:  # raw n-bit residuals
            raw_n = r.u(5)
            out.extend(r.s(raw_n) if raw_n else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << k) | (r.u(k) if k else 0)
                out.append(_unzigzag(u))
    return out


def _decode_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.u(1):
        raise ValueError("subframe padding bit set")
    t = r.u(6)
    wasted = 0
    if r.u(1):
        wasted = 1 + r.unary()
    eff = bps - wasted
    if t == 0:  # CONSTANT
        out = np.full(blocksize, r.s(eff), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([r.s(eff) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = [r.s(eff) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        coef = _FIXED_COEF[order]
        samples = list(warm)
        for e in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coef))
            samples.append(pred + e)
        out = np.array(samples, dtype=np.int64)
    elif t >= 32:  # LPC order 1-32
        order = t - 31
        warm = [r.s(eff) for _ in range(order)]
        prec = r.u(4)
        if prec == 15:
            raise ValueError("invalid qlp precision")
        prec += 1
        shift = r.s(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coef = [r.s(prec) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        samples = list(warm)
        for e in resid:
            acc = sum(c * samples[-i - 1] for i, c in enumerate(coef))
            samples.append((acc >> shift) + e)
        out = np.array(samples, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {t}")
    return out << wasted


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (samples int32 (n,) mono or (n, ch), sample rate).

    Raises ValueError on anything that is not a well-formed FLAC
    stream (same error contract as wav_decode / decode_jpeg, so stage
    error-row conventions hold)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        hdr = data[pos]
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            if ln != 34:
                raise ValueError("bad STREAMINFO length")
            r = _BitReader(body)
            r.u(16), r.u(16), r.u(24), r.u(24)
            rate = r.u(20)
            nch = r.u(3) + 1
            bps = r.u(5) + 1
            total = r.u(36)
            info = {"rate": rate, "nch": nch, "bps": bps, "total": total}
        pos += 4 + ln
        if hdr & 0x80:  # is_last
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    if info["rate"] == 0:
        raise ValueError("zero sample rate")

    chans: list[list[int]] = [[] for _ in range(info["nch"])]
    nread = 0
    while pos < len(data) and (info["total"] == 0 or nread < info["total"]):
        r = _BitReader(data[pos:])
        if r.u(14) != 0b11111111111110:
            raise ValueError("bad frame sync")
        r.u(1)  # reserved
        r.u(1)  # blocking strategy
        bs_code = r.u(4)
        rate_code = r.u(4)
        ch_code = r.u(4)
        ss_code = r.u(3)
        r.u(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            blocksize = r.u(8) + 1
        elif bs_code == 7:
            blocksize = r.u(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if rate_code == 12:
            r.u(8)
        elif rate_code in (13, 14):
            r.u(16)
        elif rate_code == 15:
            raise ValueError("invalid sample rate code")
        bps = info["bps"] if ss_code == 0 else _SSIZE_CODE.get(ss_code)
        if bps is None:
            raise ValueError("reserved sample size code")
        r.u(8)  # CRC-8 (not verified; structural checks catch corruption)

        if ch_code < 8:
            nch = ch_code + 1
            if nch != info["nch"]:
                raise ValueError("channel count mismatch")
            subs = [_decode_subframe(r, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):  # stereo decorrelation; side gets +1 bit
            if info["nch"] != 2:
                raise ValueError("decorrelated frame in non-stereo stream")
            if ch_code == 8:  # left-side
                left = _decode_subframe(r, blocksize, bps)
                side = _decode_subframe(r, blocksize, bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right-side
                side = _decode_subframe(r, blocksize, bps + 1)
                right = _decode_subframe(r, blocksize, bps)
                subs = [right + side, right]
            else:  # mid-side
                mid = _decode_subframe(r, blocksize, bps)
                side = _decode_subframe(r, blocksize, bps + 1)
                lr = (mid << 1) | (side & 1)
                subs = [(lr + side) >> 1, (lr - side) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        r.align()
        r.u(16)  # CRC-16 (not verified)
        for ci, s in enumerate(subs):
            chans[ci].extend(int(x) for x in s)
        nread += blocksize
        pos += r.pos // 8

    if info["total"] and nread < info["total"]:
        raise ValueError(
            f"truncated FLAC: {nread} of {info['total']} samples present"
        )
    if info["total"] and nread > info["total"]:
        for ci in range(len(chans)):
            chans[ci] = chans[ci][: info["total"]]
    arr = np.array(chans, dtype=np.int64).T
    if arr.ndim == 2 and arr.shape[1] == 1:
        arr = arr[:, 0]
    return arr.astype(np.int32), info["rate"]


# ---------------------------------------------------------------- encode


def _rice_k(resid: np.ndarray) -> int:
    """Pick the Rice parameter from the mean magnitude (standard
    estimator: smallest k with mean(zigzag) < 2^k)."""
    if len(resid) == 0:
        return 0
    mean = float(np.mean(_zigzag(resid)))
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _write_residual(w: _BitWriter, resid: np.ndarray) -> None:
    w.u(0, 2)  # RICE (4-bit params)
    w.u(0, 4)  # partition order 0: one partition
    k = _rice_k(resid)
    w.u(k, 4)
    for u in _zigzag(resid):
        u = int(u)
        w.unary(u >> k)
        if k:
            w.u(u & ((1 << k) - 1), k)


def _write_subframe(
    w: _BitWriter, x: np.ndarray, bps: int, kind: str, lpc_coef=None, lpc_shift=5
) -> None:
    w.u(0, 1)  # padding
    if kind == "constant":
        w.u(0, 6)
        w.u(0, 1)  # no wasted bits
        w.s(int(x[0]), bps)
    elif kind == "verbatim":
        w.u(1, 6)
        w.u(0, 1)
        for v in x:
            w.s(int(v), bps)
    elif kind == "fixed2":
        order = 2
        w.u(8 + order, 6)
        w.u(0, 1)
        for v in x[:order]:
            w.s(int(v), bps)
        pred = 2 * x[1:-1][order - 2 :] - x[:-2][: len(x) - order]
        resid = x[order:] - (2 * x[order - 1 : -1] - x[order - 2 : -2])
        _write_residual(w, resid)
    elif kind == "lpc2":
        order = 2
        w.u(32 + order - 1, 6)
        w.u(0, 1)
        for v in x[:order]:
            w.s(int(v), bps)
        prec = 12
        w.u(prec - 1, 4)
        w.u(lpc_shift, 5)
        coef = lpc_coef or [int(1.6 * (1 << lpc_shift)), int(-0.7 * (1 << lpc_shift))]
        for c in coef:
            w.s(c, prec)
        pred = (coef[0] * x[order - 1 : -1] + coef[1] * x[order - 2 : -2]) >> lpc_shift
        resid = x[order:] - pred
        _write_residual(w, resid)
    else:
        raise ValueError(kind)


def encode_flac(
    samples: np.ndarray,
    rate: int,
    blocksize: int = 4096,
    subframe: str = "fixed2",
    stereo_mode: str = "independent",
) -> bytes:
    """Fixture-grade FLAC encoder: int16 mono or (n, ch) samples →
    spec-valid FLAC ('constant' blocks auto-detected regardless of
    ``subframe``). The last block may be short (coded block size).
    ``stereo_mode`` for 2-channel input: 'independent' or one of the
    decorrelations 'left-side' / 'right-side' / 'mid-side' (side
    channel carries the spec's +1 bit)."""
    header, frames = encode_flac_parts(samples, rate, blocksize, subframe, stereo_mode)
    return header + b"".join(frames)


def encode_flac_parts(
    samples: np.ndarray,
    rate: int,
    blocksize: int = 4096,
    subframe: str = "fixed2",
    stereo_mode: str = "independent",
) -> tuple[bytes, list[bytes]]:
    """:func:`encode_flac` split at its natural seams: (header bytes =
    'fLaC' + STREAMINFO, [one bytes per audio frame]). The Ogg-FLAC
    mapping (oggcodec.py) needs frame granularity — one native frame
    per Ogg packet; joining the parts is byte-identical to
    ``encode_flac`` (test-pinned)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    bps = 16

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.u(min(blocksize, max(1, n)), 16)
    si.u(min(blocksize, max(1, n)), 16)
    si.u(0, 24), si.u(0, 24)
    si.u(rate, 20)
    si.u(nch - 1, 3)
    si.u(bps - 1, 5)
    si.u(n, 36)
    body = si.to_bytes() + b"\x00" * 16  # md5 unset (all-zero = unknown)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    frames: list[bytes] = []
    frame_no = 0
    for lo in range(0, n, blocksize):
        blk = x[lo : lo + blocksize]
        bs = blk.shape[0]
        w = _BitWriter()
        w.u(0b11111111111110, 14)
        w.u(0, 1)
        w.u(0, 1)  # fixed-blocksize stream
        w.u(7, 4)  # block size: 16-bit field follows
        w.u(0, 4)  # rate: from STREAMINFO
        decor = stereo_mode != "independent" and nch == 2
        if decor:
            code = {"left-side": 8, "right-side": 9, "mid-side": 10}[stereo_mode]
            w.u(code, 4)
        else:
            w.u(nch - 1, 4)  # independent channels
        w.u(0, 3)  # sample size: from STREAMINFO
        w.u(0, 1)
        if frame_no < 0x80:
            w.u(frame_no, 8)  # UTF-8 single byte
        else:
            w.u(0xC0 | (frame_no >> 6), 8)
            w.u(0x80 | (frame_no & 0x3F), 8)
        w.u(bs - 1, 16)
        w.u(0, 8)  # CRC-8 placeholder (decoder does not verify)
        if decor:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo_mode == "left-side":
                pairs = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right-side":
                pairs = [(side, bps + 1), (right, bps)]
            else:  # mid-side
                pairs = [((left + right) >> 1, bps), (side, bps + 1)]
        else:
            pairs = [(blk[:, ci], bps) for ci in range(nch)]
        for ch, ch_bps in pairs:
            if bs < 3:
                _write_subframe(w, ch, ch_bps, "verbatim")
            elif (ch == ch[0]).all():
                _write_subframe(w, ch, ch_bps, "constant")
            else:
                _write_subframe(w, ch, ch_bps, subframe)
        w.align()
        w.u(0, 16)  # CRC-16 placeholder
        frames.append(w.to_bytes())
        frame_no += 1
    return bytes(out), frames
