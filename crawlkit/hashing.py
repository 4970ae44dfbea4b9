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


def fragment_name(*keys: object) -> str:
    """Deterministic fragment / file name from identifying keys.

    Replaces the reference's RandomFilename (``commons/helper.go:37-45``):
    deterministic names keep re-runs and Ray task retries idempotent.
    """
    return stable_hash_bytes(*keys, size=8).hex()
