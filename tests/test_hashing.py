"""Pins the vectorized one-block MD5 (crawlkit.hashing.md5_lower64_np /
md5_lower64_ids) bit-exact against per-row hashlib — which is itself what
every DuckDB ``md5_number_lower`` oracle recomputes. Any drift here would
silently break every SQL-checked coin (split buckets, sampling, simhash
word hashes), so the edge cases are enumerated exhaustively.

No Ray needed: pure numpy.
"""

import hashlib

import numpy as np
import pytest

from crawlkit.hashing import (
    _md5_lower64_hashlib,
    md5_lower64_ids,
    md5_lower64_np,
)


def _ref(strings):
    return np.array(
        [
            int.from_bytes(hashlib.md5(str(s).encode("utf-8")).digest()[8:], "little")
            for s in strings
        ],
        dtype=np.uint64,
    )


@pytest.mark.parametrize(
    "strings",
    [
        [],
        [""],
        ["a"],
        ["x" * 55],  # largest single-block message
        ["x" * 56],  # first length that needs the hashlib fallback
        ["x" * 200],
        ["", "a", "ab", "x" * 55, "x" * 56, "mid"],  # mixed short/long
        ["héllo", "日本語"],  # non-ASCII → full fallback
        ["plain", "héllo", "also-plain"],  # mixed ASCII/non-ASCII
        [str(i) for i in range(1000)],
        [f"{i}:split" for i in range(257)],
        ["word%d" % (i % 37) for i in range(100)],
    ],
)
def test_md5_lower64_np_matches_hashlib(strings):
    got = md5_lower64_np(strings)
    assert got.dtype == np.uint64
    assert np.array_equal(got, _ref(strings))


def test_md5_lower64_np_numpy_input():
    u = np.array([f"{i}-{i * 7}" for i in range(500)], dtype=np.str_)
    assert np.array_equal(md5_lower64_np(u), _ref(u.tolist()))


@pytest.mark.parametrize("salt", ["", ":split", "-d", " v2", ":rm"])
def test_md5_lower64_ids(salt):
    ids = np.concatenate(
        [
            np.arange(-50, 2000),
            np.array([0, -1, 9, 10, 99, 100, 10**9, 2**62, 2**63 - 1]),
        ]
    ).astype(np.int64)
    exp = _ref([str(int(i)) + salt for i in ids])
    assert np.array_equal(md5_lower64_ids(ids, salt), exp)


def test_md5_lower64_ids_chunk_boundary():
    # > 32768 rows exercises the cache-chunked path
    ids = np.arange(33000, dtype=np.int64)
    exp = md5_lower64_np([str(i) for i in ids])
    assert np.array_equal(md5_lower64_ids(ids), exp)


def test_md5_lower64_ids_long_salt_fallback():
    ids = np.arange(10, dtype=np.int64)
    salt = "s" * 40  # 21 + 40 > 55 → hashlib fallback path
    exp = _ref([str(int(i)) + salt for i in ids])
    assert np.array_equal(md5_lower64_ids(ids, salt), exp)


def test_hashlib_helper_matches():
    strings = ["a", "b", "ccc"]
    assert np.array_equal(_md5_lower64_hashlib(strings), _ref(strings))
