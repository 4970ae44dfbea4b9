"""String normalizers + URL canonicalizer (vectorized over Arrow).

Reference-compatible UDFs (semantics pinned by the reference's own unit
tests, ``otodom/commons/extensions_test.go:10-35``):

* ``extract_number`` — digit-group concat: ``"1 100 zł /mc"`` → ``1100``
  (``otodom/commons/extensions.go:10-17``: regex ``(\\d+)`` find-all then
  string-concatenate). Empty/no-digit input → null (the reference keeps
  the empty string; we type the column, so null).
* ``take_characters_before`` — substring before the first occurrence of a
  marker (``otodom/commons/extensions.go:20-22``). The Go code panics when
  the marker is absent; we define absent → pass-through (documented
  divergence, tested).
* ``canonicalize_url`` — the URL-seen key. To match the reference's seen
  set the canonicalization is exactly marker-strip (fragment + ``.html``
  suffix handling like the reference's call site,
  ``otodom/flat_crawler/handler.go:101``) plus lowercased scheme/host;
  richer canonicalization sits behind ``full=True``.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# re.ASCII: Go's regexp (RE2) \d is ASCII [0-9] — Python's default \d
# would additionally match Unicode digits and diverge from the reference.
_DIGIT_RUN = re.compile(r"\d+", re.ASCII)


def extract_number_one(s: str | None) -> int | None:
    """Scalar reference implementation (mirrors extensions.go:10-17)."""
    if s is None:
        return None
    groups = _DIGIT_RUN.findall(s)
    if not groups:
        return None
    return int("".join(groups))


def extract_number(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized digit-concat: strip every non-digit char, cast to int64.

    ``pc.replace_substring_regex(col, r"\\D+", "")`` is equivalent to the
    reference's find-all-(\\d+)-and-concat because concatenating all digit
    runs == deleting all non-digit runs.
    """
    stripped = pc.replace_substring_regex(col, pattern=r"\D+", replacement="")
    # empty string → null, then cast
    nulled = pc.if_else(pc.equal(stripped, ""), pa.scalar(None, pa.string()), stripped)
    return pc.cast(nulled, pa.int64())


def take_characters_before_one(s: str | None, marker: str) -> str | None:
    """Scalar: substring before first ``marker``; absent → pass-through."""
    if s is None:
        return None
    i = s.find(marker)
    return s if i < 0 else s[:i]


def take_characters_before(col: pa.Array | pa.ChunkedArray, marker: str) -> pa.Array:
    """Batched ``take_characters_before``.

    A pure-Arrow kernel is awkward here (``pc.find_substring`` returns
    BYTE offsets, Python slicing is by code point), so this loops over
    the batch with ``str.find`` — the call amortizes per batch and
    short-circuits fast; semantics exactly match the scalar impl.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vals = arr.to_numpy(zero_copy_only=False)
    return pa.array(
        [take_characters_before_one(v, marker) for v in vals], type=pa.string()
    )


def canonicalize_url_one(url: str | None, full: bool = False) -> str | None:
    """Canonical URL = the seen-set key.

    Default (reference-compatible): strip ``#fragment`` (the reference's
    ``TakeChractersBefore(link, ".html")`` + re-append, i.e. everything
    after ``.html`` goes away) and lowercase scheme+host. ``full=True``
    additionally removes default ports, resolves dot segments and strips
    trailing ``?``.
    """
    if url is None:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    path, query = parts.path, parts.query
    # reference semantics: an offer link ".../x.html#frag" → ".../x.html"
    # (fragment dropped; also anything colly appended after .html)
    i = path.find(".html")
    if i >= 0:
        path = path[: i + len(".html")]
        query = ""
    if full:
        if netloc.endswith(":80") and scheme == "http":
            netloc = netloc[:-3]
        if netloc.endswith(":443") and scheme == "https":
            netloc = netloc[:-4]
        while "//" in path:
            path = path.replace("//", "/")
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_urls(col: pa.Array | pa.ChunkedArray, full: bool = False) -> pa.Array:
    """Batch canonicalizer (object loop; urlsplit has no Arrow kernel).

    Hot-path cost is fine: canonicalization happens once per discovered
    URL, and the common transforms (fragment strip) short-circuit fast.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vals = arr.to_numpy(zero_copy_only=False)
    return pa.array([canonicalize_url_one(v, full=full) for v in vals], type=pa.string())


def host_of_one(url: str | None) -> str | None:
    if url is None:
        return None
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return None


def hosts_of(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vals = arr.to_numpy(zero_copy_only=False)
    return pa.array([host_of_one(v) for v in vals], type=pa.string())
