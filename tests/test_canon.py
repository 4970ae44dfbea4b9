"""Normalizer semantics pinned to the reference's own unit tests
(otodom/commons/extensions_test.go:10-35) plus edge cases."""

import pyarrow as pa
import pytest
from hypothesis import given
from hypothesis import strategies as st

from crawlkit import canon

# the reference's exact example cases (extensions_test.go:11-15)
REF_CASES = [
    ("40 zł/m²", 40),
    ("39 m²", 39),
    ("1 100 zł                                                        /mc", 1100),
]


@pytest.mark.parametrize("raw,want", REF_CASES)
def test_extract_number_reference_examples(raw, want):
    assert canon.extract_number_one(raw) == want


def test_extract_number_edges():
    assert canon.extract_number_one("") is None
    assert canon.extract_number_one("zł/m²") is None
    assert canon.extract_number_one(None) is None
    assert canon.extract_number_one("a1b2c3") == 123  # digit-group concat


def test_extract_number_vectorized_matches_scalar():
    vals = [c[0] for c in REF_CASES] + ["", "x9y8", None, "007"]
    got = canon.extract_number(pa.array(vals, pa.string())).to_pylist()
    want = [canon.extract_number_one(v) for v in vals]
    assert got == want


@given(st.text(max_size=40))
def test_extract_number_property(s):
    """Vectorized Arrow kernel == scalar reference implementation."""
    assert canon.extract_number(pa.array([s], pa.string())).to_pylist()[0] == canon.extract_number_one(s)


def test_take_before_reference_example():
    # extensions_test.go:28: strip .html#fragment → prefix before .html
    url = "https://www.otodom.pl/oferta/mieszkanie-ID43RJJ.html#dst=a;id=3"
    assert canon.take_characters_before_one(url, ".html") == (
        "https://www.otodom.pl/oferta/mieszkanie-ID43RJJ"
    )


def test_take_before_absent_marker_passes_through():
    # the Go code panics here (raw[:strings.Index]); ours passes through
    assert canon.take_characters_before_one("no-marker", ".html") == "no-marker"


@given(st.text(max_size=30), st.text(min_size=1, max_size=5))
def test_take_before_vectorized_matches_scalar(s, marker):
    got = canon.take_characters_before(pa.array([s], pa.string()), marker).to_pylist()[0]
    assert got == canon.take_characters_before_one(s, marker)


def test_canonicalize_strips_fragment_and_html_suffix():
    u = "HTTPS://Host0.TEST/offer/abc.html#frag?x=1"
    assert canon.canonicalize_url_one(u) == "https://host0.test/offer/abc.html"


def test_canonicalize_keeps_query_for_listing():
    u = "https://host0.test/list?cat=3&page=2"
    assert canon.canonicalize_url_one(u) == u


@given(st.text(max_size=50))
def test_canonicalize_idempotent(s):
    once = canon.canonicalize_url_one(s)
    assert canon.canonicalize_url_one(once) == once
