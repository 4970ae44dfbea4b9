"""HTML-PARSER CONFORMANCE CONTRACT — the swap gate for a tolerant
real-world parser (the codec-conformance pattern applied to §2.9).

The engine's extraction seam is the parser registry
(``crawlkit.stages.parsers.register_parser``): the fetch/extract stage
dispatches per-seed-schema to ``ParserSpec.parse(html, url) ->
list[dict]``. In-sandbox the registered parsers are compiled-regex
against the deterministic SynthWeb grammar; the reference uses colly's
goquery CSS selectors, which tolerate broken markup. A production
swap (lxml/html5lib/goquery-style) must:

1. re-register its parser under the same schema names
   (``register_parser(ParserSpec("flat", ..., my_parse, fields=...))``),
2. run THIS FILE unmodified and pass every test, and
3. flip ``REQUIRE_TOLERANT = True`` below, which arms the
   tolerant-tier fixtures (markup variations a regex parser cannot
   handle but any real HTML parser must: attribute reordering/extra
   whitespace, single-quoted attributes, unclosed elements).

Contract layers:
* **Intent equivalence** — on well-formed SynthWeb pages, extraction
  must equal the GENERATOR's intended records (independent of any
  parser implementation: built from ``SynthWeb.article_fields``).
* **Graceful degradation (required)** — truncated pages, injected
  comments/unknown tags, empty/garbage input: never raise, extract
  every article that is individually intact, full key set per row.
* **Tolerant tier (armed by REQUIRE_TOLERANT)** — lenient-markup
  fixtures; the regex baseline is only required not to crash on them.
"""

import pytest

from crawlkit.stages import parsers
from crawlkit.synthweb import SynthWeb

REQUIRE_TOLERANT = False  # flip to True when swapping in a lenient parser

FLAT_KEYS = {
    "title", "name", "region", "rooms_raw", "price_raw",
    "total_price_raw", "area_raw", "href",
}


def _flat_parse(html: str, url: str = "u") -> list[dict]:
    return parsers.get_parser("flat").parse(html, url)


def _office_parse(html: str, url: str = "u") -> list[dict]:
    return parsers.get_parser("office").parse(html, url)


def _intended_flat(w: SynthWeb, cat: int, page: int) -> list[dict]:
    """Generator-intent records (no parser involved)."""
    return [
        {
            "title": f["title"],
            "name": f["name"],
            "region": f["region"],
            "rooms_raw": f["rooms_text"],
            "price_raw": f["price_text"],
            "total_price_raw": None,
            "area_raw": f["area_text"],
            "href": f["href"],
        }
        for f in (
            w.article_fields(cat, page, k)
            for k in range(w.n_articles(cat, page))
        )
    ]


# ------------------------------------------------- intent equivalence


@pytest.mark.parametrize("config", ["t1", "t2"])
@pytest.mark.parametrize("cat,page", [(0, 1), (1, 1), (2, 2)])
def test_wellformed_extraction_matches_generator_intent(config, cat, page):
    w = SynthWeb(config)
    html = w.listing_html(cat, page)
    assert _flat_parse(html) == _intended_flat(w, cat, page)
    # office schema: same articles, price columns re-mapped
    office = _office_parse(html)
    flat = _flat_parse(html)
    assert len(office) == len(flat)
    for o, f in zip(office, flat):
        assert o["total_price_raw"] == f["price_raw"]
        assert o["rooms_raw"] is None


def test_offer_images_match_generator_intent():
    w = SynthWeb("t1")
    oid = "offer-0-1-0"
    got = parsers.parse_offer_images(w.offer_html(oid), "u")
    want = [
        {"image_id": f"img-{oid}-{k}", "caption": w.caption(f"img-{oid}-{k}")}
        for k in range(w.n_images(oid))
    ]
    assert got == want


def test_pagination_matches_generator_intent():
    w = SynthWeb("t1")
    html = w.listing_html(0, 1)
    assert parsers.parse_pagination(html) == list(range(1, w.last_page(0) + 1))


# ------------------------------------- graceful degradation (required)


def _page_with(arts: list[str]) -> str:
    return "<html><body>" + "".join(arts) + "</body></html>"


def _intact_article(w: SynthWeb, k: int) -> str:
    """One well-formed article lifted from a generated page."""
    import re

    html = w.listing_html(0, 1)
    bodies = re.findall(r"<article.*?</article>", html, re.S)
    return bodies[k % len(bodies)]


@pytest.mark.parametrize("parse", [_flat_parse, _office_parse])
def test_truncated_page_extracts_leading_intact_articles(parse):
    w = SynthWeb("t1")
    a0, a1 = _intact_article(w, 0), _intact_article(w, 1)
    page = _page_with([a0, a1])
    # cut mid-second-article: article 0 must still come through
    cut = page.index(a1) + len(a1) // 2
    rows = parse(page[:cut])
    assert len(rows) == 1
    assert set(rows[0]) == FLAT_KEYS
    assert rows[0]["title"] == _flat_parse(_page_with([a0]))[0]["title"]


@pytest.mark.parametrize(
    "noise",
    [
        "<!-- seasonal banner \"<article>\" -->",
        "<aside data-x='1'><b>ad</b></aside>",
        "<script>var a = '</li>';</script>",
        "\n\n\t ",
    ],
    ids=["comment", "unknown_tag", "script", "whitespace"],
)
def test_noise_between_articles_does_not_perturb(noise):
    w = SynthWeb("t1")
    a0, a1 = _intact_article(w, 0), _intact_article(w, 1)
    clean = _flat_parse(_page_with([a0, a1]))
    noisy = _flat_parse(_page_with([a0, noise, a1]))
    assert noisy == clean and len(clean) == 2


@pytest.mark.parametrize("html", ["", "   ", "<html></html>", "\x00\x01 not html", "<article>"])
def test_empty_and_garbage_input_returns_empty_not_raises(html):
    assert _flat_parse(html) == []
    assert _office_parse(html) == []
    assert parsers.parse_offer_images(html, "u") == []
    assert parsers.parse_pagination(html) == []


def test_article_with_missing_fields_degrades_to_empty_strings():
    rows = _flat_parse(_page_with(['<article id="x"><p>only-region</p></header></article>']))
    assert len(rows) == 1
    assert rows[0]["region"] == "only-region"
    assert rows[0]["title"] == "" and rows[0]["href"] == ""
    assert set(rows[0]) == FLAT_KEYS


# ------------------------------------------------------- tolerant tier


def _tolerant_cases(w: SynthWeb) -> list[tuple[str, str]]:
    a = _intact_article(w, 0)
    return [
        ("attr_whitespace", a.replace('<article id="', '<article  id = "')),
        ("single_quotes", a.replace('id="', "id='").replace('">', "'>", 1)),
        ("uppercase_tags", a.replace("<article", "<ARTICLE").replace("</article>", "</ARTICLE>")),
        ("unclosed_article", a.replace("</article>", "")),
    ]


def test_tolerant_tier_contract():
    """Markup a regex parser cannot handle but a real HTML parser must.
    Baseline requirement: NO exception (rows may be empty). With
    REQUIRE_TOLERANT (a swapped lenient parser): each case must still
    extract the article's title."""
    w = SynthWeb("t1")
    want_title = _flat_parse(_page_with([_intact_article(w, 0)]))[0]["title"]
    for name, mangled in _tolerant_cases(w):
        rows = _flat_parse(_page_with([mangled]))  # must not raise
        for r in rows:
            assert set(r) == FLAT_KEYS, name
        if REQUIRE_TOLERANT:
            assert rows and rows[0]["title"] == want_title, name
