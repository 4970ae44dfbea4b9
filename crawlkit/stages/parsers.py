"""HTML parsers + the parser plugin registry (user-extension surface).

The reference's extension contract is "a new crawler = a new Go module
with different CSS selectors + schema" (``otodom/flat_crawler/handler.go:17-36``
vs ``otodom/office_crawler/handler.go:17-36``; registered via stack.yml env).
Ours is ``register_parser(schema_name, spec)``: the fetch/extract stage
dispatches per-seed-schema to the registered parser inside
``map_batches``.

No bs4/lxml in the sandbox → compiled-regex extraction against the same
DOM structure the reference's CSS selectors target (selectors cited per
field). Swap ``_parse_articles`` for an lxml implementation outside the
sandbox; the stage contract (html → list-of-raw-string-dicts) is stable.

SWAP GATE: a tolerant real-world parser replacement must re-register
under the same schema names and pass tests/test_parser_conformance.py
unmodified (generator-intent equivalence on well-formed pages,
graceful degradation on truncated/noisy/garbage input), then flip that
file's ``REQUIRE_TOLERANT`` to arm the lenient-markup tier (attribute
whitespace, single quotes, unclosed elements) a regex baseline cannot
satisfy.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

# --- compiled patterns (compiled once at import; actors reuse) ----------

_ARTICLE = re.compile(r"<article id=\"([^\"]+)\">(.*?)</article>", re.S)
_TITLE = re.compile(r"<h3><a href=\"([^\"]*)\"><span><span>(.*?)</span>", re.S)
_REGION = re.compile(r"<p>(.*?)</p></header>", re.S)
_NAME = re.compile(r"class=\"pull-right\">(.*?)</li>", re.S)
_ROOMS = re.compile(r"offer-item-rooms hidden-xs\">(.*?)</li>", re.S)
_PRICE = re.compile(r"class=\"offer-item-price\">(.*?)</li>", re.S)
_PER_M2 = re.compile(r"offer-item-price-per-m\">(.*?)</li>", re.S)
_AREA = re.compile(r"offer-item-area\">(.*?)</li>", re.S)
_PAGER = re.compile(r"<div id=\"pagerForm\">(.*?)</div>", re.S)
_ANCHOR = re.compile(r"<li><a href=\"[^\"]*\">([^<]*)</a></li>")
_IMG = re.compile(r"data-image-id=\"([^\"]+)\"")
_CAPTION = re.compile(r"<figcaption>(.*?)</figcaption>", re.S)


_LOC = re.compile(r"<loc>(.*?)</loc>", re.S)


def parse_sitemap(xml: str) -> list[str]:
    """Sitemap ``<loc>`` URLs in document order (compiled regex — no
    lxml in-sandbox; sitemap XML is flat enough that RE is exact)."""
    return _LOC.findall(xml or "")


def parse_pagination(html: str) -> list[int]:
    """Pagination anchors → ints; non-numeric anchors skipped (M5/F4,
    ``otodom/total_pages/handler.go:30-43``)."""
    m = _PAGER.search(html)
    if not m:
        return []
    out = []
    for text in _ANCHOR.findall(m.group(1)):
        try:
            out.append(int(text))
        except ValueError:
            continue  # permissive parse: reference logs + skips
    return out


def expand_pages(url: str, last_page: int) -> list[tuple[int, str]]:
    """Range expansion M6 with the reference's exact off-by-one:
    pages 1..last_page-1, ``?page=``/``&page=`` chosen by a contains-?
    predicate (``otodom/total_pages/handler.go:53-65``)."""
    sep = "&" if "?" in url else "?"
    return [(i, f"{url}{sep}page={i}") for i in range(1, last_page)]


def _field(pat: re.Pattern, body: str) -> str:
    m = pat.search(body)
    return m.group(1) if m else ""


def _parse_articles(html: str) -> list[dict]:
    out = []
    for _aid, body in _ARTICLE.findall(html):
        tm = _TITLE.search(body)
        out.append(
            {
                "href": tm.group(1) if tm else "",
                "title": tm.group(2) if tm else "",
                "region": _field(_REGION, body),
                "name": _field(_NAME, body),
                "rooms_text": _field(_ROOMS, body),
                "price_text": _field(_PRICE, body),
                "per_m2_text": _field(_PER_M2, body),
                "area_text": _field(_AREA, body),
            }
        )
    return out


def parse_listing_flat(html: str, url: str) -> list[dict]:
    """Flat schema (M1, ``otodom/flat_crawler/handler.go:93-104``):
    7 raw-string fields; numeric normalization happens vectorized
    downstream (canon.extract_number / take_characters_before)."""
    rows = []
    for a in _parse_articles(html):
        rows.append(
            {
                "title": a["title"],
                "name": a["name"],
                "region": a["region"],
                "rooms_raw": a["rooms_text"],
                "price_raw": a["price_text"],
                "total_price_raw": None,
                "area_raw": a["area_text"],
                "href": a["href"],
            }
        )
    return rows


def parse_listing_office(html: str, url: str) -> list[dict]:
    """Office schema (M4, ``otodom/office_crawler/handler.go:92-103``):
    price = per-m² cell, total_price = the price cell."""
    rows = []
    for a in _parse_articles(html):
        rows.append(
            {
                "title": a["title"],
                "name": a["name"],
                "region": a["region"],
                "rooms_raw": None,
                "price_raw": a["per_m2_text"],
                "total_price_raw": a["price_text"],
                "area_raw": a["area_text"],
                "href": a["href"],
            }
        )
    return rows


def parse_offer_images(html: str, url: str) -> list[dict]:
    """Offer page → (image_id, caption) pairs (engine extension: the
    reference stops at listing extraction; the north rule adds the
    image+caption payload path)."""
    ids = _IMG.findall(html)
    caps = _CAPTION.findall(html)
    return [
        {"image_id": iid, "caption": caps[i] if i < len(caps) else ""}
        for i, iid in enumerate(ids)
    ]


# --- plugin registry (§2.9) ---------------------------------------------


@dataclass(frozen=True)
class ParserSpec:
    schema_name: str
    schema_version: str
    parse: Callable[[str, str], list[dict]]
    fields: dict = field(default_factory=dict)  # schema-as-data (otodom/commons/entry.go:12-27)


_REGISTRY: dict[str, ParserSpec] = {}


def register_parser(spec: ParserSpec) -> None:
    _REGISTRY[spec.schema_name] = spec


def get_parser(schema_name: str) -> ParserSpec:
    return _REGISTRY[schema_name]


def registered() -> dict[str, ParserSpec]:
    return dict(_REGISTRY)


register_parser(
    ParserSpec(
        "flat",
        "v0.0.3",
        parse_listing_flat,
        fields={
            "title": ("Title", "Advertisement Post title", "text"),
            "name": ("Agency Name", "Agency name or Private Offer", "text"),
            "region": ("Estate location", "Estate location", "text"),
            "rooms": ("Rooms in apartment", "Room count", "number"),
            "price": ("Estate price", "Price", "number"),
            "area": ("Available area", "Area in m²", "number"),
            "link": ("URL", "Offer URL", "URL"),
        },
    )
)
register_parser(
    ParserSpec(
        "office",
        "v0.0.3",
        parse_listing_office,
        fields={
            "title": ("Title", "Advertisement Post title", "text"),
            "name": ("Agency Name", "Agency name or Private Offer", "text"),
            "region": ("Estate location", "Estate location", "text"),
            "price": ("Price per m²", "Price per m²", "number"),
            "total_price": ("Total price", "Total price", "number"),
            "area": ("Available area", "Area in m²", "number"),
            "link": ("URL", "Offer URL", "URL"),
        },
    )
)
