"""Deterministic seeded synthetic web (no network; FIXTURES.md §1-3).

Replaces the live site the reference crawls/tests against
(``otodom/flat_crawler/handler_test.go:8-16`` hits otodom.pl). Every
page, article, image and failure is a pure function of ``(seed, url)``
via stable hashes — the whole web is generated lazily, so bench-scale
webs (1e6+ URLs) cost nothing to "host".

The HTML uses the exact structure the reference parses
(``otodom/flat_crawler/handler.go:93-104``, ``total_pages/handler.go:30``):
``article[id]``, ``div.offer-item-details > header > h3 > a > span >
span``, ``li.offer-item-rooms.hidden-xs`` …, pagination
``#pagerForm > ul > li > a`` (including a non-numeric "next »" anchor to
exercise the invalid-int filter F4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .hashing import stable_hash64
from . import imagecodec

_ARANGES: dict[int, "np.ndarray"] = {}


def _arange_cached(n: int) -> "np.ndarray":
    """Shared int64 arange for the image generator (dims ≤ 128, so the
    cache is tiny); callers must not mutate."""
    a = _ARANGES.get(n)
    if a is None:
        _ARANGES[n] = a = np.arange(n, dtype=np.int64)
    return a


_WORDS = (
    "amber birch cedar delta ember flint grove harbor iris juniper "
    "kestrel larch maple north opal pine quartz river slate timber "
    "umber vale willow xenon yarrow zephyr"
).split()


@dataclass(frozen=True)
class WebConfig:
    seed: int = 42
    n_seeds: int = 8
    n_hosts: int = 5
    max_last_page: int = 6  # last_page in 2..2+max_last_page-1
    articles_min: int = 5
    articles_mod: int = 15
    images_per_offer_max: int = 3
    fail_bucket_mod: int = 10  # bucket 0 → first 2 attempts fail
    robots_block_offers_mod: int = 5  # hosts with h%mod==0 disallow /offer/
    # 0 = no redirects (default; all pre-redirect parity fixtures
    # unchanged). >0: offers with h%mod==0 have MOVED — /offer/<oid>.html
    # answers 301 → /offer-new/<oid>.html (a third of those via a 2-hop
    # chain through /moved/<oid>.html). The crawler must follow the
    # chain (colly rides Go's http.Client, which follows up to 10
    # redirects silently — flat_crawler/handler.go:92) and mark the
    # FINAL url seen so an independent discovery never refetches it.
    redirect_mod: int = 0


PROFILES = {
    "t1": WebConfig(n_seeds=4, n_hosts=3),
    "t2": WebConfig(n_seeds=8, n_hosts=5),
    # sized so the parallel fetch/encode work dominates per-round fixed
    # overhead (~100k URLs, ~200k images) — the scaling-efficiency
    # measurement needs compute ≫ driver/exec startup costs
    "bench": WebConfig(n_seeds=384, n_hosts=256, max_last_page=24, articles_mod=30),
    # ~1M-URL frontier (5120 seeds × ~8.5 pages × ~19 articles ≈ 0.9M
    # offers + 44k listing pages) for scheduler-throughput realism runs
    "frontier1m": WebConfig(
        n_seeds=5120, n_hosts=4096, max_last_page=16, articles_mod=25
    ),
    # ~8M-URL frontier (10× seeds/2× hosts of frontier1m) — the 1e7
    # north-rule evidence run (images off; scheduler + seen-set load)
    "frontier8m": WebConfig(
        n_seeds=51200, n_hosts=8192, max_last_page=16, articles_mod=25
    ),
    # ~16M-URL frontier (2× seeds / 2× hosts of frontier8m) — extends
    # the dataset-mode flat-throughput trend one more doubling
    "frontier16m": WebConfig(
        n_seeds=102400, n_hosts=16384, max_last_page=16, articles_mod=25
    ),
    # ~0.3M-URL frontier — same shape as frontier1m at ~1/3 the wall
    # time, for phase-profiling iterations on the dataset-mode loop
    "frontier300k": WebConfig(
        n_seeds=1536, n_hosts=2048, max_last_page=16, articles_mod=25
    ),
    # ~64M-URL frontier (4× seeds / 2× hosts of frontier16m) — the
    # round-5 decade-further evidence run: proves dataset-mode
    # throughput and the flat phase ledger hold one more 4× step
    # (1/150th of the 10^10 north-rule scale)
    "frontier64m": WebConfig(
        n_seeds=409600, n_hosts=32768, max_last_page=16, articles_mod=25
    ),
}


@dataclass
class FetchResult:
    url: str
    status: int
    body: str | None
    error: str | None = None
    nbytes: int = 0
    location: str | None = None  # 3xx target (absolute URL)
    etag: str | None = None  # content ETag (200 and 304 responses)


class SynthWeb:
    """The deterministic web. Stateless — safe to instantiate per actor."""

    def __init__(self, config: WebConfig | str = "t2"):
        self.cfg = PROFILES[config] if isinstance(config, str) else config

    # ---- topology -------------------------------------------------------

    def _h(self, *keys: object) -> int:
        return stable_hash64(self.cfg.seed, *keys)

    def host(self, i: int) -> str:
        return f"host{i}.test"

    def seeds(self) -> list[dict]:
        """Seed list (FIXTURES.md §1). Order is part of the contract."""
        out = []
        for sid in range(self.cfg.n_seeds):
            out.append(
                {
                    "seed_id": sid,
                    "url": f"https://{self.host(sid % self.cfg.n_hosts)}/list?cat={sid}",
                    "domain": f"domain-{sid % 4}",
                    "schema_name": "flat" if sid % 2 == 0 else "office",
                    "schema_version": "v0.0.3",
                }
            )
        return out

    def last_page(self, cat: int) -> int:
        return 2 + self._h("last", cat) % self.cfg.max_last_page

    def sitemap_path(self, host: str) -> str:
        """Where this host serves its sitemap. A third of hosts use a
        NON-default path declared only via the robots ``Sitemap:``
        directive — discovery must actually read robots (the default
        /sitemap.xml answers 404 there)."""
        if self._h("smpath", host) % 3 == 0:
            return "/sitemap-index.xml"
        return "/sitemap.xml"

    def robots_txt(self, host: str) -> str:
        lines = ["User-agent: *", "Disallow: /blocked/"]
        if self._h("robots", host) % self.cfg.robots_block_offers_mod == 0:
            lines.append("Disallow: /offer/")
        # every 5th host asks for politeness pacing (Crawl-delay honors
        # pacing ONLY — issue order/budget are scheduler-owned, so this
        # never affects refsim parity; buckets are off by default)
        if self._h("cdelay", host) % 5 == 0:
            lines.append("Crawl-delay: 2")
        # group-independent per the spec; seeds_from_sitemaps reads it
        lines.append(f"Sitemap: https://{host}{self.sitemap_path(host)}")
        return "\n".join(lines) + "\n"

    def host_blocks_offers(self, host: str) -> bool:
        return self._h("robots", host) % self.cfg.robots_block_offers_mod == 0

    def sitemap_xml(self, host: str) -> str:
        """Deterministic /sitemap.xml per host: every category-listing
        seed URL this host serves, ascending by category — the seed-
        DISCOVERY surface (crawlers bootstrap from sitemaps; the
        reference hardcodes one SOURCE_URL per orchestrator env,
        stack.yml:20-24)."""
        try:
            hidx = int(host.removeprefix("host").split(".")[0])
        except ValueError:
            return '<?xml version="1.0" encoding="UTF-8"?><urlset></urlset>'
        locs = [
            f"  <url><loc>https://{self.host(hidx)}/list?cat={sid}</loc></url>"
            for sid in range(self.cfg.n_seeds)
            if sid % self.cfg.n_hosts == hidx
        ]
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "\n".join(locs)
            + "\n</urlset>\n"
        )

    # ---- page generation ------------------------------------------------

    def _fmt_price(self, v: int) -> str:
        s = f"{v:,}".replace(",", " ")
        return s

    def _offer_id(self, cat: int, page: int, k: int) -> str:
        return f"{self._h('offer', cat, page, k):016x}"

    def n_articles(self, cat: int, page: int) -> int:
        return self.cfg.articles_min + self._h("narts", cat, page) % self.cfg.articles_mod

    def article_fields(self, cat: int, page: int, k: int) -> dict:
        """Raw (pre-normalization) strings embedded in the listing HTML."""
        oid = self._offer_id(cat, page, k)
        h = self._h("art", oid)
        host = self.host(cat % self.cfg.n_hosts)
        price = 500 + h % 5000
        return {
            "offer_id": oid,
            "title": f"Offer {_WORDS[h % len(_WORDS)]} {oid[:6]}",
            "name": "Oferta prywatna" if h % 3 == 0 else f"Agency {_WORDS[(h >> 8) % len(_WORDS)]}",
            "region": f"Region {_WORDS[(h >> 16) % len(_WORDS)]}",
            "rooms_text": f"{1 + (h >> 4) % 5} pokoje",
            # reference-realistic messy spacing (extensions_test.go:11-15)
            "price_text": f"{self._fmt_price(price)} zł                /mc",
            "area_text": f"{20 + (h >> 12) % 80} m²",
            "per_m2_text": f"{10 + (h >> 20) % 90} zł/m²",
            "total_price_text": f"{self._fmt_price(price * (20 + (h >> 12) % 80))} zł",
            "href": f"https://{host}/offer/{oid}.html#{(h >> 24) % 0xFFFF:04x}",
        }

    def listing_html(self, cat: int, page: int) -> str:
        last = self.last_page(cat)
        pager = "".join(
            f'<li><a href="?cat={cat}&page={i}">{i}</a></li>' for i in range(1, last + 1)
        )
        pager += '<li><a href="#">next »</a></li>'  # non-numeric → F4 skip
        arts = []
        for k in range(self.n_articles(cat, page)):
            f = self.article_fields(cat, page, k)
            arts.append(
                f'<article id="offer-{f["offer_id"]}">'
                f'<div class="offer-item-details">'
                f'<header><h3><a href="{f["href"]}"><span><span>{f["title"]}</span></span></a></h3>'
                f'<p>{f["region"]}</p></header>'
                f"<ul>"
                f'<li class="offer-item-rooms hidden-xs">{f["rooms_text"]}</li>'
                f'<li class="offer-item-price">{f["price_text"]}</li>'
                f'<li class="hidden-xs offer-item-price-per-m">{f["per_m2_text"]}</li>'
                f'<li class="hidden-xs offer-item-area">{f["area_text"]}</li>'
                f"</ul></div>"
                f'<div class="offer-item-details-bottom"><ul><li class="pull-right">{f["name"]}</li></ul></div>'
                f"</article>"
            )
        return (
            "<html><body>"
            f'<div id="pagerForm"><ul>{pager}</ul></div>'
            + "".join(arts)
            + "</body></html>"
        )

    def n_images(self, offer_id: str) -> int:
        return 1 + self._h("nimg", offer_id) % self.cfg.images_per_offer_max

    def offer_html(self, offer_id: str) -> str:
        imgs = []
        for k in range(self.n_images(offer_id)):
            iid = f"img-{offer_id}-{k}"
            imgs.append(
                f'<figure><img data-image-id="{iid}" src="/img/{iid}"/>'
                f"<figcaption>{self.caption(iid)}</figcaption></figure>"
            )
        return "<html><body>" + "".join(imgs) + "</body></html>"

    # ---- images (FIXTURES.md §3 — exactly the input_hint shape) ---------

    def caption(self, image_id: str) -> str:
        h = self._h("cap", image_id)
        n = 3 + h % 6
        words = [_WORDS[(h >> (5 * (i + 1))) % len(_WORDS)] for i in range(n)]
        return f"caption {image_id}: " + " ".join(words)

    def image_pixels(self, image_id: str) -> np.ndarray:
        """Deterministic RGB gradient+noise, shape (h, w, 3) uint8.
        Byte-identical to the original mgrid+float64 formulation
        (broadcasted aranges give the same yy/xx values; int64
        clip ≡ float64 clip on these small integers) — this is the
        crawl image hot path's first stage, so no per-image mgrid or
        float round-trip."""
        h64 = self._h("img", image_id)
        w = 32 + h64 % 97
        ht = 32 + (h64 >> 32) % 61
        rng = np.random.Generator(np.random.PCG64(h64))
        yy = _arange_cached(ht)[:, None]
        xx = _arange_cached(w)[None, :]
        base = np.empty((ht, w, 3), dtype=np.int64)
        np.mod(xx * (1 + h64 % 5) + yy, 256, out=base[:, :, 0])
        np.mod(
            np.broadcast_to(yy * (1 + (h64 >> 8) % 7), (ht, w)), 256,
            out=base[:, :, 1],
        )
        np.mod(xx + yy * (1 + (h64 >> 16) % 3), 256, out=base[:, :, 2])
        noise = rng.integers(-12, 13, size=base.shape)
        base += noise
        return np.clip(base, 0, 255).astype(np.uint8)

    def image_fmt(self, image_id: str) -> str:
        return "png" if self._h("fmt", image_id) % 2 == 0 else "jpeg"

    def image_record(self, image_id: str) -> dict:
        """Full images-table row: (image_id, bytes, w, h, fmt, caption, phash)."""
        return self.image_records([image_id])[0]

    def image_records(self, image_ids: list[str]) -> list[dict]:
        """Batched image rows — the fused image task's entry point.
        jpeg images share one vectorized ``encode_jpeg_batch`` call;
        phash is computed on the decoder-exact decoded pixels (free
        from the encoder — no bitstream re-parse). Byte-identical to
        per-image generation (test-pinned vs refsim)."""
        pxs = [self.image_pixels(i) for i in image_ids]
        fmts = [self.image_fmt(i) for i in image_ids]
        datas, decs = imagecodec.encode_batch(pxs, fmts)
        return [
            {
                "image_id": iid,
                "bytes": data,
                "w": int(px.shape[1]),
                "h": int(px.shape[0]),
                "fmt": fmt,
                "caption": self.caption(iid),
                "phash": np.int64(np.uint64(imagecodec.phash64(dec))).item(),
            }
            for iid, px, fmt, data, dec in zip(image_ids, pxs, fmts, datas, decs)
        ]

    # ---- fetch (the S1 analog; deterministic failures → T3 retry) -------

    def fail_attempts(self, url: str) -> int:
        """Number of leading attempts that fail for this URL (0 or 2)."""
        return 2 if self._h("fail", url) % self.cfg.fail_bucket_mod == 0 else 0

    def redirect_target(self, url: str) -> str | None:
        """301 Location for ``url``, or None. Deterministic in (seed,
        oid): moved offers answer 301 at their ORIGINAL path; a third of
        them hop twice (/moved/ → /offer-new/). ``/loop/a|b.html`` is a
        planted redirect cycle (never linked from any page — reachable
        only by direct fetch, for the hop-cap tests)."""
        if not self.cfg.redirect_mod:
            return None
        from urllib.parse import urlsplit

        parts = urlsplit(url)
        base = f"https://{parts.netloc}"
        path = parts.path
        if path == "/loop/a.html":
            return f"{base}/loop/b.html"
        if path == "/loop/b.html":
            return f"{base}/loop/a.html"
        for prefix, two_hop_src in (("/offer/", True), ("/moved/", False)):
            if path.startswith(prefix) and path.endswith(".html"):
                oid = path[len(prefix):-len(".html")]
                if self._h("redir", oid) % self.cfg.redirect_mod != 0:
                    return None
                if two_hop_src and self._h("redir2", oid) % 3 == 0:
                    return f"{base}/moved/{oid}.html"
                return f"{base}/offer-new/{oid}.html"
        return None

    @staticmethod
    def _etag_of(body: str) -> str:
        import hashlib

        return hashlib.blake2b(body.encode("utf-8"), digest_size=8).hexdigest()

    def etag(self, url: str) -> str | None:
        """Current content ETag for ``url`` (None for 3xx/404 paths).
        Pure content hash, as real servers derive it — identical content
        across web generations keeps its ETag."""
        if self.redirect_target(url) is not None:
            return None
        body = self._route(url)
        return None if body is None else self._etag_of(body)

    def fetch(
        self, url: str, attempt: int = 1, if_none_match: str | None = None
    ) -> FetchResult:
        """GET a synthetic URL. ``attempt`` is 1-based; transient 503s for
        fail-bucket URLs on attempts ≤ fail_attempts(url). Moved pages
        (redirect_target) answer 301 with a Location — the transient-fail
        bucket applies to the REQUESTED url first, as on a real server.
        ``if_none_match``: conditional GET — when it equals the current
        content ETag the server answers 304 Not Modified with no body."""
        if attempt <= self.fail_attempts(url):
            return FetchResult(url, 503, None, error="synthetic transient failure")
        loc = self.redirect_target(url)
        if loc is not None:
            return FetchResult(url, 301, None, location=loc)
        body = self._route(url)
        if body is None:
            return FetchResult(url, 404, None, error="not found")
        et = self._etag_of(body)
        if if_none_match is not None and if_none_match == et:
            return FetchResult(url, 304, None, nbytes=0, etag=et)
        return FetchResult(url, 200, body, nbytes=len(body), etag=et)

    def _route(self, url: str) -> str | None:
        from urllib.parse import urlsplit, parse_qs

        parts = urlsplit(url)
        host = parts.netloc.lower()
        try:
            hidx = int(host.removeprefix("host").split(".")[0])
        except ValueError:
            return None
        if hidx < 0 or hidx >= self.cfg.n_hosts:
            return None
        if parts.path == "/robots.txt":
            return self.robots_txt(host)
        if parts.path == self.sitemap_path(host):
            return self.sitemap_xml(host)
        if parts.path == "/list":
            q = parse_qs(parts.query)
            cat = int(q.get("cat", ["-1"])[0])
            if cat < 0 or cat >= self.cfg.n_seeds or cat % self.cfg.n_hosts != hidx:
                return None
            page = int(q.get("page", ["1"])[0])
            if page < 1 or page > self.last_page(cat):
                return None
            return self.listing_html(cat, page)
        if parts.path.startswith("/offer/") and parts.path.endswith(".html"):
            oid = parts.path[len("/offer/") : -len(".html")]
            return self.offer_html(oid)
        if (
            self.cfg.redirect_mod
            and parts.path.startswith("/offer-new/")
            and parts.path.endswith(".html")
        ):
            # the moved offer's final home serves the SAME offer page
            oid = parts.path[len("/offer-new/") : -len(".html")]
            if self._h("redir", oid) % self.cfg.redirect_mod == 0:
                return self.offer_html(oid)
        return None
