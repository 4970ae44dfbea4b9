from crawlkit.stages import parsers
from crawlkit.stages.politeness import TokenBucket, allowed, parse_robots
from crawlkit.synthweb import SynthWeb


def test_pagination_parse_skips_non_numeric():
    web = SynthWeb("t1")
    html = web.listing_html(0, 1)
    pages = parsers.parse_pagination(html)
    assert pages == list(range(1, web.last_page(0) + 1))  # "next »" skipped (F4)


def test_expand_pages_off_by_one_and_separator():
    # reference semantics (total_pages/handler.go:53-65): 1..last-1
    got = parsers.expand_pages("https://h.test/list?cat=1", 4)
    assert got == [
        (1, "https://h.test/list?cat=1&page=1"),
        (2, "https://h.test/list?cat=1&page=2"),
        (3, "https://h.test/list?cat=1&page=3"),
    ]
    got2 = parsers.expand_pages("https://h.test/list", 3)
    assert got2[0] == (1, "https://h.test/list?page=1")  # '?' branch (F3)
    assert parsers.expand_pages("https://h.test/list", 1) == []
    assert parsers.expand_pages("https://h.test/list", 0) == []


def test_flat_parser_extracts_all_articles():
    web = SynthWeb("t1")
    html = web.listing_html(0, 1)
    rows = parsers.parse_listing_flat(html, "u")
    assert len(rows) == web.n_articles(0, 1)
    f0 = web.article_fields(0, 1, 0)
    assert rows[0]["title"] == f0["title"]
    assert rows[0]["rooms_raw"] == f0["rooms_text"]
    assert rows[0]["href"] == f0["href"]
    assert rows[0]["total_price_raw"] is None


def test_office_parser_field_mapping():
    web = SynthWeb("t1")
    html = web.listing_html(1, 1)
    rows = parsers.parse_listing_office(html, "u")
    f0 = web.article_fields(1, 1, 0)
    # office: price = per-m² cell, total_price = the price cell (M4)
    assert rows[0]["price_raw"] == f0["per_m2_text"]
    assert rows[0]["total_price_raw"] == f0["price_text"]


def test_offer_images_parse():
    web = SynthWeb("t1")
    html = web.offer_html("deadbeef")
    ims = parsers.parse_offer_images(html, "u")
    assert len(ims) == web.n_images("deadbeef")
    assert ims[0]["image_id"] == "img-deadbeef-0"
    assert ims[0]["caption"] == web.caption("img-deadbeef-0")


def test_parser_registry():
    assert set(parsers.registered()) >= {"flat", "office"}
    assert parsers.get_parser("flat").schema_version == "v0.0.3"


def test_robots_parse_and_match():
    rules = parse_robots(
        "User-agent: Googlebot\nDisallow: /x\n\nUser-agent: *\nDisallow: /offer/\nDisallow: /blocked/ # comment\n"
    )
    assert rules == ["/offer/", "/blocked/"]
    assert not allowed("/offer/abc.html", rules)
    assert allowed("/list", rules)


def test_token_bucket_deterministic():
    b = TokenBucket(rate=2.0, capacity=2.0)
    assert b.try_take(0.0)
    assert b.try_take(0.0)
    assert not b.try_take(0.0)  # empty
    assert b.wait_time(0.0) == 0.5
    assert b.try_take(0.5)  # refilled 1 token


def test_parse_sitemap_extracts_locs():
    from crawlkit.stages.parsers import parse_sitemap
    from crawlkit.synthweb import SynthWeb

    w = SynthWeb("t1")
    xml = w.sitemap_xml("host0.test")
    urls = parse_sitemap(xml)
    assert urls and all(u.startswith("https://host0.test/list?cat=") for u in urls)
    assert parse_sitemap("") == []
    assert parse_sitemap("<urlset></urlset>") == []


def test_seed_discovery_matches_configured_seeds():
    """Bootstrapping from /sitemap.xml reproduces the configured seed
    list exactly (order included) — so a sitemap-seeded crawl is
    byte-identical to the golden-tested configured-seed crawl."""
    from crawlkit.pipelines.crawl import seeds_from_sitemaps
    from crawlkit.synthweb import SynthWeb

    for prof in ("t1", "t2"):
        w = SynthWeb(prof)
        assert seeds_from_sitemaps(w) == w.seeds()


def test_parse_robots_crawl_delay():
    from crawlkit.stages.politeness import parse_robots_full

    rules, delay = parse_robots_full(
        "User-agent: *\nDisallow: /x/\nCrawl-delay: 2.5\n"
    )
    assert rules == ["/x/"] and delay == 2.5
    # malformed / absent / non-star blocks → None
    assert parse_robots_full("User-agent: *\nCrawl-delay: soon\n")[1] is None
    assert parse_robots_full("User-agent: other\nCrawl-delay: 9\n")[1] is None
    assert parse_robots_full("")[1] is None


def test_crawl_delay_overrides_bucket_rate():
    """A host with robots Crawl-delay gets a 1/delay token-bucket rate
    in the fetch stage; hosts without keep the default. Pacing only —
    outputs/ordering are pinned elsewhere (golden tests)."""
    from crawlkit.stages.fetch import FetchParse
    from crawlkit.synthweb import SynthWeb

    w = SynthWeb("t1")
    # find one host of each kind among the configured hosts
    delayed = [h for i in range(w.cfg.n_hosts)
               if "Crawl-delay" in w.robots_txt(h := w.host(i))]
    plain = [h for i in range(w.cfg.n_hosts)
             if "Crawl-delay" not in w.robots_txt(h := w.host(i))]
    stage = FetchParse("t1", rate_per_host=10.0)
    if delayed:
        d = stage.robots.delay_for(delayed[0])
        assert d == 2.0
        assert stage.buckets.bucket(delayed[0], 1.0 / d).rate == 0.5
    assert plain and stage.robots.delay_for(plain[0]) is None
    assert stage.buckets.bucket(plain[0], None).rate == 10.0


def test_robots_sitemap_directive_drives_discovery():
    """robots.txt declares the sitemap location (group-independent
    Sitemap: directive); a third of synth hosts serve it at a
    NON-default path where /sitemap.xml answers 404 — discovery must
    actually read robots to find those hosts' seeds."""
    from crawlkit.stages.politeness import parse_robots_sitemaps
    from crawlkit.synthweb import SynthWeb

    w = SynthWeb("t2")
    nondefault = [
        w.host(i) for i in range(w.cfg.n_hosts)
        if w.sitemap_path(w.host(i)) != "/sitemap.xml"
    ]
    assert nondefault, "fixture must include non-default sitemap hosts"
    h = nondefault[0]
    sm = parse_robots_sitemaps(w.robots_txt(h))
    assert sm == [f"https://{h}/sitemap-index.xml"]
    # the default path 404s there; the declared path serves the sitemap
    assert w.fetch(f"https://{h}/sitemap.xml", attempt=5).status == 404
    assert w.fetch(sm[0], attempt=5).status == 200
    # directives are parsed outside User-agent groups; comments stripped
    assert parse_robots_sitemaps(
        "User-agent: x\nSitemap: https://a/s.xml # c\n\nsitemap: https://b/t.xml"
    ) == ["https://a/s.xml", "https://b/t.xml"]
