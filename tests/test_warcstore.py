"""WARC archive layer: roundtrip byte-parity, idempotent rewrite,
index-pruned reads, and archive re-parse ≡ live-crawl entries."""

import glob
import gzip

import pyarrow.compute as pc
import pytest
import ray.data

from crawlkit.state import warcstore
from crawlkit.synthweb import SynthWeb, WebConfig

CFG = WebConfig(n_seeds=4, n_hosts=3, max_last_page=4)


@pytest.fixture(scope="module")
def crawl_and_archive(tmp_path_factory):
    from crawlkit.pipelines.crawl import run_crawl
    from crawlkit.refsim import CrawlSpec

    base = tmp_path_factory.mktemp("warc")
    root = str(base / "archive")
    res = run_crawl(
        SynthWeb(CFG),
        spec=CrawlSpec(host_budget_per_round=32),
        out_dir=str(base / "crawl"),
        num_seen_shards=2,
        fetch_concurrency=2,
        archive_root=root,
    )
    return res, root


def test_record_roundtrip_unit():
    body = b"<html>hello</html>"
    meta = {"schema_name": "flat", "schema_version": "v1", "domain": "d",
            "created": "2026-01-01", "depth": 1}
    raw = warcstore.build_record("https://host0.test/x", 200, body, meta)
    rec = warcstore.parse_record(gzip.decompress(raw))
    assert rec["url"] == "https://host0.test/x"
    assert rec["status"] == 200
    assert rec["body"] == body
    assert rec["schema_name"] == "flat"
    assert rec["depth"] == 1
    # deterministic bytes (mtime=0): same inputs → same gzip member
    assert raw == warcstore.build_record("https://host0.test/x", 200, body, meta)


def test_archive_matches_fetch_log(crawl_and_archive):
    res, root = crawl_and_archive
    log = res.fetch_log_table()
    n_ok = log.filter(pc.equal(log["status"], 200)).num_rows
    idx = warcstore.TableStore(f"{root}/index").read_table()
    assert idx.num_rows == n_ok
    assert pc.all(pc.equal(idx["status"], 200)).as_py()


def test_archive_roundtrip_bytes(crawl_and_archive):
    _res, root = crawl_and_archive
    web = SynthWeb(CFG)
    recs = warcstore.read_warc(root).to_pandas()
    assert len(recs) > 0
    for url, body in zip(recs["url"], recs["body"]):
        expect = web.fetch(url, attempt=web.fail_attempts(url) + 1).body.encode()
        assert body == expect


def test_index_pruned_read(crawl_and_archive):
    _res, root = crawl_and_archive
    idx_all = warcstore.TableStore(f"{root}/index").read_table()
    n_depth1 = idx_all.filter(pc.equal(idx_all["depth"], 1)).num_rows
    assert 0 < n_depth1 < idx_all.num_rows
    recs = warcstore.read_warc(
        root,
        index_filter=lambda idx: idx.map_batches(
            lambda t: t.filter(pc.equal(t["depth"], 1)), batch_format="pyarrow"
        ),
    ).to_pandas()
    assert len(recs) == n_depth1
    assert (recs["depth"] == 1).all()


def test_reparse_matches_live_entries(crawl_and_archive):
    res, root = crawl_and_archive
    live = res.entries_table().to_pandas()
    re = warcstore.reparse_entries(warcstore.read_warc(root)).to_pandas()
    cols = sorted(live.columns)
    assert sorted(re.columns) == cols
    live_s = live[cols].sort_values(cols).reset_index(drop=True)
    re_s = re[cols].sort_values(cols).reset_index(drop=True)
    assert live_s.equals(re_s)


def test_standalone_archive_idempotent(tmp_path):
    """archive_pages (page-list mode) rewrites byte-identical shards and
    commits zero duplicate index rows on a second run."""
    web = SynthWeb(CFG)
    pages = ray.data.from_items(
        [
            {"url": s["url"], "schema_name": s["schema_name"],
             "schema_version": s["schema_version"], "domain": s["domain"],
             "created": "2026-01-01", "depth": 0}
            for s in web.seeds()
        ]
    )
    root = str(tmp_path / "arch2")
    store = warcstore.archive_pages(CFG, pages, root, batch_size=8, concurrency=1)
    n1 = store.count_rows()
    v1 = store.latest_version()
    shards1 = {p: open(p, "rb").read() for p in glob.glob(f"{root}/shards/*.warc.gz")}
    assert n1 == len(web.seeds()) and shards1
    store2 = warcstore.archive_pages(CFG, pages, root, batch_size=8, concurrency=1)
    assert store2.count_rows() == n1
    assert store2.latest_version() == v1
    for p, b in shards1.items():
        assert open(p, "rb").read() == b


def test_wet_extract_strips_tags_exactly(crawl_and_archive):
    """WET text of an archived listing page == regex-free reference
    computed in Python on the same body: no '<' survives, word counts
    match, and a known article title appears in the text."""
    import re

    _res, root = crawl_and_archive
    wet = warcstore.wet_extract(warcstore.read_warc(root)).to_pandas()
    recs = warcstore.read_warc(root).to_pandas()
    bodies = dict(zip(recs["url"], recs["body"]))
    assert len(wet) == len(recs)
    for _i, row in wet.head(20).iterrows():
        html = bodies[row["url"]].decode()
        expect = re.sub(r"\s+", " ", re.sub(r"<[^>]*>", " ", html)).strip()
        assert row["text"] == expect
        assert "<" not in row["text"]
        assert row["nwords"] == len(expect.split())
    # depth-1 listing pages carry article titles into the WET text
    d1 = wet[wet["depth"] == 1]
    assert (d1["nwords"] > 0).all()


def test_dist_mode_archive_parity(crawl_and_archive, tmp_path):
    """Distributed-frontier mode archives the SAME record set (urls,
    statuses, payload digests) as driver mode — batching differs, bytes
    per record don't."""
    from crawlkit.pipelines.crawl_dist import run_crawl_dataset
    from crawlkit.refsim import CrawlSpec

    _res, root = crawl_and_archive
    droot = str(tmp_path / "arc_dist")
    res_d = run_crawl_dataset(
        SynthWeb(CFG), spec=CrawlSpec(host_budget_per_round=32),
        out_dir=str(tmp_path / "crawl_dist"), num_seen_shards=2, nblocks=4,
        archive_root=droot,
    )
    idx_driver = warcstore.TableStore(f"{root}/index").read_table().to_pandas()
    idx_dist = res_d.archive_store.read_table().to_pandas()
    cols = ["url", "status", "payload_digest", "schema_name", "depth"]
    a = idx_driver[cols].sort_values(cols).reset_index(drop=True)
    b = idx_dist[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_archive_delta_classes(tmp_path):
    """Full-outer CDX diff of two crawl generations of a grown web:
    classes verified against a Python reference diff of the two
    indexes (url → digest maps)."""
    from crawlkit.pipelines.crawl import run_crawl
    from crawlkit.refsim import CrawlSpec

    spec = CrawlSpec(host_budget_per_round=32)
    roots = {}
    for gen, mlp in (("a", 3), ("b", 6)):
        roots[gen] = str(tmp_path / f"arc_{gen}")
        run_crawl(
            SynthWeb(WebConfig(n_seeds=4, n_hosts=3, max_last_page=mlp)),
            spec=spec, out_dir=str(tmp_path / f"crawl_{gen}"),
            num_seen_shards=2, fetch_concurrency=2, archive_root=roots[gen],
        )
    delta = warcstore.archive_delta(roots["a"], roots["b"]).to_pandas()
    ia = warcstore.TableStore(f"{roots['a']}/index").read_table().to_pandas()
    ib = warcstore.TableStore(f"{roots['b']}/index").read_table().to_pandas()
    da = dict(zip(ia["url"], ia["payload_digest"]))
    db = dict(zip(ib["url"], ib["payload_digest"]))

    def ref_class(u):
        if u not in da:
            return "added"
        if u not in db:
            return "removed"
        return "unchanged" if da[u] == db[u] else "changed"

    assert len(delta) == len(set(da) | set(db))
    assert set(delta["url"]) == set(da) | set(db)
    mism = [(u, c, ref_class(u)) for u, c in zip(delta["url"], delta["change"])
            if c != ref_class(u)]
    assert mism == []
    counts = delta["change"].value_counts()
    # grown web: new pages exist; some listings re-paginate (changed);
    # offers shared by both generations are byte-stable (unchanged)
    assert counts.get("added", 0) > 0
    assert counts.get("changed", 0) > 0
    assert counts.get("unchanged", 0) > 0


def test_change_rate_reference(tmp_path):
    """change_rate per-url stats ≡ a Python reference over three
    generations (g0 == g1 identical web, g2 grown): offers present in
    all three gens are cold; every stat row matches the reference."""
    from collections import defaultdict

    from crawlkit.pipelines.crawl import run_crawl
    from crawlkit.refsim import CrawlSpec

    spec = CrawlSpec(host_budget_per_round=32)
    roots = []
    for gen, mlp in (("g0", 3), ("g1", 3), ("g2", 6)):
        roots.append(str(tmp_path / f"arc_{gen}"))
        run_crawl(
            SynthWeb(WebConfig(n_seeds=4, n_hosts=3, max_last_page=mlp)),
            spec=spec, out_dir=str(tmp_path / f"crawl_{gen}"),
            num_seen_shards=2, fetch_concurrency=2, archive_root=roots[-1],
        )
    rates = warcstore.change_rate(roots, nshards=4).to_pandas()

    hist = defaultdict(list)  # url -> [(gen, digest)] in gen order
    for g, root in enumerate(roots):
        idx = warcstore.TableStore(f"{root}/index").read_table().to_pandas()
        for u, d in zip(idx["url"], idx["payload_digest"]):
            hist[u].append((g, d))
    assert len(rates) == len(hist)
    by_url = rates.set_index("url")
    for u, obs in hist.items():
        digests = [d for _g, d in obs]
        changes = sum(1 for a, b in zip(digests, digests[1:]) if a != b)
        row = by_url.loc[u]
        assert row["observations"] == len(obs), u
        assert row["changes"] == changes, u
        assert row["first_gen"] == obs[0][0] and row["last_gen"] == obs[-1][0], u
        if len(obs) <= 1:
            expect = "new"
        elif changes == 0:
            expect = "cold"
        elif 2 * changes >= len(obs) - 1:
            expect = "hot"
        else:
            expect = "warm"
        assert row["bucket"] == expect, u
    # g0 == g1: any url observed in both with no growth effect is cold;
    # offers are content-stable across generations
    offer_rows = rates[rates["url"].str.contains("/offer/")]
    full_hist_offers = offer_rows[offer_rows["observations"] == 3]
    assert len(full_hist_offers) > 0
    assert (full_hist_offers["bucket"] == "cold").all()


def test_extract_links_reference(crawl_and_archive):
    """Edge extraction ≡ a Python reference over every archived page:
    offer edges = article hrefs, page edges = RFC-3986-resolved pager
    anchors; listing pages link every offer article they render."""
    import re

    _res, root = crawl_and_archive
    recs = warcstore.read_warc(root).to_pandas()
    edges = warcstore.extract_links(warcstore.read_warc(root)).to_pandas()
    got = {(s, d, k) for s, d, k in zip(edges["src"], edges["dst"], edges["kind"])}

    expect = set()
    for url, body in zip(recs["url"], recs["body"]):
        html = body.decode()
        for href in re.findall(r'<h3><a href="([^"]+)"', html):
            expect.add((url, href, "offer"))
        m = re.search(r'<div id="pagerForm">(.*?)</div>', html, re.S)
        if m:
            base = url.split("?", 1)[0]
            for q in re.findall(r'<li><a href="([^"#]+)"', m.group(1)):
                expect.add((url, base + q, "page"))
    assert got == expect
    # depth-1 listing pages must contribute offer edges
    d1 = edges[(edges["src_depth"] == 1) & (edges["kind"] == "offer")]
    assert len(d1) > 0


def test_digest_tamper_detected(crawl_and_archive):
    _res, root = crawl_and_archive
    shard = sorted(glob.glob(f"{root}/shards/*.warc.gz"))[0]
    raw = gzip.decompress(open(shard, "rb").read())  # first member(s)
    head, rest = raw.split(b"\r\n\r\n", 1)
    assert b"<html" in rest
    tampered = head + b"\r\n\r\n" + rest.replace(b"<html", b"<hxml", 1)
    with pytest.raises(ValueError, match="digest mismatch"):
        warcstore.parse_record(tampered)


def test_image_archive_restores_input_hint_table(tmp_path):
    """archive_images=True: every image payload becomes its own binary
    WARC record (depth 3); restore_images rebuilds the full north-rule
    table from the archive alone — bytes from payload records, captions
    from re-parsed offer HTML, w/h/phash re-derived by decode — byte-
    level equal to the live crawl's images store. Dist mode archives the
    identical image record set."""
    import pandas as pd

    from crawlkit.pipelines.crawl import run_crawl
    from crawlkit.pipelines.crawl_dist import run_crawl_dataset
    from crawlkit.refsim import CrawlSpec
    from crawlkit.state import warcstore
    from crawlkit.state.lancelike import TableStore

    root = str(tmp_path / "archive")
    res = run_crawl(
        SynthWeb(CFG),
        spec=CrawlSpec(host_budget_per_round=32),
        out_dir=str(tmp_path / "crawl"),
        num_seen_shards=2,
        archive_root=root,
        archive_images=True,
    )
    live = res.images_table().to_pandas().sort_values("image_id").reset_index(drop=True)
    rest = (
        warcstore.restore_images(root)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert len(rest) == len(live) > 0
    meta_cols = ["image_id", "w", "h", "fmt", "caption", "phash"]
    pd.testing.assert_frame_equal(live[meta_cols], rest[meta_cols])
    assert all(bytes(a) == bytes(b) for a, b in zip(live["bytes"], rest["bytes"]))

    # mixed archive (HTML + binary image payloads): text stages must
    # filter to content_type text/* instead of UTF-8-casting image bytes
    # (rehearsal-caught regression after image archiving landed)
    idx = TableStore(f"{root}/index").read_table(
        columns=["content_type", "depth"]
    ).to_pandas()
    assert (idx["depth"] == 3).any()
    assert (idx.loc[idx["depth"] == 3, "content_type"].str.startswith("image/")).all()
    assert (idx.loc[idx["depth"] < 3, "content_type"] == "text/html").all()
    wet = warcstore.wet_extract(warcstore.read_warc(root)).to_pandas()
    assert len(wet) > 0 and (wet["depth"] < 3).all()
    edges = warcstore.extract_links(warcstore.read_warc(root)).to_pandas()
    assert len(edges) > 0

    # dist mode: identical image record set in the index
    droot = str(tmp_path / "darchive")
    run_crawl_dataset(
        SynthWeb(CFG),
        spec=CrawlSpec(host_budget_per_round=32),
        out_dir=str(tmp_path / "dcrawl"),
        num_seen_shards=2,
        nblocks=4,
        archive_root=droot,
        archive_images=True,
    )
    def img_index(r):
        t = TableStore(f"{r}/index").read_table(columns=["url", "payload_digest", "depth"])
        df = t.to_pandas()
        return set(map(tuple, df[df["depth"] == 3][["url", "payload_digest"]].to_numpy()))
    assert img_index(droot) == img_index(root)


def test_wat_reference(crawl_and_archive):
    """WAT metadata ≡ a Python reference over every archived page: ALL
    anchor/image references with their anchor text — offer anchors
    (span text), numeric pager anchors, the non-crawlable '#' nav
    anchor, and img references with figcaptions."""
    import re

    _res, root = crawl_and_archive
    recs = warcstore.read_warc(root).to_pandas()
    wat = warcstore.wat_extract(warcstore.read_warc(root)).to_pandas()
    assert len(wat) == len(recs)  # every content record → one WAT row

    got = {
        (r["url"], l["url"], l["text"], l["kind"])
        for _, r in wat.iterrows()
        for l in r["links"]
    }
    expect = set()
    for url, body in zip(recs["url"], recs["body"]):
        html = body.decode()
        for href, text in re.findall(
            r'<h3><a href="([^"]+)"><span><span>([^<]*)</span>', html
        ):
            expect.add((url, href, text, "offer"))
        m = re.search(r'<div id="pagerForm">(.*?)</div>', html, re.S)
        if m:
            base = url.split("?", 1)[0]
            for q, text in re.findall(r'<li><a href="([^"]+)">([^<]*)</a>', m.group(1)):
                if q.startswith("#"):
                    expect.add((url, url + q, text, "nav"))
                else:
                    expect.add((url, base + q, text, "page"))
        for isrc, cap in re.findall(
            r'<img data-image-id="[^"]*" src="([^"]+)"/><figcaption>([^<]*)</figcaption>',
            html,
        ):
            expect.add((url, isrc, cap, "img"))
    assert got == expect
    # n_links is the per-row list length; listing pages carry a nav link
    assert (wat["n_links"] == wat["links"].map(len)).all()
    assert (wat[wat["depth"] == 1]["links"].map(
        lambda ls: sum(1 for l in ls if l["kind"] == "nav")) == 1).all()
    # depth-2 offer pages reference their images with captions
    d2 = wat[wat["depth"] == 2]
    assert d2["links"].map(
        lambda ls: all(l["kind"] == "img" and l["text"] for l in ls)
    ).all()


def test_wat_superset_of_link_graph(crawl_and_archive):
    """WAT's crawlable links (offer/page kinds) are exactly the
    extract_links edge set — WAT is the strictly-richer metadata view."""
    _res, root = crawl_and_archive
    wat = warcstore.wat_extract(warcstore.read_warc(root)).to_pandas()
    edges = warcstore.extract_links(warcstore.read_warc(root)).to_pandas()
    got = {
        (r["url"], l["url"], l["kind"])
        for _, r in wat.iterrows()
        for l in r["links"]
        if l["kind"] in ("offer", "page")
    }
    expect = {(s, d, k) for s, d, k in zip(edges["src"], edges["dst"], edges["kind"])}
    assert got == expect


def test_wat_nested_flatten_arrow(crawl_and_archive):
    """The nested list<struct> links column flattens with Arrow kernels
    inside map_batches (no Python objects): per-kind link counts match
    a pandas-side explode."""
    import pyarrow as pa

    _res, root = crawl_and_archive
    wat_ds = warcstore.wat_extract(warcstore.read_warc(root))

    def per_kind(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t["links"])
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        kinds = flat.field("kind")
        vc = pa.table({"kind": kinds}).group_by("kind").aggregate([("kind", "count")])
        return vc.rename_columns(["kind", "n"])

    agg = wat_ds.map_batches(per_kind, batch_format="pyarrow").to_pandas()
    got = agg.groupby("kind")["n"].sum().to_dict()
    ref = (
        warcstore.wat_extract(warcstore.read_warc(root))
        .to_pandas()["links"]
        .explode()
        .dropna()
        .map(lambda l: l["kind"])
        .value_counts()
        .to_dict()
    )
    assert got == ref and set(got) == {"offer", "page", "nav", "img"}


def test_anchor_text_topk_reference(crawl_and_archive):
    """Anchor-text corpus ≡ a pandas reference over the full WAT link
    set: per-dst inbound anchor count, distinct texts, most-frequent
    text (ties → lexicographically smallest), global top-k by count."""
    import pandas as pd

    _res, root = crawl_and_archive
    k = 10
    got = warcstore.anchor_text_topk(root, k=k, nshards=4)

    wat = warcstore.wat_extract(warcstore.read_warc(root)).to_pandas()
    edges = pd.DataFrame(
        [
            {"dst": l["url"], "text": l["text"]}
            for ls in wat["links"]
            for l in ls
            if l["kind"] in ("offer", "page")
        ]
    )
    per_text = edges.groupby(["dst", "text"], as_index=False).agg(n=("text", "size"))
    per_text = per_text.sort_values(["dst", "n", "text"], ascending=[True, False, True])
    top = per_text.drop_duplicates("dst", keep="first").rename(
        columns={"text": "top_text"}
    )[["dst", "top_text"]]
    stats = per_text.groupby("dst", as_index=False).agg(
        anchors=("n", "sum"), distinct_texts=("n", "size")
    )
    expect = (
        stats.merge(top, on="dst")
        .sort_values(["anchors", "dst"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)[["dst", "anchors", "distinct_texts", "top_text"]]
    )
    pd.testing.assert_frame_equal(
        got.astype({"anchors": "int64", "distinct_texts": "int64"}),
        expect.astype({"anchors": "int64", "distinct_texts": "int64"}),
    )
    assert (got["anchors"] > 0).all() and got["top_text"].str.len().gt(0).all()


def test_cdx_lookup_prefix_pruning(crawl_and_archive):
    """CDX prefix query ≡ full-scan filter, with Iceberg-style fragment
    pruning doing the scan planning: a narrow prefix opens a strict
    subset of the index files; an absent prefix reads ZERO files and
    still returns a typed empty table."""
    _res, root = crawl_and_archive
    full = warcstore.TableStore(f"{root}/index").read_table().to_pandas()
    host0 = sorted(u for u in full["url"] if u.startswith("https://host0.test/"))
    got = warcstore.cdx_lookup(root, "https://host0.test/").to_pandas()
    assert sorted(got["url"]) == host0 and len(host0) > 0
    # scan planning: the narrow prefix prunes fragments before any read
    store = warcstore.TableStore(f"{root}/index")
    one = host0[0]
    hi = one[:-1] + chr(ord(one[-1]) + 1)
    paths, pruned = store.pruned_paths({"url": (one, hi)})
    assert pruned > 0
    assert len(paths) < len(store.fragment_paths())
    g1 = warcstore.cdx_lookup(root, one).to_pandas()
    assert len(g1) >= 1 and g1["url"].str.startswith(one).all()
    # absent prefix: everything pruned, typed empty result
    none_paths, none_pruned = store.pruned_paths(
        {"url": ("https://nosuch.test/", "https://nosuch.test0")}
    )
    empty_ds = warcstore.cdx_lookup(root, "https://nosuch.test/")
    # typed even when 0 fragments survive planning (to_pandas on an
    # all-empty Dataset drops columns — assert on the Dataset schema)
    assert empty_ds.count() == 0
    assert {"url", "payload_digest"} <= set(empty_ds.schema().names)


def test_compact_archive_byte_parity_and_gc(crawl_and_archive, tmp_path):
    """Shard compaction is pure byte movement: every record (bodies,
    metadata, digests) reads back identically from the consolidated
    shards; re-compaction is a no-op version; gc removes exactly the
    unreferenced old files; CDX prefix queries stay exact."""
    import glob as g
    import shutil

    _res, root = crawl_and_archive
    croot = str(tmp_path / "arch_copy")
    shutil.copytree(root, croot)
    store = warcstore.TableStore(f"{croot}/index")
    before = (
        warcstore.read_warc(croot).to_pandas().sort_values("url").reset_index(drop=True)
    )
    shards_before = len(set(store.read_table(columns=["shard"])["shard"].to_pylist()))
    files_before = len(g.glob(f"{croot}/shards/*.warc.gz"))
    assert shards_before > 4

    v1 = warcstore.compact_archive(croot, target_bytes=1 << 20)
    store2 = warcstore.TableStore(f"{croot}/index")
    idx2 = store2.read_table()
    shards_after = len(set(idx2["shard"].to_pylist()))
    assert shards_after < shards_before
    assert idx2.num_rows == len(before)
    after = (
        warcstore.read_warc(croot).to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert list(after["url"]) == list(before["url"])
    for c in ("status", "content_type", "payload_digest", "depth", "created"):
        assert list(after[c]) == list(before[c])
    assert all(bytes(a) == bytes(b) for a, b in zip(after["body"], before["body"]))
    # idempotent: same content → same keys → same version
    assert warcstore.compact_archive(croot, target_bytes=1 << 20) == v1
    # CDX prefix query exact on the compacted index (tighter url bounds)
    full = idx2.to_pandas()
    host0 = sorted(u for u in full["url"] if u.startswith("https://host0.test/"))
    got = warcstore.cdx_lookup(croot, "https://host0.test/").to_pandas()
    assert sorted(got["url"]) == host0
    # gc: old shard files gone, exactly the referenced ones remain
    removed = warcstore.gc_shards(croot)
    assert removed == files_before
    assert len(g.glob(f"{croot}/shards/*.warc.gz")) == shards_after
    final = (
        warcstore.read_warc(croot).to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert all(bytes(a) == bytes(b) for a, b in zip(final["body"], before["body"]))


def test_gc_shards_empty_index_is_noop(tmp_path):
    """ADVICE r3: gc on an archive whose index has no committed
    fragments must delete nothing (and not KeyError on the zero-column
    empty table)."""
    import os

    root = str(tmp_path / "arch")
    os.makedirs(f"{root}/shards", exist_ok=True)
    with open(f"{root}/shards/orphan.warc.gz", "wb") as f:
        f.write(b"x")
    assert warcstore.gc_shards(root) == 0
    assert os.path.exists(f"{root}/shards/orphan.warc.gz")


def test_cdx_lookup_degenerate_prefixes(crawl_and_archive):
    """ADVICE r3: empty prefix and un-bumpable last code point fall back
    to an unpruned scan instead of raising."""
    _res, root = crawl_and_archive
    full = warcstore.TableStore(f"{root}/index").read_table().num_rows
    assert warcstore.cdx_lookup(root, "").count() == full
    # last char U+10FFFF: carry propagates into the previous char
    assert warcstore.cdx_lookup(root, "https://\U0010FFFF").count() == 0
    # all chars un-bumpable → unpruned scan path
    assert warcstore.cdx_lookup(root, "\U0010FFFF\U0010FFFF").count() == 0


def test_prior_index_tolerates_old_format(tmp_path):
    """ADVICE r3: an archive index written BEFORE the
    record_type/payload_digest columns must load with the original
    status==200 semantics (every row a plain response) in both
    load_prior_index and build_etag_map."""
    import pyarrow as pa

    from crawlkit.pipelines.crawl import build_etag_map
    from crawlkit.state.lancelike import TableStore

    root = str(tmp_path / "old_arch")
    store = TableStore(f"{root}/index")
    old = pa.table(
        {
            "url": ["https://host0.test/a", "https://host1.test/b"],
            "status": pa.array([200, 200], pa.int32()),
            "shard": ["shards/s0.warc.gz", "shards/s0.warc.gz"],
            "offset": pa.array([0, 100], pa.int64()),
            "length": pa.array([100, 80], pa.int64()),
        }
    )
    store.commit_fragments([store.write_fragment(old, "oldfrag")])

    pi = warcstore.load_prior_index([root])
    assert len(pi["url_keys"]) == 2
    assert len(pi["body_digests"]) == 2
    # synthesized placeholder digests are unique and not sha1-shaped
    dgs = {bytes(d).decode() for d in pi["url_digests"]}
    assert len(dgs) == 2 and all(d.startswith("loc:") for d in dgs)

    # build_etag_map folds the same archive without raising; with no
    # prior fetch log rows there is nothing to map
    log_store = TableStore(f"{tmp_path}/prior_run/fetch_log")
    log_store.commit_fragments(
        [
            log_store.write_fragment(
                pa.table(
                    {
                        "canon_url": ["https://host0.test/a"],
                        "status": pa.array([200], pa.int32()),
                        "etag": ['W/"abc"'],
                    }
                ),
                "logfrag",
            )
        ]
    )
    etags = build_etag_map(str(tmp_path / "prior_run"), root)
    assert etags == {"https://host0.test/a": 'W/"abc"'}
