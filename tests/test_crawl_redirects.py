"""HTTP redirect semantics (3xx follow — colly rides Go's http.Client,
which silently follows up to 10 redirects; flat_crawler/handler.go:92
uses the default collector, so the reference inherits exactly this).

Contract (shared engine ≡ refsim, SURVEY §2 S1/T3):
* each hop gets the full ≤5-attempt retry budget (T3 per request);
* >10 hops → STATUS_TOO_MANY_REDIRECTS (-4) log row;
* the log row is keyed by the REQUESTED canon_url, status = final
  status, ``redirects`` = hop count, ``attempts`` = final hop's count;
* the chain's FINAL url joins the seen set (never the frontier) so an
  independently-discovered new home is not refetched;
* with archiving on, every 301 hop is its own WARC record with a
  Location header.

Redirects are OFF by default (``WebConfig.redirect_mod = 0``) — every
pre-existing parity fixture is unchanged; these tests opt in.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from crawlkit import refsim
from crawlkit.pipelines.crawl import run_crawl
from crawlkit.pipelines.crawl_dist import run_crawl_dataset
from crawlkit.stages import fetch as F
from crawlkit.synthweb import SynthWeb, WebConfig

CFG = WebConfig(n_seeds=4, n_hosts=3, redirect_mod=3)
SPEC = refsim.CrawlSpec(host_budget_per_round=16)


@pytest.fixture(scope="module")
def web():
    return SynthWeb(CFG)


@pytest.fixture(scope="module")
def sim(web):
    return refsim.simulate(web, SPEC)


@pytest.fixture(scope="module")
def eng(web, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl_redir") / "run")
    return run_crawl(web, spec=SPEC, out_dir=out, fetch_concurrency=2, num_seen_shards=2)


def _redirected_offer(web: SynthWeb, two_hop: bool = False) -> str:
    """First crawlable offer url whose chain redirects (optionally 2-hop)."""
    for cat in range(web.cfg.n_seeds):
        for page in range(1, web.last_page(cat) + 1):
            for k in range(web.n_articles(cat, page)):
                href = web.article_fields(cat, page, k)["href"]
                url = href.split("#")[0]
                tgt = web.redirect_target(url)
                if tgt is None:
                    continue
                if not two_hop or "/moved/" in tgt:
                    return url
    raise AssertionError("fixture web has no redirected offer")


# ---- synthweb routing -----------------------------------------------------

def test_synthweb_redirect_routing(web):
    url = _redirected_offer(web)
    r = web.fetch(url, attempt=web.fail_attempts(url) + 1)
    assert r.status == 301 and r.location and r.body is None
    final = web.fetch(r.location, attempt=web.fail_attempts(r.location) + 1)
    if final.status == 301:  # two-hop chain
        final = web.fetch(
            final.location, attempt=web.fail_attempts(final.location) + 1
        )
    assert final.status == 200
    # the moved page serves the SAME offer html as the original oid
    oid = url.rsplit("/", 1)[1][: -len(".html")]
    assert final.body == web.offer_html(oid)


def test_redirects_off_by_default():
    web0 = SynthWeb(WebConfig(n_seeds=4, n_hosts=3))
    url = _redirected_offer(SynthWeb(CFG))
    r = web0.fetch(url, attempt=web0.fail_attempts(url) + 1)
    assert r.status == 200  # same url serves content when redirect_mod=0


# ---- fetch stage ----------------------------------------------------------

def _frontier_batch(urls: list[str], depth: int = 2) -> pa.Table:
    from crawlkit import canon

    rows = [
        {
            "url": u,
            "canon_url": canon.canonicalize_url_one(u),
            "host": canon.host_of_one(u),
            "priority": 0,
            "depth": depth,
            "seed_id": 0,
            "schema_name": "flat",
            "schema_version": "v1",
            "domain": "d",
            "round": 0,
            "created": "2026-01-01T00:00:00",
        }
        for u in urls
    ]
    return pa.Table.from_pylist(rows)


def test_fetch_follows_redirect_and_marks_final_seen(web):
    url = _redirected_offer(web)
    fp = F.FetchParse(CFG, obey_robots=False)
    out = fp(_frontier_batch([url]))
    log = out.filter(pc.equal(out["kind"], "log"))
    assert log["status"].to_pylist() == [200]
    assert log["redirects"].to_pylist()[0] >= 1
    assert log["attempts"].to_pylist()[0] <= F.RETRY_ATTEMPTS
    red = out.filter(pc.equal(out["kind"], "redirect"))
    assert red.num_rows == 1
    final_cu = red["canon_url"].to_pylist()[0]
    assert "/offer-new/" in final_cu
    dh, dl = F._digest_pair(final_cu)
    assert red["digest_hi"].to_pylist() == [dh]
    assert red["digest_lo"].to_pylist() == [dl]
    # images still extracted from the followed body
    assert out.filter(pc.equal(out["kind"], "image_ref")).num_rows >= 1


def test_redirect_loop_capped(web):
    fp = F.FetchParse(CFG, obey_robots=False)
    out = fp(_frontier_batch(["https://host0.test/loop/a.html"]))
    log = out.filter(pc.equal(out["kind"], "log"))
    assert log["status"].to_pylist() == [F.STATUS_TOO_MANY_REDIRECTS]
    assert log["redirects"].to_pylist() == [F.MAX_REDIRECTS + 1]
    # no content, no redirect-seen row for a failed chain
    assert out.filter(pc.equal(out["kind"], "redirect")).num_rows == 0


# ---- golden parity (driver mode) ------------------------------------------

def test_redirect_crawl_order_matches_reference(eng, sim):
    assert eng.order == sim.order


def test_redirect_seen_set_matches(eng, sim):
    assert eng.seen == sim.seen
    assert any("/offer-new/" in u for u in eng.seen)


def test_redirect_entries_and_images_match(eng, sim):
    et = eng.entries_table()
    st = pa.Table.from_pylist(sim.entries, schema=et.schema)
    df_e, df_s = et.to_pandas(), st.to_pandas()
    key = list(df_e.columns)
    assert df_e.sort_values(key).reset_index(drop=True).equals(
        df_s.sort_values(key).reset_index(drop=True)
    )
    it = eng.images_table()
    si = pa.Table.from_pylist(sim.images, schema=it.schema)
    df_i, df_si = it.to_pandas(), si.to_pandas()
    key = ["image_id"]
    assert df_i.sort_values(key).reset_index(drop=True).equals(
        df_si.sort_values(key).reset_index(drop=True)
    )


def test_redirect_log_matches_reference(eng, sim):
    log = eng.fetch_log_table().to_pandas()
    ref = (
        pa.Table.from_pylist(sim.fetch_log).to_pandas()
        .rename(columns={"bytes": "nbytes"})
    )
    cols = ["canon_url", "status", "attempts", "redirects", "nbytes"]
    a = log[cols].sort_values(cols).reset_index(drop=True)
    b = ref[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype({"status": "int64", "attempts": "int64", "redirects": "int64"}).equals(
        b.astype({"status": "int64", "attempts": "int64", "redirects": "int64"})
    )
    assert (log["redirects"] > 0).any()


def test_redirected_target_not_refetched(eng, sim):
    # every /offer-new/ url is in seen but never in the issue order
    targets = {u for u in sim.seen if "/offer-new/" in u}
    assert targets and not targets & set(eng.order)


# ---- distributed-frontier parity ------------------------------------------

def test_dist_mode_redirect_parity(web, sim, tmp_path):
    res = run_crawl_dataset(
        web, spec=SPEC, out_dir=str(tmp_path / "dist"),
        num_seen_shards=2, nblocks=4, track_order=True,
    )
    assert res.order == sim.order
    assert res.seen == sim.seen
    log = res.fetch_log_table().to_pandas()
    assert (log["redirects"] > 0).any()


# ---- WARC archival of hops -------------------------------------------------

def test_redirect_hops_archived(web, tmp_path):
    from crawlkit.state.warcstore import read_warc

    out = str(tmp_path / "run")
    arch = str(tmp_path / "arch")
    run_crawl(
        web, spec=SPEC, out_dir=out, fetch_concurrency=2,
        num_seen_shards=2, archive_root=arch,
    )
    recs = read_warc(arch).to_pandas()
    hops = recs[recs["status"] == 301]
    assert len(hops) > 0
    assert (hops["location"].str.len() > 0).all()
    assert (hops["nbytes"] == 0).all()
    # every 301's Location chain terminates in an archived 200 record
    two_hundred = set(recs[recs["status"] == 200]["url"])
    status_by_url = dict(zip(recs["url"], recs["status"]))
    for loc in hops["location"]:
        assert status_by_url.get(loc) in (200, 301)
    assert any("/offer-new/" in u for u in two_hundred)
