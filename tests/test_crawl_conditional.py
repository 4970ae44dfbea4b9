"""Conditional recrawl — If-None-Match / 304 Not Modified with
archive-backed body reuse (crawl.py::recrawl_conditional).

The reference re-downloads every page every cron tick (colly's default
collector has no cache, ``flat_crawler/handler.go:92``); production
crawl economics (Cho & Garcia-Molina — the ``change_rate`` /
``recrawl_schedule`` queries) demand conditional GETs: unchanged pages
answer 304 with ZERO body bytes, and the crawler re-parses its own
archived copy so discovery and extraction still run at full fidelity.

Shared engine ≡ refsim contract: the ETag is a content hash, so a 304
guarantees the archived body equals the live one — the oracle parses
the live body, the engine range-reads the WARC record; outputs must be
byte-equal.
"""

import pyarrow as pa
import pytest

from crawlkit import refsim
from crawlkit.pipelines.crawl import recrawl_conditional, run_crawl
from crawlkit.synthweb import SynthWeb, WebConfig

CFG1 = WebConfig(n_seeds=4, n_hosts=3, max_last_page=3)
CFG2 = WebConfig(n_seeds=4, n_hosts=3, max_last_page=6)  # grown web
SPEC = refsim.CrawlSpec(host_budget_per_round=16)


def _etag_map(sim: refsim.SimResult) -> dict:
    return {
        r["canon_url"]: r["etag"]
        for r in sim.fetch_log
        if r["status"] == 200 and r["etag"]
    }


def test_synthweb_etag_and_304():
    web = SynthWeb(CFG1)
    url = web.seeds()[0]["url"]
    et = web.etag(url)
    assert et
    r = web.fetch(url, attempt=1, if_none_match=et)
    assert r.status == 304 and r.body is None and r.nbytes == 0 and r.etag == et
    r2 = web.fetch(url, attempt=1, if_none_match="stale")
    assert r2.status == 200 and r2.etag == et and r2.body
    # grown web changes SOME listings' content → new etag, conditional
    # misses there (a seed whose last_page coincides keeps its etag)
    web2 = SynthWeb(CFG2)
    changed = [
        s["url"] for s in web.seeds() if web2.etag(s["url"]) != web.etag(s["url"])
    ]
    assert changed
    u = changed[0]
    assert web2.fetch(u, attempt=1, if_none_match=web.etag(u)).status == 200


@pytest.fixture(scope="module")
def run1(tmp_path_factory):
    base = tmp_path_factory.mktemp("cond")
    d1 = str(base / "run1")
    arch = str(base / "arch1")
    eng = run_crawl(
        SynthWeb(CFG1), spec=SPEC, out_dir=d1, num_seen_shards=2,
        fetch_concurrency=2, archive_root=arch,
    )
    sim = refsim.simulate(SynthWeb(CFG1), SPEC)
    assert eng.order == sim.order and eng.seen == sim.seen
    return d1, arch, sim


def _log_vs_ref(eng, sim):
    logd = eng.fetch_log_table().to_pandas()
    ref = pa.Table.from_pylist(sim.fetch_log).to_pandas().rename(
        columns={"bytes": "nbytes"}
    )
    cols = ["canon_url", "status", "attempts", "redirects", "etag", "nbytes"]
    a = logd[cols].fillna("").astype(str).sort_values(cols).reset_index(drop=True)
    b = ref[cols].fillna("").astype(str).sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    return logd


def test_same_web_recrawl_is_all_304_zero_bytes(run1, tmp_path):
    d1, arch, sim1 = run1
    eng2 = recrawl_conditional(
        SynthWeb(CFG1), prior_dir=d1, prior_archive_root=arch,
        out_dir=str(tmp_path / "run2"), spec=SPEC,
        num_seen_shards=2, fetch_concurrency=2,
    )
    sim2 = refsim.simulate(
        SynthWeb(CFG1), SPEC, prior_seen=sim1.seen, prior_etags=_etag_map(sim1)
    )
    assert eng2.order == sim2.order
    assert eng2.seen == sim2.seen
    log = _log_vs_ref(eng2, sim2)
    fetched = log[log.status > 0]
    assert (fetched.status == 304).all(), "unchanged web → every fetch conditional"
    assert fetched.nbytes.sum() == 0, "304s move zero body bytes"
    # archived copies still drive full re-extraction
    etab = eng2.entries_table()
    et = etab.to_pandas()
    st = pa.Table.from_pylist(sim2.entries, schema=etab.schema).to_pandas()
    key = list(et.columns)
    assert et.sort_values(key).reset_index(drop=True).equals(
        st.sort_values(key).reset_index(drop=True)
    )
    assert len(et) > 0


def test_grown_web_mixes_304_and_200(run1, tmp_path):
    d1, arch, sim1 = run1
    eng2 = recrawl_conditional(
        SynthWeb(CFG2), prior_dir=d1, prior_archive_root=arch,
        out_dir=str(tmp_path / "run2g"), spec=SPEC,
        num_seen_shards=3, fetch_concurrency=2,
    )
    sim2 = refsim.simulate(
        SynthWeb(CFG2), SPEC, prior_seen=sim1.seen, prior_etags=_etag_map(sim1)
    )
    assert eng2.order == sim2.order
    assert eng2.seen == sim2.seen
    log = _log_vs_ref(eng2, sim2)
    assert (log.status == 304).any() and (log.status == 200).any()
    # image payloads of newly-discovered offers byte-match the oracle
    itab = eng2.images_table()
    it = itab.to_pandas()
    si = pa.Table.from_pylist(sim2.images, schema=itab.schema).to_pandas()
    assert it.sort_values("image_id").reset_index(drop=True).equals(
        si.sort_values("image_id").reset_index(drop=True)
    )


def test_missing_archive_record_falls_back_to_refetch(tmp_path):
    """Defensive path: an ETag hit without an archived copy refetches
    unconditionally (status 200) instead of emitting an unparseable 304."""
    from crawlkit import canon
    from crawlkit.stages.fetch import FetchParse

    web = SynthWeb(CFG1)
    url = web.seeds()[0]["url"]
    cu = canon.canonicalize_url_one(url)
    fp = FetchParse(
        CFG1, obey_robots=False,
        prior_etags_ref={cu: web.etag(url)},
        prior_archive_root=str(tmp_path / "no_such_archive"),
    )
    batch = pa.Table.from_pylist(
        [{
            "url": url, "canon_url": cu, "host": canon.host_of_one(url),
            "priority": 0, "depth": 0, "seed_id": 0, "schema_name": "flat",
            "schema_version": "v1", "domain": "d", "round": 0,
            "created": "2026-01-01T00:00:00",
        }]
    )
    out = fp(batch)
    import pyarrow.compute as pc

    log = out.filter(pc.equal(out["kind"], "log"))
    assert log["status"].to_pylist() == [200]
    assert log["nbytes"].to_pylist()[0] > 0


def test_dist_mode_recrawl_parity(run1, tmp_path):
    """Distributed-frontier cadence re-run (recrawl_dataset): prior-run
    offers withheld SHARD-side (load_prior, different shard count on
    purpose), listings re-crawled — order/seen ≡ refsim(prior_seen)."""
    from crawlkit.pipelines.crawl_dist import recrawl_dataset

    d1, arch, sim1 = run1
    res = recrawl_dataset(
        SynthWeb(CFG2), prior_dir=d1, out_dir=str(tmp_path / "dist_re"),
        spec=SPEC, num_seen_shards=3, nblocks=4, track_order=True,
    )
    sim2 = refsim.simulate(SynthWeb(CFG2), SPEC, prior_seen=sim1.seen)
    assert res.order == sim2.order
    assert res.seen == sim2.seen
    offers1 = {u for u in sim1.order if "/offer/" in u}
    offers2 = {u for u in res.order if "/offer/" in u}
    assert offers2 and offers1.isdisjoint(offers2)


def test_dist_mode_conditional_recrawl_parity(run1, tmp_path):
    """Dist-mode conditional re-run: If-None-Match + archive-backed 304
    reuse inside the fused round tasks — full parity with
    refsim(prior_seen, prior_etags) including hop/etag log columns."""
    from crawlkit.pipelines.crawl_dist import recrawl_dataset

    d1, arch, sim1 = run1
    res = recrawl_dataset(
        SynthWeb(CFG2), prior_dir=d1, out_dir=str(tmp_path / "dist_cond"),
        spec=SPEC, prior_archive_root=arch, num_seen_shards=3, nblocks=4,
        track_order=True,
    )
    sim2 = refsim.simulate(
        SynthWeb(CFG2), SPEC, prior_seen=sim1.seen, prior_etags=_etag_map(sim1)
    )
    assert res.order == sim2.order
    assert res.seen == sim2.seen
    log = _log_vs_ref(res, sim2)
    assert (log.status == 304).any() and (log.status == 200).any()
    assert log[log.status == 304].nbytes.sum() == 0


def test_304_revisit_records_keep_archive_delta_continuity(run1, tmp_path):
    """A conditionally-recrawled generation archives 304s as WARC
    REVISIT records (server-not-modified profile): empty-bodied, but
    indexed under the UNCHANGED content's digest — archive_delta then
    classifies those urls 'unchanged' instead of 'removed', and
    read_warc exposes the refers-to digest."""
    import hashlib

    from crawlkit.state.warcstore import archive_delta, read_warc

    d1, arch1, sim1 = run1
    arch2 = str(tmp_path / "arch2")
    recrawl_conditional(
        SynthWeb(CFG1), prior_dir=d1, prior_archive_root=arch1,
        out_dir=str(tmp_path / "run2"), spec=SPEC,
        num_seen_shards=2, fetch_concurrency=2, archive_root=arch2,
    )
    recs = read_warc(arch2).to_pandas()
    rev = recs[recs["status"] == 304]
    assert len(rev) > 0
    assert (rev["nbytes"] == 0).all()
    assert (rev["refers_to_digest"].str.len() == 40).all()
    # the referred digest is the sha1 of the gen-1 content
    gen1 = read_warc(arch1).to_pandas()
    gen1_digest = {
        u: hashlib.sha1(b).hexdigest()
        for u, b in zip(gen1["url"], gen1["body"])
    }
    for u, d in zip(rev["url"], rev["refers_to_digest"]):
        assert gen1_digest[u] == d
    # delta: every url present in gen2 (all 304 revisits) is UNCHANGED
    delta = archive_delta(arch1, arch2).to_pandas()
    in_gen2 = delta[delta["status_b"].notna()]
    assert len(in_gen2) == len(rev)
    assert (in_gen2["change"] == "unchanged").all()


def test_conditional_chain_generation3_stays_304(run1, tmp_path):
    """Conditional recrawls CHAIN: gen-2 archives only revisit records,
    but its 304 log rows still carry valid ETags and the archive-chain
    body lookup falls through to gen-1 — so gen-3 is again all-304 /
    zero body bytes with complete extraction, and matches
    refsim(prior_seen=gen2.seen, prior_etags=gen2-incl-304s)."""
    d1, arch1, sim1 = run1
    d2 = str(tmp_path / "run2")
    arch2 = str(tmp_path / "arch2")
    recrawl_conditional(
        SynthWeb(CFG1), prior_dir=d1, prior_archive_root=arch1,
        out_dir=d2, spec=SPEC, num_seen_shards=2, fetch_concurrency=2,
        archive_root=arch2,
    )
    eng3 = recrawl_conditional(
        SynthWeb(CFG1), prior_dir=d2, prior_archive_root=[arch2, arch1],
        out_dir=str(tmp_path / "run3"), spec=SPEC,
        num_seen_shards=2, fetch_concurrency=2,
    )
    sim2 = refsim.simulate(
        SynthWeb(CFG1), SPEC, prior_seen=sim1.seen, prior_etags=_etag_map(sim1)
    )
    etags2 = {
        r["canon_url"]: r["etag"]
        for r in sim2.fetch_log
        if r["status"] in (200, 304) and r["etag"]
    }
    sim3 = refsim.simulate(
        SynthWeb(CFG1), SPEC, prior_seen=sim2.seen, prior_etags=etags2
    )
    assert eng3.order == sim3.order
    assert eng3.seen == sim3.seen
    log = eng3.fetch_log_table().to_pandas()
    fetched = log[log.status > 0]
    assert len(fetched) and (fetched.status == 304).all()
    assert fetched.nbytes.sum() == 0
    assert eng3.entries_table().num_rows == len(sim3.entries) > 0
