"""URL-agnostic archive deduplication (Common-Crawl style).

A fetched 200 whose payload sha1 already exists in a PRIOR generation's
archive is stored as an ``identical-payload-digest`` WARC revisit record
— zero body bytes in the new archive — and ``read_warc(...,
resolve_revisits=True)`` reconstructs the full content record by digest
across the generation chain. This catches the case the ETag/304 path
cannot: content that MOVED to a new url between generations (the new
url has no prior ETag, so the fetch is unconditional — but its bytes
are already archived).

Reference parity note: the reference re-downloads and re-stores every
page every cron tick (``flat_crawler/handler.go:92``); digest dedup is
the 100-TB-archive economics layer on top.
"""

import hashlib

import pyarrow.compute as pc
import pytest

from crawlkit import refsim
from crawlkit.pipelines.crawl import run_crawl
from crawlkit.state import warcstore
from crawlkit.state.lancelike import TableStore
from crawlkit.synthweb import SynthWeb, WebConfig

CFG1 = WebConfig(n_seeds=4, n_hosts=3, max_last_page=3)
CFG2 = WebConfig(n_seeds=4, n_hosts=3, max_last_page=6)  # grown web
SPEC = refsim.CrawlSpec(host_budget_per_round=16)


def _index_df(root: str):
    return TableStore(f"{root}/index").read_table().to_pandas()


@pytest.fixture(scope="module")
def gen1(tmp_path_factory):
    base = tmp_path_factory.mktemp("adedup")
    d1, arch1 = str(base / "run1"), str(base / "arch1")
    res = run_crawl(
        SynthWeb(CFG1), spec=SPEC, out_dir=d1, num_seen_shards=2,
        fetch_concurrency=2, archive_root=arch1, archive_images=True,
    )
    return d1, arch1, res


def test_unit_moved_url_resolves_by_digest(tmp_path):
    """Bytes archived under url A in gen-1; gen-2 holds only a revisit
    record under url B → resolution returns A's bytes under B's url +
    B's crawl metadata (how pywb/warcio replay revisits)."""
    meta = {"schema_name": "flat", "schema_version": "v1", "domain": "d",
            "created": "2026-01-01", "depth": 1}
    body = b"<html>moved content</html>"
    dg = hashlib.sha1(body).hexdigest()
    r1, r2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    w1 = warcstore.WarcWriter(r1)
    w1.store.commit_fragments([w1.write_batch(
        [{"url": "https://h.test/a", "status": 200, "body": body, **meta}]
    )])
    w2 = warcstore.WarcWriter(r2)
    meta2 = dict(meta, created="2026-02-01", depth=2)
    w2.store.commit_fragments([w2.write_batch(
        [{"url": "https://h.test/b", "status": 200, "body": b"",
          "revisit_digest": dg,
          "revisit_profile": "identical-payload-digest", **meta2}]
    )])
    # unresolved read: empty-bodied revisit, digest visible
    raw = warcstore.read_warc(r2).to_pandas()
    assert list(raw["record_type"]) == ["revisit"]
    assert raw["nbytes"].sum() == 0
    assert list(raw["refers_to_digest"]) == [dg]
    # resolved read across the chain: full bytes under the NEW url
    res = warcstore.read_warc(
        r2, resolve_revisits=True, resolve_roots=[r2, r1], num_partitions=2
    ).to_pandas()
    assert len(res) == 1
    row = res.iloc[0]
    assert row["url"] == "https://h.test/b"
    assert bytes(row["body"]) == body
    assert row["depth"] == 2 and row["created"] == "2026-02-01"
    # a revisit whose digest NO generation holds is dropped, not crashed
    w2.store.commit_fragments([w2.write_batch(
        [{"url": "https://h.test/c", "status": 200, "body": b"",
          "revisit_digest": "0" * 40,
          "revisit_profile": "identical-payload-digest", **meta2}]
    )])
    res2 = warcstore.read_warc(
        r2, resolve_revisits=True, resolve_roots=[r2, r1], num_partitions=2
    ).to_pandas()
    assert list(res2["url"]) == ["https://h.test/b"]


def test_same_web_full_recrawl_archives_zero_new_bytes(gen1, tmp_path):
    """Unconditional full recrawl of the SAME web with archive_dedup:
    every page and image payload already exists by digest → generation
    2 is ALL identical-payload revisits, zero body bytes archived, yet
    its index is complete and resolution reconstructs every record."""
    d1, arch1, res1 = gen1
    arch2 = str(tmp_path / "arch2")
    res2 = run_crawl(
        SynthWeb(CFG1), spec=SPEC, out_dir=str(tmp_path / "run2"),
        num_seen_shards=2, fetch_concurrency=2, archive_root=arch2,
        archive_images=True, prior_archive_root=arch1, archive_dedup=True,
    )
    assert res2.seen == res1.seen  # fresh crawl, same web
    idx1, idx2 = _index_df(arch1), _index_df(arch2)
    assert (idx1["record_type"] == "response").all()
    assert (idx2["record_type"] == "revisit").all()
    assert idx2["nbytes"].sum() == 0
    # same url → digest map in both generations (revisit rows index the
    # referent's digest, so delta/change_rate see continuity)
    m1 = dict(zip(idx1["url"], idx1["payload_digest"]))
    m2 = dict(zip(idx2["url"], idx2["payload_digest"]))
    assert m1 == m2
    # resolution rebuilds every record's bytes from gen-1
    rec1 = warcstore.read_warc(arch1).to_pandas().set_index("url")
    rec2 = (
        warcstore.read_warc(
            arch2, resolve_revisits=True, resolve_roots=[arch2, arch1]
        )
        .to_pandas()
        .set_index("url")
    )
    assert sorted(rec2.index) == sorted(rec1.index)
    for u in rec1.index:
        assert bytes(rec2.loc[u, "body"]) == bytes(rec1.loc[u, "body"])
    # archive_delta over the chain: everything unchanged
    delta = warcstore.archive_delta(arch1, arch2).to_pandas()
    assert (delta["change"] == "unchanged").all()


def test_grown_web_dedups_only_unchanged_payloads(gen1, tmp_path):
    """Grown web: unchanged offer pages + their images dedup to revisit
    records; changed listings and NEW offers archive real bytes. The
    resolved read equals a dedup-off archive of the same crawl."""
    d1, arch1, _res1 = gen1
    arch2 = str(tmp_path / "arch2")
    arch_plain = str(tmp_path / "arch_plain")
    run_crawl(
        SynthWeb(CFG2), spec=SPEC, out_dir=str(tmp_path / "run2"),
        num_seen_shards=2, fetch_concurrency=2, archive_root=arch2,
        archive_images=True, prior_archive_root=arch1, archive_dedup=True,
    )
    run_crawl(
        SynthWeb(CFG2), spec=SPEC, out_dir=str(tmp_path / "run2p"),
        num_seen_shards=2, fetch_concurrency=2, archive_root=arch_plain,
        archive_images=True,
    )
    idx2 = _index_df(arch2)
    assert (idx2["record_type"] == "revisit").any(), "unchanged offers dedup"
    assert (idx2["record_type"] == "response").any(), "new content archived"
    # bytes saved = exactly the prior generation's digests
    idx1 = _index_df(arch1)
    prior = set(idx1["payload_digest"])
    rev = idx2[idx2["record_type"] == "revisit"]
    new = idx2[idx2["record_type"] == "response"]
    assert set(rev["payload_digest"]) <= prior
    assert set(new["payload_digest"]).isdisjoint(prior)
    assert (rev["nbytes"] == 0).all()
    # resolved chain read ≡ plain (dedup-off) archive, byte-level
    a = (
        warcstore.read_warc(
            arch2, resolve_revisits=True, resolve_roots=[arch2, arch1]
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        warcstore.read_warc(arch_plain)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(a["url"]) == list(b["url"])
    assert all(bytes(x) == bytes(y) for x, y in zip(a["body"], b["body"]))
    # WET + link graph over the resolved records match the plain archive
    wet_a = warcstore.wet_extract(
        warcstore.read_warc(
            arch2, resolve_revisits=True, resolve_roots=[arch2, arch1]
        )
    ).to_pandas().sort_values("url").reset_index(drop=True)
    wet_b = warcstore.wet_extract(
        warcstore.read_warc(arch_plain)
    ).to_pandas().sort_values("url").reset_index(drop=True)
    assert wet_a.equals(wet_b) and len(wet_a) > 0


def test_restore_images_from_dedup_generation(gen1, tmp_path):
    """North-rule images table rebuilds from a deduplicated generation:
    image payload bytes resolve by digest into gen-1's shards."""
    import pandas as pd

    d1, arch1, _res1 = gen1
    arch2 = str(tmp_path / "arch2")
    res2 = run_crawl(
        SynthWeb(CFG2), spec=SPEC, out_dir=str(tmp_path / "run2"),
        num_seen_shards=2, fetch_concurrency=2, archive_root=arch2,
        archive_images=True, prior_archive_root=arch1, archive_dedup=True,
    )
    live = (
        res2.images_table().to_pandas().sort_values("image_id")
        .reset_index(drop=True)
    )
    rest = (
        warcstore.restore_images(arch2, resolve_roots=[arch2, arch1])
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert len(rest) == len(live) > 0
    meta_cols = ["image_id", "w", "h", "fmt", "caption", "phash"]
    pd.testing.assert_frame_equal(live[meta_cols], rest[meta_cols])
    assert all(bytes(a) == bytes(b) for a, b in zip(live["bytes"], rest["bytes"]))


def test_conditional_gen3_over_dedup_gen2_chain(gen1, tmp_path):
    """build_etag_map counts identical-payload revisit rows as archived
    (url → digest → bytes in an OLDER generation), so a conditional
    gen-3 over a dedup'd gen-2 chain is all-304 / zero body bytes with
    complete extraction — engine ≡ refsim."""
    from crawlkit.pipelines.crawl import build_etag_map, recrawl_conditional

    d1, arch1, _res1 = gen1
    d2, arch2 = str(tmp_path / "run2"), str(tmp_path / "arch2")
    res2 = run_crawl(
        SynthWeb(CFG1), spec=SPEC, out_dir=d2, num_seen_shards=2,
        fetch_concurrency=2, archive_root=arch2,
        prior_archive_root=arch1, archive_dedup=True,
    )
    etags = build_etag_map(d2, [arch2, arch1])
    # every 200 with an etag is backed by chain bytes → all conditional
    log = res2.fetch_log_table()
    ok = log.filter(pc.and_(pc.equal(log["status"], 200),
                            pc.not_equal(log["etag"], "")))
    assert len(etags) == ok.num_rows > 0
    eng3 = recrawl_conditional(
        SynthWeb(CFG1), prior_dir=d2, prior_archive_root=[arch2, arch1],
        out_dir=str(tmp_path / "run3"), spec=SPEC,
        num_seen_shards=2, fetch_concurrency=2,
    )
    sim2 = refsim.simulate(SynthWeb(CFG1), SPEC)
    etags2 = {r["canon_url"]: r["etag"] for r in sim2.fetch_log
              if r["status"] == 200 and r["etag"]}
    sim3 = refsim.simulate(
        SynthWeb(CFG1), SPEC, prior_seen=sim2.seen, prior_etags=etags2
    )
    assert eng3.order == sim3.order and eng3.seen == sim3.seen
    log3 = eng3.fetch_log_table().to_pandas()
    fetched = log3[log3.status > 0]
    assert len(fetched) and (fetched.status == 304).all()
    assert fetched.nbytes.sum() == 0
    assert eng3.entries_table().num_rows == len(sim3.entries) > 0


def test_dist_mode_dedup_parity(gen1, tmp_path):
    """Distributed-frontier mode with archive_dedup archives the SAME
    record set as driver mode — including which captures became
    identical-payload revisits (digest-keyed, so batching differences
    cannot change the classification)."""
    from crawlkit.pipelines.crawl_dist import run_crawl_dataset

    _d1, arch1, _res1 = gen1
    arch_drv, arch_dst = str(tmp_path / "arc_drv"), str(tmp_path / "arc_dst")
    run_crawl(
        SynthWeb(CFG2), spec=SPEC, out_dir=str(tmp_path / "run_drv"),
        num_seen_shards=2, fetch_concurrency=2, archive_root=arch_drv,
        archive_images=True, prior_archive_root=arch1, archive_dedup=True,
    )
    run_crawl_dataset(
        SynthWeb(CFG2), spec=SPEC, out_dir=str(tmp_path / "run_dst"),
        num_seen_shards=2, nblocks=4, archive_root=arch_dst,
        archive_images=True, prior_archive_root=arch1, archive_dedup=True,
    )
    cols = ["url", "status", "record_type", "payload_digest", "nbytes", "depth"]
    a = _index_df(arch_drv)[cols].sort_values(cols).reset_index(drop=True)
    b = _index_df(arch_dst)[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    assert (a["record_type"] == "revisit").any()


def test_load_prior_index_first_wins_and_lookups(tmp_path):
    """Broadcast CDX index semantics: newest-first generation chain —
    a url captured in BOTH generations resolves to the NEWEST digest
    and body location (matching the per-worker setdefault path);
    lookups are searchsorted over sorted byte arrays and must handle
    queries longer than any key (numpy width promotion, no truncation)."""
    import numpy as np

    from crawlkit.stages.fetch import FetchParse
    from crawlkit.synthweb import WebConfig

    meta = {"schema_name": "flat", "schema_version": "v1", "domain": "d",
            "created": "2026-01-01", "depth": 1}
    g1, g2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    body_a1, body_a2, body_b = b"<html>A v1</html>", b"<html>A v2</html>", b"<html>B</html>"
    w1 = warcstore.WarcWriter(g1)
    w1.store.commit_fragments([w1.write_batch([
        {"url": "https://h.test/a", "status": 200, "body": body_a1, **meta},
        {"url": "https://h.test/b", "status": 200, "body": body_b, **meta},
    ])])
    w2 = warcstore.WarcWriter(g2)
    w2.store.commit_fragments([w2.write_batch([
        {"url": "https://h.test/a", "status": 200, "body": body_a2, **meta},
    ])])

    pi = warcstore.load_prior_index([g2, g1])  # newest first
    dg_a1 = hashlib.sha1(body_a1).hexdigest()
    dg_a2 = hashlib.sha1(body_a2).hexdigest()
    dg_b = hashlib.sha1(body_b).hexdigest()

    fp = FetchParse(WebConfig(n_seeds=1), prior_index_ref=pi, archive_dedup=True)
    # newest generation wins the url → digest mapping
    assert fp._prior_digest_for_url("https://h.test/a") == dg_a2
    assert fp._prior_digest_for_url("https://h.test/b") == dg_b
    # a query LONGER than every key promotes width, never truncates
    assert fp._prior_digest_for_url("https://h.test/a-much-longer-suffix") is None
    # every content digest is locatable; locations point at their own gen
    assert fp._prior_body_loc(dg_a2)[0] == g2
    assert fp._prior_body_loc(dg_a1)[0] == g1
    assert fp._prior_body_loc(dg_b)[0] == g1
    assert fp._prior_body_loc("f" * 40) is None
    # vectorized membership (the image-dedup hot path)
    mask = fp._prior_has_bodies([dg_a1, "0" * 40, dg_b, dg_a2])
    assert mask.tolist() == [True, False, True, True]
    # byte parity through the resolution path: _archived_body range-reads
    assert fp._archived_body("https://h.test/a") == body_a2.decode()
    assert fp._archived_body("https://h.test/b") == body_b.decode()
    # dict-fallback path (no ref) agrees
    fb = FetchParse(WebConfig(n_seeds=1), prior_archive_root=[g2, g1])
    assert fb._archived_body("https://h.test/a") == body_a2.decode()
    assert np.array_equal(
        fb._prior_has_bodies([dg_a1, "0" * 40, dg_b, dg_a2]), mask
    )


def test_resolution_survives_referent_compaction(gen1, tmp_path):
    """Compacting (and gc-ing) the REFERENT generation must not break
    digest resolution from a later dedup'd generation: the resolver
    reads the referent's LATEST index version, which points at the
    consolidated shards."""
    import shutil

    from crawlkit.state.lancelike import TableStore

    _d1, arch1, _res1 = gen1
    g1c = str(tmp_path / "arch1_copy")
    shutil.copytree(arch1, g1c)
    arch2 = str(tmp_path / "arch2")
    run_crawl(
        SynthWeb(CFG1), spec=SPEC, out_dir=str(tmp_path / "run2"),
        num_seen_shards=2, fetch_concurrency=2, archive_root=arch2,
        archive_images=True, prior_archive_root=g1c, archive_dedup=True,
    )
    before = (
        warcstore.read_warc(arch2, resolve_revisits=True, resolve_roots=[arch2, g1c])
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert len(before) > 0
    warcstore.compact_archive(g1c, target_bytes=1 << 20)
    assert warcstore.gc_shards(g1c) > 0
    after = (
        warcstore.read_warc(arch2, resolve_revisits=True, resolve_roots=[arch2, g1c])
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert list(after["url"]) == list(before["url"])
    assert all(bytes(a) == bytes(b) for a, b in zip(after["body"], before["body"]))
    # the broadcast prior index is a point-in-time view: rebuilding it
    # AFTER compaction yields working locations for a next generation
    pi = warcstore.load_prior_index([arch2, g1c])
    from crawlkit.stages.fetch import FetchParse
    from crawlkit.synthweb import WebConfig as _WC

    fp = FetchParse(_WC(n_seeds=1), prior_index_ref=pi)
    row = before.iloc[0]
    assert fp._archived_body(row["url"]) == bytes(row["body"]).decode()


def test_etag_map_equals_independent_index_fold(gen1, tmp_path):
    """build_etag_map's archived-set fold is DERIVED from the canonical
    warcstore.load_prior_index; pin it against an INDEPENDENT fold of
    the raw index tables (newest-first, first-wins, revisit→digest
    resolution) over a multi-generation dedup chain, so the three-way
    lockstep (etag map / fetch 304 path / archive-dedup) cannot drift."""
    from crawlkit import canon
    from crawlkit.pipelines.crawl import build_etag_map

    d1, arch1, _res1 = gen1
    d2, arch2 = str(tmp_path / "run2e"), str(tmp_path / "arch2e")
    run_crawl(
        SynthWeb(CFG1), spec=SPEC, out_dir=d2, num_seen_shards=2,
        fetch_concurrency=2, archive_root=arch2,
        prior_archive_root=arch1, archive_dedup=True,
    )
    roots = [arch2, arch1]
    got = build_etag_map(d2, roots)

    # independent fold, straight off the index tables
    url_digest: dict = {}
    digests: set = set()
    for root in roots:  # newest first; first writer wins
        idx = _index_df(root)
        for _, r in idx.iterrows():
            cu = canon.canonicalize_url_one(r["url"])
            if r["record_type"] == "response" and r["status"] == 200:
                url_digest.setdefault(cu, r["payload_digest"])
                digests.add(r["payload_digest"])
            elif r["record_type"] == "revisit":
                url_digest.setdefault(cu, r["payload_digest"])
    archived = {cu for cu, dg in url_digest.items() if dg in digests}

    log = TableStore(f"{d2}/fetch_log").read_table(
        columns=["canon_url", "status", "etag"]
    ).to_pandas()
    want = {
        r["canon_url"]: r["etag"]
        for _, r in log.iterrows()
        if r["status"] in (200, 304) and r["etag"] and r["canon_url"] in archived
    }
    assert got == want and len(got) > 0
