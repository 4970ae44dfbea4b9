"""Fetch-stage unit coverage: union schema, retry semantics, timeout
plumbing (P3), robots at stage level, fused fragment writes."""

import pyarrow as pa
import pytest

from crawlkit import canon
from crawlkit.stages import fetch as F
from crawlkit.synthweb import SynthWeb


def _frontier_batch(web, rows):
    cols = {
        "url": [], "canon_url": [], "host": [], "priority": [], "depth": [],
        "seed_id": [], "schema_name": [], "schema_version": [], "domain": [],
        "round": [], "created": [],
    }
    for r in rows:
        cols["url"].append(r["url"])
        cols["canon_url"].append(canon.canonicalize_url_one(r["url"]))
        cols["host"].append(canon.host_of_one(r["url"]))
        cols["priority"].append(r.get("priority", 0))
        cols["depth"].append(r.get("depth", 0))
        cols["seed_id"].append(r.get("seed_id", 0))
        cols["schema_name"].append(r.get("schema_name", "flat"))
        cols["schema_version"].append("v0.0.3")
        cols["domain"].append("domain-0")
        cols["round"].append(0)
        cols["created"].append("2026-01-01T00:00:00")
    return pa.table(cols)


def test_seed_fetch_emits_pagination_pages():
    web = SynthWeb("t1")
    fp = F.FetchParse("t1")
    out = fp(_frontier_batch(web, [{"url": web.seeds()[0]["url"]}]))
    kinds = out["kind"].to_pylist()
    assert kinds.count("log") == 1
    n_pages = kinds.count("page")
    assert n_pages == web.last_page(0) - 1  # the off-by-one (M6)
    # discoveries carry canon/host/digests computed in-task
    pages = out.filter(pa.compute.equal(out["kind"], "page"))
    assert all(c is not None for c in pages["canon_url"].to_pylist())
    assert all(h is not None for h in pages["digest_hi"].to_pylist())


def test_listing_fetch_emits_entries_and_offers():
    web = SynthWeb("t1")
    fp = F.FetchParse("t1")
    url = web.seeds()[0]["url"] + "&page=1"
    out = fp(_frontier_batch(web, [{"url": url, "depth": 1, "priority": 1}]))
    kinds = out["kind"].to_pylist()
    n = web.n_articles(0, 1)
    assert kinds.count("entry") == n
    assert kinds.count("page") == n  # one offer link per article


def test_retry_exhaustion_marks_failed_row():
    class AlwaysFail(SynthWeb):
        def fetch(self, url, attempt=1, if_none_match=None):
            from crawlkit.synthweb import FetchResult

            return FetchResult(url, 503, None, error="down")

    fp = F.FetchParse("t1")
    fp.web = AlwaysFail("t1")
    web = SynthWeb("t1")
    out = fp(_frontier_batch(web, [{"url": web.seeds()[0]["url"]}]))
    log = out.filter(pa.compute.equal(out["kind"], "log"))
    assert log["status"].to_pylist() == [F.STATUS_EXHAUSTED]
    assert log["attempts"].to_pylist() == [F.RETRY_ATTEMPTS]  # T3: <=5 then fail


def test_fetch_timeout_plumbing():
    class SlowFail(SynthWeb):
        def fetch(self, url, attempt=1, if_none_match=None):
            import time

            from crawlkit.synthweb import FetchResult

            time.sleep(0.05)
            return FetchResult(url, 503, None, error="slow")

    fp = F.FetchParse("t1", fetch_timeout_s=0.01)
    fp.web = SlowFail("t1")
    web = SynthWeb("t1")
    out = fp(_frontier_batch(web, [{"url": web.seeds()[0]["url"]}]))
    log = out.filter(pa.compute.equal(out["kind"], "log"))
    assert log["status"].to_pylist() == [F.STATUS_TIMEOUT]
    assert log["attempts"].to_pylist()[0] < F.RETRY_ATTEMPTS  # gave up early


def test_fused_mode_writes_fragments(tmp_path):
    web = SynthWeb("t1")
    fp = F.FetchParse(
        "t1", entries_root=str(tmp_path / "e"), images_root=str(tmp_path / "i")
    )
    url = web.seeds()[0]["url"] + "&page=1"
    out = fp(_frontier_batch(web, [{"url": url, "depth": 1, "priority": 1}]))
    kinds = out["kind"].to_pylist()
    assert "entry" not in kinds  # payload rows replaced by frag metadata
    assert kinds.count("efrag") == 1
    efrag = out.filter(pa.compute.equal(out["kind"], "efrag"))
    assert efrag["frag_rows"].to_pylist()[0] == web.n_articles(0, 1)
    import os

    assert os.path.exists(efrag["frag_path"].to_pylist()[0])


def test_standalone_image_fetch_write(tmp_path):
    """Non-fused image writer stage (ImageFetchWrite / make_image_write_fn):
    refs in → fragments written task-side → metadata out; idempotent."""
    import pyarrow.parquet as pq

    from crawlkit.state.lancelike import TableStore

    web = SynthWeb("t1")
    refs = pa.table(
        {
            "image_id": ["img-sa-0", "img-sa-1"],
            "caption": [web.caption("img-sa-0"), web.caption("img-sa-1")],
        }
    )
    w = F.ImageFetchWrite("t1", str(tmp_path / "imgs"))
    meta1 = w(refs).to_pylist()
    meta2 = w(refs).to_pylist()  # retry replays the same key
    assert meta1 == meta2 and len(meta1) == 1 and meta1[0]["rows"] == 2
    store = TableStore(str(tmp_path / "imgs"))
    store.commit_fragments(meta1)
    store.commit_fragments(meta2)  # idempotent re-commit
    t = store.read_table()
    assert t.num_rows == 2
    assert t.column_names == [f.name for f in F.IMAGES_SCHEMA]


def test_rate_limited_fetch_path():
    """Token-bucket politeness path: with host-hash task routing a host's
    fetches are sequential per round, so the in-task bucket is exact.
    High rate → no meaningful sleep, identical results."""
    web = SynthWeb("t1")
    fp = F.FetchParse("t1", rate_per_host=10_000.0)
    out = fp(_frontier_batch(web, [{"url": web.seeds()[0]["url"]}]))
    log = out.filter(pa.compute.equal(out["kind"], "log"))
    assert log["status"].to_pylist() == [200]
    # host0.test's robots declares "Crawl-delay: 2" (every 5th host in
    # SynthWeb) → the fetch path creates its bucket at 1/delay, winning
    # over the configured rate; hosts without the directive get the
    # configured rate.
    assert fp.buckets is not None and fp.buckets.bucket("host0.test").rate == 0.5
    assert fp.buckets.bucket("host1.test").rate == 10_000.0


def test_fused_fragment_batching_identical_rows_fewer_files(tmp_path):
    """Armed batching (reset_log_buffer/flush_logs) writes ONE log and
    ONE entries fragment for many chunks, with committed row content
    IDENTICAL to the per-chunk path; re-running after reset overwrites
    the same fragment keys (task-retry idempotence)."""
    import os

    from crawlkit.state.lancelike import TableStore

    web = SynthWeb("t1")
    urls = [s["url"] + "&page=1" for s in web.seeds()[:3]]
    batches = [
        _frontier_batch(web, [{"url": u, "depth": 1, "priority": 1}]) for u in urls
    ]

    def run(root, armed):
        fp = F.FetchParse(
            "t1", entries_root=f"{root}/e", images_root=f"{root}/i",
            logs_root=f"{root}/l", fetch_images=False,
        )
        metas = []
        if armed:
            fp.reset_log_buffer()
        for b in batches:
            out = fp(b)
            metas += [
                r for r in out.to_pylist() if r["kind"] in ("lfrag", "efrag")
            ]
        if armed:
            metas += fp.flush_logs().to_pylist()
        for kind, sub in (("lfrag", "l"), ("efrag", "e")):
            store = TableStore(f"{root}/{sub}")
            store.commit_fragments(
                [
                    {"key": r["frag_key"], "rows": r["frag_rows"], "path": r["frag_path"]}
                    for r in metas
                    if r["kind"] == kind
                ]
            )
        return metas

    m_plain = run(str(tmp_path / "plain"), armed=False)
    m_armed = run(str(tmp_path / "armed"), armed=True)
    assert len([m for m in m_plain if m["kind"] == "lfrag"]) == 3
    assert len([m for m in m_armed if m["kind"] == "lfrag"]) == 1
    assert len([m for m in m_armed if m["kind"] == "efrag"]) == 1

    def committed(root, sub, sort_cols):
        t = TableStore(f"{root}/{sub}").read_table().to_pandas()
        return t.sort_values(sort_cols).reset_index(drop=True)

    import pandas as pd

    for sub, sort_cols in (("l", ["canon_url"]), ("e", ["link"])):
        pd.testing.assert_frame_equal(
            committed(str(tmp_path / "plain"), sub, sort_cols),
            committed(str(tmp_path / "armed"), sub, sort_cols),
        )
    # retry idempotence: a second armed pass re-produces the same keys
    m_armed2 = run(str(tmp_path / "armed"), armed=True)
    assert sorted(r["frag_key"] for r in m_armed2) == sorted(
        r["frag_key"] for r in m_armed
    )
