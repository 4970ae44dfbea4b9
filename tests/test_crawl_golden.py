"""Golden end-to-end: the Ray engine must EXACTLY reproduce the
reference-semantics simulator — crawl ordering, final URL-seen set,
extracted entries and image payload rows (SURVEY §5.3, the north-rule
reproduction check)."""

import numpy as np
import pyarrow as pa
import pytest

from crawlkit import refsim
from crawlkit.pipelines.crawl import run_crawl
from crawlkit.synthweb import SynthWeb

SPEC = refsim.CrawlSpec(host_budget_per_round=16)


@pytest.fixture(scope="module")
def web():
    return SynthWeb("t1")


@pytest.fixture(scope="module")
def sim(web):
    return refsim.simulate(web, SPEC)


@pytest.fixture(scope="module")
def eng(web, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl") / "run")
    return run_crawl(web, spec=SPEC, out_dir=out, fetch_concurrency=2, num_seen_shards=2)


def _sorted_pdf(t: pa.Table):
    df = t.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_crawl_order_matches_reference(eng, sim):
    assert eng.order == sim.order


def test_seen_set_exactly_matches(eng, sim):
    assert eng.seen == sim.seen


def test_entries_match_value_level(eng, sim):
    et = eng.entries_table()
    st = pa.Table.from_pylist(sim.entries, schema=et.schema)
    assert _sorted_pdf(et).equals(_sorted_pdf(st))


def test_images_match_value_level(eng, sim):
    it = eng.images_table()
    st = pa.Table.from_pylist(sim.images, schema=it.schema)
    assert _sorted_pdf(it).equals(_sorted_pdf(st))  # includes bytes + phash


def test_robots_blocked_rows_logged_not_fetched(eng, sim, web):
    log = eng.fetch_log_table().to_pandas()
    blocked = log[log.status == refsim.STATUS_ROBOTS_BLOCKED]
    sim_blocked = [r for r in sim.fetch_log if r["status"] == refsim.STATUS_ROBOTS_BLOCKED]
    assert len(blocked) == len(sim_blocked)
    assert set(blocked.canon_url) == {r["canon_url"] for r in sim_blocked}
    # blocked URLs never appear in the issue order
    assert set(blocked.canon_url).isdisjoint(set(eng.order))


def test_retry_attempts_recorded(eng, web):
    """Fail-bucket URLs (first 2 attempts 503) must show attempts=3 (T3)."""
    log = eng.fetch_log_table().to_pandas()
    ok = log[log.status == 200]
    assert (ok.attempts >= 1).all() and (ok.attempts <= 5).all()
    assert (ok.attempts == 3).any()  # the synthetic fail bucket is non-empty


def test_fetch_concurrency_does_not_change_results(web, sim, tmp_path):
    """Determinism contract: different parallelism, identical outputs."""
    eng2 = run_crawl(
        web, spec=SPEC, out_dir=str(tmp_path / "run2"),
        fetch_concurrency=4, fetch_batch_size=4, num_seen_shards=5,
    )
    assert eng2.order == sim.order
    assert eng2.seen == sim.seen


def test_resume_from_checkpoint_equals_uninterrupted(web, eng, sim, tmp_path):
    """Kill after round 1, resume → identical final state (SURVEY §5.5)."""
    out = str(tmp_path / "resumed")
    partial_spec = refsim.CrawlSpec(host_budget_per_round=16, max_rounds=2)
    run_crawl(web, spec=partial_spec, out_dir=out, num_seen_shards=2)
    full = run_crawl(web, spec=SPEC, out_dir=out, num_seen_shards=2, resume=True)
    assert full.order == sim.order
    assert full.seen == sim.seen
    assert _sorted_pdf(full.entries_table()).equals(_sorted_pdf(eng.entries_table()))
    assert _sorted_pdf(full.images_table()).equals(_sorted_pdf(eng.images_table()))


def test_lineage_metrics_per_round(eng):
    from crawlkit.state.checkpoint import RunCheckpoint

    ck = RunCheckpoint(eng.out_dir)
    ms = ck.all_metrics()
    assert len(ms) == eng.rounds
    assert sum(m["fetched"] for m in ms) == len(eng.order)
    for m in ms:
        assert {"round", "issued", "per_host", "order", "admitted"} <= m.keys()


def test_t2_profile_golden_with_strict_budget(tmp_path):
    """Second profile (8 seeds, 5 hosts, robots-blocked hosts, strict
    budget → many deferral rounds): engine ≡ oracle end to end."""
    web2 = SynthWeb("t2")
    spec2 = refsim.CrawlSpec(host_budget_per_round=6)
    eng2 = run_crawl(web2, spec=spec2, out_dir=str(tmp_path / "t2run"),
                     num_seen_shards=3, fetch_concurrency=3, fetch_batch_size=8)
    sim2 = refsim.simulate(web2, spec2)
    assert eng2.order == sim2.order
    assert eng2.seen == sim2.seen
    assert _sorted_pdf(eng2.entries_table()).equals(
        _sorted_pdf(pa.Table.from_pylist(sim2.entries, schema=eng2.entries_table().schema))
    )
    assert eng2.rounds > 5  # strict budget actually deferred work


def test_robots_transient_failure_still_blocks(tmp_path):
    """Regression (ADVICE r1): a host whose robots.txt URL is in the
    transient-503 fail bucket must STILL block /offer/ — the robots
    fetch goes through the same ≤5-attempt retry as page fetches, so a
    transient failure can't cache a permanent fail-open allow."""
    from crawlkit.synthweb import WebConfig

    cfg = WebConfig(seed=33, n_seeds=4, n_hosts=3)  # host2 blocks AND its robots URL fails twice
    web = SynthWeb(cfg)
    assert web.host_blocks_offers("host2.test")
    assert web.fail_attempts("https://host2.test/robots.txt") > 0
    spec = refsim.CrawlSpec(host_budget_per_round=16)
    eng = run_crawl(web, spec=spec, out_dir=str(tmp_path / "robots_fail"),
                    num_seen_shards=2, fetch_concurrency=2)
    sim = refsim.simulate(web, spec)
    assert eng.order == sim.order
    assert eng.seen == sim.seen
    log = eng.fetch_log_table().to_pandas()
    blocked = log[log.status == refsim.STATUS_ROBOTS_BLOCKED]
    assert (blocked.host == "host2.test").any()


def test_fetch_images_false_symmetric(tmp_path):
    """CrawlSpec.fetch_images=False: engine AND oracle both skip image
    payloads (refsim gating added in r2) while still fetching offers."""
    web = SynthWeb("t1")
    spec = refsim.CrawlSpec(host_budget_per_round=16, fetch_images=False)
    eng = run_crawl(web, spec=spec, out_dir=str(tmp_path / "noimg"),
                    num_seen_shards=2, fetch_concurrency=2)
    sim = refsim.simulate(web, spec)
    assert eng.order == sim.order
    assert eng.seen == sim.seen
    assert len(sim.images) == 0
    assert eng.images_table().num_rows == 0


def test_recrawl_cadence_fetches_only_new_offers(tmp_path):
    """Cross-run cadence (S2/P1): run 1 on a small web, run 2 on a GROWN
    web against run 1's persisted seen set. Run 2 must re-crawl listings,
    fetch ONLY never-seen offers, and match refsim.simulate(prior_seen=…)
    byte-level."""
    from crawlkit.pipelines.crawl import recrawl
    from crawlkit.synthweb import WebConfig

    cfg1 = WebConfig(n_seeds=4, n_hosts=3, max_last_page=3)
    cfg2 = WebConfig(n_seeds=4, n_hosts=3, max_last_page=6)  # grown: more pages
    web1, web2 = SynthWeb(cfg1), SynthWeb(cfg2)
    spec = refsim.CrawlSpec(host_budget_per_round=16)

    d1 = str(tmp_path / "run1")
    eng1 = run_crawl(web1, spec=spec, out_dir=d1, num_seen_shards=2, fetch_concurrency=2)
    sim1 = refsim.simulate(web1, spec)
    assert eng1.order == sim1.order and eng1.seen == sim1.seen

    d2 = str(tmp_path / "run2")
    eng2 = recrawl(web2, prior_dir=d1, out_dir=d2, spec=spec,
                   num_seen_shards=3, fetch_concurrency=2)  # different shard count on purpose
    sim2 = refsim.simulate(web2, spec, prior_seen=sim1.seen)
    assert eng2.order == sim2.order
    assert eng2.seen == sim2.seen

    offers1 = {u for u in eng1.order if "/offer/" in u}
    offers2 = {u for u in eng2.order if "/offer/" in u}
    assert offers2, "grown web must yield new offers"
    assert offers1.isdisjoint(offers2)  # never re-fetch a fetched offer
    listings2 = {u for u in eng2.order if "/list" in u}
    assert listings2 & {u for u in eng1.order if "/list" in u}  # listings re-crawled


def test_no_track_mode_same_stores_and_lineage(web, eng, sim, tmp_path):
    """track_order=False switches to in-task log fragments + hstat rows
    + overlapped commits — stores and lineage must be IDENTICAL to the
    tracked run (only res.order/res.seen bookkeeping is dropped)."""
    eng2 = run_crawl(web, spec=SPEC, out_dir=str(tmp_path / "notrack"),
                     fetch_concurrency=2, num_seen_shards=2, track_order=False)
    assert _sorted_pdf(eng2.entries_table()).equals(_sorted_pdf(eng.entries_table()))
    assert _sorted_pdf(eng2.images_table()).equals(_sorted_pdf(eng.images_table()))
    lt = eng2.fetch_log_table().to_pandas()
    lt_ref = eng.fetch_log_table().to_pandas()
    cols = sorted(lt.columns)
    assert lt[cols].sort_values(cols).reset_index(drop=True).equals(
        lt_ref[cols].sort_values(cols).reset_index(drop=True))
    from crawlkit.state.checkpoint import RunCheckpoint

    m2 = RunCheckpoint(eng2.out_dir).all_metrics()
    m1 = RunCheckpoint(eng.out_dir).all_metrics()
    assert [m["fetched"] for m in m2] == [m["fetched"] for m in m1]
    for a, b in zip(m2, m1):
        ka = {h["host"]: h for h in a["per_host"]}
        kb = {h["host"]: h for h in b["per_host"]}
        assert ka == kb


def test_hot_host_salting_splits_mega_host(tmp_path):
    """A single mega-host (all seeds on one host) must be split across
    multiple input blocks when its round exceeds host_salt_cap — and the
    results must still match the oracle byte-level (salting only changes
    task placement, never the deterministic sort/admission order)."""
    from crawlkit.synthweb import WebConfig

    web = SynthWeb(WebConfig(n_seeds=6, n_hosts=1, max_last_page=6))
    spec = refsim.CrawlSpec(host_budget_per_round=10_000)
    eng = run_crawl(web, spec=spec, out_dir=str(tmp_path / "salty"),
                    num_seen_shards=2, fetch_concurrency=4, fetch_batch_size=16,
                    host_salt_cap=64)
    sim = refsim.simulate(web, spec)
    assert eng.order == sim.order
    assert eng.seen == sim.seen
    from crawlkit.state.checkpoint import RunCheckpoint

    ms = RunCheckpoint(eng.out_dir).all_metrics()
    assert max(m["nblocks"] for m in ms) > 1  # the one host spread across blocks


def test_fetch_report_matches_refsim_page_counts():
    """The per-(host,status) telemetry rollup reproduces refsim's
    per-host page counts exactly (every sim-issued page appears once in
    the log) and aggregates consistently with the raw fetch_log table."""
    import collections
    import tempfile
    from urllib.parse import urlparse

    from crawlkit.pipelines.crawl import fetch_report, run_crawl
    from crawlkit import refsim
    from crawlkit.refsim import CrawlSpec
    from crawlkit.synthweb import SynthWeb

    spec = CrawlSpec(host_budget_per_round=32)
    out = tempfile.mkdtemp(prefix="rep_", dir="/tmp")
    res = run_crawl("t1", spec=spec, out_dir=out, num_seen_shards=2,
                    fetch_concurrency=4)
    rep = fetch_report(res.fetch_log_store)

    sim = refsim.simulate(SynthWeb("t1"), spec=spec)
    want = collections.Counter(urlparse(u).netloc for u in sim.order)
    # the log also carries telemetry rows for pages NOT fetched
    # (robots-blocked = -2); refsim.order holds fetched pages only
    ok = rep[rep["status"] == 200]
    got = ok.groupby("host")["pages"].sum().to_dict()
    assert got == dict(want)

    raw = res.fetch_log_table()
    assert int(rep["pages"].sum()) == raw.num_rows
    assert int(rep["total_bytes"].sum()) == sum(
        x or 0 for x in raw["nbytes"].to_pylist()
    )
