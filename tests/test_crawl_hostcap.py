"""Global per-host page cap (CrawlSpec.max_pages_per_host) — the trap
guard (Heritrix's max-pages-per-host): a calendar/session-id URL trap
would otherwise grow a host's frontier forever. Per host, across the
whole run, at most ``cap`` issue slots; per round, in contract sort
order, ranks ≤ min(budget, cap − used) issue, ranks ≤ cap − used defer,
the rest are DROPPED. Shared contract: refsim ≡ driver mode ≡
distributed-frontier mode."""

import pandas as pd
import pytest

from crawlkit import refsim
from crawlkit.pipelines.crawl import run_crawl
from crawlkit.pipelines.crawl_dist import run_crawl_dataset
from crawlkit.synthweb import SynthWeb

SPEC = refsim.CrawlSpec(host_budget_per_round=4, max_pages_per_host=9)


@pytest.fixture(scope="module")
def web():
    return SynthWeb("t1")


@pytest.fixture(scope="module")
def sim(web):
    return refsim.simulate(web, SPEC)


def _issued_per_host(log_rows) -> pd.Series:
    df = pd.DataFrame(log_rows)
    return df.groupby("host")["canon_url"].count()


def test_cap_binds_and_sim_terminates(web, sim):
    """The fixture must actually exercise the cap: without it some host
    issues more than cap pages; with it every host stops at cap."""
    free = refsim.simulate(web, refsim.CrawlSpec(host_budget_per_round=4))
    per_free = _issued_per_host(free.fetch_log)
    assert (per_free > SPEC.max_pages_per_host).any()
    per_cap = _issued_per_host(sim.fetch_log)
    assert (per_cap <= SPEC.max_pages_per_host).all()
    assert (per_cap == SPEC.max_pages_per_host).any()
    assert len(sim.order) < len(free.order)  # candidates were dropped


def test_driver_mode_cap_parity(web, sim, tmp_path):
    eng = run_crawl(
        web, spec=SPEC, out_dir=str(tmp_path / "run"),
        num_seen_shards=2, fetch_concurrency=2,
    )
    assert eng.order == sim.order
    assert eng.seen == sim.seen
    log = eng.fetch_log_table().to_pandas()
    per = log.groupby("host")["canon_url"].count()
    assert (per <= SPEC.max_pages_per_host).all()


def test_dist_mode_cap_parity(web, sim, tmp_path):
    res = run_crawl_dataset(
        web, spec=SPEC, out_dir=str(tmp_path / "dist"),
        num_seen_shards=2, nblocks=4, track_order=True,
    )
    assert res.order == sim.order
    assert res.seen == sim.seen
