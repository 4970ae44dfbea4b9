"""Crash-window resume: a failure BETWEEN payload-fragment commit and
the round's _COMPLETE marker must replay the round without duplicating
any rows (deterministic fragment keys + idempotent manifest commits)."""

import os

import pandas as pd
import pyarrow as pa

from crawlkit import refsim
from crawlkit.pipelines.crawl import run_crawl
from crawlkit.synthweb import SynthWeb

SPEC = refsim.CrawlSpec(host_budget_per_round=16)


def _sorted_pdf(t: pa.Table):
    df = t.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_crash_after_commit_before_marker(tmp_path):
    web = SynthWeb("t1")
    out = str(tmp_path / "run")
    partial = refsim.CrawlSpec(host_budget_per_round=16, max_rounds=3)
    run_crawl(web, spec=partial, out_dir=out, num_seen_shards=2)

    # simulate the crash window: round 2's fragments/stores are committed
    # but its _COMPLETE marker (and thus frontier/seen snapshot) is lost
    os.remove(f"{out}/rounds/2/_COMPLETE")

    full = run_crawl(web, spec=SPEC, out_dir=out, num_seen_shards=2, resume=True)
    sim = refsim.simulate(web, SPEC)
    assert full.order == sim.order
    assert full.seen == sim.seen
    ent = _sorted_pdf(full.entries_table())
    sim_ent = _sorted_pdf(pa.Table.from_pylist(sim.entries, schema=full.entries_table().schema))
    pd.testing.assert_frame_equal(ent, sim_ent)  # no duplicates from the replay
    img = _sorted_pdf(full.images_table())
    sim_img = _sorted_pdf(pa.Table.from_pylist(sim.images, schema=full.images_table().schema))
    pd.testing.assert_frame_equal(img, sim_img)
