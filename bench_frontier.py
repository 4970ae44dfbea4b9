#!/usr/bin/env python
"""Frontier-scale crawl benchmark (north-rule workload shape).

Runs the ~1M-URL ``frontier1m`` profile (5120 seeds, 4096 hosts,
images off — pure scheduler/seen-set load) through either frontier
mode and prints ONE JSON line:

    python bench_frontier.py driver      # driver-side polars frontier
    python bench_frontier.py dataset     # frontier-as-Dataset (10^10 path)
    python bench_frontier.py both        # both, same process, driver first

Env: RAY_GRAFT_CPUS (default 32), GRAFT_PROFILE (default frontier1m),
GRAFT_NBLOCKS (dataset-mode host-blocks per round, default 2×CPUs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> dict:
    import logging

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    profile = os.environ.get("GRAFT_PROFILE", "frontier1m")
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from crawlkit.pipelines.crawl import run_crawl
    from crawlkit.pipelines.crawl_dist import run_crawl_dataset
    from crawlkit.refsim import CrawlSpec

    # scheduler-throughput spec: generous politeness budget (fewer
    # rounds → less per-round fixed cost), image payloads off
    spec = CrawlSpec(host_budget_per_round=1024, max_rounds=32, fetch_images=False)
    out: dict = {
        "metric": "frontier pages/sec at ~1M URLs",
        "profile": profile,
        "num_cpus": num_cpus,
    }

    def one(name: str, fn) -> None:
        out_dir = f"/tmp/crawlkit_bench_frontier_{name}"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        res = fn(out_dir)
        sec = time.perf_counter() - t0
        pages = res.fetch_log_store.count_rows()
        out[f"{name}_sec"] = round(sec, 1)
        out[f"{name}_pages"] = pages
        out[f"{name}_pages_per_sec"] = round(pages / sec, 1)
        out[f"{name}_rounds"] = res.rounds
        if res.phase_sec:
            out[f"{name}_phase_sec"] = {
                k: round(v, 1) for k, v in res.phase_sec.items()
            }

    if mode in ("driver", "both"):
        one(
            "driver",
            lambda d: run_crawl(
                profile, spec=spec, out_dir=d, num_seen_shards=8,
                fetch_concurrency=max(4, num_cpus - 4), fetch_batch_size=64,
                track_order=False,
            ),
        )
    if mode in ("dataset", "both"):
        nblocks = int(os.environ.get("GRAFT_NBLOCKS", str(2 * num_cpus)))
        out["nblocks"] = nblocks
        one(
            "dataset",
            lambda d: run_crawl_dataset(
                profile, spec=spec, out_dir=d, num_seen_shards=8,
                nblocks=nblocks, fetch_batch_size=64,
            ),
        )
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
