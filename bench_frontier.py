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

``--scaling [driver|dataset|both]``: the north-rule two-cluster-size
protocol ON THE FRONTIER WORKLOAD itself (round-2 VERDICT #4 — the
sf-table bench's version attaches to the 100k web): fresh processes at
RAY_GRAFT_CPUS=8 then 32 on the identical frontier1m input, each
repetition normalized by a burn-test hardware ceiling measured in the
same window (see bench.py run_burn_ceiling / BASELINE.md for why raw
4× is not achievable on this shared-hypervisor sandbox).
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
    # rounds → less per-round fixed cost). GRAFT_IMAGES=1 turns image
    # payloads ON — the north-rule workload (image+caption pairs into
    # the Lance-like store); images-off isolates pure scheduler/seen-set
    # load but its per-page work is ~0, so 8→32 scaling on it measures
    # Ray's fixed round costs (Amdahl), not the engine — attach scaling
    # claims to the images-on variant.
    images = os.environ.get("GRAFT_IMAGES", "0") == "1"
    spec = CrawlSpec(host_budget_per_round=1024, max_rounds=32, fetch_images=images)
    out: dict = {
        "metric": "frontier pages/sec at ~1M URLs",
        "profile": profile,
        "images": images,
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
        out[f"{name}_disk_ledger"] = _disk_ledger(out_dir)
        out[f"{name}_driver_peak_rss_mb"] = _vm_hwm_mb()

    nshards = int(os.environ.get("GRAFT_SEEN_SHARDS", "8"))
    if mode in ("driver", "both"):
        one(
            "driver",
            lambda d: run_crawl(
                profile, spec=spec, out_dir=d, num_seen_shards=nshards,
                fetch_concurrency=max(4, num_cpus - 4), fetch_batch_size=64,
                track_order=False,
            ),
        )
    if mode in ("dataset", "both"):
        # mirror run_crawl_dataset's image-aware default: image rounds
        # need ~5×CPUs host blocks to balance the heavier per-page work
        nblocks = int(
            os.environ.get("GRAFT_NBLOCKS", str((5 if images else 2) * num_cpus))
        )
        out["nblocks"] = nblocks
        one(
            "dataset",
            lambda d: run_crawl_dataset(
                profile, spec=spec, out_dir=d, num_seen_shards=nshards,
                nblocks=nblocks, fetch_batch_size=64,
            ),
        )
    ray.shutdown()
    return out


def _vm_hwm_mb() -> float:
    """Driver-process peak RSS (VmHWM) — the driver-state-stays-O(hosts)
    claim, measured."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                return round(int(line.split()[1]) / 1024, 1)
    return 0.0


def _disk_ledger(out_dir: str) -> dict:
    """On-disk memory ledger per store component: fragment data bytes,
    manifest/versions control bytes, and seen-snapshot bytes — the
    round-5 VERDICT #1 numbers (does the delta-log manifest stay small
    and the seen snapshot linear at one decade further?)."""
    import os

    ledger: dict = {}
    for root, _dirs, files in os.walk(out_dir):
        rel = os.path.relpath(root, out_dir)
        parts = rel.split(os.sep) if rel != "." else []
        comp = parts[0] if parts else "."
        if comp == "rounds":  # checkpoint tier: split seen snapshots out
            comp = "rounds_seen" if "seen" in parts else "rounds_ctrl"
        for f in files:
            sz = os.path.getsize(os.path.join(root, f))
            kind = (
                "manifest_bytes"
                if ("manifest" in f or "versions" in f or f.startswith("_")
                    or f.endswith(".json"))
                else "data_bytes"
            )
            c = ledger.setdefault(comp, {"data_bytes": 0, "manifest_bytes": 0, "files": 0})
            c[kind] += sz
            c["files"] += 1
    return ledger


def run_scaling(mode: str, reps: int | None = None) -> dict:
    import subprocess

    from bench import run_burn_ceiling, scale_levels

    if reps is None:
        reps = int(os.environ.get("GRAFT_SCALE_REPS", "2"))
    nlo, nhi = scale_levels()

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(p.stdout.strip().splitlines()[-1])

    out_reps = []
    for _ in range(reps):
        ceiling = run_burn_ceiling(nlo, nhi)
        lo, hi = one(nlo), one(nhi)
        rep: dict = {"hardware_ceiling": ceiling}
        for m in ("driver", "dataset"):
            if f"{m}_pages_per_sec" not in lo:
                continue
            pps_lo, pps_hi = lo[f"{m}_pages_per_sec"], hi[f"{m}_pages_per_sec"]
            rep[f"{m}_pages_per_sec_{nlo}"] = pps_lo
            rep[f"{m}_pages_per_sec_{nhi}"] = pps_hi
            rep[f"{m}_scaling_efficiency"] = round((pps_hi / pps_lo) / (nhi / nlo), 3)
            rep[f"{m}_scaling_efficiency_normalized"] = round(
                (pps_hi / pps_lo) / ceiling["ceiling_ratio"], 3
            )
        out_reps.append(rep)

    def best_of(key: str):
        vals = [r[key] for r in out_reps if key in r]
        return max(vals) if vals else None

    profile = os.environ.get("GRAFT_PROFILE", "frontier1m")
    return {
        "metric": f"{profile} scaling efficiency N->4N "
        f"({nlo} vs {nhi} CPUs, fresh processes; per-repetition contemporaneous ceiling)",
        "profile": profile,
        "levels": [nlo, nhi],
        "images": os.environ.get("GRAFT_IMAGES", "0") == "1",
        "best_driver_normalized": best_of("driver_scaling_efficiency_normalized"),
        "best_dataset_normalized": best_of("dataset_scaling_efficiency_normalized"),
        "repetitions": out_reps,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        print(json.dumps(run_scaling(args[0] if args else "both")))
    else:
        print(json.dumps(main()))
