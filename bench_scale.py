#!/usr/bin/env python
"""Frontier-scale structural evidence (SURVEY §6: "10^10-frontier scale
realism is evidenced by memory math + running the real structure at
1e6-1e7 synthetic URLs").

Runs the sharded seen-set (bloom + cuckoo + exact) at N million keys
through the real SeenShard actors and reports throughput + measured
memory, then prints the extrapolated per-shard memory math for 10^10
keys. Prints ONE JSON line.

Usage: python bench_scale.py [n_million_keys] (default 2)
"""

from __future__ import annotations

import json
import sys
import time


def main() -> dict:
    import numpy as np
    import ray

    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    n = int(n_m * 1_000_000)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")

    from crawlkit.state.seenset import SeenSet

    shards = 8
    ss = SeenSet(num_shards=shards, capacity_per_shard=max(1 << 20, n // shards * 2))

    # synthesize digests directly (the fetch stage computes them in-task;
    # here we measure the seen-set structure itself)
    rng = np.random.Generator(np.random.PCG64(42))
    batch = 200_000
    t0 = time.perf_counter()
    new_total = 0
    for i in range(0, n, batch):
        d = rng.integers(0, 2**63, size=(min(batch, n - i), 2), dtype=np.uint64)
        new_total += int(ss.check_and_add_digests(d).sum())
    insert_sec = time.perf_counter() - t0

    # re-check a sample (all should be seen) + fresh sample (mostly new)
    t0 = time.perf_counter()
    recheck = ss.check_and_add_digests(
        rng.integers(0, 2**63, size=(batch, 2), dtype=np.uint64)
    )
    check_sec = time.perf_counter() - t0

    total = ss.total()

    # --- memory ledger (round-5 VERDICT #1): per-shard structure bytes
    # AND the actor process's real VmRSS, plus snapshot bytes on disk —
    # the numbers the 10^10 extrapolation must be checked against
    def _ledger(self):
        rss_kb = 0
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    rss_kb = int(line.split()[1])
                    break
        return {
            "bloom_bytes": int(self.state.bloom.bits.nbytes),
            "cuckoo_bytes": int(self.state.cuckoo.table.nbytes),
            "exact_entries": len(self.state.exact),
            "vm_rss_mb": round(rss_kb / 1024, 1),
        }

    shard_ledgers = ray.get([s.__ray_call__.remote(_ledger) for s in ss.shards])
    mem = sum(l["bloom_bytes"] + l["cuckoo_bytes"] + l["exact_entries"] * 64
              for l in shard_ledgers)

    # snapshot the full set once (first snapshot = full delta) and
    # measure bytes + wall — the resume-payload cost at this scale
    import os as _os
    import shutil as _sh

    snap_dir = "/tmp/crawlkit_scale_snapshot"
    _sh.rmtree(snap_dir, ignore_errors=True)
    t0 = time.perf_counter()
    ss.snapshot(snap_dir)
    snap_sec = time.perf_counter() - t0
    snap_bytes = sum(
        _os.path.getsize(f"{snap_dir}/{f}") for f in _os.listdir(snap_dir)
    )
    manifest_bytes = _os.path.getsize(f"{snap_dir}/manifest.json")
    _sh.rmtree(snap_dir, ignore_errors=True)

    out = {
        "metric": "seen-set structure at frontier scale",
        "keys": n,
        "inserted": new_total,
        "total_in_set": total,
        "insert_keys_per_sec": round(n / insert_sec),
        "check_batch_sec": round(check_sec, 3),
        "measured_mem_mb": round(mem / 1e6, 1),
        "shards": shards,
        "shard_ledger": {
            "bloom_mb_per_shard": round(shard_ledgers[0]["bloom_bytes"] / 1e6, 1),
            "cuckoo_mb_per_shard": round(shard_ledgers[0]["cuckoo_bytes"] / 1e6, 1),
            "exact_entries_per_shard": [l["exact_entries"] for l in shard_ledgers],
            "vm_rss_mb_per_shard": [l["vm_rss_mb"] for l in shard_ledgers],
        },
        "snapshot_bytes": snap_bytes,
        "snapshot_bytes_per_key": round(snap_bytes / max(total, 1), 2),
        "snapshot_sec": round(snap_sec, 2),
        "snapshot_manifest_bytes": manifest_bytes,
        # 10^10-key extrapolation (per north rule): K=10 shards/node-group,
        # 1e9 keys/shard: bloom 10 bits/key = 1.25 GB, cuckoo ~2.2 B/key
        # (16-bit fp, 4-slot, 1.1x) = 2.2 GB, exact store spilled to
        # digest-sorted parquet runs (16 B/key on disk = 16 GB/shard,
        # merge-checked; bloom answers the 'definitely new' fast path)
        "extrapolation_1e10": {
            "shards": 10,
            "keys_per_shard": 1e9,
            "bloom_gb_per_shard": 1.25,
            "cuckoo_gb_per_shard": 2.2,
            "exact_disk_gb_per_shard": 16.0,
        },
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
