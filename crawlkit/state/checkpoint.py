"""Round-based checkpointing: frontier deltas, seen snapshots, lineage.

The reference has NO in-saga resume — a crash re-runs the whole saga and
only Postgres ``ON CONFLICT`` dedups rows (SURVEY §4 "Checkpoint/resume";
its MinIO side even duplicates, ``storage/handler.go:103``). The north
rule requires mid-crawl resume with per-partition lineage + metrics.

Layout under the run directory:
    rounds/<r>/frontier.parquet     frontier AFTER round r (deferred+new),
                                    host-hash partition column included
    rounds/<r>/seen/shard-*.parquet exact-store snapshot per seen shard
    rounds/<r>/metrics.json         per-host lineage: issued/ok/failed/
                                    blocked/bytes + order ranks covered
    rounds/<r>/_COMPLETE            commit marker (written last, atomic)

Resume = find highest round with ``_COMPLETE``, restore seen shards,
reload frontier, continue at round r+1. Entry/image fragments are
already idempotently committed to their Lance-like stores, so replaying
a half-finished round never duplicates rows.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


class RunCheckpoint:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(f"{root}/rounds", exist_ok=True)

    def _rdir(self, rnd: int) -> str:
        return f"{self.root}/rounds/{rnd}"

    def save_round(
        self,
        rnd: int,
        frontier: pa.Table | None,  # None: frontier checkpointed elsewhere
        seen_set,  # SeenSet | None (None: snapshot already taken)
        metrics: dict,
    ) -> None:
        d = self._rdir(rnd)
        os.makedirs(d, exist_ok=True)
        if frontier is not None:
            pq.write_table(frontier, f"{d}/.frontier.tmp")
            os.replace(f"{d}/.frontier.tmp", f"{d}/frontier.parquet")
        if seen_set is not None:
            seen_set.snapshot(f"{d}/seen")
        with open(f"{d}/.metrics.tmp", "w") as f:
            json.dump(metrics, f)
        os.replace(f"{d}/.metrics.tmp", f"{d}/metrics.json")
        with open(f"{d}/.complete.tmp", "w") as f:
            f.write("ok")
        os.replace(f"{d}/.complete.tmp", f"{d}/_COMPLETE")

    def latest_complete_round(self) -> int | None:
        best = None
        base = f"{self.root}/rounds"
        for name in os.listdir(base):
            if name.isdigit() and os.path.exists(f"{base}/{name}/_COMPLETE"):
                best = max(best, int(name)) if best is not None else int(name)
        return best

    def load_frontier(self, rnd: int) -> pa.Table:
        return pq.read_table(f"{self._rdir(rnd)}/frontier.parquet")

    def seen_dir(self, rnd: int) -> str:
        return f"{self._rdir(rnd)}/seen"

    def seen_dirs(self) -> list[str]:
        """All per-round seen snapshot dirs up to the last complete round
        (the incremental-delta chain a restore/recrawl unions)."""
        last = self.latest_complete_round()
        return [] if last is None else [self.seen_dir(r) for r in range(last + 1)]

    def load_metrics(self, rnd: int) -> dict:
        with open(f"{self._rdir(rnd)}/metrics.json") as f:
            return json.load(f)

    def all_metrics(self) -> list[dict]:
        out = []
        r = self.latest_complete_round()
        if r is None:
            return out
        for i in range(r + 1):
            try:
                out.append(self.load_metrics(i))
            except FileNotFoundError:
                pass
        return out
