"""Distributed-frontier crawl loop — the 10^10-URL path.

``run_crawl`` (crawl.py) keeps the round frontier as a driver-side
polars frame: correct and fast at sandbox scale, but at 10^10 URLs the
deferred frontier alone exceeds driver RAM (round-1 VERDICT "What's
missing" #4). This module runs the SAME round semantics with the
frontier as a Ray ``Dataset`` end to end:

    frontier parquet → groupby(host).map_groups(budget: sort + top-k
    issued/deferred split + hostblock routing) → issued
    groupby(hostblock).map_groups(FUSED fetch: one task per host-block,
    worker-cached FetchParse, entry/image/log fragments written in-task)
    → control rows → pages → per-canon first-wins dedup (PACKED-KEY
    groupby(canon).aggregate(Min) — no per-group pandas at million-group
    scale) → dedup-admit (seen-shard actor calls FROM INSIDE map_batches
    tasks, batched per shard) → union(deferred) → next frontier parquet.

Driver state per round: fragment-manifest metadata + per-host stat rows
(both O(hosts), not O(frontier)). Ordering contract: the issue ORDER
list is not tracked (that is the no-track bench mode); everything else —
seen set, entries, images, fetch log, per-round issued sets — is
byte-equal to ``refsim.simulate`` (tests/test_crawl_dist.py).

Duplicate-discovery determinism: when one canon_url is discovered
multiple times in a round (same offer linked from two listing pages),
the row with the SMALLEST (depth, seed_id, priority, host, canon_url,
url) key must win (shared contract with refsim/admit_pending). Here
every candidate row is packed into one lexicographically-ordered string
key, so ``aggregate(Min(skey))`` picks exactly that row without a
per-group UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..refsim import CrawlSpec
from ..stages.fetch import make_fetch_parse_fn
from ..state.checkpoint import RunCheckpoint
from ..state.seenset import SeenSet
from ..synthweb import SynthWeb, WebConfig
from .crawl import FRONTIER_SCHEMA, CrawlResult, _seed_frontier

_SEP = "\x1f"  # sorts below every printable char → tuple-order preserving


def _pack_keys(t: pa.Table) -> pa.Table:
    """Add ``skey``: one string whose lexicographic order equals the
    shared sort contract (depth, seed_id, priority, host, canon_url,
    url), with the remaining row fields appended after the ordering
    prefix so Min(skey) carries the WHOLE winning row."""
    cols = {c: t[c].to_pylist() for c in t.column_names}
    n = t.num_rows
    skey = [
        (
            f"{cols['depth'][i]:02d}{_SEP}{cols['seed_id'][i]:010d}{_SEP}"
            f"{cols['priority'][i]:010d}{_SEP}{cols['host'][i]}{_SEP}"
            f"{cols['canon_url'][i]}{_SEP}{cols['url'][i]}{_SEP}"
            f"{cols['schema_name'][i]}{_SEP}{cols['schema_version'][i]}{_SEP}"
            f"{cols['domain'][i]}{_SEP}{cols['digest_hi'][i]:020d}{_SEP}"
            f"{cols['digest_lo'][i]:020d}"
        )
        for i in range(n)
    ]
    return pa.table({"canon_url": t["canon_url"], "skey": pa.array(skey, pa.string())})


def _unpack_keys(t: pa.Table, rnd: int) -> pa.Table:
    """Inverse of :func:`_pack_keys` → full frontier-schema rows plus
    digest columns (for the admission stage)."""
    out = {
        "url": [], "canon_url": [], "host": [], "priority": [], "depth": [],
        "seed_id": [], "schema_name": [], "schema_version": [], "domain": [],
        "digest_hi": [], "digest_lo": [],
    }
    for skey in t["skey"].to_pylist():
        (depth, seed_id, priority, host, canon_url, url,
         schema_name, schema_version, domain, dhi, dlo) = skey.split(_SEP)
        out["url"].append(url)
        out["canon_url"].append(canon_url)
        out["host"].append(host)
        out["priority"].append(int(priority))
        out["depth"].append(int(depth))
        out["seed_id"].append(int(seed_id))
        out["schema_name"].append(schema_name)
        out["schema_version"].append(schema_version)
        out["domain"].append(domain)
        out["digest_hi"].append(int(dhi))
        out["digest_lo"].append(int(dlo))
    table = pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "canon_url": pa.array(out["canon_url"], pa.string()),
            "host": pa.array(out["host"], pa.string()),
            "priority": pa.array(out["priority"], pa.int64()),
            "depth": pa.array(out["depth"], pa.int32()),
            "seed_id": pa.array(out["seed_id"], pa.int32()),
            "schema_name": pa.array(out["schema_name"], pa.string()),
            "schema_version": pa.array(out["schema_version"], pa.string()),
            "domain": pa.array(out["domain"], pa.string()),
            "round_added": pa.array([rnd] * t.num_rows, pa.int32()),
            "digest_hi": pa.array(np.array(out["digest_hi"], dtype=np.uint64)),
            "digest_lo": pa.array(np.array(out["digest_lo"], dtype=np.uint64)),
        }
    )
    return table


def run_crawl_dataset(
    web: SynthWeb | WebConfig | str = "t2",
    spec: CrawlSpec = CrawlSpec(),
    out_dir: str = "/tmp/crawlkit_dist_run",
    num_seen_shards: int = 8,
    nblocks: int = 16,
    fetch_batch_size: int = 64,
    host_salt_cap: int = 1024,
    resume: bool = False,
) -> CrawlResult:
    """Frontier-as-Dataset crawl to exhaustion (or spec.max_rounds).

    Per-round shuffles: one groupby(host) for budget, one
    groupby(hostblock) for fetch routing, one groupby(canon_url) for
    duplicate-discovery dedup — each keyed exactly as documented in
    SURVEY §7.4. The driver never holds a frontier-sized table.

    ``resume=True``: continue from the latest _COMPLETE round — seen
    shards restored from the per-round snapshot deltas, the frontier
    read back from that round's task-written parquet directory (fragment
    commits are idempotent, so replaying a half-finished round never
    duplicates rows).
    """
    if not isinstance(web, SynthWeb):
        web = SynthWeb(web)
    web_cfg = web.cfg
    budget = spec.host_budget_per_round

    ckpt = RunCheckpoint(out_dir)
    seen = SeenSet(num_seen_shards)
    res = CrawlResult(out_dir=out_dir)
    from ..state.lancelike import TableStore

    res.entries_store = TableStore(f"{out_dir}/entries")
    res.images_store = TableStore(f"{out_dir}/images")
    res.fetch_log_store = TableStore(f"{out_dir}/fetch_log")

    start_round = 0
    frontier_ds = None
    if resume and (last := ckpt.latest_complete_round()) is not None:
        seen.restore([ckpt.seen_dir(r) for r in range(last + 1)])
        m = ckpt.load_metrics(last)
        start_round = last + 1
        if not m.get("frontier_rows"):
            res.rounds = start_round
            return res  # crawl had already drained when it was checkpointed
        from .. import read_parquet_clean

        frontier_ds = read_parquet_clean(m["frontier_dir"]).map_batches(
            lambda t: t.select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA),
            batch_format="pyarrow",
        )
    if frontier_ds is None:
        # seeds (small by definition: the reference's SOURCE_URL list)
        seeds_t = _seed_frontier(web).to_arrow().cast(FRONTIER_SCHEMA)
        mask = seen.check_and_add_urls(seeds_t["canon_url"].to_pylist())
        frontier_ds = rd.from_arrow(seeds_t.filter(pa.array(mask)))

    shard_handles = seen.shards  # actor handles — serializable into tasks
    num_shards = seen.num_shards
    fetch_fn = make_fetch_parse_fn(
        web_cfg,
        obey_robots=spec.obey_robots,
        max_depth=spec.max_depth,
        entries_root=f"{out_dir}/entries",
        images_root=f"{out_dir}/images",
        fetch_images=spec.fetch_images,
        logs_root=f"{out_dir}/fetch_log",
    )

    def budget_split(t: pa.Table) -> pa.Table:
        """One host: sort by the shared contract, flag the first
        ``budget`` rows issued, salt mega-hosts across sub-blocks.
        Arrow in/out (a pandas return would attach pandas metadata and
        break Ray's schema-dedup fast path downstream)."""
        g = t.to_pandas()
        g = g.sort_values(
            ["depth", "seed_id", "priority", "host", "canon_url", "url"]
        ).reset_index(drop=True)
        g["_issued"] = np.arange(len(g)) < budget
        from ..hashing import hash64_np

        h = int(hash64_np([g["host"].iloc[0]], salt="hostroute")[0])
        salt = (np.arange(len(g)) // max(host_salt_cap, 1)).astype(np.uint64)
        g["hostblock"] = (
            (np.uint64(h) + salt * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(nblocks)
        ).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def fetch_group(g: pa.Table) -> pa.Table:
        """One host-block: run the fused fetch stage in batch_size
        chunks (bounds fragment size + in-task memory)."""
        g = g.drop_columns(["_issued", "hostblock"])
        outs = []
        for lo in range(0, g.num_rows, fetch_batch_size):
            outs.append(fetch_fn(g.slice(lo, fetch_batch_size)))
        return pa.concat_tables(outs) if outs else fetch_fn(g)

    def admit(t: pa.Table) -> pa.Table:
        """Dedup-admit INSIDE the task: route this batch's digests to
        the owning seen shards (one batched call per shard)."""
        if t.num_rows == 0:
            return t
        d = np.stack(
            [t["digest_hi"].to_numpy(), t["digest_lo"].to_numpy()], axis=1
        ).astype(np.uint64)
        route = (d[:, 0] % np.uint64(num_shards)).astype(np.int64)
        keep = np.zeros(len(d), dtype=bool)
        futs, idxs = [], []
        for s in range(num_shards):
            ix = np.nonzero(route == s)[0]
            if len(ix):
                futs.append(shard_handles[s].check_and_add.remote(d[ix]))
                idxs.append(ix)
        for ix, m in zip(idxs, ray.get(futs)):
            keep[ix] = m
        return t.filter(pa.array(keep)).drop_columns(["digest_hi", "digest_lo"])

    def _norm_frontier(t: pa.Table) -> pa.Table:
        return t.select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA)

    for rnd in range(start_round, spec.max_rounds):
        parts = (
            frontier_ds.groupby("host")
            .map_groups(budget_split, batch_format="pyarrow")
            .materialize()
        )
        issued = parts.map_batches(
            lambda t: t.filter(pc.equal(t["_issued"], True)), batch_format="pyarrow"
        )
        deferred = parts.map_batches(
            lambda t: t.filter(pc.equal(t["_issued"], False)).drop_columns(
                ["_issued", "hostblock"]
            ),
            batch_format="pyarrow",
        ).map_batches(_norm_frontier, batch_format="pyarrow")
        n_issued = issued.count()
        if n_issued == 0:
            res.rounds = rnd
            break

        def add_round(t: pa.Table, rnd=rnd) -> pa.Table:
            t = t.append_column("round", pa.array([rnd] * t.num_rows, pa.int32()))
            return t.append_column(
                "created", pa.array([spec.run_ts] * t.num_rows, pa.string())
            )

        control = (
            issued.map_batches(add_round, batch_format="pyarrow")
            .groupby("hostblock")
            .map_groups(fetch_group, batch_format="pyarrow")
            .materialize()
        )
        # small control-plane rows → driver: fragment metas + host stats
        small = control.map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t["kind"], "page"))),
            batch_format="pyarrow",
        ).to_pandas()
        for kind, store in (
            ("lfrag", res.fetch_log_store),
            ("efrag", res.entries_store),
            ("ifrag", res.images_store),
        ):
            f = small[small["kind"] == kind]
            store.commit_fragments(
                [
                    {"key": k, "rows": r, "path": p}
                    for k, r, p in zip(f["frag_key"], f["frag_rows"], f["frag_path"])
                ]
            )
        hs = small[small["kind"] == "hstat"]
        by_host = (
            hs.groupby("host", as_index=False)
            .agg(
                issued=("n_issued", "sum"), ok=("n_ok", "sum"),
                failed=("n_failed", "sum"), blocked=("n_blocked", "sum"),
                bytes=("nbytes", "sum"),
            )
            .to_dict("records")
        )
        blocked_total = int(hs["n_blocked"].sum()) if len(hs) else 0

        # pages → per-canon first-wins dedup → in-task admission
        pages = control.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], "page")), batch_format="pyarrow"
        )
        from ray.data.aggregate import Min

        fresh = (
            pages.map_batches(_pack_keys, batch_format="pyarrow")
            .groupby("canon_url")
            .aggregate(Min("skey", alias_name="skey"))
            .map_batches(
                lambda t, rnd=rnd: _unpack_keys(t, rnd + 1), batch_format="pyarrow"
            )
            .map_batches(admit, batch_format="pyarrow")
            .map_batches(_norm_frontier, batch_format="pyarrow")
        )
        # next frontier stays a DATASET: union, materialize (object-store
        # blocks, spillable), checkpoint via task-side parquet writes —
        # the driver never holds a frontier-sized table
        nf = deferred.union(fresh).materialize()
        n_next = nf.count()
        next_dir = f"{out_dir}/rounds/{rnd}/frontier_ds"
        if n_next:
            nf.write_parquet(next_dir)
        metrics = {
            "round": rnd,
            "issued": n_issued,
            "fetched": n_issued - blocked_total,
            "entries": int(small[small["kind"] == "efrag"]["frag_rows"].sum()),
            "images": int(small[small["kind"] == "ifrag"]["frag_rows"].sum()),
            "per_host": by_host,
            "nblocks": nblocks,
            "frontier_dir": next_dir if n_next else None,
            "frontier_rows": n_next,
        }
        seen.snapshot(ckpt.seen_dir(rnd))
        ckpt.save_round(rnd, None, None, metrics)  # frontier checkpointed above
        res.rounds = rnd + 1
        if n_next == 0:
            break
        frontier_ds = nf

    res.seen = set()  # order/seen lists not tracked in dataset mode
    return res
