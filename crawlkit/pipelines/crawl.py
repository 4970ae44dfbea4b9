"""The flagship pipeline: Ray-Data-native frontier crawl round loop.

Replaces the reference's orchestrator saga (``otodom/orchestrator/
handler.go:17-78``) — every OpenFaaS network boundary becomes a stage
edge in one Ray Data pipeline per round:

    frontier (Arrow) → [sort (priority order O1)] → [per-host budget
    (politeness top-k)] → [host-hash task routing (one host = one task
    per round → per-host sequential fetches)] → map_batches(FUSED
    FetchParse: robots, retry≤5, timeout, extract M1-M6, vectorized
    normalize M2, entry+image fragments WRITTEN IN-TASK) → control rows:
        fetch_log   → checkpointed parquet (M10 metrics/lineage)
        efrag/ifrag → manifest commit (Lance-like append, G1+S5)
        pages       → dedup-admit against SeenSet shards (D1) → next round

Determinism contract (must equal refsim.simulate — SURVEY §7.5.1):
issue order is defined at SORT time (``depth, seed_id, priority, host,
canon_url``), results merge order-insensitively; admission of new
discoveries happens end-of-round in the same sort order. Fetch
CONCURRENCY therefore never affects ordering, seen-set membership or
outputs — the property the reference only accidentally had (§1.4).

Scale design notes (10^10-frontier):
* The frontier is a host-hash-partitioned table; per-round driver state
  is only the BUDGETED slice (≤ hosts × budget rows — control plane, no
  payloads). The deferred frontier is checkpointed parquet per round.
* Image bytes NEVER pass through the driver: ImageFetchWrite writes
  fragments from inside tasks and returns only manifest metadata.
* The seen set is K actor shards (bloom+cuckoo+exact); admission routes
  url-digest→shard with one batched call per shard per round.
* Sort+budget are done with polars on the driver at sandbox scale and
  are expressed so they can move to ``ds.sort`` + ``groupby(host)``
  when the per-round slice outgrows one machine (keys documented in
  SURVEY §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .. import canon
from ..refsim import CrawlSpec
from ..stages.fetch import (
    STATUS_ROBOTS_BLOCKED,
    FetchParse,
    make_fetch_parse_fn,
)
from ..state.catalog import CatalogStore
from ..state.checkpoint import RunCheckpoint
from ..state.lancelike import TableStore
from ..state.seenset import SeenSet
from ..synthweb import PROFILES, SynthWeb, WebConfig

SORT_KEYS = ["depth", "seed_id", "priority", "host", "canon_url"]

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int64()),
        ("depth", pa.int32()),
        ("seed_id", pa.int32()),
        ("schema_name", pa.string()),
        ("schema_version", pa.string()),
        ("domain", pa.string()),
        ("round_added", pa.int32()),
    ]
)


@dataclass
class CrawlResult:
    out_dir: str
    order: list[str] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    rounds: int = 0
    entries_store: TableStore | None = None
    images_store: TableStore | None = None
    fetch_log_store: TableStore | None = None
    catalog: CatalogStore | None = None
    # WARC archive index (state/warcstore) — set when run_crawl was
    # given archive_root; shards live next to it under <root>/shards
    archive_store: TableStore | None = None
    archive_root: str | None = None
    # cumulative per-phase driver wall time (seconds) — the scaling
    # bottleneck ledger; phases other than "fetch_exec" are serial
    phase_sec: dict = field(default_factory=dict)

    def entries_table(self) -> pa.Table:
        return self.entries_store.read_table()

    def images_table(self) -> pa.Table:
        return self.images_store.read_table()

    def fetch_log_table(self) -> pa.Table:
        return self.fetch_log_store.read_table()


def _seed_frontier(web: SynthWeb) -> pl.DataFrame:
    rows = []
    for s in web.seeds():
        cu = canon.canonicalize_url_one(s["url"])
        rows.append(
            {
                "url": s["url"],
                "canon_url": cu,
                "host": canon.host_of_one(s["url"]),
                "priority": 0,
                "depth": 0,
                "seed_id": s["seed_id"],
                "schema_name": s["schema_name"],
                "schema_version": s["schema_version"],
                "domain": s["domain"],
                "round_added": 0,
            }
        )
    return pl.from_arrow(pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA))


def _sort(df: pl.DataFrame) -> pl.DataFrame:
    return df.sort(SORT_KEYS + ["url"])


def _split_budget(
    df: pl.DataFrame, budget: int, host_used: "dict[str, int] | None" = None,
    cap: "int | None" = None,
) -> tuple[pl.DataFrame, pl.DataFrame]:
    """Per-host top-k in sort order (the politeness budget, P2 analog).

    ``cap`` (with the all-run ``host_used`` counters): the trap guard —
    per host, ranks ≤ min(budget, cap - used) issue, ranks ≤ cap - used
    defer, the rest are DROPPED (a calendar/session-id URL trap would
    otherwise grow the frontier forever). Shared refsim contract."""
    df = _sort(df).with_columns(pl.col("host").cum_count().over("host").alias("_rk"))
    if cap is None:
        issued = df.filter(pl.col("_rk") <= budget).drop("_rk")
        deferred = df.filter(pl.col("_rk") > budget).drop("_rk")
        return issued, deferred
    used = host_used or {}
    if used:
        # order-preserving map (a join could reorder the contract sort)
        df = df.with_columns(
            pl.col("host")
            .replace_strict(used, default=0, return_dtype=pl.Int64)
            .alias("_used")
        )
    else:
        df = df.with_columns(pl.lit(0, dtype=pl.Int64).alias("_used"))
    rem = pl.lit(cap) - pl.col("_used")
    issued = df.filter(
        (pl.col("_rk") <= budget) & (pl.col("_rk") <= rem)
    ).drop(["_rk", "_used"])
    deferred = df.filter(
        (pl.col("_rk") > budget) & (pl.col("_rk") <= rem)
    ).drop(["_rk", "_used"])
    return issued, deferred


def seeds_from_sitemaps(web: SynthWeb | WebConfig | str = "t2") -> list[dict]:
    """Seed DISCOVERY from the web itself: fetch every host's
    /sitemap.xml in a distributed ``map_batches`` pass, parse the
    ``<loc>`` URLs, and rebuild the seed table (seed_id = the listing's
    category; domain/schema follow the same config formula as the
    static list). Returns the same ordered seed dicts as
    ``SynthWeb.seeds()`` — pinned by test — so a crawl can bootstrap
    with zero configured URLs. Driver holds only the O(config) seed
    list; sitemap bytes stay in the tasks."""
    from urllib.parse import parse_qs, urlsplit

    from ..stages.parsers import parse_sitemap

    w = web if isinstance(web, SynthWeb) else SynthWeb(web)
    cfg_key = w.cfg

    def fetch_parse(t: pa.Table) -> pa.Table:
        from ..stages.politeness import parse_robots_sitemaps

        sw = SynthWeb(cfg_key)
        urls: list[str] = []

        def _get(u: str):
            for attempt in range(1, 6):  # T3 retry parity (≤5 attempts)
                res = sw.fetch(u, attempt=attempt)
                if res.status == 200:
                    return res
            return None

        for hidx in t["hidx"].to_pylist():
            host = sw.host(hidx)
            # robots.txt's group-independent Sitemap: directive names the
            # sitemap location (a third of synth hosts serve a
            # non-default path there); fall back to /sitemap.xml
            robots = _get(f"https://{host}/robots.txt")
            sm_urls = parse_robots_sitemaps(robots.body) if robots else []
            if not sm_urls:
                sm_urls = [f"https://{host}/sitemap.xml"]
            for sm in sm_urls:
                res = _get(sm)
                if res is not None:
                    urls.extend(parse_sitemap(res.body))
        sids = [int(parse_qs(urlsplit(u).query)["cat"][0]) for u in urls]
        return pa.table(
            {"seed_id": pa.array(sids, pa.int64()), "url": pa.array(urls, pa.string())}
        )

    hosts = rd.from_arrow(
        pa.table({"hidx": pa.array(range(cfg_key.n_hosts), pa.int64())})
    )
    rows = (
        hosts.map_batches(fetch_parse, batch_format="pyarrow")
        .sort("seed_id")
        .take_all()  # O(n_seeds) — config-sized, same as the static list
    )
    return [
        {
            "seed_id": r["seed_id"],
            "url": r["url"],
            "domain": f"domain-{r['seed_id'] % 4}",
            "schema_name": "flat" if r["seed_id"] % 2 == 0 else "office",
            "schema_version": "v0.0.3",
        }
        for r in rows
    ]


def run_crawl(
    web: SynthWeb | WebConfig | str = "t2",
    spec: CrawlSpec = CrawlSpec(),
    out_dir: str = "/tmp/crawlkit_run",
    num_seen_shards: int = 4,
    fetch_concurrency: int = 4,
    fetch_batch_size: int = 16,
    resume: bool = False,
    track_order: bool = True,
    fetch_mode: str = "tasks",
    prior_seen_dirs: "list[str] | None" = None,
    host_salt_cap: int = 1024,
    archive_root: str | None = None,
    archive_images: bool = False,
    prior_etags: "dict[str, str] | None" = None,
    prior_archive_root: str | None = None,
    archive_dedup: bool = False,
) -> CrawlResult:
    """Run the crawl to frontier exhaustion (or ``spec.max_rounds``).

    ``resume=True`` continues from the latest complete round checkpoint
    under ``out_dir`` (seen shards restored, frontier reloaded; stores
    are idempotent so a half-finished round replays without duplicates).

    ``prior_seen_dirs``: seen snapshots of a PREVIOUS run (recrawl
    cadence). The prior set is consulted READ-ONLY: depth ≤ 1 listing
    URLs are re-admitted every run (cadence re-crawl), depth-2 offers
    already fetched by a prior run are skipped — exactly
    ``refsim.simulate(prior_seen=...)``.
    """
    if not isinstance(web, SynthWeb):
        web = SynthWeb(web)
    web_cfg = web.cfg

    ckpt = RunCheckpoint(out_dir)
    seen = SeenSet(num_seen_shards)
    prior: SeenSet | None = None
    if prior_seen_dirs:
        prior = SeenSet(num_seen_shards)
        prior.restore(prior_seen_dirs)
    # conditional recrawl: broadcast the prior ETag map ONCE (ray.put →
    # one object-store copy per node, read zero-copy by every fetch task)
    prior_etags_ref = ray.put(prior_etags) if prior_etags else None
    # prior-generation CDX index (304 body reuse + archive dedup): built
    # ONCE on the driver as sorted numpy arrays and broadcast — workers
    # map the plasma pages zero-copy instead of re-reading thousands of
    # index fragments each (measured 6.7 s/worker at bench scale)
    prior_index_ref = None
    if prior_archive_root is not None:
        from ..state.warcstore import load_prior_index

        prior_index_ref = ray.put(load_prior_index(prior_archive_root))
    res = CrawlResult(
        out_dir=out_dir,
        entries_store=TableStore(f"{out_dir}/entries"),
        images_store=TableStore(f"{out_dir}/images"),
        fetch_log_store=TableStore(f"{out_dir}/fetch_log"),
        catalog=CatalogStore(f"{out_dir}/catalog"),
        archive_store=TableStore(f"{archive_root}/index") if archive_root else None,
        archive_root=archive_root,
    )
    # schema catalog: last-wins per SchemaKey across runs (S4/G3 analog)
    from ..stages import parsers as _parsers

    regs = []
    seen_keys = set()
    for s in web.seeds():
        k = (s["schema_name"], s["schema_version"], s["domain"])
        if k in seen_keys:
            continue
        seen_keys.add(k)
        spec_p = _parsers.get_parser(s["schema_name"])
        regs.append(
            {
                "schema_name": s["schema_name"],
                "schema_version": s["schema_version"],
                "domain": s["domain"],
                "fields": spec_p.fields,
            }
        )
    res.catalog.register_run(regs, spec.run_ts)

    start_round = 0
    host_issued_total: dict[str, int] = {}  # all-run issue slots (trap cap)
    if resume and (last := ckpt.latest_complete_round()) is not None:
        seen.restore([ckpt.seen_dir(r) for r in range(last + 1)])
        frontier = pl.from_arrow(ckpt.load_frontier(last))
        start_round = last + 1
        if track_order:
            for m in ckpt.all_metrics():
                res.order.extend(m.get("order", []))
                res.seen.update(m.get("admitted", []))
        if spec.max_pages_per_host is not None:
            for m in ckpt.all_metrics():
                for row in m.get("per_host", []):
                    h = row["host"]
                    host_issued_total[h] = host_issued_total.get(h, 0) + row["issued"]
    seed_admitted: list[str] = []
    if start_round == 0:
        frontier = _seed_frontier(web)
        mask = seen.check_and_add_urls(frontier["canon_url"].to_list())
        frontier = frontier.filter(pl.Series(mask))
        seed_admitted = frontier["canon_url"].to_list()
        if track_order:
            res.seen.update(seed_admitted)

    import threading
    import time as _time

    def _tick(name: str, t0: float) -> float:
        t1 = _time.perf_counter()
        res.phase_sec[name] = res.phase_sec.get(name, 0.0) + (t1 - t0)
        return t1

    # In no-track mode, raw fetch-log rows never reach the driver: tasks
    # write log fragments themselves and emit per-host stat rows. The
    # driver's commit/checkpoint tail then runs in a BACKGROUND thread,
    # overlapped with the next round's fetch — only the seen-set
    # snapshot stays on the critical path (it must precede the next
    # round's admission). Threads are chained (join before spawn) so
    # manifest commits and _COMPLETE markers stay strictly ordered.
    in_task_logs = not track_order
    commit_thread: threading.Thread | None = None
    commit_err: list[BaseException] = []

    def _join_commit() -> None:
        nonlocal commit_thread
        if commit_thread is not None:
            commit_thread.join()
            commit_thread = None
            if commit_err:
                raise commit_err[0]

    for rnd in range(start_round, spec.max_rounds):
        if frontier.height == 0:
            break
        _t = _time.perf_counter()
        issued, deferred = _split_budget(
            frontier, spec.host_budget_per_round,
            host_used=host_issued_total, cap=spec.max_pages_per_host,
        )
        if spec.max_pages_per_host is not None and issued.height:
            for h, c in (
                issued.group_by("host").len().iter_rows()
            ):
                host_issued_total[h] = host_issued_total.get(h, 0) + c
        _t = _tick("sort_budget", _t)

        # combine_chunks: the frontier is built by polars concat/filter
        # chains → thousands of tiny chunks; take()/append on chunked
        # tables is O(chunks)-slow (measured ~60 s/round at 800k rows)
        issued_t = issued.to_arrow().cast(FRONTIER_SCHEMA).combine_chunks()
        issued_t = issued_t.append_column("round", pa.array([rnd] * issued_t.num_rows, pa.int32()))
        issued_t = issued_t.append_column(
            "created", pa.array([spec.run_ts] * issued_t.num_rows, pa.string())
        )

        # Partition the round's frontier into input blocks BY HOST-HASH:
        # all of one host's URLs land in ONE task per round, so fetches
        # to a host are strictly sequential (real per-host politeness —
        # an in-task token bucket is then exact, not best-effort) and the
        # fetch stage still fans out across hosts. ~2 tasks per slot:
        # Ray Data pays ~0.1-0.2s per task at this scale (measured:
        # 32 blocks → 6.9k img/s vs 192 blocks → 4.2k), so coarse wins;
        # batch_size still bounds the per-call batch (fragment size).
        n = issued_t.num_rows
        nblocks = max(1, min((n + fetch_batch_size - 1) // fetch_batch_size, fetch_concurrency * 2))
        if nblocks == 1:
            slices = [issued_t]
        else:
            from ..hashing import hash64_np

            hosts_np = issued_t["host"].to_numpy(zero_copy_only=False)
            uniq, inverse = np.unique(hosts_np, return_inverse=True)
            uniq_h = hash64_np(uniq, salt="hostroute").astype(np.uint64)
            hh64 = uniq_h[inverse]
            if host_salt_cap and len(issued_t):
                # HOT-HOST SALTING (SURVEY §4 skew row): a mega-host with
                # more than host_salt_cap rows this round is split into
                # sub-shards routed to different tasks, so one host can't
                # serialize a whole round while other slots idle. Rows
                # within a sub-shard keep issue-sort order; the strict
                # one-task-per-host politeness guarantee relaxes to
                # per-sub-shard for hosts above the cap (an in-task token
                # bucket should then use rate/num_subshards per host).
                counts = np.bincount(inverse)
                o = np.argsort(inverse, kind="stable")
                starts = np.zeros(len(uniq) + 1, dtype=np.int64)
                starts[1:] = np.cumsum(counts)
                occ = np.empty(len(inverse), dtype=np.int64)
                occ[o] = np.arange(len(inverse)) - np.repeat(starts[:-1], counts)
                with np.errstate(over="ignore"):
                    hh64 = hh64 + (occ // host_salt_cap).astype(np.uint64) * np.uint64(
                        0x9E3779B97F4A7C15
                    )
            hh = (hh64 % np.uint64(nblocks)).astype(np.int64)
            order_ix = np.argsort(hh, kind="stable")
            bounds = np.searchsorted(hh[order_ix], np.arange(nblocks + 1))
            from .. import owned_table

            reordered = issued_t.take(pa.array(order_ix))
            # owned_table: a bare .slice pickles its WHOLE parent per
            # block (55× put amplification — was the entire slice_route
            # phase, 2.2 s/bench-run in from_arrow)
            slices = [
                owned_table(reordered.slice(bounds[b], bounds[b + 1] - bounds[b]))
                for b in range(nblocks)
                if bounds[b + 1] > bounds[b]
            ]
        # FUSED fetch stage: extract + normalize + fragment-write happen
        # inside the task; the union output contains ONLY control rows
        # (log, page) and fragment metadata (efrag, ifrag) — one dataset
        # execution per round, zero payload bytes on the driver.
        from .. import dataset_from_tables

        in_ds = dataset_from_tables(slices)
        fused_kwargs = {
            "web_config": web_cfg,
            "obey_robots": spec.obey_robots,
            "max_depth": spec.max_depth,
            "entries_root": f"{out_dir}/entries",
            "images_root": f"{out_dir}/images",
            "fetch_images": spec.fetch_images,
            "logs_root": f"{out_dir}/fetch_log" if in_task_logs else None,
            "archive_root": archive_root,
            "archive_images": archive_images,
            "prior_etags_ref": prior_etags_ref,
            "prior_archive_root": prior_archive_root,
            "archive_dedup": archive_dedup,
            "prior_index_ref": prior_index_ref,
        }
        if fetch_mode == "actors":
            union_ds = in_ds.map_batches(
                FetchParse,
                fn_constructor_kwargs=fused_kwargs,
                batch_format="pyarrow",
                batch_size=fetch_batch_size,
                concurrency=fetch_concurrency,
            )
        else:  # worker-cached tasks: same per-worker init amortization,
            # no per-round actor-pool startup (see stages/fetch.py)
            union_ds = in_ds.map_batches(
                make_fetch_parse_fn(**fused_kwargs),
                batch_format="pyarrow",
                batch_size=fetch_batch_size,
            )
        _t = _tick("slice_route", _t)
        control_t = pa.concat_tables(
            [ray.get(ref) for ref in union_ds.materialize().to_arrow_refs()],
            promote_options="default",
        ).combine_chunks()
        _t = _tick("fetch_exec", _t)
        pages = control_t.filter(pc.equal(control_t["kind"], "page"))
        _join_commit()  # round r-1's tail must finish before new commits

        def _frag_metas(kind: str) -> list[dict]:
            from ..state.lancelike import decode_frag_stats

            f = control_t.filter(pc.equal(control_t["kind"], kind))
            return [
                {"key": k, "rows": r, "path": p} | decode_frag_stats(s)
                for k, r, p, s in zip(
                    f["frag_key"].to_pylist(), f["frag_rows"].to_pylist(),
                    f["frag_path"].to_pylist(), f["frag_stats"].to_pylist(),
                )
            ]

        log_t = None
        lmetas: list[dict] | None = None
        if in_task_logs:
            # per-host lineage from the tiny hstat rows; raw log rows
            # were fragment-written inside the fetch tasks
            hs = pl.from_arrow(
                control_t.filter(pc.equal(control_t["kind"], "hstat")).select(
                    ["host", "n_issued", "n_ok", "n_failed", "n_blocked", "nbytes"]
                )
            )
            by_host = (
                hs.group_by("host")
                .agg(
                    pl.col("n_issued").sum().alias("issued"),
                    pl.col("n_ok").sum().alias("ok"),
                    pl.col("n_failed").sum().alias("failed"),
                    pl.col("n_blocked").sum().alias("blocked"),
                    pl.col("nbytes").sum().alias("bytes"),
                )
                .to_dicts()
            )
            blocked_total = int(hs["n_blocked"].sum()) if hs.height else 0
            n_fetched = issued.height - blocked_total
            round_order: list[str] = []
            lmetas = _frag_metas("lfrag")
        else:
            logs = control_t.filter(pc.equal(control_t["kind"], "log"))
            # fetch log + issue order (derived from the deterministic
            # sort, never from completion order)
            log_t = logs.select(
                ["canon_url", "host", "status", "attempts", "redirects", "etag",
                 "error", "nbytes"]
            ).append_column("round", pa.array([rnd] * logs.num_rows, pa.int32()))
            blocked = set(
                logs.filter(pc.equal(logs["status"], STATUS_ROBOTS_BLOCKED))[
                    "canon_url"
                ].to_pylist()
            )
            round_order = [cu for cu in issued["canon_url"].to_list() if cu not in blocked]
            if track_order:
                res.order.extend(round_order)
            by_host = (
                pl.from_arrow(log_t)
                .group_by("host")
                .agg(
                    pl.len().alias("issued"),
                    pl.col("status").is_in([200, 304]).sum().alias("ok"),
                    (pl.col("status") == -1).sum().alias("failed"),
                    (pl.col("status") == STATUS_ROBOTS_BLOCKED).sum().alias("blocked"),
                    pl.col("nbytes").sum().alias("bytes"),
                )
                .to_dicts()
            )
            n_fetched = len(round_order)

        emetas = _frag_metas("efrag")
        n_entries = sum(m["rows"] for m in emetas)
        imetas = _frag_metas("ifrag")
        n_images = sum(m["rows"] for m in imetas)
        ametas = _frag_metas("afrag") if archive_root else []
        _t = _tick("log_commit", _t)

        # redirect chains FIRST (matching refsim, which marks the final
        # url seen during the fetch loop, and dist mode, which inserts
        # in-task before resolve): the FINAL url of every followed chain enters
        # the seen set (never the frontier) — an independent discovery
        # of the page's new home is content we already hold. Disjoint
        # path namespace from page discoveries, so ordering vs the page
        # admission above cannot matter (shared refsim contract).
        red = control_t.filter(pc.equal(control_t["kind"], "redirect"))
        if red.num_rows:
            rd_ = np.stack(
                [
                    red["digest_hi"].to_numpy(zero_copy_only=False),
                    red["digest_lo"].to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ).astype(np.uint64)
            rmask = seen.check_and_add_digests(rd_)
            radmitted = [
                cu for cu, m in zip(red["canon_url"].to_pylist(), rmask) if m
            ]
            admitted_canon.extend(radmitted)
            if track_order:
                res.seen.update(radmitted)
        # --- discoveries → dedup-admit in sort order (shared contract).
        # canon_url/host were computed IN the fetch tasks (parallel), the
        # driver only sorts + routes the dedup-admit. ------------------
        admitted_canon: list[str] = []
        if pages.num_rows:
            cand = pl.from_arrow(
                pages.select(
                    [
                        "url", "canon_url", "host", "priority", "depth",
                        "seed_id", "schema_name", "schema_version", "domain",
                        "digest_hi", "digest_lo",
                    ]
                )
            )
            cand = cand.with_columns(pl.lit(rnd + 1).cast(pl.Int32).alias("round_added"))
            cand = _sort(cand)
            d = np.stack(
                [cand["digest_hi"].to_numpy(), cand["digest_lo"].to_numpy()], axis=1
            ).astype(np.uint64)
            mask = seen.check_and_add_digests(d)
            admit = mask
            if prior is not None:
                # recrawl: first-seen-this-run rows still enter THIS
                # run's seen set (mask), but offers the prior run
                # fetched are not re-admitted to the frontier
                depth2 = cand["depth"].to_numpy() >= 2
                admit = mask & ~(depth2 & prior.contains_digests(d))
            fresh = cand.filter(pl.Series(admit)).select(frontier.columns)
            # "admitted" below means admitted TO THE SEEN SET (mask) —
            # that is what res.seen/resume reconstruction needs; the
            # frontier gets only the recrawl-filtered subset (admit)
            admitted_canon = cand.filter(pl.Series(mask))["canon_url"].to_list()
            if track_order:
                res.seen.update(admitted_canon)
            # rechunk: concat/filter chains fragment the frame into
            # thousands of chunks; every downstream sort/to_arrow pays
            # O(chunks) unless flattened once here
            frontier = pl.concat([deferred, fresh], how="vertical_relaxed").rechunk()
        else:
            frontier = deferred.rechunk()
        _t = _tick("dedup_admit", _t)

        # --- per-partition lineage + metrics, checkpoint commit --------
        metrics = {
            "round": rnd,
            "issued": issued.height,
            "fetched": n_fetched,
            "entries": n_entries,
            "images": n_images,
            "per_host": by_host,
            "nblocks": len(slices),
        }
        if track_order:
            # full per-round order/admitted lists (needed to reconstruct
            # CrawlResult.order/seen on resume); at bench/production
            # scale this is off — order is implicit in fetch_log(round)
            # + the deterministic sort, and seen lives in the shards
            metrics["admitted"] = seed_admitted + admitted_canon
            metrics["order"] = round_order
        # seen snapshot stays ON the critical path: it must capture this
        # round's admissions before the next round adds its own pendings
        seen.snapshot(ckpt.seen_dir(rnd))
        front_t = frontier.to_arrow().cast(FRONTIER_SCHEMA)

        def _commit_round(
            rnd=rnd, log_t=log_t, lmetas=lmetas, emetas=emetas,
            imetas=imetas, ametas=ametas, front_t=front_t, metrics=metrics,
        ):
            try:
                if lmetas is not None:
                    res.fetch_log_store.commit_fragments(lmetas)
                else:
                    res.fetch_log_store.append(log_t, key=f"log-r{rnd:04d}")
                res.entries_store.commit_fragments(emetas)
                res.images_store.commit_fragments(imetas)
                if ametas:
                    res.archive_store.commit_fragments(ametas)
                ckpt.save_round(rnd, front_t, None, metrics)  # seen already snapshot
            except BaseException as e:  # surfaced at the next join
                commit_err.append(e)

        commit_thread = threading.Thread(target=_commit_round, daemon=True)
        commit_thread.start()
        _tick("checkpoint", _t)
        seed_admitted = []  # recorded once (in the first round's metrics)
        res.rounds = rnd + 1

    _join_commit()
    return res


def recrawl(
    web: SynthWeb | WebConfig | str,
    prior_dir: str,
    out_dir: str,
    spec: CrawlSpec = CrawlSpec(),
    **kwargs,
) -> CrawlResult:
    """Cadence re-run (the S2/P1 cron analog, ``stack.yml:16,46,76,104``):
    re-seed a NEW run of a (possibly grown) web against the seen set
    persisted by the run under ``prior_dir``. Listings (depth ≤ 1) are
    re-crawled every tick; offers already fetched by the prior run are
    skipped (cross-run D1 semantics, ``commons/Entry.go:37``). Entry/
    image stores may be shared with the prior run — fragment commits are
    idempotent, so appends across runs never duplicate fragments."""
    dirs = RunCheckpoint(prior_dir).seen_dirs()
    if not dirs:
        raise ValueError(f"no completed rounds under {prior_dir}")
    return run_crawl(web, spec=spec, out_dir=out_dir, prior_seen_dirs=dirs, **kwargs)


def recrawl_conditional(
    web: SynthWeb | WebConfig | str,
    prior_dir: str,
    prior_archive_root: str,
    out_dir: str,
    spec: CrawlSpec = CrawlSpec(),
    **kwargs,
) -> CrawlResult:
    """Bandwidth-aware cadence re-run: conditional GETs (If-None-Match
    with the prior generation's ETags) + archive-backed body reuse.

    Unchanged pages answer **304 Not Modified** — zero body bytes move;
    their content is range-read from the prior generation's WARC archive
    (CDX lookup inside the fetch task), so link discovery and
    re-extraction still run at full fidelity. Changed/new pages fetch
    normally. This is the Cho & Garcia-Molina freshness economics the
    ``change_rate``/``recrawl_schedule`` queries plan for, applied at
    the fetch layer; the reference re-downloads everything every cron
    tick (colly has no cache, ``flat_crawler/handler.go:92``).

    The ETag map is built from the prior run's fetch log (status-200
    rows), restricted to urls present in the prior archive index (a 304
    without an archived copy would have nothing to re-parse — the fetch
    stage additionally falls back to an unconditional refetch). In the
    sandbox the map is a ``ray.put`` broadcast; at 10^10-URL scale it
    becomes an ``etag`` column carried by the frontier rows (a keyed
    join at admission), same semantics.
    """
    dirs = RunCheckpoint(prior_dir).seen_dirs()
    if not dirs:
        raise ValueError(f"no completed rounds under {prior_dir}")
    etags = build_etag_map(prior_dir, prior_archive_root)
    return run_crawl(
        web, spec=spec, out_dir=out_dir, prior_seen_dirs=dirs,
        prior_etags=etags, prior_archive_root=prior_archive_root, **kwargs
    )


def build_etag_map(
    prior_dir: str, prior_archive_root: "str | list[str]"
) -> dict:
    """ETags the prior generation proved current, restricted to urls
    whose bodies some prior archive generation holds (a 304 needs an
    archived copy to re-parse; urls outside the map fetch
    unconditionally).

    * status 304 rows count too — their etag is still valid, so
      conditional recrawls CHAIN across generations (gen-3 keeps the
      bandwidth saving even though gen-2 archived only revisit records);
      pass the full archive chain newest-first for the body lookup.
    * a url that redirected in the prior run is archived under its
      FINAL url; reachability follows the archived 301 chain, so
      moved-but-unchanged pages also ride the 304 path.

    The archived-set fold is DERIVED from
    :func:`warcstore.load_prior_index` — the one canonical
    newest-first/first-wins CDX fold this map, the fetch stage's 304
    path and the archive-dedup path all share (a url's bytes are held
    iff its indexed digest resolves to a content record somewhere in
    the chain). Pre-record_type / pre-digest archives are tolerated by
    the canonical fold itself (warcstore.py).
    """
    from .. import canon as _canon
    from ..state.lancelike import TableStore as _TS
    from ..state.warcstore import load_prior_index, sorted_member_mask

    roots = (
        [prior_archive_root]
        if isinstance(prior_archive_root, str)
        else list(prior_archive_root)
    )
    log_t = _TS(f"{prior_dir}/fetch_log").read_table(
        columns=["canon_url", "status", "etag"]
    )
    if "canon_url" not in log_t.column_names:
        return {}
    prior = load_prior_index(roots)
    # archived = canon urls whose indexed digest (response AND revisit
    # rows, first-wins newest-first) resolves to a content record in
    # some generation — both arrays are np.unique-sorted
    has_body = sorted_member_mask(prior["body_digests"], prior["url_digests"])
    archived: set[str] = {
        k.decode() for k in prior["url_keys"][has_body]
    }
    redir: dict[str, str] = {}  # archived 301 chain: canon(src) → canon(loc)
    # 301 locations live in the records, not the index — load them only
    # when some log row redirected (rare path, small slice via the index
    # status predicate)
    def _reachable(cu: str) -> bool:
        for _ in range(12):
            if cu in archived:
                return True
            nxt = redir.get(cu)
            if nxt is None:
                return False
            cu = nxt
        return False

    need_redirects = False
    rows = list(
        zip(
            log_t["canon_url"].to_pylist(),
            log_t["status"].to_pylist(),
            log_t["etag"].to_pylist(),
        )
    )
    candidates = [(cu, et) for cu, st, et in rows if st in (200, 304) and et]
    if any(cu not in archived for cu, _ in candidates):
        need_redirects = True
    if need_redirects:
        from ..state.warcstore import read_warc

        for root in roots:
            try:
                recs = read_warc(
                    root,
                    index_filter=lambda ds: ds.filter(expr="status == 301"),
                )
                for b in recs.iter_batches(batch_format="pyarrow"):
                    for u, loc in zip(b["url"].to_pylist(), b["location"].to_pylist()):
                        if loc:
                            redir.setdefault(
                                _canon.canonicalize_url_one(u),
                                _canon.canonicalize_url_one(loc),
                            )
            except Exception:
                continue  # no 301s archived in this root
    return {cu: et for cu, et in candidates if _reachable(cu)}


def fetch_report(fetch_log_store) -> "pd.DataFrame":
    """Per-(host, status) crawl telemetry rollup over the fetch_log
    table (M10 — commons/Entry.go:42-59's PrepareResult, aggregated the
    way an operator actually consumes it): pages, total bytes, total
    attempts, error count. Reads the store as a streaming Dataset and
    partial-aggregates per batch — the shuffle carries ≤
    |hosts|×|statuses| rows per block, never the log itself (at 10^10
    URLs the fetch log is itself a big-data table)."""
    import pandas as pd

    ds = fetch_log_store.read_dataset()

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "host": t["host"],
                "status": pc.cast(t["status"], pa.int64()),
                "nbytes": t["nbytes"],
                "attempts": pc.cast(t["attempts"], pa.int64()),
                "is_err": pc.cast(pc.not_equal(t["error"], ""), pa.int64()),
            }
        ).to_pandas()
        g = df.groupby(["host", "status"], as_index=False).agg(
            pages=("nbytes", "size"), total_bytes=("nbytes", "sum"),
            total_attempts=("attempts", "sum"), n_errors=("is_err", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    from .dedup import pandas_with_schema

    cols = {"host": "object", "status": "int64", "pages": "int64",
            "total_bytes": "int64", "total_attempts": "int64", "n_errors": "int64"}
    df = pandas_with_schema(ds.map_batches(partial, batch_format="pyarrow"), cols)
    out = (
        df.groupby(["host", "status"], as_index=False)
        .agg(pages=("pages", "sum"), total_bytes=("total_bytes", "sum"),
             total_attempts=("total_attempts", "sum"), n_errors=("n_errors", "sum"))
        .sort_values(["host", "status"])
        .reset_index(drop=True)
    )
    return out.astype(cols)
