"""Fetch + extract actor stages (the S1/M1/M4/T3 analog, Ray-Data-first).

``FetchParse`` is a callable CLASS for ``Dataset.map_batches(...,
concurrency=N)``: per-actor state (the fetch session — here the
deterministic :class:`~crawlkit.synthweb.SynthWeb`; outside the sandbox
an HTTP session — plus robots cache and token buckets) is built once in
``__init__`` (the reference's memoized-client pattern T1,
``storage/handler.go:19,71-76``), work happens per Arrow batch in
``__call__``.

Per-URL semantics mirrored from the reference:
* ≤5 fetch attempts then per-item hard failure (T3,
  ``otodom/commons/extensions.go:25-47`` — ours marks the row failed in
  the fetch log instead of panicking the worker).
* extraction per registered parser (M1/M4), digit-concat normalization
  (M2) applied VECTORIZED per batch, ``.html``-strip link (M3).
* failed fetches yield zero entry rows and a log row; downstream filters
  are the F1/F2 analog.

The stage emits a UNION table (``kind`` ∈ log|page|entry|image_ref) so
one streaming pass produces fetch-log, frontier candidates, extracted
entries and image references without re-fetching. The round driver
splits by ``kind`` (cheap Arrow filters on the bounded per-round batch).
"""

from __future__ import annotations

import time
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import canon
from ..hashing import stable_hash_bytes
from ..synthweb import SynthWeb, WebConfig
from . import parsers
from .politeness import HostBuckets, RobotsCache

RETRY_ATTEMPTS = 5  # otodom/flat_crawler/handler.go:53
# colly rides Go's http.Client, which silently follows up to 10
# redirects (flat_crawler/handler.go:92 uses the default collector) —
# ours follows the same cap but logs the hop count and marks the FINAL
# url seen so an independently-discovered target is never refetched.
MAX_REDIRECTS = 10


def _digest_pair(canon_url: str) -> tuple[int, int]:
    """128-bit url digest as two uint64s — computed IN the fetch task so
    the driver's dedup-admit routing does no per-url hashing."""
    import hashlib

    d = hashlib.blake2b(canon_url.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")
STATUS_ROBOTS_BLOCKED = -2
STATUS_EXHAUSTED = -1
STATUS_TIMEOUT = -3
STATUS_TOO_MANY_REDIRECTS = -4

UNION_FIELDS: list[tuple[str, pa.DataType]] = [
    ("kind", pa.string()),
    ("canon_url", pa.string()),
    ("host", pa.string()),
    ("status", pa.int32()),
    ("attempts", pa.int32()),
    ("redirects", pa.int32()),
    ("etag", pa.string()),
    ("error", pa.string()),
    ("nbytes", pa.int64()),
    ("url", pa.string()),
    ("priority", pa.int64()),
    ("depth", pa.int32()),
    ("seed_id", pa.int32()),
    ("schema_name", pa.string()),
    ("schema_version", pa.string()),
    ("domain", pa.string()),
    ("created", pa.string()),
    ("title", pa.string()),
    ("name", pa.string()),
    ("region", pa.string()),
    ("rooms_raw", pa.string()),
    ("price_raw", pa.string()),
    ("total_price_raw", pa.string()),
    ("area_raw", pa.string()),
    ("link", pa.string()),
    ("image_id", pa.string()),
    ("caption", pa.string()),
    ("frag_key", pa.string()),
    ("frag_rows", pa.int64()),
    ("frag_path", pa.string()),
    ("frag_stats", pa.string()),  # JSON per-column [lo,hi] manifest stats
    ("digest_hi", pa.uint64()),
    ("digest_lo", pa.uint64()),
    # per-host stat rows (kind=hstat, fused no-track mode): the driver
    # aggregates these instead of touching raw log rows
    ("n_issued", pa.int64()),
    ("n_ok", pa.int64()),
    ("n_failed", pa.int64()),
    ("n_blocked", pa.int64()),
]
UNION_SCHEMA = pa.schema(UNION_FIELDS)
_COLS = [f[0] for f in UNION_FIELDS]

# Fully-fused mode (entries+images+logs all written in-task) emits only
# page/frag-meta/hstat control rows — the entry/image payload columns
# are dead weight on the control stream (driver filters every column of
# every control row once per round), so they are dropped entirely.
_SLIM_SET = {
    "kind", "canon_url", "host", "nbytes", "url", "priority", "depth",
    "seed_id", "schema_name", "schema_version", "domain", "created",
    "frag_key", "frag_rows", "frag_path", "frag_stats", "digest_hi", "digest_lo",
    "n_issued", "n_ok", "n_failed", "n_blocked",
}
SLIM_UNION_SCHEMA = pa.schema([(n, t) for n, t in UNION_FIELDS if n in _SLIM_SET])


def _rows_to_table(rows: list[dict], schema: pa.Schema = UNION_SCHEMA) -> pa.Table:
    arrays = {c: [r.get(c) for r in rows] for c in schema.names}
    return pa.Table.from_pydict(arrays, schema=schema)


# manifest-stat allowlists: bounds ride EVERY fragment control row and
# manifest delta, so only the columns consumers prune on are recorded
# (etag/error/price-text bounds were ~1 KB/fragment of pure weight —
# 531 MB of control rows in one 16M round before the allowlist)
_ENTRY_STATS_COLS = ["canon_url", "schema_name", "created"]
_IMAGE_STATS_COLS = ["image_id"]
_LOG_STATS_COLS = ["canon_url", "host", "status", "round"]


def _frag_row(kind: str, meta: dict) -> dict:
    """Fragment-metadata control row; manifest stats ride as JSON so the
    driver's commit records them (pruned reads — lancelike.pruned_paths)."""
    import json

    row = {"kind": kind, "frag_key": meta["key"], "frag_rows": meta["rows"],
           "frag_path": meta["path"]}
    if meta.get("stats"):
        row["frag_stats"] = json.dumps(meta["stats"], separators=(",", ":"))
    return row


class FetchParse:
    """Actor-pool fetch+extract stage over frontier batches.

    Input batch columns: url, canon_url, host, priority, depth, seed_id,
    schema_name, schema_version, domain, round (int32), created (string).
    """

    def __init__(
        self,
        web_config: WebConfig | str = "t2",
        obey_robots: bool = True,
        rate_per_host: float | None = None,
        max_depth: int = 2,
        entries_root: str | None = None,
        images_root: str | None = None,
        fetch_timeout_s: float | None = None,
        fetch_images: bool = True,
        logs_root: str | None = None,
        archive_root: str | None = None,
        archive_images: bool = False,
        prior_etags_ref=None,
        prior_archive_root: str | None = None,
        archive_dedup: bool = False,
        prior_index_ref=None,
        fetcher=None,
    ):
        """``entries_root``/``images_root``: when given, the stage is
        FUSED — extracted entries are normalized and written as
        Lance-like fragments and offer images fetched+encoded+written
        FROM THIS TASK, emitting only efrag/ifrag metadata rows. One
        dataset execution per crawl round, zero payload bytes on the
        driver. When None, raw entry/image_ref rows are emitted (used
        by unit tests and ad-hoc pipelines)."""
        from ..state.lancelike import TableStore

        self.web = SynthWeb(web_config)
        # Transport seam: anything with the Fetcher contract
        # (fetch(url, attempt, if_none_match) -> FetchResult; see
        # stages/httpfetch.py and tests/test_fetcher_conformance.py).
        # Default is the synthetic web itself; a real deployment passes
        # HttpFetcher (or any client that passes the conformance suite)
        # while parsing/politeness/retry semantics stay engine-owned.
        self._fetcher = fetcher
        self.obey_robots = obey_robots
        self.robots = RobotsCache(self._fetch_robots)
        self.buckets = HostBuckets(rate_per_host) if rate_per_host else None
        self.max_depth = max_depth
        self.entries_store = TableStore(entries_root) if entries_root else None
        self.images_store = TableStore(images_root) if images_root else None
        # fused no-track mode: raw log rows are fragment-written IN-TASK
        # and replaced by per-host stat rows — the driver never filters /
        # appends a frontier-sized log table (serial-tail killer at scale)
        self.logs_store = TableStore(logs_root) if logs_root else None
        # fused-task log batching (round-5 scale fix): when armed via
        # reset_log_buffer()/flush_logs(), per-chunk log tables buffer
        # in-instance and flush as ONE fragment per host-block task —
        # frontier64m measured 986k per-chunk log fragments (6 KB each,
        # 407 MB of manifest) without it; O(blocks·rounds) with it
        self._log_buf: "list[pa.Table] | None" = None
        self._ent_buf: "list[tuple[pa.Table, list[str]]] | None" = None
        # P3 analog (exec_timeout, stack.yml:136): per-item fetch deadline
        # spanning all retry attempts; exceeded → STATUS_TIMEOUT log row
        self.fetch_timeout_s = fetch_timeout_s
        self.fetch_images = fetch_images
        # WARC archival (ISO 28500 analogue): persist the RAW bytes this
        # task fetched as per-record-gzip shards + CDX index fragments,
        # so later pipelines re-parse without re-fetching (state/warcstore)
        if archive_root is not None:
            from ..state.warcstore import WarcWriter

            self.archiver: WarcWriter | None = WarcWriter(archive_root)
        else:
            self.archiver = None
        # Conditional recrawl (If-None-Match → 304): ``prior_etags_ref``
        # is a ray.put ObjectRef (or plain dict in unit tests) mapping
        # canon_url → the prior generation's ETag; ``prior_archive_root``
        # is that generation's WARC root — a 304's body is range-read
        # from the archive (CDX lookup, lazy-loaded once per worker)
        # instead of transferred, so unchanged pages cost ZERO body
        # bytes on the wire. At 10^10 scale the etag map becomes a
        # frontier-column join instead of a broadcast (documented in
        # pipelines/crawl.py::recrawl_conditional).
        if prior_etags_ref is not None and not isinstance(prior_etags_ref, dict):
            import ray

            self.prior_etags: dict | None = ray.get(prior_etags_ref)
        else:
            self.prior_etags = prior_etags_ref
        self.prior_archive_root = prior_archive_root
        # Broadcast prior index (warcstore.load_prior_index built ONCE on
        # the driver, ray.put): sorted numpy byte arrays — zero-copy from
        # the object store, searchsorted lookups. Without a ref the same
        # canonical builder runs once per worker (no separate dict
        # implementation to drift).
        self.prior_index_ref = prior_index_ref
        self._pi: dict | None = None  # sorted arrays (broadcast or local build)
        # Common-Crawl-style URL-AGNOSTIC dedup against the prior
        # generations' archives: a fetched 200 whose payload sha1 already
        # exists in some prior index is archived as an
        # identical-payload-digest revisit record (zero body bytes in the
        # new archive) — content that MOVED to a new url between
        # generations (the case the ETag/304 path cannot catch: the new
        # url has no prior ETag) costs no archive bytes. Extraction from
        # the new generation resolves by digest across the chain
        # (warcstore.read_warc(resolve_revisits=True)).
        self.archive_dedup = archive_dedup and (
            prior_archive_root is not None or prior_index_ref is not None
        )
        # Common-Crawl-style FULL-payload archival: also archive each
        # image payload as its own (binary) WARC record, depth=3, under
        # a deterministic https://images.test/<id>.<fmt> URL — the
        # archive then suffices to rebuild the whole input_hint images
        # table without refetching (warcstore.restore_images). Fused
        # mode only (that is where image bytes are materialized).
        self.archive_images = archive_images

    @property
    def transport(self):
        """The Fetcher in use: an explicit override, else the web
        (a property so tests/pipelines that swap ``self.web`` keep
        swapping the transport with it)."""
        return self._fetcher if self._fetcher is not None else self.web

    def _fetch_robots(self, url: str) -> str | None:
        """Robots fetch goes through the SAME ≤5-attempt retry loop as
        page fetches (a single attempt + cached fail-open allowed
        /offer/ fetches the oracle blocks whenever the robots URL hit a
        transient 503 — broke engine ≡ refsim at bench scale).
        Returns the body on 200, "" on a definitive 404 (no robots file
        → no rules, cacheable), None on transient failure (NOT cached —
        RobotsCache retries on the next URL for that host)."""
        r, _ = self._fetch_with_retry(url)
        if r.status == 200:
            return r.body
        if r.status == 404:
            return ""
        return None

    def _fetch_with_retry(self, url: str, if_none_match: str | None = None):
        deadline = (
            time.monotonic() + self.fetch_timeout_s if self.fetch_timeout_s else None
        )
        for attempt in range(1, RETRY_ATTEMPTS + 1):
            r = self.transport.fetch(url, attempt=attempt, if_none_match=if_none_match)
            if r.status in (200, 304) or (r.status == 301 and r.location):
                return r, attempt
            if deadline is not None and time.monotonic() > deadline:
                r.status = 598  # timeout sentinel; logged as STATUS_TIMEOUT
                r.error = "fetch deadline exceeded"
                return r, attempt
        return r, RETRY_ATTEMPTS

    def _fetch_following(self, url: str, if_none_match: str | None = None):
        """Fetch with redirect following: each hop gets the full
        ≤5-attempt retry budget (T3 applies per request, as Go's
        http.Client retriers would); ≤ MAX_REDIRECTS hops, then the
        599 sentinel (logged as STATUS_TOO_MANY_REDIRECTS). Returns
        ``(result, final_hop_attempts, hops, hop_records)`` where
        hop_records lists every 301 (url, location) traversed —
        archived as WARC redirect records when archiving is on.
        ``attempts`` stays the FINAL hop's count so the ≤5 T3 invariant
        holds per logged row; ``redirects`` carries the hop count."""
        hops = 0
        hop_records: list[tuple[str, str]] = []
        cur = url
        while True:
            r, attempts = self._fetch_with_retry(cur, if_none_match=if_none_match)
            if r.status != 301 or not r.location:
                return r, attempts, hops, hop_records
            hop_records.append((cur, r.location))
            hops += 1
            if hops > MAX_REDIRECTS:
                r.status = 599
                r.error = "too many redirects"
                r.location = None
                return r, attempts, hops, hop_records
            cur = r.location

    def _load_prior_index(self) -> None:
        """Lazy once-per-worker CDX load across the prior generation
        CHAIN (newest first) — delegates to the CANONICAL builder
        (``warcstore.load_prior_index``), so the driver-broadcast path
        and this per-worker fallback cannot drift: both produce the same
        sorted-array structure (url → digest over response+revisit rows,
        digest → newest-generation body location, first-wins)."""
        from ..state.warcstore import load_prior_index

        roots = (
            [self.prior_archive_root]
            if isinstance(self.prior_archive_root, str)
            else list(self.prior_archive_root)
        )
        self._pi = load_prior_index(roots)

    def _ensure_prior_index(self) -> None:
        """Attach the prior-generation CDX lookup: the broadcast arrays
        when a ``prior_index_ref`` was provided (one ray.get — zero-copy
        numpy views of the driver's single build), else the same
        structure built once per worker."""
        if self._pi is not None:
            return
        if self.prior_index_ref is not None:
            if isinstance(self.prior_index_ref, dict):  # unit-test path
                self._pi = self.prior_index_ref
            else:
                import ray

                self._pi = ray.get(self.prior_index_ref)
            return
        self._load_prior_index()

    def _prior_digest_for_url(self, canon_url: str) -> str | None:
        self._ensure_prior_index()
        keys = self._pi["url_keys"]
        if len(keys) == 0:
            return None
        q = np.bytes_(canon_url.encode())
        pos = int(np.searchsorted(keys, q))
        if pos < len(keys) and keys[pos] == q:
            return bytes(self._pi["url_digests"][pos]).decode()
        return None

    def _prior_body_loc(self, dg: str):
        """digest → (root, shard, offset, length) of the newest content
        record holding those bytes, or None."""
        self._ensure_prior_index()
        bd = self._pi["body_digests"]
        if len(bd) == 0:
            return None
        q = np.bytes_(dg.encode())
        pos = int(np.searchsorted(bd, q))
        if pos >= len(bd) or bd[pos] != q:
            return None
        return (
            self._pi["roots"][int(self._pi["body_gen"][pos])],
            self._pi["shards"][int(self._pi["body_shard_idx"][pos])],
            int(self._pi["body_offset"][pos]),
            int(self._pi["body_length"][pos]),
        )

    def _prior_has_bodies(self, digests: list[str]) -> "np.ndarray":
        """Vectorized: which payload digests exist as content records in
        the prior chain (ONE searchsorted over the batch — the
        archive-dedup hot path)."""
        self._ensure_prior_index()
        from ..state.warcstore import sorted_member_mask

        return sorted_member_mask(
            self._pi["body_digests"],
            np.array([d.encode() for d in digests], dtype="S40"),
        )

    def _archived_body(self, canon_url: str) -> str | None:
        """Range-read one archived body from the PRIOR generations' WARCs
        by digest resolution: url → digest (any record kind in any
        generation) → the newest content record holding those bytes.
        Returns None when no generation has the bytes (caller falls back
        to an unconditional refetch)."""
        if self.prior_archive_root is None and self.prior_index_ref is None:
            return None
        dg = self._prior_digest_for_url(canon_url)
        loc = self._prior_body_loc(dg) if dg else None
        if loc is None:
            return None
        import gzip

        from ..state.warcstore import parse_record

        root, shard, off, ln = loc
        with open(f"{root}/{shard}", "rb") as f:
            f.seek(off)
            raw = f.read(ln)
        return parse_record(gzip.decompress(raw))["body"].decode("utf-8")

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        arch: list[dict] = []
        dedup_cands: list[tuple[int, str]] = []  # (arch idx, payload sha1)
        n = batch.num_rows
        cols = {name: batch[name].to_pylist() for name in batch.column_names}
        for i in range(n):
            url = cols["url"][i]
            cu = cols["canon_url"][i]
            host = cols["host"][i]
            depth = cols["depth"][i]
            rnd = cols.get("round", [0] * n)[i]
            base = {
                "canon_url": cu,
                "host": host,
                "depth": depth,
                "seed_id": cols["seed_id"][i],
                "schema_name": cols["schema_name"][i],
                "schema_version": cols["schema_version"][i],
                "domain": cols["domain"][i],
                "created": cols["created"][i],
            }
            path = urlsplit(url).path
            if self.obey_robots and not self.robots.allowed(host, path):
                rows.append(
                    {**base, "kind": "log", "status": STATUS_ROBOTS_BLOCKED,
                     "attempts": 0, "redirects": 0, "error": "robots", "nbytes": 0}
                )
                continue
            if self.buckets is not None:
                # robots Crawl-delay overrides the default per-host rate
                # (pacing only — issue order/budget stay scheduler-owned,
                # so refsim parity is untouched)
                delay = self.robots.delay_for(host) if self.obey_robots else None
                rate_override = (1.0 / delay) if delay else None
                b = self.buckets.bucket(host, rate_override)
                wait = b.wait_time(time.monotonic())
                if wait > 0:
                    time.sleep(wait)
                b.try_take(time.monotonic())
            et = self.prior_etags.get(cu) if self.prior_etags else None
            r, attempts, hops, hop_records = self._fetch_following(
                url, if_none_match=et
            )
            if r.status == 304:
                # unchanged (ETag matched): zero body bytes moved; the
                # content is range-read from the PRIOR generation's
                # archive so discovery/extraction still runs. Keyed by
                # the url that answered 304 (== requested url unless the
                # chain redirected — the archive stores final urls).
                # Missing archived copy (defensive) → unconditional
                # refetch.
                body = self._archived_body(canon.canonicalize_url_one(r.url))
                if body is None:
                    r, attempts, hops, hop_records = self._fetch_following(url)
                else:
                    r.body = body
            status = 200 if r.status in (200, 304) else (
                STATUS_TIMEOUT if r.status == 598 else (
                    STATUS_TOO_MANY_REDIRECTS if r.status == 599 else STATUS_EXHAUSTED
                )
            )
            rows.append(
                {**base, "kind": "log",
                 "status": 304 if r.status == 304 else status,
                 "attempts": attempts, "redirects": hops, "etag": r.etag,
                 "error": r.error or "", "nbytes": r.nbytes}
            )
            if self.archiver is not None:
                # archive every 301 hop as its own redirect record
                # (Common-Crawl does the same; Location in the HTTP block)
                for src, loc in hop_records:
                    arch.append(
                        {"url": src, "status": 301, "body": b"",
                         "location": loc,
                         "schema_name": base["schema_name"],
                         "schema_version": base["schema_version"],
                         "domain": base["domain"], "created": base["created"],
                         "depth": depth}
                    )
            if r.status not in (200, 304):
                continue
            if hops:
                # the chain's FINAL url is content we now hold: mark it
                # seen (kind=redirect control row → seen-set add, never a
                # frontier candidate) so an independent discovery of the
                # new location is not refetched (shared refsim contract)
                final_cu = canon.canonicalize_url_one(r.url)
                dh, dl = _digest_pair(final_cu)
                rows.append({**base, "kind": "redirect", "url": r.url,
                             "canon_url": final_cu,
                             "host": canon.host_of_one(r.url),
                             "digest_hi": dh, "digest_lo": dl})
            if self.archiver is not None:
                if r.status == 200:
                    body_b = r.body.encode()
                    rec = {"url": r.url, "status": 200, "body": body_b,
                           "schema_name": base["schema_name"],
                           "schema_version": base["schema_version"],
                           "domain": base["domain"], "created": base["created"],
                           "depth": depth}
                    if self.archive_dedup:
                        # URL-agnostic dedup vs the prior generations:
                        # identical bytes (typically content that MOVED
                        # url) become an identical-payload revisit —
                        # zero body bytes archived, digest continuity
                        # for delta/change_rate, resolvable by digest.
                        # Decision deferred: digests collect here and ONE
                        # vectorized membership runs per task below
                        # (mirrors the image path — no per-record
                        # searchsorted array builds).
                        import hashlib as _hl

                        dedup_cands.append(
                            (len(arch), _hl.sha1(body_b).hexdigest())
                        )
                    arch.append(rec)
                else:  # 304 → WARC revisit record (server-not-modified):
                    # empty-bodied but indexed under the UNCHANGED
                    # content's digest, so this generation's CDX stays
                    # complete for archive_delta / change_rate
                    import hashlib as _hl

                    arch.append(
                        {"url": r.url, "status": 304, "body": b"",
                         "revisit_digest": _hl.sha1(r.body.encode()).hexdigest(),
                         "schema_name": base["schema_name"],
                         "schema_version": base["schema_version"],
                         "domain": base["domain"], "created": base["created"],
                         "depth": depth}
                    )
            if depth == 0:
                anchors = parsers.parse_pagination(r.body)
                last = max(anchors, default=0)  # G2 running max
                for prio, page_url in parsers.expand_pages(url, last):
                    cu = canon.canonicalize_url_one(page_url)
                    dh, dl = _digest_pair(cu)
                    rows.append({**base, "kind": "page", "url": page_url,
                                 "canon_url": cu,
                                 "host": canon.host_of_one(page_url),
                                 "digest_hi": dh, "digest_lo": dl,
                                 "priority": prio, "depth": 1})
            elif depth == 1:
                spec = parsers.get_parser(base["schema_name"])
                for a in spec.parse(r.body, url):
                    rows.append(
                        {**base, "kind": "entry",
                         "title": a["title"], "name": a["name"], "region": a["region"],
                         "rooms_raw": a["rooms_raw"], "price_raw": a["price_raw"],
                         "total_price_raw": a["total_price_raw"], "area_raw": a["area_raw"],
                         "link": canon.take_characters_before_one(a["href"], ".html")}
                    )
                    if self.max_depth >= 2 and a["href"]:
                        cu = canon.canonicalize_url_one(a["href"])
                        dh, dl = _digest_pair(cu)
                        rows.append({**base, "kind": "page", "url": a["href"],
                                     "canon_url": cu,
                                     "host": canon.host_of_one(a["href"]),
                                     "digest_hi": dh, "digest_lo": dl,
                                     "priority": 0, "depth": 2})
            elif depth == 2 and self.fetch_images:
                for im in parsers.parse_offer_images(r.body, url):
                    rows.append({**base, "kind": "image_ref",
                                 "image_id": im["image_id"], "caption": im["caption"]})
        if dedup_cands:
            # one vectorized prior-chain membership per task (the image
            # path's shape): matched payloads archive as empty-bodied
            # identical-payload revisit records
            mask = self._prior_has_bodies([dg for _, dg in dedup_cands])
            for (ai, dg), hit in zip(dedup_cands, mask):
                if hit:
                    arch[ai].update(
                        body=b"", revisit_digest=dg,
                        revisit_profile="identical-payload-digest",
                    )
        if self.entries_store is not None:
            rnd0 = cols.get("round", [0] * n)[0] if n else 0
            rows = self._write_payloads(rows, rnd0)
        if self.archiver is not None and arch:
            meta = self.archiver.write_batch(arch)
            rows.append(_frag_row("afrag", meta))
        slim = self.entries_store is not None and self.logs_store is not None
        return _rows_to_table(rows, SLIM_UNION_SCHEMA if slim else UNION_SCHEMA)

    def reset_log_buffer(self) -> None:
        """Arm (and clear) fused-task fragment batching for the SLIM
        row streams (fetch log + normalized entries). Called at the
        START of a host-block task so a Ray task retry re-buffers from
        empty — flushed fragment keys are deterministic in the buffered
        content, so retries overwrite the same files (idempotent).
        Image fragments stay per-chunk: their payload bytes are the
        memory bound the chunking exists for."""
        self._log_buf = []
        self._ent_buf = []

    def flush_logs(self) -> pa.Table:
        """Write ONE fetch-log fragment and ONE entries fragment for
        everything buffered since reset_log_buffer() and return their
        lfrag/efrag control rows (empty ctrl table when nothing
        buffered). One call per host-block task → O(blocks·rounds)
        fragments instead of O(pages/batch_size)."""
        rows: list[dict] = []
        buf, self._log_buf = self._log_buf, None
        if buf:
            table = pa.concat_tables(buf).combine_chunks()
            rnd = table["round"][0].as_py()
            fkey = stable_hash_bytes(
                "logfrag", *sorted(table["canon_url"].to_pylist()), rnd, size=8
            ).hex()
            meta = self.logs_store.write_fragment(
                table, fkey, stats_cols=_LOG_STATS_COLS
            )
            rows.append(_frag_row("lfrag", meta))
        ebuf, self._ent_buf = getattr(self, "_ent_buf", None), None
        if ebuf:
            table = pa.concat_tables(t for t, _ in ebuf).combine_chunks()
            urls = [u for _, us in ebuf for u in us]
            fkey = stable_hash_bytes(
                "entfrag", *sorted(urls), table.num_rows, size=8
            ).hex()
            meta = self.entries_store.write_fragment(
                table, fkey, stats_cols=_ENTRY_STATS_COLS
            )
            rows.append(_frag_row("efrag", meta))
        return _rows_to_table(rows, SLIM_UNION_SCHEMA)

    def _write_payloads(self, rows: list[dict], rnd: int = 0) -> list[dict]:
        """Fused mode: write entry + image (and, in no-track mode, log)
        fragments, swap payload rows for frag-metadata rows (idempotent
        deterministic keys)."""
        out = [r for r in rows if r["kind"] not in ("entry", "image_ref")]
        entries = [r for r in rows if r["kind"] == "entry"]
        image_refs = [r for r in rows if r["kind"] == "image_ref"]
        if entries:
            ent_t = _rows_to_table(entries)
            table = normalize_entries(ent_t)
            ent_urls = [r["canon_url"] for r in entries]
            if getattr(self, "_ent_buf", None) is not None:
                # batching armed: defer the fragment to flush_logs()
                # (the key material — canon urls — rides along, since
                # the normalized table doesn't carry canon_url)
                self._ent_buf.append((table, ent_urls))
            else:
                fkey = stable_hash_bytes(
                    "entfrag", *sorted(ent_urls), len(entries), size=8
                ).hex()
                meta = self.entries_store.write_fragment(
                    table, fkey, stats_cols=_ENTRY_STATS_COLS
                )
                out.append(_frag_row("efrag", meta))
        if image_refs and self.images_store is not None:
            recs = self.web.image_records([r["image_id"] for r in image_refs])
            table = pa.Table.from_pylist(recs, schema=IMAGES_SCHEMA)
            fkey = stable_hash_bytes(
                "imgfrag", *sorted(r["image_id"] for r in image_refs), size=8
            ).hex()
            meta = self.images_store.write_fragment(
                table, fkey, stats_cols=_IMAGE_STATS_COLS
            )
            out.append(_frag_row("ifrag", meta))
            if self.archiver is not None and self.archive_images:
                img_arch = [
                    {
                        "url": f"https://images.test/{rec['image_id']}.{rec['fmt']}",
                        "status": 200,
                        "content_type": f"image/{rec['fmt']}",
                        "body": rec["bytes"],
                        "schema_name": r.get("schema_name", ""),
                        "schema_version": r.get("schema_version", ""),
                        "domain": r.get("domain", ""),
                        "created": r.get("created", ""),
                        "depth": 3,
                    }
                    for rec, r in zip(recs, image_refs)
                ]
                if self.archive_dedup:
                    # image payloads are the archive's bulk — unchanged
                    # images (the common recrawl case) dedup by digest
                    # against the prior generations exactly like pages;
                    # membership is ONE vectorized searchsorted per batch
                    import hashlib as _hl

                    dgs = [_hl.sha1(ia["body"]).hexdigest() for ia in img_arch]
                    for ia, dg, hit in zip(
                        img_arch, dgs, self._prior_has_bodies(dgs)
                    ):
                        if hit:
                            ia.update(
                                body=b"", revisit_digest=dg,
                                revisit_profile="identical-payload-digest",
                            )
                ameta = self.archiver.write_batch(img_arch)
                out.append(_frag_row("afrag", ameta))
        if self.logs_store is not None:
            logs = [r for r in out if r["kind"] == "log"]
            out = [r for r in out if r["kind"] != "log"]
            if logs:
                table = pa.table(
                    {
                        "canon_url": pa.array([r["canon_url"] for r in logs], pa.string()),
                        "host": pa.array([r["host"] for r in logs], pa.string()),
                        "status": pa.array([r["status"] for r in logs], pa.int32()),
                        "attempts": pa.array([r["attempts"] for r in logs], pa.int32()),
                        "redirects": pa.array(
                            [r.get("redirects", 0) for r in logs], pa.int32()
                        ),
                        "etag": pa.array([r.get("etag") for r in logs], pa.string()),
                        "error": pa.array([r["error"] for r in logs], pa.string()),
                        "nbytes": pa.array([r["nbytes"] for r in logs], pa.int64()),
                        "round": pa.array([rnd] * len(logs), pa.int32()),
                    }
                )
                if self._log_buf is not None:
                    # batching armed: defer the fragment to flush_logs()
                    self._log_buf.append(table)
                else:
                    fkey = stable_hash_bytes(
                        "logfrag", *sorted(r["canon_url"] for r in logs), rnd, size=8
                    ).hex()
                    meta = self.logs_store.write_fragment(
                        table, fkey, stats_cols=_LOG_STATS_COLS
                    )
                    out.append(_frag_row("lfrag", meta))
                # per-host stats replace the raw rows on the control path
                stats: dict[str, list[int]] = {}
                for r in logs:
                    s = stats.setdefault(r["host"], [0, 0, 0, 0, 0])
                    s[0] += 1
                    st = r["status"]
                    if st in (200, 304):
                        s[1] += 1
                    elif st == STATUS_EXHAUSTED:
                        s[2] += 1
                    elif st == STATUS_ROBOTS_BLOCKED:
                        s[3] += 1
                    s[4] += r["nbytes"] or 0
                out.extend(
                    {"kind": "hstat", "host": h, "n_issued": s[0], "n_ok": s[1],
                     "n_failed": s[2], "n_blocked": s[3], "nbytes": s[4]}
                    for h, s in stats.items()
                )
        return out


# --- worker-cached task-mode variant ------------------------------------
#
# For SMALL rounds an actor pool pays ~seconds of pool startup per round
# (the crawl loop creates a fresh Dataset execution each round). Plain
# map_batches functions run in long-lived Ray worker PROCESSES, so a
# module-global instance cache gives the same once-per-worker init
# amortization as an actor pool with zero startup latency. Large rounds
# (bench/scale) use the actor-pool class directly.

_FETCHER_CACHE: dict = {}


def make_fetch_parse_fn(
    web_config: WebConfig | str,
    obey_robots: bool,
    max_depth: int,
    entries_root: str | None = None,
    images_root: str | None = None,
    fetch_images: bool = True,
    logs_root: str | None = None,
    archive_root: str | None = None,
    archive_images: bool = False,
    prior_etags_ref=None,
    prior_archive_root: str | None = None,
    archive_dedup: bool = False,
    prior_index_ref=None,
):
    # plain-dict etag maps (unit-test path) are NOT cached: id() can be
    # reused after gc and alias a stale FetchParse with the wrong map —
    # the run paths always pass a ray.put ObjectRef (stable .hex key);
    # same rule for plain-dict prior indexes
    cacheable = (prior_etags_ref is None or hasattr(prior_etags_ref, "hex")) and (
        prior_index_ref is None or hasattr(prior_index_ref, "hex")
    )
    key = (
        repr(web_config), obey_robots, max_depth, entries_root, images_root,
        fetch_images, logs_root, archive_root, archive_images,
        prior_etags_ref.hex() if hasattr(prior_etags_ref, "hex") else None,
        tuple(prior_archive_root)
        if isinstance(prior_archive_root, (list, tuple))
        else prior_archive_root,
        archive_dedup,
        prior_index_ref.hex() if hasattr(prior_index_ref, "hex") else None,
    )

    def _get_inst() -> "FetchParse":
        inst = _FETCHER_CACHE.get(key) if cacheable else None
        if inst is None:
            inst = FetchParse(
                web_config,
                obey_robots=obey_robots,
                max_depth=max_depth,
                entries_root=entries_root,
                images_root=images_root,
                fetch_images=fetch_images,
                logs_root=logs_root,
                archive_root=archive_root,
                archive_images=archive_images,
                prior_etags_ref=prior_etags_ref,
                prior_archive_root=prior_archive_root,
                archive_dedup=archive_dedup,
                prior_index_ref=prior_index_ref,
            )
            if cacheable:  # never cache dict-etag instances (aliasing)
                _FETCHER_CACHE[key] = inst
        return inst

    def fetch_parse(batch: pa.Table) -> pa.Table:
        return _get_inst()(batch)

    # fused-task log batching controls (see FetchParse.flush_logs) —
    # resolved through the worker-local cache so they act on the SAME
    # instance the chunk calls used in this task
    fetch_parse.reset_log_buffer = lambda: _get_inst().reset_log_buffer()
    fetch_parse.flush_logs = lambda: _get_inst().flush_logs()
    return fetch_parse


IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


class ImageFetchWrite:
    """Image payload stage: fetch/decode image bytes and write them as
    Lance-like fragments FROM THE TASK (bytes never touch the driver).

    Input batch: (image_id, caption) reference rows. Output: fragment
    metadata rows (key/rows/path) for the driver's manifest commit.
    Fragment names are deterministic in the batch's image_ids → Ray task
    retries are idempotent (contrast: reference's random filenames,
    ``commons/helper.go:37-45``).

    In the sandbox the "fetch+decode" is SynthWeb's deterministic
    generator + the real PNG codec; outside, this is an HTTP GET + a real
    decoder behind the same interface. Keep ``batch_size`` small here —
    rows carry megapixel binaries (SURVEY §7.5.4).
    """

    def __init__(self, web_config: WebConfig | str, store_root: str):
        from ..state.lancelike import TableStore

        self.web = SynthWeb(web_config)
        self.store = TableStore(store_root)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        if not ids:
            return pa.Table.from_pydict(
                {"key": [], "rows": [], "path": []},
                schema=pa.schema([("key", pa.string()), ("rows", pa.int64()), ("path", pa.string())]),
            )
        recs = self.web.image_records(ids)
        table = pa.Table.from_pylist(recs, schema=IMAGES_SCHEMA)
        key = stable_hash_bytes("imgfrag", *sorted(ids), size=8).hex()
        meta = self.store.write_fragment(table, key)
        return pa.Table.from_pydict(
            {"key": [meta["key"]], "rows": [meta["rows"]], "path": [meta["path"]]},
        )


def make_image_write_fn(web_config: WebConfig | str, store_root: str):
    """Worker-cached task-mode ImageFetchWrite (see make_fetch_parse_fn).

    Accepts raw UNION batches: filters kind == image_ref itself, so the
    driver never materializes payload rows."""
    key = ("img", repr(web_config), store_root)

    def image_write(batch: pa.Table) -> pa.Table:
        if "kind" in batch.column_names:
            batch = batch.filter(pc.equal(batch["kind"], "image_ref")).select(
                ["image_id", "caption"]
            )
        inst = _FETCHER_CACHE.get(key)
        if inst is None:
            inst = _FETCHER_CACHE[key] = ImageFetchWrite(web_config, store_root)
        return inst(batch)

    return image_write


FRAG_META_SCHEMA = pa.schema([("key", pa.string()), ("rows", pa.int64()), ("path", pa.string())])


def make_entry_write_fn(store_root: str):
    """Task-side entries writer over UNION batches: filter kind == entry,
    vectorized normalize (M2/M3), write a Lance-like fragment with a
    deterministic content-derived key, return only fragment metadata.
    Entry rows never pass through the driver (scale posture)."""
    from ..state.lancelike import TableStore

    key = ("entrywriter", store_root)

    def entry_write(batch: pa.Table) -> pa.Table:
        ent = batch.filter(pc.equal(batch["kind"], "entry"))
        if ent.num_rows == 0:
            return FRAG_META_SCHEMA.empty_table()
        store = _FETCHER_CACHE.get(key)
        if store is None:
            store = _FETCHER_CACHE[key] = TableStore(store_root)
        table = normalize_entries(ent)
        fkey = stable_hash_bytes(
            "entfrag", *sorted(ent["canon_url"].to_pylist()), ent.num_rows, size=8
        ).hex()
        meta = store.write_fragment(table, fkey)
        return pa.Table.from_pylist([meta], schema=FRAG_META_SCHEMA)

    return entry_write


def normalize_entries(entries: pa.Table) -> pa.Table:
    """Vectorized M2 normalization of the raw entry columns → typed table
    (``rooms/price/total_price/area`` int64 via digit-concat)."""
    out = {
        "schema_name": entries["schema_name"],
        "schema_version": entries["schema_version"],
        "domain": entries["domain"],
        "created": entries["created"],
        "title": entries["title"],
        "name": entries["name"],
        "region": entries["region"],
        "rooms": canon.extract_number(entries["rooms_raw"].combine_chunks()),
        "price": canon.extract_number(entries["price_raw"].combine_chunks()),
        "total_price": canon.extract_number(entries["total_price_raw"].combine_chunks()),
        "area": canon.extract_number(entries["area_raw"].combine_chunks()),
        "link": entries["link"],
    }
    return pa.table(out)
