"""Single-threaded reference-semantics simulator — the crawl test oracle.

Implements the EXACT crawl semantics the Ray engine must reproduce
(SURVEY.md §5.3). The semantics are the reference's, made deterministic
where the reference left determinism to chance (§1.4):

* one ``created`` timestamp per run (``otodom/orchestrator/handler.go:26``)
* single ordered seed list (dead ``?url`` path → SOURCE_URL semantics,
  ``orchestrator/handler.go:29-32``)
* seed fetch yields ONLY pagination (total_pages reads the pager, not
  articles — ``otodom/total_pages/handler.go:30``); running-max last page
  (G2, ``:39-41``); expansion pages 1..last-1 with the ``?``/``&`` predicate
  (M6/F3, ``:53-65``)
* ≤5 fetch attempts per URL then hard per-item failure (T3,
  ``otodom/commons/extensions.go:25-47``)
* extraction + digit-concat normalization + ``.html``-strip link
  canonicalization (M1/M2/M3)
* insert-dedup seen-set (D1, ``commons/Entry.go:37``)

North-rule additions (absent in the reference, shared by engine+oracle):
robots.txt blocking, per-host-per-round politeness budget, and the
offer→image payload round.

Shared ordering contract (engine mirrors this exactly):
round r issue order = frontier candidates sorted by
``(depth, seed_id, priority, host, canon_url)``; per host only the first
``budget`` candidates are issued this round, the rest are deferred.
Dedup-admit (seen-set insert) happens at END-of-round over that round's
discoveries, processed in the same sort order (so when one canon_url is
discovered twice with different attributes, the smallest-keyed row wins
deterministically); robots blocking happens at issue time (blocked URLs
are in the seen set and the fetch log but never issued). ``order`` =
concatenation of per-round issue sequences.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import canon
from .stages import parsers
from .synthweb import SynthWeb

RETRY_ATTEMPTS = 5  # otodom/flat_crawler/handler.go:53
MAX_REDIRECTS = 10  # Go http.Client default (colly rides it silently)
STATUS_ROBOTS_BLOCKED = -2
STATUS_EXHAUSTED = -1
STATUS_TOO_MANY_REDIRECTS = -4


@dataclass(frozen=True)
class CrawlSpec:
    """Politeness/budget config shared by the oracle and the engine."""

    host_budget_per_round: int = 4  # max fetches per host per round
    # trap guard (Heritrix max-pages-per-host analog): total issue slots
    # per host across the WHOLE run; candidates beyond it are DROPPED at
    # issue time (in contract sort order). None = unbounded.
    max_pages_per_host: "int | None" = None
    max_rounds: int = 64
    max_depth: int = 2  # 0 seeds, 1 listing pages, 2 offers
    obey_robots: bool = True
    run_ts: str = "2026-01-01T00:00:00"  # the single per-run `created`
    fetch_images: bool = True  # False: offer pages fetched, image payloads skipped
    # (frontier-scale runs measure scheduler throughput without codec cost)


@dataclass
class SimResult:
    order: list[str] = field(default_factory=list)  # canon urls, issue order
    seen: set[str] = field(default_factory=set)
    entries: list[dict] = field(default_factory=list)
    images: list[dict] = field(default_factory=list)
    fetch_log: list[dict] = field(default_factory=list)


def _fetch_with_retry(web: SynthWeb, url: str, if_none_match: str | None = None):
    """T3 semantics: up to RETRY_ATTEMPTS attempts, first success wins.
    A 301 with a Location counts as success for the retry loop (the
    redirect is followed by :func:`_fetch_following`); so does a 304
    Not Modified (conditional recrawl)."""
    for attempt in range(1, RETRY_ATTEMPTS + 1):
        r = web.fetch(url, attempt=attempt, if_none_match=if_none_match)
        if r.status in (200, 304) or (r.status == 301 and r.location):
            return r, attempt
    return r, RETRY_ATTEMPTS


def _fetch_following(web: SynthWeb, url: str, if_none_match: str | None = None):
    """Redirect-following fetch, shared contract with the engine
    (stages/fetch.py:_fetch_following): each hop gets the full ≤5-attempt
    budget; > MAX_REDIRECTS hops → STATUS_TOO_MANY_REDIRECTS. Returns
    (result, final_hop_attempts, hops)."""
    hops = 0
    cur = url
    while True:
        r, attempts = _fetch_with_retry(web, cur, if_none_match)
        if r.status != 301 or not r.location:
            return r, attempts, hops
        hops += 1
        if hops > MAX_REDIRECTS:
            r.status = 599
            r.error = "too many redirects"
            return r, attempts, hops
        cur = r.location


def simulate(
    web: SynthWeb,
    spec: CrawlSpec = CrawlSpec(),
    prior_seen: "set[str] | None" = None,
    prior_etags: "dict[str, str] | None" = None,
) -> SimResult:
    """``prior_seen``: the persisted seen set of a PREVIOUS run (the
    recrawl-cadence contract, shared with the engine): this-run dedup is
    unchanged, but frontier admission additionally skips depth-2 (offer)
    URLs already fetched by a prior run — listings (depth ≤ 1) are due
    for re-crawl on every cadence tick, content pages are fetched once
    across runs (cross-run D1, ``commons/Entry.go:37``).

    ``prior_etags``: canon_url → prior-generation ETag (conditional
    recrawl). A matching ETag yields a 304 log row with zero bytes; the
    simulator then parses the CURRENT body — sound because the ETag is
    a content hash, so a match guarantees the live body equals the
    archived copy the engine re-reads."""
    res = SimResult()
    seeds = web.seeds()
    frontier: list[dict] = []
    pending: list[dict] = []
    prior = prior_seen or set()

    def discover(url: str, priority: int, depth: int, seed_id: int) -> None:
        cu = canon.canonicalize_url_one(url)
        pending.append(
            {
                "url": url,
                "canon_url": cu,
                "host": canon.host_of_one(url),
                "priority": priority,
                "depth": depth,
                "seed_id": seed_id,
            }
        )

    def admit_pending(rnd: int) -> None:
        """End-of-round admission in sort order (shared contract)."""
        pending.sort(
            key=lambda f: (f["depth"], f["seed_id"], f["priority"], f["host"], f["canon_url"], f["url"])
        )
        for f in pending:
            if f["canon_url"] in res.seen:
                continue
            res.seen.add(f["canon_url"])
            if f["depth"] >= 2 and f["canon_url"] in prior:
                continue  # recrawl: offers fetched once across runs
            frontier.append({**f, "round_added": rnd})
        pending.clear()

    seed_schema = {s["seed_id"]: (s["schema_name"], s["schema_version"], s["domain"]) for s in seeds}
    for s in seeds:
        discover(s["url"], 0, 0, s["seed_id"])
    admit_pending(0)

    host_total: dict[str, int] = {}  # all-run issue slots per host (cap)
    for rnd in range(spec.max_rounds):
        if not frontier:
            break
        frontier.sort(key=lambda f: (f["depth"], f["seed_id"], f["priority"], f["host"], f["canon_url"]))
        issued, deferred, rank = [], [], {}
        total_at_round_start = dict(host_total)  # rem is vs the ROUND-START
        for f in frontier:  # totals (engine ships one used-dict per round)
            h = f["host"]
            r = rank.get(h, 0) + 1
            rank[h] = r
            rem = (
                spec.max_pages_per_host - total_at_round_start.get(h, 0)
                if spec.max_pages_per_host is not None
                else None
            )
            if r <= spec.host_budget_per_round and (rem is None or r <= rem):
                issued.append(f)
                host_total[h] = host_total.get(h, 0) + 1
            elif rem is None or r <= rem:
                deferred.append(f)
            # else: over the all-run cap → dropped (trap guard)
        frontier = deferred

        for f in issued:
            if spec.obey_robots and f["host"] and f["depth"] == 2 and web.host_blocks_offers(f["host"]):
                res.fetch_log.append(
                    {"canon_url": f["canon_url"], "host": f["host"], "round": rnd,
                     "status": STATUS_ROBOTS_BLOCKED, "attempts": 0, "redirects": 0,
                     "etag": None, "error": "robots", "bytes": 0}
                )
                continue
            res.order.append(f["canon_url"])
            et = prior_etags.get(f["canon_url"]) if prior_etags else None
            r, attempts, hops = _fetch_following(web, f["url"], if_none_match=et)
            if r.status == 304:
                # ETag matched (content hash) → live body ≡ archived body
                r.body = web._route(r.url)
            status = 200 if r.status in (200, 304) else (
                STATUS_TOO_MANY_REDIRECTS if r.status == 599 else STATUS_EXHAUSTED
            )
            res.fetch_log.append(
                {"canon_url": f["canon_url"], "host": f["host"], "round": rnd,
                 "status": 304 if r.status == 304 else status,
                 "attempts": attempts, "redirects": hops, "etag": r.etag,
                 "error": r.error or "", "bytes": r.nbytes}
            )
            if r.status not in (200, 304):
                continue
            if hops:
                # the chain's final url is now held content — seen, never
                # a frontier candidate (engine: kind="redirect" rows)
                res.seen.add(canon.canonicalize_url_one(r.url))
            name, version, domain = seed_schema[f["seed_id"]]
            if f["depth"] == 0:
                anchors = parsers.parse_pagination(r.body)
                last = max(anchors, default=0)  # G2 running max
                for prio, page_url in parsers.expand_pages(f["url"], last):
                    discover(page_url, prio, 1, f["seed_id"])
            elif f["depth"] == 1:
                spec_p = parsers.get_parser(name)
                for a in spec_p.parse(r.body, f["url"]):
                    res.entries.append(
                        {
                            "schema_name": name,
                            "schema_version": version,
                            "domain": domain,
                            "created": spec.run_ts,
                            "title": a["title"],
                            "name": a["name"],
                            "region": a["region"],
                            "rooms": canon.extract_number_one(a["rooms_raw"]),
                            "price": canon.extract_number_one(a["price_raw"]),
                            "total_price": canon.extract_number_one(a["total_price_raw"]),
                            "area": canon.extract_number_one(a["area_raw"]),
                            "link": canon.take_characters_before_one(a["href"], ".html"),
                        }
                    )
                    if spec.max_depth >= 2 and a["href"]:
                        discover(a["href"], 0, 2, f["seed_id"])
            elif f["depth"] == 2 and spec.fetch_images:
                # gate on fetch_images to stay symmetric with the engine
                # (FetchParse skips image rows when False) — the offer
                # fetch itself still happens either way
                for im in parsers.parse_offer_images(r.body, f["url"]):
                    res.images.append(web.image_record(im["image_id"]))
        admit_pending(rnd + 1)
    return res
