"""Robots.txt rules + per-host token-bucket politeness.

The reference has NO robots handling and NO per-host delay (colly used
with the default collector — no ``c.Limit()`` anywhere; its politeness
analog is only the replica cap, ``stack.yml:138-139``). The north rule
adds both as first-class scheduler features:

* **robots**: parsed per host, cached inside each Fetcher actor (the T1
  memoized-client pattern, ``storage/handler.go:19,71-76``).
* **deterministic budget**: the per-host-per-round fetch cap lives in
  the frontier scheduler (``pipelines/crawl.py``) because that is the
  part that must be reproducible against the oracle.
* **token bucket**: wall-clock request-rate smoothing inside fetch
  actors; best-effort per actor (strict global per-host rate requires
  hash-routing a host to a single actor — supported by the frontier's
  host-partitioning; off by default in tests for determinism).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def parse_robots_full(text: str) -> "tuple[list[str], float | None]":
    """Minimal robots parser for User-agent: * blocks: Disallow prefixes
    plus the Crawl-delay directive (seconds; None when absent or
    malformed — malformed values are skipped like any permissive parse
    here, F4-style)."""
    rules: list[str] = []
    delay: float | None = None
    applies = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif key == "disallow" and applies and val:
            rules.append(val)
        elif key == "crawl-delay" and applies:
            try:
                d = float(val)
                if d > 0:
                    delay = d
            except ValueError:
                pass
    return rules, delay


def parse_robots(text: str) -> list[str]:
    """Disallow prefixes only (back-compat wrapper)."""
    return parse_robots_full(text)[0]


def parse_robots_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` directive URLs in document order (the directive is
    group-independent per the robots.txt spec — not scoped to a
    User-agent block)."""
    out: list[str] = []
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def allowed(path: str, disallow_prefixes: list[str]) -> bool:
    return not any(path.startswith(p) for p in disallow_prefixes)


class RobotsCache:
    """Per-host robots rules, fetched once and cached (actor-local)."""

    def __init__(self, fetch_fn):
        """``fetch_fn(url) -> str | None``: robots.txt body ("" means a
        definitive no-robots-file answer), None means transient failure
        — None is NOT cached, so the next URL for the host retries
        instead of permanently failing open."""
        self._fetch = fetch_fn
        self._rules: dict[str, list[str]] = {}
        self._delay: dict[str, float | None] = {}

    def rules_for(self, host: str, scheme: str = "https") -> list[str]:
        if host not in self._rules:
            body = self._fetch(f"{scheme}://{host}/robots.txt")
            if body is None:
                return []  # fail open this once; do not cache
            self._rules[host], self._delay[host] = parse_robots_full(body)
        return self._rules[host]

    def delay_for(self, host: str) -> "float | None":
        """Crawl-delay seconds for the host (None = no directive). Only
        meaningful after rules_for() populated the cache; returns None
        on a transient robots failure (fail-open, like rules_for)."""
        self.rules_for(host)
        return self._delay.get(host)

    def allowed(self, host: str, path: str) -> bool:
        return allowed(path, self.rules_for(host))


@dataclass
class TokenBucket:
    """Deterministic-testable token bucket: pass ``now`` explicitly."""

    rate: float  # tokens per second
    capacity: float
    tokens: float = field(default=-1.0)
    last: float = 0.0

    def __post_init__(self):
        if self.tokens < 0:
            self.tokens = self.capacity

    def try_take(self, now: float, n: float = 1.0) -> bool:
        self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
        self.last = now
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False

    def wait_time(self, now: float, n: float = 1.0) -> float:
        """Seconds until ``n`` tokens are available (0 if now)."""
        avail = min(self.capacity, self.tokens + (now - self.last) * self.rate)
        return max(0.0, (n - avail) / self.rate)


class HostBuckets:
    """Lazy per-host token buckets (one map per fetch actor)."""

    def __init__(self, rate: float, capacity: float | None = None):
        self.rate = rate
        self.capacity = capacity if capacity is not None else max(1.0, rate)
        self._buckets: dict[str, TokenBucket] = {}

    def bucket(self, host: str, rate_override: "float | None" = None) -> TokenBucket:
        """Per-host bucket; ``rate_override`` (e.g. 1/Crawl-delay from
        robots) wins over the default rate at creation time."""
        b = self._buckets.get(host)
        if b is None:
            rate = rate_override if rate_override else self.rate
            cap = max(1.0, rate) if rate_override else self.capacity
            b = self._buckets[host] = TokenBucket(rate, cap)
        return b
