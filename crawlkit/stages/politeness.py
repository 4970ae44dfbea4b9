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


def parse_robots(text: str) -> list[str]:
    """Minimal robots parser: Disallow prefixes for User-agent: * blocks."""
    rules: list[str] = []
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
    return rules


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

    def rules_for(self, host: str, scheme: str = "https") -> list[str]:
        if host not in self._rules:
            body = self._fetch(f"{scheme}://{host}/robots.txt")
            if body is None:
                return []  # fail open this once; do not cache
            self._rules[host] = parse_robots(body)
        return self._rules[host]

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

    def bucket(self, host: str) -> TokenBucket:
        b = self._buckets.get(host)
        if b is None:
            b = self._buckets[host] = TokenBucket(self.rate, self.capacity)
        return b
