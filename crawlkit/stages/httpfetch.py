"""Real-HTTP transport behind the engine's Fetcher seam.

The crawl engine consumes exactly ONE transport method (stages/
fetch.py::FetchParse._fetch_with_retry):

    fetch(url, attempt=1, if_none_match=None) -> FetchResult

with the contract (pinned by tests/test_fetcher_conformance.py, which
any drop-in transport must pass):

* 200  → ``body`` is the decoded text, ``nbytes`` the raw byte count,
         ``etag`` the content ETag when the server sent one.
* 3xx  → status NORMALIZED to 301 with ``location`` an ABSOLUTE url
         and no body (the engine follows ≤ MAX_REDIRECTS hops itself;
         requests are always GET, so 301/302/303/307/308 collapse to
         one redirect kind — the reference's http.Client behaves the
         same for GET, otodom flat_crawler/handler.go:92).
* 304  → no body, ``etag`` set (sent back on If-None-Match matches).
* 404  → definitive miss (cached as "no robots" by RobotsCache).
* transient failures (connect refused/reset, DNS, socket timeout,
  5xx) → a RETRYABLE status (5xx, timeouts mapped to 503) with
  ``error`` set — the ENGINE owns the ≤5-attempt retry loop, the
  per-item deadline (598) and the redirect budget (599); the
  transport must never retry or follow redirects internally.

``HttpFetcher`` implements the contract over stdlib urllib (no
third-party HTTP client in the sandbox). It is intentionally
connection-pooled per instance — FetchParse constructs ONE transport
per actor (T1/T2: reuse, never per-request), and urllib keeps things
simple while the conformance suite is what a production swap (httpx,
aiohttp, curl-cffi...) must pass.

SynthWeb satisfies the same contract natively (it IS the default
transport); the conformance suite runs against both.
"""

from __future__ import annotations

import http.client
import socket
import urllib.error
import urllib.request
from urllib.parse import urljoin

from ..synthweb import FetchResult

_REDIRECT_STATUSES = frozenset({301, 302, 303, 307, 308})


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    """Surface 3xx responses instead of following them — the engine
    owns the hop budget (MAX_REDIRECTS → 599 sentinel)."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):  # noqa: D102
        return None


class HttpFetcher:
    """Stdlib-HTTP implementation of the engine's Fetcher contract.

    Stateless per call except the opener (constructed once — actor
    init, not per request). ``attempt`` is accepted for signature
    parity but unused: real servers keep their own failure state,
    unlike SynthWeb's deterministic attempt-indexed transients.
    """

    def __init__(self, timeout_s: float = 10.0, user_agent: str = "crawlkit/4"):
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self._opener = urllib.request.build_opener(_NoRedirect())

    def fetch(
        self, url: str, attempt: int = 1, if_none_match: str | None = None
    ) -> FetchResult:
        req = urllib.request.Request(url, method="GET")
        req.add_header("User-Agent", self.user_agent)
        if if_none_match is not None:
            req.add_header("If-None-Match", if_none_match)
        try:
            resp = self._opener.open(req, timeout=self.timeout_s)
        except urllib.error.HTTPError as e:
            status = e.code
            headers = e.headers
            if status in _REDIRECT_STATUSES:
                loc = headers.get("Location")
                if loc:
                    return FetchResult(
                        url, 301, None, location=urljoin(url, loc)
                    )
                return FetchResult(url, 502, None, error="redirect without Location")
            if status == 304:
                return FetchResult(
                    url, 304, None, nbytes=0, etag=headers.get("ETag")
                )
            if status == 404:
                return FetchResult(url, 404, None, error="not found")
            # other 4xx are definitive failures; 5xx stay retryable as-is
            err = f"http {status}"
            if 400 <= status < 500:
                return FetchResult(url, status, None, error=err)
            return FetchResult(url, status, None, error=err)
        except (socket.timeout, TimeoutError) as e:
            return FetchResult(url, 503, None, error=f"timeout: {e}")
        except urllib.error.URLError as e:
            # connect refused/reset, DNS failure, TLS error, timeout
            # wrapped by urllib — all transient from the engine's view
            return FetchResult(url, 503, None, error=f"transport: {e.reason}")
        except OSError as e:
            return FetchResult(url, 503, None, error=f"socket: {e}")
        with resp:
            status = resp.status
            try:
                raw = resp.read()
            except (http.client.HTTPException, OSError) as e:
                # truncated body / connection dropped mid-read: transient
                return FetchResult(url, 503, None, error=f"read: {e!r}")
            if status in _REDIRECT_STATUSES:  # opener surfaced a 3xx as success
                loc = resp.headers.get("Location")
                if loc:
                    return FetchResult(url, 301, None, location=urljoin(url, loc))
                return FetchResult(url, 502, None, error="redirect without Location")
            etag = resp.headers.get("ETag")
            body = raw.decode("utf-8", errors="replace")
            return FetchResult(url, status, body, nbytes=len(raw), etag=etag)
