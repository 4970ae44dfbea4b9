"""Fetcher-contract conformance suite (VERDICT r3 item #8).

The engine's transport seam is ONE method:
``fetch(url, attempt=1, if_none_match=None) -> FetchResult``.
This suite states the contract as executable checks and runs it
against BOTH implementations:

* ``HttpFetcher`` (stages/httpfetch.py) over a real localhost HTTP
  server with scripted routes (flaky-then-ok, redirect chains and
  loops, ETag/304, robots.txt, slow responses, connection drops) —
  what a production swap (httpx/aiohttp/...) must pass, and
* ``SynthWeb`` — the default transport; its deterministic transients
  and 301s must obey the same contract the engine's retry/redirect/
  robots logic assumes.

Plus engine-level checks: FetchParse's retry (≤5), redirect budget
(599), per-item deadline (598), and robots handling running over the
REAL HTTP transport end-to-end.
"""

import http.server
import threading
import time
from collections import defaultdict

import pytest

from crawlkit.stages.fetch import FetchParse, RETRY_ATTEMPTS, MAX_REDIRECTS
from crawlkit.stages.httpfetch import HttpFetcher
from crawlkit.synthweb import SynthWeb

# ---------------------------------------------------------------- server


class _Handler(http.server.BaseHTTPRequestHandler):
    hits: dict = None  # class-level, set by fixture

    def log_message(self, *a):  # silence
        pass

    def _send(self, status, body=b"", headers=()):
        self.send_response(status)
        for k, v in headers:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def do_GET(self):  # noqa: C901 - scripted routes
        path = self.path
        self.hits[path] += 1
        n = self.hits[path]
        if path == "/ok":
            self._send(200, b"hello page", [("ETag", '"et-ok"')])
        elif path == "/flaky":
            # two transient 503s, then 200 — the engine's T3 shape
            if n <= 2:
                self._send(503, b"try later")
            else:
                self._send(200, b"finally", [("ETag", '"et-fl"')])
        elif path == "/alwaysdown":
            self._send(503, b"nope")
        elif path.startswith("/chain/"):
            k = int(path.rsplit("/", 1)[1])
            if k <= 0:
                self._send(200, b"end of chain")
            else:
                # relative Location on purpose: fetcher must absolutize
                self._send(302, b"", [("Location", f"/chain/{k - 1}")])
        elif path == "/loop":
            self._send(307, b"", [("Location", "/loop")])
        elif path == "/etag":
            if self.headers.get("If-None-Match") == '"et-42"':
                self._send(304, b"", [("ETag", '"et-42"')])
            else:
                self._send(200, b"versioned body", [("ETag", '"et-42"')])
        elif path == "/robots.txt":
            self._send(200, b"User-agent: *\nDisallow: /private/\n")
        elif path == "/slow":
            time.sleep(1.5)
            self._send(200, b"slow body")
        elif path == "/drop":
            # close the socket mid-response: transport error, retryable
            self.wfile.write(b"HTTP/1.1 200 OK\r\nContent-Length: 100\r\n\r\nshort")
            self.wfile.flush()
            self.connection.close()
        else:
            self._send(404, b"missing")


@pytest.fixture(scope="module")
def server():
    handler = type("H", (_Handler,), {"hits": defaultdict(int)})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, handler.hits
    srv.shutdown()


@pytest.fixture()
def fetcher():
    return HttpFetcher(timeout_s=0.5)


# ------------------------------------------------- transport conformance


def test_http_200_body_etag_nbytes(server, fetcher):
    base, _ = server
    r = fetcher.fetch(base + "/ok")
    assert r.status == 200 and r.body == "hello page"
    assert r.nbytes == len(b"hello page") and r.etag == '"et-ok"'


def test_http_redirect_normalized_and_absolute(server, fetcher):
    base, _ = server
    r = fetcher.fetch(base + "/chain/3")
    # any 3xx → status 301, absolute Location, no body, NOT followed
    assert r.status == 301 and r.body is None
    assert r.location == base + "/chain/2"


def test_http_404_definitive(server, fetcher):
    base, _ = server
    r = fetcher.fetch(base + "/nosuch")
    assert r.status == 404 and r.body is None and r.error


def test_http_5xx_and_timeouts_are_retryable(server, fetcher):
    base, _ = server
    r = fetcher.fetch(base + "/alwaysdown")
    assert r.status >= 500 and r.error
    r = fetcher.fetch(base + "/slow")  # timeout_s=0.5 < 1.5s sleep
    assert r.status == 503 and "time" in r.error.lower()
    r = fetcher.fetch(base + "/drop")  # mid-body connection drop
    assert r.status == 503 and r.error


def test_http_conditional_get_304(server, fetcher):
    base, _ = server
    r1 = fetcher.fetch(base + "/etag")
    assert r1.status == 200 and r1.etag == '"et-42"'
    r2 = fetcher.fetch(base + "/etag", if_none_match=r1.etag)
    assert r2.status == 304 and r2.body is None and r2.etag == '"et-42"'
    r3 = fetcher.fetch(base + "/etag", if_none_match='"stale"')
    assert r3.status == 200 and r3.body == "versioned body"


def test_http_connect_refused_is_transient(fetcher):
    r = fetcher.fetch("http://127.0.0.1:9")  # discard port, nothing listens
    assert r.status == 503 and r.error


def test_http_transport_never_retries_internally(server, fetcher):
    base, hits = server
    hits.pop("/alwaysdown", None)
    r = fetcher.fetch(base + "/alwaysdown")
    assert r.status >= 500
    assert hits["/alwaysdown"] == 1  # exactly one request per fetch()


# --- the same contract, SynthWeb side (deterministic web) ---------------


def _synth_cases(web: SynthWeb):
    """Find deterministic URLs exercising each contract case."""
    ok = flaky = moved = None
    candidates = [s["url"] for s in web.seeds()]
    # widen with pagination urls of each seed (all routable pages)
    for s in web.seeds():
        candidates += [s["url"] + f"&page={p}" for p in range(1, 4)]
    for u in candidates:
        if web.redirect_target(u):
            moved = moved or u
        elif web.fail_attempts(u) > 0:
            flaky = flaky or u
        elif web.fetch(u, attempt=9).status == 200:
            ok = ok or u
    return ok, flaky, moved


def test_synthweb_meets_the_same_contract():
    web = SynthWeb("t2")
    ok, flaky, moved = _synth_cases(web)
    assert ok and flaky
    r = web.fetch(ok)
    assert r.status == 200 and r.body and r.nbytes == len(r.body) and r.etag
    # conditional GET
    r2 = web.fetch(ok, if_none_match=r.etag)
    assert r2.status == 304 and r2.body is None and r2.etag == r.etag
    # transient then success, attempt-indexed
    k = web.fail_attempts(flaky)
    assert web.fetch(flaky, attempt=1).status == 503
    assert web.fetch(flaky, attempt=k + 1).status == 200
    # redirect: absolute location, no body, normalized single kind (301)
    if moved is not None:
        rm = web.fetch(moved)
        assert rm.status == 301 and rm.location.startswith("https://")
        assert rm.body is None
    # definitive miss
    assert web.fetch(f"https://{web.host(0)}/bogus/path").status == 404


# ------------------------------------------------- engine over real HTTP


def _engine(server_base, **kw):
    fp = FetchParse.__new__(FetchParse)  # bypass full init: transport-only
    fp.web = SynthWeb("t1")
    fp._fetcher = HttpFetcher(timeout_s=0.5)
    fp.fetch_timeout_s = kw.get("fetch_timeout_s")
    return fp


def test_engine_retry_budget_over_http(server):
    base, hits = server
    fp = _engine(base)
    hits.pop("/flaky", None)
    r, attempts = fp._fetch_with_retry(base + "/flaky")
    assert r.status == 200 and attempts == 3  # 2 transients + success
    hits.pop("/alwaysdown", None)
    r, attempts = fp._fetch_with_retry(base + "/alwaysdown")
    assert r.status == 503 and attempts == RETRY_ATTEMPTS
    assert hits["/alwaysdown"] == RETRY_ATTEMPTS  # ≤5 requests, then fail


def test_engine_redirect_following_over_http(server):
    base, _ = server
    fp = _engine(base)
    r, attempts, hops, hop_records = fp._fetch_following(base + "/chain/3")
    assert r.status == 200 and r.body == "end of chain" and hops == 3
    assert [h[0] for h in hop_records] == [
        base + "/chain/3", base + "/chain/2", base + "/chain/1"
    ]
    r, _, hops, _ = fp._fetch_following(base + "/loop")
    assert r.status == 599 and hops == MAX_REDIRECTS + 1  # budget sentinel


def test_engine_deadline_over_http(server):
    base, _ = server
    fp = _engine(base, fetch_timeout_s=0.2)
    t0 = time.monotonic()
    r, attempts = fp._fetch_with_retry(base + "/slow")
    assert r.status == 598 and "deadline" in r.error
    assert time.monotonic() - t0 < 3.0  # deadline cut the retry loop short


def test_engine_robots_over_http(server):
    base, _ = server
    fp = _engine(base)
    assert "Disallow: /private/" in fp._fetch_robots(base + "/robots.txt")
    assert fp._fetch_robots(base + "/no-robots-here") == ""  # 404 → no rules
    assert fp._fetch_robots(base.replace(
        f":{base.rsplit(':', 1)[1]}", ":9") + "/robots.txt") is None  # transient
