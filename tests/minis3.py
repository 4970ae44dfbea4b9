"""In-process S3-compatible conformance server (test infrastructure).

The object-store analog of test_fetcher_conformance's scripted HTTP
server: a localhost ``ThreadingHTTPServer`` speaking enough of the S3
REST dialect for BOTH clients the engine uses —

* ``crawlkit.state.s3.S3Client`` (control plane: PUT/GET/HEAD/DELETE/
  ListObjectsV2 with continuation), and
* ``pyarrow.fs.S3FileSystem`` (data plane: HeadObject + ranged
  GetObject parquet scans from inside Ray read tasks)

— and it VERIFIES every request's AWS SigV4 signature by recomputation
(wrong secret → 403 SignatureDoesNotMatch), so passing arrow's
SDK-generated signatures is an independent check of the engine's
signing implementation. Payload integrity: when x-amz-content-sha256
is a hex digest it must match the received body.

Deliberately NOT implemented (the engine never issues them):
multipart uploads, bucket creation/deletion, versioning, ACLs.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac_mod
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

from crawlkit.state.s3 import signing_key, string_to_sign

ACCESS_KEY = "minis3-test-key"
SECRET_KEY = "minis3-test-secret"


def _xml(body: str) -> bytes:
    return ('<?xml version="1.0" encoding="UTF-8"?>' + body).encode()


class MiniS3Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "MiniS3/1.0"

    def log_message(self, *a):  # silence
        pass

    # --- plumbing ---------------------------------------------------------

    def _split(self):
        path, _, raw_query = self.path.partition("?")
        parts = unquote(path).lstrip("/").split("/", 1)
        bucket = parts[0]
        key = parts[1] if len(parts) > 1 else ""
        return path, raw_query, bucket, key

    def _query_dict(self, raw_query: str) -> dict:
        out = {}
        for part in raw_query.split("&"):
            if not part:
                continue
            k, _, v = part.partition("=")
            out[unquote(k)] = unquote(v)
        return out

    def _reply(self, status: int, body: bytes = b"", headers: "dict | None" = None):
        self.send_response(status)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def _error(self, status: int, code: str, message: str = ""):
        self._reply(
            status,
            _xml(f"<Error><Code>{code}</Code><Message>{message}</Message></Error>"),
            {"Content-Type": "application/xml"},
        )

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def _verify_sig(self, body: bytes) -> bool:
        """Recompute SigV4 from the raw request; True iff it matches."""
        auth = self.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256 "):
            self._error(403, "AccessDenied", "missing SigV4 authorization")
            return False
        fields = {}
        for part in auth[len("AWS4-HMAC-SHA256 ") :].split(","):
            k, _, v = part.strip().partition("=")
            fields[k] = v
        try:
            akid, date, region, service, term = fields["Credential"].split("/")
            signed = fields["SignedHeaders"].split(";")
            claimed = fields["Signature"]
        except (KeyError, ValueError):
            self._error(403, "AccessDenied", "malformed authorization header")
            return False
        if akid != ACCESS_KEY:
            self._error(403, "InvalidAccessKeyId", akid)
            return False
        hdrs = {h: (self.headers.get(h) or "") for h in signed}
        payload_hash = self.headers.get("x-amz-content-sha256", "")
        if len(payload_hash) == 64 and all(
            c in "0123456789abcdef" for c in payload_hash
        ):
            if hashlib.sha256(body).hexdigest() != payload_hash:
                self._error(400, "XAmzContentSHA256Mismatch", "payload hash mismatch")
                return False
        raw_path, _, raw_query = self.path.partition("?")
        sts = string_to_sign(
            self.command,
            raw_path,
            raw_query,
            hdrs,
            signed,
            payload_hash,
            self.headers.get("x-amz-date", ""),
            f"{date}/{region}/{service}/{term}",
        )
        expect = _hmac_mod.new(
            signing_key(SECRET_KEY, date, region, service), sts.encode(), hashlib.sha256
        ).hexdigest()
        if not _hmac_mod.compare_digest(expect, claimed):
            self._error(403, "SignatureDoesNotMatch", "recomputed signature differs")
            return False
        return True

    # --- verbs --------------------------------------------------------------

    def do_PUT(self):
        body = self._read_body()
        if not self._verify_sig(body):
            return
        _, _, bucket, key = self._split()
        if not key:
            self._error(400, "InvalidRequest", "bucket-level PUT unsupported")
            return
        etag = hashlib.md5(body).hexdigest()
        with self.server.lock:
            # S3 conditional write (If-None-Match: *): create-if-absent,
            # 412 PreconditionFailed when the key exists — the commit
            # fence TableStore's multi-writer version claims rely on
            if (
                self.headers.get("If-None-Match") == "*"
                and (bucket, key) in self.server.objects
            ):
                self._error(412, "PreconditionFailed", "object exists")
                return
            self.server.objects[(bucket, key)] = body
        self._reply(200, b"", {"ETag": f'"{etag}"'})

    def do_DELETE(self):
        if not self._verify_sig(b""):
            return
        _, _, bucket, key = self._split()
        with self.server.lock:
            self.server.objects.pop((bucket, key), None)
        self._reply(204)

    def do_HEAD(self):
        if not self._verify_sig(b""):
            return
        _, _, bucket, key = self._split()
        if not key:  # HeadBucket
            self._reply(200)
            return
        with self.server.lock:
            data = self.server.objects.get((bucket, key))
        if data is None:
            self._reply(404)
            return
        # HEAD advertises what GET would return: Content-Length is the
        # OBJECT size (arrow's HeadObject reads it), with no body sent.
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.send_header("ETag", f'"{hashlib.md5(data).hexdigest()}"')
        self.send_header("Content-Type", "binary/octet-stream")
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):
        if not self._verify_sig(b""):
            return
        _, raw_query, bucket, key = self._split()
        q = self._query_dict(raw_query)
        if not key or "list-type" in q or "location" in q:
            if "location" in q:
                self._reply(200, _xml('<LocationConstraint xmlns=""/>'))
                return
            self._list(bucket, q)
            return
        with self.server.lock:
            data = self.server.objects.get((bucket, key))
        if data is None:
            self._error(404, "NoSuchKey", key)
            return
        rng = self.headers.get("Range")
        headers = {
            "ETag": f'"{hashlib.md5(data).hexdigest()}"',
            "Accept-Ranges": "bytes",
            "Content-Type": "binary/octet-stream",
        }
        if rng and rng.startswith("bytes="):
            spec = rng[len("bytes=") :]
            start_s, _, end_s = spec.partition("-")
            if start_s:
                start = int(start_s)
                end = min(int(end_s), len(data) - 1) if end_s else len(data) - 1
            else:  # suffix range: last N bytes
                start = max(0, len(data) - int(end_s))
                end = len(data) - 1
            if start >= len(data):
                self._error(416, "InvalidRange", rng)
                return
            chunk = data[start : end + 1]
            headers["Content-Range"] = f"bytes {start}-{end}/{len(data)}"
            self._reply(206, chunk, headers)
            return
        self._reply(200, data, headers)

    def _list(self, bucket: str, q: dict):
        prefix = q.get("prefix", "")
        token = q.get("continuation-token", "")
        max_keys = int(q.get("max-keys", "1000"))
        with self.server.lock:
            keys = sorted(
                k for (b, k) in self.server.objects if b == bucket and k.startswith(prefix)
            )
        if token:
            keys = [k for k in keys if k > token]
        page, rest = keys[:max_keys], keys[max_keys:]
        contents = "".join(
            f"<Contents><Key>{k}</Key>"
            f"<Size>{len(self.server.objects[(bucket, k)])}</Size></Contents>"
            for k in page
        )
        truncated = "true" if rest else "false"
        nxt = (
            f"<NextContinuationToken>{page[-1]}</NextContinuationToken>"
            if rest
            else ""
        )
        self._reply(
            200,
            _xml(
                f"<ListBucketResult><IsTruncated>{truncated}</IsTruncated>"
                f"<KeyCount>{len(page)}</KeyCount>{nxt}{contents}</ListBucketResult>"
            ),
            {"Content-Type": "application/xml"},
        )


class MiniS3Server(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), MiniS3Handler)
        self.objects: "dict[tuple[str, str], bytes]" = {}
        self.lock = threading.Lock()
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"

    def start(self) -> "MiniS3Server":
        self._thread.start()
        return self

    def stop(self) -> None:
        self.shutdown()
        self.server_close()
