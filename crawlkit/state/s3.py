"""Minimal S3 object-store connector: SigV4 REST client + URL helpers.

Closes the reference's MinIO sink seam (storage/handler.go:93-122 —
minio-go ``PutObject`` of versioned CSV fragments) with a REAL wire
protocol instead of a filesystem stand-in: ``TableStore`` accepts an
``s3://bucket/prefix`` root and routes every byte through this client,
so the fragment/manifest layout (delta-log versions, idempotent
re-commits, stat pruning) is byte-identical on local disk and on any
S3-compatible store (AWS, MinIO, Ceph RGW...).

Scope — deliberately small and dependency-free (stdlib only):

* ``sign_v4`` implements AWS Signature Version 4 (the public algorithm:
  canonical request → string-to-sign → HMAC chain) for path-style
  requests. It is used by the client to SIGN and by the conformance
  server (tests/minis3.py) to VERIFY — and because pyarrow's own
  ``S3FileSystem`` (AWS C++ SDK) signs the same way, the server
  verifying arrow's signatures is an independent check of this
  implementation.
* ``S3Client`` speaks exactly the five verbs the store needs:
  PutObject, GetObject (with Range), HeadObject, DeleteObject and
  ListObjectsV2 (with continuation). No multipart: fragments are
  written as single PUTs sized by the engine's own compaction, which
  is the right shape for immutable-fragment tables anyway.
* Streaming reads do NOT go through this client: ``TableStore.
  read_dataset`` hands Ray ``pyarrow.fs.S3FileSystem`` so parquet
  scans stay zero-copy ranged GETs inside Ray read tasks.

Credentials/endpoint come from the standard env names
(``AWS_ACCESS_KEY_ID``, ``AWS_SECRET_ACCESS_KEY``, ``AWS_ENDPOINT_URL``,
``AWS_REGION``) so worker processes reconstructing a store from its
root string need no extra plumbing.

Atomicity note (documented, not hidden): local roots publish versions
via tmp→link (atomic create-if-absent); on S3 the version CLAIM is a
conditional PUT (``If-None-Match: *`` → 412 if taken — S3's public
conditional-write API), so concurrent committers fence correctly on
both backends (losers rebase and retry; lancelike.py::_claim_version).
``_latest`` remains a last-writer-wins forward-only PUT, but it is a
HINT only — manifests fold from the version files, never the pointer.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import http.client
import os
import socket
import time
from urllib.parse import quote, urlsplit

_ALGO = "AWS4-HMAC-SHA256"
EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def signing_key(secret_key: str, date: str, region: str, service: str = "s3") -> bytes:
    """The SigV4 HMAC derivation chain (public algorithm)."""
    k = _hmac(("AWS4" + secret_key).encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def canonical_query(raw_query: str) -> str:
    """Sort the already-URI-encoded ``k=v`` pairs byte-wise (the S3
    canonical form; values keep their wire encoding, so the signer and
    the verifier agree as long as the sender encoded correctly)."""
    if not raw_query:
        return ""
    pairs = []
    for part in raw_query.split("&"):
        if not part:
            continue
        k, _, v = part.partition("=")
        pairs.append((k, v))
    return "&".join(f"{k}={v}" for k, v in sorted(pairs))


def string_to_sign(
    method: str,
    path: str,
    raw_query: str,
    headers: "dict[str, str]",
    signed_headers: "list[str]",
    payload_hash: str,
    amz_date: str,
    scope: str,
) -> str:
    """Canonical request → string-to-sign. ``path`` is the raw
    (already-encoded) request path — S3 does NOT double-encode URIs.
    ``headers`` must cover every name in ``signed_headers``
    (lowercase keys)."""
    canon_headers = "".join(
        f"{h}:{' '.join(headers[h].split())}\n" for h in signed_headers
    )
    creq = "\n".join(
        (
            method,
            path or "/",
            canonical_query(raw_query),
            canon_headers,
            ";".join(signed_headers),
            payload_hash,
        )
    )
    return "\n".join(
        (_ALGO, amz_date, scope, hashlib.sha256(creq.encode()).hexdigest())
    )


def sign_v4(
    method: str,
    path: str,
    raw_query: str,
    headers: "dict[str, str]",
    payload_hash: str,
    access_key: str,
    secret_key: str,
    region: str,
    amz_date: str,
) -> str:
    """Return the ``Authorization`` header value for the request."""
    date = amz_date[:8]
    scope = f"{date}/{region}/s3/aws4_request"
    lower = {k.lower(): v for k, v in headers.items()}
    signed = sorted(lower)
    sts = string_to_sign(
        method, path, raw_query, lower, signed, payload_hash, amz_date, scope
    )
    sig = hmac.new(
        signing_key(secret_key, date, region), sts.encode(), hashlib.sha256
    ).hexdigest()
    return (
        f"{_ALGO} Credential={access_key}/{scope}, "
        f"SignedHeaders={';'.join(signed)}, Signature={sig}"
    )


class S3Error(Exception):
    def __init__(self, status: int, code: str, message: str = ""):
        super().__init__(f"{status} {code}: {message}")
        self.status = status
        self.code = code


class S3Client:
    """Path-style SigV4 client over a pooled stdlib HTTP connection.

    One instance per actor/task (the T1 rule: construct in ``__init__``,
    never per request). Transient socket failures retry with backoff —
    every verb here is idempotent, so blind retry is safe.
    """

    def __init__(
        self,
        endpoint: str,
        access_key: str,
        secret_key: str,
        region: str = "us-east-1",
        timeout: float = 30.0,
        retries: int = 3,
    ):
        u = urlsplit(endpoint)
        if u.scheme not in ("http", "https"):
            raise ValueError(f"endpoint must be http(s)://, got {endpoint!r}")
        self._https = u.scheme == "https"
        self._host = u.hostname or "localhost"
        self._port = u.port or (443 if self._https else 80)
        self._host_hdr = u.netloc
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.timeout = timeout
        self.retries = retries
        self._conn: "http.client.HTTPConnection | None" = None

    @classmethod
    def from_env(cls) -> "S3Client":
        ep = os.environ.get("AWS_ENDPOINT_URL")
        if not ep:
            raise ValueError("AWS_ENDPOINT_URL is not set")
        return cls(
            ep,
            os.environ.get("AWS_ACCESS_KEY_ID", ""),
            os.environ.get("AWS_SECRET_ACCESS_KEY", ""),
            os.environ.get("AWS_REGION", "us-east-1"),
        )

    # --- wire ------------------------------------------------------------

    def _connect(self) -> http.client.HTTPConnection:
        if self._conn is None:
            cls = http.client.HTTPSConnection if self._https else http.client.HTTPConnection
            self._conn = cls(self._host, self._port, timeout=self.timeout)
        return self._conn

    def _request(
        self,
        method: str,
        path: str,
        raw_query: str = "",
        body: bytes = b"",
        extra_headers: "dict[str, str] | None" = None,
    ) -> "tuple[int, dict, bytes]":
        amz_date = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ"
        )
        payload_hash = hashlib.sha256(body).hexdigest() if body else EMPTY_SHA256
        headers = {
            "host": self._host_hdr,
            "x-amz-date": amz_date,
            "x-amz-content-sha256": payload_hash,
        }
        if extra_headers:
            headers.update({k.lower(): v for k, v in extra_headers.items()})
        auth = sign_v4(
            method,
            path,
            raw_query,
            headers,
            payload_hash,
            self.access_key,
            self.secret_key,
            self.region,
            amz_date,
        )
        send = dict(headers)
        send["Authorization"] = auth
        if body:
            send["Content-Length"] = str(len(body))
        url = path + (f"?{raw_query}" if raw_query else "")
        last: "Exception | None" = None
        for attempt in range(self.retries):
            try:
                conn = self._connect()
                conn.request(method, url, body=body or None, headers=send)
                resp = conn.getresponse()
                data = resp.read()
                return resp.status, dict(resp.getheaders()), data
            except (
                http.client.HTTPException,
                ConnectionError,
                socket.timeout,
                OSError,
            ) as e:  # stale pooled conn / transient net: reconnect + retry
                last = e
                self._conn = None
                if attempt + 1 < self.retries:
                    time.sleep(0.05 * (attempt + 1))
        raise S3Error(0, "ConnectionError", str(last))

    @staticmethod
    def _key_path(bucket: str, key: str) -> str:
        return "/" + quote(bucket, safe="") + "/" + quote(key, safe="/-_.~")

    @staticmethod
    def _err(status: int, body: bytes) -> S3Error:
        code = "Unknown"
        if b"<Code>" in body:
            code = body.split(b"<Code>")[1].split(b"</Code>")[0].decode()
        return S3Error(status, code, body[:200].decode(errors="replace"))

    # --- verbs -----------------------------------------------------------

    def put_object(
        self, bucket: str, key: str, data: bytes, if_none_match: bool = False
    ) -> str:
        """PUT; ``if_none_match=True`` sends ``If-None-Match: *`` (the
        S3 conditional write, public API since 2024) — the object is
        created only if absent; an existing key raises FileExistsError
        (HTTP 412). This is the multi-writer commit fence TableStore's
        version claims use on object roots."""
        extra = {"If-None-Match": "*"} if if_none_match else None
        st, hdrs, body = self._request(
            "PUT", self._key_path(bucket, key), body=data, extra_headers=extra
        )
        if st == 412 and if_none_match:
            raise FileExistsError(f"s3://{bucket}/{key} (PreconditionFailed)")
        if st not in (200, 201):
            raise self._err(st, body)
        return hdrs.get("ETag", "")

    def get_object(
        self, bucket: str, key: str, byte_range: "tuple[int, int] | None" = None
    ) -> bytes:
        extra = (
            {"Range": f"bytes={byte_range[0]}-{byte_range[1]}"} if byte_range else None
        )
        st, _, body = self._request(
            "GET", self._key_path(bucket, key), extra_headers=extra
        )
        if st == 404:
            raise FileNotFoundError(f"s3://{bucket}/{key}")
        if st not in (200, 206):
            raise self._err(st, body)
        return body

    def head_object(self, bucket: str, key: str) -> "dict | None":
        st, hdrs, _ = self._request("HEAD", self._key_path(bucket, key))
        if st == 404:
            return None
        if st != 200:
            raise S3Error(st, "HeadFailed", key)
        return {"size": int(hdrs.get("Content-Length", 0)), "etag": hdrs.get("ETag", "")}

    def delete_object(self, bucket: str, key: str) -> None:
        st, _, body = self._request("DELETE", self._key_path(bucket, key))
        if st not in (200, 204, 404):
            raise self._err(st, body)

    def list_objects(self, bucket: str, prefix: str = "") -> "list[dict]":
        """All keys under ``prefix`` (follows ListObjectsV2 continuation)."""
        out: "list[dict]" = []
        token = ""
        while True:
            q = [("list-type", "2"), ("prefix", quote(prefix, safe=""))]
            if token:
                q.append(("continuation-token", quote(token, safe="")))
            raw_query = "&".join(f"{k}={v}" for k, v in q)
            st, _, body = self._request("GET", "/" + quote(bucket, safe=""), raw_query)
            if st != 200:
                raise self._err(st, body)
            out.extend(_parse_listing(body))
            token = _xml_text(body, b"NextContinuationToken")
            if _xml_text(body, b"IsTruncated") != "true" or not token:
                return out


def _xml_text(body: bytes, tag: bytes) -> str:
    open_t, close_t = b"<" + tag + b">", b"</" + tag + b">"
    if open_t not in body:
        return ""
    return body.split(open_t, 1)[1].split(close_t, 1)[0].decode()


def _parse_listing(body: bytes) -> "list[dict]":
    out = []
    for chunk in body.split(b"<Contents>")[1:]:
        out.append(
            {
                "key": _xml_text(chunk, b"Key"),
                "size": int(_xml_text(chunk, b"Size") or 0),
            }
        )
    return out


class S3ObjectRoot:
    """An ``s3://bucket/prefix`` root exposing the few relative-path ops
    ``TableStore`` needs. Client construction is lazy so a store object
    can be pickled into Ray tasks and reconnect worker-side from env."""

    def __init__(self, root: str):
        u = urlsplit(root)
        if u.scheme != "s3" or not u.netloc:
            raise ValueError(f"not an s3 root: {root!r}")
        self.root = root.rstrip("/")
        self.bucket = u.netloc
        self.prefix = u.path.strip("/")
        self._client: "S3Client | None" = None

    def __reduce__(self):
        return (S3ObjectRoot, (self.root,))

    @property
    def client(self) -> S3Client:
        if self._client is None:
            self._client = S3Client.from_env()
        return self._client

    def _key(self, rel: str) -> str:
        return f"{self.prefix}/{rel}" if self.prefix else rel

    def read_bytes(self, rel: str) -> bytes:
        return self.client.get_object(self.bucket, self._key(rel))

    def write_bytes(self, rel: str, data: bytes, if_none_match: bool = False) -> None:
        self.client.put_object(
            self.bucket, self._key(rel), data, if_none_match=if_none_match
        )

    def exists(self, rel: str) -> bool:
        return self.client.head_object(self.bucket, self._key(rel)) is not None

    def delete(self, rel: str) -> None:
        self.client.delete_object(self.bucket, self._key(rel))

    def list(self, rel_prefix: str = "") -> "list[str]":
        pfx = self._key(rel_prefix)
        cut = len(self.prefix) + 1 if self.prefix else 0
        return [o["key"][cut:] for o in self.client.list_objects(self.bucket, pfx)]

    def uri(self, rel: str) -> str:
        return f"{self.root}/{rel}"

    def filesystem(self):
        """A ``pyarrow.fs.S3FileSystem`` for zero-copy ranged parquet
        scans inside Ray read tasks (signs with the same env creds)."""
        import pyarrow.fs as pafs

        ep = os.environ.get("AWS_ENDPOINT_URL", "")
        u = urlsplit(ep)
        return pafs.S3FileSystem(
            access_key=os.environ.get("AWS_ACCESS_KEY_ID", ""),
            secret_key=os.environ.get("AWS_SECRET_ACCESS_KEY", ""),
            region=os.environ.get("AWS_REGION", "us-east-1"),
            endpoint_override=u.netloc or None,
            scheme=u.scheme or "https",
        )
