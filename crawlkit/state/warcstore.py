"""WARC-style web-archive shards: distributed write, CDX index, parallel
range-read, and re-parse without re-fetching.

Web-scale crawls persist RAW fetched responses in WARC (ISO 28500) so
any later pipeline — re-extraction with new parsers, text mining,
training-data assembly — runs from the archive instead of re-hitting
the web. The reference stops at extracted entries and loose payload
files in MinIO (``storage/handler.go:66-123``); this module adds the
archival layer a production crawler needs, Ray-Data-first:

* **Write** is a ``map_batches`` actor stage: each batch of page rows is
  fetched (``SynthWeb`` — the sandbox's deterministic network) and
  serialized as one ``.warc.gz`` shard: each record an independent gzip
  member (standard WARC framing → any record is readable without
  scanning the shard). Shard names are CONTENT-deterministic
  (blake2b of the member URLs), so task retries and whole re-runs
  rewrite byte-identical files — never duplicate.
* **Index** (CDX analogue) rows ``(shard, offset, length, url, status,
  digest, schema…)`` are written as uncommitted :class:`TableStore`
  fragments in-task and committed ONCE by the driver — crash before
  commit leaves only invisible fragments (same contract as the
  entries/images stores).
* **Read** is index-driven: ``read_warc`` maps over committed index
  rows; each task preads exactly its ``(offset, length)`` ranges —
  embarrassingly parallel, no shard-alignment requirement, and a
  predicate on the index (host, status, schema) prunes I/O before any
  byte of archive is touched.
* **Re-parse** (``reparse_entries``) re-runs the registered parsers
  over archived HTML. Records carry ``WARC-X-*`` metadata headers
  (schema/domain/created/depth), so the archive is self-describing:
  re-extraction needs no side lookup. Parity with the live crawl's
  entries is pinned in tests/test_warcstore.py.

Scale notes (100 TB): shard size = write ``batch_size`` × mean record
size — tune batch_size so shards land ~0.5-1 GiB; the index is ~100
bytes/page (0.01 % of the archive) and is itself a parquet Dataset, so
index scans distribute. gzip members use ``mtime=0`` → byte-stable.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from crawlkit.state.lancelike import TableStore

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_WARC_DATE = "2026-01-01T00:00:00Z"  # fixed: shards are content-addressed
_REASON = {
    200: "OK",
    301: "Moved Permanently",
    304: "Not Modified",
    404: "Not Found",
    503: "Service Unavailable",
}

INDEX_SCHEMA = pa.schema(
    [
        ("shard", pa.string()),
        ("offset", pa.int64()),
        ("length", pa.int64()),
        ("url", pa.string()),
        ("status", pa.int32()),
        # "response" | "revisit": a revisit row's payload_digest is the
        # digest of the CONTENT it refers to (held by some response row,
        # possibly in another generation) — readers that need bytes must
        # resolve it; readers of digests (delta, change_rate) need not
        ("record_type", pa.string()),
        ("content_type", pa.string()),
        ("nbytes", pa.int64()),
        ("payload_digest", pa.string()),
        ("schema_name", pa.string()),
        ("schema_version", pa.string()),
        ("domain", pa.string()),
        ("created", pa.string()),
        ("depth", pa.int32()),
    ]
)

RECORD_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.int32()),
        ("record_type", pa.string()),
        ("content_type", pa.string()),
        ("location", pa.string()),
        ("refers_to_digest", pa.string()),
        ("body", pa.binary()),
        ("nbytes", pa.int64()),
        ("payload_digest", pa.string()),
        ("schema_name", pa.string()),
        ("schema_version", pa.string()),
        ("domain", pa.string()),
        ("created", pa.string()),
        ("depth", pa.int32()),
    ]
)


def build_record(
    url: str,
    status: int,
    body: bytes,
    meta: dict | None = None,
    content_type: str = "text/html",
    location: str | None = None,
    revisit_of: str | None = None,
    revisit_profile: str = "server-not-modified",
) -> bytes:
    """One WARC/1.0 response record as an independent gzip member.

    ``meta`` (schema_name/schema_version/domain/created/depth) is
    embedded as ``WARC-X-*`` headers so the archive re-parses without
    any external lookup. ``content_type`` is the payload's real HTTP
    Content-Type (``image/png`` for archived image bytes) — downstream
    text stages (WET, link graph) filter on it, Common-Crawl style.
    ``revisit_of``: the sha1 of identical content this record refers to —
    the record becomes a WARC *revisit* record, empty-bodied but carrying
    the content digest, so the generation's index stays complete for
    archive_delta / change_rate. ``revisit_profile`` picks the standard
    profile: ``server-not-modified`` (a 304 answer — the conditional
    recrawl path) or ``identical-payload-digest`` (the fetched bytes
    already exist under some other capture — Common-Crawl-style
    URL-agnostic deduplication).
    """
    digest = hashlib.sha1(body).hexdigest()
    reason = _REASON.get(status, "")
    loc_line = f"Location: {location}\r\n" if location else ""
    http = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"{loc_line}"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    lines = [
        "WARC/1.0",
        "WARC-Type: revisit" if revisit_of else "WARC-Type: response",
        f"WARC-Target-URI: {url}",
        f"WARC-Date: {_WARC_DATE}",
        f"WARC-Record-ID: <urn:sha1:{digest}>",
        f"WARC-Payload-Digest: sha1:{digest}",
        "Content-Type: application/http; msgtype=response",
        f"Content-Length: {len(http)}",
    ]
    if revisit_of:
        lines.insert(
            2, f"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/{revisit_profile}"
        )
        lines.insert(3, f"WARC-Refers-To-Payload-Digest: sha1:{revisit_of}")
    for k, v in (meta or {}).items():
        lines.append(f"WARC-X-{k}: {v}")
    raw = ("\r\n".join(lines) + "\r\n\r\n").encode() + http + b"\r\n\r\n"
    return gzip.compress(raw, mtime=0)


def parse_record(raw: bytes) -> dict:
    """Inverse of :func:`build_record` for one decompressed record."""
    head, rest = raw.split(b"\r\n\r\n", 1)
    warc: dict[str, str] = {}
    for ln in head.decode().split("\r\n")[1:]:
        k, _, v = ln.partition(": ")
        warc[k] = v
    clen = int(warc["Content-Length"])
    http = rest[:clen]
    hhead, body = http.split(b"\r\n\r\n", 1)
    status = int(hhead.split(b" ", 2)[1])
    content_type = "text/html"
    location = ""
    for hl in hhead.decode().split("\r\n")[1:]:
        hk, _, hv = hl.partition(": ")
        if hk.lower() == "content-type":
            content_type = hv
        elif hk.lower() == "location":
            location = hv
    digest = warc.get("WARC-Payload-Digest", "")[len("sha1:") :]
    if hashlib.sha1(body).hexdigest() != digest:
        raise ValueError(f"payload digest mismatch for {warc.get('WARC-Target-URI')}")
    return {
        "url": warc.get("WARC-Target-URI", ""),
        "status": status,
        "record_type": warc.get("WARC-Type", "response"),
        "content_type": content_type,
        "location": location,
        "refers_to_digest": warc.get("WARC-Refers-To-Payload-Digest", "")[
            len("sha1:"):
        ],
        "body": body,
        "nbytes": len(body),
        "payload_digest": digest,
        "schema_name": warc.get("WARC-X-schema_name", ""),
        "schema_version": warc.get("WARC-X-schema_version", ""),
        "domain": warc.get("WARC-X-domain", ""),
        "created": warc.get("WARC-X-created", ""),
        "depth": int(warc.get("WARC-X-depth", "0")),
    }


def _shard_key(urls: list[str]) -> str:
    h = hashlib.blake2b(digest_size=8)
    for u in urls:
        h.update(u.encode())
        h.update(b"\x1f")
    return f"w-{h.hexdigest()}"


_META_KEYS = ("schema_name", "schema_version", "domain", "created", "depth")


class WarcWriter:
    """In-task WARC shard + index-fragment writer (no Ray dependency —
    usable from any map_batches stage, including the crawl's fused fetch
    task, which archives the bytes it ACTUALLY fetched)."""

    def __init__(self, root: str):
        self.root = root
        self.store = TableStore(f"{root}/index")
        os.makedirs(f"{root}/shards", exist_ok=True)

    def write_batch(self, records: list[dict]) -> dict:
        """``records``: dicts with url, status, body (bytes) + the
        ``_META_KEYS``. Returns the uncommitted index-fragment meta
        (commit is the driver's single atomic step). Records are sorted
        by url so shard bytes are arrival-order independent."""
        records = sorted(records, key=lambda r: r["url"])
        urls = [r["url"] for r in records]
        key = _shard_key(urls)
        shard_rel = f"shards/{key}.warc.gz"
        shard_path = f"{self.root}/{shard_rel}"
        members: list[bytes] = []
        index_rows: list[dict] = []
        offset = 0
        for r in records:
            body = r["body"]
            ctype = r.get("content_type", "text/html")
            meta = {k: r.get(k, "" if k != "depth" else 0) for k in _META_KEYS}
            member = build_record(
                r["url"], r["status"], body, meta, content_type=ctype,
                location=r.get("location"),
                revisit_of=r.get("revisit_digest"),
                revisit_profile=r.get("revisit_profile", "server-not-modified"),
            )
            members.append(member)
            index_rows.append(
                {
                    "shard": shard_rel,
                    "offset": offset,
                    "length": len(member),
                    "url": r["url"],
                    "status": r["status"],
                    "record_type": "revisit" if r.get("revisit_digest") else "response",
                    "content_type": ctype,
                    "nbytes": len(body),
                    # a revisit row indexes the digest of the UNCHANGED
                    # content it refers to — cross-generation delta /
                    # change-rate see continuity, not a removal
                    "payload_digest": r.get("revisit_digest")
                    or hashlib.sha1(body).hexdigest(),
                    **meta,
                }
            )
            offset += len(member)
        tmp = shard_path + f".tmp-{key}"
        with open(tmp, "wb") as f:
            f.write(b"".join(members))
        os.replace(tmp, shard_path)  # atomic; retries rewrite same bytes
        idx = pa.Table.from_pylist(index_rows, schema=INDEX_SCHEMA)
        # prune-relevant bounds only (cdx_lookup prunes on url;
        # restore/read filters use depth+status) — digest/shard/path
        # bounds are un-prunable weight on every control row
        return self.store.write_fragment(
            idx, key, stats_cols=["url", "status", "depth"]
        )


class ArchiveFetchWrite:
    """Actor-pool stage: page rows → one ``.warc.gz`` shard per batch +
    uncommitted index fragment; emits the fragment metas for the
    driver's single atomic commit.

    Input batch columns: ``url`` (+ optional ``schema_name``,
    ``schema_version``, ``domain``, ``created``, ``depth``). Rows are
    sorted by url inside the batch so the shard key — and therefore the
    shard bytes — are independent of upstream arrival order (the
    crawl_dist determinism lesson).
    """

    def __init__(self, web_config, root: str):
        from crawlkit.synthweb import SynthWeb

        self.web = SynthWeb(web_config)
        self.writer = WarcWriter(root)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from crawlkit.stages.fetch import FRAG_META_SCHEMA

        n = batch.num_rows

        def col(name: str, default):
            if name in batch.column_names:
                return batch[name].to_pylist()
            return [default] * n

        meta_cols = {k: col(k, 0 if k == "depth" else "") for k in _META_KEYS}
        records = []
        for i, url in enumerate(batch["url"].to_pylist()):
            r = self.web.fetch(url, attempt=self.web.fail_attempts(url) + 1)
            records.append(
                {
                    "url": url,
                    "status": r.status,
                    "body": (r.body or "").encode(),
                    **{k: v[i] for k, v in meta_cols.items()},
                }
            )
        meta = self.writer.write_batch(records)
        return pa.Table.from_pylist([meta], schema=FRAG_META_SCHEMA)


def archive_pages(
    web_config,
    pages: "ray.data.Dataset",
    root: str,
    *,
    batch_size: int = 256,
    concurrency: int = 4,
) -> TableStore:
    """Archive every page row of ``pages`` into WARC shards under
    ``root``; returns the committed index :class:`TableStore`.

    Streaming end to end: shards + index fragments are written in-task;
    only the tiny frag-meta rows reach the driver for the atomic commit.
    """
    metas = pages.map_batches(
        ArchiveFetchWrite,
        fn_constructor_args=(web_config, root),
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
        max_restarts=0,
    ).take_all()  # frag metas: one row per shard — driver-size by design
    store = TableStore(f"{root}/index")
    store.commit_fragments([dict(m) for m in metas])
    return store


def _read_record_ranges(batch: pa.Table, root: str) -> pa.Table:
    """Index rows → archived records via exact-range preads (one file
    open per distinct shard in the batch, offsets read in file order)."""
    shards = batch["shard"].to_pylist()
    offsets = np.asarray(batch["offset"].to_pylist(), dtype=np.int64)
    lengths = np.asarray(batch["length"].to_pylist(), dtype=np.int64)
    order = sorted(range(len(shards)), key=lambda i: (shards[i], int(offsets[i])))
    rows: list[dict] = [None] * len(shards)  # type: ignore[list-item]
    fh = None
    fh_shard = None
    try:
        for i in order:
            s = shards[i]
            if s != fh_shard:
                if fh is not None:
                    fh.close()
                fh = open(os.path.join(root, s), "rb")
                fh_shard = s
            fh.seek(int(offsets[i]))
            raw = gzip.decompress(fh.read(int(lengths[i])))
            rows[int(i)] = parse_record(raw)
    finally:
        if fh is not None:
            fh.close()
    return pa.Table.from_pylist(rows, schema=RECORD_SCHEMA)


_REF_SEP = "\x1f"


def _referent_locations(roots: list[str]) -> "ray.data.Dataset":
    """digest → packed best content-record location across an archive
    generation chain (newest first wins): every response row's location
    is packed into one lexicographically-ordered string
    ``gen|offset|length|shard`` so a single ``Min`` aggregation picks the
    newest generation's copy deterministically — index-only, the same
    16-bytes-per-row shuffle discipline as the dedup engines."""
    import pyarrow.compute as pc
    import ray.data  # noqa: F401

    from ray.data.aggregate import Min

    parts = []
    for g, rroot in enumerate(roots):
        rds = TableStore(f"{rroot}/index").read_dataset()

        def slim(t: pa.Table, g=g) -> pa.Table:
            t = t.filter(
                pc.and_(
                    pc.equal(t["record_type"], "response"),
                    pc.equal(t["status"], 200),
                )
            )
            gcol = pa.array([f"{g:03d}"] * t.num_rows, pa.string())
            off = pc.utf8_lpad(pc.cast(t["offset"], pa.string()), 15, "0")
            ln = pc.utf8_lpad(pc.cast(t["length"], pa.string()), 15, "0")
            packed = pc.binary_join_element_wise(gcol, off, ln, t["shard"], _REF_SEP)
            return pa.table({"ref_digest": t["payload_digest"], "ref_loc": packed})

        parts.append(rds.map_batches(slim, batch_format="pyarrow"))
    allr = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    return allr.groupby("ref_digest").aggregate(Min("ref_loc", alias_name="ref_loc"))


_REVISIT_META = ("url", "schema_name", "schema_version", "domain", "created", "depth")


def _read_resolved(batch: pa.Table, roots: list[str]) -> pa.Table:
    """Joined (revisit index row × referent location) → reconstructed
    content records: the referent's bytes under the revisit capture's
    url + crawl metadata (how pywb/warcio replay revisit records)."""
    locs = [loc.split(_REF_SEP) for loc in batch["ref_loc"].to_pylist()]
    shards = [f"{roots[int(g)]}/{shard}" for g, _, _, shard in locs]
    offsets = [int(off) for _, off, _, _ in locs]
    lengths = [int(ln) for _, _, ln, _ in locs]
    order = sorted(range(len(locs)), key=lambda i: (shards[i], offsets[i]))
    meta = {k: batch[k].to_pylist() for k in _REVISIT_META}
    rows: list[dict] = [None] * len(locs)  # type: ignore[list-item]
    fh, fh_shard = None, None
    try:
        for i in order:
            if shards[i] != fh_shard:
                if fh is not None:
                    fh.close()
                fh = open(shards[i], "rb")
                fh_shard = shards[i]
            fh.seek(offsets[i])
            rec = parse_record(gzip.decompress(fh.read(lengths[i])))
            rec.update({k: meta[k][i] for k in _REVISIT_META})
            rows[i] = rec
    finally:
        if fh is not None:
            fh.close()
    return pa.Table.from_pylist(rows, schema=RECORD_SCHEMA)


def read_warc(
    root: str,
    *,
    version: int | None = None,
    index_filter=None,
    batch_size: int = 512,
    resolve_revisits: bool = False,
    resolve_roots: list[str] | None = None,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Archived records as a Ray Dataset, driven by the committed index.

    ``index_filter(index_ds) -> index_ds`` lets callers prune (by host,
    status, schema, url prefix) BEFORE any archive byte is read — the
    WARC analogue of parquet predicate pushdown.

    ``resolve_revisits=True`` reconstructs revisit records (304
    server-not-modified captures and identical-payload-digest
    deduplicated captures) into full content records: the referent
    bytes are found by digest across ``resolve_roots`` (an archive
    generation chain, newest first; defaults to ``[root]``) via an
    index-level hash join — no archive byte moves for the resolution
    itself, and each referent range is read exactly once per resolved
    row. Revisits whose digest no generation holds are dropped (the
    callers' refetch path covers them)."""
    import pyarrow.compute as pc  # noqa: F401  (filters below)

    store = TableStore(f"{root}/index")
    idx = store.read_dataset(version)
    if index_filter is not None:
        idx = index_filter(idx)
    if not resolve_revisits:
        return idx.map_batches(
            _read_record_ranges,
            fn_kwargs={"root": root},
            batch_size=batch_size,
            batch_format="pyarrow",
        )
    from crawlkit.pipelines.dedup import _nonempty_blocks

    roots = list(resolve_roots) if resolve_roots else [root]
    direct = idx.filter(expr="record_type == 'response'").map_batches(
        _read_record_ranges,
        fn_kwargs={"root": root},
        batch_size=batch_size,
        batch_format="pyarrow",
    )

    def slim_revisit(t: pa.Table) -> pa.Table:
        return t.select(["payload_digest", *_REVISIT_META])

    rev_schema = pa.schema(
        [("payload_digest", pa.string())]
        + [(k, pa.int32() if k == "depth" else pa.string()) for k in _REVISIT_META]
    )
    revisit = _nonempty_blocks(
        idx.filter(expr="record_type == 'revisit'").map_batches(
            slim_revisit, batch_format="pyarrow"
        ),
        rev_schema,
    )
    ref_best = _nonempty_blocks(
        _referent_locations(roots),
        pa.schema([("ref_digest", pa.string()), ("ref_loc", pa.string())]),
    )
    joined = revisit.join(
        ref_best,
        join_type="inner",
        num_partitions=num_partitions,
        on=("payload_digest",),
        right_on=("ref_digest",),
    )
    resolved = joined.map_batches(
        _read_resolved,
        fn_kwargs={"roots": roots},
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    return direct.union(resolved)


def wet_extract(records: "ray.data.Dataset") -> "ray.data.Dataset":
    """WARC → WET: plain-text conversion of archived HTML (the
    Common-Crawl WET analogue that feeds the text/LLM-data pipeline).

    Fully vectorized — Arrow RE2 kernels only (strip tags → decode the
    few entities the synth web emits → collapse whitespace → count
    words); zero Python per row. Output: (url, schema_name, depth,
    text, nwords, nbytes). Non-HTML records (archived image payloads,
    ``content_type != text/*``) are dropped batch-side — the
    Common-Crawl WET rule."""

    def to_wet(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # only CONTENT records: 301 hops, 304 revisits and deduplicated
        # identical-payload revisits carry a text/html HTTP header but
        # no payload — without the status + record-type filter they
        # read as empty zero-word documents (pass the records through
        # resolve_revisits first to include deduplicated captures)
        t = t.filter(
            pc.and_(
                pc.and_(
                    pc.starts_with(t["content_type"], "text/"),
                    pc.equal(t["status"], 200),
                ),
                pc.equal(t["record_type"], "response"),
            )
        )
        html = pc.cast(t["body"], pa.string())
        txt = pc.replace_substring_regex(html, pattern=r"<[^>]*>", replacement=" ")
        txt = pc.replace_substring_regex(txt, pattern=r"\s+", replacement=" ")
        txt = pc.utf8_trim_whitespace(txt)
        return pa.table(
            {
                "url": t["url"],
                "schema_name": t["schema_name"],
                "depth": t["depth"],
                "text": txt,
                "nwords": pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64()),
                "nbytes": pc.cast(pc.utf8_length(txt), pa.int64()),
            }
        )

    return records.map_batches(to_wet, batch_format="pyarrow")


_WAT_LINK = pa.struct(
    [("url", pa.string()), ("text", pa.string()), ("kind", pa.string())]
)
WAT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("schema_name", pa.string()),
        ("depth", pa.int32()),
        ("content_type", pa.string()),
        ("nbytes", pa.int64()),
        ("payload_digest", pa.string()),
        ("n_links", pa.int64()),
        ("links", pa.list_(_WAT_LINK)),
    ]
)


def wat_extract(records: "ray.data.Dataset") -> "ray.data.Dataset":
    """WARC → WAT: per-record METADATA extraction (the Common-Crawl WAT
    analogue) — one row per content record carrying the envelope
    (url, digest, payload size) plus the outlink metadata a WAT's
    ``HTML-Metadata/Links`` array holds: EVERY anchor and image
    reference with its anchor text, as a nested Arrow
    ``list<struct{url, text, kind}>`` column.

    Strictly richer than :func:`extract_links` (which keeps only
    crawlable offer/pager edges): WAT also records the non-crawlable
    ``#`` nav anchor (kind='nav') and image references with their
    figcaptions (kind='img') — the anchor-text corpus LLM pipelines
    mine. Compiled-regex per row inside the batch task (same contract
    as stages/parsers); nested output stays Arrow end-to-end, so
    downstream ops flatten with ``pc.list_flatten`` — no Python object
    columns. Pass the records through ``resolve_revisits`` first to
    include deduplicated captures."""
    import re

    _offer_a = re.compile(r'<h3><a href="([^"]+)"><span><span>([^<]*)</span>')
    _pager_block = re.compile(r'<div id="pagerForm">(.*?)</div>', re.S)
    _pager_a = re.compile(r'<li><a href="([^"]+)">([^<]*)</a>')
    _img = re.compile(r'<img data-image-id="[^"]*" src="([^"]+)"/>'
                      r"(?:<figcaption>([^<]*)</figcaption>)?")

    def to_wat(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(
            pc.and_(
                pc.and_(
                    pc.starts_with(t["content_type"], "text/"),
                    pc.equal(t["status"], 200),
                ),
                pc.equal(t["record_type"], "response"),
            )
        )
        rows: list[dict] = []
        for r in t.to_pylist():
            html = r["body"].decode()
            src = r["url"]
            links: list[dict] = []
            for dst, text in _offer_a.findall(html):
                links.append({"url": dst, "text": text, "kind": "offer"})
            m = _pager_block.search(html)
            if m:
                base = src.split("?", 1)[0]  # RFC 3986: "?q" replaces query
                for q, text in _pager_a.findall(m.group(1)):
                    if q.startswith("#"):  # non-crawlable nav anchor
                        links.append({"url": src + q, "text": text, "kind": "nav"})
                    else:
                        links.append({"url": base + q, "text": text, "kind": "page"})
            for isrc, cap in _img.findall(html):
                links.append({"url": isrc, "text": cap or "", "kind": "img"})
            rows.append(
                {
                    "url": src,
                    "schema_name": r["schema_name"],
                    "depth": r["depth"],
                    "content_type": r["content_type"],
                    "nbytes": r["nbytes"],
                    "payload_digest": r["payload_digest"],
                    "n_links": len(links),
                    "links": links,
                }
            )
        return pa.Table.from_pylist(rows, schema=WAT_SCHEMA)

    return records.map_batches(to_wat, batch_format="pyarrow")


def compact_archive(
    root: str, target_bytes: int = 256 << 20, num_partitions: int = 8
) -> int:
    """Consolidate many small ``.warc.gz`` shards into ~``target_bytes``
    shards — the archive-maintenance step a long crawl needs (the fused
    fetch stage writes one shard per task; a bench crawl leaves ~2,700
    small files, and at 10^10 records per-file open cost dominates).

    gzip members are independent, so compaction is PURE BYTE MOVEMENT:
    each record's compressed member is copied verbatim into its new
    shard — no decompress/recompress, digests and record bytes
    unchanged. Planning happens on the INDEX alone (~100 bytes/record):
    rows sort by url (locality for later prefix reads — this also makes
    the new fragment url-stat bounds TIGHT, so ``cdx_lookup`` pruning
    improves) and bin-pack into ~target_bytes bins; each bin rewrites
    in its own task with a content-keyed deterministic shard name
    (idempotent retries — re-running compaction is a no-op version).
    The new index commits as a SNAPSHOT version: old versions still
    reference the old shards (time travel) until :func:`gc_shards`.
    Returns the committed index version."""
    import json

    import pandas as pd
    import ray.data as rd

    store = TableStore(f"{root}/index")
    idx = store.read_table()
    if idx.num_rows == 0:
        return store.latest_version()
    df = idx.to_pandas().sort_values("url", kind="mergesort").reset_index(drop=True)
    start = df["length"].cumsum() - df["length"]
    df["_bin"] = (start // target_bytes).astype("int64")

    def rewrite_bin(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("url", kind="mergesort").reset_index(drop=True)
        key = _shard_key(list(g["url"]))
        shard_rel = f"shards/{key}.warc.gz"
        buf: list[bytes] = []
        # read members grouped by source shard, offset-ordered: one
        # sequential pass per old file
        order = g.sort_values(["shard", "offset"]).index
        chunks: dict[int, bytes] = {}
        fh, cur = None, None
        try:
            for i in order:
                s = g.at[i, "shard"]
                if s != cur:
                    if fh is not None:
                        fh.close()
                    fh = open(f"{root}/{s}", "rb")
                    cur = s
                fh.seek(int(g.at[i, "offset"]))
                chunks[i] = fh.read(int(g.at[i, "length"]))
        finally:
            if fh is not None:
                fh.close()
        offset = 0
        new_off = []
        for i in range(len(g)):
            buf.append(chunks[i])
            new_off.append(offset)
            offset += len(chunks[i])
        tmp = f"{root}/{shard_rel}.tmp-{key}"
        with open(tmp, "wb") as f:
            f.write(b"".join(buf))
        os.replace(tmp, f"{root}/{shard_rel}")
        out = g.drop(columns=["_bin"]).copy()
        out["shard"] = shard_rel
        out["offset"] = new_off
        new_idx = pa.Table.from_pandas(
            out[[f.name for f in INDEX_SCHEMA]], preserve_index=False
        ).cast(INDEX_SCHEMA)
        meta = TableStore(f"{root}/index").write_fragment(
            new_idx, key, stats_cols=["url", "status", "depth"]
        )
        # clean-arrow return: pandas-metadata dicts break Ray's
        # block-schema hash dedup (CLAUDE.md gotcha)
        return pa.table({"meta_json": pa.array([json.dumps(meta)], pa.string())})

    metas = (
        rd.from_arrow(
            pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
        )
        .repartition(num_partitions)
        .groupby("_bin")
        .map_groups(rewrite_bin, batch_format="pandas")
        .to_pandas()
    )
    frags = [json.loads(m) for m in metas["meta_json"]]
    return store.commit_snapshot(sorted(frags, key=lambda f: f["key"]))


def gc_shards(root: str) -> int:
    """Delete shard files the LATEST index version no longer references
    (post-compaction garbage collection). DESTRUCTIVE for time travel:
    older versions that referenced the removed shards stop being
    range-readable; run only once the compacted version is the accepted
    state. Returns the number of files removed."""
    import glob as _glob

    store = TableStore(f"{root}/index")
    t = store.read_table(columns=["shard"])
    if "shard" not in t.column_names:
        # empty index (zero committed fragments) → nothing is live, but
        # deleting every shard on a missing index is too destructive a
        # reading of "empty"; treat it as nothing-to-gc instead.
        return 0
    live = set(t["shard"].to_pylist())
    removed = 0
    for p in _glob.glob(f"{root}/shards/*.warc.gz"):
        rel = os.path.relpath(p, root)
        if rel not in live:
            os.remove(p)
            removed += 1
    return removed


def cdx_lookup(
    root: str, url_prefix: str, *, version: int | None = None
) -> "ray.data.Dataset":
    """Common-Crawl CDX-API analogue: the archive's index rows whose
    url starts with ``url_prefix`` (a host, a path subtree, one url).

    Scan planning runs BEFORE any file I/O: fragment-stat pruning keeps
    only index fragments whose manifest [url_lo, url_hi] bounds
    intersect the prefix range (the Iceberg planning step —
    ``TableStore.pruned_paths``; fused fetch tasks write host-block
    fragments, so host-prefix queries open a small fraction of the
    files), then an exact vectorized ``starts_with`` filter runs on the
    survivors. Callers chain the result into ``read_warc``-style range
    reads for the record bytes. At 100 TB the CDX is the only thing
    scanned — never the WARC shards."""
    import ray.data as rd
    import pyarrow.compute as _pc

    store = TableStore(f"{root}/index")
    # half-open prefix range [prefix, prefix+1): bump the last code
    # point that CAN be bumped (carry-propagate past U+10FFFF); an
    # empty/unbumpable prefix falls back to an unpruned scan.
    hi = None
    for cut in range(len(url_prefix), 0, -1):
        if ord(url_prefix[cut - 1]) < 0x10FFFF:
            hi = url_prefix[: cut - 1] + chr(ord(url_prefix[cut - 1]) + 1)
            break
    if hi is not None:
        paths, _pruned = store.pruned_paths({"url": (url_prefix, hi)}, version)
    else:
        paths = store.fragment_paths(version)
    if not paths:
        return rd.from_arrow(INDEX_SCHEMA.empty_table())

    def exact(t: pa.Table) -> pa.Table:
        return t.filter(_pc.starts_with(t["url"], url_prefix))

    return rd.read_parquet(paths).map_batches(exact, batch_format="pyarrow")


def load_prior_index(roots: "list[str] | str") -> dict:
    """Driver-side, BROADCASTABLE prior-generation CDX index for the
    fetch stage's conditional-recrawl (304 body reuse) and
    archive-dedup (identical-payload revisit) paths.

    Returns a dict of sorted numpy byte arrays — zero-copy through the
    Ray object store, so ``ray.put`` once on the driver and every fetch
    worker maps the SAME plasma pages instead of re-reading ~2,700
    index fragments and rebuilding Python dicts per worker (measured
    6.7 s/worker × 28 workers at bench scale; the broadcast build is
    ~2 s once). Lookups are ``np.searchsorted``:

    * ``url_keys``/``url_digests`` — sorted canon-url bytes → payload
      sha1 (response AND revisit rows: a revisit indexes the digest of
      the content it refers to).
    * ``body_digests`` + aligned ``body_gen/body_shard_idx/
      body_offset/body_length`` — sorted content digests → the newest
      generation's record location (first-wins across the
      newest-first chain, matching the per-worker setdefault path).
    * ``roots``/``shards`` — small Python lists resolving the int
      indexes back to paths.

    At multi-node scale the same structure hash-partitions into keyed
    shard lookups; in-cluster it is one object-store copy per node."""
    import numpy as np
    import pyarrow.compute as pc

    from crawlkit import canon

    roots = [roots] if isinstance(roots, str) else list(roots)
    uk_parts, ud_parts = [], []
    bd_parts, bg_parts, bs_parts, bo_parts, bl_parts = [], [], [], [], []
    shards: list[str] = []
    for g, root in enumerate(roots):  # newest first: first writer wins
        idx = TableStore(f"{root}/index").read_table(
            columns=["url", "status", "record_type", "shard", "offset",
                     "length", "payload_digest"]
        )
        if "url" not in idx.column_names:  # empty/absent index
            continue
        if "record_type" not in idx.column_names:
            # pre-record_type archive: every row is a plain response
            idx = idx.append_column(
                "record_type", pa.array(["response"] * idx.num_rows)
            )
        if "payload_digest" not in idx.column_names:
            # no digests recorded → synthesize a unique-per-record
            # placeholder (never equal to a real sha1 hex nor to another
            # row's), preserving the original status==200 semantics:
            # each url resolves to exactly its own archived body and
            # identical-payload dedup simply never triggers.
            from crawlkit.hashing import stable_hash_bytes

            idx = idx.append_column(
                "payload_digest",
                pa.array(
                    [
                        # 'loc:' + 32 hex = 36 chars — fits the S40 numpy
                        # dtype the broadcast index uses, never collides
                        # with a real 40-hex sha1
                        "loc:" + stable_hash_bytes(g, s, o, size=16).hex()
                        for s, o in zip(
                            idx["shard"].to_pylist(), idx["offset"].to_pylist()
                        )
                    ]
                ),
            )
        resp = pc.and_(
            pc.equal(idx["record_type"], "response"), pc.equal(idx["status"], 200)
        )
        known = idx.filter(pc.or_(resp, pc.equal(idx["record_type"], "revisit")))
        if known.num_rows:
            cus = canon.canonicalize_urls(known["url"])
            # encode explicitly: np.array(str, dtype='S') is ASCII-only
            # and would raise on IDN/utf-8 urls
            uk_parts.append(
                np.array([u.encode() for u in cus.to_pylist()], dtype="S")
            )
            ud_parts.append(np.array(known["payload_digest"].to_pylist(), dtype="S40"))
        bodies = idx.filter(resp)
        if bodies.num_rows:
            bd_parts.append(np.array(bodies["payload_digest"].to_pylist(), dtype="S40"))
            bg_parts.append(np.full(bodies.num_rows, g, dtype=np.int32))
            # vectorized shard-name factorization (dictionary-encode,
            # then offset the codes into the global shard list)
            denc = pc.dictionary_encode(
                bodies["shard"].combine_chunks()
            )
            local_names = denc.dictionary.to_pylist()
            base = len(shards)
            shards.extend(local_names)
            bs_parts.append(denc.indices.to_numpy().astype(np.int32) + base)
            bo_parts.append(bodies["offset"].to_numpy())
            bl_parts.append(bodies["length"].to_numpy())

    def first_wins(keys_parts, *aligned_parts):
        if not keys_parts:
            return (np.array([], dtype="S1"),) + tuple(
                np.array([], dtype=np.int64) for _ in aligned_parts
            )
        keys = np.concatenate(keys_parts)
        aligned = [np.concatenate(p) for p in aligned_parts]
        # np.unique keeps the FIRST occurrence in array order — the
        # newest-first concatenation makes that the setdefault semantics
        ukeys, first = np.unique(keys, return_index=True)
        return (ukeys,) + tuple(a[first] for a in aligned)

    url_keys, url_digests = first_wins(uk_parts, ud_parts)
    body_digests, body_gen, body_shard_idx, body_offset, body_length = first_wins(
        bd_parts, bg_parts, bs_parts, bo_parts, bl_parts
    )
    return {
        "url_keys": url_keys, "url_digests": url_digests,
        "body_digests": body_digests, "body_gen": body_gen,
        "body_shard_idx": body_shard_idx, "body_offset": body_offset,
        "body_length": body_length, "roots": roots, "shards": shards,
    }


def sorted_member_mask(keys: "np.ndarray", queries: "np.ndarray") -> "np.ndarray":
    """Vectorized membership of ``queries`` in the SORTED byte array
    ``keys`` (searchsorted + equality check) — the lookup primitive for
    the broadcast prior index."""
    import numpy as np

    if len(keys) == 0 or len(queries) == 0:
        return np.zeros(len(queries), dtype=bool)
    pos = np.searchsorted(keys, queries)
    pos_c = np.minimum(pos, len(keys) - 1)
    return keys[pos_c] == queries


def anchor_text_topk(
    root: str, k: int = 10, nshards: int = 16
) -> "pd.DataFrame":
    """ANCHOR-TEXT CORPUS from the WAT layer — the classic web-scale
    signal (link text describing the TARGET page; used for IR ranking
    and query/title training data since McBryan '94 / Google '98).

    Shape: WAT records → Arrow-flatten to slim (dst, text) edges
    (crawlable anchors only — offer/page kinds; the nav '#' and img
    refs carry no inbound description) → hash-shard by dst
    (``hash64_np`` — never Python ``hash()``) → ONE per-shard pandas
    reduce emits per-dst sufficient stats (anchors, distinct_texts,
    top_text = most frequent, ties → lexicographically smallest) plus a
    per-shard partial top-k, merged on the driver (≤ k×nshards rows —
    the anchor corpus itself never leaves the cluster). Returns the
    global top-k dsts by inbound anchor count."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from crawlkit.hashing import hash64_np

    wat = wat_extract(
        read_warc(
            root,
            index_filter=lambda ds: ds.filter(expr="content_type == 'text/html'"),
        )
    )

    def flatten(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        flat = pc.list_flatten(t["links"])
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        keep = pc.is_in(flat.field("kind"), value_set=pa.array(["offer", "page"]))
        dst = pc.filter(flat.field("url"), keep)
        text = pc.filter(flat.field("text"), keep)
        shard = pa.array(
            (hash64_np(dst.to_pylist()) % np.uint64(nshards)).astype(np.int64)
        )
        return pa.table({"dst": dst, "text": text, "_shard": shard})

    def per_shard(df: "pd.DataFrame") -> pa.Table:
        from crawlkit import pandas_to_clean_arrow

        per_text = df.groupby(["dst", "text"], as_index=False).agg(
            n=("text", "size")
        )
        # most-frequent text per dst; ties → lexicographically smallest
        per_text = per_text.sort_values(
            ["dst", "n", "text"], ascending=[True, False, True]
        )
        top = per_text.drop_duplicates("dst", keep="first").rename(
            columns={"text": "top_text"}
        )[["dst", "top_text"]]
        stats = per_text.groupby("dst", as_index=False).agg(
            anchors=("n", "sum"), distinct_texts=("n", "size")
        )
        out = stats.merge(top, on="dst")
        out = out.sort_values(["anchors", "dst"], ascending=[False, True]).head(k)
        return pandas_to_clean_arrow(
            out[["dst", "anchors", "distinct_texts", "top_text"]]
        )

    cand = (
        wat.map_batches(flatten, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
        .to_pandas()
    )
    return (
        cand.sort_values(["anchors", "dst"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def archive_delta(root_a: str, root_b: str) -> "ray.data.Dataset":
    """Change detection between two archive generations (recrawl
    cadence): full-outer join of the two CDX indexes on url, classified
    by payload digest — ``added`` (only in B), ``removed`` (only in A),
    ``changed`` (digest differs), ``unchanged``.

    Joins the INDEXES only (~100 bytes/page) — no archive byte is read;
    at 10^10 URLs this is a hash join on the url key, never a scan of
    the WARC shards. Output: (url, change, status_a, status_b)."""
    import ray.data  # noqa: F401  (Dataset API)

    from crawlkit.pipelines.dedup import _nonempty_blocks

    def slim(which: str):
        store = TableStore(f"{(root_a if which == 'a' else root_b)}/index")
        ds = store.read_dataset()

        def prep(t: pa.Table, which=which) -> pa.Table:
            cols = {
                f"url_{which}": t["url"],
                f"digest_{which}": t["payload_digest"],
                f"status_{which}": t["status"],
            }
            if which == "b":
                # Dataset.join merges key columns (the right key is
                # dropped); duplicate it so right-only rows keep a url
                cols["url_b_data"] = t["url"]
            return pa.table(cols)

        fields = [
            (f"url_{which}", pa.string()),
            (f"digest_{which}", pa.string()),
            (f"status_{which}", pa.int32()),
        ]
        if which == "b":
            fields.append(("url_b_data", pa.string()))
        return _nonempty_blocks(
            ds.map_batches(prep, batch_format="pyarrow"), pa.schema(fields)
        )

    joined = slim("a").join(
        slim("b"),
        join_type="full_outer",
        num_partitions=8,
        on=("url_a",),
        right_on=("url_b",),
    )

    def classify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        da, db = t["digest_a"], t["digest_b"]
        only_b = pc.is_null(da)
        only_a = pc.is_null(db)
        same = pc.fill_null(pc.equal(da, db), False)
        change = pc.if_else(
            only_b,
            pa.scalar("added"),
            pc.if_else(
                only_a,
                pa.scalar("removed"),
                pc.if_else(same, pa.scalar("unchanged"), pa.scalar("changed")),
            ),
        )
        url = pc.coalesce(t["url_a"], t["url_b_data"])
        return pa.table(
            {
                "url": url,
                "change": change,
                "status_a": t["status_a"],
                "status_b": t["status_b"],
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


def change_rate(roots: list[str], nshards: int = 32) -> "ray.data.Dataset":
    """Per-URL change-frequency estimation over k archive generations
    (Cho & Garcia-Molina, "Estimating frequency of change", TOIT 2003 —
    the published basis for adaptive recrawl scheduling): count digest
    transitions between consecutive OBSERVATIONS of each url, emit
    exact integer sufficient statistics (observations, changes) plus a
    recrawl bucket — ``new`` (seen once), ``cold`` (never changed),
    ``hot`` (changed in ≥ half its intervals), ``warm`` (the rest).
    The float rate λ̂ is one division the consumer applies; keeping the
    stats integral makes results order-independent and hash-stable.

    Index-only (no WARC bytes), and the per-url history grouping is the
    engine's high-cardinality shape: url-hash shard column + ONE
    vectorized pandas reduce per shard — shuffle boundary count is
    ``nshards``, not |urls| (the `_sharded_agg` lesson at 1e5+ keys)."""
    import numpy as np
    import ray.data  # noqa: F401

    from crawlkit.hashing import hash64_np

    gens = []
    for g, root in enumerate(roots):
        ds = TableStore(f"{root}/index").read_dataset()

        def slim(t: pa.Table, g=g) -> pa.Table:
            return pa.table(
                {
                    "url": t["url"],
                    "digest": t["payload_digest"],
                    "gen": pa.array(np.full(t.num_rows, g, dtype=np.int32)),
                }
            )

        gens.append(ds.map_batches(slim, batch_format="pyarrow"))
    allg = gens[0].union(*gens[1:]) if len(gens) > 1 else gens[0]

    def add_shard(t: pa.Table) -> pa.Table:
        # NEVER Python hash() for shard routing (process-seeded) — see
        # CLAUDE.md; hash64_np is deterministic across workers
        h = hash64_np(t["url"].to_pylist())
        s = (h % np.uint64(nshards)).astype(np.int64)
        return t.append_column("_shard", pa.array(s))

    def per_shard(df):
        from crawlkit import pandas_to_clean_arrow

        df = df.sort_values(["url", "gen"], kind="mergesort")
        same_url = df["url"].eq(df["url"].shift())
        chg = (same_url & df["digest"].ne(df["digest"].shift())).astype("int64")
        g = (
            df.assign(chg=chg)
            .groupby("url", as_index=False)
            .agg(observations=("gen", "size"), changes=("chg", "sum"),
                 first_gen=("gen", "min"), last_gen=("gen", "max"))
        )
        obs = g["observations"].to_numpy()
        nchg = g["changes"].to_numpy()
        g["bucket"] = np.where(
            obs <= 1, "new",
            np.where(nchg == 0, "cold",
                     np.where(2 * nchg >= obs - 1, "hot", "warm")),
        )
        g = g.drop(columns=["_shard"], errors="ignore")
        g[["first_gen", "last_gen"]] = g[["first_gen", "last_gen"]].astype("int64")
        return pandas_to_clean_arrow(
            g[["url", "observations", "changes", "first_gen", "last_gen", "bucket"]]
        )

    return (
        allg.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
    )


def extract_links(records: "ray.data.Dataset") -> "ray.data.Dataset":
    """Hyperlink-graph extraction from archived HTML: one edge row per
    anchor — ``kind='offer'`` (listing → offer article links) or
    ``kind='page'`` (pager links, resolved relative to the source url).
    Output: (src, dst, kind, src_depth). Compiled-regex per row inside
    the batch task (same contract as stages/parsers; lxml swaps in
    outside the sandbox). Feeds degree/pagerank-style graph ops without
    touching the live web."""
    import re

    _href = re.compile(r'<h3><a href="([^"]+)"')
    _pager_block = re.compile(r'<div id="pagerForm">(.*?)</div>', re.S)
    _pager_a = re.compile(r'<li><a href="([^"#]+)"')

    def links(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # only CONTENT records: 301 hops, 304 revisits and deduplicated
        # identical-payload revisits carry a text/html HTTP header but
        # no payload — without the status + record-type filter they
        # read as empty zero-word documents (pass the records through
        # resolve_revisits first to include deduplicated captures)
        t = t.filter(
            pc.and_(
                pc.and_(
                    pc.starts_with(t["content_type"], "text/"),
                    pc.equal(t["status"], 200),
                ),
                pc.equal(t["record_type"], "response"),
            )
        )
        rows: list[dict] = []
        for r in t.to_pylist():
            html = r["body"].decode()
            src = r["url"]
            for dst in _href.findall(html):
                rows.append({"src": src, "dst": dst, "kind": "offer",
                             "src_depth": r["depth"]})
            m = _pager_block.search(html)
            if m:
                base = src.split("?", 1)[0]  # RFC 3986: "?q" replaces query
                for q in _pager_a.findall(m.group(1)):
                    rows.append({"src": src, "dst": base + q, "kind": "page",
                                 "src_depth": r["depth"]})
        schema = pa.schema(
            [("src", pa.string()), ("dst", pa.string()),
             ("kind", pa.string()), ("src_depth", pa.int32())]
        )
        return pa.Table.from_pylist(rows, schema=schema)

    return records.map_batches(links, batch_format="pyarrow")


def reparse_entries(records: "ray.data.Dataset") -> "ray.data.Dataset":
    """Re-run the registered listing parsers over archived depth-1 HTML —
    the archive-reprocessing path: new extraction logic without a single
    network fetch. Output rows match the live crawl's normalized entries
    (pinned byte-level in tests/test_warcstore.py)."""
    from crawlkit.stages import parsers
    from crawlkit.stages.fetch import normalize_entries

    def reparse(batch: pa.Table) -> pa.Table:
        from crawlkit import canon

        mask = [
            d == 1 and s == 200
            for d, s in zip(batch["depth"].to_pylist(), batch["status"].to_pylist())
        ]
        batch = batch.filter(pa.array(mask, pa.bool_()))
        raw: list[dict] = []
        for row in batch.to_pylist():
            spec = parsers.get_parser(row["schema_name"])
            for a in spec.parse(row["body"].decode(), row["url"]):
                raw.append(
                    {
                        "schema_name": row["schema_name"],
                        "schema_version": row["schema_version"],
                        "domain": row["domain"],
                        "created": row["created"],
                        "title": a["title"],
                        "name": a["name"],
                        "region": a["region"],
                        "rooms_raw": a["rooms_raw"],
                        "price_raw": a["price_raw"],
                        "total_price_raw": a["total_price_raw"],
                        "area_raw": a["area_raw"],
                        "link": canon.take_characters_before_one(a["href"], ".html"),
                    }
                )
        if not raw:
            return normalize_entries(
                pa.Table.from_pylist(
                    [],
                    schema=pa.schema(
                        [
                            (n, pa.string())
                            for n in (
                                "schema_name schema_version domain created title "
                                "name region rooms_raw price_raw total_price_raw "
                                "area_raw link"
                            ).split()
                        ]
                    ),
                )
            )
        return normalize_entries(pa.Table.from_pylist(raw))

    return records.map_batches(reparse, batch_format="pyarrow")


# --- full-payload restore: rebuild the input_hint images table ----------


class _RestoreDecode:
    """Actor-pool decode stage for restored image rows: recompute the
    derived columns (w, h, phash) from the archived bytes — nothing is
    trusted from the index, everything is re-derived from payloads."""

    def __init__(self):
        from crawlkit import imagecodec

        self._codec = imagecodec

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from crawlkit.stages.fetch import IMAGES_SCHEMA

        rows = []
        for r in t.to_pylist():
            px = self._codec.decode(r["bytes"], r["fmt"])
            rows.append(
                {
                    "image_id": r["image_id"],
                    "bytes": r["bytes"],
                    "w": px.shape[1],
                    "h": px.shape[0],
                    "fmt": r["fmt"],
                    "caption": r["caption"],
                    "phash": np.int64(np.uint64(self._codec.phash64(px))).item(),
                }
            )
        return pa.Table.from_pylist(rows, schema=IMAGES_SCHEMA)


def restore_images(
    root: str,
    *,
    version: int | None = None,
    batch_size: int = 64,
    concurrency: int = 2,
    num_partitions: int = 8,
    resolve_roots: list[str] | None = None,
) -> "ray.data.Dataset":
    """Rebuild the NORTH-RULE images table (image_id, bytes, w, h, fmt,
    caption, phash) from the archive ALONE — no refetch: image payload
    records (depth 3, archived when the crawl ran with
    ``archive_images=True``) supply bytes+fmt; re-parsing the archived
    offer HTML (depth 2) supplies (image_id, caption); a decode stage
    re-derives w/h/phash from the payload bytes. Output is byte-level
    equal to the live crawl's images store (pinned in tests).

    Scale shape: both sides are index-pruned BEFORE any archive byte
    moves; the only exchange is one image_id hash join (ids + captions
    on the right — the megapixel bytes stay on the left and move once);
    decode runs in a small-batch actor pool (wide binary rows)."""
    import ray.data as rd  # noqa: F401  (type only)

    from crawlkit.stages import parsers as _parsers

    payloads = read_warc(
        root,
        version=version,
        index_filter=lambda ds: ds.filter(expr="depth == 3 and status == 200"),
        batch_size=batch_size,
        resolve_revisits=resolve_roots is not None,
        resolve_roots=resolve_roots,
        num_partitions=num_partitions,
    )

    def payload_rows(t: pa.Table) -> pa.Table:
        ids, fmts, blobs = [], [], []
        for u, b in zip(t["url"].to_pylist(), t["body"].to_pylist()):
            base = u.rsplit("/", 1)[1]
            iid, fmt = base.rsplit(".", 1)
            ids.append(iid)
            fmts.append(fmt)
            blobs.append(b)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "fmt": pa.array(fmts, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
            }
        )

    offers = read_warc(
        root,
        version=version,
        index_filter=lambda ds: ds.filter(expr="depth == 2 and status == 200"),
        batch_size=batch_size,
        resolve_revisits=resolve_roots is not None,
        resolve_roots=resolve_roots,
        num_partitions=num_partitions,
    )

    def caption_rows(t: pa.Table) -> pa.Table:
        ids, caps = [], []
        for u, b in zip(t["url"].to_pylist(), t["body"].to_pylist()):
            for im in _parsers.parse_offer_images(b.decode(), u):
                ids.append(im["image_id"])
                caps.append(im["caption"])
        return pa.table(
            {
                "cap_image_id": pa.array(ids, pa.string()),
                "caption": pa.array(caps, pa.string()),
            }
        )

    from crawlkit.pipelines.dedup import _nonempty_blocks

    left = _nonempty_blocks(
        payloads.map_batches(payload_rows, batch_format="pyarrow"),
        pa.schema(
            [("image_id", pa.string()), ("fmt", pa.string()), ("bytes", pa.binary())]
        ),
    )
    right = _nonempty_blocks(
        offers.map_batches(caption_rows, batch_format="pyarrow"),
        pa.schema([("cap_image_id", pa.string()), ("caption", pa.string())]),
    )
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=("image_id",),
        right_on=("cap_image_id",),
    )
    return joined.map_batches(
        _RestoreDecode,
        batch_format="pyarrow",
        batch_size=8,  # wide binary rows (SURVEY §7.5.4)
        concurrency=concurrency,
        max_restarts=0,
    )
