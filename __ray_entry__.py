"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Engine: ``crawlkit`` — a Ray-Data-native crawl-scheduling /
data-processing engine (see SURVEY.md §2 for the operator inventory
each query name maps to). No ``ray.init``/``ray.shutdown`` here — the
driver owns the session.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the documents
    training-data path (quality counts + language/quality scoring +
    exact dedup), returned as a Ray Dataset."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from crawlkit.pipelines import text
    from crawlkit.pipelines.relational import dedup_exact_first

    sf_dir = "/root/testdata/sf0.001"
    deduped = dedup_exact_first(sf_dir)  # (doc_id, text) survivors
    scored = text.text_score(sf_dir)  # (doc_id, lang_pred, stop_ratio, quality_score)
    # broadcast SEMI-join: ship only the survivor doc_id column once
    # (ray.put) and filter with vectorized pc.is_in inside map_batches —
    # at 100 TB this key column becomes a digest broadcast / Dataset.join
    keep_ref = ray.put(
        pa.array(deduped.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy())
    )

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=ray.get(keep_ref)))

    return scored.map_batches(keep, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from crawlkit.pipelines import (
        ann, dedup, graph, mixing, ml, multimodal, relational, sources, text, windows,
    )

    # generator-intent manifests for the multimodal SQL oracles (cheap,
    # no Ray, atomic) — written here so the files exist regardless of
    # the order the driver runs a query vs its oracle SQL
    multimodal.write_mm_manifests()

    def crawl_sitemap_seeds(sf_dir: str):
        """Seed DISCOVERY from the web itself: distributed /sitemap.xml
        fetch+parse → the ordered seed table (sf_dir unused). Rows-only;
        pinned ≡ SynthWeb.seeds() in tests/test_parsers_politeness.py."""
        import pandas as pd

        from crawlkit.pipelines.crawl import seeds_from_sitemaps

        return pd.DataFrame(seeds_from_sitemaps("t2"))

    def crawl_flagship(sf_dir: str):
        """The crawl engine end-to-end on the deterministic synthetic web
        (t1 profile): frontier rounds → fetch/extract → typed entries.
        sf_dir unused (the crawl's input is its seed list); rows-only
        check — the real conformance gate is tests/test_crawl_golden.py
        (engine ≡ reference-semantics simulator)."""
        from crawlkit.pipelines.crawl import run_crawl
        from crawlkit.refsim import CrawlSpec

        out = tempfile.mkdtemp(prefix="crawl_q_", dir="/tmp")
        res = run_crawl(
            "t1",
            spec=CrawlSpec(host_budget_per_round=32),
            out_dir=out,
            num_seen_shards=2,
            fetch_concurrency=4,
        )
        return res.entries_table()

    def crawl_recrawl(sf_dir: str):
        """Cadence re-run (S2/P1): crawl a small web, then recrawl a
        GROWN web against the persisted seen set — listings re-crawled,
        only never-seen offers fetched. Rows-only here; byte-level
        engine ≡ refsim(prior_seen=…) is pinned in
        tests/test_crawl_golden.py::test_recrawl_cadence_fetches_only_new_offers."""
        from crawlkit.pipelines.crawl import recrawl, run_crawl
        from crawlkit.refsim import CrawlSpec
        from crawlkit.synthweb import SynthWeb, WebConfig

        spec = CrawlSpec(host_budget_per_round=32)
        base = tempfile.mkdtemp(prefix="recrawl_q_", dir="/tmp")
        run_crawl(SynthWeb(WebConfig(n_seeds=4, n_hosts=3, max_last_page=3)),
                  spec=spec, out_dir=f"{base}/run1", num_seen_shards=2, fetch_concurrency=4)
        res2 = recrawl(SynthWeb(WebConfig(n_seeds=4, n_hosts=3, max_last_page=6)),
                       prior_dir=f"{base}/run1", out_dir=f"{base}/run2",
                       num_seen_shards=2, fetch_concurrency=4)
        return res2.entries_table()

    def crawl_distributed(sf_dir: str):
        """Distributed-frontier crawl (frontier as a Ray Dataset end to
        end — budget/fetch/dedup-admit all shuffled stages, no
        frontier-sized driver state). Rows-only; oracle parity (entries/
        images/log/seen vs refsim) is pinned in tests/test_crawl_dist.py."""
        from crawlkit.pipelines.crawl_dist import run_crawl_dataset
        from crawlkit.refsim import CrawlSpec

        out = tempfile.mkdtemp(prefix="crawl_dist_q_", dir="/tmp")
        res = run_crawl_dataset(
            "t1", spec=CrawlSpec(host_budget_per_round=32), out_dir=out,
            num_seen_shards=2, nblocks=4,
        )
        return res.entries_table()

    def crawl_redirects(sf_dir: str):
        """Redirect-following crawl (3xx chains — colly/Go http.Client
        parity, ≤10 hops): crawl a web where a third of the offers have
        MOVED (301 at the old path, some via a 2-hop chain); return the
        per-url fetch-log rows of followed chains. Rows-only; byte-level
        engine ≡ refsim (order/seen/entries/images/log incl. hop counts)
        is pinned in tests/test_crawl_redirects.py."""
        import pyarrow.compute as _pc

        from crawlkit.pipelines.crawl import run_crawl
        from crawlkit.refsim import CrawlSpec
        from crawlkit.synthweb import SynthWeb, WebConfig

        out = tempfile.mkdtemp(prefix="crawl_redir_q_", dir="/tmp")
        res = run_crawl(
            SynthWeb(WebConfig(n_seeds=4, n_hosts=3, redirect_mod=3)),
            spec=CrawlSpec(host_budget_per_round=32),
            out_dir=out, num_seen_shards=2, fetch_concurrency=4,
        )
        log = res.fetch_log_table()
        return log.filter(_pc.greater(log["redirects"], 0)).sort_by("canon_url")

    def crawl_recrawl_conditional(sf_dir: str):
        """Bandwidth-aware cadence re-run: run 1 crawls + archives a
        small web; run 2 recrawls the SAME web with If-None-Match — every
        listing answers 304 (zero body bytes moved), content is
        range-read from run 1's WARC, extraction still complete. Returns
        the per-status log rollup of run 2. Rows-only; byte-level engine
        ≡ refsim(prior_etags) pinned in tests/test_crawl_conditional.py."""
        from crawlkit.pipelines.crawl import recrawl_conditional, run_crawl
        from crawlkit.refsim import CrawlSpec
        from crawlkit.synthweb import SynthWeb, WebConfig

        cfg = WebConfig(n_seeds=4, n_hosts=3, max_last_page=3)
        spec = CrawlSpec(host_budget_per_round=32)
        base = tempfile.mkdtemp(prefix="cond_q_", dir="/tmp")
        run_crawl(
            SynthWeb(cfg), spec=spec, out_dir=f"{base}/run1",
            num_seen_shards=2, fetch_concurrency=4, archive_root=f"{base}/arch",
        )
        res = recrawl_conditional(
            SynthWeb(cfg), prior_dir=f"{base}/run1",
            prior_archive_root=f"{base}/arch", out_dir=f"{base}/run2",
            spec=spec, num_seen_shards=2, fetch_concurrency=4,
        )
        log = res.fetch_log_table().to_pandas()
        return (
            log.groupby("status", as_index=False)
            .agg(pages=("canon_url", "count"), body_bytes=("nbytes", "sum"))
            .sort_values("status")
            .reset_index(drop=True)
        )

    def crawl_fetch_report(sf_dir: str):
        """M10 telemetry rollup: run the t1 crawl, then aggregate its
        fetch_log per (host, status) as a streaming Dataset pass.
        SQL-checked: the raw per-page log (itself pinned ≡ refsim in
        tests/test_crawl_golden.py) is exported to parquet and the
        oracle re-aggregates it in DuckDB — checking the distributed
        partial-agg rollup against a flat GROUP BY."""
        import os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from crawlkit.pipelines.crawl import fetch_report, run_crawl
        from crawlkit.pipelines.multimodal import ORACLE_MANIFEST_DIR
        from crawlkit.refsim import CrawlSpec

        out = tempfile.mkdtemp(prefix="crawl_rep_q_", dir="/tmp")
        res = run_crawl(
            "t1", spec=CrawlSpec(host_budget_per_round=32), out_dir=out,
            num_seen_shards=2, fetch_concurrency=4,
        )
        log = res.fetch_log_table()
        slim = pa.table(
            {
                "host": log["host"],
                "status": pc.cast(log["status"], pa.int64()),
                "nbytes": pc.cast(log["nbytes"], pa.int64()),
                "attempts": pc.cast(log["attempts"], pa.int64()),
                "error": log["error"],
            }
        )
        os.makedirs(ORACLE_MANIFEST_DIR, exist_ok=True)
        tmp = f"{ORACLE_MANIFEST_DIR}/.fetch_log_t1.{os.getpid()}.tmp"
        pq.write_table(slim, tmp)
        os.replace(tmp, f"{ORACLE_MANIFEST_DIR}/fetch_log_t1.parquet")
        return fetch_report(res.fetch_log_store)

    def _crawl_with_archive() -> tuple:
        from crawlkit.pipelines.crawl import run_crawl
        from crawlkit.refsim import CrawlSpec

        out = tempfile.mkdtemp(prefix="warc_q_", dir="/tmp")
        root = f"{out}/archive"
        res = run_crawl(
            "t1", spec=CrawlSpec(host_budget_per_round=32),
            out_dir=f"{out}/crawl", num_seen_shards=2, fetch_concurrency=4,
            archive_root=root, archive_images=True,
        )
        return res, root

    def archive_restore_images(sf_dir: str):
        """Full-payload restore: rebuild the north-rule images table
        (image_id, bytes, w, h, fmt, caption, phash) from the archive
        ALONE — bytes from depth-3 payload records, captions from
        re-parsed offer HTML, w/h/phash re-derived by decode. Rows-only;
        byte-level ≡ the live images store is pinned in
        tests/test_warcstore.py (sf_dir unused)."""
        from crawlkit.state.warcstore import restore_images

        _res, root = _crawl_with_archive()
        ds = restore_images(root)
        return ds.drop_columns(["bytes"])  # manifest view for the driver check

    def archive_warc(sf_dir: str):
        """WARC archival layer (state/warcstore): the fused fetch stage
        persists every 200-fetch as per-record-gzip WARC shards + CDX
        index fragments, committed atomically per round. Rolls up the
        index per (schema_name, depth). Rows-only; byte-parity,
        idempotent rewrite and tamper detection are pinned in
        tests/test_warcstore.py."""
        import pandas as pd
        import pyarrow as pa

        res, _root = _crawl_with_archive()
        idx = res.archive_store.read_dataset()

        def partial(t: "pa.Table") -> "pa.Table":
            df = t.select(["schema_name", "depth", "nbytes", "length"]).to_pandas()
            g = df.groupby(["schema_name", "depth"], as_index=False).agg(
                records=("nbytes", "size"), body_bytes=("nbytes", "sum"),
                archive_bytes=("length", "sum"),
            )
            return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

        agg = idx.map_batches(partial, batch_format="pyarrow").to_pandas()
        out_df = agg.groupby(["schema_name", "depth"], as_index=False).sum()
        return out_df.sort_values(["schema_name", "depth"]).reset_index(drop=True)

    def archive_reparse(sf_dir: str):
        """Archive reprocessing: re-run the registered parsers over
        archived WARC HTML — new extraction logic with ZERO re-fetching,
        index-pruned to depth-1 listing records before any archive byte
        is read. Rows-only; result ≡ the live crawl's entries, pinned in
        tests/test_warcstore.py::test_reparse_matches_live_entries."""
        import pyarrow.compute as pc

        from crawlkit.state import warcstore

        _res, root = _crawl_with_archive()
        recs = warcstore.read_warc(
            root,
            index_filter=lambda idx: idx.map_batches(
                lambda t: t.filter(pc.equal(t["depth"], 1)),
                batch_format="pyarrow",
            ),
        )
        return warcstore.reparse_entries(recs)

    def archive_wet(sf_dir: str):
        """WARC → WET: vectorized plain-text extraction from archived
        HTML (Arrow RE2 kernels, zero Python per row), rolled up per
        (schema_name, depth): pages, total words, total text bytes —
        the Common-Crawl-WET analogue feeding the text pipeline.
        Rows-only; tag-strip exactness pinned in tests/test_warcstore.py."""
        import pyarrow as pa

        from crawlkit.state import warcstore

        _res, root = _crawl_with_archive()
        wet = warcstore.wet_extract(
            warcstore.read_warc(
                root,
                index_filter=lambda ds: ds.filter(expr="content_type == 'text/html'"),
            )
        )

        def partial(t: "pa.Table") -> "pa.Table":
            df = t.select(["schema_name", "depth", "nwords", "nbytes"]).to_pandas()
            g = df.groupby(["schema_name", "depth"], as_index=False).agg(
                pages=("nwords", "size"), total_words=("nwords", "sum"),
                total_text_bytes=("nbytes", "sum"),
            )
            return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

        agg = wet.map_batches(partial, batch_format="pyarrow").to_pandas()
        out_df = agg.groupby(["schema_name", "depth"], as_index=False).sum()
        return out_df.sort_values(["schema_name", "depth"]).reset_index(drop=True)

    def archive_wat(sf_dir: str):
        """WARC → WAT: per-record metadata extraction (Common-Crawl WAT
        analogue) — every anchor/image reference with its anchor text
        as a nested Arrow list<struct{url,text,kind}> column, flattened
        per batch with pc.list_flatten (zero Python objects) and rolled
        up per (depth, kind). Rows-only; link-set ≡ Python reference +
        extract_links superset pinned in tests/test_warcstore.py."""
        import pandas as pd
        import pyarrow as pa

        from crawlkit.state import warcstore

        _res, root = _crawl_with_archive()
        wat = warcstore.wat_extract(warcstore.read_warc(root))

        def partial(t: "pa.Table") -> "pa.Table":
            import pyarrow.compute as pc

            t = t.combine_chunks()
            depth = pc.take(t["depth"], pc.list_parent_indices(t["links"]))
            flat = pc.list_flatten(t["links"])
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            vc = (
                pa.table({"depth": depth, "kind": flat.field("kind")})
                .group_by(["depth", "kind"])
                .aggregate([("kind", "count")])
            )
            return vc.rename_columns(["depth", "kind", "links"])

        agg = wat.map_batches(partial, batch_format="pyarrow").to_pandas()
        out_df = agg.groupby(["depth", "kind"], as_index=False).sum()
        return out_df.sort_values(["depth", "kind"]).reset_index(drop=True)

    def archive_anchor_text(sf_dir: str):
        """Anchor-text corpus from the WAT layer: per-target inbound
        anchor aggregation (count, distinct texts, most-frequent text)
        — the classic web-scale IR/LLM training signal — dst-hash-
        sharded single reduce with per-shard partial top-k. Rows-only;
        ≡ pandas reference over the full WAT link set in
        tests/test_warcstore.py."""
        from crawlkit.state import warcstore

        _res, root = _crawl_with_archive()
        return warcstore.anchor_text_topk(root, k=10, nshards=8)

    def archive_cdx_lookup(sf_dir: str):
        """Common-Crawl CDX-API analogue: url-prefix query over the
        archive index with Iceberg-style fragment-stat scan planning
        (manifest [url_lo, url_hi] bounds prune files before any read),
        then an exact vectorized prefix filter. Returns host0's records
        rolled up per (depth): records + body bytes. Rows-only;
        ≡ full-scan filter + pruning>0 pinned in tests/test_warcstore.py."""
        import pandas as pd
        import pyarrow as pa

        from crawlkit.state import warcstore

        _res, root = _crawl_with_archive()
        hits = warcstore.cdx_lookup(root, "https://host0.test/")

        def partial(t: "pa.Table") -> "pa.Table":
            df = t.select(["depth", "nbytes"]).to_pandas()
            g = df.groupby("depth", as_index=False).agg(
                records=("nbytes", "size"), body_bytes=("nbytes", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

        agg = hits.map_batches(partial, batch_format="pyarrow").to_pandas()
        out_df = agg.groupby("depth", as_index=False).sum()
        return out_df.sort_values("depth").reset_index(drop=True)

    def archive_compact(sf_dir: str):
        """Archive maintenance: consolidate per-task .warc.gz shards
        into ~1 MB shards (pure byte movement — gzip members copied
        verbatim, digests unchanged), snapshot-commit the rewritten
        index, then gc the unreferenced old files. Returns the
        before/after shard counts + record count + a byte-parity flag.
        Rows-only; full byte parity, idempotence and gc exactness
        pinned in tests/test_warcstore.py."""
        import hashlib as _hl

        import pandas as pd

        from crawlkit.state import warcstore

        _res, root = _crawl_with_archive()
        store = warcstore.TableStore(f"{root}/index")

        def digest_all() -> str:
            recs = warcstore.read_warc(root).to_pandas().sort_values("url")
            h = _hl.sha1()
            for b in recs["body"]:
                h.update(bytes(b))
            return h.hexdigest()

        shards_before = len(set(store.read_table(columns=["shard"])["shard"].to_pylist()))
        before = digest_all()
        warcstore.compact_archive(root, target_bytes=1 << 20)
        removed = warcstore.gc_shards(root)
        idx = warcstore.TableStore(f"{root}/index").read_table()
        return pd.DataFrame(
            {
                "records": [idx.num_rows],
                "shards_after": [len(set(idx["shard"].to_pylist()))],
                "compacted": [shards_before > len(set(idx["shard"].to_pylist()))],
                "gc_removed_files": [removed > 0],
                "byte_parity": [digest_all() == before],
            }
        )

    def archive_delta(sf_dir: str):
        """Incremental change detection across crawl generations: two
        full crawls of a GROWN web, each archiving to WARC; the CDX
        indexes are full-outer-joined on url and classified by payload
        digest (added / changed / unchanged / removed) — no archive
        byte is read. Rows-only; class semantics pinned in
        tests/test_warcstore.py::test_archive_delta_classes."""
        import pandas as pd

        from crawlkit.pipelines.crawl import run_crawl
        from crawlkit.refsim import CrawlSpec
        from crawlkit.state import warcstore
        from crawlkit.synthweb import SynthWeb, WebConfig

        base = tempfile.mkdtemp(prefix="warc_delta_q_", dir="/tmp")
        spec = CrawlSpec(host_budget_per_round=32)
        for gen, mlp in (("a", 3), ("b", 6)):
            run_crawl(
                SynthWeb(WebConfig(n_seeds=4, n_hosts=3, max_last_page=mlp)),
                spec=spec, out_dir=f"{base}/crawl_{gen}", num_seen_shards=2,
                fetch_concurrency=4, archive_root=f"{base}/arc_{gen}",
            )
        delta = warcstore.archive_delta(f"{base}/arc_a", f"{base}/arc_b")

        def partial(t):
            import pyarrow as pa

            df = t.select(["change"]).to_pandas()
            g = df.groupby("change", as_index=False).agg(pages=("change", "size"))
            return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

        agg = delta.map_batches(partial, batch_format="pyarrow").to_pandas()
        out_df = agg.groupby("change", as_index=False).sum()
        return out_df.sort_values("change").reset_index(drop=True)

    def archive_dedup_revisit(sf_dir: str):
        """URL-agnostic archive dedup (Common-Crawl style): gen-2 of a
        GROWN web crawls with ``archive_dedup=True`` against gen-1's
        archive — any fetched payload whose sha1 already exists in the
        chain is stored as an identical-payload-digest WARC revisit
        record (zero body bytes). Rolls up gen-2's index per
        record_type; resolved-read byte-parity vs a dedup-off archive
        is pinned in tests/test_archive_dedup.py. Rows-only."""
        import pandas as pd
        import pyarrow as pa

        from crawlkit.pipelines.crawl import run_crawl
        from crawlkit.refsim import CrawlSpec
        from crawlkit.state.lancelike import TableStore
        from crawlkit.synthweb import SynthWeb, WebConfig

        base = tempfile.mkdtemp(prefix="arch_dedup_q_", dir="/tmp")
        spec = CrawlSpec(host_budget_per_round=32)
        for gen, mlp, prior in (("a", 3, None), ("b", 6, f"{base}/arc_a")):
            run_crawl(
                SynthWeb(WebConfig(n_seeds=4, n_hosts=3, max_last_page=mlp)),
                spec=spec, out_dir=f"{base}/crawl_{gen}", num_seen_shards=2,
                fetch_concurrency=4, archive_root=f"{base}/arc_{gen}",
                archive_images=True, prior_archive_root=prior,
                archive_dedup=prior is not None,
            )
        idx = TableStore(f"{base}/arc_b/index").read_dataset()

        def partial(t: "pa.Table") -> "pa.Table":
            df = t.select(["record_type", "nbytes", "length"]).to_pandas()
            g = df.groupby("record_type", as_index=False).agg(
                records=("nbytes", "size"), body_bytes=("nbytes", "sum"),
                archive_bytes=("length", "sum"),
            )
            return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

        agg = idx.map_batches(partial, batch_format="pyarrow").to_pandas()
        out_df = agg.groupby("record_type", as_index=False).sum()
        assert set(out_df["record_type"]) == {"response", "revisit"}
        return out_df.sort_values("record_type").reset_index(drop=True)

    def recrawl_schedule(sf_dir: str):
        """Adaptive recrawl scheduling: three crawl generations of a
        growing web → per-url digest-transition stats (Cho &
        Garcia-Molina change-frequency estimator, integer sufficient
        statistics) → recrawl buckets (new/cold/warm/hot), rolled up as
        bucket counts. Index-only, url-hash-sharded single reduce.
        Rows-only; per-url stats pinned against a Python reference in
        tests/test_warcstore.py::test_change_rate_reference."""
        import pandas as pd

        from crawlkit.pipelines.crawl import run_crawl
        from crawlkit.refsim import CrawlSpec
        from crawlkit.state import warcstore
        from crawlkit.synthweb import SynthWeb, WebConfig

        base = tempfile.mkdtemp(prefix="recrawl_sched_q_", dir="/tmp")
        spec = CrawlSpec(host_budget_per_round=32)
        roots = []
        for gen, mlp in (("g0", 3), ("g1", 3), ("g2", 6)):
            roots.append(f"{base}/arc_{gen}")
            run_crawl(
                SynthWeb(WebConfig(n_seeds=4, n_hosts=3, max_last_page=mlp)),
                spec=spec, out_dir=f"{base}/crawl_{gen}", num_seen_shards=2,
                fetch_concurrency=4, archive_root=roots[-1],
            )
        rates = warcstore.change_rate(roots, nshards=8)

        def partial(t):
            import pyarrow as pa

            df = t.select(["bucket", "changes"]).to_pandas()
            g = df.groupby("bucket", as_index=False).agg(
                urls=("changes", "size"), total_changes=("changes", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

        agg = rates.map_batches(partial, batch_format="pyarrow").to_pandas()
        out_df = agg.groupby("bucket", as_index=False).sum()
        return out_df.sort_values("bucket").reset_index(drop=True)

    def archive_link_graph(sf_dir: str):
        """Hyperlink graph from the archive: extract anchor edges from
        archived HTML (no re-fetch), then the top-10 most-linked pages
        by in-degree — dst-hash-sharded per-shard counts with per-shard
        partial top-k, merged on the driver (10×nshards rows, never the
        edge list). Rows-only; edge extraction pinned against a Python
        reference in tests/test_warcstore.py::test_extract_links_reference."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from crawlkit.hashing import hash64_np
        from crawlkit.state import warcstore

        _res, root = _crawl_with_archive()
        edges = warcstore.extract_links(
            warcstore.read_warc(
                root,
                index_filter=lambda ds: ds.filter(expr="content_type == 'text/html'"),
            )
        )
        nshards = 8

        def add_shard(t: "pa.Table") -> "pa.Table":
            h = hash64_np(t["dst"].to_pylist())
            return t.append_column(
                "_shard", pa.array((h % np.uint64(nshards)).astype(np.int64))
            )

        def per_shard(df: "pd.DataFrame") -> "pa.Table":
            from crawlkit import pandas_to_clean_arrow

            g = df.groupby("dst", as_index=False).agg(in_degree=("src", "size"))
            g = g.sort_values(["in_degree", "dst"], ascending=[False, True]).head(10)
            return pandas_to_clean_arrow(g[["dst", "in_degree"]])

        cand = (
            edges.map_batches(add_shard, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(per_shard, batch_format="pandas")
            .to_pandas()
        )
        return (
            cand.sort_values(["in_degree", "dst"], ascending=[False, True])
            .head(10)
            .reset_index(drop=True)
        )

    return {
        # --- SURVEY §2 relational operators (SQL-checked) ---
        "g1_group_merge": relational.g1_group_merge,
        "g2_running_max": relational.g2_running_max,
        "d1_distinct": relational.d1_distinct,
        "dedup_exact_first": relational.dedup_exact_first,
        "f1_filter": relational.f1_filter,
        "f4_permissive_cast": relational.f4_permissive_cast,
        "f_above_avg": relational.f_above_avg,
        "m2_extract_number": relational.m2_extract_number,
        "m3_take_before": relational.m3_take_before,
        "m6_range_expand": relational.m6_range_expand,
        "m13_json_extract": relational.m13_json_extract,
        # JSONL file source: ray.data.read_json round-trip, decode-fidelity agg
        "src_jsonl": sources.jsonl_roundtrip,  # SQL-checked
        # CSV file source: ray.data.read_csv round-trip, float→cents exactness
        "src_csv": sources.csv_roundtrip,  # SQL-checked
        "o1_sort_topk": relational.o1_sort_topk,
        "j_broadcast_join": relational.j_broadcast_join,
        "j_hash_join": relational.j_hash_join,
        "j_shuffle_join": relational.j_shuffle_join,
        "j_left_outer": relational.j_left_outer,  # SQL-checked (outer join)
        "j_full_outer": relational.j_full_outer,  # SQL-checked (both null paths)
        "j_bloom_semi": relational.j_bloom_semi,  # SQL-checked (bloom prefilter + exact)
        # anti polarity: bloom MISS passes free, exact check only on hits
        "j_bloom_anti": relational.j_bloom_anti,  # SQL-checked
        # TPC-H Q10 star composition: shuffle fact join + broadcast dims
        "q10_returned": relational.q10_returned,  # SQL-checked
        "corr_moments": relational.corr_moments,  # SQL-checked (exact int64 moments)
        # rank correlation via histogram ranking (no global sort)
        "spearman_moments": relational.spearman_moments,  # SQL-checked
        "skyline_pareto": relational.skyline_pareto,  # SQL-checked
        "zscore_outliers": relational.zscore_outliers,  # SQL-checked
        # robust median/MAD screen (one histogram pass derives both)
        "mad_outliers": windows.mad_outliers,  # SQL-checked
        "cube_agg": relational.cube_agg,  # SQL-checked (GROUP BY CUBE, one fact pass)
        "j_asof": relational.j_asof,
        "w_tumbling": relational.w_tumbling,
        "w_sliding": windows.w_sliding,
        "w_session": windows.w_session,
        # per-(user, hour) burst screen (rate-limit / scraper detection)
        "event_bursts": windows.event_bursts,  # SQL-checked
        "topk_per_group": windows.topk_per_group,
        "median_disc": windows.median_disc,
        # exact p50+p95 via cardinality-sized histogram (no group ship)
        "percentile_hist": windows.percentile_hist,  # SQL-checked
        # global exact-quantile clamp: aggregate → broadcast → row map
        "winsorize": windows.winsorize,  # SQL-checked
        "count_distinct_exact": windows.count_distinct_exact,
        "hll_count_distinct": windows.hll_count_distinct,  # rows-only (sketch)
        # 2-pass Misra-Gries candidates + exact verify — EXACT output
        "heavy_hitters": windows.heavy_hitters,  # SQL-checked
        "mode_per_group": windows.mode_per_group,  # SQL-checked
        # mergeable weighted-sample sketch; rank-error bound in tests
        "approx_quantile": windows.approx_quantile,  # rows-only (approximate)
        "j_keyed_range": windows.j_keyed_range,
        # range×range overlap join: session intervals × recurring promo hours
        "j_interval_overlap": windows.j_interval_overlap,  # SQL-checked
        # time-window self-join pair counts (searchsorted, no pair set)
        "j_time_self": windows.j_time_self,  # SQL-checked
        # nearest-in-time join BOTH directions (double searchsorted)
        "j_asof_nearest": windows.j_asof_nearest,  # SQL-checked
        # gaps-and-islands: per-user consecutive-hour activity streaks
        "w_gaps_islands": windows.w_gaps_islands,  # SQL-checked
        # Markov transition matrix over per-user event streams
        "event_transitions": windows.event_transitions,  # SQL-checked
        # market-basket pair co-occurrence (distinct users per type pair)
        "cooccurrence_pairs": windows.cooccurrence_pairs,  # SQL-checked
        # regex-over-sessions: view→purchase with no error between
        "sequence_match": windows.sequence_match,  # SQL-checked
        # SCD-2 run-length validity intervals (CDC compaction)
        "scd2_intervals": windows.scd2_intervals,  # SQL-checked
        # last-touch attribution (LAST_VALUE IGNORE NULLS rewrite)
        "attribution_last_touch": windows.attribution_last_touch,  # SQL-checked
        # rolling 24h distinct-active-users via interval sweep
        "active_users_rolling": windows.active_users_rolling,  # SQL-checked
        "w_lag_delta": windows.w_lag_delta,  # SQL-checked (LAG window)
        # running distinct-type count (COUNT(DISTINCT) OVER rewrite)
        "w_running_distinct": windows.w_running_distinct,  # SQL-checked
        "w_rolling_sum": windows.w_rolling_sum,  # SQL-checked (ROWS window)
        "w_rolling_max": windows.w_rolling_max,  # SQL-checked (ROWS window MAX)
        "rank_dense": windows.rank_dense,  # SQL-checked (DENSE_RANK)
        "w_percent_rank": windows.w_percent_rank,  # SQL-checked (exact rationals)
        # ordered view→click→purchase funnel (event-sequence analytics)
        "funnel_conversion": windows.funnel_conversion,  # SQL-checked
        "w_first_last": windows.w_first_last,  # SQL-checked (FIRST/LAST_VALUE)
        # weekly cohort-retention triangle (distinct users per offset)
        "cohort_retention": windows.cohort_retention,  # SQL-checked
        "ntile_bucket": windows.ntile_bucket,  # SQL-checked (NTILE equal-depth)
        "rollup_agg": relational.rollup_agg,  # SQL-checked (GROUP BY ROLLUP)
        "pivot_wide": relational.pivot_wide,  # SQL-checked (conditional-agg pivot)
        "string_agg_segments": relational.string_agg_segments,  # SQL-checked
        # TeraSort: sampled range bounds → partitioned global sort manifest
        "sort_partitioned": relational.sort_partitioned,  # SQL-checked
        # Z-order (Morton) layout clustering: bit-interleaved grid cells
        "zorder_layout": relational.zorder_layout,  # SQL-checked
        "q1_pricing": relational.q1_pricing,
        "u_union": relational.u_union,
        "s_except": relational.s_except,
        "s_intersect": relational.s_intersect,
        # bag difference: click user-bag EXCEPT ALL view user-bag
        "s_except_all": relational.s_except_all,  # SQL-checked
        "sample_deterministic": relational.sample_deterministic,
        "stratified_sample": relational.stratified_sample,  # SQL-checked
        # Deequ-style per-column profile: n / nulls / distinct / min / max
        "data_profile": relational.data_profile,  # SQL-checked
        # pre-shuffle skew audit: cardinality / top-key / Simpson Σc²
        "skew_audit": relational.skew_audit,  # SQL-checked
        # record linkage: block → multiset prefilter → vectorized lev DP
        "fuzzy_blocking": relational.fuzzy_blocking,  # SQL-checked (levenshtein)
        # --- text analysis (SQL-checked where exact) ---
        "text_redact": text.redact,  # SQL-checked (same RE2 class both sides)
        "text_token_count": text.token_count,
        "text_bpe_token_count": text.bpe_ish_token_count,
        "text_quality_counts": text.quality_counts,
        "text_score": text.text_score,  # SQL-checked (IEEE-op-order mirror)
        # model-eval: langid confusion matrix vs gold labels
        "langid_confusion": text.langid_confusion,  # SQL-checked
        "text_fingerprint": text.fingerprint,  # SQL-checked (HUGEINT mod-2^64)
        "text_fingerprint32": text.fingerprint32,  # SQL-checked 32-bit variant
        # MOSS winnowing collision pairs (local copied-span detection)
        "fingerprint_collisions": text.fingerprint_collisions,  # SQL-checked
        "text_word_freq": text.word_freq,  # SQL-checked (corpus top-k vocabulary)
        "text_top_keyword": text.top_keyword,  # SQL-checked (integer tf×rarity)
        # batched model inference: hashed bag-of-words linear scorer
        "text_classify": text.text_classify,  # SQL-checked (md5 weights)
        # feature-hashing embedding: integer sparse core + dense vector
        "text_embed_counts": text.embed_counts,  # SQL-checked
        "text_embed": text.text_embed,  # rows-only (unit-norm property in tests)
        # distributed BPE vocabulary training (iterative merge learning);
        # rows-only: brute-force-reference parity pinned in tests/test_bpe.py
        "bpe_train": lambda sf_dir: text.bpe_train(sf_dir, num_merges=10),
        # train-then-apply: per-doc token counts under the learned vocab
        # (actor-pool encode with a per-actor word memo); rows-only
        "bpe_tokenize": lambda sf_dir: text.bpe_tokenize_counts(sf_dir, num_merges=10),
        # sharded inverted-index build with a df-band pruning hatch
        "inverted_index": text.inverted_index,  # SQL-checked
        # top-k bigram collocations by integer PMI (broadcast unigrams)
        "collocations": text.collocations,  # SQL-checked
        # CCNet-style corpus-LM predictability proxy (integer surrogate)
        "lm_score": text.lm_score,  # SQL-checked
        # Gopher-style per-doc repetition signals (shuffle-free)
        "text_gopher_repetition": text.gopher_repetition,  # SQL-checked
        # conjunctive (AND) keyword search, top-k by summed tf
        "search_conjunctive": text.search_conjunctive,  # SQL-checked
        # OR retrieval under an integer BM25 surrogate (bit-exact ranking)
        "bm25_topk": text.bm25_topk,  # SQL-checked
        # top-k event-type trigram paths over per-user ordered streams
        "path_trigrams": windows.path_trigrams,  # SQL-checked
        # --- dedup family ---
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,  # SQL-checked
        # asymmetric containment pairs (short-doc-quoted-in-long channel)
        "dedup_containment": dedup.containment_pairs,  # SQL-checked
        # doc-level duplicate-span statistic (substring-dedup à la Lee et al.)
        "dup_span_fraction": dedup.dup_span_fraction,  # SQL-checked
        # ExactSubstr dedup APPLIED: duplicate-span removal, first copy wins
        "dedup_exact_substr": dedup.exact_substr_dedup,  # SQL-checked
        # connected components over the pair graph (recursive-CTE oracle)
        "dedup_clusters": dedup.dedup_clusters,  # SQL-checked
        # the corpus AFTER dedup (drop non-representative cluster members)
        "dedup_survivors": dedup.dedup_survivors,  # SQL-checked
        # eval-set n-gram-overlap decontamination (broadcast bench set)
        "decontaminate": dedup.decontaminate,  # SQL-checked
        # streaming first-wins dedup through the crawl seen-set actors
        "dedup_incremental": dedup.dedup_incremental,  # SQL-checked
        # deterministic hash-based train/val/test assignment
        "split_assign": mixing.split_assign,  # SQL-checked (md5 coin)
        # source-weighted mixture downsample (deterministic Bernoulli)
        "mix_sample": mixing.mix_sample,  # SQL-checked (md5 coin)
        # GPT-style sample packing via an exact distributed prefix sum
        "pack_sequences": mixing.pack_sequences,  # SQL-checked
        # shard MATERIALIZATION: tokens → packed seqs → idempotent versioned store
        "training_shards": lambda sf: mixing.build_training_shards(
            sf, out_root=tempfile.mkdtemp(prefix="shards_q_", dir="/tmp")
        ),  # rows-only (brute + idempotency oracle in tests)
        # flagship composition: dedup → decontam → mix → split manifest
        "assemble_corpus": mixing.assemble_corpus,  # SQL-checked
        # DSIR importance weights vs a target slice (hashed unigrams)
        "dsir_weights": mixing.dsir_weights,  # SQL-checked (integer ratio)
        # DSIR resampling: deterministic weighted-reservoir top-k
        "dsir_sample": mixing.dsir_sample,  # SQL-checked
        # snapshot diff / reconciliation: hash-compare added/removed/changed
        "table_diff": mixing.table_diff,  # SQL-checked (coin-derived oracle)
        # per-group uniform sample via smallest-k stable coins
        "group_sample": mixing.group_sample,  # SQL-checked
        # --- distributed model training (closed form) ---
        # mergeable X^T X / X^T y sufficient statistics, exact integers
        "gram_matrix": ml.gram_matrix,  # SQL-checked
        # ridge language probe solved from the stats + scored in 1 pass
        "train_linear_probe": ml.train_linear_probe,  # rows-only (numpy parity in tests)
        # distributed Lloyd over embeddings (order-independent quantized
        # reduces); rows-only — single-process-Lloyd parity in tests
        # top principal component by power iteration (quantized reduces)
        "emb_pca_power": ml.pca_power,  # rows-only (planted-spectrum parity in tests)
        "kmeans_embeddings": ml.kmeans_embeddings,
        # --- graph analytics ---
        # integer power iteration over the md5-derived doc link graph
        "pagerank": graph.pagerank,
        # in-degree distribution incl. zero-degree nodes (skew audit)
        "graph_degree_hist": graph.degree_hist,  # SQL-checked  # SQL-checked (exact int arithmetic)
        # wedge-check triangle counting (groupby-wedges + shuffle join)
        "triangle_count": graph.triangle_count,  # SQL-checked
        # multi-source BFS levels (frontier joins + min-merge reduces)
        "bfs_levels": graph.bfs_levels,  # SQL-checked (recursive-CTE oracle)
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs,  # rows-only
        # signatures, not pairs: the driver corpus is uniform-vocab, so
        # nearly ALL pairs are within hamming 3 (a known simhash
        # degeneracy) — pair extraction is exercised on controlled
        # corpora in tests/test_dedup.py
        "dedup_simhash": dedup.simhash_signatures,  # SQL-checked (md5 bit-exact)
        # plant_every: deterministically-derived near-dup rows keep the
        # end-to-end check non-vacuous (random embeddings are
        # near-orthogonal → an unplanted corpus has zero pairs)
        "dedup_embedding": lambda sf_dir: dedup.embedding_neardup_pairs(
            sf_dir, plant_every=50
        ),  # rows-only
        # SemDeDup: k-means localization + within-cluster cosine prune;
        # rows-only (brute-force pruning oracle + planted-dup tests)
        "dedup_semantic": lambda sf_dir: dedup.semdedup(
            sf_dir, plant_every=50
        ),  # rows-only
        # --- similarity search ---
        "knn_bruteforce": ann.knn_bruteforce,  # SQL-checked (deterministic ranks)
        "knn_reciprocal": ann.knn_reciprocal,  # SQL-checked (mutual top-k pairs)
        "emb_centroid": ann.emb_centroid,  # SQL-checked (exact micro-unit moments)
        # INT8 scalar quantization (8× embedding compression, exact ints)
        "emb_quantize_int8": ann.emb_quantize_int8,  # SQL-checked
        "knn_ivf": ann.knn_ivf,  # rows-only (approximate)
        # PQ codes (32× compression) + ADC scan + exact re-rank
        "knn_ivfpq": ann.knn_ivfpq,  # rows-only (recall ≥0.8 pinned in tests)
        # --- multimodal ---
        "mm_image_features": multimodal.image_features,  # rows-only
        "mm_image_phash_neardup": multimodal.image_phash_neardup,  # rows-only
        "mm_image_resize": multimodal.image_resize,  # rows-only (PSNR/shape in tests)
        # flip + center-crop training augmentations (1→2 fan-out stage)
        "mm_image_augment": multimodal.image_augment,  # rows-only (reconstruction in tests)
        # aspect-preserving pad-to-square (detector/ViT input prep)
        "mm_image_letterbox": multimodal.image_letterbox,  # rows-only (reconstruction in tests)
        # variance-of-Laplacian sharpness screen (exact integer moments)
        "mm_image_blur_screen": multimodal.image_blur_screen,  # rows-only (blur invariant in tests)
        "mm_image_dedup_exact": multimodal.image_dedup_exact,  # rows-only (brute oracle in tests)
        "mm_image_histogram": multimodal.image_histogram,  # rows-only (Σbins=w·h in tests)
        # min_tokens=7 splits the corpus (captions carry 5-10 tokens), so the
        # SQL oracle exercises BOTH predicate branches
        "mm_caption_filter": lambda sf: multimodal.caption_filter(sf, min_tokens=7),  # SQL: predicates vs generator-intent caption manifest
        # image-side corpus-assembly flagship: exact dedup → phash clusters →
        # caption filter → split coin over the input_hint table
        "mm_assemble_corpus": multimodal.assemble_image_corpus,  # rows-only (brute oracle in tests)
        # ViT-style patch extraction (reconstruction oracle in tests)
        "mm_image_patchify": multimodal.image_patchify,  # rows-only
        # per-channel mergeable moments + corpus-wide normalization reduce
        "mm_image_channel_stats": multimodal.image_channel_stats,  # rows-only (numpy oracle in tests)
        "mm_image_corpus_norm": multimodal.image_corpus_norm,  # rows-only (numpy oracle in tests)
        # the north-star per-row invariant: decoded pixels ≡ reference
        # (exact / PSNR≥40dB lossy) + caption equality, as a pipeline
        "mm_image_verify": multimodal.image_verify,  # rows-only (corrupt-row oracle in tests)
        # REAL RIFF/PCM decode (audiocodec.py) — integer-exact features
        "mm_audio_features": multimodal.audio_features,  # rows-only (numpy brute oracle in tests)
        "mm_audio_segments": multimodal.audio_segments,  # rows-only (planted-silence oracle in tests)
        # same corpus, per-row WAV/FLAC/G.711/ADPCM/Ogg-FLAC mix
        # (flaccodec.py + oggcodec.py real decode; features pinned
        # identical across codecs in tests)
        "mm_audio_features_mixed": lambda sf: multimodal.audio_features(sf, codec="mixed"),  # rows-only
        # VORBIS_COMMENT tags (audiometa.py): tags → columns + PII key
        # scrub with audio frames untouched — the audio release gate
        "mm_audio_tags_scrub": multimodal.audio_tags_scrub,  # rows-only (round-trip + frame invariance in tests)
        # per-row png/jpeg/gif/bmp/tiff mix (gifcodec.py + tiffcodec.py
        # real LZW decodes; round-trips pinned in tests)
        "mm_image_features_mixed": multimodal.image_features_mixed,  # rows-only
        # EXIF (TIFF-IFD-in-APP1, exifmeta.py): metadata → columns +
        # GPS scrub with pixel bytes untouched — the PII release gate
        "mm_image_exif_scrub": multimodal.image_exif_scrub,  # rows-only (round-trip + pixel invariance in tests)
        # animated-GIF compositing (disposal/transparency/sub-rect) →
        # sampled-frame rows, actor-pool decode
        "mm_gif_frames": multimodal.gif_frame_sample,  # rows-only (compositing pinned in tests)
        "mm_gif_frames_meta": multimodal.gif_frame_meta,  # SQL: decode vs generator-intent manifest
        # REAL RIFF-AVI demux (videocodec.py) — frame sampling
        "mm_video_frames": multimodal.video_frame_sample,  # rows-only (codec round-trip in tests)
        # same corpus, per-row raw-DIB/MJPEG/MS-RLE8/MP4-MJPEG mix (videocodec.py + mp4codec.py
        # real compressed decode; planted cuts pinned per codec in tests)
        "mm_video_scene_cuts_mixed": lambda sf: multimodal.video_scene_cuts(sf, codec="mixed"),  # rows-only
        "mm_video_scene_cuts": multimodal.video_scene_cuts,  # rows-only (planted-cut oracle in tests)
        "mm_video_phash_neardup": multimodal.video_phash_neardup,  # rows-only (planted-pair oracle in tests)
        # --- the crawl engine itself ---
        "crawl_flagship": crawl_flagship,  # rows-only (oracle = refsim in tests)
        "crawl_sitemap_seeds": crawl_sitemap_seeds,  # rows-only (≡ configured seeds in tests)
        "crawl_recrawl": crawl_recrawl,  # rows-only (oracle = refsim prior_seen)
        "crawl_redirects": crawl_redirects,  # rows-only (oracle = refsim hop parity)
        "crawl_recrawl_conditional": crawl_recrawl_conditional,  # rows-only (refsim 304 parity)
        "crawl_distributed": crawl_distributed,  # rows-only (oracle = refsim sets)
        "crawl_fetch_report": crawl_fetch_report,  # SQL: rollup vs DuckDB GROUP BY over the exported log
        "archive_warc": archive_warc,  # rows-only (byte-parity in tests)
        "archive_reparse": archive_reparse,  # rows-only (≡ live entries in tests)
        "archive_wet": archive_wet,  # rows-only (tag-strip exactness in tests)
        # WAT metadata: nested list<struct> outlink records, Arrow-flattened rollup
        "archive_wat": archive_wat,  # rows-only (link-set ≡ Python ref in tests)
        # per-target anchor-text aggregation (inbound link descriptions)
        "archive_anchor_text": archive_anchor_text,  # rows-only (pandas ref in tests)
        # CDX prefix query with manifest-stat fragment pruning (scan planning)
        "archive_cdx_lookup": archive_cdx_lookup,  # rows-only (≡ full scan in tests)
        # shard consolidation + gc: pure byte movement, snapshot-committed index
        "archive_compact": archive_compact,  # rows-only (byte parity in tests)
        "archive_restore_images": archive_restore_images,  # rows-only (byte-level ≡ live store in tests)
        "archive_delta": archive_delta,  # rows-only (class semantics in tests)
        # URL-agnostic digest dedup: gen-2 archives zero bytes for moved/unchanged payloads
        "archive_dedup_revisit": archive_dedup_revisit,  # rows-only (byte-parity in tests)
        "recrawl_schedule": recrawl_schedule,  # rows-only (stats vs Python ref in tests)
        "archive_link_graph": archive_link_graph,  # rows-only (edges vs Python ref in tests)
    }


def oracle_sql() -> dict[str, str]:
    from crawlkit.pipelines.oracles import ORACLE_SQL

    return dict(ORACLE_SQL)
