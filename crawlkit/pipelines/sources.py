"""Non-parquet SOURCES: JSONL and CSV readers round-tripped through the
engine (SURVEY §2.1 S3 widened from a JSON *column* to JSON/CSV *files*).

The reference's only file-ish source is the JSON-over-HTTP envelope
(`database/handler.go:26`, `storage/handler.go:31`); a standalone engine
additionally needs to INGEST line-delimited JSON and CSV exports — the
two formats crawl/ETL fleets actually hand over. Both queries here
export the canonical parquet fixture to the target format once
(driver-side DuckDB ``COPY`` — deterministic bytes, atomic rename) and
then read it back with the NATIVE distributed readers
(``ray.data.read_json`` / ``ray.data.read_csv``), aggregating through
the normal partial-agg shape. The DuckDB oracle aggregates the original
parquet directly, so a hash match proves decode fidelity end to end
(strings, unicode escapes, int/float round-trip) — not just row counts.

At 100 TB the export step obviously disappears (the JSONL/CSV already
exists on object storage); what matters is that the read path is the
streaming block reader, prunes to the needed columns immediately after
decode (JSONL/CSV cannot prune at the read — a documented format cost
vs parquet), and never materializes the input.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _export(sf_dir: str, table: str, fmt: str, select: str) -> str:
    """Deterministic one-file export of a fixture table under /tmp.

    Keyed by (sf_dir, table, fmt); written to a tmp path and atomically
    renamed so concurrent callers and crashed halves never see partial
    files. Re-exported only when absent (content is a pure function of
    the read-only fixture)."""
    import duckdb

    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|{table}|{fmt}".encode()).hexdigest()[:16]
    root = f"/tmp/crawlkit_sources/{key}"
    final = f"{root}/{table}.{fmt}"
    if os.path.exists(final):
        return final
    os.makedirs(root, exist_ok=True)
    tmp = final + f".tmp{os.getpid()}"
    con = duckdb.connect()
    src = f"read_parquet('{sf_dir}/{table}.parquet')"
    if fmt == "jsonl":
        con.execute(f"COPY (SELECT {select} FROM {src} ORDER BY 1) TO '{tmp}' (FORMAT json)")
    else:
        con.execute(
            f"COPY (SELECT {select} FROM {src} ORDER BY 1) TO '{tmp}' (FORMAT csv, HEADER)"
        )
    con.close()
    os.replace(tmp, final)
    return final


def jsonl_roundtrip(sf_dir: str) -> rd.Dataset:
    """documents.parquet → JSONL → ``ray.data.read_json`` → per
    (source, lang) doc count + total chars. Exercises the line-delimited
    JSON decode path including unicode-escaped text."""
    path = _export(sf_dir, "documents", "jsonl", "doc_id, text, lang, source")

    ds = rd.read_json(path)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        df = pd.DataFrame(
            {
                "source": t["source"].to_pandas(),
                "lang": t["lang"].to_pandas(),
                # count chars from the round-tripped TEXT itself so the
                # oracle match proves string decode fidelity
                "chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()).to_pandas(),
            }
        )
        agg = df.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("chars", "size"), sum_chars=("chars", "sum")
        )
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(agg.astype({"n_docs": "int64", "sum_chars": "int64"}))

    from .relational import _sharded_agg

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def add_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "gkey", pc.binary_join_element_wise(t["source"], t["lang"], "\x1f")
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        agg = g.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum")
        )
        return pandas_to_clean_arrow(agg)

    return (
        partials.map_batches(add_key, batch_format="pyarrow")
        .groupby("gkey")
        .map_groups(fold, batch_format="pandas")
        .select_columns(["source", "lang", "n_docs", "sum_chars"])
    )


def csv_roundtrip(sf_dir: str) -> rd.Dataset:
    """events.parquet → CSV → ``ray.data.read_csv`` → per event_type
    count + integer-cents value sum. Floats cross the CSV boundary as
    shortest-round-trip decimals, so cents match the parquet oracle
    exactly."""
    path = _export(sf_dir, "events", "csv", "event_id, event_type, value")

    ds = rd.read_csv(path)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "cents": np.floor(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
                    np.int64
                ),
            }
        )
        agg = df.groupby("event_type", as_index=False).agg(
            n_events=("cents", "size"), sum_cents=("cents", "sum")
        )
        from .. import pandas_to_clean_arrow

        return pandas_to_clean_arrow(agg.astype({"n_events": "int64"}))

    def fold(g: pd.DataFrame) -> pa.Table:
        from .. import pandas_to_clean_arrow

        agg = g.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), sum_cents=("sum_cents", "sum")
        )
        return pandas_to_clean_arrow(agg)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(fold, batch_format="pandas")
    )
