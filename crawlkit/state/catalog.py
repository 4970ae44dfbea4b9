"""Schema catalog — the reference's Postgres ``schemas`` table analog.

The reference ships a schema OBJECT alongside every crawl response
(schema-as-data, ``otodom/commons/entry.go:19-35``) and persists it per
``SchemaKey`` with ``INSERT … ON CONFLICT DO NOTHING`` into
``schemas(created, schema_group, schema_name, schema_version, data)``
(``commons/Entry.go:21-39``); within one saga the in-heap merge is
last-writer-wins (``otodom/orchestrator/handler.go:114``).

Ours: a small Lance-like table, one row per (schema_name,
schema_version, domain) registration per run; ``latest()`` resolves
last-wins by ``created``. Idempotent via deterministic fragment keys.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..hashing import fragment_name
from .lancelike import TableStore

CATALOG_SCHEMA = pa.schema(
    [
        ("schema_name", pa.string()),
        ("schema_version", pa.string()),
        ("domain", pa.string()),
        ("created", pa.string()),
        ("schema_json", pa.string()),
    ]
)


class CatalogStore:
    def __init__(self, root: str):
        self.store = TableStore(root)

    def register_run(self, registrations: list[dict], run_ts: str) -> int:
        """Persist one run's schema registrations (idempotent per run).

        ``registrations``: dicts with schema_name/schema_version/domain/
        fields (the parser registry's schema-as-data field map).
        """
        if not registrations:
            return self.store.latest_version()
        rows = [
            {
                "schema_name": r["schema_name"],
                "schema_version": r["schema_version"],
                "domain": r["domain"],
                "created": run_ts,
                "schema_json": json.dumps(r.get("fields", {}), sort_keys=True),
            }
            for r in registrations
        ]
        t = pa.Table.from_pylist(rows, schema=CATALOG_SCHEMA)
        key = fragment_name("catalog", run_ts, *sorted(
            (r["schema_name"], r["schema_version"], r["domain"]) for r in registrations
        ))
        return self.store.append(t, key=key)

    def read_all(self) -> pa.Table:
        return self.store.read_table()

    def latest(self) -> pa.Table:
        """Last-wins per (schema_name, schema_version, domain) by created
        (the orchestrator's ``schemas[key] = e.Schema`` semantics)."""
        t = self.read_all()
        if t.num_rows == 0:
            return CATALOG_SCHEMA.empty_table()
        import polars as pl

        df = pl.from_arrow(t)
        out = (
            df.sort("created")
            .group_by(["schema_name", "schema_version", "domain"], maintain_order=True)
            .last()
        )
        return out.to_arrow().cast(CATALOG_SCHEMA)
