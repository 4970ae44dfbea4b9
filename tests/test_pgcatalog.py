"""Postgres-wire catalog conformance: the second half of the storage
seam (minis3/test_s3store cover the object store).

Pins: the v3 protocol round-trip (startup, SSLRequest refusal,
cleartext auth, simple-query cycle, error surfacing that leaves the
connection usable), the reference's INSERT … ON CONFLICT DO NOTHING
idempotency (commons/Entry.go:21-39), and — the drop-in contract —
PgCatalogStore returning EXACTLY what the parquet CatalogStore returns
for the same registrations.
"""

from __future__ import annotations

import pytest

from minipg import MiniPgServer
from crawlkit.state.catalog import CatalogStore
from crawlkit.state.pgwire import PgCatalogStore, PgClient, PgError, quote_literal


@pytest.fixture(scope="module")
def server():
    srv = MiniPgServer().start()
    yield srv
    srv.stop()


@pytest.fixture
def client(server):
    c = PgClient(port=server.port, dbname="crawl", user="crawler")
    yield c
    c.close()


REGS_RUN1 = [
    {"schema_name": "flat", "schema_version": "v1", "domain": "example.com",
     "fields": {"price": "number", "rooms": "number"}},
    {"schema_name": "office", "schema_version": "v2", "domain": "example.com",
     "fields": {"area": "number"}},
]
REGS_RUN2 = [
    {"schema_name": "flat", "schema_version": "v1", "domain": "example.com",
     "fields": {"price": "number"}},  # later run wins in latest()
]


def test_wire_roundtrip_and_errors(client):
    cols, rows = client.query(
        "CREATE TABLE IF NOT EXISTS t1 (a TEXT, b TEXT, PRIMARY KEY (a))"
    )
    assert (cols, rows) == ([], [])
    client.query("INSERT INTO t1 (a, b) VALUES ('x', 'it''s') ON CONFLICT (a) DO NOTHING")
    cols, rows = client.query("SELECT a, b FROM t1")
    assert cols == ["a", "b"] and rows == [["x", "it's"]]
    with pytest.raises(PgError) as e:
        client.query("DROP TABLE t1")  # unsupported → ErrorResponse
    assert "unsupported" in str(e.value)
    # the error cycle ends in ReadyForQuery: the connection still works
    assert client.query("SELECT a FROM t1")[1] == [["x"]]


def test_duplicate_key_without_on_conflict_errors(client):
    client.query("CREATE TABLE IF NOT EXISTS t2 (k TEXT, v TEXT, PRIMARY KEY (k))")
    client.query("INSERT INTO t2 (k, v) VALUES ('a', '1') ON CONFLICT (k) DO NOTHING")
    with pytest.raises(PgError):
        client.query("INSERT INTO t2 (k, v) VALUES ('a', '2')")


def test_cleartext_password_auth():
    srv = MiniPgServer(password="sekret").start()
    try:
        c = PgClient(port=srv.port, password="sekret")
        assert c.query("CREATE TABLE IF NOT EXISTS p (x TEXT)") == ([], [])
        c.close()
        with pytest.raises(PgError):
            PgClient(port=srv.port, password="wrong")
    finally:
        srv.stop()


def test_quote_literal():
    assert quote_literal("o'brien") == "'o''brien'"


def test_pg_catalog_matches_parquet_catalog(server, client, tmp_path):
    """Drop-in contract: same registrations → identical read_all()
    and latest() tables (same schema, same rows)."""
    pg = PgCatalogStore(client)
    fs = CatalogStore(str(tmp_path / "cat"))
    for store in (pg, fs):
        store.register_run(REGS_RUN1, run_ts="2026-01-01T00:00:00")
        store.register_run(REGS_RUN1, run_ts="2026-01-01T00:00:00")  # idempotent
        store.register_run(REGS_RUN2, run_ts="2026-01-02T00:00:00")

    def canon(t):
        return sorted(map(tuple, zip(*[t[c].to_pylist() for c in t.column_names])))

    assert pg.read_all().schema == fs.read_all().schema
    assert canon(pg.read_all()) == canon(fs.read_all())
    assert canon(pg.latest()) == canon(fs.latest())
    # last-wins actually resolved: flat/v1 carries run-2's fields
    lat = {
        (r["schema_name"], r["schema_version"]): r["schema_json"]
        for r in pg.latest().to_pylist()
    }
    assert lat[("flat", "v1")] == '{"price": "number"}'
