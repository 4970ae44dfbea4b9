"""Minimal PostgreSQL wire-protocol (v3) client + catalog sink.

Closes the reference's Postgres seam with a REAL wire protocol instead
of a parquet stand-in: the reference persists crawl schemas and
entries with ``INSERT … ON CONFLICT DO NOTHING`` through lib/pq
(``otodom/commons/Entry.go:21-39``); :class:`PgCatalogStore` speaks
the same SQL idiom over this client, so pointing it at a real
PostgreSQL (or any v3-compatible server) is a connection-string
change. ``tests/minipg.py`` is the in-sandbox conformance server — a
scripted v3-protocol implementation the client must drive correctly
(startup, SSLRequest refusal, simple query, error surfacing).

Deliberately small (stdlib socket only), covering exactly what the
catalog sink needs:

* startup + trust / cleartext-password authentication,
* the SIMPLE QUERY protocol ('Q' → RowDescription / DataRow /
  CommandComplete / ErrorResponse / ReadyForQuery), text-format
  values,
* one connection per instance, constructed once per actor (T1) and
  reused — never per request (the reference's T2 anti-pattern,
  flat_crawler opening a client per invocation, stays fixed).

Extended protocol (prepared statements, binary formats, COPY) is out
of scope — the catalog writes are low-rate driver-side commits; bulk
row traffic belongs in the object-store tier, not Postgres (SURVEY
§2.4 S4).
"""

from __future__ import annotations

import socket
import struct


class PgError(Exception):
    def __init__(self, fields: dict):
        self.fields = fields
        super().__init__(fields.get("M", "postgres error"))


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack(">I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def quote_literal(v: str) -> str:
    """Standard SQL single-quote escaping."""
    return "'" + v.replace("'", "''") + "'"


class PgClient:
    """One v3-protocol connection; ``query`` runs the simple protocol."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 5432,
        dbname: str = "postgres",
        user: str = "postgres",
        password: str = "",
        timeout: float = 15.0,
    ):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        params = b"".join(
            _cstr(k) + _cstr(v) for k, v in (("user", user), ("database", dbname))
        ) + b"\x00"
        payload = struct.pack(">I", 196608) + params  # protocol 3.0
        self.sock.sendall(struct.pack(">I", len(payload) + 4) + payload)
        # authentication handshake
        while True:
            tag, body = self._recv()
            if tag == b"R":
                (code,) = struct.unpack(">I", body[:4])
                if code == 0:  # AuthenticationOk
                    continue
                if code == 3:  # cleartext password
                    self.sock.sendall(_msg(b"p", _cstr(password)))
                    continue
                raise PgError({"M": f"unsupported auth method {code}"})
            if tag == b"E":
                raise PgError(_parse_error(body))
            if tag == b"Z":  # ReadyForQuery
                return
            # ParameterStatus / BackendKeyData / NoticeResponse: ignore

    def _recv(self) -> tuple[bytes, bytes]:
        while len(self._buf) < 5:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise PgError({"M": "connection closed by server"})
            self._buf += chunk
        tag = self._buf[:1]
        (ln,) = struct.unpack(">I", self._buf[1:5])
        while len(self._buf) < 1 + ln:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise PgError({"M": "connection closed mid-message"})
            self._buf += chunk
        body = self._buf[5 : 1 + ln]
        self._buf = self._buf[1 + ln :]
        return tag, body

    def query(self, sql: str) -> tuple[list[str], list[list["str | None"]]]:
        """Simple-query protocol: returns (column names, text rows).
        Statements without a result set return ([], [])."""
        self.sock.sendall(_msg(b"Q", _cstr(sql)))
        cols: list[str] = []
        rows: list[list["str | None"]] = []
        err: "dict | None" = None
        while True:
            tag, body = self._recv()
            if tag == b"T":  # RowDescription
                (nf,) = struct.unpack(">H", body[:2])
                off = 2
                cols = []
                for _ in range(nf):
                    end = body.index(b"\x00", off)
                    cols.append(body[off:end].decode())
                    off = end + 1 + 18  # tableoid/attnum/typoid/len/mod/fmt
            elif tag == b"D":  # DataRow
                (nf,) = struct.unpack(">H", body[:2])
                off = 2
                row: list["str | None"] = []
                for _ in range(nf):
                    (ln,) = struct.unpack(">i", body[off : off + 4])
                    off += 4
                    if ln < 0:
                        row.append(None)
                    else:
                        row.append(body[off : off + ln].decode())
                        off += ln
                rows.append(row)
            elif tag == b"E":
                err = _parse_error(body)
            elif tag == b"Z":  # ReadyForQuery — end of cycle
                if err is not None:
                    raise PgError(err)
                return cols, rows
            # CommandComplete / EmptyQueryResponse / Notice: fall through

    def close(self) -> None:
        try:
            self.sock.sendall(_msg(b"X", b""))
        except OSError:
            pass
        self.sock.close()


def _parse_error(body: bytes) -> dict:
    fields = {}
    off = 0
    while off < len(body) and body[off] != 0:
        code = chr(body[off])
        end = body.index(b"\x00", off + 1)
        fields[code] = body[off + 1 : end].decode()
        off = end + 1
    return fields


CATALOG_DDL = (
    "CREATE TABLE IF NOT EXISTS schemas ("
    "schema_name TEXT, schema_version TEXT, domain TEXT, created TEXT, "
    "schema_json TEXT, "
    "PRIMARY KEY (schema_name, schema_version, domain, created))"
)


class PgCatalogStore:
    """The reference's Postgres schema sink over the wire client.

    Same surface as :class:`crawlkit.state.catalog.CatalogStore`
    (register_run / read_all / latest) and the same write idiom as the
    reference (``INSERT … ON CONFLICT DO NOTHING``,
    commons/Entry.go:21-39), so re-registering a run is a no-op —
    the idempotency the parquet store gets from deterministic fragment
    keys, Postgres gets from the primary key."""

    def __init__(self, client: PgClient):
        self.client = client
        self.client.query(CATALOG_DDL)

    def register_run(self, registrations: list[dict], run_ts: str) -> int:
        import json as _json

        if not registrations:
            return 0
        values = ", ".join(
            "({}, {}, {}, {}, {})".format(
                quote_literal(r["schema_name"]),
                quote_literal(r["schema_version"]),
                quote_literal(r["domain"]),
                quote_literal(run_ts),
                quote_literal(_json.dumps(r.get("fields", {}), sort_keys=True)),
            )
            for r in registrations
        )
        self.client.query(
            "INSERT INTO schemas (schema_name, schema_version, domain, created, "
            f"schema_json) VALUES {values} ON CONFLICT (schema_name, "
            "schema_version, domain, created) DO NOTHING"
        )
        return len(registrations)

    def read_all(self):
        import pyarrow as pa

        from .catalog import CATALOG_SCHEMA

        cols, rows = self.client.query(
            "SELECT schema_name, schema_version, domain, created, schema_json "
            "FROM schemas ORDER BY created"
        )
        if not rows:
            return CATALOG_SCHEMA.empty_table()
        arrays = [pa.array([r[i] for r in rows], pa.string()) for i in range(5)]
        return pa.table(dict(zip(cols, arrays))).cast(CATALOG_SCHEMA)

    def latest(self):
        """Last-wins per (schema_name, schema_version, domain) by
        created — resolved client-side over the ordered read, exactly
        like the parquet store (and the orchestrator's in-heap
        ``schemas[key] = e.Schema``)."""
        from .catalog import CATALOG_SCHEMA

        t = self.read_all()
        if t.num_rows == 0:
            return CATALOG_SCHEMA.empty_table()
        best: dict[tuple, dict] = {}
        for row in t.to_pylist():  # rows already ordered by created
            best[(row["schema_name"], row["schema_version"], row["domain"])] = row
        import pyarrow as pa

        return pa.Table.from_pylist(list(best.values()), schema=CATALOG_SCHEMA)
