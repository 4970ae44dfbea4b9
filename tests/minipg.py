"""In-process PostgreSQL-wire-protocol conformance server (test infra).

The Postgres sibling of minis3.py: a localhost socket server speaking
the v3 protocol a real PostgreSQL speaks — startup (with SSLRequest
refusal), AuthenticationOk (trust) or cleartext password, the simple
query cycle (RowDescription / DataRow / CommandComplete /
ErrorResponse / ReadyForQuery) — backed by a tiny SQL interpreter
covering exactly the catalog sink's dialect:

* ``CREATE TABLE IF NOT EXISTS t (cols..., PRIMARY KEY (k...))``
* ``INSERT INTO t (cols) VALUES (...), (...) ON CONFLICT (k...) DO
  NOTHING``  (the reference's idiom, commons/Entry.go:21-39)
* ``SELECT cols FROM t [ORDER BY col]``

Anything else gets a proper ErrorResponse, which the client must
surface as PgError and then keep the connection usable (the v3 error
cycle still ends in ReadyForQuery).
"""

from __future__ import annotations

import re
import socket
import struct
import threading


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack(">I", len(payload) + 4) + payload


_TOKEN_VALUES = re.compile(r"'(?:[^']|'')*'")


def _split_values(tuple_body: str) -> list[str]:
    """Split a VALUES tuple body into unquoted string values."""
    out = []
    for m in _TOKEN_VALUES.finditer(tuple_body):
        out.append(m.group(0)[1:-1].replace("''", "'"))
    return out


class _Table:
    def __init__(self, cols: list[str], pk: list[str]):
        self.cols = cols
        self.pk = pk
        self.rows: dict[tuple, list[str]] = {}


class MiniPgServer:
    """Threaded one-connection-per-thread v3 server."""

    def __init__(self, password: str | None = None):
        self.password = password
        self.tables: dict[str, _Table] = {}
        self.lock = threading.Lock()
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)

    def start(self) -> "MiniPgServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop = True
        try:
            self.sock.close()
        except OSError:
            pass

    # --- protocol ---------------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _read_exact(self, conn: socket.socket, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client gone")
            buf += chunk
        return buf

    def _serve(self, conn: socket.socket) -> None:
        try:
            # startup (possibly preceded by an SSLRequest, refused with 'N')
            while True:
                (ln,) = struct.unpack(">I", self._read_exact(conn, 4))
                body = self._read_exact(conn, ln - 4)
                (code,) = struct.unpack(">I", body[:4])
                if code == 80877103:  # SSLRequest
                    conn.sendall(b"N")
                    continue
                if code != 196608:
                    conn.sendall(self._error("08P01", "unsupported protocol"))
                    return
                break
            if self.password is not None:
                conn.sendall(_msg(b"R", struct.pack(">I", 3)))  # cleartext
                tag = self._read_exact(conn, 1)
                (ln,) = struct.unpack(">I", self._read_exact(conn, 4))
                pw = self._read_exact(conn, ln - 4)[:-1].decode()
                if tag != b"p" or pw != self.password:
                    conn.sendall(self._error("28P01", "password authentication failed"))
                    return
            conn.sendall(_msg(b"R", struct.pack(">I", 0)))  # AuthenticationOk
            conn.sendall(_msg(b"S", _cstr("server_version") + _cstr("16.0-mini")))
            conn.sendall(_msg(b"Z", b"I"))
            while True:
                tag = self._read_exact(conn, 1)
                (ln,) = struct.unpack(">I", self._read_exact(conn, 4))
                body = self._read_exact(conn, ln - 4)
                if tag == b"X":
                    return
                if tag != b"Q":
                    conn.sendall(self._error("0A000", f"unsupported message {tag!r}"))
                    conn.sendall(_msg(b"Z", b"I"))
                    continue
                sql = body[:-1].decode().strip().rstrip(";").strip()
                try:
                    conn.sendall(self._run(sql))
                except _SqlError as e:
                    conn.sendall(self._error("42601", str(e)))
                conn.sendall(_msg(b"Z", b"I"))
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def _error(self, code: str, message: str) -> bytes:
        payload = (
            b"S" + _cstr("ERROR") + b"C" + _cstr(code) + b"M" + _cstr(message) + b"\x00"
        )
        return _msg(b"E", payload)

    # --- the tiny SQL dialect ----------------------------------------------

    def _run(self, sql: str) -> bytes:
        low = sql.lower()
        if low.startswith("create table if not exists"):
            m = re.match(
                r"create table if not exists (\w+)\s*\((.*)\)$", sql, re.I | re.S
            )
            if not m:
                raise _SqlError("malformed CREATE TABLE")
            name, body = m.group(1).lower(), m.group(2)
            pk_m = re.search(r"primary key\s*\(([^)]*)\)", body, re.I)
            pk = [c.strip().lower() for c in pk_m.group(1).split(",")] if pk_m else []
            cols = [
                seg.strip().split()[0].lower()
                for seg in re.sub(r"primary key\s*\([^)]*\)", "", body, flags=re.I).split(",")
                if seg.strip()
            ]
            with self.lock:
                self.tables.setdefault(name, _Table(cols, pk))
            return _msg(b"C", _cstr("CREATE TABLE"))
        if low.startswith("insert into"):
            m = re.match(
                r"insert into (\w+)\s*\(([^)]*)\)\s*values\s*(.*?)\s*"
                r"(on conflict\s*\(([^)]*)\)\s*do nothing)?$",
                sql,
                re.I | re.S,
            )
            if not m:
                raise _SqlError("malformed INSERT")
            name = m.group(1).lower()
            cols = [c.strip().lower() for c in m.group(2).split(",")]
            tuples = re.findall(r"\((?:[^()']|'(?:[^']|'')*')*\)", m.group(3))
            on_conflict = m.group(4) is not None
            with self.lock:
                t = self.tables.get(name)
                if t is None:
                    raise _SqlError(f"relation {name} does not exist")
                if set(cols) != set(t.cols):
                    raise _SqlError("column list mismatch")
                n = 0
                for tup in tuples:
                    vals = _split_values(tup)
                    if len(vals) != len(cols):
                        raise _SqlError("VALUES arity mismatch")
                    row = dict(zip(cols, vals))
                    key = tuple(row[k] for k in (t.pk or cols))
                    if key in t.rows:
                        if on_conflict:
                            continue
                        raise _SqlError("duplicate key violates primary key")
                    t.rows[key] = [row[c] for c in t.cols]
                    n += 1
            return _msg(b"C", _cstr(f"INSERT 0 {n}"))
        if low.startswith("select"):
            m = re.match(
                r"select (.*?) from (\w+)(?:\s+order by\s+(\w+))?$", sql, re.I | re.S
            )
            if not m:
                raise _SqlError("malformed SELECT")
            name = m.group(2).lower()
            with self.lock:
                t = self.tables.get(name)
                if t is None:
                    raise _SqlError(f"relation {name} does not exist")
                sel = [c.strip().lower() for c in m.group(1).split(",")]
                if sel == ["*"]:
                    sel = list(t.cols)
                for c in sel:
                    if c not in t.cols:
                        raise _SqlError(f"column {c} does not exist")
                rows = list(t.rows.values())
            if m.group(3):
                ob = m.group(3).lower()
                if ob not in t.cols:
                    raise _SqlError(f"column {ob} does not exist")
                rows.sort(key=lambda r: r[t.cols.index(ob)])
            # RowDescription
            rd = struct.pack(">H", len(sel))
            for c in sel:
                rd += _cstr(c) + struct.pack(">IhIhih", 0, 0, 25, -1, -1, 0)  # TEXT
            out = _msg(b"T", rd)
            for r in rows:
                dr = struct.pack(">H", len(sel))
                for c in sel:
                    v = r[t.cols.index(c)].encode()
                    dr += struct.pack(">i", len(v)) + v
                out += _msg(b"D", dr)
            out += _msg(b"C", _cstr(f"SELECT {len(rows)}"))
            return out
        raise _SqlError(f"unsupported statement: {sql[:40]}")


class _SqlError(Exception):
    pass
