"""In-process HTTP stub speaking the ClickHouse-HTTP ArrowStream
dialect, for offline transport tests.

Emulates exactly the server behavior the reference's HTTP client
depends on (clickhouse-arrow/src/http/client.rs:22-244):

- ``?query=<SQL> FORMAT ArrowStream`` -> Arrow IPC stream response
  (SQL evaluated by DuckDB over in-memory Arrow tables);
- ``?query=INSERT INTO t FORMAT ArrowStream`` + IPC-stream body ->
  rows appended to the named table;
- ``SELECT name, type FROM system.columns WHERE table = 't'`` answered
  from the table's schema rendered as ClickHouse type strings;
- ``TRUNCATE TABLE t`` empties a table;
- auth: when constructed with user/password, requests must carry the
  matching ``X-ClickHouse-User`` / ``X-ClickHouse-Key`` headers or get
  HTTP 403 (reference default_headers, http/client.rs:43-67);
- errors return non-2xx with the error text as the body.

Tables are pyarrow Tables guarded by one lock (concurrent executor
inserts). The stub records every SQL it served in ``queries`` — tests
assert pushdown reached the server by inspecting it.
"""

from __future__ import annotations

import io
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa

_SYSCOLS_RE = re.compile(
    r"SELECT name, type FROM system\.columns\s+WHERE table = '([^']+)'", re.I
)
_INSERT_RE = re.compile(r'^INSERT INTO "?([A-Za-z0-9_]+)"?\s+FORMAT ArrowStream$', re.I)
_TRUNCATE_RE = re.compile(r'^TRUNCATE TABLE "?([A-Za-z0-9_]+)"?$', re.I)


def _normalize(tbl: pa.Table) -> pa.Table:
    """Microsecond timestamps, like the transports expect."""
    fields = [
        pa.field(f.name, pa.timestamp("us", tz=f.type.tz), f.nullable)
        if pa.types.is_timestamp(f.type)
        else f
        for f in tbl.schema
    ]
    return tbl.cast(pa.schema(fields))


class ArrowHttpStub:
    """`with ArrowHttpStub(tables) as url:` — serves on an ephemeral
    localhost port; `tables` maps name -> pyarrow Table (or a parquet
    file path)."""

    def __init__(
        self,
        tables: dict[str, object],
        user: str | None = None,
        password: str | None = None,
    ):
        import pyarrow.parquet as pq

        self.tables: dict[str, pa.Table] = {}
        for name, t in tables.items():
            if isinstance(t, str):
                t = pq.read_table(t)
            self.tables[name] = _normalize(t)
        self.user = user
        self.password = password
        self.queries: list[str] = []
        self.compressed_requests = 0
        self.compressed_responses = 0
        self.chunked_requests = 0
        #: per chunked request, how many chunks arrived on the wire —
        #: a streaming writer yields one chunk per IPC segment, a
        #: buffering writer sends one big chunk
        self.chunk_counts: list[int] = []
        self.lock = threading.Lock()
        self._server: ThreadingHTTPServer | None = None
        #: rows per IPC record batch in SELECT responses (None = one)
        self.batch_rows: int | None = None
        #: when set (a threading.Event), SELECT responses are "dripped":
        #: the first record batch is written and flushed, then the
        #: handler blocks until the event fires before sending the rest.
        #: A client that buffers the whole body deadlocks here; a
        #: streaming client decodes batch 1 and releases the gate.
        self.drip_gate: threading.Event | None = None
        #: whether the gate fired before the handler's wait timed out
        self.drip_released: bool | None = None
        self._last_split: int | None = None

    # -- query evaluation --------------------------------------------

    def _ch_type_strings(self, table: str) -> list[tuple[str, str]]:
        from pyspark.sql.pandas.types import from_arrow_schema

        from clickhouse_arrow_spark.types import spark_type_to_ch

        schema = from_arrow_schema(self.tables[table].schema)
        return [
            (f.name, spark_type_to_ch(f.dataType, nullable=f.nullable))
            for f in schema.fields
        ]

    def handle_query(self, sql: str, body: bytes) -> bytes:
        """One request -> Arrow IPC stream bytes (b'' for commands)."""
        sql = sql.strip()
        with self.lock:
            self.queries.append(sql)
        m = _INSERT_RE.match(sql)
        if m:
            name = m.group(1)
            with pa.ipc.open_stream(io.BytesIO(body)) as reader:
                incoming = reader.read_all()
            with self.lock:
                if name not in self.tables:
                    raise KeyError(f"no such table {name}")
                existing = self.tables[name]
                incoming = _normalize(incoming).select(existing.schema.names)
                self.tables[name] = pa.concat_tables(
                    [existing, incoming.cast(existing.schema)]
                )
            return b""
        m = _TRUNCATE_RE.match(sql)
        if m:
            name = m.group(1)
            with self.lock:
                self.tables[name] = self.tables[name].slice(0, 0)
            return b""
        fmt = re.search(r"\s+FORMAT\s+(\w+)\s*$", sql)
        if fmt:
            if fmt.group(1) != "ArrowStream":
                raise ValueError(f"stub only speaks ArrowStream, got {fmt.group(1)}")
            sql = sql[: fmt.start()]
        m = _SYSCOLS_RE.search(sql)
        if m:
            name = m.group(1)
            if name not in self.tables:
                result = pa.table({"name": pa.array([], pa.string()),
                                   "type": pa.array([], pa.string())})
            else:
                cols = self._ch_type_strings(name)
                result = pa.table(
                    {
                        "name": pa.array([c[0] for c in cols]),
                        "type": pa.array([c[1] for c in cols]),
                    }
                )
        else:
            import duckdb

            con = duckdb.connect()
            with self.lock:
                snapshot = dict(self.tables)
            for tname, tbl in snapshot.items():
                con.register(tname, tbl)
            result = _normalize(con.execute(sql).fetch_arrow_table())
        batches = result.to_batches(max_chunksize=self.batch_rows) \
            if self.batch_rows else result.to_batches()
        buf = io.BytesIO()
        writer = pa.ipc.new_stream(buf, result.schema)
        split = None
        for i, b in enumerate(batches):
            writer.write_batch(b)
            if i == 0:
                split = buf.tell()
        writer.close()
        self._last_split = split
        return buf.getvalue()

    # -- server lifecycle --------------------------------------------

    def start(self) -> str:
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence test output
                pass

            def _respond(self, code: int, payload: bytes, encoding=None):
                self.send_response(code)
                if encoding:
                    self.send_header("Content-Encoding", encoding)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _serve(self):
                import gzip

                if stub.user and (
                    self.headers.get("X-ClickHouse-User") != stub.user
                    or self.headers.get("X-ClickHouse-Key") != stub.password
                ):
                    self._respond(403, b"authentication failed")
                    return
                qs = urllib.parse.urlparse(self.path).query
                sql = urllib.parse.parse_qs(qs).get("query", [""])[0]
                te = (self.headers.get("Transfer-Encoding") or "").lower()
                if "chunked" in te:
                    # chunked upload: size-line, chunk bytes, CRLF, ...
                    parts = []
                    while True:
                        size = int(self.rfile.readline().strip() or b"0", 16)
                        if size == 0:
                            self.rfile.readline()  # trailing CRLF
                            break
                        parts.append(self.rfile.read(size))
                        self.rfile.readline()
                    body = b"".join(parts)
                    stub.chunked_requests += 1
                    stub.chunk_counts.append(len(parts))
                else:
                    n = int(self.headers.get("Content-Length") or 0)
                    body = self.rfile.read(n) if n else b""
                # wire compression, like ClickHouse HTTP with
                # enable_http_compression=1: request bodies may arrive
                # Content-Encoding-compressed (gzip/lz4/zstd); responses
                # compress when the client advertises Accept-Encoding.
                enc = self.headers.get("Content-Encoding")
                if body and enc == "gzip":
                    body = gzip.decompress(body)
                    stub.compressed_requests += 1
                elif body and enc in ("lz4", "zstd"):
                    body = pa.CompressedInputStream(
                        pa.BufferReader(body), enc
                    ).read()
                    stub.compressed_requests += 1
                try:
                    payload = stub.handle_query(sql, body)
                except Exception as e:
                    self._respond(500, str(e).encode())
                    return
                accept = self.headers.get("Accept-Encoding") or ""
                resp_enc = next(
                    (e for e in ("gzip", "lz4", "zstd") if e in accept), None
                )
                if payload and resp_enc:
                    stub.compressed_responses += 1
                    if resp_enc == "gzip":
                        out = gzip.compress(payload)
                    else:
                        out = bytes(pa.Codec(resp_enc).compress(payload))
                    self._respond(200, out, resp_enc)
                elif (
                    payload
                    and stub.drip_gate is not None
                    and stub._last_split
                    and stub._last_split < len(payload)
                ):
                    # drip mode: partial body, gate, remainder — proves
                    # the client decodes incrementally off the socket
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload[: stub._last_split])
                    self.wfile.flush()
                    stub.drip_released = stub.drip_gate.wait(timeout=10)
                    self.wfile.write(payload[stub._last_split :])
                else:
                    self._respond(200, payload)

            do_GET = _serve
            do_POST = _serve

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return f"http://127.0.0.1:{self._server.server_address[1]}"

    def stop(self):
        if self._server:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def __enter__(self) -> str:
        return self.start()

    def __exit__(self, *exc):
        self.stop()
