"""url() / urlCluster() table functions: brace-glob expansion,
executor-side distributed fetch, driver inference path, dialect
routing through query_ch (reference: table-functions/url.md; the
reference client passes the TVF through to the server —
clickhouse-arrow/src/http/client.rs fetch machinery)."""

from __future__ import annotations

import gzip
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from clickhouse_arrow_spark.sources.url_tvf import (
    UrlTvfError,
    expand_url_globs,
    read_urls,
)


class StaticServer:
    """Serves a dict of path -> bytes on an ephemeral localhost port.
    Optional gzip Content-Encoding per path (suffix '.gz' serves the
    payload gzip-compressed with the header set)."""

    def __init__(self, files: dict[str, bytes]):
        self.files = files
        self.hits: list[str] = []
        self._server: ThreadingHTTPServer | None = None

    def start(self) -> str:
        srv = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                srv.hits.append(self.path)
                body = srv.files.get(self.path)
                if body is None:
                    self.send_response(404)
                    self.end_headers()
                    self.wfile.write(b"not found")
                    return
                headers = {}
                if self.path.endswith(".gzenc"):
                    body = gzip.compress(body)
                    headers["Content-Encoding"] = "gzip"
                self.send_response(200)
                for k, v in headers.items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(
            target=self._server.serve_forever, daemon=True
        ).start()
        return f"http://127.0.0.1:{self._server.server_address[1]}"

    def stop(self):
        if self._server:
            self._server.shutdown()
            self._server.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


# ---------------------------------------------------------------- globs


def test_glob_numeric_range():
    assert expand_url_globs("http://h/f_{1..3}.csv") == [
        "http://h/f_1.csv", "http://h/f_2.csv", "http://h/f_3.csv"
    ]


def test_glob_leading_zeros_and_alternation():
    assert expand_url_globs("http://h/{01..03}/{a,b}.csv") == [
        "http://h/01/a.csv", "http://h/01/b.csv",
        "http://h/02/a.csv", "http://h/02/b.csv",
        "http://h/03/a.csv", "http://h/03/b.csv",
    ]


def test_glob_errors():
    with pytest.raises(UrlTvfError, match="empty range"):
        expand_url_globs("http://h/{5..2}.csv")
    with pytest.raises(UrlTvfError, match="expands past"):
        expand_url_globs("http://h/{1..99}.csv", limit=10)


# ------------------------------------------------------------- fetches


def test_single_url_csv_inference(spark):
    with StaticServer({"/d.csv": b"1,alpha\n2,beta\n"}) as base:
        df = read_urls(spark, [f"{base}/d.csv"], "CSV")
        rows = sorted((r.c1, r.c2) for r in df.collect())
    assert rows == [(1, "alpha"), (2, "beta")]


def test_single_url_csv_with_names_and_gzip(spark):
    body = b"k,v\n1,alpha\n2,beta\n"
    with StaticServer({"/d.csvwn.gzenc": body}) as base:
        df = read_urls(spark, [f"{base}/d.csvwn.gzenc"], "CSVWithNames")
        rows = sorted((r.k, r.v) for r in df.collect())
    assert rows == [(1, "alpha"), (2, "beta")]


def test_multi_url_distributed_with_schema(spark):
    from pyspark.sql import types as T

    files = {
        f"/part_{i}.csv": f"{i},val{i}\n".encode() for i in (1, 2, 3)
    }
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    with StaticServer(files) as base:
        df = read_urls(
            spark,
            expand_url_globs(f"{base}/part_{{1..3}}.csv"),
            "CSV",
            schema,
        )
        assert df.rdd.getNumPartitions() == 3  # one task per URL
        rows = sorted((r.k, r.v) for r in df.collect())
    assert rows == [(1, "val1"), (2, "val2"), (3, "val3")]


def test_multi_url_without_schema_refused(spark):
    with pytest.raises(UrlTvfError, match="explicit column structure"):
        read_urls(spark, ["http://h/a.csv", "http://h/b.csv"], "CSV")


def test_parquet_url(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"k": [1, 2], "v": ["x", "y"]})
    buf = tmp_path / "t.parquet"
    pq.write_table(t, buf)
    with StaticServer({"/t.parquet": buf.read_bytes()}) as base:
        df = read_urls(spark, [f"{base}/t.parquet"], "Parquet")
        rows = sorted((r.k, r.v) for r in df.collect())
    assert rows == [(1, "x"), (2, "y")]


def test_jsoneachrow_url(spark):
    body = b'{"k": 1, "v": "x"}\n{"k": 2, "v": "y"}\n'
    with StaticServer({"/t.jsonl": body}) as base:
        df = read_urls(spark, [f"{base}/t.jsonl"], "JSONEachRow")
        rows = sorted((r.k, r.v) for r in df.collect())
    assert rows == [(1, "x"), (2, "y")]


def test_http_error_is_guided(spark):
    with StaticServer({}) as base:
        with pytest.raises(Exception, match="HTTP 404"):
            read_urls(spark, [f"{base}/miss.csv"], "CSV").collect()


def test_non_http_scheme_refused(spark):
    with pytest.raises(UrlTvfError, match="only http"):
        read_urls(spark, ["ftp://h/a.csv"], "CSV")


# ------------------------------------------------------- dialect route


def test_url_tvf_through_query_ch(client):
    body = b"1,alpha\n2,beta\n3,alpha\n"
    with StaticServer({"/d.csv": body}) as base:
        df = client.query_ch(
            f"SELECT c2, count() AS n FROM url('{base}/d.csv', 'CSV') "
            "GROUP BY c2 ORDER BY c2"
        )
        rows = [(r.c2, r.n) for r in df.collect()]
    assert rows == [("alpha", 2), ("beta", 1)]


def test_url_tvf_with_structure_through_query_ch(client):
    files = {f"/s_{i}.csv": f"{i},u{i}\n".encode() for i in (1, 2)}
    with StaticServer(files) as base:
        df = client.query_ch(
            f"SELECT k, v FROM url('{base}/s_{{1..2}}.csv', 'CSV', "
            "'k Int64, v String') ORDER BY k"
        )
        rows = [(r.k, r.v) for r in df.collect()]
    assert rows == [(1, "u1"), (2, "u2")]


def test_url_cluster_same_semantics(client):
    files = {f"/c_{i}.csv": f"{i}\n".encode() for i in (1, 2)}
    with StaticServer(files) as base:
        df = client.query_ch(
            f"SELECT sum(k) AS s FROM urlCluster('ignored', "
            f"'{base}/c_{{1..2}}.csv', 'CSV', 'k Int64')"
        )
        assert df.collect()[0].s == 3
