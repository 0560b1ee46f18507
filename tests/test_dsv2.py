"""Python DataSource (DSv2) connector tests: schema introspection
through the CH type bridge, filter pushdown recorded and applied,
row-group partitioning, and result parity with the plain parquet scan."""

from __future__ import annotations

import json

import pytest

from clickhouse_arrow_spark.sources.dsv2 import ClickHouseDataSource, MockTransport
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def ds_spark(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ClickHouseDataSource)
    return spark


def _load(ds_spark, table, log=None):
    r = (
        ds_spark.read.format("clickhouse")
        .option("table", table)
        .option("path", SF_DIR)
    )
    if log:
        r = r.option("pushdown_log", log)
    return r.load()


def test_schema_matches_parquet(ds_spark):
    got = _load(ds_spark, "part").schema
    want = ds_spark.read.parquet(f"{SF_DIR}/part.parquet").schema
    assert [f.name for f in got.fields] == [f.name for f in want.fields]


def test_system_columns_renders_ch_types():
    cols = dict(MockTransport(SF_DIR).system_columns("orders"))
    assert cols["o_orderkey"] == "Nullable(Int64)"
    assert cols["o_orderstatus"] == "Nullable(String)"
    assert cols["o_totalprice"] == "Nullable(Float64)"


def test_filters_pushed_and_results_match(ds_spark, tmp_path):
    log = str(tmp_path / "pushdown.jsonl")
    df = _load(ds_spark, "orders", log=log)
    pred = "o_totalprice > 400000 AND o_orderstatus = 'O'"
    got = df.where(pred).count()
    want = ds_spark.read.parquet(f"{SF_DIR}/orders.parquet").where(pred).count()
    assert got == want and got > 0
    records = [json.loads(ln) for ln in open(log)]
    pushed = [p for r in records if r["table"] == "orders" for p in r["pushed"]]
    assert any("o_totalprice" in p and "GreaterThan" in p for p in pushed)
    assert any("o_orderstatus" in p and "EqualTo" in p for p in pushed)


def test_unsupported_filter_stays_in_spark(ds_spark, tmp_path):
    log = str(tmp_path / "pushdown2.jsonl")
    df = _load(ds_spark, "part", log=log)
    # disjunctions are not pushable per the AND-list contract
    pred = "p_size = 1 OR p_size = 50"
    got = df.where(pred).count()
    want = ds_spark.read.parquet(f"{SF_DIR}/part.parquet").where(pred).count()
    assert got == want and got > 0
    # Spark either skips pushFilters entirely (no convertible filters)
    # or calls it with an empty list — either way nothing was pushed.
    import os

    if os.path.exists(log):
        records = [json.loads(ln) for ln in open(log)]
        pushed = [p for r in records if r["table"] == "part" for p in r["pushed"]]
        assert not any("p_size" in p for p in pushed)


def test_full_scan_row_parity(ds_spark):
    got = _load(ds_spark, "customer").count()
    want = ds_spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert got == want


def test_insert_write_path_roundtrip(ds_spark, tmp_path):
    import os

    src = ds_spark.range(0, 1000).selectExpr(
        "id AS k", "CAST(id * 2 AS DOUBLE) AS v"
    )
    (
        src.write.format("clickhouse")
        .option("table", "t_out")
        .option("path", str(tmp_path))
        .mode("append")
        .save()
    )
    out_dir = str(tmp_path / "t_out.insert")
    back = ds_spark.read.parquet(out_dir)
    assert back.count() == 1000
    assert back.selectExpr("sum(v) AS s").first()["s"] == float(sum(2 * i for i in range(1000)))
    assert os.path.exists(os.path.join(out_dir, "_MANIFEST.jsonl"))
    # append again: rows accumulate (no overwrite)
    (
        src.limit(10).write.format("clickhouse")
        .option("table", "t_out")
        .option("path", str(tmp_path))
        .mode("append")
        .save()
    )
    assert ds_spark.read.parquet(out_dir).count() == 1010


def test_insert_overwrite_replaces(ds_spark, tmp_path):
    src = ds_spark.range(0, 100).selectExpr("id AS k")
    w = (
        src.write.format("clickhouse")
        .option("table", "t_ow")
        .option("path", str(tmp_path))
    )
    w.mode("append").save()
    (
        ds_spark.range(0, 7).selectExpr("id AS k")
        .write.format("clickhouse")
        .option("table", "t_ow")
        .option("path", str(tmp_path))
        .mode("overwrite")
        .save()
    )
    back = ds_spark.read.option("pathGlobFilter", "part-*.parquet").parquet(
        str(tmp_path / "t_ow.insert")
    )
    assert back.count() == 7


# ---------------------------------------------------------------------------
# HTTP ArrowStream transport (the real wire path) against the in-process
# stub speaking the ClickHouse HTTP dialect
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def http_stub():
    from tests.http_stub import ArrowHttpStub

    stub = ArrowHttpStub(
        {
            "nation": f"{SF_DIR}/nation.parquet",
            "orders": f"{SF_DIR}/orders.parquet",
        }
    )
    url = stub.start()
    yield stub, url
    stub.stop()


def _http_load(ds_spark, url, table, **opts):
    r = ds_spark.read.format("clickhouse").option("table", table).option("url", url)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_http_system_columns_match_mock(http_stub):
    from clickhouse_arrow_spark.sources.http_transport import HttpArrowTransport

    stub, url = http_stub
    got = dict(HttpArrowTransport(url).system_columns("orders"))
    want = dict(MockTransport(SF_DIR).system_columns("orders"))
    assert got == want


def test_http_scan_row_parity(ds_spark, http_stub):
    stub, url = http_stub
    got = _http_load(ds_spark, url, "nation")
    want = ds_spark.read.parquet(f"{SF_DIR}/nation.parquet")
    assert got.count() == want.count()
    assert got.selectExpr("sum(n_nationkey) AS s").first()["s"] == \
        want.selectExpr("sum(n_nationkey) AS s").first()["s"]


def test_http_filter_pushdown_reaches_server(ds_spark, http_stub):
    stub, url = http_stub
    df = _http_load(ds_spark, url, "orders")
    pred = "o_totalprice > 400000 AND o_orderstatus = 'O'"
    got = df.where(pred).count()
    want = ds_spark.read.parquet(f"{SF_DIR}/orders.parquet").where(pred).count()
    assert got == want and got > 0
    # the stub records every SQL it served: the pushed predicates must
    # appear in the scan's WHERE clause (server-side pruning)
    scans = [q for q in stub.queries if q.startswith('SELECT * FROM "orders"')]
    assert any(
        '"o_totalprice" > 400000' in q and "\"o_orderstatus\" = 'O'" in q
        for q in scans
    )


def test_http_range_partitioned_scan(ds_spark, http_stub):
    stub, url = http_stub
    before = len(stub.queries)
    df = _http_load(
        ds_spark, url, "orders",
        partition_column="o_orderkey", num_partitions="4",
    )
    got = df.count()
    want = ds_spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert got == want
    ranged = [
        q for q in stub.queries[before:]
        if q.startswith('SELECT * FROM "orders"') and '"o_orderkey"' in q
    ]
    # 4 slices, each its own server-side range scan
    assert len(ranged) == 4


def test_http_insert_roundtrip_and_overwrite(ds_spark, http_stub):
    import pyarrow as pa

    stub, url = http_stub
    with stub.lock:
        stub.tables["t_http"] = pa.table(
            {"k": pa.array([], pa.int64()), "v": pa.array([], pa.float64())}
        )
    src = ds_spark.range(0, 500).selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS v")
    (
        src.write.format("clickhouse")
        .option("table", "t_http").option("url", url)
        .mode("append").save()
    )
    back = _http_load(ds_spark, url, "t_http")
    assert back.count() == 500
    assert back.selectExpr("sum(v) AS s").first()["s"] == float(
        sum(2 * i for i in range(500))
    )
    # overwrite truncates server-side, then inserts the new rows
    (
        src.limit(7).write.format("clickhouse")
        .option("table", "t_http").option("url", url)
        .mode("overwrite").save()
    )
    assert _http_load(ds_spark, url, "t_http").count() == 7
    assert any(q.startswith("TRUNCATE TABLE") for q in stub.queries)


def test_http_auth_headers_enforced():
    import pyarrow.parquet as pq

    from clickhouse_arrow_spark.sources.http_transport import (
        HttpArrowTransport,
        TransportError,
    )
    from tests.http_stub import ArrowHttpStub

    tbl = pq.read_table(f"{SF_DIR}/region.parquet")
    with ArrowHttpStub({"region": tbl}, user="u1", password="sekrit") as url:
        ok = HttpArrowTransport(url, user="u1", password="sekrit")
        assert len(ok.system_columns("region")) == len(tbl.schema)
        bad = HttpArrowTransport(url, user="u1", password="wrong")
        with pytest.raises(TransportError, match="403"):
            bad.system_columns("region")


def test_http_query_arrow_and_single_insert(http_stub):
    import pyarrow as pa

    from clickhouse_arrow_spark.sources.http_transport import HttpArrowTransport

    stub, url = http_stub
    t = HttpArrowTransport(url)
    tbl = t.query_arrow('SELECT count(*) AS n FROM "nation"')
    assert tbl.column("n").to_pylist() == [25]
    with stub.lock:
        stub.tables["t_one"] = pa.table({"k": pa.array([], pa.int64())})
    rows = t.insert("t_one", pa.record_batch({"k": pa.array([1, 2, 3])}))
    assert rows == 3
    assert t.query_arrow('SELECT count(*) AS n FROM "t_one"').column(
        "n"
    ).to_pylist() == [3]


def test_http_server_error_is_surfaced(http_stub):
    from clickhouse_arrow_spark.sources.http_transport import (
        HttpArrowTransport,
        TransportError,
    )

    stub, url = http_stub
    with pytest.raises(TransportError, match="500"):
        HttpArrowTransport(url).query_batches("SELECT * FROM no_such_table")


def test_client_remote_surface(ds_spark, http_stub):
    import pyarrow as pa

    from clickhouse_arrow_spark.builder import ClientBuilder

    stub, url = http_stub
    client = (
        ClientBuilder().with_session(ds_spark).with_http_url(url).build()
    )
    df = client.read_remote("nation")
    want = ds_spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    assert df.count() == want
    with stub.lock:
        stub.tables["t_client"] = pa.table({"k": pa.array([], pa.int64())})
    client.insert_remote("t_client", ds_spark.range(0, 40).selectExpr("id AS k"))
    assert client.read_remote("t_client").count() == 40
    client.insert_remote(
        "t_client", ds_spark.range(0, 5).selectExpr("id AS k"), overwrite=True
    )
    assert client.read_remote("t_client").count() == 5


def test_client_remote_requires_endpoint(ds_spark):
    from clickhouse_arrow_spark.client import Client

    c = Client(ds_spark)
    with pytest.raises(ValueError, match="no HTTP endpoint"):
        c.read_remote("nation")


def test_http_transport_gzip_compression(spark):
    """Wire compression (the reference's compression.rs analogue over
    HTTP Content-Encoding): scan responses arrive gzip-compressed and
    insert bodies go up gzip-compressed — values identical to the
    uncompressed path, and the stub proves bytes were actually
    compressed on both directions."""
    import pyarrow as pa

    from clickhouse_arrow_spark.sources.http_transport import (
        HttpArrowTransport,
    )
    from tests.http_stub import ArrowHttpStub

    table = pa.table({"k": list(range(100)), "v": [f"s{i}" for i in range(100)]})
    stub = ArrowHttpStub({"t": table, "sink": table.slice(0, 0)})
    with stub as url:
        t = HttpArrowTransport(url, compression="gzip")
        got = t.query_arrow("SELECT k, v FROM t ORDER BY k")
        assert got.num_rows == 100
        assert got.column("k").to_pylist() == list(range(100))
        assert stub.compressed_responses >= 1
        # insert path: request body compressed
        sent = t.insert("sink", table.to_batches()[0])
        assert sent == 100
        assert stub.compressed_requests >= 1
        back = t.query_arrow("SELECT count(*) AS n FROM sink")
        assert back.column("n").to_pylist() == [100]


@pytest.mark.parametrize("codec", ["lz4", "zstd"])
def test_http_transport_lz4_zstd_compression(codec):
    """LZ4 (the reference's DEFAULT wire codec, compression.rs) and
    zstd are REAL via pyarrow's built-in C codecs: responses stream-
    decode through CompressedInputStream, insert bodies go up
    frame-compressed, values identical to the uncompressed path."""
    import pyarrow as pa

    from clickhouse_arrow_spark.sources.http_transport import HttpArrowTransport
    from tests.http_stub import ArrowHttpStub

    table = pa.table({"k": list(range(200)), "v": [f"s{i}" for i in range(200)]})
    stub = ArrowHttpStub({"t": table, "sink": table.slice(0, 0)})
    with stub as url:
        t = HttpArrowTransport(url, compression=codec)
        got = t.query_arrow("SELECT k, v FROM t ORDER BY k")
        assert got.num_rows == 200
        assert got.column("k").to_pylist() == list(range(200))
        assert stub.compressed_responses >= 1
        sent = t.insert("sink", table.to_batches()[0])
        assert sent == 200
        assert stub.compressed_requests >= 1
        assert t.query_arrow(
            "SELECT count(*) AS n FROM sink"
        ).column("n").to_pylist() == [200]


def test_http_transport_unknown_codec_refused():
    import pytest as _pytest

    from clickhouse_arrow_spark.sources.http_transport import HttpArrowTransport

    with _pytest.raises(ValueError, match="gzip|lz4|zstd"):
        HttpArrowTransport("http://localhost:1", compression="snappy")


# ---------------------------------------------------------------------------
# Streaming surface: cursor-based incremental read, exactly-once stream write
# ---------------------------------------------------------------------------


def _write_ids(path, lo, hi):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"id": list(range(lo, hi + 1)),
                  "v": [f"r{i}" for i in range(lo, hi + 1)]}),
        path,
    )


def test_stream_read_incremental_by_cursor(ds_spark, tmp_path):
    src = str(tmp_path / "ev.parquet")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_ids(src, 1, 10)

    def run():
        q = (
            ds_spark.readStream.format("clickhouse")
            .option("table", "ev")
            .option("path", str(tmp_path))
            .option("cursor_column", "id")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r["id"] for r in ds_spark.read.parquet(out).collect())

    assert run() == list(range(1, 11))
    # table grows; a restart from the same checkpoint reads ONLY the new
    # rows — total output has no duplicates
    _write_ids(src, 1, 15)
    assert run() == list(range(1, 16))


def test_stream_reader_partitions_follow_transport(tmp_path):
    from clickhouse_arrow_spark.sources.dsv2 import ClickHouseStreamReader

    src = str(tmp_path / "seg.parquet")
    _write_ids(src, 1, 100)
    r = ClickHouseStreamReader(
        {"table": "seg", "path": str(tmp_path), "cursor_column": "id"}
    )
    assert r.latestOffset() == {"cursor": 100}
    parts = r.partitions({"cursor": 0}, {"cursor": 100})
    assert len(parts) >= 1
    got = sorted(
        row[0] for p in parts for b in r.read(p) for row in b.to_pylist() or []
    ) if False else sorted(
        v for p in parts for b in r.read(p) for v in b.column("id").to_pylist()
    )
    assert got == list(range(1, 101))
    assert r.partitions({"cursor": 100}, {"cursor": 100}) == []


def test_stream_write_publishes_manifest(ds_spark, tmp_path):
    import json
    import os

    src = str(tmp_path / "in.parquet")
    ckpt = str(tmp_path / "wckpt")
    _write_ids(src, 1, 8)
    q = (
        ds_spark.readStream.format("clickhouse")
        .option("table", "in")
        .option("path", str(tmp_path))
        .option("cursor_column", "id")
        .load()
        .writeStream.format("clickhouse")
        .option("table", "t_sink")
        .option("path", str(tmp_path))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out_dir = str(tmp_path / "t_sink.insert")
    manifest = [json.loads(l) for l in open(os.path.join(out_dir, "_MANIFEST.jsonl"))]
    assert manifest and manifest[0]["txn"].startswith("stream-")
    back = ds_spark.read.parquet(out_dir)
    assert back.count() == 8


def test_stream_writer_replayed_batch_not_duplicated(tmp_path):
    import json
    import os

    import pyarrow as pa

    from clickhouse_arrow_spark.sources.dsv2 import ClickHouseStreamWriter

    w = ClickHouseStreamWriter({"table": "replay", "path": str(tmp_path)})
    batch = pa.record_batch({"id": [1, 2, 3]})
    m1 = w.write(iter([batch]))
    w.commit([m1], batchId=7)
    # failure-after-publish replay: same batchId staged again
    m2 = w.write(iter([batch]))
    w.commit([m2], batchId=7)
    out_dir = os.path.join(str(tmp_path), "replay.insert")
    manifest = [json.loads(l) for l in open(os.path.join(out_dir, "_MANIFEST.jsonl"))]
    assert [m["txn"] for m in manifest] == ["stream-7"]
    parts = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert len(parts) == 1  # replayed part discarded, not published


def test_http_stream_read_full_table(ds_spark, http_stub):
    stub, url = http_stub
    ckpt = "/tmp/cas-http-stream-ckpt"
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        ds_spark.readStream.format("clickhouse")
        .option("table", "nation")
        .option("url", url)
        .option("cursor_column", "n_nationkey")
        .load()
        .writeStream.format("memory")
        .queryName("http_stream_nation")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = ds_spark.table("http_stream_nation").count()
    want = ds_spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    assert got == want


# ---------------------------------------------------------------------------
# Round 5: incremental (streamed) scan decode + type-aware range splits
# ---------------------------------------------------------------------------


def test_http_scan_streams_batches_incrementally(http_stub):
    """Batches must be yielded BEFORE the response stream closes.

    The stub 'drips' the response: it writes the first record batch,
    flushes, then blocks until the test releases a gate — which the
    test only does AFTER receiving the first batch. A client that
    buffers the whole body (the pre-round-5 behavior) deadlocks on the
    gate and `drip_released` stays False.
    """
    import threading

    from clickhouse_arrow_spark.sources.http_transport import HttpArrowTransport

    stub, url = http_stub
    gate = threading.Event()
    stub.batch_rows = 5
    stub.drip_gate = gate
    stub.drip_released = None
    try:
        t = HttpArrowTransport(url)
        it = t.iter_batches("SELECT n_nationkey FROM nation ORDER BY n_nationkey")
        first = next(it)  # must decode off the partial body
        assert first.num_rows == 5
        gate.set()  # only now may the server send the remainder
        rest = list(it)
        assert stub.drip_released is True
        total = first.num_rows + sum(b.num_rows for b in rest)
        assert total == 25
    finally:
        stub.batch_rows = None
        stub.drip_gate = None


def test_http_scan_streams_under_gzip(http_stub):
    """Compressed responses decode through a streaming GzipFile, same
    row totals — the encoding must not re-introduce buffering errors."""
    from clickhouse_arrow_spark.sources.http_transport import HttpArrowTransport

    stub, url = http_stub
    stub.batch_rows = 4
    try:
        t = HttpArrowTransport(url, compression="gzip")
        rows = sum(
            b.num_rows for b in t.iter_batches("SELECT * FROM nation")
        )
        assert rows == 25
    finally:
        stub.batch_rows = None


def test_plan_range_bounds_types():
    import datetime as dt

    from clickhouse_arrow_spark.sources.http_transport import _plan_range_bounds

    # ints: contiguous cover, first=lo, last=hi+1
    b = _plan_range_bounds(0, 99, 4)
    assert b[0] == 0 and b[-1] == 100 and len(b) == 5

    # dates: epoch-day arithmetic
    b = _plan_range_bounds(dt.date(2024, 1, 1), dt.date(2024, 12, 31), 4)
    assert b[0] == dt.date(2024, 1, 1)
    assert b[-1] == dt.date(2025, 1, 1)
    assert all(isinstance(x, dt.date) for x in b)

    # datetimes: epoch-second arithmetic
    lo = dt.datetime(2024, 1, 1, 0, 0, 0)
    hi = dt.datetime(2024, 1, 1, 23, 59, 59)
    b = _plan_range_bounds(lo, hi, 3)
    assert b[0] == lo and b[-1] > hi and len(b) == 4

    # strings: not splittable
    assert _plan_range_bounds("a", "z", 4) is None


def test_http_range_partition_over_timestamp_column(ds_spark, http_stub):
    """Date/DateTime partition columns are the commonest ClickHouse
    partition keys; range splitting must stay row-complete over them."""
    stub, url = http_stub
    before = len(stub.queries)
    df = _http_load(
        ds_spark, url, "orders",
        partition_column="o_orderdate", num_partitions="3",
    )
    got = df.count()
    want = ds_spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert got == want
    ranged = [
        q for q in stub.queries[before:]
        if q.startswith('SELECT * FROM "orders"') and '"o_orderdate"' in q
    ]
    assert len(ranged) == 3


def test_http_range_partition_unsplittable_falls_back(ds_spark, http_stub):
    """A string partition column can't be range-split: read everything
    in one partition (with a warning) instead of raising at plan time."""
    import warnings

    from clickhouse_arrow_spark.sources.http_transport import HttpArrowTransport

    stub, url = http_stub
    t = HttpArrowTransport(url, partition_column="o_orderstatus", num_partitions=4)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        parts = t.plan_partitions("orders")
    assert len(parts) == 1 and parts[0].where == ""
    assert any("non-range-splittable" in str(x.message) for x in w)


def test_http_insert_streams_chunked():
    """Uncompressed inserts go up with chunked transfer encoding — the
    writer task streams IPC segments instead of buffering the whole
    partition body (the write-side mirror of the incremental scan)."""
    import pyarrow as pa

    from clickhouse_arrow_spark.sources.http_transport import HttpArrowTransport
    from tests.http_stub import ArrowHttpStub

    table = pa.table({"k": list(range(300)), "v": [i * 1.5 for i in range(300)]})
    stub = ArrowHttpStub({"sink": table.slice(0, 0)})
    with stub as url:
        t = HttpArrowTransport(url)
        sent = t.insert_batches("sink", table.to_batches(max_chunksize=50))
        assert sent == 300
        assert stub.chunked_requests >= 1
        got = t.query_arrow("SELECT count(*) AS n, sum(v) AS s FROM sink")
        assert got.column("n").to_pylist() == [300]
        assert abs(got.column("s").to_pylist()[0] - sum(i * 1.5 for i in range(300))) < 1e-6


@pytest.mark.parametrize("codec", ["lz4", "zstd", "gzip"])
def test_http_compressed_insert_streams_chunked(codec):
    """Compressed inserts ALSO stream: each IPC segment passes through
    a streaming compressor and goes up as its own transfer chunk with
    Content-Encoding set — the stub counts the chunks on the wire, so
    a buffering writer (one big chunk) fails this. Write-side mirror
    of the reference's per-block compression (src/compression.rs)."""
    import pyarrow as pa

    from clickhouse_arrow_spark.sources.http_transport import HttpArrowTransport
    from tests.http_stub import ArrowHttpStub

    table = pa.table(
        {"k": list(range(3000)), "v": [f"payload-{i}" * 8 for i in range(3000)]}
    )
    stub = ArrowHttpStub({"sink": table.slice(0, 0)})
    with stub as url:
        t = HttpArrowTransport(url, compression=codec)
        sent = t.insert_batches("sink", table.to_batches(max_chunksize=500))
        assert sent == 3000
        # chunked + compressed simultaneously
        assert stub.chunked_requests >= 1
        assert stub.compressed_requests >= 1
        # streaming evidence: 6 IPC segments -> >=4 wire chunks (codec
        # may coalesce a flush); a whole-body buffer would be 1 chunk
        assert stub.chunk_counts[-1] >= 4, stub.chunk_counts
        got = t.query_arrow("SELECT count(*) AS n FROM sink")
        assert got.column("n").to_pylist() == [3000]
