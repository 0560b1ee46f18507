"""Python DataSource (DSv2-style) ClickHouse connector skeleton.

The north star for the reference is a "Spark JDBC/Arrow-based ClickHouse
connector"; this module is that connector's Spark side, built on the
PySpark 4 Python Data Source API with a pluggable transport:

- :class:`MockTransport` stands in for the server: it answers the same
  introspection the reference performs over `system.columns`
  (clickhouse-arrow/src/arrow/schema.rs:90-152 parses the type strings
  into an Arrow schema; here the CH type strings round-trip through the
  types.py bridge) and serves Arrow batches per scan — backed by local
  parquet so the skeleton is fully testable offline.
- :class:`~clickhouse_arrow_spark.sources.http_transport.HttpArrowTransport`
  is the REAL wire path (reference http/client.rs:22-244): pass
  `.option("url", "http://host:8123")` and scans/inserts travel as
  Arrow IPC streams over the ClickHouse HTTP interface; range
  partitioning via `.option("partition_column", ...)` +
  `.option("num_partitions", N)`.
- :class:`ClickHouseDataSource` registers as `clickhouse` and
  implements FILTER PUSHDOWN (`pushFilters`): supported predicates are
  serialized into the scan request (the reference pushes them into the
  SQL it sends), the rest stay in Spark. One input partition per
  parquet row group keeps scans executor-parallel.

Usage::

    spark.dataSource.register(ClickHouseDataSource)
    df = (spark.read.format("clickhouse")
          .option("table", "orders")
          .option("path", "/root/testdata/sf0.01")
          .load())
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

#: Planning (pushFilters) runs in a separate Python worker process, so
#: in-memory globals are invisible to the driver script. The
#: `pushdown_log` option names a JSONL file the reader appends
#: {table, pushed, ts} records to — the observability hook tests and
#: EXPLAIN-style debugging read.

_SUPPORTED = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    In,
    IsNotNull,
)


class MockTransport:
    """Parquet-backed stand-in for a ClickHouse server connection.

    Three-method contract a real transport implements identically:
    `system_columns` (introspection), `schema` (Arrow/Spark schema),
    `scan` (Arrow batches for a table + pushed predicate set).
    """

    def __init__(self, path: str):
        self.path = path

    def _file(self, table: str) -> str:
        f = os.path.join(self.path, f"{table}.parquet")
        if not os.path.exists(f):
            raise ValueError(f"unknown table {table!r} at {self.path}")
        return f

    def system_columns(self, table: str) -> list[tuple[str, str]]:
        """(name, ClickHouse type string) per column — what the
        reference reads from system.columns (arrow/schema.rs:90-152),
        produced here by rendering the Spark schema through the
        types.py bridge."""
        from clickhouse_arrow_spark.types import spark_type_to_ch

        return [
            (f.name, spark_type_to_ch(f.dataType, nullable=f.nullable))
            for f in self.schema(table).fields
        ]

    def _arrow_schema(self, table: str):
        """Parquet schema normalized for Spark interop: timestamps to
        microsecond precision (Spark's native unit; ms/ns files appear
        in the wild — the reference's DateTime64(p) spread)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pq.read_schema(self._file(table))
        fields = [
            pa.field(f.name, pa.timestamp("us", tz=f.type.tz), f.nullable)
            if pa.types.is_timestamp(f.type)
            else f
            for f in schema
        ]
        return pa.schema(fields)

    def schema(self, table: str) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(self._arrow_schema(table))

    def n_row_groups(self, table: str) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(self._file(table)).metadata.num_row_groups

    def plan_partitions(self, table: str) -> list:
        """One scan token per parquet row group (executor-parallel)."""
        return list(range(max(self.n_row_groups(table), 1)))

    def cursor_max(self, table: str, column: str):
        """Max value of an integer cursor column — ONE footer-stats read
        (row-group max aggregation), no data scan; a real server answers
        this from the primary index (`SELECT max(col)`)."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(self._file(table)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        best = None
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max:
                # fall back to scanning just this column
                import pyarrow.compute as pc

                col = pq.ParquetFile(self._file(table)).read(columns=[column])
                v = pc.max(col.column(0)).as_py()
                return v
            if best is None or stats.max > best:
                best = stats.max
        return best

    def scan(self, table: str, row_group: int, filters: list) -> Iterator:
        """Arrow batches for one row group with pushed filters applied
        server-side (pyarrow.compute here; SQL WHERE on a real
        server)."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.ParquetFile(self._file(table)).read_row_group(row_group)
        tbl = tbl.cast(self._arrow_schema(table))
        expr = None
        for f in filters:
            col = pc.field(f.attribute[-1])
            if isinstance(f, EqualTo):
                e = col == f.value
            elif isinstance(f, GreaterThan):
                e = col > f.value
            elif isinstance(f, GreaterThanOrEqual):
                e = col >= f.value
            elif isinstance(f, LessThan):
                e = col < f.value
            elif isinstance(f, LessThanOrEqual):
                e = col <= f.value
            elif isinstance(f, In):
                e = col.isin(list(f.values))
            elif isinstance(f, IsNotNull):
                e = ~col.is_null()
            else:  # pragma: no cover - pushFilters only accepts _SUPPORTED
                continue
            expr = e if expr is None else expr & e
        if expr is not None:
            import pyarrow.dataset as ds

            tbl = ds.dataset(tbl).filter(expr).to_table()
        yield from tbl.to_batches()


def _transport_from_options(options: dict):
    """Pick the wire path: `url` selects the real HTTP ArrowStream
    transport; otherwise the parquet-backed mock serves offline
    tests. Same three-method contract either way."""
    if options.get("url"):
        from clickhouse_arrow_spark.sources.http_transport import (
            HttpArrowTransport,
        )

        return HttpArrowTransport(
            options["url"],
            user=options.get("user"),
            password=options.get("password"),
            database=options.get("database"),
            partition_column=options.get("partition_column"),
            num_partitions=int(options.get("num_partitions", "1")),
        )
    return MockTransport(options.get("path", ""))


@dataclass
class _ScanPartition(InputPartition):
    #: mock: parquet row-group index; http: a RangePartition predicate
    token: object


class ClickHouseScanReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.table = options.get("table")
        if not self.table:
            raise ValueError("option 'table' is required")
        self.log_path = options.get("pushdown_log")
        self.pushed: list = []

    def pushFilters(self, filters):
        """Keep every predicate the transport can evaluate server-side;
        give the rest back to Spark (the list is an AND)."""
        for f in filters:
            if isinstance(f, _SUPPORTED):
                self.pushed.append(f)
            else:
                yield f
        if self.log_path:
            import json

            with open(self.log_path, "a") as fh:
                fh.write(
                    json.dumps(
                        {"table": self.table, "pushed": [repr(f) for f in self.pushed]}
                    )
                    + "\n"
                )

    def partitions(self):
        transport = _transport_from_options(self.options)
        return [_ScanPartition(t) for t in transport.plan_partitions(self.table)]

    def read(self, partition):
        transport = _transport_from_options(self.options)
        yield from transport.scan(self.table, partition.token, self.pushed)


@dataclass
class _InsertCommit(WriterCommitMessage):
    part_file: str
    num_rows: int


class ClickHouseInsertWriter(DataSourceArrowWriter):
    """INSERT path (reference `Client::insert`, src/client.rs:436-484):
    each task streams its Arrow batches to the transport as one insert
    block — here a staged parquet part the driver-side `commit`
    publishes atomically (manifest write), `abort` discards. A real
    transport sends the batches over the wire inside write() and
    commit() is a no-op."""

    def __init__(self, options: dict, overwrite: bool):
        self.table = options.get("table")
        if not self.table:
            raise ValueError("option 'table' is required")
        self.path = options.get("path", "")
        self.overwrite = overwrite
        import uuid

        self.txn = uuid.uuid4().hex[:12]

    def _table_dir(self) -> str:
        return os.path.join(self.path, f"{self.table}.insert")

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        staging = os.path.join(self._table_dir(), f"_staging_{self.txn}")
        os.makedirs(staging, exist_ok=True)
        part = os.path.join(staging, f"part-{uuid.uuid4().hex[:12]}.parquet")
        rows = 0
        writer = None
        try:
            for batch in iterator:
                if writer is None:
                    writer = pq.ParquetWriter(part, batch.schema)
                writer.write_table(pa.Table.from_batches([batch]))
                rows += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        if writer is None:  # empty partition: nothing staged
            return _InsertCommit(part_file="", num_rows=0)
        return _InsertCommit(part_file=part, num_rows=rows)

    def commit(self, messages):
        import json
        import shutil

        table_dir = self._table_dir()
        staging = os.path.join(table_dir, f"_staging_{self.txn}")
        if self.overwrite:
            for entry in os.listdir(table_dir):
                if not entry.startswith("_staging"):
                    os.remove(os.path.join(table_dir, entry))
        published = []
        for m in messages:
            if not m or not m.part_file:
                continue
            dest = os.path.join(table_dir, os.path.basename(m.part_file))
            shutil.move(m.part_file, dest)
            published.append(
                {"file": os.path.basename(dest), "rows": m.num_rows}
            )
        shutil.rmtree(staging, ignore_errors=True)
        manifest = os.path.join(table_dir, "_MANIFEST.jsonl")
        with open(manifest, "a") as fh:
            fh.write(json.dumps({"txn": self.txn, "parts": published}) + "\n")

    def abort(self, messages):
        import shutil

        shutil.rmtree(
            os.path.join(self._table_dir(), f"_staging_{self.txn}"),
            ignore_errors=True,
        )


class HttpInsertWriter(DataSourceArrowWriter):
    """INSERT over the HTTP wire path (reference http/client.rs:164-196
    insert_batches): each task streams its Arrow batches to the server
    as ONE IPC-stream POST; `commit` is a no-op because a ClickHouse
    HTTP insert is durable per request — atomicity is per insert block,
    not per Spark job (the reference has the same contract). Overwrite
    truncates on the driver BEFORE the distributed insert starts."""

    def __init__(self, options: dict, overwrite: bool):
        self.options = dict(options)
        self.table = options.get("table")
        if not self.table:
            raise ValueError("option 'table' is required")
        if overwrite:
            transport = _transport_from_options(self.options)
            transport.execute(f'TRUNCATE TABLE "{self.table}"')

    def write(self, iterator):
        transport = _transport_from_options(self.options)
        rows = transport.insert_batches(self.table, iterator)
        return _InsertCommit(part_file="", num_rows=rows)

    def commit(self, messages):  # rows already durable server-side
        return None

    def abort(self, messages):  # cannot unsend delivered blocks
        return None


class ClickHouseDataSource(DataSource):
    """`spark.read.format("clickhouse")` / `df.write.format("clickhouse")`
    — table scans with filter pushdown and inserts over a pluggable
    transport: `url` option -> real HTTP ArrowStream wire path,
    `path` option -> parquet-backed mock (offline tests)."""

    @classmethod
    def name(cls) -> str:
        return "clickhouse"

    def schema(self):
        return _transport_from_options(dict(self.options)).schema(
            self.options["table"]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return ClickHouseScanReader(dict(self.options))

    def writer(self, schema: StructType, overwrite: bool):
        if self.options.get("url"):
            return HttpInsertWriter(dict(self.options), overwrite)
        return ClickHouseInsertWriter(dict(self.options), overwrite)

    def streamReader(self, schema: StructType):
        return ClickHouseStreamReader(dict(self.options))

    def streamWriter(self, schema: StructType, overwrite: bool):
        if self.options.get("url"):
            return HttpStreamWriter(dict(self.options))
        return ClickHouseStreamWriter(dict(self.options))


# ---------------------------------------------------------------------------
# Streaming read/write — the connector's readStream/writeStream surface
# ---------------------------------------------------------------------------

@dataclass
class _StreamScanPartition(InputPartition):
    #: transport scan token (mock: row-group index; http: RangePartition)
    token: object
    #: half-open cursor range (lo, hi] this microbatch covers
    lo: int
    hi: int


class ClickHouseStreamReader(DataSourceStreamReader):
    """Cursor-based incremental scan: `spark.readStream.format("clickhouse")`
    tails a table through a monotonically increasing integer column
    (`cursor_column` option — an insert-time sequence, a Snowflake-style
    id, or toUnixTimestamp of an ingest clock). Offsets are
    `{"cursor": n}` = "rows with cursor ≤ n are consumed"; each
    microbatch reads the half-open range (start, end] — the standard
    JDBC/CDC incremental-source contract, restart-safe because ranges
    are derived from the checkpointed offset, not reader state.

    Scale posture: each microbatch fans out over the transport's native
    partitioning (row groups / range splits), so a catch-up batch over
    a large cursor span is executor-parallel, not a driver funnel. The
    cursor predicate is pushed to the transport (SQL WHERE on the wire
    path), so the server prunes by its primary index instead of
    shipping the table.

    Semantics note: rows must become visible in cursor order (the
    reference's insert path appends monotone blocks). A writer that
    commits cursor=10 before cursor=5 is visible would lose the
    stragglers — the same contract every max-cursor CDC poller has.
    """

    def __init__(self, options: dict):
        self.options = dict(options)
        self.table = options.get("table")
        if not self.table:
            raise ValueError("option 'table' is required")
        self.cursor = options.get("cursor_column")
        if not self.cursor:
            raise ValueError(
                "streaming read needs option 'cursor_column' (a monotonically "
                "increasing integer column to tail the table by)"
            )
        self.start = int(options.get("start_cursor", -(2**62)))

    def initialOffset(self) -> dict:
        return {"cursor": self.start}

    def latestOffset(self) -> dict:
        transport = _transport_from_options(self.options)
        hi = transport.cursor_max(self.table, self.cursor)
        return {"cursor": self.start if hi is None else int(hi)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["cursor"]), int(end["cursor"])
        if lo >= hi:
            return []
        transport = _transport_from_options(self.options)
        return [
            _StreamScanPartition(t, lo, hi)
            for t in transport.plan_partitions(self.table)
        ]

    def read(self, partition):
        transport = _transport_from_options(self.options)
        filters = [
            GreaterThan((self.cursor,), partition.lo),
            LessThanOrEqual((self.cursor,), partition.hi),
        ]
        yield from transport.scan(self.table, partition.token, filters)

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        return None

    def stop(self) -> None:
        return None


class ClickHouseStreamWriter(DataSourceStreamArrowWriter):
    """Streaming insert into the parquet-backed table dir with
    EXACTLY-ONCE batches: tasks stage parts (same layout as the batch
    `ClickHouseInsertWriter`), and the driver-side `commit(messages,
    batchId)` publishes them under a `stream-<batchId>` manifest txn —
    a REPLAYED microbatch (failure after publish, before the checkpoint
    commit) finds its batchId already in the manifest and discards the
    restaged parts instead of duplicating rows. This is the
    foreachBatch-idempotent-sink recipe promoted into the connector."""

    def __init__(self, options: dict):
        self.table = options.get("table")
        if not self.table:
            raise ValueError("option 'table' is required")
        self.path = options.get("path", "")

    def _table_dir(self) -> str:
        return os.path.join(self.path, f"{self.table}.insert")

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        staging = os.path.join(self._table_dir(), "_staging_stream")
        os.makedirs(staging, exist_ok=True)
        part = os.path.join(staging, f"part-{uuid.uuid4().hex[:12]}.parquet")
        rows = 0
        writer = None
        try:
            for batch in iterator:
                if writer is None:
                    writer = pq.ParquetWriter(part, batch.schema)
                writer.write_table(pa.Table.from_batches([batch]))
                rows += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        if writer is None:
            return _InsertCommit(part_file="", num_rows=0)
        return _InsertCommit(part_file=part, num_rows=rows)

    def _committed_batch_ids(self, manifest: str) -> set[str]:
        import json

        if not os.path.exists(manifest):
            return set()
        with open(manifest) as fh:
            return {json.loads(line).get("txn", "") for line in fh if line.strip()}

    def commit(self, messages, batchId: int) -> None:
        import json
        import shutil

        table_dir = self._table_dir()
        os.makedirs(table_dir, exist_ok=True)
        manifest = os.path.join(table_dir, "_MANIFEST.jsonl")
        txn = f"stream-{batchId}"
        staged = [m for m in messages if m and m.part_file]
        if txn in self._committed_batch_ids(manifest):
            for m in staged:  # replayed microbatch: drop, don't duplicate
                if os.path.exists(m.part_file):
                    os.remove(m.part_file)
            return
        published = []
        for m in staged:
            dest = os.path.join(table_dir, os.path.basename(m.part_file))
            shutil.move(m.part_file, dest)
            published.append({"file": os.path.basename(dest), "rows": m.num_rows})
        with open(manifest, "a") as fh:
            fh.write(json.dumps({"txn": txn, "parts": published}) + "\n")

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m and m.part_file and os.path.exists(m.part_file):
                os.remove(m.part_file)


class HttpStreamWriter(DataSourceStreamArrowWriter):
    """Streaming insert over the HTTP wire path: each task POSTs its
    batches as one IPC stream inside `write()` — durable per request
    like the reference's insert (http/client.rs:164-196), so a replayed
    microbatch re-sends its rows (AT-LEAST-ONCE). Pair with a
    ReplacingMergeTree target keyed on an event id (then FINAL folds
    replays) for effective exactly-once, the standard ClickHouse
    streaming-ingest contract."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.table = options.get("table")
        if not self.table:
            raise ValueError("option 'table' is required")

    def write(self, iterator):
        transport = _transport_from_options(self.options)
        rows = transport.insert_batches(self.table, iterator)
        return _InsertCommit(part_file="", num_rows=rows)

    def commit(self, messages, batchId: int) -> None:
        return None

    def abort(self, messages, batchId: int) -> None:
        return None
