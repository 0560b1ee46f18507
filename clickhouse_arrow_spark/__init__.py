"""clickhouse_arrow_spark — a PySpark-native analytics engine with the
capabilities of the `hyperi-io/clickhouse-arrow` reference client.

The reference (see /root/reference, SURVEY.md) is a Rust ClickHouse
client/driver: a typed query/insert/DDL API over a columnar wire format,
with all relational computation delegated to the ClickHouse server. This
package re-expresses that capability Spark-first:

- :mod:`.session`   — engine session management (ClientBuilder analogue).
- :mod:`.types`     — ClickHouse <-> Spark type-system bridge
  (reference: clickhouse-arrow/src/native/types/deserialize.rs,
  clickhouse-arrow/src/arrow/types.rs).
- :mod:`.client`    — the Client facade: query / query_params /
  query_with_limits / insert / execute / create_table / introspection
  (reference: clickhouse-arrow/src/client.rs).
- :mod:`.limits`    — client-side result truncation with stats
  (reference: clickhouse-arrow/src/limits.rs).
- :mod:`.explain`   — EXPLAIN surface (reference: clickhouse-arrow/src/explain.rs).
- :mod:`.ddl`       — CreateOptions / DDL generation
  (reference: clickhouse-arrow/src/schema.rs).
- :mod:`.settings`  — ClickHouse settings name -> Spark conf shim
  (reference: clickhouse-arrow/src/settings.rs).
- :mod:`.queries`   — the relational correctness corpus (driver t2 gate).
- :mod:`.operators` — 100TB-scale LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal) — greenfield, no
  reference analogue.
- :mod:`.streaming` — Structured Streaming operators over the events table.

Everything relational runs through Catalyst — the engine declares plans
with the DataFrame/SQL API and lets Spark pick physical strategies.
"""

from clickhouse_arrow_spark.errors import (
    ClickHouseError,
    ClickHouseSparkError,
    ConfigurationError,
    ConnectionError,
    QueryError,
    SchemaError,
    SerializationError,
    ServerError,
    TypeParseError,
)
from clickhouse_arrow_spark.session import EngineSession, get_spark
from clickhouse_arrow_spark.types import ch_type_to_spark, parse_ch_type, spark_type_to_ch

__version__ = "0.1.0"


def connect(
    endpoint: str | None = None,
    *,
    username: str | None = None,
    password: str | None = None,
    database: str | None = None,
    spark=None,
):
    """Convenience constructor mirroring the reference's module-level
    `clickhouse_arrow.connect(endpoint, ...)` helper
    (py-clickhouse-arrow/python/clickhouse_arrow/__init__.py): builds a
    :class:`~clickhouse_arrow_spark.client.Client`. `endpoint` maps to
    the Spark master URL (or an http(s):// connector URL)."""
    from clickhouse_arrow_spark.builder import ClientBuilder

    b = ClientBuilder()
    if endpoint:
        if endpoint.startswith(("http://", "https://")):
            b.with_http_url(endpoint)
        else:
            b.with_destination(endpoint)
    if username:
        b.with_username(username)
    if password:
        b.with_password(password)
    if database:
        b.with_database(database)
    if spark is not None:
        b.with_session(spark)
    return b.build()

__all__ = [
    "ClickHouseError",
    "ClickHouseSparkError",
    "ConfigurationError",
    "ConnectionError",
    "SerializationError",
    "ServerError",
    "connect",
    "EngineSession",
    "QueryError",
    "SchemaError",
    "TypeParseError",
    "__version__",
    "ch_type_to_spark",
    "get_spark",
    "parse_ch_type",
    "spark_type_to_ch",
]
