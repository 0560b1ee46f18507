"""Error hierarchy.

Mirrors the shape of the reference's error surface: the Rust crate has a
single `Error` enum (clickhouse-arrow/src/errors.rs) and the Python
bindings expose a small exception hierarchy
(py-clickhouse-arrow/python/clickhouse_arrow/_internal.pyi:15-44).
"""

from __future__ import annotations


class ClickHouseSparkError(Exception):
    """Base error for the engine."""


class TypeParseError(ClickHouseSparkError):
    """A ClickHouse type string could not be parsed.

    Reference analogue: `Error::TypeParseError`
    (clickhouse-arrow/src/native/types/deserialize.rs).
    """


class SchemaError(ClickHouseSparkError):
    """Schema validation / DDL-option validation failure.

    Reference analogue: `Error::SchemaError` raised by CreateOptions
    validation (clickhouse-arrow/src/schema.rs:310-383).
    """


class QueryError(ClickHouseSparkError):
    """Query execution failure (wraps the Spark AnalysisException etc.)."""


class UnsupportedTypeError(ClickHouseSparkError):
    """A type has no faithful Spark mapping and no override was given."""


# -- reference Python-binding names (py-clickhouse-arrow/_internal.pyi) --
# The bindings expose ClickHouseError + Connection/Query/Serialization/
# Server/Configuration subclasses; migrating except-clauses keep working.

#: reference base-class name (`ClickHouseError`)
ClickHouseError = ClickHouseSparkError


class ConnectionError(ClickHouseSparkError):  # noqa: A001 — reference name
    """Connection-related failure (session unreachable, transport down).

    Reference analogue: `ConnectionError` (_internal.pyi:20-23)."""


class ConfigurationError(ClickHouseSparkError):
    """Client configuration failure (bad builder options).

    Reference analogue: `ConfigurationError` (_internal.pyi:40-43)."""


class SerializationError(ClickHouseSparkError):
    """Data (de)serialization failure on the insert/read path.

    Reference analogue: `SerializationError` (_internal.pyi:30-33)."""


class ServerError(ClickHouseSparkError):
    """Engine-side execution failure (the analogue of a ClickHouse
    server exception: a Spark job that started and then failed).

    Reference analogue: `ServerError` (_internal.pyi:35-38)."""
