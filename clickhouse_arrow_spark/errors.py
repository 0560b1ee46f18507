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
