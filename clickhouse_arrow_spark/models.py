"""Typed row models — the Python analogue of the reference's `Row`
derive macro (clickhouse-arrow-derive/src/row.rs: struct ⇄ columns
serde for `insert_rows` / `query_rows`).

A plain `@dataclass` plays the role of the derived struct: its fields
map to a Spark StructType (through Python-type → Spark-type rules), and
the client-facing helpers convert both directions without hand-written
schemas.
"""

from __future__ import annotations

import dataclasses
import datetime
import decimal
import typing
from typing import Any, Iterable, Iterator, Type, TypeVar, get_args, get_origin

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

from clickhouse_arrow_spark.errors import SchemaError

M = TypeVar("M")

_PY_TO_SPARK: dict[type, T.DataType] = {
    bool: T.BooleanType(),
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bytes: T.BinaryType(),
    datetime.date: T.DateType(),
    datetime.datetime: T.TimestampType(),
    decimal.Decimal: T.DecimalType(38, 18),
}


def _spark_type_for(py_type: Any) -> tuple[T.DataType, bool]:
    """Python annotation -> (Spark type, nullable)."""
    origin = get_origin(py_type)
    if origin is typing.Union:  # Optional[X] etc.
        args = [a for a in get_args(py_type) if a is not type(None)]
        if len(args) == 1:
            inner, _ = _spark_type_for(args[0])
            return inner, True
        raise SchemaError(f"unsupported union annotation: {py_type!r}")
    if origin in (list, tuple):
        (item,) = get_args(py_type) if get_args(py_type) else (str,)
        it, it_null = _spark_type_for(item)
        return T.ArrayType(it, containsNull=it_null), False
    if origin is dict:
        k, v = get_args(py_type) if get_args(py_type) else (str, str)
        kt, _ = _spark_type_for(k)
        vt, v_null = _spark_type_for(v)
        return T.MapType(kt, vt, valueContainsNull=v_null), False
    if dataclasses.is_dataclass(py_type):
        return schema_for(py_type), False
    if py_type in _PY_TO_SPARK:
        return _PY_TO_SPARK[py_type], False
    raise SchemaError(f"no Spark mapping for annotation {py_type!r}")


def schema_for(model: Type) -> T.StructType:
    """Derive a StructType from a dataclass — the `Row` derive."""
    if not dataclasses.is_dataclass(model):
        raise SchemaError(f"{model!r} is not a dataclass")
    fields = []
    hints = typing.get_type_hints(model)
    for f in dataclasses.fields(model):
        dt, nullable = _spark_type_for(hints[f.name])
        fields.append(T.StructField(f.name, dt, nullable))
    return T.StructType(fields)


def to_dataframe(spark: SparkSession, rows: Iterable[M]) -> DataFrame:
    """`Vec<T: Row>` -> DataFrame (reference insert_rows input shape)."""
    rows = list(rows)
    if not rows:
        raise SchemaError("empty row list: cannot infer model")
    model = type(rows[0])
    schema = schema_for(model)
    return spark.createDataFrame(
        [dataclasses.astuple(r) for r in rows], schema=schema
    )


def from_rows(model: Type[M], rows: Iterable[Row]) -> Iterator[M]:
    """Row stream -> typed dataclasses (reference query_rows::<T>)."""
    names = [f.name for f in dataclasses.fields(model)]
    for r in rows:
        yield model(**{n: r[n] for n in names})


def query_as(
    spark_or_client: Any, model: Type[M], sql: str
) -> Iterator[M]:
    """Run SQL and stream typed models — `client.query_rows::<T>(sql)`."""
    spark = getattr(spark_or_client, "spark", spark_or_client)
    df = spark.sql(sql)
    return from_rows(model, df.toLocalIterator())


def insert_models(client: Any, table: str, rows: Iterable[M]) -> None:
    """`client.insert_rows(table, vec_of_structs)` parity."""
    df = to_dataframe(client.spark, rows)
    client.insert(table, df)
