"""Row-model (dataclass serde) tests — parity with the reference's
`Row` derive macro round-trip tests (clickhouse-arrow-derive)."""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from typing import Optional

import pytest
from pyspark.sql import types as T

from clickhouse_arrow_spark.errors import SchemaError
from clickhouse_arrow_spark.models import (
    from_rows,
    insert_models,
    query_as,
    schema_for,
    to_dataframe,
)


@dataclass
class Event:
    event_id: int
    name: str
    score: Optional[float]
    tags: list[str]
    ts: datetime.datetime


def test_schema_derivation():
    schema = schema_for(Event)
    assert schema["event_id"].dataType == T.LongType()
    assert schema["event_id"].nullable is False
    assert schema["score"].dataType == T.DoubleType()
    assert schema["score"].nullable is True
    assert schema["tags"].dataType == T.ArrayType(T.StringType(), False)
    assert schema["ts"].dataType == T.TimestampType()


def test_roundtrip_models(spark):
    rows = [
        Event(1, "a", 1.5, ["x"], datetime.datetime(2020, 1, 1)),
        Event(2, "b", None, [], datetime.datetime(2020, 1, 2)),
    ]
    df = to_dataframe(spark, rows)
    back = sorted(
        from_rows(Event, df.collect()), key=lambda e: e.event_id
    )
    assert back == rows


def test_query_as_typed(spark, tables):
    @dataclass
    class NationRow:
        n_nationkey: int
        n_name: str

    got = list(
        query_as(spark, NationRow, "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 3")
    )
    assert len(got) == 3
    assert isinstance(got[0], NationRow)
    assert got[0].n_nationkey == 0


def test_insert_models_roundtrip(client, spark):
    @dataclass
    class Pt:
        id: int
        v: float

    client.execute("DROP TABLE IF EXISTS default.cas_models")
    client.create_table("default", "cas_models", [("id", "Int64"), ("v", "Float64")])
    insert_models(client, "default.cas_models", [Pt(1, 1.0), Pt(2, 2.0)])
    assert client.query_one("SELECT count(*) AS n FROM default.cas_models")["n"] == 2
    client.execute("DROP TABLE default.cas_models")


def test_non_dataclass_rejected():
    with pytest.raises(SchemaError):
        schema_for(int)
