"""Type-bridge unit tests.

Modeled on the reference's type-parser test inventory
(clickhouse-arrow/src/native/types/tests.rs, 1098 LoC) — same coverage
goals: every scalar, every container nesting, Nullable/LowCardinality
pushdown, Enum value lists, DateTime64 precision/tz — asserted against
the Spark mappings in SURVEY.md §1.3.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from clickhouse_arrow_spark.errors import TypeParseError
from clickhouse_arrow_spark.types import (
    TypeOptions,
    ch_type_to_spark,
    ch_type_to_spark_field,
    parse_ch_type,
    spark_type_to_ch,
)


@pytest.mark.parametrize(
    "ch,expected,nullable",
    [
        ("Int8", T.ByteType(), False),
        ("Int16", T.ShortType(), False),
        ("Int32", T.IntegerType(), False),
        ("Int64", T.LongType(), False),
        ("UInt8", T.ShortType(), False),
        ("UInt16", T.IntegerType(), False),
        ("UInt32", T.LongType(), False),
        ("UInt64", T.DecimalType(20, 0), False),
        ("Int128", T.BinaryType(), False),
        ("UInt256", T.BinaryType(), False),
        ("Float32", T.FloatType(), False),
        ("Float64", T.DoubleType(), False),
        ("BFloat16", T.FloatType(), False),
        ("Bool", T.BooleanType(), False),
        ("String", T.StringType(), False),
        ("FixedString(16)", T.StringType(), False),
        ("UUID", T.StringType(), False),
        ("IPv4", T.StringType(), False),
        ("IPv6", T.StringType(), False),
        ("Date", T.DateType(), False),
        ("Date32", T.DateType(), False),
        ("DateTime", T.TimestampType(), False),
        ("DateTime('UTC')", T.TimestampType(), False),
        ("DateTime64(3, 'America/New_York')", T.TimestampType(), False),
        ("DateTime64(9)", T.TimestampType(), False),
        ("Time", T.LongType(), False),
        ("Time64(6)", T.LongType(), False),
        ("Decimal32(2)", T.DecimalType(9, 2), False),
        ("Decimal64(4)", T.DecimalType(18, 4), False),
        ("Decimal128(10)", T.DecimalType(38, 10), False),
        ("Decimal256(10)", T.DecimalType(38, 10), False),  # capped at 38
        ("Decimal(12, 3)", T.DecimalType(12, 3), False),
        ("Enum8('a' = 1, 'b' = 2)", T.StringType(), False),
        ("Enum16('x' = -1, 'y' = 300)", T.StringType(), False),
        ("Nullable(Int32)", T.IntegerType(), True),
        ("LowCardinality(String)", T.StringType(), False),
        ("LowCardinality(Nullable(String))", T.StringType(), True),
        ("JSON", T.StringType(), False),
        ("Dynamic", T.StringType(), False),
        ("AggregateFunction(uniq, UInt64)", T.BinaryType(), False),
        ("SimpleAggregateFunction(sum, Int64)", T.LongType(), False),
    ],
)
def test_scalar_mappings(ch, expected, nullable):
    dt, got_null = ch_type_to_spark(ch)
    assert dt == expected
    assert got_null == nullable


def test_array_nesting():
    dt, _ = ch_type_to_spark("Array(Nullable(Int32))")
    assert dt == T.ArrayType(T.IntegerType(), containsNull=True)
    dt, _ = ch_type_to_spark("Array(Array(String))")
    assert dt == T.ArrayType(T.ArrayType(T.StringType(), False), False)
    dt, _ = ch_type_to_spark("Array(LowCardinality(String))")
    assert dt == T.ArrayType(T.StringType(), False)


def test_map():
    dt, _ = ch_type_to_spark("Map(String, Array(Int32))")
    assert dt == T.MapType(
        T.StringType(), T.ArrayType(T.IntegerType(), False), valueContainsNull=False
    )


def test_tuple_positional_and_named():
    dt, _ = ch_type_to_spark("Tuple(Int32, String)")
    assert dt == T.StructType(
        [
            T.StructField("field_0", T.IntegerType(), False),
            T.StructField("field_1", T.StringType(), False),
        ]
    )
    dt, _ = ch_type_to_spark("Tuple(name String, age Nullable(Int32))")
    assert [f.name for f in dt.fields] == ["name", "age"]
    assert dt.fields[1].nullable is True


def test_nested_parallel_arrays():
    dt, _ = ch_type_to_spark("Nested(a Int32, b String)")
    assert dt == T.StructType(
        [
            T.StructField("a", T.ArrayType(T.IntegerType(), False), False),
            T.StructField("b", T.ArrayType(T.StringType(), False), False),
        ]
    )


def test_variant_tagged_struct():
    dt, _ = ch_type_to_spark("Variant(String, UInt64, Array(String))")
    assert dt.fields[0] == T.StructField("tag", T.ByteType(), False)
    assert len(dt.fields) == 4


def test_deep_nesting_roundtrip_string():
    s = "Map(LowCardinality(String), Array(Nullable(Decimal(10, 2))))"
    assert str(parse_ch_type(s)) == s


def test_enum_metadata_preserved():
    f = ch_type_to_spark_field("e", "Enum8('a' = 1, 'b' = 2)")
    assert f.metadata["enum_values"] == {"a": 1, "b": 2}
    assert f.metadata["ch_type"] == "Enum8('a' = 1, 'b' = 2)"


def test_enum_quoted_edge_values():
    # enum names may contain escaped quotes and commas
    t = parse_ch_type("Enum8('it''s' = 1, 'a,b' = 2)".replace("''", "\\'"))
    assert dict(t.args) == {"it's": 1, "a,b": 2}


def test_geo_types():
    pt, _ = ch_type_to_spark("Point")
    assert isinstance(pt, T.StructType)
    poly, _ = ch_type_to_spark("Polygon")
    assert isinstance(poly, T.ArrayType)
    assert isinstance(poly.elementType, T.ArrayType)


def test_parse_errors():
    with pytest.raises(TypeParseError):
        parse_ch_type("NotAType")
    with pytest.raises(TypeParseError):
        parse_ch_type("Array(Int32")
    with pytest.raises(TypeParseError):
        parse_ch_type("")
    with pytest.raises(TypeParseError):
        parse_ch_type("Map(String)")


# -- Spark -> ClickHouse ----------------------------------------------------


@pytest.mark.parametrize(
    "dt,nullable,expected",
    [
        (T.ByteType(), False, "Int8"),
        (T.ShortType(), False, "Int16"),
        (T.IntegerType(), True, "Nullable(Int32)"),
        (T.LongType(), False, "Int64"),
        (T.FloatType(), False, "Float32"),
        (T.DoubleType(), False, "Float64"),
        (T.DecimalType(20, 0), False, "UInt64"),  # unsigned widening round-trip
        (T.DecimalType(12, 3), False, "Decimal(12, 3)"),
        (T.StringType(), False, "String"),
        (T.BinaryType(), False, "String"),
        (T.BooleanType(), False, "Bool"),
        (T.DateType(), False, "Date"),
        (T.TimestampType(), False, "DateTime64(6)"),
        (T.ArrayType(T.IntegerType(), True), False, "Array(Nullable(Int32))"),
        # nullability pushes inside containers (CH forbids Nullable(Array))
        (T.ArrayType(T.IntegerType(), False), True, "Array(Int32)"),
        (
            T.MapType(T.StringType(), T.DoubleType(), True),
            False,
            "Map(String, Nullable(Float64))",
        ),
        (
            T.StructType([T.StructField("a", T.IntegerType(), False)]),
            False,
            "Tuple(a Int32)",
        ),
    ],
)
def test_spark_to_ch(dt, nullable, expected):
    assert spark_type_to_ch(dt, nullable) == expected


def test_date32_option():
    assert (
        spark_type_to_ch(T.DateType(), False, TypeOptions(use_date32_for_date=True))
        == "Date32"
    )


def test_low_cardinality_emission():
    assert spark_type_to_ch(T.StringType(), False, low_cardinality=True) == (
        "LowCardinality(String)"
    )
    assert spark_type_to_ch(T.StringType(), True, low_cardinality=True) == (
        "LowCardinality(Nullable(String))"
    )


@pytest.mark.parametrize(
    "ch",
    [
        "Int64",
        "Nullable(String)",
        "Array(Nullable(Int32))",
        "Map(String, Float64)",
        "Tuple(a Int32, b String)",
        "Decimal(18, 4)",
    ],
)
def test_bidirectional_roundtrip(ch):
    """CH -> Spark -> CH is stable for representable types."""
    dt, nullable = ch_type_to_spark(ch)
    assert spark_type_to_ch(dt, nullable) == ch
