"""Round-trip fidelity tests — the reference's core correctness oracle
(SURVEY §5: canonical all-types batch round-trip,
clickhouse-arrow/tests/common/arrow_helpers.rs:235-445; compression
matrix tests/tests/arrow.rs:21-127).

Here: build the canonical table by parsing ClickHouse type strings
through the bridge, write/read parquet under each codec, assert schema
and values survive.
"""

from __future__ import annotations

import datetime
import decimal

import pytest
from pyspark.sql import types as T

from clickhouse_arrow_spark.types import ch_type_to_spark_field

# FIXTURES.md §1 canonical column set, as (name, CH type) pairs — the
# shape the reference's create_table consumes.
ALL_TYPES_CH = [
    ("id", "Int32"),
    ("int8_col", "Nullable(Int8)"),
    ("int16_col", "Nullable(Int16)"),
    ("int32_col", "Nullable(Int32)"),
    ("int64_col", "Nullable(Int64)"),
    ("uint8_col", "Nullable(UInt8)"),
    ("uint16_col", "Nullable(UInt16)"),
    ("uint32_col", "Nullable(UInt32)"),
    ("uint64_col", "Nullable(UInt64)"),
    ("int128_col", "Nullable(Int128)"),
    ("uint256_col", "Nullable(UInt256)"),
    ("float32_col", "Nullable(Float32)"),
    ("float64_col", "Nullable(Float64)"),
    ("string_col", "Nullable(String)"),
    ("fixed_string_col", "Nullable(FixedString(16))"),
    ("decimal32_col", "Nullable(Decimal32(2))"),
    ("decimal64_col", "Nullable(Decimal64(4))"),
    ("date_col", "Nullable(Date)"),
    ("datetime_col", "Nullable(DateTime)"),
    ("datetime64_col", "Nullable(DateTime64(6, 'UTC'))"),
    ("map_col", "Map(String, Int32)"),
    ("tuple_col", "Tuple(Int32, String)"),
    ("ipv4_col", "Nullable(IPv4)"),
    ("uuid_col", "Nullable(UUID)"),
    ("enum8_col", "Nullable(Enum8('red' = 1, 'green' = 2, 'blue' = 3))"),
    ("low_cardinality_string_col", "LowCardinality(String)"),
    ("low_cardinality_nullable_string_col", "LowCardinality(Nullable(String))"),
    ("array_int32_col", "Array(Int32)"),
    ("array_nullable_int32_col", "Array(Nullable(Int32))"),
    ("array_low_cardinality_string_col", "Array(LowCardinality(String))"),
    ("array_tuple_col", "Array(Tuple(Int32, String))"),
]

U64_MAX = decimal.Decimal(18446744073709551615)


def canonical_rows():
    """5 rows per the reference: zeros, NULLs, min, max, typical."""
    def row(
        id_, i8, i16, i32, i64, u8, u16, u32, u64, i128, u256, f32, f64, s,
        fs, d32, d64, dt, ts, ts64, m, tup, ip, uid, en, lc, lcn, arr, arrn,
        arrlc, arrt,
    ):
        return (
            id_, i8, i16, i32, i64, u8, u16, u32, u64, i128, u256, f32, f64,
            s, fs, d32, d64, dt, ts, ts64, m, tup, ip, uid, en, lc, lcn, arr,
            arrn, arrlc, arrt,
        )

    zero = row(
        0, 0, 0, 0, 0, 0, 0, 0, decimal.Decimal(0), b"\x00" * 16, b"\x00" * 32,
        0.0, 0.0, "", "", decimal.Decimal("0.00"), decimal.Decimal("0.0000"),
        datetime.date(1970, 1, 1), datetime.datetime(1970, 1, 1),
        datetime.datetime(1970, 1, 1), {}, (0, ""), "0.0.0.0",
        "00000000-0000-0000-0000-000000000000", "red", "", None, [], [], [], [],
    )
    nulls = row(
        1, None, None, None, None, None, None, None, None, None, None, None,
        None, None, None, None, None, None, None, None, {}, (0, ""), None,
        None, None, "x", None, [], [None], [], [],
    )
    mins = row(
        2, -128, -32768, -2147483648, -9223372036854775808, 0, 0, 0,
        decimal.Decimal(0), b"\x80" + b"\x00" * 15, b"\x00" * 32,
        -3.4e38, -1.7e308, "min", "min_fixed", decimal.Decimal("-9999999.99"),
        decimal.Decimal("-99999999999999.9999"), datetime.date(1970, 1, 1),
        datetime.datetime(1970, 1, 1, 0, 0, 1),
        datetime.datetime(1970, 1, 1, 0, 0, 0, 1),
        {"min": -2147483648}, (-2147483648, "min"), "0.0.0.1",
        "00000000-0000-0000-0000-000000000001", "green", "lc_min", "lcn",
        [-2147483648], [None, -1], ["a"], [(1, "x")],
    )
    maxs = row(
        3, 127, 32767, 2147483647, 9223372036854775807, 255, 65535,
        4294967295, U64_MAX, b"\x7f" + b"\xff" * 15, b"\xff" * 32,
        3.4e38, 1.7e308, "max" * 100, "max_fixed_16byte",
        decimal.Decimal("9999999.99"), decimal.Decimal("99999999999999.9999"),
        datetime.date(2149, 6, 6), datetime.datetime(2106, 2, 7, 6, 28, 15),
        datetime.datetime(2200, 1, 1, 23, 59, 59, 999999),
        {"max": 2147483647, "b": 2}, (2147483647, "max"), "255.255.255.255",
        "ffffffff-ffff-ffff-ffff-ffffffffffff", "blue", "lc_max", None,
        [1, 2, 3], [1, None, 3], ["a", "b", "a"], [(1, "x"), (2, "y")],
    )
    typical = row(
        4, 42, 1234, 987654, 123456789012, 200, 50000, 3000000000,
        decimal.Decimal(9999999999999999999), b"\x01" * 16, b"\x02" * 32,
        1.5, 2.25, "it's a test", "fixed", decimal.Decimal("12345.67"),
        decimal.Decimal("1234567890.1234"), datetime.date(1997, 3, 5),
        datetime.datetime(1997, 3, 5, 12, 30),
        datetime.datetime(1997, 3, 5, 12, 30, 0, 123456),
        {"k1": 1, "k2": 2}, (7, "seven"), "192.168.1.1",
        "550e8400-e29b-41d4-a716-446655440000", "red", "lc_typ", "lcn_typ",
        [1], [None], ["z"], [(9, "nine")],
    )
    return [zero, nulls, mins, maxs, typical]


@pytest.fixture(scope="module")
def all_types_df(spark):
    fields = [ch_type_to_spark_field(n, t) for n, t in ALL_TYPES_CH]
    schema = T.StructType(fields)
    return spark.createDataFrame(canonical_rows(), schema=schema), schema


def test_all_types_schema_mapping(all_types_df):
    _, schema = all_types_df
    by_name = {f.name: f for f in schema.fields}
    assert by_name["uint64_col"].dataType == T.DecimalType(20, 0)
    assert by_name["int128_col"].dataType == T.BinaryType()
    assert by_name["enum8_col"].metadata["enum_values"] == {
        "red": 1, "green": 2, "blue": 3,
    }
    assert by_name["low_cardinality_string_col"].dataType == T.StringType()
    assert by_name["low_cardinality_nullable_string_col"].nullable is True
    assert by_name["tuple_col"].dataType.fieldNames() == ["field_0", "field_1"]


@pytest.mark.parametrize("codec", ["uncompressed", "lz4", "zstd"])
def test_all_types_parquet_roundtrip(spark, all_types_df, tmp_path_factory, codec):
    """Write/read the canonical batch under each codec (the reference's
    compression matrix: None/LZ4/ZSTD, arrow.rs:21-127)."""
    df, schema = all_types_df
    path = str(tmp_path_factory.mktemp(f"rt_{codec}"))
    df.write.mode("overwrite").option("compression", codec).parquet(path)
    back = spark.read.schema(schema).parquet(path)
    assert back.count() == 5

    src = {r["id"]: r for r in df.collect()}
    got = {r["id"]: r for r in back.collect()}
    assert sorted(got) == [0, 1, 2, 3, 4]
    for rid in got:
        for fname in back.schema.fieldNames():
            assert got[rid][fname] == src[rid][fname], (
                f"codec={codec} row={rid} col={fname}: "
                f"{got[rid][fname]!r} != {src[rid][fname]!r}"
            )


def test_uint64_max_survives(spark, all_types_df):
    """UInt64 max (18446744073709551615) must round-trip exactly
    (SURVEY §7 hard part 1)."""
    df, _ = all_types_df
    r = df.where("id = 3").first()
    assert r["uint64_col"] == U64_MAX


@pytest.mark.parametrize("codec", ["uncompressed", "lz4", "zstd"])
@pytest.mark.parametrize("n_rows", [5, 65_500])
def test_large_roundtrip_matrix(spark, tmp_path_factory, codec, n_rows):
    """FIXTURES §4: 65,500 rows exceeds one native-protocol compression
    chunk in the reference; here it exercises multi-page parquet with
    dictionary-friendly strings."""
    from pyspark.sql import functions as F

    df = (
        spark.range(n_rows)
        .select(
            F.col("id").cast("int").alias("id"),
            F.timestamp_micros(F.col("id") * 1000).alias("datetime_col"),
            F.concat(F.lit("string_"), (F.col("id") % 100).cast("string")).alias(
                "string_col"
            ),
        )
    )
    path = str(tmp_path_factory.mktemp(f"large_{codec}_{n_rows}"))
    df.write.mode("overwrite").option("compression", codec).parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == n_rows
    agg = back.agg(
        F.sum("id").alias("s"), F.countDistinct("string_col").alias("d")
    ).first()
    assert agg["s"] == n_rows * (n_rows - 1) // 2
    assert agg["d"] == min(n_rows, 100)
