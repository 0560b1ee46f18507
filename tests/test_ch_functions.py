"""Unit tests for the ClickHouse function-name shim
(clickhouse_arrow_spark/functions/ch_functions.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_arrow_spark.functions import ch_functions as ch


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def _val(one, col, alias="v"):
    return one.select(col.alias(alias)).first()[alias]


def test_to_yyyymm_and_friends(one):
    ts = F.lit("1997-03-05 12:30:00").cast("timestamp")
    assert _val(one, ch.to_yyyymm(ts)) == 199703
    assert _val(one, ch.to_yyyymmdd(ts)) == 19970305
    assert _val(one, ch.to_year(ts)) == 1997
    assert _val(one, ch.to_month(ts)) == 3
    assert _val(one, ch.to_day_of_month(ts)) == 5
    assert _val(one, ch.to_hour(ts)) == 12
    assert str(_val(one, ch.to_start_of_month(ts))) == "1997-03-01 00:00:00"
    assert str(_val(one, ch.to_start_of_hour(ts))) == "1997-03-05 12:00:00"


def test_if_and_multi_if(one):
    assert _val(one, ch.if_(F.lit(True), F.lit(1), F.lit(2))) == 1
    assert _val(one, ch.if_(F.lit(False), F.lit(1), F.lit(2))) == 2
    v = ch.multi_if(
        F.lit(False), F.lit("a"),
        F.lit(True), F.lit("b"),
        F.lit("c"),
    )
    assert _val(one, v) == "b"
    with pytest.raises(ValueError):
        ch.multi_if(F.lit(True), F.lit(1))  # missing default


def test_conditional_aggregates(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double"
    )
    row = df.agg(
        ch.count_if(F.col("v") > 15).alias("c"),
        ch.sum_if("v", F.col("v") > 15).alias("s"),
        ch.avg_if("v", F.col("v") > 15).alias("a"),
        ch.uniq_exact("k").alias("u"),
        ch.arg_max("k", "v").alias("am"),
        ch.arg_min("k", "v").alias("an"),
        ch.quantile("v", 0.5).alias("q"),
    ).first()
    assert row["c"] == 2 and row["s"] == 50.0 and row["a"] == 25.0
    assert row["u"] == 3 and row["am"] == 3 and row["an"] == 1
    assert row["q"] == 20.0


def test_string_and_array_helpers(spark):
    df = spark.createDataFrame([("a|b|c",)], "s string")
    row = df.select(
        ch.splitByChar("|", "s").alias("arr"),
        ch.length_("s").alias("n"),
        ch.empty("s").alias("e"),
        ch.not_empty("s").alias("ne"),
        ch.upper_utf8("s").alias("u"),
    ).first()
    assert row["arr"] == ["a", "b", "c"]
    assert row["n"] == 5 and not row["e"] and row["ne"]
    assert row["u"] == "A|B|C"


def test_split_by_char_escapes_regex_metachars(spark):
    # '|' and '.' are regex metachars; splitByChar must treat them literally
    df = spark.createDataFrame([("a.b.c",)], "s string")
    assert df.select(ch.splitByChar(".", "s").alias("a")).first()["a"] == [
        "a", "b", "c",
    ]


def test_port_scheme_less_hostport(spark):
    """ADVICE round 4: CH's port('host:80') returns 80 for scheme-less
    input; the formatter previously only matched scheme-prefixed URLs."""
    from clickhouse_arrow_spark.dialect import translate_ch_sql as t

    row = spark.sql(
        t(
            "SELECT port('host:80') AS p1, "
            "port('http://example.com:8123/x') AS p2, "
            "port('no-port-here') AS p3, "
            "port('no-port-here', 9000) AS p4"
        )
    ).collect()[0]
    assert (row["p1"], row["p2"], row["p3"], row["p4"]) == (80, 8123, 0, 9000)
