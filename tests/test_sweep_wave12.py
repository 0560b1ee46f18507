"""Probe-sweep wave 12 (round 6): combinator CHAINS (If x State/Merge/
Distinct/parametric), GROUP BY (), array-literal IN sets, and the DDL
statement forms a migration script contains (clone-structure CREATE
TABLE AS table, TRUNCATE IF EXISTS, RENAME COLUMN IF EXISTS, OPTIMIZE
FINAL on a non-folding engine). Reference surface: ClickHouse SQL the
`clickhouse-arrow` client passes through verbatim.
"""

from __future__ import annotations

import pytest

from clickhouse_arrow_spark.client import Client
from clickhouse_arrow_spark.dialect import (
    UntranslatableFunctionError,
    translate_ch_sql,
)


@pytest.fixture(scope="module")
def ch(spark):
    from clickhouse_arrow_spark.sources import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    return Client(spark)


def one(ch, sql):
    return ch.query_ch(sql).collect()[0]


def test_if_state_chain(ch):
    # the transparent -State algebra composed with -If: state IS the
    # partial value, the If condition folds into a CASE
    r = one(ch, "SELECT sumIfState(number, number > 2) AS s, "
                "countIfState(number > 2) AS c, "
                "avgIfState(number, number > 2).sum AS asum "
                "FROM numbers(5)")
    assert (r["s"], r["c"], r["asum"]) == (7, 2, 7.0)


def test_if_merge_chain(ch):
    r = one(ch, "SELECT toInt64(sumIfMerge(s, grp = 0)) AS m FROM "
                "(SELECT number % 2 AS grp, sumState(number) AS s "
                "FROM numbers(10) GROUP BY number % 2)")
    # merges only the grp=0 state: 0+2+4+6+8 = 20
    assert r["m"] == 20


def test_suffixes_either_order(ch):
    r = one(ch, "SELECT countIfDistinct(number % 3, number > 0) AS a, "
                "countDistinctIf(number % 3, number > 0) AS b "
                "FROM numbers(10)")
    assert r["a"] == r["b"] == 3


def test_parametric_if(ch):
    r = one(ch, "SELECT quantileIf(0.5)(number, number > 1) AS q, "
                "quantilesIf(0.25, 0.75)(number, number > 1) AS qs "
                "FROM numbers(10)")
    assert r["q"] == 5.5
    assert r["qs"] == [3.75, 7.25]


def test_group_array_parametric(ch):
    r = one(ch, "SELECT arraySort(groupArray(3)(number)) AS g, "
                "arraySort(groupArrayIf(3)(number, number % 2 = 0)) AS gi "
                "FROM numbers(10)")
    assert len(r["g"]) == 3
    assert r["gi"] == [0, 2, 4]


def test_refused_base_if_chain_names_base():
    with pytest.raises(UntranslatableFunctionError, match="topk_frequent"):
        translate_ch_sql("SELECT topKIf(2)(x, c) FROM t")


def test_group_by_empty(ch):
    n = one(ch, "SELECT count(*) AS n FROM orders GROUP BY ()")["n"]
    assert n == one(ch, "SELECT count(*) AS n FROM orders")["n"]


def test_in_array_literal(ch):
    a = one(ch, "SELECT count(*) AS n FROM orders "
                "WHERE o_orderstatus IN ['O', 'F']")["n"]
    b = one(ch, "SELECT count(*) AS n FROM orders "
                "WHERE o_orderstatus IN ('O', 'F')")["n"]
    assert a == b > 0
    assert one(ch, "SELECT 1 NOT IN [2, 3] AS x")["x"] is True


def test_named_window_clause(ch):
    rows = ch.query_ch(
        "SELECT number, sum(number) OVER w AS s FROM numbers(5) "
        "WINDOW w AS (ORDER BY number)"
    ).collect()
    assert [r.s for r in sorted(rows, key=lambda r: r.number)] == [
        0, 1, 3, 6, 10
    ]


def test_ddl_statement_forms(ch, spark):
    ch.execute_ch("CREATE DATABASE IF NOT EXISTS w12")
    try:
        ch.execute_ch(
            "CREATE TABLE w12.src (id UInt64, name String) "
            "ENGINE = MergeTree ORDER BY id"
        )
        ch.execute_ch("INSERT INTO w12.src VALUES (1, 'a'), (2, 'b')")
        # clone-structure form: schema + CH engine metadata, NO data
        ch.execute_ch("CREATE TABLE w12.dst AS w12.src")
        assert spark.table("w12.dst").columns == ["id", "name"]
        assert spark.table("w12.dst").count() == 0
        props = {
            r["key"]: r["value"]
            for r in spark.sql("SHOW TBLPROPERTIES w12.dst").collect()
        }
        assert props.get("clickhouse_arrow_spark.engine") == "MergeTree"
        # TRUNCATE IF EXISTS: missing table is a no-op, present truncates
        ch.execute_ch("TRUNCATE TABLE IF EXISTS w12.nope")
        ch.execute_ch("TRUNCATE TABLE IF EXISTS w12.src")
        assert spark.table("w12.src").count() == 0
        # RENAME COLUMN IF EXISTS: absent column no-ops, present renames
        ch.execute_ch(
            "ALTER TABLE w12.dst RENAME COLUMN IF EXISTS ghost TO g2"
        )
        ch.execute_ch(
            "ALTER TABLE w12.dst RENAME COLUMN IF EXISTS name TO label"
        )
        assert spark.table("w12.dst").columns == ["id", "label"]
        # OPTIMIZE FINAL on a plain MergeTree = compaction, not an error
        ch.execute_ch("INSERT INTO w12.dst VALUES (1, 'x'), (1, 'x')")
        n = ch.execute_ch("OPTIMIZE TABLE w12.dst FINAL")
        assert n == 2  # no dedup on a non-folding engine, like CH
    finally:
        for t in ("w12.src", "w12.dst"):
            ch.execute_ch(f"DROP TABLE IF EXISTS {t}")
        ch.execute_ch("DROP DATABASE IF EXISTS w12")
