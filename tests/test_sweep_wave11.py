"""Probe-sweep wave 11 (round 6): statement-level forms — tuple IN,
quantified ANY/ALL, LIMIT WITH TIES, COLLATE — plus parenthesized-group
subscripts and the leftover regex/bit/time families. Reference surface:
ClickHouse SQL the `clickhouse-arrow` client passes through verbatim.
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


def test_paren_group_subscript(ch):
    # `(expr)[i]` is valid CH — and what scalar-WITH inlining produces
    # for array aliases; the bracket must bind as a subscript, not a
    # fresh array literal
    r = one(ch, "WITH ['a','b'] AS arr SELECT arr[1] AS a, "
                "(['x','y'])[2] AS b")
    assert (r["a"], r["b"]) == ("a", "y")


def test_tuple_in_literals(ch):
    r = one(ch, "SELECT count(*) AS n FROM orders "
                "WHERE (o_orderkey, o_orderstatus) IN ((0,'F'),(1,'F'))")
    assert r["n"] == 2
    r2 = one(ch, "SELECT count(*) AS n FROM orders "
                 "WHERE (o_orderkey, o_orderstatus) NOT IN ((0,'F'))")
    assert r2["n"] == one(ch, "SELECT count(*) AS n FROM orders")["n"] - 1


def test_tuple_in_subquery_untouched():
    # multi-column IN subqueries are Spark-native; the rewrite must not
    # touch them
    out = translate_ch_sql(
        "SELECT 1 FROM t WHERE (a, b) IN (SELECT x, y FROM u)"
    )
    assert "named_struct" not in out


def test_any_all_quantifiers(ch):
    n_any = one(ch, "SELECT count(*) AS n FROM orders WHERE o_orderkey "
                    "= ANY (SELECT o_orderkey FROM orders "
                    "WHERE o_orderkey <= 7)")["n"]
    assert n_any == 8
    n_all = one(ch, "SELECT count(*) AS n FROM orders WHERE o_orderkey "
                    "<> ALL (SELECT o_orderkey FROM orders "
                    "WHERE o_orderkey <= 7)")["n"]
    total = one(ch, "SELECT count(*) AS n FROM orders")["n"]
    assert n_all == total - 8


def test_limit_with_ties(ch):
    rows = ch.query_ch(
        "SELECT o_orderpriority FROM orders "
        "ORDER BY o_orderpriority LIMIT 1 WITH TIES"
    ).collect()
    lo = min(r.o_orderpriority for r in rows)
    assert all(r.o_orderpriority == lo for r in rows)
    n_exact = one(ch, "SELECT count(*) AS n FROM orders WHERE "
                      "o_orderpriority = (SELECT min(o_orderpriority) "
                      "FROM orders)")["n"]
    assert len(rows) == n_exact


def test_limit_with_ties_needs_order_by():
    with pytest.raises(UntranslatableFunctionError, match="ORDER BY"):
        translate_ch_sql("SELECT x FROM t LIMIT 1 WITH TIES")


def test_collate_locale_order(ch):
    # ICU 'en' collation sorts case-insensitively-ish ('a' < 'B');
    # binary order would put all uppercase first
    rows = ch.query_ch(
        "SELECT x FROM (SELECT arrayJoin(['b', 'A', 'a', 'B']) AS x) "
        "ORDER BY x COLLATE 'en'"
    ).collect()
    assert [r.x for r in rows] == ["a", "A", "b", "B"]


def test_extract_groups(ch):
    r = one(ch, "SELECT extractGroups('k=v', '(\\\\w+)=(\\\\w+)') AS g, "
                "extractGroups('no match!', '(\\\\w+)=(\\\\w+)') AS miss")
    assert r["g"] == ["k", "v"]
    assert r["miss"] == []


def test_extract_all_groups(ch):
    r = one(ch, "SELECT extractAllGroups('k=v;k2=v2', "
                "'(\\\\w+)=(\\\\w+)') AS v, "
                "extractAllGroupsHorizontal('k=v;k2=v2', "
                "'(\\\\w+)=(\\\\w+)') AS h")
    assert r["v"] == [["k", "v"], ["k2", "v2"]]
    assert r["h"] == [["k", "k2"], ["v", "v2"]]


def test_extract_groups_column_pattern_refuses():
    with pytest.raises(UntranslatableFunctionError, match="literal"):
        translate_ch_sql("SELECT extractGroups(s, pat) FROM t")


def test_regexp_quote_meta(ch):
    r = one(ch, "SELECT regexpQuoteMeta('a.b[c]+?') AS q")
    assert r["q"] == "a\\.b\\[c\\]\\+\\?"


def test_bit_test_multi(ch):
    r = one(ch, "SELECT bitTestAll(7, 0, 1, 2) AS a, "
                "bitTestAll(5, 0, 1) AS b, "
                "bitTestAny(4, 0, 2) AS c, bitTestAny(4, 0, 1) AS d")
    assert (r["a"], r["b"], r["c"], r["d"]) == (True, False, True, False)


def test_date_diff_both_spellings(ch):
    # CH dateDiff counts unit-boundary CROSSINGS: Jan 15 -> Mar 14
    # crosses Feb 1 and Mar 1 = 2 (complete months would be 1 — that
    # is age(), not dateDiff)
    r = one(ch, "SELECT date_diff('day', toDate('2024-01-01'), "
                "toDate('2024-02-01')) AS a, "
                "dateDiff('month', toDate('2024-01-15'), "
                "toDate('2024-03-14')) AS b")
    assert (r["a"], r["b"]) == (31, 2)


def test_time_slots(ch):
    r = one(ch, "SELECT timeSlots(toDateTime('2024-01-01 00:10:00'), "
                "toUInt32(3600)) AS s, "
                "timeSlots(toDateTime('2024-01-01 00:00:00'), "
                "toUInt32(7200), 3600) AS w")
    assert [str(t) for t in r["s"]] == [
        "2024-01-01 00:00:00", "2024-01-01 00:30:00", "2024-01-01 01:00:00"
    ]
    assert len(r["w"]) == 3  # 0h, 1h, 2h with explicit hour-wide slots


def test_generate_snowflake_id(ch):
    rows = ch.query_ch(
        "SELECT generateSnowflakeID() AS id FROM numbers(100)"
    ).collect()
    ids = [r.id for r in rows]
    assert len(set(ids)) == 100  # unique within a run
    assert all(i > (1 << 40) for i in ids)  # timestamp bits populated


def test_normalize_query_keep_names(ch):
    r = one(ch, "SELECT normalizeQueryKeepNames("
                "'SELECT 12, ''lit'' FROM t WHERE x = 5') AS q")
    assert r["q"] == "SELECT ?, ? FROM t WHERE x = ?"
