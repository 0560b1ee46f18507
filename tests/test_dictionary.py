"""ClickHouse dictionary analogue: dictGet* → correlated scalar
subqueries over catalog tables, decorrelated by Catalyst into broadcast
joins (dictionary.py)."""

from __future__ import annotations

import pytest

from clickhouse_arrow_spark.dictionary import create_dictionary, rewrite_dict_calls
from clickhouse_arrow_spark.errors import SchemaError


@pytest.fixture(scope="module")
def nation_dict(spark, tables, client):
    create_dictionary(
        spark, "dicts", "nation_d", spark.table("nation"), key="n_nationkey"
    )
    yield
    spark.sql("DROP DATABASE IF EXISTS dicts CASCADE")


def test_dictget_matches_join(client, nation_dict):
    got = client.query_ch(
        "SELECT s_suppkey, dictGet('dicts.nation_d', 'n_name', s_nationkey) AS nname "
        "FROM supplier ORDER BY s_suppkey"
    ).collect()
    want = client.query(
        "SELECT s_suppkey, n_name AS nname FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey ORDER BY s_suppkey"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_dictget_missing_key_returns_type_default(client, nation_dict):
    r = client.query_ch(
        "SELECT dictGet('dicts.nation_d', 'n_name', 9999) AS s, "
        "dictGet('dicts.nation_d', 'n_regionkey', 9999) AS k"
    ).collect()[0]
    assert r["s"] == "" and r["k"] == 0  # CH type defaults, not NULL


def test_dictget_or_default_and_or_null(client, nation_dict):
    r = client.query_ch(
        "SELECT dictGetOrDefault('dicts.nation_d', 'n_name', 9999, 'none') AS d, "
        "dictGetOrNull('dicts.nation_d', 'n_name', 9999) AS n"
    ).collect()[0]
    assert r["d"] == "none" and r["n"] is None


def test_dicthas(client, nation_dict):
    r = client.query_ch(
        "SELECT dictHas('dicts.nation_d', 0) AS a, "
        "dictHas('dicts.nation_d', 12345) AS b"
    ).collect()[0]
    assert r["a"] is True and r["b"] is False


def test_typed_dictget_casts(client, nation_dict):
    r = client.query_ch(
        "SELECT dictGetString('dicts.nation_d', 'n_name', 3) AS s, "
        "dictGetInt64('dicts.nation_d', 'n_regionkey', 3) AS k"
    ).collect()[0]
    assert isinstance(r["s"], str) and isinstance(r["k"], int)


def test_dictget_composes_with_ch_functions(client, nation_dict):
    # dict rewrite runs before the textual translation: CH functions in
    # the key expression and around the call both translate
    r = client.query_ch(
        "SELECT lowerUTF8(dictGet('dicts.nation_d', 'n_name', "
        "toInt32(2))) AS s"
    ).collect()[0]
    got = client.query("SELECT lower(n_name) AS s FROM nation WHERE n_nationkey = 2")
    assert r["s"] == got.collect()[0]["s"]


def test_dictget_plans_as_broadcast_join(client, nation_dict):
    df = client.query_ch(
        "SELECT s_suppkey, dictGet('dicts.nation_d', 'n_name', s_nationkey) AS n "
        "FROM supplier"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst decorrelates the scalar subquery into a broadcast join —
    # no per-row subquery execution
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_non_dictionary_table_refused(client, spark, nation_dict):
    spark.sql("CREATE TABLE IF NOT EXISTS dicts_probe_t (x INT) USING PARQUET")
    try:
        with pytest.raises(SchemaError, match="not a dictionary"):
            rewrite_dict_calls(spark, "SELECT dictGet('dicts_probe_t', 'x', 1)")
    finally:
        spark.sql("DROP TABLE IF EXISTS dicts_probe_t")


def test_unknown_dictionary_and_attribute(client, spark, nation_dict):
    with pytest.raises(SchemaError, match="not found"):
        rewrite_dict_calls(spark, "SELECT dictGet('dicts.nope', 'x', 1)")
    with pytest.raises(SchemaError, match="attribute"):
        rewrite_dict_calls(
            spark, "SELECT dictGet('dicts.nation_d', 'bogus', 1)"
        )


def test_dict_call_in_string_literal_untouched(spark, nation_dict):
    sql = "SELECT 'dictGet(''d'', ''a'', 1)' AS s FROM nation"
    assert rewrite_dict_calls(spark, sql) == sql


def test_textual_create_dictionary(client, spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS dtx")
    spark.sql("DROP TABLE IF EXISTS dtx.src")
    spark.createDataFrame(
        [(1, "one", 1.0), (2, "two", 2.0)], "k long, name string, w double"
    ).write.saveAsTable("dtx.src")
    try:
        client.execute_ch(
            "CREATE DICTIONARY dtx.d1 (k UInt64, name String) "
            "PRIMARY KEY k "
            "SOURCE(CLICKHOUSE(TABLE 'src' DB 'dtx')) "
            "LIFETIME(MIN 0 MAX 300) LAYOUT(HASHED())"
        )
        r = client.query_ch(
            "SELECT dictGet('dtx.d1', 'name', CAST(2 AS BIGINT)) AS n"
        ).collect()
        assert [x["n"] for x in r] == ["two"]
        # undeclared column excluded from the dictionary
        assert spark.table("dtx.d1").columns == ["k", "name"]
    finally:
        for t in ("src", "d1"):
            spark.sql(f"DROP TABLE IF EXISTS dtx.{t}")


def test_join_get(client, spark, tables):
    # Join-engine table + joinGet: dictGet's decorrelation family — the
    # lookup plans as a broadcast join, misses return the type default
    # (joinGet) or NULL (joinGetOrNull)
    client.execute_ch("CREATE DATABASE IF NOT EXISTS joindb")
    try:
        client.execute_ch(
            "CREATE TABLE joindb.j (k UInt64, v String, w Float64) "
            "ENGINE = Join(ANY, LEFT, k)"
        )
        client.execute_ch(
            "INSERT INTO joindb.j VALUES (1, 'one', 1.5), (2, 'two', 2.5)"
        )
        rows = client.query_ch(
            "SELECT o_orderkey, joinGet('joindb.j', 'v', o_orderkey % 3) "
            "AS v, joinGetOrNull('joindb.j', 'w', o_orderkey % 3) AS w "
            "FROM orders ORDER BY o_orderkey LIMIT 4"
        ).collect()
        assert [(r.v, r.w) for r in rows] == [
            ("", None), ("one", 1.5), ("two", 2.5), ("", None)
        ]
        plan = (
            client.query_ch(
                "SELECT joinGet('joindb.j', 'v', o_orderkey) FROM orders"
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

        import pytest as _pytest

        from clickhouse_arrow_spark.errors import SchemaError

        with _pytest.raises(SchemaError, match="not in"):
            client.query_ch(
                "SELECT joinGet('joindb.j', 'ghost', 1)"
            )
        with _pytest.raises(SchemaError, match="key column"):
            client.query_ch(
                "SELECT joinGet('joindb.j', 'v', 1, 2)"
            )

        # ANY strictness: a duplicate-key insert is IGNORED (CH dedupes
        # Join(ANY,...) on insert), so joinGet stays unambiguous — the
        # first value wins, new keys in the same batch still land
        client.execute_ch(
            "INSERT INTO joindb.j VALUES (1, 'uno', 9.9), (3, 'three', 3.5)"
        )
        assert spark.table("joindb.j").where("k = 1").count() == 1
        dup = client.query_ch(
            "SELECT joinGet('joindb.j', 'v', 1) AS v1, "
            "joinGet('joindb.j', 'v', 3) AS v3"
        ).collect()[0]
        assert dup.v1 == "one" and dup.v3 == "three"
    finally:
        client.execute_ch("DROP TABLE IF EXISTS joindb.j")
        client.execute_ch("DROP DATABASE IF EXISTS joindb")


def test_system_dictionaries_and_exchange(spark, client):
    """Round 8: system.dictionaries lists dictionary-marked tables;
    EXCHANGE DICTIONARIES swaps two of them (the dictionary marker
    props travel with the tables)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS dict8")
    for t in ("dict8.da", "dict8.db"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for t in ("dict8.srca", "dict8.srcb"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    client.execute_ch(
        "CREATE TABLE dict8.srca (id Int64, v String) "
        "ENGINE = MergeTree ORDER BY id"
    )
    client.execute_ch("INSERT INTO dict8.srca VALUES (1, 'a'), (2, 'b')")
    client.execute_ch(
        "CREATE TABLE dict8.srcb (id Int64, v String) "
        "ENGINE = MergeTree ORDER BY id"
    )
    client.execute_ch("INSERT INTO dict8.srcb VALUES (9, 'z')")
    client.execute_ch(
        "CREATE DICTIONARY dict8.da (id UInt64, v String) "
        "PRIMARY KEY id "
        "SOURCE(CLICKHOUSE(TABLE 'srca' DB 'dict8')) "
        "LAYOUT(HASHED()) LIFETIME(0)"
    )
    client.execute_ch(
        "CREATE DICTIONARY dict8.db (id UInt64, v String) "
        "PRIMARY KEY id "
        "SOURCE(CLICKHOUSE(TABLE 'srcb' DB 'dict8')) "
        "LAYOUT(HASHED()) LIFETIME(0)"
    )
    rows = {
        r.name: (r.status, r.key, r.element_count)
        for r in client.query_ch(
            "SELECT name, status, key, element_count "
            "FROM system.dictionaries WHERE database = 'dict8'"
        ).collect()
    }
    assert rows["da"] == ("LOADED", "id", 2)
    assert rows["db"] == ("LOADED", "id", 1)
    client.execute_ch("EXCHANGE DICTIONARIES dict8.da AND dict8.db")
    assert spark.table("dict8.da").count() == 1
    assert spark.table("dict8.db").count() == 2
    # dictGet still routes through the (now swapped) marker tables
    [r] = client.query_ch(
        "SELECT dictGet('dict8.da', 'v', toUInt64(9)) AS v"
    ).collect()
    assert r.v == "z"
    for t in ("dict8.da", "dict8.db", "dict8.srca", "dict8.srcb"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_hierarchical_dictionary_functions(client, spark):
    """Round 8: hierarchical dictionaries (CH HIERARCHICAL attribute
    marker) — dictGetHierarchy / dictIsIn / dictGetChildren /
    dictGetDescendants over a session-cached closure view; fact-side
    lookups stay correlated scalar subqueries (broadcast class)."""
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS dicth8")
    spark.sql("DROP TABLE IF EXISTS dicth8.src")
    client.execute_ch(
        "CREATE TABLE dicth8.src (id UInt64, name String, "
        "parent UInt64) ENGINE = MergeTree ORDER BY id"
    )
    client.execute_ch(
        "INSERT INTO dicth8.src VALUES (1, 'a', 0), (2, 'b', 1), "
        "(3, 'c', 2), (4, 'd', 1), (5, 'e', 0)"
    )
    client.execute_ch(
        "CREATE DICTIONARY dicth8.d (id UInt64, name String, "
        "parent UInt64 HIERARCHICAL) PRIMARY KEY id "
        "SOURCE(CLICKHOUSE(TABLE 'dicth8.src')) LAYOUT(HASHED()) "
        "LIFETIME(0)"
    )

    def q(s):
        return client.query_ch(s).collect()[0].r

    assert [int(x) for x in q(
        "SELECT dictGetHierarchy('dicth8.d', toUInt64(3)) AS r"
    )] == [3, 2, 1]
    assert [int(x) for x in q(
        "SELECT dictGetHierarchy('dicth8.d', toUInt64(99)) AS r"
    )] == [99]
    assert q("SELECT dictIsIn('dicth8.d', toUInt64(3), toUInt64(1)) "
             "AS r") is True
    assert q("SELECT dictIsIn('dicth8.d', toUInt64(3), toUInt64(4)) "
             "AS r") is False
    assert q("SELECT dictIsIn('dicth8.d', toUInt64(2), toUInt64(2)) "
             "AS r") is True
    assert [int(x) for x in q(
        "SELECT dictGetChildren('dicth8.d', toUInt64(1)) AS r"
    )] == [2, 4]
    assert [int(x) for x in q(
        "SELECT dictGetDescendants('dicth8.d', toUInt64(1)) AS r"
    )] == [2, 3, 4]
    assert [int(x) for x in q(
        "SELECT dictGetDescendants('dicth8.d', toUInt64(1), 1) AS r"
    )] == [2, 4]
    assert list(q(
        "SELECT dictGetChildren('dicth8.d', toUInt64(3)) AS r")) == []
    # re-create (the reload path) rebuilds the closure
    client.execute_ch("INSERT INTO dicth8.src VALUES (6, 'f', 4)")
    client.execute_ch(
        "CREATE DICTIONARY dicth8.d (id UInt64, name String, "
        "parent UInt64 HIERARCHICAL) PRIMARY KEY id "
        "SOURCE(CLICKHOUSE(TABLE 'dicth8.src')) LAYOUT(HASHED()) "
        "LIFETIME(0)"
    )
    assert [int(x) for x in q(
        "SELECT dictGetDescendants('dicth8.d', toUInt64(1)) AS r"
    )] == [2, 3, 4, 6]
    # SYSTEM RELOAD DICTIONARY drops the cached closure too
    client.execute_ch("SYSTEM RELOAD DICTIONARY dicth8.d")
    assert [int(x) for x in q(
        "SELECT dictGetHierarchy('dicth8.d', toUInt64(6)) AS r"
    )] == [6, 4, 1]
    # fact-side per-row usage stays a correlated scalar subquery
    rows = client.query_ch(
        "SELECT x, dictIsIn('dicth8.d', x, toUInt64(1)) AS u "
        "FROM (SELECT arrayJoin([toUInt64(2), toUInt64(5)]) AS x) "
        "ORDER BY x").collect()
    assert [(int(r.x), r.u) for r in rows] == [(2, True), (5, False)]
    # a dictionary WITHOUT the marker refuses with guidance
    spark.sql("DROP TABLE IF EXISTS dicth8.flat")
    client.execute_ch(
        "CREATE DICTIONARY dicth8.flat (id UInt64, name String) "
        "PRIMARY KEY id SOURCE(CLICKHOUSE(TABLE 'dicth8.src')) "
        "LAYOUT(HASHED()) LIFETIME(0)"
    )
    with _pt.raises(SchemaError, match="HIERARCHICAL"):
        client.query_ch(
            "SELECT dictGetHierarchy('dicth8.flat', toUInt64(1)) AS r"
        ).collect()
    client.execute_ch("DROP DATABASE dicth8 SYNC")


def test_complex_key_dictionary(client, spark):
    """Round 8: COMPLEX_KEY layouts — PRIMARY KEY a, b (or (a, b));
    dictGet takes tuple(k1, k2), decomposed into per-part equalities
    in the correlated lookup; bare keys refuse with the tuple recipe;
    hierarchy functions refuse on composite keys."""
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS dictck8")
    spark.sql("DROP TABLE IF EXISTS dictck8.src")
    client.execute_ch(
        "CREATE TABLE dictck8.src (region String, code UInt64, "
        "label String) ENGINE = MergeTree ORDER BY (region, code)"
    )
    client.execute_ch(
        "INSERT INTO dictck8.src VALUES ('eu', 1, 'one'), "
        "('us', 1, 'uno')"
    )
    client.execute_ch(
        "CREATE DICTIONARY dictck8.d (region String, code UInt64, "
        "label String) PRIMARY KEY region, code "
        "SOURCE(CLICKHOUSE(TABLE 'dictck8.src')) "
        "LAYOUT(COMPLEX_KEY_HASHED()) LIFETIME(0)"
    )

    def q(s):
        return client.query_ch(s).collect()[0].r

    assert q("SELECT dictGet('dictck8.d', 'label', "
             "tuple('eu', toUInt64(1))) AS r") == "one"
    # missing composite key -> the attribute type's default
    assert q("SELECT dictGet('dictck8.d', 'label', "
             "tuple('jp', toUInt64(1))) AS r") == ""
    assert q("SELECT dictHas('dictck8.d', ('us', toUInt64(1))) "
             "AS r") is True
    assert q("SELECT dictGetOrDefault('dictck8.d', 'label', "
             "tuple('jp', toUInt64(9)), 'nope') AS r") == "nope"
    assert q("SELECT dictGetString('dictck8.d', 'label', "
             "tuple('us', toUInt64(1))) AS r") == "uno"
    with _pt.raises(SchemaError, match="tuple"):
        client.query_ch(
            "SELECT dictGet('dictck8.d', 'label', 'eu') AS r"
        ).collect()
    with _pt.raises(SchemaError, match="single"):
        client.query_ch(
            "SELECT dictGetHierarchy('dictck8.d', tuple('eu', "
            "toUInt64(1))) AS r"
        ).collect()
    # parenthesized PRIMARY KEY spelling
    spark.sql("DROP TABLE IF EXISTS dictck8.d2")
    client.execute_ch(
        "CREATE DICTIONARY dictck8.d2 (region String, code UInt64, "
        "label String) PRIMARY KEY (region, code) "
        "SOURCE(CLICKHOUSE(TABLE 'dictck8.src')) "
        "LAYOUT(COMPLEX_KEY_HASHED()) LIFETIME(0)"
    )
    assert q("SELECT dictGet('dictck8.d2', 'label', "
             "tuple('us', toUInt64(1))) AS r") == "uno"
    client.execute_ch("DROP DATABASE dictck8 SYNC")
