"""FROM ... FINAL merge-on-read semantics (ddl.rewrite_final).

The ClickHouse FINAL modifier folds a *MergeTree table to its
post-merge state at read time (reference SURVEY §2.3; ClickHouse docs
SELECT ... FINAL). Here the fold is a catalog-metadata-driven rewrite
to a plain subquery: ReplacingMergeTree(ver) → dedup-latest window,
SummingMergeTree → keyed sum with all-zeros row deletion.
"""

from __future__ import annotations

import pytest

from clickhouse_arrow_spark.ddl import CreateOptions, create_table, rewrite_final
from clickhouse_arrow_spark.errors import SchemaError


@pytest.fixture(scope="module")
def final_tables(spark, client):
    spark.sql("CREATE DATABASE IF NOT EXISTS finaldb")
    create_table(
        spark,
        "finaldb",
        "replacing",
        [("k", "UInt32"), ("payload", "String"), ("ver", "UInt64")],
        CreateOptions(engine="ReplacingMergeTree(ver)", order_by=("k",)),
    )
    client.insert(
        "finaldb.replacing",
        client.spark.createDataFrame(
            [(1, "old", 1), (1, "new", 3), (1, "mid", 2), (2, "only", 7)],
            "k INT, payload STRING, ver BIGINT",
        ),
    )
    create_table(
        spark,
        "finaldb",
        "summing",
        [("k", "UInt32"), ("label", "String"), ("hits", "Int64"), ("amount", "Float64")],
        CreateOptions(engine="SummingMergeTree", order_by=("k",)),
    )
    client.insert(
        "finaldb.summing",
        client.spark.createDataFrame(
            [
                (1, "b", 2, 1.5),
                (1, "a", 3, 2.5),
                (2, "z", 5, -1.0),
                (3, "gone", 4, 0.0),
                (3, "gone2", -4, 0.0),
            ],
            "k INT, label STRING, hits BIGINT, amount DOUBLE",
        ),
    )
    create_table(
        spark,
        "finaldb",
        "replacing_nover",
        [("k", "UInt32"), ("v", "String")],
        CreateOptions(engine="ReplacingMergeTree", order_by=("k",)),
    )
    create_table(
        spark,
        "finaldb",
        "plain",
        [("k", "UInt32"), ("v", "String")],
        CreateOptions(engine="MergeTree", order_by=("k",)),
    )
    yield
    spark.sql("DROP DATABASE IF EXISTS finaldb CASCADE")


def test_replacing_final_keeps_max_version(client, final_tables):
    rows = {
        r["k"]: (r["payload"], r["ver"])
        for r in client.query_ch(
            "SELECT k, payload, ver FROM finaldb.replacing FINAL"
        ).collect()
    }
    assert rows == {1: ("new", 3), 2: ("only", 7)}


def test_replacing_final_with_alias_and_filter(client, final_tables):
    rows = client.query_ch(
        "SELECT r.payload FROM finaldb.replacing AS r FINAL WHERE r.k = 1"
    ).collect()
    assert [r["payload"] for r in rows] == ["new"]


def test_final_composes_with_ch_dialect(client, final_tables):
    # FINAL folds first, then the CH→Spark function translation runs on
    # the rewritten text
    rows = client.query_ch(
        "SELECT uniqExact(payload) AS u FROM finaldb.replacing FINAL"
    ).collect()
    assert rows[0]["u"] == 2


def test_summing_final_sums_and_drops_zero_rows(client, final_tables):
    got = {
        r["k"]: (r["label"], r["hits"], r["amount"])
        for r in client.query_ch(
            "SELECT k, label, hits, amount FROM finaldb.summing FINAL"
        ).collect()
    }
    # k=1: hits summed, amount summed, label = deterministic min of the set
    # k=3: both summed columns are zero → row deleted (CH all-zeros rule)
    assert got == {1: ("a", 5, 4.0), 2: ("z", 5, -1.0)}


def test_replacing_without_version_refused(client, final_tables):
    with pytest.raises(SchemaError, match="insertion order"):
        client.query_ch("SELECT * FROM finaldb.replacing_nover FINAL")


def test_plain_mergetree_final_refused(client, final_tables):
    with pytest.raises(SchemaError, match="non-folding"):
        client.query_ch("SELECT * FROM finaldb.plain FINAL")


def test_unknown_table_final_raises_schema_error(client, final_tables):
    with pytest.raises(SchemaError, match="engine catalog"):
        client.query_ch("SELECT * FROM finaldb.does_not_exist FINAL")


def test_final_in_string_literal_untouched(spark, final_tables):
    sql = "SELECT 'FROM t FINAL' AS s FROM finaldb.plain"
    assert rewrite_final(spark, sql) == sql


def test_join_final_folds_joined_side(client, final_tables):
    rows = client.query_ch(
        "SELECT p.k, r.payload FROM finaldb.plain p "
        "JOIN finaldb.replacing r FINAL ON p.k = r.k"
    )
    # plain is empty — the point is the rewrite + plan resolve cleanly
    assert rows.collect() == []


@pytest.fixture(scope="module")
def collapsing_tables(spark, client, final_tables):
    create_table(
        spark,
        "finaldb",
        "collapsing",
        [("k", "UInt32"), ("views", "Int64"), ("sign", "Int8")],
        CreateOptions(engine="CollapsingMergeTree(sign)", order_by=("k",)),
    )
    client.insert(
        "finaldb.collapsing",
        client.spark.createDataFrame(
            [
                # k=1: state fully cancelled, then a new state survives
                (1, 10, 1), (1, 10, -1), (1, 25, 1),
                # k=2: state + cancel -> vanishes
                (2, 7, 1), (2, 7, -1),
                # k=3: orphan cancel (surplus negative) survives as-is
                (3, 4, -1),
            ],
            "k INT, views BIGINT, sign TINYINT",
        ),
    )
    create_table(
        spark,
        "finaldb",
        "vcollapsing",
        [("k", "UInt32"), ("views", "Int64"), ("sign", "Int8"), ("ver", "UInt32")],
        CreateOptions(
            engine="VersionedCollapsingMergeTree(sign, ver)", order_by=("k",)
        ),
    )
    client.insert(
        "finaldb.vcollapsing",
        client.spark.createDataFrame(
            [
                # k=1: v1 state cancelled, v2 state live -> keep v2
                (1, 10, 1, 1), (1, 10, -1, 1), (1, 25, 1, 2),
                # k=2: both versions cancelled -> vanishes
                (2, 7, 1, 1), (2, 7, -1, 1), (2, 8, 1, 2), (2, 8, -1, 2),
                # k=3: v1 live, v2 cancelled -> keep v1
                (3, 4, 1, 1), (3, 5, 1, 2), (3, 5, -1, 2),
                # k=4: TWO live versions -> BOTH survive (the merge only
                # deletes same-(key, ver) sign pairs; CH FINAL keeps all
                # uncancelled versions, not just the max)
                (4, 6, 1, 1), (4, 9, 1, 2),
            ],
            "k INT, views BIGINT, sign TINYINT, ver INT",
        ),
    )
    yield


def test_collapsing_final_sign_sum_cancellation(client, collapsing_tables):
    got = {
        r["k"]: (r["views"], r["sign"])
        for r in client.query_ch(
            "SELECT k, views, sign FROM finaldb.collapsing FINAL"
        ).collect()
    }
    assert got == {1: (25, 1), 3: (4, -1)}  # k=2 fully cancelled


def test_versioned_collapsing_final_keeps_all_uncancelled_versions(
    client, collapsing_tables
):
    got = sorted(
        (r["k"], r["views"], r["ver"])
        for r in client.query_ch(
            "SELECT k, views, ver FROM finaldb.vcollapsing FINAL"
        ).collect()
    )
    # k=2 vanished; k=4's two live versions BOTH survive
    assert got == [(1, 25, 2), (3, 4, 1), (4, 6, 1), (4, 9, 2)]


def test_collapsing_final_one_exchange(client, collapsing_tables):
    # both window passes partition on the same key: a single shuffle
    plan = client.query_ch(
        "SELECT * FROM finaldb.collapsing FINAL"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2


@pytest.fixture(scope="module")
def aggregating_table(spark, client):
    spark.sql("CREATE DATABASE IF NOT EXISTS finaldb")
    create_table(
        spark,
        "finaldb",
        "aggregating",
        [
            ("k", "UInt32"),
            ("s", "AggregateFunction(sum, Int64)"),
            ("av", "AggregateFunction(avg, Float64)"),
            ("cn", "AggregateFunction(count, Int64)"),
            ("ue", "AggregateFunction(uniqExact, String)"),
            ("ga", "AggregateFunction(groupArray, Int64)"),
        ],
        CreateOptions(engine="AggregatingMergeTree", order_by=("k",)),
    )
    # two "parts" of partial states per key, exactly what an aggregate
    # materialized view accumulates block by block
    client.insert(
        "finaldb.aggregating",
        client.spark.createDataFrame(
            [
                (1, 10, (4.0, 2), 2, ["a", "b"], [1, 2]),
                (1, 5, (6.0, 1), 1, ["b", "c"], [3]),
                (2, 7, (7.0, 1), 1, ["z"], [9]),
            ],
            "k INT, s BIGINT, av STRUCT<sum: DOUBLE, count: BIGINT>, "
            "cn BIGINT, ue ARRAY<STRING>, ga ARRAY<BIGINT>",
        ),
    )
    yield


def test_aggregating_final_merges_states_per_key(client, aggregating_table):
    got = {
        r["k"]: (
            r["s"],
            (r["av"]["sum"], r["av"]["count"]),
            r["cn"],
            sorted(r["ue"]),
            sorted(r["ga"]),
        )
        for r in client.query_ch(
            "SELECT * FROM finaldb.aggregating FINAL"
        ).collect()
    }
    assert got == {
        1: (15, (10.0, 3), 3, ["a", "b", "c"], [1, 2, 3]),
        2: (7, (7.0, 1), 1, ["z"], [9]),
    }


def test_aggregating_final_then_merge_reads_finalized(client, aggregating_table):
    # the FINAL output is still a STATE: -Merge reads it, as in CH
    row = client.query_ch(
        "SELECT sumMerge(s) AS total, avgMerge(av) AS mean, "
        "countMerge(cn) AS n, uniqExactMerge(ue) AS u "
        "FROM finaldb.aggregating FINAL"
    ).collect()[0]
    assert (row["total"], row["n"], row["u"]) == (22, 4, 4)
    assert abs(row["mean"] - 17.0 / 4) < 1e-9


def test_aggregating_final_one_exchange(client, aggregating_table):
    plan = client.query_ch(
        "SELECT * FROM finaldb.aggregating FINAL"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


def test_aggregating_final_without_state_columns_refused(spark, client):
    create_table(
        spark,
        "finaldb",
        "aggregating_plain",
        [("k", "UInt32"), ("v", "Int64")],
        CreateOptions(engine="AggregatingMergeTree", order_by=("k",)),
    )
    with pytest.raises(SchemaError, match="AggregateFunction"):
        client.query_ch("SELECT * FROM finaldb.aggregating_plain FINAL")


def test_aggregating_final_unsupported_fn_refused(spark, client):
    create_table(
        spark,
        "finaldb",
        "aggregating_exotic",
        [("k", "UInt32"), ("q", "AggregateFunction(quantileTDigest, Float64)")],
        CreateOptions(engine="AggregatingMergeTree", order_by=("k",)),
    )
    with pytest.raises(SchemaError, match="no transparent merge form"):
        client.query_ch("SELECT * FROM finaldb.aggregating_exotic FINAL")
