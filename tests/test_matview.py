"""Materialized views: insert-triggered per-block propagation, and the
canonical aggregating pattern (SummingMergeTree target + FINAL fold)."""

from __future__ import annotations

import pytest

from clickhouse_arrow_spark.ddl import CreateOptions, create_table
from clickhouse_arrow_spark.errors import SchemaError
from clickhouse_arrow_spark.matview import (
    attached_views,
    create_materialized_view,
    drop_materialized_view,
)


@pytest.fixture()
def mv_env(spark, client):
    spark.sql("CREATE DATABASE IF NOT EXISTS mvdb")
    spark.sql("DROP TABLE IF EXISTS mvdb.src")
    create_table(
        spark,
        "mvdb",
        "src",
        [("k", "Int64"), ("v", "Float64")],
        CreateOptions(engine="MergeTree", order_by=("k",)),
    )
    yield
    spark.sql("DROP DATABASE IF EXISTS mvdb CASCADE")


def _rows(spark, table):
    return [(r[0], r[1]) for r in spark.table(table).collect()]


def test_mv_triggers_per_insert_block(spark, client, mv_env):
    create_materialized_view(
        spark, "mvdb", "doubled", "mvdb.src",
        "SELECT k, v * 2 AS v2 FROM mvdb.src",
    )
    client.insert("mvdb.src", spark.createDataFrame([(1, 1.0)], "k BIGINT, v DOUBLE"))
    client.insert("mvdb.src", spark.createDataFrame([(2, 3.0)], "k BIGINT, v DOUBLE"))
    assert sorted(_rows(spark, "mvdb.doubled")) == [(1, 2.0), (2, 6.0)]


def test_mv_sees_only_new_blocks_unless_populate(spark, client, mv_env):
    client.insert("mvdb.src", spark.createDataFrame([(1, 1.0)], "k BIGINT, v DOUBLE"))
    create_materialized_view(
        spark, "mvdb", "late", "mvdb.src", "SELECT k, v FROM mvdb.src"
    )
    client.insert("mvdb.src", spark.createDataFrame([(2, 2.0)], "k BIGINT, v DOUBLE"))
    # pre-existing row 1 is NOT in the view (CH: no POPULATE)
    assert sorted(_rows(spark, "mvdb.late")) == [(2, 2.0)]
    create_materialized_view(
        spark, "mvdb", "full", "mvdb.src", "SELECT k, v FROM mvdb.src",
        populate=True,
    )
    assert sorted(_rows(spark, "mvdb.full")) == [(1, 1.0), (2, 2.0)]


def test_aggregating_mv_folds_with_final(spark, client, mv_env):
    """The canonical CH pattern: aggregate MV accumulates per-block
    partials into a SummingMergeTree target; FINAL folds to totals."""
    create_materialized_view(
        spark, "mvdb", "totals", "mvdb.src",
        "SELECT k, sum(v) AS total, count(*) AS n FROM mvdb.src GROUP BY k",
    )
    # mark the target a SummingMergeTree keyed on k so FINAL folds it
    spark.sql(
        "ALTER TABLE mvdb.totals SET TBLPROPERTIES ("
        "'clickhouse_arrow_spark.engine' = 'SummingMergeTree', "
        "'clickhouse_arrow_spark.order_by' = 'k')"
    )
    client.insert(
        "mvdb.src",
        spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 5.0)], "k BIGINT, v DOUBLE"),
    )
    client.insert(
        "mvdb.src",
        spark.createDataFrame([(1, 4.0)], "k BIGINT, v DOUBLE"),
    )
    # raw view: one partial row per (block, k) — 3 rows
    assert spark.table("mvdb.totals").count() == 3
    folded = {
        r["k"]: (r["total"], r["n"])
        for r in client.query_ch("SELECT * FROM mvdb.totals FINAL").collect()
    }
    assert folded == {1: (7.0, 3), 2: (5.0, 1)}


def test_mv_must_reference_source(spark, mv_env):
    with pytest.raises(SchemaError, match="must reference"):
        create_materialized_view(
            spark, "mvdb", "bad", "mvdb.src", "SELECT 1 AS one"
        )


def test_drop_materialized_view_detaches(spark, client, mv_env):
    create_materialized_view(
        spark, "mvdb", "d1", "mvdb.src", "SELECT k, v FROM mvdb.src"
    )
    assert len(attached_views(spark, "mvdb.src")) == 1
    drop_materialized_view(spark, "mvdb.d1")
    assert attached_views(spark, "mvdb.src") == []
    client.insert("mvdb.src", spark.createDataFrame([(9, 9.0)], "k BIGINT, v DOUBLE"))
    assert "d1" not in [t.name for t in spark.catalog.listTables("mvdb")]


def test_sql_insert_triggers_materialized_view(spark, client, mv_env):
    """CH MVs trigger on EVERY insert — including SQL INSERT INTO,
    which execute_ch routes through the insert path."""
    create_materialized_view(
        spark, "mvdb", "sqlmv", "mvdb.src",
        "SELECT k, sum(v) AS total FROM mvdb.src GROUP BY k",
    )
    client.execute_ch("INSERT INTO mvdb.src VALUES (1, 2.5), (1, 1.5)")
    client.execute_ch(
        "INSERT INTO mvdb.src SELECT k + 1, v * 10 FROM mvdb.src WHERE k = 1"
    )
    src = sorted((r[0], r[1]) for r in spark.table("mvdb.src").collect())
    assert src == [(1, 1.5), (1, 2.5), (2, 15.0), (2, 25.0)]
    mv = sorted((r[0], r[1]) for r in spark.table("mvdb.sqlmv").collect())
    # one partial row per (insert block, k)
    assert mv == [(1, 4.0), (2, 40.0)]


def test_sql_insert_with_column_list_triggers_mv(spark, client, mv_env):
    create_materialized_view(
        spark, "mvdb", "colmv", "mvdb.src", "SELECT k, v FROM mvdb.src"
    )
    client.execute_ch("INSERT INTO mvdb.src (k) VALUES (42)")
    src = [(r["k"], r["v"]) for r in spark.table("mvdb.src").collect()]
    assert src == [(42, None)]  # unlisted column arrives NULL
    mv = [(r["k"], r["v"]) for r in spark.table("mvdb.colmv").collect()]
    assert mv == [(42, None)]  # the MV saw the block


def test_textual_create_materialized_view_forms(client, spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS mvtx")
    for t in ("src", "mv1", "tgt"):
        spark.sql(f"DROP TABLE IF EXISTS mvtx.{t}")
    client.execute_ch(
        "CREATE TABLE mvtx.src (k Int64, v Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch("INSERT INTO mvtx.src VALUES (1, 10), (2, 20)")
    try:
        client.execute_ch(
            "CREATE MATERIALIZED VIEW mvtx.mv1 ENGINE = SummingMergeTree "
            "ORDER BY k POPULATE AS "
            "SELECT k, sum(v) AS sv FROM mvtx.src GROUP BY k"
        )
        assert sorted(
            tuple(r) for r in spark.table("mvtx.mv1").collect()
        ) == [(1, 10), (2, 20)]
        client.execute_ch("INSERT INTO mvtx.src VALUES (1, 5)")
        # per-block partial appended; FINAL folds
        folded = client.query_ch("SELECT k, sv FROM mvtx.mv1 FINAL").collect()
        assert sorted(tuple(r) for r in folded) == [(1, 15), (2, 20)]
        # TO-form writes into an existing table; POPULATE refused
        client.execute_ch(
            "CREATE TABLE mvtx.tgt (k Int64, sv Int64) "
            "ENGINE = SummingMergeTree ORDER BY k"
        )
        client.execute_ch(
            "CREATE MATERIALIZED VIEW mvtx.mv2 TO mvtx.tgt AS "
            "SELECT k, sum(v) AS sv FROM mvtx.src GROUP BY k"
        )
        client.execute_ch("INSERT INTO mvtx.src VALUES (3, 7)")
        assert (3, 7) in {tuple(r) for r in spark.table("mvtx.tgt").collect()}
        with pytest.raises(Exception, match="POPULATE"):
            client.execute_ch(
                "CREATE MATERIALIZED VIEW mvtx.mv3 TO mvtx.tgt POPULATE AS "
                "SELECT k, sum(v) AS sv FROM mvtx.src GROUP BY k"
            )
    finally:
        for t in ("src", "mv1", "tgt"):
            spark.sql(f"DROP TABLE IF EXISTS mvtx.{t}")


def test_refreshable_materialized_view(spark, client):
    """Round 8: CREATE MATERIALIZED VIEW ... REFRESH EVERY n unit —
    NOT insert-triggered; the whole query re-runs and replaces the
    target on SYSTEM REFRESH VIEW. Multi-table SELECTs allowed (the
    feature's point); EMPTY skips the initial refresh; schedule and
    refresh times surface in system.view_refreshes."""
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS mv8")
    for t in ("mv8.src_a", "mv8.src_b", "mv8.rv", "mv8.rv_empty"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    client.execute_ch(
        "CREATE TABLE mv8.src_a (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch(
        "CREATE TABLE mv8.src_b (k Int64, v Int64) "
        "ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch("INSERT INTO mv8.src_a VALUES (1), (2)")
    client.execute_ch(
        "INSERT INTO mv8.src_b VALUES (1, 10), (2, 20)"
    )
    # multi-table join SELECT — impossible for trigger MVs
    client.execute_ch(
        "CREATE MATERIALIZED VIEW mv8.rv REFRESH EVERY 1 HOUR AS "
        "SELECT a.k AS k, b.v AS v FROM mv8.src_a a "
        "JOIN mv8.src_b b ON a.k = b.k"
    )
    # initial refresh ran at creation
    assert {(r.k, r.v) for r in spark.table("mv8.rv").collect()} \
        == {(1, 10), (2, 20)}
    # inserts do NOT propagate (not a trigger MV) ...
    client.execute_ch("INSERT INTO mv8.src_b VALUES (3, 30)")
    client.execute_ch("INSERT INTO mv8.src_a VALUES (3)")
    assert spark.table("mv8.rv").count() == 2
    # ... until an explicit refresh replaces the contents
    client.execute_ch("SYSTEM REFRESH VIEW mv8.rv")
    assert spark.table("mv8.rv").count() == 3
    # visible in system.view_refreshes with a computed next time
    [row] = client.query_ch(
        "SELECT refresh_schedule, last_refresh_time, "
        "next_refresh_time FROM system.view_refreshes "
        "WHERE database = 'mv8' AND view = 'rv'"
    ).collect()
    assert row.refresh_schedule == "EVERY 1 HOUR"
    assert row.last_refresh_time is not None
    assert (row.next_refresh_time - row.last_refresh_time
            ).total_seconds() == 3600
    # EMPTY skips the initial refresh
    client.execute_ch(
        "CREATE MATERIALIZED VIEW mv8.rv_empty REFRESH AFTER 30 MINUTE "
        "EMPTY AS SELECT k FROM mv8.src_a"
    )
    assert spark.table("mv8.rv_empty").count() == 0
    client.execute_ch("SYSTEM WAIT VIEW mv8.rv_empty")
    client.execute_ch("SYSTEM REFRESH VIEW mv8.rv_empty")
    assert spark.table("mv8.rv_empty").count() == 3
    # STOP/START VIEWS are documented no-ops; refreshing a
    # non-refreshable table refuses
    client.execute_ch("SYSTEM STOP VIEWS")
    client.execute_ch("SYSTEM START VIEW mv8.rv")
    with _pt.raises(SchemaError, match="not a refreshable"):
        client.execute_ch("SYSTEM REFRESH VIEW mv8.src_a")
    for t in ("mv8.rv", "mv8.rv_empty", "mv8.src_a", "mv8.src_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_refreshable_view_append_and_or_replace_function(spark, client):
    """Round 8 follow-ups: REFRESH ... APPEND accumulates instead of
    replacing; CREATE OR REPLACE FUNCTION swaps a macro in place."""
    spark.sql("CREATE DATABASE IF NOT EXISTS mv8")
    for t in ("mv8.src_ap", "mv8.rv_ap"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    client.execute_ch(
        "CREATE TABLE mv8.src_ap (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch("INSERT INTO mv8.src_ap VALUES (1)")
    client.execute_ch(
        "CREATE MATERIALIZED VIEW mv8.rv_ap REFRESH EVERY 10 MINUTE "
        "APPEND AS SELECT k, 1 AS gen FROM mv8.src_ap"
    )
    assert spark.table("mv8.rv_ap").count() == 1
    client.execute_ch("SYSTEM REFRESH VIEW mv8.rv_ap")
    assert spark.table("mv8.rv_ap").count() == 2  # appended, not replaced
    client.execute_ch("DROP FUNCTION IF EXISTS orr8")
    client.execute_ch("CREATE FUNCTION orr8 AS x -> x + 1")
    assert client.query_ch("SELECT orr8(1) AS r").collect()[0].r == 2
    client.execute_ch("CREATE OR REPLACE FUNCTION orr8 AS x -> x * 10")
    assert client.query_ch("SELECT orr8(2) AS r").collect()[0].r == 20
    client.execute_ch("DROP FUNCTION orr8")
    for t in ("mv8.rv_ap", "mv8.src_ap"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
