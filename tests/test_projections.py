"""ClickHouse table projections (projections.py): ADD / MATERIALIZE /
DROP PROJECTION statements, insert-trigger maintenance of the hidden
partials table, mutation rebuild, and the automatic read-side routing
of matching aggregate queries — with conservative fallbacks whenever
the query shape is not provably covered."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_arrow_spark.ddl import CreateOptions, create_table
from clickhouse_arrow_spark.errors import SchemaError
from clickhouse_arrow_spark.projections import route_projection


@pytest.fixture(scope="module")
def proj_table(spark, client):
    spark.sql("CREATE DATABASE IF NOT EXISTS projdb")
    spark.sql("DROP TABLE IF EXISTS projdb.sales")
    spark.sql("DROP TABLE IF EXISTS projdb.sales__proj_by_region")
    create_table(
        spark,
        "projdb",
        "sales",
        [("region", "String"), ("sku", "String"), ("amount", "Float64"),
         ("qty", "Int64")],
        CreateOptions(engine="MergeTree", order_by=("region",)),
    )
    client.insert(
        "projdb.sales",
        spark.createDataFrame(
            [("eu", "a", 10.0, 1), ("eu", "b", 20.0, 2),
             ("us", "a", 30.0, 3), ("us", "b", 40.0, 4),
             ("ap", "a", 50.0, 5)],
            "region STRING, sku STRING, amount DOUBLE, qty BIGINT",
        ),
    )
    client.execute_ch(
        "ALTER TABLE projdb.sales ADD PROJECTION by_region "
        "(SELECT region, sum(amount) AS rev, count() AS n, "
        "avg(qty) AS mean_qty GROUP BY region)"
    )
    client.execute_ch(
        "ALTER TABLE projdb.sales MATERIALIZE PROJECTION by_region"
    )
    yield "projdb.sales"
    spark.sql("DROP TABLE IF EXISTS projdb.sales__proj_by_region")
    spark.sql("DROP TABLE IF EXISTS projdb.sales")


def test_routing_rewrites_to_partials_table(spark, client, proj_table):
    routed = route_projection(
        spark, f"SELECT region, sum(amount) AS rev FROM {proj_table} "
               "GROUP BY region"
    )
    assert routed is not None and "__proj_by_region" in routed


def test_routed_values_match_base(spark, client, proj_table):
    got = {
        r["region"]: (r["rev"], r["n"], r["mean_qty"])
        for r in client.query_ch(
            f"SELECT region, sum(amount) AS rev, count() AS n, "
            f"avg(qty) AS mean_qty FROM {proj_table} GROUP BY region"
        ).collect()
    }
    assert got == {
        "eu": (30.0, 2, 1.5),
        "us": (70.0, 2, 3.5),
        "ap": (50.0, 1, 5.0),
    }


def test_where_on_key_routes_where_on_nonkey_falls_back(spark, proj_table):
    on_key = route_projection(
        spark, f"SELECT region, sum(amount) AS rev FROM {proj_table} "
               "WHERE region = 'eu' GROUP BY region"
    )
    assert on_key is not None and "__proj_by_region" in on_key
    on_nonkey = route_projection(
        spark, f"SELECT region, sum(amount) AS rev FROM {proj_table} "
               "WHERE sku = 'a' GROUP BY region"
    )
    assert on_nonkey is None  # partials lost sku: must read the base


def test_nonkey_where_still_correct_via_base(client, proj_table):
    got = {
        r["region"]: r["rev"]
        for r in client.query_ch(
            f"SELECT region, sum(amount) AS rev FROM {proj_table} "
            "WHERE sku = 'a' GROUP BY region"
        ).collect()
    }
    assert got == {"eu": 10.0, "us": 30.0, "ap": 50.0}


def test_uncovered_aggregate_falls_back(spark, proj_table):
    assert route_projection(
        spark, f"SELECT region, max(amount) AS m FROM {proj_table} "
               "GROUP BY region"
    ) is None  # projection declares no max(amount)


def test_order_by_alias_routes_raw_respelling_does_not(spark, proj_table):
    by_alias = route_projection(
        spark, f"SELECT region, sum(amount) AS rev FROM {proj_table} "
               "GROUP BY region ORDER BY rev DESC LIMIT 2"
    )
    assert by_alias is not None
    raw = route_projection(
        spark, f"SELECT region, sum(amount) AS rev FROM {proj_table} "
               "GROUP BY region ORDER BY sum(amount) DESC"
    )
    assert raw is None  # `amount` is gone from the partials table


def test_insert_propagates_to_projection(spark, client, proj_table):
    client.insert(
        proj_table,
        spark.createDataFrame(
            [("eu", "c", 5.0, 10)],
            "region STRING, sku STRING, amount DOUBLE, qty BIGINT",
        ),
    )
    got = {
        r["region"]: (r["rev"], r["n"])
        for r in client.query_ch(
            f"SELECT region, sum(amount) AS rev, count() AS n "
            f"FROM {proj_table} GROUP BY region"
        ).collect()
    }
    assert got["eu"] == (35.0, 3)
    # the partials table gained a second eu block row (per-block state)
    partials = spark.table(f"{proj_table}__proj_by_region")
    assert partials.where(F.col("region") == "eu").count() == 2


def test_mutation_rebuilds_projection(spark, client, proj_table):
    client.execute_ch(
        f"ALTER TABLE {proj_table} DELETE WHERE sku = 'c'"
    )
    got = {
        r["region"]: (r["rev"], r["n"])
        for r in client.query_ch(
            f"SELECT region, sum(amount) AS rev, count() AS n "
            f"FROM {proj_table} GROUP BY region"
        ).collect()
    }
    assert got["eu"] == (30.0, 2)


def test_unmaterialized_projection_not_routed(spark, client, proj_table):
    client.execute_ch(
        f"ALTER TABLE {proj_table} ADD PROJECTION by_sku "
        "(SELECT sku, sum(amount) AS rev GROUP BY sku)"
    )
    try:
        # table is non-empty and MATERIALIZE has not run: no routing
        assert route_projection(
            spark, f"SELECT sku, sum(amount) AS rev FROM {proj_table} "
                   "GROUP BY sku"
        ) is None
        client.execute_ch(
            f"ALTER TABLE {proj_table} MATERIALIZE PROJECTION by_sku"
        )
        routed = route_projection(
            spark, f"SELECT sku, sum(amount) AS rev FROM {proj_table} "
                   "GROUP BY sku"
        )
        assert routed is not None and "__proj_by_sku" in routed
    finally:
        client.execute_ch(f"ALTER TABLE {proj_table} DROP PROJECTION by_sku")


def test_drop_projection_removes_target(spark, client, proj_table):
    client.execute_ch(
        f"ALTER TABLE {proj_table} ADD PROJECTION tmp "
        "(SELECT region, sum(qty) AS q GROUP BY region)"
    )
    assert spark.catalog.tableExists(f"{proj_table}__proj_tmp")
    client.execute_ch(f"ALTER TABLE {proj_table} DROP PROJECTION tmp")
    assert not spark.catalog.tableExists(f"{proj_table}__proj_tmp")
    with pytest.raises(SchemaError, match="no projection"):
        client.execute_ch(f"ALTER TABLE {proj_table} DROP PROJECTION tmp")


def test_bad_projection_selects_refused(spark, client, proj_table):
    with pytest.raises(SchemaError, match="GROUP BY"):
        client.execute_ch(
            f"ALTER TABLE {proj_table} ADD PROJECTION bad1 "
            "(SELECT region, amount ORDER BY amount)"
        )
    with pytest.raises(SchemaError, match="mergeable"):
        client.execute_ch(
            f"ALTER TABLE {proj_table} ADD PROJECTION bad2 "
            "(SELECT region, median(amount) GROUP BY region)"
        )
    with pytest.raises(SchemaError, match="not on"):
        client.execute_ch(
            f"ALTER TABLE {proj_table} ADD PROJECTION bad3 "
            "(SELECT region, sum(nope) GROUP BY region)"
        )


def test_group_by_subset_of_projection_keys(spark, client):
    spark.sql("DROP TABLE IF EXISTS projdb.multi")
    spark.sql("DROP TABLE IF EXISTS projdb.multi__proj_two_keys")
    create_table(
        spark, "projdb", "multi",
        [("a", "String"), ("b", "String"), ("v", "Int64")],
        CreateOptions(engine="MergeTree", order_by=("a",)),
    )
    from clickhouse_arrow_spark.client import Client

    c = Client(spark)
    c.insert(
        "projdb.multi",
        spark.createDataFrame(
            [("x", "p", 1), ("x", "q", 2), ("y", "p", 3)],
            "a STRING, b STRING, v BIGINT",
        ),
    )
    c.execute_ch(
        "ALTER TABLE projdb.multi ADD PROJECTION two "
        "(SELECT a, b, sum(v) AS s GROUP BY a, b)"
    )
    c.execute_ch("ALTER TABLE projdb.multi MATERIALIZE PROJECTION two")
    # GROUP BY a (subset of projection keys) re-merges the partials
    routed = route_projection(
        spark, "SELECT a, sum(v) AS s FROM projdb.multi GROUP BY a"
    )
    assert routed is not None and "__proj_two" in routed
    got = {r["a"]: r["s"] for r in c.query_ch(
        "SELECT a, sum(v) AS s FROM projdb.multi GROUP BY a"
    ).collect()}
    assert got == {"x": 3, "y": 3}
    spark.sql("DROP TABLE IF EXISTS projdb.multi__proj_two")
    spark.sql("DROP TABLE IF EXISTS projdb.multi")
