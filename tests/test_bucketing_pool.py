"""Bucketed-join layout and pool facade tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_arrow_spark.ddl import create_bucketed_table
from clickhouse_arrow_spark.errors import QueryError
from clickhouse_arrow_spark.pool import ConnectionPool, PoolOptions


def test_bucketed_join_has_no_exchange(spark, tables):
    """Two tables bucketed on the join key must join with zero shuffle —
    the plan contains no Exchange hashpartitioning on either input."""
    orders = spark.table("orders")
    lineitem = spark.table("lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    create_bucketed_table(orders, "b_orders", ("o_orderkey",), 8)
    create_bucketed_table(lineitem, "b_lineitem", ("l_orderkey",), 8)
    try:
        joined = (
            spark.table("b_orders")
            .hint("merge")  # force SMJ so broadcast can't hide the exchange
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_section, (
            f"bucketed join still shuffles:\n{join_section}"
        )
        # and it returns the right answer
        expect = (
            orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expect.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_pool_checkout_and_status(spark, tables):
    pool = ConnectionPool(spark, PoolOptions(max_size=4))
    with pool.get() as client:
        assert client.query_one("SELECT 1 AS x")["x"] == 1
        assert pool.status()["active_checkouts"] == 1
    assert pool.status()["active_checkouts"] == 0
    assert pool.status()["max_size"] == 4


def test_pool_health_check_runs(spark, tables):
    pool = ConnectionPool(spark, PoolOptions(test_on_checkout=True))
    with pool.get() as client:
        assert client.health_check()
