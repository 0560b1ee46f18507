from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from clickhouse_arrow_spark.session import get_spark

    spark = get_spark(
        app_name="cas-tests",
        confs={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "8g",
            # keep a writable warehouse for DDL tests
            "spark.sql.warehouse.dir": "/tmp/cas-warehouse",
        },
    )
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    from clickhouse_arrow_spark.sources import register_tables

    return register_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def client(spark, tables):
    from clickhouse_arrow_spark.client import Client

    return Client(spark)


@pytest.fixture(scope="session")
def duck():
    """DuckDB oracle connection with the same tables as views."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()
