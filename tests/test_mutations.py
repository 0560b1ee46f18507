"""ClickHouse mutations: ALTER TABLE ... DELETE/UPDATE and lightweight
DELETE FROM, executed as synchronous part rewrites (ddl.try_mutation)."""

from __future__ import annotations

import pytest

from clickhouse_arrow_spark.ddl import CreateOptions, create_table
from clickhouse_arrow_spark.errors import SchemaError


@pytest.fixture()
def mut_table(spark, client):
    spark.sql("CREATE DATABASE IF NOT EXISTS mutdb")
    spark.sql("DROP TABLE IF EXISTS mutdb.m")
    create_table(
        spark,
        "mutdb",
        "m",
        [("k", "Int64"), ("grp", "String"), ("amount", "Float64")],
        CreateOptions(engine="MergeTree", order_by=("k",)),
    )
    client.insert(
        "mutdb.m",
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", None)],
            "k BIGINT, grp STRING, amount DOUBLE",
        ),
    )
    yield "mutdb.m"
    spark.sql("DROP TABLE IF EXISTS mutdb.m")


def test_alter_delete(client, spark, mut_table):
    n = client.execute_ch(f"ALTER TABLE {mut_table} DELETE WHERE grp = 'a'")
    assert n == 2
    left = {r["k"] for r in spark.table(mut_table).collect()}
    assert left == {3, 4}


def test_lightweight_delete(client, spark, mut_table):
    n = client.execute_ch(f"DELETE FROM {mut_table} WHERE k >= 3")
    assert n == 2
    assert {r["k"] for r in spark.table(mut_table).collect()} == {1, 2}


def test_delete_null_condition_rows_survive(client, spark, mut_table):
    # amount IS NULL for k=4: `amount < 100` is NULL there, row survives
    n = client.execute_ch(f"ALTER TABLE {mut_table} DELETE WHERE amount < 100")
    assert n == 3
    assert {r["k"] for r in spark.table(mut_table).collect()} == {4}


def test_alter_update(client, spark, mut_table):
    n = client.execute_ch(
        f"ALTER TABLE {mut_table} UPDATE amount = amount * 2, grp = 'x' "
        "WHERE k <= 2"
    )
    assert n == 2
    rows = {r["k"]: (r["grp"], r["amount"]) for r in spark.table(mut_table).collect()}
    assert rows[1] == ("x", 20.0) and rows[2] == ("x", 40.0)
    assert rows[3] == ("b", 30.0)  # untouched


def test_update_with_ch_function_in_expr(client, spark, mut_table):
    # WHERE and assignment expressions run through the CH translation
    n = client.execute_ch(
        f"ALTER TABLE {mut_table} UPDATE grp = upperUTF8(grp) "
        "WHERE modulo(k, 2) = 1"
    )
    assert n == 2
    rows = {r["k"]: r["grp"] for r in spark.table(mut_table).collect()}
    assert rows[1] == "A" and rows[3] == "B" and rows[2] == "a"


def test_update_unknown_column_refused(client, mut_table):
    with pytest.raises(SchemaError, match="unknown column"):
        client.execute_ch(f"ALTER TABLE {mut_table} UPDATE bogus = 1 WHERE k = 1")


def test_non_mutation_statement_falls_through(client, spark, mut_table):
    assert client.execute_ch("SELECT count(*) FROM mutdb.m") is None


def test_staging_path_is_table_sibling(spark, mut_table):
    """Round 6: mutation staging lives on the TABLE's filesystem as a
    sibling `<location>_staging_<uuid>` dir — never driver-local /tmp,
    which executors on a real cluster could not read back."""
    from clickhouse_arrow_spark.ddl import _staging_path

    p = _staging_path(spark, mut_table)
    loc = next(
        r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {mut_table}").collect()
        if (r["col_name"] or "").strip() == "Location"
    )
    assert p.startswith(loc.rstrip("/") + "_staging_")
    assert "/tmp/" not in p.replace(loc, "")
    # config override redirects staging wholesale
    spark.conf.set("spark.clickhouse_arrow_spark.stagingDir", "/shared/scratch")
    try:
        p2 = _staging_path(spark, mut_table)
        assert p2.startswith("/shared/scratch/mutdb__m_staging_")
    finally:
        spark.conf.unset("spark.clickhouse_arrow_spark.stagingDir")


def test_mutation_cleans_staging_dir(client, spark, mut_table):
    """The staging dir is removed after the rewrite — success path."""
    import os

    loc = next(
        r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {mut_table}").collect()
        if (r["col_name"] or "").strip() == "Location"
    )
    parent = os.path.dirname(loc.replace("file:", ""))
    client.execute_ch(f"ALTER TABLE {mut_table} DELETE WHERE k = 1")
    leftovers = [d for d in os.listdir(parent) if "_staging_" in d]
    assert leftovers == []
    assert {r["k"] for r in spark.table(mut_table).collect()} == {2, 3, 4}
