"""Round-8 regression battery for the round-7 ADVICE.md findings:

1. MOVE/REPLACE + DETACH/ATTACH PARTITION refuse multi-column
   partitioned tables BEFORE touching the filesystem (no half-moves).
2. DETACH/ATTACH TABLE resolve the snapshot through a pointer at the
   database location, so custom/external LOCATIONs round-trip.
3. ATTACH TABLE keeps the DDL snapshot when the CREATE fails — the
   table stays re-attachable.
4. Join-engine insert dedupe only fires on explicitly-recorded
   Join(ANY); Join(ALL) keeps duplicates; ANY keeps the FIRST row.
5. ch_* lazy UDFs register on every execution path (INSERT ... SELECT,
   CTAS), not just query_ch.
"""

from __future__ import annotations

import os

import pytest

from clickhouse_arrow_spark.errors import SchemaError


def test_multicol_partition_move_refused_preflight(client, spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS adv8")
    for t in ("mc_src", "mc_dst"):
        spark.sql(f"DROP TABLE IF EXISTS adv8.{t}")
        client.execute_ch(
            f"CREATE TABLE adv8.{t} (k Int64, region String, yr Int64) "
            "ENGINE = MergeTree PARTITION BY (region, yr) ORDER BY k"
        )
    client.insert(
        "adv8.mc_src",
        spark.createDataFrame(
            [(1, "eu", 2024), (2, "us", 2025)],
            "k BIGINT, region STRING, yr BIGINT",
        ),
    )
    from clickhouse_arrow_spark.ddl import _table_location

    loc = _table_location(spark, "adv8.mc_src").replace("file:", "")
    with pytest.raises(SchemaError, match="exactly one"):
        client.execute_ch(
            "ALTER TABLE adv8.mc_src MOVE PARTITION 'eu' "
            "TO TABLE adv8.mc_dst"
        )
    # the statement router already classifies 2+-column tables as
    # non-single-column physical partitions; either refusal is fine as
    # long as it happens BEFORE the filesystem is touched
    with pytest.raises(SchemaError, match="exactly one|only PHYSICAL"):
        client.execute_ch(
            "ALTER TABLE adv8.mc_src DETACH PARTITION 'eu'"
        )
    # the refusal happened BEFORE any filesystem mutation: both rows
    # still readable, the table location intact, nothing detached
    assert spark.table("adv8.mc_src").count() == 2
    assert spark.table("adv8.mc_dst").count() == 0
    assert os.path.isdir(loc)
    parent = os.path.dirname(loc)
    assert not os.path.isdir(
        os.path.join(parent, ".detached", "mc_src")
    )
    for t in ("mc_src", "mc_dst"):
        spark.sql(f"DROP TABLE IF EXISTS adv8.{t}")


def test_detach_attach_table_custom_location(client, spark, tmp_path):
    """A table whose LOCATION is outside the warehouse (so the
    snapshot lands beside THAT path) must still ATTACH — via the
    pointer file at the database location."""
    spark.sql("CREATE DATABASE IF NOT EXISTS adv8")
    spark.sql("DROP TABLE IF EXISTS adv8.ext")
    ext = tmp_path / "ext_data"
    spark.sql(
        "CREATE TABLE adv8.ext (k BIGINT, v STRING) USING PARQUET "
        f"LOCATION '{ext}'"
    )
    spark.sql("INSERT INTO adv8.ext VALUES (1, 'a'), (2, 'b')")
    client.execute_ch("DETACH TABLE adv8.ext")
    assert not spark.catalog.tableExists("adv8.ext")
    # snapshot sits beside the EXTERNAL location, not the warehouse
    det = tmp_path / ".detached_tables" / "ext_data"
    assert det.is_dir()
    client.execute_ch("ATTACH TABLE adv8.ext")
    got = sorted((r.k, r.v) for r in spark.table("adv8.ext").collect())
    assert got == [(1, "a"), (2, "b")]
    assert not det.exists()
    spark.sql("DROP TABLE IF EXISTS adv8.ext")


def test_attach_failure_preserves_ddl_snapshot(client, spark):
    """If the CREATE inside ATTACH fails (here: a new table squats on
    the name), the snapshot — including its DDL file — survives, and
    ATTACH succeeds once the conflict is removed."""
    spark.sql("CREATE DATABASE IF NOT EXISTS adv8")
    spark.sql("DROP TABLE IF EXISTS adv8.keep")
    client.execute_ch(
        "CREATE TABLE adv8.keep (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.insert(
        "adv8.keep", spark.createDataFrame([(7,)], "k BIGINT")
    )
    client.execute_ch("DETACH TABLE adv8.keep")
    # squat on the name so the snapshot's CREATE TABLE fails
    spark.sql("CREATE TABLE adv8.keep (other STRING) USING PARQUET")
    with pytest.raises(Exception):
        client.execute_ch("ATTACH TABLE adv8.keep")
    spark.sql("DROP TABLE adv8.keep")
    # the snapshot (and its DDL) survived the failed attach
    client.execute_ch("ATTACH TABLE adv8.keep")
    assert [r.k for r in spark.table("adv8.keep").collect()] == [7]
    spark.sql("DROP TABLE IF EXISTS adv8.keep")


def test_join_all_keeps_duplicates(client, spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS adv8")
    spark.sql("DROP TABLE IF EXISTS adv8.jall")
    client.execute_ch(
        "CREATE TABLE adv8.jall (k Int64, v String) "
        "ENGINE = Join(ALL, LEFT, k)"
    )
    client.insert(
        "adv8.jall",
        spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "k BIGINT, v STRING"
        ),
    )
    client.insert(
        "adv8.jall", spark.createDataFrame([(1, "d")], "k BIGINT, v STRING")
    )
    # Join(ALL) keeps EVERY row — no dedupe-on-insert
    assert spark.table("adv8.jall").count() == 4
    spark.sql("DROP TABLE IF EXISTS adv8.jall")


def test_join_any_keeps_first_inserted(client, spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS adv8")
    spark.sql("DROP TABLE IF EXISTS adv8.jany")
    client.execute_ch(
        "CREATE TABLE adv8.jany (k Int64, v String) "
        "ENGINE = Join(ANY, LEFT, k)"
    )
    # within one batch: the FIRST row per key wins (CH keeps first
    # inserted), not an arbitrary pick
    client.insert(
        "adv8.jany",
        spark.createDataFrame(
            [(1, "first"), (1, "second"), (1, "third"), (2, "x")],
            "k BIGINT, v STRING",
        ).coalesce(1),
    )
    rows = {(r.k, r.v) for r in spark.table("adv8.jany").collect()}
    assert rows == {(1, "first"), (2, "x")}
    # a later insert of an existing key is ignored entirely
    client.insert(
        "adv8.jany",
        spark.createDataFrame([(1, "late"), (3, "y")], "k BIGINT, v STRING"),
    )
    rows = {(r.k, r.v) for r in spark.table("adv8.jany").collect()}
    assert rows == {(1, "first"), (2, "x"), (3, "y")}
    spark.sql("DROP TABLE IF EXISTS adv8.jany")


def test_join_without_recorded_strictness_keeps_rows(client, spark):
    """A Join table whose join_strict property is absent (pre-recording
    table) must NOT silently dedupe."""
    spark.sql("CREATE DATABASE IF NOT EXISTS adv8")
    spark.sql("DROP TABLE IF EXISTS adv8.jold")
    client.execute_ch(
        "CREATE TABLE adv8.jold (k Int64, v String) "
        "ENGINE = Join(ANY, LEFT, k)"
    )
    # simulate a table from before strictness was recorded
    spark.sql(
        "ALTER TABLE adv8.jold UNSET TBLPROPERTIES "
        "('clickhouse_arrow_spark.setting.join_strict')"
    )
    client.insert(
        "adv8.jold",
        spark.createDataFrame([(1, "a"), (1, "b")], "k BIGINT, v STRING"),
    )
    assert spark.table("adv8.jold").count() == 2
    spark.sql("DROP TABLE IF EXISTS adv8.jold")


def test_lazy_udfs_register_on_insert_select_and_ctas(client, spark):
    """normalizeUTF8*/stem/base58 must work through INSERT INTO ...
    SELECT and CREATE ... AS SELECT, not only query_ch (they register
    in the shared _run path)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS adv8")
    for t in ("udf_src", "udf_dst", "udf_ctas"):
        spark.sql(f"DROP TABLE IF EXISTS adv8.{t}")
    client.execute_ch(
        "CREATE TABLE adv8.udf_src (s String) ENGINE = MergeTree ORDER BY s"
    )
    client.insert(
        "adv8.udf_src",
        spark.createDataFrame([("running",), ("caresses",)], "s STRING"),
    )
    client.execute_ch(
        "CREATE TABLE adv8.udf_dst (s String, b String) "
        "ENGINE = MergeTree ORDER BY s"
    )
    # fresh-session simulation: drop registration state so the sniff
    # in _run must re-register (idempotent ensure)
    client.execute_ch(
        "INSERT INTO adv8.udf_dst SELECT stem('en', s) AS s, "
        "base58Encode(s) AS b FROM adv8.udf_src"
    )
    got = {r.s for r in spark.table("adv8.udf_dst").collect()}
    assert got == {"run", "caress"}
    client.execute_ch(
        "CREATE TABLE adv8.udf_ctas ENGINE = MergeTree ORDER BY s AS "
        "SELECT normalizeUTF8NFC(s) AS s FROM adv8.udf_src"
    )
    assert spark.table("adv8.udf_ctas").count() == 2
    for t in ("udf_src", "udf_dst", "udf_ctas"):
        spark.sql(f"DROP TABLE IF EXISTS adv8.{t}")
