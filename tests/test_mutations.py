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


def test_materialize_column_backfills(client, spark):
    client.execute_ch("DROP TABLE IF EXISTS default.mut_mat")
    client.execute_ch(
        "CREATE TABLE default.mut_mat (k Int64, v Float64, "
        "scaled Float64 MATERIALIZED v * 10) "
        "ENGINE = MergeTree() ORDER BY k"
    )
    client.execute_ch(
        "INSERT INTO default.mut_mat (k, v) VALUES (1, 2.0), (2, 3.0)"
    )
    client.execute_ch("ALTER TABLE default.mut_mat CLEAR COLUMN scaled")
    assert all(
        r.scaled is None
        for r in spark.table("default.mut_mat").collect()
    )
    client.execute_ch("ALTER TABLE default.mut_mat MATERIALIZE COLUMN scaled")
    got = {r.k: r.scaled for r in spark.table("default.mut_mat").collect()}
    assert got == {1: 20.0, 2: 30.0}
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    with _pt.raises(SchemaError, match="no MATERIALIZED"):
        client.execute_ch("ALTER TABLE default.mut_mat MATERIALIZE COLUMN v")
    client.execute_ch("DROP TABLE default.mut_mat")


def test_mutation_in_partition_scope(client, spark):
    client.execute_ch("DROP TABLE IF EXISTS default.mut_part")
    client.execute_ch(
        "CREATE TABLE default.mut_part (k Int64, v Float64) "
        "ENGINE = MergeTree() ORDER BY k PARTITION BY k % 2"
    )
    client.execute_ch(
        "INSERT INTO default.mut_part VALUES (1, 1.0), (2, 2.0), (3, 3.0)"
    )
    # integer condition (CH boolean) + partition scoping together
    client.execute_ch(
        "ALTER TABLE default.mut_part UPDATE v = v + 100 "
        "IN PARTITION 1 WHERE 1"
    )
    got = {r.k: r.v for r in spark.table("default.mut_part").collect()}
    assert got == {1: 101.0, 2: 2.0, 3: 103.0}
    client.execute_ch(
        "ALTER TABLE default.mut_part DELETE IN PARTITION 0 WHERE v > 0"
    )
    assert {r.k for r in spark.table("default.mut_part").collect()} == {1, 3}
    client.execute_ch("DROP TABLE default.mut_part")


def test_detach_partition_and_undrop_refusals(client):
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    client.execute_ch("DROP TABLE IF EXISTS default.mut_det SYNC")
    client.execute_ch(
        "CREATE TABLE default.mut_det (k Int64) "
        "ENGINE = MergeTree() ORDER BY k"
    )
    # no physical PARTITION BY column -> guided (file-move needs
    # Hive-style directories)
    with _pt.raises(SchemaError, match="PHYSICAL"):
        client.execute_ch("ALTER TABLE default.mut_det DETACH PARTITION 1")
    # UNDROP of a live, never-dropped table refuses (round 8: UNDROP
    # restores from the trash window — nothing there for this name)
    with _pt.raises(SchemaError, match="no dropped table"):
        client.execute_ch("UNDROP TABLE default.mut_det")
    client.execute_ch("DROP TABLE default.mut_det SYNC")


def test_detach_attach_partition_roundtrip(client, spark):
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS ddl7")
    spark.sql("DROP TABLE IF EXISTS ddl7.da")
    client.execute_ch(
        "CREATE TABLE ddl7.da (k Int64, region String) "
        "ENGINE = MergeTree PARTITION BY region ORDER BY k"
    )
    client.insert(
        "ddl7.da",
        spark.createDataFrame(
            [(1, "eu"), (2, "eu"), (3, "us")], "k BIGINT, region STRING"
        ),
    )
    # DETACH: rows leave the query path, files move to .detached/
    client.execute_ch("ALTER TABLE ddl7.da DETACH PARTITION 'eu'")
    assert {r.k for r in spark.table("ddl7.da").collect()} == {3}
    from clickhouse_arrow_spark.ddl import _table_location

    loc = _table_location(spark, "ddl7.da").replace("file:", "")
    import os

    det = os.path.join(os.path.dirname(loc), ".detached", "da",
                       "region=eu")
    assert os.path.isdir(det)
    # a mutation between DETACH and ATTACH must not wipe the detached
    # area (it lives BESIDE the table location)
    client.execute_ch("ALTER TABLE ddl7.da DELETE WHERE k = 3")
    assert os.path.isdir(det)
    # double-DETACH refuses; ATTACH of a never-detached value refuses
    with _pt.raises(SchemaError, match="no partition"):
        client.execute_ch("ALTER TABLE ddl7.da DETACH PARTITION 'eu'")
    with _pt.raises(SchemaError, match="no detached"):
        client.execute_ch("ALTER TABLE ddl7.da ATTACH PARTITION 'apac'")
    # ATTACH: files move back, rows reappear — no data was rewritten
    client.execute_ch("ALTER TABLE ddl7.da ATTACH PARTITION 'eu'")
    assert {r.k for r in spark.table("ddl7.da").collect()} == {1, 2}
    assert not os.path.isdir(det)
    spark.sql("DROP TABLE IF EXISTS ddl7.da")


def test_detach_attach_table_roundtrip(client, spark):
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS ddl7")
    spark.sql("DROP TABLE IF EXISTS ddl7.dt")
    client.execute_ch(
        "CREATE TABLE ddl7.dt (k Int64, region String) "
        "ENGINE = MergeTree PARTITION BY region ORDER BY k"
    )
    client.insert(
        "ddl7.dt",
        spark.createDataFrame(
            [(1, "eu"), (2, "us")], "k BIGINT, region STRING"
        ),
    )
    client.execute_ch("DETACH TABLE ddl7.dt")
    assert not spark.catalog.tableExists("ddl7.dt")
    # double-detach of a gone table fails on the catalog lookup
    with _pt.raises(Exception):
        client.execute_ch("DETACH TABLE ddl7.dt")
    # ATTACH restores rows, partitions, and CH table props
    client.execute_ch("ATTACH TABLE ddl7.dt PERMANENTLY")
    got = sorted((r.k, r.region) for r in spark.table("ddl7.dt").collect())
    assert got == [(1, "eu"), (2, "us")]
    props = {r["key"] for r in
             spark.sql("SHOW TBLPROPERTIES ddl7.dt").collect()}
    assert "clickhouse_arrow_spark.engine" in props
    with _pt.raises(SchemaError, match="no detached"):
        client.execute_ch("ATTACH TABLE ddl7.dt")
    spark.sql("DROP TABLE IF EXISTS ddl7.dt")


def test_move_replace_partition(client, spark):
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS ddl7")
    for t in ("mp_src", "mp_dst"):
        spark.sql(f"DROP TABLE IF EXISTS ddl7.{t}")
    client.execute_ch(
        "CREATE TABLE ddl7.mp_src (k Int64, region String) "
        "ENGINE = MergeTree PARTITION BY region ORDER BY k"
    )
    client.execute_ch(
        "CREATE TABLE ddl7.mp_dst (k Int64, region String) "
        "ENGINE = MergeTree PARTITION BY region ORDER BY k"
    )
    client.insert(
        "ddl7.mp_src",
        spark.createDataFrame(
            [(1, "eu"), (2, "eu"), (3, "us")], "k BIGINT, region STRING"
        ),
    )
    # MOVE: the partition leaves src, appears in dst (file rename)
    client.execute_ch(
        "ALTER TABLE ddl7.mp_src MOVE PARTITION 'eu' TO TABLE ddl7.mp_dst"
    )
    assert {r.k for r in spark.table("ddl7.mp_src").collect()} == {3}
    assert {r.k for r in spark.table("ddl7.mp_dst").collect()} == {1, 2}
    # MOVE onto an existing partition refuses, naming REPLACE
    client.insert(
        "ddl7.mp_src",
        spark.createDataFrame([(9, "eu")], "k BIGINT, region STRING"),
    )
    with _pt.raises(SchemaError, match="REPLACE PARTITION"):
        client.execute_ch(
            "ALTER TABLE ddl7.mp_src MOVE PARTITION 'eu' "
            "TO TABLE ddl7.mp_dst"
        )
    # REPLACE: dst partition overwritten by a COPY; src keeps its rows
    client.execute_ch(
        "ALTER TABLE ddl7.mp_dst REPLACE PARTITION 'eu' FROM ddl7.mp_src"
    )
    assert {r.k for r in spark.table("ddl7.mp_dst").collect()} == {9}
    assert {r.k for r in spark.table("ddl7.mp_src")
            .where("region = 'eu'").collect()} == {9}
    for t in ("mp_src", "mp_dst"):
        spark.sql(f"DROP TABLE IF EXISTS ddl7.{t}")


def test_freeze_snapshot(client, spark):
    import os

    import pytest as _pt

    from clickhouse_arrow_spark.ddl import _table_location
    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS ddl7")
    spark.sql("DROP TABLE IF EXISTS ddl7.fz")
    client.execute_ch(
        "CREATE TABLE ddl7.fz (k Int64, region String) "
        "ENGINE = MergeTree PARTITION BY region ORDER BY k"
    )
    # snapshots survive DROP TABLE by design — clean prior-run leftovers
    import shutil

    loc0 = _table_location(spark, "ddl7.fz").replace("file:", "")
    shutil.rmtree(
        os.path.join(os.path.dirname(loc0), ".shadow", "fz"),
        ignore_errors=True,
    )
    client.insert(
        "ddl7.fz",
        spark.createDataFrame(
            [(1, "eu"), (2, "us")], "k BIGINT, region STRING"
        ),
    )
    client.execute_ch("ALTER TABLE ddl7.fz FREEZE WITH NAME 'pre'")
    loc = _table_location(spark, "ddl7.fz").replace("file:", "")
    snap = os.path.join(os.path.dirname(loc), ".shadow", "fz", "pre")
    # dotted dirs are invisible to Spark's listing BY DESIGN (same
    # reason .detached never leaks into table scans) — verify the
    # snapshot's parquet at file level via DuckDB
    assert os.path.isdir(os.path.join(snap, "region=eu"))
    import duckdb

    frozen = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{snap}/*/*.parquet')"
    ).fetchone()[0]
    assert frozen == 2
    # mutations after the freeze don't touch the snapshot
    client.execute_ch("ALTER TABLE ddl7.fz DELETE WHERE region = 'eu'")
    assert spark.table("ddl7.fz").count() == 1
    assert duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{snap}/*/*.parquet')"
    ).fetchone()[0] == 2
    with _pt.raises(SchemaError, match="already exists"):
        client.execute_ch("ALTER TABLE ddl7.fz FREEZE WITH NAME 'pre'")
    # SYSTEM UNFREEZE removes the named snapshot everywhere
    client.execute_ch("SYSTEM UNFREEZE WITH NAME 'pre'")
    assert not os.path.isdir(snap)
    with _pt.raises(SchemaError, match="no snapshot"):
        client.execute_ch("SYSTEM UNFREEZE WITH NAME 'pre'")
    spark.sql("DROP TABLE IF EXISTS ddl7.fz")


def test_backup_restore_table(client, spark, tmp_path):
    import pytest as _pt

    from clickhouse_arrow_spark.errors import QueryError, SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS ddl7")
    spark.sql("DROP TABLE IF EXISTS ddl7.bk")
    client.execute_ch(
        "CREATE TABLE ddl7.bk (k Int64, region String) "
        "ENGINE = MergeTree PARTITION BY region ORDER BY k"
    )
    client.insert(
        "ddl7.bk",
        spark.createDataFrame(
            [(1, "eu"), (2, "us")], "k BIGINT, region STRING"
        ),
    )
    dest = str(tmp_path / "bk1")
    client.execute_ch(f"BACKUP TABLE ddl7.bk TO File('{dest}')")
    # backups never overwrite
    with _pt.raises(SchemaError, match="already exists"):
        client.execute_ch(f"BACKUP TABLE ddl7.bk TO File('{dest}')")
    # mutate + drop, then restore the original state
    client.execute_ch("ALTER TABLE ddl7.bk DELETE WHERE region = 'eu'")
    with _pt.raises(SchemaError, match="DROP it first"):
        client.execute_ch(f"RESTORE TABLE ddl7.bk FROM File('{dest}')")
    spark.sql("DROP TABLE ddl7.bk")
    client.execute_ch(f"RESTORE TABLE ddl7.bk FROM File('{dest}')")
    got = sorted((r.k, r.region) for r in spark.table("ddl7.bk").collect())
    assert got == [(1, "eu"), (2, "us")]
    props = {r["key"] for r in
             spark.sql("SHOW TBLPROPERTIES ddl7.bk").collect()}
    assert "clickhouse_arrow_spark.engine" in props
    # named-disk forms refuse with the File recipe
    with _pt.raises(QueryError, match="File"):
        client.execute_ch(
            "BACKUP TABLE ddl7.bk TO Disk('backups', 'x.zip')"
        )
    spark.sql("DROP TABLE IF EXISTS ddl7.bk")


def test_truncate_all_tables(client, spark):
    client.execute_ch("CREATE DATABASE IF NOT EXISTS truncdb")
    client.execute_ch("DROP TABLE IF EXISTS truncdb.a")
    client.execute_ch("DROP TABLE IF EXISTS truncdb.b")
    client.execute_ch("CREATE TABLE truncdb.a (k Int64) ENGINE = MergeTree() ORDER BY k")
    client.execute_ch("CREATE TABLE truncdb.b (k Int64) ENGINE = MergeTree() ORDER BY k")
    client.execute_ch("INSERT INTO truncdb.a VALUES (1)")
    client.execute_ch("INSERT INTO truncdb.b VALUES (2), (3)")
    client.execute_ch("TRUNCATE ALL TABLES FROM truncdb")
    assert spark.table("truncdb.a").count() == 0
    assert spark.table("truncdb.b").count() == 0
    client.execute_ch("DROP TABLE truncdb.a")
    client.execute_ch("DROP TABLE truncdb.b")
    client.execute_ch("DROP DATABASE truncdb")


def test_undrop_table_roundtrip(client, spark):
    """Round 8: DROP TABLE moves data to the trash window; UNDROP
    restores rows, engine props, and partitions; double-UNDROP
    refuses (ddl.drop_table_to_trash / ddl.undrop_table)."""
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS ddl8")
    spark.sql("DROP TABLE IF EXISTS ddl8.ud")
    client.execute_ch(
        "CREATE TABLE ddl8.ud (k Int64, region String) "
        "ENGINE = MergeTree PARTITION BY region ORDER BY k"
    )
    client.insert(
        "ddl8.ud",
        spark.createDataFrame(
            [(1, "eu"), (2, "us")], "k BIGINT, region STRING"
        ),
    )
    client.execute_ch("DROP TABLE ddl8.ud")
    assert not spark.catalog.tableExists("ddl8.ud")
    client.execute_ch("UNDROP TABLE ddl8.ud")
    got = sorted((r.k, r.region) for r in spark.table("ddl8.ud").collect())
    assert got == [(1, "eu"), (2, "us")]
    props = {r["key"] for r in
             spark.sql("SHOW TBLPROPERTIES ddl8.ud").collect()}
    assert "clickhouse_arrow_spark.engine" in props
    with _pt.raises(SchemaError, match="no dropped table"):
        client.execute_ch("UNDROP TABLE ddl8.ud")
    client.execute_ch("DROP TABLE ddl8.ud SYNC")


def test_undrop_latest_drop_wins(client, spark):
    """Dropping the same name twice: UNDROP restores the MOST RECENT
    incarnation (the pointer is overwritten per drop)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl8")
    spark.sql("DROP TABLE IF EXISTS ddl8.tw")
    client.execute_ch(
        "CREATE TABLE ddl8.tw (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch("INSERT INTO ddl8.tw VALUES (1)")
    client.execute_ch("DROP TABLE ddl8.tw")
    client.execute_ch(
        "CREATE TABLE ddl8.tw (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch("INSERT INTO ddl8.tw VALUES (2), (3)")
    client.execute_ch("DROP TABLE ddl8.tw")
    client.execute_ch("UNDROP TABLE ddl8.tw")
    assert {r.k for r in spark.table("ddl8.tw").collect()} == {2, 3}
    client.execute_ch("DROP TABLE ddl8.tw SYNC")


def test_drop_sync_and_zero_retention_skip_trash(client, spark):
    """DROP ... SYNC and retention=0 both bypass the trash — the data
    is gone immediately and UNDROP refuses."""
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS ddl8")
    for probe in ("sync_probe", "zero_probe"):
        spark.sql(f"DROP TABLE IF EXISTS ddl8.{probe}")
        client.execute_ch(
            f"CREATE TABLE ddl8.{probe} (k Int64) "
            "ENGINE = MergeTree ORDER BY k"
        )
    client.execute_ch("DROP TABLE ddl8.sync_probe SYNC")
    with _pt.raises(SchemaError, match="no dropped table"):
        client.execute_ch("UNDROP TABLE ddl8.sync_probe")
    conf = ("spark.clickhouse_arrow_spark.setting."
            "database_atomic_delay_before_drop_table_sec")
    spark.conf.set(conf, "0")
    try:
        client.execute_ch("DROP TABLE ddl8.zero_probe")
        with _pt.raises(SchemaError, match="no dropped table"):
            client.execute_ch("UNDROP TABLE ddl8.zero_probe")
    finally:
        spark.conf.unset(conf)


def test_undrop_retention_sweep(client, spark):
    """An expired drop is swept (files deleted) and UNDROP refuses;
    the retention knob is honored through SET."""
    import pytest as _pt

    from clickhouse_arrow_spark.ddl import sweep_dropped_tables
    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS ddl8")
    spark.sql("DROP TABLE IF EXISTS ddl8.sw")
    client.execute_ch(
        "CREATE TABLE ddl8.sw (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch("INSERT INTO ddl8.sw VALUES (1)")
    client.execute_ch("DROP TABLE ddl8.sw")
    conf = ("spark.clickhouse_arrow_spark.setting."
            "database_atomic_delay_before_drop_table_sec")
    # window elapsed: UNDROP refuses even before the sweep runs
    spark.conf.set(conf, "-1")
    try:
        with _pt.raises(SchemaError, match="retention"):
            client.execute_ch("UNDROP TABLE ddl8.sw")
        assert sweep_dropped_tables(spark, "ddl8") >= 1
        with _pt.raises(SchemaError, match="no dropped table|swept"):
            client.execute_ch("UNDROP TABLE ddl8.sw")
    finally:
        spark.conf.unset(conf)


def test_undrop_keeps_detached_partitions_attachable(client, spark):
    """A partition detached BEFORE the table is dropped lives beside
    the table dir, outside the trash move — after UNDROP it must still
    ATTACH."""
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl8")
    spark.sql("DROP TABLE IF EXISTS ddl8.dp")
    client.execute_ch(
        "CREATE TABLE ddl8.dp (k Int64, region String) "
        "ENGINE = MergeTree PARTITION BY region ORDER BY k"
    )
    client.insert(
        "ddl8.dp",
        spark.createDataFrame(
            [(1, "eu"), (2, "us")], "k BIGINT, region STRING"
        ),
    )
    client.execute_ch("ALTER TABLE ddl8.dp DETACH PARTITION 'eu'")
    client.execute_ch("DROP TABLE ddl8.dp")
    client.execute_ch("UNDROP TABLE ddl8.dp")
    assert {r.k for r in spark.table("ddl8.dp").collect()} == {2}
    client.execute_ch("ALTER TABLE ddl8.dp ATTACH PARTITION 'eu'")
    assert {r.k for r in spark.table("ddl8.dp").collect()} == {1, 2}
    client.execute_ch("DROP TABLE ddl8.dp SYNC")


def test_system_dropped_and_detached_tables(spark, client):
    """Round 8: system.dropped_tables / system.detached_tables expose
    the trash-dir and detach inventories the UNDROP/ATTACH machinery
    maintains, and rows disappear on restore."""
    spark.sql("CREATE DATABASE IF NOT EXISTS ops8")
    for t in ("ops8.sd", "ops8.sdet"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    client.execute_ch(
        "CREATE TABLE ops8.sd (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch("INSERT INTO ops8.sd VALUES (1), (2)")
    client.execute_ch(
        "CREATE TABLE ops8.sdet (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch("INSERT INTO ops8.sdet VALUES (7)")

    client.execute_ch("DROP TABLE ops8.sd")
    rows = client.query_ch(
        "SELECT database, table, metadata_dropped_path "
        "FROM system.dropped_tables WHERE database = 'ops8'"
    ).collect()
    assert any(r.table == "sd" for r in rows)
    assert all(".dropped" in r.metadata_dropped_path for r in rows)

    client.execute_ch("DETACH TABLE ops8.sdet")
    det = client.query_ch(
        "SELECT database, table, is_permanently "
        "FROM system.detached_tables WHERE database = 'ops8'"
    ).collect()
    assert any(r.table == "sdet" and r.is_permanently is False
               for r in det)

    # restores empty both inventories for this db
    client.execute_ch("UNDROP TABLE ops8.sd")
    assert {r.k for r in spark.table("ops8.sd").collect()} == {1, 2}
    client.execute_ch("ATTACH TABLE ops8.sdet")
    assert spark.table("ops8.sdet").count() == 1
    left = client.query_ch(
        "SELECT table FROM system.dropped_tables "
        "WHERE database = 'ops8' "
        "UNION ALL SELECT table FROM system.detached_tables "
        "WHERE database = 'ops8'"
    ).collect()
    assert left == []
    for t in ("ops8.sd", "ops8.sdet"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_system_detached_parts(spark, client):
    """Round 8: system.detached_parts lists DETACH PARTITION
    directories awaiting ATTACH; rows disappear on re-attach."""
    spark.sql("CREATE DATABASE IF NOT EXISTS ops8")
    spark.sql("DROP TABLE IF EXISTS ops8.dp")
    client.execute_ch(
        "CREATE TABLE ops8.dp (k Int64, region String) "
        "ENGINE = MergeTree ORDER BY k PARTITION BY region"
    )
    client.execute_ch(
        "INSERT INTO ops8.dp VALUES (1, 'eu'), (2, 'us')"
    )
    client.execute_ch("ALTER TABLE ops8.dp DETACH PARTITION 'eu'")
    rows = client.query_ch(
        "SELECT database, table, partition_id, name, bytes_on_disk "
        "FROM system.detached_parts WHERE database = 'ops8'"
    ).collect()
    assert len(rows) == 1
    assert rows[0].table == "dp" and rows[0].partition_id == "eu"
    assert rows[0].name == "region=eu" and rows[0].bytes_on_disk > 0
    client.execute_ch("ALTER TABLE ops8.dp ATTACH PARTITION 'eu'")
    assert client.query_ch(
        "SELECT count() AS n FROM system.detached_parts "
        "WHERE database = 'ops8'"
    ).collect()[0].n == 0
    assert spark.table("ops8.dp").count() == 2
    spark.sql("DROP TABLE IF EXISTS ops8.dp")
