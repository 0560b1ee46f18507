"""DDL storage semantics (ORDER BY sort-on-write, TTL retention job,
partitioned tables) and the ClickHouse-settings shim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_arrow_spark.client import Client
from clickhouse_arrow_spark.ddl import CreateOptions, apply_ttl, create_table_ddl, sort_for_write
from clickhouse_arrow_spark.settings import settings_scope, translate_setting


def test_ddl_emits_properties():
    ddl = create_table_ddl(
        "default",
        "t_props",
        [("id", "Int64"), ("ts", "DateTime64(6)"), ("v", "Nullable(Float64)")],
        CreateOptions(
            engine="MergeTree",
            order_by=("id",),
            primary_keys=("id",),
            ttl="ts + INTERVAL 30 DAY",
            settings={"index_granularity": "8192"},
        ),
    )
    assert "USING PARQUET" in ddl
    assert "'clickhouse_arrow_spark.engine' = 'MergeTree'" in ddl
    assert "'clickhouse_arrow_spark.order_by' = 'id'" in ddl
    assert "'clickhouse_arrow_spark.ttl' = 'ts + INTERVAL 30 DAY'" in ddl
    assert "'clickhouse_arrow_spark.setting.index_granularity' = '8192'" in ddl
    assert "`v` double" in ddl and "`id` bigint NOT NULL" in ddl


def test_partitioned_table_ddl(client):
    client.execute("DROP TABLE IF EXISTS default.t_part")
    ddl = client.create_table(
        "default",
        "t_part",
        [("id", "Int64"), ("bucket", "Int32")],
        CreateOptions(partition_by="bucket"),
    )
    assert "PARTITIONED BY (bucket)" in ddl
    src = client.spark.createDataFrame(
        [(1, 0), (2, 1), (3, 0)], "id long, bucket int"
    )
    client.insert("default.t_part", src)
    # partition pruning: reading one bucket touches one partition dir
    one = client.spark.table("default.t_part").where(F.col("bucket") == 0)
    assert one.count() == 2
    files = one.inputFiles()
    assert all("bucket=0" in f for f in files)
    client.execute("DROP TABLE default.t_part")


def test_sort_for_write_clusters(spark):
    df = spark.range(1000).select(
        (999 - F.col("id")).alias("k"), F.col("id").alias("v")
    )
    out = sort_for_write(df, CreateOptions(order_by=("k",)))
    # within every partition, k must be non-decreasing
    from pyspark.sql import Window

    w = Window.partitionBy(F.spark_partition_id()).orderBy(F.monotonically_increasing_id())
    bad = (
        out.withColumn("prev", F.lag("k").over(w))
        .where(F.col("prev").isNotNull() & (F.col("k") < F.col("prev")))
        .count()
    )
    assert bad == 0


def test_apply_ttl_deletes_expired(client, spark):
    client.execute("DROP TABLE IF EXISTS default.t_ttl")
    client.create_table(
        "default",
        "t_ttl",
        [("id", "Int64"), ("ts", "DateTime64(6)")],
        CreateOptions(ttl="ts + INTERVAL 1 DAY"),
    )
    client.execute(
        """
        INSERT INTO default.t_ttl VALUES
          (1, timestamp'2000-01-01 00:00:00'),
          (2, current_timestamp())
        """
    )
    survivors = apply_ttl(spark, "default.t_ttl")
    assert survivors == 1
    rows = spark.table("default.t_ttl").collect()
    assert [r["id"] for r in rows] == [2]
    client.execute("DROP TABLE default.t_ttl")


def test_apply_ttl_no_ttl_property(client, spark):
    client.execute("DROP TABLE IF EXISTS default.t_nottl")
    client.create_table("default", "t_nottl", [("id", "Int64")])
    assert apply_ttl(spark, "default.t_nottl") == -1
    client.execute("DROP TABLE default.t_nottl")


def test_settings_translation():
    assert translate_setting("max_threads", 16) == (
        "spark.sql.shuffle.partitions", "16"
    )
    conf, v = translate_setting("network_compression_method", "lz4")
    assert (conf, v) == ("spark.sql.parquet.compression.codec", "lz4")
    conf, v = translate_setting("totally_unknown_setting", "x")
    assert conf.startswith("spark.clickhouse_arrow_spark.setting.")


def test_settings_scope_restores(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with settings_scope(spark, {"max_threads": 4}):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_progress_snapshot(client):
    qid = "test-progress-qid"
    df = client.query("SELECT count(*) AS n FROM lineitem", qid=qid)
    df.collect()
    p = client.progress(qid)
    assert p["total_tasks"] >= 1
    assert p["completed_tasks"] >= 1
    assert p["jobs"], "job group produced no tracked jobs"


def test_write_table_bloom_filters(spark, tmp_path):
    import glob
    import os

    from clickhouse_arrow_spark.ddl import write_table

    # high-cardinality column: parquet only writes a bloom when the
    # column isn't fully dictionary-encoded (the dictionary itself acts
    # as the filter otherwise)
    df = spark.range(200_000).selectExpr("id", "concat('user_', id) AS user")
    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloomed")
    write_table(df.coalesce(1), plain, CreateOptions())
    write_table(
        df.coalesce(1),
        bloomed,
        CreateOptions(bloom_filter_cols=("user",), bloom_filter_ndv=200_000),
    )
    size = lambda p: sum(
        os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet")
    )
    # bloom filter bytes are actually present in the file
    assert size(bloomed) > size(plain) + 1000
    # and content identical
    assert (
        spark.read.parquet(bloomed).exceptAll(spark.read.parquet(plain)).count() == 0
    )


def test_write_table_order_and_partition(spark, tmp_path):
    import glob

    from clickhouse_arrow_spark.ddl import write_table

    df = spark.range(1000).selectExpr("id", "CAST(id % 4 AS INT) AS bucket")
    path = str(tmp_path / "laid_out")
    write_table(df, path, CreateOptions(order_by=("id",), partition_by="bucket"))
    assert len(glob.glob(f"{path}/bucket=*")) == 4
    assert spark.read.parquet(path).count() == 1000


# ---------------------------------------------------------------------------
# round 6: MATERIALIZED columns, DROP PARTITION, MODIFY COMMENT/ORDER BY
# ---------------------------------------------------------------------------


def test_materialized_column_computed_on_insert(spark, client):
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl6")
    spark.sql("DROP TABLE IF EXISTS ddl6.m")
    client.execute_ch(
        "CREATE TABLE ddl6.m (k Int64, doubled Int64 MATERIALIZED k * 2, "
        "label String DEFAULT concat('k=', toString(k))) "
        "ENGINE = MergeTree ORDER BY k"
    )
    client.insert(
        "ddl6.m", spark.createDataFrame([(1,), (5,)], "k BIGINT")
    )
    rows = {r["k"]: (r["doubled"], r["label"])
            for r in spark.table("ddl6.m").collect()}
    assert rows == {1: (2, "k=1"), 5: (10, "k=5")}
    # SQL INSERT SELECT path computes them too
    client.execute_ch("INSERT INTO ddl6.m (k) SELECT 7")
    assert {r["k"]: r["doubled"] for r in spark.table("ddl6.m").collect()}[7] == 14
    spark.sql("DROP TABLE IF EXISTS ddl6.m")


def test_drop_partition_physical(spark, client):
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl6")
    spark.sql("DROP TABLE IF EXISTS ddl6.p")
    client.execute_ch(
        "CREATE TABLE ddl6.p (k Int64, region String) "
        "ENGINE = MergeTree PARTITION BY region ORDER BY k"
    )
    client.insert(
        "ddl6.p",
        spark.createDataFrame(
            [(1, "eu"), (2, "eu"), (3, "us")], "k BIGINT, region STRING"
        ),
    )
    client.execute_ch("ALTER TABLE ddl6.p DROP PARTITION 'eu'")
    assert {r["k"] for r in spark.table("ddl6.p").collect()} == {3}
    spark.sql("DROP TABLE IF EXISTS ddl6.p")


def test_drop_partition_expression(spark, client):
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl6")
    spark.sql("DROP TABLE IF EXISTS ddl6.pe")
    client.execute_ch(
        "CREATE TABLE ddl6.pe (d Date, v Int64) "
        "ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY d"
    )
    client.insert(
        "ddl6.pe",
        spark.createDataFrame(
            [("2024-01-05", 1), ("2024-01-20", 2), ("2024-02-01", 3)],
            "d STRING, v BIGINT",
        ).selectExpr("CAST(d AS DATE) AS d", "v"),
    )
    client.execute_ch("ALTER TABLE ddl6.pe DROP PARTITION 202401")
    assert [r["v"] for r in spark.table("ddl6.pe").collect()] == [3]
    spark.sql("DROP TABLE IF EXISTS ddl6.pe")


def test_modify_comment_and_order_by(spark, client):
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl6")
    spark.sql("DROP TABLE IF EXISTS ddl6.c")
    client.execute_ch(
        "CREATE TABLE ddl6.c (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch("ALTER TABLE ddl6.c MODIFY COMMENT 'hello world'")
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED ddl6.c").collect()
    }
    assert desc.get("Comment") == "hello world"
    client.execute_ch("ALTER TABLE ddl6.c MODIFY ORDER BY (k)")
    props = {
        r["key"]: r["value"]
        for r in spark.sql("SHOW TBLPROPERTIES ddl6.c").collect()
    }
    assert props["clickhouse_arrow_spark.order_by"] == "k"
    spark.sql("DROP TABLE IF EXISTS ddl6.c")


def test_kafka_engine_creates_ingest_endpoint(spark, client):
    """Round 8: ENGINE = Kafka is a real ingest endpoint — CREATE
    records the broker config for streaming/ingest.start_ingest;
    kafka_topic_list rides the settings channel into table props."""
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl6")
    spark.sql("DROP TABLE IF EXISTS ddl6.k")
    client.execute_ch(
        "CREATE TABLE ddl6.k (k Int64) ENGINE = Kafka "
        "SETTINGS kafka_broker_list = 'b:9092', "
        "kafka_topic_list = 'events'"
    )
    props = {
        r["key"]: r["value"]
        for r in spark.sql("SHOW TBLPROPERTIES ddl6.k").collect()
    }
    assert props["clickhouse_arrow_spark.engine"] == "Kafka"
    assert props[
        "clickhouse_arrow_spark.setting.kafka_broker_list"
    ] == "b:9092"
    spark.sql("DROP TABLE IF EXISTS ddl6.k")


def test_ephemeral_column_feeds_materialized(spark, client):
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl6")
    spark.sql("DROP TABLE IF EXISTS ddl6.e")
    client.execute_ch(
        "CREATE TABLE ddl6.e (k Int64, raw String EPHEMERAL, "
        "h Int64 MATERIALIZED length(raw)) ENGINE = MergeTree ORDER BY k"
    )
    # ephemeral column is NOT stored
    assert spark.table("ddl6.e").columns == ["k", "h"]
    # the insert block carries it; h computes from it, raw drops
    client.insert(
        "ddl6.e",
        spark.createDataFrame([(1, "abc"), (2, "hello")],
                              "k BIGINT, raw STRING"),
    )
    assert {r["k"]: r["h"] for r in spark.table("ddl6.e").collect()} \
        == {1: 3, 2: 5}
    spark.sql("DROP TABLE IF EXISTS ddl6.e")


def test_null_engine_feeds_mv_discards_rows(client, spark):
    # CH's ingest-through-Null pattern: the Null table discards every
    # block but attached MVs still see it
    client.execute_ch("CREATE DATABASE IF NOT EXISTS nulldb")
    try:
        client.execute_ch(
            "CREATE TABLE nulldb.ingest (id UInt64, v Float64) ENGINE = Null"
        )
        client.execute_ch(
            "CREATE TABLE nulldb.sums (id UInt64, s Float64) "
            "ENGINE = SummingMergeTree ORDER BY id"
        )
        client.execute_ch(
            "CREATE MATERIALIZED VIEW nulldb.mv TO nulldb.sums AS "
            "SELECT id, sum(v) AS s FROM nulldb.ingest GROUP BY id"
        )
        client.execute_ch(
            "INSERT INTO nulldb.ingest VALUES (1, 2.5), (1, 2.5), (2, 1.0)"
        )
        assert spark.table("nulldb.ingest").count() == 0
        got = {
            int(r.id): r.s
            for r in spark.sql(
                "SELECT id, sum(s) AS s FROM nulldb.sums GROUP BY id"
            ).collect()
        }
        assert got == {1: 5.0, 2: 1.0}
    finally:
        for t in ("nulldb.mv", "nulldb.ingest", "nulldb.sums"):
            client.execute_ch(f"DROP TABLE IF EXISTS {t}")
        client.execute_ch("DROP DATABASE IF EXISTS nulldb")


def test_create_temporary_table(client, spark):
    client.execute_ch("CREATE DATABASE IF NOT EXISTS tmpdb")
    try:
        client.execute_ch("CREATE TEMPORARY TABLE tmpdb.scratch (id UInt64)")
        client.execute_ch("INSERT INTO tmpdb.scratch VALUES (1), (2)")
        assert spark.table("tmpdb.scratch").count() == 2
    finally:
        client.execute_ch("DROP TABLE IF EXISTS tmpdb.scratch")
        client.execute_ch("DROP DATABASE IF EXISTS tmpdb")


def test_buffer_engine_flushes_through(client, spark):
    # CH Buffer: writes flush to the destination, reads through the
    # buffer name surface them (flushing is eager here, so the buffer
    # is a view over the destination); DROP TABLE works despite the
    # view-backed implementation
    client.execute_ch("CREATE DATABASE IF NOT EXISTS bufdb")
    try:
        client.execute_ch(
            "CREATE TABLE bufdb.dst (id UInt64, v Float64) "
            "ENGINE = MergeTree ORDER BY id"
        )
        client.execute_ch(
            "CREATE TABLE bufdb.buf (id UInt64, v Float64) ENGINE = "
            "Buffer(bufdb, dst, 16, 10, 100, 10000, 1000000, 10000000, "
            "100000000)"
        )
        client.execute_ch("INSERT INTO bufdb.buf VALUES (1, 2.0), (2, 3.0)")
        assert spark.table("bufdb.dst").count() == 2
        got = sorted(
            int(r.id)
            for r in client.query_ch("SELECT id FROM bufdb.buf").collect()
        )
        assert got == [1, 2]
    finally:
        client.execute_ch("DROP TABLE IF EXISTS bufdb.buf")
        client.execute_ch("DROP TABLE IF EXISTS bufdb.dst")
        client.execute_ch("DROP DATABASE IF EXISTS bufdb")


def test_optimize_deduplicate(client, spark):
    client.execute_ch("CREATE DATABASE IF NOT EXISTS dedb")
    try:
        client.execute_ch(
            "CREATE TABLE dedb.t (id UInt64, v String) "
            "ENGINE = MergeTree ORDER BY id"
        )
        client.execute_ch(
            "INSERT INTO dedb.t VALUES (1,'a'), (1,'a'), (2,'b'), (2,'c')"
        )
        # full-row dedup keeps (2,'b') and (2,'c') apart
        assert client.execute_ch("OPTIMIZE TABLE dedb.t DEDUPLICATE") == 3
        # BY id keeps one row per key
        assert (
            client.execute_ch("OPTIMIZE TABLE dedb.t FINAL DEDUPLICATE BY id")
            == 2
        )
    finally:
        client.execute_ch("DROP TABLE IF EXISTS dedb.t")
        client.execute_ch("DROP DATABASE IF EXISTS dedb")


def test_system_pause_verbs_and_acl(client):
    import warnings

    import pytest as _pytest

    from clickhouse_arrow_spark.errors import QueryError

    # no background merges to pause: accepted no-ops
    for s in ("SYSTEM STOP MERGES", "SYSTEM START MERGES",
              "SYSTEM STOP TTL MERGES", "SYSTEM START FETCHES"):
        assert client.execute_ch(s) is None
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        client.execute_ch("GRANT SELECT ON *.* TO alice")
        assert any("no ACL" in str(x.message) for x in w)
    with _pytest.raises(QueryError, match="ACL"):
        client.execute_ch("REVOKE SELECT ON *.* FROM alice")


def _parquet_bytes(spark, table):
    import glob as _glob
    import os as _os

    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .where("col_name = 'Location'")
        .collect()[0][1]
        .replace("file:", "")
    )
    return sum(
        _os.path.getsize(p)
        for p in _glob.glob(_os.path.join(loc, "*.parquet"))
    )


def test_add_index_bloom_filter_applies_on_insert(spark, client):
    """Round 8: ALTER TABLE ADD INDEX ... TYPE bloom_filter records a
    skip index; client inserts write parquet bloom filters for it
    (visible as extra file bytes vs the same data without the index);
    MATERIALIZE INDEX backfills existing files; DROP INDEX removes."""
    import pytest as _pt

    from clickhouse_arrow_spark.errors import SchemaError

    spark.sql("CREATE DATABASE IF NOT EXISTS ddl6")
    for t in ("ddl6.nb", "ddl6.wb"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        client.execute_ch(
            f"CREATE TABLE {t} (u String) ENGINE = MergeTree ORDER BY u"
        )
    df = spark.range(0, 120000, 1, 1).selectExpr(
        "concat('user_', id) AS u"
    )
    client.insert("ddl6.nb", df)
    client.execute_ch(
        "ALTER TABLE ddl6.wb ADD INDEX u_idx u TYPE bloom_filter "
        "GRANULARITY 4"
    )
    client.insert("ddl6.wb", df)
    assert _parquet_bytes(spark, "ddl6.wb") > \
        _parquet_bytes(spark, "ddl6.nb") + 10_000
    # backfill path: add the index to the no-bloom table, MATERIALIZE
    client.execute_ch(
        "ALTER TABLE ddl6.nb ADD INDEX u_idx u TYPE bloom_filter"
    )
    before = _parquet_bytes(spark, "ddl6.nb")
    client.execute_ch("ALTER TABLE ddl6.nb MATERIALIZE INDEX u_idx")
    assert _parquet_bytes(spark, "ddl6.nb") > before + 10_000
    assert spark.table("ddl6.nb").count() == 120000
    # unsupported index types refuse with the supported set named
    with _pt.raises(SchemaError, match="bloom_filter"):
        client.execute_ch(
            "ALTER TABLE ddl6.nb ADD INDEX t_idx u TYPE tokenbf_v1"
        )
    # minmax is parquet stats — accepted as metadata
    client.execute_ch(
        "ALTER TABLE ddl6.nb ADD INDEX mm_idx u TYPE minmax"
    )
    client.execute_ch("ALTER TABLE ddl6.nb DROP INDEX u_idx")
    with _pt.raises(SchemaError, match="no index"):
        client.execute_ch("ALTER TABLE ddl6.nb DROP INDEX ghost")
    for t in ("ddl6.nb", "ddl6.wb"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_modify_query_repoints_materialized_view(spark, client):
    """Round 8: ALTER TABLE mv MODIFY QUERY SELECT ... re-points the
    trigger query — subsequent inserts run the NEW transformation."""
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl6")
    for t in ("ddl6.src_mq", "ddl6.tgt_mq"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    client.execute_ch(
        "CREATE TABLE ddl6.src_mq (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch(
        "CREATE TABLE ddl6.tgt_mq (k Int64) ENGINE = MergeTree ORDER BY k"
    )
    client.execute_ch(
        "CREATE MATERIALIZED VIEW ddl6.mv_mq TO ddl6.tgt_mq AS "
        "SELECT k FROM ddl6.src_mq WHERE k % 2 = 0"
    )
    client.execute_ch("INSERT INTO ddl6.src_mq VALUES (1), (2)")
    assert {r.k for r in spark.table("ddl6.tgt_mq").collect()} == {2}
    # NOTE the alias-reuse trap: WHERE in the new query would see the
    # ALIASED k (CH semantics) — redefine without a filter
    client.execute_ch(
        "ALTER TABLE ddl6.tgt_mq MODIFY QUERY "
        "SELECT k * 10 AS k FROM ddl6.src_mq"
    )
    client.execute_ch("INSERT INTO ddl6.src_mq VALUES (3), (4)")
    assert {r.k for r in spark.table("ddl6.tgt_mq").collect()} \
        == {2, 30, 40}
    for t in ("ddl6.mv_mq", "ddl6.src_mq", "ddl6.tgt_mq"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
