"""remote() / remoteSecure() / cluster() table functions (round-9
VERDICT item #1): textual TVFs over the HTTP ArrowStream DSv2 path.

Reference: clickhouse-arrow reaches other servers through its
connection machinery (src/client.rs:213-256, src/http/client.rs:22-244);
here each shard address is one read_remote scan against the localhost
ClickHouse-HTTP stub, shards UNION ALL, and cluster() folds to the
local table (Spark IS the cluster)."""

from __future__ import annotations

import pytest

from clickhouse_arrow_spark.dialect import UntranslatableFunctionError
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def http_stub(spark):
    from clickhouse_arrow_spark.sources.dsv2 import ClickHouseDataSource
    from tests.http_stub import ArrowHttpStub

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ClickHouseDataSource)
    stub = ArrowHttpStub(
        {
            "nation": f"{SF_DIR}/nation.parquet",
            "region": f"{SF_DIR}/region.parquet",
        }
    )
    url = stub.start()
    yield stub, url
    stub.stop()


def _hostport(url: str) -> str:
    return url.split("://", 1)[1].rstrip("/")


def test_remote_scans_http_endpoint(client, http_stub):
    _stub, url = http_stub
    hp = _hostport(url)
    df = client.query_ch(
        f"SELECT count() AS n FROM remote('{hp}', default.nation)"
    )
    want = client.spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    assert df.collect()[0]["n"] == want


def test_remote_db_table_and_filter(client, http_stub):
    _stub, url = http_stub
    hp = _hostport(url)
    df = client.query_ch(
        f"SELECT n_name FROM remote('{hp}', default, nation) "
        "WHERE n_regionkey = 1 ORDER BY n_name"
    )
    want = [
        r["n_name"]
        for r in client.spark.read.parquet(f"{SF_DIR}/nation.parquet")
        .where("n_regionkey = 1")
        .orderBy("n_name")
        .collect()
    ]
    assert [r["n_name"] for r in df.collect()] == want


def test_remote_shard_union(client, http_stub):
    # comma-separated addresses are SHARDS: the scan unions them
    _stub, url = http_stub
    hp = _hostport(url)
    df = client.query_ch(
        f"SELECT count() AS n FROM remote('{hp},{hp}', default.region)"
    )
    want = client.spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    assert df.collect()[0]["n"] == 2 * want


def test_remote_replica_alternation_first(client, http_stub):
    # {a|b} replicas: the first is used — one shard, not two
    _stub, url = http_stub
    hp = _hostport(url)
    host, port = hp.rsplit(":", 1)
    df = client.query_ch(
        "SELECT count() AS n FROM "
        f"remote('{host}:{{{port}|59999}}', default.region)"
    )
    want = client.spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    assert df.collect()[0]["n"] == want


def test_remote_native_port_refused(client):
    with pytest.raises(UntranslatableFunctionError, match="8123"):
        client.query_ch(
            "SELECT * FROM remote('somehost:9000', db.t)"
        )
    with pytest.raises(UntranslatableFunctionError, match="8443"):
        client.query_ch(
            "SELECT * FROM remoteSecure('somehost:9440', db.t)"
        )


def test_remote_needs_string_addresses(client):
    with pytest.raises(UntranslatableFunctionError, match="string"):
        client.query_ch("SELECT * FROM remote(hostvar, db.t)")


def test_cluster_folds_to_local_table(client, tables):
    # Spark IS the cluster: cluster('default', nation) == nation
    a = client.query_ch(
        "SELECT count() AS n FROM cluster('default', nation)"
    ).collect()[0]["n"]
    b = client.query_ch(
        "SELECT count() AS n FROM clusterAllReplicas('default', nation)"
    ).collect()[0]["n"]
    want = client.spark.table("nation").count()
    assert a == want and b == want


def test_cluster_db_table_form(client, spark):
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS rtvf")
    spark.sql("DROP TABLE IF EXISTS rtvf.t1")
    # a prior session's orphaned managed-table dir blocks saveAsTable
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/rtvf.db/t1", ignore_errors=True)
    spark.range(0, 7).write.saveAsTable("rtvf.t1")
    n = client.query_ch(
        "SELECT count() AS n FROM cluster('default', rtvf, t1)"
    ).collect()[0]["n"]
    n2 = client.query_ch(
        "SELECT count() AS n FROM cluster('default', rtvf.t1)"
    ).collect()[0]["n"]
    assert n == 7 and n2 == 7


def test_remote_join_with_local_table(client, http_stub, tables):
    # the registered view composes with local tables in one statement
    _stub, url = http_stub
    hp = _hostport(url)
    df = client.query_ch(
        "SELECT r.r_name, count() AS n "
        f"FROM remote('{hp}', default.nation) AS nn "
        "JOIN region AS r ON nn.n_regionkey = r.r_regionkey "
        "GROUP BY r.r_name ORDER BY r.r_name"
    )
    rows = df.collect()
    assert len(rows) == 5 and all(r["n"] == 5 for r in rows)


def test_remote_in_insert_select(client, spark, http_stub):
    # r9 fix: INSERT INTO t SELECT ... FROM remote(...) routes the
    # source query through the FULL query_ch pre-pass chain (TVF
    # expansion previously leaked the raw remote() to Spark)
    import shutil

    _stub, url = http_stub
    hp = _hostport(url)
    spark.sql("DROP TABLE IF EXISTS rtvf_ins")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/rtvf_ins", ignore_errors=True)
    client.execute_ch(
        "CREATE TABLE rtvf_ins (n_nationkey Int64, n_name String) "
        "ENGINE = MergeTree ORDER BY n_nationkey"
    )
    client.execute_ch(
        "INSERT INTO rtvf_ins SELECT n_nationkey, n_name "
        f"FROM remote('{hp}', default.nation) WHERE n_regionkey = 0"
    )
    want = (
        client.spark.read.parquet(f"{SF_DIR}/nation.parquet")
        .where("n_regionkey = 0").count()
    )
    assert spark.table("rtvf_ins").count() == want
    spark.sql("DROP TABLE IF EXISTS rtvf_ins")
