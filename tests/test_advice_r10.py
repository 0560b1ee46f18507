"""Round-10 regression battery for the round-9 ADVICE.md findings:

1. remote('h','db','table','user','pass') — the quoted db,table form:
   a dotless second argument followed by a NAME-shAPED third is
   (db, table) regardless of quoting (CH's rule); previously the two
   consecutive quoted args were misread as db.table-form credentials,
   so table='db', user='table', password='user'.
2. remote('h', db.table, rand()) — a trailing NON-STRING expression is
   the sharding key (accepted, ignored), never a credential;
   previously it became X-ClickHouse-User 'rand()'.
3. toTypeName's container rewrite is word-boundary anchored: struct
   FIELD NAMES containing a type token (mint, interval day to second)
   are no longer corrupted into 'mInt32' / 'Int32erval'.
4. exponentialTimeDecayed* / exponentialMovingAverage anchor at the
   per-partition MAX so the factored windowed sum can never overflow
   double — long-span partitions (span > ~709x) previously returned
   inf/NaN for every late row (long-span pins live in
   test_exp_decay.py; the gate oracle is now definition-level).
"""

from __future__ import annotations

import math

from clickhouse_arrow_spark.client import Client


def _one(client, sql):
    return client.query_ch(sql).collect()[0]


# ---- 1+2. remote() argument classification --------------------------

def test_remote_quoted_db_table_creds():
    addr, db, table, user, pw = Client._remote_tvf_parse(
        ["'h:8123'", "'db'", "'tbl'", "'u'", "'p'"], "remote"
    )
    assert (db, table, user, pw) == ("db", "tbl", "u", "p")


def test_remote_quoted_db_table_no_creds():
    _, db, table, user, pw = Client._remote_tvf_parse(
        ["'h:8123'", "'db'", "'tbl'"], "remote"
    )
    assert (db, table, user, pw) == ("db", "tbl", None, None)


def test_remote_mixed_quoting_db_table():
    _, db, table, user, pw = Client._remote_tvf_parse(
        ["'h:8123'", "'db'", "tbl", "'u'"], "remote"
    )
    assert (db, table, user) == ("db", "tbl", "u")
    _, db, table, user, pw = Client._remote_tvf_parse(
        ["'h:8123'", "db", "'tbl'", "'u'", "'p'"], "remote"
    )
    assert (db, table, user, pw) == ("db", "tbl", "u", "p")


def test_remote_dotted_form_unchanged():
    _, db, table, user, pw = Client._remote_tvf_parse(
        ["'h:8123'", "db.tbl", "'u'", "'p'"], "remote"
    )
    assert (db, table, user, pw) == ("db", "tbl", "u", "p")
    _, db, table, user, pw = Client._remote_tvf_parse(
        ["'h:8123'", "'db.tbl'"], "remote"
    )
    assert (db, table, user, pw) == ("db", "tbl", None, None)


def test_remote_bare_table_only():
    _, db, table, user, pw = Client._remote_tvf_parse(
        ["'h:8123'", "tbl"], "remote"
    )
    assert (db, table, user, pw) == (None, "tbl", None, None)


def test_remote_sharding_key_after_db_table():
    # remote('h', db.tbl, rand()): rand() is the sharding key — a
    # Distributed-engine routing hint, ignored here — NOT a user
    _, db, table, user, pw = Client._remote_tvf_parse(
        ["'h:8123'", "db.tbl", "rand()"], "remote"
    )
    assert (db, table, user, pw) == ("db", "tbl", None, None)


def test_remote_sharding_key_after_creds():
    _, db, table, user, pw = Client._remote_tvf_parse(
        ["'h:8123'", "db.tbl", "'u'", "'p'", "rand()"], "remote"
    )
    assert (db, table, user, pw) == ("db", "tbl", "u", "p")


def test_remote_sharding_key_after_bare_table():
    # dotless second + NON-name third: third is the sharding key, the
    # second is the table (default db)
    _, db, table, user, pw = Client._remote_tvf_parse(
        ["'h:8123'", "'tbl'", "cityHash64(id)"], "remote"
    )
    assert (db, table, user, pw) == (None, "tbl", None, None)


# ---- 3. toTypeName word-boundary container rewrite -------------------

def test_totypename_field_name_containing_type_token(client):
    r = _one(
        client,
        "SELECT toTypeName(named_struct('mint', 1, 'prefloat', 'x')) "
        "AS a",
    )
    assert r["a"] == "Tuple(mint Int32, prefloat String)"


def test_totypename_interval_not_corrupted(client):
    r = _one(client, "SELECT toTypeName(INTERVAL 3 DAY) AS a")
    # no CH container spelling for Spark intervals — reported
    # uncorrupted (previously 'Int32erval day...')
    assert "Int32erval" not in r["a"]
    assert r["a"].startswith("interval")


def test_totypename_containers_still_rewritten(client):
    r = _one(
        client,
        "SELECT toTypeName([1, 2]) AS a, "
        "toTypeName(map('k', [1.5])) AS b, "
        "toTypeName((1, 'x')) AS c, "
        "toTypeName(CAST(1.5 AS Decimal(10, 2))) AS d",
    )
    assert r["a"] == "Array(Int32)"
    assert r["b"] == "Map(String, Array(Decimal(2, 1)))"
    assert r["c"] == "Tuple(col1 Int32, col2 String)"
    assert r["d"] == "Decimal(10, 2)"


# ---- 4. exp-decay long-span finiteness (core pin; full battery in
# test_exp_decay.py) ---------------------------------------------------

def test_exp_decay_long_span_last_row(client, spark):
    spark.createDataFrame(
        [(1, 0.0, 7.0), (1, 2000.0, 3.0)], "g INT, t DOUBLE, v DOUBLE"
    ).createOrReplaceTempView("decay_advice_r10")
    rows = client.query_ch(
        "SELECT t, exponentialTimeDecayedSum(1)(v, t) OVER "
        "(PARTITION BY g ORDER BY t) AS ds FROM decay_advice_r10 "
        "ORDER BY t"
    ).collect()
    assert math.isfinite(rows[-1]["ds"])
    assert abs(rows[-1]["ds"] - 3.0) < 1e-12
