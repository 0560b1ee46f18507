"""Probe-sweep wave 22: JSONMergePatch, array Levenshtein, series
Tukey/FFT, toStartOfInterval ORIGIN, snowflake encode, getSubcolumn,
proportionsZTest / mean_z_test, and the kql/prql/STL refusals."""

from __future__ import annotations

import pytest

from clickhouse_arrow_spark.dialect import UntranslatableFunctionError


def one(client, sql):
    return client.query_ch(sql).collect()[0].r


def test_json_merge_patch_semantics(client):
    # RFC 7386: null deletes, nested objects merge, scalars replace
    assert one(client, """SELECT JSONMergePatch(
        '{"a":"b","c":{"d":"e","f":"g"}}',
        '{"a":"z","c":{"d":null}}') AS r""") == '{"a":"z","c":{"f":"g"}}'
    # N-ary fold
    assert one(client, """SELECT JSONMergePatch('{"a":1}', '{"b":2}',
        '{"a":null}') AS r""") == '{"b":2}'
    # invalid JSON raises (CH throws)
    with pytest.raises(Exception, match="invalid JSON"):
        one(client, "SELECT JSONMergePatch('nope', '{}') AS r")


def test_array_levenshtein(client):
    assert one(client, "SELECT arrayLevenshteinDistance([1,2,3,4], "
               "[1,2,3,4]) AS r") == 0
    assert one(client, "SELECT arrayLevenshteinDistance([], "
               "[1,2]) AS r") == 2
    assert one(client, "SELECT arrayLevenshteinDistance(['a','b','c'],"
               " ['b','c','d']) AS r") == 2


def test_series_tukey_scores(client):
    r = one(client, "SELECT seriesOutliersDetectTukey("
            "[-3.0, 2, 15, 3, 5, 6, 4, 5, 12, 45, 12, 3, 3, 4, 5, 6]"
            ") AS r")
    # fences: q1=3, q3=7.5 (linear interp), 1.5*IQR -> [-3.75, 14.25];
    # 15 (score 0.75) and 45 (score 30.75) are beyond
    assert [i for i, v in enumerate(r) if v != 0.0] == [2, 9]
    assert abs(r[2] - 0.75) < 1e-9 and abs(r[9] - 30.75) < 1e-9
    # custom percentiles/k form parses and runs
    r2 = one(client, "SELECT seriesOutliersDetectTukey("
             "[1,2,3,4,5,6,100], 10, 90, 3.0) AS r")
    assert len(r2) == 7
    with pytest.raises(Exception, match="at least 4"):
        one(client, "SELECT seriesOutliersDetectTukey([1,2,3]) AS r")


def test_series_period_fft(client):
    assert one(client, "SELECT seriesPeriodDetectFFT("
               "[1,4,1,4,1,4,1,4,1,4,1,4]) AS r") == 2.0
    assert one(client, "SELECT seriesPeriodDetectFFT("
               "[1,2,3,1,2,3,1,2,3,1,2,3]) AS r") == 3.0
    with pytest.raises(Exception, match="at least 4"):
        one(client, "SELECT seriesPeriodDetectFFT([1,2,3]) AS r")


def test_to_start_of_interval_origin(client):
    # buckets anchor at the origin: 14:35:30 + k*1min contains 14:45:50
    assert str(one(client, "SELECT toStartOfInterval("
               "toDateTime('2023-01-02 14:45:50'), INTERVAL 1 MINUTE, "
               "toDateTime('2023-01-02 14:35:30')) AS r")) \
        == "2023-01-02 14:45:30"
    # 15-minute buckets from an origin
    assert str(one(client, "SELECT toStartOfInterval("
               "toDateTime('2023-01-02 14:44:30'), INTERVAL 15 MINUTE,"
               " toDateTime('2023-01-02 14:35:30')) AS r")) \
        == "2023-01-02 14:35:30"
    with pytest.raises(UntranslatableFunctionError, match="origin"):
        client.query_ch(
            "SELECT toStartOfInterval(toDateTime('2023-01-02 14:44:30'"
            "), INTERVAL 1 MONTH, toDateTime('2023-01-01 00:00:00'))"
        )


def test_snowflake_roundtrip(client):
    # encode is the exact inverse of the existing decode
    assert str(one(client, "SELECT snowflakeIDToDateTime("
               "dateTimeToSnowflakeID(toDateTime(1629053876))) AS r"))\
        .startswith("2021-08-15")


def test_get_subcolumn(client):
    assert one(client, "SELECT getSubcolumn(map('a',1,'b',2), "
               "'values') AS r") == [1, 2]
    assert one(client, "SELECT getSubcolumn([10,20,30], 'size0') AS r")\
        == 3
    assert one(client, "SELECT getSubcolumn(named_struct('x', 7), "
               "'x') AS r") == 7


def test_proportions_z_test_pooled_vs_unpooled(client):
    row = client.query_ch(
        "SELECT z.t.z_statistic AS zs, z.t.p_value AS pv FROM "
        "(SELECT proportionsZTest(30, 10, 100, 100, 0.95, 'pooled') "
        "AS t) z"
    ).collect()[0]
    # px=0.3 py=0.1: pooled p=0.2, se=sqrt(.2*.8*.02)=sqrt(.0032)
    import math

    exp_z = 0.2 / math.sqrt(0.2 * 0.8 * 0.02)
    assert abs(row.zs - exp_z) < 1e-9
    assert row.pv < 0.001  # strongly significant
    with pytest.raises(UntranslatableFunctionError, match="pooled"):
        client.query_ch(
            "SELECT proportionsZTest(1, 2, 10, 10, 0.95, 'bogus')"
        )


def test_mean_z_test_operator(spark):
    from clickhouse_arrow_spark.operators.stats import mean_z_test
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(float(v), s) for v, s in
         [(1, 0), (2, 0), (3, 0), (4, 0), (11, 1), (12, 1), (13, 1),
          (14, 1)]],
        "v double, s int",
    )
    r = mean_z_test(df, "v", F.col("s") == 1, var0=1.0, var1=1.0).collect()[0]
    # means 12.5 vs 2.5 with se = sqrt(1/4 + 1/4): z = -10/sqrt(0.5)
    import math

    assert abs(r.z_stat - (-10.0 / math.sqrt(0.5))) < 1e-4
    assert r.p_value < 1e-6
    assert r.ci_low < -10 < -9 < r.ci_high + 20  # CI brackets the diff


def test_kql_prql_stl_guided(client):
    for fn, pat in (("kql('Events | take 5')", "Kusto"),
                    ("prql('from events')", "PRQL"),
                    ("seriesDecomposeSTL([1,2,3,4], 2)", "loess")):
        with pytest.raises(UntranslatableFunctionError, match=pat):
            client.query_ch(f"SELECT {fn} AS r")


def test_tuple_intdiv_family(client):
    r = client.query_ch(
        "SELECT tupleIntDiv((15, 10, 5), (5, 5, 5)) AS r"
    ).collect()[0].r
    assert (r.col1, r.col2, r.col3) == (3, 2, 1)
    r = client.query_ch(
        "SELECT tupleIntDivOrZero((5, 10), (0, 2)) AS r"
    ).collect()[0].r
    assert (r.col1, r.col2) == (0, 5)  # div-by-zero -> 0, not error
    r = client.query_ch(
        "SELECT tupleModulo((15, 10), (4, 3)) AS r"
    ).collect()[0].r
    assert (r.col1, r.col2) == (3, 1)
    r = client.query_ch(
        "SELECT tupleIntDivByNumber((15, 10), 4) AS r"
    ).collect()[0].r
    assert (r.col1, r.col2) == (3, 2)


def test_json_extract_keys_and_values(client):
    r = client.query_ch(
        "SELECT JSONExtractKeysAndValues('{\"a\":5,\"b\":7}', 'Int64')"
        " AS r"
    ).collect()[0].r
    assert [(e.key, e.value) for e in r] == [("a", 5), ("b", 7)]
    # path-key form digs into a sub-object first
    r = client.query_ch(
        "SELECT JSONExtractKeysAndValues('{\"x\":{\"a\":5}}', 'x', "
        "'Int64') AS r"
    ).collect()[0].r
    assert [(e.key, e.value) for e in r] == [("a", 5)]
    # Raw form keeps values as JSON text
    r = client.query_ch(
        "SELECT JSONExtractKeysAndValuesRaw('{\"a\":[1,2]}') AS r"
    ).collect()[0].r
    assert [(e.key, e.value) for e in r] == [("a", "[1,2]")]
