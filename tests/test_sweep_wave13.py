"""Probe-sweep wave 13 (round 6, continuation session): array
containment/element helpers, new-style snowflake converters, session
timezone offset, v7 UUIDs, multi-ellipse containment, the -Stable
aggregate spellings, and makeDate32. Reference surface: ClickHouse SQL
the `clickhouse-arrow` client passes through verbatim.
"""

from __future__ import annotations

import datetime
import re

import pytest

from clickhouse_arrow_spark.client import Client
from clickhouse_arrow_spark.dialect import UntranslatableFunctionError


@pytest.fixture(scope="module")
def ch(spark):
    from clickhouse_arrow_spark.sources import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    return Client(spark)


def one(ch, sql):
    return ch.query_ch(sql).collect()[0]


def test_has_substr(ch):
    r = one(
        ch,
        "SELECT hasSubstr([1,2,3,4], [2,3]) AS hit, "
        "hasSubstr([1,2,3,4], [2,4]) AS gap, "
        "hasSubstr([1,2], [1,2,3]) AS longer, "
        "hasSubstr([1,2], CAST([] AS Array(Int64))) AS empty_needle",
    )
    assert (r["hit"], r["gap"], r["longer"], r["empty_needle"]) == (
        True, False, False, True,
    )


def test_array_element_or_null(ch):
    r = one(
        ch,
        "SELECT arrayElementOrNull([10,20], 2) AS inb, "
        "arrayElementOrNull([10,20], 5) AS oob, "
        "arrayElementOrNull([10,20], 0) AS zero, "
        "arrayElementOrNull([10,20], -1) AS neg",
    )
    assert (r["inb"], r["oob"], r["zero"], r["neg"]) == (20, None, None, 20)


def test_make_date32(ch):
    r = one(ch, "SELECT makeDate32(2024, 2, 29) AS d")
    assert r["d"] == datetime.date(2024, 2, 29)


def test_snowflake_id_converters(ch):
    # new-style pair: epoch defaults to 0 ms (unix), optional epoch arg
    sf = 123456789 << 22
    r = one(
        ch,
        f"SELECT snowflakeIDToDateTime({sf}) AS t0, "
        f"snowflakeIDToDateTime({sf}, 1000) AS t1",
    )
    assert r["t0"] == datetime.datetime.fromtimestamp(
        123456789 / 1000.0, datetime.timezone.utc
    ).replace(tzinfo=None)
    assert (r["t1"] - r["t0"]).total_seconds() == 1.0
    with pytest.raises(UntranslatableFunctionError, match="time_zone"):
        ch.query_ch(f"SELECT snowflakeIDToDateTime({sf}, 0, 'UTC') AS t")


def test_timezone_offset(ch, spark):
    tz = spark.conf.get("spark.sql.session.timeZone")
    r = one(
        ch, "SELECT timezoneOffset(toDateTime('2024-07-01 12:00:00')) AS o"
    )
    if tz in ("UTC", "Etc/UTC", "GMT"):
        assert r["o"] == 0
    else:
        assert -14 * 3600 <= r["o"] <= 14 * 3600


def test_stable_aggregate_spellings(ch):
    r = one(
        ch,
        "SELECT round(corrStable(o_orderkey, o_totalprice), 6) AS c, "
        "round(varSampStable(o_totalprice), 2) AS v, "
        "round(stddevPopStable(o_totalprice), 2) AS s, "
        "round(covarSampStable(o_orderkey, o_totalprice), 2) AS cv "
        "FROM orders",
    )
    base = one(
        ch,
        "SELECT round(corr(o_orderkey, o_totalprice), 6) AS c, "
        "round(varSamp(o_totalprice), 2) AS v FROM orders",
    )
    assert r["c"] == base["c"] and r["v"] == base["v"]
    assert r["s"] > 0 and r["cv"] is not None


def test_visible_width(ch):
    r = one(ch, "SELECT visibleWidth('abc') AS w, visibleWidth(1234) AS n")
    assert (r["w"], r["n"]) == (3, 4)


def test_generate_uuid_v7(ch):
    rows = ch.query_ch(
        "SELECT generateUUIDv7() AS u FROM numbers(5)"
    ).collect()
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    for r in rows:
        assert pat.match(r["u"]), r["u"]
    # time-ordered: the ms prefix equals now's to within a minute
    import time

    ms_hex = rows[0]["u"].replace("-", "")[:12]
    assert abs(int(ms_hex, 16) - time.time() * 1000) < 60_000


def test_point_in_ellipses(ch):
    r = one(
        ch,
        "SELECT pointInEllipses(1, 1, 0, 0, 3, 3) AS inside, "
        "pointInEllipses(10, 10, 0, 0, 3, 3) AS outside, "
        "pointInEllipses(10, 10, 0, 0, 3, 3, 10, 10, 1, 1) AS second",
    )
    assert (r["inside"], r["outside"], r["second"]) == (1, 0, 1)
    with pytest.raises(UntranslatableFunctionError, match="quadruple"):
        ch.query_ch("SELECT pointInEllipses(1, 1, 0, 0, 3) AS bad")


def test_lp_distance_and_norm(ch):
    r = one(
        ch,
        "SELECT round(LpDistance([1,2], [4,6], 3), 4) AS d, "
        "round(LpNorm([3,4], 2), 4) AS n",
    )
    assert (r["d"], r["n"]) == (round(91 ** (1 / 3), 4), 5.0)
    with pytest.raises(UntranslatableFunctionError, match="LpNorm"):
        ch.query_ch("SELECT LpNorm([1]) AS bad")


def test_group_array_last_empty_safe(ch):
    r = one(
        ch,
        "SELECT groupArrayLast(2)(x) AS tail_, "
        "length(groupArrayLast(2)(x)) AS n "
        "FROM (SELECT arrayJoin([1,2,3,4]) AS x)",
    )
    assert r["tail_"] == [3, 4] and r["n"] == 2
    r = one(
        ch,
        "SELECT groupArrayLast(3)(x) AS tail_ "
        "FROM (SELECT arrayJoin([1,2]) AS x WHERE 1 = 0)",
    )
    assert r["tail_"] == []


def test_position_edit_utf8_spellings(ch):
    r = one(
        ch,
        "SELECT positionCaseInsensitiveUTF8('Hello', 'ELL') AS p, "
        "positionUTF8('héllo', 'llo') AS pu, "
        "editDistanceUTF8('abc', 'abd') AS d",
    )
    assert (r["p"], r["pu"], r["d"]) == (2, 3, 1)


def test_numeric_condition_literals(ch):
    assert one(ch, "SELECT count() AS c FROM orders WHERE 0")["c"] == 0
    assert one(ch, "SELECT count() AS c FROM orders WHERE 1 LIMIT 5")["c"] > 0
    assert one(ch, "SELECT count() AS c FROM orders HAVING 1")["c"] > 0
    # non-literal numeric conditions still surface Spark's type error
    with pytest.raises(Exception, match="(?i)boolean|type"):
        ch.query_ch("SELECT count() AS c FROM orders WHERE o_orderkey").collect()


def test_resample_and_argminmax_guided(ch):
    # r9: the -Resample combinator graduated to bucketed array folds
    [rr] = ch.query_ch(
        "SELECT sumResample(0, 10, 5)(o_totalprice, o_orderkey) AS r "
        "FROM orders"
    ).collect()
    assert len(rr["r"]) == 2
    with pytest.raises(UntranslatableFunctionError, match="extremal|minimal"):
        ch.query_ch(
            "SELECT sumArgMin(o_totalprice, o_orderdate) AS s FROM orders"
        )
    # the REAL argMin/argMax aggregates still work
    r = one(
        ch,
        "SELECT argMin(o_orderkey, o_totalprice) AS lo, "
        "argMax(o_orderkey, o_totalprice) AS hi FROM orders",
    )
    assert r["lo"] != r["hi"]


def test_stable_family_and_weighted(ch):
    r = one(
        ch,
        "SELECT round(avgWeighted(o_totalprice, o_custkey + 1), 2) AS aw "
        "FROM orders",
    )
    assert r["aw"] > 0


def test_semantic_settings_guarded(ch):
    # value matching this engine's behavior strips like any other hint
    assert one(
        ch,
        "SELECT count() AS c FROM orders SETTINGS join_use_nulls = 1",
    )["c"] > 0
    assert one(
        ch,
        "SELECT count() AS c FROM orders "
        "SETTINGS max_threads = 8, final = 0",
    )["c"] > 0
    # result-CHANGING values refuse with the divergence named
    with pytest.raises(UntranslatableFunctionError, match="TYPE DEFAULTS"):
        ch.query_ch(
            "SELECT count() AS c FROM orders SETTINGS join_use_nulls = 0"
        )
    with pytest.raises(UntranslatableFunctionError, match="FROM <table> FINAL"):
        ch.query_ch("SELECT count() AS c FROM orders SETTINGS final = 1")
    with pytest.raises(UntranslatableFunctionError, match="-OrNull"):
        ch.query_ch(
            "SELECT sum(o_totalprice) AS s FROM orders "
            "SETTINGS aggregate_functions_null_for_empty = 1"
        )


def test_order_by_nulls_match_clickhouse(ch):
    # CH sorts NULL as the largest value: last under ASC, first under
    # DESC — Spark's defaults are the opposite; the dialect appends the
    # explicit placement (top level, subqueries, and OVER clauses)
    asc = [r["x"] for r in ch.query_ch(
        "SELECT x FROM (SELECT arrayJoin([3, NULL, 1]) AS x) ORDER BY x"
    ).collect()]
    assert asc == [1, 3, None]
    desc = [r["x"] for r in ch.query_ch(
        "SELECT x FROM (SELECT arrayJoin([3, NULL, 1]) AS x) "
        "ORDER BY x DESC"
    ).collect()]
    assert desc == [None, 3, 1]
    # explicit NULLS spec wins
    explicit = [r["x"] for r in ch.query_ch(
        "SELECT x FROM (SELECT arrayJoin([3, NULL, 1]) AS x) "
        "ORDER BY x ASC NULLS FIRST"
    ).collect()]
    assert explicit == [None, 1, 3]
    # the LIMIT boundary no longer swallows real values behind NULLs
    top2 = [r["x"] for r in ch.query_ch(
        "SELECT x FROM (SELECT arrayJoin([3, NULL, 1, 2]) AS x) "
        "ORDER BY x LIMIT 2"
    ).collect()]
    assert top2 == [1, 2]
    # window ORDER BY follows the same rule
    rn = ch.query_ch(
        "SELECT x, row_number() OVER (ORDER BY x) AS r "
        "FROM (SELECT arrayJoin([3, NULL, 1]) AS x) ORDER BY r LIMIT 1"
    ).collect()[0]
    assert rn["x"] == 1


def test_view_tvf_and_untuple(ch):
    assert one(
        ch,
        "SELECT count() AS n FROM view(SELECT * FROM orders "
        "WHERE o_orderstatus = 'O')",
    )["n"] > 0
    # view() composes with an alias and joins
    assert one(
        ch, "SELECT v.n FROM view(SELECT count() AS n FROM orders) v"
    )["n"] > 0
    r = one(ch, "SELECT untuple((1, 'a'))")
    assert (r["col1"], r["col2"]) == (1, "a")
    # named tuples keep their field names through the expansion
    r = one(
        ch,
        "SELECT untuple(tuple(o_orderkey, o_orderstatus)) FROM orders "
        "ORDER BY o_orderkey LIMIT 1",
    )
    assert r["o_orderkey"] == 0 and r["o_orderstatus"] in ("F", "O", "P")


def test_show_tables_like_sql_patterns(ch):
    # CH LIKE patterns are SQL (% _), not Spark globs
    assert [r[0] for r in ch.query_ch("SHOW TABLES LIKE 'ord%'").collect()] \
        == ["orders"]
    assert [r[0] for r in ch.query_ch(
        "SHOW TABLES LIKE 'custome_'").collect()] == ["customer"]
    assert [r[0] for r in ch.query_ch(
        "SHOW DATABASES LIKE 'def%'").collect()] == ["default"]


def test_order_nulls_respects_trailing_comment():
    from clickhouse_arrow_spark.dialect import translate_ch_sql

    assert translate_ch_sql("SELECT x FROM t ORDER BY x -- note") == \
        "SELECT x FROM t ORDER BY x NULLS LAST -- note"
    assert translate_ch_sql("SELECT x FROM t ORDER BY concat(x, '--')") == \
        "SELECT x FROM t ORDER BY concat(x, '--') NULLS LAST"


def test_wave16_type_utility_functions(ch):
    r = one(
        ch,
        "SELECT tupleNames(CAST((1, 2) AS Tuple(a Int64, b Int64))) AS n, "
        "toDecimalString(3.14159, 3) AS ds, "
        "toBool(1) AS b1, toBool('true') AS b2, "
        "defaultValueOfTypeName('Int64') AS d0, "
        "defaultValueOfTypeName('String') AS s0, "
        "defaultValueOfTypeName('Nullable(Int64)') AS n0",
    )
    assert r["n"] == ["a", "b"] and r["ds"] == "3.142"
    assert r["b1"] is True and r["b2"] is True
    assert (r["d0"], r["s0"], r["n0"]) == (0, "", None)
    # names work on real columns too (JSON introspection, no schema
    # analysis pass)
    r = one(
        ch,
        "SELECT tupleNames(tuple(o_orderkey, o_orderstatus)) AS n "
        "FROM orders LIMIT 1",
    )
    assert r["n"] == ["o_orderkey", "o_orderstatus"]


def test_index_hint_is_superset_contract(ch):
    # CH: indexHint drives granule selection only; result is a
    # superset — here the full table, never a filter
    full = one(ch, "SELECT count() AS n FROM orders")["n"]
    hinted = one(
        ch, "SELECT count() AS n FROM orders WHERE indexHint(o_orderkey > 100)"
    )["n"]
    assert hinted == full
    with pytest.raises(UntranslatableFunctionError, match="typed values"):
        ch.query_ch("SELECT tupleToNameValuePairs((1, 2)) AS p")


def test_wave20_best_effort_and_gaps(ch):
    r = one(
        ch,
        "SELECT arrayStringConcat(['x', 'y']) AS s, "
        "toString(parseDateTimeBestEffortOrNull('2024/03/15 10:20:30')) "
        "AS a, "
        "toString(parseDateTimeBestEffortOrNull('Mar 15 2024')) AS b, "
        "parseDateTimeBestEffortOrNull('not a date') AS c, "
        "toString(parseDateTimeBestEffortOrZero('nope')) AS z, "
        "quantileDD(0.01, 0.25)(number) AS q FROM numbers(5)",
    )
    assert r["s"] == "xy"
    assert r["a"] == "2024-03-15 10:20:30"
    assert r["b"] == "2024-03-15 00:00:00"
    assert r["c"] is None
    assert r["z"] == "1970-01-01 00:00:00"
    assert r["q"] == 1.0
    # strict form raises like ClickHouse
    import pytest as _pt

    with _pt.raises(Exception, match="cannot parse"):
        ch.query_ch("SELECT parseDateTimeBestEffort('@@@') AS t").collect()


def test_wave21_base58_punycode_gamma(ch):
    r = one(
        ch,
        "SELECT base58Encode('') AS e0, base58Encode('hello') AS b, "
        "base58Decode(base58Encode('round trip ünïcode')) AS rt, "
        "tryBase58Decode('0bad') AS bad, "
        "punycodeDecode(punycodeEncode('bücher')) AS prt, "
        "idnaDecode(idnaEncode('bücher.example')) AS irt, "
        "round(lgamma(0.5), 6) AS lg, round(tgamma(0.5), 6) AS tg",
    )
    assert r["e0"] == "" and r["b"] == "Cn8eVZg"
    assert r["rt"] == "round trip ünïcode"
    assert r["bad"] == ""
    assert r["prt"] == "bücher"
    assert r["irt"] == "bücher.example"
    import math

    assert abs(r["lg"] - round(math.lgamma(0.5), 6)) < 1e-9
    assert abs(r["tg"] - round(math.gamma(0.5), 6)) < 1e-9
    import pytest as _pt

    with _pt.raises(Exception, match="invalid input"):
        ch.query_ch("SELECT base58Decode('0bad') AS x").collect()


def test_wave21_porter_stem(ch):
    r = one(
        ch,
        "SELECT stem('en', 'caresses') AS a, stem('en', 'ponies') AS b, "
        "stem('en', 'electriciti') AS c, stem('en', 'adjustment') AS d, "
        "stem('english', 'Hopping') AS e",
    )
    assert (r["a"], r["b"], r["c"], r["d"], r["e"]) == (
        "caress", "poni", "electr", "adjust", "hop",
    )
    import pytest as _pt

    from clickhouse_arrow_spark.dialect import UntranslatableFunctionError

    with _pt.raises(UntranslatableFunctionError, match="English"):
        ch.query_ch("SELECT stem('fr', 'mangeons')")


def test_wave20_unicode_normalize(ch):
    import unicodedata

    dec = unicodedata.normalize("NFD", "é")  # e + combining acute
    r = one(
        ch,
        f"SELECT normalizeUTF8NFC('{dec}') AS c, "
        "length(normalizeUTF8NFD('é')) AS dl, "
        "normalizeUTF8NFKC('①') AS k, "
        "normalizeUTF8NFKD('ﬁ') AS lig",
    )
    assert r["c"] == "é" and r["dl"] == 2
    assert r["k"] == "1" and r["lig"] == "fi"


def test_with_fill_staleness_numeric(ch):
    # originals at 1 and 10; STALENESS 3 fills 2,3 after 1 and 11,12
    # after 10 (TO 15 would otherwise run the tail to 14); nothing
    # before the first original
    rows = ch.query_ch(
        "SELECT x AS k, count(*) AS n FROM "
        "(SELECT 1 AS x UNION ALL SELECT 10 AS x) GROUP BY x "
        "ORDER BY k WITH FILL FROM 0 TO 15 STALENESS 3"
    ).collect()
    ks = [r["k"] for r in rows]
    assert ks == [1, 2, 3, 10, 11, 12]
    by_k = {r["k"]: r["n"] for r in rows}
    assert by_k[1] == 1 and by_k[2] == 0 and by_k[11] == 0


def test_with_fill_staleness_interval(ch):
    rows = ch.query_ch(
        "SELECT toDate(d) AS d, count(*) AS n FROM "
        "(SELECT '2024-01-01' AS d UNION ALL SELECT '2024-01-10' AS d) "
        "GROUP BY d ORDER BY d WITH FILL "
        "FROM toDate('2024-01-01') TO toDate('2024-01-20') "
        "STEP INTERVAL 1 DAY STALENESS INTERVAL 2 DAY"
    ).collect()
    ds = [str(r["d"]) for r in rows]
    assert ds == ["2024-01-01", "2024-01-02", "2024-01-10", "2024-01-11"]


def test_wave18_string_encoding_family(ch, spark):
    r = one(
        ch,
        "SELECT extractKeyValuePairs('a:1, b:2') AS m1, "
        "extractKeyValuePairs('x=1;y=2', '=', ';') AS m2, "
        "encodeXMLComponent('<a>&') AS enc, "
        "decodeXMLComponent('&lt;a&gt; &amp; &#65;') AS dec, "
        "firstLine('one\\ntwo') AS fl, "
        "ngrams('abcd', 2) AS ng, "
        "splitByNonAlpha('a.b c') AS sp, "
        "countMatchesCaseInsensitive('AbaB', 'b') AS cm",
    )
    assert r["m1"] == {"a": "1", "b": "2"} and r["m2"] == {"x": "1", "y": "2"}
    assert r["enc"] == "&lt;a&gt;&amp;"
    assert r["dec"] == "<a> & A"
    assert r["fl"] == "one" and r["ng"] == ["ab", "bc", "cd"]
    assert r["sp"] == ["a", "b", "c"] and r["cm"] == 2
    # full HTML entity set rides the pandas UDF the refusal names
    from pyspark.sql import functions as F

    from clickhouse_arrow_spark.dialect import UntranslatableFunctionError
    from clickhouse_arrow_spark.functions.ch_functions import html_unescape

    with pytest.raises(UntranslatableFunctionError, match="html_unescape"):
        ch.query_ch("SELECT decodeHTMLComponent('&copy;') AS x")
    got = spark.createDataFrame([("&copy;&amp;",)], "s string").select(
        html_unescape(F.col("s")).alias("u")
    ).collect()[0]["u"]
    assert got == "©&"


def test_count_avg_map_combinators(ch):
    r = one(
        ch,
        "SELECT countMap(m) AS c, avgMap(m) AS a FROM "
        "(SELECT map('a', 1.0) AS m "
        "UNION ALL SELECT map('a', 3.0, 'b', 5.0) AS m)",
    )
    assert r["c"] == {"a": 2, "b": 1}
    assert r["a"] == {"a": 2.0, "b": 5.0}


def test_wave19_datetime_and_id_family(ch):
    import re as _re

    r = one(
        ch,
        "SELECT generateULID() AS u, "
        "fromUnixTimestampInJodaSyntax(1700000000, 'yyyy-MM-dd') AS j, "
        "toUTCTimestamp(toDateTime('2024-01-01 10:00:00'), "
        "'Asia/Shanghai') AS ut, "
        "timeDiff(toDateTime('2024-01-01 00:00:00'), "
        "toDateTime('2024-01-01 00:01:30')) AS td, "
        "addInterval(toDate('2024-01-01'), INTERVAL 1 MONTH) AS ai, "
        "toLastDayOfWeek(toDate('2024-01-03')) AS lw, "
        "toLastDayOfWeek(toDate('2024-01-06')) AS lw_sat, "
        "connectionId() AS cid, revision() > 0 AS rev",
    )
    assert _re.fullmatch(r"[0-9A-HJKMNP-TV-Z]{26}", r["u"])
    assert r["j"] == "2023-11-14" and r["td"] == 90
    assert r["ut"].hour == 2  # 10:00 Asia/Shanghai = 02:00 UTC
    assert str(r["ai"]) == "2024-02-01"
    # CH mode-0 week runs Sunday..Saturday; Saturday maps to itself
    assert r["lw"].weekday() == 5 and str(r["lw_sat"]) == "2024-01-06"
    assert r["cid"] == 0 and r["rev"] is True


def test_map_sort_directions(ch):
    fwd = one(ch, "SELECT mapKeys(mapSort(map('b', 2, 'a', 1))) AS k")["k"]
    rev = one(
        ch, "SELECT mapKeys(mapReverseSort(map('b', 2, 'a', 1))) AS k"
    )["k"]
    assert fwd == ["a", "b"] and rev == ["b", "a"]
