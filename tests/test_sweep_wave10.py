"""Probe-sweep wave 10 (round 6): dialect formatters surfaced by the
165-idiom execution sweep — unbin, formatReadableDecimalSize, numeric
truncate, sigmoid, full-name monthName, UTF8 starts/ends, array
cumsum-nonnegative / N-ary set folds / CH-exact shifts, map key-LIKE
helpers, the URL query-string+fragment family, isNotDistinctFrom, and
literal byteSwap. Reference surface: ClickHouse SQL functions the
`clickhouse-arrow` client passes through verbatim (its dialect IS
ClickHouse's).
"""

from __future__ import annotations

import pytest

from clickhouse_arrow_spark.client import Client
from clickhouse_arrow_spark.dialect import (
    UntranslatableFunctionError,
    translate_ch_sql,
)


@pytest.fixture(scope="module")
def ch(spark):
    from clickhouse_arrow_spark.sources import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    return Client(spark)


def one(ch, sql):
    return ch.query_ch(sql).collect()[0]


def test_unbin(ch):
    r = one(ch, "SELECT hex(unbin('101')) AS a, hex(unbin('01000001')) AS b")
    assert (r["a"], r["b"]) == ("05", "41")


def test_format_readable_decimal_size(ch):
    r = one(ch, "SELECT formatReadableDecimalSize(1000000) AS m, "
                "formatReadableDecimalSize(5) AS b, "
                "formatReadableDecimalSize(2200000000) AS g")
    assert (r["m"], r["b"], r["g"]) == ("1.00 MB", "5.00 B", "2.20 GB")


def test_truncate_numeric(ch):
    r = one(ch, "SELECT truncate(3.999, 2) AS a, truncate(-3.999, 2) AS b, "
                "truncate(3.999) AS c, truncate(-0.5) AS d")
    assert (r["a"], r["b"], r["c"], r["d"]) == (3.99, -3.99, 3.0, -0.0)


def test_sigmoid(ch):
    r = one(ch, "SELECT sigmoid(0.0) AS z, round(sigmoid(2.0), 6) AS p")
    assert r["z"] == 0.5
    assert abs(r["p"] - 0.880797) < 1e-6


def test_month_name_full(ch):
    # without the formatter this falls through to Spark 4's monthname()
    # builtin which abbreviates ('Mar')
    r = one(ch, "SELECT monthName(toDate('2024-03-15')) AS m")
    assert r["m"] == "March"


def test_utf8_starts_ends(ch):
    r = one(ch, "SELECT startsWithUTF8('héllo', 'hé') AS s, "
                "endsWithUTF8('héllo', 'lo') AS e")
    assert (r["s"], r["e"]) == (True, True)


def test_array_cum_sum_non_negative(ch):
    r = one(ch, "SELECT arrayCumSumNonNegative([1, 1, -4, 1]) AS a")
    assert r["a"] == [1, 2, 0, 1]


def test_array_union_symdiff(ch):
    r = one(ch, "SELECT arraySort(arrayUnion([1,2],[2,3],[3,4])) AS u, "
                "arraySort(arraySymmetricDifference([1,2],[2,3])) AS d")
    assert r["u"] == [1, 2, 3, 4]
    assert r["d"] == [1, 3]


def test_array_shift_semantics(ch):
    # size-preserving; n >= size -> all fill; negative n flips direction;
    # default fill is the element type's default (0), not NULL
    r = one(ch, "SELECT arrayShiftLeft([1,2,3], 1) AS l, "
                "arrayShiftRight([1,2,3], 1) AS r, "
                "arrayShiftLeft([1,2,3], -1) AS ln, "
                "arrayShiftLeft([1,2,3], 5) AS lall, "
                "arrayShiftLeft([1,2,3], 1, 9) AS ld, "
                "arrayShiftLeft(['a','b'], 1, 'z') AS ls")
    assert r["l"] == [2, 3, 0]
    assert r["r"] == [0, 1, 2]
    assert r["ln"] == [0, 1, 2]
    assert r["lall"] == [0, 0, 0]
    assert r["ld"] == [2, 3, 9]
    assert r["ls"] == ["b", "z"]


def test_map_key_like(ch):
    r = one(ch, "SELECT mapContainsKeyLike(map('abc', 1), 'ab%') AS c, "
                "mapContainsKeyLike(map('abc', 1), 'zz%') AS n, "
                "mapKeys(mapExtractKeyLike(map('abc', 1, 'xyz', 2), "
                "'ab%')) AS k")
    assert (r["c"], r["n"], r["k"]) == (True, False, ["abc"])


def test_url_query_fragment_family(ch):
    r = one(ch, "SELECT queryStringAndFragment('http://x.com/a?b=1#f') AS qf, "
                "queryStringAndFragment('http://x.com/a#f') AS fonly, "
                "queryStringAndFragment('http://x.com/a') AS none_, "
                "cutFragment('http://x.com/a#f') AS cf, "
                "cutQueryStringAndFragment('http://x.com/a?b=1#f') AS cqf, "
                "decodeURLFormComponent('a+b%20c') AS d")
    assert r["qf"] == "b=1#f"
    assert r["fonly"] == "#f"
    assert r["none_"] == ""
    assert r["cf"] == "http://x.com/a"
    assert r["cqf"] == "http://x.com/a"
    assert r["d"] == "a b c"


def test_is_not_distinct_from(ch):
    r = one(ch, "SELECT isNotDistinctFrom(NULL, NULL) AS a, "
                "isNotDistinctFrom(1, NULL) AS b, "
                "isNotDistinctFrom(1, 1) AS c")
    assert (r["a"], r["b"], r["c"]) == (True, False, True)


def test_byteswap_literal_widths(ch):
    # the literal's width follows CH's smallest-unsigned-type rule:
    # UInt8 is an identity, UInt16/32/64 reverse their byte counts
    r = one(ch, "SELECT byteSwap(200) AS u8, byteSwap(258) AS u16, "
                "byteSwap(3351772109) AS u32")
    assert (r["u8"], r["u16"], r["u32"]) == (200, 513, 3455829959)


def test_byteswap_column_refuses_with_recipe():
    with pytest.raises(UntranslatableFunctionError, match="conv"):
        translate_ch_sql("SELECT byteSwap(x) FROM t")


def test_parametric_arity_clean_error():
    # the malformed two-parameter-group spelling must raise a guided
    # error, not an IndexError
    with pytest.raises(UntranslatableFunctionError, match="accuracy"):
        translate_ch_sql("SELECT quantileGK(100)(0.5)(x) FROM t")


def test_quantile_gk_proper_form():
    out = translate_ch_sql("SELECT quantileGK(100, 0.5)(x) FROM t")
    assert "approx_percentile(x, 0.5, 100)" in out


def test_ipv6_refusals_name_helpers():
    # isIPv6String is NOT here: wave 9 gave it a JVM-side regexp form
    for fn in ("IPv6StringToNum", "IPv6NumToString", "toIPv6"):
        with pytest.raises(UntranslatableFunctionError, match="ch_functions"):
            translate_ch_sql(f"SELECT {fn}(x) FROM t")


def test_ipv6_helpers(spark):
    from clickhouse_arrow_spark.functions import ch_functions as chf

    df = spark.createDataFrame(
        [("::1",), ("2001:0db8:0000:0000:0000:0000:0000:0001",),
         ("1.2.3.4",), ("nope",)],
        ["s"],
    )
    rows = df.select(
        chf.to_ipv6("s").alias("canon"),
        chf.ipv6_num_to_string(chf.ipv6_string_to_num("s")).alias("rt"),
        chf.is_ipv6_string("s").alias("is6"),
    ).collect()
    got = [(r.canon, r.rt, r.is6) for r in rows]
    assert got == [
        ("::1", "::1", True),
        ("2001:db8::1", "2001:db8::1", True),
        # IPv4 text maps into ::ffff space but is NOT IPv6 syntax
        ("::ffff:102:304", "::ffff:102:304", False),
        (None, None, False),
    ]


def test_wave10_edges(ch):
    # edge battery: empty arrays, NULL inputs, zero shifts — none may
    # ANSI-crash or silently widen
    r = one(ch, "SELECT arrayShiftLeft(emptyArrayInt32(), 2) AS a, "
                "arrayShiftLeft([1,2,3], 0) AS b, "
                "arrayCumSumNonNegative(emptyArrayInt32()) AS c, "
                "arrayUnion(emptyArrayInt32(), [1]) AS d, "
                "arraySymmetricDifference([1], [1]) AS e, "
                "hex(unbin('')) AS f, "
                "truncate(0.0, 2) AS g, "
                "formatReadableDecimalSize(-1500) AS h, "
                "extractGroups('', '(a)(b)') AS i")
    assert r["a"] == []
    assert r["b"] == [1, 2, 3]
    assert r["c"] == []
    assert r["d"] == [1]
    assert r["e"] == []
    assert r["f"] == ""          # '' -> empty bytes like CH, not NULL
    assert r["g"] == 0.0
    assert r["h"] == "-1.50 KB"
    assert r["i"] == []
