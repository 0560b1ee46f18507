#!/usr/bin/env python
"""Wave-26 execution probe: CH idioms with documented expected values,
run through query_ch. Reports PASS / MISMATCH / ERR per idiom — the
input for the next dialect-fix batch (waves 10/11/13/20/22/23 pattern).
Families this wave: aggregate statistics, string similarity, array
set-ops/fold/reduce, space-filling-curve + geohash encodings, interval
aggregates, readable formatters, misc scalar stragglers."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# aggregate probes run over an inline FROM; scalar probes are SELECT-only
CASES = [
    # --- string similarity (CH docs examples) ---
    ("SELECT soundex('aksel') AS r", "A240"),
    ("SELECT jaroSimilarity('clickhouse', 'click') AS r",
     0.8333333333333333),
    ("SELECT jaroWinklerSimilarity('clickhouse', 'click') AS r",
     0.8999999999999999),
    ("SELECT stringJaccardIndex('clickhouse', 'mouse') AS r", 0.4),
    ("SELECT damerauLevenshteinDistance('clickhouse', 'mouse') AS r", 6),
    ("SELECT substringIndex('www.clickhouse.com', '.', 2) AS r",
     "www.clickhouse"),
    ("SELECT substringIndex('www.clickhouse.com', '.', -2) AS r",
     "clickhouse.com"),
    ("SELECT hasToken('Hello World', 'Hello') AS r", True),
    ("SELECT hasToken('Hello World', 'ello') AS r", False),
    ("SELECT multiSearchAny('Hello, World!', ['hello', '!', 'world']) AS r",
     1),
    ("SELECT multiSearchFirstPosition('Hello World', ['llo', 'Wor', 'ld']) AS r",
     3),
    ("SELECT multiSearchAllPositions('Hello, World!', ['hello', '!', 'world']) AS r",
     [0, 13, 0]),
    ("SELECT multiSearchFirstIndex('Hello World', ['World', 'Hello']) AS r",
     2),
    ("SELECT countMatches('aaaa', 'aa') AS r", 2),
    ("SELECT translate('Hello, World!', 'delor', 'DELOR') AS r",
     "HELLO, WORLD!"),
    ("SELECT initcap('building for fast') AS r", "Building For Fast"),
    ("SELECT reverseUTF8('abc') AS r", "cba"),
    ("SELECT concatWithSeparator('|', 'a', 'b', 'c') AS r", "a|b|c"),
    ("SELECT format('{1} {0}', 'World', 'Hello') AS r", "Hello World"),
    ("SELECT format('{} {}', 'Hello', 'World') AS r", "Hello World"),
    ("SELECT regexpQuoteMeta('a.b?') AS r", None),
    ("SELECT ascii('A') AS r", 65),
    ("SELECT space(3) AS r", "   "),
    # --- array set-ops / fold / reduce / enumerate ---
    ("SELECT arrayJaccardIndex([1, 2], [2, 3]) AS r", 1.0 / 3),
    ("SELECT arrayIntersect([1, 2, 3], [2, 3, 4], [3, 4, 5]) AS r", [3]),
    ("SELECT arrayProduct([1, 2, 3, 4]) AS r", 24.0),
    ("SELECT arrayDotProduct([1, 2, 3], [4, 5, 6]) AS r", 32),
    ("SELECT arrayEnumerateDense([10, 20, 10, 30]) AS r", [1, 2, 1, 3]),
    ("SELECT arrayEnumerateUniq([10, 20, 10, 30]) AS r", [1, 1, 2, 1]),
    ("SELECT arrayFold((acc, x) -> acc + x, [1, 2, 3, 4], toInt64(0)) AS r",
     10),
    ("SELECT arrayReduce('max', [1, 2, 3]) AS r", 3),
    ("SELECT arrayReduce('uniqExact', [1, 1, 2]) AS r", 2),
    ("SELECT arrayReduce('avg', [1, 2, 3, 4]) AS r", 2.5),
    ("SELECT arrayPartialSort(2, [5, 3, 4, 1, 2]) AS r", None),
    ("SELECT arrayMin(x -> -x, [1, 2, 3]) AS r", -3),
    # --- encodings: bin / morton / hilbert / geohash ---
    ("SELECT bin(14) AS r", "00001110"),
    ("SELECT unbin('00001110') AS r", "\x0e"),
    ("SELECT mortonEncode(1, 2, 3) AS r", 53),
    ("SELECT mortonDecode(3, 53) AS r", None),
    ("SELECT hilbertEncode(3, 4) AS r", 31),
    ("SELECT hilbertDecode(2, 31) AS r", None),
    ("SELECT geohashEncode(-5.60302734375, 42.593994140625) AS r",
     None),
    ("SELECT geohashDecode('ezs42') AS r", None),
    ("SELECT jumpConsistentHash(256, 4) AS r", 3),
    # --- math stragglers ---
    ("SELECT erf(1.0) AS r", 0.8427007929497149),
    ("SELECT erfc(1.0) AS r", 0.15729920705028513),
    ("SELECT cbrt(27.0) AS r", 3.0),
    ("SELECT degrees(pi()) AS r", 180.0),
    ("SELECT radians(180.0) AS r", 3.141592653589793),
    ("SELECT factorial(5) AS r", 120),
    ("SELECT gcd(12, 18) AS r", 6),
    ("SELECT lcm(4, 6) AS r", 12),
    ("SELECT log1p(0.0) AS r", 0.0),
    ("SELECT exp2(3) AS r", 8.0),
    ("SELECT exp10(2) AS r", 100.0),
    ("SELECT sign(-5) AS r", -1),
    ("SELECT sigmoid(0.0) AS r", 0.5),
    ("SELECT min2(1, 2) AS r", 1.0),
    ("SELECT max2(1, 2) AS r", 2.0),
    ("SELECT positiveModulo(-5, 3) AS r", 1),
    ("SELECT widthBucket(10.15, 0, 20, 4) AS r", 3),
    ("SELECT roundBankers(2.5) AS r", 2.0),
    ("SELECT roundToExp2(31) AS r", 16),
    ("SELECT roundDown(5, [1, 3, 6]) AS r", 3),
    ("SELECT roundAge(50) AS r", 45),
    ("SELECT roundDuration(230) AS r", 180),
    ("SELECT bitCount(255) AS r", 8),
    # --- dates ---
    ("SELECT age('day', toDate('2023-01-01'), toDate('2023-01-10')) AS r",
     9),
    ("SELECT monthName(toDate('2023-04-01')) AS r", "April"),
    ("SELECT toLastDayOfMonth(toDate('2023-02-11')) AS r", None),
    ("SELECT toModifiedJulianDay('2020-01-01') AS r", 58849),
    ("SELECT fromModifiedJulianDay(58849) AS r", None),
    ("SELECT YYYYMMDDToDate(20230911) AS r", None),
    ("SELECT toDaysSinceYearZero(toDate('2023-09-08')) AS r", 739136),
    ("SELECT fromDaysSinceYearZero(739136) AS r", None),
    ("SELECT toDate('2020-01-01') + toIntervalDay(2) AS r", None),
    # --- readable formatters ---
    ("SELECT formatReadableTimeDelta(7690) AS r",
     "2 hours, 8 minutes and 10 seconds"),
    ("SELECT formatReadableDecimalSize(1024) AS r", "1.02 KB"),
    # --- JSON stragglers ---
    ("SELECT isValidJSON('{\"a\":1}') AS r", True),
    ("SELECT JSONArrayLength('[1,2,3]') AS r", 3),
    ("SELECT JSON_VALUE('{\"a\":{\"b\":1}}', '$.a.b') AS r", "1"),
    ("SELECT simpleJSONExtractInt('{\"a\":123}', 'a') AS r", 123),
    ("SELECT normalizeQuery('SELECT 1 + 2') AS r", None),
    # --- map second wave ---
    ("SELECT mapApply((k, v) -> (k, v * 2), map('a', 1, 'b', 2)) AS r",
     None),
    ("SELECT mapFilter((k, v) -> v > 1, map('a', 1, 'b', 2)) AS r",
     None),
    ("SELECT mapExists((k, v) -> v > 1, map('a', 1, 'b', 2)) AS r", True),
    ("SELECT mapAll((k, v) -> v > 0, map('a', 1, 'b', 2)) AS r", True),
    ("SELECT mapFromArrays([1, 2], ['a', 'b']) AS r", None),
    # --- distances ---
    ("SELECT L1Distance([1, 2], [2, 3]) AS r", 2),
    ("SELECT LinfDistance([1, 2], [4, 2]) AS r", 3),
    ("SELECT cosineDistance([1, 2], [2, 4]) AS r", 0.0),
    # --- aggregate statistics over inline rows ---
    ("SELECT skewPop(x) AS r FROM (SELECT arrayJoin([1, 2, 3]) AS x)",
     0.0),
    ("SELECT kurtPop(x) AS r FROM (SELECT arrayJoin([1, 2, 3]) AS x)",
     1.5),
    ("SELECT covarPop(x, y) AS r FROM (SELECT arrayJoin([(1,1),(2,2),(3,3)]) AS t, t.1 AS x, t.2 AS y)",
     2.0 / 3),
    ("SELECT corr(x, y) AS r FROM (SELECT arrayJoin([(1,1),(2,2),(3,3)]) AS t, t.1 AS x, t.2 AS y)",
     1.0),
    ("SELECT entropy(x) AS r FROM (SELECT arrayJoin([1, 1, 2, 2]) AS x)",
     1.0),
    ("SELECT rankCorr(x, y) AS r FROM (SELECT arrayJoin([(1,10),(2,20),(3,40)]) AS t, t.1 AS x, t.2 AS y)",
     1.0),
    ("SELECT simpleLinearRegression(x, y) AS r FROM (SELECT arrayJoin([(0,0),(1,1),(2,2)]) AS t, t.1 AS x, t.2 AS y)",
     None),
    ("SELECT avgWeighted(x, w) AS r FROM (SELECT arrayJoin([(4,1),(1,0),(10,2)]) AS t, t.1 AS x, t.2 AS w)",
     8.0),
    ("SELECT sumCount(x) AS r FROM (SELECT arrayJoin([1, 2, 3]) AS x)",
     None),
    ("SELECT sumKahan(x) AS r FROM (SELECT arrayJoin([1.5, 2.5]) AS x)",
     4.0),
    ("SELECT groupBitAnd(x) AS r FROM (SELECT arrayJoin([12, 10]) AS x)",
     8),
    ("SELECT groupBitOr(x) AS r FROM (SELECT arrayJoin([12, 10]) AS x)",
     14),
    ("SELECT groupBitXor(x) AS r FROM (SELECT arrayJoin([12, 10]) AS x)",
     6),
    ("SELECT uniqTheta(x) AS r FROM (SELECT arrayJoin([1, 2, 2, 3]) AS x)",
     3),
    ("SELECT uniqUpTo(2)(x) AS r FROM (SELECT arrayJoin([1, 2, 3]) AS x)",
     3),
    ("SELECT quantileTiming(0.5)(x) AS r FROM (SELECT arrayJoin([10, 20, 30]) AS x)",
     20.0),
    ("SELECT intervalLengthSum(s, e) AS r FROM (SELECT arrayJoin([(1,3),(2,4)]) AS t, t.1 AS s, t.2 AS e)",
     3),
    ("SELECT maxIntersections(s, e) AS r FROM (SELECT arrayJoin([(1,3),(2,4)]) AS t, t.1 AS s, t.2 AS e)",
     2),
    ("SELECT boundingRatio(x, y) AS r FROM (SELECT arrayJoin([(1,2),(3,6)]) AS t, t.1 AS x, t.2 AS y)",
     2.0),
    ("SELECT singleValueOrNull(x) AS r FROM (SELECT arrayJoin([7]) AS x)",
     7),
    ("SELECT singleValueOrNull(x) AS r FROM (SELECT arrayJoin([7, 8]) AS x)",
     None),
    ("SELECT retention(x = 1, x = 2) AS r FROM (SELECT arrayJoin([1, 2]) AS x)",
     None),
    ("SELECT anyHeavy(x) AS r FROM (SELECT arrayJoin([1, 1, 2]) AS x)",
     None),
    ("SELECT studentTTest(v, g) AS r FROM (SELECT arrayJoin([(1.0,0),(2.0,0),(3.0,1),(4.0,1)]) AS t, t.1 AS v, t.2 AS g)",
     None),
    ("SELECT welchTTest(v, g) AS r FROM (SELECT arrayJoin([(1.0,0),(2.0,0),(3.0,1),(4.0,1)]) AS t, t.1 AS v, t.2 AS g)",
     None),
    ("SELECT mannWhitneyUTest(v, g) AS r FROM (SELECT arrayJoin([(1.0,0),(2.0,0),(3.0,1),(4.0,1)]) AS t, t.1 AS v, t.2 AS g)",
     None),
    ("SELECT cramersV(a, b) AS r FROM (SELECT arrayJoin([(1,1),(2,2),(1,1)]) AS t, t.1 AS a, t.2 AS b)",
     None),
    ("SELECT sumMap(k, v) AS r FROM (SELECT arrayJoin([([1,2],[10,20]),([1],[5])]) AS t, t.1 AS k, t.2 AS v)",
     None),
    # --- misc scalar stragglers ---
    ("SELECT toBool('true') AS r", True),
    ("SELECT accurateCastOrNull(-1, 'UInt8') AS r", None),
    ("SELECT toUInt8OrDefault('nope', toUInt8(7)) AS r", 7),
]


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp())
        .getOrCreate()
    )
    from clickhouse_arrow_spark.client import Client

    c = Client(spark)
    n_pass = n_mis = n_err = 0
    for sql, exp in CASES:
        try:
            v = c.query_ch(sql).collect()[0].r
            if exp is None:
                n_pass += 1
                print(f"RUN   {sql[7:70]:64s} -> {v!r:.60s}")
            elif v == exp or (
                isinstance(exp, float)
                and isinstance(v, float)
                and abs(v - exp) < 1e-9
            ):
                n_pass += 1
                print(f"PASS  {sql[7:70]:64s}")
            else:
                n_mis += 1
                print(f"MISM  {sql[7:70]:64s} -> {v!r} want {exp!r}")
        except Exception as e:
            n_err += 1
            print(f"ERR   {sql[7:70]:64s} -> {type(e).__name__}: "
                  f"{str(e)[:90]}")
    print(f"\n{n_pass} pass / {n_mis} mismatch / {n_err} err "
          f"of {len(CASES)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
