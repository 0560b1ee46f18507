#!/usr/bin/env python
"""Wave-23 execution probe: CH idioms with documented expected values,
run through query_ch. Reports PASS / MISMATCH / ERR per idiom — the
input for the next dialect-fix batch (waves 10/11/13/20/22 pattern)."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CASES = [
    # (sql returning one column r, expected python value or None=run-only)
    ("SELECT transform(2, [1, 2, 3], ['a', 'b', 'c'], 'z') AS r", "b"),
    ("SELECT transform(9, [1, 2], ['a', 'b'], 'z') AS r", "z"),
    ("SELECT arrayRotateLeft([1,2,3,4,5], -2) AS r", [4, 5, 1, 2, 3]),
    ("SELECT arrayShiftLeft([1,2,3,4], -1, 0) AS r", [0, 1, 2, 3]),
    ("SELECT arrayZip([1,2],['a','b']) AS r", None),
    ("SELECT arrayAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1]) AS r", 0.75),
    ("SELECT arrayCumSumNonNegative([1, 1, -4, 1]) AS r", [1, 2, 0, 1]),
    ("SELECT bitHammingDistance(111, 183) AS r", 3),
    ("SELECT bitTestAll(43, 0, 1, 3, 5) AS r", 1),
    ("SELECT bitTestAny(43, 2, 4) AS r", 0),
    ("SELECT countSubstrings('aaaa', 'aa') AS r", 2),
    ("SELECT positionCaseInsensitive('Hello', 'LL') AS r", 3),
    ("SELECT leftPad('abc', 7, '*') AS r", "****abc"),
    ("SELECT rightPad('abc', 7, '*') AS r", "abc****"),
    ("SELECT trimBoth('xxhixx', 'x') AS r", "hi"),
    ("SELECT splitByRegexp('\\\\d+', 'a1b22c') AS r", ["a", "b", "c"]),
    ("SELECT toTypeName(1 + 1) AS r", None),
    ("SELECT toDecimalString(64.32, 5) AS r", "64.32000"),
    ("SELECT formatReadableQuantity(1024000) AS r", "1.02 million"),
    ("SELECT reinterpretAsUInt8('a') AS r", 97),
    ("SELECT toUUIDOrNull('nope') AS r", None),
    ("SELECT arrayDifference([1, 4, 2]) AS r", [0, 3, -2]),
    ("SELECT arrayCompact([1, 1, 2, 2, 1]) AS r", [1, 2, 1]),
    ("SELECT arraySplit((x, y) -> y, [1,2,3,4,5], [1,0,0,1,0]) AS r",
     None),
    ("SELECT hasSubstr([1,2,3,4], [2,3]) AS r", 1),
    ("SELECT hasSubstr([1,2,3,4], [3,2]) AS r", 0),
    ("SELECT indexOf([10, 20, 30], 20) AS r", 2),
    ("SELECT arrayLast(x -> x < 3, [1, 2, 3]) AS r", 2),
    ("SELECT arrayFirstIndex(x -> x > 1, [1, 2, 3]) AS r", 2),
    ("SELECT arrayLastIndex(x -> x < 3, [1, 2, 3]) AS r", 2),
    ("SELECT countEqual([1, 2, 2, 3], 2) AS r", 2),
    ("SELECT startsWith('Spark', 'Sp') AS r", True),
    ("SELECT wordShingleMinHash('a b c d e') AS r", None),
    ("SELECT cutToFirstSignificantSubdomain('https://news.clickhouse.com.tr/x') AS r",
     "clickhouse.com.tr"),
    ("SELECT firstSignificantSubdomain('http://sub.example.co.uk/a') AS r",
     "example"),
    ("SELECT domainWithoutWWW('http://www.example.com/a') AS r",
     "example.com"),
    ("SELECT toYearWeek(toDate('2023-01-02')) AS r", 202301),
    ("SELECT toISOYear(toDate('2017-01-01')) AS r", 2016),
    ("SELECT toRelativeHourNum(toDateTime(7200)) AS r", 2),
    ("SELECT dateName('weekday', toDate('2023-04-21')) AS r", "Friday"),
    ("SELECT toQuarter(toDate('2023-05-05')) AS r", 2),
    ("SELECT intExp2(10) AS r", 1024),
    ("SELECT intExp10(3) AS r", 1000),
    ("SELECT divideDecimal(toDecimal64(10.5, 2), toDecimal64(2.5, 2)) AS r",
     None),
    ("SELECT isFinite(1/0) AS r", False),
    ("SELECT ifNotFinite(1/0, 42) AS r", 42.0),
    ("SELECT bar(5, 0, 10, 10) AS r", None),
    ("SELECT arrayStringConcat(extractAll('a1b22', '\\\\d+'), '|') AS r",
     "1|22"),
    ("SELECT ngramDistance('ClickHouse', 'ClickHose') AS r", None),
    ("SELECT toUnixTimestamp64Nano(toDateTime64('1970-01-01 00:00:01', 3)) AS r",
     1_000_000_000),
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
                print(f"RUN   {sql[7:64]:58s} -> {v!r:.60s}")
            elif v == exp or (
                isinstance(exp, float)
                and isinstance(v, float)
                and abs(v - exp) < 1e-9
            ):
                n_pass += 1
                print(f"PASS  {sql[7:64]:58s}")
            else:
                n_mis += 1
                print(f"MISM  {sql[7:64]:58s} -> {v!r} want {exp!r}")
        except Exception as e:
            n_err += 1
            print(f"ERR   {sql[7:64]:58s} -> {type(e).__name__}: "
                  f"{str(e)[:90]}")
    print(f"\n{n_pass} pass / {n_mis} mismatch / {n_err} err "
          f"of {len(CASES)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
