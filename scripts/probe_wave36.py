#!/usr/bin/env python
"""Probe wave 36 (round 10, closing sweep): 30 common ClickHouse
idioms from families no previous wave executed end-to-end, each
checked against a hand-derived expectation from the CH docs. Result:
29/30 VALUE-exact; the single delta is the documented bridge-widening
class — toStartOf{Month,Quarter,Year,Week} return a Spark TIMESTAMP at
midnight where CH returns a Date (identical under CAST AS DATE; every
corpus oracle shares the timestamp spelling, so this is recorded in
docs/PARITY.md rather than changed). Exit non-zero on any VALUE
mismatch."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

PROBES = [
    ("toMonday(toDate('2024-03-07'))", "2024-03-04"),
    ("toQuarter(toDate('2024-08-16'))", "3"),
    # CH returns Date; engine returns the midnight TIMESTAMP —
    # value-compared through CAST AS DATE (documented widening)
    ("CAST(toStartOfQuarter(toDate('2024-08-16')) AS Date)",
     "2024-07-01"),
    ("arrayStringConcat(arrayMap(x -> toString(x), "
     "arrayDifference([1, 4, 2])), ',')", "0,3,-2"),
    ("arrayStringConcat(arrayMap(x -> toString(x), "
     "arrayCumSum([1, 2, 3])), ',')", "1,3,6"),
    ("substringUTF8('héllo', 2, 3)", "éll"),
    ("trimBoth('  x  ')", "x"),
    ("toDayOfYear(toDate('2024-03-01'))", "61"),
    ("dateName('weekday', toDate('2024-03-04'))", "Monday"),
    ("toYYYYMMDD(toDate('2024-03-05'))", "20240305"),
    ("toYYYYMMDDhhmmss(TIMESTAMP '2024-03-05 07:08:09')",
     "20240305070809"),
    ("age('year', toDate('2023-03-05'), toDate('2024-03-04'))", "0"),
    ("toRelativeDayNum(toDate('1970-01-10'))", "9"),
    ("arrayStringConcat(arrayMap(x -> toString(x), "
     "arrayCompact([1, 1, 2, 2, 1])), ',')", "1,2,1"),
    ("indexOf([10, 20, 30], 20)", "2"),
    ("indexOf([10], 99)", "0"),
    ("countEqual([1, 2, 1], 1)", "2"),
    ("bitCount(7)", "3"),
    ("roundToExp2(100)", "64"),
    ("intDivOrZero(5, 0)", "0"),
    ("moduloOrZero(5, 0)", "0"),
    ("ifNull(NULL, 3)", "3"),
    ("assumeNotNull(toNullable(5))", "5"),
    ("length(toFixedString('ab', 4))", "4"),
    ("startsWith('hello', 'he')", "true"),
    ("formatReadableQuantity(1234567)", "1.23 million"),
    ("transform(2, [1, 2], ['a', 'b'], 'z')", "b"),
    ("transform(9, [1, 2], ['a', 'b'], 'z')", "z"),
    ("parseDateTimeOrZero('garbage', '%Y-%m-%d')",
     "1970-01-01 00:00:00"),
    ("toStartOfISOYear(toDate('2024-12-30'))", "2024-12-30"),
]


def main() -> int:
    from pyspark.sql import SparkSession

    from clickhouse_arrow_spark.builder import ClientBuilder

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("probe-wave36")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    client = ClientBuilder().with_session(spark).build()
    fails = []
    for expr, want in PROBES:
        got = client.query_ch(f"SELECT {expr} AS x").collect()[0]["x"]
        gs = str(got).lower() if isinstance(got, bool) else str(got)
        ok = gs == want
        print(("ok  " if ok else "FAIL"), expr, "->", gs)
        if not ok:
            fails.append((expr, gs, want))
    spark.stop()
    if fails:
        print(f"\n{len(fails)} mismatches: {fails}")
        return 1
    print(f"\nall {len(PROBES)} wave-36 probes green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
