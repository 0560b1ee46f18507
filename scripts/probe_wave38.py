#!/usr/bin/env python
"""Probe wave 38 (round 11): systematic leak-discovery sweep — ~190
ClickHouse function names from the docs were pushed through
translate_ch_sql and every name that survived VERBATIM without a
same-semantics Spark builtin was triaged. The sweep also RE-CONFIRMED
the wave-27 `locate` adjudication: modern CH (>= 24.3) uses the MySQL
(needle, haystack) argument order — exactly Spark's — so the
pass-through is value-correct and must NOT be swapped (a draft swap
here broke the wave-27 gate within minutes; the gate did its job).
Closed this wave: sign/sgn rendered -1.0 (CH returns Int8), mismatches
(byteHammingDistance alias), substringIndexUTF8, normalizeL1/Linf,
arrayROCAUC, YYYYMMDDToDate32 saturation, the changeYear..changeSecond
family (day-saturating recomposition), UUIDv7ToDateTime,
bitPositionsToArray, the parseReadableSize family, basename,
MACNumToString/MACStringToNum/MACStringToOUI, tupleElement (literal),
toIPv4OrZero, httpPort/getServerPort, currentSchemas, FQDN,
randomFixedString/PrintableASCII/UTF8; 16 new guided refusals for the
no-analogue remainder (16-bit floats, 128-bit IPv6 math, geobase
regionTo*, transactions, ZooKeeper, fuzzers). Exit non-zero on any
mismatch."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

PROBES = [
    # modern CH locate = MySQL (needle, haystack) order == Spark's
    ("locate('ca', 'abca')", "3"),
    ("locate('ca', 'abca', 4)", "0"),
    ("mismatches('abcd', 'abcf')", "1"),
    ("sgn(-5)", "-1"),
    ("sign(2.5)", "1"),
    ("substringIndexUTF8('a.b.c', '.', 2)", "a.b"),
    ("arrayStringConcat(arrayMap(x -> toString(round(x, 2)), "
     "normalizeL1([1.0, 3.0])), ',')", "0.25,0.75"),
    ("arrayStringConcat(arrayMap(x -> toString(round(x, 2)), "
     "normalizeLinf([2.0, -4.0])), ',')", "0.5,-1.0"),
    ("toString(YYYYMMDDToDate32(23000101))", "2299-12-31"),  # saturates
    ("toString(YYYYMMDDToDate32(20240315))", "2024-03-15"),
    # changeYear saturates Feb-29 to the target year's month end
    ("toString(changeYear(toDateTime('2020-02-29 10:00:00'), 2021))",
     "2021-02-28 10:00:00"),
    ("toString(changeMonth(toDateTime('2024-01-31 05:00:00'), 2))",
     "2024-02-29 05:00:00"),
    ("toString(changeHour(toDateTime('2024-01-01 05:06:07'), 23))",
     "2024-01-01 23:06:07"),
    ("toString(changeSecond(toDateTime('2024-01-01 05:06:07'), 59))",
     "2024-01-01 05:06:59"),
    # UUIDv7: first 48 bits are unix millis
    ("toString(UUIDv7ToDateTime('018f05af-f4a8-778f-86c2-3dbe0ee1f1d5'))",
     "2024-04-22 12:02:48.616"),
    ("arrayStringConcat(arrayMap(x -> toString(x), "
     "bitPositionsToArray(10)), ',')", "1,3"),
    ("bitPositionsToArray(0)", "[]"),
    ("parseReadableSize('1.5 KiB')", "1536"),
    ("parseReadableSize('3 MB')", "3000000"),
    ("parseReadableSizeOrZero('bogus')", "0"),
    ("parseReadableSizeOrNull('2 GiB')", "2147483648"),
    ("parseReadableSizeOrNull('nope')", "None"),
    ("basename('/a/b/file.txt')", "file.txt"),
    ("basename('c:\\\\dir\\\\f.bin')", "f.bin"),
    ("MACNumToString(1108152157446)", "01:02:03:04:05:06"),
    ("MACStringToNum('01:02:03:04:05:06')", "1108152157446"),
    ("MACStringToOUI('01:02:03:04:05:06')", "66051"),
    ("tupleElement(tuple(7, 'x'), 1)", "7"),
    ("tupleElement(tuple(7, 'x'), 2)", "x"),
    ("httpPort()", "8123"),
    ("getServerPort('http_port')", "8123"),
    ("toIPv4OrZero('not-an-ip')", "0.0.0.0"),
    ("toIPv4OrZero('10.0.0.1')", "10.0.0.1"),
    ("length(randomPrintableASCII(12))", "12"),
    ("arrayStringConcat(currentSchemas(true), ',')", "default"),
]

REFUSALS = [
    "toBFloat16", "toFloat16", "arrayPartialShuffle", "IPv4ToIPv6",
    "cutIPv6", "IPv6CIDRToRange", "tupleConcat", "arrayAUCPR",
    "regionToName", "regionToCity", "generateRandomStructure",
    "fuzzBits", "getClientHTTPHeader", "transactionID",
    "transactionLatestSnapshot", "zookeeperSessionUptime", "tcpPort",
]


def main() -> int:
    from pyspark.sql import SparkSession

    from clickhouse_arrow_spark.builder import ClientBuilder
    from clickhouse_arrow_spark.dialect import (
        UntranslatableFunctionError,
        translate_ch_sql,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("probe-wave38")
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
    for fn in REFUSALS:
        try:
            translate_ch_sql(f"SELECT {fn}(x) FROM t")
            fails.append((fn, "translated", "guided refusal"))
            print("FAIL", fn, "-> translated (should refuse)")
        except UntranslatableFunctionError:
            print("ok  ", fn, "-> guided refusal")
    spark.stop()
    if fails:
        print(f"\n{len(fails)} mismatches: {fails}")
        return 1
    print(f"\nall {len(PROBES)} wave-38 probes green + "
          f"{len(REFUSALS)} guided refusals")
    return 0


if __name__ == "__main__":
    sys.exit(main())
