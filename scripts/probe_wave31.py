#!/usr/bin/env python
"""Wave-31 execution probe: value-level corners in families present
since early waves but never probed with exact expected values — hex
byte-width padding, URL part extraction, IPv4 codecs and range tests,
formatReadable* exact strings, date-name/YYYYMMDD composites, interval
constructors, timeSlots step arg, UUID codecs."""

from __future__ import annotations

import math
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CASES = [
    # --- hex/unhex: CH pads integers to the TYPE's byte width ---
    ("SELECT hex(255) AS r", "FF"),
    ("SELECT hex(1) AS r", "01"),
    ("SELECT hex(256) AS r", "0100"),
    ("SELECT hex('ab') AS r", "6162"),
    ("SELECT unhex('6162') AS r", "ab"),
    ("SELECT bin(1) AS r", "00000001"),
    # --- URL parts ---
    ("SELECT domain('https://www.example.com:443/a/b?q=1#f') AS r", "www.example.com"),
    ("SELECT domainWithoutWWW('https://www.example.com/a') AS r", "example.com"),
    ("SELECT topLevelDomain('https://www.example.com/a') AS r", "com"),
    ("SELECT protocol('https://example.com/a') AS r", "https"),
    ("SELECT port('https://example.com:8123/a') AS r", 8123),
    ("SELECT path('https://example.com/a/b?q=1') AS r", "/a/b"),
    ("SELECT pathFull('https://example.com/a/b?q=1') AS r", "/a/b?q=1"),
    ("SELECT queryString('https://example.com/a?q=1&w=2#f') AS r", "q=1&w=2"),
    ("SELECT fragment('https://example.com/a#frag') AS r", "frag"),
    ("SELECT extractURLParameter('http://e.com/?a=1&b=2', 'b') AS r", "2"),
    ("SELECT cutQueryString('http://e.com/a?q=1') AS r", "http://e.com/a"),
    ("SELECT netloc('https://u:p@example.com:8080/a') AS r", "u:p@example.com:8080"),
    ("SELECT decodeURLComponent('a%20b%2Fc') AS r", "a b/c"),
    ("SELECT encodeURLComponent('a b/c') AS r", "a%20b%2Fc"),
    ("SELECT firstSignificantSubdomain('https://news.example.co.uk/') AS r", "example"),
    ("SELECT cutToFirstSignificantSubdomain('https://news.example.co.uk/') AS r", "example.co.uk"),
    # --- IPv4/IPv6 ---
    ("SELECT IPv4NumToString(3232235521) AS r", "192.168.0.1"),
    ("SELECT IPv4StringToNum('192.168.0.1') AS r", 3232235521),
    ("SELECT isIPAddressInRange('127.0.0.1', '127.0.0.0/8') AS r", 1),
    ("SELECT isIPAddressInRange('128.0.0.1', '127.0.0.0/8') AS r", 0),
    ("SELECT IPv4CIDRToRange(toIPv4('192.168.5.2'), 16).1 AS r", "192.168.0.0"),
    ("SELECT toIPv4('1.2.3.4') AS r", "1.2.3.4"),
    # --- formatReadable* exact strings ---
    ("SELECT formatReadableSize(1024) AS r", "1.00 KiB"),
    ("SELECT formatReadableSize(123456789) AS r", "117.74 MiB"),
    ("SELECT formatReadableQuantity(1234000) AS r", "1.23 million"),
    ("SELECT formatReadableDecimalSize(1000000) AS r", "1.00 MB"),
    # --- date names / composites ---
    ("SELECT monthName(toDate('2024-03-05')) AS r", "March"),
    ("SELECT dateName('weekday', toDate('2024-01-01')) AS r", "Monday"),
    ("SELECT dateName('month', toDate('2024-03-05')) AS r", "March"),
    ("SELECT toYYYYMM(toDate('2024-03-05')) AS r", 202403),
    ("SELECT toYYYYMMDD(toDate('2024-03-05')) AS r", 20240305),
    ("SELECT toYYYYMMDDhhmmss(toDateTime('2024-03-05 07:08:09')) AS r", 20240305070809),
    ("SELECT toISOWeek(toDate('2024-01-01')) AS r", 1),
    ("SELECT toISOYear(toDate('2023-01-01')) AS r", 2022),
    ("SELECT toLastDayOfMonth(toDate('2024-02-15')) AS r", "2024-02-29"),
    ("SELECT toQuarter(toDate('2024-05-01')) AS r", 2),
    # --- intervals / slots ---
    ("SELECT toDateTime('2024-01-01 00:00:00') + toIntervalHour(5) AS r", "2024-01-01 05:00:00"),
    ("SELECT toDateTime('2024-01-01 00:00:00') + toIntervalMonth(2) AS r", "2024-03-01 00:00:00"),
    ("SELECT length(timeSlots(toDateTime('2024-01-01 00:10:00'), toUInt32(3600), 600)) AS r", 7),
    # --- UUID codecs ---
    ("SELECT toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS r", "61f0c404-5cb3-11e7-907b-a6006ad3dba0"),
    ("SELECT UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS r", None),
    ("SELECT hex(UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0')) AS r", "61F0C4045CB311E7907BA6006AD3DBA0"),
    # --- misc numerics ---
    ("SELECT arrayProduct([2, 3, 4]) AS r", 24.0),
    ("SELECT arrayAvg([1, 2, 3]) AS r", 2.0),
    ("SELECT greatCircleDistance(-56.0, 38.9, -77.0, 38.9) AS r", None),
    ("SELECT pointInPolygon((3.0, 3.0), [(6, 0), (8, 4), (5, 8), (0, 2)]) AS r", 1),
    ("SELECT normalizeQuery('SELECT 25 AS x FROM t WHERE y = 7') AS r", None),
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
            vv = str(v) if hasattr(v, "isoformat") else v
            if isinstance(v, (bytes, bytearray)):
                vv = v.decode("utf-8", "replace")
            ok = False
            if exp is None:
                ok = v is None
            elif isinstance(exp, float):
                ok = v is not None and math.isclose(float(v), exp, rel_tol=1e-9)
            elif isinstance(exp, int) and not isinstance(exp, bool):
                ok = v is not None and not isinstance(v, str) and int(v) == exp
            else:
                ok = vv == exp
            if ok:
                n_pass += 1
                print(f"PASS  {sql[7:75]:68s}")
            elif exp is None:
                n_pass += 1
                print(f"RUN   {sql[7:75]:68s} -> {vv!r:.60s}")
            else:
                n_mis += 1
                print(f"MISM  {sql[7:75]:68s} -> {vv!r} want {exp!r}")
        except Exception as e:
            n_err += 1
            print(f"ERR   {sql[7:75]:68s} -> {type(e).__name__}: "
                  f"{str(e)[:100]}")
    print(f"\n{n_pass} pass / {n_mis} mismatch / {n_err} err of {len(CASES)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
