#!/usr/bin/env python
"""Wave-30 execution probe: silent-divergence corners not covered by
waves 22-29 — CH banker's rounding on floats, integer-cast wraparound,
NULL propagation in greatest/least, bit-shift-by-width, dateDiff
boundary-crossing semantics, negative-length left/right, rounding
helpers (roundAge/roundDuration/roundDown/roundToExp2), array padding
(arrayResize), plus the still-missing names (soundex, hopStart/hopEnd,
toRelativeQuarterNum, hasTokenOrNull, uniqUpTo execution)."""

from __future__ import annotations

import math
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CASES = [
    # --- CH rounds floats with banker's rounding (round-half-to-even) ---
    ("SELECT round(2.5) AS r", 2.0),
    ("SELECT round(3.5) AS r", 4.0),
    ("SELECT round(-2.5) AS r", -2.0),
    ("SELECT round(0.125, 2) AS r", 0.12),
    ("SELECT round(2.5, 0) AS r", 2.0),
    # --- integer casts WRAP in CH (mod 2^width), Spark saturates/nulls ---
    ("SELECT toUInt8(300) AS r", 44),
    ("SELECT toInt8(128) AS r", -128),
    ("SELECT toUInt16(65541) AS r", 5),
    ("SELECT toInt16(32768) AS r", -32768),
    ("SELECT toUInt8(-1) AS r", 255),
    ("SELECT toInt32(2147483648) AS r", -2147483648),
    # --- NULL propagation: CH greatest/least return NULL on any NULL ---
    ("SELECT greatest(1, NULL) AS r", None),
    ("SELECT least(1, NULL) AS r", None),
    ("SELECT greatest(3, 1, 2) AS r", 3),
    # --- bit shifts: CH shifts >= width produce 0, Spark mods the shift ---
    ("SELECT bitShiftLeft(1, 64) AS r", 0),
    ("SELECT bitShiftLeft(1, 70) AS r", 0),
    ("SELECT bitShiftRight(256, 4) AS r", 16),
    ("SELECT bitShiftRight(1, 64) AS r", 0),
    # --- dateDiff counts UNIT-BOUNDARY crossings, not elapsed units ---
    ("SELECT dateDiff('month', toDate('2024-01-31'), toDate('2024-02-01')) AS r", 1),
    ("SELECT dateDiff('year', toDate('2023-12-31'), toDate('2024-01-01')) AS r", 1),
    ("SELECT dateDiff('week', toDate('2024-01-06'), toDate('2024-01-08')) AS r", 1),
    ("SELECT dateDiff('day', toDateTime('2024-01-01 23:59:59'), toDateTime('2024-01-02 00:00:01')) AS r", 1),
    ("SELECT dateDiff('hour', toDateTime('2024-01-01 10:59:00'), toDateTime('2024-01-01 11:01:00')) AS r", 1),
    # --- negative lengths: left/right drop |n| from the other end ---
    ("SELECT left('hello', -2) AS r", "hel"),
    ("SELECT right('hello', -2) AS r", "llo"),
    ("SELECT substring('hello', -3) AS r", "llo"),
    ("SELECT leftPad('abc', 2) AS r", "ab"),
    # --- rounding helpers ---
    ("SELECT roundToExp2(20) AS r", 16),
    ("SELECT roundDown(5, [1, 4, 6]) AS r", 4),
    ("SELECT roundDown(0, [1, 4, 6]) AS r", 1),
    ("SELECT roundAge(30) AS r", 25),
    ("SELECT roundDuration(45) AS r", 30),
    # --- arrays: arrayResize PADS with the type default ---
    ("SELECT arrayResize([1, 2, 3], 5) AS r", [1, 2, 3, 0, 0]),
    ("SELECT arrayResize([1, 2, 3], 2) AS r", [1, 2]),
    ("SELECT arrayCumSumNonNegative([1, -5, 3]) AS r", [1, 0, 3]),
    ("SELECT arrayDifference([1, 4, 9]) AS r", [0, 3, 5]),
    ("SELECT arrayCompact([1, 1, 2, 2, 1]) AS r", [1, 2, 1]),
    ("SELECT arrayJaccardIndex([1, 2], [2, 3]) AS r", 1.0 / 3.0),
    ("SELECT range(5, 1, -1) AS r", [5, 4, 3, 2]),
    ("SELECT emptyArrayToSingle(emptyArrayUInt8()) AS r", [0]),
    ("SELECT indexOf([1, 2, 3], 2) AS r", 2),
    ("SELECT countEqual([1, 2, 2], 2) AS r", 2),
    # --- math corners ---
    ("SELECT pow(0, 0) AS r", 1.0),
    ("SELECT intExp2(10) AS r", 1024),
    ("SELECT intExp10(3) AS r", 1000),
    ("SELECT exp2(3) AS r", 8.0),
    ("SELECT exp10(2) AS r", 100.0),
    ("SELECT cbrt(27) AS r", 3.0),
    ("SELECT degrees(pi()) AS r", 180.0),
    ("SELECT isFinite(1 / 0) AS r", 0),
    ("SELECT ifNotFinite(1 / 0, 42) AS r", 42.0),
    ("SELECT bitCount(255) AS r", 8),
    ("SELECT bitHammingDistance(111, 109) AS r", 1),
    ("SELECT positiveModulo(-7, 2) AS r", 1),
    ("SELECT trunc(-2.7) AS r", -2.0),
    # --- strings ---
    ("SELECT countSubstrings('aaaa', 'aa') AS r", 2),
    # modern CH discards the remainder (includes_remaining default 0)
    ("SELECT splitByChar(',', 'a,b,,c', 2) AS r", ["a", "b"]),
    ("SELECT arrayStringConcat(['a', 'b'], '-') AS r", "a-b"),
    ("SELECT toDecimalString(64.32, 5) AS r", "64.32000"),
    ("SELECT transform(2, [1, 2, 3], ['a', 'b', 'c'], 'z') AS r", "b"),
    ("SELECT multiIf(1 = 2, 1, 1 = 1, 2, 3) AS r", 2),
    # --- missing-name candidates (expect ERR today; decide fix/refuse) ---
    ("SELECT soundex('jumped') AS r", "J513"),
    ("SELECT hasTokenOrNull('ab cd', 'ab') AS r", 1),
    ("SELECT hasTokenOrNull('ab cd', 'ab cd') AS r", None),
    ("SELECT hopStart(toDateTime('2024-07-03 11:20:00'), INTERVAL 1 DAY, INTERVAL 3 DAY) AS r", "2024-07-01 00:00:00"),
    ("SELECT hopEnd(toDateTime('2024-07-03 11:20:00'), INTERVAL 1 DAY, INTERVAL 3 DAY) AS r", "2024-07-04 00:00:00"),
    ("SELECT toRelativeQuarterNum(toDate('2023-05-01')) AS r", 8093),
    ("SELECT uniqUpTo(3)(x) AS r FROM (SELECT explode(sequence(1, 5)) AS x)", 4),
    ("SELECT sumCount(x) AS r FROM (SELECT explode(sequence(1, 3)) AS x)", None),
    ("SELECT minSampleSizeConversion(0.25, 0.03, 0.80, 0.05) AS r", None),
    ("SELECT minSampleSizeContinuous(112.25, 510.1, 0.05, 0.8, 0.05) AS r", None),
    ("SELECT byteSwap(3351772109) AS r", 3455829959),
    ("SELECT kostikConsistentHash(16045690984833335023, 2) AS r", 1),
    ("SELECT normalizedQueryHash('SELECT 1 AS x') AS r", None),
    ("SELECT variantElement(CAST('hi' AS String), 'String') AS r", None),
    ("SELECT encrypt('aes-256-cbc', 'x', 'k') AS r", None),
    ("SELECT exponentialTimeDecayedSum(10)(1.0, 0.0) AS r", None),
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
            if isinstance(v, str) and exp is not None and not isinstance(exp, str):
                pass
            vv = v
            if hasattr(v, "isoformat"):
                vv = str(v)
                if len(vv) == 10 and isinstance(exp, str):
                    vv = vv + " 00:00:00"
            ok = False
            if exp is None:
                ok = v is None
            elif isinstance(exp, float):
                ok = v is not None and math.isclose(float(v), exp, rel_tol=1e-9, abs_tol=1e-12)
            elif isinstance(exp, list):
                ok = v is not None and [x for x in v] == exp
            else:
                ok = vv == exp or v == exp
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
                  f"{str(e)[:110]}")
    print(f"\n{n_pass} pass / {n_mis} mismatch / {n_err} err of {len(CASES)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
