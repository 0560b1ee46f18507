#!/usr/bin/env python
"""Wave-27 execution probe: CH idioms with documented expected values,
run through query_ch. Families: MySQL-arg-order traps (locate),
positional search with start, vector norms/normalize, bitmap
aggregates, CH window functions, printf/tokens/splitByWhitespace,
timezone scalar functions, formatDateTime specifier matrix, misc
stragglers."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CASES = [
    # --- search arg-order traps ---
    ("SELECT position('Hello, world!', '!') AS r", 13),
    ("SELECT position('hello', 'l', 4) AS r", 4),
    ("SELECT locate('ca', 'abca') AS r", 3),  # MySQL order: needle 1st
    ("SELECT positionUTF8('привет мир', 'мир') AS r", 8),
    ("SELECT countSubstringsCaseInsensitive('AAaa', 'aa') AS r", 2),
    ("SELECT multiSearchAnyCaseInsensitive('HELLO', ['hello']) AS r", 1),
    ("SELECT endsWith('Spark', 'rk') AS r", True),
    ("SELECT startsWithUTF8('приставка', 'при') AS r", True),
    # --- vector norms / normalize / distances ---
    ("SELECT L2Norm([3, 4]) AS r", 5.0),
    ("SELECT L1Norm([1, -2, 3]) AS r", 6),
    ("SELECT LinfNorm([1, -7, 3]) AS r", 7),
    ("SELECT L2SquaredNorm([3, 4]) AS r", 25.0),
    ("SELECT L2Normalize([3, 4]) AS r", None),
    ("SELECT L1Normalize([1, 3]) AS r", None),
    ("SELECT dotProduct([1, 2], [3, 4]) AS r", 11),
    ("SELECT L2SquaredDistance([1, 2], [4, 6]) AS r", 25.0),
    ("SELECT cosineDistance([1, 0], [0, 1]) AS r", 1.0),
    # --- bitmap aggregates (roaring <-> distinct arrays) ---
    ("SELECT groupBitmap(x) AS r FROM (SELECT arrayJoin([1, 1, 2, 3]) AS x)",
     3),
    ("SELECT bitmapCardinality(bitmapBuild([1, 2, 2, 3])) AS r", 3),
    ("SELECT bitmapMin(bitmapBuild([4, 2, 9])) AS r", 2),
    ("SELECT bitmapMax(bitmapBuild([4, 2, 9])) AS r", 9),
    ("SELECT bitmapToArray(bitmapAnd(bitmapBuild([1,2,3]), "
     "bitmapBuild([2,3,4]))) AS r", [2, 3]),
    ("SELECT bitmapSubsetInRange(bitmapBuild([1,5,9]), 2, 9) AS r",
     None),
    # --- window functions (CH names/forms) ---
    ("SELECT max(n) AS r FROM (SELECT ntile(2) OVER (ORDER BY x) AS n "
     "FROM (SELECT arrayJoin([1,2,3,4]) AS x))", 2),
    ("SELECT sum(f) AS r FROM (SELECT first_value(x) OVER "
     "(ORDER BY x) AS f FROM (SELECT arrayJoin([3,1,2]) AS x))", 3),
    ("SELECT max(l) AS r FROM (SELECT lagInFrame(x, 1, 0) OVER "
     "(ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
     "FOLLOWING) AS l FROM (SELECT arrayJoin([1,2,3]) AS x))", 2),
    ("SELECT max(r2) AS r FROM (SELECT nth_value(x, 2) OVER "
     "(ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
     "FOLLOWING) AS r2 FROM (SELECT arrayJoin([5,1,3]) AS x))", 3),
    ("SELECT row_number() OVER () AS r FROM numbers(1)", 1),
    # --- printf / format / tokens / splits ---
    ("SELECT printf('%d-%s', 5, 'x') AS r", "5-x"),
    ("SELECT tokens('Hello, world!') AS r", ["Hello", "world"]),
    ("SELECT splitByWhitespace('a  b\tc') AS r", ["a", "b", "c"]),
    ("SELECT arrayStringConcat(splitByChar(',', '1,2,3'), '|') AS r",
     "1|2|3"),
    ("SELECT toValidUTF8('ok') AS r", "ok"),
    ("SELECT repeat('ab', 3) AS r", "ababab"),
    # --- timezone scalars ---
    ("SELECT timeZoneOf(toTimeZone(toDateTime('2023-01-01 00:00:00'), "
     "'UTC')) AS r", None),
    ("SELECT toString(toTimeZone(toDateTime('2023-01-01 12:00:00'), "
     "'UTC')) AS r", None),
    ("SELECT timeZone() AS r", None),
    # --- formatDateTime specifier matrix (CH %-codes) ---
    ("SELECT formatDateTime(toDate('2010-01-04'), '%Y-%m-%d') AS r",
     "2010-01-04"),
    ("SELECT formatDateTime(toDateTime('2010-01-04 12:34:56'), "
     "'%H:%M:%S') AS r", "12:34:56"),
    ("SELECT formatDateTime(toDate('2010-01-04'), '%j') AS r", "004"),
    ("SELECT formatDateTime(toDate('2010-01-04'), '%a %b') AS r",
     "Mon Jan"),
    ("SELECT formatDateTime(toDate('2010-01-04'), '%W') AS r",
     "Monday"),
    ("SELECT formatDateTime(toDateTime('2010-01-04 02:34:56'), "
     "'%I %p') AS r", "02 AM"),
    ("SELECT formatDateTime(toDate('2010-01-04'), '%e') AS r", " 4"),
    ("SELECT formatDateTime(toDate('2010-01-04'), '%D') AS r",
     "01/04/10"),
    ("SELECT formatDateTime(toDate('2010-01-04'), '%F') AS r",
     "2010-01-04"),
    ("SELECT formatDateTime(toDateTime('2010-01-04 12:34:56'), "
     "'%T') AS r", "12:34:56"),
    ("SELECT formatDateTime(toDate('2010-01-04'), '%%Y') AS r", "%Y"),
    ("SELECT parseDateTime('2021-01-04 23:00:00', "
     "'%Y-%m-%d %H:%i:%s') AS r", None),
    # --- misc scalar stragglers ---
    ("SELECT materialize(42) AS r", 42),
    ("SELECT ignore(1, 'x') AS r", 0),
    ("SELECT currentDatabase() AS r", None),
    ("SELECT currentUser() AS r", None),
    ("SELECT version() AS r", None),
    ("SELECT hostName() AS r", None),
    ("SELECT countDigits(12345) AS r", 5),
    ("SELECT toFixedString('ab', 4) AS r", None),
    ("SELECT reverse([1, 2, 3]) AS r", [3, 2, 1]),
    ("SELECT arrayRotateRight([1,2,3,4,5], 2) AS r", [4, 5, 1, 2, 3]),
    ("SELECT arrayShiftRight([1,2,3,4], 1, 9) AS r", [9, 1, 2, 3]),
    ("SELECT mapUpdate(map('a', 1, 'b', 2), map('b', 9)) AS r", None),
    ("SELECT mapContainsKeyLike(map('ab', 1, 'cd', 2), 'a%') AS r",
     True),
    ("SELECT mapExtractKeyLike(map('ab', 1, 'cd', 2), 'a%') AS r",
     None),
    ("SELECT greatest(1, 5, 3) AS r", 5),
    ("SELECT least(4, 2, 8) AS r", 2),
    ("SELECT concatAssumeInjective('a', 'b') AS r", "ab"),
    ("SELECT toJSONString([1, 2, 3]) AS r", "[1,2,3]"),
    ("SELECT toJSONString(map('a', 1)) AS r", None),
    ("SELECT transform(3, [1, 2], ['a', 'b']) AS r", None),
    ("SELECT extractAllGroupsVertical('a=1, b=2', '(\\\\w)=(\\\\d)') AS r",
     None),
    ("SELECT extractAllGroupsHorizontal('a=1, b=2', '(\\\\w)=(\\\\d)') AS r",
     None),
    ("SELECT replaceRegexpAll('aaa', 'a', 'b') AS r", "bbb"),
    ("SELECT replaceRegexpOne('aaa', 'a', 'b') AS r", "baa"),
    ("SELECT defaultValueOfTypeName('Int64') AS r", 0),
    ("SELECT toColumnTypeName(1) AS r", None),
    ("SELECT sleepEachRow(0) AS r", None),
    # --- aggregates round-out ---
    ("SELECT quantileExactWeighted(0.5)(x, w) AS r FROM "
     "(SELECT arrayJoin([(1,1),(2,9),(3,1)]) AS t, t.1 AS x, t.2 AS w)",
     2),
    ("SELECT medianTiming(x) AS r FROM (SELECT arrayJoin([10, 20, 30]) AS x)",
     20.0),
    ("SELECT topKWeighted(1)(x, w) AS r FROM "
     "(SELECT arrayJoin([(1,1),(2,9)]) AS t, t.1 AS x, t.2 AS w)",
     None),
    ("SELECT groupArraySample(2)(x) AS r FROM "
     "(SELECT arrayJoin([1,2,3,4]) AS x)", None),
    ("SELECT any(x) AS r FROM (SELECT arrayJoin([7, 8]) AS x)", None),
    ("SELECT first_value(x) AS r FROM (SELECT arrayJoin([7, 8]) AS x)",
     None),
    ("SELECT last_value(x) AS r FROM (SELECT arrayJoin([7, 8]) AS x)",
     None),
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
