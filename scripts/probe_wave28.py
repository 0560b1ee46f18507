#!/usr/bin/env python
"""Wave-28 execution probe: date/constructor stragglers + the
conversion/empty-aggregate/arithmetic CORNER matrix (the silent
wrong-answer class). Found and fixed: makeDateTime64,
arrayFirst/LastOrNull, lazy throwIf, concatWithSeparatorAssumeInjective,
and the intDiv FLOOR-division bug (CH rounds toward -inf; Spark's DIV
truncates — intDiv(-7, 2) returned -3)."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CASES = [
    ("SELECT makeDateTime64(2023, 1, 1, 0, 0, 0, 500) AS r", None),
    ("SELECT arrayFirstOrNull(x -> x > 5, [1, 2]) AS r", None),
    ("SELECT arrayLastOrNull(x -> x > 1, [1, 2, 3]) AS r", 3),
    ("SELECT throwIf(0, 'nope') AS r", 0),
    ("SELECT concatWithSeparatorAssumeInjective('|', 'a', 'b') AS r",
     "a|b"),
    # conversion corners
    ("SELECT toInt64OrNull('x') AS r", None),
    ("SELECT toInt64OrZero('x') AS r", 0),
    ("SELECT toDateOrNull('xx') AS r", None),
    ("SELECT toInt32OrDefault('bad', 42) AS r", 42),
    # empty-input aggregates
    ("SELECT sum(x) AS r FROM (SELECT 1 AS x WHERE false)", None),
    ("SELECT count(x) AS r FROM (SELECT 1 AS x WHERE false)", 0),
    ("SELECT groupArray(x) AS r FROM (SELECT 1 AS x WHERE false)", []),
    ("SELECT uniq(x) AS r FROM (SELECT 1 AS x WHERE false)", 0),
    # arithmetic corners (the intDiv finding)
    ("SELECT intDiv(-7, 2) AS r", -4),
    ("SELECT intDiv(7, -2) AS r", -4),
    ("SELECT intDiv(-7, -2) AS r", 3),
    ("SELECT intDivOrZero(-7, 2) AS r", -4),
    ("SELECT intDivOrZero(5, 0) AS r", 0),
    ("SELECT modulo(-7, 2) AS r", -1),
    ("SELECT divide(1, 0) AS r", float("inf")),
    ("SELECT intDiv(7, 2) AS r", 3),
    # calendar edges
    ("SELECT toDate('2020-02-29') + INTERVAL 1 YEAR AS r", None),
    ("SELECT addMonths(toDate('2020-01-31'), 1) AS r", None),
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
            if exp is None and "OrNull" not in sql and "sum(" not in sql:
                n_pass += 1
                print(f"RUN   {sql[7:70]:64s} -> {v!r:.60s}")
            elif v == exp or (exp is None and v is None):
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
