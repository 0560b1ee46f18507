#!/usr/bin/env python
"""Wave-32 execution probe: aggregate NULL/empty-set corners, ORDER BY
NULL placement defaults, toWeek/toDayOfWeek mode matrix, LIMIT BY
offset, FINAL + modifier combos, argMin/argMax NULL skipping, window
frame defaults, countIf NULL conditions, arrayJoin empty arrays."""

from __future__ import annotations

import math
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CASES = [
    # --- aggregate NULL skipping (CH aggregates skip NULLs) ---
    ("SELECT avg(x) AS r FROM (SELECT arrayJoin([1, NULL, 3]) AS x)", 2.0),
    ("SELECT count(x) AS r FROM (SELECT arrayJoin([1, NULL, 3]) AS x)", 2),
    ("SELECT any(x) AS r FROM (SELECT arrayJoin([NULL, 7]) AS x)", 7),
    ("SELECT argMax(a, b) AS r FROM (SELECT arrayJoin([(1, 10), (2, NULL), (3, 5)]) AS t, t.1 AS a, t.2 AS b)", 1),
    ("SELECT argMin(a, b) AS r FROM (SELECT arrayJoin([(1, 10), (3, 5)]) AS t, t.1 AS a, t.2 AS b)", 3),
    # countIf with NULL condition counts false
    ("SELECT countIf(x > 1) AS r FROM (SELECT arrayJoin([1, NULL, 3]) AS x)", 1),
    ("SELECT sumIf(x, x > 1) AS r FROM (SELECT arrayJoin([1, NULL, 3]) AS x)", 3),
    # --- empty-set aggregates (probed partially in wave 28) ---
    ("SELECT argMax(1, 1) AS r FROM (SELECT 1 WHERE false)", None),
    ("SELECT anyLast(x) AS r FROM (SELECT 1 AS x WHERE false)", None),
    ("SELECT topKArray(2)([1, 1, 2]) AS r", None),
    # --- ORDER BY NULL placement: CH puts NULLs LAST in ASC by default ---
    ("SELECT arrayStringConcat(arrayMap(x -> coalesce(toString(x), 'N'), "
     "groupArray(v)) , ',') AS r FROM (SELECT arrayJoin([3, NULL, 1]) AS v "
     "ORDER BY v ASC)", "1,3"),  # groupArray skips NULLs in CH too
    ("SELECT arrayStringConcat(arrayMap(x -> coalesce(toString(x), 'N'), "
     "groupArray(v)) , ',') AS r FROM (SELECT arrayJoin([3, NULL, 1]) AS v "
     "ORDER BY v DESC)", "3,1"),
    # --- toWeek / toDayOfWeek mode matrix ---
    ("SELECT toDayOfWeek(toDate('2024-01-07')) AS r", 7),          # Sunday, ISO
    ("SELECT toDayOfWeek(toDate('2024-01-07'), 1) AS r", None),    # run: mode 1
    ("SELECT toWeek(toDate('2024-01-01')) AS r", 0),               # mode 0: week starts Sunday, first week needs a Sunday in-year
    ("SELECT toWeek(toDate('2024-01-07')) AS r", 1),
    ("SELECT toISOWeek(toDate('2024-12-30')) AS r", 1),            # ISO rolls into next year
    # --- LIMIT BY with OFFSET ---
    ("SELECT arrayStringConcat(groupArray(toString(v)), ',') AS r FROM "
     "(SELECT arrayJoin([1, 1, 1, 2, 2]) AS k, "
     "arrayJoin([1]) AS one, k * 10 + 1 AS v "
     "LIMIT 1, 1 BY k)", None),
    # --- scalar subquery empty -> CH returns default/throws? Spark NULL ---
    ("SELECT (SELECT 1 WHERE false) AS r", None),
    # --- IN with NULL: CH x IN (NULL) is 0, not NULL ---
    ("SELECT 1 IN (NULL) AS r", None),  # CH returns 0; Spark NULL -- PARITY note
    ("SELECT NULL IN (1) AS r", None),
    # --- if() with non-bool int condition (CH truthiness) ---
    ("SELECT if(2, 'a', 'b') AS r", "a"),
    ("SELECT if(0, 'a', 'b') AS r", "b"),
    # --- string to date implicit parse in comparison ---
    ("SELECT toDate('2024-01-02') > '2024-01-01' AS r", 1),
    # --- window frame default: running sum with ORDER BY = cumulative ---
    ("SELECT max(s) AS r FROM (SELECT sum(v) OVER (ORDER BY v) AS s "
     "FROM (SELECT arrayJoin([1, 2, 3]) AS v))", 6),
    # --- nested arrayJoin over empty array yields no rows ---
    ("SELECT count() AS r FROM (SELECT arrayJoin(CAST([] AS Array(Int64))) AS x)", 0),
    # --- uniqExactIf, combinator over parametric edge ---
    ("SELECT uniqExactIf(x, x > 1) AS r FROM (SELECT arrayJoin([1, 2, 2, 3]) AS x)", 2),
    # --- quantileExactExclusive / Inclusive tiers ---
    ("SELECT quantileExactInclusive(0.5)(x) AS r FROM (SELECT arrayJoin([1, 2, 3, 4]) AS x)", 2.5),
    ("SELECT quantileExactExclusive(0.5)(x) AS r FROM (SELECT arrayJoin([1, 2, 3, 4]) AS x)", 2.5),
    # --- corr/covar on constant input: CH nan ---
    ("SELECT isNaN(corr(x, y)) AS r FROM (SELECT arrayJoin([1, 1]) AS x, 2 AS y)", 1),
    # --- leadInFrame default third arg ---
    ("SELECT max(l) AS r FROM (SELECT leadInFrame(v, 1, -1) OVER "
     "(ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS l "
     "FROM (SELECT arrayJoin([1, 2]) AS v))", 2),
    # --- aggregate-through-null-array lambda ---
    ("SELECT arraySum(x -> coalesce(x, 0), [1, NULL, 3]) AS r", 4),
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
            if isinstance(v, bool):
                vv = int(v)
            ok = False
            if exp is None:
                ok = v is None
            elif isinstance(exp, float):
                ok = v is not None and math.isclose(float(v), exp, rel_tol=1e-9)
            elif isinstance(exp, int):
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
