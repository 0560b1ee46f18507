#!/usr/bin/env python
"""Execution-probe wave 33: rankCorr, the -Resample combinator,
pure-bit H3 accessors, plus re-pins for the Time/geo idioms the scout
flagged. Pinned values derive from the published formulae (Spearman
rho with average ranks; the H3 index bit layout; CH -Resample bucket
semantics). Run: python scripts/probe_wave33.py"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PROBES = [
    # rankCorr: Spearman with average ranks
    ("SELECT rankCorr(a, b) AS r FROM (SELECT 1.0 AS a, 10.0 AS b "
     "UNION ALL SELECT 2.0, 20.0 UNION ALL SELECT 3.0, 30.0 "
     "UNION ALL SELECT 4.0, 41.0 UNION ALL SELECT 5.0, 35.0)", 0.9),
    # perfect monotone -> 1.0
    ("SELECT rankCorr(a, a * 2 + 1) AS r FROM "
     "(SELECT arrayJoin([1.0, 2.0, 3.0, 4.0]) AS a)", 1.0),
    # ties use AVERAGE ranks
    ("SELECT rankCorr(a, b) AS r FROM (SELECT 1.0 AS a, 1.0 AS b "
     "UNION ALL SELECT 1.0, 2.0 UNION ALL SELECT 2.0, 3.0)",
     math.sqrt(3) / 2),
    # -Resample combinator buckets
    ("SELECT countResample(0, 10, 5)(k) AS r FROM "
     "(SELECT arrayJoin([0.0, 1.0, 2.0, 5.0, 9.0]) AS k)", [3, 2]),
    ("SELECT sumResample(0, 10, 5)(x, x) AS r FROM "
     "(SELECT arrayJoin([1.0, 2.0, 6.0]) AS x)", [3.0, 6.0]),
    ("SELECT maxResample(0, 6, 3)(x, x) AS r FROM "
     "(SELECT arrayJoin([1.0, 2.0, 4.0]) AS x)", [2.0, 4.0]),
    # truncated last bucket: [4, 6) not [4, 8)
    ("SELECT countResample(0, 6, 4)(k) AS r FROM "
     "(SELECT arrayJoin([3.0, 5.0, 7.0]) AS k)", [1, 1]),
    # H3 pure-bit accessors (index layout: res bits 52-55, base 45-51)
    ("SELECT h3GetResolution(599686042433355775) AS r", 5),
    ("SELECT h3GetBaseCell(599686042433355775) AS r", 20),
    ("SELECT h3IsPentagon(599686042433355775) AS r", False),
    # res-3 center child of pentagon base cell 4
    ("SELECT h3IsPentagon(590112357393367039) AS r", True),
    # res-0 pentagon base cell 4 (all digits unset)
    ("SELECT h3IsPentagon(576636674163867647) AS r", True),
    # base 4 but non-center digits -> hexagon
    ("SELECT h3IsPentagon(585610338313961471) AS r", False),
]


def main() -> int:
    from pyspark.sql import SparkSession

    from clickhouse_arrow_spark.client import Client

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    client = Client(spark)
    bad = 0
    for sql, want in PROBES:
        try:
            got = client.query_ch(sql).collect()[0]["r"]
        except Exception as e:
            print(f"ERR  {sql[:70]} -- {str(e)[:90]}")
            bad += 1
            continue
        if isinstance(want, float):
            ok = got is not None and abs(got - want) < 1e-9
        elif isinstance(want, list):
            ok = list(got) == want
        else:
            ok = got == want
        print(("ok   " if ok else "FAIL ") + sql[:70] +
              ("" if ok else f" -> {got!r} != {want!r}"))
        bad += 0 if ok else 1
    print(f"{len(PROBES) - bad}/{len(PROBES)} ok")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
