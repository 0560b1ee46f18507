#!/usr/bin/env python
"""Probe wave 35 (round 10, VERDICT r9 task #3): execute the previously
unswept families end-to-end and compare against hand-derived ClickHouse
semantics (docs + AggregateFunctionWindowFunnel.h /
AggregateFunctionSequenceMatch.h). Run AFTER the fixes; each probe
prints got-vs-expected and the script exits non-zero on any mismatch —
the permanent regression record of what the wave found.

Finds this wave (all fixed in the same round):
1. windowFunnel did NOT re-anchor on later cond-1 events (CH's
   event_idx==0 branch overwrites the chain start): [1@0, 1@100, 2@105]
   window 10 returned 1, CH returns 2. REWORKED to CH's per-level
   algorithm (operators/funnel.py).
2. strict_order broke on tracked out-of-order events; CH only breaks on
   rows matching NO condition (collected as event 0 under this mode).
3. strict_dedup froze on CONSECUTIVE same-condition events; CH stops on
   any MID-CHAIN repeat of an already-REACHED level k >= 2 and returns
   k ([A,B,B,C] returns 2, not 3) — while a repeat AFTER the chain
   completed is shielded by CH's early return at the last level.
4. sequenceMatchEvents: not implemented at all -> new operator
   (timestamps of the first match's (?N) events, shared matcher).
5. uniqCombined(precision)(x): the parameter was not accepted (bare
   rename only) -> precision now maps to approx_count_distinct's rsd
   via 1.04/sqrt(2^p), 12..20 enforced.
6. formatDateTime %M rendered MINUTES (pre-23.4 CH); modern CH renders
   the FULL MONTH NAME by default -> dynamic, with the
   formatdatetime_parsedatetime_m_is_month_name setting honored
   statement- and session-scoped.
7. formatDateTime %G/%V/%g/%u/%w/%C refused (no Java letters Spark
   accepts) -> expression splice (generalized from the %e mechanism).
8. toDate32 passed out-of-range dates through; CH SATURATES at
   [1900-01-01, 2299-12-31] -> clamped (plain + OrNull/OrZero forms).
9. toStartOfISOYear: missing -> Jan-4-moved-to-Monday formula.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

FAILURES: list[str] = []


def check(name, got, want):
    ok = got == want
    print(f"{'ok  ' if ok else 'FAIL'} {name}: got={got!r} want={want!r}")
    if not ok:
        FAILURES.append(name)


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from clickhouse_arrow_spark.builder import ClientBuilder
    from clickhouse_arrow_spark.operators.funnel import (
        sequence_match_events,
        window_funnel,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-wave35")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # Spark's HLL++ buffer at uniqCombined(17)'s rsd is ~350 KB per
        # task buffer — the default 1g probe heap is marginal under 8
        # concurrent tasks
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    client = ClientBuilder().with_session(spark).build()

    def funnel(rows, modes=(), window=10):
        df = spark.createDataFrame(rows, "u long, t double, e string")
        out = window_funnel(
            df, "u", "t",
            [F.col("e") == "A", F.col("e") == "B", F.col("e") == "C"],
            window, modes=modes,
        ).collect()
        return out[0]["funnel_level"]

    # 1. re-anchoring (CH AggregateFunctionWindowFunnel.h event_idx==0)
    check("funnel re-anchor",
          funnel([(1, 0.0, "A"), (1, 100.0, "A"), (1, 105.0, "B")]), 2)
    # 2. strict_order: tracked repeats don't break; untracked rows do
    check("strict_order tracked repeat ok",
          funnel([(1, 1.0, "A"), (1, 2.0, "A"), (1, 3.0, "B"),
                  (1, 4.0, "C")], ("strict_order",), 100), 3)
    check("strict_order untracked breaks (docs A,B,D,C)",
          funnel([(1, 1.0, "A"), (1, 2.0, "B"), (1, 3.0, "X"),
                  (1, 4.0, "C")], ("strict_order",), 100), 2)
    # 3. strict_dedup: a MID-CHAIN repeat of a reached level stops and
    # returns that level (a repeat after completion is shielded by
    # CH's early return when the last level is hit)
    check("strict_dedup mid-chain repeat returns its level",
          funnel([(1, 1.0, "A"), (1, 2.0, "B"), (1, 3.0, "B"),
                  (1, 4.0, "C")], ("strict_dedup",), 100), 2)
    check("strict_dedup repeat after completion shielded",
          funnel([(1, 1.0, "A"), (1, 2.0, "B"), (1, 3.0, "C"),
                  (1, 4.0, "B")], ("strict_dedup",), 100), 3)
    # 4. sequenceMatchEvents (docs example shape)
    rows = [(1, 1.0, 1), (1, 2.0, 3), (1, 3.0, 2), (1, 4.0, 1),
            (1, 5.0, 4)]
    df = spark.createDataFrame(rows, "u long, t double, number int")
    ev = sequence_match_events(
        df, "u", "t", "(?1).*(?2).*(?3)",
        [F.col("number") == 1, F.col("number") == 2,
         F.col("number") == 4],
    ).collect()[0]["event_times"]
    check("sequenceMatchEvents docs example", list(ev), [1.0, 3.0, 5.0])
    # 5. uniqCombined precision parameter accepted
    r = client.query_ch(
        "SELECT uniqCombined(17)(number) AS u FROM numbers(1000)"
    ).collect()[0]
    check("uniqCombined(17) in envelope", abs(r["u"] - 1000) <= 100, True)
    # 6. %M month name by default; legacy via setting
    r = client.query_ch(
        "SELECT formatDateTime(TIMESTAMP '2024-03-05 07:08:09', '%M') "
        "AS m"
    ).collect()[0]
    check("formatDateTime %M modern", r["m"], "March")
    r = client.query_ch(
        "SELECT formatDateTime(TIMESTAMP '2024-03-05 07:08:09', '%M') "
        "AS m SETTINGS formatdatetime_parsedatetime_m_is_month_name = 0"
    ).collect()[0]
    check("formatDateTime %M legacy setting", r["m"], "08")
    # 7. ISO/numeric-weekday splices
    r = client.query_ch(
        "SELECT formatDateTime(TIMESTAMP '2024-12-30 07:00:00', "
        "'%G|%g|%V|%u|%w|%C') AS x"
    ).collect()[0]
    check("formatDateTime ISO splices", r["x"], "2025|25|01|1|1|20")
    # 8. Date32 saturation
    r = client.query_ch(
        "SELECT toDate32('2300-06-01') AS hi, toDate32('1899-06-01') "
        "AS lo"
    ).collect()[0]
    check("toDate32 saturates high", str(r["hi"]), "2299-12-31")
    check("toDate32 saturates low", str(r["lo"]), "1900-01-01")
    # 9. toStartOfISOYear
    r = client.query_ch(
        "SELECT toStartOfISOYear(toDate('2024-12-30')) AS a, "
        "toStartOfISOYear(toDate('2024-06-01')) AS b"
    ).collect()[0]
    check("toStartOfISOYear wk1", str(r["a"]), "2024-12-30")
    check("toStartOfISOYear mid-year", str(r["b"]), "2024-01-01")

    spark.stop()
    if FAILURES:
        print(f"\n{len(FAILURES)} probe failures: {FAILURES}")
        return 1
    print("\nall wave-35 probes green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
