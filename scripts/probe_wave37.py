#!/usr/bin/env python
"""Probe wave 37 (round 11): the judge-named unswept remainder from
VERDICT r10 — ngramSearch* (previously an UNRESOLVED_ROUTINE leak),
ngramDistance case/UTF8 variants, mapPartialSort / mapPartialReverseSort
/ arrayPartialReverseSort (full-sort instance of the partial-sort
contract, arrayPartialSort precedent), soundex (pass-through to Spark's
builtin, now PINNED on the classic values every major implementation
agrees on), and the round-11 toStartOf{Month,Quarter} Date-narrowing
(wave-36's single delta, now closed). Expectations hand-derived from CH
docs / the standard soundex algorithm. Exit non-zero on any mismatch."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

PROBES = [
    # ---- ngramSearch: multiset needle-gram containment / needle grams.
    # 'World Hello' needle grams (8): Worl orld "rld " "ld H" "d He"
    # " Hel" Hell ello; haystack 'Hello World' grams (8): Hell ello
    # "llo " "lo W" "o Wo" " Wor" Worl orld -> common 4 -> 0.5
    ("ngramSearch('Hello World', 'World Hello')", "0.5"),
    ("ngramSearch('Hello World', 'World')", "1.0"),       # Worl+orld both in
    ("ngramSearch('ClickHouse', 'House')", "1.0"),        # Hous+ouse both in
    ("ngramSearch('Hello World', 'xyzzy9')", "0.0"),
    ("ngramSearch('abc', 'abc')", "1.0"),                 # <4: single gram
    ("ngramSearch('abc', 'abd')", "0.0"),
    ("ngramSearch('x', '')", "1.0"),                      # empty needle
    ("ngramSearchCaseInsensitive('Hello World', 'HELLO')", "1.0"),
    ("ngramSearchUTF8('héllo wörld', 'wörld')", "1.0"),   # codepoint grams
    ("ngramSearchCaseInsensitiveUTF8('HÉLLO', 'héllo')", "1.0"),
    # ngramDistance variants (base form pinned since wave ~12)
    ("ngramDistanceCaseInsensitive('ABC', 'abc')", "0.0"),
    ("round(ngramDistance('ClickHouse', 'House'), 4)", "0.5556"),  # 5/9
    ("ngramDistanceUTF8('héllo', 'héllo')", "0.0"),
    # ---- partial sorts: full sort is a valid instance of "first n
    # sorted, rest unspecified" and the only deterministic one
    ("arrayStringConcat(mapKeys(mapPartialSort(2, "
     "map('c', 3, 'a', 1, 'b', 2))), ',')", "a,b,c"),
    ("arrayStringConcat(mapKeys(mapPartialReverseSort(2, "
     "map('c', 3, 'a', 1, 'b', 2))), ',')", "c,b,a"),
    ("arrayStringConcat(arrayMap(x -> toString(x), "
     "arrayPartialReverseSort(2, [1, 3, 2])), ',')", "3,2,1"),
    ("arrayStringConcat(arrayMap(x -> toString(x), "
     "arrayPartialSort(2, [3, 1, 2])), ',')", "1,2,3"),
    # ---- soundex: classic algorithm values (CH docs example 'aksel'
    # plus the census examples all implementations agree on)
    ("soundex('aksel')", "A240"),
    ("soundex('Robert')", "R163"),
    ("soundex('Rupert')", "R163"),
    ("soundex('Miller')", "M460"),
    ("soundex('Tymczak')", "T522"),
    ("soundex('Honeyman')", "H555"),
    ("soundex('Pfister')", "P236"),
    # ---- wave-36 delta closed: month-and-coarser toStartOf* are Date
    ("toString(toStartOfMonth(toDate('2024-03-15')))", "2024-03-01"),
    ("toString(toStartOfQuarter(toDate('2024-08-16')))", "2024-07-01"),
    ("toTypeName(toStartOfMonth(toDate('2024-03-15')))", "Date"),
    ("toTypeName(toStartOfQuarter(now()))", "Date"),
    # sub-day family stays DateTime on both engines
    ("toTypeName(toStartOfDay(now()))", "DateTime"),
    ("toString(toStartOfMonth(toDateTime('2024-03-15 13:45:00')))",
     "2024-03-01"),
]


def main() -> int:
    from pyspark.sql import SparkSession

    from clickhouse_arrow_spark.builder import ClientBuilder

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("probe-wave37")
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
    # refusal sweep: every text-fingerprint variant must resolve to a
    # guided refusal, never UNRESOLVED_ROUTINE
    from clickhouse_arrow_spark.dialect import (
        UntranslatableFunctionError,
        translate_ch_sql,
    )

    variants = []
    for base in ("ngramSimHash", "wordShingleSimHash", "ngramMinHash",
                 "wordShingleMinHash"):
        args = ("", "Arg") if "MinHash" in base else ("",)
        for arg in args:
            for suf in ("", "CaseInsensitive", "UTF8",
                        "CaseInsensitiveUTF8"):
                variants.append(base + arg + suf)
    for v in variants:
        try:
            translate_ch_sql(f"SELECT {v}(s) FROM t")
            fails.append((v, "translated", "guided refusal"))
            print("FAIL", v, "-> translated (should refuse)")
        except UntranslatableFunctionError:
            print("ok  ", v, "-> guided refusal")
    spark.stop()
    if fails:
        print(f"\n{len(fails)} mismatches: {fails}")
        return 1
    print(f"\nall {len(PROBES)} wave-37 probes green + "
          f"{len(variants)} guided refusals")
    return 0


if __name__ == "__main__":
    sys.exit(main())
