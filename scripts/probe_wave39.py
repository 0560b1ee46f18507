#!/usr/bin/env python
"""Probe wave 39 (round 12): residual-family discovery sweep over the
groups the wave-38 sweep deferred (VERDICT r11 task #6) — series/
timeSeries experimental ops, width_bucket edge grid, query-format
adjacents, NLP detect*/lemmatize, geo WKT readers, base64URL family,
ports/certificates, numericIndexedVector, LowCardinality/Dynamic
introspection, and the leftover UTF8/CaseInsensitive variants of
implemented families.

Two-phase protocol: (1) DISCOVERY pushed ~120 residual names through
translate_ch_sql with realistic argument shapes and triaged every
verbatim survivor live (all were clean UNRESOLVED failures — no silent
same-name/different-semantics leak was found; width_bucket, overlay and
largestTriangleThreeBuckets turned out value-correct already);
(2) fixes: base64URL{Encode,Decode}/tryBase64URLDecode,
stringJaccardIndexUTF8, toTimezone alias, overlayUTF8,
IPv4NumToStringClassC, countSubstrings*UTF8,
multiSearchFirstPosition{CaseInsensitive,UTF8,...}, icebergTruncate,
subtractInterval, stringBytesUniq/stringBytesEntropy,
toStringCutToZero, getSettingOrDefault; sipHash128[Keyed]/intHash32/
intHash64/wyHash64 joined the engine-hash gate and ~35 names became
guided refusals. Exit non-zero on any mismatch."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

PROBES = [
    # width_bucket: PostgreSQL semantics both engines (hand grid)
    ("widthBucket(10.15, -8.6, 21, 4)", "3"),
    ("widthBucket(-10, -8.6, 21, 4)", "0"),
    ("widthBucket(21, -8.6, 21, 4)", "5"),   # max is exclusive
    ("widthBucket(22, -8.6, 21, 4)", "5"),
    ("widthBucket(-8.6, -8.6, 21, 4)", "1"),
    # overlay: SQL-standard 1-based replace, len defaults to |replace|
    ("overlay('Spark SQL', '_', 6)", "Spark_SQL"),
    ("overlayUTF8('München2024', 'xx', 3)", "Müxxhen2024"),
    # base64 URL alphabet (RFC 4648 §5, unpadded like CH)
    ("base64URLEncode('https://clickhouse.com')",
     "aHR0cHM6Ly9jbGlja2hvdXNlLmNvbQ"),
    ("base64URLDecode('aHR0cHM6Ly9jbGlja2hvdXNlLmNvbQ')",
     "https://clickhouse.com"),
    ("tryBase64URLDecode('####')", ""),
    ("tryBase64URLDecode('YWJj')", "abc"),
    ("stringJaccardIndexUTF8('abc', 'bcd')", "0.5"),
    ("toString(toTimezone(toDateTime('2024-01-01 00:00:00'), 'UTC'))",
     "2024-01-01 00:00:00"),
    ("IPv4NumToStringClassC(3232235777)", "192.168.1.xxx"),
    ("countSubstringsCaseInsensitiveUTF8('AbaBa', 'ba')", "2"),
    ("countSubstringsUTF8('ababa', 'ab')", "2"),
    ("multiSearchFirstPositionCaseInsensitive('HeLLo', ['ll', 'xx'])", "3"),
    ("multiSearchFirstPositionUTF8('hello', ['ll'])", "3"),
    # Iceberg truncate transform (published spec: floor to width)
    ("icebergTruncate(10, 37)", "30"),
    ("icebergTruncate(10, -7)", "-10"),
    ("icebergTruncate(3, 'iceberg')", "ice"),
    ("toString(subtractInterval(toDateTime('2024-01-02 00:00:00'), "
     "INTERVAL 1 DAY))", "2024-01-01 00:00:00"),
    # byte statistics (hand values: 'hello' -> {h,e,l,o};
    # H(aab) = -(2/3)log2(2/3) - (1/3)log2(1/3); 'é' is 2 UTF-8 bytes)
    ("stringBytesUniq('hello')", "4"),
    ("stringBytesUniq('é')", "2"),
    ("stringBytesUniq('')", "0"),
    ("round(stringBytesEntropy('aab'), 6)", "0.918296"),
    ("round(stringBytesEntropy('abcd'), 6)", "2.0"),
    ("toStringCutToZero(concat('ab', chr(0), 'cd'))", "ab"),
    ("getSettingOrDefault('no_such_custom', 7)", "7"),
]

REFUSALS = [
    "detectLanguage", "detectLanguageMixed", "detectCharset",
    "detectTonality", "detectProgrammingLanguage", "lemmatize",
    "synonyms", "readWKTPoint", "readWKTPolygon",
    "structureToCapnProtoSchema", "mysqlPort", "postgresqlPort",
    "grpcPort", "showCertificate", "numericIndexedVectorBuild",
    "toIPv6OrZero", "arrayLevenshteinDistanceWeighted", "arraySimilarity",
    "sparseGrams", "sparseGramsHashes", "timeSeriesChangesToGrid",
    "timeSeriesLastTwoSamples", "estimateCompressionRatio",
    "globalVariable", "lowCardinalityIndices", "lowCardinalityKeys",
    "arrayEnumerateDenseRanked", "arrayEnumerateUniqRanked",
    "zookeeperPath", "isDynamicElementInSharedData",
    # engine hashes (joined _ENGINE_HASHES this wave)
    "sipHash128", "intHash32", "intHash64", "wyHash64",
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
        .appName("probe-wave39")
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
    print(f"\nall {len(PROBES)} wave-39 probes green + "
          f"{len(REFUSALS)} guided refusals")
    return 0


if __name__ == "__main__":
    sys.exit(main())
