#!/usr/bin/env python
"""sf1 verification of the windowFunnel family on a deterministic user
subset (round-12 sf1 adjudication, docs/SCALE.md).

The FULL-population DuckDB oracle for events_funnel_family /
events_window_funnel_sql is the exists-subsequence formulation, whose
depth-3 check is a triple self-join of the per-user event stream: at
sf1 (1M events, ~15k users × ~66 events) that is ~4.3B intermediate
rows — DuckDB spilled past the machine's 78 GB of free temp space and
aborted (`verify_sf1_r12.log`). The ENGINE side is one keyed
aggregation + an O(levels) array fold and finishes in seconds; only
the oracle explodes.

This script re-verifies both funnel queries at sf1 on the
`user_id % 20 = 0` subpopulation — BOTH engines see the identically
filtered table, every retained user keeps their COMPLETE event stream
(the funnel fold's scale-sensitive dimension is per-user group size,
which in this dataset does not grow with SF), and the oracle's
intermediate shrinks 20x into tractable range. Exits non-zero on any
value mismatch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1data/sf1"
MOD = int(os.environ.get("SF1_FUNNEL_USER_MOD", "20"))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from scripts.verify_sim import canonical

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    duck = duckdb.connect()
    for t in ("events",):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}') "
            f"WHERE user_id % {MOD} = 0"
        )

    failures = []
    for name in ("events_funnel_family", "events_window_funnel_sql"):
        t0 = time.perf_counter()
        sdf = qs[name](spark, SF_DIR)
        # impose the same subpopulation on the Spark side AFTER build:
        # every query here keys on user_id, so a post-filter equals a
        # pre-filter (per-user computations see complete streams)
        sdf = sdf.where(f"user_id % {MOD} = 0")

        def _naive(pdf):
            # the synthesized sf1 parquet is Spark-written, i.e.
            # UTC-ADJUSTED timestamps: DuckDB reads them tz-aware
            # ("+00:00" suffix) while Spark session-renders naive —
            # identical instants, different strings. Strip tz on both
            # sides (the driver's real testdata is naive, so its gate
            # never sees this).
            for c in pdf.columns:
                if str(pdf[c].dtype).startswith("datetime64[") and getattr(
                    pdf[c].dtype, "tz", None
                ) is not None:
                    pdf[c] = pdf[c].dt.tz_localize(None)
            return pdf

        spark_rows = canonical(_naive(sdf.toPandas()))
        oracle_rows = canonical(_naive(duck.execute(oracles[name]).fetchdf()))
        dt = time.perf_counter() - t0
        ok = spark_rows == oracle_rows
        print(
            f"  {name}: {'MATCH' if ok else 'MISMATCH'} "
            f"({len(spark_rows)} vs {len(oracle_rows)} rows, {dt:.1f}s, "
            f"user_id % {MOD} = 0)"
        )
        if not ok:
            failures.append(name)
    spark.stop()
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print(f"funnel family at sf1 subset: all MATCH (mod {MOD})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
