#!/usr/bin/env python
"""Round-13: sub-phase profile of shingle_minhash_lsh's steady rep
(VERDICT r12 task #3). Splits one bench-shape repetition into
driver-side build vs the eager persist jobs vs the final execute, by
timing the operator's internal milestones on a fresh plan build.

Usage: python scripts/r13_lsh_profile.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from clickhouse_arrow_spark.operators import dedup
    from clickhouse_arrow_spark.session import get_spark
    from clickhouse_arrow_spark.sources import register_tables

    spark = get_spark(app_name="r13-lsh-profile")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, SF_DIR)
    spark.sql("SELECT count(*) FROM lineitem").collect()

    def one_rep() -> dict[str, float]:
        t: dict[str, float] = {}
        t0 = time.perf_counter()
        df = dedup.minhash_verified_pairs(
            spark.table("documents"), est_threshold=0.5, verify_threshold=0.9
        ).orderBy("a_id", "b_id")
        t["build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t["execute"] = time.perf_counter() - t0
        # bench.py's steady series does NOT clear the cache between
        # reps (only between queries) — identical persisted plans hit
        # the CacheManager across reps. KEEPCACHE=0 measures the
        # cold-per-rep shape instead.
        if os.environ.get("KEEPCACHE", "1") != "1":
            spark.catalog.clearCache()
        return t

    # warmups
    for _ in range(2):
        one_rep()
    series: list[dict[str, float]] = [one_rep() for _ in range(reps)]
    for k in ("build", "execute"):
        vals = [s[k] for s in series]
        print(
            f"{k}: median {statistics.median(vals):.3f}s "
            f"spread {max(vals) - min(vals):.3f}s"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
