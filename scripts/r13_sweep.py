#!/usr/bin/env python
"""Round-13: Spark-side noop-sink timing sweep over EVERY corpus query
(one warm rep after one untimed build) at $SPARK_GRAFT_SF_DIR — the
whole-corpus complement to bench.py's headline set, used to find
per-operator outliers the bench cannot see. Prints one JSON line of
{name: sec} sorted descending.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from clickhouse_arrow_spark.queries import load_all
    from clickhouse_arrow_spark.session import get_spark
    from clickhouse_arrow_spark.sources import register_tables

    spark = get_spark(app_name="r13-sweep")
    registry = load_all()
    register_tables(spark, SF_DIR)
    spark.sql("SELECT count(*) FROM lineitem").collect()

    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name, spec in sorted(registry.items()):
        if name.startswith("aaa_gate_"):
            continue  # alias of a natural query already swept
        spark.sparkContext.setJobDescription(f"r13 sweep: {name}")
        try:
            spec.build(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()  # untimed warm (codegen, footers)
            t0 = time.perf_counter()
            spec.build(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # streaming-only shapes etc.
            errs[name] = str(e)[:120]
        spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    out = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"sf_dir": SF_DIR, "times": out, "errors": errs}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
