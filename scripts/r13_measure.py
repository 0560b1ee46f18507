#!/usr/bin/env python
"""Round-13 optimization measurement harness (guide §1).

Modes:
  plans <tag>   — capture .explain('formatted') for every HEADLINE query
                  into plans/r13/<name>_<tag>.txt (tag = before|after),
                  plus an exchange/plan-shape summary line per query.
  time [reps]   — noop-sink steady timing per headline query on a quiet
                  machine (median of `reps`, default 5, after 2 warmups),
                  printed as JSON. Mirrors bench.py methodology exactly
                  but runnable per-query while iterating.

Usage: python scripts/r13_measure.py plans before
       SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/r13_measure.py time
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")


def plan_summary(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # count DISTINCT numbered operators `(N) OpName`: InMemoryRelation
    # nodes re-print their cached subplans (same numbers), so deduping
    # by (N, name) counts each physical node once
    import re

    nodes = set(re.findall(r"\((\d+)\) ([A-Za-z]+)", plan))
    names = [n for _, n in nodes]

    def cnt(tok: str) -> int:
        return sum(1 for n in names if tok in n)

    n_ex = cnt("Exchange")  # incl. BroadcastExchange
    n_bhj = cnt("BroadcastHashJoin")
    n_smj = cnt("SortMergeJoin")
    n_shj = cnt("ShuffledHashJoin")
    n_py = cnt("BatchEvalPython") + cnt("ArrowEvalPython")
    n_mip = cnt("MapInPandas") + cnt("MapInArrow")
    line = (
        f"# shape (distinct numbered nodes; cached-subplan reprints "
        f"deduped): Exchange={n_ex} BHJ={n_bhj} SMJ={n_smj} SHJ={n_shj} "
        f"PyEval={n_py} MapInPandas={n_mip}"
    )
    return line + "\n\n" + plan


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "plans"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"

    from clickhouse_arrow_spark.queries import load_all
    from clickhouse_arrow_spark.session import get_spark
    from clickhouse_arrow_spark.sources import register_tables

    spark = get_spark(app_name=f"r13-measure-{mode}")
    registry = load_all()
    headline = {n: s for n, s in sorted(registry.items()) if s.headline}
    register_tables(spark, SF_DIR)
    spark.sql("SELECT count(*) FROM lineitem").collect()

    only = os.environ.get("R13_ONLY")
    if only:
        wanted = set(only.split(","))
        headline = {n: s for n, s in headline.items() if n in wanted}

    if mode == "plans":
        os.makedirs(PLAN_DIR, exist_ok=True)
        for name, spec in headline.items():
            spark.sparkContext.setJobDescription(f"r13 plan: {name}")
            df = spec.build(spark, SF_DIR)
            out = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
            with open(out, "w") as fh:
                fh.write(plan_summary(df))
            print(f"{name}: wrote {out}")
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    elif mode == "time":
        reps = int(tag) if tag.isdigit() else 5
        out: dict[str, object] = {}
        for name, spec in headline.items():
            spark.sparkContext.setJobDescription(f"r13 time: {name}")
            for _ in range(2):  # warmups (bench.py steady_method)
                spec.build(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            series = []
            for _ in range(reps):
                t0 = time.perf_counter()
                spec.build(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                series.append(time.perf_counter() - t0)
            out[name] = {
                "median": round(statistics.median(series), 4),
                "spread": round(max(series) - min(series), 4),
            }
            print(f"  {name}: {out[name]}", file=sys.stderr)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out))
    else:
        print(f"unknown mode {mode}", file=sys.stderr)
        return 2
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
