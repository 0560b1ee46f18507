#!/usr/bin/env python
"""Round-10 proof-of-scale (VERDICT r9 task #1): run the UNCHANGED
headline query set at sf1 — 10x the bench-gated scale factor — and
record per-query sf0.1 -> sf1 time ratios WITH executed-plan exchange
counts asserted unchanged across scales.

Two artifacts:
- a persistent sf1 dataset at --out (default /root/repo/.sf1data),
  synthesized once by the key-shifted 10x replication recipe
  (scripts/tpch_scale_probe.scale_table — replica keys move into
  disjoint ranges, document text is salted so near-dup density stays
  constant); re-used if already present;
- a JSON report (default SCALE_SF1_r10.json): per query, cold + steady
  (median of 3 warm repeats) seconds at both SFs, the ratio, and the
  exchange count from the FINAL AQE plan at both SFs. Exit non-zero if
  any query's exchange count changes with scale (a plan that degrades
  at 10x would also degrade at 100 TB) — unless the change is a
  documented broadcast->shuffle AQE flip, which is reported loudly.

Then run `SPARK_GRAFT_SF_DIR=<out>/sf1 python bench.py` for the
BENCH-format artifact at sf1 (bench.py itself stays unchanged — the
task's point).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SRC_SF = "/root/testdata/sf0.1"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def ensure_sf1(spark, out_dir: str, replicas: int = 10) -> str:
    from scripts.tpch_scale_probe import scale_table

    sf1 = os.path.join(out_dir, "sf1")
    marker = os.path.join(sf1, "_SYNTH_OK")
    if os.path.exists(marker):
        return sf1
    os.makedirs(sf1, exist_ok=True)
    t0 = time.perf_counter()
    for table in TABLES:
        scale_table(spark, SRC_SF, sf1, table, replicas)
    with open(marker, "w") as fh:
        fh.write(f"replicas={replicas} sec={time.perf_counter() - t0:.1f}\n")
    return sf1


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1data"
    report_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_SF1_r10.json"

    from clickhouse_arrow_spark.queries import load_all
    from clickhouse_arrow_spark.session import get_spark
    from clickhouse_arrow_spark.sources import register_tables

    spark = get_spark(app_name="sf1-scale-proof")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    headline = {n: s for n, s in sorted(registry.items()) if s.headline}

    sf1_dir = ensure_sf1(spark, out_dir)

    def run_set(sf_dir: str) -> dict[str, dict]:
        register_tables(spark, sf_dir, force=True)
        spark.sql("SELECT count(*) FROM lineitem").collect()
        out: dict[str, dict] = {}
        for name, spec in headline.items():
            t0 = time.perf_counter()
            df = spec.build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            cold = time.perf_counter() - t0
            # exchange count from the FINAL plan of the executed run
            # (AQE re-planning reflected)
            plan = df._jdf.queryExecution().executedPlan().toString()
            exchanges = plan.count("Exchange hashpartitioning") + \
                plan.count("Exchange rangepartitioning")
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                spec.build(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                reps.append(time.perf_counter() - t0)
            out[name] = {
                "cold": round(cold, 3),
                "steady": round(statistics.median(reps), 3),
                "exchanges": exchanges,
            }
            spark.catalog.clearCache()
        return out

    base = run_set(SRC_SF)
    scaled = run_set(sf1_dir)

    rows = {}
    exchange_drift = []
    for n in headline:
        r = {
            "sf01_steady": base[n]["steady"],
            "sf1_steady": scaled[n]["steady"],
            "ratio": round(scaled[n]["steady"] / base[n]["steady"], 2)
            if base[n]["steady"] > 0 else None,
            "sf01_cold": base[n]["cold"],
            "sf1_cold": scaled[n]["cold"],
            "exchanges_sf01": base[n]["exchanges"],
            "exchanges_sf1": scaled[n]["exchanges"],
        }
        if base[n]["exchanges"] != scaled[n]["exchanges"]:
            exchange_drift.append(
                f"{n}: {base[n]['exchanges']} -> {scaled[n]['exchanges']}"
            )
        rows[n] = r

    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = None
    report = {
        "sf1_dir": sf1_dir,
        "queries": rows,
        "exchange_drift": exchange_drift,
        "loadavg_1_5_15": loadavg,
    }
    with open(report_path, "w") as fh:
        fh.write(json.dumps(report, indent=2))
    print(json.dumps(report))
    spark.stop()
    if exchange_drift:
        print("EXCHANGE-COUNT DRIFT (plan shape changed with scale):",
              file=sys.stderr)
        for d in exchange_drift:
            print(" -", d, file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
