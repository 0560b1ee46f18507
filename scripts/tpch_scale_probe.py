#!/usr/bin/env python
"""sf0.1 -> sf1 scaling probe over the REAL headline queries.

Synthesizes an sf1-equivalent dataset by replicating the driver's sf0.1
parquet 10x with key-shifting (orderkeys/custkeys/doc ids move into
disjoint ranges per replica; document text is salted per replica so the
near-dup density stays constant instead of every document gaining nine
exact copies), then runs the bench.py headline set at both scales and
reports per-query seconds + the sf1/sf0.1 ratio. A ratio near the data
ratio (10x) or below means the plan scales ~linearly; super-linear
ratios flag an operator whose cost curve bends the wrong way.

Also measures the bucketed fact layout at sf1: build cost vs per-query
saving (amortization break-even in queries).

Usage: python scripts/tpch_scale_probe.py [replicas] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SRC_SF = "/root/testdata/sf0.1"

#: per-table (key columns to shift, optional text column to salt).
#: Shift amounts are disjoint powers of ten well above each table's max
#: key so replicas never collide.
SCALE_RULES: dict[str, tuple[tuple[str, ...], str | None]] = {
    "orders": (("o_orderkey", "o_custkey"), None),
    "lineitem": (("l_orderkey", "l_partkey", "l_suppkey"), None),
    "customer": (("c_custkey",), None),
    "supplier": (("s_suppkey",), None),
    "part": (("p_partkey",), None),
    "events": (("event_id", "user_id"), None),
    "documents": (("doc_id",), "text"),
    "embeddings": (("vec_id",), None),
}

#: per-table vector column to PERTURB on replicas (round-13, VERDICT
#: r12 item 1): replicating `embeddings` verbatim planted 9 exact
#: clones of every vector, so `semantic_dedup(threshold=0.99)`
#: correctly killed them while the oracle's "everything survives"
#: premise (valid at the natural SFs) became false by construction —
#: the r12 sf1 ROWCOUNT MISMATCH. Replicas now get deterministic
#: multiplicative noise w_i = 1 + 0.8*u_i (u_i uniform-ish in [-1, 1]
#: from xxhash64(vec_id, _r, i)), which keeps E[cos(x, wx)] ≈
#: 1/sqrt(1 + 0.64/3) ≈ 0.91 and cross-replica cos ≈ 0.83 — far below
#: the 0.99 dedup threshold, so the oracle premise holds at every SF.
VEC_RULES: dict[str, str] = {"embeddings": "embedding"}

KEY_SHIFT = 100_000_000


def scale_table(spark, src_dir: str, dst_dir: str, table: str, replicas: int):
    from pyspark.sql import functions as F

    from clickhouse_arrow_spark.sources.registry import load_table

    df = load_table(spark, src_dir, table)
    path = os.path.join(dst_dir, f"{table}.parquet")
    if table not in SCALE_RULES:  # dims (nation/region) stay as-is
        df.write.mode("overwrite").parquet(path)
        return
    keys, salt_col = SCALE_RULES[table]
    rep = spark.range(0, replicas).select(F.col("id").alias("_r"))
    out = df.crossJoin(F.broadcast(rep))
    for k in keys:
        out = out.withColumn(k, F.col(k) + F.col("_r") * F.lit(KEY_SHIFT))
    if salt_col:
        # constant near-dup density: replicas are distinct documents,
        # not nine extra near-copies of every original. Round-13: the
        # old tail suffix (" replica N") only changed the LAST 2-3
        # shingles, so every long doc's 10 replicas were still a
        # 10-clique of TRUE near-dups (shingle Jaccard ~0.97 >= 0.9) —
        # super-linear pair growth that broke the neardup gate's
        # linear-candidate premise at sf1 and exploded its oracle.
        # Tagging every 7th word changes ~3/7 of the 3-shingles
        # (J ~= 0.4) and ~1/7 of the word set (J ~= 0.78), so replicas
        # are near-dups under NEITHER tier's threshold — density is
        # genuinely constant at every SF.
        salted = F.concat_ws(
            " ",
            F.expr(
                f"transform(split({salt_col}, ' '), (w, i) -> "
                f"IF(i % 7 = 0, concat(w, '0r', _r), w))"
            ),
        )
        out = out.withColumn(
            salt_col,
            F.when(F.col("_r") == 0, F.col(salt_col)).otherwise(salted),
        )
    vec_col = VEC_RULES.get(table)
    if vec_col:
        # constant semantic-dup density (see VEC_RULES): replica 0 keeps
        # the original vectors bit-for-bit; replicas r > 0 are
        # deterministically perturbed away from their source (and from
        # each other) in cosine
        key0 = SCALE_RULES[table][0][0]
        noise = (
            f"1.0D + 0.8D * ((cast(abs(xxhash64({key0}, _r, i)) % 1000 "
            f"AS double) / 499.5D) - 1.0D)"
        )
        out = out.withColumn(
            vec_col,
            F.when(F.col("_r") == 0, F.col(vec_col)).otherwise(
                F.expr(
                    f"transform({vec_col}, (x, i) -> "
                    f"cast(x * ({noise}) AS float))"
                )
            ),
        )
    out.drop("_r").write.mode("overwrite").parquet(path)


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    from clickhouse_arrow_spark.queries import load_all
    from clickhouse_arrow_spark.session import get_spark
    from clickhouse_arrow_spark.sources import register_tables

    spark = get_spark(app_name="tpch-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    headline = {n: s for n, s in sorted(registry.items()) if s.headline}

    tmp = tempfile.mkdtemp(prefix="cas_sf1_")
    t0 = time.perf_counter()
    for table in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        scale_table(spark, SRC_SF, tmp, table, replicas)
    synth_sec = round(time.perf_counter() - t0, 1)

    def run_set(sf_dir: str) -> dict[str, float]:
        register_tables(spark, sf_dir, force=True)
        spark.sql("SELECT count(*) FROM lineitem").collect()  # warm
        times: dict[str, float] = {}
        for name, spec in headline.items():
            # steady-state: warm run after a throwaway build+run
            df = spec.build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()
        return times

    base = run_set(SRC_SF)
    scaled = run_set(tmp)
    ratios = {
        n: round(scaled[n] / base[n], 1) if base[n] > 0 else None
        for n in base
    }

    # bucketed amortization at sf1: one-time build vs per-query saving
    # in the shuffle regime (facts too big to broadcast)
    from clickhouse_arrow_spark.sources.bucketed import (
        create_bucketed_layout,
        use_bucketed_tables,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1 << 20))
    register_tables(spark, tmp, force=True)
    q3 = registry["q3_shipping_priority"].oracle
    q18 = registry["bench_tpch_q18_volume"].oracle

    def timed(sql: str) -> float:
        df = spark.sql(sql)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    plain = {"q3": timed(q3), "q18": timed(q18)}
    t0 = time.perf_counter()
    create_bucketed_layout(spark, tmp)
    build_sec = round(time.perf_counter() - t0, 1)
    use_bucketed_tables(spark)
    bucketed = {"q3": timed(q3), "q18": timed(q18)}
    saving = (plain["q3"] - bucketed["q3"]) + (plain["q18"] - bucketed["q18"])
    amort = round(2 * build_sec / saving, 1) if saving > 0 else None

    out = {
        "replicas": replicas,
        "synth_sec": synth_sec,
        "steady_sf01": base,
        "steady_sf1": scaled,
        "ratio_sf1_over_sf01": ratios,
        "bucketed_sf1": {
            "build_sec": build_sec,
            "plain": plain,
            "bucketed": bucketed,
            "breakeven_queries": amort,
        },
    }
    print(json.dumps(out))
    if out_json:
        with open(out_json, "w") as fh:
            fh.write(json.dumps(out, indent=2))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
