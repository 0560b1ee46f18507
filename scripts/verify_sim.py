#!/usr/bin/env python
"""Pre-flight simulation of the driver's verify flow.

Builds a PLAIN SparkSession (none of the engine's conf defaults — the
driver owns its own session), runs `entry()`, then every `queries()`
entry at sf0.01 against `oracle_sql()` via DuckDB with order-insensitive
value hashing. Exits non-zero on any mismatch.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(normalize(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{normalize(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canonical(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        "|".join(normalize(row[c]) for c in cols) for _, row in pdf[cols].iterrows()
    )


def driver_canon(pdf):
    """Replicate the grading driver's pandas canonicalization EXACTLY.

    The driver sorts columns by name then calls ``sort_values`` over all
    of them before hashing.  pandas' lexsort factorizes each column; a
    column holding Python lists/dicts/ndarrays raises ``TypeError:
    unhashable type`` — which the driver records as an ERR row.  Running
    the same call here makes that failure a PRE-FLIGHT failure (the
    round-6 regression class: list-valued result columns shipped green
    through the old ``normalize()`` path and died in the driver).
    """
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols).reset_index(drop=True)


def assert_scalar_columns(name, sdf, pdf):
    """Reject any top-level Array/Map/Struct result column pre-flight."""
    from pyspark.sql import types as T

    cols = [f.name for f in sdf.schema.fields]
    if len(set(cols)) != len(cols):
        raise TypeError(
            f"{name}: duplicate result column names {cols} — pandas "
            "canonicalization is ambiguous over duplicates; alias them"
        )

    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        raise TypeError(
            f"{name}: non-scalar result columns {bad} — the driver's pandas "
            "canonicalizer cannot sort/hash lists; stringify with "
            "arrayStringConcat/array_to_string on BOTH sides"
        )
    for c in pdf.columns:
        sample = pdf[c].head(50)
        if any(isinstance(v, (list, dict, tuple)) or type(v).__name__ == "ndarray"
               for v in sample):
            raise TypeError(
                f"{name}: column {c!r} holds non-hashable values in pandas — "
                "driver canonicalization would ERR"
            )


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("== entry() smoke ==")
    df = entrymod.entry(spark)
    rows = df.collect()
    print(f"entry: {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
    assert len(rows) > 0

    duck = duckdb.connect()
    # cap the oracle engine (round-12 sf1 lesson): an exploding oracle
    # (the funnel family's exists-subsequence triple self-join is
    # O(per-user-events^3)) first spilled past the machine's free temp
    # space, and the NEXT oracle on the same connection then drove RSS
    # to 128 GB and the OS OOM-killed the whole run. A bounded
    # memory_limit turns both into clean per-query ORACLE ERRORs.
    duck.execute(
        f"SET memory_limit = "
        f"'{os.environ.get('VERIFY_DUCK_MEM', '24GB')}'"
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-directory parquet (e.g. the persistent sf1 set):
            # DuckDB needs the file glob, not the directory path
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = sys.argv[2:]
    if only:
        # an arg that names a query EXACTLY selects only that query
        # (substring matching would also pull in its aaa_gate_ alias —
        # doubling expensive oracles in targeted sf1 runs); other args
        # keep substring semantics
        exact = [s for s in only if s in qs]
        subs = [s for s in only if s not in qs]
        qs = {
            k: v for k, v in qs.items()
            if k in exact or any(s in k for s in subs)
        }
    print(f"== {len(qs)} queries, {len(oracles)} with oracles ==")
    failures = []
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            if name in oracles:
                # rows-only entries skip the driver's value compare, so
                # non-scalar columns are only fatal on oracle'd queries
                assert_scalar_columns(name, sdf, spdf)
                driver_canon(spdf)
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {str(e)[:200]}"))
            print(f"  {name}: SPARK ERROR {str(e)[:120]}")
            continue
        status = "rows-only"
        if name in oracles:
            try:
                dpdf = duck.execute(oracles[name]).fetchdf()
                driver_canon(dpdf)
            except Exception as e:
                failures.append((name, f"ORACLE ERROR: {str(e)[:200]}"))
                print(f"  {name}: ORACLE ERROR {str(e)[:120]}")
                continue
            if len(spdf) != len(dpdf):
                failures.append((name, f"rowcount {len(spdf)} vs {len(dpdf)}"))
                status = "ROWCOUNT MISMATCH"
            elif sorted(spdf.columns) != sorted(dpdf.columns):
                failures.append(
                    (name, f"cols {sorted(spdf.columns)} vs {sorted(dpdf.columns)}")
                )
                status = "SCHEMA MISMATCH"
            elif canonical(spdf) != canonical(dpdf):
                s, d = canonical(spdf), canonical(dpdf)
                diff = next((a, b) for a, b in zip(s, d) if a != b)
                failures.append((name, f"values: {diff[0][:90]} vs {diff[1][:90]}"))
                status = "VALUE MISMATCH"
            else:
                status = "MATCH"
        dt = time.perf_counter() - t0
        print(f"  {name}: {status} ({len(spdf)} rows, {dt:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok, {len(failures)} failures")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
