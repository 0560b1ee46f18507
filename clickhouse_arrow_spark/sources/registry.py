"""Table registry over the driver's parquet test data.

Plays the role of the reference's schema introspection surface
(`fetch_tables` / `fetch_schema`, clickhouse-arrow/src/arrow/schema.rs)
for the local parquet catalog: every known table registers as a temp
view so both the DataFrame API and `spark.sql` see the same catalog.

Scans stay declarative (`spark.read.parquet`) so Catalyst gets predicate
pushdown, column pruning and partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one table."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every table under `sf_dir` as a temp view; returns the
    DataFrames keyed by name. Missing files are skipped (some sf dirs may
    lack optional tables)."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
