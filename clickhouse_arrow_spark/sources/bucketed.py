"""Bucketed (pre-shuffled) fact-table layout.

The ClickHouse analogue is a Distributed table sharded by key: rows
co-located by join key at WRITE time so repeated joins never reshuffle
(reference DDL surface: engine + ORDER BY key in
clickhouse-arrow/src/ddl.rs). Spark's first-class form is `bucketBy`
catalog tables; this module materializes the TPC-H fact tables into
that layout and re-registers them, so customer ⋈ orders ⋈ lineitem
plans run WITHOUT an Exchange on the bucketed key — at 100 TB the
repeated fact-fact shuffle is the dominant query cost, and this moves
it to a one-time write.

Layout choices (and why):
- lineitem + orders bucket on the orderkey — the largest join in every
  TPC-H-shaped workload (q3/q10/q12/q18 all pay it);
- customer buckets on c_custkey and orders carries a SECOND bucketed
  copy keyed on o_custkey when `with_custkey_copy` — the
  customer ⋈ orders edge then also joins exchange-free (storage for
  shuffle, the classic materialized-layout trade);
- bucket counts must MATCH on both sides of an edge or Spark falls
  back to shuffling the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from clickhouse_arrow_spark.ddl import create_bucketed_table
from clickhouse_arrow_spark.sources.registry import load_table

#: table -> (bucket key, sort key) for the default layout
FACT_KEYS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "customer": ("c_custkey",),
    # events bucket+sort on user_id: sessionization / funnels / as-of
    # all window PARTITION BY user_id — bucketed input removes their
    # one exchange, and the secondary ts sort feeds the window pre-sorted
    "events": ("user_id",),
}

DEFAULT_DATABASE = "cas_bucketed"


def create_bucketed_layout(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 32,
    database: str = DEFAULT_DATABASE,
    with_custkey_copy: bool = True,
) -> list[str]:
    """Materialize the bucketed fact layout; returns created table names.

    One-time write cost; afterwards `use_bucketed_tables` repoints the
    corpus views at the pre-shuffled tables.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    created = []
    for table, keys in FACT_KEYS.items():
        df = load_table(spark, sf_dir, table)
        name = f"{database}.{table}"
        sort_cols = keys + (("ts",) if table == "events" else ())
        create_bucketed_table(df, name, keys, n_buckets, sort_cols=sort_cols)
        created.append(name)
    if with_custkey_copy:
        df = load_table(spark, sf_dir, "orders")
        name = f"{database}.orders_by_custkey"
        create_bucketed_table(df, name, ("o_custkey",), n_buckets,
                              sort_cols=("o_custkey",))
        created.append(name)
    return created


def use_bucketed_tables(
    spark: SparkSession, database: str = DEFAULT_DATABASE
) -> None:
    """Point the session's table names at the bucketed layout: every
    corpus query (spark.table('orders')...) then plans against the
    pre-shuffled tables with zero query changes."""
    for table in FACT_KEYS:
        spark.table(f"{database}.{table}").createOrReplaceTempView(table)
