"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` is the smoke check; `queries()` / `oracle_sql()` expose
the full correctness corpus from
:mod:`clickhouse_arrow_spark.queries` (one entry per implemented
operator from SURVEY.md §2, plus the LLM-pipeline operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> None:
    """Apply engine confs that matter for correctness on an externally
    provided session (the driver builds its own SparkSession)."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf may be static on some sessions; registry still works


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    from clickhouse_arrow_spark.queries import load_all

    _configure(spark)
    registry = load_all()
    return registry["bench_tpch_q01_pricing"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + pipeline ops)."""
    from clickhouse_arrow_spark.queries import load_all

    registry = load_all()

    def make(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return spec.build(spark, sf_dir)

        run.__name__ = f"run_{spec.name}"
        run.__doc__ = spec.doc
        return run

    return {name: make(spec) for name, spec in sorted(registry.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle-checkable query."""
    from clickhouse_arrow_spark.queries import load_all

    registry = load_all()
    return {
        name: spec.oracle
        for name, spec in sorted(registry.items())
        if spec.oracle is not None
    }
