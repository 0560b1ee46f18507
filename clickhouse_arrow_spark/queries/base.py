"""Correctness-corpus registry.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the
equivalent ANSI-SQL oracle that DuckDB runs on the same parquet tables
(the driver's t2 gate — CORRECTNESS_r{N}.json). Specs without an oracle
get the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible operators).

Alignment rules enforced corpus-wide (see SURVEY §5 and the driver
contract):
- every computed column aliased identically on both sides;
- double aggregates rounded on both sides (sum order across partitions
  is nondeterministic in the last bits — rounding makes the value hash
  stable);
- BIGINT sums cast in DuckDB (its SUM(BIGINT) widens to HUGEINT);
- deterministic ORDER BY whenever LIMIT is involved.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_arrow_spark.sources import register_tables


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    #: short human description (what operator/shape this covers)
    doc: str = ""
    #: included in bench.py headline timing
    headline: bool = False
    #: SURVEY §2 coverage tag, e.g. "join", "window", "dedup"
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_tables(spark, sf_dir)
            return fn(spark, sf_dir)

        wrapped.__name__ = f"query_{name}"
        wrapped.__doc__ = fn.__doc__ or doc
        REGISTRY[name] = QuerySpec(
            name=name, build=wrapped, oracle=oracle, doc=doc, headline=headline,
            tags=tags,
        )
        return wrapped

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every corpus module so REGISTRY is fully populated."""
    import clickhouse_arrow_spark.queries.advanced  # noqa: F401
    import clickhouse_arrow_spark.queries.functions  # noqa: F401
    import clickhouse_arrow_spark.queries.pipeline  # noqa: F401
    import clickhouse_arrow_spark.queries.relational  # noqa: F401
    import clickhouse_arrow_spark.queries.statistics  # noqa: F401
    import clickhouse_arrow_spark.queries.tpch_extra  # noqa: F401

    return REGISTRY
