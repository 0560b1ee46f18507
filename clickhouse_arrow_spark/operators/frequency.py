"""Frequency aggregates — the ClickHouse `topK` family.

ClickHouse `topK(k)(x)` returns the ~k most frequent values of x per
group (Filtered Space-Saving sketch). The exact Spark-native equivalent
here counts per (group, value) with map-side combining, then ranks with
the same two-phase per-key top-k the ANN path uses — parallelism stays
at the data's partition count, never collapsing to the group count, so
the plan survives any group cardinality. The result is exact (a
superset guarantee over the sketch) and deterministic: ties break on
the value ascending.

Reference context: the reference ships `topK` inside SQL text to the
server (clickhouse-arrow/src/query.rs:168-188 ParsedQuery); this is the
engine-side evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_arrow_spark.operators.similarity import topk_per_key


def topk_frequent(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 10,
) -> DataFrame:
    """The k most frequent `value_col` values per `group_col` group.

    Returns (group_col, value_col, n, rank) with rank 1..k per group —
    the exploded form of ClickHouse `topK(k)(value)` (CH returns the
    array; `collect_list` over this result rebuilds it when needed).

    Plan shape: count per (group, value) — partial aggregation combines
    map-side, the exchange carries one row per distinct pair per
    partition — then the two-phase per-key top-k (no
    Window.partitionBy(group) collapse). Hot values cannot skew: they
    combine to one row per partition before any shuffle.
    """
    counts = (
        df.groupBy(F.col(group_col), F.col(value_col).alias("_val"))
        .agg(F.count("*").alias("_n"))
        .select(
            F.col(group_col),
            F.col("_val"),
            # negate via struct sort in topk_per_key: score desc = count
            # desc; ties on the VALUE ascending (deterministic output)
            F.col("_n").cast("double").alias("_score"),
        )
    )
    ranked = topk_per_key(
        counts, k, key=group_col, id_col="_val", score_col="_score"
    )
    return ranked.select(
        F.col(group_col),
        F.col("_val").alias(value_col),
        F.col("_score").cast("bigint").alias("n"),
        "rank",
    )
