"""Map-valued aggregates: the ClickHouse sumMap/minMap/maxMap family.

Reference surface: ClickHouse's `sumMap(m)` sums map values per key
across the rows of a group (the idiomatic metric-map rollup —
`Map(metric_name, value)` columns aggregated per entity). Spark has no
map-valued aggregate builtin; the Spark-native shape is
explode -> two-level groupBy -> map_from_entries, which keeps every
stage inside whole-stage codegen and map-side combine.

Scale posture: two exchanges, both on bounded keys — (group, map_key)
then (group). Map cardinality bounds the first-stage fan-out (a row
with a k-entry map becomes k rows), and partial aggregation combines
per-partition before either shuffle, so the network carries one row
per (group, key) per partition. No Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGGS = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}


def agg_map(
    df: DataFrame,
    group_cols: list[str],
    map_col: str | Column,
    agg: str = "sum",
    out_col: str | None = None,
) -> DataFrame:
    """ClickHouse `sumMap`/`minMap`/`maxMap`/`avgMap` analogue: aggregate
    map values per key within each group; keys of the result map are
    sorted (deterministic map rendering for oracles and diffs).

    `agg` is one of sum/min/max/avg.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    out_col = out_col or f"{agg}_map"
    mc = F.col(map_col) if isinstance(map_col, str) else map_col
    exploded = df.select(
        *[F.col(c) for c in group_cols], F.explode(mc).alias("_k", "_v")
    )
    per_key = exploded.groupBy(*group_cols, "_k").agg(
        _AGGS[agg]("_v").alias("_v")
    )
    return per_key.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_k", "_v")))
        ).alias(out_col)
    )


def sum_map(df: DataFrame, group_cols: list[str], map_col: str) -> DataFrame:
    return agg_map(df, group_cols, map_col, "sum")


def min_map(df: DataFrame, group_cols: list[str], map_col: str) -> DataFrame:
    return agg_map(df, group_cols, map_col, "min")


def max_map(df: DataFrame, group_cols: list[str], map_col: str) -> DataFrame:
    return agg_map(df, group_cols, map_col, "max")
