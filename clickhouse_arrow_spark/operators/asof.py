"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a composition of built-in DataFrame ops (the preferred
tier for custom operators): tag both sides, union, and take the last
non-null right-side value over a window partitioned by the join key and
ordered by (time, side) — one shuffle on the key, no pandas, no
merge_asof driver bottleneck. At 100 TB the cost is a single exchange
on `by`, identical to any keyed window.

Semantics: for each left row, attach the most recent right row with
right.time <= left.time (backward as-of, the DuckDB/kdb default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    right_by: str | None = None,
    direction: str = "backward",
    right_order: list[str] | None = None,
) -> DataFrame:
    """As-of join.

    Args:
        left/right: inputs; `right` supplies `value_cols`.
        by / right_by: equality key (right_by defaults to `by`).
        left_time / right_time: event-time columns.
        direction: "backward" (latest right with time <= left time, the
            DuckDB/kdb default) or "forward" (earliest right with
            time >= left time).
        right_order: optional value-column names used as an ASCENDING
            tie-break among right rows sharing the same time: the
            as-of pick at equal `right_time` is then the row with the
            GREATEST `right_order` tuple. This folds a "latest row per
            (key, time)" pre-aggregation into the window's sort — a
            caller that would otherwise `groupBy(key, time).agg(max)`
            the right side first (one extra full shuffle of the right
            table for a key that is nearly unique anyway) passes the
            max column here instead and the pre-aggregation exchange
            disappears (round-12 optimization; guide §2.4).

    Returns `left` columns + the as-of `value_cols` (null when no right
    row qualifies).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported as-of direction: {direction!r}")
    right_by = right_by or by
    value_cols = value_cols or [
        c for c in right.columns if c not in (right_by, right_time)
    ]

    l_tagged = left.select(
        F.col(by).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),  # left sorts after right at equal time
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(right_by).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_left"].dataType
        ).alias("_left"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )

    unioned = l_tagged.unionByName(r_tagged)
    # backward: scan times ascending, right rows (side 0) before left at
    # equal time so `t_right == t_left` matches. forward: scan times
    # DESCENDING — the running "last right seen" is then the earliest
    # right row with time >= the left row's time.
    time_order = F.col("_t") if direction == "backward" else F.col("_t").desc()
    # right_order columns sort ASCENDING with nulls first: left rows
    # carry NULL in every _v_ column, so they keep their (time, side)
    # position while right rows at equal time order by the tie-break —
    # `last(ignorenulls)` then picks the greatest tuple.
    tie_break = [
        F.col(f"_v_{c}").asc_nulls_first() for c in (right_order or [])
    ]
    w = (
        Window.partitionBy("_k")
        .orderBy(time_order, "_side", *tie_break)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "_side",
        "_left",
        *[
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(f"_v_{c}")
            for c in value_cols
        ],
    )
    out = filled.where(F.col("_side") == 1).select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_v_{c}").alias(c) for c in value_cols],
    )
    return out
