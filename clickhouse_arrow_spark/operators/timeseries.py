"""Time-series conveniences ClickHouse users expect:

- :func:`fill_gaps` — ORDER BY ... WITH FILL: densify a time series so
  every step in [min, max] exists, zero/null-filling missing buckets.
- :func:`limit_by` — LIMIT n BY key: keep the first n rows per key
  under an explicit ordering (ReplacingMergeTree/LIMIT BY idiom).

Both are compositions of built-in ops: sequence+explode for the
calendar spine (no driver-side date loops), ranking windows for
limit_by.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fill_gaps(
    df: DataFrame,
    ts_col: str,
    step_seconds: int,
    group_cols: list[str] | None = None,
    fill_values: dict[str, object] | None = None,
) -> DataFrame:
    """Densify `df` so every `step_seconds` bucket between the global
    min and max of `ts_col` exists (per group if `group_cols` given).

    The spine is built with `sequence()` over epoch seconds — generated
    distributed, exploded once; missing rows join as nulls and are
    patched from `fill_values`. One broadcast-able range join per group
    spine; no driver iteration.
    """
    group_cols = group_cols or []
    bounds = df.agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    spine_ts = F.explode(
        F.sequence(
            F.col("_lo"),
            F.col("_hi"),
            F.expr(f"INTERVAL {int(step_seconds)} SECONDS"),
        )
    ).alias(ts_col)
    if group_cols:
        groups = df.select(*group_cols).distinct()
        spine = groups.crossJoin(F.broadcast(bounds)).select(
            *group_cols, spine_ts
        )
    else:
        spine = bounds.select(spine_ts)
    joined = spine.join(df, on=[*group_cols, ts_col], how="left")
    if fill_values:
        joined = joined.fillna(fill_values)
    return joined


def limit_by(
    df: DataFrame,
    n: int,
    by: list[str],
    order: list[Column] | None = None,
) -> DataFrame:
    """ClickHouse `LIMIT n BY by...`: first n rows per key.

    Deterministic iff `order` totally orders rows within a key (pass
    e.g. [col("ts").desc(), col("id")]). Planned as one ranking window
    partitioned on `by` — a single keyed exchange.
    """
    order = order or [F.monotonically_increasing_id()]
    w = Window.partitionBy(*by).orderBy(*order)
    return (
        df.withColumn("_lb_rn", F.row_number().over(w))
        .where(F.col("_lb_rn") <= n)
        .drop("_lb_rn")
    )


def delta_sum(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """ClickHouse `deltaSum(value)` per key: the sum of POSITIVE
    consecutive differences of `value` in `time_col` order — the
    counter-reset-tolerant rate aggregate (a monotone counter that
    resets to 0 contributes only its increases).

    Window lag + conditional sum: one exchange keyed on `key_cols`,
    the same partitioning both the lag window and the final groupBy
    reuse (Catalyst plans a single Exchange)."""
    w = Window.partitionBy(*key_cols).orderBy(time_col)
    step = F.col(value_col) - F.lag(value_col).over(w)
    return (
        df.select(*key_cols, F.greatest(step, F.lit(0)).alias("_d"))
        .groupBy(*key_cols)
        .agg(F.sum("_d").alias("delta_sum"))
    )


def exp_time_decayed_avg(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    decay_seconds: float,
) -> DataFrame:
    """ClickHouse `exponentialTimeDecayedAvg(decay)(v, t)` at the last
    point of each key: the exponentially time-weighted mean
    ``sum(v_i * exp((t_i - t_max)/decay)) / sum(exp((t_i - t_max)/decay))``.

    The recurrence form ClickHouse evaluates row-by-row has this closed
    form at the final point, which keeps the whole operator declarative:
    one window max + one keyed aggregate sharing the same partitioning
    (single exchange), no sequential Python. `time_col` may be a
    timestamp (converted to epoch seconds) or numeric."""
    w = Window.partitionBy(*key_cols)
    if dict(df.dtypes).get(time_col, "").startswith("timestamp"):
        t = F.unix_micros(F.col(time_col)) / F.lit(1_000_000.0)
    else:
        t = F.col(time_col).cast("double")
    weight = F.exp((t - F.max(t).over(w)) / F.lit(float(decay_seconds)))
    return (
        df.select(*key_cols, (F.col(value_col) * weight).alias("_wv"),
                  weight.alias("_w"))
        .groupBy(*key_cols)
        .agg((F.sum("_wv") / F.sum("_w")).alias("exp_decayed_avg"))
    )


def interval_length_sum(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """ClickHouse `intervalLengthSum(start, end)` per key: total length
    of the UNION of the key's [start, end] segments (overlaps merged,
    touching segments merged, zero/negative-length segments contribute
    nothing).

    Gaps-and-islands with one keyed window (single exchange on the
    key): a segment opens a new island iff its start exceeds the
    running max end of all earlier segments; island ids are the running
    count of opens; each island contributes max(end) - min(start).
    """
    w = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    islands = df.select(
        *key_cols,
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        F.sum(opens).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_island"),
    )
    return (
        islands.groupBy(*key_cols, "_island")
        .agg((F.max("_e") - F.min(F.least("_s", "_e"))).alias("_len"))
        .groupBy(*key_cols)
        .agg(F.sum(F.greatest(F.col("_len"), F.lit(0))).alias("interval_length_sum"))
    )


def max_intersections(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """ClickHouse `maxIntersections(start, end)` +
    `maxIntersectionsPosition`: per key, the maximum number of
    simultaneously-overlapping intervals and the first position where
    that maximum is reached.

    Sweep line as a DataFrame: each interval explodes to (+1 at start,
    -1 at end); at equal positions the -1 sorts first (half-open
    [start, end) — touching intervals do NOT intersect, matching CH's
    (position, weight) ascending sort). One keyed window gives the
    running depth; an argmax picks (max depth, earliest position).
    """
    events = df.select(
        *key_cols,
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("pos"), F.lit(1).alias("delta")
                ),
                F.struct(F.col(end_col).alias("pos"), F.lit(-1).alias("delta")),
            )
        ).alias("ev"),
    ).select(*key_cols, F.col("ev.pos").alias("_pos"), F.col("ev.delta").alias("_d"))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_pos", "_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    depth = events.select(
        *key_cols, F.col("_pos"), F.sum("_d").over(w).alias("_depth")
    )
    return depth.groupBy(*key_cols).agg(
        F.max("_depth").alias("max_intersections"),
        F.min_by(
            F.col("_pos"), F.struct((-F.col("_depth")).alias("d"), F.col("_pos"))
        ).alias("max_intersections_position"),
    )


def group_array_moving(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    window_size: int,
) -> DataFrame:
    """ClickHouse `groupArrayMovingSum(n)(v)` / `groupArrayMovingAvg(n)
    (v)` per key, with an EXPLICIT order column (CH leaves insertion
    order undefined on a distributed table — the deterministic contract
    here is (order_col) ascending).

    Per-key ordered window sums (rows between n-1 preceding and
    current) then re-aggregated into arrays — every window shares the
    one keyed exchange. ClickHouse's documented quirk is preserved:
    MovingAvg always divides by the full window size n, so the first
    n-1 positions average over an incomplete window but a full
    denominator.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-(window_size - 1), Window.currentRow)
    )
    moving = df.select(
        *key_cols,
        F.col(order_col).alias("_ord"),
        F.sum(value_col).over(w).alias("_msum"),
    )
    collect = F.array_sort(
        F.collect_list(F.struct(F.col("_ord"), F.col("_msum")))
    )
    vals = F.transform(collect, lambda s: s.getField("_msum"))
    return moving.groupBy(*key_cols).agg(
        vals.alias("moving_sum"),
        F.transform(
            vals, lambda v: v.cast("double") / F.lit(float(window_size))
        ).alias("moving_avg"),
    )


def with_fill(
    df: DataFrame,
    col: str,
    start=None,
    end=None,
    step=1,
) -> DataFrame:
    """`ORDER BY col WITH FILL [FROM a] [TO b] [STEP s]` over a NUMERIC
    fill column (ClickHouse select/order-by.md): add a row for every
    grid point a, a+s, ... < b (TO is EXCLUSIVE, as CH documents)
    missing from the result. Added rows carry the other columns' TYPE
    DEFAULTS (0 / '' / zero-date — CH fills defaults, not NULLs);
    original rows keep their values, including genuine NULLs. Bounds
    default to the result's min/max (max inclusive).

    Plan shape: one sequence+explode for the grid (distributed, no
    driver loop), one full-outer join on the fill column — the same
    spine pattern as fill_gaps, at any result size.
    """
    from clickhouse_arrow_spark.dictionary import _type_default

    spark = df.sparkSession
    if start is None or end is None:
        lo, hi = df.agg(F.min(col), F.max(col)).first()
        if lo is None:
            return df
        start = lo if start is None else start
        # inclusive max when TO is defaulted: one step past the max
        end = hi + step if end is None else end
    field = df.schema[col]
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(start).cast(field.dataType),
                    F.lit(end).cast(field.dataType),
                    F.lit(step),
                )
            ).alias(col)
        )
        .where(F.col(col) < F.lit(end))  # CH: TO bound is exclusive
    )
    marked = df.withColumn("__cas_orig", F.lit(1))
    joined = marked.join(grid, on=col, how="full_outer")
    out = [F.col(f"`{col}`")]
    for f in df.schema.fields:
        if f.name == col:
            continue
        default = F.expr(_type_default(f.dataType.simpleString()))
        out.append(
            F.when(F.col("__cas_orig").isNull(), default.cast(f.dataType))
            .otherwise(F.col(f"`{f.name}`"))
            .alias(f.name)
        )
    return joined.select(out).orderBy(col)
