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
    interpolate: list[str] | dict[str, str | None] | None = None,
    staleness=None,
) -> DataFrame:
    """`ORDER BY col WITH FILL [FROM a] [TO b] [STEP s]` over a NUMERIC
    fill column (ClickHouse select/order-by.md): add a row for every
    grid point a, a+s, ... < b (TO is EXCLUSIVE, as CH documents)
    missing from the result. Added rows carry the other columns' TYPE
    DEFAULTS (0 / '' / zero-date — CH fills defaults, not NULLs);
    original rows keep their values, including genuine NULLs. Bounds
    default to the result's min/max (max inclusive).

    `staleness` caps the fill distance past the last ORIGINAL row
    (ClickHouse `WITH FILL ... STALENESS const`): a grid row survives
    only while `axis < last_original_axis + staleness` — the fill
    stops `staleness` past each real row instead of running to the
    next one (or to TO). Grid rows before the first original row have
    no previous row and are dropped, matching CH. Numeric staleness
    for numeric axes; ("interval", n, unit) for date/time axes. Same
    single ordered pass as the carry window — no extra shuffle.

    `interpolate` is a list of column names (carry-forward: filled rows
    take the previous ORIGINAL value) or a {col: spark_sql_expr | None}
    dict — the expression form of `INTERPOLATE (col AS expr)`: for
    filled rows the expr is evaluated over the LAST ORIGINAL row's
    values of every column it references (one extra projection after
    the same carry window; self-referencing exprs are refused upstream
    because they recurse row-to-row).

    Plan shape: one sequence+explode for the grid (distributed, no
    driver loop), one full-outer join on the fill column — the same
    spine pattern as fill_gaps, at any result size.
    """
    from pyspark.sql import types as _T

    from clickhouse_arrow_spark.dictionary import _type_default

    spark = df.sparkSession
    field = df.schema[col]
    is_interval = isinstance(step, tuple) and step[0] == "interval"
    # CH numeric-step defaults on temporal axes: 1 day per unit on Date,
    # 1 second per unit on DateTime (sequence() needs interval steps)
    if not is_interval and isinstance(field.dataType, _T.DateType):
        step = ("interval", int(step), "day")
        is_interval = True
    elif not is_interval and isinstance(field.dataType, _T.TimestampType):
        step = ("interval", int(step), "second")
        is_interval = True
    is_float_axis = isinstance(
        field.dataType, (_T.DoubleType, _T.FloatType, _T.DecimalType)
    ) or (not is_interval and isinstance(step, float))
    step_col = (
        F.expr(f"INTERVAL {step[1]} {step[2]}") if is_interval else F.lit(step)
    )
    if start is None or end is None:
        lo, hi = df.agg(F.min(col), F.max(col)).first()
        if lo is None:
            return df
        start = lo if start is None else start
        if end is None:
            # inclusive max when TO is defaulted: one step past the max
            end_col = F.lit(hi).cast(field.dataType) + step_col
        else:
            end_col = F.lit(end).cast(field.dataType)
    else:
        end_col = F.lit(end).cast(field.dataType)
    start_col = F.lit(start).cast(field.dataType)
    if is_float_axis:
        # sequence() only steps integral/temporal types: generate index
        # points and scale (start + i*step covers [start, end))
        n_steps = F.floor(
            (end_col.cast("double") - start_col.cast("double")) / float(step)
        ).cast("bigint")
        grid_expr = F.transform(
            F.sequence(F.lit(0).cast("bigint"), n_steps),
            lambda i: (start_col.cast("double") + i * float(step)).cast(
                field.dataType
            ),
        )
    else:
        grid_expr = F.sequence(start_col, end_col, step_col)
    grid = (
        spark.range(1)
        .select(F.explode(grid_expr).alias(col))
        .where(F.col(col) < end_col)  # CH: TO bound is exclusive
    )
    marked = df.withColumn("__cas_orig", F.lit(1))
    joined = marked.join(grid, on=col, how="full_outer")
    if staleness is not None:
        # distance-to-last-original bound: carry the last original axis
        # value forward, keep filled rows strictly inside the window
        stale_w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        last_orig_axis = F.last(
            F.when(F.col("__cas_orig").isNotNull(), F.col(f"`{col}`")),
            ignorenulls=True,
        ).over(stale_w)
        if isinstance(staleness, tuple) and staleness[0] == "interval":
            bound_col = last_orig_axis + F.expr(
                f"INTERVAL {staleness[1]} {staleness[2]}"
            )
        else:
            bound_col = last_orig_axis + F.lit(staleness)
        joined = joined.withColumn(
            "__cas_keep",
            F.col("__cas_orig").isNotNull()
            | (last_orig_axis.isNotNull() & (F.col(f"`{col}`") < bound_col)),
        ).where(F.col("__cas_keep")).drop("__cas_keep")
    if interpolate is None:
        interpolate = {}
    elif not isinstance(interpolate, dict):
        interpolate = {c: None for c in interpolate}
    # carry-forward window: filled rows take the previous ORIGINAL value
    # (global ordering — WITH FILL output is an ordered report axis, so
    # the final sort is already a single ordered pass)
    carry = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)

    def carried(name: str):
        return F.last(
            F.when(F.col("__cas_orig").isNotNull(), F.col(f"`{name}`")),
            ignorenulls=True,
        ).over(carry)

    # expression interpolation references other columns' carried values:
    # materialize `__carry_<c>` helpers once (Catalyst prunes unused)
    import re as _re

    exprs = {c: e for c, e in interpolate.items() if e is not None}
    if exprs:
        # the fill axis itself stays a direct reference (the filled
        # row HAS an axis value); every other column maps to its carry
        names = sorted((f.name for f in df.schema.fields if f.name != col),
                       key=len, reverse=True)
        sub = {
            c: _re.sub(
                r"(?<![\w`])`?(" + "|".join(map(_re.escape, names))
                + r")`?(?![\w`])",
                lambda mm: f"`__carry_{mm.group(1)}`",
                e,
            )
            for c, e in exprs.items()
        }
        joined = joined.withColumns({f"__carry_{n}": carried(n)
                                     for n in df.columns if n != col})
    out = [F.col(f"`{col}`")]
    for f in df.schema.fields:
        if f.name == col:
            continue
        if f.name in exprs:
            filled = F.expr(sub[f.name]).cast(f.dataType)
        elif f.name in interpolate:
            filled = carried(f.name)
        else:
            filled = F.expr(_type_default(f.dataType.simpleString())).cast(
                f.dataType
            )
        out.append(
            F.when(F.col("__cas_orig").isNull(), filled)
            .otherwise(F.col(f"`{f.name}`"))
            .alias(f.name)
        )
    return joined.select(out).orderBy(col)


_LTTB_SCHEMA_SUFFIX = "x double, y double"


def lttb(
    df: DataFrame,
    x: str,
    y: str,
    n_buckets: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """ClickHouse `largestTriangleThreeBuckets(n)(x, y)` — LTTB
    downsampling (Steinarsson 2013): keep first and last points; for
    each interior bucket keep the point forming the largest triangle
    with the previously kept point and the next bucket's centroid.
    Returns (keys..., x, y) rows, ≤ n per series.

    The selection is inherently sequential along a series (each pick
    depends on the previous), so it runs per-key in `applyInPandas` —
    one exchange on the series key, each series local to a worker (the
    same contract CH has: the aggregate state holds the whole series).
    Downsampling is for plotting; a series that does not fit a worker
    would not fit a chart either — pre-bucket upstream in that case.
    """
    import pandas as pd

    keys = keys or []

    def _lttb_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x).reset_index(drop=True)
        n = len(pdf)
        if n <= n_buckets:
            out = pdf
        else:
            xs = pdf[x].astype("float64").to_numpy()
            ys = pdf[y].astype("float64").to_numpy()
            import numpy as np

            picked = [0]
            # n_buckets-2 interior buckets over points 1..n-2
            edges = np.linspace(1, n - 1, n_buckets - 1).astype(int)
            for b in range(len(edges) - 1):
                lo, hi = edges[b], edges[b + 1]
                if lo >= hi:
                    continue
                nxt_lo, nxt_hi = edges[b + 1], (
                    edges[b + 2] if b + 2 < len(edges) else n
                )
                cx = xs[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else xs[-1]
                cy = ys[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else ys[-1]
                ax, ay = xs[picked[-1]], ys[picked[-1]]
                area = np.abs(
                    (ax - cx) * (ys[lo:hi] - ay) - (ax - xs[lo:hi]) * (cy - ay)
                )
                picked.append(lo + int(area.argmax()))
            picked.append(n - 1)
            out = pdf.iloc[sorted(set(picked))]
        res = out[[*keys, x, y]].copy()
        res.columns = [*keys, "x", "y"]
        res["x"] = res["x"].astype("float64")
        res["y"] = res["y"].astype("float64")
        if not keys:
            res.insert(0, "__g", 1)
        return res

    key_schema = ", ".join(
        f"`{k}` {df.schema[k].dataType.simpleString()}" for k in keys
    )
    schema = (
        f"{key_schema}, {_LTTB_SCHEMA_SUFFIX}" if keys else _LTTB_SCHEMA_SUFFIX
    )
    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__g"))
    out = grouped.applyInPandas(
        lambda pdf: _lttb_one(pdf), schema=schema if keys else f"__g int, {_LTTB_SCHEMA_SUFFIX}"
    )
    return out.drop("__g") if not keys else out


_SPARKBAR_GLYPHS = "▁▂▃▄▅▆▇█"


def sparkbar(
    df: DataFrame,
    keys: list[str],
    x: str,
    y: str,
    width: int,
    min_x=None,
    max_x=None,
) -> DataFrame:
    """ClickHouse `sparkbar(width[, min_x, max_x])(x, y)`: per key,
    bucket the x axis into `width` slots over [min_x, max_x] (defaults:
    the key's own min/max), sum y per slot, and render one glyph per
    slot (▁..█ scaled to the key's max slot; empty slots print a
    space). Pure built-ins: one keyed aggregation for the slots, one
    for the render — two exchanges on the key, no Python."""
    bounds = df.groupBy(*keys).agg(
        F.min(x).alias("__lo"), F.max(x).alias("__hi")
    )
    if min_x is not None:
        bounds = bounds.withColumn("__lo", F.lit(min_x))
    if max_x is not None:
        bounds = bounds.withColumn("__hi", F.lit(max_x))
    j = df.join(bounds, keys)
    slot = F.when(
        F.col("__hi") > F.col("__lo"),
        F.least(
            F.lit(width - 1),
            F.floor(
                (F.col(x) - F.col("__lo"))
                / ((F.col("__hi") - F.col("__lo")) / width)
            ).cast("int"),
        ),
    ).otherwise(F.lit(0))
    slots = (
        j.where(F.col(x).between(F.col("__lo"), F.col("__hi")))
        .withColumn("__slot", slot)
        .groupBy(*keys, "__slot")
        .agg(F.sum(y).alias("__v"))
    )
    per_key = slots.groupBy(*keys).agg(
        F.map_from_entries(
            F.collect_list(F.struct("__slot", "__v"))
        ).alias("__m"),
        F.max("__v").alias("__mx"),
    )
    glyphs = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda i: F.when(
                F.element_at(F.col("__m"), i).isNull(),
                F.lit(" "),
            ).otherwise(
                F.substring(
                    F.lit(_SPARKBAR_GLYPHS),
                    F.greatest(  # negative sums clamp to the lowest glyph
                        F.lit(1),
                        F.least(
                            F.lit(8),
                            (
                                F.element_at(F.col("__m"), i)
                                * 8.0
                                / F.col("__mx")
                            ).cast("int")
                            + 1,
                        ),
                    ).cast("int"),
                    1,
                )
            ),
        ),
    )
    return per_key.select(*keys, glyphs.alias("sparkbar"))
