"""ClickHouse ANY JOIN — at most one build-side match per probe row.

ClickHouse `[LEFT|INNER] ANY JOIN` keeps a SINGLE right-side row per
join key (the first one the hash table saw — which row is unspecified
unless the data is ordered). The dialect refuses a textual rewrite
because a plain join silently changes row multiplicity; this operator
is the DataFrame-level implementation it points to: deduplicate the
build side to one row per key — deterministically, under an explicit
ordering when given — then run a normal join. Plan shape: the dedup is
one exchange on the join key (or a pre-aggregated broadcast for
dimension-sized builds), the join itself is whatever Catalyst picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def any_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "left",
    order_by: list[str] | str | None = None,
    keep: str = "first",
) -> DataFrame:
    """`left ANY {how} JOIN right ON on` with CH multiplicity: at most
    one right row per key.

    Args:
        on: equality key column name(s), present on both sides.
        how: "left" or "inner" (CH RIGHT ANY JOIN = flip the inputs).
        order_by: right-side ordering that decides WHICH row survives —
            required for reproducible results; omitted, the pick is the
            per-key min over all columns (deterministic, unlike CH's
            hash-table arrival order, but matching its "some single
            row" contract).
        keep: "first" or "last" under `order_by`.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "inner"):
        raise ValueError("any_join supports how='left'|'inner'; flip the "
                         "inputs for RIGHT ANY JOIN")
    if order_by is not None:
        order_cols = (
            [order_by] if isinstance(order_by, str) else list(order_by)
        )
        ordering = [
            F.col(c).desc() if keep == "last" else F.col(c).asc()
            for c in order_cols
        ]
        w = Window.partitionBy(*keys).orderBy(*ordering)
        deduped = (
            right.withColumn("__cas_any_rn", F.row_number().over(w))
            .where(F.col("__cas_any_rn") == 1)
            .drop("__cas_any_rn")
        )
    else:
        # deterministic arbitrary pick: per-key min of the whole row
        others = [c for c in right.columns if c not in keys]
        packed = right.groupBy(*keys).agg(
            F.min(F.struct(*[F.col(c) for c in others])).alias("__cas_any")
        )
        deduped = packed.select(
            *keys, *[F.col(f"__cas_any.{c}").alias(c) for c in others]
        )
    return left.join(deduped, on=keys, how=how)
