"""Z-order (Morton) clustering for multi-dimensional data skipping.

MergeTree's ORDER BY gives locality on a prefix of the sort key; a
single-dimension sort leaves the second predicate column scattered.
Z-ordering interleaves the bits of several columns so files are tight
in EVERY clustered dimension — parquet min/max (row-group and file
footer) statistics then prune scans for predicates on any of them.

Pure built-in bit arithmetic (shift/mask inside codegen), no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_normalize(df: DataFrame, col: str, bits: int) -> Column:
    """Map a column to [0, 2^bits) by percent_rank — makes z-ordering
    insensitive to value distribution (uniform, skewed, or floats)."""
    from pyspark.sql import Window

    pr = F.percent_rank().over(Window.orderBy(F.col(col)))
    return F.least(
        (pr * F.lit(float(1 << bits))).cast("long"), F.lit((1 << bits) - 1)
    )


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave `bits` low bits of each (non-negative integer) column
    into one Morton code. 2 cols x 16 bits -> 32-bit z-value."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write `df` as parquet clustered by the z-order of `cols`.

    Each output file covers a compact hyper-rectangle in the clustered
    dimensions, so min/max footer stats prune reads for range predicates
    on ANY clustered column — verified in tests by reading the footers.

    Scale note: percent_rank normalization uses a global sort of the
    z-columns only (narrow projection); for append-heavy pipelines,
    precompute fixed bucket boundaries once and reuse them instead.
    """
    normalized = [_rank_normalize(df, c, bits) for c in cols]
    out = df.withColumn("_z", zorder_value(normalized, bits))
    (
        out.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
