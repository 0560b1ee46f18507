"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (on in this engine's defaults) handles most
skew at runtime; explicit salting is the deterministic fallback for the
pathological case — a handful of keys owning a large fraction of a
100 TB fact table (null-ish keys, bot users, empty documents).

`salted_join` replicates the build side `salt` times and scatters the
probe side across salts, so one hot key spreads over `salt` tasks. The
result is row-identical to a plain inner join (asserted by test +
corpus oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join on an equality key, salted `salt` ways.

    left (the big/skewed side) gets a random-but-deterministic salt from
    a hash of its full row identity; right (the smaller side) is
    replicated once per salt value via a literal array explode. The join
    key becomes (key, salt): a key with 10^9 rows spreads over `salt`
    tasks instead of one.
    """
    salted_left = left.withColumn(
        "_salt_l", F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    salted_right = right.withColumn("_salt_r", salts)
    out = salted_left.join(
        salted_right,
        (F.col(left_key) == F.col(right_key))
        & (F.col("_salt_l") == F.col("_salt_r")),
        how,
    )
    return out.drop("_salt_l", "_salt_r")
