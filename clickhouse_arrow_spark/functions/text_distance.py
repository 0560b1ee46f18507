"""String-distance kernels with no Spark builtin: Damerau-Levenshtein
(true transposition variant, Lowrance-Wagner) and Jaro / Jaro-Winkler.

These are per-row dynamic programs — not expressible as Catalyst
expressions — so they run as Arrow-batched pandas UDFs (the build
brief's (b) tier). Spark's builtin `levenshtein` stays the fast path
for plain edit distance; the dialect gates the ClickHouse names
(`damerauLevenshteinDistance`, `jaroSimilarity`,
`jaroWinklerSimilarity`) at these implementations.

Algorithms are pinned to the canonical definitions (and validated in
tests against DuckDB's independent implementations):
- damerau_levenshtein: full DL with the character-dictionary recurrence
  (ca -> abc = 2, not OSA's 3);
- jaro: standard match-window max(|a|,|b|)/2 - 1; the half-transposition
  count uses integer floor (and empty operands score 0), pinned to the
  independent oracle implementation — the canonical fractional t/2
  differs only when the out-of-order count is odd;
- jaro_winkler: jaro + prefix boost l*p*(1-jaro), l <= 4, p = 0.1,
  applied only when jaro exceeds the 0.7 boost threshold.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType

__all__ = [
    "damerau_levenshtein",
    "jaro_similarity",
    "jaro_winkler_similarity",
]


def _dl_py(a: str, b: str) -> int:
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    maxdist = la + lb
    da: dict[str, int] = {}
    # (la+2) x (lb+2) matrix with the Lowrance-Wagner sentinel border
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transposition
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _jaro_py(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    # empty operands (including both-empty) score 0 — pinned to the
    # cross-engine oracle's behavior (DuckDB); canonical Jaro gives
    # ''=='' -> 1 but no other engine value depends on that corner
    if not la or not lb:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    a_match = [False] * la
    b_match = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and a[i] == b[j]:
                a_match[i] = b_match[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    # FLOOR of the half-transposition count (integer division): matches
    # the independent oracle implementation; the canonical fractional
    # t/2 differs only when the out-of-order count is odd
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3


def _jw_py(a: str, b: str) -> float:
    j = _jaro_py(a, b)
    if j <= 0.7:
        return j
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return j + l * 0.1 * (1 - j)


@pandas_udf(IntegerType())
def _dl_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if x is None or y is None else _dl_py(x, y)
            for x, y in zip(a, b)
        ],
        dtype="Int64",
    )


@pandas_udf(DoubleType())
def _jaro_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if x is None or y is None else _jaro_py(x, y)
            for x, y in zip(a, b)
        ]
    )


@pandas_udf(DoubleType())
def _jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [None if x is None or y is None else _jw_py(x, y) for x, y in zip(a, b)]
    )


def damerau_levenshtein(a, b) -> Column:
    """ClickHouse `damerauLevenshteinDistance(a, b)` (true DL)."""
    return _dl_udf(F.col(a) if isinstance(a, str) else a,
                   F.col(b) if isinstance(b, str) else b)


def jaro_similarity(a, b) -> Column:
    """ClickHouse `jaroSimilarity(a, b)`."""
    return _jaro_udf(F.col(a) if isinstance(a, str) else a,
                     F.col(b) if isinstance(b, str) else b)


def jaro_winkler_similarity(a, b) -> Column:
    """ClickHouse `jaroWinklerSimilarity(a, b)` (prefix <= 4, p = 0.1,
    0.7 boost threshold)."""
    return _jw_udf(F.col(a) if isinstance(a, str) else a,
                   F.col(b) if isinstance(b, str) else b)
