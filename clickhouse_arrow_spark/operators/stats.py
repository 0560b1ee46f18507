"""Statistical-test and association aggregates — the ClickHouse
`welchTTest` / `studentTTest` / `mannWhitneyUTest` / `entropy` /
`cramersV(BiasCorrected)` / `theilsU` / `contingency` family.

The reference ships these as SQL text to the server (SURVEY §2.3,
clickhouse-arrow/src/query.rs:168-188); this module is the engine-side
implementation, built entirely from JVM-side aggregates:

- moment statistics (count/avg/var_samp) reduce map-side — one shuffle
  carrying one row per group, any data size;
- rank statistics (Mann-Whitney) need a GLOBAL ordered cumulative
  count; a naive `Window.orderBy(value)` collapses to a single task,
  so :func:`_ordered_cumsum` does the scalable two-phase version:
  range-repartition by value, per-partition window cumsum, then add
  broadcast per-partition offsets (the partition-offset table is
  #partitions rows — driver-scale by construction);
- contingency statistics (chi², Cramér's V, Theil's U) reduce to
  keyed counts on (a), (b), (a,b) — uniform shuffle keys.

p-values use the Abramowitz & Stegun 26.2.17 normal-CDF polynomial
(|err| < 7.5e-8), written with the SAME closed form in the DuckDB
oracles so both engines produce bit-comparable doubles. For the
t-tests this is the large-df normal approximation of the t
distribution (documented divergence from ClickHouse's exact Student
CDF at small df; at the corpus' n≈thousands the difference is below
the corpus' 6-decimal rounding).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ttest",
    "mann_whitney_u",
    "entropy_agg",
    "association",
]

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def norm_sf(x: Column) -> Column:
    """P(Z > x) for x >= 0 — Abramowitz & Stegun 26.2.17 polynomial.

    Pure arithmetic (no erf builtin in either Spark or DuckDB), so the
    oracle can evaluate the identical expression.
    """
    k = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * x)
    poly = k * (
        F.lit(0.319381530)
        + k
        * (
            F.lit(-0.356563782)
            + k
            * (
                F.lit(1.781477937)
                + k * (F.lit(-1.821255978) + k * F.lit(1.330274429))
            )
        )
    )
    pdf = F.exp(-x * x / F.lit(2.0)) * F.lit(_INV_SQRT_2PI)
    return pdf * poly


#: the same polynomial as a SQL-text template (DuckDB oracle side);
#: substitute {x} with a non-negative SQL expression.
NORM_SF_SQL = (
    "(exp(-({x}) * ({x}) / 2.0) * {inv} * "
    "((1.0 / (1.0 + 0.2316419 * ({x}))) * (0.319381530 + "
    "(1.0 / (1.0 + 0.2316419 * ({x}))) * (-0.356563782 + "
    "(1.0 / (1.0 + 0.2316419 * ({x}))) * (1.781477937 + "
    "(1.0 / (1.0 + 0.2316419 * ({x}))) * (-1.821255978 + "
    "(1.0 / (1.0 + 0.2316419 * ({x}))) * 1.330274429))))))"
)


def norm_sf_sql(x_expr: str) -> str:
    return NORM_SF_SQL.format(x=x_expr, inv=repr(_INV_SQRT_2PI))


def ttest(
    df: DataFrame,
    value_col: str,
    index_col: Column,
    kind: str = "welch",
    p_mode: str = "normal",
) -> DataFrame:
    """ClickHouse `welchTTest(value, index)` / `studentTTest(value,
    index)`: two-sample t-test between the index=0 and index=1 samples.

    Returns one row: (t_stat, deg_freedom, p_value). t and the degrees
    of freedom are exact (moment aggregates, map-side combined);
    p_value is the two-sided large-sample normal approximation (see
    module docstring).

    `kind`: "welch" (unequal variance) or "student" (pooled variance).
    `p_mode`: "normal" keeps the documented large-sample approximation
    (SQL-oracle-reproducible, the corpus-gate shape); "exact" evaluates
    the true Student-t CDF via the regularized incomplete beta — what
    ClickHouse computes, and what the SQL dialect's studentTTest /
    welchTTest emit.
    """
    if kind not in ("welch", "student"):
        raise ValueError(f"kind must be welch|student, got {kind!r}")
    if p_mode not in ("normal", "exact"):
        raise ValueError(f"p_mode must be normal|exact, got {p_mode!r}")
    side = F.when(index_col, F.lit(1)).otherwise(F.lit(0))
    g = (
        df.select(F.col(value_col).cast("double").alias("v"), side.alias("s"))
        .groupBy("s")
        .agg(
            F.count("v").alias("n"),
            F.avg("v").alias("m"),
            F.var_samp("v").alias("var"),
        )
    )
    # two rows -> one: conditional aggregation, no join
    stats = g.agg(
        F.max(F.when(F.col("s") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("s") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("s") == 0, F.col("m"))).alias("m0"),
        F.max(F.when(F.col("s") == 1, F.col("m"))).alias("m1"),
        F.max(F.when(F.col("s") == 0, F.col("var"))).alias("v0"),
        F.max(F.when(F.col("s") == 1, F.col("var"))).alias("v1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    v0, v1 = F.col("v0"), F.col("v1")
    diff = F.col("m0") - F.col("m1")
    if kind == "welch":
        se0, se1 = v0 / n0, v1 / n1
        t = diff / F.sqrt(se0 + se1)
        dof = (se0 + se1) * (se0 + se1) / (
            se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1)
        )
    else:
        pooled = ((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2)
        t = diff / F.sqrt(pooled * (F.lit(1.0) / n0 + F.lit(1.0) / n1))
        dof = (n0 + n1 - 2).cast("double")
    if p_mode == "exact":
        p = _t_sf_col(t, dof)
    else:
        p = F.lit(2.0) * norm_sf(F.abs(t))
    return stats.select(
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 4).alias("deg_freedom"),
        F.round(p, 6).alias("p_value"),
    )


def _t_sf_col(t: Column, dof: Column) -> Column:
    """Exact two-sided Student-t p-value as a Column (regularized
    incomplete beta via ch_functions._t_sf_py, Arrow-batched). Replaced
    the large-df normal approximation in round 8 — CH evaluates the
    exact CDF."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from clickhouse_arrow_spark.functions.ch_functions import _t_sf_py

    # no type hints: stringified annotations (PEP 563 in this module)
    # defeat pandas_udf's hint inference — the explicit returnType is
    # authoritative
    def _sf(ts, dfs):
        return pd.Series(
            [_t_sf_py(a, b) for a, b in zip(ts, dfs)]
        )

    return pandas_udf(_sf, "double")(
        t.cast("double"), dof.cast("double")
    )


def mean_z_test(
    df: DataFrame,
    value_col: str,
    index_col: Column,
    var0: float,
    var1: float,
    confidence_level: float = 0.95,
) -> DataFrame:
    """ClickHouse `meanZTest(pop_var_x, pop_var_y, conf)(value,
    index)`: two-sample z-test with KNOWN population variances between
    the index=0 and index=1 samples.

    Returns one row: (z_stat, p_value, ci_low, ci_high) — the CI is on
    the mean difference. z and the CI bounds are exact (the normal
    quantile comes from statistics.NormalDist, evaluated driver-side);
    p_value uses the same A&S normal-tail polynomial as the other
    hypothesis tests so a SQL oracle can reproduce it term-for-term.
    """
    from statistics import NormalDist

    side = F.when(index_col, F.lit(1)).otherwise(F.lit(0))
    g = (
        df.select(F.col(value_col).cast("double").alias("v"),
                  side.alias("s"))
        .groupBy("s")
        .agg(F.count("v").alias("n"), F.avg("v").alias("m"))
    )
    stats = g.agg(
        F.max(F.when(F.col("s") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("s") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("s") == 0, F.col("m"))).alias("m0"),
        F.max(F.when(F.col("s") == 1, F.col("m"))).alias("m1"),
    )
    se = F.sqrt(
        F.lit(float(var0)) / F.col("n0") + F.lit(float(var1)) / F.col("n1")
    )
    diff = F.col("m0") - F.col("m1")
    z = diff / se
    p = F.lit(2.0) * norm_sf(F.abs(z))
    zq = NormalDist().inv_cdf((1.0 + float(confidence_level)) / 2.0)
    return stats.select(
        F.round(z, 6).alias("z_stat"),
        F.round(p, 6).alias("p_value"),
        F.round(diff - F.lit(zq) * se, 6).alias("ci_low"),
        F.round(diff + F.lit(zq) * se, 6).alias("ci_high"),
    )


def _ordered_cumsum(
    df: DataFrame, order_col: str, sum_cols: list[str], num_partitions: int = 32
) -> DataFrame:
    """Exclusive global cumulative sums of `sum_cols` in `order_col`
    order, WITHOUT a single-partition window.

    Phase 1: EXPLICIT range boundaries on order_col (driver holds
    num_partitions-1 literals via approxQuantile — never data). The
    range id is a deterministic EXPRESSION, not `spark_partition_id()`
    after repartitionByRange: this plan evaluates the ranged relation
    twice (join side + totals side), and the range partitioner's
    reservoir sampling depends on the nondeterministic upstream shuffle
    order, so the two evaluations could disagree on boundaries and
    corrupt the offsets (observed at sf0.1). Phase 2: local inclusive
    window cumsum per range. Phase 3: per-range totals (bounded rows)
    get their own tiny cumsum and join back as broadcast offsets.
    Output adds `cum_<c>` = exclusive prefix sum.
    """
    probs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = (
        sorted(set(df.approxQuantile(order_col, probs, 0.001)))
        if probs
        else []
    )
    part_expr = F.lit(0)
    for b in bounds:
        part_expr = part_expr + (F.col(order_col) >= F.lit(b)).cast("int")
    local = df.select("*", part_expr.alias("_pid"))
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in sum_cols:
        local = local.withColumn(f"_incl_{c}", F.sum(c).over(w))
    totals = local.groupBy("_pid").agg(
        *[F.sum(c).alias(f"_tot_{c}") for c in sum_cols]
    )
    # offsets: cumsum over the #partitions-row totals table (tiny)
    wo = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = totals.select(
        "_pid",
        *[
            F.coalesce(F.sum(f"_tot_{c}").over(wo), F.lit(0)).alias(f"_off_{c}")
            for c in sum_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "_pid")
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}",
            F.col(f"_off_{c}") + F.col(f"_incl_{c}") - F.col(c),
        ).drop(f"_incl_{c}", f"_off_{c}")
    return out.drop("_pid")


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    index_col: Column,
    continuity: bool = True,
) -> DataFrame:
    """ClickHouse `mannWhitneyUTest([alternative, continuity])(value,
    index)`, two-sided: returns one row (u_stat, p_value).

    u_stat is the U statistic of the index=1 sample, computed from
    average ranks (ties averaged) — exact. p_value is the normal
    approximation with tie correction and (default) continuity
    correction. Rank sums come from per-distinct-value counts plus the
    scalable two-phase cumulative count (:func:`_ordered_cumsum`) — no
    global single-task sort.
    """
    side = F.when(index_col, F.lit(1)).otherwise(F.lit(0))
    per_value = (
        df.select(F.col(value_col).cast("double").alias("v"), side.alias("s"))
        .groupBy("v")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("s").alias("cnt1"),
        )
    )
    ranked = _ordered_cumsum(per_value, "v", ["cnt"])
    # average rank of value v = (#less) + (cnt+1)/2, ranks are 1-based
    avg_rank = F.col("cum_cnt") + (F.col("cnt") + F.lit(1.0)) / F.lit(2.0)
    agg = ranked.agg(
        F.sum(F.col("cnt1") * avg_rank).alias("r1"),
        F.sum("cnt1").alias("n1"),
        F.sum("cnt").alias("n"),
        # tie correction term: sum(t^3 - t) over tie groups
        F.sum(
            F.col("cnt").cast("double") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        ).alias("tie"),
    )
    n1 = F.col("n1").cast("double")
    n0 = (F.col("n") - F.col("n1")).cast("double")
    n = F.col("n").cast("double")
    u1 = F.col("r1") - n1 * (n1 + 1) / F.lit(2.0)
    mu = n0 * n1 / F.lit(2.0)
    sigma = F.sqrt(
        n0 * n1 / F.lit(12.0)
        * ((n + 1) - F.col("tie") / (n * (n - 1)))
    )
    dev = F.abs(u1 - mu) - (F.lit(0.5) if continuity else F.lit(0.0))
    z = F.greatest(dev, F.lit(0.0)) / sigma
    p = F.lit(2.0) * norm_sf(z)
    return agg.select(
        F.round(u1, 4).alias("u_stat"),
        F.round(F.least(p, F.lit(1.0)), 6).alias("p_value"),
    )


def entropy_agg(df: DataFrame, col: str) -> DataFrame:
    """ClickHouse `entropy(col)`: Shannon entropy (log2) of the value
    distribution. Keyed count + one global reduce."""
    counts = df.groupBy(col).agg(F.count("*").alias("c"))
    total = counts.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double"))).alias(
            "sclog"
        ),
    )
    # H = log2(n) - sum(c*log2 c)/n  (algebraic form avoids a second pass)
    h = F.log2(F.col("n").cast("double")) - F.col("sclog") / F.col("n")
    return total.select(F.round(h, 6).alias("entropy"))


def association(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """ClickHouse categorical-association family over (a, b): one row
    with `cramers_v`, `cramers_v_corrected` (cramersVBiasCorrected),
    `theils_u` (U(a|b), natural log), and `contingency` (contingency
    coefficient sqrt(chi2/(chi2+n))).

    Everything reduces to the (a,b) contingency counts — one keyed
    aggregation; marginals derive from window sums over the cell table
    keyed by a / by b (cells are #distinct(a)×#distinct(b), bounded for
    categorical columns).
    """
    cells = df.groupBy(a_col, b_col).agg(F.count("*").alias("o"))
    wa = Window.partitionBy(a_col)
    wb = Window.partitionBy(b_col)
    cells = (
        cells.withColumn("ra", F.sum("o").over(wa))
        .withColumn("cb", F.sum("o").over(wb))
    )
    o = F.col("o").cast("double")
    ra = F.col("ra").cast("double")
    cb = F.col("cb").cast("double")
    agg = cells.agg(
        F.sum("o").alias("n"),
        # chi2 = n * (sum(o^2/(ra*cb)) - 1), algebraic one-pass form
        F.sum(o * o / (ra * cb)).alias("s2"),
        F.countDistinct(a_col).alias("r"),
        F.countDistinct(b_col).alias("c"),
        # H(A|B) = -sum o/n log(o/cb); H(A) = -sum_a ra/n log(ra/n).
        # Cell-sum forms (each cell contributes once):
        F.sum(o * F.log(o / cb)).alias("sab"),  # = -n*H(A|B)
        F.sum(o * F.log(ra)).alias("sa_log"),
    )
    n = F.col("n").cast("double")
    chi2 = n * (F.col("s2") - F.lit(1.0))
    r = F.col("r").cast("double")
    c = F.col("c").cast("double")
    phi2 = chi2 / n
    v = F.sqrt(phi2 / F.least(r - 1, c - 1))
    phi2c = F.greatest(
        phi2 - (r - 1) * (c - 1) / (n - 1), F.lit(0.0)
    )
    rc = r - (r - 1) * (r - 1) / (n - 1)
    cc = c - (c - 1) * (c - 1) / (n - 1)
    vc = F.sqrt(phi2c / F.least(rc - 1, cc - 1))
    # H(A) = log n - sa_log-ish: H(A) = -sum_a (ra/n) log(ra/n)
    #      = log(n) - (1/n) sum_cells o*log(ra)   [each a-row weighted o]
    h_a = F.log(n) - F.col("sa_log") / n
    h_a_given_b = -F.col("sab") / n
    theils = F.when(h_a == 0, F.lit(0.0)).otherwise((h_a - h_a_given_b) / h_a)
    contingency = F.sqrt(chi2 / (chi2 + n))
    return agg.select(
        F.round(v, 6).alias("cramers_v"),
        F.round(vc, 6).alias("cramers_v_corrected"),
        F.round(theils, 6).alias("theils_u"),
        F.round(contingency, 6).alias("contingency"),
    )


def equi_histogram(df: DataFrame, col: str, n_bins: int) -> DataFrame:
    """Deterministic equi-width histogram — the engine-side replacement
    for ClickHouse `histogram(n)(col)`, whose adaptive streaming-merge
    binning is documented as non-deterministic (bin edges depend on
    merge order, so no distributed engine can reproduce them bit-for-
    bit). Equal-width bins over [min, max] keep the same contract
    (n bins, (lo, hi, count) triples) deterministically.

    Two passes, both map-side combined: one 2-scalar bounds aggregate
    (broadcast back), one keyed count on the bucket id.
    """
    v = F.col(col).cast("double")
    bounds = df.agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    bucket = F.when(
        F.col("_hi") == F.col("_lo"), F.lit(1)
    ).otherwise(
        F.least(
            F.greatest(
                F.floor((v - F.col("_lo")) / width).cast("int") + 1, F.lit(1)
            ),
            F.lit(n_bins),
        )
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(v.alias("_v"), "_lo", "_hi", bucket.alias("bin"))
        .groupBy("bin")
        .agg(
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
            F.count("*").alias("cnt"),
        )
        .select(
            "bin",
            (F.col("_lo") + (F.col("bin") - 1) * (F.col("_hi") - F.col("_lo"))
             / F.lit(float(n_bins))).alias("bin_lo"),
            (F.col("_lo") + F.col("bin") * (F.col("_hi") - F.col("_lo"))
             / F.lit(float(n_bins))).alias("bin_hi"),
            "cnt",
        )
    )


def ks_test(
    df: DataFrame,
    value_col: str,
    index_col: Column,
) -> DataFrame:
    """ClickHouse `kolmogorovSmirnovTest(value, index)`, two-sided:
    one row (d_stat, p_value).

    D is exact: per-distinct-value group counts + the two-phase
    range-partitioned cumulative counts (:func:`_ordered_cumsum`, both
    groups in one pass) give each empirical CDF at every jump point;
    D = max |F0 - F1|. p_value is the asymptotic Kolmogorov Q
    function with the Numerical-Recipes small-sample correction
    lambda = (sqrt(en) + 0.12 + 0.11/sqrt(en)) * D, the series
    truncated at k=100 identically on both engines (ClickHouse's
    'auto' switches to an exact method below ~10k samples — documented
    divergence there; identical asymptotics above).
    """
    side = F.when(index_col, F.lit(1)).otherwise(F.lit(0))
    per_value = (
        df.select(F.col(value_col).cast("double").alias("v"), side.alias("s"))
        .groupBy("v")
        .agg(
            F.sum(F.lit(1) - F.col("s")).alias("c0"),
            F.sum("s").alias("c1"),
        )
    )
    ranked = _ordered_cumsum(per_value, "v", ["c0", "c1"])
    sizes = per_value.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    totals = (
        ranked.crossJoin(F.broadcast(sizes))
        .agg(
            F.first("n0").alias("n0"),
            F.first("n1").alias("n1"),
            # inclusive CDF difference at each jump point
            F.max(
                F.abs(
                    (F.col("cum_c0") + F.col("c0")) / F.col("n0")
                    - (F.col("cum_c1") + F.col("c1")) / F.col("n1")
                )
            ).alias("d"),
        )
    )
    en = F.sqrt(F.col("n0") * F.col("n1") / (F.col("n0") + F.col("n1")))
    lam = (en + F.lit(0.12) + F.lit(0.11) / en) * F.col("d")
    q = F.lit(2.0) * F.aggregate(
        F.sequence(F.lit(1), F.lit(100)),
        F.lit(0.0),
        lambda acc, k: acc
        + F.pow(F.lit(-1.0), (k - 1).cast("double"))
        * F.exp(F.lit(-2.0) * lam * lam * k.cast("double") * k.cast("double")),
    )
    return totals.select(
        F.round(F.col("d"), 6).alias("d_stat"),
        F.round(F.least(F.greatest(q, F.lit(0.0)), F.lit(1.0)), 6).alias(
            "p_value"
        ),
    )


def auc(df: DataFrame, score_col: str, label_col: Column) -> DataFrame:
    """Exact ROC AUC of `score_col` against boolean `label_col` — the
    column-aggregate form of ClickHouse `arrayAUC` (which takes the
    same data pre-collected into arrays).

    AUC equals the normalized Mann-Whitney U with tie-averaged ranks:
    AUC = (R1 - n1(n1+1)/2) / (n0*n1), so it reuses the per-value
    counts + two-phase cumulative count machinery — exact at any data
    size, no sampling, no single-task sort.
    """
    side = F.when(label_col, F.lit(1)).otherwise(F.lit(0))
    per_value = (
        df.select(F.col(score_col).cast("double").alias("v"), side.alias("s"))
        .groupBy("v")
        .agg(F.count("*").alias("cnt"), F.sum("s").alias("cnt1"))
    )
    ranked = _ordered_cumsum(per_value, "v", ["cnt"])
    avg_rank = F.col("cum_cnt") + (F.col("cnt") + F.lit(1.0)) / F.lit(2.0)
    agg = ranked.agg(
        F.sum(F.col("cnt1") * avg_rank).alias("r1"),
        F.sum("cnt1").alias("n1"),
        F.sum("cnt").alias("n"),
    )
    n1 = F.col("n1").cast("double")
    n0 = (F.col("n") - F.col("n1")).cast("double")
    return agg.select(
        F.round(
            (F.col("r1") - n1 * (n1 + 1) / F.lit(2.0)) / (n0 * n1), 6
        ).alias("auc")
    )


def foreach_agg(
    df: DataFrame,
    arr_col: str,
    fn: str = "sum",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ClickHouse's ``-ForEach`` combinator (``sumForEach(arr)``,
    ``maxForEach(arr)``, ...): apply the aggregate ELEMENT-WISE across
    the rows' arrays, returning one array per group whose i-th element
    aggregates every row's i-th element (ragged arrays contribute only
    to the positions they have, like CH).

    Scale shape: posexplode to (pos, value) rows, ONE keyed aggregate
    on (group, pos) with map-side combine, then re-assemble the array
    ordered by position — state per group is O(array width), never the
    whole group's rows (the collect_list formulation a textual rewrite
    would need holds every row and is exactly what this avoids)."""
    group_cols = group_cols or []
    e = df.select(
        *group_cols, F.posexplode(arr_col).alias("_pos", "_v")
    )
    agg_fn = getattr(F, fn)
    per_pos = e.groupBy(*group_cols, "_pos").agg(agg_fn("_v").alias("_a"))
    assembled = F.transform(
        F.array_sort(F.collect_list(F.struct("_pos", "_a"))),
        lambda s: s.getField("_a"),
    ).alias(f"{fn}_foreach")
    if group_cols:
        return per_pos.groupBy(*group_cols).agg(assembled)
    return per_pos.groupBy().agg(assembled)


def anova(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """ClickHouse `analysisOfVariance(x, g)` (one-way ANOVA): one row
    (f_stat, p_value, df_between, df_within). Group moments come from
    ONE map-side-combined aggregation (count/sum/sum-of-squares per
    group, then one global fold — no collect, group count unbounded);
    F = (SSB/(k-1)) / (SSW/(n-k)); the p-value is the exact
    F-distribution survival function via the regularized incomplete
    beta (the same kernel the t-tests use,
    ch_functions._betai: P(F > f) = I_{d2/(d2+d1 f)}(d2/2, d1/2))."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    g = (
        df.select(
            F.col(value_col).cast("double").alias("v"),
            F.col(group_col).alias("g"),
        )
        .groupBy("g")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("ss"),
        )
    )
    tot = g.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("n").cast("double").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sb"),
    )
    k, n = F.col("k"), F.col("n")
    ssb = F.col("sb") - F.col("s") * F.col("s") / n
    ssw = F.col("ss") - F.col("sb")
    d1, d2 = k - 1, n - k
    f_stat = (ssb / d1) / (ssw / d2)

    def _sf(fs, a, b):
        from clickhouse_arrow_spark.functions.ch_functions import _betai

        out = []
        for fv, d1v, d2v in zip(fs, a, b):
            if fv is None or d1v is None or d2v is None or d1v <= 0 \
                    or d2v <= 0:
                out.append(None)
            elif fv <= 0:
                out.append(1.0)
            else:
                out.append(
                    _betai(d2v / 2.0, d1v / 2.0, d2v / (d2v + d1v * fv))
                )
        return pd.Series(out)

    p = pandas_udf(_sf, "double")(
        f_stat.cast("double"), d1.cast("double"), d2.cast("double")
    )
    return tot.select(
        F.round(f_stat, 6).alias("f_stat"),
        F.round(p, 6).alias("p_value"),
        d1.cast("long").alias("df_between"),
        d2.cast("long").alias("df_within"),
    )
