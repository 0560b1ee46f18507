"""Deterministic sampling operators for training-data pipelines.

The reference exposes ClickHouse `SAMPLE BY` through DDL
(clickhouse-arrow/src/schema.rs:89-383 sample_by); the engine-side
analogues here are deterministic, re-run-stable sampling rules a data
pipeline needs: per-stratum rates (balance languages/sources before
training) on an explicit modular key.

Determinism over randomness is deliberate: re-runs, retries and
backfills select the SAME rows, and the rule is plain integer
arithmetic, so it is exactly reproducible in any engine (DuckDB oracle,
a downstream validator, the reference's ClickHouse `SAMPLE` semantics
of hashing a fixed sample key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: modulus of the sampling bucket space — rates quantize to 1/1000
_BUCKETS = 1000
#: prime field for the affine mix (Mersenne 2^31-1): because the
#: modulus is PRIME, the affine map is a bijection of Z_P and a
#: structured key subset (all multiples of m, a contiguous range) is
#: spread across the whole field before the final mod-1000 reduction —
#: a direct affine-mod-1000 map would send multiples of m into only
#: 1000/gcd(m,1000) buckets. (P-1)*A < 2^63, so the arithmetic never
#: overflows bigint under ANSI mode.
_MIX_P = 2_147_483_647
_MIX_A = 2_654_435_761  # Knuth's multiplicative-hash constant
_MIX_B = 11


def sample_bucket(key: Column) -> Column:
    """The 0..999 sampling bucket of an integer key:
    ``((key mod P) * A + B) mod P mod 1000`` with P prime (2^31-1).
    Engine-portable (plain integer arithmetic, no engine hash),
    deterministic, and well-spread even for key sets with arithmetic
    structure (sequential ids, multiples of k) — see _MIX_P note."""
    folded = F.pmod(key.cast("bigint"), F.lit(_MIX_P))
    return F.pmod(
        F.pmod(folded * F.lit(_MIX_A) + F.lit(_MIX_B), F.lit(_MIX_P)),
        F.lit(_BUCKETS),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sample: keep a row iff its key's bucket
    falls under its stratum's rate — `df.sampleBy` with reproducible,
    engine-portable selection (sampleBy draws from a seeded RNG stream,
    so results depend on partitioning; this rule depends only on data).

    `rates` maps stratum value -> keep fraction (quantized to 1/1000);
    strata not listed keep `default_rate`. One projection + filter —
    no shuffle, fully pushdown-friendly for everything but the bucket
    predicate itself.

    At 100 TB: this is the language/source-balancing step of a corpus
    build; because selection is keyed arithmetic, a later incremental
    run over new partitions extends the SAME sample instead of
    resampling the world.
    """
    rate_expr: Column = F.lit(int(default_rate * _BUCKETS))
    for value, rate in sorted(rates.items()):
        rate_expr = (
            F.when(F.col(strata_col) == value, F.lit(int(rate * _BUCKETS)))
            .otherwise(rate_expr)
        )
    return df.where(sample_bucket(F.col(key_col)) < rate_expr)


def quality_weighted_sample(
    df: DataFrame,
    quality_col: str,
    key_col: str,
    scale: float = 1.0,
) -> DataFrame:
    """Keep each row with probability `min(quality * scale, 1)` — the
    quality-proportional resampling step of a corpus build (upsample
    high-quality documents, thin the low-quality tail), deterministic
    like :func:`stratified_sample`: a row's fate depends only on its
    key and score, so re-runs/backfills reproduce the sample and the
    rule has an exact SQL oracle.

    `quality_col` is any score in [0, 1] (operators/text.quality_score
    feeds this directly). One projection + filter; no shuffle, no RNG.
    """
    threshold = F.least(
        (F.col(quality_col) * F.lit(scale) * _BUCKETS).cast("int"),
        F.lit(_BUCKETS),
    )
    return df.where(sample_bucket(F.col(key_col)) < threshold)


def select_token_budget(
    df: DataFrame,
    budget: int,
    quality_col: str = "quality",
    token_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy corpus selection under a GLOBAL token budget: keep the
    highest-quality documents whose running token total fits `budget`
    (order: quality DESC, id ASC — deterministic; documents never
    split, so the first document that would overflow the budget and
    everything after it are dropped). Returns the selected rows plus
    ``cum_tokens`` (the running total through each kept document).

    This is the "best N tokens" step of a training-data build. The
    naive plan — one global window cumsum — collapses to a single
    task; here it is the two-phase distributed prefix sum
    (packing.concat_chunks shape): approxQuantile range boundaries on
    the quality key (driver holds literals, never rows), per-range
    token sums (one range-count-bounded collect), then a range-local
    window cumsum plus the broadcast prefix offset. The only shuffle
    is the window's hash partition on the range id — at 100 TB the
    budget cut is two passes over (quality, tokens), not a sort of the
    corpus.
    """
    from pyspark.sql import Window

    base = df.withColumn("_tok", F.col(token_col).cast("long")).withColumn(
        "_q", F.col(quality_col).cast("double")
    )
    n_parts = max(base.sparkSession.sparkContext.defaultParallelism, 1)
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds = sorted(set(base.approxQuantile("_q", probs, 0.001))) if probs \
        else []
    # higher quality -> higher part id; ties share a part (boundary
    # literals), so cross-part order is strict
    part_expr = F.lit(0)
    for b in bounds:
        part_expr = part_expr + (F.col("_q") >= F.lit(b)).cast("int")
    ranged = base.withColumn("_part", part_expr)
    sums = {
        r["_part"]: r["s"]
        for r in ranged.groupBy("_part").agg(F.sum("_tok").alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for p in sorted(sums, reverse=True):  # descending quality order
        offsets[p] = acc
        acc += sums[p]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(offsets.items())
                       for x in kv]),
        F.col("_part"),
    )
    w = Window.partitionBy("_part").orderBy(
        F.col("_q").desc(), F.col(id_col).asc()
    )
    cum = (F.sum("_tok").over(w) + off_expr).alias("cum_tokens")
    return (
        ranged.select(*df.columns, cum)
        .where(F.col("cum_tokens") <= budget)
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Per-group row cap: keep the top `n` rows of every group ranked
    by (`order_col` DESC|ASC, `id_col` ASC — deterministic ties). The
    per-domain/per-source cap of a crawl pipeline (a handful of hosts
    dominate any crawl; capping them is the standard balancing step
    before mixing).

    One keyed exchange (the window's hash partition on the group);
    ranking is per-group, so no global sort ever forms and skewed
    groups cost only their own partition's sort. Exact SQL oracle:
    row_number() window.
    """
    from pyspark.sql import Window

    order = (
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    )
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col).asc())
    return (
        df.withColumn("_cas_rn", F.row_number().over(w))
        .where(F.col("_cas_rn") <= n)
        .drop("_cas_rn")
    )


def token_cap_per_group(
    df: DataFrame,
    group_col: str,
    budget: int,
    token_col: str,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Per-group TOKEN budget: walk each group's rows in (quality DESC,
    id ASC) order and keep rows while the running token total stays
    within `budget` (documents never split; the first overflowing
    document and everything after it drop). The per-source token quota
    of a mixing recipe — `select_token_budget`'s GLOBAL cut, applied
    independently inside every source.

    Same single keyed exchange as `cap_per_group`; the running sum is
    one window frame, exact-oracle-able with a SQL running SUM.
    """
    from pyspark.sql import Window

    order = [F.col(id_col).asc()]
    if quality_col is not None:
        order = [F.col(quality_col).desc()] + order
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = F.sum(F.col(token_col).cast("long")).over(w)
    return (
        df.withColumn("_cas_cum", running)
        .where(F.col("_cas_cum") <= budget)
        .withColumnRenamed("_cas_cum", "cum_tokens")
    )


def unimax_allocate(
    df: DataFrame,
    group_col: str,
    token_col: str,
    budget: int,
    max_epochs: float = 2.0,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    split a total token `budget` across groups (languages/sources) as
    uniformly as possible, capping every group at `max_epochs` times
    its corpus size — the language-balancing recipe that avoids both
    head-language domination and tail-language over-repetition.

    The closed form is WATER-FILLING: allocation_g = min(cap_g, theta)
    with cap_g = max_epochs * tokens_g and theta the water level at
    which the budget is exhausted. Computed exactly with one window
    over the GROUP TOTALS: sort caps ascending; group g is saturated
    iff cap_g * (groups from g on) <= budget - (smaller caps' sum) —
    a per-row test because saturation is monotone in cap — and theta
    spreads the remainder over the unsaturated tail.

    Scale shape: one keyed exchange for the per-group totals; the
    window runs over #groups rows (bounded by the language/source
    inventory, never corpus size). Returns (group, cap, allocation).
    """
    from pyspark.sql import Window

    caps = df.groupBy(group_col).agg(
        (F.sum(F.col(token_col).cast("double")) * F.lit(float(max_epochs)))
        .alias("cap")
    )
    w = Window.orderBy(F.col("cap").asc(), F.col(group_col).asc())
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = (
        caps.withColumn("_rn", F.row_number().over(w))
        .withColumn("_prefix", F.sum("cap").over(w_cum))
        .withColumn("_k", F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))
        ))
    )
    sat = (
        F.col("cap") * (F.col("_k") - F.col("_rn") + 1)
        <= F.lit(float(budget)) - (F.col("_prefix") - F.col("cap"))
    )
    ranked = ranked.withColumn("_sat", sat)
    agg = ranked.agg(
        F.sum(F.when(F.col("_sat"), F.col("cap")).otherwise(0.0)),
        F.sum(F.when(F.col("_sat"), 1).otherwise(0)),
        F.count(F.lit(1)),
    ).collect()[0]
    sat_sum, m, k = float(agg[0] or 0.0), int(agg[1] or 0), int(agg[2])
    theta = (
        (float(budget) - sat_sum) / (k - m) if m < k else float("inf")
    )
    return ranked.select(
        group_col,
        "cap",
        F.least(F.col("cap"), F.lit(theta)).alias("allocation"),
    )


def unimax_select(
    df: DataFrame,
    group_col: str,
    token_col: str,
    budget: int,
    max_epochs: float = 2.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a UniMax allocation as a row selection: per group,
    keep the id-ordered prefix whose running token total stays within
    the group's water-filled allocation (documents never split; an
    allocation above the group's size keeps everything — the epoch
    REPETITION implied by max_epochs > 1 is the mixing stage's job).
    One broadcast join (#groups rows) + one keyed window — the same
    single-exchange shape as token_cap_per_group."""
    from pyspark.sql import Window

    alloc = unimax_allocate(df, group_col, token_col, budget, max_epochs)
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = F.sum(F.col(token_col).cast("double")).over(w)
    return (
        df.join(F.broadcast(alloc.select(group_col, "allocation")), group_col)
        .withColumn("_cas_cum", running)
        .where(F.col("_cas_cum") <= F.col("allocation"))
        .drop("allocation")
        .withColumnRenamed("_cas_cum", "cum_tokens")
    )


def epoch_expand(
    df: DataFrame,
    epochs,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Materialize FRACTIONAL training epochs: each row appears
    floor(e) times plus once more for a deterministic e-frac(e)
    selected slice — the mixing-stage step that turns a UniMax
    allocation (max_epochs > 1 implies repetition) or a temperature
    weight into an actual repeated sequence. `epochs` is a column
    expression or a constant; the extra-copy pick reuses the portable
    `sample_bucket` arithmetic (seed-shifted), so re-runs and a SQL
    oracle reproduce the exact same copies.

    Output: the input rows with `copy_idx` (1..n_copies); rows with
    e < 1 keep only the fractional lottery. One projection + one
    explode of a sequence bounded by ceil(e) — no shuffle, no RNG;
    downstream ordering belongs to text.epoch_shuffle.
    """
    e = epochs if isinstance(epochs, Column) else F.lit(float(epochs))
    n_full = F.floor(e).cast("int")
    frac = e - n_full
    extra = (
        sample_bucket(F.col(id_col) + F.lit(int(seed) * 10_007))
        < (frac * _BUCKETS).cast("int")
    ).cast("int")
    n_copies = n_full + extra
    # sequence(1, 0) DESCENDS in Spark — zero copies must be an empty
    # array (explode then emits no row for the document)
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("copy_idx", F.explode(copies))
