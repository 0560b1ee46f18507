"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw pretraining documents whose hashed-n-gram
feature distribution matches a small target corpus.

The published recipe, re-expressed Spark-first:

1. **Features**: each document -> bag of word unigrams+bigrams, hashed
   into ``n_buckets`` counts (the paper's "hashed n-gram features").
2. **Fit**: bucket probabilities for the target and the raw corpus
   (add-``smoothing`` Laplace estimate); the per-bucket importance
   log-weight is ``log p_target(b) - log p_raw(b)``.
3. **Score**: a document's log importance weight is the feature-count
   weighted sum of bucket log-weights.
4. **Resample**: Gumbel-top-k over the scores — adding standard Gumbel
   noise to each log-weight and taking the k largest draws k documents
   WITHOUT replacement with probability proportional to the importance
   weights (the Gumbel-max trick), deterministically from ``seed``.

Scale shape (the 100 TB posture):
- featurization is explode + map-side-combined groupBy((id, bucket)) —
  one shuffle proportional to distinct (doc, bucket) pairs;
- the fitted weight table is exactly ``n_buckets`` rows (1e4-1e5),
  broadcast to the scoring join — the raw corpus never shuffles on
  bucket;
- per-doc score is one keyed aggregation on the doc id;
- top-k is Spark's distributed TakeOrderedAndProject (per-partition
  heads, driver merge of k·P candidates) — never a global sort
  materialization, never a driver-side full collect.

Everything is deterministic and cross-engine reproducible: the bucket
hash is the first 8 hex digits of md5 (DuckDB recomputes it
bit-for-bit: ``('0x' || substr(md5(g), 1, 8))::BIGINT``), and the
Gumbel draw derives from md5(id:seed) the same way — so the corpus gate
has an exact DuckDB oracle.

Reference parity note: the reference client (clickhouse-arrow) ships
raw SQL to a data warehouse; corpus-selection pipelines like this are
the 100 TB workload the task brief adds on top of that surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hashed_ngram_features",
    "dsir_fit",
    "dsir_score",
    "dsir_resample",
]

#: 2^32 as a double — md5's leading 8 hex digits span [0, 2^32)
_HASH_SPAN = float(1 << 32)


def _bucket(gram, n_buckets: int):
    """First 8 md5 hex digits -> int -> bucket. Stable across engines
    and Spark versions (md5 is specified; xxhash64 seeds are not)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint")
        % F.lit(n_buckets)
    )


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    bigrams: bool = True,
) -> DataFrame:
    """Document -> hashed n-gram feature counts: ``(id, bucket, cnt)``.

    Tokens are lowercased ``[a-z0-9]+`` runs; features are unigrams plus
    (optionally) space-joined bigrams, hashed into ``n_buckets`` via the
    cross-engine md5 bucket. Pure codegen until the explode; the groupBy
    partial-aggregates map-side, so the shuffle carries distinct
    (doc, bucket) pairs, not raw grams.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
    )
    grams = toks
    if bigrams:
        # branch on size >= 2: Spark's sequence(1, 0) counts DOWN
        # ([1, 0]), so a doc with <= 1 token would index element_at
        # out of bounds (the _word_ngrams guard; round-11 find — a doc
        # fully emptied by substring_dedup fed DSIR at sf0.1)
        two = F.expr(
            "CASE WHEN size({t}) >= 2 THEN "
            "transform(sequence(1, size({t}) - 1), "
            "_i -> concat(element_at({t}, _i), ' ', "
            "element_at({t}, _i + 1))) "
            "ELSE slice({t}, 1, 0) END".format(
                t=f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
            )
        )
        grams = F.concat(toks, two)
    return (
        df.select(F.col(id_col), F.explode(grams).alias("_gram"))
        .select(
            F.col(id_col), _bucket(F.col("_gram"), n_buckets).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_fit(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
    raw_features: DataFrame | None = None,
) -> DataFrame:
    """Fit the per-bucket importance log-weights:
    ``logw(b) = log p_target(b) - log p_raw(b)`` with add-``smoothing``
    Laplace estimates over ``n_buckets`` buckets.

    Returns ``(bucket, logw)`` — at most ``n_buckets`` rows, the
    broadcastable model. Buckets absent from both corpora fall out of
    the join; their smoothed weight is a constant that only shifts
    scores of grams nobody has, so dropping them changes nothing.

    ``raw_features``: precomputed ``hashed_ngram_features(raw_df, ...)``
    — pass a persisted copy when also calling :func:`dsir_score` on the
    same corpus, so the big side is featurized ONCE (the 1M-doc scale
    probe put the double featurization at most of the pipeline's cost).
    """
    t = (
        hashed_ngram_features(target_df, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("t_cnt"))
    )
    feats = (
        raw_features
        if raw_features is not None
        else hashed_ngram_features(raw_df, text_col, id_col, n_buckets)
    )
    r = feats.groupBy("bucket").agg(F.sum("cnt").alias("r_cnt"))
    joined = t.join(r, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
        F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
    )
    # total counts are two scalar aggregates over B rows — cheap, and
    # folding them in as crossJoin'd literals keeps the whole model
    # lazily recomputable (no driver collect)
    totals = joined.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    a = float(smoothing)
    ab = a * n_buckets
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_cnt") + a) / (F.col("t_tot") + ab))
            - F.log((F.col("r_cnt") + a) / (F.col("r_tot") + ab))
        ).alias("logw"),
    )


def dsir_score(
    raw_df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    raw_features: DataFrame | None = None,
) -> DataFrame:
    """Per-document log importance weight: ``(id, logw)``.

    The weight table is broadcast (<= n_buckets rows), so the only
    shuffle is the per-doc aggregation on the id. Documents with no
    in-model grams score 0 (empty sum), matching the paper's "no
    evidence either way" posture. Pass the same persisted
    ``raw_features`` given to :func:`dsir_fit` to featurize the corpus
    once across both phases.
    """
    feats = (
        raw_features
        if raw_features is not None
        else hashed_ngram_features(raw_df, text_col, id_col, n_buckets)
    )
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("cnt") * F.coalesce(F.col("logw"), F.lit(0.0))
            ).alias("logw")
        )
    )


def dsir_resample(
    scored: DataFrame,
    k: int,
    seed: int,
    id_col: str = "doc_id",
    weight_col: str = "logw",
) -> DataFrame:
    """Gumbel-top-k: draw ``k`` documents without replacement with
    probability proportional to ``exp(weight)`` — deterministically.

    The uniform for each doc is ``(h + 0.5) / 2^32`` with ``h`` the
    first 8 md5 hex digits of ``id:seed`` (never exactly 0 or 1, so the
    double-log is finite); the Gumbel is ``-ln(-ln(u))``. Top-k via
    orderBy+limit compiles to TakeOrderedAndProject — per-partition
    heads of size k, no global sort materialization.
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(id_col).cast("string"), F.lit(str(seed))
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_HASH_SPAN)
    gumbel = -F.log(-F.log(u))
    return (
        scored.withColumn("gumbel_key", F.col(weight_col) + gumbel)
        .orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(k)
    )
