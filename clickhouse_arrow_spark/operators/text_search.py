"""Distributed keyword search: BM25 ranking and TF-IDF weighting over a
document table.

The reference engine exposes full-text-ish retrieval through token-bloom
skip indexes plus `hasToken`/`multiSearchAny` filters
(clickhouse-arrow `src/schema.rs` index clauses; the dialect layer here
already translates those). This module adds the ranking half a
training-data pipeline needs on top of the boolean half: score every
matching document with Okapi BM25 and return the top-k, or materialize
sparse TF-IDF weights for downstream similarity.

Scale posture (the part that must survive 100 TB):

- The exploded token stream is filtered to the query's terms BEFORE the
  first aggregation, so the heavy `(doc, term)` shuffle carries only
  rows whose term is in the (tiny, literal) query set — Catalyst folds
  the `isin` into the generate/filter stage, never materializing the
  full posting list.
- Corpus stats (N, avgdl) are a single map-side-combinable aggregate
  producing ONE row, attached via a broadcast cross join — no driver
  round-trip, no second scan of the wide text column (the stats scan
  prunes to the tokenized length only).
- Document frequency is an aggregate over the already-filtered stream
  (at most |query terms| output rows) and joins back by broadcast.
- Top-k is `orderBy(...).limit(k)` — Spark's TakeOrdered, a per-partition
  heap plus a k-row driver merge, not a global sort.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["tokenize", "bm25_topk", "tfidf_terms"]

#: shared normalization: lowercase, collapse non-alphanumerics to spaces.
_NORM_RE = "[^a-z0-9]+"


def tokenize(text_col: Column) -> Column:
    """`array<string>` of normalized word tokens (empties removed).

    Mirrors the DuckDB-side oracle expression
    ``list_filter(string_split(regexp_replace(lower(t),'[^a-z0-9]+',' ','g'),' '), x -> x <> '')``
    token for token, so cross-engine counts are exact.
    """
    return F.filter(
        F.split(F.regexp_replace(F.lower(text_col), _NORM_RE, " "), " "),
        lambda t: t != F.lit(""),
    )


def _normalize_query(query: str) -> list[str]:
    """Query-side tokenization, deduplicated, order-preserving."""
    seen: dict[str, None] = {}
    for t in re.sub(_NORM_RE, " ", query.lower()).split():
        seen.setdefault(t, None)
    return list(seen)


def bm25_topk(
    docs: DataFrame,
    query: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Top-k documents by Okapi BM25 score for `query`.

    Robertson/Sparck-Jones idf with the +1 floor
    (``ln(1 + (N - df + 0.5) / (df + 0.5))``), so scores stay positive
    even for terms present in most documents.

    Returns `(id_col, bm25 double, matched_terms bigint)` ordered by
    score (rounded to 6 decimals for cross-engine determinism) descending
    then id ascending, limited to `k`.
    """
    terms = _normalize_query(query)
    if not terms:
        raise ValueError("bm25_topk: query has no indexable terms")

    base = docs.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("toks")
    ).select(id_col, "toks", F.size("toks").alias("dl"))

    # ONE row: corpus size + average document length; broadcast, not
    # collected (keeps the operator a single lazy plan).
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    tf = (
        base.select(id_col, "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    from pyspark import StorageLevel

    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)

    df_counts = tf.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )

    contrib = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )

    scored = contrib.groupBy(id_col).agg(
        F.round(F.sum("w"), 6).alias("bm25"),
        F.count(F.lit(1)).alias("matched_terms"),
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def tfidf_terms(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Sparse TF-IDF weights: one row per `(doc, term)` with
    `tf` (raw count), `df`, and `tfidf = tf * ln((1+N)/(1+df)) + 1`-free
    smooth idf (`ln((1+N)/(1+df))`, scikit-style smoothing without the
    +1 on idf so stopword-like terms can reach ~0).

    The `(doc, term)` aggregation is the only full-width shuffle. The
    `df` branch deliberately RECOMPUTES the token scan rather than
    persisting `tf`: the (doc, term) stream is corpus-sized, so caching
    it would spill roughly the input's volume to executor disks, while
    a second columnar scan is cheap and pipelined (contrast bm25_topk,
    whose query-filtered tf IS tiny and persists). The df->tf join key
    is `term` — low cardinality after aggregation, AQE broadcasts it.
    """
    base = docs.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("toks")
    )
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        base.select(id_col, F.explode("toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    if min_df > 1:
        df_counts = df_counts.where(F.col("df") >= min_df)
    return (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))),
                6,
            ).alias("tfidf"),
        )
    )
