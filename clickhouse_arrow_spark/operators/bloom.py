"""Bloom-filter benchmark decontamination — the constant-size scale
path beside the exact n-gram join in ``operators/text.decontaminate``.

The exact scan broadcasts the benchmark's n-grams as ROWS; fine for
eval sets of thousands of items, but a full eval-suite union (or a
"never train on these documents" blocklist) can carry hundreds of
millions of grams — too big to broadcast, and shuffling a 100 TB corpus
against it is the cost this operator removes. A Bloom filter compresses
the gram set to ``m_bits`` with zero false NEGATIVES: every truly
contaminated document is flagged, plus a tunable false-positive tail
(`(1 - e^{-kn/m})^k`) that only costs over-dropping a few clean docs.

Spark-first representation: the filter is NOT a driver-side bitmap —
it is a DataFrame of ``(word_idx, word)`` 64-bit words (``m_bits/64``
rows, e.g. 16 Ki rows for a 1 Mi-bit filter), built with one
aggregation and BROADCAST to the probe join. Both sides stay in
whole-stage codegen; no Python, no literals in the plan, no driver
collect. Gram definition is shared with the exact operator
(``text._word_ngrams``) so the no-false-negative guarantee holds
against it by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_arrow_spark.operators.text import _word_ngrams

__all__ = ["bloom_build", "bloom_flag"]


def _positions(gram, m_bits: int, k: int):
    """Array of k bit positions for one gram: xxhash64(gram, seed) mod
    m — the standard k-independent-hash construction, seeds 1..k."""
    return F.array(
        *[
            F.pmod(F.xxhash64(gram, F.lit(i)), F.lit(m_bits))
            for i in range(1, k + 1)
        ]
    )


def bloom_build(
    bench: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Build the filter over the benchmark's word n-grams: returns the
    ``(word_idx, word)`` bit-table (at most ``m_bits / 64`` rows).

    One explode + one groupBy(word_idx) with bit_or partials — map-side
    combined, output bounded by the filter size regardless of the
    benchmark's row count.
    """
    grams = bench.select(
        F.explode(
            F.array_distinct(_word_ngrams(F.col(text_col), n))
        ).alias("_gram")
    )
    pos = grams.select(
        F.explode(_positions(F.col("_gram"), m_bits, k)).alias("_pos")
    )
    return (
        pos.groupBy((F.col("_pos") / 64).cast("bigint").alias("word_idx"))
        .agg(
            # pyspark's shiftleft() helper takes a PYTHON int shift;
            # a per-row shift needs the SQL spelling
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))")
            ).alias("word")
        )
    )


def bloom_flag(
    docs: DataFrame,
    bloom_words: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Probe every document's n-grams against the filter: returns
    ``(id_col, n_hit_grams, flagged)`` — ``flagged`` when ANY gram has
    all k bits set (possibly contaminated; callers drop or route to the
    exact scan for confirmation).

    ``m_bits``/``k``/``n`` must match the build call. The probe is one
    broadcast join on word_idx (the corpus never shuffles against the
    benchmark) plus two keyed aggregations: (id, gram) -> did all k
    positions hit, then id -> any gram hit.
    """
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_word_ngrams(F.col(text_col), n))).alias(
            "_gram"
        ),
    )
    probes = doc_grams.select(
        id_col,
        "_gram",
        F.explode(_positions(F.col("_gram"), m_bits, k)).alias("_pos"),
    ).select(
        id_col,
        "_gram",
        (F.col("_pos") / 64).cast("bigint").alias("word_idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
        ).alias("_mask"),
    )
    hits = probes.join(F.broadcast(bloom_words), "word_idx", "left").select(
        id_col,
        "_gram",
        F.coalesce(
            (F.col("word").bitwiseAND(F.col("_mask")) != 0), F.lit(False)
        ).alias("_hit"),
    )
    gram_hits = hits.groupBy(id_col, "_gram").agg(
        (F.sum(F.col("_hit").cast("int")) == F.lit(k)).alias("_gram_hit")
    )
    per_doc = gram_hits.groupBy(id_col).agg(
        F.sum(F.col("_gram_hit").cast("int")).cast("bigint").alias(
            "n_hit_grams"
        ),
        F.max(F.col("_gram_hit")).alias("flagged"),
    )
    # docs shorter than n tokens have no grams and fall out of the
    # aggregation — re-attach them with an explicit clean verdict so the
    # output is total over the input
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_hit_grams", F.lit(0).cast("bigint")).alias(
            "n_hit_grams"
        ),
        F.coalesce("flagged", F.lit(False)).alias("flagged"),
    )
