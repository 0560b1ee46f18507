"""100 TB-scale data-pipeline operators (SURVEY §7 phase 6 — greenfield,
no reference analogue): deduplication, similarity search, text analysis,
multimodal column handling, as-of joins.

Design rules applied throughout:
- no `.collect()` in any operator — everything is partition-parallel;
- built-in `pyspark.sql.functions` (JVM codegen) wherever expressible;
  Pandas UDF / mapInPandas only where vectorized Python is genuinely
  needed (multimodal decode);
- shuffles are on explicit, salted-or-bucketed keys with documented
  cardinality, so the plan survives a 1000-executor scale-up.
"""

from clickhouse_arrow_spark.operators.asof import asof_join
from clickhouse_arrow_spark.operators.dedup import (
    dedup_exact,
    minhash_candidate_pairs,
    minhash_signatures,
    simhash_fingerprints,
)
from clickhouse_arrow_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
)
from clickhouse_arrow_spark.operators.text import (
    ngram_jaccard_pairs,
    language_id,
    quality_score,
    rolling_fingerprint,
    token_count,
)

__all__ = [
    "asof_join",
    "brute_force_topk",
    "ngram_jaccard_pairs",
    "dedup_exact",
    "ivf_assign",
    "ivf_topk",
    "language_id",
    "minhash_candidate_pairs",
    "minhash_signatures",
    "quality_score",
    "rolling_fingerprint",
    "simhash_fingerprints",
    "token_count",
]
