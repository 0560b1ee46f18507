"""Model-based quality filtering: a fastText-style linear classifier
over hashed n-gram features, trained and scored with Spark ML.

The GPT-3/LLaMA-class pipelines filter crawl text with exactly this
shape — a cheap linear model scoring "reference-like vs crawl-like"
(Brown et al. 2020 §A; Touvron et al. 2023 use a fastText classifier
for Wikipedia-likeness). The heuristic tiers in operators/text.py
(Gopher rules, quality_score) are model-free; this adds the learned
tier on the same documents table.

Everything stays JVM-side: tokenization is a codegen projection,
`HashingTF` hashes token arrays into a fixed-width sparse vector inside
the JVM, and LogisticRegression trains via distributed L-BFGS
(gradient aggregation per iteration — the same map-side-combine shape
as any keyed agg, no driver-held data beyond the coefficient vector).
Scoring broadcasts the (n_features,) coefficient vector and is one
projection — no shuffle, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["QualityModel", "train_quality_classifier", "score_quality"]


def _gram_array(text_col: str, bigrams: bool):
    """array<string> of lowercased [a-z0-9]+ unigrams (+ bigrams),
    matching operators/dsir.hashed_ngram_features' normalization."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
    )
    if not bigrams:
        return toks
    two = F.expr(
        "transform(sequence(1, greatest(size({t}) - 1, 0)), "
        "_i -> concat(element_at({t}, _i), ' ', "
        "element_at({t}, _i + 1)))".format(
            t=f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        )
    )
    return F.concat(toks, two)


@dataclass(frozen=True)
class QualityModel:
    hashing_tf: object   # pyspark.ml.feature.HashingTF (stateless)
    lr_model: object     # pyspark.ml.classification.LogisticRegressionModel
    bigrams: bool


def train_quality_classifier(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 18,
    bigrams: bool = True,
    reg_param: float = 1e-4,
    max_iter: int = 50,
) -> QualityModel:
    """Fit the classifier on `(text, label)` rows (label 1 = keep-worthy,
    0 = reject-worthy). Distributed L-BFGS; the only driver state is the
    (n_features,) coefficient vector."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(
        inputCol="_grams", outputCol="_features", numFeatures=n_features
    )
    feats = tf.transform(
        labeled.select(
            F.col(label_col).cast("double").alias("_label"),
            _gram_array(text_col, bigrams).alias("_grams"),
        )
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol="_label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return QualityModel(
        hashing_tf=tf, lr_model=lr.fit(feats), bigrams=bigrams
    )


def score_quality(
    df: DataFrame,
    model: QualityModel,
    *,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append `out_col` = P(label=1). One JVM projection: hash the gram
    array, dot the broadcast coefficients, sigmoid. Pair with a
    threshold filter or operators/sampling.select_token_budget for the
    keep decision."""
    from pyspark.ml.functions import vector_to_array

    feats = model.hashing_tf.transform(
        df.withColumn("_grams", _gram_array(text_col, model.bigrams))
    )
    scored = model.lr_model.transform(feats)
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability")).getItem(1)
    ).drop("_grams", "_features", "rawPrediction", "probability",
           "prediction")
