"""Model-based quality classifier tests (operators/quality_model.py)."""

import random

import pytest

from clickhouse_arrow_spark.operators.quality_model import (
    score_quality,
    train_quality_classifier,
)

GOOD_WORDS = "the study found results method analysis data clear evidence report".split()
BAD_WORDS = "buy cheap click winner free casino pills offer deal spam".split()


def _doc(rng, words):
    return " ".join(rng.choice(words) for _ in range(30))


@pytest.fixture(scope="module")
def split_corpus(spark):
    rng = random.Random(11)
    rows = []
    for i in range(120):
        rows.append((i, _doc(rng, GOOD_WORDS), 1))
        rows.append((1000 + i, _doc(rng, BAD_WORDS), 0))
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, label INT")
    train = df.where("doc_id % 5 != 0")
    test = df.where("doc_id % 5 = 0")
    return train, test


def test_classifier_separates_heldout(split_corpus):
    train, test = split_corpus
    m = train_quality_classifier(train)
    scored = score_quality(test, m).select("label", "quality_prob").collect()
    acc = sum(
        1 for r in scored if (r["quality_prob"] >= 0.5) == (r["label"] == 1)
    ) / len(scored)
    assert acc >= 0.95
    for r in scored:
        assert 0.0 <= r["quality_prob"] <= 1.0


def test_score_keeps_input_columns(split_corpus):
    train, _ = split_corpus
    m = train_quality_classifier(train, bigrams=False)
    out = score_quality(train.limit(5), m)
    assert set(out.columns) == {"doc_id", "text", "label", "quality_prob"}


def test_scoring_plan_has_no_shuffle(split_corpus):
    train, test = split_corpus
    m = train_quality_classifier(train)
    plan = (
        score_quality(test, m)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
