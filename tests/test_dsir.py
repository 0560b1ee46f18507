"""DSIR (Data Selection via Importance Resampling, Xie et al. 2023,
arXiv:2302.03169) — operators/dsir.py. The corpus gate doc_dsir_select
pins the exact values against DuckDB; these tests pin the operator
contracts: determinism, model size bound, selection-pressure direction,
and the at-scale plan shape (broadcast scoring join, distributed
top-k).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_arrow_spark.operators import dsir

N_BUCKETS = 256


@pytest.fixture(scope="module")
def docs(spark, tables):
    return spark.table("documents")


@pytest.fixture(scope="module")
def model(docs):
    target = docs.filter(F.col("source") == "src13")
    w = dsir.dsir_fit(target, docs, n_buckets=N_BUCKETS)
    scored = dsir.dsir_score(docs, w, n_buckets=N_BUCKETS).cache()
    scored.count()
    return w, scored


def test_features_shape(docs):
    feats = dsir.hashed_ngram_features(docs.limit(20), n_buckets=N_BUCKETS)
    rows = feats.collect()
    assert rows, "featurizer produced nothing"
    assert all(0 <= r.bucket < N_BUCKETS for r in rows)
    assert all(r.cnt >= 1 for r in rows)


def test_fit_is_model_sized(model):
    w, _ = model
    n = w.count()
    assert 0 < n <= N_BUCKETS


def test_score_covers_nonempty_docs(docs, model):
    _, scored = model
    # every doc with at least one [a-z0-9]+ token gets a score
    n_docs = docs.filter(
        F.size(
            F.regexp_extract_all(
                F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0)
            )
        )
        > 0
    ).count()
    assert scored.count() == n_docs


def test_target_scores_higher(docs, model):
    # the whole point: importance weights pull the selection toward the
    # target distribution, so target-source docs must out-score the pool
    _, scored = model
    joined = scored.join(docs.select("doc_id", "source"), "doc_id")
    means = dict(
        joined.groupBy(F.col("source") == "src13")
        .agg(F.avg("logw").alias("m"))
        .collect()
    )
    assert means[True] > means[False]


def test_resample_deterministic_and_seeded(model):
    _, scored = model
    a = [r.doc_id for r in dsir.dsir_resample(scored, 30, seed=1).collect()]
    b = [r.doc_id for r in dsir.dsir_resample(scored, 30, seed=1).collect()]
    c = [r.doc_id for r in dsir.dsir_resample(scored, 30, seed=2).collect()]
    assert a == b, "same seed must reproduce the same selection"
    assert set(a) != set(c), "a new seed must draw a different sample"
    assert len(a) == 30 and len(set(a)) == 30


def test_resample_prefers_high_weight(model):
    # Gumbel-top-k draws WITHOUT replacement proportional to exp(logw):
    # the selected docs' mean weight must exceed the pool's mean
    _, scored = model
    sel = dsir.dsir_resample(scored, 50, seed=3)
    sel_mean = sel.agg(F.avg("logw")).first()[0]
    pool_mean = scored.agg(F.avg("logw")).first()[0]
    assert sel_mean > pool_mean


def test_plan_shape(docs, model):
    # scoring join must broadcast the model; top-k must compile to
    # TakeOrderedAndProject (per-partition heads), not a global sort
    w, _ = model
    scored = dsir.dsir_score(docs, w, n_buckets=N_BUCKETS)
    sel = dsir.dsir_resample(scored, 10, seed=1)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_shared_features_identical(docs, model):
    # passing a persisted feature table to both phases (the single-
    # featurization scale path) must not change any value
    w_ref, scored_ref = model
    target = docs.filter(F.col("source") == "src13")
    feats = dsir.hashed_ngram_features(docs, n_buckets=N_BUCKETS).cache()
    w2 = dsir.dsir_fit(target, docs, n_buckets=N_BUCKETS,
                       raw_features=feats)
    s2 = dsir.dsir_score(docs, w2, n_buckets=N_BUCKETS,
                         raw_features=feats)
    a = {r.doc_id: r.logw for r in scored_ref.collect()}
    b = {r.doc_id: r.logw for r in s2.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)
    feats.unpersist()
