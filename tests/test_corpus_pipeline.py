"""Round-11 end-to-end pipeline composition gate
(operators/corpus_pipeline.py; VERDICT r10 task #2): planted-artifact
kill assertions per tier, conservation, determinism of the final
permutation, the broadcast-shape plan audit, and the DSIR empty-text
regression the sf0.1 run of the composed pipeline exposed."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def e2e(spark, tables):
    from clickhouse_arrow_spark.operators import corpus_pipeline as cp

    stages = cp.llm_corpus_pipeline(spark, spark.table("documents"))
    summary = {
        r["stage"]: r.asDict()
        for r in cp.stage_summary(stages).collect()
    }
    return stages, summary


def test_stage_roster(e2e):
    _, s = e2e
    assert sorted(s) == [
        "0_input", "1_c4", "2_gopher", "3_exact", "4_neardup",
        "5_substr", "6_decontam", "7_dsir", "8_pack", "9_shuffle",
    ]


def test_planted_exact_dupes_die_at_tier3(e2e):
    _, s = e2e
    assert s["0_input"]["exact_alive"] > 0
    assert s["2_gopher"]["exact_alive"] > 0      # copies flow to dedup
    assert s["3_exact"]["exact_alive"] == 0      # and die exactly there
    assert s["9_shuffle"]["exact_alive"] == 0


def test_planted_near_dupes_die_at_tier4(e2e):
    _, s = e2e
    assert s["0_input"]["near_alive"] > 0
    assert s["3_exact"]["near_alive"] == s["0_input"]["near_alive"], \
        "near copies must SURVIVE exact dedup (tail differs)"
    assert s["4_neardup"]["near_alive"] == 0


def test_planted_shared_run_collapses_at_tier5(e2e):
    _, s = e2e
    assert s["4_neardup"]["run_docs"] > 1
    # exactly ONE surviving occurrence of the 60-token shared run
    assert s["5_substr"]["run_docs"] == 1
    # and the removed tokens show up in the token conservation
    assert s["5_substr"]["toks"] < s["4_neardup"]["toks"]


def test_planted_contamination_dies_at_tier6(e2e):
    _, s = e2e
    assert s["5_substr"]["contam_alive"] > 0
    assert s["6_decontam"]["contam_alive"] == 0
    # decontamination drops exactly the contaminated docs, nothing else
    assert (s["5_substr"]["n_rows"] - s["6_decontam"]["n_rows"]
            == s["5_substr"]["contam_alive"])


def test_conservation_monotone(e2e):
    _, s = e2e
    order = sorted(s)
    for prev, cur in zip(order, order[1:]):
        assert s[cur]["n_rows"] <= s[prev]["n_rows"]
        assert s[cur]["toks"] <= s[prev]["toks"]
    assert s["9_shuffle"]["n_rows"] == s["8_pack"]["n_rows"]
    assert s["9_shuffle"]["idsum"] == s["8_pack"]["idsum"]


def test_shuffle_digest_deterministic(spark, tables, e2e):
    from clickhouse_arrow_spark.operators import corpus_pipeline as cp
    from clickhouse_arrow_spark.operators.text import epoch_shuffle

    stages, s = e2e
    d = dict(stages)
    again = (
        cp.stage_summary([("9_shuffle",
                           epoch_shuffle(d["8_pack"],
                                         seed=cp.SHUFFLE_SEED))])
        .collect()[0]["order_digest"]
    )
    assert again == s["9_shuffle"]["order_digest"] != 0


def test_drop_set_joins_are_broadcast(spark, tables):
    """Plan audit: drop-set re-entry joins carry NO forced broadcast
    hint (round 12 — at 100 TB a near-dup drop-set is a constant
    fraction of the corpus and a forced broadcast OOMs the driver);
    for a candidate-bounded set it is AQE that picks the broadcast
    anti-join at runtime."""
    from clickhouse_arrow_spark.operators import corpus_pipeline as cp

    s0 = cp.synthesize_corpus(spark.table("documents"))
    drop = s0.select("doc_id").limit(5)
    joined = s0.join(drop, "doc_id", "left_anti")
    joined.count()  # materialize so AQE finalizes the adaptive plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan


def test_hashed_ngram_features_short_docs(spark):
    """Regression (round 11): sequence(1, 0) counts DOWN in Spark, so
    docs with <= 1 alphanumeric token crashed the bigram transform with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT — hit by a doc that substring
    dedup emptied completely at sf0.1."""
    from clickhouse_arrow_spark.operators.dsir import (
        hashed_ngram_features,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two tokens")],
        "doc_id long, text string",
    )
    rows = hashed_ngram_features(df, n_buckets=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], 0)
        by_doc[r["doc_id"]] += r["cnt"]
    assert 1 not in by_doc            # empty doc -> no features
    assert by_doc[2] == 1             # unigram only
    assert by_doc[3] == 3             # 2 unigrams + 1 bigram


def test_entropy_large_group_linear(client):
    """Regression (round 11): entropy()'s fold re-sorted the collected
    group PER ELEMENT (no CSE inside Catalyst lambdas) — O(n^2 log n),
    a 40-minute hang on sf0.1's 30k-row groups. The let-binding form
    must handle a 200k-row group in seconds."""
    import time

    t0 = time.time()
    row = client.query_ch(
        "SELECT round(entropy(number % 7), 6) AS h "
        "FROM numbers(200000)"
    ).collect()[0]
    assert time.time() - t0 < 60
    assert row["h"] == pytest.approx(2.807348, abs=1e-5)


def test_dsir_boundary_margins(spark, tables, e2e):
    """Round-12 ADVICE: the gate's audited rows depend on (a) the
    Gumbel-key cut between rank k and rank k+1 and (b) 6-dp rounding
    of float-accumulated logw — both sensitive to the ~1e-13
    partial-aggregation drift band between Spark and DuckDB. Pin that
    the current data sits far from both cliffs, so a future data
    rotation landing on a tie fails HERE (with a clear message) rather
    than as a nondeterministic oracle mismatch."""
    from clickhouse_arrow_spark.operators import corpus_pipeline as cp
    from clickhouse_arrow_spark.operators import dsir

    stages, _ = e2e
    s6 = dict(stages)["6_decontam"]
    weights = dsir.dsir_fit(
        s6.where(F.col("source") == cp.DSIR_TARGET_SOURCE), s6,
        n_buckets=cp.DSIR_BUCKETS,
    )
    scored = dsir.dsir_score(s6, weights, n_buckets=cp.DSIR_BUCKETS)
    # rank k vs k+1 on the exact key dsir_resample orders by
    keyed = dsir.dsir_resample(scored, cp.DSIR_K + 1, cp.DSIR_SEED)
    keys = [r["gumbel_key"] for r in keyed.collect()]
    assert len(keys) == cp.DSIR_K + 1
    gap = keys[cp.DSIR_K - 1] - keys[cp.DSIR_K]
    assert gap > 1e-9, f"Gumbel cut gap {gap} inside drift band"
    # every selected q := round(logw, 6) sits > 1e-4 half-ulp units
    # from its rounding boundary (drift 1e-13 ~ 1e-7 in these units)
    logws = [r["logw"] for r in keyed.limit(cp.DSIR_K).collect()]
    for lw in logws:
        frac = abs((lw * 1e6) % 1.0 - 0.5)
        assert frac > 1e-4, f"logw {lw} within drift of 6-dp boundary"
