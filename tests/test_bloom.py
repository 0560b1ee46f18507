"""Bloom-filter decontamination (operators/bloom.py). The corpus gate
doc_bloom_decontaminate pins exact_n/no-false-negative/fp-bound against
DuckDB; these tests pin the filter mechanics on controlled inputs and
the at-scale plan shape (broadcast probe join).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_arrow_spark.operators import bloom

M, K = 1 << 18, 4


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus(spark):
    phrase = "the quick brown fox jumps over the lazy dog tonight again"
    other = "completely different words that never appear in the bench set ok"
    return _df(
        spark,
        [
            (1, phrase),                       # contains the bench 8-grams
            (2, other),
            (3, "short text"),                 # < 8 tokens: no grams
            (4, phrase + " " + other),         # superset doc
        ],
    )


@pytest.fixture(scope="module")
def bench(spark):
    return _df(
        spark,
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
    )


def test_build_is_filter_sized(bench):
    words = bloom.bloom_build(bench, n=8, m_bits=M, k=K)
    rows = words.collect()
    assert 0 < len(rows) <= M // 64
    assert all(r.word != 0 for r in rows)


def test_no_false_negatives_and_misses(corpus, bench):
    words = bloom.bloom_build(bench, n=8, m_bits=M, k=K)
    flags = {
        r.doc_id: (r.flagged, r.n_hit_grams)
        for r in bloom.bloom_flag(corpus, words, n=8, m_bits=M, k=K).collect()
    }
    assert flags[1][0] is True        # shares bench grams
    assert flags[4][0] is True        # superset doc shares them too
    assert flags[2][0] is False       # disjoint vocabulary
    assert flags[1][1] >= 1
    # a doc shorter than n tokens has no grams and cannot be flagged
    assert flags[3] == (0, False)


def test_mismatched_params_would_break_guarantee(corpus, bench):
    # build and probe must agree on m — probing a filter built with a
    # different m loses the no-false-negative guarantee; this pins that
    # the parameters actually participate in the hashing
    words = bloom.bloom_build(bench, n=8, m_bits=M, k=K)
    wrong = bloom.bloom_flag(corpus, words, n=8, m_bits=M // 2, k=K)
    ok = bloom.bloom_flag(corpus, words, n=8, m_bits=M, k=K)
    got_wrong = {r.doc_id: r.flagged for r in wrong.collect()}
    got_ok = {r.doc_id: r.flagged for r in ok.collect()}
    assert got_ok[1] is True
    assert got_wrong != got_ok or not got_wrong[1]


def test_probe_plan_broadcasts(corpus, bench):
    words = bloom.bloom_build(bench, n=8, m_bits=M, k=K)
    flags = bloom.bloom_flag(corpus, words, n=8, m_bits=M, k=K)
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus never shuffles vs bench
