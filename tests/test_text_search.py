"""BM25 / TF-IDF keyword-search operator tests."""

import math

import pytest

from clickhouse_arrow_spark.operators.text_search import (
    bm25_topk,
    tfidf_terms,
    tokenize,
)

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "Spark spark SPARK — spark!"),          # short, term-dense
        (2, "spark " + "filler " * 60),              # one hit, long doc
        (3, "merge window merge window merge"),
        (4, "window window window"),
        (5, "nothing relevant here at all"),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_tokenize_normalizes(spark):
    df = spark.createDataFrame([("Ab,c!  d9--X",)], "t STRING")
    out = df.select(tokenize(F.col("t")).alias("toks")).collect()[0]["toks"]
    assert out == ["ab", "c", "d9", "x"]


def test_bm25_ranking_and_exclusion(corpus):
    got = bm25_topk(corpus, "spark", k=10).collect()
    ids = [r["doc_id"] for r in got]
    # only docs containing the term appear
    assert set(ids) == {1, 2}
    # short term-dense doc outranks the long single-hit doc
    assert ids[0] == 1
    assert got[0]["bm25"] > got[1]["bm25"] > 0
    assert got[0]["matched_terms"] == 1


def test_bm25_matched_terms_counts_distinct_terms(corpus):
    got = {r["doc_id"]: r for r in bm25_topk(corpus, "merge window", k=10).collect()}
    assert got[3]["matched_terms"] == 2
    assert got[4]["matched_terms"] == 1
    assert 5 not in got


def test_bm25_hand_computed_single_doc(spark):
    # one doc, one term: score = idf * tf(k1+1)/(tf + k1) with dl = avgdl
    df = spark.createDataFrame([(1, "a a b")], "doc_id BIGINT, text STRING")
    got = bm25_topk(df, "a", k=1).collect()[0]
    idf = math.log(1 + (1 - 1 + 0.5) / (1 + 0.5))
    expect = idf * (2 * 2.2) / (2 + 1.2)
    assert got["bm25"] == pytest.approx(round(expect, 6), abs=1e-9)


def test_bm25_empty_query_raises(corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, "!!! ---")


def test_bm25_plan_has_no_cartesian(corpus):
    plan = bm25_topk(corpus, "spark merge")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_tfidf_ubiquitous_term_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "the cat"), (2, "the dog"), (3, "the owl")],
        "doc_id BIGINT, text STRING",
    )
    out = {(r["doc_id"], r["term"]): r for r in tfidf_terms(df).collect()}
    # 'the' is in every doc -> smooth idf ln((1+3)/(1+3)) = 0
    assert out[(1, "the")]["tfidf"] == 0.0
    # 'cat' df=1 -> tf * ln(4/2)
    assert out[(1, "cat")]["tfidf"] == pytest.approx(round(math.log(2.0), 6))
    assert out[(1, "cat")]["df"] == 1


def test_tfidf_min_df_filters(spark):
    df = spark.createDataFrame(
        [(1, "rare common"), (2, "common")], "doc_id BIGINT, text STRING"
    )
    terms = {r["term"] for r in tfidf_terms(df, min_df=2).collect()}
    assert terms == {"common"}
