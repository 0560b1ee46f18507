"""Round-13 pins (VERDICT r12 tasks #6 and ADVICE r12).

Parse-tree / value equality pins for the round-12 expr-string
constructors (they duplicate Column-builder logic that must stay
bit-identical), property tests for the band±1 join-key cover, the asof
right_order tie-break, and the new defensive guards.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _same_result(df1, df2) -> bool:
    """Catalyst semantic equality of two analyzed plans (ignores expr ids)."""
    return bool(
        df1._jdf.queryExecution()
        .analyzed()
        .sameResult(df2._jdf.queryExecution().analyzed())
    )


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(13)
    words = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(120):
        n = rng.randint(1, 40)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n)),
                     rng.choice(["en", "de", "fr"])))
    # planted near-dup pairs: same prefix, one word appended
    for i in range(120, 140):
        base = rows[i - 120][1]
        rows.append((i, base + " tail", rows[i - 120][2]))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------------------
# expr-string constructors == Column builders (drift pins, VERDICT #6)
# ---------------------------------------------------------------------------


def test_shingles_sql_tree_equals_builder(spark):
    from clickhouse_arrow_spark.operators.dedup import (
        _qident,
        _shingles,
        _shingles_sql,
    )

    df = spark.createDataFrame(
        [(1, "Hello  world foo bar baz"), (2, "a b")],
        "doc_id long, text string",
    )
    a = df.select(_shingles(F.col("text"), 3).alias("s"))
    b = df.select(F.expr(_shingles_sql(_qident("text"), 3)).alias("s"))
    assert _same_result(a, b)
    assert a.collect() == b.collect()


def test_normalize_sql_tree_equals_builder(spark):
    from clickhouse_arrow_spark.operators.dedup import (
        _normalize,
        _normalize_sql,
        _qident,
    )

    df = spark.createDataFrame(
        [(1, "  MiXeD   Case\t text  ")], "doc_id long, text string"
    )
    a = df.select(_normalize(F.col("text")).alias("n"))
    b = df.select(F.expr(_normalize_sql(_qident("text"))).alias("n"))
    assert _same_result(a, b)
    assert a.collect() == b.collect()


def test_simhash_expr_matches_column_builder(spark, docs):
    """The simhash expr string's VALUES equal a Column-builder replica
    of the Charikar construction (sameResult is too strict here — the
    SQL literals parse to slightly different but value-identical
    literal nodes)."""
    from clickhouse_arrow_spark.operators.dedup import (
        _normalize,
        simhash_fingerprints,
    )

    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(docs).collect()
    }

    tokens = F.split(_normalize(F.col("text")), " ")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def bit_vote(i: int):
        vote = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == F.lit(1), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        return F.when(
            vote > F.lit(0), F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))

    fp = bit_vote(0)
    for i in range(1, 64):
        fp = fp.bitwiseOR(bit_vote(i))
    want = {
        r["doc_id"]: r["simhash"]
        for r in docs.select("doc_id", fp.alias("simhash")).collect()
    }
    assert got == want


def test_minhash_signature_expr_matches_builder(spark, docs):
    """The one-string signature expr equals the 64-Column builder form."""
    import random as _random

    from clickhouse_arrow_spark.operators.dedup import (
        _P,
        _qident,
        _shingles_sql,
        minhash_signatures,
    )

    got = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(docs).collect()
    }

    rng = _random.Random(42)
    coeffs = [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(64)]
    exploded = docs.select(
        "doc_id",
        F.expr(
            f"explode(array_distinct(transform("
            f"{_shingles_sql(_qident('text'), 3)}, "
            f"s -> abs(xxhash64(s)) % {_P}L))) AS h"
        ),
    )
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    want = {
        r["doc_id"]: [r[f"m{i}"] for i in range(64)]
        for r in exploded.groupBy("doc_id").agg(*mins).collect()
    }
    assert got == want


def test_centroid_literal_bit_identical_to_lit(spark):
    """`repr(float)`+D SQL literals must round-trip to the identical
    doubles F.lit would produce (the round-12 expr-ification contract)."""
    import math

    from clickhouse_arrow_spark.operators.similarity import _centroid_literal

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(16)]) for i in range(5)
    ]
    lit = _centroid_literal(rows)
    got = spark.range(1).select(lit.alias("c")).collect()[0]["c"]
    for i, (cid, vec) in enumerate(rows):
        assert got[i]["cid"] == cid
        # exact float equality — any rounding in the literal path fails
        assert list(got[i]["cvec"]) == vec
        norm = math.sqrt(sum(x * x for x in vec)) or 1e-30
        assert got[i]["cnorm"] == norm


def test_centroid_literal_nonfinite_raises(spark):
    from clickhouse_arrow_spark.operators.similarity import _centroid_literal

    with pytest.raises(ValueError, match="non-finite"):
        _centroid_literal([(0, [1.0, float("nan")])])


# ---------------------------------------------------------------------------
# band±1 join-key cover (VERDICT #6 property test)
# ---------------------------------------------------------------------------


def test_shingle_jaccard_band_join_equals_naive(spark, docs):
    """The band-in-key join produces EXACTLY the pair set of the naive
    group-only join + post-filter it replaced (round-12 rewrite)."""
    from clickhouse_arrow_spark.operators.dedup import (
        _qident,
        _shingles_sql,
        shingle_jaccard_pairs,
    )

    threshold, length_band = 0.5, 20
    got = sorted(
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in shingle_jaccard_pairs(
            docs, threshold=threshold, length_band=length_band
        ).collect()
    )

    base = docs.select(
        "doc_id",
        F.col("lang").alias("grp"),
        F.length("text").alias("nlen"),
        F.expr(f"array_distinct({_shingles_sql(_qident('text'), 3)}) AS sh"),
    )
    a = base.select(
        F.col("doc_id").alias("a_id"), "grp",
        F.col("nlen").alias("alen"), F.col("sh").alias("ash"),
    )
    b = base.select(
        F.col("doc_id").alias("b_id"), F.col("grp").alias("bgrp"),
        F.col("nlen").alias("blen"), F.col("sh").alias("bsh"),
    )
    jac = F.expr(
        "size(array_intersect(ash, bsh)) / size(array_union(ash, bsh))"
    )
    naive = (
        a.join(b, a.grp == b.bgrp)
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("alen") - F.col("blen")) <= length_band)
        )
        .select("a_id", "b_id", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    want = sorted((r["a_id"], r["b_id"], r["jaccard"]) for r in naive.collect())
    assert got == want
    assert len(got) >= 20  # the planted near-dups must actually appear


def test_fuzzy_band_join_equals_naive(spark, docs):
    from clickhouse_arrow_spark.operators.text import fuzzy_edit_distance_pairs

    got = sorted(
        (r["a_id"], r["b_id"], r["edit_distance"])
        for r in fuzzy_edit_distance_pairs(
            docs, length_band=20, max_distance=20
        ).collect()
    )
    base = docs.select(
        "doc_id",
        F.col("lang").alias("grp"),
        F.length("text").alias("nlen"),
        F.substring("text", 1, 80).alias("pfx"),
    )
    a = base.select(
        F.col("doc_id").alias("a_id"), "grp",
        F.col("nlen").alias("alen"), F.col("pfx").alias("apfx"),
    )
    b = base.select(
        F.col("doc_id").alias("b_id"), F.col("grp").alias("bgrp"),
        F.col("nlen").alias("blen"), F.col("pfx").alias("bpfx"),
    )
    naive = (
        a.join(b, a.grp == b.bgrp)
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("alen") - F.col("blen")) <= 20)
        )
        .withColumn("edit_distance", F.levenshtein("apfx", "bpfx"))
        .where(F.col("edit_distance") <= 20)
    )
    want = sorted(
        (r["a_id"], r["b_id"], r["edit_distance"]) for r in naive.collect()
    )
    assert got == want
    assert len(got) >= 20


def test_length_band_zero_raises(spark, docs):
    from clickhouse_arrow_spark.operators.dedup import shingle_jaccard_pairs
    from clickhouse_arrow_spark.operators.text import fuzzy_edit_distance_pairs

    with pytest.raises(ValueError, match="length_band"):
        shingle_jaccard_pairs(docs, length_band=0)
    with pytest.raises(ValueError, match="length_band"):
        fuzzy_edit_distance_pairs(docs, length_band=0)


def test_qident_column_name_with_spaces(spark):
    """Expr-string constructors must work for names F.col() accepts."""
    from clickhouse_arrow_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e f")], ["doc_id", "my text"]
    )
    out = minhash_signatures(df, text_col="my text")
    assert out.count() == 2


# ---------------------------------------------------------------------------
# asof right_order tie-break (VERDICT #6)
# ---------------------------------------------------------------------------


def test_asof_right_order_tie_break_equals_preagg(spark):
    """`right_order` must pick the max tuple at equal right_time —
    exactly the groupBy(key, time).agg(max) pre-aggregation it replaced
    (round-12 asof_events_orders rewrite)."""
    from clickhouse_arrow_spark.operators.asof import asof_join

    rng = random.Random(11)
    right_rows = []
    for k in range(20):
        for t in range(5):
            # several right rows share (key, time) — the tie the option
            # exists to break
            for _ in range(rng.randint(1, 4)):
                right_rows.append((k, t * 10, rng.randrange(1000)))
    left_rows = [
        (k, rng.randrange(60)) for k in range(20) for _ in range(10)
    ]
    left = spark.createDataFrame(left_rows, "k long, lt long")
    right = spark.createDataFrame(right_rows, "k long, rt long, val long")

    got = asof_join(
        left, right, by="k", left_time="lt", right_time="rt",
        value_cols=["val"], right_order=["val"],
    )
    pre = right.groupBy("k", "rt").agg(F.max("val").alias("val"))
    want = asof_join(
        left, pre, by="k", left_time="lt", right_time="rt",
        value_cols=["val"],
    )
    key = lambda r: (r["k"], r["lt"], r["val"])  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)


# ---------------------------------------------------------------------------
# topk_per_key rewrite (VERDICT r12 #4)
# ---------------------------------------------------------------------------


def test_topk_per_key_matches_window_formulation(spark):
    """The two-phase rank-window top-k must equal the reference
    Window.partitionBy(key) formulation (score desc, id asc) exactly,
    including the rank column."""
    from pyspark.sql.window import Window

    from clickhouse_arrow_spark.operators.similarity import topk_per_key

    rng = random.Random(29)
    rows = [
        (q, i, round(rng.uniform(-1, 1), 6))
        for q in range(7)
        for i in range(500)
    ]
    # plant exact score ties to exercise the id tie-break
    rows += [(q, 1000 + j, 0.5) for q in range(7) for j in range(5)]
    scored = spark.createDataFrame(
        rows, "query_id long, vec_id long, cosine double"
    ).repartition(8)

    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
        for r in topk_per_key(
            scored, 10, key="query_id", id_col="vec_id"
        ).collect()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    want = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
        for r in scored.withColumn(
            "rank", F.row_number().over(w).cast("int")
        )
        .where(F.col("rank") <= 10)
        .collect()
    )
    assert got == want


def test_topk_per_key_no_collect_list_before_first_exchange(spark):
    """Plan pin: phase 1 is Sort+Window+Filter (spillable), not an
    ObjectHashAggregate collecting whole groups."""
    from clickhouse_arrow_spark.operators.similarity import topk_per_key

    scored = spark.range(1000).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("v"),
        (F.col("id") % 97).cast("double").alias("cosine"),
    )
    plan = topk_per_key(
        scored, 5, key="k", id_col="v"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # exactly ONE collect_list aggregate pair (the k-bounded merge), so
    # no whole-group collect on the exchange input side
    assert plan.count("collect_list") <= 2
