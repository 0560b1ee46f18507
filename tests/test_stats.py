"""Statistical aggregates (operators/stats.py), interval/moving
aggregates (operators/timeseries.py) and geo functions — validated
against independent numpy / closed-form references, not against the
implementation's own formulas.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _norm_sf(z: float) -> float:
    k = 1 / (1 + 0.2316419 * z)
    poly = k * (
        0.319381530
        + k * (-0.356563782 + k * (1.781477937 + k * (-1.821255978 + k * 1.330274429)))
    )
    return math.exp(-z * z / 2) / math.sqrt(2 * math.pi) * poly


@pytest.fixture(scope="module")
def samples(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(0.0, 1.0, 400)
    y = rng.normal(0.3, 1.5, 350)
    rows = [(float(v), 0) for v in x] + [(float(v), 1) for v in y]
    return x, y, spark.createDataFrame(rows, "v double, g int")


def test_welch_ttest_matches_numpy(samples):
    from clickhouse_arrow_spark.operators.stats import ttest

    x, y, df = samples
    n0, n1 = len(x), len(y)
    v0, v1 = x.var(ddof=1), y.var(ddof=1)
    se = v0 / n0 + v1 / n1
    t = (x.mean() - y.mean()) / math.sqrt(se)
    dof = se * se / ((v0 / n0) ** 2 / (n0 - 1) + (v1 / n1) ** 2 / (n1 - 1))
    r = ttest(df, "v", F.col("g") == 1, "welch").first()
    assert r["t_stat"] == round(t, 6)
    assert r["deg_freedom"] == round(dof, 4)
    assert r["p_value"] == round(2 * _norm_sf(abs(t)), 6)


def test_student_ttest_matches_numpy(samples):
    from clickhouse_arrow_spark.operators.stats import ttest

    x, y, df = samples
    n0, n1 = len(x), len(y)
    sp = ((n0 - 1) * x.var(ddof=1) + (n1 - 1) * y.var(ddof=1)) / (n0 + n1 - 2)
    t = (x.mean() - y.mean()) / math.sqrt(sp * (1 / n0 + 1 / n1))
    r = ttest(df, "v", F.col("g") == 1, "student").first()
    assert r["t_stat"] == round(t, 6)
    assert r["deg_freedom"] == float(n0 + n1 - 2)


def test_mann_whitney_matches_numpy(samples):
    from clickhouse_arrow_spark.operators.stats import mann_whitney_u

    x, y, df = samples
    allv = np.concatenate([x, y])
    grp = np.concatenate([np.zeros(len(x)), np.ones(len(y))])
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv))
    i = 0
    sv = allv[order]
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    n1 = int((grp == 1).sum())
    n0 = int((grp == 0).sum())
    n = n0 + n1
    u1 = ranks[grp == 1].sum() - n1 * (n1 + 1) / 2
    _, counts = np.unique(allv, return_counts=True)
    tie = float((counts.astype(float) ** 3 - counts).sum())
    sigma = math.sqrt(n0 * n1 / 12 * ((n + 1) - tie / (n * (n - 1))))
    z = max(abs(u1 - n0 * n1 / 2) - 0.5, 0) / sigma
    r = mann_whitney_u(df, "v", F.col("g") == 1).first()
    assert r["u_stat"] == round(u1, 4)
    assert r["p_value"] == round(min(2 * _norm_sf(z), 1.0), 6)


def test_mann_whitney_tiny_exact(spark):
    """Hand-checkable 2x3 case with a tie."""
    from clickhouse_arrow_spark.operators.stats import mann_whitney_u

    # group0: 1, 2, 2 ; group1: 2, 5  -> ranks: 1, (2,3,4 avg=3)x3, 5
    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (2.0, 0), (2.0, 1), (5.0, 1)], "v double, g int"
    )
    r = mann_whitney_u(df, "v", F.col("g") == 1).first()
    # R1 = 3 + 5 = 8, U1 = 8 - 2*3/2 = 5
    assert r["u_stat"] == 5.0


def test_association_matches_numpy(spark):
    from clickhouse_arrow_spark.operators.stats import association, entropy_agg

    sizes = {
        ("x", "p"): 5, ("x", "q"): 2, ("y", "p"): 1,
        ("y", "q"): 6, ("z", "p"): 4, ("z", "q"): 3,
    }
    rows = [(a, b) for (a, b), k in sizes.items() for _ in range(k)]
    df = spark.createDataFrame(rows, "a string, b string")
    avals = sorted({a for a, _ in rows})
    bvals = sorted({b for _, b in rows})
    O = np.array([[sizes.get((a, b), 0) for b in bvals] for a in avals], float)
    n = O.sum()
    ra, cb = O.sum(1), O.sum(0)
    E = np.outer(ra, cb) / n
    chi2 = ((O - E) ** 2 / E).sum()
    r_, c_ = len(avals), len(bvals)
    phi2 = chi2 / n
    got = association(df, "a", "b").first()
    assert got["cramers_v"] == round(math.sqrt(phi2 / min(r_ - 1, c_ - 1)), 6)
    phi2c = max(phi2 - (r_ - 1) * (c_ - 1) / (n - 1), 0)
    rc = r_ - (r_ - 1) ** 2 / (n - 1)
    cc = c_ - (c_ - 1) ** 2 / (n - 1)
    assert got["cramers_v_corrected"] == round(
        math.sqrt(phi2c / min(rc - 1, cc - 1)), 6
    )
    ha = -sum(v / n * math.log(v / n) for v in ra)
    hab = -sum(
        O[i, j] / n * math.log(O[i, j] / cb[j])
        for i in range(r_)
        for j in range(c_)
        if O[i, j]
    )
    assert got["theils_u"] == round((ha - hab) / ha, 6)
    assert got["contingency"] == round(math.sqrt(chi2 / (chi2 + n)), 6)
    hx = -sum(v / n * math.log2(v / n) for v in ra)
    assert entropy_agg(df, "a").first()["entropy"] == round(hx, 6)


def test_ordered_cumsum_matches_single_partition(spark):
    """The two-phase range-partitioned cumsum equals the naive global
    window on shuffled input."""
    from clickhouse_arrow_spark.operators.stats import _ordered_cumsum

    rng = np.random.default_rng(3)
    vals = rng.permutation(200)
    df = spark.createDataFrame(
        [(int(v), int(v) % 7 + 1) for v in vals], "k int, w int"
    ).repartition(8)
    got = {
        r["k"]: r["cum_w"]
        for r in _ordered_cumsum(df, "k", ["w"], num_partitions=5).collect()
    }
    expect = {}
    run = 0
    for v in sorted(vals):
        expect[int(v)] = run
        run += int(v) % 7 + 1
    assert got == expect


def test_interval_length_sum_and_max_intersections(spark):
    from clickhouse_arrow_spark.operators.timeseries import (
        interval_length_sum,
        max_intersections,
    )

    iv = spark.createDataFrame(
        [(1, 1, 3), (1, 2, 5), (1, 7, 9), (1, 9, 10), (2, 0, 1)],
        "k int, s int, e int",
    )
    ils = {
        r["k"]: r["interval_length_sum"]
        for r in interval_length_sum(iv, ["k"], "s", "e").collect()
    }
    # k=1: [1,5] + [7,10] (9 touches -> merged) = 4 + 3
    assert ils == {1: 7, 2: 1}
    mx = {
        r["k"]: (r["max_intersections"], r["max_intersections_position"])
        for r in max_intersections(iv, ["k"], "s", "e").collect()
    }
    # depth 2 first reached at 2 ([1,3]x[2,5]); [7,9] and [9,10] touch
    # but half-open ends mean they do NOT intersect
    assert mx == {1: (2, 2), 2: (1, 0)}


def test_group_array_moving(spark):
    from clickhouse_arrow_spark.operators.timeseries import group_array_moving

    df = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 3, 30), (1, 4, 40)], "k int, o int, v int"
    )
    r = group_array_moving(df, ["k"], "o", "v", 3).first()
    assert r["moving_sum"] == [10, 30, 60, 90]
    # CH documented quirk: divide by the FULL window size always
    assert r["moving_avg"] == pytest.approx([10 / 3, 10.0, 20.0, 30.0])


def test_geo_docs_examples(spark):
    from clickhouse_arrow_spark.functions import ch_functions as chf

    r = spark.range(1).select(
        chf.geohash_encode(
            F.lit(-5.60302734375), F.lit(42.593994140625), 12
        ).alias("gh12"),
        chf.geohash_encode(F.lit(-5.60302734375), F.lit(42.593994140625), 5).alias(
            "gh5"
        ),
        chf.geohash_decode(F.lit("ezs42")).alias("dec"),
        chf.great_circle_angle(F.lit(0.0), F.lit(0.0), F.lit(90.0), F.lit(0.0)).alias(
            "ang"
        ),
    ).first()
    # ClickHouse docs: geohashEncode(-5.60302734375, 42.593994140625)
    assert r["gh12"] == "ezs42d000000"
    assert r["gh5"] == "ezs42"
    # canonical geohash test vector: center of cell 'ezs42'
    assert r["dec"]["longitude"] == pytest.approx(-5.60302734375)
    assert r["dec"]["latitude"] == pytest.approx(42.60498046875)
    assert r["ang"] == pytest.approx(90.0, abs=1e-9)


def test_geohash_roundtrip_quantization(spark):
    """encode(decode-center) reproduces the hash; decode error is
    bounded by the cell size at each precision."""
    from clickhouse_arrow_spark.functions import ch_functions as chf

    pts = [(13.3, 52.5), (-74.0059, 40.7127), (151.2, -33.85), (0.0, 0.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for prec, tol_lon in ((5, 360 / 2**13), (9, 360 / 2**23)):
        rows = df.select(
            "lon",
            "lat",
            chf.geohash_decode(
                chf.geohash_encode(F.col("lon"), F.col("lat"), prec)
            ).alias("d"),
        ).collect()
        for row in rows:
            assert abs(row["d"]["longitude"] - row["lon"]) <= tol_lon
            assert abs(row["d"]["latitude"] - row["lat"]) <= tol_lon


def test_text_distance_kernels_vs_duckdb(spark):
    """The Python kernels must agree exactly with DuckDB's independent
    implementations (the oracle side of text_fuzzy_pairs)."""
    import random
    import string

    import duckdb

    from clickhouse_arrow_spark.functions.text_distance import (
        _dl_py,
        _jaro_py,
        _jw_py,
    )

    rng = random.Random(99)
    for _ in range(150):
        a = "".join(rng.choices(string.ascii_lowercase[:6], k=rng.randint(0, 12)))
        b = "".join(rng.choices(string.ascii_lowercase[:6], k=rng.randint(0, 12)))
        dl, jr, jw = duckdb.sql(
            f"SELECT damerau_levenshtein('{a}','{b}'), "
            f"jaro_similarity('{a}','{b}'), "
            f"jaro_winkler_similarity('{a}','{b}')"
        ).fetchone()
        assert _dl_py(a, b) == dl, (a, b)
        assert abs(_jaro_py(a, b) - jr) < 1e-12, (a, b)
        assert abs(_jw_py(a, b) - jw) < 1e-12, (a, b)
    # true Damerau-Levenshtein, not OSA: ca -> abc is 2
    assert _dl_py("ca", "abc") == 2


def test_text_distance_udfs(spark):
    from clickhouse_arrow_spark.functions import text_distance as td
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("kitten", "sitting"), ("martha", "marhta"), ("ca", "abc"), (None, "x")],
        "a string, b string",
    )
    rows = df.select(
        td.damerau_levenshtein("a", "b").alias("dl"),
        td.jaro_winkler_similarity(F.col("a"), F.col("b")).alias("jw"),
    ).collect()
    # martha -> marhta is ONE adjacent transposition under DL
    assert [r["dl"] for r in rows] == [3, 1, 2, None]
    assert rows[1]["jw"] == pytest.approx(0.9611111111111111)


def test_equi_histogram(spark):
    from clickhouse_arrow_spark.operators.stats import equi_histogram

    df = spark.createDataFrame([(float(v),) for v in range(10)], "v double")
    rows = {r["bin"]: r for r in equi_histogram(df, "v", 3).collect()}
    # [0,9] in 3 bins of width 3: [0,3)->0,1,2 ; [3,6)->3,4,5 ; [6,9]->6..9
    assert rows[1]["cnt"] == 3 and rows[2]["cnt"] == 3 and rows[3]["cnt"] == 4
    assert rows[1]["bin_lo"] == 0.0 and rows[3]["bin_hi"] == 9.0
    # degenerate: constant column collapses to one bin
    one = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    got = equi_histogram(one, "v", 4).collect()
    assert len(got) == 1 and got[0]["cnt"] == 2


def test_fuzzy_edit_distance_pairs(spark):
    from clickhouse_arrow_spark.operators.text import fuzzy_edit_distance_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "the quick brown fox jumps over the lazy cat", "en"),
            (3, "completely different text with no resemblance", "en"),
            (4, "the quick brown fox jumps over the lazy dog", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = fuzzy_edit_distance_pairs(
        docs, prefix_len=64, length_band=10, max_distance=5
    ).collect()
    got = {(r["a_id"], r["b_id"]): r["edit_distance"] for r in rows}
    # only (1,2) survives: same lang, 3-char edit; 4 is in another group
    assert got == {(1, 2): 3}
    assert rows[0]["jaro_winkler"] > 0.9


def test_ks_test_matches_numpy(samples):
    import duckdb  # noqa: F401 — parity of the series with the oracle

    from clickhouse_arrow_spark.operators.stats import ks_test

    x, y, df = samples
    allv = np.sort(np.unique(np.concatenate([x, y])))
    f0 = np.searchsorted(np.sort(x), allv, "right") / len(x)
    f1 = np.searchsorted(np.sort(y), allv, "right") / len(y)
    d = float(np.abs(f0 - f1).max())
    en = math.sqrt(len(x) * len(y) / (len(x) + len(y)))
    lam = (en + 0.12 + 0.11 / en) * d
    q = 2 * sum(
        (-1) ** (k - 1) * math.exp(-2 * k * k * lam * lam)
        for k in range(1, 101)
    )
    r = ks_test(df, "v", F.col("g") == 1).first()
    assert r["d_stat"] == round(d, 6)
    assert r["p_value"] == round(min(max(q, 0.0), 1.0), 6)


def test_bitmap_and_array_rotation_formatters_execute(spark):
    """The bitmap/rotation/fold translations are valid executable Spark
    SQL with the documented semantics."""
    from clickhouse_arrow_spark.dialect import translate_ch_sql as t

    spark.createDataFrame(
        [([3, 1, 2, 1], [2, 3, 5])], "a array<int>, b array<int>"
    ).createOrReplaceTempView("bm")
    sql = t(
        "SELECT bitmapBuild(a) AS built, bitmapAnd(bitmapBuild(a), b) AS bAnd, "
        "bitmapXorCardinality(bitmapBuild(a), b) AS xcard, "
        "bitmapHasAll(bitmapBuild(a), b) AS hasall, "
        "arrayRotateLeft(b, 1) AS rot, arrayShiftLeft(b, 1, 0) AS shf, "
        "arrayFold((acc, x) -> acc + x, b, 0) AS folded "
        "FROM bm"
    )
    r = spark.sql(sql).first()
    assert r["built"] == [1, 2, 3]
    assert r["bAnd"] == [2, 3]
    assert r["xcard"] == 2  # {1,5}
    assert r["hasall"] is False  # 5 not in {1,2,3}
    assert r["rot"] == [3, 5, 2]
    assert r["shf"] == [3, 5, 0]
    assert r["folded"] == 10


def test_auc_matches_pairwise_reference(spark):
    from clickhouse_arrow_spark.operators.stats import auc

    rng = np.random.default_rng(9)
    scores = np.concatenate([rng.normal(0.6, 0.2, 120), rng.normal(0.4, 0.2, 200)])
    labels = np.concatenate([np.ones(120), np.zeros(200)])
    # plant ties
    scores[:10] = scores[120:130]
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)],
        "score double, label boolean",
    )
    pos, neg = scores[labels == 1], scores[labels == 0]
    wins = (pos[:, None] > neg[None, :]).sum() + 0.5 * (
        pos[:, None] == neg[None, :]
    ).sum()
    ref = wins / (len(pos) * len(neg))
    assert auc(df, "score", F.col("label")).first()["auc"] == round(ref, 6)


def test_point_in_polygon(spark):
    """Even-odd ray casting as a pure JVM fold — convex, concave, and
    degenerate polygons."""
    from clickhouse_arrow_spark.functions.ch_functions import point_in_polygon

    def poly(*pts):
        return F.array(
            *[
                F.struct(F.lit(float(a)).alias("x"), F.lit(float(b)).alias("y"))
                for a, b in pts
            ]
        )

    square = poly((0, 0), (1, 0), (1, 1), (0, 1))
    # concave "C" shape: notch on the right side
    cshape = poly((0, 0), (4, 0), (4, 1), (1, 1), (1, 3), (4, 3), (4, 4), (0, 4))
    r = spark.range(1).select(
        point_in_polygon(F.lit(0.5), F.lit(0.5), square).alias("a"),
        point_in_polygon(F.lit(1.5), F.lit(0.5), square).alias("b"),
        point_in_polygon(F.lit(0.5), F.lit(2.0), cshape).alias("c"),
        point_in_polygon(F.lit(3.0), F.lit(2.0), cshape).alias("d"),  # in notch
        point_in_polygon(F.lit(3.0), F.lit(0.5), cshape).alias("e"),
        point_in_polygon(F.lit(0.5), F.lit(0.5), poly((0, 0), (1, 1))).alias(
            "degen"
        ),
    ).first()
    assert (r["a"], r["b"]) == (True, False)
    assert (r["c"], r["d"], r["e"]) == (True, False, True)
    assert r["degen"] is False


def test_stats_label_swap_invariances(spark):
    """Algebraic invariances that hold for ANY data: swapping the group
    labels negates t, reflects U and AUC, and fixes D."""
    rng = np.random.default_rng(21)
    rows = [
        (float(v), int(g))
        for v, g in zip(rng.normal(0, 1, 300), rng.integers(0, 2, 300))
    ]
    # plant ties so the tie-handling paths are exercised
    rows += [(1.5, 0), (1.5, 1), (1.5, 1)]
    df = spark.createDataFrame(rows, "v double, g int")
    from clickhouse_arrow_spark.operators.stats import (
        auc,
        ks_test,
        mann_whitney_u,
        ttest,
    )

    a = ttest(df, "v", F.col("g") == 1, "welch").first()
    b = ttest(df, "v", F.col("g") == 0, "welch").first()
    assert a["t_stat"] == -b["t_stat"]
    assert a["deg_freedom"] == b["deg_freedom"]
    assert a["p_value"] == b["p_value"]

    n1 = sum(1 for _, g in rows if g == 1)
    n0 = len(rows) - n1
    ua = mann_whitney_u(df, "v", F.col("g") == 1).first()
    ub = mann_whitney_u(df, "v", F.col("g") == 0).first()
    # U1 + U0 = n0 * n1
    assert ua["u_stat"] + ub["u_stat"] == pytest.approx(n0 * n1)
    assert ua["p_value"] == ub["p_value"]

    ka = ks_test(df, "v", F.col("g") == 1).first()
    kb = ks_test(df, "v", F.col("g") == 0).first()
    assert (ka["d_stat"], ka["p_value"]) == (kb["d_stat"], kb["p_value"])

    aa = auc(df, "v", F.col("g") == 1).first()["auc"]
    ab = auc(df, "v", F.col("g") == 0).first()["auc"]
    assert aa + ab == pytest.approx(1.0, abs=2e-6)


def test_interval_union_split_invariance(spark):
    """Splitting any interval at an interior point never changes the
    union length; duplicating intervals never changes it either."""
    from clickhouse_arrow_spark.operators.timeseries import interval_length_sum

    base = [(1, 0.0, 10.0), (1, 5.0, 12.0), (1, 20.0, 21.0)]
    split = [(1, 0.0, 4.0), (1, 4.0, 10.0), (1, 5.0, 12.0), (1, 20.0, 21.0)]
    dup = base + base
    for variant in (base, split, dup):
        df = spark.createDataFrame(variant, "k int, s double, e double")
        got = interval_length_sum(df, ["k"], "s", "e").first()[
            "interval_length_sum"
        ]
        assert got == pytest.approx(13.0), variant


def test_association_symmetry_and_independence(spark):
    """cramersV/contingency are symmetric in (a, b); a perfectly
    independent table scores ~0; a deterministic mapping scores 1."""
    from clickhouse_arrow_spark.operators.stats import association

    # independent: every (a, b) cell equally likely
    indep = [(a, b) for a in "xy" for b in "pq" for _ in range(10)]
    df = spark.createDataFrame(indep, "a string, b string")
    r = association(df, "a", "b").first()
    assert r["cramers_v"] == 0.0 and r["theils_u"] == 0.0

    # deterministic: b fully determined by a
    det = [("x", "p")] * 7 + [("y", "q")] * 9
    d = spark.createDataFrame(det, "a string, b string")
    rd = association(d, "a", "b").first()
    assert rd["cramers_v"] == 1.0 and rd["theils_u"] == 1.0

    skew = [("x", "p")] * 5 + [("x", "q")] * 2 + [("y", "p")] * 4 + [("y", "q")] * 6
    sdf = spark.createDataFrame(skew, "a string, b string")
    ab = association(sdf, "a", "b").first()
    ba = association(sdf, "b", "a").first()
    assert ab["cramers_v"] == ba["cramers_v"]
    assert ab["contingency"] == ba["contingency"]
