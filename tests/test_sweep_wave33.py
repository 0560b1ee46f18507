"""Wave 33 (round 9): rankCorr, the -Resample combinator, pure-bit H3
accessors. Pins derive from the published formulae; the corpus gate
util_sweep_wave33 carries the exact-literal oracle."""

from __future__ import annotations

import math

import pytest

from clickhouse_arrow_spark.dialect import UntranslatableFunctionError


def one(client, sql):
    return client.query_ch(sql).collect()[0]


def test_rank_corr_basic(client):
    r = one(client, "SELECT rankCorr(a, b) AS r FROM "
            "(SELECT 1.0 AS a, 10.0 AS b UNION ALL SELECT 2.0, 20.0 "
            "UNION ALL SELECT 3.0, 30.0 UNION ALL SELECT 4.0, 41.0 "
            "UNION ALL SELECT 5.0, 35.0)")
    assert abs(r["r"] - 0.9) < 1e-12


def test_rank_corr_monotone_and_inverse(client):
    r = one(client, "SELECT rankCorr(a, a * 2 + 1) AS up, "
            "rankCorr(a, -a) AS down FROM "
            "(SELECT arrayJoin([1.0, 2.0, 3.0, 4.0]) AS a)")
    assert abs(r["up"] - 1.0) < 1e-12
    assert abs(r["down"] + 1.0) < 1e-12


def test_rank_corr_average_ranks_on_ties(client):
    r = one(client, "SELECT rankCorr(a, b) AS r FROM "
            "(SELECT 1.0 AS a, 1.0 AS b UNION ALL SELECT 1.0, 2.0 "
            "UNION ALL SELECT 2.0, 3.0)")
    assert abs(r["r"] - math.sqrt(3) / 2) < 1e-12


def test_rank_corr_grouped(client, tables):
    # per-group aggregation: one rho per region, all in [-1, 1]
    rows = client.query_ch(
        "SELECT n_regionkey, rankCorr(n_nationkey, "
        "length(n_name)) AS r FROM nation GROUP BY n_regionkey"
    ).collect()
    assert len(rows) == 5
    assert all(-1.0 - 1e-12 <= x["r"] <= 1.0 + 1e-12 for x in rows)


def test_resample_bases(client):
    r = one(client, "SELECT countResample(0, 10, 5)(k) AS c, "
            "sumResample(0, 10, 5)(k, k) AS s, "
            "minResample(0, 10, 5)(k, k) AS mn, "
            "maxResample(0, 10, 5)(k, k) AS mx, "
            "avgResample(0, 10, 5)(k, k) AS av FROM "
            "(SELECT arrayJoin([0.0, 1.0, 2.0, 5.0, 9.0]) AS k)")
    assert list(r["c"]) == [3, 2]
    assert list(r["s"]) == [3.0, 14.0]
    assert list(r["mn"]) == [0.0, 5.0]
    assert list(r["mx"]) == [2.0, 9.0]
    assert list(r["av"]) == [1.0, 7.0]


def test_resample_truncated_last_bucket_and_empty(client):
    r = one(client, "SELECT countResample(0, 6, 4)(k) AS c, "
            "sumResample(0, 6, 4)(k, k) AS s, "
            "minResample(0, 6, 4)(k, k) AS mn FROM "
            "(SELECT arrayJoin([3.0, 7.0]) AS k)")
    # [0,4) has 3.0; [4,6) is empty (7.0 is outside [start,end))
    assert list(r["c"]) == [1, 0]
    assert list(r["s"]) == [3.0, 0.0]
    assert list(r["mn"]) == [3.0, None]


def test_resample_validation(client):
    with pytest.raises(UntranslatableFunctionError, match="three"):
        client.query_ch("SELECT countResample(0, 10)(k) FROM t")
    with pytest.raises(UntranslatableFunctionError, match="integer"):
        client.query_ch("SELECT countResample(0, 10, x)(k) FROM t")
    with pytest.raises(UntranslatableFunctionError, match="step"):
        client.query_ch("SELECT countResample(10, 0, 5)(k) FROM t")


def test_h3_accessors(client):
    r = one(client, "SELECT h3GetResolution(599686042433355775) AS r, "
            "h3GetBaseCell(599686042433355775) AS b, "
            "h3IsPentagon(599686042433355775) AS p, "
            "h3IsPentagon(590112357393367039) AS p3, "
            "h3IsPentagon(576636674163867647) AS p0, "
            "h3IsPentagon(585610338313961471) AS hexa")
    assert r["r"] == 5 and r["b"] == 20
    assert not r["p"] and r["p3"] and r["p0"] and not r["hexa"]


def test_h3_pentagon_set_is_the_published_twelve(client):
    # the 12 res-0 pentagon indexes from the H3 docs decode to base
    # cells {4,14,24,38,49,58,63,72,83,97,107,117} (antipodal pairs
    # b + (121-b)); a sweep over all 122 res-0 base cells must flag
    # exactly those 12 — the first implementation missed cell 63
    rows = client.query_ch(
        "SELECT b FROM (SELECT number AS b, "
        "bitOr(bitOr(bitShiftLeft(toInt64(1), 59), "
        "bitShiftLeft(toInt64(number), 45)), 35184372088831) AS h "
        "FROM (SELECT number FROM system.numbers LIMIT 122)) "
        "WHERE h3IsPentagon(h) ORDER BY b"
    ).collect()
    assert [int(r["b"]) for r in rows] == [
        4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117]


def test_h3_geo_math_still_refused(client):
    with pytest.raises(UntranslatableFunctionError, match="h3 library"):
        client.query_ch("SELECT h3ToGeo(599686042433355775)")
    with pytest.raises(UntranslatableFunctionError, match="h3 library"):
        client.query_ch("SELECT geoToH3(37.79, 55.71, 15)")


def test_delta_sum_timestamp(client):
    r = one(client, "SELECT deltaSumTimestamp(v, t) AS s FROM "
            "(SELECT 3.0 AS t, 5.0 AS v UNION ALL SELECT 1.0, 4.0 "
            "UNION ALL SELECT 2.0, 2.0 UNION ALL SELECT 5.0, 9.0 "
            "UNION ALL SELECT 4.0, 5.0)")
    # ordered by t: 4, 2, 5, 5, 9 -> +0 (drop -2) +3 +0 +4 = 7
    assert r["s"] == 7.0


def test_max_intersections_and_position(client):
    r = one(client, "SELECT maxIntersections(lo, hi) AS m, "
            "maxIntersectionsPosition(lo, hi) AS p FROM "
            "(SELECT 1.0 AS lo, 5.0 AS hi UNION ALL SELECT 2.0, 8.0 "
            "UNION ALL SELECT 5.0, 9.0 UNION ALL SELECT 7.0, 10.0)")
    assert int(r["m"]) == 3 and float(r["p"]) == 7.0


def test_max_intersections_touching_do_not_overlap(client):
    r = one(client, "SELECT maxIntersections(lo, hi) AS m FROM "
            "(SELECT 1.0 AS lo, 5.0 AS hi UNION ALL SELECT 5.0, 9.0)")
    assert int(r["m"]) == 1


def test_sum_map_filtered(client):
    r = one(client, "SELECT sumMapFiltered(['a','b'])(k, v) AS m FROM "
            "(SELECT ['a','b','c'] AS k, [1,2,3] AS v "
            "UNION ALL SELECT ['b','d'], [10, 20])")
    assert list(r["m"][0]) == ["a", "b"]
    assert list(r["m"][1]) == [1, 12]


def test_anova_operator(client, spark):
    # groups A=[1,2,3] B=[2,3,4] C=[5,6,7]: grand mean 33/9,
    # SSB = 147 - 33^2/9 = 26, SSW = 153 - 147 = 6, d = (2, 6),
    # F = (26/2)/(6/6) = 13, p = I_{6/(6+26)}(3, 1) = (6/32)^3
    from clickhouse_arrow_spark.operators.stats import anova

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0),
         ("b", 2.0), ("b", 3.0), ("b", 4.0),
         ("c", 5.0), ("c", 6.0), ("c", 7.0)],
        "g STRING, v DOUBLE",
    )
    [r] = anova(df, "v", "g").collect()
    assert abs(r["f_stat"] - 13.0) < 1e-9
    assert abs(r["p_value"] - (6.0 / 32.0) ** 3) < 1e-6
    assert r["df_between"] == 2 and r["df_within"] == 6
    # the dialect refusal names the operator
    import pytest as _pytest

    with _pytest.raises(UntranslatableFunctionError, match="stats.anova"):
        client.query_ch("SELECT analysisOfVariance(v, g) FROM t")


def test_to_type_name_container_spellings(client):
    # wave-34 probe: container type strings rewrite into CH spellings
    r = one(client, "SELECT toTypeName([1, 2]) AS a, "
            "toTypeName(map('k', [1.5])) AS b, "
            "toTypeName((1, 'x')) AS c, "
            "toTypeName(CAST(1.5 AS Decimal(10, 2))) AS d")
    assert r["a"] == "Array(Int32)"
    assert r["b"] == "Map(String, Array(Decimal(2, 1)))"
    assert r["c"] == "Tuple(col1 Int32, col2 String)"
    assert r["d"] == "Decimal(10, 2)"


def _lttb_ref(data, n):
    """Independent LTTB reference (Steinarsson 2013 pseudocode)."""
    L = len(data)
    if n >= L or n == 0:
        return data
    if n == 1:
        return [data[0]]
    if n == 2:
        return [data[0], data[-1]]
    every = (L - 2) / (n - 2)
    a, out = 0, [data[0]]
    for i in range(n - 2):
        avs = int((i + 1) * every) + 1
        ave = min(int((i + 2) * every) + 1, L)
        ax = sum(p[0] for p in data[avs:ave]) / (ave - avs)
        ay = sum(p[1] for p in data[avs:ave]) / (ave - avs)
        best, barea = None, -1.0
        for j in range(int(i * every) + 1, int((i + 1) * every) + 1):
            area = abs((data[a][0] - ax) * (data[j][1] - data[a][1])
                       - (data[a][0] - data[j][0]) * (ay - data[a][1]))
            if area > barea:
                best, barea = j, area
        out.append(data[best])
        a = best
    out.append(data[-1])
    return out


def test_lttb_matches_reference(client, spark):
    import random

    random.seed(7)
    pts = sorted((random.uniform(0, 100), random.uniform(0, 50))
                 for _ in range(40))
    spark.createDataFrame(pts, "x DOUBLE, y DOUBLE") \
        .createOrReplaceTempView("lttb_pts")
    for n in (4, 7, 10, 40, 50, 2, 1, 0):
        [r] = client.query_ch(
            f"SELECT largestTriangleThreeBuckets({n})(x, y) AS r "
            "FROM lttb_pts"
        ).collect()
        got = [(p["x"], p["y"]) for p in r["r"]]
        assert got == _lttb_ref(pts, n), n


def test_combinator_closure_on_formatter_backed_aggregates(client):
    # chains onto composite-fold aggregates refuse with the subquery
    # recipe (never UNRESOLVED_ROUTINE — the r9 closure fix); chains
    # onto PARAMETRIC folds compose correctly via the If machinery
    for sql in (
        "SELECT rankCorrIf(a, b, true) FROM t",
        "SELECT deltaSumTimestampIf(v, t, true) FROM t",
        "SELECT maxIntersectionsIf(a, b, true) FROM t",
        "SELECT entropyIf(a, true) FROM t",
        "SELECT rankCorrDistinct(a, b) FROM t",
    ):
        with pytest.raises(UntranslatableFunctionError, match="subquery"):
            client.query_ch(sql)
    r = one(client, "SELECT lttbIf(2)(t, t, f) AS l, "
            "sumResampleIf(0, 4, 2)(t, t, f) AS s FROM "
            "(SELECT 1.0 AS t, true AS f UNION ALL SELECT 2.0, false "
            "UNION ALL SELECT 3.0, true)")
    assert [(p["x"], p["y"]) for p in r["l"]] == [(1.0, 1.0), (3.0, 3.0)]
    assert list(r["s"]) == [1.0, 3.0]


def test_null_arguments_skipped_in_fold_aggregates(client):
    # CH aggregates skip rows with NULL arguments
    r = one(client, "SELECT deltaSumTimestamp(v, t) AS d, "
            "rankCorr(t, v) AS rc, "
            "largestTriangleThreeBuckets(0)(t, v) AS l FROM "
            "(SELECT 1.0 AS t, 1.0 AS v UNION ALL SELECT NULL, 2.0 "
            "UNION ALL SELECT 3.0, NULL UNION ALL SELECT 4.0, 4.0)")
    assert r["d"] == 3.0
    assert abs(r["rc"] - 1.0) < 1e-12
    assert [(p["x"], p["y"]) for p in r["l"]] == [(1.0, 1.0), (4.0, 4.0)]
