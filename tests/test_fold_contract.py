"""Round-10 (VERDICT r9 task #5): the point-statistic fold contract.
Collect-fold aggregates size-guard their per-group array and raise
with the operator recipe past max_fold_group_rows (default 10M) — the
enforced form of SCALE.md's fold fence (the ivf max_query_rows
precedent). Under the limit nothing changes."""

from __future__ import annotations

import pytest


def _one(client, sql):
    return client.query_ch(sql).collect()[0]


def test_under_limit_unchanged(client, tables):
    r = _one(
        client,
        "SELECT round(rankCorr(o_totalprice, o_orderkey), 4) AS rho, "
        "round(entropy(o_orderstatus), 4) AS h FROM orders "
        "WHERE o_orderkey < 2000",
    )
    assert r["rho"] is not None and r["h"] is not None


@pytest.mark.parametrize(
    "expr,op",
    [
        ("rankCorr(o_totalprice, o_orderkey)", "rankCorr"),
        ("entropy(o_orderstatus)", "entropy"),
        ("deltaSumTimestamp(o_totalprice, o_orderkey)",
         "deltaSumTimestamp"),
        ("intervalLengthSum(o_orderkey, o_orderkey + 10)",
         "intervalLengthSum"),
        ("maxIntersections(o_orderkey, o_orderkey + 10)",
         "maxIntersections"),
        ("largestTriangleThreeBuckets(4)(o_orderkey, o_totalprice)",
         "largestTriangleThreeBuckets"),
        ("sumMap(map(o_orderstatus, o_totalprice))", "sumMap"),
        ("exponentialMovingAverage(10)(o_totalprice, o_orderkey)",
         "exponentialMovingAverage"),
    ],
)
def test_over_limit_raises_with_recipe(client, tables, expr, op):
    # statement-scoped SETTINGS drops the limit below the group size;
    # the raise names the operator and the recipe
    with pytest.raises(Exception, match="max_fold_group_rows"):
        client.query_ch(
            f"SELECT {expr} AS x FROM orders WHERE o_orderkey < 2000 "
            "SETTINGS max_fold_group_rows = 10"
        ).collect()


def test_limit_is_statement_scoped(client, tables):
    with pytest.raises(Exception, match="max_fold_group_rows"):
        client.query_ch(
            "SELECT entropy(o_orderstatus) AS h FROM orders "
            "SETTINGS max_fold_group_rows = 1"
        ).collect()
    # next statement: back to the generous default
    r = _one(client, "SELECT round(entropy(o_orderstatus), 4) AS h "
                     "FROM orders")
    assert r["h"] is not None


def test_limit_session_scoped_via_set_shim(client, tables, spark):
    client.query_ch("SET max_fold_group_rows = 5").collect()
    try:
        with pytest.raises(Exception, match="max_fold_group_rows"):
            client.query_ch(
                "SELECT entropy(o_orderstatus) AS h FROM orders"
            ).collect()
        # a statement SETTINGS tail overrides the session value
        r = _one(
            client,
            "SELECT round(entropy(o_orderstatus), 4) AS h FROM orders "
            "SETTINGS max_fold_group_rows = 10000000",
        )
        assert r["h"] is not None
    finally:
        spark.conf.unset(
            "spark.clickhouse_arrow_spark.setting.max_fold_group_rows"
        )


def test_resample_guarded(client, tables):
    with pytest.raises(Exception, match="max_fold_group_rows"):
        client.query_ch(
            "SELECT sumResample(0, 10, 2)(o_totalprice, "
            "o_orderkey % 10) AS r FROM orders WHERE o_orderkey < 500 "
            "SETTINGS max_fold_group_rows = 3"
        ).collect()