"""Round-10 probe-sweep wave 35 (VERDICT r9 task #3): the previously
unswept remainder — windowFunnel re-anchoring + CH-exact strict modes
(pinned in test_operators against a line-by-line CH-algorithm replica),
sequenceMatchEvents, uniqCombined precision parameters, formatDateTime
modern %M + the expression-spliced %G/%V/%g/%u/%w/%C corners,
toStartOfISOYear, and Date32 saturation edges. Expected values are
hand-derived from the CH docs / source semantics (pinned-literal
class)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_arrow_spark.dialect import (
    UntranslatableFunctionError,
    translate_ch_sql,
)


def one(client, sql):
    return client.query_ch(sql).collect()[0]


# ---- sequenceMatchEvents ---------------------------------------------

def test_sequence_match_events_docs_example(spark):
    # CH docs shape: sequenceMatchEvents('(?1).*(?2).*(?3)')(time,
    # number=1, number=2, number=4) over t=[1..5], number=[1,3,2,1,4]:
    # cond1 matches at t=1, cond2 at t=3, cond3 at t=5 -> [1, 3, 5]
    from clickhouse_arrow_spark.operators.funnel import (
        sequence_match_events,
    )

    rows = [(1, 1.0, 1), (1, 2.0, 3), (1, 3.0, 2), (1, 4.0, 1), (1, 5.0, 4)]
    df = spark.createDataFrame(rows, "u long, t double, number int")
    out = sequence_match_events(
        df, "u", "t", "(?1).*(?2).*(?3)",
        [F.col("number") == 1, F.col("number") == 2, F.col("number") == 4],
    ).collect()
    assert list(out[0]["event_times"]) == [1.0, 3.0, 5.0]


def test_sequence_match_events_no_match_empty(spark):
    from clickhouse_arrow_spark.operators.funnel import (
        sequence_match_events,
    )

    rows = [(1, 1.0, "b"), (1, 2.0, "a")]
    df = spark.createDataFrame(rows, "u long, t double, e string")
    out = sequence_match_events(
        df, "u", "t", "(?1)(?2)",
        [F.col("e") == "a", F.col("e") == "b"],
    ).collect()
    assert list(out[0]["event_times"]) == []


def test_sequence_match_events_time_constraint(spark):
    # (?1)(?t<=10)(?2): the chain must use the cond-2 event within 10s
    # — the first a at t=0 pairs with b at t=5, not the late b
    from clickhouse_arrow_spark.operators.funnel import (
        sequence_match_events,
    )

    rows = [(1, 0.0, "a"), (1, 50.0, "b"), (1, 55.0, "a"), (1, 60.0, "b")]
    df = spark.createDataFrame(rows, "u long, t double, e string")
    out = sequence_match_events(
        df, "u", "t", "(?1)(?t<=10)(?2)",
        [F.col("e") == "a", F.col("e") == "b"],
    ).collect()
    assert list(out[0]["event_times"]) == [55.0, 60.0]


def test_sequence_match_events_agrees_with_match(spark):
    # the chain exists exactly when sequenceMatch says 1 (shared matcher)
    from clickhouse_arrow_spark.operators.funnel import (
        sequence_match,
        sequence_match_events,
    )

    rows = [
        (1, 1.0, "a"), (1, 2.0, "b"),
        (2, 1.0, "b"), (2, 2.0, "a"),
        (3, 1.0, "a"), (3, 2.0, "x"), (3, 3.0, "b"),
    ]
    df = spark.createDataFrame(rows, "u long, t double, e string")
    conds = [F.col("e") == "a", F.col("e") == "b"]
    m = {r["u"]: r["matched"]
         for r in sequence_match(df, "u", "t", "(?1).*(?2)", conds,
                                 engine="pandas").collect()}
    ev = {r["u"]: list(r["event_times"])
          for r in sequence_match_events(df, "u", "t", "(?1).*(?2)",
                                         conds).collect()}
    for u in m:
        assert (len(ev[u]) == 2) == (m[u] == 1), u
    assert ev[1] == [1.0, 2.0] and ev[3] == [1.0, 3.0]


def test_sequence_match_events_sql_refusal_names_operator(client):
    with pytest.raises(UntranslatableFunctionError,
                       match="sequence_match_events"):
        client.query_ch(
            "SELECT sequenceMatchEvents('(?1)(?2)')(ts, value > 0, "
            "value < 0) FROM events GROUP BY user_id"
        )


# ---- uniqCombined precision ------------------------------------------

def test_uniq_combined_precision_param(client, tables):
    r = one(client,
            "SELECT uniqCombined(17)(o_custkey) AS u17, "
            "uniqCombined64(20)(o_custkey) AS u20, "
            "uniqCombined(o_custkey) AS u_plain, "
            "count(DISTINCT o_custkey) AS exact FROM orders")
    for k in ("u17", "u20", "u_plain"):
        assert abs(r[k] - r["exact"]) <= 0.1 * r["exact"], (k, r)


def test_uniq_combined_precision_translation():
    sql = translate_ch_sql("SELECT uniqCombined(12)(x) FROM t")
    assert "approx_count_distinct(x, 0.01625000" in sql
    sql = translate_ch_sql("SELECT uniqCombined(17)(x) FROM t")
    assert "approx_count_distinct(x, 0.00287262" in sql
    # p >= 19: Spark's HLL++ buffer at that rsd is a multi-MB
    # per-group memory hazard — exact count is the value superset
    sql = translate_ch_sql("SELECT uniqCombined64(20)(x) FROM t")
    assert "count(DISTINCT x)" in sql


def test_uniq_combined_precision_out_of_range():
    for bad in ("11", "21"):
        with pytest.raises(UntranslatableFunctionError, match="12..20"):
            translate_ch_sql(f"SELECT uniqCombined({bad})(x) FROM t")


# ---- formatDateTime corners ------------------------------------------

def test_format_datetime_iso_and_numeric_weekday(spark):
    # 2024-12-30 is the Monday of ISO week 1 of ISO year 2025
    got = spark.sql(translate_ch_sql(
        "SELECT formatDateTime(TIMESTAMP '2024-12-30 07:00:00', "
        "'%G|%g|%V|%u|%w|%C') AS x"
    )).collect()[0]["x"]
    assert got == "2025|25|01|1|1|20"
    # a Sunday: %u (ISO, Mon=1) = 7, %w (Sun=0) = 0
    got = spark.sql(translate_ch_sql(
        "SELECT formatDateTime(TIMESTAMP '2024-12-29 07:00:00', "
        "'%u|%w|%G|%V') AS x"
    )).collect()[0]["x"]
    assert got == "7|0|2024|52"


def test_format_datetime_month_name_default_and_legacy(client):
    r = one(client,
            "SELECT formatDateTime(TIMESTAMP '2024-03-05 07:08:09', "
            "'%M') AS modern")
    assert r["modern"] == "March"
    r = one(client,
            "SELECT formatDateTime(TIMESTAMP '2024-03-05 07:08:09', "
            "'%M') AS legacy SETTINGS "
            "formatdatetime_parsedatetime_m_is_month_name = 0")
    assert r["legacy"] == "08"


def test_parse_datetime_month_name(spark):
    got = spark.sql(translate_ch_sql(
        "SELECT parseDateTime('2024 March 05', '%Y %M %d') AS x"
    )).collect()[0]["x"]
    assert str(got) == "2024-03-05 00:00:00"


# ---- toStartOfISOYear / Date32 edges ----------------------------------

def test_to_start_of_iso_year(spark):
    got = spark.sql(translate_ch_sql(
        "SELECT toStartOfISOYear(toDate('2024-12-30')) AS a, "
        "toStartOfISOYear(toDate('2024-06-01')) AS b, "
        "toStartOfISOYear(toDate('2021-01-01')) AS c"
    )).collect()[0]
    # ISO 2025 starts Mon 2024-12-30; ISO 2024 starts Mon 2024-01-01;
    # 2021-01-01 is ISO year 2020, which started Mon 2019-12-30
    assert str(got["a"]) == "2024-12-30"
    assert str(got["b"]) == "2024-01-01"
    assert str(got["c"]) == "2019-12-30"


def test_date32_saturation(spark):
    got = spark.sql(translate_ch_sql(
        "SELECT toDate32('2300-06-01') AS hi, "
        "toDate32('1899-06-01') AS lo, "
        "toDate32('2024-02-29') AS mid, "
        "toDate32OrNull('2300-06-01') AS hi_n, "
        "toDate32OrNull('garbage') AS bad"
    )).collect()[0]
    assert str(got["hi"]) == "2299-12-31"
    assert str(got["lo"]) == "1900-01-01"
    assert str(got["mid"]) == "2024-02-29"
    assert str(got["hi_n"]) == "2299-12-31"
    assert got["bad"] is None


# ---- windowFunnel as a REAL SQL aggregate -----------------------------

def test_window_funnel_sql_matches_ch_reference(client, spark):
    """The SQL-form fold equals the line-by-line CH replica (the same
    battery the operator is pinned against)."""
    from tests.test_operators import _ch_window_funnel_reference

    conds = ["A", "B", "C"]
    alphabet = ["A", "B", "C", "X"]
    cases = []
    for seed in range(16):
        seq, state = [], seed * 2654435761 % 2147483647
        for _ in range(7):
            state = (state * 1103515245 + 12345) % 2147483647
            seq.append((float((state >> 8) % 40), alphabet[state % 4]))
        cases.append(seq)
    cases += [
        [(0.0, "A"), (200.0, "A"), (205.0, "B"), (206.0, "C")],
        [(1.0, "A"), (2.0, "B"), (3.0, "B"), (4.0, "C")],
        [(1.0, "A"), (1.0, "B"), (1.0, "C")],
    ]
    rows = []
    for uid, seq in enumerate(cases):
        rows += [(uid, t, e) for t, e in seq]
    spark.createDataFrame(rows, "u long, t double, e string") \
        .createOrReplaceTempView("wf_sql_battery")
    for modes in ((), ("strict_order",), ("strict_dedup",),
                  ("strict_increase",)):
        mode_sql = "".join(f", '{m}'" for m in modes)
        got = {
            r["u"]: r["lvl"]
            for r in client.query_ch(
                f"SELECT u, windowFunnel(100{mode_sql})(t, e = 'A', "
                "e = 'B', e = 'C') AS lvl FROM wf_sql_battery "
                "GROUP BY u"
            ).collect()
        }
        for uid, seq in enumerate(cases):
            ev = []
            for t, e in seq:
                matched = [i + 1 for i, c in enumerate(conds) if e == c]
                ev += [(t, s) for s in matched]
                if not matched and "strict_order" in modes:
                    ev.append((t, 0))
            want = _ch_window_funnel_reference(
                ev, 3, 100,
                strict_order="strict_order" in modes,
                strict_dedup="strict_dedup" in modes,
                strict_increase="strict_increase" in modes,
            )
            assert got[uid] == want, (uid, modes, seq)


def test_window_funnel_sql_refusals(client):
    with pytest.raises(UntranslatableFunctionError, match="mode"):
        client.query_ch(
            "SELECT windowFunnel(10, 'bogus')(ts, value > 0) "
            "FROM events GROUP BY user_id"
        )
    with pytest.raises(UntranslatableFunctionError,
                       match="integer-literal"):
        client.query_ch(
            "SELECT windowFunnel(user_id)(ts, value > 0) "
            "FROM events GROUP BY user_id"
        )
    # the bare (non-parameterized) spelling still names both recipes
    with pytest.raises(UntranslatableFunctionError, match="IMPLEMENTED"):
        client.query_ch(
            "SELECT windowFunnel(ts, value > 0) FROM events "
            "GROUP BY user_id"
        )


def test_window_funnel_sql_fold_contract(client, tables):
    with pytest.raises(Exception, match="max_fold_group_rows"):
        client.query_ch(
            "SELECT windowFunnel(86400)(ts, value > 0, value > 1) "
            "AS lvl FROM events GROUP BY user_id "
            "SETTINGS max_fold_group_rows = 2"
        ).collect()


def test_window_funnel_if_strict_order(client, spark):
    # the -If combinator EXCLUDES rows entirely: an If-filtered
    # untracked row must not become a strict_order scan terminator,
    # while an included one must
    rows = [
        (1, 1.0, "A", 1), (1, 2.0, "B", 1), (1, 3.0, "X", 0),
        (1, 4.0, "C", 1),
        (2, 1.0, "A", 1), (2, 2.0, "B", 1), (2, 3.0, "X", 1),
        (2, 4.0, "C", 1),
    ]
    spark.createDataFrame(
        rows, "u long, t double, e string, flag int"
    ).createOrReplaceTempView("wf_if_view")
    out = {
        r["u"]: r["lvl"]
        for r in client.query_ch(
            "SELECT u, windowFunnelIf(100, 'strict_order')(t, e = 'A', "
            "e = 'B', e = 'C', flag = 1) AS lvl FROM wf_if_view "
            "GROUP BY u ORDER BY u"
        ).collect()
    }
    assert out == {1: 3, 2: 2}


# ---- sequenceMatch/sequenceCount as SQL aggregates ---------------------

def test_sequence_match_sql_form(client, spark):
    rows = [
        (1, 1.0, "click"), (1, 2.0, "view"), (1, 3.0, "purchase"),
        (2, 1.0, "purchase"), (2, 2.0, "click"),
        (3, 1.0, "click"), (3, 2.0, "purchase"), (3, 3.0, "click"),
        (3, 4.0, "purchase"),
    ]
    spark.createDataFrame(rows, "u long, t double, e string") \
        .createOrReplaceTempView("seq_sql_view")
    out = {
        r["u"]: (r["m"], r["strict_m"], r["n"])
        for r in client.query_ch(
            "SELECT u, sequenceMatch('(?1).*(?2)')(t, e = 'click', "
            "e = 'purchase') AS m, "
            "sequenceMatch('(?1)(?2)')(t, e = 'click', "
            "e = 'purchase') AS strict_m, "
            "sequenceCount('(?1)(?2)')(t, e = 'click', "
            "e = 'purchase') AS n "
            "FROM seq_sql_view GROUP BY u ORDER BY u"
        ).collect()
    }
    # events matching NO condition are EXCLUDED before the string is
    # built (CH docs' 1,3,2 example) — user 1's interleaved 'view'
    # does not break (?1)(?2) adjacency
    assert out == {1: (1, 1, 1), 2: (0, 0, 0), 3: (1, 1, 2)}


def test_sequence_match_sql_agrees_with_operator(client, spark, tables):
    from clickhouse_arrow_spark.operators.funnel import sequence_match

    got_sql = {
        r["user_id"]: r["m"]
        for r in client.query_ch(
            "SELECT user_id, sequenceMatch('(?1).*(?2)')(ts, "
            "event_type = 'click', event_type = 'purchase') AS m "
            "FROM events GROUP BY user_id"
        ).collect()
    }
    got_op = {
        r["user_id"]: r["matched"]
        for r in sequence_match(
            spark.table("events"), "user_id", "ts", "(?1).*(?2)",
            [F.col("event_type") == "click",
             F.col("event_type") == "purchase"],
        ).collect()
    }
    # the operator drops users with NO matching events; the SQL
    # aggregate keeps every group (empty string -> no match)
    for u, m in got_op.items():
        assert got_sql[u] == m, u


def test_sequence_match_sql_time_constraint_refused(client):
    with pytest.raises(UntranslatableFunctionError,
                       match="backtracking"):
        client.query_ch(
            "SELECT sequenceMatch('(?1)(?t<=600)(?2)')(ts, value > 0, "
            "value < 0) FROM events GROUP BY user_id"
        )


def test_sequence_match_sql_fold_contract(client, tables):
    with pytest.raises(Exception, match="max_fold_group_rows"):
        client.query_ch(
            "SELECT sequenceCount('(?1)(?2)')(ts, value > 0, "
            "value <= 0) AS n FROM events GROUP BY user_id "
            "SETTINGS max_fold_group_rows = 2"
        ).collect()


# ---- sparkbar as a SQL aggregate ---------------------------------------

def test_sparkbar_sql_matches_operator(client, spark):
    from clickhouse_arrow_spark.operators.timeseries import sparkbar

    rows = [(1, float(x), float(y)) for x, y in
            [(1, 10), (2, 40), (3, 12), (4, 30), (5, 25), (6, 5),
             (8, 100)]]
    rows += [(2, 1.0, 5.0), (2, 9.0, 3.0)]
    df = spark.createDataFrame(rows, "k long, x double, y double")
    df.createOrReplaceTempView("sparkbar_sql_view")
    op = {r["k"]: r["sparkbar"]
          for r in sparkbar(df, ["k"], "x", "y", 10).collect()}
    got = {r["k"]: r["sb"] for r in client.query_ch(
        "SELECT k, sparkbar(10)(x, y) AS sb FROM sparkbar_sql_view "
        "GROUP BY k ORDER BY k").collect()}
    assert got == op
    # hand pin (the util_sparkbar oracle's glyph arithmetic): slot
    # sums 10,40,12,30,25,5,_,100 over 10 slots scale to max 100
    assert got[1] == "▁▄▁ ▃▃ ▁ █"
    # bounded [min_x, max_x] form
    opb = {r["k"]: r["sparkbar"]
           for r in sparkbar(df, ["k"], "x", "y", 5, 0, 10).collect()}
    gotb = {r["k"]: r["sb"] for r in client.query_ch(
        "SELECT k, sparkbar(5, 0, 10)(x, y) AS sb "
        "FROM sparkbar_sql_view GROUP BY k ORDER BY k").collect()}
    assert gotb == opb


def test_sparkbar_sql_refusals(client):
    with pytest.raises(UntranslatableFunctionError, match="1..256"):
        client.query_ch(
            "SELECT sparkbar(0)(value, value) FROM events "
            "GROUP BY user_id"
        )
    with pytest.raises(UntranslatableFunctionError,
                       match="integer literal"):
        client.query_ch(
            "SELECT sparkbar(user_id)(value, value) FROM events "
            "GROUP BY user_id"
        )


def test_sparkbar_sql_fold_contract(client, tables):
    with pytest.raises(Exception, match="max_fold_group_rows"):
        client.query_ch(
            "SELECT sparkbar(8)(toUnixTimestamp(ts), value) AS sb "
            "FROM events GROUP BY user_id "
            "SETTINGS max_fold_group_rows = 2"
        ).collect()


def test_parse_datetime_or_zero_forms(spark):
    r = spark.sql(translate_ch_sql(
        "SELECT parseDateTimeOrZero('garbage', '%Y-%m-%d') AS a, "
        "parseDateTimeOrZero('2024-03-05', '%Y-%m-%d') AS b, "
        "parseDateTimeInJodaSyntaxOrZero('x', 'yyyy-MM-dd') AS c, "
        "parseDateTimeInJodaSyntaxOrZero('2024-03-05', 'yyyy-MM-dd') AS d"
    )).collect()[0]
    assert str(r["a"]) == "1970-01-01 00:00:00"
    assert str(r["b"]) == "2024-03-05 00:00:00"
    assert str(r["c"]) == "1970-01-01 00:00:00"
    assert str(r["d"]) == "2024-03-05 00:00:00"
