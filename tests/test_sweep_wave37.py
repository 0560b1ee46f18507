"""Round-11 probe-sweep wave 37 (VERDICT r10 task #3): the judge-named
unswept remainder — ngramSearch family (previously leaked
UNRESOLVED_ROUTINE), ngramDistance case/UTF8 variants, mapPartialSort /
mapPartialReverseSort / arrayPartialReverseSort (full sort as the only
deterministic instance of CH's partial-sort contract, the
arrayPartialSort precedent), soundex pinned on the classic values, the
full ngram/wordShingle SimHash/MinHash[Arg] variant family routed to
guided refusals, and the round-11 toStartOf{Month,Quarter} Date
narrowing (wave-36's single delta, closed). Expected values are
hand-derived from the CH docs formulae (pinned-literal class)."""

from __future__ import annotations

import pytest

from clickhouse_arrow_spark.dialect import (
    UntranslatableFunctionError,
    translate_ch_sql,
)


def one(client, sql):
    return client.query_ch(sql).collect()[0]


# ---- ngramSearch -----------------------------------------------------

@pytest.mark.parametrize(
    "expr,want",
    [
        # needle 'World Hello' has 8 4-grams, 4 of them (Worl, orld,
        # Hell, ello) appear in 'Hello World' -> 0.5
        ("ngramSearch('Hello World', 'World Hello')", 0.5),
        ("ngramSearch('Hello World', 'World')", 1.0),
        ("ngramSearch('ClickHouse', 'House')", 1.0),
        ("ngramSearch('Hello World', 'xyzzy9')", 0.0),
        # strings shorter than 4 fall back to a single whole-string gram
        ("ngramSearch('abc', 'abc')", 1.0),
        ("ngramSearch('abc', 'abd')", 0.0),
        # empty needle: zero grams, nothing missing
        ("ngramSearch('x', '')", 1.0),
        ("ngramSearchCaseInsensitive('Hello World', 'HELLO')", 1.0),
        # Spark strings are codepoint-based == CH's UTF8 variants
        ("ngramSearchUTF8('héllo wörld', 'wörld')", 1.0),
        ("ngramSearchCaseInsensitiveUTF8('HÉLLO', 'héllo')", 1.0),
        ("ngramDistanceCaseInsensitive('ABC', 'abc')", 0.0),
        ("ngramDistanceUTF8('héllo', 'héllo')", 0.0),
    ],
)
def test_ngram_search_values(client, expr, want):
    assert one(client, f"SELECT {expr} AS x")["x"] == pytest.approx(want)


def test_ngram_search_null_propagates(client):
    row = one(
        client,
        "SELECT ngramSearch(NULL, 'abc') AS a, "
        "ngramSearch('abc', NULL) AS b",
    )
    assert row["a"] is None and row["b"] is None


def test_ngram_distance_asymmetric_vs_search(client):
    # ngramDistance('ClickHouse','House') = symmetric diff 5 / total 9
    row = one(
        client,
        "SELECT round(ngramDistance('ClickHouse', 'House'), 4) AS d, "
        "ngramSearch('ClickHouse', 'House') AS s",
    )
    assert row["d"] == pytest.approx(0.5556)
    assert row["s"] == 1.0


# ---- partial sorts ---------------------------------------------------

def test_map_partial_sort(client):
    row = one(
        client,
        "SELECT arrayStringConcat(mapKeys(mapPartialSort(2, "
        "map('c', 3, 'a', 1, 'b', 2))), ',') AS asc_keys, "
        "arrayStringConcat(mapKeys(mapPartialReverseSort(2, "
        "map('c', 3, 'a', 1, 'b', 2))), ',') AS desc_keys",
    )
    assert row["asc_keys"] == "a,b,c"
    assert row["desc_keys"] == "c,b,a"


def test_map_partial_sort_lambda_form_refuses(client):
    with pytest.raises(UntranslatableFunctionError, match="comparator"):
        translate_ch_sql(
            "SELECT mapPartialSort((k, v) -> v, 2, m) FROM t")


def test_array_partial_reverse_sort(client):
    row = one(
        client,
        "SELECT arrayStringConcat(arrayMap(x -> toString(x), "
        "arrayPartialReverseSort(2, [1, 3, 2])), ',') AS x",
    )
    assert row["x"] == "3,2,1"


# ---- soundex ---------------------------------------------------------

@pytest.mark.parametrize(
    "s,want",
    [
        ("aksel", "A240"),      # CH docs example
        ("Robert", "R163"),
        ("Rupert", "R163"),
        ("Miller", "M460"),
        ("Tymczak", "T522"),    # adjacent same-code letters collapse
        ("Honeyman", "H555"),   # vowel-separated letters code twice
        ("Pfister", "P236"),
    ],
)
def test_soundex_classic_values(client, s, want):
    assert one(client, f"SELECT soundex('{s}') AS x")["x"] == want


# ---- text-fingerprint family: guided refusals, never UNRESOLVED ------

def _fingerprint_variants():
    out = []
    for base in ("ngramSimHash", "wordShingleSimHash", "ngramMinHash",
                 "wordShingleMinHash"):
        for arg in ("", "Arg") if "MinHash" in base else ("",):
            for suf in ("", "CaseInsensitive", "UTF8",
                        "CaseInsensitiveUTF8"):
                out.append(base + arg + suf)
    return out


@pytest.mark.parametrize("fn", _fingerprint_variants())
def test_text_fingerprint_variants_guided(fn):
    with pytest.raises(
        UntranslatableFunctionError, match="operators.dedup"
    ):
        translate_ch_sql(f"SELECT {fn}(s) FROM t")


# ---- toStartOf* Date narrowing (wave-36 delta closed) ----------------

def test_to_start_of_month_is_date(client):
    row = one(
        client,
        "SELECT toString(toStartOfMonth(toDate('2024-03-15'))) AS m, "
        "toString(toStartOfQuarter(toDate('2024-08-16'))) AS q, "
        "toTypeName(toStartOfMonth(toDate('2024-03-15'))) AS tm, "
        "toTypeName(toStartOfQuarter(now())) AS tq, "
        "toTypeName(toStartOfDay(now())) AS td",
    )
    assert row["m"] == "2024-03-01"
    assert row["q"] == "2024-07-01"
    assert row["tm"] == "Date"
    assert row["tq"] == "Date"
    # sub-day family stays DateTime on both engines
    assert row["td"] == "DateTime"


def test_to_start_of_month_truncates_datetime_to_date(client):
    row = one(
        client,
        "SELECT toString(toStartOfMonth("
        "toDateTime('2024-03-15 13:45:00'))) AS m",
    )
    assert row["m"] == "2024-03-01"
