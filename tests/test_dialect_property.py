"""Property-based tests (hypothesis) for the round-6 fold formatters —
arrayFill / arrayReverseFill / arraySplit / arrayShingles /
hasSubsequence / ngramDistance bounds — checked against straightforward
Python reference implementations over randomized inputs. The dialect
emits pure-SQL folds; the property net catches off-by-one and
empty-input corruption a hand-picked example set misses (the
sequence(1, 0) count-down trap was exactly that class).

The whole battery evaluates ONE Spark job per example batch: inputs
are embedded as literals in a single multi-column SELECT.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_arrow_spark.client import Client

ARR = st.lists(st.integers(min_value=-5, max_value=5), max_size=8)
TXT = st.text(alphabet="abcd ", max_size=12)


@pytest.fixture(scope="module")
def ch(spark):
    return Client(spark)


def _lit_arr(xs: list[int]) -> str:
    return "CAST([" + ", ".join(str(x) for x in xs) + "] AS Array(Int64))"


def _lit_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(arr=ARR)
def test_array_fill_matches_python(ch, arr):
    got = ch.query_ch(
        f"SELECT arrayFill(x -> x != 0, {_lit_arr(arr)}) AS f, "
        f"arrayReverseFill(x -> x != 0, {_lit_arr(arr)}) AS r"
    ).collect()[0]

    def fill(xs):
        out = []
        for x in xs:
            out.append(x if (x != 0 or not out) else out[-1])
        return out

    assert got["f"] == fill(arr)
    assert got["r"] == list(reversed(fill(list(reversed(arr)))))


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(arr=st.lists(st.integers(0, 9), min_size=0, max_size=8),
       mask=st.lists(st.integers(0, 1), min_size=0, max_size=8))
def test_array_split_matches_python(ch, arr, mask):
    if len(arr) != len(mask):
        mask = (mask + [0] * len(arr))[: len(arr)]
    got = ch.query_ch(
        f"SELECT arraySplit((x, y) -> y, {_lit_arr(arr)}, "
        f"{_lit_arr(mask)}) AS s"
    ).collect()[0]["s"]

    ref: list[list[int]] = []
    for i, x in enumerate(arr):
        if i == 0 or mask[i]:
            ref.append([x])
        else:
            ref[-1].append(x)
    assert got == ref


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(arr=ARR, n=st.integers(1, 5))
def test_array_shingles_matches_python(ch, arr, n):
    got = ch.query_ch(
        f"SELECT arrayShingles({_lit_arr(arr)}, {n}) AS s"
    ).collect()[0]["s"]
    ref = [arr[i: i + n] for i in range(len(arr) - n + 1)] \
        if len(arr) >= n else []
    assert got == ref


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(h=TXT, n=TXT)
def test_has_subsequence_matches_python(ch, h, n):
    got = ch.query_ch(
        f"SELECT hasSubsequence({_lit_str(h)}, {_lit_str(n)}) AS s"
    ).collect()[0]["s"]

    it = iter(h)
    ref = all(c in it for c in n)
    assert got == ref


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(a=TXT, b=TXT)
def test_ngram_distance_bounds_and_symmetry(ch, a, b):
    got = ch.query_ch(
        f"SELECT ngramDistance({_lit_str(a)}, {_lit_str(b)}) AS ab, "
        f"ngramDistance({_lit_str(b)}, {_lit_str(a)}) AS ba, "
        f"ngramDistance({_lit_str(a)}, {_lit_str(a)}) AS aa"
    ).collect()[0]
    assert 0.0 <= got["ab"] <= 1.0
    assert abs(got["ab"] - got["ba"]) < 1e-12  # symmetric
    assert got["aa"] == 0.0  # identity


# ---------------------------------------------------------------------------
# combinator-closure property: any <base><combinator-chain> the grammar
# can spell either EXECUTES or refuses with a guided
# UntranslatableFunctionError — never an opaque UNRESOLVED_ROUTINE leak
# ---------------------------------------------------------------------------

_COMB_BASES = ["sum", "avg", "min", "max", "count", "uniq", "uniqExact",
               "groupArray", "any", "argMax", "topK", "quantile"]
_COMB_SUFFIXES = ["", "If", "Distinct", "OrNull", "OrDefault", "Array",
                  "Merge", "State", "ArrayIf", "DistinctIf", "OrNullIf"]


@settings(max_examples=120, deadline=None)
@given(
    st.sampled_from(_COMB_BASES),
    st.sampled_from(_COMB_SUFFIXES),
)
def test_combinator_chain_closure(base, suffix):
    from clickhouse_arrow_spark.dialect import (
        UntranslatableFunctionError,
        translate_ch_sql,
    )

    name = base + suffix
    n_args = 1 + ("If" in suffix) + (base == "argMax")
    args = ", ".join(f"c{i}" for i in range(n_args))
    try:
        out = translate_ch_sql(f"SELECT {name}({args}) FROM t")
    except UntranslatableFunctionError:
        return  # guided refusal is a pass
    # a translation happened: the CH name must be GONE (left verbatim
    # surfaces as UNRESOLVED_ROUTINE at run time) unless (a) the name
    # is itself valid Spark (count/min/max/sum/avg/any bare), or (b)
    # the runtime did-you-mean hook resolves it to a guidance hint —
    # either way the user gets a guided outcome, never an opaque leak
    bare_sparks = {"sum", "avg", "min", "max", "count", "any"}
    if name not in bare_sparks and name in out:
        from clickhouse_arrow_spark.dialect import suggest_function

        assert suggest_function(name), f"{name} leaked with no hint: {out}"


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(
        st.tuples(st.integers(0, 2**20), st.integers(0, 2**20)),
        min_size=1, max_size=6,
    )
)
def test_hilbert_morton_roundtrip_property(ch, xs):
    """Wave-26 codecs: decode(encode(x, y)) == (x, y) for arbitrary
    20-bit coordinates, and morton keys preserve the interleave
    identity n=2."""
    sel = ", ".join(
        f"hilbertDecode(2, hilbertEncode({x}, {y})) AS h{i}, "
        f"mortonDecode(2, mortonEncode({x}, {y})) AS m{i}"
        for i, (x, y) in enumerate(xs)
    )
    r = ch.query_ch(f"SELECT {sel}").collect()[0]
    for i, (x, y) in enumerate(xs):
        assert (r[f"h{i}"][0], r[f"h{i}"][1]) == (x, y)
        assert (r[f"m{i}"][0], r[f"m{i}"][1]) == (x, y)


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    lon=st.floats(-179.9, 179.9, allow_nan=False),
    lat=st.floats(-89.9, 89.9, allow_nan=False),
)
def test_geohash_roundtrip_within_cell(ch, lon, lat):
    """geohashDecode(geohashEncode(lon, lat, 12)) lands within the
    precision-12 cell (~3.7e-5 degrees)."""
    r = ch.query_ch(
        f"SELECT geohashDecode(geohashEncode({lon!r}, {lat!r}, 12)) "
        "AS d"
    ).collect()[0].d
    assert abs(r[0] - lon) < 1e-4
    assert abs(r[1] - lat) < 1e-4


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(a=TXT, b=TXT)
def test_jaro_bounds_and_identity(ch, a, b):
    """jaro/jaroWinkler stay in [0, 1], equal 1 on identical non-empty
    strings, and damerauLevenshteinDistance(a, b) == 0 iff a == b."""
    r = ch.query_ch(
        f"SELECT jaroSimilarity({_lit_str(a)}, {_lit_str(b)}) AS j, "
        f"jaroWinklerSimilarity({_lit_str(a)}, {_lit_str(b)}) AS jw, "
        f"damerauLevenshteinDistance({_lit_str(a)}, {_lit_str(b)}) AS d"
    ).collect()[0]
    assert 0.0 <= r.j <= 1.0 and 0.0 <= r.jw <= 1.0
    assert (r.d == 0) == (a == b)
    if a == b and a:
        assert r.j == 1.0


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    key=st.integers(0, 2**63 - 1),
    n=st.integers(1, 64),
)
def test_jump_hash_range_property(ch, key, n):
    r = ch.query_ch(
        f"SELECT jumpConsistentHash(toUInt64({key}), {n}) AS b"
    ).collect()[0].b
    assert 0 <= r < n
