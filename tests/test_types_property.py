"""Property-based tests for the type bridge (hypothesis).

The reference's parser suite (src/native/types/tests.rs) enumerates
cases by hand; property testing gives us the closure guarantees:
parse -> render -> parse is a fixpoint, and every generated type maps
into Spark without crashing, with nullability pushed correctly.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from clickhouse_arrow_spark.types import (
    ChType,
    ch_type_to_spark,
    parse_ch_type,
    spark_type_to_ch,
)

SCALARS = st.sampled_from(
    [
        "Int8", "Int16", "Int32", "Int64", "UInt8", "UInt16", "UInt32",
        "UInt64", "Float32", "Float64", "String", "Bool", "Date", "Date32",
        "DateTime", "UUID", "IPv4", "IPv6", "FixedString(16)",
        "Decimal(10, 2)", "Decimal32(2)", "Decimal64(4)",
        "DateTime64(3, 'UTC')", "Enum8('a' = 1, 'b' = 2)", "JSON",
    ]
)


def nested_types(depth: int = 3):
    return st.recursive(
        SCALARS,
        lambda inner: st.one_of(
            inner.map(lambda t: f"Nullable({t})").filter(
                lambda s: "Nullable(" not in s[9:]
            ),
            inner.map(lambda t: f"Array({t})"),
            st.tuples(inner, inner).map(lambda kv: f"Map({_strip_null(kv[0])}, {kv[1]})"),
            st.lists(inner, min_size=1, max_size=3).map(
                lambda ts: f"Tuple({', '.join(ts)})"
            ),
            inner.map(
                lambda t: f"LowCardinality({t})"
                if t in ("String", "FixedString(16)", "Nullable(String)")
                else t
            ),
        ),
        max_leaves=depth,
    )


def _strip_null(s: str) -> str:
    return s[9:-1] if s.startswith("Nullable(") else s


@given(nested_types())
@settings(max_examples=300, deadline=None)
def test_parse_render_fixpoint(type_str):
    parsed = parse_ch_type(type_str)
    rendered = str(parsed)
    assert str(parse_ch_type(rendered)) == rendered


@given(nested_types())
@settings(max_examples=300, deadline=None)
def test_every_type_maps_to_spark(type_str):
    dt, nullable = ch_type_to_spark(type_str)
    assert isinstance(dt, T.DataType)
    assert isinstance(nullable, bool)
    # Nullable at top level must set the flag
    if type_str.startswith("Nullable("):
        assert nullable


@given(nested_types())
@settings(max_examples=300, deadline=None)
def test_spark_rendering_never_emits_forbidden_nullable(type_str):
    """CH forbids Nullable(Array/Map/Tuple/LowCardinality) — whatever we
    emit from the Spark type must respect the pushdown rule."""
    dt, nullable = ch_type_to_spark(type_str)
    out = spark_type_to_ch(dt, nullable)
    assert "Nullable(Array" not in out
    assert "Nullable(Map" not in out
    assert "Nullable(Tuple" not in out
    assert "Nullable(LowCardinality" not in out
    # and the rendering itself must be parseable
    parse_ch_type(out)


@given(nested_types())
@settings(max_examples=200, deadline=None)
def test_spark_roundtrip_is_stable(type_str):
    """CH -> Spark -> CH -> Spark reaches a fixpoint after one cycle
    (the second render must equal the first: mapping is idempotent on
    its own image)."""
    dt1, n1 = ch_type_to_spark(type_str)
    ch1 = spark_type_to_ch(dt1, n1)
    dt2, n2 = ch_type_to_spark(ch1)
    ch2 = spark_type_to_ch(dt2, n2)
    assert ch1 == ch2
    assert dt1 == dt2
