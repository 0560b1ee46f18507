"""Property tests for the round-7 sampling/text operators: UniMax
water-filling invariants (pure-python re-implementation checked against
the Spark operator on random inputs) and the Porter stemmer / C4 filter
invariants. Spark-dependent checks run on small inputs; the pure-math
properties run hundreds of Hypothesis examples without a session."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _waterfill_reference(caps: list[float], budget: float) -> list[float]:
    """Reference water-filling: allocation_i = min(cap_i, theta) with
    theta solving sum(min(cap, theta)) = budget (or every cap when the
    budget covers everything)."""
    if sum(caps) <= budget:
        return list(caps)
    order = sorted(range(len(caps)), key=lambda i: caps[i])
    remaining, out = budget, [0.0] * len(caps)
    for pos, i in enumerate(order):
        share = remaining / (len(caps) - pos)
        if caps[i] <= share:
            out[i] = caps[i]
            remaining -= caps[i]
        else:
            for j in order[pos:]:
                out[j] = share
            break
    return out


CAPS = st.lists(
    st.floats(min_value=0.5, max_value=1000, allow_nan=False),
    min_size=2, max_size=8,
)


@given(CAPS, st.floats(min_value=1, max_value=5000, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_waterfill_reference_invariants(caps, budget):
    alloc = _waterfill_reference(caps, budget)
    # never above cap; budget exactly exhausted (or everything at cap)
    assert all(a <= c + 1e-9 for a, c in zip(alloc, caps))
    assert abs(sum(alloc) - min(budget, sum(caps))) < 1e-6
    # saturated groups are exactly those below the water level
    theta = max(alloc)
    for a, c in zip(alloc, caps):
        if c <= theta + 1e-9:
            assert abs(a - c) < 1e-6


def test_unimax_matches_reference(spark):
    import random

    from clickhouse_arrow_spark.operators import sampling

    rng = random.Random(11)
    for trial in range(5):
        k = rng.randint(2, 6)
        sizes = [rng.randint(5, 400) for _ in range(k)]
        budget = rng.randint(50, 900)
        rows = []
        did = 0
        for g, size in enumerate(sizes):
            left = size
            while left > 0:
                t = min(left, rng.randint(1, 40))
                rows.append((did, f"g{g}", t))
                did += 1
                left -= t
        df = spark.createDataFrame(
            rows, "doc_id BIGINT, lang STRING, tokens BIGINT"
        )
        got = {
            r.lang: r.allocation
            for r in sampling.unimax_allocate(
                df, "lang", "tokens", budget, max_epochs=1.0
            ).collect()
        }
        ref = _waterfill_reference([float(s) for s in sizes], float(budget))
        for g, expect in enumerate(ref):
            assert abs(got[f"g{g}"] - expect) < 1e-6, (
                trial, sizes, budget, got, ref,
            )


@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122),
               min_size=1, max_size=20))
@settings(max_examples=300, deadline=None)
def test_porter_stem_total_and_bounded(word):
    from clickhouse_arrow_spark.functions.ch_functions import _porter_stem

    out = _porter_stem(word)
    # total function: never raises, never grows beyond input+1 ('e'/'i'
    # replacements can keep the length but never extend it past that)
    assert isinstance(out, str)
    assert len(out) <= len(word) + 1
    assert out == out.lower()


def test_c4_filter_kept_lines_satisfy_rules(spark):
    import random

    from clickhouse_arrow_spark.operators import text as text_ops

    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "delta", "javascript", "web"]
    pages = []
    for i in range(40):
        lines = []
        for _ in range(rng.randint(1, 6)):
            n = rng.randint(1, 6)
            line = " ".join(rng.choice(words) for _ in range(n))
            if rng.random() < 0.6:
                line += rng.choice([".", "!", "?", ""])
            lines.append(line)
        pages.append((i, "\n".join(lines)))
    df = spark.createDataFrame(pages, "doc_id BIGINT, text STRING")
    for r in text_ops.c4_line_filter(df).collect():
        assert r.kept_lines <= r.total_lines
        kept = r.clean_text.split("\n") if r.clean_text else []
        assert len([x for x in kept if x]) == r.kept_lines
        for line in kept:
            if not line:
                continue
            assert line[-1] in ".!?"
            assert len(line.split()) >= 3
            assert "javascript" not in line.lower()
