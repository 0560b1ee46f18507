"""Property tests: the incremental-pair-maintenance BPE trainer
(`operators/bpe.train_merges`, the exact code bpe_train runs) must
agree with a naive full-recount reference on ANY word-count table, and
encoding must round-trip any word under any trained model."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_arrow_spark.operators.bpe import (
    EOW,
    _encode_word,
    train_merges,
)

WORD = st.text(alphabet="abcde", min_size=1, max_size=8)
WORD_COUNTS = st.dictionaries(WORD, st.integers(1, 50), min_size=1, max_size=12)


def _naive_bpe(word_counts, num_merges):
    words = {i: list(w) + [EOW] for i, (w, _) in enumerate(word_counts)}
    freqs = {i: n for i, (_, n) in enumerate(word_counts)}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for i, seq in words.items():
            for p in zip(seq, seq[1:]):
                counts[p] = counts.get(p, 0) + freqs[i]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for i, seq in words.items():
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and (seq[j], seq[j + 1]) == best:
                    out.append(best[0] + best[1])
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            words[i] = out
    return merges


@settings(max_examples=200, deadline=None)
@given(WORD_COUNTS, st.integers(0, 15))
def test_incremental_matches_naive(wc, n_merges):
    items = sorted(wc.items(), key=lambda t: (-t[1], t[0]))
    merges, alphabet = train_merges(items, n_merges)
    assert merges == _naive_bpe(items, n_merges)
    assert set("".join(w for w, _ in items)) <= set(alphabet)


@settings(max_examples=200, deadline=None)
@given(WORD_COUNTS, st.integers(1, 12), WORD)
def test_encode_round_trips_any_word(wc, n_merges, probe):
    items = sorted(wc.items(), key=lambda t: (-t[1], t[0]))
    merges, _ = train_merges(items, n_merges)
    ranks = {m: i for i, m in enumerate(merges)}
    toks = _encode_word(probe, ranks)
    assert "".join(toks).replace(EOW, "") == probe
    assert toks[-1].endswith(EOW)


@settings(max_examples=100, deadline=None)
@given(WORD_COUNTS)
def test_merge_exhaustion_is_clean(wc):
    # asking for far more merges than pairs exist must terminate with
    # every word collapsed to a single symbol
    items = sorted(wc.items(), key=lambda t: (-t[1], t[0]))
    merges, _ = train_merges(items, 10_000)
    ranks = {m: i for i, m in enumerate(merges)}
    for w, _n in items:
        assert _encode_word(w, ranks) == [w + EOW]
