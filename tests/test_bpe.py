"""Distributed BPE trainer/encoder tests (operators/bpe.py)."""

import pytest

from clickhouse_arrow_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
)


def _naive_bpe(word_counts, num_merges):
    """Reference implementation: full pair recount every step."""
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


CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, w) for i, w in enumerate(CORPUS)]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_train_matches_naive_reference(docs):
    m = bpe_train(docs, num_merges=10)
    wc = sorted(
        ((w, CORPUS.count(w)) for w in set(CORPUS)),
        key=lambda t: (-t[1], t[0]),
    )
    assert list(m.merges) == _naive_bpe(wc, 10)
    assert len(m.merges) == 10


def test_train_deterministic_across_partitioning(spark, docs):
    a = bpe_train(docs, num_merges=8)
    b = bpe_train(docs.repartition(13), num_merges=8)
    assert a.merges == b.merges


def test_encode_round_trip(docs):
    m = bpe_train(docs, num_merges=6)
    rows = bpe_encode(docs, m).collect()
    for r in rows:
        joined = "".join(r["bpe_tokens"]).replace(EOW, "")
        assert joined == r["text"]
        assert r["bpe_tokens_n"] == len(r["bpe_tokens"]) >= 1


def test_merges_compress(docs):
    m = bpe_train(docs, num_merges=20)
    enc = bpe_encode(docs, m).collect()
    for r in enc:
        # with 20 merges over this tiny corpus every word compresses
        # below its raw char+EOW length
        assert len(r["bpe_tokens"]) < len(r["text"]) + 1


def test_unseen_chars_fall_back_to_alphabet(spark, docs):
    m = bpe_train(docs, num_merges=5)
    other = spark.createDataFrame([(1, "zzq low")], "doc_id BIGINT, text STRING")
    toks = bpe_encode(other, m).collect()[0]["bpe_tokens"]
    assert "".join(toks).replace(EOW, "") == "zzq low".replace(" ", "")


def test_empty_corpus_raises(spark):
    df = spark.createDataFrame([(1, "!!!")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError, match="empty corpus"):
        bpe_train(df)


def test_max_words_cap(docs):
    # cap to the 2 most frequent words: merges only involve their chars
    m = bpe_train(docs, num_merges=4, max_words=2)
    syms = {c for pair in m.merges for c in pair}
    allowed = set("newestlow") | {EOW} | {
        a + b for a, b in m.merges
    }
    assert syms <= allowed
