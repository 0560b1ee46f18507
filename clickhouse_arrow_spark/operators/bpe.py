"""Distributed BPE tokenizer training and encoding.

A training-data pipeline needs token counts under ITS OWN tokenizer,
not a whitespace proxy — sequence packing, token-budget selection and
mixing weights (operators/packing.py, operators/sampling.py) all key on
them. This module trains a byte-pair-encoding vocabulary the way
production trainers shard the problem (Sennrich et al. 2016; the
word-count factorization every BPE implementation uses):

- **Distributed**: ONE `groupBy(word)` count over the corpus — the only
  full shuffle, map-side combinable, output bounded by the DISTINCT
  vocabulary (not the corpus size; ~millions of rows at 100 TB, and a
  `max_words` top-k cap bounds even that via TakeOrdered, no global
  sort).
- **Driver**: the classic merge loop runs over the (word, count) table
  — pair statistics are weighted by word frequency, so the result is
  IDENTICAL to scanning the corpus token stream, at the cost of the
  dictionary instead of the data. Incremental pair-count maintenance
  keeps it O(merges x touched-words).
- **Executors**: encoding broadcasts the merge-rank dict inside an
  Arrow-batched pandas UDF; each word encodes independently
  (greedy lowest-rank merge, the standard BPE encode), with an
  LRU-style per-batch memo because Zipf means most words repeat.

Scores/ranks tie-break lexicographically so training is deterministic
across partitionings and engines.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["BPEModel", "bpe_train", "bpe_encode", "train_merges"]

#: end-of-word sentinel (classic </w> marker)
EOW = "</w>"

#: shared normalization with the rest of the text tier: lowercase,
#: non-alphanumerics to spaces
_NORM_RE = "[^a-z0-9]+"


@dataclass(frozen=True)
class BPEModel:
    #: merge list in training order; rank = position
    merges: tuple[tuple[str, str], ...]
    #: full vocabulary: alphabet + merge products (+ EOW)
    vocab: tuple[str, ...]

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {m: i for i, m in enumerate(self.merges)}


def _word_counts(
    docs: DataFrame, text_col: str, max_words: int
) -> list[tuple[str, int]]:
    counts = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(
                        F.regexp_replace(F.lower(F.col(text_col)), _NORM_RE, " "),
                        " ",
                    ),
                    lambda t: t != F.lit(""),
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        # TakeOrdered top-k, deterministic tie-break on the word itself
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["n"]) for r in counts]


def train_merges(
    wc: list[tuple[str, int]], num_merges: int
) -> tuple[list[tuple[str, str]], list[str]]:
    """Pure driver-side merge loop over a (word, count) table —
    IDENTICAL result to scanning the raw token stream, at dictionary
    cost. Incremental pair-count maintenance; deterministic
    (count desc, lexicographic pair) tie-break. Returns
    (merges, alphabet). Exposed pure so the property suite can check
    it against a naive full-recount reference on arbitrary tables."""
    # symbol sequences per word + global pair counts
    words: list[list[str]] = [list(w) + [EOW] for w, _ in wc]
    freqs = [n for _, n in wc]
    pair_counts: dict[tuple[str, str], int] = {}
    # which word indexes contain a pair (incremental maintenance)
    pair_where: dict[tuple[str, str], set[int]] = {}

    def add_word_pairs(idx: int, sign: int) -> None:
        seq, n = words[idx], freqs[idx]
        for a, b in zip(seq, seq[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + sign * n
            if sign > 0:
                pair_where.setdefault(p, set()).add(idx)

    for i in range(len(words)):
        add_word_pairs(i, +1)

    merges: list[tuple[str, str]] = []
    alphabet = sorted({s for seq in words for s in seq})
    for _ in range(num_merges):
        live = {p: c for p, c in pair_counts.items() if c > 0}
        if not live:
            break
        # deterministic: highest count, then lexicographic pair
        best = min(live.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for idx in list(pair_where.get(best, ())):
            seq = words[idx]
            if not any(
                a == best[0] and b == best[1] for a, b in zip(seq, seq[1:])
            ):
                continue
            add_word_pairs(idx, -1)
            out: list[str] = []
            j = 0
            while j < len(seq):
                if (
                    j + 1 < len(seq)
                    and seq[j] == best[0]
                    and seq[j + 1] == best[1]
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            words[idx] = out
            add_word_pairs(idx, +1)
        pair_counts.pop(best, None)
        pair_where.pop(best, None)

    return merges, alphabet


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 1_000_000,
) -> BPEModel:
    """Train `num_merges` BPE merges on the corpus.

    `max_words` caps the driver-held word-frequency table (top-k by
    count). The tail it drops carries negligible pair mass under any
    Zipf-ish distribution; raise it if the corpus vocabulary is
    genuinely flat.
    """
    wc = _word_counts(docs, text_col, max_words)
    if not wc:
        raise ValueError("bpe_train: empty corpus after normalization")
    merges, alphabet = train_merges(wc, num_merges)
    vocab = tuple(alphabet) + tuple(a + b for a, b in merges)
    return BPEModel(merges=tuple(merges), vocab=vocab)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    seq = list(word) + [EOW]
    while len(seq) > 1:
        pairs = [(ranks.get((a, b)), i)
                 for i, (a, b) in enumerate(zip(seq, seq[1:]))]
        cand = [(r, i) for r, i in pairs if r is not None]
        if not cand:
            break
        _, i = min(cand)
        seq[i : i + 2] = [seq[i] + seq[i + 1]]
    return seq


def bpe_encode(
    df: DataFrame,
    model: BPEModel,
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append `out_col` (array<string> of BPE tokens) and
    `{out_col}_n` (token count). Arrow-batched; the rank dict rides the
    UDF closure (one broadcast per executor)."""
    ranks = model.ranks

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        import re as _re

        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in _re.sub(_NORM_RE, " ", (t or "").lower()).split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    res = df.withColumn(out_col, encode(F.col(text_col)))
    return res.withColumn(f"{out_col}_n", F.size(out_col))
