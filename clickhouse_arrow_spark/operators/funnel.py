"""windowFunnel — ClickHouse's sliding-window event-sequence aggregate.

`window_funnel(df, steps, window_seconds)` computes, per user, the
deepest prefix of `steps` completed in order within `window_seconds` of
the first step — the exact semantics of ClickHouse
`windowFunnel(window)(ts, cond1, cond2, ...)`.

Spark-first shape: per-user sorted event arrays are folded with a
built-in `aggregate()` higher-order function (state = (level, chain
start time)), so the whole computation is one keyed aggregation + one
projection — no Python, no per-user driver loops, state O(1) per user.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_FUNNEL_MODES = ("strict_order", "strict_dedup", "strict_increase")


def window_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_conds: list[Column],
    window_seconds: int,
    modes: tuple[str, ...] = (),
) -> DataFrame:
    """Returns (user_col, funnel_level): max step index (1-based; 0 =
    no first step) reached in order within the time window.

    Per-user timeline sorted by (ts, step), folded with one declarative
    `aggregate()` — matching ClickHouse windowFunnel semantics.
    `modes` accepts any combination of ClickHouse's modifiers:

    - ``strict_order``: an interleaved event of any OTHER tracked
      condition freezes the chain at its current level;
    - ``strict_dedup``: two consecutive events matching the SAME
      condition freeze the chain;
    - ``strict_increase``: a chain event must have a strictly greater
      timestamp than the previous chain event.
    """
    bad = set(modes) - set(_FUNNEL_MODES)
    if bad:
        raise ValueError(f"unknown windowFunnel modes {sorted(bad)}")
    strict_order = "strict_order" in modes
    strict_dedup = "strict_dedup" in modes
    strict_increase = "strict_increase" in modes

    n_steps = len(step_conds)
    step_expr = F.lit(0)
    for idx in range(n_steps, 0, -1):
        step_expr = F.when(step_conds[idx - 1], F.lit(idx)).otherwise(step_expr)

    events = (
        df.select(
            F.col(user_col),
            # via TIMESTAMP: TIMESTAMP_NTZ has no direct DOUBLE cast, and the
            # session tz is UTC so epoch seconds match DuckDB's epoch().
            F.col(ts_col).cast("timestamp").cast("double").alias("_t"),
            step_expr.alias("_step"),
        )
        .where(F.col("_step") > 0)
    )
    # per-user ordered timeline (struct sort: by time, then step)
    timeline = events.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_t"), F.col("_step")))
        ).alias("_tl")
    )

    # fold state: (level, start time, last matched time, last seen step,
    # dead). `dead` latches a strict-mode interruption — the chain keeps
    # the level it reached, matching CH's "stops counting".
    init = F.struct(
        F.lit(0).alias("level"),
        F.lit(0.0).cast("double").alias("start"),
        F.lit(0.0).cast("double").alias("lastm"),
        F.lit(0).alias("lastseen"),
        F.lit(False).alias("dead"),
    )

    def transition(acc, e):
        level = acc.getField("level")
        start = acc.getField("start")
        lastm = acc.getField("lastm")
        t = e.getField("_t")
        s = e.getField("_step")
        within = (level == 0) | (t - start <= window_seconds)
        inc_ok = (
            ((level == 0) | (t > lastm)) if strict_increase else F.lit(True)
        )
        advance = (s == level + 1) & within & inc_ok
        dedup_break = (
            (s == acc.getField("lastseen")) & (level >= 1)
            if strict_dedup
            else F.lit(False)
        )
        order_break = (
            (s != level + 1) & (level >= 1) if strict_order else F.lit(False)
        )
        advanced = F.struct(
            (level + 1).alias("level"),
            F.when(level == 0, t).otherwise(start).alias("start"),
            t.alias("lastm"),
            s.alias("lastseen"),
            F.lit(False).alias("dead"),
        )
        frozen = F.struct(
            level.alias("level"), start.alias("start"), lastm.alias("lastm"),
            s.alias("lastseen"), F.lit(True).alias("dead"),
        )
        kept = F.struct(
            level.alias("level"), start.alias("start"), lastm.alias("lastm"),
            s.alias("lastseen"), F.lit(False).alias("dead"),
        )
        return (
            F.when(acc.getField("dead"), acc)
            .when(dedup_break | order_break, frozen)
            .when(advance, advanced)
            .otherwise(kept)
        )

    fold = F.aggregate(F.col("_tl"), init, transition)
    return timeline.select(
        F.col(user_col), fold.getField("level").alias("funnel_level")
    )


# ---------------------------------------------------------------------------
# sequenceMatch / sequenceCount
# ---------------------------------------------------------------------------

_ALPHABET_START = 97  # 'a'


def ch_sequence_pattern_to_regex(pattern: str, n_conds: int) -> str:
    """Translate a ClickHouse sequenceMatch pattern to a Java regex over
    the per-user symbol string built by :func:`sequence_match`.

    Each event becomes one character: 'a' for the first condition it
    matches, 'b' for the second, ... and 'z' for events matching no
    condition. ClickHouse pattern atoms map 1:1:
      (?N) -> the N-th condition's symbol
      .    -> any single event       -> [a-z]
      .*   -> any number of events   -> [a-z]*
    Time constraints ((?t>3600)) are not supported — use
    :func:`window_funnel` for time-bounded sequences.
    """
    out: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "(" and pattern[i : i + 2] == "(?":
            close = pattern.find(")", i)
            if close == -1:
                raise ValueError(f"unbalanced pattern: {pattern!r}")
            ref = pattern[i + 2 : close]
            if ref.startswith("t"):
                raise NotImplementedError(
                    "time-constrained sequence patterns ((?t...)): use "
                    "window_funnel for time-bounded sequences"
                )
            n = int(ref)
            if not 1 <= n <= n_conds:
                raise ValueError(f"(?{n}) out of range for {n_conds} conditions")
            out.append(chr(_ALPHABET_START + n - 1))
            i = close + 1
        elif c == "." and pattern[i : i + 2] == ".*":
            out.append("[a-z]*")
            i += 2
        elif c == ".":
            out.append("[a-z]")
            i += 1
        else:
            raise ValueError(f"unsupported pattern atom at {i}: {pattern!r}")
    return "".join(out)


def _symbol_strings(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    conds: list[Column],
    id_col: str | None,
) -> DataFrame:
    """Per-user event-symbol string in (ts, id) order — the shared
    substrate of sequence_match/sequence_count. One keyed aggregation;
    the fold state per user is a string linear in that user's events."""
    sym = F.coalesce(
        *[
            F.when(c, F.lit(chr(_ALPHABET_START + i)))
            for i, c in enumerate(conds)
        ],
        F.lit("z"),
    )
    order_cols = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    ordered = F.array_sort(
        F.collect_list(F.struct(*order_cols, sym.alias("_sym")))
    )
    return df.groupBy(user_col).agg(
        F.array_join(
            F.transform(ordered, lambda e: e.getField("_sym")), ""
        ).alias("_symbols")
    )


def sequence_match(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
    id_col: str | None = None,
) -> DataFrame:
    """ClickHouse `sequenceMatch(pattern)(ts, cond...)` per user:
    (user_col, matched) where matched=1 iff the user's event sequence
    (time-ordered, `id_col` as tie-break) contains the pattern.

    Spark-first: events collapse to one character each, the pattern to
    a regex, and the whole aggregate is collect_list + array_join +
    rlike — one shuffle keyed on the user, no Python in the hot path.
    Cites clickhouse-arrow: the reference ships these aggregates as SQL
    text to the server (SURVEY §2.3); this is the engine-side
    implementation.
    """
    regex = ch_sequence_pattern_to_regex(pattern, len(conds))
    return _symbol_strings(df, user_col, ts_col, conds, id_col).select(
        F.col(user_col),
        F.col("_symbols").rlike(regex).cast("int").alias("matched"),
    )


def sequence_count(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
    id_col: str | None = None,
) -> DataFrame:
    """ClickHouse `sequenceCount(pattern)(ts, cond...)`: number of
    NON-OVERLAPPING pattern occurrences per user (each search resumes
    after the previous match — `regexp_count` semantics on the symbol
    string, matching ClickHouse's)."""
    regex = ch_sequence_pattern_to_regex(pattern, len(conds))
    return _symbol_strings(df, user_col, ts_col, conds, id_col).select(
        F.col(user_col),
        F.regexp_count(F.col("_symbols"), F.lit(regex)).alias("n_matches"),
    )
