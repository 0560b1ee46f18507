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

    Round-10 rework to ClickHouse's EXACT per-level algorithm
    (AggregateFunctionWindowFunnel.h::getEventLevel): the scan keeps,
    for every level k, the chain-start timestamp of the best chain that
    reached k, and a cond-1 event ALWAYS re-anchors level 1 — so later
    chains are found even after an earlier chain stalled (the round-9
    single-anchor fold returned 1 for [cond1@0, cond1@100, cond2@105]
    with window 10, where CH returns 2; caught by the wave-35 probe).
    Per-user timeline sorted by (ts, step) — CH's stable timestamp sort
    with an explicit step tie-break, documented: same-second ordering
    is insertion-order-dependent in CH and not reproducible on any
    distributed engine. An event matching SEVERAL conditions
    contributes one timeline entry per matching condition, like CH's
    per-condition add().

    `modes` accepts any combination of ClickHouse's modifiers, with the
    reference implementation's exact readings:

    - ``strict_order``: an event matching NO tracked condition, seen
      after the first chain event, terminates the scan (the chain keeps
      its level). Tracked out-of-order events do NOT break — CH only
      breaks on the no-condition rows it collects under this mode.
    - ``strict_dedup``: an event repeating a condition k >= 2 whose
      level was ALREADY reached stops processing and returns k — even
      when a deeper level had been reached (CH returns event_idx + 1
      right there).
    - ``strict_increase``: a chain event must have a strictly greater
      timestamp than the previous event of ITS chain.
    """
    bad = set(modes) - set(_FUNNEL_MODES)
    if bad:
        raise ValueError(f"unknown windowFunnel modes {sorted(bad)}")
    strict_order = "strict_order" in modes
    strict_dedup = "strict_dedup" in modes
    strict_increase = "strict_increase" in modes

    n = len(step_conds)
    # one timeline entry per MATCHING condition; under strict_order,
    # rows matching no condition enter as step 0 (scan terminators)
    t_expr = F.col(ts_col).cast("timestamp").cast("double")
    per_cond = [
        F.when(step_conds[i],
               F.struct(t_expr.alias("_t"), F.lit(i + 1).alias("_step")))
        for i in range(n)
    ]
    entry_arr = F.filter(F.array(*per_cond), lambda x: x.isNotNull())
    if strict_order:
        entry_arr = F.when(
            F.size(entry_arr) > 0, entry_arr
        ).otherwise(F.array(
            F.struct(t_expr.alias("_t"), F.lit(0).alias("_step"))
        ))
        events = df.select(F.col(user_col), entry_arr.alias("_ea"))
    else:
        events = df.select(F.col(user_col), entry_arr.alias("_ea")).where(
            F.size(F.col("_ea")) > 0
        )
    timeline = events.groupBy(user_col).agg(
        F.array_sort(F.flatten(F.collect_list(F.col("_ea")))).alias("_tl")
    )

    # fold state mirrors CH's events_timestamp vector: per level, the
    # chain-start time (`firsts`, NULL = unset) and the last chain
    # event's time (`lasts`, for strict_increase); `stopped` latches
    # the strict_dedup immediate return; `broken` latches the
    # strict_order scan termination; `seen1` = CH's first_event.
    null_d = F.lit(None).cast("double")
    init = F.struct(
        F.array(*[null_d for _ in range(n)]).alias("firsts"),
        F.array(*[null_d for _ in range(n)]).alias("lasts"),
        F.lit(0).alias("stopped"),
        F.lit(False).alias("broken"),
        F.lit(False).alias("seen1"),
    )

    def set_at(arr, idx, val):
        # idx is a 1-BASED level column; transform's i is 0-based
        return F.transform(
            arr, lambda x, i: F.when(i == idx - 1, val).otherwise(x)
        )

    def transition(acc, e):
        firsts = acc.getField("firsts")
        lasts = acc.getField("lasts")
        t = e.getField("_t")
        s = e.getField("_step")
        prev_first = F.element_at(firsts, F.greatest(s - 1, F.lit(1)))
        prev_last = F.element_at(lasts, F.greatest(s - 1, F.lit(1)))
        own_first = F.element_at(firsts, F.greatest(s, F.lit(1)))
        inc_ok = (prev_last < t) if strict_increase else F.lit(True)
        extend = (
            prev_first.isNotNull()
            & (t <= prev_first + F.lit(float(window_seconds)))
            & inc_ok
        )
        anchored = F.struct(
            set_at(firsts, s, t).alias("firsts"),
            set_at(lasts, s, t).alias("lasts"),
            F.lit(0).alias("stopped"),
            F.lit(False).alias("broken"),
            F.lit(True).alias("seen1"),
        )
        extended = F.struct(
            set_at(firsts, s, prev_first).alias("firsts"),
            set_at(lasts, s, t).alias("lasts"),
            F.lit(0).alias("stopped"),
            F.lit(False).alias("broken"),
            acc.getField("seen1").alias("seen1"),
        )
        dedup_stop = F.struct(
            firsts.alias("firsts"), lasts.alias("lasts"),
            s.alias("stopped"), F.lit(False).alias("broken"),
            acc.getField("seen1").alias("seen1"),
        )
        order_break = F.struct(
            firsts.alias("firsts"), lasts.alias("lasts"),
            F.lit(0).alias("stopped"), F.lit(True).alias("broken"),
            acc.getField("seen1").alias("seen1"),
        )
        # CH returns the moment the LAST level is reached (event_idx +
        # 1 == events_size) — not just an optimization: the early
        # return shields the result from a later strict_dedup stop, so
        # [A,B,C,B] under strict_dedup is 3 only when C came first
        done = F.element_at(firsts, F.lit(n)).isNotNull()
        chain = F.when(
            (acc.getField("stopped") > 0) | acc.getField("broken") | done,
            acc,
        )
        if strict_order:
            chain = chain.when(
                (s == 0) & acc.getField("seen1"), order_break
            ).when(s == 0, acc)
        chain = chain.when(s == 1, anchored)
        if strict_dedup:
            chain = chain.when(own_first.isNotNull(), dedup_stop)
        return chain.when(extend, extended).otherwise(acc)

    fold = F.aggregate(F.col("_tl"), init, transition)
    max_level = F.array_max(
        F.transform(
            fold.getField("firsts"),
            lambda x, i: F.when(x.isNotNull(), i + 1).otherwise(0),
        )
    )
    level = F.when(fold.getField("stopped") > 0, fold.getField("stopped")) \
        .otherwise(F.coalesce(max_level, F.lit(0)))
    return timeline.select(
        F.col(user_col), level.cast("int").alias("funnel_level")
    )


# ---------------------------------------------------------------------------
# sequenceMatch / sequenceCount
# ---------------------------------------------------------------------------

_ALPHABET_START = 97  # 'a'

_TIME_OPS = ("<=", ">=", "==", "<", ">", "=")


def parse_sequence_pattern(pattern: str, n_conds: int) -> list[tuple]:
    """Parse a ClickHouse sequenceMatch pattern into atoms.

    Returns a list of:
      ("event", n)           -- (?N), 1-based condition index
      ("any",)               -- . (any single considered event)
      ("star",)              -- .* (any number of considered events)
      ("time", op, seconds)  -- (?t OP N), constrains the gap between the
                                events matched by the surrounding atoms;
                                per the ClickHouse docs an arbitrary
                                number of events may lie between them.

    ClickHouse semantics pinned here (docs, parametric-functions.md):
    events matching NO condition are ignored entirely — the docs' own
    example: data (t=1,n=1),(t=2,n=3),(t=3,n=2) matches '(?1)(?2)' with
    conds (n=1, n=2) because n=3 is not described by any condition, but
    stops matching once n=3 is added as a third condition.
    """
    out: list[tuple] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "(" and pattern[i : i + 2] == "(?":
            close = pattern.find(")", i)
            if close == -1:
                raise ValueError(f"unbalanced pattern: {pattern!r}")
            ref = pattern[i + 2 : close].strip()
            if ref.startswith("t"):
                body = ref[1:].strip()
                for op in _TIME_OPS:
                    if body.startswith(op):
                        val = body[len(op) :].strip()
                        break
                else:
                    raise ValueError(f"bad time constraint: (?{ref})")
                try:
                    seconds = float(val)
                except ValueError:
                    raise ValueError(f"bad time constraint value: (?{ref})")
                out.append(("time", "==" if op == "=" else op, seconds))
            else:
                n = int(ref)
                if not 1 <= n <= n_conds:
                    raise ValueError(
                        f"(?{n}) out of range for {n_conds} conditions"
                    )
                out.append(("event", n))
            i = close + 1
        elif c == "." and pattern[i : i + 2] == ".*":
            out.append(("star",))
            i += 2
        elif c == ".":
            out.append(("any",))
            i += 1
        else:
            raise ValueError(f"unsupported pattern atom at {i}: {pattern!r}")
    # a time constraint must sit between two event-ish atoms
    for j, a in enumerate(out):
        if a[0] == "time":
            prev_ok = any(x[0] in ("event", "any") for x in out[:j])
            next_ok = any(x[0] in ("event", "any") for x in out[j + 1 :])
            if not (prev_ok and next_ok):
                raise ValueError(
                    f"time constraint needs events on both sides: {pattern!r}"
                )
    return out


def ch_sequence_pattern_to_regex(pattern: str, n_conds: int) -> str:
    """Translate a (time-constraint-free) ClickHouse sequenceMatch
    pattern to a Java regex over the per-user symbol string built by
    :func:`sequence_match`.

    Each CONSIDERED event (one matching >=1 condition) becomes one
    character: 'a' for the first condition it matches, 'b' for the
    second, ... Events matching no condition never enter the string —
    ClickHouse ignores them (see :func:`parse_sequence_pattern`).
      (?N) -> the N-th condition's symbol
      .    -> any considered event   -> [a-<last>]
      .*   -> any number of them     -> [a-<last>]*
    Patterns with (?t...) constraints cannot be a regex over symbols
    (the string has no timestamps) — sequence_match dispatches those to
    the backtracking matcher.

    Caveat (regex fast path only): an event matching SEVERAL conditions
    gets the symbol of the FIRST one. With overlapping conditions use
    the bitmask-exact matcher (`engine="pandas"`).
    """
    last = chr(_ALPHABET_START + n_conds - 1)
    any_cls = "[a-%s]" % last if n_conds > 1 else "a"
    out: list[str] = []
    for atom in parse_sequence_pattern(pattern, n_conds):
        if atom[0] == "event":
            out.append(chr(_ALPHABET_START + atom[1] - 1))
        elif atom[0] == "any":
            out.append(any_cls)
        elif atom[0] == "star":
            out.append(any_cls + "*")
        else:  # time
            raise NotImplementedError(
                "time-constrained patterns have no regex form; "
                "sequence_match routes them to the backtracking matcher"
            )
    return "".join(out)


def _match_sequence(events, atoms, start, count_mode=False, collect=False):
    """Backtracking matcher over `events` = [(bitmask, t), ...] sorted
    by time. Tries to match `atoms` beginning exactly at event index
    `start`. Returns the exclusive end index of the first (leftmost-
    biased) match, or -1; with ``collect=True`` returns
    ``(end, chain)`` where chain is the tuple of timestamps consumed
    by the ``(?N)`` event atoms (sequenceMatchEvents' output).

    Time-constraint semantics (ClickHouse docs): `(?1)(?t>N)(?2)`
    matches a cond1 event and a LATER cond2 event whose timestamp gap
    satisfies the operator, with an arbitrary number of events between
    them — i.e. a time constraint implies an interleaving `.*`, with
    the gap measured between the two anchor events.
    """

    def rec(ai, ei, last_t, pending, anchored, chain):
        # ai: atom index; ei: next event index; last_t: time of the last
        # event consumed by an event/any atom; pending: accumulated time
        # constraints to apply to the next consumed event; anchored:
        # False once a star/time atom allows skipping, after which the
        # next atom may consume any later event; chain: timestamps of
        # the (?N) atoms consumed so far (only built under `collect`).
        if ai == len(atoms):
            return ei, chain
        atom = atoms[ai]
        if atom[0] == "star":
            return rec(ai + 1, ei, last_t, pending, False, chain)
        if atom[0] == "time":
            return rec(ai + 1, ei, last_t, pending + [atom[1:]], False,
                       chain)
        # event / any
        candidates = range(ei, len(events)) if not anchored else (
            (ei,) if ei < len(events) else ()
        )
        for k in candidates:
            mask, t = events[k]
            if atom[0] == "event" and not (mask >> (atom[1] - 1)) & 1:
                if anchored:
                    return -1, chain
                continue
            ok = True
            for op, sec in pending:
                gap = t - last_t
                if op == "<" and not gap < sec:
                    ok = False
                elif op == "<=" and not gap <= sec:
                    ok = False
                elif op == ">" and not gap > sec:
                    ok = False
                elif op == ">=" and not gap >= sec:
                    ok = False
                elif op == "==" and not gap == sec:
                    ok = False
                if not ok:
                    break
            if not ok:
                if anchored:
                    return -1, chain
                continue
            nxt = chain + (t,) if collect and atom[0] == "event" else chain
            end, got = rec(ai + 1, k + 1, t, [], True, nxt)
            if end >= 0:
                return end, got
            if anchored:
                return -1, chain
        return -1, chain

    end, got = rec(0, start, None, [], True, ())
    if collect:
        return end, got
    return end


def _run_sequence_py(events, atoms, count_mode):
    """matched (0/1) or non-overlapping count over one user's events."""
    n = len(events)
    if not count_mode:
        for s in range(n):
            if _match_sequence(events, atoms, s) >= 0:
                return 1
        return 0
    cnt = 0
    s = 0
    while s < n:
        end = _match_sequence(events, atoms, s)
        if end >= 0:
            cnt += 1
            # resume after the match (non-overlapping, ClickHouse-style)
            s = max(end, s + 1)
        else:
            s += 1
    return cnt


def _sequence_pandas(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
    id_col: str | None,
    count_mode: bool,
) -> DataFrame:
    """Bitmask-exact grouped matcher: one shuffle keyed on the user,
    then an Arrow-batched applyInPandas running the backtracking
    matcher per user (group sizes = events-per-user, small by
    construction; the pattern alphabet is bounded at CH's 32 conds).

    This is the (b)-tier path of the build brief: the semantics
    (per-event condition BITMASKS + inter-event time constraints)
    aren't expressible with built-in operators.
    """
    atoms = parse_sequence_pattern(pattern, len(conds))
    mask_expr = None
    for i, c in enumerate(conds):
        term = F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
        mask_expr = term if mask_expr is None else mask_expr + term
    order_cols = [F.col(ts_col).cast("timestamp").cast("double").alias("_t")]
    if id_col:
        order_cols.append(F.col(id_col).cast("double").alias("_id"))
    else:
        order_cols.append(F.lit(0.0).alias("_id"))
    ev = (
        df.select(F.col(user_col), *order_cols, mask_expr.alias("_mask"))
        .where(F.col("_mask") > 0)
    )
    user_type = dict(df.dtypes)[user_col]
    out_name = "n_matches" if count_mode else "matched"
    schema = f"{user_col} {user_type}, {out_name} int"

    def run(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["_t", "_id"], kind="mergesort")
        events = list(zip(pdf["_mask"].astype(int), pdf["_t"].astype(float)))
        val = _run_sequence_py(events, atoms, count_mode)
        return pd.DataFrame({user_col: [pdf[user_col].iloc[0]], out_name: [val]})

    return ev.groupBy(user_col).applyInPandas(run, schema=schema)


def _symbol_strings(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    conds: list[Column],
    id_col: str | None,
) -> DataFrame:
    """Per-user event-symbol string in (ts, id) order — the shared
    substrate of sequence_match/sequence_count. One keyed aggregation;
    the fold state per user is a string linear in that user's events.
    Events matching no condition are dropped BEFORE the string is
    built (ClickHouse ignores them; see parse_sequence_pattern)."""
    sym = F.coalesce(
        *[
            F.when(c, F.lit(chr(_ALPHABET_START + i)))
            for i, c in enumerate(conds)
        ],
    )
    order_cols = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    ordered = F.array_sort(
        F.collect_list(F.struct(*order_cols, sym.alias("_sym")))
    )
    return (
        df.where(sym.isNotNull())
        .groupBy(user_col)
        .agg(
            F.array_join(
                F.transform(ordered, lambda e: e.getField("_sym")), ""
            ).alias("_symbols")
        )
    )


def _has_time_constraint(pattern: str) -> bool:
    return "(?t" in pattern.replace(" ", "")


def sequence_match(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
    id_col: str | None = None,
    engine: str = "auto",
) -> DataFrame:
    """ClickHouse `sequenceMatch(pattern)(ts, cond...)` per user:
    (user_col, matched) where matched=1 iff the user's event sequence
    (time-ordered, `id_col` as tie-break; events matching no condition
    ignored, per the CH docs) contains the pattern.

    Spark-first: time-free patterns collapse each event to one
    character and the whole aggregate is collect_list + array_join +
    rlike — one shuffle keyed on the user, no Python in the hot path.
    Patterns with `(?t...)` constraints (and `engine="pandas"`, the
    bitmask-exact path for overlapping conditions) run the same keyed
    shuffle into an Arrow-batched per-user backtracking matcher.
    Cites clickhouse-arrow: the reference ships these aggregates as SQL
    text to the server (SURVEY §2.3); this is the engine-side
    implementation.
    """
    if engine == "pandas" or (engine == "auto" and _has_time_constraint(pattern)):
        return _sequence_pandas(
            df, user_col, ts_col, pattern, conds, id_col, count_mode=False
        )
    regex = ch_sequence_pattern_to_regex(pattern, len(conds))
    return _symbol_strings(df, user_col, ts_col, conds, id_col).select(
        F.col(user_col),
        F.col("_symbols").rlike(regex).cast("int").alias("matched"),
    )


def sequence_match_events(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
    id_col: str | None = None,
) -> DataFrame:
    """ClickHouse `sequenceMatchEvents(pattern)(ts, cond...)` (wave 35;
    CH 24.x, AggregateFunctionSequenceMatch.h): the timestamps of the
    events consumed by the pattern's ``(?N)`` conditions in the FIRST
    (leftmost) match per user — empty array when the pattern does not
    match. Returned as ``event_times array<double>`` (epoch seconds,
    the matcher's time domain; cast back with timestamp_seconds()).

    Same shape as the time-constrained sequence_match path: one keyed
    shuffle into the Arrow-batched backtracking matcher (the chain
    collection reuses the exact matcher sequenceMatch runs, so the
    matched chain and the boolean can never disagree)."""
    atoms = parse_sequence_pattern(pattern, len(conds))
    mask_expr = None
    for i, c in enumerate(conds):
        term = F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
        mask_expr = term if mask_expr is None else mask_expr + term
    order_cols = [F.col(ts_col).cast("timestamp").cast("double").alias("_t")]
    if id_col:
        order_cols.append(F.col(id_col).cast("double").alias("_id"))
    else:
        order_cols.append(F.lit(0.0).alias("_id"))
    ev = (
        df.select(F.col(user_col), *order_cols, mask_expr.alias("_mask"))
        .where(F.col("_mask") > 0)
    )
    user_type = dict(df.dtypes)[user_col]
    schema = f"{user_col} {user_type}, event_times array<double>"

    def run(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["_t", "_id"], kind="mergesort")
        events = list(zip(pdf["_mask"].astype(int), pdf["_t"].astype(float)))
        chain: tuple = ()
        for s in range(len(events)):
            end, got = _match_sequence(events, atoms, s, collect=True)
            if end >= 0:
                chain = got
                break
        return pd.DataFrame(
            {user_col: [pdf[user_col].iloc[0]], "event_times": [list(chain)]}
        )

    return ev.groupBy(user_col).applyInPandas(run, schema=schema)


def sequence_count(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
    id_col: str | None = None,
    engine: str = "auto",
) -> DataFrame:
    """ClickHouse `sequenceCount(pattern)(ts, cond...)`: number of
    NON-OVERLAPPING pattern occurrences per user (each search resumes
    after the previous match — `regexp_count` semantics on the symbol
    string, matching ClickHouse's). Time-constrained patterns route to
    the backtracking matcher like :func:`sequence_match`."""
    if engine == "pandas" or (engine == "auto" and _has_time_constraint(pattern)):
        return _sequence_pandas(
            df, user_col, ts_col, pattern, conds, id_col, count_mode=True
        )
    regex = ch_sequence_pattern_to_regex(pattern, len(conds))
    return _symbol_strings(df, user_col, ts_col, conds, id_col).select(
        F.col(user_col),
        F.regexp_count(F.col("_symbols"), F.lit(regex)).alias("n_matches"),
    )
