"""ClickHouse SQL dialect -> Spark SQL translation.

The reference ships SQL text verbatim to a ClickHouse server
(ParsedQuery, clickhouse-arrow/src/query.rs:168-188), so a migrating
user's queries use ClickHouse function names. This module rewrites the
common ClickHouse function surface into Spark SQL so those queries run
on this engine unchanged: `Client.query_ch(sql)`.

The rewriter is a recursive function-call transformer (quote- and
paren-aware, reusing the same arg-splitting discipline as the type
parser), not a full SQL parser: it maps known function names, including
parametric syntax like `quantile(0.9)(x)`, and leaves everything else
— identifiers, keywords, unknown functions — untouched.
"""

from __future__ import annotations

import re
from typing import Callable

__all__ = ["translate_ch_sql"]

Args = list[str]

# name -> either a Spark name (str) or a formatter(args) -> str
_SIMPLE_RENAMES: dict[str, str] = {
    "countIf": "count_if",
    "uniq": "approx_count_distinct",
    "uniqState": "hll_sketch_agg",
    "uniqHLL12": "approx_count_distinct",
    "uniqCombined": "approx_count_distinct",
    "argMax": "max_by",
    "argMin": "min_by",
    "groupArray": "collect_list",
    "groupUniqArray": "collect_set",
    "any": "any_value",
    "anyLast": "any_value",
    "arrayJoin": "explode",
    "lcase": "lower",
    "ucase": "upper",
    "toDayOfMonth": "day",
    "toHour": "hour",
    "toMinute": "minute",
    "toSecond": "second",
    "toYear": "year",
    "toMonth": "month",
    "toQuarter": "quarter",
    "intDiv": "div",
    "modulo": "mod",
    "arrayConcat": "concat",
    "arrayDistinct": "array_distinct",
    "arraySort": "array_sort",
    "arrayReverse": "reverse",
    "has": "array_contains",
    "indexOf": "array_position",
    "arrayStringConcat": "array_join",
    "splitByChar": "split",  # caveat: CH arg order is (sep, s); formatter below
    "JSONExtractString": "get_json_object",  # path form differs; formatter below
    "toString": "string",
    "notEmpty": "notempty",  # placeholder, formatter below
}


#: ClickHouse hash functions with NO value-identical Spark equivalent.
#: Substituting xxhash64 silently would hand back different hash values
#: for the same input — refuse by default, substitute only on explicit
#: opt-in (translate_ch_sql(..., allow_hash_substitution=True)).
_ENGINE_HASHES = ("cityHash64", "sipHash64", "halfMD5", "farmHash64")


class UntranslatableFunctionError(ValueError):
    """A ClickHouse function whose silent translation would change
    query RESULTS (not just performance)."""


def _fmt_cast(spark_type: str) -> Callable[[Args], str]:
    return lambda a: f"CAST({a[0]} AS {spark_type})"


def _fmt(name: str):  # formatters for arg-reordering / expression forms
    if name == "toYYYYMM":
        return lambda a: f"CAST(year({a[0]}) * 100 + month({a[0]}) AS INT)"
    if name == "toYYYYMMDD":
        return (
            lambda a: f"CAST(year({a[0]}) * 10000 + month({a[0]}) * 100 + day({a[0]}) AS INT)"
        )
    if name == "toStartOfMonth":
        return lambda a: f"date_trunc('month', {a[0]})"
    if name == "toStartOfDay":
        return lambda a: f"date_trunc('day', {a[0]})"
    if name == "toStartOfHour":
        return lambda a: f"date_trunc('hour', {a[0]})"
    if name == "toStartOfQuarter":
        return lambda a: f"date_trunc('quarter', {a[0]})"
    if name == "toStartOfWeek":
        # CH default (mode 0) weeks start SUNDAY; Spark date_trunc('week')
        # starts Monday. weekday() is Mon=0..Sun=6, so days-since-Sunday
        # is (weekday(x)+1) % 7. Mode 1/3 (Monday weeks) maps to
        # date_trunc directly.
        def start_of_week(a: Args) -> str:
            mode = a[1].strip() if len(a) > 1 else "0"
            if mode in ("1", "3"):
                return f"CAST(date_trunc('week', {a[0]}) AS DATE)"
            return f"date_sub({a[0]}, (weekday({a[0]}) + 1) % 7)"

        return start_of_week
    if name == "toDayOfWeek":
        # CH is ISO: Mon=1..Sun=7. Spark dayofweek() is Sun=1..Sat=7 —
        # a straight rename shifts every value; weekday() (Mon=0) + 1
        # reproduces the CH numbering exactly.
        return lambda a: f"(weekday({a[0]}) + 1)"
    if name in _ENGINE_HASHES:
        def refuse(a: Args, _name: str = name) -> str:
            raise UntranslatableFunctionError(
                f"{_name}() has no Spark function that returns identical "
                "hash values; translating it silently would change query "
                "results. Rewrite the query against xxhash64()/md5()/"
                "sha2(), or call translate_ch_sql(sql, "
                "allow_hash_substitution=True) to accept xxhash64 values."
            )

        return refuse
    if name == "toDate":
        return _fmt_cast("DATE")
    if name == "toDateTime":
        return _fmt_cast("TIMESTAMP")
    if name in ("toInt8",):
        return _fmt_cast("TINYINT")
    if name in ("toInt16", "toUInt8"):
        return _fmt_cast("SMALLINT")
    if name in ("toInt32", "toUInt16"):
        return _fmt_cast("INT")
    if name in ("toInt64", "toUInt32"):
        return _fmt_cast("BIGINT")
    if name == "toUInt64":
        return _fmt_cast("DECIMAL(20, 0)")
    if name in ("toFloat32",):
        return _fmt_cast("FLOAT")
    if name in ("toFloat64",):
        return _fmt_cast("DOUBLE")
    if name == "sumIf":
        return lambda a: f"sum(CASE WHEN {a[1]} THEN {a[0]} ELSE 0 END)"
    if name == "avgIf":
        return lambda a: f"avg(CASE WHEN {a[1]} THEN {a[0]} END)"
    if name == "minIf":
        return lambda a: f"min(CASE WHEN {a[1]} THEN {a[0]} END)"
    if name == "maxIf":
        return lambda a: f"max(CASE WHEN {a[1]} THEN {a[0]} END)"
    if name == "uniqMerge":
        return lambda a: f"hll_sketch_estimate(hll_union_agg({a[0]}))"
    if name == "uniqExact":
        return lambda a: f"count(DISTINCT {', '.join(a)})"
    if name == "empty":
        return lambda a: f"(length({a[0]}) = 0)"
    if name == "notEmpty":
        return lambda a: f"(length({a[0]}) > 0)"
    if name == "multiIf":
        def multi_if(a: Args) -> str:
            whens = "".join(
                f" WHEN {c} THEN {v}" for c, v in zip(a[:-1:2], a[1:-1:2])
            )
            return f"CASE{whens} ELSE {a[-1]} END"

        return multi_if
    if name == "splitByChar":
        # CH: splitByChar(sep, s); Spark: split(s, regex-escaped sep)
        def split_by_char(a: Args) -> str:
            sep = a[0].strip()
            if sep.startswith("'") and sep.endswith("'"):
                lit = re.escape(sep[1:-1]).replace("\\", "\\\\").replace("'", "\\'")
                return f"split({a[1]}, '{lit}')"
            return f"split({a[1]}, {sep})"

        return split_by_char
    if name == "JSONExtractString":
        def json_extract(a: Args) -> str:
            path = a[1].strip()
            if path.startswith("'") and path.endswith("'"):
                return f"get_json_object({a[0]}, '$.{path[1:-1]}')"
            return f"get_json_object({a[0]}, {path})"

        return json_extract
    if name == "JSONExtractInt":
        def json_extract_i(a: Args) -> str:
            path = a[1].strip()
            inner = (
                f"get_json_object({a[0]}, '$.{path[1:-1]}')"
                if path.startswith("'")
                else f"get_json_object({a[0]}, {path})"
            )
            return f"CAST({inner} AS BIGINT)"

        return json_extract_i
    if name == "formatDateTime":
        # CH strftime-style specifiers -> Spark SimpleDateFormat pattern
        def format_datetime(a: Args) -> str:
            fmt = a[1].strip()
            if fmt.startswith("'") and fmt.endswith("'"):
                spec = {
                    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
                    "%H": "HH", "%M": "mm", "%S": "ss", "%s": "ss",
                    "%F": "yyyy-MM-dd", "%T": "HH:mm:ss", "%j": "DDD",
                    "%e": "d", "%G": "YYYY", "%V": "ww", "%%": "%",
                }
                out_fmt = fmt[1:-1]
                for k, v in spec.items():
                    out_fmt = out_fmt.replace(k, v)
                return f"date_format({a[0]}, '{out_fmt}')"
            return f"date_format({a[0]}, {fmt})"

        return format_datetime
    if name == "toStartOfInterval":
        # toStartOfInterval(ts, INTERVAL n unit) -> epoch-floor bucketing
        # (the scalar time_bucket; sub-day units only — day+ units go
        # through the toStartOf* family)
        def start_of_interval(a: Args) -> str:
            m = re.match(
                r"(?i)INTERVAL\s+(\d+)\s+(second|minute|hour)s?\s*$",
                a[1].strip(),
            )
            if not m:
                return f"toStartOfInterval({', '.join(a)})"  # untranslated
            n = int(m.group(1))
            secs = n * {"second": 1, "minute": 60, "hour": 3600}[
                m.group(2).lower()
            ]
            return (
                f"timestamp_seconds(CAST(floor(unix_timestamp({a[0]}) "
                f"/ {secs}) AS BIGINT) * {secs})"
            )

        return start_of_interval
    if name == "today":
        return lambda a: "current_date()"
    if name == "now":
        return lambda a: "current_timestamp()"
    if name == "toStartOfYear":
        return lambda a: f"CAST(date_trunc('year', {a[0]}) AS DATE)"
    if name == "toMonday":
        # Spark date_trunc('week') is Monday-start == CH toMonday
        return lambda a: f"CAST(date_trunc('week', {a[0]}) AS DATE)"
    if name == "toDayOfYear":
        return lambda a: f"dayofyear({a[0]})"
    if name == "toUnixTimestamp":
        return lambda a: f"unix_timestamp({a[0]})"
    if name == "fromUnixTimestamp":
        return lambda a: f"timestamp_seconds({a[0]})"
    # add/subtract date arithmetic keeps the timestamp type (CH addDays
    # on DateTime stays DateTime; Spark date_add degrades to DATE, so
    # timestampadd is the faithful mapping)
    _ADD_UNITS = {
        "addYears": "YEAR", "addMonths": "MONTH", "addWeeks": "WEEK",
        "addDays": "DAY", "addHours": "HOUR", "addMinutes": "MINUTE",
        "addSeconds": "SECOND",
    }
    _SUB_UNITS = {
        "subtractYears": "YEAR", "subtractMonths": "MONTH",
        "subtractWeeks": "WEEK", "subtractDays": "DAY",
        "subtractHours": "HOUR", "subtractMinutes": "MINUTE",
        "subtractSeconds": "SECOND",
    }
    if name in _ADD_UNITS:
        unit = _ADD_UNITS[name]
        return lambda a: f"timestampadd({unit}, {a[1]}, {a[0]})"
    if name in _SUB_UNITS:
        unit = _SUB_UNITS[name]
        return lambda a: f"timestampadd({unit}, -({a[1]}), {a[0]})"
    if name == "dateDiff":
        def date_diff(a: Args) -> str:
            unit = a[0].strip().strip("'").upper()
            return f"timestampdiff({unit}, {a[1]}, {a[2]})"

        return date_diff
    if name == "arrayElement":
        return lambda a: f"element_at({a[0]}, {a[1]})"
    if name in ("position", "positionCaseInsensitive"):
        # CH position(haystack, needle); Spark locate(needle, haystack)
        # — a silent wrong-answer trap if renamed without the swap
        def position_fmt(a: Args, _ci: bool = name.endswith("Insensitive")) -> str:
            h, n = a[0], a[1]
            if _ci:
                return f"locate(lower({n}), lower({h}))"
            return f"locate({n}, {h})"

        return position_fmt
    if name == "leftPad":
        return lambda a: f"lpad({', '.join(a)})"
    if name == "rightPad":
        return lambda a: f"rpad({', '.join(a)})"
    # higher-order array functions: CH puts the lambda FIRST
    # (arrayMap(x -> x*2, arr)); Spark puts the collection first.
    if name == "arrayMap":
        def array_map(a: Args) -> str:
            if len(a) == 2:
                return f"transform({a[1]}, {a[0]})"
            if len(a) == 3:  # two-array form -> zip_with
                return f"zip_with({a[1]}, {a[2]}, {a[0]})"
            return f"arrayMap({', '.join(a)})"

        return array_map
    if name == "arrayFilter":
        return lambda a: f"filter({a[1]}, {a[0]})"
    if name == "arrayExists":
        return lambda a: f"exists({a[1]}, {a[0]})"
    if name == "arrayAll":
        return lambda a: f"forall({a[1]}, {a[0]})"
    if name == "arrayCount":
        def array_count(a: Args) -> str:
            if len(a) == 2:
                return f"CAST(size(filter({a[1]}, {a[0]})) AS BIGINT)"
            return f"arrayCount({', '.join(a)})"

        return array_count
    if name == "arrayFlatten":
        return lambda a: f"flatten({a[0]})"
    if name == "arrayZip":
        return lambda a: f"arrays_zip({', '.join(a)})"
    if name == "arrayEnumerate":
        return lambda a: f"sequence(1, size({a[0]}))"
    if name == "arrayUniq":
        return lambda a: f"CAST(size(array_distinct({a[0]})) AS BIGINT)"
    if name == "arraySum":
        # double accumulator (CH widens integer sums; callers needing
        # exact integer sums should aggregate after explode instead)
        return lambda a: (
            f"aggregate({a[0]}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    if name == "arrayAvg":
        return lambda a: (
            f"(aggregate({a[0]}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            f" / size({a[0]}))"
        )
    if name == "arraySlice":
        def array_slice(a: Args) -> str:
            if len(a) == 3:
                return f"slice({a[0]}, {a[1]}, {a[2]})"
            return f"arraySlice({', '.join(a)})"  # open-ended form: keep

        return array_slice
    if name in _SIMPLE_RENAMES and name not in ("splitByChar", "JSONExtractString", "notEmpty"):
        new = _SIMPLE_RENAMES[name]
        return lambda a: f"{new}({', '.join(a)})"
    return None


#: parametric aggregates: name(params)(args) -> formatter(params, args)
_PARAMETRIC: dict[str, Callable[[Args, Args], str]] = {
    "quantile": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantileExact": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantileTDigest": lambda p, a: f"approx_percentile({a[0]}, {p[0]})",
    "quantiles": lambda p, a: f"percentile({a[0]}, array({', '.join(p)}))",
}

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _find_matching_paren(s: str, open_idx: int) -> int:
    depth = 0
    in_str = False
    i = open_idx
    while i < len(s):
        c = s[i]
        if in_str:
            if c == "\\":
                i += 1
            elif c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _split_top_args(s: str) -> Args:
    args: Args = []
    depth = 0
    in_str = False
    cur: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if in_str:
            cur.append(c)
            if c == "\\" and i + 1 < len(s):
                cur.append(s[i + 1])
                i += 1
            elif c == "'":
                in_str = False
        elif c == "'":
            in_str = True
            cur.append(c)
        elif c in "([":
            depth += 1
            cur.append(c)
        elif c in ")]":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        args.append(tail)
    return args


def translate_ch_sql(sql: str, allow_hash_substitution: bool = False) -> str:
    """Rewrite known ClickHouse function calls in `sql` to Spark SQL.

    Raises :class:`UntranslatableFunctionError` on engine-specific hash
    functions (cityHash64/sipHash64/halfMD5/farmHash64) unless
    `allow_hash_substitution=True`, which substitutes xxhash64 with a
    warning — the VALUES differ from ClickHouse's.
    """
    out: list[str] = []
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # skip string literals verbatim
            j = i + 1
            while j < n:
                if sql[j] == "\\":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        m = _NAME_RE.match(sql, i)
        if not m:
            out.append(c)
            i += 1
            continue
        name = m.group(0)
        j = m.end()
        # function call?
        if j < n and sql[j] == "(":
            close = _find_matching_paren(sql, j)
            if close == -1:
                out.append(sql[i:])
                break
            inner = translate_ch_sql(sql[j + 1 : close], allow_hash_substitution)
            args = _split_top_args(inner)
            # parametric form: name(params)(args)
            k = close + 1
            if name in _PARAMETRIC and k < n and sql[k] == "(":
                close2 = _find_matching_paren(sql, k)
                if close2 != -1:
                    inner2 = translate_ch_sql(
                        sql[k + 1 : close2], allow_hash_substitution
                    )
                    out.append(_PARAMETRIC[name](args, _split_top_args(inner2)))
                    i = close2 + 1
                    continue
            if name in _ENGINE_HASHES and allow_hash_substitution:
                import warnings

                warnings.warn(
                    f"substituting xxhash64 for {name}: values differ "
                    "from ClickHouse's",
                    stacklevel=2,
                )
                out.append(f"xxhash64({', '.join(args)})")
                i = close + 1
                continue
            fmt = _fmt(name)
            # keyword guard: `ANY (SELECT ...)` / `any(SELECT ...)` is the
            # quantified-comparison keyword, not the aggregate — leave it.
            if name.lower() in ("any", "all", "some") and args and args[
                0
            ].lstrip().upper().startswith("SELECT"):
                fmt = None
            if fmt is not None:
                out.append(fmt(args))
            else:
                out.append(f"{name}({', '.join(args)})")
            i = close + 1
        else:
            out.append(name)
            i = j
    return "".join(out)
