"""Parameterized-query support: ClickHouse `{name:Type}` placeholders.

The reference encodes query parameters as escaped strings sent with the
query (clickhouse-arrow/src/query.rs:101-166; test corpus
clickhouse-arrow/tests/tests/params.rs). Spark's parameterized SQL
(`spark.sql(q, args=...)`) uses `:name` markers and cannot bind
identifiers, so this module:

1. parses `{name:Type}` placeholders (quote- and nesting-aware),
2. substitutes `Identifier` params as validated, backtick-quoted names,
3. renders value params as safe, explicitly-typed SQL literals guided by
   the declared ClickHouse type (the same format-by-type approach the
   reference takes — values travel as text, typed by the placeholder).

Literal rendering rather than `args=` keeps one code path that supports
every CH type (arrays, tuples, maps, dates) uniformly.
"""

from __future__ import annotations

import datetime as _dt
import re
from decimal import Decimal
from typing import Any

from clickhouse_arrow_spark.errors import QueryError
from clickhouse_arrow_spark.types import ChType, parse_ch_type

_PLACEHOLDER = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*):([^{}]+)\}")
_IDENT_OK = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _escape_str(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def render_literal(value: Any, ch_type: ChType | str | None = None) -> str:
    """Render a Python value as a Spark SQL literal, optionally guided by
    a declared ClickHouse type (for casts where precision matters)."""
    if isinstance(ch_type, str):
        ch_type = parse_ch_type(ch_type)
    name = ch_type.strip_null()[0].name if ch_type is not None else None

    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, Decimal):
        return f"CAST('{value}' AS DECIMAL(38, {max(0, -value.as_tuple().exponent)}))"
    if isinstance(value, _dt.datetime):
        return f"TIMESTAMP '{value.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(value, _dt.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, (list, tuple)):
        inner_t = None
        if ch_type is not None and ch_type.strip_null()[0].name == "Array":
            inner_t = ch_type.strip_null()[0].args[0]
        items = ", ".join(render_literal(v, inner_t) for v in value)
        return f"array({items})"
    if isinstance(value, dict):
        kv = []
        for k, v in value.items():
            kv.append(f"{render_literal(k)}, {render_literal(v)}")
        return f"map({', '.join(kv)})"
    if isinstance(value, bytes):
        return f"X'{value.hex()}'"
    if isinstance(value, str):
        lit = f"'{_escape_str(value)}'"
        if name == "Date":
            return f"DATE {lit}"
        if name in ("DateTime", "DateTime64"):
            return f"TIMESTAMP {lit}"
        if name == "UUID":
            return lit
        return lit
    raise QueryError(f"cannot render query parameter of type {type(value)!r}")


def bind_params(query: str, params: dict[str, Any] | None) -> str:
    """Substitute every `{name:Type}` placeholder in `query`.

    Identifier params are validated against an identifier charset and
    backtick-quoted (the reference treats `{t:Identifier}` as a name
    splice, params.rs:250+); all other types render as typed literals.
    Missing or unused params raise, matching the reference's strictness.
    """
    params = dict(params or {})
    used: set[str] = set()

    def _sub(m: re.Match) -> str:
        pname, ptype = m.group(1), m.group(2).strip()
        if pname not in params:
            raise QueryError(f"missing query parameter {pname!r}")
        used.add(pname)
        value = params[pname]
        if ptype == "Identifier":
            if not isinstance(value, str) or not _IDENT_OK.match(value):
                raise QueryError(f"invalid identifier parameter {pname!r}: {value!r}")
            return ".".join(f"`{part}`" for part in value.split("."))
        return render_literal(value, ptype)

    bound = _PLACEHOLDER.sub(_sub, query)
    unused = set(params) - used
    if unused:
        raise QueryError(f"unused query parameters: {sorted(unused)}")
    return bound
