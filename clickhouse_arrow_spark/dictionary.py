"""ClickHouse external-dictionary analogue.

ClickHouse dictionaries are server-side key→attributes lookup tables
queried with `dictGet('dict', 'attr', key)` & co. (the reference's
users lean on them for dimension enrichment; the client ships the SQL
verbatim — SURVEY §2.3). Here a dictionary is a catalog table whose
TBLPROPERTIES carry the key column, and every `dictGet*` call rewrites
to a CORRELATED SCALAR SUBQUERY — which Catalyst decorrelates into a
left outer join and, the dictionary being dimension-sized, plans as a
BROADCAST hash join: the idiomatic Spark execution of a dictionary
lookup, with zero per-row Python.

Missing-key semantics follow ClickHouse exactly:

- `dictGet` returns the ATTRIBUTE TYPE'S DEFAULT (0 / '' / zero-date),
  not NULL — the rewrite wraps the subquery in `coalesce(..., default)`
  derived from the attribute's cataloged type;
- `dictGetOrDefault` coalesces with the caller's expression;
- `dictGetOrNull` leaves the bare subquery (NULL on miss);
- `dictHas` rewrites to a correlated `count(*) > 0`.

Scale: at 100 TB the fact side never shuffles for a lookup — the
decorrelated join broadcasts the dictionary, same as the reference
deployments where dictionaries are RAM-resident on every server.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from clickhouse_arrow_spark.errors import SchemaError

__all__ = ["create_dictionary", "rewrite_dict_calls"]

_DICT_CALL_RE = re.compile(r"\bdict(Get|GetOrDefault|GetOrNull|Has)\s*\(")

#: dictGetString/dictGetInt64/... typed variants — CH casts the stored
#: attribute; the catalog table already has the concrete type, so the
#: typed name only adds an explicit CAST.
_TYPED_GET_RE = re.compile(
    r"\bdictGet(String|U?Int(?:8|16|32|64)|Float(?:32|64)|Date(?:Time)?)\s*\("
)

_TYPE_CAST = {
    "String": "STRING", "Int8": "TINYINT", "Int16": "SMALLINT",
    "Int32": "INT", "Int64": "BIGINT", "UInt8": "SMALLINT",
    "UInt16": "INT", "UInt32": "BIGINT", "UInt64": "BIGINT",
    "Float32": "FLOAT", "Float64": "DOUBLE", "Date": "DATE",
    "DateTime": "TIMESTAMP",
}


def create_dictionary(
    spark: SparkSession,
    database: str,
    name: str,
    source: DataFrame,
    key: str,
) -> None:
    """Materialize `source` as dictionary `database.name` keyed on
    `key` (CREATE DICTIONARY analogue; layout is Spark's concern — the
    broadcast join IS the hashed layout). Re-creating replaces the
    content, like a dictionary reload."""
    if key not in source.columns:
        raise SchemaError(f"dictionary key column {key!r} not in source")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    full = f"{database}.{name}"
    spark.sql(f"DROP TABLE IF EXISTS {full}")
    try:
        source.write.mode("overwrite").format("parquet").saveAsTable(full)
    except Exception as e:
        from clickhouse_arrow_spark.ddl import _drop_orphan_location

        if not _drop_orphan_location(spark, e):
            raise
        source.write.mode("overwrite").format("parquet").saveAsTable(full)
    spark.sql(
        f"ALTER TABLE {full} SET TBLPROPERTIES ("
        f"'clickhouse_arrow_spark.dictionary' = 'true', "
        f"'clickhouse_arrow_spark.dict_key' = '{key}')"
    )


def _dict_meta(spark: SparkSession, dict_ref: str) -> tuple[str, dict[str, str]]:
    from clickhouse_arrow_spark.ddl import _table_props

    try:
        props = _table_props(spark, dict_ref)
        schema = {f.name: f.dataType.simpleString() for f in spark.table(dict_ref).schema.fields}
    except Exception:
        raise SchemaError(
            f"dictGet: dictionary {dict_ref!r} not found in the catalog "
            "(create it with dictionary.create_dictionary)"
        ) from None
    if props.get("clickhouse_arrow_spark.dictionary") != "true":
        raise SchemaError(
            f"dictGet: table {dict_ref!r} is not a dictionary "
            "(create it with dictionary.create_dictionary)"
        )
    return props["clickhouse_arrow_spark.dict_key"], schema


def _type_default(spark_type: str) -> str:
    """ClickHouse's missing-key default for the attribute's type."""
    t = spark_type.lower()
    if t in ("string", "varchar", "char"):
        return "''"
    if t == "date":
        return "DATE '1970-01-01'"
    if t.startswith("timestamp"):
        return "TIMESTAMP '1970-01-01 00:00:00'"
    if t.startswith("decimal"):
        return f"CAST(0 AS {spark_type.upper()})"
    if t in ("float", "double"):
        return f"CAST(0 AS {t.upper()})"
    if t == "boolean":
        return "false"
    return f"CAST(0 AS {spark_type.upper()})"


def _strip_quotes(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] == "'":
        return s[1:-1]
    return s


def rewrite_dict_calls(spark: SparkSession, sql: str) -> str:
    """Rewrite every dictGet/dictGetOrDefault/dictGetOrNull/dictHas
    (and typed dictGetString/dictGetInt64/... variants) into correlated
    scalar subqueries against the cataloged dictionary table. Runs
    before the textual CH→Spark translation (it needs the catalog);
    calls inside string literals are untouched."""
    from clickhouse_arrow_spark.dialect import (
        _find_clean,
        _find_matching_paren,
        _split_top_args,
    )

    while True:
        m = _find_clean(_TYPED_GET_RE, sql, depth0=False)
        cast_to = None
        if m:
            cast_to = _TYPE_CAST[m.group(1)]
            kind = "Get"
        else:
            m = _find_clean(_DICT_CALL_RE, sql, depth0=False)
            if not m:
                return sql
            kind = m.group(1)
        open_idx = m.end() - 1
        close_idx = _find_matching_paren(sql, open_idx)
        if close_idx < 0:
            raise SchemaError(f"dict{kind}: unbalanced parentheses in {sql[m.start():][:80]!r}")
        args = _split_top_args(sql[open_idx + 1 : close_idx])
        dict_ref = _strip_quotes(args[0])
        key_col, schema = _dict_meta(spark, dict_ref)
        kq = f"`{key_col}`"
        if kind == "Has":
            if len(args) != 2:
                raise SchemaError("dictHas takes (dict, key)")
            sub = (
                f"((SELECT count(*) FROM {dict_ref} "
                f"WHERE {kq} = ({args[1]})) > 0)"
            )
        else:
            if kind == "GetOrDefault" and len(args) != 4:
                raise SchemaError("dictGetOrDefault takes (dict, attr, key, default)")
            if kind in ("Get", "GetOrNull") and len(args) != 3:
                raise SchemaError(f"dict{kind} takes (dict, attr, key)")
            attr = _strip_quotes(args[1])
            if attr not in schema:
                raise SchemaError(
                    f"dictGet: attribute {attr!r} not in dictionary {dict_ref!r} "
                    f"(has: {sorted(schema)})"
                )
            lookup = (
                f"(SELECT `{attr}` FROM {dict_ref} WHERE {kq} = ({args[2]}))"
            )
            if cast_to:
                lookup = f"CAST({lookup} AS {cast_to})"
            if kind == "Get":
                default = _type_default(schema[attr])
                sub = f"coalesce({lookup}, {default})"
            elif kind == "GetOrDefault":
                sub = f"coalesce({lookup}, ({args[3]}))"
            else:  # GetOrNull
                sub = lookup
        sql = sql[: m.start()] + sub + sql[close_idx + 1 :]


_JOIN_GET_RE = re.compile(r"\bjoinGet(OrNull)?\s*\(")


def rewrite_join_get(spark: SparkSession, sql: str) -> str:
    """`joinGet('db.t', 'attr', key...)` over a Join-engine table ->
    correlated scalar subquery, exactly the dictGet decorrelation:
    Spark plans the lookup as a broadcast join against the (small,
    RAM-resident in CH) Join table, so the fact side never shuffles.
    joinGet returns the attribute type's DEFAULT on a miss (CH ANY-join
    semantics), joinGetOrNull returns NULL."""
    from clickhouse_arrow_spark.dialect import (
        _find_clean,
        _find_matching_paren,
        _split_top_args,
    )
    from clickhouse_arrow_spark.ddl import _table_props

    while True:
        m = _find_clean(_JOIN_GET_RE, sql, depth0=False)
        if not m:
            return sql
        or_null = bool(m.group(1))
        open_idx = m.end() - 1
        close_idx = _find_matching_paren(sql, open_idx)
        if close_idx < 0:
            raise SchemaError(
                f"joinGet: unbalanced parentheses in {sql[m.start():][:80]!r}"
            )
        args = _split_top_args(sql[open_idx + 1 : close_idx])
        if len(args) < 3:
            raise SchemaError("joinGet takes (table, attr, key...)")
        ref = _strip_quotes(args[0])
        attr = _strip_quotes(args[1])
        keys = _table_props(spark, ref).get(
            "clickhouse_arrow_spark.setting.join_key", ""
        )
        if not keys:
            raise SchemaError(
                f"joinGet: {ref!r} is not a Join-engine table "
                "(no join_key recorded at CREATE)"
            )
        key_cols = keys.split("|")
        key_exprs = args[2:]
        if len(key_exprs) != len(key_cols):
            raise SchemaError(
                f"joinGet: {ref!r} declares {len(key_cols)} key column(s) "
                f"({', '.join(key_cols)}), got {len(key_exprs)} key arg(s)"
            )
        schema = {
            f.name: f.dataType.simpleString()
            for f in spark.table(ref).schema.fields
        }
        if attr not in schema:
            raise SchemaError(
                f"joinGet: attribute {attr!r} not in {ref!r} "
                f"(has: {sorted(schema)})"
            )
        cond = " AND ".join(
            f"`{c}` = ({e})" for c, e in zip(key_cols, key_exprs)
        )
        # any_value enforces ANY strictness even if duplicate keys
        # slipped in (e.g. a table created before the insert-side
        # dedupe): CH joinGet never errors on key multiplicity, so the
        # scalar subquery must not either
        lookup = f"(SELECT any_value(`{attr}`) FROM {ref} WHERE {cond})"
        if or_null:
            sub = lookup
        else:
            sub = f"coalesce({lookup}, {_type_default(schema[attr])})"
        sql = sql[: m.start()] + sub + sql[close_idx + 1 :]
