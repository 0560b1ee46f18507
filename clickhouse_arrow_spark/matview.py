"""ClickHouse materialized views: insert-triggered, per-block.

A CH materialized view is an INSERT TRIGGER, not a cached query: every
block inserted into the source table is run through the view's SELECT
and the result appended to the view's storage — historical data is only
included with POPULATE. Aggregating views therefore accumulate PARTIAL
aggregates (one row per group per inserted block) and are read back
through a folding engine: the canonical deployment is a
SummingMergeTree target queried with FINAL (ClickHouse docs,
materializedview.md). Both halves exist here — `propagate_insert`
appends per-block results, and `ddl.rewrite_final` folds them at read —
so the full CH pattern

    CREATE MATERIALIZED VIEW mv ... AS SELECT k, sum(v) GROUP BY k
    INSERT INTO src ...            -- mv gains one row per (block, k)
    SELECT * FROM mv FINAL         -- folded totals

round-trips exactly.

Scale: the trigger query runs over the INSERTED BLOCK only (a temp view
over the in-flight DataFrame), never rescanning the source — insert
cost is O(block), independent of table size, matching CH. The MV list
lives in the source table's TBLPROPERTIES: one catalog read per insert,
no registry scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from clickhouse_arrow_spark.errors import SchemaError

__all__ = [
    "create_materialized_view",
    "drop_materialized_view",
    "propagate_insert",
    "attached_views",
]

_MV_PREFIX = "clickhouse_arrow_spark.mv."


def _props(spark: SparkSession, table: str) -> dict[str, str]:
    from clickhouse_arrow_spark.ddl import _table_props

    return _table_props(spark, table)


def _set_prop(spark: SparkSession, table: str, key: str, value: str) -> None:
    value = value.replace("'", "''")
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ('{key}' = '{value}')")


def _block_ref_re(source_table: str) -> re.Pattern:
    # match the source table name (optionally db-qualified exactly as
    # registered) at word boundaries, outside quoted runs
    return re.compile(rf"(?i)(?<![\w.`]){re.escape(source_table)}(?![\w.`])")


def attached_views(spark: SparkSession, source_table: str) -> list[tuple[str, str]]:
    """[(target_table, select_sql)] for every MV attached to source."""
    out = []
    for k, v in _props(spark, source_table).items():
        if k.startswith(_MV_PREFIX):
            target = k[len(_MV_PREFIX):]
            out.append((target, v))
    return sorted(out)


def create_materialized_view(
    spark: SparkSession,
    database: str,
    name: str,
    source_table: str,
    select_sql: str,
    populate: bool = False,
) -> str:
    """CREATE MATERIALIZED VIEW `database.name` AS `select_sql`
    (which must read FROM `source_table`). The target table is created
    from the query's schema; `populate=True` backfills from the current
    source content (CH POPULATE — new inserts during backfill are the
    same race CH documents). Returns the target table name."""
    if not _block_ref_re(source_table).search(select_sql):
        raise SchemaError(
            f"materialized view query must reference its source table "
            f"{source_table!r} (CH attaches the trigger to exactly one table)"
        )
    target = f"{database}.{name}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    probe = spark.sql(select_sql).limit(0)
    spark.sql(f"DROP TABLE IF EXISTS {target}")
    try:
        probe.write.format("parquet").saveAsTable(target)
    except Exception as e:
        from clickhouse_arrow_spark.ddl import _drop_orphan_location

        if not _drop_orphan_location(spark, e):
            raise
        probe.write.format("parquet").saveAsTable(target)
    _set_prop(spark, target, "clickhouse_arrow_spark.mv_source", source_table)
    _set_prop(spark, target, "clickhouse_arrow_spark.mv_query", select_sql)
    _set_prop(spark, source_table, f"{_MV_PREFIX}{target}", select_sql)
    if populate:
        spark.sql(select_sql).write.mode("append").insertInto(target)
    return target


def attach_materialized_view(
    spark: SparkSession,
    target: str,
    source_table: str,
    select_sql: str,
    populate: bool = False,
) -> str:
    """The `CREATE MATERIALIZED VIEW ... TO target` form: the trigger
    writes into an EXISTING table (the caller owns its engine/layout)
    instead of an auto-created inner one. CH semantics: TO views cannot
    POPULATE (same refusal here)."""
    if populate:
        raise SchemaError(
            "CREATE MATERIALIZED VIEW ... TO does not support POPULATE "
            "(ClickHouse refuses the combination too); backfill with "
            "INSERT INTO target SELECT ..."
        )
    if not _block_ref_re(source_table).search(select_sql):
        raise SchemaError(
            f"materialized view query must reference its source table "
            f"{source_table!r}"
        )
    spark.table(target)  # must exist — loud if not
    _set_prop(spark, target, "clickhouse_arrow_spark.mv_source", source_table)
    _set_prop(spark, target, "clickhouse_arrow_spark.mv_query", select_sql)
    _set_prop(spark, source_table, f"{_MV_PREFIX}{target}", select_sql)
    return target


def drop_materialized_view(spark: SparkSession, target: str) -> None:
    props = _props(spark, target)
    source = props.get("clickhouse_arrow_spark.mv_source")
    if source is None:
        raise SchemaError(f"{target!r} is not a materialized view")
    spark.sql(f"ALTER TABLE {source} UNSET TBLPROPERTIES IF EXISTS "
              f"('{_MV_PREFIX}{target}')")
    spark.sql(f"DROP TABLE IF EXISTS {target}")


def propagate_insert(
    spark: SparkSession, source_table: str, block: DataFrame
) -> int:
    """Run every attached MV's query over the inserted block and append
    the results to the MV targets (the CH insert trigger). Returns the
    number of views updated."""
    views = attached_views(spark, source_table)
    if not views:
        return 0
    block_view = "__cas_mv_block"
    block.createOrReplaceTempView(block_view)
    try:
        for target, select_sql in views:
            block_sql = _block_ref_re(source_table).sub(block_view, select_sql)
            spark.sql(block_sql).write.mode("append").insertInto(target)
    finally:
        spark.catalog.dropTempView(block_view)
    return len(views)


def create_refreshable_view(
    spark: SparkSession,
    target: str,
    select_sql: str,
    schedule: str,
    empty: bool = False,
    to_existing: bool = False,
    append: bool = False,
) -> str:
    """CREATE MATERIALIZED VIEW ... REFRESH EVERY/AFTER <interval>
    (ClickHouse refreshable MVs): NOT insert-triggered — the query
    re-runs as a whole and REPLACES the target's contents. Unlike the
    trigger form, the SELECT may read any number of tables (that is
    the feature's point). There is no in-session scheduler: the
    recorded schedule is metadata for the orchestrator, and refreshes
    run on `SYSTEM REFRESH VIEW name` (CH's manual trigger; the
    initial refresh happens at creation unless EMPTY, like CH)."""
    if not to_existing:
        db = target.split(".")[0] if "." in target else "default"
        probe = spark.sql(select_sql).limit(0)
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        spark.sql(f"DROP TABLE IF EXISTS {target}")
        try:
            probe.write.format("parquet").saveAsTable(target)
        except Exception as e:
            from clickhouse_arrow_spark.ddl import _drop_orphan_location

            if not _drop_orphan_location(spark, e):
                raise
            probe.write.format("parquet").saveAsTable(target)
    _set_prop(spark, target, "clickhouse_arrow_spark.mv_query",
              select_sql)
    _set_prop(spark, target, "clickhouse_arrow_spark.mv_refresh",
              schedule)
    _set_prop(spark, target, "clickhouse_arrow_spark.mv_refresh_mode",
              "APPEND" if append else "REPLACE")
    if not empty:
        refresh_view(spark, target)
    return target


def refresh_view(spark: SparkSession, target: str) -> int:
    """SYSTEM REFRESH VIEW: re-run the recorded query and REPLACE the
    target's contents (stage-and-overwrite — the query may read the
    target's current content). Returns the new row count and stamps
    last_refresh_time for system.view_refreshes."""
    import time

    props = _props(spark, target)
    sql = props.get("clickhouse_arrow_spark.mv_query")
    if sql is None or "clickhouse_arrow_spark.mv_refresh" not in props:
        raise SchemaError(
            f"SYSTEM REFRESH VIEW: {target} is not a refreshable "
            "materialized view (create it with REFRESH EVERY/AFTER; "
            "insert-triggered MVs update on INSERT, nothing to refresh)"
        )
    from clickhouse_arrow_spark.ddl import _rewrite_rows

    df = spark.sql(sql)
    if props.get(
        "clickhouse_arrow_spark.mv_refresh_mode"
    ) == "APPEND":
        # REFRESH ... APPEND accumulates instead of replacing
        df.write.mode("append").insertInto(target)
    else:
        _rewrite_rows(spark, target, df)
    _set_prop(spark, target, "clickhouse_arrow_spark.mv_last_refresh",
              str(int(time.time())))
    return spark.table(target).count()
