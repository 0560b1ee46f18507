"""ClickHouse settings -> Spark conf shim.

The reference encodes per-query ClickHouse settings on the wire
(clickhouse-arrow/src/settings.rs:1-1473, string encoding at :503-530).
Spark's analogue is session/query confs. This module maps the
commonly-used ClickHouse setting names onto meaningful Spark confs and
passes unknown names through under a namespaced prefix so they remain
introspectable (the reference likewise sends arbitrary key/values and
lets the server judge them).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any

from pyspark.sql import SparkSession

#: ClickHouse setting -> (spark conf, value transform)
_CH_TO_SPARK: dict[str, tuple[str, Any]] = {
    # parallelism class
    "max_threads": ("spark.sql.shuffle.partitions", lambda v: str(int(v))),
    "max_insert_threads": ("spark.sql.shuffle.partitions", lambda v: str(int(v))),
    # memory / spill class
    "max_bytes_before_external_group_by": (
        "spark.sql.shuffle.spill.initialMemoryThreshold",
        str,
    ),
    # result shaping
    "max_result_rows": ("spark.sql.maxRecordsPerBatch.resultCap", lambda v: str(int(v))),
    "max_block_size": (
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        lambda v: str(int(v)),
    ),
    # NOTE: max_execution_time deliberately NOT mapped — Spark has no
    # per-query wall-clock timeout conf, and mapping it onto
    # spark.sql.broadcastTimeout (as an earlier revision did) silently
    # changed an unrelated knob. It passes through under the namespaced
    # prefix so callers can introspect it and enforce client-side
    # (Client.cancel(qid) is the enforcement primitive).
    # join behavior
    "join_algorithm": ("spark.sql.join.preferSortMergeJoin",
                       lambda v: "true" if "merge" in str(v) else "false"),
    # compression parity
    "network_compression_method": (
        "spark.sql.parquet.compression.codec",
        lambda v: {"lz4": "lz4", "zstd": "zstd", "none": "uncompressed"}.get(
            str(v).lower(), "zstd"
        ),
    ),
}

_PASSTHROUGH_PREFIX = "spark.clickhouse_arrow_spark.setting."


def translate_setting(name: str, value: Any) -> tuple[str, str]:
    """Translate one ClickHouse setting into a (spark_conf, value) pair."""
    if name in _CH_TO_SPARK:
        conf, fn = _CH_TO_SPARK[name]
        return conf, fn(value)
    return f"{_PASSTHROUGH_PREFIX}{name}", str(value)


def apply_settings(spark: SparkSession, settings: dict[str, Any] | None) -> dict[str, str | None]:
    """Apply settings, returning the previous values for restoration."""
    if not settings:
        return {}
    prev: dict[str, str | None] = {}
    for name, value in settings.items():
        conf, v = translate_setting(name, value)
        try:
            prev[conf] = spark.conf.get(conf)
        except Exception:
            prev[conf] = None
        spark.conf.set(conf, v)
    return prev


def restore_settings(spark: SparkSession, prev: dict[str, str | None]) -> None:
    for conf, v in prev.items():
        if v is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, v)


@contextmanager
def settings_scope(spark: SparkSession, settings: dict[str, Any] | None):
    """Per-query settings scope — the Spark analogue of sending settings
    with a single query (reference: Operation::Query settings field,
    clickhouse-arrow/src/client/internal.rs:422-471)."""
    prev = apply_settings(spark, settings)
    try:
        yield
    finally:
        restore_settings(spark, prev)
