"""Structured Streaming tests: batch-equivalence oracles.

Each streaming aggregation runs to completion with Trigger.AvailableNow
over the static events parquet and must agree with its batch twin —
the standard correctness harness for Structured Streaming operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_arrow_spark.streaming import (
    read_events_stream,
    run_to_memory_sink,
    session_window_agg,
    stateful_running_counts,
    tumbling_window_agg,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream(spark, tables):
    return read_events_stream(spark, SF_DIR)


def test_stream_is_streaming(events_stream):
    assert events_stream.isStreaming


def test_tumbling_window_matches_batch(spark, events_stream, tables):
    got = run_to_memory_sink(
        tumbling_window_agg(events_stream), "t_tumbling", output_mode="append"
    )
    # Append mode only emits CLOSED windows: those whose end precedes
    # (max event time - watermark). Windows still open when the stream
    # drains are correctly withheld — mirror that in the batch oracle.
    max_ts = spark.table("events").agg(F.max("ts")).first()[0]
    expect = (
        spark.table("events")
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .where(
            F.col("window_start") + F.expr("INTERVAL 1 HOUR")
            <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
        )
    )
    diff = got.exceptAll(expect).count() + expect.exceptAll(got).count()
    assert diff == 0, f"stream/batch divergence: {diff} rows"


def test_session_window_matches_batch_session_count(spark, events_stream, tables):
    got = run_to_memory_sink(
        session_window_agg(events_stream), "t_sessions", output_mode="append"
    )
    # Batch oracle: lag/cumsum sessionization, restricted to CLOSED
    # sessions (append mode withholds sessions still inside the
    # watermark: session end = last event + gap must precede
    # max event time - watermark).
    from pyspark.sql import Window as W

    max_ts = spark.table("events").agg(F.max("ts")).first()[0]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = W.partitionBy("user_id").orderBy("ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    sessions = (
        spark.table("events")
        .withColumn(
            "new_session",
            F.when(gap > 1800, 1).when(F.lag("ts").over(w).isNull(), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(wsum))
        .groupBy("user_id", "session_id")
        .agg((F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"))
        .where(F.col("session_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))
        .groupBy("user_id")
        .agg(F.count("*").alias("expect"))
    )
    got_counts = got.groupBy("user_id").agg(F.count("*").alias("n_sessions"))
    joined = got_counts.join(sessions, "user_id", "full_outer")
    bad = joined.where(
        F.coalesce("n_sessions", F.lit(0)) != F.coalesce("expect", F.lit(0))
    ).count()
    assert bad == 0


def test_stateful_running_counts_final_totals(spark, events_stream, tables):
    got = run_to_memory_sink(
        stateful_running_counts(events_stream), "t_state", output_mode="update"
    )
    # final state per user (last update) == total events per user
    final = (
        got.groupBy("user_id").agg(F.max("events_so_far").alias("events_so_far"))
    )
    expect = spark.table("events").groupBy("user_id").agg(F.count("*").alias("n"))
    joined = final.join(expect, "user_id")
    bad = joined.where(F.col("events_so_far") != F.col("n")).count()
    assert bad == 0
    assert final.count() == expect.count()


def test_streaming_dedup_drops_replays(spark, tables):
    """streaming_dedup keeps one row per event_id even when the stream
    replays rows (batch-equivalence: distinct event_id count)."""
    import uuid

    from clickhouse_arrow_spark.streaming import (
        read_events_stream,
        run_to_memory_sink,
        streaming_dedup,
    )
    from tests.conftest import SF_DIR

    stream = read_events_stream(spark, SF_DIR)
    # simulate replays: duplicate every row, then dedup by event_id
    replayed = stream.unionByName(stream)
    deduped = streaming_dedup(replayed, keys=["event_id"])
    name = f"t_stream_dedup_{uuid.uuid4().hex[:8]}"
    out = run_to_memory_sink(deduped, name, output_mode="append")
    n_expected = spark.table("events").select("event_id").distinct().count()
    assert out.count() == n_expected
    assert out.select("event_id").distinct().count() == n_expected


def test_hopping_window_matches_batch(spark, events_stream, tables):
    """Streaming hopping windows (1h / 15min slide) under a watermark:
    closed windows must match the batch sliding_window_events answer
    restricted to the watermark cutoff."""
    import uuid

    from clickhouse_arrow_spark.streaming import run_to_memory_sink

    agg = (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
    name = f"t_hops_{uuid.uuid4().hex[:8]}"
    got = run_to_memory_sink(agg, name, output_mode="append")
    max_ts = spark.table("events").agg(F.max("ts")).first()[0]
    batch = (
        spark.table("events")
        .groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
        .where(F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_stream_stream_join_matches_batch(spark, events_stream, tables, tmp_path):
    from clickhouse_arrow_spark.streaming import (
        run_to_parquet_sink,
        stream_stream_purchase_attribution,
    )

    joined = stream_stream_purchase_attribution(events_stream, events_stream)
    assert joined.isStreaming
    out = str(tmp_path / "attributed")
    ckpt = str(tmp_path / "ckpt")
    run_to_parquet_sink(joined, out, ckpt)
    got = spark.read.option("basePath", out).parquet(out).drop("batch_id")

    ev = spark.table("events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    expect = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "amount",
    )
    # inner interval join emits matches eagerly — an availableNow drain
    # over a static source must produce the exact batch answer
    assert got.count() == expect.count()
    diff = got.exceptAll(expect).count() + expect.exceptAll(got).count()
    assert diff == 0, f"stream/batch divergence: {diff} rows"


def test_foreach_batch_sink_is_idempotent_per_batch(spark, tables, tmp_path):
    from clickhouse_arrow_spark.streaming import (
        read_events_stream,
        run_to_parquet_sink,
    )

    # two files per trigger over one file -> a single batch directory;
    # re-running with a FRESH checkpoint overwrites the same batch path
    # instead of appending duplicates
    stream = read_events_stream(spark, SF_DIR).where(
        F.col("event_type") == "signup"
    )
    out = str(tmp_path / "sink")
    run_to_parquet_sink(stream, out, str(tmp_path / "ck1"))
    n1 = spark.read.option("basePath", out).parquet(out).count()
    run_to_parquet_sink(stream, out, str(tmp_path / "ck2"))
    n2 = spark.read.option("basePath", out).parquet(out).count()
    n_batch = spark.table("events").where(F.col("event_type") == "signup").count()
    assert n1 == n_batch
    assert n2 == n_batch  # replay overwrote, not duplicated


def test_stream_static_enrich_matches_batch(spark, events_stream, tables):
    from clickhouse_arrow_spark.streaming.events import stream_static_enrich

    # static dim: per-customer order count from the batch orders table
    dim = (
        spark.table("orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count("*").alias("n_orders"))
    )
    got = run_to_memory_sink(
        stream_static_enrich(events_stream, dim, ["user_id"]),
        "t_enriched",
        output_mode="append",
    )
    expect = spark.table("events").join(dim, ["user_id"], "left")
    # stateless stream-static join: every event passes through exactly
    # once with its dimension row attached — counts and null-rate match
    assert got.count() == expect.count()
    assert (
        got.where(F.col("n_orders").isNull()).count()
        == expect.where(F.col("n_orders").isNull()).count()
    )
    s1 = got.agg(F.sum("n_orders")).first()[0]
    s2 = expect.agg(F.sum("n_orders")).first()[0]
    assert s1 == s2


def test_stateful_sessions_event_time_timeout(spark, tmp_path):
    """stateful_sessions closes sessions two ways: a later event past the
    gap (in-batch), and the WATERMARK passing last+gap (event-time
    timeout) — state must be removed either way."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_arrow_spark.streaming.events import (
        run_to_memory_sink,
        stateful_sessions,
    )

    src = tmp_path / "sess_src"
    src.mkdir()
    t0 = 1_700_000_000_000_000  # µs epoch
    MIN = 60_000_000

    def write(name, rows):
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, str(src / name))

    # batch 1: u1 has two sessions (gap 30m exceeded in-batch), u2 one
    write(
        "f1.parquet",
        [
            (1, t0, 1.0),
            (1, t0 + 10 * MIN, 2.0),
            (1, t0 + 20 * MIN, 3.0),
            (1, t0 + 120 * MIN, 5.0),  # closes session 1 by gap
            (2, t0, 7.0),
        ],
    )
    time.sleep(0.05)
    # batch 2: a far-future event pushes the watermark (2h delay) past
    # every open session's last+gap → timeouts fire
    write("f2.parquet", [(99, t0 + 600 * MIN, 0.0)])
    os.utime(str(src / "f2.parquet"))

    schema = (
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = run_to_memory_sink(
        stateful_sessions(stream, gap_minutes=30), "stateful_sessions_t", "append"
    )
    rows = {
        (r["user_id"], r["n_events"], r["total_value"])
        for r in out.collect()
    }
    # u1 session1 (3 events, sum 6) closed by gap; u1 session2 (1 event)
    # and u2 session (1 event) closed by timeout; u99 still open -> absent
    assert rows == {(1, 3, 6.0), (1, 1, 5.0), (2, 1, 7.0)}
