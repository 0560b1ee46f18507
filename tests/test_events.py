"""Push-based event stream tests (`subscribe_events` parity —
reference src/client.rs:282-313: mid-query Progress deltas plus a final
profile summary, delivered by push, consumed by iteration)."""

from __future__ import annotations

from clickhouse_arrow_spark.events import Event, Progress


def _run_big_query(client, qid):
    df = client.query(
        "SELECT avg(l_extendedprice * (1 - l_discount)) AS a "
        "FROM lineitem CROSS JOIN (SELECT 1 AS x UNION ALL SELECT 2 "
        "UNION ALL SELECT 3 UNION ALL SELECT 4) m "
        "GROUP BY l_returnflag, l_partkey % 1000",
        qid=qid,
    )
    with client.as_qid(qid):
        df.collect()


def test_subscribe_events_pushes_progress_then_profile(client):
    qid = "evt-test-1"
    sub = client.subscribe_events(qid, interval=0.02)
    _run_big_query(client, qid)
    events = list(sub)  # stream ends after the final profile
    assert events, "no events pushed"
    progress = [e for e in events if e.is_progress]
    profiles = [e for e in events if e.profile]
    assert progress, "no mid-query Progress event was pushed"
    assert len(profiles) == 1, "exactly one final profile summary expected"
    assert all(e.qid == qid for e in events)
    # deltas sum to the profile totals (reference: "values are delta
    # and must be summed")
    total = sum((e.progress for e in progress), Progress())
    summary = {p.name: p.value for p in profiles[0].profile}
    assert summary["tasks_completed"] == total.completed_tasks
    assert summary["tasks_completed"] > 0
    assert summary["jobs"] >= 1


def test_subscription_close_detaches(client):
    qid = "evt-test-2"
    sub = client.subscribe_events(qid, interval=0.02)
    sub.close()
    # closing before any job ran: stream ends with just the (empty)
    # profile summary, no hang.
    events = list(sub)
    assert len(events) == 1 and events[0].profile


def test_progress_delta_addition():
    a = Progress(read_rows=10, read_bytes=100, completed_tasks=1, total_tasks=8)
    b = Progress(read_rows=5, read_bytes=50, completed_tasks=2, total_tasks=8)
    c = a + b
    assert (c.read_rows, c.read_bytes, c.completed_tasks, c.total_tasks) == (
        15, 150, 3, 8,
    )
