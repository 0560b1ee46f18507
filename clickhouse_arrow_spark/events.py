"""Push-based query events — the `subscribe_events` analogue.

The reference broadcasts `Progress` / `ProfileEvent` packets per query
over an out-of-band channel (clickhouse-arrow/src/client.rs:282-313,
Event at :80-93; Progress deltas at src/native/progress.rs:6-14, which
documents "values are delta and must be summed"). Spark's scheduler
keeps the same numbers in its AppStatusStore; this module bridges them
into a push stream: a sampler thread watches the qid's job group and
PUSHES delta `Progress` events into a queue as work advances, then a
final `ProfileEvent` summary when the query's jobs finish — the
consumer iterates, it never polls Spark itself.

This is the idiomatic Spark shape for the feature: executor->driver
metric flow already exists (heartbeats -> AppStatusStore); subscribing
means observing that store per job group, not re-implementing a wire
protocol.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Progress:
    """Progress DELTA — sum instances for a running total, exactly like
    the reference's `Progress` (src/native/progress.rs:6-38, including
    its `impl Add`)."""

    read_rows: int = 0
    read_bytes: int = 0
    total_rows_to_read: int = 0
    completed_tasks: int = 0
    total_tasks: int = 0

    def __add__(self, other: "Progress") -> "Progress":
        return Progress(
            read_rows=self.read_rows + other.read_rows,
            read_bytes=self.read_bytes + other.read_bytes,
            total_rows_to_read=max(self.total_rows_to_read, other.total_rows_to_read),
            completed_tasks=self.completed_tasks + other.completed_tasks,
            total_tasks=max(self.total_tasks, other.total_tasks),
        )


@dataclass(frozen=True)
class ProfileEvent:
    """One named counter in the final profile summary (reference
    ProfileEvent list in ClickHouseEvent::Profile)."""

    name: str
    value: int


@dataclass(frozen=True)
class Event:
    """Tagged event on the subscription stream (reference `Event`
    {event, qid, client_id}, src/client.rs:80-86)."""

    qid: str
    progress: Progress | None = None
    profile: tuple[ProfileEvent, ...] = field(default_factory=tuple)

    @property
    def is_progress(self) -> bool:
        return self.progress is not None


_DONE = object()


class EventSubscription:
    """Iterator over a query's pushed events.

    Yields zero-or-more `Event(progress=...)` deltas while the qid's
    jobs run, then exactly one `Event(profile=...)` summary, then ends.
    `close()` detaches early (the reference analogue of dropping the
    broadcast receiver)."""

    def __init__(self, spark, qid: str, interval: float = 0.05,
                 settle_ticks: int = 4):
        self._spark = spark
        self.qid = qid
        self._interval = interval
        self._settle_ticks = settle_ticks
        self._q: queue.Queue = queue.Queue()
        self._closed = threading.Event()
        self._thread = threading.Thread(
            target=self._sample_loop, name=f"cas-events-{qid[:8]}", daemon=True
        )
        self._thread.start()

    # -- consumer side -------------------------------------------------
    def __iter__(self):
        while True:
            item = self._q.get()
            if item is _DONE:
                return
            yield item

    def events(self, timeout: float | None = None):
        """Non-blocking-ish drain: yield events until the stream ends or
        `timeout` seconds pass without a new event."""
        while True:
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                return
            if item is _DONE:
                return
            yield item

    def close(self) -> None:
        self._closed.set()

    # -- producer side -------------------------------------------------
    def _stage_ids_for_group(self, tracker):
        jids = tracker.getJobIdsForGroup(self.qid) or []
        stage_ids = set()
        statuses = []
        for jid in jids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            stage_ids.update(info.stageIds)
            statuses.append(str(info.status))
        return len(jids), stage_ids, statuses

    def _sample_loop(self) -> None:
        sc = self._spark.sparkContext
        tracker = sc.statusTracker()
        store = sc._jsc.sc().statusStore()
        # cumulative per-stage observations; deltas are emitted
        seen: dict[int, tuple[int, int, int]] = {}  # sid -> (tasks, rows, bytes)
        totals = {"tasks": 0, "rows": 0, "bytes": 0}
        n_jobs_seen = 0
        settle = 0
        while not self._closed.is_set():
            try:
                n_jobs, stage_ids, statuses = self._stage_ids_for_group(tracker)
                n_jobs_seen = max(n_jobs_seen, n_jobs)
                d_rows = d_bytes = d_tasks = 0
                total_tasks = 0
                try:
                    act = store.activeStages()
                    for i in range(act.size()):
                        s = act.apply(i)
                        sid = s.stageId()
                        if sid not in stage_ids:
                            continue
                        cur = (
                            s.numCompleteTasks(),
                            s.inputRecords(),
                            s.inputBytes(),
                        )
                        prev = seen.get(sid, (0, 0, 0))
                        seen[sid] = (
                            max(cur[0], prev[0]),
                            max(cur[1], prev[1]),
                            max(cur[2], prev[2]),
                        )
                        d_tasks += max(0, cur[0] - prev[0])
                        d_rows += max(0, cur[1] - prev[1])
                        d_bytes += max(0, cur[2] - prev[2])
                        total_tasks += s.numTasks()
                except Exception:
                    pass  # AppStatusStore internals unavailable: fall back
                # stage completion visible only via the tracker
                for sid in stage_ids:
                    sinfo = tracker.getStageInfo(sid)
                    if sinfo is None:
                        continue
                    prev = seen.get(sid, (0, 0, 0))
                    if sinfo.numCompletedTasks > prev[0]:
                        d_tasks += sinfo.numCompletedTasks - prev[0]
                        seen[sid] = (sinfo.numCompletedTasks, prev[1], prev[2])
                    total_tasks += sinfo.numTasks
                if d_tasks or d_rows or d_bytes:
                    totals["tasks"] += d_tasks
                    totals["rows"] += d_rows
                    totals["bytes"] += d_bytes
                    settle = 0
                    self._q.put(
                        Event(
                            qid=self.qid,
                            progress=Progress(
                                read_rows=d_rows,
                                read_bytes=d_bytes,
                                completed_tasks=d_tasks,
                                total_tasks=total_tasks,
                            ),
                        )
                    )
                done = (
                    n_jobs_seen > 0
                    and statuses
                    and all(s in ("SUCCEEDED", "FAILED", "UNKNOWN") for s in statuses)
                )
                if done:
                    settle += 1
                    if settle >= self._settle_ticks:
                        break
            except Exception:
                break
            time.sleep(self._interval)
        self._q.put(
            Event(
                qid=self.qid,
                profile=(
                    ProfileEvent("jobs", n_jobs_seen),
                    ProfileEvent("tasks_completed", totals["tasks"]),
                    ProfileEvent("rows_read", totals["rows"]),
                    ProfileEvent("bytes_read", totals["bytes"]),
                ),
            )
        )
        self._q.put(_DONE)
