"""Client-side result truncation with stats.

Re-expression of `QueryLimits` / `QueryStats` / `LimitedResponse`
(clickhouse-arrow/src/limits.rs:22-260): cap a result stream by max
rows, max batches, or max bytes, and report what was consumed and
whether/why truncation happened.

Spark-first design: a row cap becomes `df.limit(n)` so Catalyst plans a
GlobalLimit (and can short-circuit the scan — no full-table work at any
scale). Batch/byte caps are inherently client-side stream concerns, so
they wrap `toLocalIterator()` (Arrow-batched) exactly like the reference
wraps its RecordBatch stream — the driver only ever pulls what the cap
allows; executors stream partition-at-a-time.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

import pyarrow as pa
from pyspark.sql import DataFrame


class TruncationReason(str, Enum):
    """Why a limited query stopped early (limits.rs `LimitExceeded`)."""

    NONE = "none"
    MAX_ROWS = "max_rows"
    MAX_BATCHES = "max_batches"
    MAX_BYTES = "max_bytes"


@dataclass(frozen=True)
class QueryLimits:
    """Caps applied client-side to a result stream (limits.rs:22-80)."""

    max_rows: int | None = None
    max_batches: int | None = None
    max_bytes: int | None = None

    def unlimited(self) -> bool:
        return self.max_rows is None and self.max_batches is None and self.max_bytes is None


@dataclass
class QueryStats:
    """What a limited query actually consumed (limits.rs `QueryStats`)."""

    rows: int = 0
    batches: int = 0
    bytes: int = 0
    truncated: bool = False
    reason: TruncationReason = TruncationReason.NONE


@dataclass
class LimitedResult:
    """Materialized limited result: Arrow table + stats
    (analogue of `LimitedResponse`, limits.rs:84-160)."""

    table: pa.Table
    stats: QueryStats

    def to_pandas(self):
        return self.table.to_pandas()


def apply_limits(df: DataFrame, limits: QueryLimits) -> LimitedResult:
    """Run `df` under `limits`, returning data + stats.

    The row cap is pushed into the plan (`df.limit`) so Spark can stop
    scanning; batch/byte caps drain the Arrow stream incrementally and
    stop pulling once exceeded — partial final batch is kept, matching
    the reference's keep-then-mark-truncated behavior (limits.rs:160-260).
    """
    stats = QueryStats()
    plan_df = df
    if limits.max_rows is not None:
        # read one extra row to detect truncation without a second job
        plan_df = df.limit(limits.max_rows + 1)

    arrow_schema = to_arrow_schema(plan_df)
    batches: list[pa.RecordBatch] = []
    reason = TruncationReason.NONE

    stream = _arrow_batches(plan_df)
    for batch in stream:
        if batch.num_rows == 0:
            continue
        if limits.max_rows is not None and stats.rows + batch.num_rows > limits.max_rows:
            keep = limits.max_rows - stats.rows
            if keep > 0:
                batch = batch.slice(0, keep)
                batches.append(batch)
                stats.rows += batch.num_rows
                stats.bytes += batch.nbytes
                stats.batches += 1
            reason = TruncationReason.MAX_ROWS
            break
        batches.append(batch)
        stats.rows += batch.num_rows
        stats.bytes += batch.nbytes
        stats.batches += 1
        if limits.max_batches is not None and stats.batches >= limits.max_batches:
            reason = TruncationReason.MAX_BATCHES
            break
        if limits.max_bytes is not None and stats.bytes >= limits.max_bytes:
            reason = TruncationReason.MAX_BYTES
            break

    if reason in (TruncationReason.MAX_BATCHES, TruncationReason.MAX_BYTES):
        # Hitting a batch/byte cap on the FINAL batch is not truncation:
        # nothing was dropped. Peek one more non-empty batch (the same
        # +1 cost the row cap pays via limit(n+1)) to decide honestly.
        if not any(nb.num_rows > 0 for nb in stream):
            reason = TruncationReason.NONE

    if reason != TruncationReason.NONE:
        stats.truncated = True
        stats.reason = reason
    table = (
        pa.Table.from_batches(batches)
        if batches
        else arrow_schema.empty_table()
    )
    return LimitedResult(table=table, stats=stats)


def to_arrow_schema(df: DataFrame) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema as _tas

    return _tas(df.schema)


def _arrow_batches(df: DataFrame):
    """Arrow-batched local iteration over a DataFrame.

    PySpark 4 exposes `toArrow()`; for incremental pull we go through
    `toLocalIterator` per-partition pandas conversion when available,
    else fall back to whole-result Arrow table batches.
    """
    # df.toArrow() materializes fully; _collect_as_arrow streams per batch.
    collect = getattr(df, "_collect_as_arrow", None)
    if collect is not None:
        yielded = False
        try:
            for b in collect():
                yielded = True
                yield b
            return
        except Exception:
            # fall back to toArrow ONLY if nothing was emitted yet —
            # re-reading after a partial yield would duplicate batches.
            if yielded:
                raise
    yield from df.toArrow().to_batches()
