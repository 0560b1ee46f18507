"""Connection-pool facade — API parity with the reference's bb8-based
`ConnectionPool` / `ConnectionManager` (clickhouse-arrow/src/pool.rs:29-282).

Semantically a no-op on Spark: a SparkSession is a shared, thread-safe
handle and the scheduler multiplexes work, so there is nothing to pool
(SURVEY §2.1 "keep facade no-op"). The facade preserves the reference's
call shape — `get() -> Client`, health checks on checkout, max_size —
so migrating code compiles and the health-check contract still runs.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import SparkSession

from clickhouse_arrow_spark.client import Client
from clickhouse_arrow_spark.errors import QueryError


@dataclass(frozen=True)
class PoolOptions:
    """Mirror of the reference's pool builder knobs (pool.rs:29-80)."""

    max_size: int = 4
    test_on_checkout: bool = True


class ConnectionPool:
    """Hands out `Client` facades over one shared SparkSession."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        options: PoolOptions = PoolOptions(),
    ):
        self._client = Client(spark)
        self.options = options
        self._checkouts = 0

    @property
    def spark(self) -> SparkSession:
        return self._client.spark

    @contextmanager
    def get(self):
        """Checkout (reference `Pool::get`): optional health check, then
        yield the shared client."""
        if self.options.test_on_checkout and not self._client.health_check():
            raise QueryError("pool health check failed: Spark session unavailable")
        self._checkouts += 1
        try:
            yield self._client
        finally:
            self._checkouts -= 1

    def status(self) -> dict:
        return {
            "size": 1,  # one shared session stands in for N connections
            "max_size": self.options.max_size,
            "active_checkouts": self._checkouts,
        }

    def close(self) -> None:
        self._client.shutdown()
