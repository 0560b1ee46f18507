"""Re-export: the ClickHouse-HTTP ArrowStream stub moved into the
package (clickhouse_arrow_spark/sources/ch_http_stub.py) so corpus
gate queries can self-host an endpoint like url_tvf.serve_static —
tests keep importing it from here."""

from clickhouse_arrow_spark.sources.ch_http_stub import (  # noqa: F401
    ArrowHttpStub,
)
