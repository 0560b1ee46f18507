"""ClientBuilder — fluent construction parity with the reference's
`ClientBuilder` (clickhouse-arrow/src/client/builder.rs:770-806 and the
option setters across :1-1047).

Connection-transport options (endpoint/TLS/auth/compression) configure a
TCP client in the reference; here each maps to its Spark-session-level
equivalent or is accepted-and-recorded for API compatibility (a facade
migrating code can call unchanged). `build()` produces a `Client`.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from clickhouse_arrow_spark.client import Client
from clickhouse_arrow_spark.session import get_spark
from clickhouse_arrow_spark.settings import translate_setting
from clickhouse_arrow_spark.types import TypeOptions


class ClientBuilder:
    """Fluent builder: `ClientBuilder().with_database("db").build()`."""

    def __init__(self) -> None:
        self._master: str | None = None
        self._app_name = "clickhouse_arrow_spark"
        self._database: str | None = None
        self._confs: dict[str, str] = {}
        self._settings: dict[str, Any] = {}
        self._type_options = TypeOptions()
        self._spark: SparkSession | None = None
        self._ignored: dict[str, Any] = {}  # accepted-for-compat knobs
        self._http_url: str | None = None
        self._http_user: str | None = None
        self._http_password: str | None = None

    # -- destination: reference with_endpoint/with_destination ----------
    def with_destination(self, master: str) -> "ClientBuilder":
        """Spark master URL plays the role of the server endpoint.

        A ClickHouse NATIVE-protocol endpoint (`tcp://host:9000`,
        `host:9000` — the reference's primary transport,
        clickhouse-arrow/src/client.rs:213-256) is NOT a Spark master
        and has no wire path here; it raises immediately with the HTTP
        alternative named, instead of being silently accepted and
        failing at first query."""
        import re as _re

        from clickhouse_arrow_spark.errors import ConnectionError

        if master.startswith(("tcp://", "clickhouse://")) or _re.fullmatch(
            r"[\w.-]+:\d{2,5}", master
        ):
            host = master.split("://")[-1].rsplit(":", 1)[0]
            raise ConnectionError(
                f"{master!r} looks like a ClickHouse native-TCP endpoint "
                "(port 9000/9440) — the native wire protocol is not "
                "implemented; this engine speaks the HTTP ArrowStream "
                "interface (port 8123). Use "
                f"connect('http://{host}:8123', ...) or "
                f".option('url', 'http://{host}:8123') on the "
                "'clickhouse' DataSource, or pass a Spark master URL "
                "(local[n], spark://..., yarn) to run queries locally."
            )
        self._master = master
        return self

    def with_session(self, spark: SparkSession) -> "ClientBuilder":
        self._spark = spark
        return self

    def with_database(self, database: str) -> "ClientBuilder":
        self._database = database
        return self

    # -- settings: reference with_settings (src/settings.rs) ------------
    def with_setting(self, name: str, value: Any) -> "ClientBuilder":
        conf, v = translate_setting(name, value)
        self._confs[conf] = v
        return self

    def with_conf(self, key: str, value: str) -> "ClientBuilder":
        self._confs[key] = value
        return self

    # -- type mapping: reference with_arrow_options ----------------------
    def with_type_options(self, options: TypeOptions) -> "ClientBuilder":
        self._type_options = options
        return self

    def with_strings_as_strings(self, enabled: bool = True) -> "ClientBuilder":
        from dataclasses import replace

        self._type_options = replace(self._type_options, strings_as_strings=enabled)
        return self

    # -- transport knobs --------------------------------------------------
    # username/password feed the HTTP transport's X-ClickHouse-* headers
    # when an endpoint is set (reference default_headers,
    # http/client.rs:43-67); without one they are accepted as no-ops.
    def with_http_url(self, url: str) -> "ClientBuilder":
        """Remote HTTP ArrowStream endpoint for read_remote/
        insert_remote (reference HttpOptions.url)."""
        self._http_url = url
        return self

    def with_username(self, user: str) -> "ClientBuilder":
        self._http_user = user
        return self

    def with_password(self, password: str) -> "ClientBuilder":
        self._http_password = password
        return self

    def with_tls(self, enabled: bool = True) -> "ClientBuilder":
        self._ignored["tls"] = enabled
        return self

    def with_compression(self, method: str) -> "ClientBuilder":
        conf, v = translate_setting("network_compression_method", method)
        self._confs[conf] = v
        return self

    # -- reference Python-binding method names ---------------------------
    # py-clickhouse-arrow exposes the builder WITHOUT the Rust-style
    # `with_` prefix (_internal.pyi:46-118); both spellings work here so
    # code migrating from either binding runs unchanged.
    def endpoint(self, endpoint: str) -> "ClientBuilder":
        if endpoint.startswith(("http://", "https://")):
            return self.with_http_url(endpoint)
        return self.with_destination(endpoint)

    def username(self, user: str) -> "ClientBuilder":
        return self.with_username(user)

    def password(self, password: str) -> "ClientBuilder":
        return self.with_password(password)

    def database(self, database: str) -> "ClientBuilder":
        return self.with_database(database)

    def tls(self, enabled: bool) -> "ClientBuilder":
        return self.with_tls(enabled)

    def domain(self, domain: str) -> "ClientBuilder":
        self._ignored["tls_domain"] = domain
        return self

    def cafile(self, path: str) -> "ClientBuilder":
        self._ignored["tls_cafile"] = path
        return self

    def compression(self, method: str) -> "ClientBuilder":
        if method not in ("none", "lz4", "zstd", "gzip"):
            raise ValueError(f"unsupported compression method: {method}")
        return self.with_compression(method)

    def ipv4_only(self, enabled: bool) -> "ClientBuilder":
        self._ignored["ipv4_only"] = enabled
        return self

    def build(self) -> Client:
        spark = self._spark or get_spark(
            app_name=self._app_name, master=self._master, confs=self._confs
        )
        if self._spark is not None:
            for k, v in self._confs.items():
                spark.conf.set(k, v)
        client = Client(
            spark,
            type_options=self._type_options,
            http_url=self._http_url,
            http_user=self._http_user,
            http_password=self._http_password,
        )
        if self._database:
            spark.sql(f"CREATE DATABASE IF NOT EXISTS `{self._database}`")
            spark.catalog.setCurrentDatabase(self._database)
        return client
