from clickhouse_arrow_spark.queries.base import REGISTRY, QuerySpec, load_all

__all__ = ["REGISTRY", "QuerySpec", "load_all"]
