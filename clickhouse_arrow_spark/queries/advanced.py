"""Second-wave corpus: map/struct construction and access, pivot,
correlation/bitwise/boolean/median aggregates, value-window functions,
epoch/week/quarter date handling, LIKE family, null-handling semantics.

Extends §2.3 coverage toward the full ClickHouse function surface a
migrating user touches (tuple/map accessors per SURVEY §1.3 conventions,
quantile/median family, bitwise aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from clickhouse_arrow_spark.queries.base import register


@register(
    "fn_map_access",
    """
    SELECT r_regionkey,
           map(['name', 'key'], [r_name, CAST(r_regionkey AS VARCHAR)])['name'][1] AS name_val,
           CAST(cardinality(map(['name', 'key'], [r_name, CAST(r_regionkey AS VARCHAR)])) AS INT) AS map_size
    FROM region
    ORDER BY r_regionkey
    """,
    doc="Map construction + key access (ClickHouse Map(K,V) accessors; "
    "CH map field-name conventions live in types.py).",
    tags=("functions", "map"),
)
def fn_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.create_map(
        F.lit("name"), F.col("r_name"),
        F.lit("key"), F.col("r_regionkey").cast("string"),
    )
    return (
        spark.table("region")
        .select(
            "r_regionkey",
            F.element_at(m, "name").alias("name_val"),
            F.size(m).alias("map_size"),
        )
        .orderBy("r_regionkey")
    )


@register(
    "fn_struct_access",
    """
    SELECT n_nationkey,
           struct_pack(name := n_name, region := n_regionkey).name  AS tup_name,
           struct_pack(name := n_name, region := n_regionkey).region AS tup_region
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="Tuple/struct construction + field access (ClickHouse "
    "Tuple(...).1 / named-tuple access; field_{i} naming in types.py).",
    tags=("functions", "struct"),
)
def fn_struct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    tup = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    return (
        spark.table("nation")
        .select(
            "n_nationkey",
            tup.getField("name").alias("tup_name"),
            tup.getField("region").alias("tup_region"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "agg_pivot",
    """
    SELECT l_returnflag,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS qty_O,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Pivot on l_linestatus (DataFrame .pivot; oracle via FILTER aggs).",
    tags=("aggregate", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )
    return pivoted.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
    ).orderBy("l_returnflag")


@register(
    "agg_corr_covar",
    """
    SELECT round(corr(l_quantity, l_extendedprice), 6)       AS r,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_s,
           round(covar_pop(l_quantity, l_extendedprice), 4)  AS cov_p
    FROM lineitem
    """,
    doc="Correlation / covariance aggregates.",
    tags=("aggregate", "stats"),
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.table("lineitem").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("r"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_s"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("cov_p"),
    )


@register(
    "agg_bool_bit",
    """
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000)                 AS all_over_1k,
           bool_or(o_totalprice > 400000)                AS any_over_400k,
           CAST(bit_and(o_orderkey) AS BIGINT)           AS key_and,
           CAST(bit_or(o_orderkey % 256) AS BIGINT)      AS key_or,
           CAST(bit_xor(o_orderkey) AS BIGINT)           AS key_xor
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Boolean + bitwise aggregates (ClickHouse groupBitAnd/Or/Xor).",
    tags=("aggregate", "bitwise"),
)
def agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.bit_and("o_orderkey").alias("key_and"),
            F.bit_or(F.col("o_orderkey") % 256).alias("key_or"),
            F.bit_xor("o_orderkey").alias("key_xor"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_median",
    """
    SELECT c_mktsegment,
           round(median(c_acctbal), 4) AS med_bal,
           count(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Exact median (ClickHouse quantileExact(0.5)).",
    tags=("aggregate", "percentile"),
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.median("c_acctbal"), 4).alias("med_bal"),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "window_value_functions",
    """
    SELECT o_custkey, o_orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_px,
           round(last_value(o_totalprice)  OVER w, 2) AS last_px,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_px
    FROM orders
    WHERE o_custkey <= 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Value window functions over an unbounded frame.",
    tags=("window", "value"),
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    p = F.col("o_totalprice")
    return (
        spark.table("orders")
        .where(F.col("o_custkey") <= 30)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.first(p).over(w), 2).alias("first_px"),
            F.round(F.last(p).over(w), 2).alias("last_px"),
            F.round(F.nth_value(p, 2).over(w), 2).alias("second_px"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "fn_epoch_week_quarter",
    """
    SELECT o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT)               AS epoch_s,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP)    AS week_start,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
           CAST(quarter(o_orderdate) AS INT)                AS q
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
    doc="Epoch seconds, ISO week, quarter truncation.",
    tags=("functions", "date"),
)
def fn_epoch_week_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("orders")
        .where(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
            F.date_trunc("week", F.col("o_orderdate")).alias("week_start"),
            F.date_trunc("quarter", F.col("o_orderdate")).alias("quarter_start"),
            F.quarter("o_orderdate").alias("q"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_like_family",
    """
    SELECT p_partkey,
           p_type LIKE '%BRASS%'         AS has_brass,
           p_type ILIKE '%standard%'     AS std_i,
           starts_with(p_type, 'SMALL')  AS is_small,
           p_name LIKE '_r%'             AS second_r
    FROM part
    WHERE p_partkey <= 400
    ORDER BY p_partkey
    """,
    doc="LIKE / ILIKE / prefix predicates.",
    tags=("functions", "string", "predicate"),
)
def fn_like_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spark.table("part").where(F.col("p_partkey") <= 400)
    return p.select(
        "p_partkey",
        F.col("p_type").like("%BRASS%").alias("has_brass"),
        F.col("p_type").ilike("%standard%").alias("std_i"),
        F.col("p_type").startswith("SMALL").alias("is_small"),
        F.col("p_name").like("_r%").alias("second_r"),
    ).orderBy("p_partkey")


@register(
    "null_handling",
    """
    WITH lo AS (
      SELECT c_custkey, c_acctbal, o_totalprice
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 450000
    )
    SELECT count(*) AS n_rows,
           count(o_totalprice) AS n_matched,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           round(sum(coalesce(o_totalprice, 0)), 2) AS total_or_zero,
           round(avg(o_totalprice), 4) AS avg_ignoring_null
    FROM lo
    """,
    doc="NULL semantics: count(col) vs count(*), coalesce, null-skipping "
    "aggregates over an outer join.",
    tags=("null", "aggregate", "join"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders").where(F.col("o_totalprice") > 450000)
    lo = c.join(o, c.c_custkey == o.o_custkey, "left")
    return lo.agg(
        F.count("*").alias("n_rows"),
        F.count("o_totalprice").alias("n_matched"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias(
            "total_or_zero"
        ),
        F.round(F.avg("o_totalprice"), 4).alias("avg_ignoring_null"),
    )


@register(
    "distinct_on_argmax",
    """
    SELECT o_custkey, o_orderkey AS latest_order,
           round(o_totalprice, 2) AS latest_price
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
    doc="Latest-row-per-key (ClickHouse argMax / DISTINCT ON pattern) — "
    "deterministic via (date, key) ordering tuple.",
    tags=("aggregate", "argmax", "dedup"),
)
def distinct_on_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    by = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    return (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", by).alias("latest_order"),
            F.round(F.max_by("o_totalprice", by), 2).alias("latest_price"),
        )
        .orderBy("o_custkey")
    )


@register(
    "fn_variant_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.missing') AS missing
    FROM events
    WHERE event_id <= 300
    ORDER BY event_id
    """,
    doc="Semi-structured access via Spark 4 VariantType (parse_json + "
    "variant_get) — the ClickHouse Variant/Dynamic/JSON column model "
    "(SURVEY §1.3); missing paths yield NULL, not errors.",
    tags=("functions", "variant", "json"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.parse_json(F.col("props"))
    return (
        spark.table("events")
        .where(F.col("event_id") <= 300)
        .select(
            "event_id",
            F.variant_get(v, "$.k", "long").alias("k"),
            F.variant_get(v, "$.missing", "string").alias("missing"),
        )
        .orderBy("event_id")
    )


@register(
    "agg_string_concat",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    doc="Ordered string aggregation (ClickHouse groupConcat / "
    "arrayStringConcat(groupArray())).",
    tags=("aggregate", "string"),
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations_csv"
            )
        )
        .orderBy("n_regionkey")
    )


@register(
    "fn_posexplode",
    """
    SELECT p_partkey,
           CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS INT) AS pos,
           unnest(string_split(p_name, ' ')) AS word
    FROM part
    WHERE p_partkey <= 100
    ORDER BY p_partkey, pos
    """,
    doc="posexplode: element + 0-based position (ClickHouse "
    "arrayJoin + arrayEnumerate).",
    tags=("functions", "array", "explode"),
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("part")
        .where(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word"),
        )
        .orderBy("p_partkey", "pos")
    )


@register(
    "fn_unpivot",
    """
    SELECT c_custkey, k, round(v, 2) AS v
    FROM (SELECT c_custkey, c_acctbal AS bal, c_nationkey * 1.0 AS nat
          FROM customer WHERE c_custkey <= 100)
    UNPIVOT (v FOR k IN (bal, nat))
    ORDER BY c_custkey, k
    """,
    doc="Unpivot/melt wide columns to long (key, value) rows.",
    tags=("reshape", "unpivot"),
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        spark.table("customer")
        .where(F.col("c_custkey") <= 100)
        .select(
            "c_custkey",
            F.col("c_acctbal").alias("bal"),
            (F.col("c_nationkey") * 1.0).alias("nat"),
        )
    )
    return (
        wide.unpivot("c_custkey", ["bal", "nat"], "k", "v")
        .select("c_custkey", "k", F.round("v", 2).alias("v"))
        .orderBy("c_custkey", "k")
    )


@register(
    "table_function_numbers",
    """
    SELECT CAST(n.number AS BIGINT) AS number,
           CAST(n.number * n.number AS BIGINT) AS square
    FROM (SELECT unnest(range(0, 1000)) AS number) n
    WHERE n.number % 7 = 0
    ORDER BY number
    """,
    doc="ClickHouse numbers(N) table function -> spark.range: generated "
    "sources are partition-parallel (range splits across executors).",
    tags=("table-function", "generator"),
)
def table_function_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.range(0, 1000)
        .select(
            F.col("id").alias("number"),
            (F.col("id") * F.col("id")).alias("square"),
        )
        .where(F.col("number") % 7 == 0)
        .orderBy("number")
    )
