"""Second-wave corpus: map/struct construction and access, pivot,
bitwise/boolean/conditional and quantile aggregates, ordered string
collection, null-handling semantics, reshape (posexplode/unpivot), and
generated sources.

Extends §2.3 coverage toward the full ClickHouse function surface a
migrating user touches (tuple/map accessors per SURVEY §1.3 conventions,
quantile/median family, bitwise aggregates). Same-shape single-operator
demos are merged into labeled-branch or wide-select composites so every
family lands inside the driver's 50-entry CORRECTNESS window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_arrow_spark.queries.base import register


@register(
    "fn_map_struct",
    """
    SELECT 'map' AS branch, CAST(r_regionkey AS BIGINT) AS k,
           map(['name', 'key'], [r_name, CAST(r_regionkey AS VARCHAR)])['name'][1] AS name_val,
           CAST(cardinality(map(['name', 'key'], [r_name, CAST(r_regionkey AS VARCHAR)])) AS INT) AS extra
    FROM region
    UNION ALL
    SELECT 'struct' AS branch, CAST(n_nationkey AS BIGINT) AS k,
           struct_pack(name := n_name, region := n_regionkey).name AS name_val,
           CAST(struct_pack(name := n_name, region := n_regionkey).region AS INT) AS extra
    FROM nation
    ORDER BY branch, k
    """,
    doc="Nested-type accessor composite: Map(K,V) construction + key "
    "access + cardinality (map branch) and Tuple/struct construction + "
    "field access (struct branch; field_{i} naming conventions in "
    "types.py) — formerly fn_map_access / fn_struct_access.",
    tags=("functions", "map", "struct"),
)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.create_map(
        F.lit("name"), F.col("r_name"),
        F.lit("key"), F.col("r_regionkey").cast("string"),
    )
    map_branch = (
        spark.table("region")
        .select(
            F.lit("map").alias("branch"),
            F.col("r_regionkey").cast("long").alias("k"),
            F.element_at(m, "name").alias("name_val"),
            F.size(m).alias("extra"),
        )
    )
    tup = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    struct_branch = (
        spark.table("nation")
        .select(
            F.lit("struct").alias("branch"),
            F.col("n_nationkey").cast("long").alias("k"),
            tup.getField("name").alias("name_val"),
            tup.getField("region").cast("int").alias("extra"),
        )
    )
    return map_branch.unionByName(struct_branch).orderBy("branch", "k")


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
    "agg_bool_conditional",
    """
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000)                 AS all_over_1k,
           bool_or(o_totalprice > 400000)                AS any_over_400k,
           CAST(bit_and(o_orderkey) AS BIGINT)           AS key_and,
           CAST(bit_or(o_orderkey % 256) AS BIGINT)      AS key_or,
           CAST(bit_xor(o_orderkey) AS BIGINT)           AS key_xor,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice ELSE 0 END), 2) AS urgent_total,
           round(avg(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice END), 4) AS urgent_avg
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Boolean + bitwise + conditional aggregate composite over one "
    "grouping: bool_and/bool_or, ClickHouse groupBitAnd/Or/Xor, and the "
    "countIf/sumIf/avgIf family re-expressed with FILTER/CASE — "
    "formerly agg_bool_bit / agg_conditional.",
    tags=("aggregate", "bitwise", "conditional"),
)
def agg_bool_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
    return (
        spark.table("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.bit_and("o_orderkey").alias("key_and"),
            F.bit_or(F.col("o_orderkey") % 256).alias("key_or"),
            F.bit_xor("o_orderkey").alias("key_xor"),
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.round(F.sum(F.coalesce(urgent, F.lit(0.0))), 2).alias("urgent_total"),
            F.round(F.avg(urgent), 4).alias("urgent_avg"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_quantiles",
    """
    SELECT 'customer_bal' AS branch, c_mktsegment AS grp,
           round(quantile_cont(c_acctbal, 0.5), 4)  AS q50,
           round(quantile_cont(c_acctbal, 0.95), 4) AS q95,
           count(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'orders_price' AS branch, o_orderstatus AS grp,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS q50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS q95,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY branch, grp
    """,
    doc="Quantile family composite: exact interpolated median and p95 "
    "(ClickHouse quantile()/median(); Spark percentile() and DuckDB "
    "quantile_cont() both interpolate linearly) over two groupings — "
    "formerly agg_median / agg_percentile.",
    tags=("aggregate", "percentile"),
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        spark.table("customer")
        .groupBy(F.col("c_mktsegment").alias("grp"))
        .agg(
            F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("q50"),
            F.round(F.percentile("c_acctbal", F.lit(0.95)), 4).alias("q95"),
            F.count("*").alias("n"),
        )
        .select(F.lit("customer_bal").alias("branch"), "grp", "q50", "q95", "n")
    )
    orders = (
        spark.table("orders")
        .groupBy(F.col("o_orderstatus").alias("grp"))
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("q50"),
            F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("q95"),
            F.count("*").alias("n"),
        )
        .select(F.lit("orders_price").alias("branch"), "grp", "q50", "q95", "n")
    )
    return cust.unionByName(orders).orderBy("branch", "grp")


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
    "select_distinct_on",
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
    "string_agg_collect",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           CAST(len(list(n_name)) AS INT) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    doc="Collection aggregate composite: groupArray (collect_list, "
    "emitted sorted/joined so the driver canonicalizer can hash it) + "
    "ordered string aggregation (ClickHouse groupConcat / "
    "arrayStringConcat(groupArray())) — formerly agg_collect_list / "
    "agg_string_concat.",
    tags=("aggregate", "collect", "string"),
)
def agg_collect_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations_csv"
            ),
            F.size(F.collect_list("n_name")).alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "unnest_posexplode",
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
def unnest_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "unpivot_metrics",
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
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "trig_bits_functions",
    """
    SELECT p_partkey,
           round(sin(p_retailprice / 100.0), 6)              AS sn,
           round(cos(p_retailprice / 100.0), 6)              AS cs,
           round(atan2(p_retailprice, CAST(p_size AS DOUBLE)), 6) AS at2,
           round(degrees(p_retailprice / 1000.0), 6)         AS dg,
           round(radians(CAST(p_size AS DOUBLE)), 6)         AS rd,
           CAST(p_partkey << 3 AS BIGINT)                    AS shl,
           CAST(p_partkey >> 2 AS BIGINT)                    AS shr,
           CAST(p_partkey & 255 AS BIGINT)                   AS band,
           CAST(p_partkey | 4096 AS BIGINT)                  AS bor,
           CAST(xor(p_partkey, p_size) AS BIGINT)            AS bxor
    FROM part
    WHERE p_partkey <= 400
    ORDER BY p_partkey
    """,
    doc="Trigonometric + bitwise scalar family (ClickHouse sin/cos/"
    "atan2/degrees/radians, bitShiftLeft/Right, bitAnd/Or/Xor).",
    tags=("functions", "math", "bitwise"),
)
def trig_bits_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spark.table("part").where(F.col("p_partkey") <= 400)
    price = F.col("p_retailprice")
    size_d = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.round(F.sin(price / 100.0), 6).alias("sn"),
        F.round(F.cos(price / 100.0), 6).alias("cs"),
        F.round(F.atan2(price, size_d), 6).alias("at2"),
        F.round(F.degrees(price / 1000.0), 6).alias("dg"),
        F.round(F.radians(size_d), 6).alias("rd"),
        F.shiftleft(F.col("p_partkey"), 3).alias("shl"),
        F.shiftright(F.col("p_partkey"), 2).alias("shr"),
        F.col("p_partkey").bitwiseAND(F.lit(255)).alias("band"),
        F.col("p_partkey").bitwiseOR(F.lit(4096)).alias("bor"),
        F.col("p_partkey").bitwiseXOR(F.col("p_size").cast("long")).alias("bxor"),
    ).orderBy("p_partkey")


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


_URL_IP_CH_SQL = """
    SELECT doc_id,
           domain(url) AS host,
           path(url) AS url_path,
           extractURLParameter(url, 'lang') AS lang_param,
           cutQueryString(url) AS base_url,
           topLevelDomain(url) AS tld,
           IPv4NumToString(toUInt32(doc_id) * 7919 + 11) AS ip_str,
           IPv4StringToNum(IPv4NumToString(toUInt32(doc_id) * 7919 + 11)) AS ip_num
    FROM (SELECT doc_id, lang,
                 concat('https://www.', source, '.example.com/docs/',
                        toString(doc_id), '?lang=', lang, '&v=2') AS url
          FROM documents)
    ORDER BY doc_id
"""


@register(
    "url_ip_functions",
    """
    SELECT doc_id,
           'www.' || source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS url_path,
           lang AS lang_param,
           'https://www.' || source || '.example.com/docs/'
             || CAST(doc_id AS VARCHAR) AS base_url,
           'com' AS tld,
           CAST((n // 16777216) % 256 AS VARCHAR) || '.'
             || CAST((n // 65536) % 256 AS VARCHAR) || '.'
             || CAST((n // 256) % 256 AS VARCHAR) || '.'
             || CAST(n % 256 AS VARCHAR) AS ip_str,
           n AS ip_num
    FROM (SELECT doc_id, source, lang,
                 CAST(doc_id AS BIGINT) * 7919 + 11 AS n
          FROM documents)
    ORDER BY doc_id
    """,
    doc="ClickHouse URL + IP function families (domain/path/"
    "extractURLParameter/cutQueryString/topLevelDomain, "
    "IPv4NumToString/IPv4StringToNum round trip) run through the "
    "dialect translator end-to-end; the oracle derives every value "
    "independently from the URL's parts.",
    tags=("functions", "dialect", "url", "ip"),
)
def url_ip_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_arrow_spark.dialect import translate_ch_sql

    return spark.sql(translate_ch_sql(_URL_IP_CH_SQL))


@register(
    "summap_event_values",
    """
    WITH per_key AS (
      SELECT user_id, event_type,
             round(sum(value), 4) AS sv,
             round(min(value), 4) AS mv
      FROM events
      WHERE user_id < 50
      GROUP BY user_id, event_type
    )
    SELECT user_id,
           array_to_string(array_agg(event_type ORDER BY event_type), ',')
             AS keys,
           array_to_string(array_agg(printf('%.4f', sv)
             ORDER BY event_type), ',') AS sums,
           array_to_string(array_agg(printf('%.4f', mv)
             ORDER BY event_type), ',') AS mins
    FROM per_key
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="ClickHouse sumMap/minMap aggregate family "
    "(operators/maps.agg_map): per-user metric map keyed by event type "
    "— each event contributes a single-entry map, the aggregate merges "
    "them per key. Output decomposed into sorted key/value arrays so "
    "the hash is engine-neutral (map rendering differs across "
    "engines). Two exchanges, both map-side combined on bounded keys.",
    tags=("aggregate", "map", "summap"),
)
def q_summap_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_arrow_spark.operators.maps import agg_map

    ev = (
        spark.table("events")
        .where(F.col("user_id") < 50)
        .select(
            "user_id", F.create_map(F.col("event_type"), F.col("value")).alias("m")
        )
    )
    sums = agg_map(ev, ["user_id"], "m", "sum", out_col="sm")
    mins = agg_map(ev, ["user_id"], "m", "min", out_col="mm")
    rounded_s = F.transform_values(F.col("sm"), lambda k, v: F.round(v, 4))
    rounded_m = F.transform_values(F.col("mm"), lambda k, v: F.round(v, 4))
    fmt4 = lambda arr: F.array_join(  # noqa: E731
        F.transform(arr, lambda v: F.format_string("%.4f", v)), ","
    )
    return (
        sums.join(mins, "user_id")
        .select(
            "user_id",
            F.array_join(F.map_keys(rounded_s), ",").alias("keys"),
            fmt4(F.map_values(rounded_s)).alias("sums"),
            fmt4(F.map_values(rounded_m)).alias("mins"),
        )
        .orderBy("user_id")
    )


@register(
    "timeseries_delta_sum",
    """
    WITH d AS (
      SELECT user_id,
             greatest(value - lag(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id), 0) AS dd
      FROM events WHERE user_id < 50
    )
    SELECT user_id, round(CAST(sum(dd) AS DOUBLE), 4) AS delta_sum
    FROM d GROUP BY user_id ORDER BY user_id
    """,
    doc="ClickHouse deltaSum analogue "
    "(operators/timeseries.delta_sum): per-user sum of positive "
    "consecutive value deltas in time order — the counter-reset-"
    "tolerant rate aggregate. Single exchange on the user key, reused "
    "by the lag window and the final groupBy.",
    tags=("timeseries", "aggregate", "deltaSum"),
)
def q_timeseries_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_arrow_spark.operators.timeseries import delta_sum

    ev = spark.table("events").where(F.col("user_id") < 50)
    # deterministic order under equal timestamps: tiebreak on event_id
    ev = ev.withColumn(
        "_ord",
        F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 20, "0"),
        ),
    )
    out = delta_sum(ev, ["user_id"], "_ord", "value")
    return out.select(
        "user_id", F.round(F.col("delta_sum"), 4).alias("delta_sum")
    ).orderBy("user_id")


@register(
    "timeseries_exp_decay_avg",
    """
    WITH t AS (
      SELECT user_id, value,
             epoch(ts) - max(epoch(ts)) OVER (PARTITION BY user_id) AS dt
      FROM events WHERE user_id < 50
    )
    SELECT user_id,
           round(sum(value * exp(dt / 3600.0))
                 / sum(exp(dt / 3600.0)), 6) AS exp_decayed_avg
    FROM t GROUP BY user_id ORDER BY user_id
    """,
    doc="ClickHouse exponentialTimeDecayedAvg analogue "
    "(operators/timeseries.exp_time_decayed_avg, decay 1h): the "
    "time-weighted mean at each user's latest event, evaluated in "
    "closed form (window max + keyed aggregate on one shared "
    "partitioning) instead of the row-recurrence ClickHouse runs — "
    "declarative, so it scales as a normal aggregate.",
    tags=("timeseries", "aggregate", "exponential-decay"),
)
def q_timeseries_exp_decay_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_arrow_spark.operators.timeseries import exp_time_decayed_avg

    ev = spark.table("events").where(F.col("user_id") < 50)
    out = exp_time_decayed_avg(ev, ["user_id"], "ts", "value", 3600.0)
    return out.select(
        "user_id", F.round("exp_decayed_avg", 6).alias("exp_decayed_avg")
    ).orderBy("user_id")
