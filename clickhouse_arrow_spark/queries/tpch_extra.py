"""Third-wave corpus: deeper TPC-H-shaped analytics adapted to the
driver's schema (no l_shipmode/l_commitdate/p_container columns — each
query keeps the original's plan-shape challenge with available columns):
disjunctive predicate joins, correlated per-group thresholds, large-
volume HAVING, promo share, month-bucketed rollups, retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_arrow_spark.functions import ch_functions as ch
from clickhouse_arrow_spark.queries.base import register


@register(
    "q12_priority_by_status",
    """
    SELECT l_linestatus,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="TPC-H Q12 shape: join + conditional counts by priority class.",
    tags=("join", "aggregate", "conditional"),
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    li = spark.table("lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count_if(high).alias("high_count"),
            F.count_if(~high).alias("low_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_share",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    doc="TPC-H Q14: promo revenue share — broadcast dim join + ratio of "
    "conditional sums.",
    tags=("join", "aggregate", "conditional"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem").where(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = spark.table("part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_share")
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    doc="TPC-H Q17: correlated per-part average threshold — Catalyst "
    "decorrelates into an aggregate + join, no per-row subquery loop.",
    tags=("join", "subquery", "aggregate"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
        """
    )


@register(
    "bench_tpch_q18_volume",
    """
    SELECT c_custkey, o_orderkey, round(sum_qty, 2) AS total_qty
    FROM (
      SELECT o_custkey, l_orderkey AS o_orderkey, sum(l_quantity) AS sum_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey, l_orderkey
      HAVING sum(l_quantity) > 250
    ) big JOIN customer ON c_custkey = big.o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18: large-volume orders via HAVING, re-joined to the "
    "customer dim, top-k.",
    tags=("join", "aggregate", "having", "limit"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    li = spark.table("lineitem")
    c = spark.table("customer")
    big = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(c, big.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            F.col("l_orderkey").alias("o_orderkey"),
            F.round("sum_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q19_disjunctive_join",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19: disjunctive multi-clause predicate over a join — "
    "exercises CNF conversion / partial pushdown.",
    tags=("join", "filter", "aggregate"),
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem")
    p = spark.table("part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return j.where(clause).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: bilateral trade volume between two nations by year — "
    "double nation-dim broadcast join with a symmetric pair predicate.",
    tags=("join", "aggregate", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.table("supplier")
    li = spark.table("lineitem").where(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    o = spark.table("orders")
    c = spark.table("customer")
    n1 = spark.table("nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = spark.table("nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        AND p_type LIKE 'ECONOMY%'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8: national market share of one supplier nation within a "
    "region's imports of a part class — conditional-sum ratio over a "
    "6-way join.",
    tags=("join", "aggregate", "conditional", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spark.table("part").where(F.col("p_type").like("ECONOMY%"))
    li = spark.table("lineitem")
    s = spark.table("supplier")
    o = spark.table("orders").where(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    c = spark.table("customer")
    n1 = spark.table("nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = spark.table("region").where(F.col("r_name") == "ASIA")
    n2 = spark.table("nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        F.broadcast(p)
        .join(li, p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", volume).otherwise(0.0)
                )
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: distribution of order counts per customer (zero "
    "included via left join) — two-level aggregation. Adapted filter: "
    "priority<>URGENT replaces the original o_comment NOT LIKE (no "
    "comment column in this schema).",
    tags=("join", "outer", "aggregate", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: top supplier by quarterly revenue — the revenue view "
    "reused twice (agg + scalar max), matched exactly via the rounded "
    "value.",
    tags=("join", "aggregate", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
        """
    )


@register(
    "q22_global_sales_opportunity",
    """
    SELECT nation_group, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 5 AS INT) AS nation_group, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ) custsale
    GROUP BY nation_group
    ORDER BY nation_group
    """,
    doc="TPC-H Q22: untapped high-balance customers (above positive-"
    "average balance, never ordered) grouped by market. Adapted key: "
    "nationkey%5 replaces the original phone country-code substring "
    "(no phone column in this schema).",
    tags=("subquery", "anti", "aggregate", "tpch"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT nation_group, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM (
          SELECT CAST(c_nationkey % 5 AS INT) AS nation_group, c_acctbal
          FROM customer
          WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                             WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ) custsale
        GROUP BY nation_group
        ORDER BY nation_group
        """
    )


@register(
    "monthly_revenue_rollup",
    """
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS yyyymm,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Month-bucketed rollup via the toYYYYMM shim — the reference's "
    "PARTITION BY toYYYYMM(date) expression (src/lib.rs:53) used as an "
    "aggregation key; at scale this IS the partition column.",
    tags=("aggregate", "date", "partition-expr"),
)
def monthly_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    return (
        o.groupBy(ch.to_yyyymm("o_orderdate").alias("yyyymm"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("yyyymm")
    )


@register(
    "retention_daily_events",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
      FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS retained_pairs,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS retained_users
    FROM days a JOIN days b
      ON a.user_id = b.user_id AND b.d = a.d + INTERVAL 1 DAY
    """,
    doc="Day-over-day retention: distinct active days self-joined on "
    "(user, next day) — the standard cohort primitive; self-join keys "
    "on (user_id, day) so it shuffles once.",
    tags=("events", "retention", "join"),
)
def events_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        spark.table("events")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("d"))
        .distinct()
    )
    a = days.alias("a")
    b = days.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.d") == F.col("a.d") + F.expr("INTERVAL 1 DAY")),
        )
        .agg(
            F.count("*").alias("retained_pairs"),
            F.countDistinct("a.user_id").alias("retained_users"),
        )
    )


@register(
    "analytic_dedup_latest",
    """
    SELECT user_id, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    doc="Keep-latest-row-per-key dedup via ranking window — ClickHouse "
    "ReplacingMergeTree/LIMIT BY analogue.",
    tags=("window", "dedup"),
)
def analytic_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        spark.table("events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id", "event_type")
    )


@register(
    "sample_tablesample",
    """
    SELECT CAST(count(*) AS BIGINT) AS total, true AS frac_ok
    FROM orders
    """,
    doc="TABLESAMPLE / df.sample with a fixed seed (ClickHouse SAMPLE BY "
    "read path). The RNG is engine-specific, so the gate asserts the "
    "sampled fraction lands within 4% absolute of the requested 10% "
    "(>=5 sigma at the smallest test SF); the oracle pins frac_ok true "
    "and supplies the total row count for the hash.",
    tags=("sample", "gate"),
)
def sample_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    sampled = o.sample(fraction=0.1, seed=42).agg(F.count("*").alias("_n"))
    total = o.agg(F.count("*").alias("total"))
    return total.crossJoin(sampled).select(
        "total",
        (
            F.abs(F.col("_n") / F.col("total") - 0.1) <= 0.04
        ).alias("frac_ok"),
    )


@register(
    "join_salted_skew",
    """
    SELECT o_orderstatus,
           count(*) AS n,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Salted skew-join (operators/skew.salted_join): key salting "
    "spreads a hot key over N tasks; result is row-identical to the "
    "plain join, which IS the oracle.",
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_arrow_spark.operators.skew import salted_join

    li = spark.table("lineitem").select("l_orderkey", "l_quantity")
    o = spark.table("orders").select("o_orderkey", "o_orderstatus")
    joined = salted_join(li, o, "l_orderkey", "o_orderkey", salt=8)
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "grouped_map_zscore",
    """
    SELECT l_orderkey, l_linenumber, zscore FROM (
      SELECT l_orderkey, l_linenumber,
             round((l_extendedprice
                    - avg(l_extendedprice) OVER (PARTITION BY l_returnflag))
                   / stddev_samp(l_extendedprice) OVER (PARTITION BY l_returnflag),
                   6) AS zscore
      FROM lineitem
    ) WHERE l_orderkey <= 500
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Per-group normalization. Spark side runs applyInPandas (grouped "
    "map over l_returnflag) — the custom-UDAF template — checked against "
    "a pure-SQL window oracle.",
    tags=("pandas-udf", "grouped-map", "window"),
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["l_extendedprice"].mean()
        sd = pdf["l_extendedprice"].std(ddof=1)
        out = pdf[["l_orderkey", "l_linenumber"]].copy()
        out["zscore"] = ((pdf["l_extendedprice"] - mu) / sd).round(6)
        return out

    li = spark.table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .applyInPandas(zscore, schema="l_orderkey long, l_linenumber int, zscore double")
        .where(F.col("l_orderkey") <= 500)
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Fourth wave: the remaining TPC-H shapes. The driver schema has no
# partsupp table and no l_commitdate/l_receiptdate columns, so each query
# below keeps the original's PLAN-shape challenge with available data:
# lineitem doubles as the part-supplier offer table (Q2/Q11/Q16/Q20), and
# "late" is l_shipdate > o_orderdate + 60 days (Q4/Q21).
# ---------------------------------------------------------------------------


_Q2_SQL = """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             round(avg(l_extendedprice / l_quantity), 4) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM part JOIN offers ON p_partkey = offers.l_partkey
      JOIN supplier ON s_suppkey = offers.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 10 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      AND unit_cost = (SELECT min(o2.unit_cost) FROM offers o2
                       JOIN supplier s2 ON s2.s_suppkey = o2.l_suppkey
                       JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                       JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                       WHERE o2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


@register(
    "q2_min_cost_supplier",
    _Q2_SQL,
    doc="TPC-H Q2 shape: min-cost supplier per part within a region — a "
    "correlated scalar-min subquery over a 4-way dim join, decorrelated "
    "by Catalyst into an aggregate+join (no per-row re-execution). "
    "lineitem avg unit price stands in for ps_supplycost (no partsupp "
    "table in this schema); the rounded value makes the min-equality "
    "match exact across engines.",
    tags=("join", "subquery", "aggregate", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_Q2_SQL)


_Q4_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register(
    "q4_order_priority",
    _Q4_SQL,
    doc="TPC-H Q4 shape: priority counts of orders with a late line — "
    "correlated EXISTS with an inequality on the OUTER column becomes a "
    "left-semi join, so the fact table is scanned once. 'Late' adapted "
    "to shipdate > orderdate + 60 days (no l_commitdate/l_receiptdate).",
    tags=("subquery", "semi", "aggregate", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_Q4_SQL)


@register(
    "q9_product_type_profit",
    """
    SELECT n_name AS nation, year(l_shipdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - p_retailprice * 0.6 * l_quantity), 2) AS sum_profit
    FROM lineitem JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(l_shipdate)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and ship year. Both "
    "dims broadcast (part filtered by LIKE, supplier+nation tiny), so "
    "the fact side never shuffles before the partial agg. Supply cost "
    "adapted to 60% of p_retailprice (no partsupp table).",
    tags=("join", "broadcast", "aggregate", "tpch"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem")
    p = spark.table("part").where(F.col("p_name").like("%red%"))
    s = spark.table("supplier")
    n = spark.table("nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.6) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


_Q11_SQL = """
    WITH val AS (
      SELECT l_partkey AS p_key,
             sum(l_extendedprice * l_quantity) AS part_value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_8') GROUP BY l_partkey)
    SELECT p_key, round(part_value, 2) AS part_value FROM val
    WHERE part_value > (SELECT sum(part_value) * 0.001 FROM val)
    ORDER BY part_value DESC, p_key
"""


@register(
    "q11_important_parts",
    _Q11_SQL,
    doc="TPC-H Q11 shape: parts whose held value exceeds a fraction of "
    "the GLOBAL total — the same aggregate reused as both per-group "
    "value and scalar threshold. lineitem value over two nations stands "
    "in for partsupp stock value.",
    tags=("subquery", "aggregate", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_Q11_SQL)


@register(
    "q16_supplier_part_count",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
    doc="TPC-H Q16 shape: distinct supplier count per part attribute "
    "with a NOT-IN exclusion list. The exclusion subquery broadcasts as "
    "a null-aware anti join; count(DISTINCT) expands partially map-side.",
    tags=("subquery", "anti", "aggregate", "tpch"),
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem")
    p = spark.table("part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = spark.table("supplier").where(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(50)
    )


_Q20_SQL = """
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 2
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
    ORDER BY s_name
"""


@register(
    "q20_heavy_shippers",
    _Q20_SQL,
    doc="TPC-H Q20 shape: suppliers in one region who shipped a large "
    "volume of a part class in a year — IN over a grouped-HAVING "
    "subquery (semi join against an aggregate). Shipment volume stands "
    "in for excess stock (no partsupp availqty).",
    tags=("subquery", "semi", "having", "tpch"),
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_Q20_SQL)


_Q21_SQL = """
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_regionkey = 1
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25
"""


@register(
    "q21_waiting_suppliers",
    _Q21_SQL,
    doc="TPC-H Q21 shape: the sole late supplier on multi-supplier "
    "orders — EXISTS + NOT EXISTS self-joins on the fact table, both "
    "correlated on the join key so they compile to semi/anti hash joins "
    "keyed on l_orderkey. 'Late' adapted to shipdate > orderdate + 60 "
    "days.",
    tags=("subquery", "semi", "anti", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_Q21_SQL)
