"""Relational correctness corpus — the query surface from SURVEY.md §2.3:
every shape the reference ships to ClickHouse (scans, filters,
projections, limits) plus the classical operators the task places on
Catalyst (joins of every type, aggregations incl. grouping sets/rollup/
cube, windows, sorts/top-k, set ops, subqueries).

Scale notes (100 TB posture), per query where it matters:
- dimension joins (region/nation/supplier/part at TPC-H ratios) are
  explicitly `F.broadcast()` — no shuffle of the fact table;
- aggregations run as partial (map-side) + final automatically since
  every agg here is algebraic — no `collect`, no driver loops;
- top-k is `ORDER BY + LIMIT`, which Spark executes as per-partition
  TakeOrdered (no global sort);
- window functions partition on high-cardinality keys (custkey etc.),
  never a global `ORDER BY` over everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from clickhouse_arrow_spark.queries.base import register

# ---------------------------------------------------------------------------
# scans / filters / projections / limits  (reference benches/query.rs shape)
# ---------------------------------------------------------------------------


@register(
    "scan_project_limit",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
    doc="LIMIT-scan with projection — the reference's query-bench shape "
    "(benches/query.rs:36). Column pruning reaches the parquet scan.",
    tags=("scan", "limit"),
)
def scan_project_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "filter_pushdown",
    """
    SELECT l_orderkey, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-02-01'
      AND l_returnflag = 'R'
      AND l_quantity > 45
    ORDER BY l_orderkey, l_quantity, l_shipdate
    """,
    doc="Conjunctive predicate scan; filters reach PushedFilters in the "
    "parquet scan node (verified in tests/test_plans.py).",
    tags=("scan", "filter"),
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-02-01")
            & (F.col("l_returnflag") == "R")
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_quantity", "l_shipdate")
    )


@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="Top-k: Spark plans TakeOrderedAndProject — per-partition heaps, "
    "no global sort; O(k) driver memory at any scale.",
    headline=True,
    tags=("sort", "limit"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .drop("o_totalprice")
    )


# ---------------------------------------------------------------------------
# aggregation family
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary — wide algebraic aggregation; partial "
    "aggregation map-side, 6 groups total so the final exchange is tiny.",
    headline=True,
    tags=("aggregate",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem").where(F.col("l_shipdate") <= "2001-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 — selective scan + global agg; no shuffle at all "
    "(single-group partial agg).",
    tags=("aggregate", "filter"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem")
    return li.where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n,
           CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
           CAST(grouping(l_linestatus) AS TINYINT) AS g_ls
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP with grouping() markers.",
    tags=("aggregate", "grouping-sets"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
            F.grouping("l_returnflag").alias("g_rf"),
            F.grouping("l_linestatus").alias("g_ls"),
        )
        .orderBy(
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="CUBE over two dims.",
    tags=("aggregate", "grouping-sets"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "agg_grouping_sets",
    """
    SELECT n_name, c_mktsegment, count(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
    ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST
    """,
    doc="Explicit GROUPING SETS via SQL (Catalyst Expand operator).",
    tags=("aggregate", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT n_name, c_mktsegment, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST
        """
    )


@register(
    "agg_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT l_partkey)  AS BIGINT) AS n_parts,
           CAST(sum(DISTINCT l_linenumber) AS BIGINT) AS sum_distinct_ln
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Multi distinct aggregates (Catalyst expands to multi-phase agg).",
    tags=("aggregate", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum_distinct(F.col("l_linenumber").cast("long")).alias(
                "sum_distinct_ln"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_conditional",
    """
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice ELSE 0 END), 2) AS urgent_total,
           round(avg(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice END), 4) AS urgent_avg
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Conditional aggregation — ClickHouse countIf/sumIf/avgIf family "
    "re-expressed with FILTER/CASE.",
    tags=("aggregate", "conditional"),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.round(F.sum(F.coalesce(urgent, F.lit(0.0))), 2).alias("urgent_total"),
            F.round(F.avg(urgent), 4).alias("urgent_avg"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(min(l_extendedprice), 2)         AS min_price,
           round(max(l_extendedprice), 2)         AS max_price,
           round(avg(l_extendedprice), 4)         AS avg_price,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_extendedprice), 4)    AS var_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Statistical aggregates.",
    tags=("aggregate", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_extendedprice"), 4).alias("var_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_percentile",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Exact interpolated percentiles — ClickHouse quantile() analogue. "
    "Spark percentile() and DuckDB quantile_cont() both interpolate "
    "linearly.",
    tags=("aggregate", "percentile"),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_argmax",
    """
    SELECT n_name,
           max_by(s_name, s_acctbal) AS top_supplier,
           round(max(s_acctbal), 2)  AS top_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="argMax — ClickHouse argMax(a, b) == Spark/DuckDB max_by.",
    tags=("aggregate", "argmax"),
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.table("supplier")
    n = spark.table("nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("s_name", "s_acctbal").alias("top_supplier"),
            F.round(F.max("s_acctbal"), 2).alias("top_bal"),
        )
        .orderBy("n_name")
    )


@register(
    "agg_collect_list",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           CAST(len(list(n_name)) AS INT) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    doc="groupArray analogue: collect_list + sort for determinism. The "
    "array is built in the plan; the emitted column is array_join'ed so "
    "the driver's canonicalizer (pandas hash) can digest it.",
    tags=("aggregate", "collect"),
)
def agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations"),
            F.size(F.collect_list("n_name")).alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "agg_approx_distinct",
    None,  # approx algorithms differ between engines — rows-only check
    doc="approx_count_distinct (HLL++) — ClickHouse uniq() analogue. "
    "No cross-engine oracle: sketch implementations differ.",
    tags=("aggregate", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey").alias("approx_orders"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_dim",
    """
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="Fact-dim join with explicit broadcast of part — the fact side "
    "never shuffles; at 100 TB this is the difference between a "
    "broadcast exchange of MBs and a shuffle of TBs.",
    headline=True,
    tags=("join", "broadcast", "aggregate"),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem")
    p = spark.table("part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_brand")
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 — 3-way join, filter on both sides, agg, top-k.",
    headline=True,
    tags=("join", "aggregate", "limit"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer").where(F.col("c_mktsegment") == "BUILDING")
    o = spark.table("orders").where(F.col("o_orderdate") < "1998-03-15")
    li = spark.table("lineitem").where(F.col("l_shipdate") > "1998-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 — 6-way join; nation/region/supplier broadcast, "
    "customer⋈orders⋈lineitem shuffle on the key they share.",
    headline=True,
    tags=("join", "aggregate"),
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = spark.table("lineitem")
    s = spark.table("supplier")
    n = spark.table("nation")
    r = spark.table("region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 — returned-item revenue per customer, top 20.",
    tags=("join", "aggregate", "limit"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders").where(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = spark.table("lineitem").where(F.col("l_returnflag") == "R")
    n = spark.table("nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "join_left_outer",
    """
    SELECT c_custkey,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    doc="Left outer join preserving customers with no orders.",
    tags=("join", "outer"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_right_outer",
    """
    SELECT o_orderkey, c_name
    FROM customer RIGHT JOIN orders ON c_custkey = o_custkey
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
    doc="Right outer join (oracle uses the mirrored RIGHT JOIN).",
    tags=("join", "outer"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "right")
        .where(F.col("o_orderkey") <= 1000)
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


@register(
    "join_full_outer",
    """
    WITH cn AS (SELECT c_nationkey AS k, count(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS k, count(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.k, sn.k) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    ORDER BY nationkey
    """,
    doc="Full outer join of per-nation customer/supplier counts.",
    tags=("join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        spark.table("customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        spark.table("supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cn.join(sn, cn.k == sn.k, "full_outer")
        .select(
            F.coalesce(cn.k, sn.k).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    doc="Left-semi join (EXISTS) — no row duplication, build side only "
    "emits the key.",
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left-anti join (NOT EXISTS) — customers without orders.",
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_cross",
    """
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
    doc="Cross join (tiny dims only — a deliberate anti-pattern guard: "
    "both sides broadcastable).",
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("region")
        .crossJoin(spark.table("nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@register(
    "join_range_nonequi",
    """
    SELECT p_size AS bucket_size,
           count(*) AS n_parts,
           round(avg(p_retailprice), 4) AS avg_price
    FROM part JOIN (SELECT DISTINCT p_size AS s FROM part) sizes
      ON p_size >= sizes.s - 1 AND p_size <= sizes.s + 1 AND sizes.s = 25
    GROUP BY p_size
    ORDER BY p_size
    """,
    doc="Non-equi (range) join — banded match on p_size.",
    tags=("join", "range"),
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spark.table("part")
    sizes = p.select(F.col("p_size").alias("s")).distinct().where(F.col("s") == 25)
    return (
        p.join(
            F.broadcast(sizes),
            (p.p_size >= sizes.s - 1) & (p.p_size <= sizes.s + 1),
        )
        .groupBy(F.col("p_size").alias("bucket_size"))
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .orderBy("bucket_size")
    )


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------


@register(
    "window_rank_topn",
    """
    SELECT * FROM (
      SELECT n_name, s_name, round(s_acctbal, 2) AS bal,
             CAST(row_number() OVER w AS INT) AS rn,
             CAST(rank()       OVER w AS INT) AS rnk,
             CAST(dense_rank() OVER w AS INT) AS drnk
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey)
    ) WHERE rn <= 3
    ORDER BY n_name, rn
    """,
    doc="Ranking window + top-N per group. Partitioned window — no "
    "global sort; each nation sorts independently.",
    tags=("window", "rank"),
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.table("supplier")
    n = spark.table("nation")
    w = W.partitionBy("n_name").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "s_name",
            F.round("s_acctbal", 2).alias("bal"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("n_name", "rn")
    )


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    WHERE o_custkey <= 50
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Running sum with an explicit ROWS frame.",
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spark.table("orders")
        .where(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           round(o_totalprice - lag(o_totalprice) OVER w, 2)  AS delta_prev,
           round(lead(o_totalprice) OVER w - o_totalprice, 2) AS delta_next
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="lag/lead offsets — ClickHouse neighbor() analogue.",
    tags=("window", "offset"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    p = F.col("o_totalprice")
    return (
        spark.table("orders")
        .where(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(p - F.lag(p).over(w), 2).alias("delta_prev"),
            F.round(F.lead(p).over(w) - p, 2).alias("delta_next"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_moving_avg",
    """
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
    FROM orders
    WHERE o_custkey <= 50
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Moving average over a bounded ROWS frame.",
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return (
        spark.table("orders")
        .where(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.avg("o_totalprice").over(w), 4).alias("ma3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_distribution",
    """
    SELECT s_suppkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist()    OVER w, 6) AS cd
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_suppkey
    """,
    doc="Distribution window functions (ntile/percent_rank/cume_dist).",
    tags=("window", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.orderBy("s_acctbal", "s_suppkey")
    return (
        spark.table("supplier")
        .select(
            "s_suppkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


@register(
    "setop_union_all",
    """
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    ) ORDER BY k
    """,
    doc="UNION ALL.",
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer").select(F.col("c_nationkey").alias("k"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionAll(s).orderBy("k")


@register(
    "setop_union_distinct",
    """
    SELECT c_nationkey AS k FROM customer
    UNION
    SELECT s_nationkey AS k FROM supplier
    ORDER BY k
    """,
    doc="UNION DISTINCT.",
    tags=("setop", "distinct"),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer").select(F.col("c_nationkey").alias("k"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().orderBy("k")


@register(
    "setop_intersect",
    """
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    ORDER BY k
    """,
    doc="INTERSECT (distinct semantics).",
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer").select(F.col("c_nationkey").alias("k"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


@register(
    "setop_except",
    """
    SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000
    ORDER BY k
    """,
    doc="EXCEPT (distinct semantics).",
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        spark.table("customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("k"))
    )
    s = (
        spark.table("supplier")
        .where(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("k"))
    )
    # EXCEPT has set semantics: distinct both sides, then subtract.
    return c.distinct().subtract(s.distinct()).orderBy("k")


# ---------------------------------------------------------------------------
# subqueries
# ---------------------------------------------------------------------------


@register(
    "subquery_scalar",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
    ORDER BY o_orderkey
    """,
    doc="Uncorrelated scalar subquery in a predicate.",
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS total
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "subquery_in",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey = 2)
    ORDER BY s_suppkey
    """,
    doc="IN-subquery (planned as left-semi).",
    tags=("subquery", "semi"),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 2)
        ORDER BY s_suppkey
        """
    )


@register(
    "subquery_correlated_exists",
    """
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 adaptation — correlated EXISTS, decorrelated by "
    "Catalyst into a semi join.",
    tags=("subquery", "semi", "aggregate"),
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "having_groups",
    """
    SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > (SELECT avg(l_quantity) FROM lineitem) * 120
    ORDER BY total_qty DESC, l_suppkey
    """,
    doc="HAVING with scalar subquery threshold.",
    tags=("aggregate", "subquery"),
)
def having_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty
        FROM lineitem
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > (SELECT avg(l_quantity) FROM lineitem) * 120
        ORDER BY total_qty DESC, l_suppkey
        """
    )


# ---------------------------------------------------------------------------
# sampling (ClickHouse SAMPLE BY analogue — deterministic variant for oracle)
# ---------------------------------------------------------------------------


@register(
    "sample_deterministic",
    """
    SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS keysum
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    doc="Deterministic 10% sample via key modulus — the oracle-able "
    "stand-in for SAMPLE BY (hash-based TABLESAMPLE is engine-specific; "
    "df.sample() covered by rows-only tests).",
    tags=("sample",),
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("orders")
        .where(F.col("o_orderkey") % 10 == 0)
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").alias("keysum"),
        )
    )
