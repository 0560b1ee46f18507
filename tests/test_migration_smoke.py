"""Migration smoke battery: realistic ClickHouse-dialect queries (the
shapes a migrating user's dashboards and ETL actually contain, composed
from the ClickHouse docs' idioms) must EXECUTE end-to-end through
`Client.query_ch` against the TPC-H/events/documents tables and return
plausible row counts. This is the breadth net over the dialect waves:
any rewrite regression that breaks composition (aliases + LIMIT BY +
WITH FILL + combinators in one statement) surfaces here first.
"""

from __future__ import annotations

import pytest

from clickhouse_arrow_spark.client import Client
from clickhouse_arrow_spark.sources import register_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ch(spark):
    register_tables(spark, SF_DIR)
    return Client(spark)


QUERIES = [
    # dashboards: top-n with computed aliases reused in WHERE
    ("SELECT o_custkey, sum(o_totalprice) AS spend FROM orders "
     "GROUP BY o_custkey HAVING spend > 100000 ORDER BY spend DESC LIMIT 10",
     (0, 10)),
    # date bucketing + countIf combinators
    ("SELECT toStartOfMonth(o_orderdate) AS m, count() AS n, "
     "countIf(o_orderpriority = '1-URGENT') AS urgent "
     "FROM orders GROUP BY m ORDER BY m",
     (1, 200)),
    # quantiles + avgIf
    ("SELECT quantile(0.5)(l_extendedprice) AS med, "
     "avgIf(l_discount, l_quantity > 10) AS disc "
     "FROM lineitem",
     (1, 1)),
    # uniq + groupArray over a join
    ("SELECT n_name, uniq(c_custkey) AS custs "
     "FROM customer JOIN nation ON c_nationkey = n_nationkey "
     "GROUP BY n_name ORDER BY custs DESC, n_name LIMIT 5",
     (1, 5)),
    # LIMIT BY (first order per customer)
    ("SELECT o_custkey, o_orderkey, o_orderdate FROM orders "
     "ORDER BY o_custkey, o_orderdate LIMIT 1 BY o_custkey LIMIT 20",
     (1, 20)),
    # argMax + alias reuse
    ("SELECT o_orderpriority, argMax(o_orderkey, o_totalprice) AS biggest "
     "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
     (1, 10)),
    # multiIf + string functions
    ("SELECT multiIf(o_totalprice > 200000, 'big', o_totalprice > 50000, "
     "'mid', 'small') AS bucket, count() AS n FROM orders "
     "GROUP BY bucket ORDER BY bucket",
     (1, 3)),
    # scalar WITH + IN subquery
    ("WITH 5 AS topn SELECT o_orderkey FROM orders WHERE o_custkey IN "
     "(SELECT c_custkey FROM customer ORDER BY c_acctbal DESC LIMIT 10) "
     "ORDER BY o_orderkey LIMIT 5",
     (0, 5)),
    # QUALIFY window filter
    ("SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
     "QUALIFY row_number() OVER (PARTITION BY o_custkey "
     "ORDER BY o_totalprice DESC) = 1 ORDER BY o_custkey LIMIT 15",
     (1, 15)),
    # arrays: groupArray + higher-order lambda
    ("SELECT arraySum(arrayMap(x -> x * 2, groupArray(o_totalprice))) AS s "
     "FROM (SELECT o_totalprice FROM orders LIMIT 100)",
     (1, 1)),
    # dates: dateDiff + addMonths + toYYYYMM
    ("SELECT toYYYYMM(o_orderdate) AS ym, "
     "min(dateDiff('day', o_orderdate, addMonths(o_orderdate, 1))) AS span "
     "FROM orders GROUP BY ym ORDER BY ym LIMIT 12",
     (1, 12)),
    # CASE + position + concat
    ("SELECT concat(c_name, '-', toString(c_nationkey)) AS tag "
     "FROM customer WHERE position(c_name, 'Customer') > 0 "
     "ORDER BY tag LIMIT 5",
     (0, 5)),
    # events: sequence-ish windowed count per user
    ("SELECT user_id, count() AS n, uniqExact(event_type) AS kinds "
     "FROM events GROUP BY user_id HAVING n >= 2 "
     "ORDER BY n DESC, user_id LIMIT 10",
     (0, 10)),
    # system tables
    ("SELECT count() AS n FROM (SELECT number FROM system.numbers LIMIT 100)",
     (1, 1)),
    # DISTINCT ON
    ("SELECT DISTINCT ON (o_orderpriority) o_orderpriority, o_orderkey "
     "FROM orders ORDER BY o_orderpriority, o_orderkey",
     (1, 10)),
    # star modifiers
    ("SELECT * EXCEPT (o_orderpriority, o_orderstatus) FROM orders "
     "ORDER BY o_orderkey LIMIT 3",
     (3, 3)),
    # join + global in + parameterless count
    ("SELECT count() AS n FROM lineitem WHERE l_orderkey GLOBAL IN "
     "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')",
     (1, 1)),
    # formatting + rounding family
    ("SELECT round(avg(l_tax), 4) AS t, floor(sum(l_quantity)) AS q, "
     "intDiv(count(), 10) AS tenth FROM lineitem",
     (1, 1)),
    # CH-typed CAST + accurateCastOrNull
    ("SELECT CAST(o_orderkey AS Nullable(Int64)) AS k, "
     "accurateCastOrNull(o_orderpriority, 'Int64') AS junk "
     "FROM orders ORDER BY k LIMIT 2",
     (2, 2)),
    # WITH TOTALS
    ("SELECT o_orderstatus, count() AS n FROM orders "
     "GROUP BY o_orderstatus WITH TOTALS ORDER BY n",
     (2, 10)),
]


@pytest.mark.parametrize("sql,bounds", QUERIES, ids=[q[:48] for q, _ in QUERIES])
def test_migration_query_executes(ch, sql, bounds):
    rows = ch.query_ch(sql).collect()
    lo, hi = bounds
    assert lo <= len(rows) <= hi, f"{len(rows)} rows outside [{lo}, {hi}]"
