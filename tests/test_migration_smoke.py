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
    # ---- round-5 widening: waves 8-11 + new forms ----
    # :: casts (wave: colon casts)
    ("SELECT o_orderkey::String AS k, o_totalprice::Int64 AS p "
     "FROM orders ORDER BY o_orderkey LIMIT 3",
     (3, 3)),
    # scalar WITH visible inside subquery (global_with)
    ("WITH 100000 AS cutoff SELECT count() AS n FROM "
     "(SELECT o_orderkey FROM orders WHERE o_totalprice > cutoff)",
     (1, 1)),
    # chained scalar WITH expressions
    ("WITH 2 AS a, a * 3 AS b SELECT b * count() AS n FROM nation",
     (1, 1)),
    # JSON family over events.props (wave: JSON varargs / depth)
    ("SELECT JSONExtractString(props, 'device') AS device, count() AS n "
     "FROM events GROUP BY device ORDER BY n DESC LIMIT 5",
     (1, 5)),
    ("SELECT count() AS n FROM events WHERE JSONHas(props, 'device')",
     (1, 1)),
    # visitParamExtract legacy spelling
    ("SELECT simpleJSONExtractString(props, 'device') AS d FROM events "
     "ORDER BY event_id LIMIT 3",
     (3, 3)),
    # PREWHERE + alias in it
    ("SELECT o_orderkey, o_totalprice * 2 AS dbl FROM orders "
     "PREWHERE dbl > 500000 ORDER BY o_orderkey LIMIT 5",
     (0, 5)),
    # TOP form
    ("SELECT TOP 4 o_orderkey FROM orders ORDER BY o_totalprice DESC",
     (4, 4)),
    # LIMIT offset, count (MySQL form)
    ("SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5, 3",
     (3, 3)),
    # tuple literal + positional access
    ("SELECT (o_orderkey, o_custkey).1 AS k FROM orders "
     "ORDER BY k LIMIT 2",
     (2, 2)),
    # array literal + subscript (1-based) + has()
    ("SELECT [10, 20, 30][2] AS x, has([1, 2, 3], 2) AS h",
     (1, 1)),
    # arrayJoin in select list
    ("SELECT arrayJoin([1, 2, 3]) AS x FROM (SELECT 1) ORDER BY x",
     (3, 3)),
    # multi-array ARRAY JOIN lockstep (round 5)
    ("SELECT n_nationkey, x, y FROM (SELECT n_nationkey, "
     "[n_nationkey, n_nationkey + 1] AS a, ['p', 'q'] AS b FROM nation "
     "WHERE n_nationkey < 3) ARRAY JOIN a AS x, b AS y ORDER BY n_nationkey, x",
     (6, 6)),
    # aggregate combinators: sumIf / uniqExactIf / countDistinct
    ("SELECT sumIf(l_quantity, l_returnflag = 'R') AS rq, "
     "uniqExactIf(l_orderkey, l_discount > 0.05) AS ods "
     "FROM lineitem",
     (1, 1)),
    # -OrNull / -OrDefault combinators
    ("SELECT maxOrNull(o_totalprice) AS m, sumOrDefault(o_totalprice) AS s "
     "FROM orders WHERE o_orderkey < 0",
     (1, 1)),
    # quantiles multi + topK
    ("SELECT quantiles(0.25, 0.5, 0.75)(l_extendedprice) AS qs FROM lineitem",
     (1, 1)),
    # -Array combinator over grouped arrays
    ("SELECT sumArray(arr) AS s FROM (SELECT o_orderstatus, "
     "groupArray(o_totalprice) AS arr FROM orders GROUP BY o_orderstatus)",
     (1, 1)),
    # map construction + access
    ("SELECT map('a', 1, 'b', 2)['b'] AS v",
     (1, 1)),
    # string functions battery
    ("SELECT lowerUTF8(c_name) AS l, substring(c_name, 1, 8) AS s, "
     "splitByChar('#', c_name) AS parts FROM customer "
     "ORDER BY c_custkey LIMIT 2",
     (2, 2)),
    # date specifiers: formatDateTime + toStartOfWeek + INTERVAL
    ("SELECT formatDateTime(o_orderdate, '%Y-%m') AS ym, count() AS n "
     "FROM orders WHERE o_orderdate > toDate('1995-01-01') - INTERVAL 1 MONTH "
     "GROUP BY ym ORDER BY ym LIMIT 6",
     (1, 6)),
    # toStartOfInterval + now() sanity
    ("SELECT toStartOfInterval(o_orderdate, INTERVAL 1 YEAR) AS y, "
     "count() AS n FROM orders GROUP BY y ORDER BY y",
     (1, 12)),
    # conditional chains: if/ifNull/nullIf/coalesce
    ("SELECT if(o_totalprice > 100000, 'hi', 'lo') AS t, "
     "ifNull(nullIf(o_orderstatus, 'O'), 'open') AS s "
     "FROM orders ORDER BY o_orderkey LIMIT 4",
     (4, 4)),
    # math/bits: bitAnd + modulo + pow
    ("SELECT bitAnd(o_orderkey, 255) AS b, o_orderkey % 7 AS m, "
     "pow(2, 10) AS p FROM orders ORDER BY o_orderkey LIMIT 2",
     (2, 2)),
    # geo distance
    ("SELECT round(greatCircleDistance(-0.13, 51.5, 2.35, 48.85)) AS d",
     (1, 1)),
    # text distance tier
    ("SELECT editDistance(c_name, 'Customer#000000001') AS ed "
     "FROM customer ORDER BY ed, c_custkey LIMIT 3",
     (3, 3)),
    # uniq sketches family
    ("SELECT uniq(l_orderkey) AS u1, uniqCombined(l_orderkey) AS u2, "
     "uniqHLL12(l_orderkey) AS u3 FROM lineitem",
     (1, 1)),
    # bare INTERSECT (CH = ALL multiplicity)
    ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' INTERSECT "
     "SELECT o_custkey FROM orders WHERE o_totalprice > 1000",
     (1, 100000)),
    # UNION DISTINCT spelled out
    ("SELECT n_regionkey AS k FROM nation UNION DISTINCT "
     "SELECT r_regionkey AS k FROM region ORDER BY k",
     (5, 5)),
    # window frames + lagInFrame
    ("SELECT o_orderkey, o_totalprice - lagInFrame(o_totalprice, 1, 0.0) "
     "OVER (ORDER BY o_orderkey ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) "
     "AS delta FROM orders ORDER BY o_orderkey LIMIT 5",
     (5, 5)),
    # EXISTS table-check + EXISTS subquery filter
    ("SELECT count() AS n FROM orders o WHERE EXISTS "
     "(SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey)",
     (1, 1)),
    # COLUMNS regex + APPLY (round 5, catalog-resolved)
    ("SELECT COLUMNS('^l_q') APPLY(max) FROM lineitem",
     (1, 1)),
    # * APPLY over a narrow table
    ("SELECT * APPLY(count) FROM region",
     (1, 1)),
    # IN tuple-list
    ("SELECT count() AS n FROM orders WHERE o_orderstatus IN ('F', 'O')",
     (1, 1)),
    # length/empty/notEmpty over strings and arrays
    ("SELECT length(c_name) AS lc, empty(c_name) AS e, "
     "notEmpty(groupArray(c_custkey)) AS ne FROM customer "
     "GROUP BY c_name ORDER BY c_name LIMIT 2",
     (2, 2)),
    # runningDifference-style via window + alias reuse in HAVING
    ("SELECT l_returnflag, sum(l_extendedprice * (1 - l_discount)) AS rev "
     "FROM lineitem GROUP BY l_returnflag HAVING rev > 0 "
     "ORDER BY l_returnflag",
     (1, 3)),
    # ---- round-6 widening: sweep-wave forms + statement forms ----
    # numbers() TVF, plain and joined
    ("SELECT number * 2 AS n FROM numbers(5) ORDER BY n",
     (5, 5)),
    ("SELECT count() AS n FROM numbers(100) WHERE number % 3 = 0",
     (1, 1)),
    # map family: literal + keys/values/contains
    ("SELECT mapKeys(map('a', 1, 'b', 2)) AS ks, "
     "mapValues(map('a', 1, 'b', 2)) AS vs, "
     "mapContains(map('a', 1), 'a') AS has_a",
     (1, 1)),
    ("SELECT mapFromArrays(['x', 'y'], [10, 20])['y'] AS v",
     (1, 1)),
    # tuple math
    ("SELECT tuplePlus((1, 2), (10, 20)) AS tp, "
     "tupleMultiply((2, 3), (4, 5)) AS tm, "
     "dotProduct((1, 2, 3), (4, 5, 6)) AS dp",
     (1, 1)),
    # URL helpers over synthesized URLs
    ("SELECT domain(u) AS d, path(u) AS p, protocol(u) AS pr, "
     "extractURLParameter(u, 'q') AS q FROM (SELECT "
     "'https://shop.example.com/cart/item?q=7&r=2' AS u)",
     (1, 1)),
    ("SELECT cutQueryString('https://h.io/a/b?x=1') AS clean, "
     "queryString('https://h.io/a/b?x=1&y=2') AS qs, "
     "topLevelDomain('https://docs.example.org/p') AS tld",
     (1, 1)),
    # key-lambda array sort + arrayStringConcat
    ("SELECT arraySort(x -> -x, [3, 1, 2]) AS desc_sorted, "
     "arrayStringConcat(['a', 'b', 'c'], '-') AS joined",
     (1, 1)),
    # substringIndex + gcd/lcm (Euclid bound fixed round 5)
    ("SELECT substringIndex('a.b.c.d', '.', 2) AS pre, "
     "gcd(1071, 462) AS g, lcm(4, 6) AS l",
     (1, 1)),
    # CH-exact division family
    ("SELECT intDivOrZero(o_orderkey, 0) AS z, "
     "moduloOrZero(o_orderkey, 0) AS m, divide(o_orderkey, 4) AS d "
     "FROM orders ORDER BY o_orderkey LIMIT 2",
     (2, 2)),
    # operator-named arithmetic
    ("SELECT plus(1, 2) AS a, minus(10, 4) AS b, multiply(3, 7) AS c, "
     "negate(5) AS d",
     (1, 1)),
    # array math family
    ("SELECT arrayDifference([1, 4, 9, 16]) AS d, "
     "arrayCumSum([1, 2, 3]) AS c, arrayAvg([2, 4, 6]) AS a, "
     "arrayMax([5, 1, 9]) AS m",
     (1, 1)),
    # arrayZip + arrayEnumerate
    ("SELECT arrayZip(['a', 'b'], [1, 2]) AS z, "
     "arrayEnumerate([9, 9, 9]) AS e",
     (1, 1)),
    # weighted quantile
    ("SELECT quantileExactWeighted(0.5)(l_quantity, "
     "toUInt32(l_linenumber)) AS wq FROM lineitem",
     (1, 1)),
    # pointInPolygon
    ("SELECT pointInPolygon((0.5, 0.5), [(0, 0), (1, 0), (1, 1), (0, 1)]) "
     "AS inside",
     (1, 1)),
    # cosine distance + L2 norm over number arrays
    ("SELECT round(cosineDistance([1.0, 0.0], [0.0, 1.0]), 6) AS cd, "
     "L2Norm([3.0, 4.0]) AS n",
     (1, 1)),
    # bit shifts
    ("SELECT bitShiftLeft(1, 10) AS k, bitAnd(12, 10) AS a",
     (1, 1)),
    # SHOW SETTINGS / getSetting statement forms (round 5)
    ("SHOW SETTINGS LIKE 'max%'",
     (1, 500)),
    ("SELECT getSetting('max_threads') AS t",
     (1, 1)),
    # SHOW CREATE TABLE round-trips a registered view
    ("SHOW CREATE TABLE nation",
     (1, 1)),
    # system.functions introspection (round 5)
    ("SELECT count() AS n FROM system.functions WHERE name LIKE 'array%'",
     (1, 1)),
    # ARRAY JOIN over a Map column (round 5)
    ("SELECT kv.key AS k, kv.value AS v FROM (SELECT map('a', 1, 'b', 2) "
     "AS m) ARRAY JOIN m AS kv ORDER BY k",
     (2, 2)),
    # star APPLY over a JOIN scope (round 6: LIMIT 0 analysis probe)
    ("SELECT COLUMNS('_name') APPLY(count) FROM region r JOIN nation n "
     "ON r.r_regionkey = n.n_regionkey",
     (1, 1)),
    # star APPLY over a subquery scope (round 6)
    ("SELECT * APPLY(max) FROM (SELECT o_orderkey, o_custkey FROM orders "
     "WHERE o_orderkey < 50) t",
     (1, 1)),
    # WITH FILL INTERPOLATE expression form (round 6)
    ("SELECT o_orderkey AS k, max(o_totalprice) AS p, "
     "max(o_totalprice) * 0 AS p2, count() AS n FROM orders "
     "WHERE o_orderkey < 20 GROUP BY o_orderkey "
     "ORDER BY k WITH FILL FROM 1 TO 20 INTERPOLATE (p, p2 AS p / 2)",
     (19, 25)),
    # aggregate -State/-Merge algebra end-to-end in one statement
    ("SELECT uniqExactMerge(st) AS u FROM (SELECT "
     "uniqExactState(o_orderstatus) AS st FROM orders GROUP BY "
     "o_orderkey % 4)",
     (1, 1)),
    # WITH CUBE + grouping-set aware count
    ("SELECT o_orderstatus, o_orderpriority, count() AS n FROM orders "
     "GROUP BY o_orderstatus, o_orderpriority WITH CUBE ORDER BY n DESC "
     "LIMIT 10",
     (1, 10)),
    # any/anyLast aggregates
    ("SELECT any(o_orderstatus) AS a, anyLast(o_orderpriority) AS z "
     "FROM (SELECT * FROM orders ORDER BY o_orderkey)",
     (1, 1)),
    # ---- round-6 waves 8-9 + TVFs ----
    # multi-pattern log matching
    ("SELECT count() AS n FROM orders WHERE multiMatchAny(o_orderpriority, "
     "['URGENT', 'HIGH'])",
     (1, 1)),
    ("SELECT multiSearchFirstIndex(o_orderpriority, ['LOW', 'URGENT']) "
     "AS i FROM orders ORDER BY o_orderkey LIMIT 3",
     (3, 3)),
    # token search over text
    ("SELECT count() AS n FROM documents WHERE hasToken(text, 'the')",
     (1, 1)),
    # IP analytics shapes
    ("SELECT IPv4NumToString(IPv4StringToNum('10.1.2.3')) AS rt, "
     "isIPAddressInRange('10.1.2.3', '10.0.0.0/8') AS hit",
     (1, 1)),
    # bitmask debug helpers
    ("SELECT bitmaskToList(o_orderkey) AS l FROM orders "
     "ORDER BY o_orderkey LIMIT 2",
     (2, 2)),
    # quantiles plural over sketches
    ("SELECT quantilesTDigest(0.5, 0.99)(o_totalprice) AS q FROM orders",
     (1, 1)),
    # erf-based significance shape
    ("SELECT round(erf(abs(avg(o_totalprice) - 150000) / 1e6), 4) AS e "
     "FROM orders",
     (1, 1)),
    # ngram fuzzy match scoring
    ("SELECT o_orderpriority, round(ngramDistance(o_orderpriority, "
     "'1-URGENT'), 3) AS d FROM orders GROUP BY o_orderpriority "
     "ORDER BY d LIMIT 3",
     (3, 3)),
    # generateRandom test-data TVF
    ("SELECT count() AS n FROM (SELECT * FROM "
     "generateRandom('a Int64, b Float64', 7) LIMIT 100)",
     (1, 1)),
    # LIMIT BY with OFFSET spelling
    ("SELECT o_custkey, o_orderkey FROM orders ORDER BY o_custkey, "
     "o_orderkey LIMIT 1 OFFSET 1 BY o_custkey LIMIT 10",
     (1, 10)),
    # EXCEPT STRICT star modifier
    ("SELECT * EXCEPT STRICT (o_orderpriority) FROM orders "
     "ORDER BY o_orderkey LIMIT 2",
     (2, 2)),
    # WITH RECURSIVE (Spark 4 native)
    ("WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL SELECT n + 1 FROM r "
     "WHERE n < 10) SELECT count() AS c FROM r",
     (1, 1)),
    # arrayFill / arraySplit scan folds
    ("SELECT arrayFill(x -> x > 0, [1, 0, 2, 0]) AS f, "
     "arraySplit(x -> x = 0, [1, 0, 2]) AS s",
     (1, 1)),
    # formatReadable family
    ("SELECT formatReadableTimeDelta(86401) AS t, "
     "formatReadableSize(1048576) AS s",
     (1, 1)),
    # ---- wave 10/11 statement forms ------------------------------------
    # tuple IN over composite keys (positional struct rewrite)
    ("SELECT count() AS n FROM orders WHERE (o_orderkey, o_orderstatus) "
     "IN ((0, 'F'), (1, 'F'), (3, 'O'))",
     (1, 1)),
    # quantified comparisons
    ("SELECT count() AS n FROM orders WHERE o_orderkey = ANY "
     "(SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)",
     (1, 1)),
    ("SELECT count() AS n FROM lineitem WHERE l_orderkey <> ALL "
     "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P')",
     (1, 1)),
    # LIMIT WITH TIES keeps every row tying the boundary
    ("SELECT o_orderpriority FROM orders ORDER BY o_orderpriority "
     "LIMIT 1 WITH TIES",
     (1, 2000)),
    # locale collation in ORDER BY
    ("SELECT n_name FROM nation ORDER BY n_name COLLATE 'en' LIMIT 5",
     (5, 5)),
    # scalar WITH binding an array alias, subscripted
    ("WITH ['urgent', 'high'] AS labels SELECT labels[1] AS first_label",
     (1, 1)),
    # regex group extraction over a real column
    ("SELECT extractGroups(o_orderpriority, '(\\\\d+)-(\\\\w+)') AS parts "
     "FROM orders LIMIT 5",
     (5, 5)),
    # CH 3-arg date_diff spelling beside Spark's own 2-arg form
    ("SELECT date_diff('day', min(o_orderdate), max(o_orderdate)) AS span "
     "FROM orders",
     (1, 1)),
    # URL query/fragment family on synthetic strings
    ("SELECT cutQueryStringAndFragment('https://x.io/p?q=1#f') AS clean, "
     "queryStringAndFragment('https://x.io/p?q=1#f') AS tail_",
     (1, 1)),
    # map key-LIKE helpers
    ("SELECT mapContainsKeyLike(map('region_eu', 1, 'region_us', 2), "
     "'region\\\\_%') AS hit",
     (1, 1)),
    # array shifts and non-negative cumsum in one projection
    ("SELECT arrayShiftLeft([1, 2, 3], 1) AS shl, "
     "arrayCumSumNonNegative([5, -9, 3]) AS cnn",
     (1, 1)),
    # numeric truncate + sigmoid in a scoring expression
    ("SELECT truncate(avg(o_totalprice), 2) AS t, "
     "sigmoid(avg(o_totalprice) / 100000) AS s FROM orders",
     (1, 1)),
    # timeSlots windows over event times
    ("SELECT length(timeSlots(toDateTime('2024-01-01 10:00:00'), "
     "toUInt32(3600))) AS n_slots",
     (1, 1)),
    # bitTest family over flag columns
    ("SELECT countIf(bitTestAny(o_orderkey, 0, 1)) AS odd_or_two "
     "FROM orders",
     (1, 1)),
    # ---- wave 13 / continuation-session forms ---------------------------
    # contiguous-subsequence containment + element-or-null
    ("SELECT hasSubstr([1,2,3], [2,3]) AS h, "
     "arrayElementOrNull([1], 9) AS e",
     (1, 1)),
    # vector distance family in SQL
    ("SELECT round(L2Distance([1,2],[4,6]), 4) AS l2, "
     "round(LpDistance([1,2],[4,6], 3), 4) AS lp, "
     "round(cosineDistance([1,0],[0,1]), 4) AS cd",
     (1, 1)),
    # -Stable spellings in a dashboard aggregate
    ("SELECT round(corrStable(o_orderkey, o_totalprice), 6) AS c, "
     "round(stddevSampStable(o_totalprice), 2) AS s FROM orders",
     (1, 1)),
    # new snowflake converter + v7 uuid shapes
    ("SELECT snowflakeIDToDateTime(517815303929856) AS t, "
     "length(generateUUIDv7()) AS n",
     (1, 1)),
    # view() table function wrapping a subquery, aliased and filtered
    ("SELECT v.st, v.n FROM view(SELECT o_orderstatus AS st, "
     "count() AS n FROM orders GROUP BY o_orderstatus) v "
     "WHERE v.n > 0 ORDER BY v.st",
     (1, 5)),
    # untuple expansion keeps named-tuple fields
    ("SELECT untuple(tuple(o_orderkey, o_orderstatus)) FROM orders "
     "ORDER BY o_orderkey LIMIT 3",
     (3, 3)),
    # generated-SQL integer conditions + execution-hint SETTINGS tail
    ("SELECT count() AS n FROM orders WHERE 1 "
     "SETTINGS max_threads = 4, join_use_nulls = 1",
     (1, 1)),
    # CH NULL placement: top-k over a nullable key must not surface
    # NULLs first
    ("SELECT x FROM (SELECT if(o_orderkey % 100 = 0, NULL, "
     "o_totalprice) AS x FROM orders) ORDER BY x LIMIT 5",
     (5, 5)),
    # groupArrayLast windowed tail + BM25-ish token pipeline pieces
    ("SELECT length(groupArrayLast(3)(o_orderkey)) AS n FROM orders",
     (1, 1)),
    # pointInEllipses geo-fence filter shape
    ("SELECT count() AS n FROM orders "
     "WHERE pointInEllipses(o_orderkey % 10, o_orderkey % 7, "
     "5, 3, 6, 5) = 1",
     (1, 1)),
    # ---- round 7: waves 13-19 + STALENESS composed into realistic
    # dashboard/ETL statements (121 -> 150) -----------------------------
    # WITH FILL STALENESS on a sparse daily series (monitoring panel)
    ("SELECT o_orderdate AS d, count() AS n FROM orders "
     "WHERE o_orderkey % 97 = 0 GROUP BY d "
     "ORDER BY d WITH FILL STEP INTERVAL 1 DAY STALENESS INTERVAL 3 DAY",
     (1, 100000)),
    # STALENESS + INTERPOLATE carry in one clause
    ("SELECT o_orderkey AS k, max(o_totalprice) AS p FROM orders "
     "WHERE o_orderkey % 11 = 0 AND o_orderkey < 150 GROUP BY k "
     "ORDER BY k WITH FILL FROM 1 TO 150 STALENESS 4 INTERPOLATE (p)",
     (1, 150)),
    # indexHint in a WHERE composed with a real filter (CH superset)
    ("SELECT count() AS n FROM orders "
     "WHERE indexHint(o_orderkey > 0) AND o_orderstatus = 'O'",
     (1, 1)),
    # view() wrapper + aggregate (docs idiom for parameterized views)
    ("SELECT count() AS n FROM view(SELECT o_custkey FROM orders "
     "WHERE o_totalprice > 1000)",
     (1, 1)),
    # tupleNames introspection on a typed tuple
    ("SELECT tupleNames(CAST((1, 'x') AS Tuple(id Int64, tag String))) "
     "AS names",
     (1, 1)),
    # toDecimalString for money formatting in a report column
    ("SELECT toDecimalString(sum(o_totalprice), 2) AS total FROM orders",
     (1, 1)),
    # extractKeyValuePairs over synthesized kv-log lines
    ("SELECT mapKeys(extractKeyValuePairs("
     "concat('k:', toString(o_orderkey), ', s:', o_orderstatus))) AS ks "
     "FROM orders LIMIT 5",
     (5, 5)),
    # XML-encode a report cell + firstLine of a multiline text
    ("SELECT encodeXMLComponent(text) AS enc, "
     "firstLine(text) AS fl FROM documents LIMIT 5",
     (5, 5)),
    # character ngrams + splitByNonAlpha in a tokenization pipeline
    ("SELECT length(ngrams(lower(text), 3)) AS n3, "
     "length(splitByNonAlpha(text)) AS toks FROM documents LIMIT 5",
     (5, 5)),
    # Joda-syntax epoch formatting (migration from legacy dashboards)
    ("SELECT fromUnixTimestampInJodaSyntax(1700000000 + o_orderkey, "
     "'yyyy-MM-dd HH:mm') AS t FROM orders LIMIT 3",
     (3, 3)),
    # timeDiff + addInterval SLA arithmetic
    ("SELECT o_orderkey, timeDiff(toDateTime(o_orderdate), "
     "toDateTime(addInterval(o_orderdate, INTERVAL 2 DAY))) AS sla_s "
     "FROM orders LIMIT 4",
     (4, 4)),
    # toLastDayOfWeek bucketing (CH mode-0 weeks)
    ("SELECT toLastDayOfWeek(o_orderdate) AS wk, count() AS n "
     "FROM orders GROUP BY wk ORDER BY wk LIMIT 10",
     (1, 10)),
    # mapReverseSort + countMap merged-map aggregation
    ("SELECT countMap(map(o_orderstatus, 1))[o] AS n FROM "
     "(SELECT o_orderstatus, 'O' AS o FROM orders) GROUP BY o",
     (1, 1)),
    # generateULID structural check inside a SELECT list
    ("SELECT generateULID() AS id, o_orderkey FROM orders LIMIT 2",
     (2, 2)),
    # star APPLY over a join scope (round-6 scope analysis)
    ("SELECT c_acctbal, o_totalprice FROM "
     "(SELECT * EXCEPT (o_orderdate) FROM orders "
     "JOIN customer ON o_custkey = c_custkey LIMIT 10) "
     "LIMIT 10",
     (10, 10)),
    # COLUMNS regex projection + aggregation
    ("SELECT COLUMNS('^o_total') APPLY sum FROM orders",
     (1, 1)),
    # tuple-IN with literal tuples (generated filters)
    ("SELECT count() AS n FROM orders WHERE "
     "(o_orderstatus, o_orderpriority) IN (('O', '1-URGENT'), "
     "('F', '2-HIGH'))",
     (1, 1)),
    # = ANY quantified subquery (ORM-generated)
    ("SELECT count() AS n FROM customer WHERE c_nationkey = ANY "
     "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1)",
     (1, 1)),
    # LIMIT WITH TIES on a ranked report
    ("SELECT o_orderpriority FROM orders ORDER BY o_orderpriority "
     "LIMIT 3 WITH TIES",
     (3, 100000)),
    # combinator chain: sumIf + avgIf + countIfDistinct in one pass
    ("SELECT sumIf(o_totalprice, o_orderstatus = 'O') AS s, "
     "avgIf(o_totalprice, o_orderstatus = 'F') AS a, "
     "countIfDistinct(o_custkey, o_totalprice > 1000) AS u FROM orders",
     (1, 1)),
    # parametric + If: quantileIf and groupArrayIf capped collect
    ("SELECT quantileIf(0.9)(o_totalprice, o_orderstatus = 'O') AS p90, "
     "length(groupArrayIf(5)(o_orderkey, o_totalprice > 100)) AS tail "
     "FROM orders",
     (1, 1)),
    # -State/-Merge two-level rollup through a subquery (matview shape)
    ("SELECT countMerge(c) AS n, round(sumMerge(s), 2) AS rev FROM "
     "(SELECT o_orderstatus, countState(o_orderkey) AS c, "
     "sumState(o_totalprice) AS s FROM orders GROUP BY o_orderstatus)",
     (1, 1)),
    # GROUP BY () global aggregate (generated SQL)
    ("SELECT count() AS n, uniq(o_custkey) AS u FROM orders GROUP BY ()",
     (1, 1)),
    # numbers() TVF driving a synthetic calendar join
    ("SELECT count() AS n FROM numbers(30) t "
     "JOIN orders ON o_orderkey % 30 = t.number",
     (1, 1)),
    # WINDOW clause shared by two window functions
    ("SELECT o_custkey, sum(o_totalprice) OVER w AS run, "
     "row_number() OVER w AS rn FROM orders "
     "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey) LIMIT 10",
     (10, 10)),
    # PREWHERE composed with WHERE (CH read-optimization spelling)
    ("SELECT count() AS n FROM orders PREWHERE o_totalprice > 500 "
     "WHERE o_orderstatus = 'O'",
     (1, 1)),
    # array-literal IN set + NOT IN subquery in one predicate
    ("SELECT count() AS n FROM orders WHERE o_orderstatus IN ['O', 'F'] "
     "AND o_custkey NOT IN (SELECT c_custkey FROM customer "
     "WHERE c_acctbal < 0)",
     (1, 1)),
    # isIPAddressInRange + bit functions (security dashboard shape)
    ("SELECT countIf(isIPAddressInRange("
     "concat('10.0.', toString(o_orderkey % 256), '.1'), '10.0.0.0/16'))"
     " AS hits FROM orders LIMIT 1",
     (1, 1)),
    # multiSearchAny routing filter over document text
    ("SELECT count() AS n FROM documents "
     "WHERE multiSearchAny(text, ['the', 'data', 'engine'])",
     (1, 1)),
    # ---- round-8 additions (wave 22 composed into table shapes) ----
    # Tukey outlier scores over a grouped series (groupArray feed)
    ("SELECT o_orderpriority, arraySum(seriesOutliersDetectTukey("
     "groupArray(o_totalprice))) AS outlier_mass FROM orders "
     "GROUP BY o_orderpriority ORDER BY o_orderpriority",
     (1, 10)),
    # dominant period of a constructed series per status
    ("SELECT o_orderstatus, seriesPeriodDetectFFT(arrayMap("
     "i -> toFloat64(i % 3), range(12))) AS per FROM orders "
     "GROUP BY o_orderstatus ORDER BY o_orderstatus",
     (1, 5)),
    # JSONMergePatch over per-row constructed JSON
    ("SELECT JSONMergePatch(concat('{\"k\":', toString(o_orderkey), "
     "'}'), '{\"v\":1}') AS j FROM orders ORDER BY o_orderkey LIMIT 5",
     (5, 5)),
    # array Levenshtein between token prefixes of two columns
    ("SELECT avg(arrayLevenshteinDistance(arraySlice(splitByChar(' ', "
     "text), 1, 4), arraySlice(splitByChar(' ', lang), 1, 4))) AS d "
     "FROM documents LIMIT 1",
     (1, 1)),
    # origin-anchored interval bucketing in GROUP BY
    ("SELECT toStartOfInterval(makeDateTime(1995, 1, 2, 3, 4, 5), "
     "INTERVAL 90 MINUTE, makeDateTime(1995, 1, 1, 0, 0, 0)) AS b, "
     "count() AS n FROM orders GROUP BY b",
     (1, 2)),
    # proportionsZTest fed from countIf aggregates (A/B shape)
    ("SELECT round(z.t.p_value, 4) AS p FROM (SELECT proportionsZTest("
     "countIf(o_orderstatus = 'F'), countIf(o_orderstatus = 'O'), "
     "count(), count(), 0.95, 'unpooled') AS t FROM orders) z",
     (1, 1)),
    # getSubcolumn over an aggregated map
    ("SELECT arrayStringConcat(getSubcolumn(map('a', 1, 'b', 2), "
     "'keys'), '|') AS ks",
     (1, 1)),
    # snowflake id round-trip on real timestamps
    ("SELECT count() AS n FROM events WHERE snowflakeIDToDateTime("
     "dateTimeToSnowflakeID(ts)) = ts",
     (1, 1)),
    # toMillisecond + toStartOfInterval in one projection
    ("SELECT toMillisecond(ts) AS ms, toStartOfInterval(ts, "
     "INTERVAL 1 HOUR) AS h FROM events ORDER BY ts LIMIT 3",
     (3, 3)),
    # stem + normalize + base58 chained (UDF registration through one
    # statement with three lazy families)
    ("SELECT stem('en', 'running') AS s, normalizeUTF8NFC('é') AS n, "
     "base58Encode('x') AS b",
     (1, 1)),
    # substring-dedup-shape: sliding window digests in plain CH SQL
    ("SELECT count(DISTINCT lower(substring(text, 1, 32))) AS n "
     "FROM documents WHERE length(text) >= 32",
     (1, 1)),
    # the UNDROP retention knob parses through per-query SETTINGS
    ("SELECT count() AS n FROM orders SETTINGS "
     "database_atomic_delay_before_drop_table_sec = 120",
     (1, 1)),
    # arrayFold + arrayRotateLeft (wave-18/22 array family composed)
    ("SELECT arrayFold((acc, x) -> acc + x, arrayRotateLeft("
     "range(5), 2), toInt64(0)) AS s",
     (1, 1)),
    # formatReadableDecimalSize over an aggregate
    ("SELECT formatReadableDecimalSize(sum(o_totalprice)) AS sz "
     "FROM orders",
     (1, 1)),
    # daysSinceYearZero round-trip on order dates
    ("SELECT count() AS n FROM orders WHERE fromDaysSinceYearZero("
     "toDaysSinceYearZero(o_orderdate)) = o_orderdate",
     (1, 1)),
    # monthName over a column + byteSwap on a literal (column byteSwap
    # is a documented guided refusal — width unknown at translate time)
    ("SELECT monthName(o_orderdate) AS m, byteSwap(3351772109) AS bs "
     "FROM orders ORDER BY o_orderkey LIMIT 2",
     (2, 2)),
    # UTCTimestamp comparison (smoke: parses + runs)
    ("SELECT count() AS n FROM orders WHERE "
     "toDateTime(o_orderdate) < UTCTimestamp()",
     (1, 1)),
    # quantilesTimingWeighted-free composition: weighted quantiles +
    # countIf in HAVING
    ("SELECT o_orderpriority, quantileExactWeighted(0.5)(o_totalprice,"
     " 1) AS med FROM orders GROUP BY o_orderpriority "
     "HAVING countIf(o_orderstatus = 'O') > 0 ORDER BY o_orderpriority",
     (1, 10)),
    # map + ARRAY JOIN + getSubcolumn in one pipeline
    ("SELECT k, v FROM (SELECT map('x', 1, 'y', 2) AS m) "
     "ARRAY JOIN getSubcolumn(m, 'keys') AS k, "
     "getSubcolumn(m, 'values') AS v ORDER BY k",
     (2, 2)),
    # LIMIT BY + origin-interval + countIf (dashboard drill-down)
    ("SELECT user_id, toStartOfInterval(ts, INTERVAL 6 HOUR) AS b, "
     "count() AS n FROM events GROUP BY user_id, b "
     "ORDER BY user_id, b LIMIT 2 BY user_id LIMIT 20",
     (1, 20)),
    # JSONMergePatch chained with JSONExtract (config overlay shape)
    ("SELECT JSONExtractInt(JSONMergePatch('{\"retries\":1}', "
     "'{\"retries\":5,\"ttl\":60}'), 'retries') AS r",
     (1, 1)),
    # Tukey over window-collected per-user event gaps
    ("SELECT user_id, arrayMax(seriesOutliersDetectTukey("
     "groupArray(toFloat64(event_id % 97)))) AS worst FROM events "
     "GROUP BY user_id HAVING count() >= 4 ORDER BY user_id LIMIT 10",
     (0, 10)),
    # interval origin equal to the epoch degrades to the plain form
    ("SELECT count() AS n FROM events WHERE toStartOfInterval(ts, "
     "INTERVAL 1 DAY, toDateTime(0)) = toStartOfInterval(ts, "
     "INTERVAL 1 DAY)",
     (1, 1)),
    # proportionsZTest CI bounds ordered (sanity inequality in SQL)
    ("SELECT if(z.t.confidence_interval_low <= "
     "z.t.confidence_interval_high, 1, 0) AS ok FROM (SELECT "
     "proportionsZTest(40, 50, 200, 210, 0.99, 'pooled') AS t) z",
     (1, 1)),
    # getSubcolumn struct-field spelling over a tuple column
    ("SELECT getSubcolumn(named_struct('lo', min(o_totalprice), 'hi', "
     "max(o_totalprice)), 'hi') AS hi FROM orders",
     (1, 1)),
    # UTCTimestamp with dateDiff (monitoring freshness shape)
    ("SELECT if(dateDiff('second', toDateTime(o_orderdate), "
     "UTCTimestamp()) > 0, 1, 0) AS fresh FROM orders LIMIT 1",
     (1, 1)),
    # arrayLevenshteinDistance as a dedup-distance HAVING filter
    ("SELECT l_orderkey FROM lineitem GROUP BY l_orderkey "
     "HAVING arrayLevenshteinDistance(groupArray(l_linenumber), "
     "arraySort(groupArray(l_linenumber))) = 0 "
     "ORDER BY l_orderkey LIMIT 5",
     (1, 5)),
    # seriesPeriodDetectFFT over a deterministic generated series
    ("SELECT seriesPeriodDetectFFT(arrayMap(i -> toFloat64(i % 4), "
     "range(16))) AS per FROM numbers(1)",
     (1, 1)),
    # ---- round-8 wave-26 composition rows (200-battery) ----
    # fuzzy nation-name match: jaro-winkler as a similarity filter
    ("SELECT n_name, jaroWinklerSimilarity(lower(n_name), 'nation_1') "
     "AS sim FROM nation WHERE jaroWinklerSimilarity(lower(n_name), "
     "'nation_1') > 0.9 ORDER BY sim DESC, n_name",
     (1, 25)),
    # true-DL distance as a near-duplicate HAVING guard
    ("SELECT c_mktsegment, count() AS n FROM customer "
     "GROUP BY c_mktsegment "
     "HAVING damerauLevenshteinDistance(c_mktsegment, c_mktsegment) = 0 "
     "ORDER BY n DESC LIMIT 5",
     (1, 5)),
    # consistent-hash shard routing: every key lands in [0, 8)
    ("SELECT countIf(jumpConsistentHash(toUInt64(o_custkey), 8) "
     "BETWEEN 0 AND 7) AS ok, count() AS n FROM orders",
     (1, 1)),
    # shard stability: 8 -> 9 buckets only moves keys into bucket 8
    ("SELECT count() AS moved_wrong FROM orders "
     "WHERE jumpConsistentHash(toUInt64(o_custkey), 9) != "
     "jumpConsistentHash(toUInt64(o_custkey), 8) "
     "AND jumpConsistentHash(toUInt64(o_custkey), 9) != 8 "
     "HAVING moved_wrong = 0",
     (1, 1)),
    # geohash round-trip over synthetic coordinates
    ("SELECT count() AS n FROM (SELECT number, "
     "geohashDecode(geohashEncode(number * 3.7 - 120, "
     "number * 1.9 - 60, 9)) AS d FROM numbers(50)) "
     "WHERE abs(d.1 - (number * 3.7 - 120)) < 0.001",
     (1, 1)),
    # z-order key: morton-encoded (custkey, month) ordering
    ("SELECT o_orderkey, mortonEncode(toUInt32(o_custkey % 1024), "
     "toUInt32(toMonth(o_orderdate))) AS zkey FROM orders "
     "ORDER BY zkey LIMIT 10",
     (1, 10)),
    # hilbert locality key with decode round-trip check
    ("SELECT count() AS n FROM (SELECT number % 50 AS x, "
     "number % 37 AS y, hilbertDecode(2, hilbertEncode(number % 50, "
     "number % 37)) AS d FROM numbers(100)) WHERE d.1 = x AND d.2 = y "
     "HAVING n = 100",
     (1, 1)),
    # A/B significance read: welch t-test click vs view values
    ("SELECT round(welchTTest(value, if(event_type = 'click', 1, 0))"
     ".2, 4) AS p FROM events WHERE event_type IN ('click', 'view')",
     (1, 1)),
    # pooled t-test with the p-value consumed in a CASE
    ("SELECT if(studentTTest(l_extendedprice, "
     "if(l_returnflag = 'R', 1, 0)).2 < 0.5, 'maybe', 'no') AS sig "
     "FROM lineitem",
     (1, 1)),
    # erf as a normal-tail score over standardized revenue
    ("SELECT round(erf(abs(avg(o_totalprice) - 150000) / "
     "(stddevPop(o_totalprice) + 1)), 6) AS tail FROM orders",
     (1, 1)),
    # ETL guard: range-checked ingestion cast, bad rows NULLed
    ("SELECT countIf(accurateCastOrNull(l_linenumber * 100, 'UInt8') "
     "IS NULL) AS oob, count() AS n FROM lineitem",
     (1, 1)),
    # bin/unbin round trip as a checksum column
    ("SELECT countIf(unbin(bin(l_linenumber)) != '') AS ok "
     "FROM lineitem LIMIT 1",
     (1, 1)),
    # multi-list intersection over grouped arrays
    ("SELECT length(arrayIntersect(groupArray(o_orderpriority), "
     "['1-URGENT', '2-HIGH'], ['1-URGENT'])) AS hits FROM orders",
     (1, 1)),
    # lambda aggregation over grouped values
    ("SELECT o_orderstatus, arrayMin(x -> -x, "
     "groupArray(toInt64(o_custkey))) AS neg_max FROM orders "
     "GROUP BY o_orderstatus ORDER BY o_orderstatus",
     (1, 3)),
    # sumMap tuple consumption: values side via positional .2
    ("SELECT arrayStringConcat(arrayMap(x -> toString(x), "
     "sumMap([o_orderstatus], [1]).2), ',') AS counts FROM orders",
     (1, 1)),
    # positiveModulo bucketing (negative-safe)
    ("SELECT positiveModulo(toInt64(o_custkey) - 100000, 7) AS b, "
     "count() AS n FROM orders GROUP BY b ORDER BY b",
     (1, 7)),
    # ops report column: human-readable SLA age
    ("SELECT formatReadableTimeDelta(dateDiff('second', "
     "min(o_orderdate), max(o_orderdate))) AS span FROM orders",
     (1, 1)),
    # morton decode feeding GROUP BY
    ("SELECT mortonDecode(2, mortonEncode(toUInt32(o_custkey % 16), "
     "toUInt32(o_custkey % 8))).1 AS xb, count() AS n FROM orders "
     "GROUP BY xb ORDER BY xb LIMIT 16",
     (1, 16)),
    # geohash cells as group keys over synthetic event coords
    ("SELECT geohashEncode(user_id % 360 - 180.0, "
     "user_id % 170 - 85.0, 4) AS cell, count() AS n FROM events "
     "GROUP BY cell ORDER BY n DESC LIMIT 10",
     (1, 10)),
    # exact erfc in a two-sided outlier share estimate
    ("SELECT round(erfc(2.0 / sqrt(2.0)), 8) AS two_sigma "
     "FROM numbers(1)",
     (1, 1)),
    # ---- wave 28-30 composition rows (round-8 continuation) ----
    # floor-division bucketing survives negative offsets (intDiv fix)
    ("SELECT intDiv(toInt64(o_custkey) - 500, 200) AS bucket, "
     "count() AS n FROM orders GROUP BY bucket ORDER BY bucket",
     (2, 400)),
    # dateDiff month-boundary ageing report (wave-30 semantics):
    # every order vs the corpus max date, bucketed by months crossed
    ("SELECT dateDiff('month', o_orderdate, "
     "(SELECT max(o_orderdate) FROM orders)) AS months_back, "
     "count() AS n FROM orders GROUP BY months_back "
     "ORDER BY months_back LIMIT 5",
     (1, 5)),
    # banker's rounding in a financial rollup (ties-to-even)
    ("SELECT round(sum(o_totalprice) / count(), 2) AS avg_price, "
     "round(2.5) AS tie FROM orders",
     (1, 1)),
    # integer-cast wraparound as a hash-bucket idiom
    ("SELECT toUInt8(o_custkey) AS b8, count() AS n FROM orders "
     "GROUP BY b8 ORDER BY n DESC LIMIT 10",
     (1, 10)),
    # splitByChar max_substrings for key prefix parsing (element [1]
    # is identical in both remainder modes)
    ("SELECT splitByChar('-', o_orderpriority, 2)[1] AS prio_code, "
     "count() AS n FROM orders GROUP BY prio_code ORDER BY prio_code",
     (1, 6)),
    # negative-length right() to strip a fixed suffix
    ("SELECT right(o_orderpriority, -2) AS tail, count() AS n "
     "FROM orders GROUP BY tail ORDER BY tail LIMIT 10",
     (1, 10)),
    # greatest/least NULL propagation inside coalesce guards
    ("SELECT count() AS n FROM orders "
     "WHERE coalesce(greatest(o_totalprice, NULL), 0) = 0",
     (1, 1)),
    # hop windows over event times (streaming report shape)
    ("SELECT hopStart(ts, INTERVAL 1 DAY, INTERVAL 7 DAY) "
     "AS win, count() AS n FROM events GROUP BY win "
     "ORDER BY win LIMIT 10",
     (1, 10)),
    # CREATE FUNCTION macro + trunc in one monitoring expression
    ("SELECT trunc(avg(o_totalprice), 1) AS t1 FROM orders",
     (1, 1)),
    # countdown sequence via negative-step range
    ("SELECT arrayStringConcat(arrayMap(x -> toString(x), "
     "range(3, 0, -1)), '>') AS countdown FROM numbers(1)",
     (1, 1)),
    # hasTokenOrNull as a safe user-input filter (no throw on junk)
    ("SELECT count() AS n FROM orders "
     "WHERE hasTokenOrNull(o_orderpriority, 'URGENT') = true",
     (1, 1)),
    # makeDateTime64 + timestampDiff alias in a freshness check
    ("SELECT timestampDiff('day', makeDateTime64(1995, 1, 1, 0, 0, 0, "
     "0), toDateTime(max(o_orderdate))) AS span FROM orders",
     (1, 1)),
    # ---- wave-32 composition rows ----
    # any/anyLast as representative-pickers per group (NULL-skipping)
    ("SELECT o_orderstatus AS st, any(o_orderpriority) AS rep, "
     "anyLast(o_orderpriority) AS last_rep FROM orders "
     "GROUP BY st ORDER BY st",
     (1, 3)),
    # numeric truthiness in a flag projection (UInt8 condition)
    ("SELECT sum(if(o_custkey % 2, 1, 0)) AS odd_customers FROM orders",
     (1, 1)),
    # corr between price and key (legitimate non-constant input)
    ("SELECT round(corr(CAST(o_custkey AS Float64), o_totalprice), 6) "
     "AS c FROM orders",
     (1, 1)),
    # intervalLengthSum: coverage of order-date activity windows
    ("SELECT o_orderstatus AS st, intervalLengthSum("
     "toUnixTimestamp(toDateTime(o_orderdate)), "
     "toUnixTimestamp(toDateTime(o_orderdate)) + 86400 * 30) / 86400 "
     "AS covered_days FROM orders GROUP BY st ORDER BY st",
     (1, 3)),
    # GROUP BY ALL shorthand over a two-column rollup
    ("SELECT o_orderstatus, o_orderpriority, count() AS n FROM orders "
     "GROUP BY ALL ORDER BY o_orderstatus, o_orderpriority LIMIT 20",
     (1, 20)),
    # multi-argument count(DISTINCT ...)
    ("SELECT count(DISTINCT o_orderstatus, o_orderpriority) AS pairs "
     "FROM orders",
     (1, 1)),
    # quantiles plural feeding an array consumer
    ("SELECT arrayStringConcat(arrayMap(x -> toString(round(x, 2)), "
     "quantiles(0.25, 0.5, 0.75)(o_totalprice)), ',') AS iqr "
     "FROM orders",
     (1, 1)),
    # SET through the settings shim then a knob-sensitive statement
    ("SELECT count() AS n FROM orders WHERE hasTokenOrNull("
     "o_orderpriority, 'HIGH') = true OR o_orderstatus = 'O'",
     (1, 1)),
    # toTypeName in a schema-drift monitoring projection
    ("SELECT toTypeName(o_totalprice) AS price_type, "
     "toTypeName(o_orderdate) AS date_type FROM orders LIMIT 1",
     (1, 1)),
    # ---- round 9: time-decay window family in dashboard shapes ----
    ("SELECT user_id, round(exponentialTimeDecayedSum(86400)(value, "
     "toUnixTimestamp(ts)) OVER (PARTITION BY user_id ORDER BY ts "
     "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS load "
     "FROM events WHERE user_id < 3 ORDER BY user_id, ts LIMIT 50",
     (1, 50)),
    ("SELECT round(exponentialMovingAverage(43200)(value, "
     "toUnixTimestamp(ts)) OVER (PARTITION BY event_type ORDER BY ts), "
     "6) AS ema FROM events WHERE event_type = 'click' LIMIT 20",
     (1, 20)),
    ("SELECT event_type, round(exponentialMovingAverage(86400)(value, "
     "toUnixTimestamp(ts)), 6) AS ema FROM events GROUP BY event_type "
     "ORDER BY event_type",
     (1, 10)),
    ("SELECT user_id, max(dc) AS peak FROM (SELECT user_id, "
     "exponentialTimeDecayedCount(3600)(toUnixTimestamp(ts)) OVER "
     "(PARTITION BY user_id ORDER BY ts) AS dc FROM events) "
     "GROUP BY user_id ORDER BY peak DESC LIMIT 5",
     (1, 5)),
    ("SELECT user_id, exponentialTimeDecayedMax(86400)(value, "
     "toUnixTimestamp(ts)) OVER (PARTITION BY user_id ORDER BY ts) "
     "AS dm FROM events WHERE user_id = 1 ORDER BY ts LIMIT 10",
     (1, 10)),
    ("SELECT round(avg(da), 4) AS mean_decayed FROM (SELECT "
     "exponentialTimeDecayedAvg(86400)(value, toUnixTimestamp(ts)) "
     "OVER (PARTITION BY user_id ORDER BY ts) AS da FROM events)",
     (1, 1)),
    # ---- round 9: rankCorr in analyst shapes ----
    ("SELECT round(rankCorr(c_acctbal, c_custkey), 6) AS rho "
     "FROM (SELECT c_acctbal, c_custkey FROM customer LIMIT 200)",
     (1, 1)),
    ("SELECT n_regionkey, round(rankCorr(n_nationkey, "
     "length(n_name)), 4) AS rho FROM nation GROUP BY n_regionkey "
     "ORDER BY n_regionkey",
     (5, 5)),
    ("SELECT o_orderstatus, round(rankCorr(o_totalprice, "
     "o_custkey), 4) AS rho FROM (SELECT * FROM orders LIMIT 500) "
     "GROUP BY o_orderstatus HAVING rho > -1 ORDER BY o_orderstatus",
     (1, 3)),
    # ---- round 9: -Resample bucket reports ----
    ("SELECT countResample(0, 300000, 100000)(o_totalprice) AS "
     "price_hist FROM orders",
     (1, 1)),
    ("SELECT arrayStringConcat(arrayMap(x -> toString(round(x, 2)), "
     "avgResample(0, 50, 10)(l_quantity, l_quantity)), '|') AS qty "
     "FROM lineitem",
     (1, 1)),
    ("SELECT o_orderstatus, sumResample(0, 300000, 150000)"
     "(o_totalprice, o_totalprice) AS spend FROM orders "
     "GROUP BY o_orderstatus ORDER BY o_orderstatus",
     (1, 3)),
    ("SELECT maxResample(0, 50, 25)(l_extendedprice, l_quantity) AS m, "
     "minResample(0, 50, 25)(l_extendedprice, l_quantity) AS n "
     "FROM lineitem",
     (1, 1)),
    # ---- round 9: splitBy* drop-remainder semantics in parsing ----
    ("SELECT splitByChar('-', o_orderpriority, 1)[1] AS code, "
     "count() AS n FROM orders GROUP BY code ORDER BY code",
     (1, 6)),
    ("SELECT length(splitByString(' ', n_name, 2)) AS words, "
     "count() AS n FROM nation GROUP BY words ORDER BY words",
     (1, 3)),
    ("SELECT splitByRegexp('[0-9]+', c_name, 2) AS parts "
     "FROM customer LIMIT 5",
     (5, 5)),
    # legacy remainder-in-last via the statement SETTINGS form
    ("SELECT splitByChar(',', 'a,b,,c', 2) AS legacy SETTINGS "
     "splitby_max_substrings_includes_remaining_string = 1",
     (1, 1)),
    # ---- round 9: toUInt64 truncation + wrap in bucket idioms ----
    ("SELECT toUInt64(o_totalprice / 1000.0) AS kbucket, count() AS n "
     "FROM orders GROUP BY kbucket ORDER BY n DESC LIMIT 10",
     (1, 10)),
    ("SELECT count() AS n FROM orders "
     "WHERE toUInt64(o_totalprice) % 2 = 0",
     (1, 1)),
    # ---- round 9: H3 bit accessors over synthetic indexes ----
    ("SELECT h3GetResolution(bitOr(bitOr(bitShiftLeft(toInt64(1), 59), "
     "bitShiftLeft(toInt64(number % 16), 52)), 35184372088831)) AS "
     "res, count() AS n FROM (SELECT number FROM system.numbers "
     "LIMIT 32) GROUP BY res ORDER BY res",
     (16, 16)),
    ("SELECT count() AS pentagons FROM (SELECT "
     "bitOr(bitOr(bitShiftLeft(toInt64(1), 59), bitShiftLeft("
     "toInt64(number), 45)), 35184372088831) AS h FROM "
     "(SELECT number FROM system.numbers LIMIT 122)) "
     "WHERE h3IsPentagon(h)",
     (1, 1)),
    # ---- round 9: cluster()/remote-adjacent forms ----
    ("SELECT count() AS n FROM cluster('default', nation)",
     (1, 1)),
    ("SELECT o_orderstatus, count() AS n FROM "
     "cluster('default', orders) GROUP BY o_orderstatus "
     "ORDER BY o_orderstatus",
     (1, 3)),
    # ---- round 9: composition — decay + dedup-latest + QUALIFY ----
    ("SELECT user_id, ts, load FROM (SELECT user_id, ts, "
     "round(exponentialTimeDecayedSum(86400)(value, "
     "toUnixTimestamp(ts)) OVER (PARTITION BY user_id ORDER BY ts), 4) "
     "AS load, row_number() OVER (PARTITION BY user_id ORDER BY ts "
     "DESC) AS rn FROM events WHERE user_id < 10) WHERE rn = 1 "
     "ORDER BY user_id",
     (1, 10)),
    ("SELECT quantile(0.5)(dc) AS med FROM (SELECT "
     "exponentialTimeDecayedCount(7200)(toUnixTimestamp(ts)) OVER "
     "(PARTITION BY event_type ORDER BY ts) AS dc FROM events)",
     (1, 1)),
    ("SELECT round(rankCorr(spend, cnt), 4) AS rho FROM (SELECT "
     "o_custkey, sum(o_totalprice) AS spend, count() AS cnt "
     "FROM orders GROUP BY o_custkey LIMIT 300)",
     (1, 1)),
    ("SELECT sumResample(1992, 2000, 2)(o_totalprice, "
     "toYear(o_orderdate)) AS by_years FROM orders",
     (1, 1)),
    # ---- round 10: ISO-week dashboards (wave-35 %G/%V/%u splices) ----
    ("SELECT formatDateTime(o_orderdate, '%G-W%V') AS iso_week, "
     "count() AS n FROM orders GROUP BY iso_week ORDER BY iso_week "
     "LIMIT 20",
     (1, 20)),
    ("SELECT formatDateTime(o_orderdate, '%u') AS dow, count() AS n, "
     "round(sum(o_totalprice), 2) AS rev FROM orders "
     "GROUP BY dow ORDER BY dow",
     (1, 7)),
    ("SELECT formatDateTime(o_orderdate, '%M %Y') AS month_label, "
     "count() AS n FROM orders WHERE toYear(o_orderdate) = 1996 "
     "GROUP BY month_label ORDER BY month_label",
     (1, 12)),
    # legacy %M = minutes via the honored setting (statement-scoped)
    ("SELECT formatDateTime(ts, '%H:%M') AS hm, count() AS n "
     "FROM events GROUP BY hm ORDER BY hm LIMIT 10 "
     "SETTINGS formatdatetime_parsedatetime_m_is_month_name = 0",
     (1, 10)),
    ("SELECT formatDateTime(o_orderdate, '%C') AS century, count() "
     "AS n FROM orders GROUP BY century",
     (1, 2)),
    # ---- round 10: ISO-year bucketing ----
    ("SELECT toStartOfISOYear(o_orderdate) AS iso_y, count() AS n "
     "FROM orders GROUP BY iso_y ORDER BY iso_y",
     (1, 12)),
    ("SELECT toISOYear(o_orderdate) AS y, toISOWeek(o_orderdate) AS w, "
     "count() AS n FROM orders GROUP BY y, w ORDER BY y, w LIMIT 30",
     (1, 30)),
    # ---- round 10: Date32 saturation pipelines ----
    ("SELECT toDate32('2300-01-01') AS capped, "
     "toDate32('1899-12-31') AS floored, count() AS n FROM orders",
     (1, 1)),
    ("SELECT count() AS n FROM orders WHERE o_orderdate "
     "BETWEEN toDate32('1899-01-01') AND toDate32('2300-01-01')",
     (1, 1)),
    ("SELECT coalesce(toDate32OrNull('not-a-date'), "
     "toDate32('1970-01-01')) AS d, count() AS n FROM orders",
     (1, 1)),
    # ---- round 10: uniqCombined precision monitoring ----
    ("SELECT o_orderstatus, uniqCombined(14)(o_custkey) AS u14 "
     "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
     (1, 3)),
    ("SELECT uniqCombined64(19)(o_custkey) AS exact_path, "
     "uniqExact(o_custkey) AS exact FROM orders",
     (1, 1)),
    ("SELECT uniqCombined(12)(l_partkey) AS u12, uniq(l_partkey) AS "
     "u_default FROM lineitem WHERE l_orderkey < 1000",
     (1, 1)),
    # ---- round 10: sub-hour bucketing family ----
    ("SELECT toStartOfFiveMinutes(ts) AS b5, count() AS n FROM events "
     "WHERE user_id < 5 GROUP BY b5 ORDER BY b5 LIMIT 25",
     (1, 25)),
    ("SELECT toStartOfFifteenMinutes(ts) AS b15, "
     "round(sum(value), 2) AS v FROM events GROUP BY b15 "
     "ORDER BY v DESC LIMIT 10",
     (1, 10)),
    # ---- round 10: long-span decay stays finite (max anchor) ----
    ("SELECT o_orderstatus, round(max(ds), 2) AS peak FROM (SELECT "
     "o_orderstatus, exponentialTimeDecayedSum(3600)(o_totalprice, "
     "toUnixTimestamp(o_orderdate)) OVER (PARTITION BY o_orderstatus "
     "ORDER BY o_orderdate, o_orderkey) AS ds FROM orders) "
     "GROUP BY o_orderstatus ORDER BY o_orderstatus",
     (1, 3)),
    ("SELECT count() AS null_avgs FROM (SELECT "
     "exponentialTimeDecayedAvg(86400)(value, toUnixTimestamp(ts)) "
     "OVER (PARTITION BY user_id ORDER BY ts) AS da FROM events "
     "WHERE user_id < 20) WHERE da IS NULL",
     (1, 1)),
    # ---- round 10: toTypeName word-boundary survivors ----
    ("SELECT toTypeName(tuple(1, 'x')) AS t, "
     "toTypeName([o_totalprice]) AS arr FROM orders LIMIT 1",
     (1, 1)),
    # ---- round 10: cluster() + precision sketch composition ----
    ("SELECT uniqCombined(14)(c_custkey) AS u FROM "
     "cluster('default', customer)",
     (1, 1)),
    # ---- round 10: ISO splice inside string pipelines ----
    ("SELECT concat('wk-', formatDateTime(o_orderdate, '%g%V')) AS wk, "
     "count() AS n FROM orders GROUP BY wk ORDER BY n DESC LIMIT 15",
     (1, 15)),
    ("SELECT formatDateTime(toStartOfISOYear(o_orderdate), "
     "'%F (%W)') AS start_label, count() AS n FROM orders "
     "GROUP BY start_label ORDER BY start_label",
     (1, 12)),
    # ---- round 10: remote-form parse coverage (db, table quoting) ----
    ("SELECT count() AS n FROM cluster('default', 'default', 'orders')",
     (1, 1)),
    # ---- round 10: decay window + LIMIT BY dashboard ----
    ("SELECT user_id, ts, round(dc, 4) AS dc FROM (SELECT user_id, ts, "
     "exponentialTimeDecayedCount(7200)(toUnixTimestamp(ts)) OVER "
     "(PARTITION BY user_id ORDER BY ts) AS dc FROM events "
     "WHERE user_id < 8) ORDER BY user_id, ts DESC "
     "LIMIT 2 BY user_id LIMIT 16",
     (1, 16)),
    # ---- round 10: EMA + quantile analyst report ----
    ("SELECT round(quantile(0.9)(ema), 4) AS p90 FROM (SELECT "
     "user_id, exponentialMovingAverage(1800)(value, "
     "toUnixTimestamp(ts)) AS ema FROM events WHERE user_id < 40 "
     "GROUP BY user_id)",
     (1, 1)),
    # ---- round 10: weekday-0 cohort (Sunday %w) ----
    ("SELECT count() AS sunday_orders FROM orders "
     "WHERE formatDateTime(o_orderdate, '%w') = '0'",
     (1, 1)),
    # ---- round 10: funnel + sequence SQL aggregates ----
    ("SELECT windowFunnel(86400)(ts, event_type = 'view', "
     "event_type = 'click', event_type = 'purchase') AS lvl, "
     "count() AS n FROM events GROUP BY user_id % 5 ORDER BY lvl",
     (1, 5)),
    ("SELECT user_id, windowFunnel(3600, 'strict_increase')(ts, "
     "event_type = 'view', event_type = 'purchase') AS lvl "
     "FROM events WHERE user_id < 12 GROUP BY user_id "
     "HAVING lvl >= 1 ORDER BY user_id",
     (0, 12)),
    ("SELECT countIf(m = 1) AS converted FROM (SELECT user_id, "
     "sequenceMatch('(?1).*(?2)')(ts, event_type = 'click', "
     "event_type = 'purchase') AS m FROM events GROUP BY user_id)",
     (1, 1)),
    ("SELECT user_id, sequenceCount('(?1)(?2)')(ts, "
     "event_type = 'view', event_type = 'click') AS vc_chains "
     "FROM events WHERE user_id < 10 GROUP BY user_id "
     "ORDER BY vc_chains DESC, user_id LIMIT 5",
     (1, 5)),
    ("SELECT quantile(0.9)(lvl * 1.0) AS p90_funnel FROM (SELECT "
     "windowFunnel(86400)(ts, event_type = 'view', "
     "event_type = 'click') AS lvl FROM events GROUP BY user_id)",
     (1, 1)),
    # ---- round 11: strict-mode funnel dashboards ----
    ("SELECT windowFunnel(86400, 'strict_order')(ts, "
     "event_type = 'view', event_type = 'click', "
     "event_type = 'purchase') AS lvl, uniq(user_id) AS users "
     "FROM events GROUP BY user_id % 4 ORDER BY lvl, users",
     (1, 4)),
    ("SELECT countIf(lvl >= 2) AS deduped_pairs FROM (SELECT "
     "windowFunnel(7200, 'strict_dedup')(ts, event_type = 'view', "
     "event_type = 'click') AS lvl FROM events GROUP BY user_id)",
     (1, 1)),
    ("SELECT s.user_id, s.chains, f.lvl FROM "
     "(SELECT user_id, sequenceCount('(?1).*(?2)')(ts, "
     "event_type = 'click', event_type = 'error') AS chains "
     "FROM events GROUP BY user_id) s JOIN "
     "(SELECT user_id, windowFunnel(86400)(ts, event_type = 'click', "
     "event_type = 'error') AS lvl FROM events GROUP BY user_id) f "
     "ON s.user_id = f.user_id WHERE s.chains > 0 "
     "ORDER BY s.chains DESC, s.user_id LIMIT 10",
     (0, 10)),
    # ---- round 11: max_fold_group_rows override (the fence is the
    # point statistic contract; the raise side is a script test) ----
    ("SELECT round(entropy(o_orderstatus), 4) AS h FROM orders "
     "SETTINGS max_fold_group_rows = 100000",
     (1, 1)),
    ("SELECT o_orderpriority, round(entropy(o_orderstatus), 4) AS h "
     "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
     (1, 10)),
    # ---- round 11: OrZero parse chains over dirty data ----
    ("SELECT countIf(parseDateTimeOrZero(props, '%Y-%m-%d') = "
     "toDateTime('1970-01-01 00:00:00')) AS unparsed, count() AS n "
     "FROM events",
     (1, 1)),
    ("SELECT toYYYYMM(coalesce(parseDateTimeBestEffortOrNull(props), "
     "o.o_orderdate)) AS m, count() AS n FROM events e JOIN orders o "
     "ON e.user_id % 100 = o.o_orderkey % 100 GROUP BY m "
     "ORDER BY n DESC LIMIT 5",
     (1, 5)),
    ("SELECT countIf(toDate32OrZero(props) = toDate32('1970-01-01')) "
     "AS zeroed FROM events",
     (1, 1)),
    # ---- round 11: ISO-week %G/%V reports joined to toStartOfISOYear
    # buckets ----
    ("SELECT wk.iso_week, yr.n_year FROM "
     "(SELECT formatDateTime(o_orderdate, '%G-W%V') AS iso_week, "
     "toStartOfISOYear(o_orderdate) AS y, count() AS n FROM orders "
     "GROUP BY iso_week, y) wk JOIN "
     "(SELECT toStartOfISOYear(o_orderdate) AS y, count() AS n_year "
     "FROM orders GROUP BY y) yr ON wk.y = yr.y "
     "ORDER BY wk.iso_week LIMIT 20",
     (1, 20)),
    # ---- round 11: month-and-coarser toStartOf* are Date now ----
    ("SELECT toStartOfQuarter(o_orderdate) AS q, "
     "toTypeName(toStartOfQuarter(o_orderdate)) AS ty, "
     "sum(o_totalprice) AS rev FROM orders GROUP BY q, ty "
     "ORDER BY q",
     (1, 40)),
    ("SELECT toStartOfMonth(o_orderdate) AS m, "
     "min(toStartOfWeek(o_orderdate)) AS first_sun FROM orders "
     "GROUP BY m ORDER BY m LIMIT 24",
     (1, 24)),
    # ---- round 11: ngramSearch relevance scoring ----
    ("SELECT o_orderpriority, round(ngramSearch(o_orderpriority, "
     "'URGENT'), 4) AS rel FROM orders GROUP BY o_orderpriority "
     "ORDER BY rel DESC, o_orderpriority",
     (1, 10)),
    ("SELECT count() AS hits FROM part "
     "WHERE ngramSearchCaseInsensitive(p_name, 'GREEN') >= 0.99",
     (1, 1)),
    ("SELECT round(max(ngramDistanceCaseInsensitive(n_name, "
     "'germany')), 4) AS worst FROM nation",
     (1, 1)),
    # ---- round 11: soundex cohorts ----
    ("SELECT soundex(n_name) AS code, groupArray(n_name) AS names "
     "FROM nation GROUP BY code ORDER BY code LIMIT 20",
     (1, 20)),
    # ---- round 11: map partial sorts in monitoring rollups ----
    ("SELECT arrayStringConcat(mapKeys(mapPartialSort(3, "
     "map('p95', 1, 'avg', 2, 'max', 3))), ',') AS metric_order",
     (1, 1)),
    ("SELECT arrayStringConcat(arrayMap(x -> toString(x), "
     "arrayPartialReverseSort(3, groupArray(o_orderkey))), ',') "
     "AS top_keys FROM orders WHERE o_orderkey < 50",
     (1, 1)),
    # ---- round 11: composed text pipeline shapes ----
    ("SELECT multiIf(ngramSearch(p_name, 'tomato') >= 0.5, 'match', "
     "ngramSearch(p_name, 'tomato') >= 0.2, 'weak', 'none') AS tier, "
     "count() AS n FROM part GROUP BY tier ORDER BY tier",
     (1, 3)),
    ("SELECT m, lvl, count() AS n FROM (SELECT toStartOfMonth(ts) AS m, "
     "user_id, windowFunnel(604800)(ts, event_type = 'signup', "
     "event_type = 'purchase') AS lvl FROM events GROUP BY m, user_id) "
     "GROUP BY m, lvl ORDER BY m, lvl LIMIT 30",
     (1, 30)),
    # ---- round 11 wave 38: calendar recomposition dashboards ----
    ("SELECT toStartOfMonth(changeDay(o_orderdate, 1)) AS m, "
     "count() AS n FROM orders GROUP BY m ORDER BY m LIMIT 12",
     (1, 12)),
    ("SELECT countIf(changeYear(o_orderdate, 2024) > "
     "toDateTime('2024-06-01 00:00:00')) AS h2 FROM orders",
     (1, 1)),
    # ---- round 11 wave 38: ops capacity rows ----
    ("SELECT sum(parseReadableSizeOrZero(concat(toString(o_orderkey % 9),"
     " ' KiB'))) AS bytes FROM orders WHERE o_orderkey < 100",
     (1, 1)),
    ("SELECT sgn(o_totalprice - 150000) AS side, count() AS n "
     "FROM orders GROUP BY side ORDER BY side",
     (1, 3)),
    ("SELECT basename(concat('/data/', o_orderpriority, '/f.parquet')) "
     "AS f, uniq(o_orderkey) AS n FROM orders GROUP BY f ORDER BY f",
     (1, 10)),
    ("SELECT arrayStringConcat(arrayMap(x -> toString(x), "
     "bitPositionsToArray(o_orderkey)), ',') AS bits FROM orders "
     "WHERE o_orderkey < 9 ORDER BY o_orderkey LIMIT 5",
     (1, 5)),
    # ---- round 12 wave 37 surface: ngramSearch relevance tiers ----
    ("SELECT doc_id, round(ngramSearch(text, 'the quick brown'), 3) "
     "AS rel FROM documents WHERE length(text) > 20 "
     "ORDER BY rel DESC, doc_id LIMIT 10",
     (1, 10)),
    ("SELECT multiIf(ngramSearchCaseInsensitive(text, 'DATA') > 0.5, "
     "'hit', ngramDistance(text, 'data') < 0.9, 'near', 'miss') AS tier, "
     "count() AS n FROM documents GROUP BY tier ORDER BY tier",
     (1, 3)),
    # ---- round 12: dirty-data calendar ETL (saturating change*) ----
    ("SELECT toString(changeDay(o_orderdate, o_orderkey % 40)) AS d "
     "FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey LIMIT 10",
     (1, 10)),
    ("SELECT countIf(changeMonth(o_orderdate, o_orderkey % 15) >= "
     "toDateTime('1997-01-01 00:00:00')) AS n FROM orders "
     "WHERE o_orderkey < 200",
     (1, 1)),
    # ---- round 12: Date-narrowed toStartOf* joined to DateTime events
    # (the wave-37 narrowing's join-type edge: Date keys vs DateTime) --
    ("SELECT d.m, count() AS n FROM "
     "(SELECT toStartOfMonth(toDate(ts)) AS m FROM events) d "
     "JOIN (SELECT DISTINCT toStartOfMonth(o_orderdate) AS m "
     "FROM orders) o ON d.m = o.m GROUP BY d.m ORDER BY d.m LIMIT 12",
     (0, 12)),  # composition must EXECUTE; epochs may not overlap
    ("SELECT toStartOfQuarter(toDate(ts)) AS q, "
     "uniq(user_id) AS users FROM events GROUP BY q ORDER BY q LIMIT 8",
     (1, 8)),
    # ---- round 12 wave 39: base64URL-safe token ETL ----
    ("SELECT base64URLDecode(base64URLEncode(substring(text, 1, 24))) "
     "= substring(text, 1, 24) AS rt, count() AS n FROM documents "
     "GROUP BY rt ORDER BY rt",
     (1, 2)),
    ("SELECT base64URLEncode(concat(lang, ':', toString(doc_id))) AS tok "
     "FROM documents ORDER BY doc_id LIMIT 5",
     (1, 5)),
    # ---- round 12 wave 39: Iceberg-style partition-key dashboards ----
    ("SELECT icebergTruncate(1000, o_orderkey) AS part, count() AS n, "
     "round(sum(o_totalprice), 2) AS vol FROM orders GROUP BY part "
     "ORDER BY part LIMIT 10",
     (1, 10)),
    ("SELECT icebergTruncate(2, lang) AS lp, uniq(doc_id) AS n "
     "FROM documents GROUP BY lp ORDER BY lp LIMIT 10",
     (1, 10)),
    # ---- round 12 wave 39: byte-statistics quality screens ----
    ("SELECT countIf(stringBytesEntropy(text) > 3.5) AS rich, "
     "countIf(stringBytesUniq(text) < 10) AS thin FROM documents "
     "WHERE length(text) > 0",
     (1, 1)),
    # ---- round 12 wave 39: histogram bucketing dashboards ----
    ("SELECT widthBucket(o_totalprice, 0, 600000, 12) AS b, count() AS n "
     "FROM orders GROUP BY b ORDER BY b",
     (1, 14)),
    ("SELECT widthBucket(l_discount, 0, 0.11, 11) AS b, "
     "round(avg(l_extendedprice), 2) AS avg_price FROM lineitem "
     "GROUP BY b ORDER BY b LIMIT 12",
     (1, 12)),
    # ---- round 12 wave 39: needle routing + masking ETL ----
    ("SELECT multiSearchFirstPositionCaseInsensitive(text, "
     "['error', 'warning', 'info']) AS pos, count() AS n "
     "FROM documents GROUP BY pos ORDER BY pos LIMIT 20",
     (1, 20)),
    ("SELECT overlay(toString(o_orderkey * 1000000007), 'XXXX', 2) "
     "AS masked FROM orders WHERE o_orderkey < 6 ORDER BY o_orderkey",
     (1, 6)),
    ("SELECT countSubstringsCaseInsensitive(text, 'the') AS hits, "
     "count() AS docs FROM documents GROUP BY hits "
     "ORDER BY hits DESC LIMIT 10",
     (1, 10)),
    # ---- round 12: fuzzy entity match (soundex + edit distance) ----
    ("SELECT c_name, soundex(c_name) AS sx, "
     "editDistance(c_name, 'Customer#000000001') AS ed FROM customer "
     "WHERE editDistance(c_name, 'Customer#000000001') <= 2 "
     "ORDER BY ed, c_name LIMIT 10",
     (1, 10)),
    # ---- round 12: settings-aware SELECT (getSettingOrDefault) ----
    ("SELECT getSettingOrDefault('custom_shard_hint', 'none') AS hint, "
     "count() AS n FROM orders GROUP BY hint",
     (1, 1)),
    # ---- round 12: 15-minute grid dashboard over the event stream ----
    ("SELECT toStartOfInterval(ts, INTERVAL 15 MINUTE) AS grid, "
     "count() AS n FROM events GROUP BY grid ORDER BY n DESC, grid "
     "LIMIT 24",
     (1, 24)),
]


@pytest.mark.parametrize("sql,bounds", QUERIES, ids=[q[:48] for q, _ in QUERIES])
def test_migration_query_executes(ch, sql, bounds):
    rows = ch.query_ch(sql).collect()
    lo, hi = bounds
    assert lo <= len(rows) <= hi, f"{len(rows)} rows outside [{lo}, {hi}]"


def test_migration_script_round6_composition(ch, tmp_path):
    """A realistic migration script — the statement forms a ClickHouse
    user's deploy scripts chain together — must run end-to-end through
    `execute_script` and leave the expected state behind: typed DDL with
    MATERIALIZED/EPHEMERAL columns, FORMAT-inline seeding, projection
    lifecycle, mutations, OPTIMIZE DEDUPLICATE, and monitoring reads.
    """
    ch.execute_script(
        """
        CREATE DATABASE IF NOT EXISTS migdb;

        CREATE TABLE migdb.metrics (
            k Int64,
            site String,
            raw Float64,
            scaled Float64 MATERIALIZED raw * 100,
            seed Int64 EPHEMERAL,
            bucket Int64 DEFAULT seed % 4
        ) ENGINE = MergeTree() ORDER BY k;

        INSERT INTO migdb.metrics (k, site, raw, seed) FORMAT JSONEachRow
        {"k": 1, "site": "eu", "raw": 0.5, "seed": 9}
        {"k": 2, "site": "us", "raw": 1.5, "seed": 10}
        {"k": 2, "site": "us", "raw": 1.5, "seed": 10};

        ALTER TABLE migdb.metrics ADD PROJECTION by_site
            (SELECT site, sum(raw) AS total GROUP BY site);
        ALTER TABLE migdb.metrics MATERIALIZE PROJECTION by_site;

        OPTIMIZE TABLE migdb.metrics DEDUPLICATE BY k, site, raw;

        ALTER TABLE migdb.metrics UPDATE raw = raw + 1 WHERE site = 'eu';
        """
    )
    rows = {
        r["k"]: r
        for r in ch.query_ch(
            "SELECT k, site, raw, scaled, bucket FROM migdb.metrics"
        ).collect()
    }
    assert len(rows) == 2, "DEDUPLICATE BY must drop the doubled row"
    assert rows[1]["raw"] == 1.5 and rows[1]["bucket"] == 1
    # MATERIALIZED column computed at insert time (pre-mutation raw)
    assert rows[1]["scaled"] == 50.0 and rows[2]["scaled"] == 150.0
    # projection routes the aggregate shape
    agg = {
        r["site"]: r["total"]
        for r in ch.query_ch(
            "SELECT site, sum(raw) AS total FROM migdb.metrics GROUP BY site"
        ).collect()
    }
    assert agg["us"] == 1.5
    assert ch.query_ch("CHECK TABLE migdb.metrics").collect()[0].result == 1
    out = tmp_path / "export.csv"
    ch.query_ch(
        f"SELECT k, site FROM migdb.metrics ORDER BY k "
        f"INTO OUTFILE '{out}' FORMAT CSVWithNames"
    ).collect()
    assert out.read_text().splitlines()[0] == "k,site"
    ch.execute_script(
        """
        ALTER TABLE migdb.metrics DROP PROJECTION by_site;
        DROP TABLE migdb.metrics;
        DROP DATABASE migdb;
        """
    )


def test_migration_script_round8_ops_runbook(ch, spark, tmp_path):
    """The round-7/8 ops statements composed as one realistic runbook:
    BACKUP -> mutate -> RESTORE round-trip, DETACH TABLE -> ATTACH,
    MOVE PARTITION between tables, FREEZE -> UNFREEZE WITH NAME, and
    DROP -> UNDROP — all through execute_script/query_ch."""
    bk = tmp_path / "bk"
    ch.execute_script(
        """
        CREATE DATABASE IF NOT EXISTS opsdb;
        CREATE TABLE opsdb.m (k Int64, region String)
            ENGINE = MergeTree PARTITION BY region ORDER BY k;
        INSERT INTO opsdb.m VALUES (1, 'eu'), (2, 'eu'), (3, 'us');
        CREATE TABLE opsdb.m2 (k Int64, region String)
            ENGINE = MergeTree PARTITION BY region ORDER BY k;
        """
    )
    # BACKUP, then a destructive mutation, then RESTORE to a new name
    ch.execute_ch(f"BACKUP TABLE opsdb.m TO File('{bk}')")
    ch.execute_ch("ALTER TABLE opsdb.m DELETE WHERE region = 'eu'")
    assert spark.table("opsdb.m").count() == 1
    ch.execute_script(
        f"""
        DROP TABLE opsdb.m SYNC;
        RESTORE TABLE opsdb.m FROM File('{bk}');
        """
    )
    assert spark.table("opsdb.m").count() == 3
    # FREEZE a named snapshot, mutate, UNFREEZE by name
    ch.execute_ch("ALTER TABLE opsdb.m FREEZE WITH NAME 'pre_mig'")
    ch.execute_ch("ALTER TABLE opsdb.m DELETE WHERE k = 3")
    ch.execute_ch("SYSTEM UNFREEZE WITH NAME 'pre_mig'")
    # MOVE the eu partition to the second table
    ch.execute_ch(
        "ALTER TABLE opsdb.m MOVE PARTITION 'eu' TO TABLE opsdb.m2"
    )
    assert spark.table("opsdb.m2").count() == 2
    assert spark.table("opsdb.m").count() == 0
    # DETACH -> ATTACH round-trip keeps the moved-out state
    ch.execute_script(
        """
        DETACH TABLE opsdb.m2;
        ATTACH TABLE opsdb.m2;
        """
    )
    assert spark.table("opsdb.m2").count() == 2
    # DROP -> UNDROP restores the most recent incarnation
    ch.execute_script(
        """
        DROP TABLE opsdb.m2;
        UNDROP TABLE opsdb.m2;
        """
    )
    assert spark.table("opsdb.m2").count() == 2
    ch.execute_script(
        """
        DROP TABLE opsdb.m SYNC;
        DROP TABLE opsdb.m2 SYNC;
        DROP DATABASE opsdb;
        """
    )


def test_migration_script_round8b_session_features(ch, spark):
    """Second round-8 runbook: the session-feature statements chain in
    ONE script — CREATE FUNCTION -> use in DDL+DML, input() transform
    INSERT, skip-index lifecycle, MODIFY QUERY re-point, refreshable
    MV cycle, EXCHANGE — leaving exactly the expected state."""
    spark.sql("CREATE DATABASE IF NOT EXISTS mig8b")
    for t in ("mig8b.raw", "mig8b.tgt", "mig8b.rv"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    n = ch.execute_script(
        """
        CREATE OR REPLACE FUNCTION mig8b_score AS (x) -> x * 3 + 1;

        CREATE TABLE mig8b.raw (k Int64, s Int64)
          ENGINE = MergeTree ORDER BY k;

        -- transform-during-insert through input()
        INSERT INTO mig8b.raw SELECT id AS k, mig8b_score(id) AS s
        FROM input('id Int64') FORMAT JSONEachRow
        {"id": 1}
        {"id": 2}
        {"id": 3};

        -- skip-index lifecycle on the ingested data
        ALTER TABLE mig8b.raw ADD INDEX k_idx k TYPE bloom_filter;
        ALTER TABLE mig8b.raw MATERIALIZE INDEX k_idx;

        -- trigger MV, then re-point it with MODIFY QUERY
        CREATE TABLE mig8b.tgt (k Int64) ENGINE = MergeTree ORDER BY k;
        CREATE MATERIALIZED VIEW mig8b.mv TO mig8b.tgt AS
          SELECT k FROM mig8b.raw;
        INSERT INTO mig8b.raw VALUES (10, 31);
        ALTER TABLE mig8b.tgt MODIFY QUERY
          SELECT k * 100 AS k FROM mig8b.raw;
        INSERT INTO mig8b.raw VALUES (20, 61);

        -- refreshable MV over the whole table
        CREATE MATERIALIZED VIEW mig8b.rv REFRESH EVERY 1 HOUR AS
          SELECT count(*) AS n, sum(s) AS total FROM mig8b.raw;

        DROP FUNCTION mig8b_score;
        """
    )
    assert n == 12
    raw = {(r.k, r.s) for r in spark.table("mig8b.raw").collect()}
    assert (1, 4) in raw and (3, 10) in raw and len(raw) == 5
    # MV fired once before and once after the MODIFY QUERY
    assert {r.k for r in spark.table("mig8b.tgt").collect()} \
        == {10, 2000}
    [rv] = spark.table("mig8b.rv").collect()
    assert rv.n == 5 and rv.total == 4 + 7 + 10 + 31 + 61
    ch.execute_ch("SYSTEM REFRESH VIEW mig8b.rv")
    assert spark.table("mig8b.rv").count() == 1
    for t in ("mig8b.mv", "mig8b.rv", "mig8b.raw", "mig8b.tgt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_migration_script_round8c_dictionary_enrichment(ch, spark):
    """Round-8 continuation: hierarchical + complex-key dictionaries
    composed into one realistic enrichment script — an org hierarchy
    drives a rollup-to-ancestor report, and a (region, code) composite
    key enriches fact rows; SYSTEM RELOAD after a source change."""
    ch.execute_script("""
        CREATE DATABASE IF NOT EXISTS mig8c;
        CREATE TABLE mig8c.org (id UInt64, name String, parent UInt64)
          ENGINE = MergeTree ORDER BY id;
        INSERT INTO mig8c.org VALUES
          (1, 'corp', 0), (2, 'emea', 1), (3, 'uk', 2), (4, 'apac', 1);
        CREATE DICTIONARY mig8c.orgd
          (id UInt64, name String, parent UInt64 HIERARCHICAL)
          PRIMARY KEY id SOURCE(CLICKHOUSE(TABLE 'mig8c.org'))
          LAYOUT(HASHED()) LIFETIME(0);
        CREATE TABLE mig8c.tariff
          (region String, code UInt64, rate Float64)
          ENGINE = MergeTree ORDER BY (region, code);
        INSERT INTO mig8c.tariff VALUES
          ('eu', 1, 0.2), ('us', 1, 0.1);
        CREATE DICTIONARY mig8c.tariffd
          (region String, code UInt64, rate Float64)
          PRIMARY KEY region, code
          SOURCE(CLICKHOUSE(TABLE 'mig8c.tariff'))
          LAYOUT(COMPLEX_KEY_HASHED()) LIFETIME(0);
    """)
    # rollup-to-ancestor: which org units sit under emea?
    rows = ch.query_ch(
        "SELECT x AS unit, dictIsIn('mig8c.orgd', x, toUInt64(2)) AS "
        "under_emea FROM (SELECT arrayJoin([toUInt64(3), toUInt64(4)]) "
        "AS x) ORDER BY x").collect()
    assert [(int(r.unit), r.under_emea) for r in rows] == [
        (3, True), (4, False)]
    # complex-key enrichment on a fact projection
    r = ch.query_ch(
        "SELECT round(sum(dictGet('mig8c.tariffd', 'rate', "
        "tuple(reg, toUInt64(1)))), 2) AS total FROM "
        "(SELECT arrayJoin(['eu', 'us', 'jp']) AS reg)"
    ).collect()[0]
    assert float(r.total) == 0.3  # jp misses -> 0.0 default
    # source change + RELOAD invalidates the hierarchy closure
    ch.execute_script("""
        INSERT INTO mig8c.org VALUES (5, 'de', 2);
        SYSTEM RELOAD DICTIONARY mig8c.orgd;
    """)
    chain = ch.query_ch(
        "SELECT dictGetHierarchy('mig8c.orgd', toUInt64(5)) AS r"
    ).collect()[0].r
    assert [int(x) for x in chain] == [5, 2, 1]
    ch.execute_ch("DROP DATABASE mig8c SYNC")


def test_migration_script_round11_fence(ch, spark):
    """Round-11 ops-runbook composition: the point-statistic fence in a
    migrating user's monitoring script — the default limit passes, a
    deliberately tight statement-scoped SETTINGS row RAISES with the
    recipe text, and the session-scoped SET override restores the
    query; a follow-up statement confirms statement scoping did not
    leak."""
    import pytest as _pt

    # default limit: the group fits, the fold runs
    row = ch.query_ch(
        "SELECT round(entropy(o_orderstatus), 4) AS h FROM orders"
    ).collect()[0]
    assert row["h"] is not None

    # tight statement-scoped limit: the emitted SQL raise_errors with
    # the operator name and the recipe
    with _pt.raises(Exception, match="max_fold_group_rows"):
        ch.query_ch(
            "SELECT entropy(o_orderstatus) AS h FROM orders "
            "SETTINGS max_fold_group_rows = 10"
        ).collect()

    # statement scope did NOT leak into the session
    row = ch.query_ch(
        "SELECT round(entropy(o_orderstatus), 4) AS h FROM orders"
    ).collect()[0]
    assert row["h"] is not None

    # session-scoped SET override, then the tight group succeeds
    ch.query_ch("SET max_fold_group_rows = 5000000")
    row = ch.query_ch(
        "SELECT o_orderpriority, round(entropy(o_orderstatus), 4) AS h "
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ).collect()
    assert len(row) >= 1
    ch.query_ch("SET max_fold_group_rows = 10000000")


def test_migration_script_round12_pipeline_api(ch, spark):
    """Round-12 runbook: a migrating training-data team drives the
    COMPOSED pipeline through the Python API on a synthetic corpus —
    the 'switch your curation job to this engine' path. Asserts the
    stage roster, row/token monotonicity, and that the SQL surface can
    read the same documents the operators consumed (API + dialect in
    one script, the two entry points a migration actually mixes)."""
    from clickhouse_arrow_spark.operators import corpus_pipeline as cp

    docs = spark.table("documents")
    stages = cp.llm_corpus_pipeline(spark, docs)
    names = [s for s, _ in stages]
    assert names == [
        "0_input", "1_c4", "2_gopher", "3_exact", "4_neardup",
        "5_substr", "6_decontam", "7_dsir", "8_pack", "9_shuffle",
    ]
    summary = {
        r["stage"]: r.asDict() for r in cp.stage_summary(stages).collect()
    }
    order = sorted(summary)
    for prev, cur in zip(order, order[1:]):
        assert summary[cur]["n_rows"] <= summary[prev]["n_rows"]
        assert summary[cur]["toks"] <= summary[prev]["toks"]
    # the dialect surface sees the same corpus the API consumed
    n_sql = ch.query_ch(
        "SELECT count() AS n FROM documents"
    ).collect()[0]["n"]
    assert n_sql == docs.count()
    # and the selection is k-bounded exactly as configured
    assert summary["7_dsir"]["n_rows"] <= cp.DSIR_K
