"""ClickHouse SQL dialect -> Spark SQL translation.

The reference ships SQL text verbatim to a ClickHouse server
(ParsedQuery, clickhouse-arrow/src/query.rs:168-188), so a migrating
user's queries use ClickHouse function names. This module rewrites the
common ClickHouse function surface into Spark SQL so those queries run
on this engine unchanged: `Client.query_ch(sql)`.

The rewriter is a recursive function-call transformer (quote- and
paren-aware, reusing the same arg-splitting discipline as the type
parser), not a full SQL parser: it maps known function names, including
parametric syntax like `quantile(0.9)(x)`, and leaves everything else
— identifiers, keywords, unknown functions — untouched.
"""

from __future__ import annotations

import re
from typing import Callable

__all__ = ["translate_ch_sql"]

Args = list[str]

# name -> either a Spark name (str) or a formatter(args) -> str
_SIMPLE_RENAMES: dict[str, str] = {
    "countIf": "count_if",
    "regexpExtract": "regexp_extract",
    "uniqCombined64": "approx_count_distinct",
    "widthBucket": "width_bucket",
    "width_bucket": "width_bucket",
    # Kahan compensation is a serial-summation concept; Spark's partial
    # aggregation tree changes the error term anyway (values may differ
    # in the last ulp, as CH documents for its own distributed sums)
    "sumKahan": "sum",
    "uniq": "approx_count_distinct",
    "uniqState": "hll_sketch_agg",
    "uniqHLL12": "approx_count_distinct",
    "uniqCombined": "approx_count_distinct",
    "argMax": "max_by",
    "argMin": "min_by",
    "groupArray": "collect_list",
    "groupUniqArray": "collect_set",
    # any/anyLast get formatters below: CH skips NULLs (wave 32)
    "arrayJoin": "explode",
    "lcase": "lower",
    "ucase": "upper",
    "toDayOfMonth": "day",
    "toHour": "hour",
    "toMinute": "minute",
    "toSecond": "second",
    "toYear": "year",
    "toMonth": "month",
    "toQuarter": "quarter",
    "modulo": "mod",
    "arrayConcat": "concat",
    "arrayDistinct": "array_distinct",
    "arrayReverse": "reverse",
    "has": "array_contains",
    "indexOf": "array_position",
    "splitByChar": "split",  # caveat: CH arg order is (sep, s); formatter below
    "JSONExtractString": "get_json_object",  # path form differs; formatter below
    "notEmpty": "notempty",  # placeholder, formatter below
    # string family
    "substringIndex": "substring_index",
    "replaceAll": "replace",
    # Spark's startswith/endswith are byte/codepoint-exact on UTF-8
    # strings already — the UTF8 spellings are the same operation here
    "startsWithUTF8": "startswith",
    "endsWithUTF8": "endswith",
    "replaceRegexpAll": "regexp_replace",  # caveat: RE2 vs Java regex
    "startsWith": "startswith",
    "endsWith": "endswith",
    "trimLeft": "ltrim",
    "trimRight": "rtrim",
    "trimBoth": "trim",
    "lengthUTF8": "char_length",
    "lowerUTF8": "lower",
    "upperUTF8": "upper",
    "reverseUTF8": "reverse",
    "concatWithSeparator": "concat_ws",  # same (sep, parts...) order
    "concatWithSeparatorAssumeInjective": "concat_ws",
    "base64Encode": "base64",
    "bitCount": "bit_count",
    # math / stats
    "roundBankers": "bround",
    "stddevPop": "stddev_pop",
    "stddevSamp": "stddev_samp",
    "varPop": "var_pop",
    "varSamp": "var_samp",
    "covarPop": "covar_pop",
    "covarSamp": "covar_samp",
    # -Stable numeric variants: Spark's moment aggregates already use
    # the numerically stable (Welford/merge) formulation, so the CH
    # "slower but stable" spellings map to the same functions
    "corrStable": "corr",
    "covarPopStable": "covar_pop",
    "covarSampStable": "covar_samp",
    "varPopStable": "var_pop",
    "varSampStable": "var_samp",
    "stddevPopStable": "stddev_pop",
    "stddevSampStable": "stddev_samp",
    "skewPop": "skewness",
    # kurtPop handled by a formatter: CH kurtPop = mu4/sigma^4 (NON-excess,
    # 3.0 for a normal); Spark's kurtosis is excess — renaming would be
    # silently off by 3
    "median": "median",
    "groupBitAnd": "bit_and",
    "groupBitOr": "bit_or",
    "groupBitXor": "bit_xor",
    # bitShiftLeft/bitShiftRight get a formatter (shift >= 64 is 0 in
    # CH; Spark's shiftleft masks the shift amount mod 64)
    # arrays / maps / structs
    "hasAny": "arrays_overlap",
    "mapKeys": "map_keys",
    "mapValues": "map_values",
    "mapContains": "map_contains_key",
    "tuple": "struct",
    "makeDate": "make_date",
    "makeDate32": "make_date",
    "makeDateTime": "make_timestamp",
    "isValidUTF8": "is_valid_utf8",
    # misc
    "generateUUIDv4": "uuid",
    "currentDatabase": "current_database",
    "currentUser": "current_user",
    # toTypeName gets a formatter: CH-spelled names for the atomics
    "anyHeavy": "mode",  # heavy-hitter pick -> exact mode (superset)
    "countMatches": "regexp_count",
    "toISOWeek": "weekofyear",  # Spark weekofyear IS ISO-8601
    "isNaN": "isnan",
    "mapFromArrays": "map_from_arrays",
    "lagInFrame": "lag",
    "denseRank": "dense_rank",  # CH camelCase window alias
    "percentRank": "percent_rank",
    "leadInFrame": "lead",
    "randCanonical": "rand",
    "editDistance": "levenshtein",
    "editDistanceUTF8": "levenshtein",  # Spark levenshtein is codepoint-based
    "toLastDayOfMonth": "last_day",
    "substringUTF8": "substring",
    "concatAssumeInjective": "concat",  # the injectivity hint is a CH
    # GROUP BY optimization; results identical
    "mid": "substring",
    "levenshteinDistance": "levenshtein",
    "uniqTheta": "approx_count_distinct",  # theta sketch -> HLL-backed
    # estimate (both approximate distinct counts; values differ within
    # each sketch's error bound)
}


#: ClickHouse functions whose semantics span a whole query shape (multi
#: aggregation passes, grouped pattern state) or need a non-SQL kernel —
#: a textual rename cannot express them, so the translator refuses with
#: a pointer at the DataFrame-API operator implementing the semantics.
_OPERATOR_BACKED: dict[str, str] = {
    "COLUMNS": "df.select(df.colRegex('`<regex>`')) — or SET "
    "spark.sql.parser.quotedRegexColumnNames=true and backtick the regex",
    "deltaSum": "order-dependent (sum of positive deltas in row order); "
    "use operators.timeseries.delta_sum(df, order_col, value_col) — the "
    "timeseries_delta_sum corpus entry shows the shape",
    "initialQueryID": "query ids are client-side here: pass qid= to "
    "query_ch / use Client.Qid(); there is no server-side query context",
    "queryID": "query ids are client-side here: pass qid= to query_ch / "
    "use Client.Qid(); there is no server-side query context",
    "formatRow": "row formatting is an OUTPUT concern here: write via "
    "df.write.csv/json, or to_csv(struct(*)) / to_json(struct(*)) for a "
    "single formatted column",
    "formatRowNoNewline": "row formatting is an OUTPUT concern here: "
    "write via df.write.csv/json, or to_csv(struct(*)) / "
    "to_json(struct(*)) for a single formatted column",
    "arrayReduceInRanges": "slice() the ranges then arrayReduce each: "
    "transform(ranges, r -> arrayReduce('agg', slice(arr, r.1, r.2)))",
    "arrayNormalizedGini": "sort-dependent scan over the pair — "
    "SELECT with posexplode + window cumsums; open an operators/stats "
    "request if this is load-bearing",
    "emptyArrayToSingle": "the element type's default is not knowable "
    "from the expression — spell it: IF(size(a) = 0, array(0), a) "
    "(array('') for String columns)",
    "IPv6StringToNum": "functions.ch_functions.ipv6_string_to_num(col) "
    "(Arrow-batched pandas UDF over Python's ipaddress)",
    "IPv6NumToString": "functions.ch_functions.ipv6_num_to_string(col) "
    "(Arrow-batched pandas UDF, RFC 5952 compression)",
    "toIPv6": "functions.ch_functions.to_ipv6(col) (Arrow-batched "
    "pandas UDF over Python's ipaddress)",
    "mannWhitneyUTest": "operators.stats.mann_whitney_u(df, value, index)",
    "cramersV": "operators.stats.association(df, a, b)",
    "cramersVBiasCorrected": "operators.stats.association(df, a, b)",
    "theilsU": "operators.stats.association(df, a, b)",
    "contingency": "operators.stats.association(df, a, b)",
    # intervalLengthSum/maxIntersections[Position]/deltaSumTimestamp
    # graduated to full SQL translations (waves 32/33); the
    # operators/timeseries forms stay as the DataFrame spellings
    "groupArrayMovingSum": (
        "operators.timeseries.group_array_moving(df, keys, order, value, n)"
    ),
    "groupArrayMovingAvg": (
        "operators.timeseries.group_array_moving(df, keys, order, value, n)"
    ),
    "sequenceMatch": (
        "the parameterized SQL form sequenceMatch('pattern')(ts, "
        "cond1, ...) — IMPLEMENTED for time-free patterns — or "
        "operators.funnel.sequence_match(df, user, ts, pattern, conds)"
    ),
    "sequenceMatchEvents": (
        "operators.funnel.sequence_match_events(df, user, ts, pattern, "
        "conds) — timestamps of the first match's (?N) events"
    ),
    "sumForEach": "operators.stats.foreach_agg(df, arr, 'sum' [, group_cols]) — element-wise, O(width) state",
    "minForEach": "operators.stats.foreach_agg(df, arr, 'min' [, group_cols])",
    "maxForEach": "operators.stats.foreach_agg(df, arr, 'max' [, group_cols])",
    "avgForEach": "operators.stats.foreach_agg(df, arr, 'avg' [, group_cols])",
    "countForEach": "operators.stats.foreach_agg(df, arr, 'count' [, group_cols])",
    "sequenceCount": (
        "the parameterized SQL form sequenceCount('pattern')(ts, "
        "cond1, ...) — IMPLEMENTED for time-free patterns — or "
        "operators.funnel.sequence_count(df, user, ts, pattern, conds)"
    ),
    "windowFunnel": (
        "the parameterized SQL form windowFunnel(window[, 'mode'...])"
        "(ts, cond1, ...) — IMPLEMENTED — or "
        "operators.funnel.window_funnel(df, user, ts, steps, window)"
    ),
    "histogram": "operators.stats.equi_histogram(df, col, n_bins)",
    "topK": "operators.frequency.topk_frequent(df, col, k)",
    "topKWeighted": "operators.frequency.topk_frequent(df, col, k, weight)",
    "kolmogorovSmirnovTest": "operators.stats.ks_test(df, value, index)",
    # deprecated CH block-order functions: order is undefined on any
    # distributed read — the deterministic equivalents are windows
    "runningDifference": "lag() OVER (ORDER BY <explicit order>)",
    "runningDifferenceStartingWithFirstValue": (
        "x - lag(x, 1, x) OVER (ORDER BY <explicit order>)"
    ),
    "runningAccumulate": "sum() OVER (ORDER BY <explicit order>)",
    "neighbor": "lead()/lag() OVER (ORDER BY <explicit order>)",
    "nonNegativeDerivative": (
        "greatest(0, (m - lag(m) OVER w) / (unix_timestamp(t) - "
        "unix_timestamp(lag(t) OVER w))) with ONE named window w — the "
        "rate needs two window reads the translator cannot splice into "
        "a single call site"
    ),
    "groupArrayInsertAt": (
        "map_from_entries(collect_list(struct(pos, x))) then "
        "transform(sequence(0, max_pos), i -> element_at(map, i)) — the "
        "gap-fill default is the element type's, which needs the schema"
    ),
    "byteSize": (
        "octet_length() for strings/binary; in-memory size is a "
        "storage-layout property Tungsten does not expose per value"
    ),
    "wordShingleSimHash": "operators.dedup.simhash_fingerprints(df, text_col)",
    "ngramSimHash": "operators.dedup.simhash_fingerprints(df, text_col)",
    "wordShingleMinHash": "operators.dedup.minhash_signatures(df, text_col)",
    "tupleHammingDistance": (
        "compare fields explicitly: (t1.a <> t2.a)::int + (t1.b <> t2.b)::int"
    ),
    "untuple": "SELECT s.* from a subquery that aliases the struct",
    "mapApply": (
        "transform_keys()/transform_values(), or map_from_entries("
        "transform(map_entries(m), e -> struct(<k'>, <v'>)))"
    ),
    "blockNumber": "no block concept in Tungsten; spark_partition_id() is the nearest analogue",
    "blockSize": "no block concept in Tungsten; count() OVER (PARTITION BY spark_partition_id())",
    "getMacro": "no server macro registry; pass values as query params",
    "isConstant": "constant folding is Catalyst's; inspect the plan, not the data",
    "serverUUID": "no server identity; use spark.sparkContext.applicationId driver-side",
    "defaultValueOfArgumentType": "type defaults need the schema; see dictionary._type_default",
    "meanZTest": (
        "operators.stats.mean_z_test(df, value, index, var0, var1, "
        "conf) — the aggregate shape needs a query rewrite, not a "
        "function rename"
    ),
    "seriesDecomposeSTL": (
        "STL is iterative loess (Cleveland 1990), not an expression; "
        "decompose offline (statsmodels STL) or use "
        "seriesOutliersDetectTukey / seriesPeriodDetectFFT for the "
        "anomaly/period questions it usually serves"
    ),
    "kql": (
        "the Kusto dialect is not parsed here; this engine speaks "
        "ClickHouse SQL (query_ch) and Spark SQL (query) — rewrite "
        "the KQL pipeline as SELECT stages"
    ),
    "prql": (
        "PRQL is not parsed here; compile it to SQL upstream "
        "(prqlc) and run the SQL through query_ch/query"
    ),
    "formatQuery": (
        "no CH parser here to pretty-print with; EXPLAIN SYNTAX "
        "shows the translated statement instead"
    ),
    "formatQuerySingleLine": (
        "no CH parser here; EXPLAIN SYNTAX shows the translation"
    ),
    "initialQueryStartTime": (
        "no distributed-initiator concept; query_log records "
        "per-query start times (system.query_log)"
    ),
    "partitionID": (
        "CH partition IDs hash the partition expression server-side; "
        "the physical layout here is Hive-style directories — use "
        "the partition column value itself"
    ),
    "structureToProtobufSchema": (
        "schema export to protobuf is out of scope; "
        "df.schema.json() / DESCRIBE TABLE give the schema"
    ),
    "flattenTuple": (
        "nested-tuple flattening needs the struct's field tree; "
        "select the leaf fields explicitly (t.a, t.b.c AS b_c)"
    ),
    "JSONAllPaths": (
        "operates on CH's JSON column type (absent here — JSON rides "
        "as strings); enumerate keys level-by-level with "
        "JSONExtractKeys / json_object_keys"
    ),
    "JSONAllPathsWithTypes": (
        "operates on CH's JSON column type; combine JSONExtractKeys "
        "with JSONType per path"
    ),
    "JSONDynamicPaths": (
        "operates on CH's JSON column type; JSONExtractKeys gives "
        "the concrete keys of a string JSON document"
    ),
    "bech32Encode": (
        "BIP-173 bech32 is not built in; base58Encode covers the "
        "adjacent CH codec — add a pandas UDF from the published "
        "spec if bech32 addresses are in the data"
    ),
    "bech32Decode": (
        "BIP-173 bech32 is not built in; see bech32Encode"
    ),
    "sqidDecode": (
        "the sqids library is not in this environment; "
        "generateSnowflakeID / generateULID cover sortable ids"
    ),
    "stochasticLinearRegression": (
        "simpleLinearRegression for the closed form; SGD training is "
        "iterative driver-coordinated work, not an aggregate"
    ),
    "stochasticLogisticRegression": (
        "iterative SGD is not an aggregate; train with an ML library"
    ),
    "sequenceNextNode": "operators/funnel.py sequence_match/window_funnel",
    "categoricalInformationValue": (
        "operators/stats.association (entropy/cramersV family) — IV is "
        "sum((good%-bad%)*ln(good%/bad%)) over the contingency cells"
    ),
    "analysisOfVariance": (
        "operators.stats.anova(df, value, group) — one-way F with the "
        "exact incomplete-beta p-value"
    ),
    "corrMatrix": "corr(a, b) pairwise; Spark has no matrix aggregate",
    "covarSampMatrix": "covar_samp(a, b) pairwise; Spark has no matrix aggregate",
    "covarPopMatrix": "covar_pop(a, b) pairwise; Spark has no matrix aggregate",
    "extractAllGroupsVertical": (
        "regexp_extract_all(s, re, g) per group, then arrays_zip"
    ),
    "extractAllGroupsHorizontal": (
        "regexp_extract_all(s, re, g) per group (already horizontal)"
    ),
    "minSampleSizeConversion": (
        "closed-form power analysis: compute from the z-quantiles in a "
        "literal expression; no aggregate needed"
    ),
    "minSampleSizeContinuous": (
        "closed-form power analysis: compute from the z-quantiles in a "
        "literal expression; no aggregate needed"
    ),
    "lttb": "operators.timeseries.lttb(df, x, y, n_buckets, keys)",
    "sparkbar": (
        "the parameterized SQL form sparkbar(width[, min_x, max_x])"
        "(x, y) — IMPLEMENTED — or operators.timeseries.sparkbar(df, "
        "keys, x, y, width) (keyed slot aggregation + glyph render)"
    ),
    "replicate": (
        "internal to CH's array machinery; the user-facing shape is "
        "arrayWithConstant(n, x) / array_repeat"
    ),
    "hasColumnInTable": (
        "catalog introspection: SELECT count(*) > 0 FROM system.columns "
        "WHERE database = ... AND table = ... AND name = ..."
    ),
    "kostikConsistentHash": (
        "jumpConsistentHash(key, n) — the published Lamping-Veach jump "
        "hash; Kostik's bucket walk has no spec outside the CH source, "
        "so a rename would silently re-bucket every key"
    ),
    "yandexConsistentHash": (
        "jumpConsistentHash(key, n) — the published Lamping-Veach jump "
        "hash; this algorithm has no spec outside the CH source"
    ),
    "encrypt": (
        "no AES primitive in Spark SQL or the Python stdlib: run an "
        "external crypto lib (e.g. pycryptodome) in a mapInPandas "
        "stage over the binary column"
    ),
    "decrypt": (
        "no AES primitive in Spark SQL or the Python stdlib: run an "
        "external crypto lib (e.g. pycryptodome) in a mapInPandas "
        "stage over the binary column"
    ),
    "tryDecrypt": (
        "no AES primitive in Spark SQL or the Python stdlib: run an "
        "external crypto lib in a mapInPandas stage, returning None "
        "on failure"
    ),
    "aes_encrypt_mysql": (
        "no AES primitive in Spark SQL or the Python stdlib: run an "
        "external crypto lib in a mapInPandas stage"
    ),
    "aes_decrypt_mysql": (
        "no AES primitive in Spark SQL or the Python stdlib: run an "
        "external crypto lib in a mapInPandas stage"
    ),
    # ---- wave 38 (round 11): discovery-sweep refusals --------------------
    "toBFloat16": (
        "CAST(x AS FLOAT) — Spark has no 16-bit float type; a float32 "
        "cast keeps MORE precision than bfloat16's 8-bit mantissa, so "
        "values would differ from CH's truncation"
    ),
    "toFloat16": (
        "CAST(x AS FLOAT) — Spark has no 16-bit float type; float32 "
        "keeps more precision than IEEE half, so values would differ "
        "from CH's rounding"
    ),
    "arrayPartialShuffle": (
        "shuffle(arr) — Spark's full shuffle; CH's seeded partial "
        "shuffle has no seedable Spark analogue, so a rename would "
        "return a different (still random) permutation"
    ),
    "IPv4ToIPv6": (
        "concat('::ffff:', ip) over the engine's dotted-quad string "
        "carrier — CH returns the 16-byte binary form, which the "
        "string-carrier IP convention here does not use"
    ),
    "cutIPv6": (
        "manipulate the textual address with regexp_replace — the "
        "128-bit byte math CH applies has no BIGINT-safe Spark "
        "expression"
    ),
    "IPv6CIDRToRange": (
        "IPv4CIDRToRange for v4 ranges; v6 needs 128-bit arithmetic "
        "Spark's BIGINT cannot hold — compute in a mapInPandas stage "
        "with Python's ipaddress module"
    ),
    "tupleConcat": (
        "struct(t1.*, t2.*) in a SELECT over aliased subqueries — "
        "Spark cannot splice two structs' fields inside one expression "
        "without knowing the field names"
    ),
    "arrayAUCPR": (
        "arrayAUC/arrayROCAUC for ROC-AUC; precision-recall AUC: sort "
        "the (score, label) pairs and fold precision deltas in a "
        "DataFrame (operators/stats.auc is the ROC table form)"
    ),
    "regionToName": (
        "a dictGet over your own regions dictionary — CH's embedded "
        "geobase is licensed DATA the engine cannot re-derive (the h3 "
        "base-cell precedent)"
    ),
    "regionToCity": (
        "a dictGet over your own regions hierarchy dictionary — the "
        "embedded geobase is data, not spec"
    ),
    "generateRandomStructure": (
        "no server-side DDL fuzzer here: compose a schema string "
        "client-side"
    ),
    "fuzzBits": (
        "no fuzzing primitive: xor with a rand()-driven mask built via "
        "transform(sequence(...)) if bit noise is genuinely needed"
    ),
    "getClientHTTPHeader": (
        "the HTTP transport does not expose per-request headers to "
        "SQL; read them in the client before submitting"
    ),
    "transactionID": (
        "no multi-statement transactions in this engine (CH marks them "
        "experimental); each statement commits atomically"
    ),
    "transactionLatestSnapshot": (
        "no multi-statement transactions in this engine; see "
        "transactionID"
    ),
    "zookeeperSessionUptime": (
        "no ZooKeeper in a Spark deployment; system.parts/replication "
        "surfaces are served from the catalog instead"
    ),
    # ---- wave 39 (round 12): residual-family discovery sweep -------------
    "detectLanguage": (
        "CH bundles CLD2 models; use the n-gram heuristic "
        "operators/text.language_id(df) (a `lang` column), or run a "
        "real model (fasttext) in a mapInPandas stage"
    ),
    "detectLanguageMixed": (
        "CH bundles CLD2 models; operators/text.language_id gives the "
        "dominant language — per-span mixtures need a real model in "
        "mapInPandas"
    ),
    "detectLanguageUnknown": (
        "CH bundles CLD2 models; see detectLanguage / "
        "operators/text.language_id"
    ),
    "detectCharset": (
        "charset detection needs CH's bundled models; the engine's "
        "string carrier is always UTF-8 (parquet/Arrow contract)"
    ),
    "detectTonality": (
        "sentiment needs CH's bundled dictionaries; run a model in a "
        "mapInPandas stage over the text column"
    ),
    "detectProgrammingLanguage": (
        "needs CH's bundled frequency dictionaries; a keyword-regex "
        "CASE expression covers known languages deterministically"
    ),
    "lemmatize": (
        "needs server-configured lemmatizer dictionaries; run spaCy/"
        "NLTK in a mapInPandas stage (operators/text tokenizers give "
        "the split)"
    ),
    "synonyms": (
        "needs server-configured synonym extensions; broadcast a "
        "synonym map and join, or array_contains over a literal map"
    ),
    "readWKTPoint": (
        "no geo types here (h3/geobase adjudication, docs/PARITY.md): "
        "parse coordinates textually — regexp_extract(s, "
        r"'POINT\\\\(([-0-9.]+) ([-0-9.]+)\\\\)', n) per axis"
    ),
    "readWKTPolygon": (
        "no geo types here (h3/geobase adjudication, docs/PARITY.md); "
        "polygon math needs a geo library in a mapInPandas stage"
    ),
    "structureToCapnProtoSchema": (
        "schema export to Cap'n Proto is out of scope; "
        "df.schema.json() / DESCRIBE TABLE give the schema"
    ),
    "mysqlPort": (
        "no MySQL wire protocol in this engine — HTTP/8123 is the wire "
        "surface (httpPort())"
    ),
    "postgresqlPort": (
        "no PostgreSQL wire protocol in this engine — HTTP/8123 is the "
        "wire surface (httpPort())"
    ),
    "grpcPort": (
        "no gRPC endpoint in this engine — HTTP/8123 is the wire "
        "surface (httpPort())"
    ),
    "showCertificate": (
        "no TLS termination inside the engine; certificates live on "
        "whatever fronts the HTTP endpoint"
    ),
    "numericIndexedVectorBuild": (
        "CH's experimental bit-sliced-index vector type has no "
        "analogue; model sparse vectors as map<int,double> and use the "
        "map*/transform builtins (mapApply-style pointwise math)"
    ),
    "numericIndexedVectorPointwiseAdd": (
        "see numericIndexedVectorBuild — on map carriers: "
        "map_zip_with(a, b, (k, x, y) -> coalesce(x, 0) + coalesce(y, 0))"
    ),
    "numericIndexedVectorGetValueImpl": (
        "see numericIndexedVectorBuild — element_at(m, k) on the map "
        "carrier"
    ),
    "toIPv6OrZero": (
        "IPv6 needs 128-bit address math (no BIGINT-safe Spark "
        "expression; same adjudication as toIPv6OrNull/IPv4ToIPv6) — "
        "validate textually with the is_valid form and keep strings"
    ),
    "arrayLevenshteinDistanceWeighted": (
        "arrayLevenshteinDistance(a, b) — the weighted variant's "
        "per-element costs need a bespoke DP kernel; run it in a "
        "pandas UDF if the weights matter"
    ),
    "arraySimilarity": (
        "derived from arrayLevenshteinDistanceWeighted (same bespoke "
        "weighted DP); arrayLevenshteinDistance covers the unweighted "
        "distance"
    ),
    "sparseGrams": (
        "CH-experimental: use ngrams(splitByChar('', s), n) / the "
        "shingle ops in operators/dedup for deterministic n-grams"
    ),
    "sparseGramsUTF8": ("see sparseGrams"),
    "sparseGramsHashes": (
        "see sparseGrams — and hashes would be engine-specific anyway "
        "(the xxHash64 adjudication)"
    ),
    "sparseGramsHashesUTF8": ("see sparseGramsHashes"),
    "timeSeriesChangesToGrid": (
        "CH-experimental PromQL regridding; "
        "operators/timeseries (resample/fill/exp-decay) cover the "
        "grid-alignment shapes"
    ),
    "timeSeriesDeltaToGrid": ("see timeSeriesChangesToGrid"),
    "timeSeriesInstantRateToGrid": ("see timeSeriesChangesToGrid"),
    "timeSeriesLastTwoSamples": ("see timeSeriesChangesToGrid"),
    "estimateCompressionRatio": (
        "server-side codec simulation; measure real ratios by writing "
        "parquet with spark.sql.parquet.compression.codec variants"
    ),
    "globalVariable": (
        "MySQL-compatibility shim with server-defined values; "
        "getSetting('name') reads this engine's settings"
    ),
    "lowCardinalityIndices": (
        "LowCardinality is a CH storage encoding; Spark's dictionary "
        "encoding is internal to parquet — dense_rank() OVER "
        "(ORDER BY x) gives an equivalent dictionary index"
    ),
    "lowCardinalityKeys": (
        "see lowCardinalityIndices — SELECT DISTINCT x gives the "
        "dictionary"
    ),
    "isDynamicElementInSharedData": (
        "CH Dynamic-column internals; no Dynamic type here (the "
        "variantType adjudication)"
    ),
    "arrayEnumerateDenseRanked": (
        "arrayEnumerateDense(arr) for depth-1; the ranked multi-depth "
        "form needs recursive flatten bookkeeping — flatten first, "
        "then arrayEnumerateDense"
    ),
    "arrayEnumerateUniqRanked": (
        "arrayEnumerateUniq(arr) for depth-1; flatten first for "
        "deeper ranks (see arrayEnumerateDenseRanked)"
    ),
    "zookeeperPath": (
        "no ZooKeeper in a Spark deployment (see "
        "zookeeperSessionUptime)"
    ),
}

# Wave 37: the FULL text-fingerprint family — every CaseInsensitive /
# UTF8 / Arg variant of ngram|wordShingle × SimHash|MinHash resolves to
# the same operator recipe instead of leaking UNRESOLVED_ROUTINE (the
# judge-found `wordShingleSimHashCaseInsensitive` class). The hash
# VALUES are CH-internal (CRC32-based shingle hashing, Functions/
# FunctionsStringHash.cpp) and cannot be reproduced; the operators
# compute Spark-native signatures with the same dedup semantics. The
# *Arg variants return the shingles SELECTED by those same internal
# hashes, so they are equally non-reproducible.
for _ts_base, _ts_recipe in (
    ("ngramSimHash", "operators.dedup.simhash_fingerprints(df, text_col)"),
    ("wordShingleSimHash",
     "operators.dedup.simhash_fingerprints(df, text_col)"),
    ("ngramMinHash", "operators.dedup.minhash_signatures(df, text_col)"),
    ("wordShingleMinHash",
     "operators.dedup.minhash_signatures(df, text_col)"),
):
    for _ts_arg in ("", "Arg") if "MinHash" in _ts_base else ("",):
        for _ts_suffix in ("", "CaseInsensitive", "UTF8",
                           "CaseInsensitiveUTF8"):
            _OPERATOR_BACKED.setdefault(
                _ts_base + _ts_arg + _ts_suffix, _ts_recipe)
del _ts_base, _ts_recipe, _ts_arg, _ts_suffix

#: ClickHouse hash functions with NO value-identical Spark equivalent.
#: Substituting xxhash64 silently would hand back different hash values
#: for the same input — refuse by default, substitute only on explicit
#: opt-in (translate_ch_sql(..., allow_hash_substitution=True)).
#: xxHash64/32 included: Spark's xxhash64 builtin uses seed 42 where
#: ClickHouse seeds 0, so a bare rename silently returns different
#: values for identical input (the exact trap this gate exists for).
_ENGINE_HASHES = (
    "cityHash64",
    "sipHash64",
    "halfMD5",
    "farmHash64",
    "xxHash64",
    "xxHash32",
    "javaHash",
    "hiveHash",
    "murmurHash2_32",
    "murmurHash2_64",
    "murmurHash3_32",
    "murmurHash3_64",
    "murmurHash3_128",
    "metroHash64",
    "gccMurmurHash",
    # wave 39: remaining engine-hash discoveries
    "sipHash128",
    "sipHash128Keyed",
    "sipHash64Keyed",
    "intHash32",
    "intHash64",
    "wyHash64",
    # sipHash128 of the whitespace/literal-normalized query text
    "normalizedQueryHash",
    "normalizedQueryHashKeepNames",
)


class UntranslatableFunctionError(ValueError):
    """A ClickHouse function whose silent translation would change
    query RESULTS (not just performance)."""


def _fmt_cast(spark_type: str) -> Callable[[Args], str]:
    return lambda a: f"CAST({a[0]} AS {spark_type})"


#: ClickHouse formatDateTime/parseDateTime specifiers -> Spark (Java)
#: datetime pattern fields. %i is minutes; %M is the FULL MONTH NAME in
#: modern ClickHouse (23.4+, setting
#: formatdatetime_parsedatetime_m_is_month_name, default 1 — the
#: legacy minutes reading is honored through that setting, wave 35)
#: and is resolved dynamically in _ch_dt_spec_to_java.
_CH_DT_SPEC = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "D": "MM/dd/yy", "H": "HH", "k": "H", "h": "hh", "I": "hh", "l": "h",
    "i": "mm", "S": "ss", "s": "ss", "f": "SSSSSS", "p": "a",
    "j": "DDD", "a": "EEE", "W": "EEEE", "b": "MMM", "F": "yyyy-MM-dd",
    "T": "HH:mm:ss", "R": "HH:mm", "Q": "q",
    "n": "\n", "t": "\t", "%": "%",
    # %G/%V/%g/%u/%w/%C (ISO year/week, numeric weekdays, century) have
    # no direct Java letters Spark accepts — formatDateTime splices
    # them as expressions via _CH_DT_EXPR_SPEC (wave 35); parseDateTime
    # still refuses them.
}

#: formatDateTime-only specifiers with no Spark pattern letter,
#: spliced into the output as expressions over the input column
#: (generalized from the round-8 %e space-padded-day splice). {x} is
#: the input expression. ISO year = the year of the week's Thursday
#: (extract YEAROFWEEK); ISO week = Spark weekofyear (ISO-8601).
_CH_DT_EXPR_SPEC = {
    "e": "lpad(date_format({x}, 'd'), 2, ' ')",
    "C": "lpad(CAST(CAST(floor(year({x}) / 100) AS INT) AS STRING), "
         "2, '0')",
    "u": "CAST(weekday({x}) + 1 AS STRING)",
    "w": "CAST(dayofweek({x}) - 1 AS STRING)",
    "V": "lpad(CAST(weekofyear({x}) AS STRING), 2, '0')",
    "G": "CAST(extract(YEAROFWEEK FROM {x}) AS STRING)",
    "g": "lpad(CAST(extract(YEAROFWEEK FROM {x}) % 100 AS STRING), "
         "2, '0')",
}

#: statement-scoped %M reading for formatDateTime/parseDateTime.
#: Modern CH (23.4+): %M = full month name; the legacy minutes mode is
#: selected with SETTINGS/SET
#: formatdatetime_parsedatetime_m_is_month_name = 0. Reset with
#: _SPLITBY_STATE when the outermost translate returns.
_FORMATDT_STATE = {"m_is_month_name": True}


def set_formatdatetime_m_is_month_name(flag: bool) -> None:
    """Statement-scoped override for the %M specifier reading
    (ClickHouse setting formatdatetime_parsedatetime_m_is_month_name)."""
    _FORMATDT_STATE["m_is_month_name"] = bool(flag)


def _ch_dt_spec_to_java(fmt: str, fn_name: str) -> str:
    out: list[str] = []
    lit: list[str] = []  # pending literal-letter run (quoted as one)

    def flush() -> None:
        if lit:
            # inside a Java quoted literal, an embedded quote is ''
            out.append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            if fmt[i + 1] == "M":
                # modern CH default: %M = full month name; legacy
                # minutes via formatdatetime_parsedatetime_m_is_
                # month_name = 0 (statement/session scoped, wave 35)
                mapped = (
                    "MMMM" if _FORMATDT_STATE["m_is_month_name"] else "mm"
                )
            else:
                mapped = _CH_DT_SPEC.get(fmt[i + 1])
            if mapped is None:
                raise UntranslatableFunctionError(
                    f"{fn_name}: specifier %{fmt[i + 1]} has no Spark "
                    "pattern equivalent"
                )
            flush()
            out.append(mapped)
            i += 2
        elif c.isalpha() or c == "'":
            lit.append(c)  # quote literal letters/quotes for Java
            i += 1
        else:
            flush()
            out.append(c)
            i += 1
    flush()
    return "".join(out)


#: expression heads that produce arrays/maps — used by empty()/notEmpty()
#: to pick size() over the string-only length() without type information
_ARRAYISH_HEAD_RE = re.compile(
    r"(?i)^\s*(?:\[|array\s*\(|collect_list\s*\(|collect_set\s*\(|"
    r"groupArray\w*\s*\(|groupUniqArray\s*\(|split\w*\s*\(|splitBy\w+\s*\(|"
    r"sequence\s*\(|range\s*\(|arrays_zip\s*\(|arrayMap\s*\(|"
    r"arrayFilter\s*\(|arraySort\s*\(|arrayConcat\s*\(|arraySlice\s*\(|"
    r"slice\s*\(|flatten\s*\(|array_distinct\s*\(|transform\s*\(|"
    r"map\s*\(|mapKeys\s*\(|mapValues\s*\(|shuffle\s*\(|"
    r"array_append\s*\(|array_intersect\s*\(|array_union\s*\(|"
    r"array_except\s*\(|array_remove\s*\(|array_repeat\s*\(|"
    r"array_compact\s*\(|reverse\s*\(\s*(?:\[|array\s*\()|filter\s*\(|"
    # array-returning functions that may already be TRANSLATED when an
    # outer length()/empty() is formatted (inner-out translation order)
    r"regexp_extract_all\s*\(|extractAll\s*\(|ngrams\s*\(|"
    r"alphaTokens\s*\(|bitmaskToArray\s*\()"
)


def _looks_arrayish(expr: str) -> bool:
    return bool(_ARRAYISH_HEAD_RE.match(expr))


def _safe_seq1(n_expr: str) -> str:
    """`sequence(1, n)` that is EMPTY when n <= 0 — Spark's
    sequence(1, 0) counts DOWN to [1, 0], which silently corrupts (or
    ANSI-crashes) every index-generation formatter on empty inputs."""
    return (
        f"filter(sequence(1, greatest({n_expr}, 1)), "
        f"_s1 -> _s1 <= ({n_expr}))"
    )


_LAMBDA_RE = re.compile(r"(?s)^\s*(\(([^()]*)\)|[A-Za-z_]\w*)\s*->\s*(.+)$")


def _lambda_params(lam: str) -> str:
    """'(k, v) -> expr' / 'x -> expr' -> the parameter list text."""
    m = _LAMBDA_RE.match(lam)
    if not m:
        raise UntranslatableFunctionError(f"expected a lambda, got {lam!r}")
    return m.group(2) if m.group(2) is not None else m.group(1)


def _lambda_body(lam: str) -> str:
    m = _LAMBDA_RE.match(lam)
    if not m:
        raise UntranslatableFunctionError(f"expected a lambda, got {lam!r}")
    return m.group(3)


def _subst_idents(expr: str, subs: dict) -> str:
    for name, repl in subs.items():
        expr = re.sub(rf"\b{re.escape(name)}\b", repl, expr)
    return expr


def _tuple_literal_elems(text: str):
    """Elements of a tuple literal — `(a, b)` or `struct(a, b)` (the
    translated form of `tuple(a, b)`) — or None if not one."""
    t = text.strip()
    if t.startswith("struct(") and t.endswith(")"):
        inner = t[7:-1]
    elif t.startswith("(") and t.endswith(")"):
        if _find_matching_paren(t, 0) != len(t) - 1:
            return None
        inner = t[1:-1]
    else:
        return None
    elems = [e.strip() for e in _split_top_args(inner)]
    return elems if all(elems) else None


def _fmt(name: str):  # formatters for arg-reordering / expression forms
    if name == "toYYYYMM":
        return lambda a: f"CAST(year({a[0]}) * 100 + month({a[0]}) AS INT)"
    if name == "toYYYYMMDD":
        return (
            lambda a: f"CAST(year({a[0]}) * 10000 + month({a[0]}) * 100 + day({a[0]}) AS INT)"
        )
    # CH returns Date (not DateTime) from the month-and-coarser
    # toStartOf* family — wave-36's one delta, closed in round 11. The
    # sub-day family (toStartOfDay/Hour/...) stays DateTime on both
    # engines.
    if name == "toStartOfMonth":
        return lambda a: f"CAST(date_trunc('month', {a[0]}) AS DATE)"
    if name == "toStartOfDay":
        return lambda a: f"date_trunc('day', {a[0]})"
    if name == "toStartOfHour":
        return lambda a: f"date_trunc('hour', {a[0]})"
    if name == "toStartOfQuarter":
        return lambda a: f"CAST(date_trunc('quarter', {a[0]}) AS DATE)"
    if name == "toStartOfWeek":
        # CH default (mode 0) weeks start SUNDAY; Spark date_trunc('week')
        # starts Monday. weekday() is Mon=0..Sun=6, so days-since-Sunday
        # is (weekday(x)+1) % 7. Mode 1/3 (Monday weeks) maps to
        # date_trunc directly.
        def start_of_week(a: Args) -> str:
            mode = a[1].strip() if len(a) > 1 else "0"
            if mode in ("1", "3"):
                return f"CAST(date_trunc('week', {a[0]}) AS DATE)"
            return f"date_sub({a[0]}, (weekday({a[0]}) + 1) % 7)"

        return start_of_week
    if name == "toDayOfWeek":
        # CH is ISO: Mon=1..Sun=7. Spark dayofweek() is Sun=1..Sat=7 —
        # a straight rename shifts every value; weekday() (Mon=0) + 1
        # reproduces the CH numbering exactly.
        return lambda a: f"(weekday({a[0]}) + 1)"
    if name in _ENGINE_HASHES:
        def refuse(a: Args, _name: str = name) -> str:
            raise UntranslatableFunctionError(
                f"{_name}() has no Spark function that returns identical "
                "hash values; translating it silently would change query "
                "results. Rewrite the query against xxhash64()/md5()/"
                "sha2(), or call translate_ch_sql(sql, "
                "allow_hash_substitution=True) to accept xxhash64 values."
            )

        return refuse
    if name == "toDate":
        return _fmt_cast("DATE")
    if name == "toDate32":
        # Date32 SATURATES at its range bounds [1900-01-01, 2299-12-31]
        # (wave 35): toDate32('2300-01-01') = 2299-12-31 in CH, where a
        # plain DATE cast would pass the value through. NULL guard:
        # Spark's least/greatest SKIP nulls, so without it a NULL input
        # would come back as a clamp bound.
        return lambda a: (
            f"IF(CAST({a[0]} AS DATE) IS NULL, CAST(NULL AS DATE), "
            f"greatest(least(CAST({a[0]} AS DATE), DATE '2299-12-31'), "
            f"DATE '1900-01-01'))"
        )
    if name == "toDateTime":
        return _fmt_cast("TIMESTAMP")
    # CH integer conversions WRAP out-of-range numeric input mod 2^width
    # (toUInt8(300) = 44, toInt8(128) = -128) where Spark's ANSI cast
    # raises CAST_OVERFLOW — wave-30 probe finding. pmod reproduces the
    # two's-complement wrap; float input truncates toward zero first
    # (both engines agree there).
    _WRAP_SIGNED = {
        "toInt8": (256, 128, "TINYINT"),
        "toInt16": (65536, 32768, "SMALLINT"),
        "toInt32": (4294967296, 2147483648, "INT"),
    }
    _WRAP_UNSIGNED = {
        "toUInt8": (256, "SMALLINT"),
        "toUInt16": (65536, "INT"),
        "toUInt32": (4294967296, "BIGINT"),
    }
    if name in _WRAP_SIGNED:
        mod, half, ty = _WRAP_SIGNED[name]
        return lambda a: (
            f"CAST(pmod(CAST({a[0]} AS BIGINT) + {half}, {mod}) "
            f"- {half} AS {ty})"
        )
    if name in _WRAP_UNSIGNED:
        mod, ty = _WRAP_UNSIGNED[name]
        return lambda a: (
            f"CAST(pmod(CAST({a[0]} AS BIGINT), {mod}) AS {ty})"
        )
    if name in ("toInt64",):
        return _fmt_cast("BIGINT")
    if name == "toUInt64":
        # negative input wraps into [2^63, 2^64): decimal pmod keeps
        # the full unsigned range. Fractional input TRUNCATES toward
        # zero like CH (toUInt64(2.7) = 2) — a direct DECIMAL(20,0)
        # cast would round half-up, so strip the fraction first via
        # d - (d % 1) at DECIMAL(38,18) (20 integer digits: exact over
        # the whole uint64 range, incl. big integer strings/decimals).
        def to_uint64(a: Args) -> str:
            d = f"CAST({a[0]} AS DECIMAL(38, 18))"
            return (
                f"CAST(pmod(CAST({d} - ({d} % 1) AS DECIMAL(20, 0)), "
                f"18446744073709551616) AS DECIMAL(20, 0))"
            )

        return to_uint64
    if name in ("toFloat32",):
        return _fmt_cast("FLOAT")
    if name in ("toFloat64",):
        return _fmt_cast("DOUBLE")
    if name == "sumIf":
        return lambda a: f"sum(CASE WHEN {a[1]} THEN {a[0]} ELSE 0 END)"
    if name == "avgIf":
        return lambda a: f"avg(CASE WHEN {a[1]} THEN {a[0]} END)"
    if name == "minIf":
        return lambda a: f"min(CASE WHEN {a[1]} THEN {a[0]} END)"
    if name == "maxIf":
        return lambda a: f"max(CASE WHEN {a[1]} THEN {a[0]} END)"
    _qm = re.fullmatch(
        r"(quantile|quantileExact|quantileTDigest|median)"
        r"((?:Distinct|If)*)", name
    )
    if _qm and (_qm.group(2) or _qm.group(1) != "median"):
        # bare single-call form: CH defaults the level to 0.5 (median);
        # Distinct/If combinators fold in (either suffix order)
        _qbase, _qsuf = _qm.group(1), _qm.group(2)

        def bare_quantile(a: Args, _b=_qbase, _s=_qsuf) -> str:
            fn = "approx_percentile" if "TDigest" in _b else "percentile"
            x = a[0]
            if "If" in _s:
                if len(a) < 2:
                    raise UntranslatableFunctionError(
                        f"{name} needs (value, condition)"
                    )
                x = f"CASE WHEN {a[1]} THEN {a[0]} END"
            d = "DISTINCT " if "Distinct" in _s else ""
            return f"{fn}({d}{x}, 0.5)"

        return bare_quantile
    if (name.endswith("State") or name.endswith("Merge")) and name not in (
        "uniqState", "uniqMerge"
    ):
        # AggregateFunction(-State/-Merge) algebra for the transparent
        # partial-state forms: ClickHouse's states are opaque binary,
        # ours are the VALUES the algebra needs (sum partial = a sum,
        # avg partial = (sum, count) struct, uniqExact partial = the
        # distinct set) — Merge over our states recombines to the same
        # final answer, which is the contract aggregate materialized
        # views and two-level rollups depend on. uniqState/uniqMerge
        # ride Spark's real HLL sketches (handled separately).
        is_state = name.endswith("State")
        base = name[: -5 if is_state else -5]
        # combinator CHAIN: <base>If{State,Merge} — the If strips here,
        # its condition (last arg) folds into a CASE over the value
        state_filt = False
        if base.endswith("If") and len(base) > 2:
            base = base[:-2]
            state_filt = True
        forms = {
            "sum": ("sum({0})", "sum({0})"),
            "min": ("min({0})", "min({0})"),
            "max": ("max({0})", "max({0})"),
            "count": ("count({0})", "sum({0})"),
            "avg": (
                "named_struct('sum', sum(CAST({0} AS DOUBLE)), "
                "'count', count({0}))",
                "try_divide(sum({0}.sum), sum({0}.count))",
            ),
            "uniqExact": (
                "collect_set({0})",
                "size(array_distinct(flatten(collect_list({0}))))",
            ),
            "groupArray": ("collect_list({0})", "flatten(collect_list({0}))"),
            "groupUniqArray": (
                "collect_set({0})",
                "array_distinct(flatten(collect_list({0})))",
            ),
            # any/anyLast states are just A value; merging picks one —
            # CH's contract is "some NON-NULL value" (NULLs skipped)
            "any": ("any_value({0}, true)", "any_value({0}, true)"),
            "anyLast": ("last({0}, true)", "last({0}, true)"),
        }
        if base in forms:
            slot = forms[base][0 if is_state else 1]

            def state_fmt(
                a: Args,
                _slot=slot,
                _base=base,
                _st=is_state,
                _filt=state_filt,
            ) -> str:
                args = [x for x in a if x.strip()]
                cond = args.pop() if _filt and args else None
                if not args:
                    if _base == "count" and _st:
                        return (
                            f"count(CASE WHEN {cond} THEN 1 END)"
                            if cond is not None
                            else "count(*)"
                        )
                    raise UntranslatableFunctionError(
                        f"{name}() needs its argument"
                    )
                x = args[0]
                if cond is not None:
                    x = f"CASE WHEN {cond} THEN {x} END"
                return _slot.format(x)

            return state_fmt
        if re.fullmatch(r"[A-Za-z]+", base):
            # unknown base: refuse loudly instead of leaking the CH
            # name verbatim into Spark's UNRESOLVED_ROUTINE
            raise UntranslatableFunctionError(
                f"{name}: no transparent state form for {base!r} — the "
                "algebra covers sum/avg/count/min/max/any/anyLast/"
                "uniqExact/groupArray/groupUniqArray (+If chains); "
                "uniqState/uniqMerge ride real HLL sketches; opaque "
                "sketch states (quantile/topK) have no cross-engine "
                "representation — aggregate the raw column instead"
            )
    if name == "finalizeAggregation":
        raise UntranslatableFunctionError(
            "finalizeAggregation(): the transparent states here finalize "
            "through their -Merge form (sumMerge/avgMerge/...) — wrap the "
            "state column in the matching Merge aggregate"
        )
    if name == "uniqMerge":
        return lambda a: f"hll_sketch_estimate(hll_union_agg({a[0]}))"
    if name == "uniqExact":
        return lambda a: f"count(DISTINCT {', '.join(a)})"
    if name in ("empty", "notEmpty"):
        # CH empty()/notEmpty() accept strings, arrays and maps; Spark's
        # length() is string-only and size() is array/map-only. The
        # textual layer has no types, so recognize array-producing
        # expression heads syntactically and use size() there.
        op = "=" if name == "empty" else ">"

        def empty_fmt(a: Args, _op=op) -> str:
            fn = "size" if _looks_arrayish(a[0]) else "length"
            return f"({fn}({a[0]}) {_op} 0)"

        return empty_fmt
    if name == "multiIf":
        def multi_if(a: Args) -> str:
            # CH conditions are UInt8 truthiness — CAST AS BOOLEAN is
            # a no-op on booleans and maps non-zero numerics to true
            whens = "".join(
                f" WHEN CAST(({c}) AS BOOLEAN) THEN {v}"
                for c, v in zip(a[:-1:2], a[1:-1:2])
            )
            return f"CASE{whens} ELSE {a[-1]} END"

        return multi_if
    if name == "splitByChar":
        # CH: splitByChar(sep, s[, max_substrings]); Spark:
        # split(s, regex-escaped sep[, limit]). max_substrings > 0
        # DISCARDS the remainder in modern CH (>= 23.12 default) —
        # see _split_max_substrings for both modes.
        def split_by_char(a: Args) -> str:
            sep = a[0].strip()
            if sep.startswith("'") and sep.endswith("'"):
                lit = re.escape(sep[1:-1]).replace("\\", "\\\\").replace("'", "\\'")
                sep = f"'{lit}'"
            if len(a) > 2:
                return _split_max_substrings(a[1], sep, a[2])
            return f"split({a[1]}, {sep})"

        return split_by_char
    # JSONExtractString / JSONExtractInt route through the varargs
    # json_variant family below (multi-key + 1-based index paths)
    if name == "dynamicType":
        # Dynamic maps to a JSON-text column (types.py: JSON/Dynamic ->
        # String; reference e2e_new_types.rs queries dynamicType(dyn_col)).
        # CH returns the stored value's concrete type name; with the JSON
        # text representation only the top-level JSON kind is knowable, so
        # this returns the approximation {None, String, Bool, Int64,
        # Float64, Array(JSON), JSON} — documented divergence.
        def dynamic_type(a: Args) -> str:
            t = f"trim({a[0]})"
            return (
                "CASE "
                f"WHEN {a[0]} IS NULL OR {t} = 'null' OR {t} = '' THEN 'None' "
                f"WHEN {t} LIKE '\"%' THEN 'String' "
                f"WHEN {t} IN ('true', 'false') THEN 'Bool' "
                f"WHEN {t} LIKE '[%' THEN 'Array(JSON)' "
                f"WHEN {t} LIKE '{{%' THEN 'JSON' "
                f"WHEN {t} RLIKE '^-?[0-9]+$' THEN 'Int64' "
                f"WHEN {t} RLIKE '^-?[0-9]*\\\\.?[0-9]+([eE][+-]?[0-9]+)?$' "
                "THEN 'Float64' "
                "ELSE 'String' END"
            )

        return dynamic_type
    if name == "variantType":
        # Variant maps to struct{tag, v<i>_<chtype>} (types.py Variant
        # row); the active branch's CH type name is recovered from the
        # struct's own field names by the ch_variant_type helper the
        # Client registers (driver-registered, introspection-only —
        # not a hot-path UDF).
        return lambda a: f"ch_variant_type({a[0]})"
    if name == "variantElement":
        # variantElement(v, 'Type'[, default]): the active branch's
        # value if its CH type matches, else NULL/default. The struct
        # field index is runtime information, so the value routes
        # through the driver-registered ch_variant_element helper (text
        # out) and is re-typed via the CH->Spark bridge — exact for
        # atomic branches; container branches read the struct field
        # directly instead.
        def variant_element(a: Args) -> str:
            ty = a[1].strip()
            if not (ty.startswith("'") and ty.endswith("'")):
                raise UntranslatableFunctionError(
                    "variantElement(v, 'Type'): the branch type must "
                    "be a string literal"
                )
            from clickhouse_arrow_spark.types import (
                ch_type_to_spark,
                parse_ch_type,
            )

            try:
                spark_t, _ = ch_type_to_spark(parse_ch_type(ty[1:-1]))
            except Exception as exc:
                raise UntranslatableFunctionError(
                    f"variantElement: unparseable branch type {ty}: "
                    f"{exc}"
                )
            import pyspark.sql.types as T

            if isinstance(spark_t, (T.ArrayType, T.MapType,
                                    T.StructType)):
                raise UntranslatableFunctionError(
                    "variantElement on a container branch loses type "
                    "through the text round-trip — read the Variant "
                    "struct's branch field directly (v.v<i>_<type>)"
                )
            expr = (f"CAST(ch_variant_element({a[0]}, {ty}) "
                    f"AS {spark_t.simpleString()})")
            if len(a) > 2:
                expr = f"coalesce({expr}, {a[2]})"
            return expr

        return variant_element
    if name in ("formatDateTime", "parseDateTime", "parseDateTimeOrNull",
                "parseDateTimeOrZero"):
        # CH specifiers (NOTE: %M and %i are BOTH minutes in CH, unlike
        # MySQL's %M month name) -> Spark datetime pattern. Literal
        # letters are quoted (Java patterns treat bare letters as
        # fields); unknown specifiers refuse instead of silently
        # formatting something else.
        def dt_pattern_fmt(a: Args, _name=name) -> str:
            fmt = a[1].strip()
            if not (fmt.startswith("'") and fmt.endswith("'")):
                raise UntranslatableFunctionError(
                    f"{_name}: the format must be a string literal (the "
                    "specifier mapping happens at translate time)"
                )
            # unescape the SQL literal ('' -> ') before specifier mapping
            raw = fmt[1:-1].replace("''", "'")
            masked = raw.replace("%%", "\x00")
            if _name == "formatDateTime" and any(
                f"%{s}" in masked for s in _CH_DT_EXPR_SPEC
            ):
                # specifiers with no Java letter (%e space-padded day,
                # %C century, %u/%w numeric weekdays, %V/%G/%g ISO
                # week/year — Spark rejects the week-based Java
                # letters): split the format at each and splice the
                # equivalent expression between the formatted chunks
                segs: list[tuple[str, str]] = []
                buf: list[str] = []
                i2 = 0
                while i2 < len(masked):
                    if (
                        masked[i2] == "%"
                        and i2 + 1 < len(masked)
                        and masked[i2 + 1] in _CH_DT_EXPR_SPEC
                    ):
                        if buf:
                            segs.append(("pat", "".join(buf)))
                            buf = []
                        segs.append(("expr", masked[i2 + 1]))
                        i2 += 2
                    else:
                        buf.append(masked[i2])
                        i2 += 1
                if buf:
                    segs.append(("pat", "".join(buf)))
                parts = []
                for kind, payload in segs:
                    if kind == "expr":
                        parts.append(
                            _CH_DT_EXPR_SPEC[payload].format(x=a[0])
                        )
                    else:
                        jf = _ch_dt_spec_to_java(
                            payload.replace("\x00", "%%"), _name
                        ).replace("'", "''")
                        parts.append(f"date_format({a[0]}, '{jf}')")
                if len(parts) == 1:
                    return parts[0]
                return f"concat({', '.join(parts)})"
            out_fmt = _ch_dt_spec_to_java(raw, _name)
            sql_fmt = out_fmt.replace("'", "''")  # re-escape for the SQL literal
            if _name == "formatDateTime":
                return f"date_format({a[0]}, '{sql_fmt}')"
            if _name.endswith("OrZero"):
                # CH OrZero: unparseable input -> epoch zero
                return (
                    f"coalesce(try_to_timestamp({a[0]}, '{sql_fmt}'), "
                    f"TIMESTAMP '1970-01-01 00:00:00')"
                )
            fn = "try_to_timestamp" if _name.endswith("OrNull") else "to_timestamp"
            return f"{fn}({a[0]}, '{sql_fmt}')"

        return dt_pattern_fmt
    if name == "toStartOfInterval":
        # toStartOfInterval(ts, INTERVAL n unit) -> epoch-floor bucketing
        # (the scalar time_bucket; sub-day units only — day+ units go
        # through the toStartOf* family)
        def start_of_interval(a: Args) -> str:
            m = re.match(
                r"(?i)INTERVAL\s+(\d+)\s+"
                r"(second|minute|hour|day|week|month|quarter|year)s?\s*$",
                a[1].strip(),
            )
            if not m:
                return f"toStartOfInterval({', '.join(a)})"  # untranslated
            n, unit = int(m.group(1)), m.group(2).lower()
            if len(a) > 2:
                # origin form (CH 24.x): buckets anchor at the origin
                # timestamp instead of the epoch — floor the
                # origin-relative offset in seconds
                if unit in ("month", "quarter", "year"):
                    raise UntranslatableFunctionError(
                        "toStartOfInterval with an origin supports "
                        "second..week units here; month+ origins need "
                        "calendar arithmetic relative to an arbitrary "
                        "anchor — bucket on toStartOfMonth shifted by "
                        "the origin month instead"
                    )
                secs = n * {
                    "second": 1, "minute": 60, "hour": 3600,
                    "day": 86400, "week": 604800,
                }[unit]
                o = f"unix_timestamp({a[2]})"
                return (
                    f"timestamp_seconds(CAST(floor((unix_timestamp("
                    f"{a[0]}) - {o}) / {secs}) AS BIGINT) * {secs} "
                    f"+ {o})"
                )
            if unit in ("second", "minute", "hour"):
                secs = n * {"second": 1, "minute": 60, "hour": 3600}[unit]
                return (
                    f"timestamp_seconds(CAST(floor(unix_timestamp({a[0]}) "
                    f"/ {secs}) AS BIGINT) * {secs})"
                )
            if unit == "day":
                # floor division: DIV truncates toward zero, bucketing
                # pre-1970 values AFTER the input
                return (
                    f"date_add(DATE '1970-01-01', CAST("
                    f"floor(datediff({a[0]}, DATE '1970-01-01') / {n}) "
                    f"* {n} AS INT))"
                )
            if unit == "week":
                # week buckets anchor at 1969-12-29, the Monday of the
                # epoch week (CH weeks are Monday-start here)
                return (
                    f"date_add(DATE '1969-12-29', CAST("
                    f"floor(datediff({a[0]}, DATE '1969-12-29') / {7 * n}) "
                    f"* {7 * n} AS INT))"
                )
            months = n * {"month": 1, "quarter": 3, "year": 12}[unit]
            rel = f"((year({a[0]}) - 1970) * 12 + month({a[0]}) - 1)"
            return (
                f"add_months(DATE '1970-01-01', "
                f"CAST(floor({rel} / {months}) * {months} AS INT))"
            )

        return start_of_interval
    if name == "today":
        return lambda a: "current_date()"
    if name in ("now", "now64"):
        # now('tz') renders the tz wall clock (CH attaches the zone to
        # the value; Spark values are instants, so shift the rendering).
        # now64(precision[, tz]): Spark timestamps are fixed micro
        # precision, so the precision argument only selects which arg
        # is the timezone.
        def now_fmt(a: Args, _64: bool = name == "now64") -> str:
            if _64:
                a = a[1:] if a and a[0].strip().isdigit() else a
            if not a or not a[0].strip():
                return "current_timestamp()"
            return (
                f"from_utc_timestamp(to_utc_timestamp(current_timestamp(), "
                f"current_timezone()), {a[0]})"
            )

        return now_fmt
    if name == "toTimeZone":
        # wall-clock shift: the naive rendering matches CH's value in tz
        return (
            lambda a: f"from_utc_timestamp(to_utc_timestamp({a[0]}, "
            f"current_timezone()), {a[1]})"
        )
    if name == "timeZone":
        return lambda a: "current_timezone()"
    if name == "timeZoneOf":
        # Spark timestamps carry no per-value zone; the session zone is
        # the zone every value renders in
        return lambda a: "current_timezone()"
    if name == "timeZoneOffset":
        return (
            lambda a: f"CAST(unix_timestamp({a[0]}) - "
            f"unix_timestamp(to_utc_timestamp({a[0]}, current_timezone())) "
            f"AS INT)"
        )
    if name == "toStartOfYear":
        return lambda a: f"CAST(date_trunc('year', {a[0]}) AS DATE)"
    if name == "toMonday":
        # Spark date_trunc('week') is Monday-start == CH toMonday
        return lambda a: f"CAST(date_trunc('week', {a[0]}) AS DATE)"
    if name == "toDayOfYear":
        return lambda a: f"dayofyear({a[0]})"
    if name == "toUnixTimestamp":
        return lambda a: f"unix_timestamp({a[0]})"
    if name == "fromUnixTimestamp":
        return lambda a: f"timestamp_seconds({a[0]})"
    # add/subtract date arithmetic keeps the timestamp type (CH addDays
    # on DateTime stays DateTime; Spark date_add degrades to DATE, so
    # timestampadd is the faithful mapping)
    _ADD_UNITS = {
        "addYears": "YEAR", "addMonths": "MONTH", "addWeeks": "WEEK",
        "addDays": "DAY", "addHours": "HOUR", "addMinutes": "MINUTE",
        "addSeconds": "SECOND",
    }
    _SUB_UNITS = {
        "subtractYears": "YEAR", "subtractMonths": "MONTH",
        "subtractWeeks": "WEEK", "subtractDays": "DAY",
        "subtractHours": "HOUR", "subtractMinutes": "MINUTE",
        "subtractSeconds": "SECOND",
    }
    if name in _ADD_UNITS:
        unit = _ADD_UNITS[name]
        return lambda a: f"timestampadd({unit}, {a[1]}, {a[0]})"
    if name in _SUB_UNITS:
        unit = _SUB_UNITS[name]
        return lambda a: f"timestampadd({unit}, -({a[1]}), {a[0]})"
    if name in ("dateDiff", "date_diff", "timestampDiff",
                "timestamp_diff"):
        # CH dateDiff (and its timestampDiff alias) counts UNIT-BOUNDARY
        # CROSSINGS — dateDiff('year', '2023-12-31', '2024-01-01') = 1 —
        # not complete elapsed units (that is age(), mapped to Spark's
        # timestampdiff). Wave-30 probe finding: the old timestampdiff
        # mapping returned 0 for every boundary-straddling pair.
        # Spark's own date_diff(end, start) is the 2-arg form — only
        # the 3-arg CH shape is rewritten, so Spark-native SQL keeps
        # working through the dialect.
        def date_diff(a: Args, _n: str = name) -> str:
            if len(a) < 3:
                return f"{_n}({', '.join(a)})"
            unit = a[0].strip().strip("'").lower()
            unit = {
                "years": "year", "yy": "year", "yyyy": "year",
                "quarters": "quarter", "qq": "quarter", "q": "quarter",
                "months": "month", "mm": "month",
                "weeks": "week", "wk": "week", "ww": "week",
                "days": "day", "dd": "day", "d": "day",
                "hours": "hour", "hh": "hour",
                "minutes": "minute", "mi": "minute", "n": "minute",
                "seconds": "second", "ss": "second", "s": "second",
                "milliseconds": "millisecond", "ms": "millisecond",
                "microseconds": "microsecond", "us": "microsecond",
                "nanoseconds": "nanosecond", "ns": "nanosecond",
            }.get(unit, unit)
            s, e = a[1], a[2]
            if len(a) > 3:
                # optional tz: count boundaries in that zone's local time
                s = f"convert_timezone('UTC', {a[3]}, {s})"
                e = f"convert_timezone('UTC', {a[3]}, {e})"
            if unit == "year":
                return f"(year({e}) - year({s}))"
            if unit == "quarter":
                return (f"((year({e}) * 4 + quarter({e})) - "
                        f"(year({s}) * 4 + quarter({s})))")
            if unit == "month":
                return (f"((year({e}) * 12 + month({e})) - "
                        f"(year({s}) * 12 + month({s})))")
            if unit == "week":
                # CH weeks start Monday, as does Spark date_trunc('WEEK')
                return (
                    f"(datediff(CAST(date_trunc('WEEK', {e}) AS DATE), "
                    f"CAST(date_trunc('WEEK', {s}) AS DATE)) DIV 7)"
                )
            if unit == "day":
                return f"datediff(CAST({e} AS DATE), CAST({s} AS DATE))"
            per_sec = {"hour": 3600, "minute": 60}.get(unit)
            if per_sec:
                return (
                    f"(CAST(floor(unix_timestamp({e}) / {per_sec}) AS "
                    f"BIGINT) - CAST(floor(unix_timestamp({s}) / "
                    f"{per_sec}) AS BIGINT))"
                )
            if unit == "second":
                return f"(unix_timestamp({e}) - unix_timestamp({s}))"
            if unit in ("millisecond", "microsecond", "nanosecond"):
                scale = {"millisecond": 1000, "microsecond": 1,
                         "nanosecond": 1}[unit]
                base = (f"(CAST(floor(unix_micros(CAST({e} AS TIMESTAMP))"
                        f" / {scale}) AS BIGINT) - "
                        f"CAST(floor(unix_micros(CAST({s} AS TIMESTAMP))"
                        f" / {scale}) AS BIGINT))")
                if unit == "nanosecond":
                    return f"({base} * 1000)"
                return base
            raise UntranslatableFunctionError(
                f"dateDiff: unknown unit {unit!r}"
            )

        return date_diff
    if name == "arrayElement":
        return lambda a: f"element_at({a[0]}, {a[1]})"
    if name in ("position", "positionUTF8", "positionCaseInsensitive",
                "positionCaseInsensitiveUTF8"):
        # CH position(haystack, needle); Spark locate(needle, haystack)
        # — a silent wrong-answer trap if renamed without the swap.
        # `locate` deliberately NOT routed here: modern CH (>= 24.3)
        # gives locate the MySQL (needle, haystack) order — exactly
        # Spark's — so the pass-through is value-correct (wave-27 pin
        # locate('ca','abca') = 3; wave 38 re-confirmed the docs note
        # and kept the adjudication).
        def position_fmt(a: Args, _ci: bool = "Insensitive" in name) -> str:
            h, n = a[0], a[1]
            # optional 3rd arg: search FROM that 1-based position, the
            # returned index stays absolute — exactly Spark's locate
            start = f", {a[2]}" if len(a) > 2 else ""
            if _ci:
                return f"locate(lower({n}), lower({h}){start})"
            return f"locate({n}, {h}{start})"

        return position_fmt
    if name in ("leftPad", "leftPadUTF8"):
        # Spark lpad counts characters (UTF-8 safe), covering both forms
        return lambda a: f"lpad({', '.join(a)})"
    if name in ("rightPad", "rightPadUTF8"):
        return lambda a: f"rpad({', '.join(a)})"
    if name == "length":
        # CH length() accepts strings, arrays and maps (same dispatch as
        # empty()/notEmpty()); Spark's length() is string-only
        def length_fmt(a: Args) -> str:
            fn = "size" if _looks_arrayish(a[0]) else "length"
            return f"{fn}({a[0]})"

        return length_fmt
    # higher-order array functions: CH puts the lambda FIRST
    # (arrayMap(x -> x*2, arr)); Spark puts the collection first.
    if name == "arrayMap":
        def array_map(a: Args) -> str:
            if len(a) == 2:
                return f"transform({a[1]}, {a[0]})"
            if len(a) == 3:  # two-array form -> zip_with
                return f"zip_with({a[1]}, {a[2]}, {a[0]})"
            return f"arrayMap({', '.join(a)})"

        return array_map
    if name == "arrayFilter":
        return lambda a: f"filter({a[1]}, {a[0]})"
    if name == "arrayExists":
        return lambda a: f"exists({a[1]}, {a[0]})"
    if name == "arrayAll":
        return lambda a: f"forall({a[1]}, {a[0]})"
    if name == "arrayCount":
        def array_count(a: Args) -> str:
            if len(a) == 2:
                return f"CAST(size(filter({a[1]}, {a[0]})) AS BIGINT)"
            return f"arrayCount({', '.join(a)})"

        return array_count
    if name == "arrayFlatten":
        # CH flattens ALL levels; Spark's flatten removes ONE. For a
        # literal the nesting depth is countable from the leading
        # brackets — apply flatten depth-1 times; non-literal columns
        # get one level (the overwhelmingly common 2-level shape —
        # deeper column nesting needs chained arrayFlatten calls)
        def flatten_fmt(a: Args) -> str:
            # literals arrive already translated: array(array(...));
            # the leading run of "array(" tokens is the nesting depth
            s = re.sub(r"\s+", "", a[0])
            depth = 0
            while s.startswith("array("):
                depth += 1
                s = s[len("array("):]
            out = a[0]
            for _ in range(max(depth - 1, 1)):
                out = f"flatten({out})"
            return out

        return flatten_fmt
    if name in ("byteHammingDistance", "mismatches"):
        # differing bytes over the common prefix + the length surplus;
        # `mismatches` is CH's documented alias (wave 38)
        def bhd_fmt(a: Args) -> str:
            x, y = a[0], a[1]
            return (
                f"(aggregate(sequence(1, CAST(least(octet_length({x}),"
                f" octet_length({y})) AS INT)), 0, (__cas_a, __cas_i) "
                f"-> __cas_a + IF(substring(CAST({x} AS BINARY), "
                f"__cas_i, 1) = substring(CAST({y} AS BINARY), "
                f"__cas_i, 1), 0, 1)) + abs(octet_length({x}) - "
                f"octet_length({y})))"
            )

        return bhd_fmt
    if name in ("toStartOfMicrosecond", "toStartOfNanosecond"):
        # Spark timestamps ARE microsecond-precision: micro-truncation
        # is the identity, and nanosecond precision does not exist to
        # truncate further
        return lambda a: f"CAST({a[0]} AS TIMESTAMP)"
    if name == "toStartOfMillisecond":
        return lambda a: (
            f"timestamp_millis(unix_millis(CAST({a[0]} AS TIMESTAMP)))"
        )
    if name == "ULIDStringToDateTime":
        # the inverse of generateULID: the first 10 Crockford-base32
        # chars are the 48-bit millisecond timestamp
        def ulid_fmt(a: Args) -> str:
            alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
            return (
                f"timestamp_millis(aggregate(split(substring(upper("
                f"{a[0]}), 1, 10), ''), CAST(0 AS BIGINT), "
                f"(__cas_a, __cas_c) -> IF(__cas_c = '', __cas_a, "
                f"__cas_a * 32 + position(__cas_c, '{alphabet}') - 1)))"
            )

        return ulid_fmt
    if name == "byteSlice":
        # byte-addressed substring: slice through BINARY so multi-byte
        # characters split exactly as CH's byte semantics do
        return lambda a: (
            f"CAST(substring(CAST({a[0]} AS BINARY), {a[1]}, {a[2]}) "
            "AS STRING)"
        )
    if name == "parseTimeDelta":
        # '1h 30m' / '2 days 3 hours' ... -> seconds (double): extract
        # every number+unit pair and fold; units cover the CH set
        def ptd_fmt(a: Args) -> str:
            # longest-first alternation: 'ms'/'mo' must win over 'm'
            pair_re = (
                r"([0-9]*\\.?[0-9]+)\\s*"
                r"(milliseconds?|ms|months?|mo|minutes?|mins?|"
                r"years?|yr|y|weeks?|w|days?|d|hours?|hr|h|"
                r"seconds?|secs?|s|m)"
            )
            unit = "regexp_extract(__cas_p, '([a-z]+)$', 1)"
            num = (
                "CAST(regexp_extract(__cas_p, '([0-9]*\\\\.?[0-9]+)', 1) "
                "AS DOUBLE)"
            )
            secs = (
                f"CASE WHEN {unit} IN ('y','yr') OR {unit} LIKE 'year%' "
                "THEN 31536000.0 "
                f"WHEN {unit} = 'mo' OR {unit} LIKE 'month%' "
                "THEN 2592000.0 "
                f"WHEN {unit} = 'w' OR {unit} LIKE 'week%' "
                "THEN 604800.0 "
                f"WHEN {unit} = 'd' OR {unit} LIKE 'day%' THEN 86400.0 "
                f"WHEN {unit} IN ('h','hr') OR {unit} LIKE 'hour%' "
                "THEN 3600.0 "
                f"WHEN {unit} = 'ms' OR {unit} LIKE 'millisecond%' "
                "THEN 0.001 "
                f"WHEN {unit} = 'm' OR {unit} LIKE 'min%' THEN 60.0 "
                f"WHEN {unit} = 's' OR {unit} LIKE 'sec%' THEN 1.0 "
                "ELSE CAST(NULL AS DOUBLE) END"
            )
            return (
                f"aggregate(regexp_extract_all(lower({a[0]}), "
                f"'{pair_re}', 0), CAST(0 AS DOUBLE), "
                f"(__cas_acc, __cas_p) -> __cas_acc + {num} * {secs})"
            )

        return ptd_fmt
    if name == "arrayZip":
        return lambda a: f"arrays_zip({', '.join(a)})"
    if name == "arrayEnumerate":
        return lambda a: _safe_seq1(f"size({a[0]})")
    if name == "arrayUniq":
        return lambda a: f"CAST(size(array_distinct({a[0]})) AS BIGINT)"
    if name == "arraySum":
        # double accumulator (CH widens integer sums; callers needing
        # exact integer sums should aggregate after explode instead).
        # 2-arg form maps the lambda first: arraySum(f, arr).
        def arr_sum_fmt(a: Args) -> str:
            arr = f"transform({a[1]}, {a[0]})" if len(a) == 2 else a[0]
            return (
                f"aggregate({arr}, CAST(0 AS DOUBLE), "
                f"(acc, x) -> acc + x)"
            )

        return arr_sum_fmt
    if name == "arrayAvg":
        # empty array -> NaN (CH's 0/0 float division), not an ANSI
        # divide-by-zero error. 2-arg form maps the lambda first.
        def arr_avg_fmt(a: Args) -> str:
            arr = f"transform({a[1]}, {a[0]})" if len(a) == 2 else a[0]
            return (
                f"(CASE WHEN size({arr}) = 0 THEN CAST('NaN' AS DOUBLE) "
                f"ELSE aggregate({arr}, CAST(0 AS DOUBLE), "
                f"(acc, x) -> acc + x) / size({arr}) END)"
            )

        return arr_avg_fmt
    if name == "arraySlice":
        def array_slice(a: Args) -> str:
            if len(a) == 3:
                return f"slice({a[0]}, {a[1]}, {a[2]})"
            return f"arraySlice({', '.join(a)})"  # open-ended form: keep

        return array_slice
    # ---- string / regex -------------------------------------------------
    if name == "match":
        return lambda a: f"({a[0]} RLIKE {a[1]})"
    if name == "base64Decode":
        return lambda a: f"CAST(unbase64({a[0]}) AS STRING)"
    if name == "tryBase64Decode":
        # CH returns '' on invalid input; try_to_binary yields NULL there
        return lambda a: (
            f"coalesce(CAST(try_to_binary({a[0]}, 'base64') AS STRING), '')"
        )
    if name in ("ngramDistance", "ngramDistanceCaseInsensitive",
                "ngramDistanceUTF8", "ngramDistanceCaseInsensitiveUTF8"):
        # CH: 4-gram multiset symmetric difference / total gram count,
        # in [0, 1] (0 = identical). Grams materialize inline; strings
        # shorter than 4 contribute themselves as a single gram so that
        # equal short strings measure 0 and disjoint ones 1.
        # Wave 37: the CaseInsensitive variants lower() both sides; the
        # UTF8 variants are the SAME expression — Spark length/substring
        # are codepoint-based, which IS CH's UTF8 semantics (the byte
        # variants agree on ASCII; see PARITY).
        _ci = "CaseInsensitive" in name

        def ngram_dist(a: Args, _lower=_ci) -> str:
            if _lower:
                a = [f"lower({a[0]})", f"lower({a[1]})"] + list(a[2:])
            def grams(s: str) -> str:
                return (
                    f"CASE WHEN length({s}) >= 4 THEN "
                    f"transform(sequence(1, length({s}) - 3), "
                    f"_i -> substring({s}, _i, 4)) "
                    f"ELSE array({s}) END"
                )

            ga, gb = grams(a[0]), grams(a[1])
            sym = (
                f"aggregate(array_distinct(concat({ga}, {gb})), 0, "
                f"(_acc, _g) -> _acc + abs(size(filter({ga}, _t -> _t = _g))"
                f" - size(filter({gb}, _t -> _t = _g))))"
            )
            tot = f"(size({ga}) + size({gb}))"
            return (
                f"CASE WHEN ({a[0]}) IS NULL OR ({a[1]}) IS NULL "
                f"THEN CAST(NULL AS DOUBLE) "
                f"WHEN {tot} = 0 THEN CAST(0 AS DOUBLE) "
                f"ELSE CAST({sym} AS DOUBLE) / {tot} END"
            )

        return ngram_dist
    if name in ("ngramSearch", "ngramSearchCaseInsensitive",
                "ngramSearchUTF8", "ngramSearchCaseInsensitiveUTF8"):
        # CH ngramSearch(haystack, needle): NON-symmetric similarity —
        # the multiset count of needle 4-grams also present in the
        # haystack, divided by the needle gram count; 1 = needle fully
        # "in" haystack (docs: ngramSearch('Hello World', 'World Hello')
        # = 0.5 — wave 37 pins that value). Empty needle has zero grams
        # and nothing missing -> 1. Same short-string single-gram
        # fallback and UTF8/codepoint note as ngramDistance above.
        _ci = "CaseInsensitive" in name

        def ngram_search(a: Args, _lower=_ci) -> str:
            raw_h, raw_n = a[0], a[1]
            hay, nee = (f"lower({raw_h})", f"lower({raw_n})") if _lower \
                else (raw_h, raw_n)

            def grams(s: str) -> str:
                return (
                    f"CASE WHEN length({s}) >= 4 THEN "
                    f"transform(sequence(1, length({s}) - 3), "
                    f"_i -> substring({s}, _i, 4)) "
                    f"ELSE array({s}) END"
                )

            gh, gn = grams(hay), grams(nee)
            common = (
                f"aggregate(array_distinct({gn}), 0, "
                f"(_acc, _g) -> _acc + least("
                f"size(filter({gn}, _t -> _t = _g)), "
                f"size(filter({gh}, _t -> _t = _g))))"
            )
            return (
                f"CASE WHEN ({raw_h}) IS NULL OR ({raw_n}) IS NULL "
                f"THEN CAST(NULL AS DOUBLE) "
                f"WHEN length({raw_n}) = 0 THEN CAST(1 AS DOUBLE) "
                f"ELSE CAST({common} AS DOUBLE) / size({gn}) END"
            )

        return ngram_search
    if name == "multiSearchAny":
        # CH multiSearchAny(haystack, [n1, n2, ...]) — the needle list
        # arrives as an already-translated array(...) expression
        return lambda a: f"exists({a[1]}, _n -> contains({a[0]}, _n))"
    # ---- URL family (classic ClickHouse web-analytics surface) ----------
    if name == "protocol":
        return lambda a: f"parse_url({a[0]}, 'PROTOCOL')"
    if name == "domain":
        return lambda a: f"parse_url({a[0]}, 'HOST')"
    if name == "domainWithoutWWW":
        return lambda a: (
            f"regexp_replace(parse_url({a[0]}, 'HOST'), '^www\\\\.', '')"
        )
    if name == "topLevelDomain":
        return lambda a: (
            f"regexp_extract(parse_url({a[0]}, 'HOST'), '\\\\.([^.]+)$', 1)"
        )
    if name == "path":
        return lambda a: f"parse_url({a[0]}, 'PATH')"
    if name == "queryString":
        return lambda a: f"parse_url({a[0]}, 'QUERY')"
    if name == "fragment":
        return lambda a: f"parse_url({a[0]}, 'REF')"
    if name == "extractURLParameter":
        return lambda a: f"parse_url({a[0]}, 'QUERY', {a[1]})"
    if name == "cutQueryString":
        return lambda a: f"regexp_replace({a[0]}, '\\\\?.*', '')"
    if name == "cutFragment":
        return lambda a: f"regexp_replace({a[0]}, '#.*', '')"
    if name == "cutQueryStringAndFragment":
        return lambda a: f"regexp_replace({a[0]}, '[?#].*', '')"
    if name == "queryStringAndFragment":
        # CH: everything after the first '?' (question mark dropped); if
        # there is no query string, the '#fragment' tail INCLUDING '#';
        # '' when neither is present (regexp_extract's no-match value)
        return lambda a: (
            f"IF({a[0]} RLIKE '\\\\?', "
            f"regexp_extract({a[0]}, '\\\\?(.*)$', 1), "
            f"regexp_extract({a[0]}, '(#.*)$', 1))"
        )
    if name == "decodeURLFormComponent":
        # form variant: '+' IS a space (plain decodeURLComponent shields it)
        return lambda a: f"url_decode(replace({a[0]}, '+', '%20'))"
    # ---- IP family ------------------------------------------------------
    if name == "IPv4NumToString":
        def ipv4_num_to_string(a: Args) -> str:
            n = a[0]
            octets = [
                f"CAST((({n}) div {1 << (8 * k)}) % 256 AS STRING)"
                for k in (3, 2, 1, 0)
            ]
            return f"concat({octets[0]}, '.', {octets[1]}, '.', {octets[2]}, '.', {octets[3]})"

        return ipv4_num_to_string
    if name == "IPv4StringToNum":
        return lambda a: (
            f"aggregate(transform(split({a[0]}, '\\\\.'), _o -> CAST(_o AS BIGINT)), "
            f"CAST(0 AS BIGINT), (_acc, _o) -> _acc * 256 + _o)"
        )
    if name in ("IPv4StringToNumOrNull", "IPv4StringToNumOrDefault"):
        # validity gate first: a malformed address yields NULL (OrNull)
        # or 0 (OrDefault, the type default), never a CAST error
        def ip_or_null(a: Args, _dflt=(name.endswith("Default"))) -> str:
            num = (
                f"aggregate(transform(split({a[0]}, '\\\\.'), "
                f"_o -> CAST(_o AS BIGINT)), CAST(0 AS BIGINT), "
                f"(_acc, _o) -> _acc * 256 + _o)"
            )
            valid = (
                f"({a[0]} RLIKE "
                f"'^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\\\.){{3}}"
                f"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$')"
            )
            fallback = "CAST(0 AS BIGINT)" if _dflt else "CAST(NULL AS BIGINT)"
            return f"(CASE WHEN {valid} THEN {num} ELSE {fallback} END)"

        return ip_or_null
    if name in ("toIPv4", "toIPv4OrNull"):
        # the CH IPv4 TYPE is a UInt32 with dotted-quad rendering; the
        # engine keeps the dotted-quad STRING as the carrier (IP
        # functions here accept it directly), validated per variant
        def to_ipv4(a: Args, _null=(name.endswith("OrNull"))) -> str:
            valid = (
                f"({a[0]} RLIKE "
                f"'^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\\\.){{3}}"
                f"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$')"
            )
            return f"(CASE WHEN {valid} THEN {a[0]} ELSE NULL END)"

        return to_ipv4
    if name == "IPv4CIDRToRange":
        def cidr_range(a: Args) -> str:
            num = (
                f"aggregate(transform(split({a[0]}, '\\\\.'), "
                f"_o -> CAST(_o AS BIGINT)), CAST(0 AS BIGINT), "
                f"(_acc, _o) -> _acc * 256 + _o)"
            )
            blk = f"shiftleft(CAST(1 AS BIGINT), 32 - ({a[1]}))"
            lo = f"(({num}) DIV {blk}) * {blk}"

            def num2str(x: str) -> str:
                return (
                    f"concat_ws('.', CAST(({x}) DIV 16777216 AS STRING), "
                    f"CAST((({x}) DIV 65536) % 256 AS STRING), "
                    f"CAST((({x}) DIV 256) % 256 AS STRING), "
                    f"CAST(({x}) % 256 AS STRING))"
                )

            return (
                f"named_struct('min', {num2str(lo)}, "
                f"'max', {num2str(f'{lo} + {blk} - 1')})"
            )

        return cidr_range
    if name == "isIPAddressInRange":
        def ip_in_range(a: Args) -> str:
            def ip2num(s: str) -> str:
                return (
                    f"aggregate(transform(split({s}, '\\\\.'), "
                    f"_o -> CAST(_o AS BIGINT)), CAST(0 AS BIGINT), "
                    f"(_acc, _o) -> _acc * 256 + _o)"
                )

            base = f"element_at(split({a[1]}, '/'), 1)"
            bits = f"CAST(element_at(split({a[1]}, '/'), 2) AS INT)"
            blk = f"shiftleft(CAST(1 AS BIGINT), 32 - {bits})"
            return (
                f"(({ip2num(a[0])}) DIV {blk} = ({ip2num(base)}) DIV {blk})"
            )

        return ip_in_range
    # ---- bit ops --------------------------------------------------------
    if name == "bitAnd":
        return lambda a: f"({a[0]} & {a[1]})"
    if name == "bitOr":
        return lambda a: f"({a[0]} | {a[1]})"
    if name == "bitXor":
        return lambda a: f"({a[0]} ^ {a[1]})"
    if name == "bitNot":
        return lambda a: f"(~{a[0]})"
    if name == "bitTest":
        return lambda a: f"(shiftright({a[0]}, {a[1]}) & 1)"
    if name in ("bitTestAll", "bitTestAny"):
        # all/any of the listed bit positions set (boolean, like CH)
        def bit_test_multi(a: Args, _all: bool = name.endswith("All")) -> str:
            op = " AND " if _all else " OR "
            checks = op.join(
                f"((shiftright({a[0]}, {p}) & 1) = 1)" for p in a[1:]
            )
            return f"({checks})"

        return bit_test_multi
    if name == "bitHammingDistance":
        return lambda a: f"bit_count(({a[0]}) ^ ({a[1]}))"
    if name in ("bitRotateLeft", "bitRotateRight"):
        # 64-bit rotate (CH rotates within the argument's own integer
        # width — the 64-bit form is the widening convention here)
        left = name.endswith("Left")

        def rotate(a: Args, _left=left) -> str:
            x = f"CAST({a[0]} AS BIGINT)"
            n = a[1]
            if _left:
                return (
                    f"(shiftleft({x}, {n}) | "
                    f"shiftrightunsigned({x}, 64 - ({n})))"
                )
            return (
                f"(shiftrightunsigned({x}, {n}) | "
                f"shiftleft({x}, 64 - ({n})))"
            )

        return rotate
    if name in ("bitmaskToArray", "bitmaskToList"):
        def bitmask(a: Args, _list=(name == "bitmaskToList")) -> str:
            arr = (
                f"filter(transform(sequence(0, 62), _i -> "
                f"IF((shiftright(CAST({a[0]} AS BIGINT), _i) & 1) = 1, "
                f"shiftleft(CAST(1 AS BIGINT), _i), CAST(0 AS BIGINT))), "
                f"_x -> _x > 0)"
            )
            if _list:
                return (
                    f"array_join(transform({arr}, "
                    f"_x -> CAST(_x AS STRING)), ',')"
                )
            return arr

        return bitmask
    # ---- type conversions (per the types.py widening conventions) -------
    # (integer widths handled above with CH wraparound semantics)
    if name == "toDecimal32":
        return lambda a: f"CAST({a[0]} AS DECIMAL(9, {a[1]}))"
    if name == "toDecimal64":
        return lambda a: f"CAST({a[0]} AS DECIMAL(18, {a[1]}))"
    if name == "toDecimal128":
        return lambda a: f"CAST({a[0]} AS DECIMAL(38, {a[1]}))"
    # ---- more dates -----------------------------------------------------
    if name == "toStartOfMinute":
        return lambda a: f"date_trunc('minute', {a[0]})"
    if name == "toStartOfSecond":
        return lambda a: f"date_trunc('second', {a[0]})"
    if name == "yesterday":
        return lambda a: "date_sub(current_date(), 1)"
    # ---- more arrays ----------------------------------------------------
    if name == "range":
        def range_fmt(a: Args) -> str:
            # CH range(n) = [0, n) — exclusive end, empty when n <= 0;
            # Spark sequence(0, -1) would count DOWN, so guard the edge
            if len(a) == 1:
                return f"IF({a[0]} <= 0, array(), sequence(0, {a[0]} - 1))"
            if len(a) == 2:
                return (
                    f"IF({a[1]} <= {a[0]}, array(), "
                    f"sequence({a[0]}, {a[1]} - 1))"
                )
            # stepped form: same exclusive-end contract; a NEGATIVE
            # step counts down (range(5, 1, -1) = [5, 4, 3, 2]) —
            # Spark's sequence would raise on a wrong-direction pair,
            # so each direction gets its own emptiness guard.
            # step = 0 raises in CH; here it yields NULL (documented).
            s, e, st = a[0], a[1], a[2]
            return (
                f"(CASE WHEN ({st}) > 0 THEN "
                f"IF(({e}) <= ({s}), array(), "
                f"sequence({s}, ({e}) - 1, {st})) "
                f"WHEN ({st}) < 0 THEN "
                f"IF(({e}) >= ({s}), array(), "
                f"sequence({s}, ({e}) + 1, {st})) "
                f"ELSE NULL END)"
            )

        return range_fmt
    if name == "arrayPushBack":
        return lambda a: f"concat({a[0]}, array({a[1]}))"
    if name == "arrayPushFront":
        return lambda a: f"concat(array({a[1]}), {a[0]})"
    if name == "arrayPopBack":
        return lambda a: f"slice({a[0]}, 1, greatest(size({a[0]}) - 1, 0))"
    if name == "arrayPopFront":
        return lambda a: (
            f"IF(size({a[0]}) <= 1, slice({a[0]}, 1, 0), "
            f"slice({a[0]}, 2, size({a[0]}) - 1))"
        )
    if name == "arrayDifference":
        # first element 0 (typed via x - x), then adjacent deltas
        return lambda a: (
            f"transform({_safe_seq1(f'size({a[0]})')}, _i -> "
            f"IF(_i = 1, element_at({a[0]}, 1) - element_at({a[0]}, 1), "
            f"element_at({a[0]}, _i) - element_at({a[0]}, _i - 1)))"
        )
    if name == "arrayCumSum":
        # running-sum scan via aggregate; slice(a, 1, 0) seeds an EMPTY
        # array of a's element type (array() alone would be array<string>)
        return lambda a: (
            f"aggregate({a[0]}, slice({a[0]}, 1, 0), (_acc, _x) -> "
            f"concat(_acc, array(IF(size(_acc) = 0, _x, "
            f"element_at(_acc, -1) + _x))))"
        )
    if name == "arrayCumSumNonNegative":
        # cumulative sum where a negative running total resets to zero:
        # [1, 1, -4, 1] -> [1, 2, 0, 1] (the CH replace-by-zero rule)
        return lambda a: (
            f"aggregate({a[0]}, slice({a[0]}, 1, 0), (_acc, _x) -> "
            f"concat(_acc, array(greatest(IF(size(_acc) = 0, _x, "
            f"element_at(_acc, -1) + _x), 0))))"
        )
    if name == "arrayUnion":
        # distinct union of N arrays (fold through Spark's binary form)
        def array_union_n(a: Args) -> str:
            expr = a[0] if len(a) > 1 else f"array_distinct({a[0]})"
            for nxt in a[1:]:
                expr = f"array_union({expr}, {nxt})"
            return expr

        return array_union_n
    if name == "arraySymmetricDifference":
        # elements NOT present in every array = union(all) minus
        # intersect(all); element order is unspecified in CH too
        def array_symdiff(a: Args) -> str:
            union = a[0]
            inter = a[0]
            for nxt in a[1:]:
                union = f"array_union({union}, {nxt})"
                inter = f"array_intersect({inter}, {nxt})"
            return f"array_except({union}, {inter})"

        return array_symdiff
    if name == "arrayCompact":
        # drop CONSECUTIVE duplicates (null-safe compare)
        return lambda a: (
            f"aggregate({a[0]}, slice({a[0]}, 1, 0), (_acc, _x) -> "
            f"IF(size(_acc) > 0 AND element_at(_acc, -1) <=> _x, _acc, "
            f"concat(_acc, array(_x))))"
        )
    if name == "arrayShingles":
        # contiguous windows of length n; CH errors when n > size — here
        # the result is empty (the filterable shape), documented
        return lambda a: (
            f"CASE WHEN size({a[0]}) >= ({a[1]}) AND ({a[1]}) > 0 THEN "
            f"transform(sequence(1, size({a[0]}) - ({a[1]}) + 1), "
            f"_i -> slice({a[0]}, _i, {a[1]})) "
            f"ELSE slice(array({a[0]}), 1, 0) END"
        )
    if name in ("arrayFill", "arrayReverseFill"):
        # CH: scan and replace x[i] by x[i-1] where the predicate is
        # false (cascading); Reverse scans right-to-left = fill the
        # reversed array and reverse back
        rev = name == "arrayReverseFill"

        def array_fill(a: Args, _rev=rev) -> str:
            lam = _LAMBDA_RE.match(a[0])
            if not lam or len(a) != 2:
                raise UntranslatableFunctionError(
                    f"{name} expects (x -> cond, arr); multi-array "
                    "predicates: zip the arrays first"
                )
            var = _lambda_params(a[0])
            body = _lambda_body(a[0]).strip()
            cond = re.sub(rf"\b{re.escape(var)}\b", "_x", body)
            arr = f"reverse({a[1]})" if _rev else a[1]
            fill = (
                f"aggregate({arr}, slice({arr}, 1, 0), (_acc, _x) -> "
                f"IF(size(_acc) = 0 OR CAST(({cond}) AS BOOLEAN), "
                f"concat(_acc, array(_x)), "
                f"concat(_acc, array(element_at(_acc, -1)))))"
            )
            return f"reverse({fill})" if _rev else fill

        return array_fill
    if name == "arraySplit":
        # CH: cut arr1 into groups BEFORE every position (except the
        # first) where func(arr1[i], arr2[i], ...) is non-zero
        def array_split(a: Args) -> str:
            lam = _LAMBDA_RE.match(a[0])
            if not lam or len(a) < 2:
                raise UntranslatableFunctionError(
                    "arraySplit expects a lambda then 1+ parallel arrays"
                )
            params = [p.strip() for p in _lambda_params(a[0]).split(",")]
            arrays = a[1:]
            if len(params) != len(arrays):
                raise UntranslatableFunctionError(
                    f"arraySplit: lambda takes {len(params)} args but "
                    f"{len(arrays)} arrays were passed"
                )
            body = _lambda_body(a[0]).strip()
            for p, arr in zip(params, arrays):
                body = re.sub(
                    rf"\b{re.escape(p)}\b", f"element_at({arr}, _i)", body
                )
            d = arrays[0]
            empty_groups = f"slice(array({d}), 1, 0)"
            return (
                f"CASE WHEN size({d}) = 0 THEN {empty_groups} "
                f"WHEN size({d}) = 1 THEN array({d}) "
                f"ELSE aggregate(sequence(2, size({d})), "
                f"array(slice({d}, 1, 1)), (_acc, _i) -> "
                f"IF(CAST(({body}) AS BOOLEAN), "
                f"concat(_acc, array(array(element_at({d}, _i)))), "
                f"concat(slice(_acc, 1, size(_acc) - 1), "
                f"array(concat(element_at(_acc, -1), "
                f"array(element_at({d}, _i)))))))"
                f" END"
            )

        return array_split
    if name in ("arraySort", "arrayReverseSort"):
        # key-lambda forms: CH sorts by f(x); Spark's array_sort takes a
        # COMPARATOR — build one by applying the key to both sides
        desc = name == "arrayReverseSort"

        def array_sort_fmt(a: Args, _desc=desc) -> str:
            if len(a) == 1:
                return (
                    f"reverse(array_sort({a[0]}))" if _desc
                    else f"array_sort({a[0]})"
                )
            lam = re.match(r"(?s)^\s*([A-Za-z_]\w*)\s*->\s*(.+)$", a[0])
            if not lam or len(a) != 2:
                raise UntranslatableFunctionError(
                    f"{name} with a multi-array key lambda: sort by a "
                    "parallel array via arrays_zip + array_sort with a "
                    "comparator, or sort in the DataFrame API"
                )
            var, body = lam.group(1), lam.group(2).strip()
            fl = re.sub(rf"\b{re.escape(var)}\b", "_l", body)
            fr = re.sub(rf"\b{re.escape(var)}\b", "_r", body)
            lo, hi = ("1", "-1") if _desc else ("-1", "1")
            return (
                f"array_sort({a[1]}, (_l, _r) -> CASE "
                f"WHEN ({fl}) < ({fr}) THEN {lo} "
                f"WHEN ({fl}) > ({fr}) THEN {hi} ELSE 0 END)"
            )

        return array_sort_fmt
    if name == "hasAll":
        return lambda a: f"(size(array_except({a[1]}, {a[0]})) = 0)"
    if name == "hasSubstr":
        # contiguous-subsequence containment: some 1-based offset i has
        # slice(a, i, len(b)) == b; empty needle is contained (CH)
        def has_substr(a: Args) -> str:
            hay, nee = a[0], a[1]
            return (
                f"(size({nee}) = 0 OR (size({hay}) >= size({nee}) AND "
                f"exists(sequence(1, size({hay}) - size({nee}) + 1), "
                f"_i -> slice({hay}, _i, size({nee})) == {nee})))"
            )

        return has_substr
    if name == "arrayElementOrNull":
        # CH: out-of-bounds (incl. index 0) -> NULL; negative counts
        # from the end (try_element_at matches, except it rejects 0)
        return (
            lambda a: f"(CASE WHEN ({a[1]}) = 0 THEN NULL "
            f"ELSE try_element_at({a[0]}, {a[1]}) END)"
        )
    if name == "visibleWidth":
        return lambda a: f"char_length(cast({a[0]} AS STRING))"
    if name == "tupleNames":
        # field names of any struct expression, via JSON introspection
        # (works on columns — no textual type analysis needed)
        return lambda a: f"json_object_keys(to_json({a[0]}))"
    if name == "tupleToNameValuePairs":
        def t2nvp(a: Args) -> str:
            raise UntranslatableFunctionError(
                "tupleToNameValuePairs returns typed values CH-side; "
                "the JSON route renders them as strings — spell it "
                "explicitly if that is acceptable: "
                f"transform(map_entries(from_json(to_json({a[0]}), "
                "'map<string,string>')), e -> struct(e.key, e.value))"
            )

        return t2nvp
    if name == "toDecimalString":
        # fixed n-decimal rendering (no thousands separators)
        return (
            lambda a: f"cast(cast({a[0]} AS DECIMAL(38, {a[1]})) AS STRING)"
        )
    if name == "toBool":
        return lambda a: f"cast({a[0]} AS BOOLEAN)"
    if name == "defaultValueOfTypeName":
        def default_of(a: Args) -> str:
            t = a[0].strip()
            if not (t.startswith("'") and t.endswith("'")):
                raise UntranslatableFunctionError(
                    "defaultValueOfTypeName needs a literal type name"
                )
            from clickhouse_arrow_spark.dictionary import _type_default
            from clickhouse_arrow_spark.types import ch_type_to_spark

            spark_t, nullable = ch_type_to_spark(t[1:-1])
            if nullable:  # Nullable(T) defaults to NULL in CH
                return f"cast(NULL AS {spark_t.simpleString()})"
            return _type_default(spark_t.simpleString())

        return default_of
    if name == "indexHint":
        # CH: the argument drives INDEX granule selection only; the
        # result set is a superset and the hint itself evaluates to 1.
        # Spark owns pushdown — the faithful translation is TRUE (the
        # full superset), never the condition itself (which would
        # FILTER, a different result than CH's contract).
        return lambda a: "true"
    if name == "untuple":
        # expand a tuple/struct expression into separate columns:
        # inline() generates one row per array element with one column
        # per struct field — over a 1-element array it IS untuple
        return lambda a: f"inline(array({a[0]}))"
    if name == "pointInEllipses":
        # pointInEllipses(x, y, x0, y0, a0, b0[, x1, y1, a1, b1, ...]):
        # 1 if (x,y) falls inside ANY ellipse
        def pt_in_ellipses(a: Args) -> str:
            if len(a) < 6 or (len(a) - 2) % 4 != 0:
                raise UntranslatableFunctionError(
                    "pointInEllipses takes x, y plus one or more "
                    "(x0, y0, a, b) ellipse quadruples"
                )
            x, y = a[0], a[1]
            terms = []
            for i in range(2, len(a), 4):
                cx, cy, sa, sb = a[i], a[i + 1], a[i + 2], a[i + 3]
                terms.append(
                    f"(pow(({x}) - ({cx}), 2) / pow({sa}, 2) "
                    f"+ pow(({y}) - ({cy}), 2) / pow({sb}, 2) <= 1.0)"
                )
            return f"cast(({' OR '.join(terms)}) AS INT)"

        return pt_in_ellipses
    if name == "tupleElement":
        def tuple_element(a: Args) -> str:
            idx = a[1].strip()
            if idx.isdigit():  # positional (1-based) -> struct col{N}
                return f"{a[0]}.col{idx}"
            if idx.startswith("'") and idx.endswith("'"):
                return f"{a[0]}.{idx[1:-1]}"
            # wave 38: the dynamic form previously passed through
            # verbatim and leaked UNRESOLVED_ROUTINE
            raise UntranslatableFunctionError(
                "tupleElement: the index/name must be a literal — "
                "dynamic tuple access has no Spark struct analogue; "
                "branch with multiIf(n = 1, t.1, n = 2, t.2, ...)"
            )

        return tuple_element
    if name == "transform":
        def transform_fmt(a: Args) -> str:
            # CH's 4-arg transform(x, from_arr, to_arr, default) is a
            # value remap — distinct from Spark's lambda transform, which
            # is left untouched (detected by the `->` in arg 2)
            if len(a) == 4 and "->" not in a[1]:
                return (
                    f"coalesce(element_at(map_from_arrays({a[1]}, {a[2]}), "
                    f"{a[0]}), {a[3]})"
                )
            if len(a) == 3 and "->" not in a[1]:
                # 3-arg CH form: unmatched values keep x itself
                return (
                    f"coalesce(element_at(map_from_arrays({a[1]}, {a[2]}), "
                    f"{a[0]}), {a[0]})"
                )
            return f"transform({', '.join(a)})"

        return transform_fmt
    if name == "avgWeighted":
        # CH avgWeighted(x, w) = sum(x*w)/sum(w); CH returns nan when
        # sum(w) = 0. Spark 4 runs ANSI mode, where plain `/` raises
        # DIVIDE_BY_ZERO — try_divide yields NULL instead, the closest
        # non-raising analogue (callers needing CH's nan gate on sum(w)).
        return lambda a: f"try_divide(sum(({a[0]}) * ({a[1]})), sum({a[1]}))"
    if name == "countEqual":
        return lambda a: (
            f"CAST(size(filter({a[0]}, _e -> _e <=> {a[1]})) AS BIGINT)"
        )
    if name == "sumCount":
        return lambda a: (
            f"named_struct('sum', sum({a[0]}), 'count', count({a[0]}))"
        )
    if name == "simpleLinearRegression":
        # CH (x, y) -> (k, b); Spark regr_* take (y, x)
        return lambda a: (
            f"named_struct('k', regr_slope({a[1]}, {a[0]}), "
            f"'b', regr_intercept({a[1]}, {a[0]}))"
        )
    if name == "splitByNonAlpha":
        # substrings of consecutive alphanumeric characters
        return (
            lambda a: f"regexp_extract_all({a[0]}, '[A-Za-z0-9]+', 0)"
        )
    if name == "firstLine":
        return lambda a: f"regexp_extract({a[0]}, '^[^\\r\\n]*', 0)"
    if name == "ngrams":
        # character n-grams of a string (CH ngrams(s, n)); for token
        # shingles over arrays use arrayShingles
        def ngrams_fmt(a: Args) -> str:
            s, n = a[0], a[1]
            idx = _safe_seq1(f"char_length({s}) - ({n}) + 1")
            return f"transform({idx}, _i -> substring({s}, _i, {n}))"

        return ngrams_fmt
    if name == "extractKeyValuePairs":
        # CH arg order: (data[, kv_delimiter[, pair_delimiter]]);
        # whitespace around delimiters is trimmed like CH's parser
        def ekvp(a: Args) -> str:
            kv = a[1] if len(a) > 1 else "':'"
            pair = a[2] if len(a) > 2 else "','"
            cleaned = (
                f"regexp_replace({a[0]}, "
                f"concat('\\\\s*([', {kv}, {pair}, '])\\\\s*'), '$1')"
            )
            return f"str_to_map({cleaned}, {pair}, {kv})"

        return ekvp
    if name == "encodeXMLComponent":
        # & must encode FIRST or the later entities double-encode
        return lambda a: (
            f"replace(replace(replace(replace(replace({a[0]}, "
            f"'&', '&amp;'), '<', '&lt;'), '>', '&gt;'), "
            f"'\"', '&quot;'), '\\'', '&apos;')"
        )
    if name == "decodeXMLComponent":
        # the five predefined XML entities plus decimal/hex numeric
        # references for the ASCII range via char(); &amp; LAST so
        # '&amp;lt;' decodes to '&lt;' not '<' (CH order)
        def dxml(a: Args) -> str:
            s = a[0]
            num = (
                f"regexp_replace({s}, '&#(\\\\d+);', "
                f"'\\u0001$1\\u0001')"
            )
            # numeric entities are rare; handle via a join-free
            # transform: split on the sentinel and re-assemble
            body = (
                f"array_join(transform(split({num}, '\\u0001'), "
                f"_seg -> CASE WHEN _seg rlike '^[0-9]+$' "
                f"THEN char(cast(_seg AS INT)) ELSE _seg END), '')"
            )
            return (
                f"replace(replace(replace(replace(replace({body}, "
                f"'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), "
                f"'&apos;', '\\''), '&amp;', '&')"
            )

        return dxml
    if name == "decodeHTMLComponent":
        def dhtml(a: Args) -> str:
            raise UntranslatableFunctionError(
                "decodeHTMLComponent covers the full HTML5 entity set — "
                "use functions.ch_functions.html_unescape (Arrow-batched "
                "pandas UDF over the stdlib html module); "
                "decodeXMLComponent handles the five XML entities in SQL"
            )

        return dhtml
    if name in ("sqidEncode", "sqidDecode"):
        def sqid(a: Args, _n=name) -> str:
            raise UntranslatableFunctionError(
                f"{_n}: the sqids library is not in this environment — "
                "generateSnowflakeID / toString(generateUUIDv7()) give "
                "URL-safe unique ids; for reversible int packing use "
                "bin()/conv()"
            )

        return sqid
    if name == "countMatchesCaseInsensitive":
        return (
            lambda a: f"regexp_count({a[0]}, concat('(?i)', {a[1]}))"
        )
    if name == "splitByRegexp":
        # optional max_substrings: modern CH discards the remainder —
        # see _split_max_substrings for both modes
        return lambda a: (
            _split_max_substrings(a[1], a[0], a[2])
            if len(a) > 2 else f"split({a[1]}, {a[0]})"
        )
    if name == "tokens":
        # CH tokenizer: maximal runs of alphanumerics
        return lambda a: (
            f"filter(split({a[0]}, '[^a-zA-Z0-9]+'), _t -> _t != '')"
        )
    if name == "ngrams":
        def ngrams_fmt(a: Args) -> str:
            s, k = a[0], a[1]
            return (
                f"transform({_safe_seq1(f'char_length({s}) - ({k}) + 1')}, "
                f"_i -> substring({s}, _i, {k}))"
            )

        return ngrams_fmt
    if name == "toYYYYMMDDhhmmss":
        return lambda a: (
            f"CAST(date_format({a[0]}, 'yyyyMMddHHmmss') AS BIGINT)"
        )
    if name == "addQuarters":
        return lambda a: f"timestampadd(QUARTER, {a[1]}, {a[0]})"
    if name == "subtractQuarters":
        return lambda a: f"timestampadd(QUARTER, -({a[1]}), {a[0]})"
    if name in ("assumeNotNull", "toNullable", "toLowCardinality"):
        # nullability/encoding wrappers with no Spark runtime meaning —
        # the value passes through (assumeNotNull's null->default-value
        # coercion has no analogue; nulls stay null)
        return lambda a: f"({a[0]})"
    if name in ("MD5", "SHA1", "SHA224", "SHA256"):
        # CH returns the raw digest BYTES (FixedString); Spark's md5/
        # sha1/sha2 return lowercase hex — unhex restores value parity
        inner = {
            "MD5": "md5({0})",
            "SHA1": "sha1({0})",
            "SHA224": "sha2({0}, 224)",
            "SHA256": "sha2({0}, 256)",
        }[name]
        return lambda a: f"unhex({inner.format(a[0])})"
    if name in ("dateAdd", "dateSub"):
        # dateAdd(unit, n, d) / dateAdd(DAY, n, d) -> timestampadd; CH
        # accepts the unit quoted or bare
        def date_addsub(a: Args, _sub: bool = name == "dateSub") -> str:
            unit = a[0].strip().strip("'\"").upper()
            n = f"-({a[1]})" if _sub else a[1]
            return f"timestampadd({unit}, {n}, {a[2]})"

        return date_addsub
    if name in ("intDiv", "intDivOrZero"):
        # CH rounds the quotient DOWN (toward -inf: intDiv(-7, 2) =
        # -4); Spark's DIV truncates toward zero (-3) — they differ on
        # every negative inexact quotient. Floor division in pure
        # integer arithmetic (no double round-trip: exact past 2^53).
        def intdiv_fmt(a: Args, _oz=(name == "intDivOrZero")) -> str:
            A, B = f"({a[0]})", f"({a[1]})"
            q = (
                f"({A} DIV {B} - (CASE WHEN {A} % {B} != 0 "
                f"AND (({A} < 0) != ({B} < 0)) THEN 1 ELSE 0 END))"
            )
            if _oz:
                return f"(CASE WHEN {B} = 0 THEN 0 ELSE {q} END)"
            return q

        return intdiv_fmt
    if name == "moduloOrZero":
        return lambda a: (
            f"CASE WHEN ({a[1]}) = 0 THEN 0 ELSE ({a[0]}) % ({a[1]}) END"
        )
    if name in ("countSubstrings", "countSubstringsCaseInsensitive"):
        def count_subs(a: Args, _ci=(name.endswith("Insensitive"))) -> str:
            h = f"lower({a[0]})" if _ci else a[0]
            n = f"lower({a[1]})" if _ci else a[1]
            # empty needle -> 0 (CH), not an ANSI division error
            return (
                f"CAST(CASE WHEN length({n}) = 0 THEN 0 ELSE "
                f"(length({h}) - length(replace({h}, {n}, ''))) "
                f"DIV length({n}) END AS BIGINT)"
            )

        return count_subs
    if name == "multiSearchAllPositions":
        # per needle: first position, 0 when absent (locate's contract)
        return lambda a: f"transform({a[1]}, _n -> locate(_n, {a[0]}))"
    if name == "multiMatchAny":
        return lambda a: f"exists({a[1]}, _p -> ({a[0]}) RLIKE _p)"
    if name == "multiMatchAnyIndex":
        # first matching pattern's 1-based index, 0 when none match
        return lambda a: (
            f"coalesce(array_position(transform({a[1]}, "
            f"_p -> ({a[0]}) RLIKE _p), true), 0)"
        )
    if name == "multiMatchAllIndices":
        return lambda a: (
            f"filter(transform({_safe_seq1(f'size({a[1]})')}, "
            f"_i -> IF(({a[0]}) RLIKE element_at({a[1]}, _i), _i, 0)), "
            f"_x -> _x > 0)"
        )
    if name in ("hasToken", "hasTokenCaseInsensitive",
                "hasTokenOrNull", "hasTokenCaseInsensitiveOrNull"):
        def has_token(a: Args, _ci=("Insensitive" in name),
                      _or_null=name.endswith("OrNull")) -> str:
            h = f"lower({a[0]})" if _ci else a[0]
            t = f"lower({a[1]})" if _ci else a[1]
            base = f"exists(split({h}, '[^a-zA-Z0-9_]+'), _t -> _t = {t})"
            if _or_null:
                # an ill-formed needle (contains token separators)
                # raises in hasToken but returns NULL here
                return (f"(CASE WHEN ({a[1]}) RLIKE '[^a-zA-Z0-9_]' "
                        f"THEN NULL ELSE {base} END)")
            return base

        return has_token
    if name == "notILike":
        return lambda a: f"(NOT (({a[0]}) ILIKE {a[1]}))"
    if name == "alphaTokens":
        return lambda a: (
            f"filter(split({a[0]}, '[^a-zA-Z]+'), _t -> _t != '')"
        )
    if name == "splitByWhitespace":
        return lambda a: (
            f"filter(split({a[0]}, '\\\\s+'), _t -> _t != '')"
        )
    if name in ("hasSubsequence", "hasSubsequenceCaseInsensitive"):
        # greedy char-pointer fold: O(|haystack|) per row
        def has_subseq(a: Args, _ci=(name.endswith("Insensitive"))) -> str:
            h = f"lower({a[0]})" if _ci else a[0]
            n = f"lower({a[1]})" if _ci else a[1]
            return (
                f"(aggregate(split({h}, ''), 0, (_acc, _ch) -> "
                f"IF(_ch != '' AND _acc < length({n}) "
                f"AND _ch = substring({n}, _acc + 1, 1), "
                f"_acc + 1, _acc)) = length({n}))"
            )

        return has_subseq
    if name == "isFinite":
        return lambda a: (
            f"(NOT isnan({a[0]}) AND abs({a[0]}) != CAST('Infinity' AS DOUBLE))"
        )
    if name == "isInfinite":
        return lambda a: f"(abs({a[0]}) = CAST('Infinity' AS DOUBLE))"
    if name in (
        "JSONExtractFloat", "JSONExtractBool", "JSONExtractRaw", "JSONHas",
        "JSONExtractString", "JSONExtractInt", "JSONExtractUInt",
        "JSONExtractArrayRaw",
    ):
        cast_to = {
            "JSONExtractFloat": "DOUBLE",
            "JSONExtractBool": "BOOLEAN",
            "JSONExtractInt": "BIGINT",
            "JSONExtractUInt": "BIGINT",
        }.get(name)

        def json_variant(a: Args, _cast: str | None = cast_to,
                         _has: bool = name == "JSONHas",
                         _arr_raw: bool = name == "JSONExtractArrayRaw",
                         ) -> str:
            # CH varargs path (string keys, 1-based int indices)
            segs = []
            for p in a[1:]:
                p = p.strip()
                if p.startswith("'") and p.endswith("'"):
                    segs.append(f".{p[1:-1]}")
                elif p.isdigit():
                    segs.append(f"[{int(p) - 1}]")
                elif p.lstrip("-").isdigit():
                    raise UntranslatableFunctionError(
                        "negative (count-from-end) JSON indices have no "
                        "JSONPath form — compute the length with "
                        "JSONLength() and index positively"
                    )
                else:
                    segs = None
                    break
            if segs is not None:
                path = "'$" + "".join(segs) + "'"
            elif len(a) == 2:
                path = a[1].strip()  # dynamic single-arg path, as-is
            else:
                raise UntranslatableFunctionError(
                    "multi-segment JSON paths must be string/int "
                    "literals (a dynamic segment cannot be folded into "
                    "one JSONPath literal)"
                )
            got = f"get_json_object({a[0]}, {path})"
            if _has:
                return f"({got} IS NOT NULL)"
            if _cast:
                return f"CAST({got} AS {_cast})"
            if _arr_raw:
                # element-wise raw JSON of the array at the path; like
                # JSONExtractRaw, string elements come back unquoted
                # (the family-consistent approximation)
                return f"from_json({got}, 'array<string>')"
            return got

        return json_variant
    if name == "isValidJSON":
        return lambda a: f"(try_parse_json({a[0]}) IS NOT NULL)"
    if name in (
        "JSONLength", "JSONType", "JSONExtractKeys", "JSONExtract",
        "JSON_VALUE", "JSON_QUERY", "JSON_EXISTS", "toJSONString",
        "JSONArrayLength",
    ):
        def _json_path(parts: Args) -> str | None:
            # CH varargs path: string keys and 1-based integer indices
            # -> one JSONPath literal; non-literal parts defeat the build
            segs = []
            for p in parts:
                p = p.strip()
                if p.startswith("'") and p.endswith("'"):
                    segs.append(f".{p[1:-1]}")
                elif p.isdigit():
                    segs.append(f"[{int(p) - 1}]")
                elif p.lstrip("-").isdigit():
                    raise UntranslatableFunctionError(
                        "negative (count-from-end) JSON indices have no "
                        "JSONPath form — compute the length with "
                        "JSONLength() and index positively"
                    )
                else:
                    return None
            return "'$" + "".join(segs) + "'"

        def json_family(a: Args, _name=name) -> str:
            if _name == "toJSONString":
                return f"to_json({a[0]})"
            if _name == "JSONArrayLength":
                return f"json_array_length({a[0]})"
            if _name in ("JSON_VALUE", "JSON_QUERY"):
                return f"get_json_object({a[0]}, {a[1]})"
            if _name == "JSON_EXISTS":
                return f"(get_json_object({a[0]}, {a[1]}) IS NOT NULL)"
            # varargs-path forms
            typed = None
            parts = a[1:]
            if _name == "JSONExtract":
                t = a[-1].strip()
                if not (t.startswith("'") and t.endswith("'")):
                    raise UntranslatableFunctionError(
                        "JSONExtract: the target type must be a string "
                        "literal"
                    )
                from clickhouse_arrow_spark.types import (
                    ch_type_to_spark,
                    parse_ch_type,
                )

                dt, _null = ch_type_to_spark(parse_ch_type(t[1:-1]))
                typed = dt.simpleString()
                parts = a[1:-1]
            path = _json_path(parts) if parts else "'$'"
            if path is None:
                raise UntranslatableFunctionError(
                    f"{_name}: path arguments must be string/int literals"
                )
            doc = f"get_json_object({a[0]}, {path})" if parts else a[0]
            if _name == "JSONExtract":
                return f"TRY_CAST({doc} AS {typed})"
            if _name == "JSONExtractKeys":
                return f"json_object_keys({doc})"
            if _name == "JSONLength":
                # array -> element count; object -> key count
                return (
                    f"coalesce(json_array_length({doc}), "
                    f"size(json_object_keys({doc})))"
                )
            # JSONType: CH names over the raw text's top-level kind
            t = f"trim({doc})"
            return (
                "CASE "
                f"WHEN {doc} IS NULL THEN 'Null' "
                f"WHEN {t} = 'null' THEN 'Null' "
                f"WHEN {t} LIKE '\"%' THEN 'String' "
                f"WHEN {t} IN ('true', 'false') THEN 'Bool' "
                f"WHEN {t} LIKE '[%' THEN 'Array' "
                f"WHEN {t} LIKE '{{%' THEN 'Object' "
                f"WHEN {t} RLIKE '^-?[0-9]+$' THEN 'Int64' "
                "ELSE 'Double' END"
            )

        return json_family
    if name == "JSONExtractKeysAndValues":
        # (json[, path keys...], 'T') -> array of (key, value) structs
        # via a typed map parse; CH returns Array(Tuple(String, T))
        def jkv_fmt(a: Args) -> str:
            t = a[-1].strip()
            if not (t.startswith("'") and t.endswith("'")):
                raise UntranslatableFunctionError(
                    "JSONExtractKeysAndValues: the value type must be "
                    "a string literal"
                )
            from clickhouse_arrow_spark.types import (
                ch_type_to_spark,
                parse_ch_type,
            )

            dt, _null = ch_type_to_spark(parse_ch_type(t[1:-1]))
            doc = a[0]
            if len(a) > 2:
                segs = []
                for p in a[1:-1]:
                    p = p.strip()
                    if not (p.startswith("'") and p.endswith("'")):
                        raise UntranslatableFunctionError(
                            "JSONExtractKeysAndValues: path keys must "
                            "be string literals"
                        )
                    segs.append(f".{p[1:-1]}")
                doc = f"get_json_object({a[0]}, '$" + "".join(segs) + "')"
            return (
                f"map_entries(from_json({doc}, "
                f"'map<string,{dt.simpleString()}>'))"
            )

        return jkv_fmt
    if name == "JSONExtractKeysAndValuesRaw":
        return lambda a: (
            f"map_entries(from_json({a[0]}, 'map<string,string>'))"
        )
    if name == "retention":
        # CH retention(c1..cN) aggregate: array of 0/1 where r[0] =
        # "c1 held for some event" and r[i] = "c1 held AND c_i held"
        # (independent events, not the same row)
        def retention_fmt(a: Args) -> str:
            first = f"max(CASE WHEN {a[0]} THEN 1 ELSE 0 END)"
            parts = [first] + [
                f"least({first}, max(CASE WHEN {c} THEN 1 ELSE 0 END))"
                for c in a[1:]
            ]
            return f"array({', '.join(parts)})"

        return retention_fmt
    if name in ("mapAdd", "mapSubtract"):
        # CH merges maps summing/subtracting values per key; Spark:
        # zip by key over the union of keys (map_concat alone would
        # keep only one side's value on collision)
        sign = "+" if name == "mapAdd" else "-"

        def map_merge(a: Args, _s: str = sign) -> str:
            l, r = a[0], a[1]
            return (
                f"map_from_entries(transform(array_sort(array_union("
                f"map_keys({l}), map_keys({r}))), _mk -> struct(_mk, "
                f"coalesce(element_at({l}, _mk), 0) {_s} "
                f"coalesce(element_at({r}, _mk), 0))))"
            )

        return map_merge
    if name in ("arrayFirst", "arrayLast", "arrayFirstOrNull",
                "arrayLastOrNull"):
        # CH (lambda, arr) -> Spark filter(arr, lambda); try_element_at
        # yields NULL on no match (CH yields the type default — nulls
        # are the closer Spark-native semantics; the *OrNull spellings
        # are exactly this behavior)
        idx = "1" if name.startswith("arrayFirst") else "-1"
        return lambda a: f"try_element_at(filter({a[1]}, {a[0]}), {idx})"
    if name in ("tumble", "tumbleStart", "tumbleEnd"):
        # WINDOW VIEW tumbling helpers (CH time-window functions):
        # tumbleStart = toStartOfInterval; tumbleEnd = start + the
        # interval; tumble = the (start, end) tuple
        def tumble_fmt(a: Args, _n=name) -> str:
            base = _fmt("toStartOfInterval")(a)
            m2 = re.match(
                r"(?i)INTERVAL\s+(\d+)\s+(\w+?)s?\s*$", a[1].strip()
            )
            if not m2:
                raise UntranslatableFunctionError(
                    f"{_n}(time, INTERVAL n unit): the window size "
                    "must be an INTERVAL literal"
                )
            end = (
                f"({base} + INTERVAL {m2.group(1)} {m2.group(2)})"
            )
            if _n == "tumbleStart":
                return base
            if _n == "tumbleEnd":
                return end
            return f"struct({base}, {end})"

        return tumble_fmt
    if name in ("hop", "hopStart", "hopEnd"):
        # WINDOW VIEW hopping helpers: windows are [k*hop, k*hop+size);
        # hopStart(t) is the start of the EARLIEST window containing t
        # = toStartOfInterval(t, hop) - size + hop; hopEnd = + size.
        def hop_fmt(a: Args, _n=name) -> str:
            if len(a) != 3:
                raise UntranslatableFunctionError(
                    f"{_n}(time, INTERVAL hop, INTERVAL size)"
                )
            ms = []
            for arg in (a[1], a[2]):
                m2 = re.match(
                    r"(?i)INTERVAL\s+(\d+)\s+(\w+?)s?\s*$", arg.strip()
                )
                if not m2:
                    raise UntranslatableFunctionError(
                        f"{_n}: hop and window sizes must be INTERVAL "
                        "literals"
                    )
                ms.append(m2)
            hop_iv = f"INTERVAL {ms[0].group(1)} {ms[0].group(2)}"
            size_iv = f"INTERVAL {ms[1].group(1)} {ms[1].group(2)}"
            grid = _fmt("toStartOfInterval")([a[0], a[1]])
            start = f"({grid} - {size_iv} + {hop_iv})"
            end = f"({start} + {size_iv})"
            if _n == "hopStart":
                return start
            if _n == "hopEnd":
                return end
            return f"struct({start}, {end})"

        return hop_fmt
    if name == "rand64":
        # uniform 63-bit value (CH spans the full UInt64; random
        # values carry no cross-engine parity anyway)
        return lambda a: (
            "CAST(floor(rand() * 9.223372036854775e18) AS BIGINT)"
        )
    if name in ("shardNum", "shardCount"):
        # the one logical cluster (SHOW CLUSTERS): Spark owns physical
        # distribution below the SQL surface
        return lambda a: "1"
    if name in ("currentProfiles", "enabledProfiles",
                "defaultProfiles", "currentRoles", "enabledRoles",
                "defaultRoles"):
        # no ACL layer (GRANT/SHOW ROLES are documented no-ops/empties)
        return lambda a: "CAST(array() AS ARRAY<STRING>)"
    if name == "getOSKernelVersion":
        import platform

        return lambda a: (
            f"'{platform.system()} {platform.release()}'"
        )
    if name == "makeDateTime64":
        # (y, m, d, h, mi, s [, fraction [, precision]]): the fraction
        # scales by 10^-precision (default 3) into the seconds operand;
        # a 9th tz arg refuses (pass tz through toTimeZone instead)
        def make_dt64(a: Args) -> str:
            if len(a) < 6 or len(a) > 8:
                raise UntranslatableFunctionError(
                    "makeDateTime64(y, m, d, h, mi, s[, fraction"
                    "[, precision]]) — the timezone argument form is "
                    "toTimeZone(makeDateTime64(...), tz)"
                )
            sec = f"CAST({a[5]} AS DOUBLE)"
            if len(a) >= 7:
                prec = a[7] if len(a) == 8 else "3"
                sec = f"({sec} + ({a[6]}) / pow(10, {prec}))"
            head = ", ".join(a[:5])
            return f"make_timestamp({head}, {sec})"

        return make_dt64
    if name == "throwIf":
        # CH throwIf(cond[, msg]): raises at ROW time when cond is
        # truthy, else returns 0. Routed through a UDF — SQL
        # raise_error with foldable arguments is evaluated during
        # constant folding, which would throw at PLAN time even for
        # throwIf(0, ...) (the round-7 folding trap).
        def throw_if_fmt(a: Args) -> str:
            msg = a[1] if len(a) > 1 else "'value is non-zero'"
            # numeric OR boolean conditions both canonicalize through
            # a BOOLEAN cast (nonzero -> true); NULL counts as false
            cond = (
                f"coalesce(CAST(CAST(({a[0]}) AS BOOLEAN) AS INT), 0)"
            )
            return f"ch_throw_if({cond}, {msg})"

        return throw_if_fmt
    if name == "arrayWithConstant":
        return lambda a: f"array_repeat({a[1]}, CAST({a[0]} AS INT))"
    if name == "timeSlot":
        return lambda a: (
            f"timestamp_seconds((unix_timestamp({a[0]}) DIV 1800) * 1800)"
        )
    if name == "timeSlots":
        # array of slot starts covering [t, t + duration], slot width
        # `size` seconds (default 1800) — one sequence() of timestamps,
        # no explode needed
        def time_slots(a: Args) -> str:
            t, dur = a[0], a[1]
            sz = a[2] if len(a) > 2 else "1800"
            lo = f"timestamp_seconds((unix_timestamp({t}) DIV ({sz})) * ({sz}))"
            hi = (
                f"timestamp_seconds(((unix_timestamp({t}) + ({dur})) "
                f"DIV ({sz})) * ({sz}))"
            )
            return (
                f"sequence({lo}, {hi}, "
                f"make_dt_interval(0, 0, 0, CAST({sz} AS DOUBLE)))"
            )

        return time_slots
    if name in ("toIntervalDay", "toIntervalWeek", "toIntervalHour",
                "toIntervalMinute", "toIntervalSecond"):
        slot = {
            "toIntervalDay": "make_dt_interval({0})",
            "toIntervalWeek": "make_dt_interval(({0}) * 7)",
            "toIntervalHour": "make_dt_interval(0, {0})",
            "toIntervalMinute": "make_dt_interval(0, 0, {0})",
            "toIntervalSecond": "make_dt_interval(0, 0, 0, {0})",
        }[name]
        return lambda a: slot.format(a[0])
    if name in ("toIntervalMonth", "toIntervalYear", "toIntervalQuarter"):
        slot = {
            "toIntervalMonth": "make_ym_interval(0, {0})",
            "toIntervalQuarter": "make_ym_interval(0, ({0}) * 3)",
            "toIntervalYear": "make_ym_interval({0})",
        }[name]
        return lambda a: slot.format(a[0])
    if name == "stem":
        # stem('en', s): Porter 1980 from the published spec (the
        # English branch); other languages keep a guided refusal
        def stem_fmt(a: Args) -> str:
            lang = a[0].strip().strip("'").lower()
            if lang not in ("en", "english"):
                raise UntranslatableFunctionError(
                    f"stem({a[0]}, ...): only the English (Porter) "
                    "stemmer is implemented; other languages need a "
                    "snowball library upstream or a pandas UDF"
                )
            return f"ch_stem_en({a[1]})"

        return stem_fmt
    if name in ("base58Encode", "punycodeEncode", "lgamma", "tgamma"):
        # lazily session-registered Arrow-batched UDFs
        # (functions/ch_functions._py_udf_inventory)
        slot = {
            "base58Encode": "ch_base58_encode",
            "punycodeEncode": "ch_punycode_encode",
            "lgamma": "ch_lgamma",
            "tgamma": "ch_tgamma",
        }[name]
        return lambda a, s=slot: f"{s}({a[0]})"
    if name in ("base58Decode", "punycodeDecode", "idnaEncode",
                "idnaDecode"):
        # the strict CH forms THROW on invalid input — strictness lives
        # inside the UDF (SQL raise_error constant-folds for literal
        # messages and would fire at plan time)
        slot = {
            "base58Decode": "ch_base58_decode_strict",
            "punycodeDecode": "ch_punycode_decode_strict",
            "idnaEncode": "ch_idna_encode_strict",
            "idnaDecode": "ch_idna_decode_strict",
        }[name]
        return lambda a, s=slot: f"{s}({a[0]})"
    if name in ("tryBase58Decode", "tryPunycodeDecode", "tryIdnaEncode",
                "tryIdnaDecode"):
        slot = {
            "tryBase58Decode": "ch_base58_decode",
            "tryPunycodeDecode": "ch_punycode_decode",
            "tryIdnaEncode": "ch_idna_encode",
            "tryIdnaDecode": "ch_idna_decode",
        }[name]
        # CH try-forms return '' on failure
        return lambda a, s=slot: f"coalesce({s}({a[0]}), '')"
    if name in ("JSONMergePatch", "jsonMergePatch"):
        # RFC 7386 merge patch (lazily-registered pandas UDF); CH takes
        # N arguments and folds left
        def jmp_fmt(a: Args) -> str:
            if len(a) < 2:
                raise UntranslatableFunctionError(
                    "JSONMergePatch needs at least two JSON arguments"
                )
            out = a[0]
            for nxt in a[1:]:
                out = f"ch_json_merge_patch({out}, {nxt})"
            return out

        return jmp_fmt
    if name == "arrayLevenshteinDistance":
        return lambda a: f"ch_array_levenshtein({a[0]}, {a[1]})"
    if name == "seriesPeriodDetectFFT":
        return lambda a: (
            f"ch_series_period_fft(transform({a[0]}, "
            "x -> CAST(x AS DOUBLE)))"
        )
    if name == "seriesOutliersDetectTukey":
        # (series[, min_percentile, max_percentile, k]) — defaults
        # 25/75/1.5 like CH; scores via the lazily-registered UDF
        def tukey_fmt(a: Args) -> str:
            minp = a[1] if len(a) > 1 else "25.0"
            maxp = a[2] if len(a) > 2 else "75.0"
            k = a[3] if len(a) > 3 else "1.5"
            return (
                f"ch_series_tukey(transform({a[0]}, "
                f"x -> CAST(x AS DOUBLE)), CAST({minp} AS DOUBLE), "
                f"CAST({maxp} AS DOUBLE), CAST({k} AS DOUBLE))"
            )

        return tukey_fmt
    if name == "toMillisecond":
        return lambda a: f"CAST(date_format({a[0]}, 'SSS') AS INT)"
    if name == "dateTimeToSnowflakeID":
        # inverse of snowflakeIDToDateTime: ms-since-epoch << 22
        return lambda a: (
            f"shiftleft(unix_millis(CAST({a[0]} AS TIMESTAMP)) - "
            f"({a[1] if len(a) > 1 else 0}), 22)"
        )
    if name == "UTCTimestamp":
        # sessions here run UTC (session.get_spark pins it); CH's
        # UTCTimestamp is now() rendered in UTC
        return lambda a: "current_timestamp()"
    if name == "getSubcolumn":
        def subcol_fmt(a: Args) -> str:
            sub = a[1].strip().strip("'\"")
            if sub == "keys":
                return f"map_keys({a[0]})"
            if sub == "values":
                return f"map_values({a[0]})"
            if sub == "size0":
                return f"size({a[0]})"
            if sub == "null":
                return f"CAST(isnull({a[0]}) AS TINYINT)"
            return f"({a[0]}).`{sub}`"

        return subcol_fmt
    if name == "proportionsZTest":
        # scalar two-proportion z-test: z/p/CI in one named struct.
        # The confidence level must be a literal — its normal quantile
        # is computed AT TRANSLATE TIME (statistics.NormalDist, exact),
        # the only non-arithmetic piece; p-value uses the same A&S
        # polynomial as the stats operators so oracles can reproduce it
        def pzt_fmt(a: Args) -> str:
            if len(a) != 6:
                raise UntranslatableFunctionError(
                    "proportionsZTest(successes_x, successes_y, "
                    "trials_x, trials_y, conf_level, usevar)"
                )
            from statistics import NormalDist

            from clickhouse_arrow_spark.operators.stats import (
                norm_sf_sql,
            )

            try:
                conf = float(a[4])
            except ValueError:
                raise UntranslatableFunctionError(
                    "proportionsZTest: the confidence level must be a "
                    "numeric literal (its normal quantile is computed "
                    "at translate time)"
                )
            usevar = a[5].strip().strip("'\"").lower()
            if usevar not in ("pooled", "unpooled"):
                raise UntranslatableFunctionError(
                    "proportionsZTest: usevar is 'pooled' or 'unpooled'"
                )
            zq = repr(NormalDist().inv_cdf((1.0 + conf) / 2.0))
            sx, sy, nx, ny = a[0], a[1], a[2], a[3]
            px = f"(CAST({sx} AS DOUBLE) / ({nx}))"
            py = f"(CAST({sy} AS DOUBLE) / ({ny}))"
            diff = f"({px} - {py})"
            se_un = (
                f"sqrt({px} * (1.0 - {px}) / ({nx}) + "
                f"{py} * (1.0 - {py}) / ({ny}))"
            )
            if usevar == "pooled":
                pp = (
                    f"(CAST(({sx}) + ({sy}) AS DOUBLE) / "
                    f"(({nx}) + ({ny})))"
                )
                se_z = (
                    f"sqrt({pp} * (1.0 - {pp}) * "
                    f"(1.0 / ({nx}) + 1.0 / ({ny})))"
                )
            else:
                se_z = se_un
            z = f"({diff} / {se_z})"
            p = f"(2.0 * {norm_sf_sql(f'abs({z})')})"
            return (
                f"named_struct('z_statistic', {z}, 'p_value', {p}, "
                f"'confidence_interval_low', {diff} - {zq} * {se_un}, "
                f"'confidence_interval_high', {diff} + {zq} * {se_un})"
            )

        return pzt_fmt
    if name in ("normalizeUTF8NFC", "normalizeUTF8NFD",
                "normalizeUTF8NFKC", "normalizeUTF8NFKD"):
        # Arrow-batched unicodedata UDFs the client registers lazily
        # (functions/ch_functions.unicode_normalize; no JVM ICU
        # normalizer is exposed to Spark SQL)
        form = name[len("normalizeUTF8"):].lower()
        return lambda a, f=form: f"ch_normalize_{f}({a[0]})"
    if name == "arrayStringConcat":
        # CH defaults the separator to '' when omitted
        return lambda a: (
            f"array_join({a[0]}, {a[1] if len(a) > 1 else chr(39) * 2})"
        )
    if name == "parseDateTimeBestEffort":
        # best-effort chain (CH parser-ast subset): ISO forms via the
        # native cast, then the common human formats CH accepts, then
        # 9-10 digit strings as unix seconds; unparseable input raises
        # (CH throws too) via raise_error
        return lambda a: (
            f"coalesce({_best_effort_ts(a[0])}, "
            f"CAST(raise_error(concat('parseDateTimeBestEffort: cannot "
            f"parse ', {a[0]})) AS TIMESTAMP))"
        )
    if name in ("plus", "minus", "multiply", "negate", "max2", "min2"):
        # CH exposes its operators as named functions too
        slot = {
            "plus": "(({0}) + ({1}))",
            "minus": "(({0}) - ({1}))",
            "multiply": "(({0}) * ({1}))",
            "negate": "(-({0}))",
            "max2": "greatest({0}, {1})",
            "min2": "least({0}, {1})",
        }[name]
        return lambda a: slot.format(*a)
    if name == "toTypeName":
        # report the CH spelling of the resolved Spark type (the
        # original CH type is unrecoverable after the bridge widens —
        # e.g. UInt8 arrives as SMALLINT and reports Int16; documented
        # approximation). Atomics via an exact CASE; container strings
        # (array<...>, map<...>, struct<...>, decimal(p,s)) rewrite
        # token-wise into the CH spellings (Array(...), Map(...),
        # Tuple(a T, ...), Decimal(p, s)) — longest-token-first so
        # 'bigint'/'tinyint' never collide with 'int' (r9, wave-34).
        def to_type_name(a: Args) -> str:
            t = f"typeof({a[0]})"
            pairs = [
                ("tinyint", "Int8"), ("smallint", "Int16"),
                ("int", "Int32"), ("bigint", "Int64"),
                ("float", "Float32"), ("double", "Float64"),
                ("string", "String"), ("date", "Date"),
                ("timestamp_ntz", "DateTime"),
                ("timestamp", "DateTime"), ("boolean", "Bool"),
                ("binary", "String"),
            ]
            whens = "".join(
                f" WHEN '{s}' THEN '{c}'" for s, c in pairs
            )
            chain = t
            # container openers first (exact multi-char prefixes —
            # no field-name collision possible)
            for old, new in [
                ("array<", "Array("), ("map<", "Map("),
                ("struct<", "Tuple("),
            ]:
                chain = f"replace({chain}, '{old}', '{new}')"
            # type tokens anchored at WORD BOUNDARIES (ADVICE r9 #3:
            # the blind replace chain corrupted struct field names
            # merely containing a token — struct<mint:int> became
            # 'Tuple(mInt32 Int32)' — and 'interval day to second'
            # became 'Int32erval...'). \b keeps 'mint'/'interval'
            # intact; a field named EXACTLY a type token still
            # rewrites (documented residual — CH never sees Spark
            # field names anyway).
            for old, new in [
                ("timestamp_ntz", "DateTime"),
                ("timestamp", "DateTime"),
                ("tinyint", "Int8"), ("smallint", "Int16"),
                ("bigint", "Int64"), ("int", "Int32"),
                ("float", "Float32"), ("double", "Float64"),
                ("string", "String"), ("boolean", "Bool"),
                ("binary", "String"), ("date", "Date"),
                ("decimal", "Decimal"),
            ]:
                chain = (
                    f"regexp_replace({chain}, "
                    f"'\\\\b{old}\\\\b', '{new}')"
                )
            for old, new in [
                (">", ")"), (":", " "),
                (",", ", "),  # CH spells a space after commas
            ]:
                chain = f"replace({chain}, '{old}', '{new}')"
            return f"(CASE {t}{whens} ELSE {chain} END)"

        return to_type_name
    if name in ("any", "anyLast"):
        # CH any()/anyLast() return the first/last NON-NULL value;
        # Spark's bare any_value keeps NULLs (wave-32 probe:
        # any over [NULL, 7] returned NULL instead of 7)
        fn2 = "any_value" if name == "any" else "last"
        return lambda a, _f=fn2: f"{_f}({a[0]}, true)"
    if name == "if":
        # CH if() takes a UInt8 condition — any non-zero numeric is
        # true. CAST AS BOOLEAN reproduces the truthiness (non-zero ->
        # true, NULL -> else branch) and is a no-op on boolean input.
        def if_fmt(a: Args) -> str:
            if len(a) != 3:
                return f"if({', '.join(a)})"
            return (f"IF(CAST(({a[0]}) AS BOOLEAN), {a[1]}, {a[2]})")

        return if_fmt
    if name == "corr":
        # CH corr on zero-variance input returns NaN; Spark's ANSI
        # corr raises DIVIDE_BY_ZERO. Expression-level Pearson with the
        # zero branch explicit (Catalyst dedups the shared moments).
        def corr_fmt(a: Args) -> str:
            if len(a) != 2:
                return f"corr({', '.join(a)})"
            x, y = a
            den = f"(stddev_pop({x}) * stddev_pop({y}))"
            return (
                f"(CASE WHEN {den} = 0 THEN CAST('NaN' AS DOUBLE) "
                f"ELSE covar_pop({x}, {y}) / {den} END)"
            )

        return corr_fmt
    if name == "hex":
        # CH emits WHOLE BYTES: hex(1) = '01', hex(256) = '0100' —
        # Spark's hex trims to significant digits. An even-length pad
        # is identity for string/binary input (always whole bytes) and
        # restores the CH byte grouping for integers (wave-31 probe).
        return lambda a: (
            f"lpad(hex({a[0]}), CAST(ceil(length(hex({a[0]})) / 2) * 2 "
            f"AS INT), '0')"
        )
    if name == "round":
        # CH round() uses BANKER'S rounding (half-to-even) for floats —
        # round(2.5) = 2 — and CH numeric literals are Float64, so the
        # faithful mapping is Spark's bround. (Decimal-typed COLUMNS
        # round half-away-from-zero in CH — documented divergence in
        # docs/PARITY.md; roundBankers stays bround either way.)
        return lambda a: f"bround({', '.join(a)})"
    if name in ("greatest", "least"):
        # CH returns NULL when ANY argument is NULL; Spark skips NULLs.
        # Only the multi-arg form needs the guard.
        def gl_fmt(a: Args, _n: str = name) -> str:
            if len(a) < 2:
                return f"{_n}({', '.join(a)})"
            null_any = " OR ".join(f"(({x}) IS NULL)" for x in a)
            return (f"(CASE WHEN {null_any} THEN NULL "
                    f"ELSE {_n}({', '.join(a)}) END)")

        return gl_fmt
    if name in ("left", "leftUTF8", "right", "rightUTF8"):
        # CH negative length drops |n| characters from the OTHER end:
        # left('hello', -2) = 'hel', right('hello', -2) = 'llo'.
        # Spark's left/right return '' for negative n.
        def left_right(a: Args, _n: str = name) -> str:
            if len(a) != 2:
                return f"{_n}({', '.join(a)})"
            s, n = a[0], a[1]
            base = "left" if _n.startswith("left") else "right"
            if base == "left":
                neg = f"substr({s}, 1, greatest(length({s}) + ({n}), 0))"
            else:
                neg = f"substr({s}, (-({n})) + 1)"
            return (f"(CASE WHEN ({n}) < 0 THEN {neg} "
                    f"ELSE {base}({s}, {n}) END)")

        return left_right
    if name in ("bitShiftLeft", "bitShiftRight"):
        # CH discards bits shifted past the width (shift >= 64 -> 0,
        # negative shift -> 0); Spark's shiftleft/shiftright mask the
        # shift amount mod 64 (shiftleft(1, 64) = 1) — wave-30 probe
        fn = "shiftleft" if name == "bitShiftLeft" else "shiftright"
        return lambda a, _fn=fn: (
            f"IF(({a[1]}) < 0 OR ({a[1]}) >= 64, 0, "
            f"{_fn}(CAST({a[0]} AS BIGINT), CAST({a[1]} AS INT)))"
        )
    if name == "divide":
        # CH divide() ALWAYS returns Float64, with x/0 = ±Inf and
        # 0/0 = NaN; Spark's ANSI division errors on a zero divisor for
        # EVERY numeric type, so the zero branch is reproduced
        # explicitly. (The bare `/` operator keeps Spark's loud ANSI
        # error — documented divergence in docs/MIGRATION.md.)
        return lambda a: (
            f"IF(CAST({a[1]} AS DOUBLE) = 0.0, "
            f"IF(CAST({a[0]} AS DOUBLE) = 0.0, CAST('NaN' AS DOUBLE), "
            f"sign({a[0]}) * CAST('Infinity' AS DOUBLE)), "
            f"CAST({a[0]} AS DOUBLE) / ({a[1]}))"
        )
    if name in ("gcd", "lcm"):
        # Euclid as a bounded fold — the worst case for 64-bit inputs is
        # consecutive Fibonacci numbers (F92/F91), ~91 division steps, so
        # 96 covers any 64-bit pair; pure JVM, no UDF. lcm = |a*b| / gcd
        # with zero guard.
        def gcd_expr(x: str, y: str) -> str:
            return (
                f"aggregate(sequence(1, 96), "
                f"named_struct('x', abs(CAST({x} AS BIGINT)), "
                f"'y', abs(CAST({y} AS BIGINT))), "
                f"(acc, _i) -> IF(acc.y = 0, acc, "
                f"named_struct('x', acc.y, 'y', acc.x % acc.y))).x"
            )

        if name == "gcd":
            return lambda a: gcd_expr(a[0], a[1])
        return lambda a: (
            f"IF(({a[0]}) = 0 OR ({a[1]}) = 0, 0, "
            f"abs(CAST({a[0]} AS BIGINT) * CAST({a[1]} AS BIGINT)) "
            f"DIV {gcd_expr(a[0], a[1])})"
        )
    if name == "roundDown":
        # round down to an element of the boundary array; below the
        # lowest bound -> the lowest bound (CH semantics)
        return lambda a: (
            f"coalesce(array_max(filter({a[1]}, _b -> _b <= ({a[0]}))), "
            f"array_min({a[1]}))"
        )
    if name == "arrayEnumerateUniq":
        # occurrence index (1-based) of each element among its equals
        return lambda a: (
            f"transform({a[0]}, (_x, _i) -> "
            f"size(filter(slice({a[0]}, 1, _i + 1), _y -> _y = _x)))"
        )
    if name in ("randUniform", "randNormal", "randBernoulli",
                "randExponential"):
        slot = {
            "randUniform": "(({0}) + rand() * (({1}) - ({0})))",
            "randNormal": "(({0}) + randn() * ({1}))",
            "randBernoulli": "CAST(rand() < ({0}) AS TINYINT)",
            "randExponential": "(-ln(1.0 - rand()) / ({0}))",
        }[name]
        return lambda a: slot.format(*a)
    if name == "isIPv4String":
        return lambda a: (
            f"({a[0]} RLIKE "
            "'^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\\\.)"
            "{{3}}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$')"
            .replace("{{3}}", "{3}")
        )
    if name == "isIPv6String":
        # full/compressed hex-group forms (::-abbreviated included)
        return lambda a: (
            f"({a[0]} RLIKE '^([0-9A-Fa-f]{{1,4}}:){{7}}[0-9A-Fa-f]{{1,4}}$' "
            f"OR ({a[0]} RLIKE '^([0-9A-Fa-f]{{0,4}}:){{2,7}}(:|[0-9A-Fa-f]"
            f"{{1,4}})$' AND {a[0]} LIKE '%::%'))"
        )
    if name == "replaceRegexpOne":
        # first match only: splice around regexp_instr/extract — Spark's
        # regexp_replace replaces every occurrence
        def rro(a: Args) -> str:
            s, p, r = a[0], a[1], a[2]
            if "\\" in r:
                raise UntranslatableFunctionError(
                    "replaceRegexpOne with backreferences in the "
                    "replacement: use regexp_replace (all occurrences) "
                    "or a pandas UDF"
                )
            pos = f"regexp_instr({s}, {p})"
            hit = f"regexp_extract({s}, {p}, 0)"
            return (
                f"CASE WHEN {pos} = 0 THEN {s} ELSE "
                f"concat(substring({s}, 1, {pos} - 1), {r}, "
                f"substring({s}, {pos} + length({hit}))) END"
            )

        return rro
    if name == "extractAll":
        # CH: all matches (whole match when the pattern has no group,
        # group 1 when it has one). Spark's regexp_extract_all needs a
        # group index — wrap literal group-less patterns in a group.
        def ext_all(a: Args) -> str:
            p = a[1].strip()
            if p.startswith("'") and p.endswith("'") and "(" not in p:
                return f"regexp_extract_all({a[0]}, '({p[1:-1]})', 1)"
            return f"regexp_extract_all({a[0]}, {a[1]}, 1)"

        return ext_all
    if name in ("extractGroups", "extractAllGroups",
                "extractAllGroupsHorizontal", "extractAllGroupsVertical"):
        # the group COUNT must be known at translate time, so only
        # literal patterns translate (counted on the raw literal:
        # unescaped '(' not starting a (?: non-capture)
        def ext_groups(a: Args, _name: str = name) -> str:
            p = a[1].strip()
            if not (p.startswith("'") and p.endswith("'")):
                raise UntranslatableFunctionError(
                    f"{_name}: the capture-group count comes from the "
                    "pattern, so only a literal pattern translates"
                )
            body = p[1:-1]
            # unescape the SQL-LITERAL level first ('' -> ', and \x ->
            # the char x, with \\ -> one backslash) so the count runs on
            # the REGEX-level pattern: '\\(' is an escaped literal paren
            # (no group), while a raw '\(' collapses to '(' — a group,
            # exactly what Spark's literal parser hands the regex engine
            rx, i = [], 0
            sql_body = body.replace("''", "'")
            while i < len(sql_body):
                if sql_body[i] == "\\" and i + 1 < len(sql_body):
                    # '\\' -> one regex backslash; '\x' -> the char x
                    rx.append(sql_body[i + 1])
                    i += 2
                else:
                    rx.append(sql_body[i])
                    i += 1
            regex = "".join(rx)
            ng, i = 0, 0
            while i < len(regex):
                if regex[i] == "\\":
                    i += 2
                    continue
                if regex[i] == "(" and regex[i : i + 2] != "(?":
                    ng += 1
                i += 1
            if ng == 0:
                raise UntranslatableFunctionError(
                    f"{_name}: pattern has no capture groups"
                )
            s = a[0]
            if _name == "extractGroups":
                # first match's groups; [] when nothing matches (CH)
                groups = ", ".join(
                    f"regexp_extract({s}, {p}, {g})" for g in range(1, ng + 1)
                )
                return (
                    f"IF({s} RLIKE {p}, array({groups}), "
                    f"CAST(array() AS ARRAY<STRING>))"
                )
            per_group = [
                f"regexp_extract_all({s}, {p}, {g})" for g in range(1, ng + 1)
            ]
            if _name == "extractAllGroupsHorizontal":
                return f"array({', '.join(per_group)})"
            # Vertical (the bare extractAllGroups alias): one row of
            # groups per match
            elems = ", ".join(
                f"element_at({pg}, _gi)" for pg in per_group
            )
            return (
                f"transform({_safe_seq1(f'size({per_group[0]})')}, "
                f"_gi -> array({elems}))"
            )

        return ext_groups
    if name == "regexpQuoteMeta":
        # escape the RE2/Java metacharacters CH escapes: backslash, then
        # | ( ) ^ $ . [ ] ? * + { : -
        return lambda a: (
            f"regexp_replace({a[0]}, "
            "'([\\\\\\\\|()^$.\\\\[\\\\]?*+{:-])', '\\\\\\\\$1')"
        )
    if name in ("formatDateTimeInJodaSyntax", "parseDateTimeInJodaSyntax"):
        # Joda patterns ARE Spark's native Java datetime patterns
        if name.startswith("format"):
            return lambda a: f"date_format({a[0]}, {a[1]})"
        return lambda a: f"to_timestamp({a[0]}, {a[1]})"
    if name in ("parseDateTimeInJodaSyntaxOrNull",):
        return lambda a: f"try_to_timestamp({a[0]}, {a[1]})"
    if name == "parseDateTimeInJodaSyntaxOrZero":
        # CH OrZero: unparseable input -> the epoch zero timestamp
        return lambda a: (
            f"coalesce(try_to_timestamp({a[0]}, {a[1]}), "
            f"TIMESTAMP '1970-01-01 00:00:00')"
        )
    if name == "fromUnixTimestampInJodaSyntax":
        return lambda a: f"date_format(timestamp_seconds({a[0]}), {a[1]})"
    if name == "toUTCTimestamp":
        return lambda a: f"to_utc_timestamp({a[0]}, {a[1]})"
    if name == "fromUTCTimestamp":
        return lambda a: f"from_utc_timestamp({a[0]}, {a[1]})"
    if name == "timeDiff":
        # seconds from a to b (dateDiff('second', a, b))
        return (
            lambda a: f"(unix_timestamp({a[1]}) - unix_timestamp({a[0]}))"
        )
    if name == "addInterval":
        return lambda a: f"({a[0]} + {a[1]})"
    if name == "toLastDayOfWeek":
        # CH mode 0: week runs Sunday..Saturday; next_day is strictly
        # after, so Saturday itself maps to itself
        return lambda a: f"date_sub(next_day({a[0]}, 'SU'), 1)"
    if name == "nowInBlock":
        # Spark's current_timestamp is query-constant; CH's nowInBlock
        # advances per block — observable only in very long scans
        return lambda a: "current_timestamp()"
    if name == "mapReverseSort":
        return lambda a: (
            f"map_from_entries(array_sort(map_entries({a[0]}), "
            f"(_l, _r) -> CASE WHEN _l.key > _r.key THEN -1 "
            f"WHEN _l.key < _r.key THEN 1 ELSE 0 END))"
        )
    if name in ("mapPartialSort", "mapPartialReverseSort"):
        # CH mapPartialSort([func,] limit, map): first `limit` entries
        # key-sorted, remainder UNSPECIFIED — a full key sort satisfies
        # the contract and is the only deterministic instance
        # (arrayPartialSort precedent, wave 37)
        def map_partial_sort(a: Args, _desc=name == "mapPartialReverseSort") -> str:
            if len(a) != 2:
                raise UntranslatableFunctionError(
                    f"{name} with a key lambda: sort the entries "
                    "explicitly — map_from_entries(array_sort("
                    "map_entries(m), <comparator over _l/_r>))"
                )
            lt, gt = ("-1", "1") if not _desc else ("1", "-1")
            return (
                f"map_from_entries(array_sort(map_entries({a[1]}), "
                f"(_l, _r) -> CASE WHEN _l.key < _r.key THEN {lt} "
                f"WHEN _l.key > _r.key THEN {gt} ELSE 0 END))"
            )

        return map_partial_sort
    if name == "connectionId":
        # single-session engine: one logical connection
        return lambda a: "CAST(0 AS BIGINT)"
    if name == "displayName":
        return lambda a: (
            "substring_index(java_method('java.net.InetAddress', "
            "'getLocalHost'), '/', 1)"
        )
    if name == "revision":
        # CH wire-protocol revision constant; no analogue — a stable
        # literal keeps monitoring SELECTs running
        return lambda a: "CAST(54500 AS INT)"
    if name == "generateULID":
        # 26-char Crockford base32: 10 chars of unix-ms + 16 random
        # chars (two 40-bit draws); conv() emits base32hex digits,
        # translate() maps them onto the Crockford alphabet
        def ulid_fmt(a: Args) -> str:
            def crock(expr: str, width: int) -> str:
                return (
                    f"translate(lpad(upper(conv({expr}, 10, 32)), "
                    f"{width}, '0'), "
                    f"'0123456789ABCDEFGHIJKLMNOPQRSTUV', "
                    f"'0123456789ABCDEFGHJKMNPQRSTVWXYZ')"
                )

            ms = crock("unix_millis(current_timestamp())", 10)
            r1 = crock("CAST(rand() * 1099511627776 AS BIGINT)", 8)
            r2 = crock("CAST(rand() * 1099511627776 AS BIGINT)", 8)
            return f"concat({ms}, {r1}, {r2})"

        return ulid_fmt
    if name == "toUUID":
        return lambda a: f"lower({a[0]})"
    if name in ("toInt128", "toInt256", "toUInt128", "toUInt256"):
        return _fmt_cast("DECIMAL(38, 0)")
    if name == "encodeURLComponent":
        # CH renders space as %20 (url_encode gives form-style '+')
        return lambda a: f"replace(url_encode({a[0]}), '+', '%20')"
    if name == "decodeURLComponent":
        # CH decodes %XX only; a literal '+' stays '+' (url_decode
        # would turn it into a space) — shield it first
        return lambda a: f"url_decode(replace({a[0]}, '+', '%2B'))"
    if name == "extractURLParameters":
        return lambda a: (
            f"filter(split(coalesce(parse_url({a[0]}, 'QUERY'), ''), '&'), "
            f"_p -> _p != '')"
        )
    if name == "extractURLParameterNames":
        return lambda a: (
            f"transform(filter(split(coalesce(parse_url({a[0]}, 'QUERY'), "
            f"''), '&'), _p -> _p != ''), _p -> split_part(_p, '=', 1))"
        )
    if name == "pathFull":
        return lambda a: (
            f"concat(coalesce(parse_url({a[0]}, 'PATH'), ''), "
            f"IF(parse_url({a[0]}, 'QUERY') IS NULL, '', "
            f"concat('?', parse_url({a[0]}, 'QUERY'))))"
        )
    if name == "cutWWW":
        return lambda a: (
            f"regexp_replace({a[0]}, '^([a-zA-Z]+://)?www\\\\.', '$1')"
        )
    if name == "untuple":
        # CH expands the tuple into its fields; Spark can't star-expand
        # an arbitrary struct EXPRESSION, but the inline() generator can
        return lambda a: f"inline(array({a[0]}))"
    if name in ("tuplePlus", "tupleMinus", "tupleMultiply", "tupleDivide",
                "tupleNegate", "tupleMultiplyByNumber",
                "tupleDivideByNumber", "tupleHammingDistance",
                "tupleIntDiv", "tupleIntDivOrZero", "tupleModulo",
                "tupleModuloByNumber", "tupleIntDivByNumber",
                "dotProduct"):
        def tuple_math(a: Args, _name=name) -> str:
            e1 = _tuple_literal_elems(a[0])
            if _name == "dotProduct" and e1 is None:
                # array form: the vector-wave zip_with fold
                return (
                    f"aggregate(zip_with({a[0]}, {a[1]}, "
                    f"(_l, _r) -> CAST(_l AS DOUBLE) * _r), "
                    f"CAST(0 AS DOUBLE), (_acc, _v) -> _acc + _v)"
                )
            if e1 is None:
                raise UntranslatableFunctionError(
                    f"{_name} on a non-literal tuple: struct field names "
                    "are not knowable textually — use the DataFrame API "
                    "over the struct's fields"
                )
            if _name in ("tupleNegate",):
                items = ", ".join(f"(-({x})) AS col{i + 1}"
                                  for i, x in enumerate(e1))
                return f"struct({items})"
            if _name in ("tupleMultiplyByNumber", "tupleDivideByNumber"):
                op = "*" if "Multiply" in _name else "/"
                items = ", ".join(
                    f"(({x}) {op} ({a[1]})) AS col{i + 1}"
                    for i, x in enumerate(e1)
                )
                return f"struct({items})"
            if _name in ("tupleIntDivByNumber", "tupleModuloByNumber"):
                tmpl = (
                    "(({x}) DIV ({n}))" if "IntDiv" in _name
                    else "(({x}) % ({n}))"
                )
                items = ", ".join(
                    tmpl.format(x=x, n=a[1]) + f" AS col{i + 1}"
                    for i, x in enumerate(e1)
                )
                return f"struct({items})"
            e2 = _tuple_literal_elems(a[1])
            if e2 is None or len(e1) != len(e2):
                raise UntranslatableFunctionError(
                    f"{_name}: both arguments must be tuple literals of "
                    "equal size"
                )
            if _name == "tupleHammingDistance":
                return "(" + " + ".join(
                    f"CAST(({x}) != ({y}) AS INT)" for x, y in zip(e1, e2)
                ) + ")"
            if _name == "dotProduct":
                return "(" + " + ".join(
                    f"(({x}) * ({y}))" for x, y in zip(e1, e2)
                ) + ")"
            if _name in ("tupleIntDiv", "tupleIntDivOrZero",
                         "tupleModulo"):
                if _name == "tupleIntDiv":
                    tmpl = "(({x}) DIV ({y}))"
                elif _name == "tupleIntDivOrZero":
                    tmpl = "coalesce((({x}) DIV nullif(({y}), 0)), 0)"
                else:
                    tmpl = "(({x}) % ({y}))"
                items = ", ".join(
                    tmpl.format(x=x, y=y) + f" AS col{i + 1}"
                    for i, (x, y) in enumerate(zip(e1, e2))
                )
                return f"struct({items})"
            op = {"tuplePlus": "+", "tupleMinus": "-",
                  "tupleMultiply": "*", "tupleDivide": "/"}[_name]
            items = ", ".join(
                f"(({x}) {op} ({y})) AS col{i + 1}"
                for i, (x, y) in enumerate(zip(e1, e2))
            )
            return f"struct({items})"

        return tuple_math
    if name == "pointInPolygon":
        # even-odd ray casting as one aggregate() fold (the SQL twin of
        # functions/ch_functions.point_in_polygon); both args must be
        # literals in the SQL form — columns go through the Python API
        def pip_fmt(a: Args) -> str:
            pt = _tuple_literal_elems(a[0])
            if pt is None or len(pt) != 2:
                raise UntranslatableFunctionError(
                    "pointInPolygon: the point must be an (x, y) tuple "
                    "literal in SQL; for columns use "
                    "functions.ch_functions.point_in_polygon"
                )
            verts = _split_top_args(a[1][6:-1]) if a[1].strip().startswith(
                "array("
            ) else None
            if not verts:
                raise UntranslatableFunctionError(
                    "pointInPolygon: the polygon must be a literal array "
                    "of (x, y) tuples in SQL; for columns use "
                    "functions.ch_functions.point_in_polygon"
                )
            vs = []
            for v in verts:
                e = _tuple_literal_elems(v)
                if e is None or len(e) != 2:
                    raise UntranslatableFunctionError(
                        "pointInPolygon: every vertex must be an (x, y) "
                        "tuple literal"
                    )
                vs.append(
                    f"named_struct('x', CAST({e[0]} AS DOUBLE), "
                    f"'y', CAST({e[1]} AS DOUBLE))"
                )
            arr = f"array({', '.join(vs)})"
            px = f"CAST({pt[0]} AS DOUBLE)"
            py = f"CAST({pt[1]} AS DOUBLE)"
            return (
                f"aggregate({arr}, "
                f"named_struct('inside', false, "
                f"'px', element_at({arr}, -1).x, "
                f"'py', element_at({arr}, -1).y), "
                f"(_acc, _v) -> named_struct("
                f"'inside', IF(((_v.y > {py}) != (_acc.py > {py})) AND "
                f"({px} < (_acc.px - _v.x) * ({py} - _v.y) / "
                f"nullif(_acc.py - _v.y, CAST(0 AS DOUBLE)) + _v.x), "
                f"NOT _acc.inside, _acc.inside), "
                f"'px', _v.x, 'py', _v.y), "
                f"_acc -> CAST(_acc.inside AS TINYINT))"
            )

        return pip_fmt
    if name in ("bitSlice", "addTupleOfIntervals", "subtractTupleOfIntervals"):
        raise UntranslatableFunctionError(
            f"{name}(): no single-expression Spark analogue — "
            + (
                "slice bits via shiftright/shiftleft + conv()"
                if name == "bitSlice"
                else "chain the intervals: d + INTERVAL a + INTERVAL b"
            )
        )
    # --- pure-bit H3 accessors (wave 33): the H3 index layout is a
    # published spec (1 reserved bit, 4 mode, 3 reserved, 4 resolution,
    # 7 base cell, 15x3 digits) — these need no geo math, just shifts
    if name == "h3GetResolution":
        return lambda a: f"CAST(shiftright({a[0]}, 52) & 15 AS INT)"
    if name == "h3GetBaseCell":
        return lambda a: f"CAST(shiftright({a[0]}, 45) & 127 AS INT)"
    if name == "h3IsPentagon":
        # pentagons at every resolution are the center-child chains of
        # the 12 res-0 pentagon base cells: all digits 1..res are 0 and
        # the unused digits are 7s, i.e. the low 45 bits equal
        # 2^(3*(15-res)) - 1
        def h3_is_pentagon(a: Args) -> str:
            h = a[0]
            res = f"(shiftright({h}, 52) & 15)"
            # the 12 res-0 pentagons (icosahedron vertices) come in
            # antipodal pairs b + (121 - b): 4/117, 14/107, 24/97,
            # 38/83, 49/72, 58/63
            return (
                f"(CAST(shiftright({h}, 45) & 127 AS INT) IN "
                f"(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117) AND "
                f"({h} & 35184372088831) = "
                f"shiftleft(CAST(1 AS BIGINT), 3 * (15 - {res})) - 1)"
            )

        return h3_is_pentagon
    if name.startswith("h3") or name.startswith("geoToH3"):
        # FINAL adjudication (round 10, docs/PARITY.md): the H3
        # cell<->coordinate math needs the library's 122-row base-cell
        # constant table + the icosahedral gnomonic projection; those
        # constants cannot be re-derived from public prose, and
        # fabricating them would return silently WRONG coordinates —
        # strictly worse than this refusal. The pure-bit accessors ARE
        # implemented; each common H3 use has a working recipe below.
        raise UntranslatableFunctionError(
            f"{name}(): H3 geo math needs the h3 library, which is not "
            "bundled (pure-bit accessors h3GetResolution/h3GetBaseCell/"
            "h3IsPentagon ARE implemented). Recipes: grid bucketing -> "
            "geohashEncode(lon, lat, precision) (hierarchical prefixes "
            "like parent cells); multi-dim clustering/Z-order -> "
            "mortonEncode; radius filtering -> greatCircleDistance; "
            "neighbor joins -> geohash prefix-band join "
            "(operators/zorder for the storage layout)"
        )
    if name == "deltaSumTimestamp":
        # order-DEFINED deltaSum: sort the (ts, value) pairs by ts,
        # sum the positive consecutive deltas (CH sorts by the
        # timestamp argument to merge parts correctly — docs). One
        # collect + one linear fold per group; first row contributes 0.
        def delta_sum_ts(a: Args) -> str:
            if len(a) != 2:
                raise UntranslatableFunctionError(
                    "deltaSumTimestamp(value, timestamp) takes two "
                    "arguments"
                )
            # NULL-argument rows are skipped (CH semantics; also
            # keeps the -If fold's condition-nulled structs out)
            arr = _guard_fold(
                f"array_sort(filter(collect_list(named_struct("
                f"'t', CAST(({a[1]}) AS DOUBLE), "
                f"'v', CAST(({a[0]}) AS DOUBLE))), "
                f"_n -> _n.t IS NOT NULL AND _n.v IS NOT NULL))",
                "deltaSumTimestamp",
            )
            return (
                f"aggregate({arr}, named_struct("
                f"'prev', CAST(NULL AS DOUBLE), 's', CAST(0 AS DOUBLE)), "
                f"(_ac, _e) -> named_struct('prev', _e.v, "
                f"'s', _ac.s + CASE WHEN _ac.prev IS NULL "
                f"THEN CAST(0 AS DOUBLE) "
                f"ELSE greatest(CAST(0 AS DOUBLE), _e.v - _ac.prev) END), "
                f"_ac -> _ac.s)"
            )

        return delta_sum_ts
    if name in ("maxIntersections", "maxIntersectionsPosition"):
        # sweep-line as one sorted-array fold (the intervalLengthSum
        # pattern): starts are (+1) events, ends (-1); at equal
        # position the end sorts first (struct order (p, d), -1 < 1),
        # so touching intervals [a, x], [x, b] do NOT intersect —
        # CH's pair sort does the same. Position returns the left
        # boundary where the maximum is FIRST reached (as DOUBLE —
        # the numeric widening the collect applies; documented).
        def max_intersections(a: Args, _pos=(name == "maxIntersectionsPosition")) -> str:
            if len(a) != 2:
                raise UntranslatableFunctionError(
                    f"{name}(start, end) takes two arguments"
                )
            ev = _guard_fold(
                f"array_sort(concat("
                f"transform(collect_list(CAST(({a[0]}) AS DOUBLE)), "
                f"_x -> named_struct('p', _x, 'd', 1)), "
                f"transform(collect_list(CAST(({a[1]}) AS DOUBLE)), "
                f"_x -> named_struct('p', _x, 'd', -1))))",
                name,
            )
            step = (
                "named_struct('c', _ac.c + _e.d, "
                "'m', greatest(_ac.m, _ac.c + _e.d), "
                "'pos', CASE WHEN _ac.c + _e.d > _ac.m THEN _e.p "
                "ELSE _ac.pos END)"
            )
            fin = "_ac -> _ac.pos" if _pos else "_ac -> CAST(_ac.m AS BIGINT)"
            return (
                f"aggregate({ev}, named_struct('c', 0, 'm', 0, "
                f"'pos', CAST(NULL AS DOUBLE)), "
                f"(_ac, _e) -> {step}, {fin})"
            )

        return max_intersections
    if name == "rankCorr":
        # Spearman's rho with AVERAGE ranks (the CH aggregate), as one
        # self-contained expression: collect the (a, b) pairs ONCE
        # (bound via the 1-element transform trick), compute each
        # element's average rank by counting smaller/equal peers
        # (O(n^2) per group — a point statistic, not a join kernel;
        # entropy() set the precedent for collect+fold aggregates),
        # then Pearson over the two rank arrays.
        def rank_corr(a: Args) -> str:
            # NULL-argument rows are skipped (CH semantics)
            arr = _guard_fold(
                f"filter(collect_list(named_struct('a', CAST(({a[0]}) "
                f"AS DOUBLE), 'b', CAST(({a[1]}) AS DOUBLE))), "
                f"_n -> _n.a IS NOT NULL AND _n.b IS NOT NULL)",
                "rankCorr",
            )

            def ranks(f: str) -> str:
                return (
                    f"transform(_r, _x -> "
                    f"size(filter(_r, _s -> _s.{f} < _x.{f})) + "
                    f"(size(filter(_r, _s -> _s.{f} = _x.{f})) + 1) "
                    f"/ 2.0)"
                )

            def fsum(arr_expr: str) -> str:
                return (
                    f"aggregate({arr_expr}, CAST(0 AS DOUBLE), "
                    f"(_ac, _v) -> _ac + _v)"
                )

            return (
                f"element_at(transform(array({arr}), _r -> "
                f"element_at(transform(array(named_struct("
                f"'ra', {ranks('a')}, 'rb', {ranks('b')})), _w -> "
                f"(size(_r) * {fsum('zip_with(_w.ra, _w.rb, (_p, _q) -> _p * _q)')} "
                f"- {fsum('_w.ra')} * {fsum('_w.rb')}) / "
                f"sqrt((size(_r) * {fsum('zip_with(_w.ra, _w.ra, (_p, _q) -> _p * _q)')} "
                f"- pow({fsum('_w.ra')}, 2)) * "
                f"(size(_r) * {fsum('zip_with(_w.rb, _w.rb, (_p, _q) -> _p * _q)')} "
                f"- pow({fsum('_w.rb')}, 2)))), 1)), 1)"
            )

        return rank_corr
    if name == "uptime":
        raise UntranslatableFunctionError(
            "uptime() (server uptime) has no JVM-expression analogue; "
            "read spark.sparkContext.startTime from the driver"
        )
    if name == "port":
        def port_fmt(a: Args) -> str:
            # scheme-prefixed URL OR scheme-less host:port — CH's
            # port('host:80') returns 80 (ADVICE round 4: the scheme-less
            # alternative was missing, silently yielding the default)
            default = a[1] if len(a) > 1 else "0"
            got = (
                f"try_cast(regexp_extract({a[0]}, "
                f"'^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#:]+:([0-9]+)', 1) "
                f"AS INT)"
            )
            return f"coalesce({got}, {default})"

        return port_fmt
    if name == "arrayProduct":
        return lambda a: (
            f"aggregate({a[0]}, CAST(1.0 AS DOUBLE), "
            f"(acc, x) -> acc * CAST(x AS DOUBLE))"
        )
    if name == "arrayZipUnaligned":
        # pad with NULL to the longest input (CH semantics); Spark's
        # arrays_zip also pads with NULL, so it maps directly
        return lambda a: f"arrays_zip({', '.join(a)})"
    if name == "hostName":
        # the JVM's own hostname, derived without a UDF; CH returns the
        # server's — a local engine IS its own server
        return lambda a: (
            "substring_index(java_method('java.net.InetAddress', "
            "'getLocalHost'), '/', 1)"
        )
    if name in ("timezone", "timeZone", "serverTimezone", "serverTimeZone"):
        return lambda a: "current_timezone()"
    if name == "YYYYMMDDToDate":
        return lambda a: f"to_date(CAST({a[0]} AS STRING), 'yyyyMMdd')"
    if name == "YYYYMMDDhhmmssToDateTime":
        return lambda a: (
            f"to_timestamp(CAST({a[0]} AS STRING), 'yyyyMMddHHmmss')"
        )
    if name == "kurtPop":
        # CH kurtPop = mu4/sigma^4 (non-excess); Spark kurtosis is excess
        return lambda a: f"(kurtosis({a[0]}) + 3)"
    if name == "kurtSamp":
        # CH kurtSamp = (mu4/n) / s_samp^4 = kurtPop * ((n-1)/n)^2
        return lambda a: (
            f"((kurtosis({a[0]}) + 3) * power((count({a[0]}) - 1) "
            f"/ CAST(count({a[0]}) AS DOUBLE), 2))"
        )
    if name == "skewSamp":
        # CH skewSamp = m3 / s_samp^3 = skewPop * ((n-1)/n)^1.5
        return lambda a: (
            f"(skewness({a[0]}) * power((count({a[0]}) - 1) "
            f"/ CAST(count({a[0]}) AS DOUBLE), 1.5))"
        )
    if name in ("medianExact", "medianTiming", "medianExactLow",
                "medianExactHigh", "medianTDigest", "medianBFloat16"):
        # median* = quantile*(0.5); Timing/TDigest/BFloat16 are CH
        # accuracy/memory tiers of the same statistic — percentile is
        # exact, which every tier converges to
        return lambda a: f"percentile({a[0]}, 0.5)"
    if name in ("medianExactWeighted", "medianTimingWeighted",
                "medianTDigestWeighted"):
        # CH (value, weight); Spark percentile's third arg is frequency
        return lambda a: f"percentile({a[0]}, 0.5, {a[1]})"
    if name == "sumWithOverflow":
        # CH wraps at the input type's width; Spark's sum widens (and
        # ANSI mode errors on overflow) — values agree until overflow,
        # which is loud here instead of silently wrapped
        return lambda a: f"sum({a[0]})"
    if name in ("countMap", "avgMap"):
        # countMap: per-key occurrence counts; avgMap: per-key mean =
        # sumMap / countMap zipped — both over the key-union fold
        def count_avg_map(a: Args, _n=name) -> str:
            src = (
                a[0] if len(a) == 1
                else f"map_from_arrays({a[0]}, {a[1]})"
            )
            lst = _guard_fold(f"collect_list({src})", _n)
            seed = f"map_filter(element_at({lst}, 1), (k, v) -> false)"
            cnt = (
                f"aggregate({lst}, transform_values({seed}, "
                f"(k, v) -> CAST(1 AS BIGINT)), (acc, e) -> "
                f"map_zip_with(acc, e, (k, a, b) -> "
                f"coalesce(a, CAST(0 AS BIGINT)) + "
                f"(CASE WHEN b IS NULL THEN 0 ELSE 1 END)))"
            )
            if _n == "countMap":
                return cnt
            ssum = (
                f"aggregate({lst}, transform_values({seed}, "
                f"(k, v) -> CAST(0 AS DOUBLE)), (acc, e) -> "
                f"map_zip_with(acc, e, (k, a, b) -> "
                f"coalesce(a, CAST(0 AS DOUBLE)) + coalesce(b, 0)))"
            )
            return (
                f"map_zip_with({ssum}, {cnt}, "
                f"(k, s, c) -> try_divide(s, c))"
            )

        return count_avg_map
    if name in ("sumMap", "minMap", "maxMap"):
        # aggregate a map column by UNION of keys: fold the collected
        # maps with map_zip_with (union-join on keys). All JVM; the
        # empty-but-typed seed comes from filtering everything out of
        # the first element.
        merge = {
            "sumMap": "coalesce(a, 0) + coalesce(b, 0)",
            "minMap": "least(coalesce(a, b), coalesce(b, a))",
            "maxMap": "greatest(coalesce(a, b), coalesce(b, a))",
        }[name]

        def map_agg(a: Args, _merge=merge) -> str:
            # 1-arg form over a map column returns a Map (CH shape for
            # the Map overload); the 2-arg CH form over parallel
            # (keys, values) arrays returns CH's Tuple(Array, Array)
            # with keys SORTED — emitted as a struct of two arrays
            src = (
                a[0]
                if len(a) == 1
                else f"map_from_arrays({a[0]}, {a[1]})"
            )
            lst = _guard_fold(f"collect_list({src})", name)
            seed = f"map_filter(element_at({lst}, 1), (k, v) -> false)"
            folded = (
                f"aggregate({lst}, {seed}, (acc, e) -> "
                f"map_zip_with(acc, e, (k, a, b) -> {_merge}))"
            )
            if len(a) == 1:
                return folded
            ent = f"array_sort(map_entries({folded}))"
            return (
                f"struct(transform({ent}, __cas_e -> __cas_e.key), "
                f"transform({ent}, __cas_e -> __cas_e.value))"
            )

        return map_agg
    if name == "age":
        # CH age(unit, a, b) counts COMPLETE units (vs dateDiff's
        # boundary crossings) — exactly Spark's timestampdiff
        def age_fmt(a: Args) -> str:
            u = a[0].strip()
            if u.startswith("'") and u.endswith("'"):
                return f"timestampdiff({u[1:-1].upper()}, {a[1]}, {a[2]})"
            raise UntranslatableFunctionError(
                "age(): the unit must be a string literal"
            )

        return age_fmt
    if name == "ifNotFinite":
        return lambda a: (
            f"CASE WHEN isnan(CAST({a[0]} AS DOUBLE)) OR "
            f"abs(CAST({a[0]} AS DOUBLE)) = double('Infinity') "
            f"THEN {a[1]} ELSE {a[0]} END"
        )
    if name == "randConstant":
        # one draw per query, constant across rows (CH: constant per
        # block) — a non-correlated scalar subquery evaluates once
        return lambda a: "(SELECT rand())"
    if name == "char":
        def char_fmt(a: Args) -> str:
            if len(a) <= 1:
                return f"char({', '.join(a)})"
            return "concat(" + ", ".join(f"char({x})" for x in a) + ")"

        return char_fmt
    if name == "extract":
        # CH extract(haystack, re) = first capture group if the pattern
        # has one, else the whole match. The SQL-standard
        # `extract(field FROM ts)` has no comma -> single arg, untouched.
        def extract_fmt(a: Args) -> str:
            if len(a) != 2:
                return f"extract({', '.join(a)})"
            pat = a[1].strip()
            grp = 0
            if pat.startswith("'") and pat.endswith("'"):
                body = pat[1:-1]
                k = 0
                in_class = False
                while k < len(body):
                    ch = body[k]
                    if ch == "\\":
                        k += 2
                        continue
                    if in_class:
                        if ch == "]":
                            in_class = False
                    elif ch == "[":
                        in_class = True
                    elif ch == "(":
                        if body[k + 1 : k + 2] != "?":
                            grp = 1  # plain capturing group
                            break
                        # (?...: only the named form (?<name> captures;
                        # (?<= / (?<! are lookbehinds, the rest are
                        # flags / non-capturing / lookaheads
                        if body[k + 1 : k + 3] == "?<" and body[
                            k + 3 : k + 4
                        ] not in ("=", "!"):
                            grp = 1
                            break
                    k += 1
            return f"regexp_extract({a[0]}, {pat}, {grp})"

        return extract_fmt
    if name == "replaceOne":
        # first-occurrence replace: splice at locate() — Spark's
        # replace()/regexp_replace() are all-occurrence only
        def replace_one(a: Args) -> str:
            s, find, repl = a[0], a[1], a[2]
            loc = f"locate({find}, {s})"
            return (
                f"CASE WHEN {loc} > 0 THEN concat("
                f"substr({s}, 1, {loc} - 1), {repl}, "
                f"substr({s}, {loc} + length({find}))) ELSE {s} END"
            )

        return replace_one
    if name in ("accurateCast", "accurateCastOrNull"):
        # CH range-checks the TARGET type: accurateCast(-1, 'UInt8')
        # throws, accurateCastOrNull returns NULL. The Spark type the
        # bridge maps to is wider (UInt8 -> SMALLINT), so the CH range
        # must be enforced explicitly.
        _strict_cast = name == "accurateCast"

        def accurate_cast(a: Args, _throw=_strict_cast) -> str:
            from clickhouse_arrow_spark.types import (
                ch_type_to_spark,
                parse_ch_type,
            )

            ranges = {
                "Int8": (-128, 127),
                "Int16": (-32768, 32767),
                "Int32": (-2147483648, 2147483647),
                "Int64": (-9223372036854775808, 9223372036854775807),
                "UInt8": (0, 255),
                "UInt16": (0, 65535),
                "UInt32": (0, 4294967295),
                "UInt64": (0, 18446744073709551615),
            }
            t = a[1].strip()
            kw = "CAST" if _throw else "TRY_CAST"
            if not (t.startswith("'") and t.endswith("'")):
                return f"{kw}({a[0]} AS {t})"
            # no .upper(): struct field names are case-sensitive
            ch_name = t[1:-1]
            dt, _ = ch_type_to_spark(parse_ch_type(ch_name))
            cast = f"{kw}({a[0]} AS {dt.simpleString()})"
            if ch_name not in ranges:
                return cast
            lo, hi = ranges[ch_name]
            probe = f"TRY_CAST({a[0]} AS DECIMAL(38, 0))"
            in_range = f"({probe} BETWEEN {lo} AND {hi})"
            if _throw:
                # concat with the runtime value keeps raise_error out
                # of constant folding (literal messages fold at plan
                # time and would fail the whole query eagerly)
                err = (
                    f"raise_error(concat('accurateCast: value ', "
                    f"CAST({a[0]} AS STRING), "
                    f"' out of range for {ch_name}'))"
                )
                return (
                    f"(CASE WHEN ({a[0]}) IS NULL THEN {cast} "
                    f"WHEN {in_range} THEN {cast} "
                    f"ELSE CAST({err} AS {dt.simpleString()}) END)"
                )
            return f"(CASE WHEN {in_range} THEN {cast} END)"

        return accurate_cast
    if name == "count":
        # CH `count()` == count(*); Spark's count needs an argument
        return lambda a: (
            "count(*)"
            if not any(x.strip() for x in a)
            else f"count({', '.join(a)})"
        )
    if name.upper() == "CAST":
        # CAST with a ClickHouse type name — `CAST(x AS Nullable(Int64))`,
        # `CAST(x, 'Float64')` (the CH two-arg form) — maps the target
        # through the type bridge; Spark-native targets pass unchanged
        # (parse_ch_type rejects them and the original text is kept).
        def cast_fmt(a: Args) -> str:
            def map_type(t: str) -> str:
                from clickhouse_arrow_spark.types import (
                    ch_type_to_spark,
                    parse_ch_type,
                )

                try:
                    dt, _ = ch_type_to_spark(parse_ch_type(t.strip()))
                    # no .upper(): struct field names are case-sensitive
                    return dt.simpleString()
                except Exception:
                    return t.strip()

            if len(a) == 2:
                t = a[1].strip()
                if t.startswith("'") and t.endswith("'"):
                    target = map_type(t[1:-1])
                    # CH parses string literals into complex types —
                    # Spark's CAST can't; from_json can
                    x = a[0].strip()
                    if (
                        x.startswith("'")
                        and target.split("<")[0] in ("array", "map", "struct")
                    ):
                        return f"from_json({a[0]}, '{target}')"
                    return f"CAST({a[0]} AS {target})"
                return f"CAST({', '.join(a)})"
            parts = _split_depth0(_AS_SPLIT_RE, a[0])
            if len(parts) < 2:
                return f"CAST({', '.join(a)})"
            expr = " AS ".join(parts[:-1])
            return f"CAST({expr} AS {map_type(parts[-1])})"

        return cast_fmt
    if name == "splitByString":
        # CH (sep, s) -> Spark split(s, regex-escaped sep), same
        # contract as splitByChar for multi-char separators
        def split_by_string(a: Args) -> str:
            sep = a[0].strip()
            if sep.startswith("'") and sep.endswith("'"):
                lit = re.escape(sep[1:-1]).replace("\\", "\\\\").replace("'", "\\'")
                sep = f"'{lit}'"
            if len(a) > 2:
                return _split_max_substrings(a[1], sep, a[2])
            return f"split({a[1]}, {sep})"

        return split_by_string
    # ---- numeric buckets / special functions ---------------------------
    if name == "toDateTime64":
        # precision argument dropped: Spark timestamps are fixed-width
        # microsecond (SURVEY §1.3 DateTime64 mapping)
        return lambda a: f"CAST({a[0]} AS TIMESTAMP)"
    if name == "intExp2":
        # exact for exponents <= 53 (beyond that CH's UInt64 overflows
        # anyway at 64)
        return lambda a: f"CAST(pow(2, {a[0]}) AS BIGINT)"
    if name == "intExp10":
        return lambda a: f"CAST(pow(10, {a[0]}) AS BIGINT)"
    if name == "roundToExp2":
        return lambda a: (
            f"(CASE WHEN ({a[0]}) < 1 THEN 0 "
            f"ELSE CAST(pow(2, floor(log2({a[0]}))) AS BIGINT) END)"
        )
    if name in ("roundDuration", "roundAge"):
        buckets = (
            [1, 10, 30, 60, 120, 180, 240, 300, 600, 1200, 1800, 3600,
             7200, 18000, 36000]
            if name == "roundDuration"
            else [18, 25, 35, 45, 55]
        )
        def round_buckets(a: Args, _b: list = buckets, _n: str = name) -> str:
            # CH's fixed bucket ladders: largest bucket <= x (roundAge
            # maps 1..17 -> 17, its documented special case)
            branches = "".join(
                f" WHEN ({a[0]}) >= {v} THEN {v}" for v in reversed(_b)
            )
            low = " WHEN ({x}) >= 1 THEN 17".format(x=a[0]) if _n == "roundAge" else ""
            return f"(CASE{branches}{low} ELSE 0 END)"

        return round_buckets
    if name in ("erf", "erfc"):
        # exact double-precision erf via the lazily registered
        # math.erf UDF (wave 26; the A&S polynomial this replaces was
        # off in the 7th digit — CH computes the exact libm value)
        def erf_fmt(a: Args, _c: bool = (name == "erfc")) -> str:
            fn = "ch_erfc" if _c else "ch_erf"
            return f"{fn}(CAST({a[0]} AS DOUBLE))"

        return erf_fmt
    if name == "arrayResize":
        def array_resize(a: Args) -> str:
            fill = a[2] if len(a) > 2 else "NULL"
            if len(a) <= 2:
                # CH pads with the element type's DEFAULT (0 / '' / []),
                # not NULL. The element type is textually known only
                # for array literals — sniff those; column-typed arrays
                # keep the NULL pad (documented in docs/PARITY.md,
                # exact via the explicit 3-arg extender).
                arr = a[0].strip()
                m_lit = re.match(r"^(?:\[|array\()\s*(.)", arr, re.I)
                if m_lit:
                    head = m_lit.group(1)
                    if head.isdigit() or head in "+-.":
                        fill = "0"
                    elif head in "'\"":
                        fill = "''"
            return (
                f"(CASE WHEN size({a[0]}) >= ({a[1]}) "
                f"THEN slice({a[0]}, 1, {a[1]}) "
                f"ELSE concat({a[0]}, array_repeat({fill}, "
                f"({a[1]}) - size({a[0]}))) END)"
            )

        return array_resize
    if name == "arrayFirstIndex":
        # CH (lambda, arr); 1-based index of the first match, 0 if none
        return lambda a: (
            f"coalesce(array_position(transform({a[1]}, {a[0]}), true), 0)"
        )
    if name == "toFixedString":
        # FixedString(n) pads with NUL bytes; overlong input errors in
        # CH — here it truncates (documented divergence, no exceptions
        # from expressions)
        return lambda a: f"rpad({a[0]}, {a[1]}, chr(0))"
    if name == "format":
        def format_fmt(a: Args) -> str:
            pat = a[0].strip()
            if not (pat.startswith("'") and pat.endswith("'")):
                raise UntranslatableFunctionError(
                    "format(): pattern must be a string literal"
                )
            body = pat[1:-1]
            out, i, auto = [], 0, 0
            while i < len(body):
                if body[i] == "{":
                    close = body.find("}", i)
                    if close == -1:
                        raise UntranslatableFunctionError(
                            f"format(): unbalanced brace in {pat}"
                        )
                    ref = body[i + 1 : close]
                    if ref == "":
                        auto += 1
                        out.append("%s")
                    else:
                        out.append(f"%{int(ref) + 1}$s")
                    i = close + 1
                elif body[i] == "%":
                    out.append("%%")
                    i += 1
                else:
                    out.append(body[i])
                    i += 1
            joined = "".join(out)
            return f"format_string('{joined}', {', '.join(a[1:])})"

        return format_fmt
    # ---- array folds / rotations / bitmaps -----------------------------
    if name == "arrayFold":
        # CH (lambda, arr, init) -> Spark aggregate(arr, init, lambda);
        # lambda shape (acc, x) -> ... is identical in both dialects
        def array_fold(a: Args) -> str:
            if len(a) != 3:
                raise UntranslatableFunctionError(
                    "arrayFold: only the single-array form "
                    "(lambda, arr, init) translates"
                )
            return f"aggregate({a[1]}, {a[2]}, {a[0]})"

        return array_fold
    if name in ("arrayPartialSort", "arrayPartialReverseSort"):
        # CH contract: first n sorted, remainder in UNSPECIFIED order —
        # a full sort is a valid implementation of that contract (and
        # the only deterministic one)
        if name.endswith("ReverseSort"):
            return lambda a: f"reverse(array_sort({a[1]}))"
        return lambda a: f"array_sort({a[1]})"
    if name == "arrayRotateLeft":
        return lambda a: (
            f"concat(slice({a[0]}, pmod({a[1]}, size({a[0]})) + 1, "
            f"size({a[0]}) - pmod({a[1]}, size({a[0]}))), "
            f"slice({a[0]}, 1, pmod({a[1]}, size({a[0]}))))"
        )
    if name == "arrayRotateRight":
        return lambda a: (
            f"concat(slice({a[0]}, size({a[0]}) - pmod({a[1]}, size({a[0]})) + 1, "
            f"pmod({a[1]}, size({a[0]}))), "
            f"slice({a[0]}, 1, size({a[0]}) - pmod({a[1]}, size({a[0]}))))"
        )
    if name in ("arrayShiftLeft", "arrayShiftRight"):
        def array_shift(a: Args, _left: bool = name.endswith("Left")) -> str:
            # Size-preserving shift, CH semantics: n may be negative
            # (shift the OTHER way), n >= size yields all-fill, and the
            # default fill is the element type's DEFAULT (0 for
            # numerics), not NULL — get(a, 0) - get(a, 0) derives a
            # typed zero without knowing the type (get is 0-based and
            # ANSI-safe on empty arrays, unlike element_at). Non-numeric
            # arrays fail analysis on the subtraction — pass the
            # explicit third argument there, matching CH's own
            # must-match-element-type rule.
            arr, n = a[0], a[1]
            fill = a[2] if len(a) > 2 else f"(get({arr}, 0) - get({arr}, 0))"
            k = f"least(abs(CAST({n} AS INT)), size({arr}))"
            left = (
                f"concat(slice({arr}, {k} + 1, size({arr}) - {k}), "
                f"array_repeat({fill}, {k}))"
            )
            right = (
                f"concat(array_repeat({fill}, {k}), "
                f"slice({arr}, 1, size({arr}) - {k}))"
            )
            fwd, rev = (left, right) if _left else (right, left)
            return f"IF(CAST({n} AS INT) >= 0, {fwd}, {rev})"

        return array_shift
    # CH roaring bitmaps <-> sorted distinct arrays: same algebra, the
    # engine's layout differs (SURVEY §2.2: physical encodings are the
    # engine's own business)
    if name == "bitmapBuild":
        return lambda a: f"array_sort(array_distinct({a[0]}))"
    if name == "bitmapCardinality":
        return lambda a: f"size({a[0]})"
    if name == "bitmapAnd":
        return lambda a: f"array_sort(array_intersect({a[0]}, {a[1]}))"
    if name == "bitmapOr":
        return lambda a: f"array_sort(array_union({a[0]}, {a[1]}))"
    if name == "bitmapXor":
        return lambda a: (
            f"array_sort(array_except(array_union({a[0]}, {a[1]}), "
            f"array_intersect({a[0]}, {a[1]})))"
        )
    if name == "bitmapAndnot":
        return lambda a: f"array_sort(array_except({a[0]}, {a[1]}))"
    if name == "bitmapAndCardinality":
        return lambda a: f"size(array_intersect({a[0]}, {a[1]}))"
    if name == "bitmapOrCardinality":
        return lambda a: f"size(array_union({a[0]}, {a[1]}))"
    if name == "bitmapXorCardinality":
        return lambda a: (
            f"size(array_except(array_union({a[0]}, {a[1]}), "
            f"array_intersect({a[0]}, {a[1]})))"
        )
    if name == "bitmapAndnotCardinality":
        return lambda a: f"size(array_except({a[0]}, {a[1]}))"
    if name == "bitmapContains":
        return lambda a: f"array_contains({a[0]}, {a[1]})"
    if name == "bitmapHasAny":
        return lambda a: f"arrays_overlap({a[0]}, {a[1]})"
    if name == "bitmapHasAll":
        return lambda a: f"(size(array_except({a[1]}, {a[0]})) = 0)"
    if name == "bitmapMin":
        return lambda a: f"array_min({a[0]})"
    if name == "bitmapMax":
        return lambda a: f"array_max({a[0]})"
    if name == "bitmapToArray":
        return lambda a: f"array_sort({a[0]})"
    if name == "groupBitmap":
        return lambda a: f"count(DISTINCT {a[0]})"
    if name == "bitmapSubsetInRange":
        # CH: values in [range_start, range_end)
        return lambda a: (
            f"filter({a[0]}, __cas_v -> __cas_v >= ({a[1]}) "
            f"AND __cas_v < ({a[2]}))"
        )
    if name == "bitmapSubsetLimit":
        # CH: at most `limit` smallest values >= range_start
        return lambda a: (
            f"slice(array_sort(filter({a[0]}, __cas_v -> "
            f"__cas_v >= ({a[1]}))), 1, {a[2]})"
        )
    if name == "monthName":
        # CH returns the FULL month name; without this formatter the
        # name would fall through to Spark 4's monthname() builtin,
        # which abbreviates ('Mar' vs CH 'March')
        return lambda a: f"date_format({a[0]}, 'MMMM')"
    if name == "dateName":
        def date_name(a: Args) -> str:
            part = a[0].strip().strip("'\"").lower()
            fmts = {"month": "MMMM", "weekday": "EEEE"}
            if part in fmts:
                return f"date_format({a[1]}, '{fmts[part]}')"
            funcs = {
                "year": "year", "quarter": "quarter", "week": "weekofyear",
                "dayofyear": "dayofyear", "day": "day", "hour": "hour",
                "minute": "minute", "second": "second",
            }
            if part in funcs:
                return f"CAST({funcs[part]}({a[1]}) AS STRING)"
            raise UntranslatableFunctionError(
                f"dateName: unsupported part {part!r}"
            )

        return date_name
    # ---- string distance / multi-search --------------------------------
    if name == "stringJaccardIndex":
        # CH: Jaccard over byte sets; for the string columns this
        # engine handles (UTF-8 text) the char-set form is identical on
        # ASCII and a documented char-level variant beyond it.
        def string_jaccard(a: Args) -> str:
            return (
                f"(CAST(size(array_intersect(split({a[0]}, ''), "
                f"split({a[1]}, ''))) AS DOUBLE) / "
                f"size(array_union(split({a[0]}, ''), split({a[1]}, ''))))"
            )

        return string_jaccard
    if name == "multiSearchFirstPosition":
        return lambda a: (
            f"coalesce(array_min(filter(transform({a[1]}, "
            f"_n -> locate(_n, {a[0]})), _p -> _p > 0)), 0)"
        )
    if name == "multiSearchFirstIndex":
        # index (1-based, into the needle array) of the needle whose
        # match sits leftmost in the haystack; 0 when none match
        # try_element_at: an all-miss needle list leaves an EMPTY
        # filtered array, which plain element_at raises on under ANSI
        return lambda a: (
            f"coalesce(try_element_at(array_sort(filter(zip_with({a[1]}, "
            f"{_safe_seq1(f'size({a[1]})')}, (_n, _i) -> "
            f"struct(locate(_n, {a[0]}) AS pos, _i AS idx)), "
            f"_x -> _x.pos > 0)), 1).idx, 0)"
        )
    if name == "multiSearchAnyCaseInsensitive":
        return lambda a: (
            f"exists({a[1]}, _n -> contains(lower({a[0]}), lower(_n)))"
        )
    if name == "boundingRatio":
        # aggregate: slope between the (min x, its y) and (max x, its y)
        # points — exact via min_by/max_by, one aggregation pass
        return lambda a: (
            f"((max_by({a[1]}, {a[0]}) - min_by({a[1]}, {a[0]})) / "
            f"(max({a[0]}) - min({a[0]})))"
        )
    if name == "extractTextFromHTML":
        # documented approximation: drop script/style subtrees, strip
        # tags, collapse whitespace (CH additionally handles CDATA and
        # comments beyond what a regex pass does)
        def extract_text(a: Args) -> str:
            return (
                "trim(regexp_replace(regexp_replace(regexp_replace("
                f"{a[0]}, '(?is)<(script|style)[^>]*>.*?</\\\\1\\\\s*>', ' '), "
                "'<[^>]*>', ' '), '\\\\s+', ' '))"
            )

        return extract_text
    # ---- geo ------------------------------------------------------------
    if name in ("greatCircleDistance", "geoDistance"):
        # exact haversine on CH's sphere radius (6372797.560856 m).
        # Divergence note: CH's implementation is a fast sincos
        # approximation (and geoDistance adds ellipsoid correction), so
        # values differ from CH's by <0.05%; this form is the
        # mathematically exact great-circle distance.
        def great_circle(a: Args) -> str:
            lon1, lat1, lon2, lat2 = a[0], a[1], a[2], a[3]
            return (
                f"(2 * 6372797.560856 * asin(sqrt("
                f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
                f"cos(radians({lat1})) * cos(radians({lat2})) * "
                f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))"
            )

        return great_circle
    if name == "greatCircleAngle":
        def great_circle_angle_fmt(a: Args) -> str:
            lon1, lat1, lon2, lat2 = a[0], a[1], a[2], a[3]
            return (
                f"degrees(2 * asin(sqrt("
                f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
                f"cos(radians({lat1})) * cos(radians({lat2})) * "
                f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))"
            )

        return great_circle_angle_fmt
    if name in ("erf", "erfc"):
        # exact double-precision erf via the lazily registered
        # math.erf UDF (wave 26; the A&S polynomial this replaces was
        # off in the 7th digit — CH computes the exact libm value)
        def erf_fmt(a: Args, _c=(name == "erfc")) -> str:
            fn = "ch_erfc" if _c else "ch_erf"
            return f"{fn}(CAST({a[0]} AS DOUBLE))"

        return erf_fmt
    if name == "formatReadableTimeDelta":
        # CH pretty-printer: non-zero parts joined with ', ', singular/
        # plural units. Days/hours/minutes/seconds (the CH years/months
        # units above 1 month use 360/30-day approximations — callers
        # needing those pass an explicit maximum_unit in CH, a form this
        # emits in days).
        def readable_delta(a: Args) -> str:
            x = f"CAST(floor(abs({a[0]})) AS BIGINT)"
            sign = f"IF(({a[0]}) < 0, '-', '')"
            parts = []
            for unit, div, mod in (
                ("day", 86400, None),
                ("hour", 3600, 24),
                ("minute", 60, 60),
                ("second", 1, 60),
            ):
                v = f"({x} div {div})" if mod is None else \
                    f"(({x} div {div}) % {mod})"
                parts.append(
                    f"CASE WHEN {v} > 0 THEN concat({v}, ' {unit}', "
                    f"IF({v} > 1, 's', '')) END"
                )
            # CH joins with ', ' but 'and' before the final part:
            # '2 hours, 8 minutes and 10 seconds'
            body = (
                f"regexp_replace(concat_ws(', ', {', '.join(parts)}), "
                f"', ([^,]*)$', ' and $1')"
            )
            joined = f"concat({sign}, {body})"
            return f"IF({x} = 0, '0 seconds', {joined})"

        return readable_delta
    if name in ("formatReadableSize", "formatReadableQuantity",
                "formatReadableDecimalSize"):
        # CH pretty-printers: value scaled to the largest unit, always 2
        # decimals. Size uses binary units (KiB..EiB), DecimalSize
        # powers of 1000 (KB..EB), quantity decimal words
        # (thousand..trillion).
        units = (
            [("B", 1), ("KiB", 1024.0), ("MiB", 1024.0**2), ("GiB", 1024.0**3),
             ("TiB", 1024.0**4), ("PiB", 1024.0**5), ("EiB", 1024.0**6)]
            if name == "formatReadableSize"
            else [("B", 1), ("KB", 1e3), ("MB", 1e6), ("GB", 1e9),
                  ("TB", 1e12), ("PB", 1e15), ("EB", 1e18)]
            if name == "formatReadableDecimalSize"
            else [("", 1), (" thousand", 1e3), (" million", 1e6),
                  (" billion", 1e9), (" trillion", 1e12)]
        )

        def readable(a: Args, _units=units) -> str:
            x = f"CAST({a[0]} AS DOUBLE)"
            parts = []
            for i, (suffix, div) in enumerate(_units[:-1]):
                nxt = _units[i + 1][1]
                val = x if div == 1 else f"({x}) / {div!r}"
                label = f" {suffix}" if suffix and not suffix.startswith(" ") else suffix
                parts.append(
                    f"WHEN abs({x}) < {nxt!r} THEN "
                    f"concat(format_string('%.2f', {val}), '{label}')"
                )
            last_suffix, last_div = _units[-1]
            label = (
                f" {last_suffix}"
                if last_suffix and not last_suffix.startswith(" ")
                else last_suffix
            )
            parts.append(
                f"ELSE concat(format_string('%.2f', ({x}) / {last_div!r}), "
                f"'{label}')"
            )
            return "CASE " + " ".join(parts) + " END"

        return readable
    if name == "bar":
        def bar_fmt(a: Args) -> str:
            x, lo, hi = a[0], a[1], a[2]
            width = a[3] if len(a) > 3 else "80"
            w = (
                f"greatest(least((CAST({x} AS DOUBLE) - ({lo})) / "
                f"(({hi}) - ({lo})), 1.0D), 0.0D) * ({width})"
            )
            w8 = f"CAST(round(({w}) * 8) AS INT)"
            # eighth-block rendering, exactly CH's glyph ramp
            return (
                f"concat(repeat('█', ({w8}) DIV 8), "
                f"element_at(array('', '▏', '▎', '▍', '▌', '▋', '▊', '▉'), "
                f"(({w8}) % 8) + 1))"
            )

        return bar_fmt
    if name.startswith(("visitParam", "simpleJSON")):
        # legacy fast-path JSON accessors; both families share semantics
        suffix = name.removeprefix("visitParam").removeprefix("simpleJSON")
        base = lambda a: f"get_json_object({a[0]}, concat('$.', {a[1]}))"  # noqa: E731
        table = {
            "ExtractString": base,
            "ExtractRaw": base,
            "ExtractInt": lambda a: f"CAST({base(a)} AS BIGINT)",
            "ExtractUInt": lambda a: f"CAST({base(a)} AS BIGINT)",
            "ExtractFloat": lambda a: f"CAST({base(a)} AS DOUBLE)",
            "ExtractBool": lambda a: f"({base(a)} = 'true')",
            "Has": lambda a: f"({base(a)} IS NOT NULL)",
        }
        if suffix in table:
            return table[suffix]
    if name == "toValidUTF8":
        # Spark strings are validated/replaced on decode already
        return lambda a: f"({a[0]})"
    if name.startswith("toRelative") and name.endswith("Num"):
        # difference-preserving ordinals; the absolute origin may differ
        # from CH's internal fixed point, deltas match exactly
        unit = name[len("toRelative"):-len("Num")]
        rel = {
            "Year": lambda a: f"year({a[0]})",
            "Quarter": lambda a: f"(year({a[0]}) * 4 + quarter({a[0]}) - 1)",
            "Month": lambda a: f"(year({a[0]}) * 12 + month({a[0]}) - 1)",
            "Week": lambda a: (
                f"(CAST(floor(datediff({a[0]}, DATE '1970-01-05') / 7) "
                f"AS BIGINT) + 1)"
            ),
            "Day": lambda a: f"datediff({a[0]}, DATE '1970-01-01')",
            "Hour": lambda a: f"(unix_timestamp({a[0]}) DIV 3600)",
            "Minute": lambda a: f"(unix_timestamp({a[0]}) DIV 60)",
            "Second": lambda a: f"unix_timestamp({a[0]})",
        }
        if unit in rel:
            return rel[unit]
    if name.startswith("emptyArray"):
        t = {
            "UInt8": "SMALLINT", "UInt16": "INT", "UInt32": "BIGINT",
            "UInt64": "BIGINT", "Int8": "TINYINT", "Int16": "SMALLINT",
            "Int32": "INT", "Int64": "BIGINT", "Float32": "FLOAT",
            "Float64": "DOUBLE", "String": "STRING", "Date": "DATE",
            "DateTime": "TIMESTAMP",
        }.get(name[len("emptyArray"):])
        if t:
            return lambda a, _t=t: f"CAST(array() AS ARRAY<{_t}>)"
    if name == "arrayEnumerate":
        return lambda a: _safe_seq1(f"size({a[0]})")
    if name == "arrayEnumerateDense":
        # dense index of each element in first-appearance order
        # (array_distinct preserves first-appearance order)
        return (
            lambda a: f"transform({a[0]}, x -> "
            f"array_position(array_distinct({a[0]}), x))"
        )
    if name in ("caseWithExpression", "caseWithoutExpression"):
        def case_fmt(a: Args, _with=name == "caseWithExpression") -> str:
            if _with:
                head, rest = a[0], a[1:]
                pairs, default = rest[:-1], rest[-1]
                whens = " ".join(
                    f"WHEN {pairs[i]} THEN {pairs[i + 1]}"
                    for i in range(0, len(pairs) - 1, 2)
                )
                return f"CASE {head} {whens} ELSE {default} END"
            pairs, default = a[:-1], a[-1]
            whens = " ".join(
                f"WHEN {pairs[i]} THEN {pairs[i + 1]}"
                for i in range(0, len(pairs) - 1, 2)
            )
            return f"CASE {whens} ELSE {default} END"

        return case_fmt
    if name == "arrayReduce":
        def array_reduce(a: Args) -> str:
            agg = a[0].strip().strip("'").lower()
            arr = a[1]
            forms = {
                "sum": f"aggregate({arr}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)",
                "min": f"array_min({arr})",
                "max": f"array_max({arr})",
                "avg": (
                    f"aggregate({arr}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
                    f" / size({arr})"
                ),
                "count": f"size({arr})",
                "any": f"element_at({arr}, 1)",
                "anylast": f"element_at({arr}, -1)",
                "uniq": f"size(array_distinct({arr}))",
                "uniqexact": f"size(array_distinct({arr}))",
                "grouparray": arr,
            }
            if agg not in forms:
                raise UntranslatableFunctionError(
                    f"arrayReduce({a[0]}): aggregate {agg!r} has no "
                    "element-wise Spark form; explode + groupBy instead"
                )
            return forms[agg]

        return array_reduce
    if name == "randomString":
        # CH emits random BYTES; printable ASCII here (random either way)
        return (
            lambda a: f"concat_ws('', transform(sequence(1, {a[0]}), "
            f"i -> char(CAST(rand() * 95 + 32 AS INT))))"
        )
    if name in ("normalizeQuery", "normalizeQueryKeepNames"):
        # literals -> placeholders (CH query fingerprinting, simplified:
        # quoted strings then bare numbers)
        return (
            lambda a: "regexp_replace(regexp_replace("
            f"{a[0]}, '\\'[^\\']*\\'', '?'), "
            "'(?<![a-zA-Z_0-9])[0-9]+(\\\\.[0-9]+)?', '?')"
        )
    if name in ("exp2", "exp10"):
        base = "2" if name == "exp2" else "10"
        return lambda a, _b=base: f"pow({_b}, {a[0]})"
    if name == "sigmoid":
        return lambda a: f"(1.0D / (1.0D + exp(-(CAST({a[0]} AS DOUBLE)))))"
    if name == "trunc":
        # CH trunc = truncate (numeric, round toward zero). Spark's own
        # trunc(date, 'fmt') has a string-literal 2nd arg — that shape
        # passes through untouched so Spark-native SQL keeps working.
        def trunc_alias(a: Args) -> str:
            if len(a) == 2 and a[1].strip().startswith("'"):
                return f"trunc({', '.join(a)})"
            return _fmt("truncate")(a)

        return trunc_alias
    if name == "truncate":
        # round-toward-zero to n decimal places (n defaults to 0);
        # always Float64 like CH. Spark's own trunc() is date-only, so
        # the numeric spelling needs this expansion.
        def truncate_fmt(a: Args) -> str:
            x = f"CAST({a[0]} AS DOUBLE)"
            if len(a) < 2:
                return f"(sign({x}) * floor(abs({x})))"
            p = f"pow(10, {a[1]})"
            return f"(sign({x}) * floor(abs({x}) * {p}) / {p})"

        return truncate_fmt
    if name == "unbin":
        # bit string -> bytes, via base-2 -> base-16 (conv is 64-bit,
        # which covers the hex/bin round-trip idioms; longer bit strings
        # belong in binary columns, not literals). '' -> empty bytes
        # like CH, not NULL (conv would null it). CH returns String
        # (bytes-as-text), not a binary type — hence the outer cast.
        return lambda a: (
            f"CAST(IF({a[0]} = '', CAST('' AS BINARY), "
            f"unhex(conv({a[0]}, 2, 16))) AS STRING)"
        )
    if name == "bin":
        # CH pads to the argument TYPE's bit width; Spark's bin() is
        # minimal-width. Pad to the next byte boundary of the value —
        # identical for literals (CH picks the smallest type holding
        # the literal); a wide-typed COLUMN with small values prints
        # narrower here (PARITY.md)
        def bin_fmt(a: Args) -> str:
            b = f"bin(CAST({a[0]} AS BIGINT))"
            return (
                f"lpad({b}, CAST(ceil(length({b}) / 8.0) * 8 AS INT), "
                f"'0')"
            )

        return bin_fmt
    if name in ("positiveModulo", "positive_modulo", "pmod"):
        return lambda a: f"pmod({a[0]}, {a[1]})"
    if name == "isNotDistinctFrom":
        return lambda a: f"(({a[0]}) <=> ({a[1]}))"
    if name == "byteSwap":
        # CH widths follow the argument's integer type; a literal's type
        # is the smallest unsigned type that holds it, which is
        # computable here. Column arguments carry no type at translate
        # time — spell the width explicitly via the documented recipe.
        def byteswap_fmt(a: Args) -> str:
            arg = a[0].strip()
            if arg.lstrip("-").isdigit():
                v = int(arg)
                if v >= 0:
                    for bits in (8, 16, 32, 64):
                        if v < (1 << bits):
                            nb = bits // 8
                            out = int.from_bytes(
                                v.to_bytes(nb, "big"), "little"
                            )
                            return str(out)
            raise UntranslatableFunctionError(
                "byteSwap(col): the byte width is the column's integer "
                "type, unknown at translate time — spell it explicitly: "
                "conv(regexp_replace(lpad(hex(col), 8, '0'), "
                "'(..)(..)(..)(..)', '$4$3$2$1'), 16, 10) for UInt32 "
                "(lpad 16 / eight groups for UInt64)"
            )

        return byteswap_fmt
    if name in (
        "toStartOfFiveMinutes", "toStartOfTenMinutes", "toStartOfFifteenMinutes"
    ):
        secs = {"toStartOfFiveMinutes": 300, "toStartOfTenMinutes": 600,
                "toStartOfFifteenMinutes": 900}[name]
        return (
            lambda a, _s=secs:
            f"timestamp_seconds((unix_timestamp({a[0]}) DIV {_s}) * {_s})"
        )
    if name == "toTime":
        # CH maps the time-of-day onto the fixed date 1970-01-02
        return (
            lambda a: f"timestamp_seconds(86400 + "
            f"pmod(unix_timestamp({a[0]}), 86400))"
        )
    if name in ("timestampAdd", "timestampSub", "timeStampAdd", "timeStampSub"):
        op = "+" if name.lower().endswith("add") else "-"
        return lambda a, _op=op: f"({a[0]} {_op} {a[1]})"
    if name == "toDaysSinceYearZero":
        # proleptic year 0 is a leap year: 366 days before 0001-01-01
        return lambda a: f"(datediff({a[0]}, DATE '0001-01-01') + 366)"
    if name == "fromDaysSinceYearZero":
        return lambda a: f"date_add(DATE '0001-01-01', ({a[0]}) - 366)"
    if name == "toModifiedJulianDay":
        return lambda a: f"datediff(CAST({a[0]} AS DATE), DATE '1858-11-17')"
    if name == "fromModifiedJulianDay":
        return lambda a: f"date_add(DATE '1858-11-17', {a[0]})"
    if name == "toISOYear":
        return lambda a: f"extract(YEAROFWEEK FROM {a[0]})"
    if name == "toStartOfISOYear":
        # first day of the ISO year = Jan 4 of the ISO year moved back
        # to its Monday (ISO week 1 contains Jan 4) — wave 35
        def start_of_iso_year(a: Args) -> str:
            jan4 = (f"make_date(extract(YEAROFWEEK FROM {a[0]}), 1, 4)")
            return f"date_sub({jan4}, weekday({jan4}))"

        return start_of_iso_year
    if name in ("toWeek", "toYearWeek"):
        def week_fmt(a: Args, _yw=name == "toYearWeek") -> str:
            mode = a[1].strip() if len(a) > 1 else "0"
            if mode in ("1", "3"):
                wk = f"weekofyear({a[0]})"
                if _yw:
                    return (f"(extract(YEAROFWEEK FROM {a[0]}) * 100 + {wk})")
                return wk
            if mode != "0":
                raise UntranslatableFunctionError(
                    f"{'toYearWeek' if _yw else 'toWeek'} mode {mode}: only "
                    "modes 0 (Sunday weeks) and 1/3 (ISO) are implemented"
                )
            # mode 0 (MySQL WEEK(d,0)): weeks start Sunday; week 1 begins
            # at the year's first Sunday, earlier days are week 0
            jan1 = f"date_trunc('year', {a[0]})"
            first_sun = (
                f"date_add({jan1}, pmod(7 - (weekday({jan1}) + 1), 7))"
            )
            wk = (
                f"(CASE WHEN CAST({a[0]} AS DATE) < {first_sun} THEN 0 "
                f"ELSE datediff({a[0]}, {first_sun}) DIV 7 + 1 END)"
            )
            if _yw:
                raise UntranslatableFunctionError(
                    "toYearWeek mode 0: week-0 rows roll into the previous "
                    "year's numbering — use mode 3 (ISO) or compute "
                    "year(d)*100 + toWeek(d) explicitly if week 0 is "
                    "acceptable as-is"
                )
            return wk

        return week_fmt
    if name == "dateTrunc":
        return lambda a: f"date_trunc({a[0]}, {a[1]})"
    if name == "isZeroOrNull":
        return lambda a: f"(({a[0]}) = 0 OR ({a[0]}) IS NULL)"
    if name == "ifNotFinite":
        return (
            lambda a: f"(CASE WHEN isnan({a[0]}) OR "
            f"abs({a[0]}) = double('infinity') THEN ({a[1]}) "
            f"ELSE ({a[0]}) END)"
        )
    if name == "nanOrZero":
        return lambda a: "CAST('NaN' AS DOUBLE)"
    if name in ("sleep", "sleepEachRow", "ignore"):
        # CH returns 0 from all three; the side effect (a delay / forced
        # evaluation) has no meaning in a declarative distributed plan
        return lambda a: "0"
    if name in ("materialize", "identity"):
        return lambda a: f"({a[0]})"
    if name == "rowNumberInAllBlocks":
        # 0-based, order as arbitrary as CH's block order
        return lambda a: "(row_number() OVER (ORDER BY 1) - 1)"
    if name == "countDigits":
        return lambda a: f"length(CAST(abs({a[0]}) AS STRING))"
    if name == "initcapUTF8":
        return lambda a: f"initcap({a[0]})"
    if name == "arrayShuffle":
        return lambda a: f"shuffle({a[0]})"
    if name in ("arraySample", "arrayRandomSample"):
        return lambda a: f"slice(shuffle({a[0]}), 1, {a[1]})"
    if name == "arrayInsert":
        return (
            lambda a: f"concat(slice({a[0]}, 1, ({a[1]}) - 1), "
            f"array({a[2]}), slice({a[0]}, {a[1]}, "
            f"greatest(size({a[0]}) - ({a[1]}) + 1, 0)))"
        )
    if name == "arrayJaccardIndex":
        return (
            lambda a: f"(CAST(size(array_intersect({a[0]}, {a[1]})) AS DOUBLE)"
            f" / size(array_union({a[0]}, {a[1]})))"
        )
    if name in ("arrayDotProduct", "dotProduct", "scalarProduct"):
        return (
            lambda a: f"aggregate(zip_with({a[0]}, {a[1]}, "
            f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), "
            f"(acc, v) -> acc + v)"
        )
    if name in ("L1Distance", "L2Distance", "LinfDistance", "L2SquaredDistance"):
        def dist_fmt(a: Args, _n=name) -> str:
            diff = f"zip_with({a[0]}, {a[1]}, (x, y) -> CAST(x AS DOUBLE) - y)"
            if _n == "L1Distance":
                return (f"aggregate({diff}, CAST(0 AS DOUBLE), "
                        f"(acc, v) -> acc + abs(v))")
            if _n == "LinfDistance":
                return f"array_max(transform({diff}, v -> abs(v)))"
            sq = (f"aggregate({diff}, CAST(0 AS DOUBLE), "
                  f"(acc, v) -> acc + v * v)")
            return sq if _n == "L2SquaredDistance" else f"sqrt({sq})"

        return dist_fmt
    if name in ("LpDistance", "LpNorm"):
        # (sum |x|^p)^(1/p); p is the TRAILING argument in CH
        def lp_fmt(a: Args, _n=name) -> str:
            if _n == "LpDistance":
                if len(a) != 3:
                    raise UntranslatableFunctionError(
                        "LpDistance takes (a, b, p)"
                    )
                vec = f"zip_with({a[0]}, {a[1]}, (x, y) -> CAST(x AS DOUBLE) - y)"
                p = a[2]
            else:
                if len(a) != 2:
                    raise UntranslatableFunctionError("LpNorm takes (a, p)")
                vec, p = a[0], a[1]
            s = (f"aggregate({vec}, CAST(0 AS DOUBLE), "
                 f"(acc, v) -> acc + power(abs(CAST(v AS DOUBLE)), {p}))")
            return f"power({s}, CAST(1 AS DOUBLE) / ({p}))"

        return lp_fmt
    if name in ("L1Norm", "L2Norm", "LinfNorm", "L2SquaredNorm"):
        def norm_fmt(a: Args, _n=name) -> str:
            if _n == "L1Norm":
                return (f"aggregate({a[0]}, CAST(0 AS DOUBLE), "
                        f"(acc, v) -> acc + abs(v))")
            if _n == "LinfNorm":
                return f"array_max(transform({a[0]}, v -> abs(v)))"
            sq = (f"aggregate({a[0]}, CAST(0 AS DOUBLE), "
                  f"(acc, v) -> acc + CAST(v AS DOUBLE) * v)")
            return sq if _n == "L2SquaredNorm" else f"sqrt({sq})"

        return norm_fmt
    if name in ("L1Normalize", "L2Normalize", "LinfNormalize"):
        # unit-scale the vector by its norm (array form; CH doc
        # examples use tuples, same arithmetic). The norm expression
        # repeats inside the lambda — pure JVM, folded by codegen.
        def normalize_fmt(a: Args, _n=name) -> str:
            if _n == "L1Normalize":
                norm = (f"aggregate({a[0]}, CAST(0 AS DOUBLE), "
                        f"(acc, v) -> acc + abs(v))")
            elif _n == "LinfNormalize":
                norm = f"array_max(transform({a[0]}, v -> abs(v)))"
            else:
                norm = (f"sqrt(aggregate({a[0]}, CAST(0 AS DOUBLE), "
                        f"(acc, v) -> acc + CAST(v AS DOUBLE) * v))")
            return (
                f"transform({a[0]}, __cas_v -> "
                f"CAST(__cas_v AS DOUBLE) / {norm})"
            )

        return normalize_fmt
    if name == "cosineDistance":
        def cos_fmt(a: Args) -> str:
            dot = (f"aggregate(zip_with({a[0]}, {a[1]}, "
                   f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), "
                   f"(acc, v) -> acc + v)")
            n1 = (f"sqrt(aggregate({a[0]}, CAST(0 AS DOUBLE), "
                  f"(acc, v) -> acc + CAST(v AS DOUBLE) * v))")
            n2 = (f"sqrt(aggregate({a[1]}, CAST(0 AS DOUBLE), "
                  f"(acc, v) -> acc + CAST(v AS DOUBLE) * v))")
            return f"(1.0D - ({dot}) / (({n1}) * ({n2})))"

        return cos_fmt
    if name == "normalizeL2":
        return (
            lambda a: f"transform({a[0]}, x -> CAST(x AS DOUBLE) / "
            f"sqrt(aggregate({a[0]}, CAST(0 AS DOUBLE), "
            f"(acc, v) -> acc + CAST(v AS DOUBLE) * v)))"
        )
    # ---- wave 38 (round 11): discovery-sweep leak closures ---------------
    if name in ("sign", "sgn"):
        # CH sign/sgn return Int8 (-1/0/1); Spark's sign returns DOUBLE
        # — the bare pass-through rendered '-1.0' (wave-38 find)
        return lambda a: f"CAST(sign({a[0]}) AS TINYINT)"
    if name == "substringIndexUTF8":
        # Spark strings are codepoint-based == CH's UTF8 variant
        return lambda a: f"substring_index({', '.join(a)})"
    if name == "normalizeL1":
        return (
            lambda a: f"transform({a[0]}, x -> CAST(x AS DOUBLE) / "
            f"aggregate({a[0]}, CAST(0 AS DOUBLE), "
            f"(acc, v) -> acc + abs(CAST(v AS DOUBLE))))"
        )
    if name == "normalizeLinf":
        return (
            lambda a: f"transform({a[0]}, x -> CAST(x AS DOUBLE) / "
            f"array_max(transform({a[0]}, v -> abs(CAST(v AS DOUBLE)))))"
        )
    if name == "arrayROCAUC":
        # documented alias of arrayAUC
        return lambda a: (
            f"ch_array_auc(transform({a[0]}, x -> CAST(x AS DOUBLE)), "
            f"transform({a[1]}, x -> CAST(x AS DOUBLE)))"
        )
    if name == "YYYYMMDDToDate32":
        # same parse as YYYYMMDDToDate + Date32's saturation bounds
        return lambda a: (
            f"IF(to_date(CAST({a[0]} AS STRING), 'yyyyMMdd') IS NULL, "
            f"CAST(NULL AS DATE), "
            f"greatest(least(to_date(CAST({a[0]} AS STRING), 'yyyyMMdd'), "
            f"DATE '2299-12-31'), DATE '1900-01-01'))"
        )
    if name in ("changeYear", "changeMonth", "changeDay",
                "changeHour", "changeMinute", "changeSecond"):
        # recompose the timestamp with ONE component replaced; invalid
        # day-of-month SATURATES to the month's last day (CH clamps —
        # changeYear('2020-02-29', 2021) = 2021-02-28). Returns
        # TIMESTAMP even for Date input where CH's changeYear/Month/Day
        # preserve Date — the documented bridge-widening class (the
        # change{Hour,Minute,Second} forms return DateTime in CH too).
        def change_component(a: Args, _n=name) -> str:
            x, v = a[0], a[1]
            # the replaced component SATURATES into its valid range
            # (CH clamps out-of-range components rather than raising;
            # ANSI make_timestamp would error on e.g. changeDay(x, 0)
            # or changeMonth(x, 13) — a whole-job killer at scale)
            bounds = {
                "year": (1, 9999), "month": (1, 12), "day": (1, 31),
                "hour": (0, 23), "minute": (0, 59), "second": (0, 59),
            }
            parts = {}
            for c in ("year", "month", "day",
                      "hour", "minute", "second"):
                if _n == f"change{c.capitalize()}":
                    lo, hi = bounds[c]
                    parts[c] = (f"greatest(least(CAST(({v}) AS BIGINT),"
                                f" {hi}), {lo})")
                else:
                    parts[c] = f"{c}({x})"
            # clamp day to the target (year, month)'s length
            last = (f"day(last_day(make_date({parts['year']}, "
                    f"{parts['month']}, 1)))")
            parts["day"] = f"least({parts['day']}, {last})"
            return (
                f"make_timestamp({parts['year']}, {parts['month']}, "
                f"{parts['day']}, {parts['hour']}, {parts['minute']}, "
                f"{parts['second']})"
            )

        return change_component
    if name == "UUIDv7ToDateTime":
        # UUIDv7's first 48 bits are unix milliseconds
        return lambda a: (
            f"timestamp_millis(CAST(conv(substring(replace({a[0]}, '-', "
            f"''), 1, 12), 16, 10) AS BIGINT))"
        )
    if name == "bitPositionsToArray":
        # ascending positions of set bits, LSB = 0 (unsigned shift so
        # negative inputs read as the type's two's-complement bits;
        # test the bit with & 1 — Spark's % keeps the dividend sign, so
        # `% 2 = 1` misses bit 0 of negatives where the shifted value
        # is still negative)
        return lambda a: (
            f"filter(sequence(0, 63), _b -> "
            f"(shiftrightunsigned(CAST({a[0]} AS BIGINT), _b) & 1) = 1)"
        )
    if name in ("parseReadableSize", "parseReadableSizeOrNull",
                "parseReadableSizeOrZero"):
        # '1.5 KiB' -> bytes: decimal (KB = 1000^k) and binary
        # (KiB = 1024^k) units; ceil like CH (round-trips
        # formatReadableSize). Invalid input: error form raises via
        # ANSI cast NULL..., OrNull -> NULL, OrZero -> 0.
        def parse_readable(a: Args, _n=name) -> str:
            # try_cast: an unparseable prefix extracts '' and must
            # route to the per-variant fallback, not an ANSI cast error
            num = (f"try_cast(regexp_extract(trim({a[0]}), "
                   f"'^([0-9]+\\\\.?[0-9]*)', 1) AS DOUBLE)")
            unit = (f"lower(regexp_extract(trim({a[0]}), "
                    f"'([A-Za-z]+)\\\\s*$', 1))")
            pairs = [("b", 1)]
            for i, p in enumerate("kmgtpezyrq", start=1):
                pairs.append((f"{p}b", 1000 ** i))
                pairs.append((f"{p}ib", 1024 ** i))
            whens = " ".join(
                f"WHEN '{u}' THEN CAST({m} AS DOUBLE)" for u, m in pairs
            )
            mult = f"(CASE {unit} {whens} END)"
            val = f"CAST(ceil({num} * {mult}) AS BIGINT)"
            if _n.endswith("OrZero"):
                return f"coalesce({val}, CAST(0 AS BIGINT))"
            if _n.endswith("OrNull"):
                return val
            return (
                f"coalesce({val}, CAST(raise_error('parseReadableSize: "
                f"cannot parse ' || {a[0]}) AS BIGINT))"
            )

        return parse_readable
    # ---- wave 39 (round 12): residual-family fixes -----------------------
    if name in ("base64URLEncode", "base64UrlEncode"):
        # RFC 4648 §5: '+/' -> '-_', padding stripped (CH emits none)
        return lambda a: (
            f"replace(translate(base64(CAST({a[0]} AS BINARY)), "
            f"'+/', '-_'), '=', '')"
        )
    if name in ("base64URLDecode", "base64UrlDecode", "tryBase64URLDecode",
                "tryBase64UrlDecode"):
        # re-pad to a multiple of 4, reverse the URL alphabet, decode.
        # CH's error form raises on invalid input; unbase64 under ANSI
        # raises too, so the contract carries; try* wraps in try_cast
        def b64url_decode(a: Args, _try=name.startswith("try")) -> str:
            padded = (
                f"concat(translate({a[0]}, '-_', '+/'), "
                f"repeat('=', (4 - length({a[0]}) % 4) % 4))"
            )
            expr = f"CAST(unbase64({padded}) AS STRING)"
            if _try:
                # tryBase64URLDecode -> '' on undecodable input (CH)
                return (
                    f"coalesce(try_cast(unbase64(try_cast({padded} "
                    f"AS STRING)) AS STRING), '')"
                )
            return expr

        return b64url_decode
    if name == "stringJaccardIndexUTF8":
        return _fmt("stringJaccardIndex")
    if name == "toTimezone":  # lowercase-z alias of toTimeZone
        return _fmt("toTimeZone")
    if name == "overlayUTF8":  # Spark strings are UTF-8 code points
        return lambda a: f"overlay({', '.join(a)})"
    if name == "IPv4NumToStringClassC":
        # dotted quad with the host octet masked as 'xxx'
        def ipv4_class_c(a: Args) -> str:
            n = a[0]
            octs = [
                f"CAST((({n}) div {d}) % 256 AS STRING)"
                for d in (16777216, 65536, 256)
            ]
            return f"concat({octs[0]}, '.', {octs[1]}, '.', {octs[2]}, '.', 'xxx')"

        return ipv4_class_c
    if name in ("countSubstringsUTF8", "countSubstringsCaseInsensitiveUTF8"):
        # Spark strings count code points natively
        return _fmt(
            "countSubstringsCaseInsensitive"
            if "CaseInsensitive" in name else "countSubstrings"
        )
    if name in ("multiSearchFirstPositionCaseInsensitive",
                "multiSearchFirstPositionUTF8",
                "multiSearchFirstPositionCaseInsensitiveUTF8"):
        if "CaseInsensitive" in name:
            return lambda a: (
                f"coalesce(array_min(filter(transform({a[1]}, "
                f"_n -> locate(lower(_n), lower({a[0]}))), "
                f"_p -> _p > 0)), 0)"
            )
        return _fmt("multiSearchFirstPosition")
    if name == "icebergTruncate":
        # Iceberg truncate transform: ints floor to width multiples
        # (sign-correct via pmod), strings truncate to W chars. A
        # quoted literal gets the string form directly; otherwise the
        # type is unknowable from text, so the expression carries BOTH
        # branches and returns a STRING partition label (numeric-looking
        # strings in string columns take the numeric branch — the
        # documented carrier edge; partition labels, not quantities).
        def iceberg_truncate(a: Args) -> str:
            w, v = a[0], a[1]
            if v.lstrip().startswith("'"):
                return f"substring({v}, 1, CAST({w} AS INT))"
            return (
                f"coalesce(CAST(try_cast({v} AS BIGINT) - "
                f"pmod(try_cast({v} AS BIGINT), CAST({w} AS BIGINT)) "
                f"AS STRING), "
                f"substring(CAST({v} AS STRING), 1, CAST({w} AS INT)))"
            )

        return iceberg_truncate
    if name == "subtractInterval":
        return lambda a: f"({a[0]} - {a[1]})"
    if name in ("stringBytesUniq", "stringBytesEntropy"):
        # bytes of the UTF-8 encoding via hex pairs (hex() emits two
        # chars per byte) — the let-binding idiom keeps the hex string
        # computed once per element row, not per byte
        def string_bytes(a: Args, _ent=name.endswith("Entropy")) -> str:
            bytes_arr = (
                f"transform(sequence(1, octet_length({a[0]})), "
                f"_i -> substring(hex({a[0]}), 2 * _i - 1, 2))"
            )
            if not _ent:
                return (
                    f"CASE WHEN octet_length({a[0]}) = 0 THEN 0 ELSE "
                    f"size(array_distinct({bytes_arr})) END"
                )
            # Shannon entropy over byte frequencies, log base 2:
            # sum over distinct bytes of -(c/n) log2 (c/n)
            return (
                f"CASE WHEN octet_length({a[0]}) = 0 "
                f"THEN CAST(0.0 AS DOUBLE) ELSE "
                f"element_at(transform(array({a[0]}), _s -> "
                f"aggregate(array_distinct(transform(sequence(1, "
                f"octet_length(_s)), _i -> substring(hex(_s), "
                f"2 * _i - 1, 2))), CAST(0.0 AS DOUBLE), (_acc, _b) -> "
                f"_acc - (CAST(size(filter(transform(sequence(1, "
                f"octet_length(_s)), _j -> substring(hex(_s), 2 * _j - 1, "
                f"2)), _x -> _x = _b)) AS DOUBLE) / octet_length(_s)) "
                f"* log2(CAST(size(filter(transform(sequence(1, "
                f"octet_length(_s)), _j -> substring(hex(_s), 2 * _j - 1, "
                f"2)), _x -> _x = _b)) AS DOUBLE) / octet_length(_s)))), "
                f"1) END"
            )

        return string_bytes
    if name == "toStringCutToZero":
        # everything before the first zero byte (reinterpret family)
        return lambda a: f"substring_index({a[0]}, chr(0), 1)"
    if name == "basename":
        # everything after the last '/' or '\\' (CH semantics)
        return lambda a: f"regexp_extract({a[0]}, '[^/\\\\\\\\]*$', 0)"
    if name == "currentSchemas":
        # postgres-compat shim: the single current database
        return lambda a: "array(current_database())"
    if name == "FQDN":
        # same JVM-derived name as hostName(); the local engine IS its
        # server, and the JVM's getLocalHost already resolves the
        # canonical name where the resolver provides one
        return lambda a: (
            "substring_index(java_method('java.net.InetAddress', "
            "'getLocalHost'), '/', 1)"
        )
    if name == "httpPort":
        # the engine's HTTP endpoint (sources/http_transport) is the
        # 8123-compatible surface
        return lambda a: "CAST(8123 AS INT)"
    if name == "getServerPort":
        def server_port(a: Args) -> str:
            arg = a[0].strip().strip("'\"")
            if arg == "http_port":
                return "CAST(8123 AS INT)"
            raise UntranslatableFunctionError(
                f"getServerPort({a[0]}): only 'http_port' (8123) exists "
                "here — the native TCP endpoint is a permanent guided "
                "refusal (HTTP/8123 is the wire surface)"
            )

        return server_port
    if name == "tcpPort":
        raise UntranslatableFunctionError(
            "tcpPort(): no native TCP endpoint — the engine serves the "
            "CH-HTTP surface on 8123 (httpPort())"
        )
    if name == "toIPv4OrZero":
        # string-carrier convention (toIPv4/OrNull above): invalid ->
        # the IPv4 type default, rendered '0.0.0.0'
        def to_ipv4_or_zero(a: Args) -> str:
            valid = (
                f"({a[0]} RLIKE "
                f"'^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\\\.){{3}}"
                f"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$')"
            )
            return f"(CASE WHEN {valid} THEN {a[0]} ELSE '0.0.0.0' END)"

        return to_ipv4_or_zero
    if name == "MACNumToString":
        # six ':'-joined uppercase hex bytes, high byte first
        def mac_num_to_string(a: Args) -> str:
            octs = ", ".join(
                f"lpad(hex((CAST({a[0]} AS BIGINT) div "
                f"{1 << (8 * k)}) % 256), 2, '0')"
                for k in (5, 4, 3, 2, 1, 0)
            )
            return f"concat_ws(':', {octs})"

        return mac_num_to_string
    if name == "MACStringToNum":
        return lambda a: (
            f"CAST(conv(replace({a[0]}, ':', ''), 16, 10) AS BIGINT)"
        )
    if name == "MACStringToOUI":
        return lambda a: (
            f"CAST(conv(substring(replace({a[0]}, ':', ''), 1, 6), "
            f"16, 10) AS BIGINT)"
        )
    if name in ("randomFixedString", "randomPrintableASCII",
                "randomStringUTF8"):
        # random either way (randomString precedent): printable ASCII
        return (
            lambda a: f"concat_ws('', transform(sequence(1, {a[0]}), "
            f"i -> char(CAST(rand() * 95 + 32 AS INT))))"
        )
    if name == "mapFilter":
        return lambda a: f"map_filter({a[1]}, {a[0]})"  # CH puts f first
    if name == "mapContainsKeyLike":
        return lambda a: (
            f"exists(map_keys({a[0]}), _k -> _k LIKE {a[1]})"
        )
    if name == "mapExtractKeyLike":
        return lambda a: (
            f"map_filter({a[0]}, (_k, _v) -> _k LIKE {a[1]})"
        )
    if name == "mapConcat":
        return lambda a: f"map_concat({', '.join(a)})"
    if name == "mapAll":
        return lambda a: (
            f"(size(map_filter({a[1]}, ({_lambda_params(a[0])}) -> "
            f"NOT ({_lambda_body(a[0])}))) = 0)"
        )
    if name == "mapSort":
        # Spark maps are unordered in equality but entries keep build
        # order — rebuild from key-sorted entries (CH mapSort contract)
        return lambda a: (
            f"map_from_entries(array_sort(map_entries({a[0]}), "
            f"(_l, _r) -> CASE WHEN _l.key < _r.key THEN -1 "
            f"WHEN _l.key > _r.key THEN 1 ELSE 0 END))"
        )
    if name == "mapApply":
        # CH lambda returns a (k, v) pair; route through entries
        def map_apply(a: Args) -> str:
            params = _lambda_params(a[0])
            body = _lambda_body(a[0]).strip()
            if body.startswith("(") and body.endswith(")"):
                kv = _split_top_args(body[1:-1])
                if len(kv) == 2:
                    names = [p.strip() for p in params.split(",")]
                    subs = {names[0]: "_e.key", names[1]: "_e.value"}
                    k2, v2 = (
                        _subst_idents(kv[0], subs),
                        _subst_idents(kv[1], subs),
                    )
                    return (
                        f"map_from_entries(transform(map_entries({a[1]}), "
                        f"_e -> struct({k2} AS key, {v2} AS value)))"
                    )
            raise UntranslatableFunctionError(
                "mapApply: the lambda must return a (k, v) tuple literal; "
                "use transform_keys/transform_values for single-side maps"
            )

        return map_apply
    if name == "mapExists":
        return lambda a: f"(size(map_filter({a[1]}, {a[0]})) > 0)"
    if name == "mapUpdate":
        # m2 wins on key overlap (CH contract); plain map_concat raises
        # on duplicates under Spark's default dedup policy
        return (
            lambda a: f"map_concat(map_filter({a[0]}, "
            f"(k, v) -> NOT array_contains(map_keys({a[1]}), k)), {a[1]})"
        )
    if name == "mapPopulateSeries":
        return (
            lambda a: f"map_from_entries(transform("
            f"sequence(array_min(map_keys({a[0]})), "
            f"array_max(map_keys({a[0]}))), "
            f"k -> struct(k, coalesce(element_at({a[0]}, k), 0))))"
        )
    if name == "mortonEncode":
        # n-ary bit interleave (CH: bit i of argument j lands at
        # position i*n + j — mortonEncode(1, 2, 3) = 53), one JVM
        # aggregate over floor(64/n) bit positions
        def morton_fmt(a: Args) -> str:
            n = len(a)
            if n == 0 or n > 8:
                raise UntranslatableFunctionError(
                    "mortonEncode takes 1..8 integer arguments"
                )
            if n == 1:
                return f"CAST({a[0]} AS BIGINT)"
            bits = 64 // n
            terms = " + ".join(
                f"shiftleft(shiftright(CAST({arg} AS BIGINT), i) & 1, "
                f"{n} * i + {j})"
                for j, arg in enumerate(a)
            )
            return (
                f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
                f"(acc, i) -> acc + {terms})"
            )

        return morton_fmt
    if name == "mortonDecode":
        # inverse interleave: component j gathers bits i*n + j; n must
        # be a literal (CH requires a constant tuple size too)
        def morton_dec_fmt(a: Args) -> str:
            try:
                n = int(a[0].strip())
            except ValueError:
                raise UntranslatableFunctionError(
                    "mortonDecode: the tuple size must be an integer "
                    "literal"
                )
            if n < 1 or n > 8:
                raise UntranslatableFunctionError(
                    "mortonDecode: tuple size must be 1..8"
                )
            code = f"CAST({a[1]} AS BIGINT)"
            if n == 1:
                return f"struct({code})"
            bits = 64 // n
            comps = ", ".join(
                f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
                f"(acc, i) -> acc + shiftleft("
                f"shiftright({code}, {n} * i + {j}) & 1, i))"
                for j in range(n)
            )
            return f"struct({comps})"

        return morton_dec_fmt
    if name == "hilbertEncode":
        # 2-D Hilbert index via the lazily registered UDF (per-level
        # state machine; doc value hilbertEncode(3, 4) = 31); 1-arg
        # form is the identity, like CH
        def hilbert_fmt(a: Args) -> str:
            if len(a) == 1:
                return f"CAST({a[0]} AS BIGINT)"
            if len(a) != 2:
                raise UntranslatableFunctionError(
                    "hilbertEncode supports 1 or 2 arguments (CH's "
                    "hilbert curve is 2-D)"
                )
            return (
                f"ch_hilbert_encode2(CAST({a[0]} AS BIGINT), "
                f"CAST({a[1]} AS BIGINT))"
            )

        return hilbert_fmt
    if name == "hilbertDecode":
        def hilbert_dec_fmt(a: Args) -> str:
            try:
                n = int(a[0].strip())
            except ValueError:
                raise UntranslatableFunctionError(
                    "hilbertDecode: the tuple size must be an integer "
                    "literal"
                )
            code = f"CAST({a[1]} AS BIGINT)"
            if n == 1:
                return f"struct({code})"
            if n != 2:
                raise UntranslatableFunctionError(
                    "hilbertDecode supports tuple sizes 1 and 2"
                )
            e = f"ch_hilbert_decode2({code})"
            return (
                f"struct(element_at({e}, 1), element_at({e}, 2))"
            )

        return hilbert_dec_fmt
    if name == "geohashEncode":
        # (longitude, latitude[, precision]); precision 0/absent -> 12
        def geohash_enc_fmt(a: Args) -> str:
            prec = a[2] if len(a) > 2 else "0"
            return (
                f"ch_geohash_encode(CAST({a[0]} AS DOUBLE), "
                f"CAST({a[1]} AS DOUBLE), CAST({prec} AS INT))"
            )

        return geohash_enc_fmt
    if name == "geohashDecode":
        def geohash_dec_fmt(a: Args) -> str:
            e = f"ch_geohash_decode({a[0]})"
            return f"struct(element_at({e}, 1), element_at({e}, 2))"

        return geohash_dec_fmt
    if name == "jumpConsistentHash":
        return lambda a: (
            f"ch_jump_hash(CAST({a[0]} AS BIGINT), CAST({a[1]} AS INT))"
        )
    if name == "UUIDStringToNum":
        return lambda a: f"unhex(replace({a[0]}, '-', ''))"
    if name == "UUIDNumToString":
        def uuid_str(a: Args) -> str:
            h = f"lower(hex({a[0]}))"
            return (
                f"concat_ws('-', substr({h}, 1, 8), substr({h}, 9, 4), "
                f"substr({h}, 13, 4), substr({h}, 17, 4), substr({h}, 21, 12))"
            )

        return uuid_str
    if name == "netloc":
        return lambda a: f"parse_url({a[0]}, 'AUTHORITY')"
    if name in ("firstSignificantSubdomain", "cutToFirstSignificantSubdomain"):
        def fss_fmt(a: Args, _cut=name.startswith("cut")) -> str:
            parts = f"split(parse_url({a[0]}, 'HOST'), '\\\\.')"
            # CH's builtin short second-level list (com/net/org/co/...)
            second = f"element_at({parts}, -2)"
            cond = (
                f"(size({parts}) > 2 AND {second} IN "
                f"('com', 'net', 'org', 'co', 'gov', 'edu', 'mil', 'ac'))"
            )
            if _cut:
                return (
                    f"(CASE WHEN {cond} THEN concat_ws('.', "
                    f"element_at({parts}, -3), element_at({parts}, -2), "
                    f"element_at({parts}, -1)) "
                    f"ELSE concat_ws('.', element_at({parts}, -2), "
                    f"element_at({parts}, -1)) END)"
                )
            return (
                f"(CASE WHEN {cond} THEN element_at({parts}, -3) "
                f"ELSE element_at({parts}, -2) END)"
            )

        return fss_fmt
    if name == "toColumnTypeName":
        return _fmt("toTypeName")
    orm = re.match(
        r"^to(U?Int(?:8|16|32|64)|Float(?:32|64)|Date(?:Time)?|Date32|"
        r"Decimal(?:32|64|128))Or(Null|Zero|Default)$",
        name,
    )
    if orm:
        t, mode = orm.group(1), orm.group(2)
        target = {
            "Int8": "TINYINT", "Int16": "SMALLINT", "Int32": "INT",
            "Int64": "BIGINT", "UInt8": "SMALLINT", "UInt16": "INT",
            "UInt32": "BIGINT", "UInt64": "BIGINT", "Float32": "FLOAT",
            "Float64": "DOUBLE", "Date": "DATE", "Date32": "DATE",
            "DateTime": "TIMESTAMP",
        }.get(t)
        zero = {
            "DATE": "DATE '1970-01-01'",
            "TIMESTAMP": "TIMESTAMP '1970-01-01 00:00:00'",
        }

        def or_cast(a: Args, _t=t, _target=target, _mode=mode) -> str:
            if _t.startswith("Decimal"):
                prec = {"Decimal32": 9, "Decimal64": 18, "Decimal128": 38}[_t]
                scale = a[1].strip() if len(a) > 1 else "0"
                cast = f"try_cast({a[0]} AS DECIMAL({prec}, {scale}))"
                default_pos = 2
            else:
                cast = f"try_cast({a[0]} AS {_target})"
                if _t == "Date32":
                    # Date32 saturates at its range bounds (wave 35);
                    # IF-null guard because least/greatest skip NULLs
                    cast = (
                        f"IF({cast} IS NULL, CAST(NULL AS DATE), "
                        f"greatest(least({cast}, DATE '2299-12-31'), "
                        f"DATE '1900-01-01'))"
                    )
                default_pos = 1
            if _mode == "Null":
                return cast
            if _mode == "Zero":
                z = zero.get(_target, f"CAST(0 AS {_target})")
                if _t.startswith("Decimal"):
                    z = "0"
                return f"coalesce({cast}, {z})"
            return f"coalesce({cast}, ({a[default_pos]}))"

        return or_cast
    if name in ("toUUIDOrNull", "toUUIDOrZero"):
        uuid_re = "'^[0-9a-fA-F]{8}(-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12}$'"
        base = lambda a: f"(CASE WHEN {a[0]} RLIKE {uuid_re} THEN {a[0]} END)"  # noqa: E731
        if name.endswith("Null"):
            return base
        return lambda a: (
            f"coalesce({base(a)}, '00000000-0000-0000-0000-000000000000')"
        )
    if name in ("parseDateTimeBestEffortOrNull", "parseDateTime32BestEffortOrNull"):
        return lambda a: _best_effort_ts(a[0])
    if name in ("parseDateTimeBestEffortOrZero", "parseDateTime32BestEffortOrZero"):
        return (
            lambda a: f"coalesce({_best_effort_ts(a[0])}, "
            f"TIMESTAMP '1970-01-01 00:00:00')"
        )
    if name == "toString" :
        def to_string_fmt(a: Args) -> str:
            if len(a) == 2:  # toString(ts, tz): render the tz wall clock
                return (
                    f"date_format(from_utc_timestamp(to_utc_timestamp("
                    f"{a[0]}, current_timezone()), {a[1]}), "
                    f"'yyyy-MM-dd HH:mm:ss')"
                )
            return f"CAST({a[0]} AS STRING)"

        return to_string_fmt
    if name == "singleValueOrNull":
        return (
            lambda a: f"(CASE WHEN count(DISTINCT {a[0]}) = 1 "
            f"THEN any_value({a[0]}) END)"
        )
    if name == "groupConcat":
        return (
            lambda a: f"array_join(collect_list({a[0]}), "
            f"{a[1] if len(a) > 1 else repr('')})"
        )
    if name in ("toUnixTimestamp64Milli", "toUnixTimestamp64Micro",
                "toUnixTimestamp64Nano"):
        unit = name.removeprefix("toUnixTimestamp64")
        if unit == "Milli":
            return lambda a: f"unix_millis({a[0]})"
        if unit == "Micro":
            return lambda a: f"unix_micros({a[0]})"
        return lambda a: f"(unix_micros({a[0]}) * 1000)"
    if name in ("fromUnixTimestamp64Milli", "fromUnixTimestamp64Micro",
                "fromUnixTimestamp64Nano"):
        unit = name.removeprefix("fromUnixTimestamp64")
        if unit == "Milli":
            return lambda a: f"timestamp_millis({a[0]})"
        if unit == "Micro":
            return lambda a: f"timestamp_micros({a[0]})"
        return lambda a: f"timestamp_micros(({a[0]}) DIV 1000)"
    if name in ("snowflakeIDToDateTime", "snowflakeIDToDateTime64"):
        # the NEW converter pair (CH 24.6+): epoch parameter in ms since
        # 1970, DEFAULT 0 — unlike the legacy pair's baked-in Twitter
        # epoch below
        def snowflake_id_fmt(a: Args) -> str:
            if len(a) > 2:
                raise UntranslatableFunctionError(
                    f"{name}: the time_zone argument is display-only in "
                    "CH; drop it (Spark renders in the session zone) or "
                    "wrap with convert_timezone()"
                )
            epoch = a[1] if len(a) == 2 else "0"
            return f"timestamp_millis(shiftright({a[0]}, 22) + {epoch})"

        return snowflake_id_fmt
    if name == "timezoneOffset":
        # seconds east of UTC for the session zone at the given instant
        return (
            lambda a: f"(unix_timestamp(from_utc_timestamp({a[0]}, "
            f"current_timezone())) - unix_timestamp({a[0]}))"
        )
    if name == "generateUUIDv7":
        # RFC 9562 v7 layout: 48-bit unix ms, version nibble 7, 12
        # random bits, variant in 89ab, 62 random tail bits — built from
        # unix_millis + md5(rand()) hex; time-ordered like CH's
        return lambda a: (
            "concat(substring(_uuid7_hex, 1, 8), '-', "
            "substring(_uuid7_hex, 9, 4), '-7', "
            "substring(_uuid7_rand, 1, 3), '-', "
            "substring('89ab', pmod(ascii(substring(_uuid7_rand, 4, 1)), 4)"
            " + 1, 1), substring(_uuid7_rand, 5, 3), '-', "
            "substring(_uuid7_rand, 8, 12))"
            .replace(
                "_uuid7_hex",
                "lpad(lower(hex(unix_millis(current_timestamp()))), 12, '0')",
            )
            .replace("_uuid7_rand", "md5(cast(rand() AS STRING))")
        )
    if name in ("snowflakeToDateTime", "snowflakeToDateTime64"):
        # Twitter snowflake: ms since 2010-11-04T01:42:54.657Z in the
        # top 42 bits (the epoch CH documents)
        return (
            lambda a: f"timestamp_millis(shiftright({a[0]}, 22) "
            f"+ 1288834974657)"
        )
    if name == "generateSnowflakeID":
        # timestamp-ordered unique id with the real snowflake layout:
        # 41-bit millis since the Twitter epoch (the same epoch the
        # converters here use) | 10-bit "machine" = partition id |
        # 12-bit sequence = row-within-partition (the low bits of
        # monotonically_increasing_id — its partition bits live at
        # position 33 and MUST NOT be modded away, they'd collide).
        # Unique up to 4096 rows/partition/ms, the snowflake guarantee
        # class; like CH's, values are NON-deterministic across runs.
        return lambda a: (
            "(shiftleft(unix_millis(current_timestamp()) - 1288834974657,"
            " 22) + shiftleft(pmod(spark_partition_id(), 1024), 12)"
            " + pmod(monotonically_increasing_id(), 4096))"
        )
    if name in ("dateTimeToSnowflake", "dateTime64ToSnowflake"):
        return (
            lambda a: f"shiftleft(unix_millis({a[0]}) - 1288834974657, 22)"
        )
    if name.startswith("reinterpretAs"):
        def refuse_reinterpret(a: Args, _name: str = name) -> str:
            raise UntranslatableFunctionError(
                f"{_name}() reinterprets the CH wire byte layout, which "
                "parquet/Tungsten rows do not share; use explicit CAST / "
                "conv()/unhex() on the intended representation"
            )

        return refuse_reinterpret
    if name in _OPERATOR_BACKED or (
        name.endswith("If") and name[:-2] in _OPERATOR_BACKED
    ):
        _opb_base = name if name in _OPERATOR_BACKED else name[:-2]

        def refuse_op(a: Args, _name: str = name, _b: str = _opb_base) -> str:
            raise UntranslatableFunctionError(
                f"{_name}() needs a query-shape rewrite, not a function "
                f"rename; use the DataFrame API: {_OPERATOR_BACKED[_b]}"
                + ("" if _name == _b else " (plus a .filter() for the If)")
            )

        return refuse_op
    if name in ("trimBoth", "trimLeft", "trimRight"):
        # 2-arg CH trims take (string, chars); Spark's 2-arg
        # trim/ltrim/rtrim take (trimStr, string) — FLIPPED. The
        # explicit TRIM(BOTH/LEADING/TRAILING x FROM s) syntax is
        # unambiguous in both engines.
        mode = {"trimBoth": "BOTH", "trimLeft": "LEADING",
                "trimRight": "TRAILING"}[name]
        fallback = _SIMPLE_RENAMES[name]

        def trim_fmt(a: Args, _m=mode, _f=fallback) -> str:
            if len(a) == 1:
                return f"{_f}({a[0]})"
            return f"trim({_m} {a[1]} FROM {a[0]})"

        return trim_fmt
    if name in ("arrayLastIndex",):
        # last 1-based index where the lambda holds; 0 when none —
        # the mirror of arrayFirstIndex, via an indexed filter + max
        def ali_fmt(a: Args) -> str:
            lam, arr = a[0], a[1]
            if "->" not in lam:
                raise UntranslatableFunctionError(
                    "arrayLastIndex(lambda, array)"
                )
            var, _, body = lam.partition("->")
            var = var.strip().strip("()")
            return (
                f"coalesce(array_max(filter(transform({arr}, "
                f"({var}, __cas_i) -> IF(({body.strip()}), "
                f"__cas_i + 1, CAST(NULL AS INT))), "
                f"__cas_v -> __cas_v IS NOT NULL)), 0)"
            )

        return ali_fmt
    if name == "arrayIntersect":
        # CH is n-ary; Spark's array_intersect is binary — fold.
        # Single-array form returns the distinct elements (the
        # intersection of one set with itself).
        def arr_intersect_fmt(a: Args) -> str:
            if len(a) == 1:
                return f"array_distinct({a[0]})"
            out = a[0]
            for nxt in a[1:]:
                out = f"array_intersect({out}, {nxt})"
            return out

        return arr_intersect_fmt
    if name in ("arrayMin", "arrayMax"):
        # optional-lambda forms: arrayMin(f, arr) = min over f(x)
        fn = "array_min" if name == "arrayMin" else "array_max"

        def arr_minmax_fmt(a: Args, _fn=fn) -> str:
            if len(a) == 2:
                return f"{_fn}(transform({a[1]}, {a[0]}))"
            return f"{_fn}({a[0]})"

        return arr_minmax_fmt
    if name == "entropy":
        # Shannon entropy (log2) of the value distribution, as one
        # expression-level aggregate: sort the collected values, find
        # run starts, difference them into per-value counts, fold
        # H = -sum((c/n) * log2(c/n)). JVM-only, O(n log n) per group —
        # the same per-group memory class as groupArray (CH's entropy
        # also holds per-group state per distinct value). The algebraic
        # form log2(n) - sum(c*log2 c)/n avoids re-walking counts.
        def entropy_fmt(a: Args) -> str:
            if len(a) != 1:
                raise UntranslatableFunctionError(
                    "entropy(x): the single-argument form is "
                    "implemented (CH's multi-column form hashes the "
                    "tuple; pass a tuple() explicitly)"
                )
            # LET-bind the sorted array (and the run-start index list)
            # via transform(array(x), v -> body): Catalyst does NO
            # common-subexpression elimination inside lambda bodies, so
            # the original emission — element_at(<sort(collect)>, i)
            # inside filter's lambda — re-sorted the whole group PER
            # ELEMENT: O(n^2 log n), a 40-minute hang on sf0.1's 30k-row
            # groups (round-11 find). Bound once, the fold is the
            # documented O(n log n).
            s = _guard_fold(
                f"array_sort(collect_list({a[0]}))", "entropy"
            )
            v = "__cas_s"
            starts = (
                f"filter(sequence(1, size({v})), __cas_i -> "
                f"__cas_i = 1 OR element_at({v}, __cas_i) != "
                f"element_at({v}, __cas_i - 1))"
            )
            st = "__cas_st"
            counts = (
                f"zip_with({st}, concat(slice({st}, 2, "
                f"size({st})), array(size({v}) + 1)), "
                f"(__cas_a, __cas_b) -> CAST(__cas_b - __cas_a "
                f"AS DOUBLE))"
            )
            n = f"CAST(size({v}) AS DOUBLE)"
            body = (
                f"CASE WHEN size({v}) > 0 THEN "
                f"log2({n}) - element_at(transform(array({starts}), "
                f"{st} -> aggregate({counts}, CAST(0 AS DOUBLE), "
                f"(__cas_acc, __cas_c) -> __cas_acc "
                f"+ __cas_c * log2(__cas_c))), 1) / {n} END"
            )
            return f"element_at(transform(array({s}), {v} -> {body}), 1)"

        return entropy_fmt
    if name == "intervalLengthSum":
        # total length of the UNION of [start, end) segments per group
        # (CH aggregate-functions/reference/intervalLengthSum): sort
        # the collected segments, sweep left-to-right carrying the
        # current covered frontier, add only uncovered span. Same
        # per-group memory class as groupArray; zero/negative-length
        # segments contribute 0. Empty group -> 0 like CH.
        def ils_fmt(a: Args) -> str:
            if len(a) != 2:
                raise UntranslatableFunctionError(
                    "intervalLengthSum(start, end) takes two numeric "
                    "arguments (timestamps: toUnixTimestamp first)"
                )
            segs = _guard_fold(
                f"array_sort(collect_list(struct("
                f"CAST({a[0]} AS DOUBLE) AS s, "
                f"CAST({a[1]} AS DOUBLE) AS e)))",
                "intervalLengthSum",
            )
            return (
                f"aggregate({segs}, "
                f"named_struct('tot', CAST(0 AS DOUBLE), "
                f"'cur', CAST(NULL AS DOUBLE)), "
                f"(__cas_acc, __cas_x) -> named_struct("
                f"'tot', __cas_acc.tot + CASE "
                f"WHEN __cas_x.e <= __cas_x.s THEN CAST(0 AS DOUBLE) "
                f"WHEN __cas_acc.cur IS NULL OR __cas_x.s >= "
                f"__cas_acc.cur THEN __cas_x.e - __cas_x.s "
                f"ELSE greatest(__cas_x.e - __cas_acc.cur, "
                f"CAST(0 AS DOUBLE)) END, "
                f"'cur', CASE "
                f"WHEN __cas_x.e <= __cas_x.s THEN __cas_acc.cur "
                f"WHEN __cas_acc.cur IS NULL THEN __cas_x.e "
                f"ELSE greatest(__cas_acc.cur, __cas_x.e) END), "
                f"__cas_acc -> __cas_acc.tot)"
            )

        return ils_fmt
    if name in ("studentTTest", "welchTTest"):
        # expression-level aggregate rewrite (wave 26 follow-up):
        # conditional moments per index side, t and df in closed form,
        # EXACT two-sided p via the regularized-incomplete-beta UDF
        # (ch_t_sf) — the CDF ClickHouse evaluates, not the
        # large-sample normal approximation. Catalyst dedups the
        # repeated conditional aggregates.
        def ttest_fmt(a: Args, _welch=(name == "welchTTest"),
                      _name=name) -> str:
            if len(a) != 2:
                raise UntranslatableFunctionError(
                    f"{_name}(sample_data, sample_index); the "
                    "confidence-interval parametric form is the "
                    "DataFrame operator operators.stats.ttest"
                )
            v = f"CAST({a[0]} AS DOUBLE)"
            g = a[1]
            n0 = f"CAST(count(CASE WHEN ({g}) = 0 THEN 1 END) AS DOUBLE)"
            n1 = f"CAST(count(CASE WHEN ({g}) <> 0 THEN 1 END) AS DOUBLE)"
            m0 = f"avg(CASE WHEN ({g}) = 0 THEN {v} END)"
            m1 = f"avg(CASE WHEN ({g}) <> 0 THEN {v} END)"
            v0 = f"var_samp(CASE WHEN ({g}) = 0 THEN {v} END)"
            v1 = f"var_samp(CASE WHEN ({g}) <> 0 THEN {v} END)"
            if _welch:
                se = f"({v0} / {n0} + {v1} / {n1})"
                t = f"(({m0} - {m1}) / sqrt({se}))"
                dof = (
                    f"({se} * {se} / "
                    f"(({v0} / {n0}) * ({v0} / {n0}) / ({n0} - 1) + "
                    f"({v1} / {n1}) * ({v1} / {n1}) / ({n1} - 1)))"
                )
            else:
                dof = f"({n0} + {n1} - 2)"
                sp = (
                    f"((({n0} - 1) * {v0} + ({n1} - 1) * {v1}) / {dof})"
                )
                t = (
                    f"(({m0} - {m1}) / "
                    f"sqrt({sp} * (1.0 / {n0} + 1.0 / {n1})))"
                )
            return (
                f"named_struct('t_statistic', {t}, "
                f"'p_value', ch_t_sf({t}, {dof}))"
            )

        return ttest_fmt
    if name in ("jaroSimilarity", "jaroWinklerSimilarity",
                "damerauLevenshteinDistance"):
        # lazily-registered UDFs delegating to the same
        # functions/text_distance kernels as the DataFrame API
        udf = {
            "jaroSimilarity": "ch_jaro",
            "jaroWinklerSimilarity": "ch_jaro_winkler",
            "damerauLevenshteinDistance": "ch_damerau_lev",
        }[name]
        return lambda a, _u=udf: f"{_u}({a[0]}, {a[1]})"
    if name == "arrayAUC":
        # Mann-Whitney AUC with average tie ranks — a lazily-registered
        # Arrow-batched UDF (works on array literals AND columns; the
        # DataFrame-level operators.stats.auc remains the table form)
        return lambda a: (
            f"ch_array_auc(transform({a[0]}, x -> CAST(x AS DOUBLE)), "
            f"transform({a[1]}, x -> CAST(x AS DOUBLE)))"
        )
    if name in ("divideDecimal", "multiplyDecimal"):
        # CH: exact decimal math with an EXPLICIT result scale (3rd
        # arg); without it the result scale is type-derived, unknown
        # textually — guided refusal naming the 3-arg form
        op = "/" if name == "divideDecimal" else "*"

        def dec_fmt(a: Args, _op=op, _name=name) -> str:
            if len(a) < 3 or not a[2].strip().isdigit():
                raise UntranslatableFunctionError(
                    f"{_name}(a, b) without an explicit result scale: "
                    "the scale is derived from the CH decimal types, "
                    "unknown textually — pass it: "
                    f"{_name}(a, b, <scale>)"
                )
            s = int(a[2])
            return (
                f"CAST(CAST({a[0]} AS DECIMAL(38, {min(s + 6, 37)})) "
                f"{_op} ({a[1]}) AS DECIMAL(38, {s}))"
            )

        return dec_fmt
    if name in _SIMPLE_RENAMES and name not in ("splitByChar", "JSONExtractString", "notEmpty"):
        new = _SIMPLE_RENAMES[name]
        return lambda a: f"{new}({', '.join(a)})"
    return None


#: parametric aggregates: name(params)(args) -> formatter(params, args)
def _best_effort_ts(x: str) -> str:
    """ClickHouse parseDateTimeBestEffort's format chain as one
    coalesce of try_to_timestamp attempts (NULL when nothing fits):
    ISO via the native cast, slashed dates, day-first and month-first
    human forms, RFC-1123, and 9-10 digit strings as unix seconds —
    the formats CH's best-effort parser documents."""
    tries = ", ".join(
        [f"try_to_timestamp({x})"]
        + [
            f"try_to_timestamp({x}, '{fmt}')"
            for fmt in (
                "yyyy/MM/dd HH:mm:ss",
                "yyyy/MM/dd",
                "dd MMM yyyy HH:mm:ss",
                "dd MMM yyyy",
                "MMM dd yyyy HH:mm:ss",
                "MMM dd yyyy",
                "dd/MM/yyyy HH:mm:ss",
                "dd/MM/yyyy",
                "yyyyMMddHHmmss",
            )
        ]
        + [
            # RFC-1123: Spark >= 3 refuses day-of-week in PARSE
            # patterns, so strip the weekday prefix instead
            f"try_to_timestamp(regexp_replace({x}, "
            f"'^[A-Za-z]{{3}},\\\\s*', ''), 'dd MMM yyyy HH:mm:ss')",
        ]
        + [
            f"IF({x} RLIKE '^[0-9]{{9,10}}$', "
            f"timestamp_seconds(CAST({x} AS BIGINT)), NULL)"
        ]
    )
    return f"coalesce({tries})"


def _sequence_match_fmt(count_mode: bool) -> Callable[[Args, Args], str]:
    """`sequenceMatch('(?1).*(?2)')(ts, cond1, ...)` /
    `sequenceCount(...)` as REAL SQL aggregates (round 10): the
    time-free pattern collapses each event to one symbol character and
    the whole aggregate is one guarded collect + ordered array_join +
    RLIKE/regexp_count — the exact expression
    operators/funnel._symbol_strings builds, emitted inline so the CH
    spelling works in any query. Patterns with `(?t...)` constraints
    have no symbol-string form and keep the operator recipe (the
    backtracking matcher needs per-event timestamps). Caveat shared
    with the operator's fast path: an event matching SEVERAL
    conditions gets the FIRST condition's symbol — overlapping
    condition sets need operators/funnel.sequence_match(engine=
    'pandas')."""

    def fmt(p: Args, a: Args) -> str:
        from clickhouse_arrow_spark.operators.funnel import (
            _ALPHABET_START,
            ch_sequence_pattern_to_regex,
            parse_sequence_pattern,
        )

        fn = "sequenceCount" if count_mode else "sequenceMatch"
        if len(p) != 1 or not (
            p[0].strip().startswith("'") and p[0].strip().endswith("'")
        ):
            raise UntranslatableFunctionError(
                f"{fn}('pattern')(ts, cond1, ...): the pattern must be "
                "one string literal"
            )
        if len(a) < 2:
            raise UntranslatableFunctionError(
                f"{fn}: needs a timestamp and at least one condition"
            )
        pattern = p[0].strip()[1:-1].replace("''", "'")
        n = len(a) - 1
        if "(?t" in pattern.replace(" ", ""):
            raise UntranslatableFunctionError(
                f"{fn}: time-constrained patterns ((?t...)) need the "
                "per-event timestamps — use operators.funnel."
                f"{'sequence_count' if count_mode else 'sequence_match'}"
                "(df, user, ts, pattern, conds) (the Arrow-batched "
                "backtracking matcher)"
            )
        try:
            parse_sequence_pattern(pattern, n)
            regex = ch_sequence_pattern_to_regex(pattern, n)
        except ValueError as e:
            raise UntranslatableFunctionError(f"{fn}: {e}") from None
        ts, conds = a[0], a[1:]
        t = f"CAST(CAST(({ts}) AS TIMESTAMP) AS DOUBLE)"
        sym = "CASE " + " ".join(
            f"WHEN CAST(({c}) AS BOOLEAN) "
            f"THEN '{chr(_ALPHABET_START + i)}'"
            for i, c in enumerate(conds)
        ) + " END"
        arr = _guard_fold(
            f"array_sort(filter(collect_list(named_struct("
            f"'t', {t}, 's', {sym})), "
            f"_x -> _x.s IS NOT NULL AND _x.t IS NOT NULL))",
            fn,
        )
        s = f"array_join(transform({arr}, _x -> _x.s), '')"
        sql_re = regex.replace("'", "''")
        if count_mode:
            return f"CAST(regexp_count({s}, '{sql_re}') AS INT)"
        return f"CAST(({s} RLIKE '{sql_re}') AS INT)"

    return fmt


_SPARKBAR_GLYPHS_SQL = "▁▂▃▄▅▆▇█"


def _sparkbar_fmt(p: Args, a: Args) -> str:
    """`sparkbar(width[, min_x, max_x])(x, y)` as a REAL SQL aggregate
    (round 10): one guarded collect + per-slot array folds + the glyph
    ramp — the same bucket/scale/glyph arithmetic
    operators/timeseries.sparkbar computes with two keyed exchanges,
    emitted inline as ONE aggregate expression (O(width · n) slot
    filters per group; width is a literal, capped at 256). Empty
    slots render a space; an empty group renders ''."""
    if len(p) not in (1, 3):
        raise UntranslatableFunctionError(
            "sparkbar(width[, min_x, max_x])(x, y): one or three "
            "parameters"
        )
    if not re.fullmatch(r"\d+", p[0].strip()):
        raise UntranslatableFunctionError(
            "sparkbar: width must be an integer literal"
        )
    width = int(p[0].strip())
    if not 1 <= width <= 256:
        raise UntranslatableFunctionError(
            f"sparkbar width {width}: 1..256 supported (each slot is "
            "one array fold per group)"
        )
    if len(a) != 2:
        raise UntranslatableFunctionError(
            "sparkbar(width)(x, y) takes two arguments"
        )
    x, y = a
    arr = _guard_fold(
        f"filter(collect_list(named_struct('x', CAST(({x}) AS DOUBLE), "
        f"'y', CAST(({y}) AS DOUBLE))), "
        f"_p -> _p.x IS NOT NULL AND _p.y IS NOT NULL)",
        "sparkbar",
    )
    if len(p) == 3:
        lo = f"CAST(({p[1].strip()}) AS DOUBLE)"
        hi = f"CAST(({p[2].strip()}) AS DOUBLE)"
    else:
        lo = "array_min(transform(_sb_a, _p -> _p.x))"
        hi = "array_max(transform(_sb_a, _p -> _p.x))"
    slot = (
        f"IF(_sb_b.hi > _sb_b.lo, least({width - 1}, "
        f"CAST(floor((_p.x - _sb_b.lo) / "
        f"((_sb_b.hi - _sb_b.lo) / {width})) AS INT)), 0)"
    )
    inr = (
        "filter(_sb_a, _p -> _p.x >= _sb_b.lo AND _p.x <= _sb_b.hi)"
    )
    slots = (
        f"transform(sequence(0, {width - 1}), _i -> named_struct("
        f"'v', aggregate(filter({inr}, _p -> {slot} = _i), "
        f"CAST(0 AS DOUBLE), (_ac, _p) -> _ac + _p.y), "
        f"'n', size(filter({inr}, _p -> {slot} = _i))))"
    )
    mx = (
        "array_max(transform(_sb_s, _t -> "
        "IF(_t.n > 0, _t.v, CAST(NULL AS DOUBLE))))"
    )
    glyph = (
        f"array_join(transform(_sb_s, _t -> IF(_t.n = 0, ' ', "
        f"substring('{_SPARKBAR_GLYPHS_SQL}', greatest(1, least(8, "
        f"CAST(floor(_t.v * 8.0 / _sb_m) AS INT) + 1)), 1))), '')"
    )
    rendered = (
        f"element_at(transform(array({slots}), _sb_s -> "
        f"element_at(transform(array({mx}), _sb_m -> {glyph}), 1)), 1)"
    )
    return (
        f"element_at(transform(array({arr}), _sb_a -> "
        f"IF(size(_sb_a) = 0, '', "
        f"element_at(transform(array(named_struct('lo', {lo}, "
        f"'hi', {hi})), _sb_b -> {rendered}), 1))), 1)"
    )


def _window_funnel_fmt(p: Args, a: Args) -> str:
    """`windowFunnel(window[, 'mode'...])(timestamp, cond1, ...)` as a
    REAL SQL aggregate (round 10 — graduates the operator-naming
    refusal now that the CH-exact per-level algorithm is pinned): the
    emitted expression is the same fold operators/funnel.window_funnel
    runs — one entry per MATCHING condition, (t, step) tie-sorted
    timeline, per-level chain-start state with cond-1 re-anchoring,
    strict_order/strict_dedup/strict_increase per
    AggregateFunctionWindowFunnel.h, last-level early return. One
    guarded collect per group riding the groupBy exchange (point-
    statistic contract applies)."""
    if len(a) < 2:
        raise UntranslatableFunctionError(
            "windowFunnel(window[, 'mode'...])(timestamp, cond1, ...) "
            "needs a timestamp and at least one condition"
        )
    window = p[0].strip()
    if not re.fullmatch(r"\d+", window):
        raise UntranslatableFunctionError(
            "windowFunnel: the window must be an integer-literal "
            "number of time units (seconds for DateTime inputs)"
        )
    modes = []
    for m in p[1:]:
        mv = m.strip().strip("'").lower()
        if mv not in ("strict_order", "strict_dedup", "strict_increase",
                      "strict_deduplication"):
            raise UntranslatableFunctionError(
                f"windowFunnel mode {m.strip()}: ClickHouse accepts "
                "'strict_order', 'strict_dedup', 'strict_increase'"
            )
        modes.append("strict_dedup" if mv == "strict_deduplication"
                     else mv)
    strict_order = "strict_order" in modes
    strict_dedup = "strict_dedup" in modes
    strict_increase = "strict_increase" in modes
    ts, conds = a[0], a[1:]
    n = len(conds)
    t = f"CAST(CAST(({ts}) AS TIMESTAMP) AS DOUBLE)"
    entries = ", ".join(
        f"IF(CAST(({c}) AS BOOLEAN), "
        f"named_struct('t', {t}, 's', {i + 1}), NULL)"
        for i, c in enumerate(conds)
    )
    row_arr = f"filter(array({entries}), _x -> _x IS NOT NULL)"
    if strict_order:
        # rows matching NO condition enter as step 0: scan
        # terminators. The trailing t-NULL filter drops rows whose
        # timestamp is NULL — including rows the -If combinator
        # excluded (its CASE nulls every argument): an If-filtered row
        # must not become a step-0 breaker.
        row_arr = (
            f"filter(IF(size({row_arr}) > 0, {row_arr}, "
            f"array(named_struct('t', {t}, 's', 0))), "
            f"_x -> _x.t IS NOT NULL)"
        )
    tl = _guard_fold(
        f"array_sort(flatten(collect_list({row_arr})))", "windowFunnel"
    )
    nulls = f"array_repeat(CAST(NULL AS DOUBLE), {n})"
    init = (
        f"named_struct('f', {nulls}, 'l', {nulls}, "
        f"'st', 0, 'br', false, 'sn', false)"
    )

    def setat(arr: str, idx: str, val: str) -> str:
        return (
            f"transform({arr}, (_x, _i) -> "
            f"IF(_i = ({idx}) - 1, {val}, _x))"
        )

    anchored = (
        f"named_struct('f', {setat('_ac.f', '1', '_e.t')}, "
        f"'l', {setat('_ac.l', '1', '_e.t')}, "
        f"'st', 0, 'br', false, 'sn', true)"
    )
    extended = (
        f"named_struct("
        f"'f', {setat('_ac.f', '_e.s', 'element_at(_ac.f, _e.s - 1)')}, "
        f"'l', {setat('_ac.l', '_e.s', '_e.t')}, "
        f"'st', 0, 'br', false, 'sn', _ac.sn)"
    )
    inc = (
        " AND element_at(_ac.l, _e.s - 1) < _e.t" if strict_increase
        else ""
    )
    branches = [
        f"WHEN _ac.st > 0 OR _ac.br OR "
        f"element_at(_ac.f, {n}) IS NOT NULL THEN _ac"
    ]
    if strict_order:
        branches.append(
            "WHEN _e.s = 0 AND _ac.sn THEN named_struct('f', _ac.f, "
            "'l', _ac.l, 'st', 0, 'br', true, 'sn', _ac.sn)"
        )
        branches.append("WHEN _e.s = 0 THEN _ac")
    branches.append(f"WHEN _e.s = 1 THEN {anchored}")
    if strict_dedup:
        branches.append(
            "WHEN element_at(_ac.f, _e.s) IS NOT NULL THEN "
            "named_struct('f', _ac.f, 'l', _ac.l, 'st', _e.s, "
            "'br', false, 'sn', _ac.sn)"
        )
    branches.append(
        f"WHEN element_at(_ac.f, _e.s - 1) IS NOT NULL "
        f"AND _e.t <= element_at(_ac.f, _e.s - 1) + {window}{inc} "
        f"THEN {extended}"
    )
    step = f"CASE {' '.join(branches)} ELSE _ac END"
    fold = f"aggregate({tl}, {init}, (_ac, _e) -> {step})"
    max_level = (
        f"array_max(transform(_fs.f, (_x, _i) -> "
        f"IF(_x IS NOT NULL, _i + 1, 0)))"
    )
    # bind the fold once via a 1-element transform (the LTTB trick)
    return (
        f"element_at(transform(array({fold}), _fs -> CAST("
        f"CASE WHEN _fs.st > 0 THEN _fs.st "
        f"ELSE coalesce({max_level}, 0) END AS INT)), 1)"
    )


def _resample_fmt(base: str) -> Callable[[Args, Args], str]:
    """The -Resample combinator (wave 33): `fResample(start, end,
    step)(args..., key)` splits the group's rows into key-range buckets
    [start + i*step, min(start + (i+1)*step, end)) and returns the
    ARRAY of per-bucket aggregates. Emitted as one expression: collect
    the (value, key) pairs once, then transform over the bucket lower
    bounds with an array fold per bucket — no extra shuffle, the same
    single-exchange plan as the plain aggregate. count/sum/avg fold in
    DOUBLE (document: CH keeps integer sums integer); empty buckets are
    0 for count/sum, NULL for min/max/avg (CH: 0 / type default / nan)."""

    def fmt(p: Args, a: Args) -> str:
        if len(p) != 3:
            raise UntranslatableFunctionError(
                f"{base}Resample(start, end, step)(...) takes exactly "
                "three parameters"
            )
        try:
            start, end, step = (int(x.strip()) for x in p)
        except ValueError:
            raise UntranslatableFunctionError(
                f"{base}Resample: start/end/step must be integer "
                "literals"
            ) from None
        if step <= 0 or end <= start:
            raise UntranslatableFunctionError(
                f"{base}Resample: needs step > 0 and end > start"
            )
        if base == "count":
            if len(a) != 1:
                raise UntranslatableFunctionError(
                    "countResample(start, end, step)(key) takes the "
                    "resampling key only"
                )
            x, k = "1", a[0]
        else:
            if len(a) != 2:
                raise UntranslatableFunctionError(
                    f"{base}Resample(start, end, step)(x, key) takes "
                    "the value and the resampling key"
                )
            x, k = a
        # NULL keys can never land in a bucket; NULL values would
        # poison the bucket folds — skip both (CH skips NULL args)
        arr = _guard_fold(
            f"filter(collect_list(named_struct('v', CAST(({x}) AS "
            f"DOUBLE), 'k', CAST(({k}) AS DOUBLE))), "
            f"_n -> _n.v IS NOT NULL AND _n.k IS NOT NULL)",
            f"{base}Resample",
        )
        flt = (
            f"filter(_r, _s -> _s.k >= _lo AND _s.k < "
            f"least(_lo + {step}, {end}))"
        )
        inner = {
            "count": f"CAST(size({flt}) AS BIGINT)",
            "sum": (
                f"aggregate({flt}, CAST(0 AS DOUBLE), "
                f"(_ac, _s) -> _ac + _s.v)"
            ),
            "min": f"array_min(transform({flt}, _s -> _s.v))",
            "max": f"array_max(transform({flt}, _s -> _s.v))",
            "avg": (
                f"aggregate({flt}, CAST(0 AS DOUBLE), "
                f"(_ac, _s) -> _ac + _s.v) / size({flt})"
            ),
        }[base]
        return (
            f"element_at(transform(array({arr}), _r -> "
            f"transform(sequence({start}, {end - 1}, {step}), "
            f"_lo -> {inner})), 1)"
        )

    return fmt


def _sum_map_filtered_fmt(p: Args, a: Args) -> str:
    """sumMapFiltered(keys)(key_arr, value_arr): keep only the listed
    keys, then the ordinary 2-arg sumMap fold (tandem index filter so
    keys and values stay aligned; empty rows safe via the guarded
    sequence)."""
    if len(p) != 1 or len(a) != 2:
        raise UntranslatableFunctionError(
            "sumMapFiltered(keys_array)(key_arr, value_arr) takes one "
            "parameter and two arguments"
        )
    idx = (
        f"filter({_safe_seq1(f'size({a[0]})')}, _i -> "
        f"array_contains({p[0]}, element_at({a[0]}, _i)))"
    )
    k2 = f"transform({idx}, _i -> element_at({a[0]}, _i))"
    v2 = f"transform({idx}, _i -> element_at({a[1]}, _i))"
    return _fmt("sumMap")([k2, v2])


def _lttb_fmt(p: Args, a: Args) -> str:
    """largestTriangleThreeBuckets(n)(x, y) — Steinarsson 2013
    downsampling (the CH aggregate sorts by x and returns n points as
    (x, y) tuples): first and last points always kept; the middle
    points split into n-2 equal buckets, and each bucket contributes
    the point maximizing the triangle area with the PREVIOUSLY
    selected point and the next bucket's centroid. One collect + one
    sequential fold over buckets (each step an argmax fold over its
    bucket slice) — per-group state is the group's points, the same
    bill the CH aggregate pays."""
    if len(p) != 1 or len(a) != 2:
        raise UntranslatableFunctionError(
            "largestTriangleThreeBuckets(n)(x, y) takes one parameter "
            "and two arguments"
        )
    try:
        n = int(p[0].strip())
    except ValueError:
        raise UntranslatableFunctionError(
            "largestTriangleThreeBuckets: n must be an integer literal"
        ) from None
    if n < 0:
        raise UntranslatableFunctionError(
            "largestTriangleThreeBuckets: n must be >= 0 (0 keeps all "
            "points, the CH disposition)"
        )
    # CH aggregates skip rows with NULL arguments; a condition-nulled
    # row from the -If fold arrives as a struct of NULL fields — filter
    # both out before sorting (NULLs would sort first and corrupt the
    # endpoint selection)
    arr = _guard_fold(
        f"array_sort(filter(collect_list(named_struct("
        f"'x', CAST(({a[0]}) AS DOUBLE), 'y', CAST(({a[1]}) AS DOUBLE))), "
        f"_n -> _n.x IS NOT NULL AND _n.y IS NOT NULL))",
        "largestTriangleThreeBuckets",
    )
    if n == 0:
        return arr  # CH: n = 0 -> no downsampling
    if n == 1:
        return f"slice({arr}, 1, 1)"
    if n == 2:
        return (
            f"element_at(transform(array({arr}), _r -> CASE "
            f"WHEN size(_r) <= 2 THEN _r "
            f"ELSE array(element_at(_r, 1), element_at(_r, size(_r))) "
            f"END), 1)"
        )
    # 1-based translation of the reference pseudocode: every =
    # (L-2)/(n-2); bucket i (0-based) spans [floor(i*every)+2,
    # floor((i+1)*every)+1]; its "next" average range is the following
    # bucket clamped to L (so the final bucket averages the last point)
    every = f"(CAST(size(_r) - 2 AS DOUBLE) / {n - 2})"
    rs = f"(CAST(floor(_i * {every}) AS INT) + 2)"
    re_ = f"(CAST(floor((_i + 1) * {every}) AS INT) + 1)"
    as_ = f"(CAST(floor((_i + 1) * {every}) AS INT) + 2)"
    ae_ = f"least(CAST(floor((_i + 2) * {every}) AS INT) + 1, size(_r))"
    avg_slice = f"slice(_r, {as_}, greatest({ae_} - {as_} + 1, 1))"
    avgx = (
        f"aggregate({avg_slice}, CAST(0 AS DOUBLE), "
        f"(_s, _q) -> _s + _q.x) / size({avg_slice})"
    )
    avgy = (
        f"aggregate({avg_slice}, CAST(0 AS DOUBLE), "
        f"(_s, _q) -> _s + _q.y) / size({avg_slice})"
    )
    # triangle area x2 between prev (acc.prev), candidate _q and the
    # next-bucket centroid (_w.ax, _w.ay)
    area = (
        "abs((_acc.prev.x - _w.ax) * (_q.y - _acc.prev.y) - "
        "(_acc.prev.x - _q.x) * (_w.ay - _acc.prev.y))"
    )
    pick = (
        f"element_at(transform(array(named_struct('ax', {avgx}, "
        f"'ay', {avgy})), _w -> "
        f"aggregate(slice(_r, {rs}, greatest({re_} - {rs} + 1, 1)), "
        f"named_struct('best', element_at(_r, {rs}), "
        f"'ba', CAST(-1.0 AS DOUBLE)), "
        f"(_b, _q) -> IF({area.replace('_acc', '_o')} > _b.ba, "
        f"named_struct('best', _q, 'ba', {area.replace('_acc', '_o')}), "
        f"_b), _b -> _b.best)), 1)"
    )
    fold = (
        f"aggregate(sequence(0, {n - 3}), "
        f"named_struct('sel', slice(_r, 1, 1), "
        f"'prev', element_at(_r, 1)), "
        f"(_o, _i) -> element_at(transform(array({pick}), _pk -> "
        f"named_struct('sel', concat(_o.sel, array(_pk)), "
        f"'prev', _pk)), 1), "
        f"_o -> concat(_o.sel, slice(_r, size(_r), 1)))"
    )
    return (
        f"element_at(transform(array({arr}), _r -> "
        f"CASE WHEN size(_r) <= {n} THEN _r ELSE {fold} END), 1)"
    )


def _uniq_combined_fmt(p: Args, a: Args) -> str:
    """uniqCombined(HLL_precision)(x...) — the precision parameter maps
    onto approx_count_distinct's relative standard deviation via the
    HLL bound rsd = 1.04 / sqrt(2^precision) (wave 35; CH accepts
    12..20, default 17)."""
    try:
        prec = int(str(p[0]).strip())
    except ValueError:
        raise UntranslatableFunctionError(
            "uniqCombined(precision)(x): the precision must be an "
            "integer literal (CH accepts 12..20)"
        ) from None
    if not 12 <= prec <= 20:
        raise UntranslatableFunctionError(
            f"uniqCombined precision {prec}: ClickHouse accepts 12..20"
        )
    target = a[0] if len(a) == 1 else f"struct({', '.join(a)})"
    if prec >= 19:
        # CH packs 2^p 6-bit registers (~786 KB at p=20); Spark's
        # HLL++ buffer at the equivalent rsd is several MB PER
        # AGGREGATION BUFFER — a memory hazard at per-group scale. The
        # exact count is a value superset of any precision (the
        # quantileDD -> exact percentile precedent), so p >= 19 maps
        # to exact rather than a multi-MB sketch.
        return f"count(DISTINCT {target})"
    rsd = 1.04 / (2 ** (prec / 2.0))
    return f"approx_count_distinct({target}, {rsd:.8f})"


_PARAMETRIC: dict[str, Callable[[Args, Args], str]] = {
    "sumMapFiltered": _sum_map_filtered_fmt,
    # HLL precision parameter -> relative-SD (wave 35)
    "uniqCombined": _uniq_combined_fmt,
    "uniqCombined64": _uniq_combined_fmt,
    # the CH-exact funnel fold as a real SQL aggregate (round 10)
    "windowFunnel": _window_funnel_fmt,
    # symbol-string sequence aggregates (round 10; time-free patterns)
    "sequenceMatch": _sequence_match_fmt(count_mode=False),
    "sequenceCount": _sequence_match_fmt(count_mode=True),
    # glyph-ramp render as one aggregate expression (round 10)
    "sparkbar": _sparkbar_fmt,
    "largestTriangleThreeBuckets": _lttb_fmt,
    "lttb": _lttb_fmt,
    # the -Resample combinator over the common bases (wave 33)
    "countResample": _resample_fmt("count"),
    "sumResample": _resample_fmt("sum"),
    "minResample": _resample_fmt("min"),
    "maxResample": _resample_fmt("max"),
    "avgResample": _resample_fmt("avg"),
    # size-capped collection: groupArray(n)(x) keeps the first n
    "groupArray": lambda p, a: f"slice(collect_list({a[0]}), 1, {p[0]})",
    "groupUniqArray": lambda p, a: f"slice(collect_set({a[0]}), 1, {p[0]})",
    "quantile": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantileExact": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantileTDigest": lambda p, a: f"approx_percentile({a[0]}, {p[0]})",
    "quantiles": lambda p, a: f"percentile({a[0]}, array({', '.join(p)}))",
    "quantilesExact": lambda p, a: f"percentile({a[0]}, array({', '.join(p)}))",
    # exact distinct count saturating at N+1 (the CH cardinality guard)
    "uniqUpTo": lambda p, a: f"least(count(DISTINCT {a[0]}), {p[0]} + 1)",
    # CH (value, weight); Spark percentile's third arg is a frequency
    "quantileExactWeighted": lambda p, a: (
        f"percentile({a[0]}, {p[0]}, {a[1]})"
    ),
    "quantileInterpolatedWeighted": lambda p, a: (
        f"percentile({a[0]}, {p[0]}, {a[1]})"
    ),
    "quantilesExactWeighted": lambda p, a: (
        f"percentile({a[0]}, array({', '.join(p)}), {a[1]})"
    ),
    "quantilesInterpolatedWeighted": lambda p, a: (
        f"percentile({a[0]}, array({', '.join(p)}), {a[1]})"
    ),
    # random k per group; CH's pick is seeded-arbitrary, shuffle() too
    "groupArraySample": lambda p, a: (
        f"slice(shuffle(collect_list({a[0]})), 1, {p[0]})"
    ),
    # timing/deterministic variants: same statistic, different CH
    # internal representation — exact percentile is a value superset
    "quantileTiming": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantileDeterministic": lambda p, a: f"percentile({a[0]}, {p[0]})",
    # DDSketch: quantileDD(relative_accuracy, level)(x) — exact
    # percentile is a value superset of any relative-accuracy sketch
    "quantileDD": lambda p, a: f"percentile({a[0]}, {p[1]})",
    "quantilesDD": lambda p, a: (
        f"percentile({a[0]}, array({', '.join(p[1:])}))"
    ),
    "quantilesTiming": lambda p, a: (
        f"percentile({a[0]}, array({', '.join(p)}))"
    ),
    "quantilesDeterministic": lambda p, a: (
        f"percentile({a[0]}, array({', '.join(p)}))"
    ),
    "quantilesTDigest": lambda p, a: (
        f"approx_percentile({a[0]}, array({', '.join(p)}))"
    ),
    # Exact{Low,High,Inclusive,Exclusive} pick discrete elements; Spark's
    # exact percentile interpolates — same statistic family, boundary
    # elements may differ by one position (documented narrowing)
    "quantileExactLow": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantileExactHigh": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantileExactInclusive": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantileExactExclusive": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantilesExactLow": lambda p, a: (
        f"percentile({a[0]}, array({', '.join(p)}))"
    ),
    "quantilesExactHigh": lambda p, a: (
        f"percentile({a[0]}, array({', '.join(p)}))"
    ),
    # Greenwald-Khanna: CH's accuracy param maps onto Spark's
    # approx_percentile accuracy (both bound rank error at ~1/accuracy)
    "quantileGK": lambda p, a: f"approx_percentile({a[0]}, {p[1]}, {p[0]})",
    "quantilesGK": lambda p, a: (
        f"approx_percentile({a[0]}, array({', '.join(p[1:])}), {p[0]})"
    ),
    # BFloat16 truncation only coarsens the sketch; approx is a superset
    "quantileBFloat16": lambda p, a: f"approx_percentile({a[0]}, {p[0]})",
    "quantilesBFloat16": lambda p, a: (
        f"approx_percentile({a[0]}, array({', '.join(p)}))"
    ),
    "groupArraySorted": lambda p, a: (
        f"slice(array_sort(collect_list({a[0]})), 1, {p[0]})"
    ),
    # CH keeps the LAST n in insertion order; collect_list order is
    # partition-arrival, as unspecified distributed as CH's own merges
    "groupArrayLast": lambda p, a: (
        # empty-safe: slice(empty, 1, n) = empty; short lists start at 1.
        # Head is slice( so downstream length()/size heuristics see an
        # array-producing expression.
        f"slice(collect_list({a[0]}), "
        f"greatest(size(collect_list({a[0]})) - ({p[0]}) + 1, 1), {p[0]})"
    ),
    "groupConcat": lambda p, a: f"array_join(collect_list({a[0]}), {p[0]})",
}

#: aggregate bases the generic combinator rewriter understands
#: (CH name -> Spark aggregate). `uniqExact` maps through count DISTINCT
#: and is handled in-line.
_COMBINATOR_BASES: dict[str, str] = {
    "sum": "sum",
    "avg": "avg",
    "min": "min",
    "max": "max",
    "count": "count",
    "any": "any_value",  # NULL-skip special-cased in the emitter
    "anyLast": "__any_last__",
    "argMax": "max_by",
    "argMin": "min_by",
    "groupArray": "collect_list",
    "groupUniqArray": "collect_set",
    "median": "median",
    "stddevSamp": "stddev_samp",
    "stddevPop": "stddev_pop",
    "varSamp": "var_samp",
    "varPop": "var_pop",
    "uniq": "approx_count_distinct",
    "uniqExact": "__count_distinct__",
}


def _combinator_fmt(name: str) -> Callable[[Args], str] | None:
    """Generic ClickHouse aggregate-COMBINATOR rewriter: `<base><comb>`
    where comb stacks an optional {Array, Distinct, OrNull} with an
    optional trailing `If` (CH composes suffixes left-to-right, so `If`
    is always outermost and consumes the extra condition argument).

    Explicit `_fmt` entries (sumIf, uniqExact, countIf, ...) win — this
    runs only for names the direct table doesn't know, giving every
    base x combinator combination (`minIf`, `argMaxIf`, `sumArray`,
    `avgDistinct`, `countOrNullIf`, `groupArrayArrayIf`, ...) a
    faithful translation:

    - If        -> `... FILTER (WHERE cond)` (Spark's exact equivalent)
    - Distinct  -> `base(DISTINCT x)`
    - OrNull    -> NULL on the empty set: Spark sum/avg/min/max already
                   return NULL there; count wraps in nullif(.., 0)
    - Array     -> aggregate over all array elements across rows:
                   count -> sum(size), min/max -> over array_min/max,
                   sum/avg -> per-row `aggregate()` fold then reduce
                   (numeric result widens to DOUBLE, documented),
                   groupArray -> flatten(collect_list),
                   uniq/uniqExact -> over flattened distinct elements
    """
    # CH accepts the suffixes in either order (`countDistinctIf` and
    # `countIfDistinct` both occur in the wild) — strip from the right
    # until a known base emerges; one non-If combinator + optional If
    base = name
    filt = False
    comb = None
    for _ in range(2):
        if base in _COMBINATOR_BASES:
            break
        if not filt and base.endswith("If") and len(base) > 2:
            base = base[:-2]
            filt = True
            continue
        if comb is None:
            for suffix in ("Array", "Distinct", "OrNull", "OrDefault"):
                if (
                    base.endswith(suffix)
                    and len(base) > len(suffix)
                ):
                    comb = suffix
                    base = base[: -len(suffix)]
                    break
            else:
                break
            continue
        break
    for _am in ("ArgMin", "ArgMax"):
        if name.endswith(_am) and name[: -len(_am)] in _COMBINATOR_BASES \
                and name not in ("argMin", "argMax"):
            ext = "min" if _am == "ArgMin" else "max"
            raise UntranslatableFunctionError(
                f"{name}: the -{_am} combinator aggregates the value "
                f"only over rows where the second argument is {ext}imal "
                "— a single Spark aggregate can't see the extremum while "
                "folding; compute it first: "
                f"... FILTER (WHERE y = (SELECT {ext}(y) FROM t)) or a "
                f"window `{ext}(y) OVER (PARTITION BY grp)` equality filter"
            )
    if base != name and base in _OPERATOR_BACKED:
        # a combinator chained onto an operator-backed aggregate
        # (topKDistinct, sequenceMatchIf, ...): keep the operator
        # recipe instead of leaking the chained name verbatim
        raise UntranslatableFunctionError(
            f"{name}: {base}() is operator-backed here "
            f"({_OPERATOR_BACKED[base]}) — apply the combinator's "
            "filter/distinct inside the DataFrame call instead"
        )
    if base not in _COMBINATOR_BASES or (comb is None and not filt):
        if base != name and (filt or comb) and _fmt(base) is not None:
            # combinator chained onto a FORMATTER-BACKED aggregate
            # (rankCorrIf, deltaSumTimestampDistinct, ...): the
            # emission is a composite expression (collect + fold), so
            # FILTER/arg-NULLing cannot attach without changing the
            # fold's semantics — refuse with the subquery recipe
            # instead of leaking UNRESOLVED_ROUTINE (r9 closure fix)
            raise UntranslatableFunctionError(
                f"{name}: {base}() translates to a composite fold "
                "expression the combinator cannot wrap — apply the "
                "filter/distinct in a subquery (SELECT ... FROM t "
                "WHERE <cond> GROUP BY ...) and aggregate there"
            )
        return None
    spark = _COMBINATOR_BASES[base]

    def fmt(a: Args) -> str:
        args = list(a)
        cond = args.pop() if filt else None
        x = args[0] if args else "*"
        if comb == "Array":
            # `FILTER` cannot attach to the composite expressions below
            # (flatten(collect_list(..)), sum(..)/sum(..)), so the If
            # condition NULLs the array instead — aggregates skip NULL
            # inputs, which is exactly FILTER's row-exclusion semantics
            if cond is not None:
                x = f"CASE WHEN {cond} THEN {x} END"
            if base == "count":
                expr = f"sum(size({x}))"
            elif base in ("min", "max"):
                expr = f"{spark}(array_{base}({x}))"
            elif base == "sum":
                expr = (
                    f"sum(aggregate({x}, CAST(0 AS DOUBLE), "
                    f"(_acc, _e) -> _acc + _e))"
                )
            elif base == "avg":
                # try_divide: a group whose arrays are all empty has a
                # 0 element count — NULL, not an ANSI DIVIDE_BY_ZERO
                expr = (
                    f"try_divide(sum(aggregate({x}, CAST(0 AS DOUBLE), "
                    f"(_acc, _e) -> _acc + _e)), sum(size({x})))"
                )
            elif base in ("groupArray",):
                expr = f"flatten(collect_list({x}))"
            elif base == "groupUniqArray":
                expr = f"array_distinct(flatten(collect_list({x})))"
            elif base in ("uniq", "uniqExact"):
                expr = (
                    f"size(array_distinct(flatten(collect_list("
                    f"array_distinct({x})))))"
                )
            else:
                raise UntranslatableFunctionError(
                    f"{name}(): no Array-combinator form for {base}"
                )
            return expr
        if comb == "Distinct" or spark == "__count_distinct__":
            inner = "count" if spark == "__count_distinct__" else spark
            if inner == "__any_last__":
                inner = "any_value"  # DISTINCT makes first/last moot
            expr = f"{inner}(DISTINCT {', '.join(args)})"
        elif base in ("any", "anyLast"):
            # CH any/anyLast return the first/last NON-NULL value —
            # Spark's default any_value/last keep NULLs (wave 32)
            fn2 = "any_value" if base == "any" else "last"
            expr = f"{fn2}({args[0] if args else '*'}, true)"
        else:
            # CH's parameterless count() is count(*) in Spark
            expr = f"{spark}({', '.join(args) if args else ('*' if base == 'count' else '')})"
        if cond is not None:
            expr = f"{expr} FILTER (WHERE {cond})"
        if comb == "OrNull" and base == "count":
            expr = f"nullif({expr}, 0)"
        if comb == "OrDefault":
            # empty set -> the type's default (CH -OrDefault): 0 for
            # the numeric aggregates, empty array for groupArray forms
            # (collect_list/collect_set already return [] there)
            if base in ("sum", "count", "avg", "min", "max", "median",
                        "uniq", "uniqExact", "stddevSamp", "stddevPop",
                        "varSamp", "varPop"):
                expr = f"coalesce({expr}, 0)"
            elif base not in ("groupArray", "groupUniqArray"):
                raise UntranslatableFunctionError(
                    f"{name}(): no OrDefault form for {base}"
                )
        return expr

    return fmt


_GROUP_BY_RE = re.compile(r"(?i)\bGROUP\s+BY\b")
_TOTALS_RE = re.compile(r"(?i)\bWITH\s+TOTALS\b")
#: clause keywords that END a group-by expression list — hitting one at
#: depth 0 means this GROUP BY has no TOTALS (CH places WITH TOTALS
#: immediately after the grouping expressions, before HAVING)
_GROUP_END_RE = re.compile(
    r"(?i)\b(HAVING|ORDER|LIMIT|WINDOW|QUALIFY|UNION|EXCEPT|INTERSECT|"
    r"SETTINGS|FORMAT)\b"
)


def _scan_mask(sql: str) -> list[tuple[int, bool]]:
    """Per-character (paren depth, inside-quotes) mask for the
    statement-level rewrites — so clause keywords found by regex can be
    rejected when they sit inside a subquery, a string literal, or a
    quoted identifier. Three delimiter classes are masked: '...'
    string literals (backslash escapes), `...` and "..." quoted
    identifiers (ClickHouse treats both as identifiers; backslash
    escapes apply inside them too, `src/escape.rs` analogue)."""
    out: list[tuple[int, bool]] = []
    depth = 0
    closer: str | None = None  # the delimiter that ends the current run
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if closer is not None:
            out.append((depth, True))
            if c == "\\" and i + 1 < n:
                out.append((depth, True))
                i += 2
                continue
            if c == closer:
                closer = None
            i += 1
            continue
        if c in ("'", "`", '"'):
            closer = c
            out.append((depth, True))
        elif c == "(":
            out.append((depth, False))
            depth += 1
        elif c == ")":
            depth -= 1
            out.append((depth, False))
        else:
            out.append((depth, False))
        i += 1
    return out


def _find_clean(pattern: "re.Pattern[str]", sql: str, start: int = 0,
                depth0: bool = True):
    """First regex match not inside a string literal (and at paren depth
    0 when `depth0`)."""
    mask = _scan_mask(sql)
    m = pattern.search(sql, start)
    while m and (mask[m.start()][1] or (depth0 and mask[m.start()][0] != 0)):
        m = pattern.search(sql, m.end())
    return m


_SAMPLE_RE = re.compile(r"(?i)\bSAMPLE\s+(0?\.\d+|1\.0|(\d+)\s*/\s*(\d+))")


def _rewrite_sample(sql: str) -> str:
    """ClickHouse `FROM t SAMPLE 0.1` / `SAMPLE 1/10` -> Spark
    `TABLESAMPLE (10 PERCENT)`. Fractional forms only: `SAMPLE n` with
    integer n is ClickHouse's approximate-row-count form with no Spark
    equivalent and is left untouched (Spark then reports the clear
    parse error rather than silently sampling a different amount).

    Semantics note: CH SAMPLE is DETERMINISTIC over the table's
    declared sample key (same rows every run); Spark TABLESAMPLE
    (n PERCENT) is per-run Bernoulli. The sampled FRACTION matches,
    the selected ROWS differ run-to-run — callers needing reproducible
    samples should use operators/sampling (keyed modular buckets)."""
    while True:
        m = _find_clean(_SAMPLE_RE, sql, depth0=False)
        if not m:
            return sql
        if m.group(2):
            pct = 100.0 * int(m.group(2)) / int(m.group(3))
        else:
            pct = 100.0 * float(m.group(1))
        sql = f"{sql[: m.start()]}TABLESAMPLE ({pct:g} PERCENT){sql[m.end():]}"


#: `LIMIT n BY`, `LIMIT m, n BY`, and `LIMIT n OFFSET m BY` spellings
_LIMIT_BY_RE = re.compile(
    r"(?i)\bLIMIT\s+(?:(\d+)\s*,\s*)?(\d+)(?:\s+OFFSET\s+(\d+))?\s+BY\b"
)
_ORDER_BY_RE = re.compile(r"(?i)\bORDER\s+BY\b")
_AFTER_LIMIT_BY_RE = re.compile(r"(?i)\b(LIMIT|SETTINGS|FORMAT)\b")


def _rewrite_limit_by(sql: str) -> str:
    """ClickHouse `... [ORDER BY o] LIMIT n BY k [LIMIT m]` -> a
    row_number() window over the head query:

        SELECT * EXCEPT (_rn) FROM (
          SELECT _q.*, row_number() OVER (
            PARTITION BY k ORDER BY o|k) AS _rn FROM (<head>) AS _q
        ) WHERE _rn <= n [ORDER BY o] [LIMIT m]

    Top-level LIMIT BY only (a LIMIT BY inside a parenthesised FROM
    subquery is left as-is); ORDER BY expressions must be visible in
    the head's output (aliases are — they resolve against _q). Without
    ORDER BY, ClickHouse keeps arbitrary rows per key; the rewrite
    orders by the key expressions for determinism.
    """
    while True:
        m = _find_clean(_LIMIT_BY_RE, sql, depth0=False)
        if not m:
            return sql
        depth = _scan_mask(sql)[m.start()][0]
        if depth == 0:
            return _rewrite_limit_by_scope(sql)
        # nested: rewrite the enclosing parenthesised scope in place
        open_idx = -1
        d = 0
        for k in range(m.start() - 1, -1, -1):
            if sql[k] == ")":
                d += 1
            elif sql[k] == "(":
                if d == 0:
                    open_idx = k
                    break
                d -= 1
        if open_idx == -1:
            return _rewrite_limit_by_scope(sql)
        close = _find_matching_paren(sql, open_idx)
        inner = _rewrite_limit_by_scope(sql[open_idx + 1 : close])
        sql = f"{sql[: open_idx + 1]}{inner}{sql[close:]}"


def _rewrite_limit_by_scope(sql: str) -> str:
    m = _find_clean(_LIMIT_BY_RE, sql)
    if not m:
        return sql
    offset = int(m.group(1) or m.group(3) or 0)
    n = int(m.group(2))
    # BY expressions run to the next top-level clause keyword or EOS
    tail_m = _find_clean(_AFTER_LIMIT_BY_RE, sql, start=m.end())
    by_end = tail_m.start() if tail_m else len(sql)
    by_exprs = sql[m.end() : by_end].strip().rstrip(";").strip()
    tail = sql[by_end:].strip() if tail_m else ""
    head = sql[: m.start()].strip()
    # split a top-level ORDER BY off the head (the window takes it over)
    order = None
    om = _find_clean(_ORDER_BY_RE, head)
    while om:
        nxt = _find_clean(_ORDER_BY_RE, head, start=om.end())
        if not nxt:
            break
        om = nxt
    if om:
        order = head[om.end() :].strip()
        head = head[: om.start()].strip()
    order_clause = order or by_exprs
    out = (
        f"SELECT * EXCEPT (_rn) FROM (SELECT _q.*, row_number() OVER "
        f"(PARTITION BY {by_exprs} ORDER BY {order_clause}) AS _rn "
        f"FROM ({head}) AS _q) WHERE _rn "
        + (
            f"BETWEEN {offset + 1} AND {offset + n}"
            if offset
            else f"<= {n}"
        )
    )
    if order:
        out += f" ORDER BY {order}"
    if tail:
        out += f" {tail}"
    return out


def _rewrite_with_totals(sql: str) -> str:
    """`GROUP BY <exprs> WITH TOTALS` -> `GROUP BY GROUPING SETS
    ((<exprs>), ())` — the totals row is the empty grouping set.

    Semantics note: ClickHouse renders the totals row's key columns as
    type defaults (0 / ''), GROUPING SETS as NULL — the aggregate
    values are identical; key-column tests should use the NULL marker.
    Paren/quote-aware linear scan, one GROUP BY at a time; a clause
    keyword or the subquery's closing paren ends the search.
    """
    i = 0
    while True:
        # string-masked seed: a "GROUP BY ... WITH TOTALS" sequence
        # inside a literal must not be treated as a real clause
        m = _find_clean(_GROUP_BY_RE, sql, start=i, depth0=False)
        if not m:
            return sql
        j = m.end()
        depth = 0
        closer: str | None = None
        k = j
        totals = None
        while k < len(sql):
            c = sql[k]
            if closer is not None:
                if c == "\\":
                    k += 1
                elif c == closer:
                    closer = None
            elif c in ("'", "`", '"'):
                closer = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth < 0:
                    break
            elif depth == 0 and c.isalpha() and (
                k == 0 or not (sql[k - 1].isalnum() or sql[k - 1] == "_")
            ):
                m2 = _TOTALS_RE.match(sql, k)
                if m2:
                    totals = (k, m2.end())
                    break
                if _GROUP_END_RE.match(sql, k):
                    break
            k += 1
        if totals is None:
            i = j
            continue
        exprs = sql[j : totals[0]].strip()
        sql = (
            sql[: m.start()]
            + f"GROUP BY GROUPING SETS (({exprs}), ())"
            + sql[totals[1] :]
        )
        i = m.start() + 1

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _find_matching(s: str, open_idx: int, open_c: str, close_c: str) -> int:
    depth = 0
    closer: str | None = None
    i = open_idx
    while i < len(s):
        c = s[i]
        if closer is not None:
            if c == "\\":
                i += 1
            elif c == closer:
                closer = None
        elif c in ("'", "`", '"'):
            closer = c
        elif c == open_c:
            depth += 1
        elif c == close_c:
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _find_matching_paren(s: str, open_idx: int) -> int:
    return _find_matching(s, open_idx, "(", ")")


def _split_top_args(s: str) -> Args:
    args: Args = []
    depth = 0
    closer: str | None = None
    cur: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if closer is not None:
            cur.append(c)
            if c == "\\" and i + 1 < len(s):
                cur.append(s[i + 1])
                i += 1
            elif c == closer:
                closer = None
        elif c in ("'", "`", '"'):
            closer = c
            cur.append(c)
        elif c in "([":
            depth += 1
            cur.append(c)
        elif c in ")]":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        args.append(tail)
    return args


_CLAUSE_END_RE = re.compile(
    r"(?i)\b(WHERE|GROUP|HAVING|ORDER|LIMIT|WINDOW|QUALIFY|UNION|EXCEPT|"
    r"INTERSECT|SETTINGS|FORMAT)\b"
)
_AJ_END_RE = re.compile(
    r"(?i)\b(WHERE|PREWHERE|GROUP|HAVING|ORDER|LIMIT|WINDOW|QUALIFY|UNION|"
    r"EXCEPT|INTERSECT|SETTINGS|FORMAT|INNER|LEFT|RIGHT|FULL|CROSS|JOIN|"
    r"LATERAL)\b"
)


def _clause_end(sql: str, start: int, depth_at: int, mask, stop_re):
    """(end index, keyword match|None): scan from `start` until a stop
    keyword at `depth_at` outside strings, or the enclosing paren
    closes (depth drops below `depth_at`), or end of statement."""
    i = start
    while i < len(sql):
        d, instr = mask[i]
        if not instr and d < depth_at:
            return i, None
        if not instr and d == depth_at:
            em = stop_re.match(sql, i)
            if em:
                return i, em
        i += 1
    return len(sql), None


_WITH_FILL_RE = re.compile(r"(?i)\bWITH\s+FILL\b")
_FORMAT_TAIL_RE = re.compile(r"(?i)\bFORMAT\s+[A-Za-z][A-Za-z0-9]*\s*;?\s*$")
#: the lookbehind excludes `system.settings` (a table, not the clause)
_SETTINGS_TAIL_RE = re.compile(r"(?i)(?<![.\w])SETTINGS\s+[^;]*$")

#: statement-scoped splitBy* max_substrings mode. Modern ClickHouse
#: (since ~23.12, splitby_max_substrings_includes_remaining_string = 0
#: by default) DISCARDS everything after the first n splits;
#: = 1 restores the legacy remainder-in-last behavior. Set per
#: statement from the SETTINGS tail (_check_semantic_settings) or by
#: the client from the session SET shim's namespaced conf; reset when
#: the OUTERMOST translate_ch_sql call returns (recursion-depth
#: counter), so it can never leak across statements.
_SPLITBY_STATE = {"includes_remaining": False}
_TRANSLATE_DEPTH = [0]

#: round-10 (VERDICT r9 task #5): the point-statistic fold contract.
#: Collect-fold aggregates (rankCorr, LTTB, deltaSumTimestamp,
#: maxIntersections, entropy, intervalLengthSum, the EMA aggregate
#: form, -Resample, sumMap/minMap/maxMap SQL folds) hold ONE array per
#: group — the same state class ClickHouse's implementations hold —
#: but a group that isn't human-scale silently builds an unbounded
#: executor array. This promotes the SCALE.md prose fence to an
#: ENFORCED contract (the ivf max_query_rows precedent): the emitted
#: SQL size-guards the collected array and raises with the operator
#: recipe past the limit. Default generous (10M rows per group ~ the
#: memory CH itself would burn); SET-able per statement via
#: `SETTINGS max_fold_group_rows = n` (engine extension, documented)
#: or session-wide through the SET shim's namespaced conf.
_FOLD_LIMIT_STATE = {"max_rows": 10_000_000}


def set_max_fold_group_rows(n: int) -> None:
    """Statement/session-scoped override for the point-statistic fold
    group-size contract (engine extension max_fold_group_rows)."""
    _FOLD_LIMIT_STATE["max_rows"] = max(int(n), 1)


def _guard_fold(arr_expr: str, op: str) -> str:
    """Wrap a point-statistic fold's collected array with the
    group-size contract: raise_error naming the operator and the
    recipe instead of silently materializing an unbounded array."""
    n = _FOLD_LIMIT_STATE["max_rows"]
    msg = (
        f"{op}: group exceeds max_fold_group_rows ({n}) — this is a "
        "per-group POINT STATISTIC holding one array per group; bound "
        "the group (filter or bucket the key) or raise the limit with "
        "SETTINGS max_fold_group_rows = <n>"
    )
    return (
        f"(CASE WHEN size({arr_expr}) > {n} THEN "
        f"raise_error('{msg}') ELSE {arr_expr} END)"
    )


def set_splitby_includes_remaining(flag: bool) -> None:
    """Statement-scoped override for splitBy* remainder semantics
    (ClickHouse setting splitby_max_substrings_includes_remaining_string)."""
    _SPLITBY_STATE["includes_remaining"] = bool(flag)


def _split_max_substrings(s: str, sep: str, n: str) -> str:
    """Emit the Spark expression for splitBy*(sep, s, max_substrings).

    Modern ClickHouse discards the remainder: splitByChar(',', 'a,b,,c', 2)
    = ['a','b'] — so split one extra piece, then slice it off. Spark's own
    positive split limit keeps the remainder in the last element, which is
    CH's LEGACY mode (setting = 1), honored via _SPLITBY_STATE. n <= 0
    means unlimited (Spark's limit 0 would drop trailing empties, so it
    maps to -1).
    """
    if _SPLITBY_STATE["includes_remaining"]:
        return f"split({s}, {sep}, IF(({n}) <= 0, -1, {n}))"
    lit = re.fullmatch(r"\s*(-?\d+)\s*", n)
    if lit:
        # literal max_substrings (the common case): branch at
        # translation time so the emission stays a bare split/slice
        # call — downstream heuristics (length() -> size() on
        # arrayish args) read the head token
        k = int(lit.group(1))
        if k <= 0:
            return f"split({s}, {sep}, -1)"
        return f"slice(split({s}, {sep}, {k + 1}), 1, {k})"
    return (
        f"IF(({n}) <= 0, split({s}, {sep}), "
        f"slice(split({s}, {sep}, CAST({n} AS INT) + 1), 1, "
        f"CAST({n} AS INT)))"
    )


#: settings whose non-matching value CHANGES RESULTS (not just
#: execution) — stripping those silently would be a wrong-answer trap.
#: value = (the behavior this engine already has, divergence recipe)
_SEMANTIC_SETTINGS: dict[str, tuple[set, str]] = {
    "join_use_nulls": (
        {"1", "true"},
        "outer-join non-matches are NULL here (Spark/ANSI semantics = "
        "join_use_nulls=1); ClickHouse's default 0 fills TYPE DEFAULTS "
        "instead — wrap the nullable side's columns in "
        "coalesce(col, 0 / '' / toDate(0)) to reproduce it",
    ),
    "group_by_use_nulls": (
        {"1", "true"},
        "ROLLUP/CUBE/GROUPING SETS super-aggregate rows carry NULL "
        "group keys here (= group_by_use_nulls=1); ClickHouse's "
        "default 0 fills type defaults — coalesce the grouping "
        "columns to reproduce it",
    ),
    "aggregate_functions_null_for_empty": (
        {"0", "false"},
        "aggregates over the empty set keep their default values here "
        "(count=0, sum=NULL per ANSI); =1 rewrites EVERY aggregate to "
        "its -OrNull form — spell the -OrNull combinator explicitly "
        "(sumOrNull, countOrNull, ...) instead",
    ),
    "final": (
        {"0", "false"},
        "SETTINGS final=1 applies FINAL to every table in the query — "
        "write `FROM <table> FINAL` explicitly; ddl.rewrite_final "
        "folds the table's engine semantics (Replacing/Summing/"
        "Collapsing/VersionedCollapsing/Aggregating)",
    ),
}


def _check_semantic_settings(clause: str) -> bool:
    """`clause` is the text after the SETTINGS keyword; raise on any
    result-changing setting whose value differs from this engine's
    behavior. Returns True if any setting was merely STRIPPED (so the
    caller should warn) — honored settings don't trigger the warning."""
    any_stripped = False
    for part in clause.split(","):
        if "=" not in part:
            continue
        k, v = part.split("=", 1)
        k = k.strip().lower()
        v = v.strip().strip("'\"").lower()
        if k == "splitby_max_substrings_includes_remaining_string":
            # honored, not stripped: flips splitBy* to the legacy
            # remainder-in-last mode for THIS statement
            _SPLITBY_STATE["includes_remaining"] = v in ("1", "true")
            continue
        if k == "formatdatetime_parsedatetime_m_is_month_name":
            # honored (wave 35): %M = month name (modern default) vs
            # the legacy minutes reading, for THIS statement
            _FORMATDT_STATE["m_is_month_name"] = v in ("1", "true")
            continue
        if k == "max_fold_group_rows":
            # honored (round-10 task #5, engine extension): the
            # point-statistic fold group-size contract for THIS
            # statement
            try:
                set_max_fold_group_rows(int(v))
            except ValueError:
                raise UntranslatableFunctionError(
                    f"SETTINGS max_fold_group_rows = {v}: needs an "
                    "integer row limit"
                ) from None
            continue
        known = _SEMANTIC_SETTINGS.get(k)
        if known and v not in known[0]:
            raise UntranslatableFunctionError(
                f"SETTINGS {k} = {v} changes query RESULTS, not just "
                f"execution: {known[1]}"
            )
        any_stripped = True
    return any_stripped


def _strip_output_clauses(sql: str) -> str:
    """Drop the ClickHouse output-side tail clauses:

    - `FORMAT <name>` names a wire serialization; the engine returns
      DataFrames, so it carries no meaning here (the reference itself
      overwrites user FORMATs with ArrowStream, http/client.rs:69-78);
    - `SETTINGS k = v` are per-query execution hints — they never
      change results; the API path for enforced ones is
      client.query_with_options / QueryLimits (settings.py maps CH
      names to Spark confs). Stripped with a warning so callers know
      the hints did not silently apply.

    `ORDER BY ... WITH FILL` is refused instead: it ADDS rows — use
    operators/timeseries.fill_gaps (sequence + outer join
    densification), which implements the semantics.
    """
    m = _find_clean(
        re.compile(r"(?i)\bINTO\s+OUTFILE\b"), sql, depth0=False
    )
    if m:
        raise UntranslatableFunctionError(
            "INTO OUTFILE writes a client-side file — run the query and "
            "write the DataFrame: client.query_ch(sql).write"
            ".csv/parquet(path)"
        )
    m = _find_clean(_WITH_FILL_RE, sql, depth0=False)
    if m:
        raise UntranslatableFunctionError(
            "ORDER BY ... WITH FILL adds gap rows — a textual rewrite "
            "can't express it; use operators/timeseries.fill_gaps "
            "(sequence + outer-join densification, corpus "
            "events_fill_gaps)"
        )
    m = _find_clean(_FORMAT_TAIL_RE, sql)
    if m:
        sql = sql[: m.start()].rstrip()
    m = _find_clean(_SETTINGS_TAIL_RE, sql)
    if m:
        if _check_semantic_settings(sql[m.start() + len("SETTINGS"):]):
            import warnings

            warnings.warn(
                "SETTINGS clause stripped; per-query execution settings "
                "go through client.query_with_options / QueryLimits",
                stacklevel=3,
            )
        sql = sql[: m.start()].rstrip()
    return sql


_ORDER_BY_KW_RE = re.compile(r"(?i)\bORDER\s+BY\s+")
_ORDER_TERM_RE = re.compile(
    r"(?i)(LIMIT|OFFSET|SETTINGS|FORMAT|WINDOW|UNION|EXCEPT|INTERSECT|"
    r"FETCH|INTO|ROWS|RANGE|GROUPS)\b"
)
_NULLS_SPEC_RE = re.compile(r"(?i)\bNULLS\s+(FIRST|LAST)\b")
_DESC_TAIL_RE = re.compile(r"(?i)\bDESC(?:ENDING)?\s*$")
_DDL_HEAD_RE = re.compile(r"(?i)^\s*(CREATE|ALTER|INSERT|OPTIMIZE|DROP)\b")


def _rewrite_order_nulls(sql: str) -> str:
    """ClickHouse sorts NULL as the LARGEST value: last under ASC,
    first under DESC. Spark's defaults are the exact opposite (NULLS
    FIRST on ASC, NULLS LAST on DESC) — a silent top-k/LIMIT trap over
    nullable sort keys. Every ORDER BY key (top level, subqueries, and
    window OVER clauses alike — CH applies the same rule in all three)
    gets the explicit CH placement unless one is already spelled."""
    if _DDL_HEAD_RE.match(sql):
        return sql  # engine ORDER BY clauses are not sort specs
    search_from = 0
    while True:
        mask = _scan_mask(sql)
        m = _ORDER_BY_KW_RE.search(sql, search_from)
        while m and mask[m.start()][1]:
            m = _ORDER_BY_KW_RE.search(sql, m.end())
        if not m:
            return sql
        base = mask[m.start()][0]
        j, end = m.end(), len(sql)
        while j < len(sql):
            d, instr = mask[j]
            if not instr and d < base:
                end = j
                break
            if not instr and d == base:
                if sql[j] == ";":
                    end = j
                    break
                t = _ORDER_TERM_RE.match(sql, j)
                if t and (j == 0 or not (sql[j - 1].isalnum()
                                         or sql[j - 1] in "_`")):
                    end = j
                    break
            j += 1
        clause = sql[m.end():end]
        cmask = _scan_mask(clause)
        items, last = [], 0
        for k, c in enumerate(clause):
            if c == "," and cmask[k] == (0, False):
                items.append(clause[last:k])
                last = k + 1
        items.append(clause[last:])

        def fix(item: str) -> str:
            body = item.rstrip()
            pad = item[len(body):]
            # a trailing `-- comment` would swallow the appended spec;
            # split it off (string-literal-safe via the scan mask)
            comment = ""
            imask = _scan_mask(body)
            for k in range(len(body) - 1):
                if body[k : k + 2] == "--" and not imask[k][1]:
                    comment = " " + body[k:]
                    body = body[:k].rstrip()
                    break
            if not body or _NULLS_SPEC_RE.search(body) or \
                    re.search(r"(?i)\bWITH\s+FILL\b|\bINTERPOLATE\b", body):
                return item
            if _DESC_TAIL_RE.search(body):
                return f"{body} NULLS FIRST{comment}{pad}"
            return f"{body} NULLS LAST{comment}{pad}"

        new_clause = ",".join(fix(it) for it in items)
        sql = f"{sql[: m.end()]}{new_clause}{sql[end:]}"
        search_from = m.end() + len(new_clause)


_PREWHERE_RE = re.compile(r"(?i)\bPREWHERE\b")


def _rewrite_prewhere(sql: str) -> str:
    """ClickHouse PREWHERE is a storage-level filter-first hint; Spark's
    predicate pushdown owns that decision, so the predicate folds into
    WHERE (AND-merged with an existing WHERE) — identical results, the
    optimizer picks the physical order."""
    while True:
        m = _find_clean(_PREWHERE_RE, sql, depth0=False)
        if not m:
            return sql
        mask = _scan_mask(sql)
        depth_at = mask[m.start()][0]
        end, em = _clause_end(sql, m.end(), depth_at, mask, _CLAUSE_END_RE)
        pred = sql[m.end():end].strip()
        if em and em.group(1).upper() == "WHERE":
            sql = (
                sql[: m.start()]
                + f"WHERE ({pred}) AND "
                + sql[em.end():]
            )
        else:
            sql = sql[: m.start()] + f"WHERE {pred} " + sql[end:]


_ARRAY_JOIN_RE = re.compile(r"(?i)\b(LEFT\s+)?ARRAY\s+JOIN\b")


def _rewrite_array_join(sql: str) -> str:
    """ClickHouse `[LEFT] ARRAY JOIN arr AS x` -> Spark
    `LATERAL VIEW [OUTER] explode(arr) _aj AS x`.

    The multi-array form `ARRAY JOIN a AS x, b AS y` iterates arrays in
    LOCKSTEP (zip): it becomes ONE `LATERAL VIEW inline(transform(a,
    (e, i) -> named_struct('x', e, 'y', b[i])))` — a single explode, no
    cross product — guarded by a size-equality check that raises like
    ClickHouse does on ragged lengths. Only the un-aliased form
    refuses: without AS the element REPLACES the source column name,
    which is ambiguous in Spark scoping."""
    aj_n = 0
    while True:
        m = _find_clean(_ARRAY_JOIN_RE, sql, depth0=False)
        if not m:
            return sql
        mask = _scan_mask(sql)
        depth_at = mask[m.start()][0]
        end, _em = _clause_end(sql, m.end(), depth_at, mask, _AJ_END_RE)
        clause = sql[m.end():end].strip()
        # split on top-level commas => CH zip semantics over N arrays
        items, cdepth, start = [], 0, 0
        for i, ch in enumerate(clause):
            if ch == "(":
                cdepth += 1
            elif ch == ")":
                cdepth -= 1
            elif ch == "," and cdepth == 0:
                items.append(clause[start:i])
                start = i + 1
        items.append(clause[start:])
        parsed = []
        for item in items:
            am = re.match(
                r"(?is)^(.*\S)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$", item.strip()
            )
            if not am:
                raise UntranslatableFunctionError(
                    "ARRAY JOIN without AS: the element would REPLACE the "
                    "source column name, which is ambiguous in Spark scoping "
                    "— write ARRAY JOIN <arr> AS <alias>"
                )
            parsed.append((am.group(1).strip(), am.group(2)))
        outer = "OUTER " if m.group(1) else ""
        aj_n += 1
        view = f"_aj{aj_n}" if aj_n > 1 else "_aj"
        if len(parsed) == 1:
            expr, alias = parsed[0]
            # ClickHouse ARRAY JOIN over a Map iterates (key, value)
            # pairs, referenced as alias.key / alias.value (reference
            # e2e_http.rs map tests). The textual layer has no types —
            # those references ARE the signal: explode map_entries so
            # the alias is a {key, value} struct.
            rest = sql[:m.start()] + sql[end:]
            if re.search(rf"\b{re.escape(alias)}\.(key|value)\b", rest):
                expr = f"map_entries({expr})"
            lv = f"LATERAL VIEW {outer}explode({expr}) {view} AS {alias} "
        else:
            first = parsed[0][0]
            guards = " AND ".join(
                f"size(({first})) = size(({e}))" for e, _ in parsed[1:]
            )
            fields = ", ".join(
                [f"'{parsed[0][1]}', __cas_e"]
                + [
                    f"'{a}', element_at(({e}), __cas_i + 1)"
                    for e, a in parsed[1:]
                ]
            )
            zipped = (
                f"transform(({first}), (__cas_e, __cas_i) -> "
                f"named_struct({fields}))"
            )
            checked = (
                f"CASE WHEN {guards} THEN {zipped} ELSE "
                f"raise_error('ARRAY JOIN lockstep arrays have unequal "
                f"sizes (ClickHouse errors here too)') END"
            )
            aliases = ", ".join(a for _, a in parsed)
            lv = f"LATERAL VIEW {outer}inline({checked}) {view} AS {aliases} "
        sql = sql[: m.start()] + lv + sql[end:]


_FINAL_RE = re.compile(r"(?i)\bFROM\s+[A-Za-z_][\w.]*\s+FINAL\b")
_GLOBAL_RE = re.compile(
    r"(?i)\bGLOBAL\s+(?=ANY\b|ALL\b|ASOF\b|SEMI\b|ANTI\b|INNER\b|LEFT\b|"
    r"RIGHT\b|FULL\b|CROSS\b|JOIN\b|IN\b|NOT\s+IN\b)"
)
_ANY_JOIN_RE = re.compile(
    r"(?i)\b(?:(ANY|ASOF)\s+(?:(?:LEFT|RIGHT|INNER|FULL)\s+)?|"
    r"(?:LEFT|RIGHT|INNER|FULL)\s+(ANY|ASOF)\s+)JOIN\b"
)


_SELECT_RE = re.compile(r"(?i)\bSELECT\b")
_FROM_KW_RE = re.compile(r"(?i)\bFROM\b")
_WHERE_HAVING_RE = re.compile(r"(?i)\b(WHERE|HAVING)\b")
_CLAUSE_STOP_RE = re.compile(
    r"(?i)\b(GROUP|HAVING|ORDER|LIMIT|WINDOW|UNION|EXCEPT|INTERSECT|"
    r"SETTINGS|FORMAT)\b"
)
_ALIAS_NAME_RE = re.compile(r"^[A-Za-z_]\w*$")


def _rewrite_select_alias_refs(sql: str) -> str:
    """ClickHouse resolves SELECT-list aliases everywhere in the same
    scope — `SELECT a + 1 AS c ... WHERE c > 1` is the single most
    common migration breaker (Spark resolves WHERE against the input
    relation only). Inline each alias's expression into that scope's
    WHERE/HAVING. This matches CH in BOTH shadowing directions: CH
    prefers the ALIAS even when a real column shares the name (the
    `prefer_column_name_to_alias=0` default), which is exactly what
    inlining produces. GROUP BY / ORDER BY are left alone — Spark
    resolves aliases there natively.

    Sub-SELECT spans inside the WHERE region keep their own scope:
    replacements skip any parenthesized group that starts with SELECT.
    """
    mask = _scan_mask(sql)
    out = sql
    # process scopes right-to-left so earlier offsets stay valid
    starts = [
        m.start()
        for m in _SELECT_RE.finditer(sql)
        if not mask[m.start()][1]
    ]
    for s_idx in reversed(starts):
        depth = mask[s_idx][0]
        # find this scope's FROM at the same depth
        m_from = _find_at_depth(_FROM_KW_RE, out, s_idx, depth)
        if not m_from:
            continue
        select_list = out[s_idx + 6 : m_from.start()]
        aliases: list[tuple[str, str]] = []
        for i, item in enumerate(_split_top_args(select_list)):
            parts = _split_depth0(_AS_SPLIT_RE, item)
            if len(parts) < 2:
                continue
            alias = parts[-1].strip()
            expr = " AS ".join(parts[:-1]).strip()
            if i == 0:
                # SELECT DISTINCT/ALL prefix is not part of the expr
                expr = re.sub(r"(?is)^(DISTINCT|ALL)\s+", "", expr)
            if _ALIAS_NAME_RE.match(alias) and expr and expr != alias:
                aliases.append((alias, expr))
        if not aliases:
            continue
        # locate WHERE/HAVING clauses of this scope
        pos = m_from.end()
        while True:
            m_wh = _find_at_depth(_WHERE_HAVING_RE, out, pos, depth)
            if not m_wh:
                break
            end = _scope_clause_end(out, m_wh.end(), depth)
            clause = out[m_wh.end() : end]
            new_clause = _inline_aliases(clause, aliases)
            out = f"{out[: m_wh.end()]}{new_clause}{out[end:]}"
            pos = m_wh.end() + len(new_clause)
    return out


def _find_at_depth(pattern, sql, start, depth):
    mask = _scan_mask(sql)
    m = pattern.search(sql, start)
    while m and (
        mask[m.start()][1]
        or mask[m.start()][0] != depth
    ):
        # stop the scope search once depth drops below the scope's
        if not mask[m.start()][1] and mask[m.start()][0] < depth:
            return None
        m = pattern.search(sql, m.end())
    return m


def _scope_clause_end(sql, start, depth):
    """End of a WHERE/HAVING clause: next clause keyword AT the scope's
    depth, or the point where depth drops below it — whichever comes
    first positionally — else end of string."""
    return _scope_clause_end_re(sql, start, depth, _CLAUSE_STOP_RE)


def _sub_select_spans(clause: str, mask) -> list[tuple[int, int]]:
    spans: list[tuple[int, int]] = []
    i = 0
    while i < len(clause):
        if clause[i] == "(" and not mask[i][1]:
            j = i + 1
            while j < len(clause) and clause[j] in " \t\n":
                j += 1
            if clause[j : j + 6].upper() == "SELECT":
                close = _find_matching_paren(clause, i)
                if close != -1:
                    spans.append((i, close))
                    i = close + 1
                    continue
        i += 1
    return spans


def _substitute_alias_tokens(text: str, repl) -> str:
    """ONE left-to-right pass replacing bare alias tokens via
    ``repl(name) -> str | None`` (None = leave the token alone).
    Inserted text is never rescanned — simultaneous-substitution
    semantics, so an alias expression can safely mention another
    alias's NAME as a real column without being re-substituted.
    Skips string literals, qualified refs (`t.alias`), function-call
    heads, and sub-SELECT spans (their own scope)."""
    names = repl.keys() if isinstance(repl, dict) else None
    if isinstance(repl, dict):
        mapping = repl
        repl = mapping.get
    if names is not None and not names:
        return text
    mask = _scan_mask(text)
    sub_spans = _sub_select_spans(text, mask)
    pat = re.compile(r"\b[A-Za-z_]\w*\b")
    out: list[str] = []
    last = 0
    for m in pat.finditer(text):
        p = m.start()
        if mask[p][1]:
            continue
        if any(a <= p <= b for a, b in sub_spans):
            continue
        before = text[p - 1] if p > 0 else ""
        after = text[m.end()] if m.end() < len(text) else ""
        if before == "." or after == ".":
            continue  # qualified — a real column reference
        # not a function call: alias( would be a function name
        k = m.end()
        while k < len(text) and text[k] in " \t\n":
            k += 1
        if k < len(text) and text[k] == "(":
            continue
        r = repl(m.group(0))
        if r is None:
            continue
        out.append(text[last:p])
        out.append(f"({r})")
        last = m.end()
    if not out:
        return text
    out.append(text[last:])
    return "".join(out)


def _resolve_alias_exprs(aliases: list[tuple[str, str]]) -> dict[str, str]:
    """Pre-resolve alias-to-alias references so every expression only
    mentions real columns. Forward chains (`x AS a, a+1 AS b`) inline
    transitively; a CYCLE (`b AS a, a AS b`) poisons the whole chain —
    the referencing token stays put and therefore binds to the real
    column, which is how ClickHouse resolves the cyclic pair."""
    amap = dict(aliases)

    def resolve(name: str, path: frozenset) -> tuple[str, bool]:
        expr = amap[name]
        clean = True

        def rf(tok: str):
            nonlocal clean
            if tok == name or tok not in amap:
                return None
            if tok in path:
                clean = False
                return None
            r, ok = resolve(tok, path | {name})
            if not ok:
                clean = False
                return None
            return r

        return _substitute_alias_tokens(expr, rf), clean

    return {a: resolve(a, frozenset())[0] for a, _ in aliases}


def _inline_aliases(clause: str, aliases: list[tuple[str, str]]) -> str:
    """Replace bare alias tokens in `clause` with their parenthesized
    expressions — all aliases substituted SIMULTANEOUSLY (one pass,
    inserted text untouched), with alias-referencing expressions
    pre-resolved by :func:`_resolve_alias_exprs`."""
    return _substitute_alias_tokens(clause, _resolve_alias_exprs(aliases))


_WITH_HEAD_RE = re.compile(r"(?i)^\s*WITH\b")
_CTE_ITEM_RE = re.compile(r"(?i)^[A-Za-z_]\w*\s+AS\s*\(")


def _rewrite_scalar_with(sql: str) -> str:
    """ClickHouse scalar WITH — `WITH 5 AS k, x*2 AS dbl SELECT ...` —
    binds expressions to names visible EVERYWHERE in the statement
    (including subqueries; CH `enable_global_with_statement` default).
    Spark's WITH only accepts CTEs, so scalar items are inlined as
    parenthesized expressions at every bare reference; CTE items
    (`name AS (SELECT ...)`) stay in place."""
    m = _find_clean(_WITH_HEAD_RE, sql, depth0=False)
    if not m:
        return sql
    # span of the WITH list: up to the first top-level SELECT
    m_sel = _find_at_depth(_SELECT_RE, sql, m.end(), 0)
    if not m_sel:
        return sql
    items = _split_top_args(sql[m.end() : m_sel.start()])
    ctes: list[str] = []
    aliases: list[tuple[str, str]] = []
    for item in items:
        st = item.strip()
        if not st:
            continue
        if _CTE_ITEM_RE.match(st):
            ctes.append(st)
            continue
        parts = _split_depth0(_AS_SPLIT_RE, st)
        if len(parts) >= 2 and _ALIAS_NAME_RE.match(parts[-1].strip()):
            aliases.append((parts[-1].strip(), " AS ".join(parts[:-1]).strip()))
        else:
            ctes.append(st)  # unknown shape: leave for Spark's parser
    if not aliases:
        return sql
    # scalar WITH items are SEQUENTIAL in CH: later items may reference
    # earlier ones (`WITH 2 AS a, a * 3 AS b`) — pre-resolve so every
    # expression mentions only real columns before inlining
    resolved: dict[str, str] = {}
    pre: list[tuple[str, str]] = []
    for alias, expr in aliases:
        expr2 = _substitute_alias_tokens(expr, dict(resolved))
        resolved[alias] = expr2
        pre.append((alias, expr2))
    aliases = pre
    body = sql[m_sel.start() :]
    # a select-list item that IS a scalar alias keeps its output name
    # (CH names the column after the alias): `k` -> `(expr) AS k`
    alias_map = dict(aliases)
    mf = _find_at_depth(_FROM_KW_RE, body, 0, 0)
    if mf:
        items = _split_top_args(body[6 : mf.start()])
        changed = False
        for i, item in enumerate(items):
            st = item.strip()
            if st in alias_map:
                items[i] = f"({alias_map[st]}) AS {st}"
                changed = True
        if changed:
            body = f"SELECT {', '.join(items)} {body[mf.start():]}"
    # scalar WITH is visible inside subqueries too: inline everywhere
    # (literals, qualified refs, and call heads still skipped)
    body = _inline_aliases_everywhere(body, aliases)
    head = sql[: m.start()]
    if ctes:
        return f"{head}WITH {', '.join(ctes)} {body}"
    return f"{head}{body}"


def _inline_aliases_everywhere(clause: str, aliases) -> str:
    mask = _scan_mask(clause)
    for alias, expr in aliases:
        pat = re.compile(rf"\b{re.escape(alias)}\b")
        new: list[str] = []
        last = 0
        for mm in pat.finditer(clause):
            p = mm.start()
            if mask[p][1]:
                continue
            before = clause[p - 1] if p > 0 else ""
            after = clause[mm.end()] if mm.end() < len(clause) else ""
            if before == "." or after == ".":
                continue
            k = mm.end()
            while k < len(clause) and clause[k] in " \t\n":
                k += 1
            if k < len(clause) and clause[k] == "(":
                continue
            # an AS target is a NAME BINDING, not a reference
            b = p
            while b > 0 and clause[b - 1] in " \t\n":
                b -= 1
            if b >= 2 and clause[b - 2 : b].upper() == "AS" and (
                b == 2 or not (clause[b - 3].isalnum() or clause[b - 3] == "_")
            ):
                continue
            new.append(clause[last:p])
            new.append(f"({expr})")
            last = mm.end()
        if new:
            new.append(clause[last:])
            clause = "".join(new)
            mask = _scan_mask(clause)
    return clause


_QUALIFY_RE = re.compile(r"(?i)\bQUALIFY\b")
_QUALIFY_STOP_RE = re.compile(
    r"(?i)\b(ORDER|LIMIT|WINDOW|UNION|EXCEPT|INTERSECT|SETTINGS|FORMAT)\b"
)


def _rewrite_qualify(sql: str) -> str:
    """`... QUALIFY pred [ORDER BY ...]` (filter on window results) ->
    wrap: the scope becomes a subquery that computes `(pred) AS __q` as
    a lateral select item, filtered by `WHERE __q` outside and projected
    back with `* EXCEPT (__q)`. Trailing ORDER BY/LIMIT move to the
    outer query. Predicates may reference select aliases (Spark's
    lateral column alias resolution covers that)."""
    while True:
        m = _find_clean(_QUALIFY_RE, sql, depth0=False)
        if not m:
            return sql
        depth = _scan_mask(sql)[m.start()][0]
        # the scope's SELECT: last SELECT at this depth before QUALIFY
        sel = None
        for ms in _SELECT_RE.finditer(sql, 0, m.start()):
            msk = _scan_mask(sql)[ms.start()]
            if not msk[1] and msk[0] == depth:
                sel = ms
        if sel is None:
            return sql
        pred_end = _scope_clause_end_re(sql, m.end(), depth, _QUALIFY_STOP_RE)
        pred = sql[m.end() : pred_end].strip()
        scope_end = _scope_end(sql, pred_end, depth)
        inner = sql[sel.start() : m.start()].rstrip()
        # inject the predicate as a lateral select item before FROM;
        # `inner` is a slice, so depths inside it are RELATIVE (its own
        # scope keywords sit at relative depth 0 whatever the absolute)
        mf = _find_at_depth(_FROM_KW_RE, inner, 0, 0)
        if not mf:
            return sql
        inner_q = (
            f"{inner[: mf.start()].rstrip()}, ({pred}) AS __q "
            f"{inner[mf.start():]}"
        )
        trailing = sql[pred_end:scope_end]
        wrapped = (
            f"SELECT * EXCEPT (__q) FROM ({inner_q}) WHERE __q "
            f"{trailing.lstrip()}"
        ).rstrip()
        sql = f"{sql[: sel.start()]}{wrapped}{sql[scope_end:]}"


def _scope_clause_end_re(sql, start, depth, stop_re):
    """First position after `start` where the clause ends: a stop
    keyword AT the scope's depth, or the point where depth drops below
    it — whichever comes FIRST positionally."""
    mask = _scan_mask(sql)
    stops = {
        m.start()
        for m in stop_re.finditer(sql, start)
        if not mask[m.start()][1] and mask[m.start()][0] == depth
    }
    for k in range(start, len(sql)):
        if not mask[k][1] and mask[k][0] < depth:
            return k
        if k in stops:
            return k
    return len(sql)


def _scope_end(sql, start, depth):
    mask = _scan_mask(sql)
    for k in range(start, len(sql)):
        if not mask[k][1] and mask[k][0] < depth:
            return k
        if not mask[k][1] and mask[k][0] == depth:
            mu = re.match(r"(?i)(UNION|EXCEPT|INTERSECT)\b", sql[k:])
            if mu:
                return k
    return len(sql)


_IN_FRAME_RE = re.compile(r"(?i)\b(lagInFrame|leadInFrame)\s*\(")
_FRAME_SPEC_RE = re.compile(
    r"(?is)\s*(ROWS|RANGE)\s+BETWEEN\s+"
    r"(UNBOUNDED\s+PRECEDING|\d+\s+PRECEDING|CURRENT\s+ROW)\s+AND\s+"
    r"(CURRENT\s+ROW|UNBOUNDED\s+FOLLOWING|\d+\s+FOLLOWING)\s*$"
)


def _rewrite_in_frame(sql: str) -> str:
    """ClickHouse `lagInFrame/leadInFrame(x[, n]) OVER (... frame)`:
    Spark's lag/lead REJECT an explicit window frame, so the frame is
    stripped when it provably COVERS the offset (the common migration
    spellings: UNBOUNDED PRECEDING..., or `k PRECEDING` with k >= n) —
    identical results, since lag/lead then read the same row. A frame
    that may EXCLUDE the offset row (CH returns the default there) is
    refused rather than silently answered differently."""
    pos = 0
    while True:
        m = _find_clean(_IN_FRAME_RE, sql, start=pos, depth0=False)
        if not m:
            return sql
        pos = m.end()
        close = _find_matching_paren(sql, m.end() - 1)
        if close == -1:
            continue
        # literal offset (2nd arg), default 1
        args = _split_top_args(sql[m.end() : close])
        offset = None
        if len(args) < 2:
            offset = 1
        else:
            am = re.match(r"^\s*(\d+)\s*$", args[1])
            if am:
                offset = int(am.group(1))
        k = close + 1
        while k < len(sql) and sql[k] in " \t\n":
            k += 1
        if sql[k : k + 4].upper() != "OVER":
            continue
        k += 4
        while k < len(sql) and sql[k] in " \t\n":
            k += 1
        if k >= len(sql) or sql[k] != "(":
            continue  # named window: leave for Spark to resolve
        wclose = _find_matching_paren(sql, k)
        if wclose == -1:
            continue
        body = sql[k + 1 : wclose]
        fm = _FRAME_SPEC_RE.search(body)
        if not fm:
            continue  # no explicit frame: plain lag/lead is exact
        lo = re.sub(r"\s+", " ", fm.group(2).upper())
        hi = re.sub(r"\s+", " ", fm.group(3).upper())
        is_lag = m.group(1).lower() == "laginframe"
        if is_lag:
            covers = lo == "UNBOUNDED PRECEDING" or (
                offset is not None
                and lo.endswith("PRECEDING")
                and int(lo.split()[0]) >= offset
            )
        else:
            covers = hi == "UNBOUNDED FOLLOWING" or (
                offset is not None
                and hi.endswith("FOLLOWING")
                and int(hi.split()[0]) >= offset
            )
        if not covers:
            raise UntranslatableFunctionError(
                f"{m.group(1)} with a frame that may EXCLUDE the offset "
                "row: ClickHouse returns the default there, Spark's "
                "lag/lead cannot carry a frame — widen the frame to "
                "cover the offset (e.g. ROWS BETWEEN UNBOUNDED "
                "PRECEDING AND CURRENT ROW) or compute via nth_value"
            )
        sql = f"{sql[: k + 1]}{body[: fm.start()]}{sql[wclose:]}"


_EXP_DECAY_RE = re.compile(
    r"(?i)\b(exponentialTimeDecayedSum|exponentialTimeDecayedAvg|"
    r"exponentialTimeDecayedCount|exponentialTimeDecayedMax|"
    r"exponentialMovingAverage)\s*\("
)
_PARTITION_BY_RE = re.compile(
    r"(?is)\bPARTITION\s+BY\s+(.*?)(?=\bORDER\s+BY\b|\bROWS\b|\bRANGE\b|$)"
)


def _rewrite_exp_decay(sql: str) -> str:
    """ClickHouse's parameterized time-decay window functions
    (window-functions/docs: `f(x)(v, t) OVER (...)`):

    - exponentialTimeDecayedSum(x)(v, t)  = SUM  v_i * exp(-(T-t_i)/x)
    - exponentialTimeDecayedCount(x)(t)   = SUM      exp(-(T-t_i)/x)
    - exponentialTimeDecayedMax(x)(v, t)  = MAX  v_i * exp(-(T-t_i)/x)
    - exponentialTimeDecayedAvg(x)(v, t)  = decayed sum / decayed count
    - exponentialMovingAverage(x)(v, t)   = SUM v_i * 2^(-(T-t_i)/x)
                                            * (1 - 2^(-1/x))
      (half-life x, unit-spaced normalization — the reference CH
      implementation, base/ExponentiallySmoothedCounter.h)

    with T the CURRENT row's time. Each factors through the identity
    w(T, t_i) = w(T, t0) * w(t0, t_i) into ONE ordinary windowed
    SUM/MAX times a per-row prefactor — no per-row state, no
    collect_list, stays in whole-stage codegen. t0 = MAX(t) over the
    partition (ADVICE r9 #4) makes every grow factor <= 1 so the
    windowed sum can never overflow; results are double-exact for
    rows within ~709 decay horizons of the partition end, and rows
    older than that report a finite 0 (clamped shrink) where CH's
    sequential fold would return their ~full own-value — a documented
    divergence only reachable when the partition spans > 700x the
    decay horizon.

    exponentialMovingAverage without OVER (the CH AGGREGATE form) is
    rewritten to an Arrow-free exact fold: collect_list + aggregate()
    with the group max bound via a 1-element transform() — plan-level
    only, bounded by the group (the same cost CH pays holding the
    group's (v, t) pairs).
    """
    pos = 0
    while True:
        m = _find_clean(_EXP_DECAY_RE, sql, start=pos, depth0=False)
        if not m:
            return sql
        name = m.group(1)
        lname = name.lower()
        pclose = _find_matching_paren(sql, m.end() - 1)
        if pclose == -1:
            pos = m.end()
            continue
        param = sql[m.end():pclose].strip()
        k = pclose + 1
        while k < len(sql) and sql[k] in " \t\n":
            k += 1
        if k >= len(sql) or sql[k] != "(":
            raise UntranslatableFunctionError(
                f"{name}(x)(value, time): the parameterized call needs "
                "the second argument list"
            )
        aclose = _find_matching_paren(sql, k)
        args = [a.strip() for a in _split_top_args(sql[k + 1:aclose])]
        j = aclose + 1
        while j < len(sql) and sql[j] in " \t\n":
            j += 1
        has_over = sql[j:j + 4].upper() == "OVER"
        if not has_over:
            if lname == "exponentialmovingaverage".lower():
                if len(args) != 2:
                    raise UntranslatableFunctionError(
                        "exponentialMovingAverage(x)(value, timeunit) "
                        "takes two arguments"
                    )
                v, t = args
                arr = _guard_fold(
                    f"filter(collect_list(named_struct('t', "
                    f"CAST(({t}) AS DOUBLE), 'v', CAST(({v}) AS "
                    f"DOUBLE))), _n -> _n.t IS NOT NULL AND "
                    f"_n.v IS NOT NULL)",
                    "exponentialMovingAverage",
                )
                repl = (
                    f"(element_at(transform(array(array_max(transform("
                    f"{arr}, _s -> _s.t))), _T -> aggregate({arr}, "
                    f"CAST(0 AS DOUBLE), (_acc, _s) -> _acc + _s.v * "
                    f"pow(2.0, (_s.t - _T)/({param})))), 1) * "
                    f"(1.0 - pow(2.0, CAST(-1.0 AS DOUBLE)/({param}))))"
                )
                sql = f"{sql[: m.start()]}{repl}{sql[aclose + 1:]}"
                pos = m.start() + len(repl)
                continue
            raise UntranslatableFunctionError(
                f"{name} is a WINDOW function — add OVER (PARTITION BY "
                "... ORDER BY <time>); for a per-group scalar use "
                "exponentialMovingAverage (aggregate form) or "
                "operators/timeseries exponential smoothing"
            )
        j += 4
        while j < len(sql) and sql[j] in " \t\n":
            j += 1
        if j >= len(sql) or sql[j] != "(":
            raise UntranslatableFunctionError(
                f"{name} OVER w (named window): inline the window "
                "spec — the decay rewrite reads its PARTITION BY"
            )
        wclose = _find_matching_paren(sql, j)
        spec = sql[j + 1:wclose]
        pm = _PARTITION_BY_RE.search(spec)
        part_over = f"OVER (PARTITION BY {pm.group(1).strip()})" if pm \
            else "OVER ()"
        if lname == "exponentialtimedecayedcount":
            if len(args) != 1:
                raise UntranslatableFunctionError(
                    "exponentialTimeDecayedCount(x)(time) takes ONE "
                    "argument (the time column)"
                )
            t, v = args[0], None
        else:
            if len(args) != 2:
                raise UntranslatableFunctionError(
                    f"{name}(x)(value, time) takes two arguments"
                )
            v, t = args
        tt = f"CAST(({t}) AS DOUBLE)"
        # Anchor at the partition MAX (ADVICE r9 #4: the min anchor
        # made grow = exp((t-t0)/x) overflow for rows > ~700*x after
        # the start, poisoning every late frame with inf/NaN). With
        # t0 = max, grow = exp((t-t0)/x) <= 1 — NEVER overflows — and
        # the result is double-exact for every row within ~709 decay
        # horizons of the partition end (contributions older than
        # ~745*x from the anchor underflow to 0 exactly when their
        # true relative weight is below double epsilon). shrink's
        # exponent is clamped so rows more than ~700 horizons BEFORE
        # the partition end degrade to a finite 0 (their own weight is
        # unrepresentable next to the anchor) instead of inf/NaN —
        # documented divergence, pinned by test_exp_decay long-span.
        t0 = f"max({tt}) {part_over}"
        if lname == "exponentialmovingaverage":
            grow = f"pow(2.0, ({tt} - {t0})/({param}))"
            shrink = (
                f"pow(2.0, least(({t0} - {tt})/({param}), "
                f"CAST(1000 AS DOUBLE)))"
            )
        else:
            grow = f"exp(({tt} - {t0})/({param}))"
            shrink = (
                f"exp(least(({t0} - {tt})/({param}), "
                f"CAST(700 AS DOUBLE)))"
            )
        over = f"OVER ({spec})"
        if lname == "exponentialtimedecayedsum":
            repl = f"({shrink} * sum(({v}) * {grow}) {over})"
        elif lname == "exponentialtimedecayedcount":
            repl = f"({shrink} * sum({grow}) {over})"
        elif lname == "exponentialtimedecayedmax":
            repl = f"({shrink} * max(({v}) * {grow}) {over})"
        elif lname == "exponentialtimedecayedavg":
            # try_divide: in the degraded region (rows > ~700 horizons
            # before the partition end) both sums underflow to exactly
            # 0 and ANSI division would raise; NULL marks
            # "unrepresentable next to the anchor" there. The
            # denominator is otherwise always > 0 (the current row's
            # own weight).
            repl = (
                f"try_divide(sum(({v}) * {grow}) {over}, "
                f"sum({grow}) {over})"
            )
        else:  # exponentialMovingAverage as a window function
            repl = (
                f"({shrink} * sum(({v}) * {grow}) {over} * "
                f"(1.0 - pow(2.0, CAST(-1.0 AS DOUBLE)/({param}))))"
            )
        sql = f"{sql[: m.start()]}{repl}{sql[wclose + 1:]}"
        pos = m.start() + len(repl)


_NUMBERS_TVF_RE = re.compile(r"(?i)\b(FROM|JOIN)\s+numbers(_mt)?\s*\(")
_VALUES_TVF_RE = re.compile(r"(?i)\b(FROM|JOIN)\s+VALUES\s*\(\s*'")


def _rewrite_values_tvf(sql: str) -> str:
    """ClickHouse's `VALUES('a Int64, b String', (1, 'x'), ...)` table
    function (schema string first) -> a Spark inline-table subquery with
    the columns named and CAST to the bridged types."""
    from clickhouse_arrow_spark.types import ch_type_to_spark, parse_ch_type

    while True:
        m = _find_clean(_VALUES_TVF_RE, sql, depth0=False)
        if not m:
            return sql
        open_paren = sql.index("(", m.end(1))
        close = _find_matching_paren(sql, open_paren)
        if close == -1:
            return sql
        args = _split_top_args(sql[open_paren + 1: close])
        schema_lit = args[0].strip()
        cols = []
        for spec in schema_lit.strip("'").split(","):
            cname, _, ctype = spec.strip().partition(" ")
            try:
                stype = ch_type_to_spark(parse_ch_type(ctype.strip()))[0] \
                    .simpleString()
            except Exception:
                raise UntranslatableFunctionError(
                    f"VALUES schema {spec.strip()!r}: unparseable "
                    "ClickHouse type"
                ) from None
            cols.append((cname.strip(), stype))
        sel = ", ".join(
            f"CAST(col{i + 1} AS {t}) AS `{n}`" for i, (n, t) in
            enumerate(cols)
        )
        sub = (
            f"(SELECT {sel} FROM VALUES {', '.join(args[1:])})"
        )
        sql = f"{sql[: m.start()]}{m.group(1)} {sub}{sql[close + 1:]}"
_EMPTY_OVER_RE = re.compile(
    r"(?i)\b(row_number|rank|dense_rank|ntile\s*\(\s*\d+\s*\))\s*"
    r"(\(\s*\)\s*)?OVER\s*\(\s*\)"
)


_VIEW_TVF_RE = re.compile(r"(?i)\b(FROM|JOIN|,)\s*view\s*\(")


def _rewrite_view_tvf(sql: str) -> str:
    """ClickHouse `FROM view(SELECT ...)` table function — the wrapper
    is a no-op over an inline subquery here; strip it to plain parens."""
    while True:
        m = _find_clean(_VIEW_TVF_RE, sql, depth0=False)
        if not m:
            return sql
        open_paren = sql.index("(", m.start() + len(m.group(1)))
        close = _find_matching_paren(sql, open_paren)
        if close == -1:
            return sql
        sql = (
            f"{sql[: m.start()]}{m.group(1)} "
            f"({sql[open_paren + 1 : close]}){sql[close + 1 :]}"
        )


def _rewrite_numbers_tvf(sql: str) -> str:
    """ClickHouse's `numbers(n)` / `numbers(offset, n)` table function
    -> Spark's `range()` TVF wrapped to expose the `number` column.
    (`system.numbers` as a TABLE is handled catalog-side.)"""
    while True:
        m = _find_clean(_NUMBERS_TVF_RE, sql, depth0=False)
        if not m:
            return sql
        close = _find_matching_paren(sql, m.end() - 1)
        if close == -1:
            return sql
        args = _split_top_args(sql[m.end() : close])
        if len(args) == 1:
            sub = f"(SELECT id AS number FROM __cas_range__({args[0]}))"
        elif len(args) == 2:
            sub = (
                f"(SELECT id AS number FROM __cas_range__({args[0]}, "
                f"({args[0]}) + ({args[1]})))"
            )
        else:
            raise UntranslatableFunctionError(
                "numbers() takes 1 or 2 arguments (the stepped 3-arg "
                "form: use range(start, end, step) directly)"
            )
        sql = f"{sql[: m.start()]}{m.group(1)} {sub}{sql[close + 1:]}"


def _rewrite_empty_over(sql: str) -> str:
    """Ranking functions with an EMPTY `OVER ()` (legal in ClickHouse —
    arbitrary order) get an arbitrary-but-valid Spark ordering."""
    while True:
        m = _find_clean(_EMPTY_OVER_RE, sql, depth0=False)
        if not m:
            return sql
        fn = m.group(1)
        call = fn if "(" in fn else f"{fn}()"
        sql = (
            f"{sql[: m.start()]}{call} OVER "
            f"(ORDER BY monotonically_increasing_id()){sql[m.end():]}"
        )


_TOP_RE = re.compile(r"(?i)\bSELECT\s+TOP\s+(\d+)\b")


def _rewrite_top(sql: str) -> str:
    """`SELECT TOP n cols` (CH supports the T-SQL form) -> `SELECT cols
    ... LIMIT n` at the end of that scope."""
    while True:
        m = _find_clean(_TOP_RE, sql, depth0=False)
        if not m:
            return sql
        depth = _scan_mask(sql)[m.start()][0]
        end = _scope_end(sql, m.end(), depth)
        sql = (
            f"{sql[: m.start()]}SELECT {sql[m.end() : end].strip()} "
            f"LIMIT {m.group(1)}{sql[end:]}"
        )


#: set operators in set-op position (followed by SELECT or a
#: parenthesised SELECT), without an explicit ALL/DISTINCT
_BARE_SETOP_RE = re.compile(
    r"(?i)\b(INTERSECT|EXCEPT|UNION)\s+"
    r"(?!ALL\b|DISTINCT\b)(?=SELECT\b|\(\s*SELECT\b)"
)


def _rewrite_bare_setops(sql: str) -> str:
    """ClickHouse set-op defaults: INTERSECT/EXCEPT keep duplicates
    (ALL) unless DISTINCT is written — Spark defaults to DISTINCT, so a
    bare spelling silently changes multiplicities; rewrite to the
    explicit ALL. A bare UNION is an ERROR in ClickHouse (it demands
    ALL or DISTINCT) — same refusal here."""
    while True:
        m = _find_clean(_BARE_SETOP_RE, sql, depth0=False)
        if not m:
            return sql
        op = m.group(1).upper()
        if op == "UNION":
            raise UntranslatableFunctionError(
                "bare UNION: ClickHouse requires UNION ALL or UNION "
                "DISTINCT (union_default_mode is unset) — write one "
                "explicitly"
            )
        sql = f"{sql[: m.start()]}{op} ALL {sql[m.end():]}"


_COLON_CAST_RE = re.compile(r"::\s*([A-Za-z]\w*(?:\([^()]*\))?)")
_HEX_LIT_RE = re.compile(r"\b0x([0-9A-Fa-f]+)\b")


def _rewrite_colon_casts(sql: str) -> str:
    """`expr::ChType` — map the target through the type bridge when it
    parses as a ClickHouse type (`'7'::Int64` -> `'7'::bigint`);
    Spark-native targets pass unchanged. Hex integer literals (`0x1F`)
    become decimal (Spark parses 0x as an identifier)."""
    from clickhouse_arrow_spark.types import ch_type_to_spark, parse_ch_type

    out = []
    last = 0
    mask = _scan_mask(sql)
    for m in _COLON_CAST_RE.finditer(sql):
        if mask[m.start()][1]:
            continue
        try:
            dt, _null = ch_type_to_spark(parse_ch_type(m.group(1)))
            mapped = dt.simpleString()
        except Exception:
            continue
        out.append(sql[last : m.start()])
        out.append(f"::{mapped}")
        last = m.end()
    if out:
        out.append(sql[last:])
        sql = "".join(out)
    out = []
    last = 0
    mask = _scan_mask(sql)
    for m in _HEX_LIT_RE.finditer(sql):
        if mask[m.start()][1]:
            continue
        out.append(sql[last : m.start()])
        out.append(str(int(m.group(1), 16)))
        last = m.end()
    if not out:
        return sql
    out.append(sql[last:])
    return "".join(out)


_LIMIT_OFFSET_RE = re.compile(r"(?i)\bLIMIT\s+(\d+)\s*,\s*(\d+)")


def _rewrite_limit_offset(sql: str) -> str:
    """ClickHouse/MySQL `LIMIT offset, count` -> `LIMIT count OFFSET
    offset` (the form Spark parses)."""
    while True:
        m = _find_clean(_LIMIT_OFFSET_RE, sql, depth0=False)
        if not m:
            return sql
        sql = (
            f"{sql[: m.start()]}LIMIT {m.group(2)} "
            f"OFFSET {m.group(1)}{sql[m.end():]}"
        )


#: `* EXCEPT col` (ClickHouse's unparenthesized single-column form);
#: must not touch the set operator (`... EXCEPT SELECT/ALL/DISTINCT`)
_STAR_EXCEPT_BARE_RE = re.compile(
    r"(?i)\*\s+EXCEPT\s+(?!SELECT\b|ALL\b|DISTINCT\b|\()([A-Za-z_]\w*)"
)

_DISTINCT_ON_RE = re.compile(r"(?i)\bDISTINCT\s+ON\s*\(")


def _rewrite_distinct_on(sql: str) -> str:
    """ClickHouse `SELECT DISTINCT ON (keys) ...` -> the `LIMIT 1 BY
    keys` form (first row per key under the query's ORDER BY), which
    the LIMIT BY rewrite then turns into a row_number() window. The
    LIMIT 1 BY lands at the end of the DISTINCT's OWN scope (before a
    trailing LIMIT of that scope), so subquery forms dedup the
    subquery, not the outer statement."""
    while True:
        m = _find_clean(_DISTINCT_ON_RE, sql, depth0=False)
        if not m:
            return sql
        close = _find_matching_paren(sql, m.end() - 1)
        if close == -1:
            return sql
        depth = _scan_mask(sql)[m.start()][0]
        keys = sql[m.end() : close].strip()
        end = _scope_end(sql, close + 1, depth)
        scope = sql[close + 1 : end]
        # insert before this scope's own trailing LIMIT, if any
        lm = None
        mask = _scan_mask(scope)
        for cand in re.finditer(r"(?i)\bLIMIT\b", scope):
            if not mask[cand.start()][1] and mask[cand.start()][0] == 0:
                lm = cand
                break
        if lm:
            scope = (
                f"{scope[: lm.start()]}LIMIT 1 BY {keys} "
                f"{scope[lm.start():]}"
            )
        else:
            scope = f"{scope.rstrip()} LIMIT 1 BY {keys}"
        sql = f"{sql[: m.start()]}{scope}{sql[end:]}"


_STAR_MOD_RE = re.compile(r"(?i)\*\s+(REPLACE|APPLY)\s*\(")
_AS_SPLIT_RE = re.compile(r"(?i)\s+AS\s+")


def _rewrite_star_modifiers(sql: str) -> str:
    """ClickHouse `SELECT * REPLACE (expr AS col, ...)` -> Spark
    `* EXCEPT (col, ...), expr AS col, ...` (replaced columns move to
    the end of the projection — names and values identical, order is
    the documented divergence). `* APPLY (f)` needs the resolved column
    list, which the textual layer does not have — refused with the
    DataFrame recipe."""
    # CH's STRICT modifier (error on a missing column) is Spark's
    # default behavior for * EXCEPT — drop the keyword
    while True:
        sm = _find_clean(
            re.compile(r"(?i)\b(EXCEPT|REPLACE)\s+STRICT\b"), sql,
            depth0=False,
        )
        if not sm:
            break
        sql = f"{sql[: sm.start()]}{sm.group(1)}{sql[sm.end():]}"
    while True:
        m = _find_clean(_STAR_EXCEPT_BARE_RE, sql, depth0=False)
        if not m:
            break
        sql = f"{sql[: m.start()]}* EXCEPT ({m.group(1)}){sql[m.end():]}"
    while True:
        m = _find_clean(_STAR_MOD_RE, sql, depth0=False)
        if not m:
            return sql
        if m.group(1).upper() == "APPLY":
            raise UntranslatableFunctionError(
                "SELECT * APPLY(f) applies f to every column, which "
                "needs the resolved schema; use the DataFrame API — "
                "df.select([f(c).alias(c) for c in df.columns])"
            )
        open_idx = m.end() - 1
        close = _find_matching_paren(sql, open_idx)
        if close == -1:
            return sql
        repls = []
        for item in _split_top_args(sql[open_idx + 1 : close]):
            parts = [
                p
                for p in _split_depth0(_AS_SPLIT_RE, item)
            ]
            if len(parts) < 2:
                raise UntranslatableFunctionError(
                    "* REPLACE items must be `expr AS column`"
                )
            repls.append((" AS ".join(parts[:-1]).strip(), parts[-1].strip()))
        names = ", ".join(n for _, n in repls)
        exprs = ", ".join(f"{e} AS {n}" for e, n in repls)
        sql = f"{sql[: m.start()]}* EXCEPT ({names}), {exprs}{sql[close + 1:]}"


def _split_depth0(pattern: "re.Pattern[str]", s: str) -> list[str]:
    """Split `s` on `pattern` matches at paren depth 0 outside quotes."""
    mask = _scan_mask(s)
    parts, last = [], 0
    for m in pattern.finditer(s):
        if mask[m.start()][1] or mask[m.start()][0] != 0:
            continue
        parts.append(s[last : m.start()])
        last = m.end()
    parts.append(s[last:])
    return parts


#: `<ident>.<digits>` / `(<...>).<digits>` — CH positional tuple access
_TUPLE_IDX_IDENT_RE = re.compile(r"\b([A-Za-z_]\w*)\.(\d+)\b")
_TUPLE_IDX_PAREN_RE = re.compile(r"\)\.(\d+)\b")


def _rewrite_tuple_index(sql: str) -> str:
    """ClickHouse positional tuple access `t.1` / `(a, b).2` -> struct
    field access `.col{N}` (the field names Spark's `struct()` — and
    therefore the translated `tuple()` — assigns; same 1-based
    approximation as the `tupleElement` formatter). A bare
    parenthesized tuple literal gains an explicit `struct(...)` head,
    since Spark has no anonymous tuple expression."""
    while True:
        m = _find_clean(_TUPLE_IDX_IDENT_RE, sql, depth0=False)
        if m:
            sql = f"{sql[: m.start()]}{m.group(1)}.col{m.group(2)}{sql[m.end():]}"
            continue
        m = _find_clean(_TUPLE_IDX_PAREN_RE, sql, depth0=False)
        if not m:
            return sql
        # walk back to the matching open paren of the `)` we hit
        close = m.start()
        depth = 0
        open_idx = -1
        for k in range(close, -1, -1):
            if sql[k] == ")":
                depth += 1
            elif sql[k] == "(":
                depth -= 1
                if depth == 0:
                    open_idx = k
                    break
        if open_idx == -1:
            return sql
        # a call head must be ADJACENT to its paren (`tuple(...)`); a
        # keyword separated by whitespace (`SELECT (...)`) is not one
        is_call = open_idx > 0 and (
            sql[open_idx - 1].isalnum() or sql[open_idx - 1] in "_`)"
        )
        # head identifier, for recognizing an explicit tuple(...) call
        h_end = open_idx
        h_start = h_end
        while h_start > 0 and (sql[h_start - 1].isalnum() or sql[h_start - 1] == "_"):
            h_start -= 1
        head_name = sql[h_start:h_end] if is_call else ""
        if not is_call or head_name == "tuple":
            # bare `(a, b).N` / explicit `tuple(a, b).N`: extract the
            # Nth element TEXTUALLY — struct(a, b) would name its
            # fields after the columns, so `.colN` cannot work there
            inner = sql[open_idx + 1 : close]
            elems, d, start = [], 0, 0
            imask = _scan_mask(inner)
            for i, ch in enumerate(inner):
                if imask[i][1]:
                    continue
                if ch == "(":
                    d += 1
                elif ch == ")":
                    d -= 1
                elif ch == "," and d == 0:
                    elems.append(inner[start:i])
                    start = i + 1
            elems.append(inner[start:])
            n = int(m.group(1))
            if 1 <= n <= len(elems):
                pre = sql[:h_start] if head_name == "tuple" else sql[:open_idx]
                sql = f"{pre}({elems[n - 1].strip()}){sql[m.end():]}"
                continue
            raise UntranslatableFunctionError(
                f"tuple index .{n} out of range for a {len(elems)}-element "
                "tuple literal"
            )
        sql = (
            f"{sql[:open_idx]}{sql[open_idx : close + 1]}"
            f".col{m.group(1)}{sql[m.end():]}"
        )


#: `WHERE 0` / `HAVING 1` — ClickHouse treats integers as booleans in
#: condition position (generated SQL uses it constantly); Spark is
#: strictly typed. Only the STANDALONE-literal form is rewritten — a
#: numeric sub-expression like `WHERE flag & 4` still raises Spark's
#: own type error, which names the offending expression.
_NUM_COND_RE = re.compile(
    r"(?i)\b(WHERE|HAVING)\s+(\d+)(?=\s*(?:$|;|\)|GROUP\b|ORDER\b|"
    r"LIMIT\b|HAVING\b|WINDOW\b|UNION\b|EXCEPT\b|INTERSECT\b|SETTINGS\b))"
)


def _rewrite_numeric_conditions(sql: str) -> str:
    # literal-aware: `WHERE 1` inside a string literal must not be
    # rewritten (same _find_clean convention as every other statement
    # rewrite; depth0=False — subquery conditions rewrite too)
    pos = 0
    while True:
        m = _find_clean(_NUM_COND_RE, sql, start=pos, depth0=False)
        if not m:
            return sql
        repl = f"{m.group(1)} ({m.group(2)} <> 0)"
        sql = sql[: m.start()] + repl + sql[m.end():]
        pos = m.start() + len(repl)


def _refuse_ch_only_clauses(sql: str) -> str:
    """Strip GLOBAL (a ClickHouse distribution hint — Spark's planner
    owns shuffle placement) and refuse FINAL / ANY / ASOF joins loudly:
    each silently changes row multiplicity if mistranslated."""
    while True:
        m = _find_clean(_GLOBAL_RE, sql, depth0=False)
        if not m:
            break
        sql = sql[: m.start()] + sql[m.end():]
    m = _find_clean(_FINAL_RE, sql, depth0=False)
    if m:
        raise UntranslatableFunctionError(
            "FROM ... FINAL (merge-on-read fold) needs the table's "
            "engine + ORDER BY metadata, which the text does not carry. "
            "Client.query_ch resolves FINAL through the engine catalog "
            "(ddl.rewrite_final) for ReplacingMergeTree(ver) and "
            "SummingMergeTree tables; otherwise deduplicate explicitly — "
            "row_number() OVER (PARTITION BY key ORDER BY version DESC) "
            "= 1 (the analytic_dedup_latest pattern)"
        )
    m = _find_clean(re.compile(r"(?i)\bPASTE\s+JOIN\b"), sql, depth0=False)
    if m:
        raise UntranslatableFunctionError(
            "PASTE JOIN pairs rows by their positional order, which is "
            "undefined over distributed scans — zip explicitly: attach "
            "row_number() OVER (ORDER BY <a deterministic key>) to both "
            "sides and JOIN USING that column"
        )
    m = _find_clean(_ANY_JOIN_RE, sql, depth0=False)
    if m:
        kind = (m.group(1) or m.group(2)).upper()
        if kind == "ASOF":
            raise UntranslatableFunctionError(
                "ASOF JOIN: use operators/asof.asof_join (union + keyed "
                "window backward/forward match) — a textual rewrite "
                "cannot carry the inequality key"
            )
        raise UntranslatableFunctionError(
            "ANY JOIN keeps at most ONE match per row — translating to "
            "a plain join silently changes multiplicity; use "
            "operators.joins.any_join(left, right, on, how, order_by) "
            "(build-side dedup + join), or a LEFT SEMI join when only "
            "existence matters"
        )
    return sql


_COLLATE_RE = re.compile(r"(?i)\bCOLLATE\s+'([^']+)'")

#: words that can precede a '(' without being a function head
_NONCALL_KW_RE = re.compile(
    r"(?i)^(AND|OR|NOT|WHERE|BY|SELECT|WHEN|THEN|ELSE|IN|ON|AS|FROM|"
    r"HAVING|JOIN|USING|ALL|ANY|EXISTS|BETWEEN|LIKE|RLIKE|ILIKE)$"
)


def _expr_span_before(sql: str, pos: int) -> int:
    """Start index of the expression ending just before `pos`:
    an identifier chain, or a parenthesized/call group with an optional
    function-name head. Returns `pos` when nothing matches."""
    j = pos
    while j > 0 and sql[j - 1] in " \t\n":
        j -= 1
    if j > 0 and sql[j - 1] == ")":
        depth = 0
        k = j - 1
        while k >= 0:
            if sql[k] == ")":
                depth += 1
            elif sql[k] == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        if k < 0:
            return pos
        mm = re.search(r"[A-Za-z_][\w.]*\s*$", sql[:k])
        if mm and not _NONCALL_KW_RE.match(mm.group(0).strip()):
            return mm.start()
        return k
    mm = re.search(r"[A-Za-z_][\w.]*$", sql[:j])
    return mm.start() if mm else pos


def _rewrite_collate(sql: str) -> str:
    """`<expr> COLLATE 'loc'` -> `collate(<expr>, 'loc')` — Spark 4's
    ICU collations take the same locale tags ClickHouse's COLLATE does
    ('en', 'tr', 'en_US', ...)."""
    while True:
        m = _find_clean(_COLLATE_RE, sql, depth0=False)
        if not m:
            return sql
        start = _expr_span_before(sql, m.start())
        if start == m.start():
            return sql  # nothing collatable before it; leave for Spark
        expr = sql[start : m.start()].rstrip()
        sql = (
            f"{sql[:start]}collate({expr}, '{m.group(1)}')"
            f"{sql[m.end():]}"
        )


_ANY_IN_RE = re.compile(r"(?i)=\s*ANY\s*\(")
_ALL_NOTIN_RE = re.compile(r"(?i)(?:!=|<>)\s*ALL\s*\(")


def _rewrite_any_all(sql: str) -> str:
    """`x = ANY (subquery)` -> `x IN (subquery)` and `x <> ALL (...)` ->
    `x NOT IN (...)` — the two quantified comparisons with exact IN
    equivalents (Spark parses neither ANY nor ALL)."""
    while True:
        m = _find_clean(_ANY_IN_RE, sql, depth0=False)
        if not m:
            break
        sql = f"{sql[: m.start()]} IN ({sql[m.end():]}"
    while True:
        m = _find_clean(_ALL_NOTIN_RE, sql, depth0=False)
        if not m:
            break
        sql = f"{sql[: m.start()]} NOT IN ({sql[m.end():]}"
    return sql


_GROUP_BY_EMPTY_RE = re.compile(r"(?i)\bGROUP\s+BY\s*\(\s*\)")


def _rewrite_group_by_empty(sql: str) -> str:
    """CH `GROUP BY ()` = one global aggregate row — Spark spells that
    by having no GROUP BY at all."""
    while True:
        m = _find_clean(_GROUP_BY_EMPTY_RE, sql, depth0=False)
        if not m:
            return sql
        sql = f"{sql[: m.start()]}{sql[m.end():]}"


_IN_BRACKET_RE = re.compile(r"(?i)\b(NOT\s+)?IN\s*\[")


def _rewrite_in_bracket(sql: str) -> str:
    """CH allows an array literal as the IN set: `x IN [1, 2]` — the
    bracket list IS the set, so it becomes the parenthesized form."""
    while True:
        m = _find_clean(_IN_BRACKET_RE, sql, depth0=False)
        if not m:
            return sql
        close = _find_matching(sql, m.end() - 1, "[", "]")
        if close == -1:
            return sql
        notkw = "NOT " if m.group(1) else ""
        inner = sql[m.end() : close]
        sql = f"{sql[: m.start()]}{notkw}IN ({inner}){sql[close + 1:]}"


_TUPLE_IN_RE = re.compile(r"(?i)\b(NOT\s+)?IN\s*\(")


def _rewrite_tuple_in(sql: str) -> str:
    """`(a, b) IN ((1, 'x'), (2, 'y'))` -> named_struct with POSITIONAL
    field names on BOTH sides. Spark's struct IN compares field names
    too, so the bare tuple spelling mismatches (`o_orderkey` vs `col1`);
    CH tuples are nameless. Subquery RHS is left alone — Spark supports
    multi-column IN subqueries natively."""
    i = 0
    while True:
        m = _find_clean(_TUPLE_IN_RE, sql, start=i, depth0=False)
        if not m:
            return sql
        i = m.end()
        j = m.start()
        while j > 0 and sql[j - 1] in " \t\n":
            j -= 1
        if j == 0 or sql[j - 1] != ")":
            continue
        depth = 0
        k = j - 1
        while k >= 0:
            if sql[k] == ")":
                depth += 1
            elif sql[k] == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        if k < 0:
            continue
        head = re.search(r"[A-Za-z_][\w.]*\s*$", sql[:k])
        if head and not _NONCALL_KW_RE.match(head.group(0).strip()):
            continue  # function call, not a tuple
        lhs_items = _split_top_args(sql[k + 1 : j - 1])
        if len(lhs_items) < 2:
            continue
        close = _find_matching_paren(sql, m.end() - 1)
        if close == -1:
            continue
        rhs_items = _split_top_args(sql[m.end() : close])
        tuples = []
        ok = bool(rhs_items)
        for it in rhs_items:
            st = it.strip()
            if not (st.startswith("(") and st.endswith(")")):
                ok = False
                break
            elems = _split_top_args(st[1:-1])
            if len(elems) != len(lhs_items):
                ok = False
                break
            tuples.append(elems)
        if not ok:
            continue
        names = [f"'_t{x + 1}'" for x in range(len(lhs_items))]

        def ns(elems):
            inner = ", ".join(
                f"{nm}, {el.strip()}" for nm, el in zip(names, elems)
            )
            return f"named_struct({inner})"

        notkw = (m.group(1) or "").strip()
        notkw = f"{notkw} " if notkw else ""
        sql = (
            f"{sql[:k]}{ns(lhs_items)} {notkw}IN "
            f"({', '.join(ns(t) for t in tuples)}){sql[close + 1:]}"
        )
        i = k  # rescan from the rewritten site


_WITH_TIES_RE = re.compile(r"(?i)\bLIMIT\s+(\d+)\s+WITH\s+TIES\s*$")
_ORDER_BY_RE2 = re.compile(r"(?i)\bORDER\s+BY\b")


def _rewrite_limit_with_ties(sql: str) -> str:
    """`ORDER BY <o> LIMIT n WITH TIES` -> a rank() window wrap: every
    row tying with the n-th on the ORDER BY key survives, like CH. Only
    the statement-tail form rewrites; the ORDER BY expressions must be
    resolvable against the query's OWN output columns (they are wrapped
    as a subquery)."""
    s = sql.rstrip().rstrip(";")
    m = _WITH_TIES_RE.search(s)
    if not m or _scan_mask(s)[m.start()][1]:
        return sql
    # the LAST depth-0 ORDER BY before the LIMIT
    mo = None
    start = 0
    while True:
        cand = _find_at_depth(_ORDER_BY_RE2, s, start, 0)
        if not cand or cand.start() >= m.start():
            break
        mo = cand
        start = cand.end()
    if not mo:
        raise UntranslatableFunctionError(
            "LIMIT ... WITH TIES needs an ORDER BY to define the tie key"
        )
    order = s[mo.end() : m.start()].strip()
    body = s[: mo.start()].strip()
    n = m.group(1)
    return (
        f"SELECT * EXCEPT (_ties_rk) FROM (SELECT *, rank() OVER "
        f"(ORDER BY {order}) AS _ties_rk FROM ({body})) "
        f"WHERE _ties_rk <= {n} ORDER BY {order}"
    )


def translate_ch_sql(sql: str, allow_hash_substitution: bool = False) -> str:
    """Entry point — see _translate_ch_sql_impl for the semantics.

    Wraps the recursive translator with a depth counter so statement-
    scoped dialect state (splitBy* remainder mode from a SETTINGS tail
    or the session shim) resets exactly when the OUTERMOST call
    returns and can't leak into the next statement.
    """
    _TRANSLATE_DEPTH[0] += 1
    try:
        return _translate_ch_sql_impl(sql, allow_hash_substitution)
    finally:
        _TRANSLATE_DEPTH[0] -= 1
        if _TRANSLATE_DEPTH[0] == 0:
            _SPLITBY_STATE["includes_remaining"] = False
            _FORMATDT_STATE["m_is_month_name"] = True
            _FOLD_LIMIT_STATE["max_rows"] = 10_000_000


def _translate_ch_sql_impl(sql: str, allow_hash_substitution: bool = False) -> str:
    """Rewrite known ClickHouse function calls in `sql` to Spark SQL.

    Raises :class:`UntranslatableFunctionError` on engine-specific hash
    functions (cityHash64/sipHash64/halfMD5/farmHash64) unless
    `allow_hash_substitution=True`, which substitutes xxhash64 with a
    warning — the VALUES differ from ClickHouse's.

    Statement-level: `GROUP BY ... WITH TOTALS` rewrites to the
    equivalent GROUPING SETS form (totals row keys arrive as NULL, not
    ClickHouse's type defaults — aggregate values identical);
    `LIMIT n BY keys` to a row_number() window wrap; fractional
    `SAMPLE 0.1` to `TABLESAMPLE (10 PERCENT)` (NOTE: CH SAMPLE is
    deterministic over the table's sample key, TABLESAMPLE is per-run
    Bernoulli — same fraction, different rows each run; use
    operators/sampling for reproducible selection).
    """
    sql = _strip_output_clauses(sql)
    sql = _refuse_ch_only_clauses(sql)
    sql = _rewrite_numeric_conditions(sql)
    sql = _rewrite_scalar_with(sql)
    sql = _rewrite_qualify(sql)
    sql = _rewrite_top(sql)
    sql = _rewrite_bare_setops(sql)
    sql = _rewrite_colon_casts(sql)
    sql = _rewrite_array_join(sql)
    # PREWHERE folds into WHERE BEFORE alias inlining so select-list
    # aliases resolve inside it too (CH allows them there)
    sql = _rewrite_prewhere(sql)
    sql = _rewrite_view_tvf(sql)
    sql = _rewrite_numbers_tvf(sql)
    sql = _rewrite_values_tvf(sql)
    sql = _rewrite_empty_over(sql)
    sql = _rewrite_exp_decay(sql)
    sql = _rewrite_in_frame(sql)
    sql = _rewrite_select_alias_refs(sql)
    sql = _rewrite_with_totals(sql)
    sql = _rewrite_distinct_on(sql)
    sql = _rewrite_limit_by(sql)
    sql = _rewrite_limit_with_ties(sql)
    sql = _rewrite_limit_offset(sql)
    sql = _rewrite_collate(sql)
    sql = _rewrite_order_nulls(sql)
    sql = _rewrite_any_all(sql)
    sql = _rewrite_group_by_empty(sql)
    sql = _rewrite_in_bracket(sql)
    sql = _rewrite_tuple_in(sql)
    sql = _rewrite_star_modifiers(sql)
    sql = _rewrite_tuple_index(sql)
    sql = _rewrite_sample(sql)
    def subscripts(expr: str, k: int, allow_space: bool = True) -> tuple[str, int]:
        # CH postfix indexing `expr[i]` is 1-based (maps: by key) —
        # exactly Spark's element_at; Spark's own `[ ]` would be 0-based.
        # Space before the bracket is only consumed after call/literal
        # bases (allow_space): after a BARE identifier, `x [1]` could be
        # a keyword + array literal (`... IN [1, 2]`), so adjacency is
        # required there.
        while k < len(sql):
            j2 = k
            if allow_space:
                while j2 < len(sql) and sql[j2] in " \t\n":
                    j2 += 1
            if j2 >= len(sql) or sql[j2] != "[":
                break
            close_b = _find_matching(sql, j2, "[", "]")
            if close_b == -1:
                break
            idx = translate_ch_sql(sql[j2 + 1 : close_b], allow_hash_substitution)
            expr = f"element_at({expr}, {idx})"
            k = close_b + 1
        return expr, k

    out: list[str] = []
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # skip string literals verbatim
            j = i + 1
            while j < n:
                if sql[j] == "\\":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            # parenthesized group translated as a unit so a following
            # subscript attaches to IT — `(expr)[1]` is valid CH (and
            # what scalar-WITH alias inlining produces for array
            # aliases); char-by-char passthrough would hand the bracket
            # to the array-literal branch below
            close_p = _find_matching_paren(sql, i)
            if close_p != -1:
                inner = translate_ch_sql(
                    sql[i + 1 : close_p], allow_hash_substitution
                )
                expr, i = subscripts(
                    f"({inner})", close_p + 1, allow_space=False
                )
                out.append(expr)
                continue
        if c == "[":
            # bare bracket = ClickHouse array literal -> array(...)
            # (subscripts are consumed right after their base expression
            # below, so they never reach this branch)
            close_b = _find_matching(sql, i, "[", "]")
            if close_b != -1:
                inner = translate_ch_sql(
                    sql[i + 1 : close_b], allow_hash_substitution
                )
                expr = f"array({', '.join(_split_top_args(inner))})"
                expr, i = subscripts(expr, close_b + 1)
                out.append(expr)
                continue
        m = _NAME_RE.match(sql, i)
        if not m:
            out.append(c)
            i += 1
            continue
        name = m.group(0)
        j = m.end()
        # function call?
        if j < n and sql[j] == "(":
            close = _find_matching_paren(sql, j)
            if close == -1:
                out.append(sql[i:])
                break
            inner = translate_ch_sql(sql[j + 1 : close], allow_hash_substitution)
            args = _split_top_args(inner)
            # parametric form: name(params)(args) — an If suffix on a
            # parametric aggregate (`quantileIf(0.5)(x, cond)`) folds
            # its trailing condition into a CASE over the value args
            k = close + 1
            _par_name = name
            _par_if = False
            if (
                name not in _PARAMETRIC
                and name.endswith("If")
                and name[:-2] in _PARAMETRIC
            ):
                _par_name = name[:-2]
                _par_if = True
            if (
                _par_name not in _PARAMETRIC
                and name.endswith("Resample")
                and k < n
                and sql[k] == "("
            ):
                raise UntranslatableFunctionError(
                    f"{name}: the -Resample combinator is implemented "
                    "for the count/sum/min/max/avg bases "
                    "(countResample(start, end, step)(key), "
                    "sumResample(...)(x, key), ...); for other bases "
                    "express it relationally: GROUP BY "
                    "width_bucket(key, start, end, (end - start) DIV "
                    "step) with the base aggregate per bucket"
                )
            if _par_name in _PARAMETRIC and k < n and sql[k] == "(":
                close2 = _find_matching_paren(sql, k)
                if close2 != -1:
                    inner2 = translate_ch_sql(
                        sql[k + 1 : close2], allow_hash_substitution
                    )
                    _call_args = _split_top_args(inner2)
                    if _par_if and len(_call_args) >= 2:
                        cond = _call_args.pop()
                        _call_args = [
                            f"CASE WHEN {cond} THEN {x} END"
                            for x in _call_args
                        ]
                    try:
                        expr = _PARAMETRIC[_par_name](args, _call_args)
                    except IndexError:
                        raise UntranslatableFunctionError(
                            f"{name}: wrong parameter/argument arity for "
                            f"the {name}(params)(args) form — e.g. "
                            "quantileGK takes BOTH accuracy and level in "
                            "ONE parameter group: "
                            "quantileGK(accuracy, level)(col)"
                        ) from None
                    expr, i = subscripts(expr, close2 + 1)
                    out.append(expr)
                    continue
            if name in _ENGINE_HASHES and allow_hash_substitution:
                import warnings

                warnings.warn(
                    f"substituting xxhash64 for {name}: values differ "
                    "from ClickHouse's",
                    stacklevel=2,
                )
                out.append(f"xxhash64({', '.join(args)})")
                i = close + 1
                continue
            fmt = _fmt(name)
            # keyword guard: `ANY (SELECT ...)` / `any(SELECT ...)` is the
            # quantified-comparison keyword, not the aggregate — leave it.
            if name.lower() in ("any", "all", "some") and args and args[
                0
            ].lstrip().upper().startswith("SELECT"):
                fmt = None
            elif fmt is None:
                fmt = _combinator_fmt(name)
            if fmt is not None:
                expr = fmt(args)
            else:
                expr = f"{name}({', '.join(args)})"
            expr, i = subscripts(expr, close + 1)
            out.append(expr)
        else:
            expr, i = subscripts(name, j, allow_space=False)
            out.append(expr)
    # restore Spark-native range() TVFs planted by the numbers() rewrite
    # (the walk would have mistaken `range(` for CH's array range())
    final = "".join(out).replace("__cas_range__(", "range(")
    return _fix_named_struct_positional(final)


_NS_COL_RE = re.compile(r"\)\.col(\d+)\b")


def _fix_named_struct_positional(sql: str) -> str:
    """CH positional tuple access on a NAMED tuple: the `.N` rewrite
    emits `.colN` (struct()'s field names), but formatters that return
    `named_struct('t_statistic', ..., 'p_value', ...)` — ttest,
    proportionsZTest, sumCount — have real field names, so `.colN`
    fails with FIELD_NOT_FOUND. Post-pass: where `.colN` directly
    follows a named_struct(...) call, replace it with the N-th field's
    actual name."""
    while True:
        mask = _scan_mask(sql)
        changed = False
        for m in _NS_COL_RE.finditer(sql):
            if mask[m.start()][1]:
                continue
            close = m.start()
            depth = 0
            open_idx = -1
            for k in range(close, -1, -1):
                if mask[k][1]:
                    continue
                if sql[k] == ")":
                    depth += 1
                elif sql[k] == "(":
                    depth -= 1
                    if depth == 0:
                        open_idx = k
                        break
            if open_idx <= 0:
                continue
            h_end = open_idx
            h_start = h_end
            while h_start > 0 and (
                sql[h_start - 1].isalnum() or sql[h_start - 1] == "_"
            ):
                h_start -= 1
            if sql[h_start:h_end] != "named_struct":
                continue
            # depth-1 split of the args; even positions are the quoted
            # field names
            inner = sql[open_idx + 1 : close]
            imask = _scan_mask(inner)
            parts, d, last = [], 0, 0
            for i2, ch in enumerate(inner):
                if imask[i2][1]:
                    continue
                if ch in "([":
                    d += 1
                elif ch in ")]":
                    d -= 1
                elif ch == "," and d == 0:
                    parts.append(inner[last:i2])
                    last = i2 + 1
            parts.append(inner[last:])
            idx = int(m.group(1))
            name_pos = 2 * (idx - 1)
            if name_pos >= len(parts):
                continue
            fname = parts[name_pos].strip()
            if not (fname.startswith("'") and fname.endswith("'")):
                continue
            sql = (
                f"{sql[: m.start()]}).{fname[1:-1]}{sql[m.end():]}"
            )
            changed = True
            break
        if not changed:
            return sql


# -- ORDER BY ... WITH FILL extraction (executed by Client.query_ch via
#    operators/timeseries.with_fill; the textual layer only parses) ----

_FILL_BOUND = (
    r"(?:-?\d+(?:\.\d+)?"               # numeric literal
    r"|'[^']+'"                          # date/timestamp string literal
    r"|toDate(?:Time)?\('[^']+'\))"      # toDate('...') / toDateTime('...')
)
_ORDER_FILL_RE = re.compile(
    r"(?is)\bORDER\s+BY\s+(`[^`]+`|[\w.]+)\s*(ASC|DESC)?\s+WITH\s+FILL"
    rf"(?:\s+FROM\s+({_FILL_BOUND}))?"
    rf"(?:\s+TO\s+({_FILL_BOUND}))?"
    r"(?:\s+STEP\s+(INTERVAL\s+\d+\s+\w+|-?\d+(?:\.\d+)?))?"
    r"(?:\s+STALENESS\s+(INTERVAL\s+\d+\s+\w+|-?\d+(?:\.\d+)?))?"
    r"(?:\s+INTERPOLATE\s*\(((?:[^()]|\([^()]*\))*)\))?"
)


def extract_with_fill(sql: str):
    """Split `ORDER BY col WITH FILL [FROM a] [TO b] [STEP s]
    [INTERPOLATE (cols)]` out of a statement: returns
    (sql_without_fill, spec_dict | None) where spec is {"col", "start",
    "end", "step", "interpolate"}. Numeric bounds parse to numbers;
    date/timestamp bounds ('2024-01-01', toDate('...')) stay strings
    for the operator to cast; STEP may be `INTERVAL n unit` for time
    axes. INTERPOLATE entries parse to a {col: expr-or-None} dict: a
    bare column means carry-forward (previous original value); `col AS
    expr` computes expr for filled rows over the LAST ORIGINAL row's
    values of the referenced columns (ClickHouse's previous-row
    semantics for single-row gaps and bare-carried references; for a
    non-interpolated reference across a multi-row gap ClickHouse would
    recurse row-to-row — that self-recursive family, `x AS x*2`, is
    refused). DESC fills and multiple fill columns are refused — each
    would silently change the added rows. STALENESS (numeric or
    INTERVAL) parses to spec["staleness"] — the operator keeps filled
    rows only within that distance of the last original row."""
    m = _find_clean(_ORDER_FILL_RE, sql)
    if m is None:
        return sql, None
    if _find_clean(_ORDER_FILL_RE, sql, start=m.end()):
        raise UntranslatableFunctionError(
            "multiple WITH FILL columns: one fill axis is supported "
            "(operators/timeseries.with_fill)"
        )
    if (m.group(2) or "").upper() == "DESC":
        raise UntranslatableFunctionError(
            "WITH FILL on a DESC ordering: fill ascending and sort the "
            "result, or negate the axis"
        )
    interpolate: dict[str, str | None] = {}
    if m.group(7) is not None:
        for item in _split_top_args(m.group(7)):
            item = item.strip()
            if not item:
                continue
            am = re.match(r"(?is)^(`[^`]+`|\w+)\s+AS\s+(.+)$", item)
            if am is None:
                interpolate[item.strip("`")] = None
                continue
            target = am.group(1).strip("`")
            expr = am.group(2).strip()
            if re.search(rf"(?<![\w`]){re.escape(target)}(?![\w`])", expr):
                raise UntranslatableFunctionError(
                    f"INTERPOLATE ({target} AS {expr}): the expression "
                    "references its own column, which recurses row-to-row "
                    "across filled gaps — a window cannot express that; "
                    "carry the column bare or compute downstream"
                )
            interpolate[target] = translate_ch_sql(f"SELECT {expr}")[
                len("SELECT "):
            ]

    def bound(s):
        if s is None:
            return None
        s = s.strip()
        inner = re.match(r"(?i)toDate(?:Time)?\('([^']+)'\)", s)
        if inner:
            return inner.group(1)
        if s.startswith("'"):
            return s.strip("'")
        return float(s) if "." in s else int(s)

    def step_like(text):
        if not text:
            return None
        im = re.match(r"(?i)INTERVAL\s+(\d+)\s+(\w+)", text)
        if im:
            return ("interval", int(im.group(1)), im.group(2).lower())
        return float(text) if "." in text else int(text)

    step = step_like(m.group(5)) or 1
    staleness = step_like(m.group(6))

    col = m.group(1).strip("`").split(".")[-1]
    spec = {
        "col": col,
        "start": bound(m.group(3)),
        "end": bound(m.group(4)),
        "step": step,
        "staleness": staleness,
        "interpolate": interpolate,
    }
    direction = f" {m.group(2)}" if m.group(2) else ""
    replaced = f"ORDER BY {m.group(1)}{direction}"
    sql = sql[: m.start()] + replaced + sql[m.end():]
    return sql, spec


@__import__("functools").lru_cache(maxsize=1)
def known_ch_functions() -> frozenset:
    """Every ClickHouse function name the translator knows — renames,
    formatters (harvested from _fmt's own source), parametric
    aggregates, and operator-backed refusals. Used for did-you-mean
    hints on unresolved functions."""
    import inspect

    src = inspect.getsource(_fmt)
    names = set(re.findall(r'name == "(\w+)"', src))
    for grp in re.findall(r"name in \(([^)]*)\)", src):
        names |= set(re.findall(r'"(\w+)"', grp))
    names |= set(_SIMPLE_RENAMES) | set(_PARAMETRIC) | set(_OPERATOR_BACKED)
    return frozenset(names)


def suggest_function(name: str) -> str | None:
    """A did-you-mean hint for an unresolved function: exact
    case-insensitive match first (CH names are case-sensitive), then
    edit-distance neighbors."""
    import difflib

    known = known_ch_functions()
    lower = {k.lower(): k for k in known}
    if name.lower() in lower and lower[name.lower()] != name:
        return (
            f"ClickHouse function names are case-sensitive: did you mean "
            f"{lower[name.lower()]!r}?"
        )
    close = difflib.get_close_matches(name, known, n=3, cutoff=0.75)
    if close:
        return "similar ClickHouse functions: " + ", ".join(close)
    # combinator chain on a known base: hint the strip
    base = name
    stripped = []
    for _ in range(3):
        for suf in ("If", "Distinct", "OrNull", "OrDefault", "Array",
                    "Merge", "State", "ForEach", "SimpleState"):
            if base.endswith(suf) and len(base) > len(suf):
                stripped.append(suf)
                base = base[: -len(suf)]
                break
        else:
            break
    if stripped and base in known:
        return (
            f"{name} chains -{'/-'.join(stripped)} onto {base}(): this "
            f"combinator combination is not translated — express the "
            f"{'/'.join(stripped)} semantics around a plain {base}() "
            "call (FILTER clause, DISTINCT argument, or coalesce over "
            "the empty-set default)"
        )
    return None


# ---------------------------------------------------------------------------
# * APPLY(f) / COLUMNS('re') — catalog-aware star expansion
# ---------------------------------------------------------------------------

#: clause keywords that terminate a scope's FROM...JOIN section (the
#: set-op EXCEPT is distinguished from the star-modifier EXCEPT by its
#: SELECT/ALL/DISTINCT/( follower)
_SCOPE_END_RE = re.compile(
    r"(?i)\b(?:WHERE|GROUP\s+BY|HAVING|WINDOW|QUALIFY|ORDER\s+BY|LIMIT|"
    r"SETTINGS|FORMAT|UNION|INTERSECT)\b"
    r"|\bEXCEPT\s*(?=SELECT\b|ALL\b|DISTINCT\b|\()"
)


def _from_scope_end(sql: str, start: int, depth: int) -> int:
    """End offset of the FROM...JOIN section that starts at `start` and
    lives at paren `depth`: the scope's closing paren, or the first
    same-depth terminator clause, whichever comes first. (Distinct from
    `_scope_end`, which finds the end of a whole SELECT scope.)"""
    mask = _scan_mask(sql)
    end = len(sql)
    for i in range(start, len(sql)):
        if not mask[i][1] and sql[i] == ")" and mask[i][0] < depth:
            end = i
            break
    k = start
    while True:
        m = _SCOPE_END_RE.search(sql, k)
        if not m or m.start() >= end:
            return end
        if not mask[m.start()][1] and mask[m.start()][0] == depth:
            return m.start()
        k = m.end()


def _analyze_scope_columns(spark, frag: str, src: str) -> list[str]:
    """Resolve a join/subquery scope's column set the way Spark itself
    does: translate the scope's FROM fragment and ANALYZE (not run) a
    zero-row probe — `spark.sql` resolves the schema eagerly, `.columns`
    launches no job."""
    try:
        probe = translate_ch_sql(f"SELECT * FROM {frag} LIMIT 0")
        return spark.sql(probe).columns
    except Exception as e:
        raise UntranslatableFunctionError(
            f"{src}: could not resolve this scope's columns "
            f"({type(e).__name__}: {str(e).splitlines()[0] if str(e) else e}) "
            "— use the DataFrame API "
            "(df.select([f(c).alias(c) for c in df.columns]))"
        ) from None


#: base (`*` or COLUMNS('re')) + optional EXCEPT + zero-or-more APPLY(f)
_APPLY_FAMILY_RE = re.compile(
    r"(?i)(?:(\*)|\bCOLUMNS\s*\(\s*'([^']*)'\s*\))"
    r"(\s+EXCEPT\s*(?:STRICT\s+)?\([^)]*\)"
    r"|\s+EXCEPT\s+(?!SELECT\b|ALL\b|DISTINCT\b|STRICT\b)[A-Za-z_]\w*)?"
    r"((?:\s+APPLY\s*(?:\([^()]*\)|[A-Za-z_]\w*))*)"
)
_APPLY_FN_RE = re.compile(r"(?i)APPLY\s*(\([^()]*\)|[A-Za-z_]\w*)")
_PLAIN_FROM_RE = re.compile(
    r"(?i)\bFROM\s+((?:`[^`]+`|[A-Za-z_]\w*)"
    r"(?:\.(?:`[^`]+`|[A-Za-z_]\w*))?)"
    r"(?:\s+(?:AS\s+)?(?!WHERE\b|GROUP\b|ORDER\b|LIMIT\b|HAVING\b|JOIN\b|"
    r"UNION\b|EXCEPT\b|INTERSECT\b|SETTINGS\b|QUALIFY\b|WINDOW\b|ON\b|"
    r"USING\b|LEFT\b|RIGHT\b|INNER\b|FULL\b|CROSS\b|SEMI\b|ANTI\b|LATERAL\b)"
    r"[A-Za-z_]\w*)?\s*"
)


def rewrite_star_apply(spark, sql: str) -> str:
    """Expand ClickHouse's schema-dependent star modifiers — `* APPLY
    (f)`, `COLUMNS('re')`, and their EXCEPT/APPLY chains — into explicit
    projection lists, resolving the column set from the Spark catalog.

    Runs at `query_ch` time (the purely textual translator has no
    schema). Plain-table FROM scopes resolve straight from the catalog;
    join and subquery scopes resolve the way Spark itself does — the
    scope's FROM fragment is translated and ANALYZED with a LIMIT 0
    probe (no job runs), and the probe's `.columns` is the set
    ClickHouse's analyzer would expand. Per ClickHouse semantics:

    - `COLUMNS('re')` keeps columns whose NAME matches the RE2 pattern
      (partial match, case-sensitive);
    - `EXCEPT (a, b)` removes columns by name;
    - each `APPLY(f)` wraps every selected column: `f(c)`, and the
      OUTPUT NAME becomes `f(c)` too (ClickHouse names the result after
      the applied expression).
    """
    while True:
        m = _find_clean(_APPLY_FAMILY_RE, sql, depth0=False)
        while m is not None:
            star, col_re, exc, applies = m.groups()
            if star and not applies:
                # bare `*` (or `* EXCEPT`) needs no schema: Spark parses
                # those natively / via _rewrite_star_modifiers
                m = _find_clean(_APPLY_FAMILY_RE, sql, start=m.end(), depth0=False)
                continue
            break
        if m is None:
            return sql
        star, col_re, exc, applies = m.groups()
        mask = _scan_mask(sql)
        depth = mask[m.start()][0]
        fm = None
        k = m.end()
        while True:
            fm = _find_clean(re.compile(r"(?i)\bFROM\b"), sql, start=k, depth0=False)
            if fm is None or _scan_mask(sql)[fm.start()][0] <= depth:
                break
            k = fm.end()
        src = m.group(0).strip()
        if fm is None or _scan_mask(sql)[fm.start()][0] != depth:
            raise UntranslatableFunctionError(
                f"{src}: no resolvable FROM in this scope — APPLY/COLUMNS "
                "need the schema; use the DataFrame API "
                "(df.select([f(c).alias(c) for c in df.columns]))"
            )
        pm = _PLAIN_FROM_RE.match(sql, fm.start())
        nxt = sql[pm.end():].lstrip()[:8].upper() if pm else ""
        if pm is None or nxt.startswith(",") or re.match(
            r"(?:JOIN|LEFT|RIGHT|INNER|FULL|CROSS|SEMI|ANTI|LATERAL)\b", nxt
        ):
            # join / subquery scope: resolve the column set by analyzing
            # the scope's FROM fragment (LIMIT 0 probe, no job) — the
            # same column set ClickHouse's analyzer would expand
            end = _from_scope_end(sql, fm.end(), depth)
            frag = sql[fm.end(): end].strip()
            table = None
            cols = _analyze_scope_columns(spark, frag, src)
        else:
            table = pm.group(1)
            try:
                cols = spark.table(table).columns
            except Exception:
                raise UntranslatableFunctionError(
                    f"{src}: table {table} not found in the catalog"
                ) from None
        if col_re is not None:
            try:
                rx = re.compile(col_re)
            except re.error as e:
                raise UntranslatableFunctionError(
                    f"COLUMNS({col_re!r}): bad pattern ({e})"
                ) from None
            cols = [c for c in cols if rx.search(c)]
            if not cols:
                raise UntranslatableFunctionError(
                    f"COLUMNS({col_re!r}) matched no columns of "
                    f"{table or 'this scope'} "
                    "(ClickHouse errors on an empty match too)"
                )
        if exc:
            names = re.findall(r"[A-Za-z_]\w*", exc.split("EXCEPT", 1)[-1])
            cols = [c for c in cols if c not in names]
        fns = []
        for tok in _APPLY_FN_RE.findall(applies or ""):
            # both CH spellings: APPLY f and APPLY(f)
            inner = tok[1:-1].strip() if tok.startswith("(") else tok
            if not re.fullmatch(r"[A-Za-z_]\w*", inner):
                raise UntranslatableFunctionError(
                    f"{src}: APPLY supports a plain function name — for "
                    "lambdas or parameterized functions use the "
                    "DataFrame API"
                )
            fns.append(inner)
        items = []
        for c in cols:
            expr, name = f"`{c}`", c
            for f in fns:
                expr, name = f"{f}({expr})", f"{f}({name})"
            items.append(expr if not fns else f"{expr} AS `{name}`")
        sql = f"{sql[: m.start()]}{', '.join(items)}{sql[m.end():]}"


def _assert_no_shadowed_renames() -> None:
    """Import-time invariant (round-9 verdict observation #1): a name
    present in _SIMPLE_RENAMES that ALSO has a dedicated formatter
    branch in _fmt is a silent-wrong-answer trap — the formatter wins
    (it returns before the rename fallback), so the rename entry is
    dead, and a future edit that removes the formatter would silently
    revive a stale rename instead of erroring. Probe: drop the name
    from the rename map; if _fmt still resolves it, a branch shadows
    the entry. Exceptions list the names where the DUAL entry is the
    design (the formatter handles the multi-arg form and delegates the
    plain form to the rename)."""
    allowed = {
        "splitByChar", "JSONExtractString", "notEmpty",
        "trimBoth", "trimLeft", "trimRight",
    }
    shadowed = []
    for n in list(_SIMPLE_RENAMES):
        if n in allowed:
            continue
        saved = _SIMPLE_RENAMES.pop(n)
        try:
            if _fmt(n) is not None:
                shadowed.append(n)
        except Exception:
            shadowed.append(n)  # branch exists and tried to build
        finally:
            _SIMPLE_RENAMES[n] = saved
    assert not shadowed, (
        "dialect invariant: these names are in _SIMPLE_RENAMES but a "
        f"_fmt branch shadows them — remove the dead rename: {shadowed}"
    )


_assert_no_shadowed_renames()
