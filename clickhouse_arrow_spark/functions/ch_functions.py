"""ClickHouse scalar/aggregate function names -> Spark Column expressions.

The reference exercises ClickHouse functions through SQL text (e.g.
`toYYYYMM` in partition expressions, clickhouse-arrow/src/lib.rs:53, and
the DDL tests). This module is the compatibility shim: each function is
implemented on `pyspark.sql.functions` built-ins so expressions stay
JVM-side inside whole-stage codegen — never Python UDFs.

Only semantics are ported; implementations are Spark-native.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "to_yyyymm",
    "to_yyyymmdd",
    "to_start_of_month",
    "to_start_of_day",
    "to_start_of_hour",
    "to_date",
    "to_year",
    "to_month",
    "to_day_of_month",
    "to_hour",
    "if_",
    "multi_if",
    "uniq",
    "uniq_exact",
    "uniq_state",
    "uniq_merge",
    "count_if",
    "sum_if",
    "avg_if",
    "arg_max",
    "arg_min",
    "quantile",
    "group_array",
    "any_value",
    "halt_never",  # guard marker
    "intDiv",
    "modulo",
    "empty",
    "not_empty",
    "concat_ws_safe",
    "splitByChar",
    "arrayJoin",
    "length_",
    "lower_utf8",
    "upper_utf8",
    "ipv6_string_to_num",
    "ipv6_num_to_string",
    "to_ipv6",
    "is_ipv6_string",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- date/time (partition-expression family, schema.rs PARTITION BY) --------

def to_yyyymm(col) -> Column:
    """toYYYYMM(d) -> Int32 like 199703 (used in PARTITION BY,
    reference src/lib.rs:53)."""
    return (F.year(_c(col)) * 100 + F.month(_c(col))).cast("int")


def to_yyyymmdd(col) -> Column:
    return (
        F.year(_c(col)) * 10000 + F.month(_c(col)) * 100 + F.dayofmonth(_c(col))
    ).cast("int")


def to_start_of_month(col) -> Column:
    return F.date_trunc("month", _c(col))


def to_start_of_day(col) -> Column:
    return F.date_trunc("day", _c(col))


def to_start_of_hour(col) -> Column:
    return F.date_trunc("hour", _c(col))


def to_date(col) -> Column:
    return _c(col).cast("date")


def to_year(col) -> Column:
    return F.year(_c(col))


def to_month(col) -> Column:
    return F.month(_c(col))


def to_day_of_month(col) -> Column:
    return F.dayofmonth(_c(col))


def to_hour(col) -> Column:
    return F.hour(_c(col))


# -- conditionals -----------------------------------------------------------

def if_(cond: Column, then, otherwise) -> Column:
    """ClickHouse if(cond, a, b)."""
    return F.when(cond, then).otherwise(otherwise)


def multi_if(*args) -> Column:
    """multiIf(c1, v1, c2, v2, ..., default)."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise ValueError("multi_if needs cond/value pairs plus a default")
    default = args[-1]
    pairs = list(zip(args[:-1:2], args[1:-1:2]))
    expr = F.when(pairs[0][0], pairs[0][1])
    for cond, val in pairs[1:]:
        expr = expr.when(cond, val)
    return expr.otherwise(default)


# -- aggregates -------------------------------------------------------------

def uniq(col) -> Column:
    """uniq() — approximate distinct (HLL++)."""
    return F.approx_count_distinct(_c(col))


def uniq_exact(col) -> Column:
    return F.countDistinct(_c(col))


def uniq_state(col, lg_k: int = 12) -> Column:
    """uniqState() — MERGEABLE distinct-count sketch (the
    AggregateFunction(uniq, T) state type, reference
    clickhouse-arrow/src/native/types.rs:120-133). Spark's native
    mergeable HLL: returns the sketch as binary; re-aggregate with
    :func:`uniq_merge`. Pre-aggregate once per partition/day, merge at
    query time — the 100 TB rollup pattern."""
    return F.hll_sketch_agg(_c(col), F.lit(lg_k))


def uniq_merge(state_col) -> Column:
    """uniqMerge() — merge uniqState sketches and estimate the distinct
    count (ClickHouse uniqMerge(AggregateFunction(uniq, T)))."""
    return F.hll_sketch_estimate(F.hll_union_agg(_c(state_col)))


def count_if(cond: Column) -> Column:
    return F.count_if(cond)


def sum_if(col, cond: Column) -> Column:
    return F.sum(F.when(cond, _c(col)).otherwise(F.lit(0)))


def avg_if(col, cond: Column) -> Column:
    return F.avg(F.when(cond, _c(col)))


def arg_max(value, by) -> Column:
    return F.max_by(_c(value), _c(by))


def arg_min(value, by) -> Column:
    return F.min_by(_c(value), _c(by))


def quantile(col, q: float) -> Column:
    """quantile(q)(x) — exact interpolated (ClickHouse quantileExact)."""
    return F.percentile(_c(col), F.lit(q))


def group_array(col) -> Column:
    return F.collect_list(_c(col))


def any_value(col) -> Column:
    return F.any_value(_c(col))


# -- arithmetic / misc ------------------------------------------------------

def intDiv(a, b) -> Column:
    return F.expr(f"CAST({a} AS BIGINT) DIV CAST({b} AS BIGINT)") if isinstance(
        a, str
    ) else (_c(a).cast("long") / _c(b).cast("long")).cast("long")


def modulo(a, b) -> Column:
    return _c(a) % _c(b)


def empty(col) -> Column:
    return F.length(_c(col)) == 0


def not_empty(col) -> Column:
    return F.length(_c(col)) > 0


def concat_ws_safe(sep: str, *cols) -> Column:
    return F.concat_ws(sep, *[_c(c) for c in cols])


def splitByChar(sep: str, col) -> Column:
    import re

    return F.split(_c(col), re.escape(sep))


def arrayJoin(col) -> Column:
    """arrayJoin == explode (produces one row per element)."""
    return F.explode(_c(col))


def length_(col) -> Column:
    return F.length(_c(col))


def lower_utf8(col) -> Column:
    return F.lower(_c(col))


def upper_utf8(col) -> Column:
    return F.upper(_c(col))


def halt_never() -> Column:
    """Marker used by tests to assert the shim module imported."""
    return F.lit(True)


# -- geo family (clickhouse-arrow ships these names verbatim to the
#    server; SURVEY §2.3) -------------------------------------------------

#: ClickHouse's sphere radius for greatCircleDistance (meters).
_CH_EARTH_RADIUS_M = 6372797.560856

_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def great_circle_distance(lon1, lat1, lon2, lat2) -> Column:
    """`greatCircleDistance(lon1, lat1, lon2, lat2)` -> meters on the
    sphere ClickHouse uses (R=6372797.560856m), haversine formula —
    pure JVM arithmetic."""
    dlat = F.radians(_c(lat2) - _c(lat1)) / 2
    dlon = F.radians(_c(lon2) - _c(lon1)) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(_c(lat1)))
        * F.cos(F.radians(_c(lat2)))
        * F.sin(dlon)
        * F.sin(dlon)
    )
    return F.lit(2.0 * _CH_EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def great_circle_angle(lon1, lat1, lon2, lat2) -> Column:
    """`greatCircleAngle(...)` -> central angle in degrees."""
    return F.degrees(
        great_circle_distance(lon1, lat1, lon2, lat2)
        / F.lit(_CH_EARTH_RADIUS_M)
    )


def geohash_encode(lon, lat, precision: int = 12) -> Column:
    """`geohashEncode(longitude, latitude[, precision])` — standard
    base32 geohash. Built by unrolled JVM bit arithmetic (quantize each
    axis, interleave bits lon-first, emit 5-bit base32 chars): no
    Python, no UDF; the unrolled expression is constant-folded per
    precision."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in [1, 12]")
    total_bits = 5 * precision
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    lon_q = F.floor(
        (_c(lon).cast("double") + F.lit(180.0)) / F.lit(360.0)
        * F.lit(float(1 << lon_bits))
    ).cast("long")
    lat_q = F.floor(
        (_c(lat).cast("double") + F.lit(90.0)) / F.lit(180.0)
        * F.lit(float(1 << lat_bits))
    ).cast("long")
    # clamp the lon=180/lat=90 edge into the last cell
    lon_q = F.least(lon_q, F.lit((1 << lon_bits) - 1))
    lat_q = F.least(lat_q, F.lit((1 << lat_bits) - 1))
    # interleave: bit i of lon -> combined bit 2i+1 ... counting from
    # the LSB of the combined word; lon owns the even "steps" starting
    # at the MSB, which is bit (total_bits-1) = odd from LSB when
    # total_bits is even. Enumerate explicitly to stay readable:
    combined = F.lit(0).cast("long")
    for step in range(total_bits):
        # step 0 = MSB of the geohash = highest lon bit
        target = total_bits - 1 - step
        if step % 2 == 0:
            src = lon_bits - 1 - step // 2
            bit = F.shiftright(lon_q, src).bitwiseAND(F.lit(1).cast("long"))
        else:
            src = lat_bits - 1 - step // 2
            bit = F.shiftright(lat_q, src).bitwiseAND(F.lit(1).cast("long"))
        combined = combined + F.shiftleft(bit.cast("long"), target)
    chars = [
        F.substring(
            F.lit(_GEOHASH_B32),
            F.shiftright(combined, 5 * (precision - 1 - j)).bitwiseAND(F.lit(31).cast("long"))
            .cast("int")
            + F.lit(1),
            F.lit(1),
        )
        for j in range(precision)
    ]
    return F.concat(*chars)


def geohash_decode(geohash) -> Column:
    """`geohashDecode(s)` -> struct(longitude, latitude): the center of
    the geohash cell. Arithmetic inverse of :func:`geohash_encode` —
    flatten the base32 chars to a bit array, then the de-interleaved
    quantized integers are plain weighted sums (linear-size expression;
    handles variable-length input, no Python)."""
    g = _c(geohash)
    bits5 = F.filter(
        F.transform(
            F.split(g, ""),
            lambda ch: (F.instr(F.lit(_GEOHASH_B32), ch) - 1).cast("long"),
        ),
        lambda v: v >= 0,
    )
    bits = F.flatten(
        F.transform(
            bits5,
            lambda five: F.array(
                *[
                    F.shiftright(five, s).bitwiseAND(F.lit(1).cast("long")).cast("double")
                    for s in (4, 3, 2, 1, 0)
                ]
            ),
        )
    )
    n = F.size(bits).cast("double")
    lon_bits = F.ceil(n / 2).cast("double")
    lat_bits = F.floor(n / 2).cast("double")
    # geohash bit step s (0 = MSB): even steps are longitude bits with
    # weight 2^(lon_bits-1-s/2); odd steps latitude, 2^(lat_bits-1-(s-1)/2).
    # Weighted sums stay exact in doubles (<= 2^30 per axis at p=12).
    lon_q = F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.greatest(F.size(bits) - 1, F.lit(0))),
            lambda b, i: F.when(
                i % 2 == 0,
                b * F.pow(F.lit(2.0), lon_bits - 1 - (i / 2).cast("int")),
            ).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lat_q = F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.greatest(F.size(bits) - 1, F.lit(0))),
            lambda b, i: F.when(
                i % 2 == 1,
                b * F.pow(F.lit(2.0), lat_bits - 1 - ((i - 1) / 2).cast("int")),
            ).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lon = F.lit(-180.0) + (lon_q + 0.5) * F.lit(360.0) / F.pow(F.lit(2.0), lon_bits)
    lat = F.lit(-90.0) + (lat_q + 0.5) * F.lit(180.0) / F.pow(F.lit(2.0), lat_bits)
    return F.struct(lon.alias("longitude"), lat.alias("latitude"))


def point_in_polygon(x, y, vertices) -> Column:
    """`pointInPolygon((x, y), [(x1,y1), ...])` — even-odd ray casting
    as a pure JVM fold over the vertex array (struct<x,y> elements,
    closing edge implicit). No Python, no UDF: one aggregate() whose
    state is (crossing parity, previous vertex).

    Boundary behavior follows the raw crossing rule (points exactly ON
    an edge may land either side — same caveat as CH's non-strict
    default).
    """
    px = _c(x).cast("double")
    py = _c(y).cast("double")
    verts = _c(vertices)
    init = F.struct(
        F.lit(False).alias("inside"),
        F.element_at(verts, -1).getField("x").cast("double").alias("prevx"),
        F.element_at(verts, -1).getField("y").cast("double").alias("prevy"),
    )

    def step(acc, v):
        vx = v.getField("x").cast("double")
        vy = v.getField("y").cast("double")
        crosses = ((vy > py) != (acc.getField("prevy") > py)) & (
            px
            < (acc.getField("prevx") - vx) * (py - vy)
            / (acc.getField("prevy") - vy)
            + vx
        )
        return F.struct(
            F.when(crosses, ~acc.getField("inside"))
            .otherwise(acc.getField("inside"))
            .alias("inside"),
            vx.alias("prevx"),
            vy.alias("prevy"),
        )

    folded = F.aggregate(verts, init, step)
    # degenerate polygons (< 3 vertices) contain nothing
    return F.when(F.size(verts) < 3, F.lit(False)).otherwise(
        folded.getField("inside")
    )


# ---- IPv6 family (Arrow-batched pandas UDFs) ---------------------------
#
# ClickHouse's IPv6 functions (reference dialect surface; the binding
# exposes them through SQL) parse/format RFC 4291 addresses. There is no
# JVM-side IPv6 codec in Spark SQL, so these four route through Python's
# `ipaddress` module as pandas UDFs — Arrow-batched, vectorized transfer,
# never row-at-a-time Python. They are deliberately OFF the SQL dialect's
# hot path: the dialect refuses IPv6 names with a recipe pointing here.

def _ipv6_udfs():
    import ipaddress

    from pyspark.sql.functions import pandas_udf

    # note: the module-level `from __future__ import annotations` turns
    # hints into strings the UDF type-inferencer cannot resolve against
    # the local pandas import, so the explicit (func, returnType) form
    # is used instead of hint inference
    def _to_num(s):
        def conv(v):
            if v is None:
                return None
            try:
                return ipaddress.IPv6Address(v).packed
            except (ipaddress.AddressValueError, ValueError):
                # CH IPv6StringToNum also accepts IPv4 dotted form,
                # mapping it into ::ffff:a.b.c.d
                try:
                    v4 = ipaddress.IPv4Address(v)
                    return ipaddress.IPv6Address(
                        "::ffff:" + str(v4)
                    ).packed
                except (ipaddress.AddressValueError, ValueError):
                    return None

        return s.map(conv)

    def _to_str(b):
        def conv(v):
            if v is None:
                return None
            try:
                return str(ipaddress.IPv6Address(bytes(v)))
            except (ipaddress.AddressValueError, ValueError):
                return None

        return b.map(conv)

    def _is_v6(s):
        def conv(v):
            if v is None:
                return None
            try:
                ipaddress.IPv6Address(v)
                return True
            except (ipaddress.AddressValueError, ValueError):
                return False

        return s.map(conv)

    return (
        pandas_udf(_to_num, "binary"),
        pandas_udf(_to_str, "string"),
        pandas_udf(_is_v6, "boolean"),
    )


def ipv6_string_to_num(col) -> Column:
    """`IPv6StringToNum(s)` — textual IPv6 (or IPv4, mapped into the
    ::ffff: space like CH) to its 16-byte packed form; NULL when
    malformed (the OrNull posture — parquet columns carry no CH throw)."""
    return _ipv6_udfs()[0](_c(col))


def ipv6_num_to_string(col) -> Column:
    """`IPv6NumToString(b)` — 16-byte packed IPv6 to the RFC 5952
    compressed textual form (`::1`, not the expanded spelling)."""
    return _ipv6_udfs()[1](_c(col))


def to_ipv6(col) -> Column:
    """`toIPv6(s)` — normalize a textual address to RFC 5952 canonical
    text (round-trips through the packed form)."""
    return _ipv6_udfs()[1](_ipv6_udfs()[0](_c(col)))


def is_ipv6_string(col) -> Column:
    """`isIPv6String(s)` — strict IPv6 syntax check (IPv4 dotted text is
    NOT IPv6, matching CH)."""
    return _ipv6_udfs()[2](_c(col))


def html_unescape(col) -> Column:
    """`decodeHTMLComponent` analogue: full HTML5 entity decoding via
    the stdlib `html` module, Arrow-batched (the SQL dialect's
    decodeXMLComponent covers the five XML entities codegen-side; this
    covers the other ~2000 named entities)."""
    import html

    from pyspark.sql.functions import pandas_udf

    _unescape = pandas_udf(
        lambda s: s.map(lambda v: None if v is None else html.unescape(v)),
        "string",
    )
    return _unescape(col)


def unicode_normalize(col, form: str = "NFC") -> Column:
    """`normalizeUTF8NFC/NFD/NFKC/NFKD` analogue: stdlib
    `unicodedata.normalize`, Arrow-batched (one pandas map per batch —
    the same posture as html_unescape; there is no JVM ICU normalizer
    exposed to Spark SQL)."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    form = form.upper()
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    _norm = pandas_udf(
        lambda s: s.map(
            lambda v: None if v is None else unicodedata.normalize(form, v)
        ),
        "string",
    )
    return _norm(col)


def _unicode_normalize_fn(form: str):
    """Plain-python row fn for session UDF registration (dialect path)."""
    import unicodedata

    def fn(v):
        return None if v is None else unicodedata.normalize(form, v)

    return fn


_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _base58_encode_py(s: str) -> str:
    """Bitcoin-alphabet base58 of the UTF-8 bytes (CH base58Encode)."""
    b = s.encode("utf-8")
    n = int.from_bytes(b, "big") if b else 0
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    # leading zero bytes encode as leading '1's
    pad = len(b) - len(b.lstrip(b"\x00"))
    return "1" * pad + "".join(reversed(out))


def _base58_decode_py(s: str):
    """Inverse of _base58_encode_py; None on an invalid character
    (tryBase58Decode shape — the strict form raises upstream)."""
    n = 0
    for ch in s:
        d = _B58_ALPHABET.find(ch)
        if d < 0:
            return None
        n = n * 58 + d
    pad = len(s) - len(s.lstrip("1"))
    body = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    try:
        return (b"\x00" * pad + body).decode("utf-8")
    except UnicodeDecodeError:
        return None


#: name -> (python row fn, spark return type) for the lazily
#: session-registered scalar UDF family (client._ensure_py_udfs);
#: every entry is Arrow-batched via pandas_udf at registration
def _py_udf_inventory():
    import math

    def _s(fn):  # None-propagating string fn
        return lambda v: None if v is None else fn(v)

    def _punycode_enc(v):
        return v.encode("punycode").decode("ascii")

    def _punycode_dec(v):
        try:
            return v.encode("ascii").decode("punycode")
        except Exception:
            return None

    def _idna_enc(v):
        try:
            return v.encode("idna").decode("ascii")
        except Exception:
            return None

    def _idna_dec(v):
        try:
            return v.encode("ascii").decode("idna")
        except Exception:
            return None

    def _num(fn):
        def inner(v):
            if v is None:
                return None
            try:
                return float(fn(float(v)))
            except (ValueError, OverflowError):
                return None
        return inner

    def _strict(fn, label):
        # CH's non-try forms THROW on invalid input. Raising inside
        # the UDF (not via SQL raise_error, which constant-folds for
        # literal messages) keeps the error lazy and row-accurate.
        def inner(v):
            if v is None:
                return None
            out = fn(v)
            if out is None:
                raise ValueError(f"{label}: invalid input {v!r}")
            return out
        return inner

    return {
        "ch_erf": (_num(math.erf), "double"),
        "ch_erfc": (_num(math.erfc), "double"),
        "ch_geohash_decode": (_geohash_decode_py, "array<double>"),
        "ch_hilbert_decode2": (_hilbert_decode2_py, "array<bigint>"),
        "ch_base58_encode": (_s(_base58_encode_py), "string"),
        "ch_base58_decode": (_s(_base58_decode_py), "string"),
        "ch_base58_decode_strict": (
            _strict(_base58_decode_py, "base58Decode"), "string"),
        "ch_punycode_encode": (_s(_punycode_enc), "string"),
        "ch_punycode_decode": (_s(_punycode_dec), "string"),
        "ch_punycode_decode_strict": (
            _strict(_punycode_dec, "punycodeDecode"), "string"),
        "ch_idna_encode": (_s(_idna_enc), "string"),
        "ch_idna_encode_strict": (
            _strict(_idna_enc, "idnaEncode"), "string"),
        "ch_idna_decode": (_s(_idna_dec), "string"),
        "ch_idna_decode_strict": (
            _strict(_idna_dec, "idnaDecode"), "string"),
        "ch_lgamma": (_num(math.lgamma), "double"),
        "ch_tgamma": (_num(math.gamma), "double"),
        "ch_stem_en": (_s(_porter_stem), "string"),
        "ch_series_period_fft": (_series_period_fft, "double"),
    }


def _py_udf_inventory_multi():
    """Multi-argument Arrow-batched scalar UDFs (wave 22): name ->
    (fn, return_type, nargs), registered by the same lazy client hook
    as the single-arg inventory."""
    return {
        "ch_json_merge_patch": (_json_merge_patch, "string", 2),
        "ch_array_levenshtein": (_array_levenshtein, "bigint", 2),
        "ch_series_tukey": (_series_tukey, "array<double>", 4),
        "ch_array_auc": (_array_auc, "double", 2),
        "ch_jaro": (_pair(_td()._jaro_py), "double", 2),
        "ch_jaro_winkler": (_pair(_td()._jw_py), "double", 2),
        "ch_damerau_lev": (_pair(_td()._dl_py), "bigint", 2),
        "ch_jump_hash": (_jump_hash_py, "int", 2),
        "ch_t_sf": (_t_sf_py, "double", 2),
        "ch_throw_if": (_throw_if_py, "int", 2),
        "ch_hilbert_encode2": (_hilbert_encode2_py, "bigint", 2),
        "ch_geohash_encode": (_geohash_encode_py, "string", 3),
    }


def _td():
    """The text_distance kernels are the single source of truth for
    the string metrics (true Damerau-Levenshtein, oracle-pinned Jaro);
    the SQL-name UDFs delegate instead of re-deriving them."""
    from clickhouse_arrow_spark.functions import text_distance

    return text_distance


def _pair(fn):
    return lambda a, b: None if a is None or b is None else fn(a, b)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the regularized incomplete beta
    (modified Lentz's method — the published Numerical Recipes
    formulation, implemented from the recurrence)."""
    MAXIT, EPS, FPMIN = 300, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def _betai(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1.0 - x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def _t_sf_py(t, df):
    """Two-sided Student-t p-value: P(|T_df| >= |t|) =
    I_{df/(df+t^2)}(df/2, 1/2) — the exact CDF identity, not the
    large-sample normal approximation."""
    if t is None or df is None:
        return None
    t = float(t)
    df = float(df)
    if df <= 0:
        return None
    return _betai(df / 2.0, 0.5, df / (df + t * t))


def _throw_if_py(cond, msg):
    """CH throwIf: raise at row time when the condition is truthy,
    else 0. Raising inside the UDF keeps the error lazy — SQL
    raise_error with foldable arguments throws at plan time."""
    if cond:
        raise ValueError(f"throwIf: {msg}")
    return 0


def _jump_hash_py(key, buckets):
    """Jump consistent hash (Lamping & Veach 2014), the exact loop CH
    runs: 64-bit LCG step, bucket via the 2^31 double trick. Doc value
    jumpConsistentHash(256, 4) = 3 pins the arithmetic."""
    if key is None or buckets is None:
        return None
    key = int(key) & 0xFFFFFFFFFFFFFFFF
    n = int(buckets)
    b, j = -1, 0
    while j < n:
        b = j
        key = (key * 2862933555777941757 + 1) & 0xFFFFFFFFFFFFFFFF
        j = int((b + 1) * ((1 << 31) / ((key >> 33) + 1)))
    return b


def _hilbert_encode2_py(x, y):
    """2-D Hilbert index, 32 bits per coordinate. CH's curve is the
    standard one with the coordinate roles swapped — the doc value
    hilbertEncode(3, 4) = 31 equals xy2d(x=4, y=3) in the classic
    Wikipedia formulation; encode/decode here are exact mutual
    inverses under that orientation."""
    if x is None or y is None:
        return None
    # CH orientation: first arg is the 'y' of the classic algorithm
    cx, cy = int(y), int(x)
    d = 0
    s = 1 << 31
    while s > 0:
        rx = 1 if (cx & s) > 0 else 0
        ry = 1 if (cy & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                cx = s - 1 - cx
                cy = s - 1 - cy
            cx, cy = cy, cx
        s >>= 1
    return d


def _hilbert_decode2_py(d):
    """Inverse of _hilbert_encode2_py: returns [first, second] in CH
    argument order (hilbertDecode(2, 31) = (3, 4))."""
    if d is None:
        return None
    t = int(d)
    cx = cy = 0
    s = 1
    while s < (1 << 32):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                cx = s - 1 - cx
                cy = s - 1 - cy
            cx, cy = cy, cx
        cx += s * rx
        cy += s * ry
        t //= 4
        s *= 2
    return [cy, cx]


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_encode_py(lon, lat, precision):
    """Geohash (Niemeyer 2008) of (longitude, latitude). CH's
    geohashEncode: precision 0 or out of [1,12] means 12; ties at an
    interval midpoint go to the upper half (doc value
    geohashEncode(-5.60302734375, 42.593994140625, 0) =
    'ezs42d000000')."""
    if lon is None or lat is None:
        return None
    p = int(precision) if precision is not None else 12
    if p < 1 or p > 12:
        p = 12
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    out = []
    even = True
    acc = 0
    bits = 0
    while len(out) < p:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                acc = (acc << 1) | 1
                lon_lo = mid
            else:
                acc <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                acc = (acc << 1) | 1
                lat_lo = mid
            else:
                acc <<= 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_GEOHASH32[acc])
            acc = 0
            bits = 0
    return "".join(out)


def _geohash_decode_py(s):
    """Inverse of _geohash_encode_py: cell-center [longitude,
    latitude] (geohashDecode('ezs42') = (-5.60302734375,
    42.60498046875)). Invalid characters decode as 0 bits, like CH's
    tolerant reader."""
    if s is None:
        return None
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    even = True
    for ch in s:
        cd = _GEOHASH32.find(ch)
        if cd < 0:
            cd = 0
        for mask in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_lo + lon_hi) / 2
                if cd & mask:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if cd & mask:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return [(lon_lo + lon_hi) / 2, (lat_lo + lat_hi) / 2]


def _array_auc(scores, labels):
    """ROC AUC over paired score/label arrays (CH arrayAUC): the
    Mann-Whitney form with average ranks for ties."""
    if scores is None or labels is None:
        return None
    import numpy as np
    import pandas as pd

    s = np.asarray(list(scores), dtype="float64")
    y = np.asarray(list(labels), dtype="float64") > 0
    p = int(y.sum())
    n = len(s) - p
    if p == 0 or n == 0:
        return float("nan")
    ranks = pd.Series(s).rank(method="average").to_numpy()
    return float((ranks[y].sum() - p * (p + 1) / 2.0) / (p * n))


def _series_tukey(s, minp, maxp, k):
    """Tukey-fence outlier scores (CH seriesOutliersDetectTukey):
    per-element score = distance beyond the nearer fence
    (q_min - k*IQR / q_max + k*IQR, linear-interpolated percentiles),
    0.0 inside the fences. Needs >= 4 points, like CH."""
    if s is None:
        return None
    import numpy as np

    x = np.asarray(list(s), dtype="float64")
    if x.size < 4:
        raise ValueError(
            "seriesOutliersDetectTukey: series needs at least 4 points"
        )
    q1 = float(np.percentile(x, float(minp)))
    q3 = float(np.percentile(x, float(maxp)))
    iqr = q3 - q1
    lo, hi = q1 - float(k) * iqr, q3 + float(k) * iqr
    return [
        float(v - lo) if v < lo else (float(v - hi) if v > hi else 0.0)
        for v in x
    ]


def _json_merge_patch(target, patch):
    """RFC 7386 JSON Merge Patch (CH JSONMergePatch): null patch
    members delete, objects merge recursively, anything else replaces.
    Invalid JSON raises, as CH does."""
    import json

    if target is None or patch is None:
        return None

    def merge(tv, pv):
        if not isinstance(pv, dict):
            return pv
        out = dict(tv) if isinstance(tv, dict) else {}
        for k, v in pv.items():
            if v is None:
                out.pop(k, None)
            else:
                out[k] = merge(out.get(k), v)
        return out

    try:
        t, p = json.loads(target), json.loads(patch)
    except json.JSONDecodeError as e:
        raise ValueError(f"JSONMergePatch: invalid JSON input: {e}")
    return json.dumps(
        merge(t, p), separators=(",", ":"), ensure_ascii=False
    )


def _array_levenshtein(a, b):
    """Levenshtein distance between two ARRAYS (CH
    arrayLevenshteinDistance): classic O(len(a)*len(b)) DP with a
    rolling row."""
    if a is None or b is None:
        return None
    a, b = list(a), list(b)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (0 if x == y else 1),
            ))
        prev = cur
    return prev[-1]


def _series_period_fft(s):
    """Dominant period of a numeric series via the real FFT magnitude
    peak (CH seriesPeriodDetectFFT shape: period = n / k for the
    strongest non-DC frequency bin k). Needs >= 4 points, like CH."""
    if s is None:
        return None
    import numpy as np

    x = np.asarray(list(s), dtype="float64")
    if x.size < 4:
        raise ValueError(
            "seriesPeriodDetectFFT: series needs at least 4 points"
        )
    mags = np.abs(np.fft.rfft(x - x.mean()))
    if mags.size <= 1:
        return 0.0
    k = int(np.argmax(mags[1:])) + 1
    return float(x.size / k)


def _porter_stem(word: str) -> str:
    """Porter stemming algorithm (Porter 1980, 'An algorithm for
    suffix stripping') implemented from the published spec — the
    English branch of ClickHouse's stem('en', s). Lowercases first
    (stemming is case-free); words of length <= 2 pass through."""
    w = word.lower()
    if len(w) <= 2:
        return w

    def is_cons(s, i):
        c = s[i]
        if c in "aeiou":
            return False
        if c == "y":
            return i == 0 or not is_cons(s, i - 1)
        return True

    def measure(s):
        # number of VC sequences in the [C](VC)^m[V] form
        m, i, n = 0, 0, len(s)
        while i < n and is_cons(s, i):
            i += 1
        while i < n:
            while i < n and not is_cons(s, i):
                i += 1
            if i >= n:
                break
            m += 1
            while i < n and is_cons(s, i):
                i += 1
        return m

    def has_vowel(s):
        return any(not is_cons(s, i) for i in range(len(s)))

    def ends_double_cons(s):
        return (len(s) >= 2 and s[-1] == s[-2] and is_cons(s, len(s) - 1))

    def ends_cvc(s):
        return (
            len(s) >= 3
            and is_cons(s, len(s) - 3)
            and not is_cons(s, len(s) - 2)
            and is_cons(s, len(s) - 1)
            and s[-1] not in "wxy"
        )

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag1b = False
    if w.endswith("eed"):
        if measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and has_vowel(w[:-2]):
        w, flag1b = w[:-2], True
    elif w.endswith("ing") and has_vowel(w[:-3]):
        w, flag1b = w[:-3], True
    if flag1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif measure(w) == 1 and ends_cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
        "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
        "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not (stem and stem[-1] in "st"):
                break
            if measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = measure(w[:-1])
        if m > 1 or (m == 1 and not ends_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if measure(w) > 1 and ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w
