"""Randomized batteries for the wave-30/32 semantics: every case is
checked against an INDEPENDENT pure-Python reference (datetime
arithmetic, two's-complement math, Python's banker's round, an
interval-union sweep), executed as ONE batched Spark query per
property so hundreds of random cases cost one JVM round-trip."""

from __future__ import annotations

import datetime as dt
import random

SEED = 0x30C0FFEE


def _rand_dates(rng, n):
    base = dt.date(1990, 1, 1)
    return [
        (base + dt.timedelta(days=rng.randrange(0, 20000)),
         base + dt.timedelta(days=rng.randrange(0, 20000)))
        for _ in range(n)
    ]


def test_date_diff_matches_python_reference(client):
    rng = random.Random(SEED)
    pairs = _rand_dates(rng, 300)
    vals = ", ".join(
        f"(DATE '{a}', DATE '{b}')" for a, b in pairs
    )
    rows = client.query_ch(
        "SELECT dateDiff('month', a, b) AS mo, "
        "dateDiff('day', a, b) AS dd, "
        "dateDiff('week', a, b) AS wk, "
        "dateDiff('year', a, b) AS yr, "
        "dateDiff('quarter', a, b) AS qq "
        f"FROM (SELECT * FROM VALUES {vals} AS t(a, b))"
    ).collect()
    for (a, b), r in zip(pairs, rows):
        assert r.mo == (b.year * 12 + b.month) - (a.year * 12 + a.month)
        assert r.dd == (b - a).days
        # week boundaries are Mondays
        am = a - dt.timedelta(days=a.weekday())
        bm = b - dt.timedelta(days=b.weekday())
        assert r.wk == (bm - am).days // 7
        assert r.yr == b.year - a.year
        aq, bq = (a.month - 1) // 3, (b.month - 1) // 3
        assert r.qq == (b.year * 4 + bq) - (a.year * 4 + aq)


def test_int_cast_wrap_matches_twos_complement(client):
    rng = random.Random(SEED + 1)
    vals = [rng.randrange(-(2 ** 40), 2 ** 40) for _ in range(300)]
    body = ", ".join(f"({v})" for v in vals)
    rows = client.query_ch(
        "SELECT toUInt8(v) AS u8, toInt8(v) AS i8, "
        "toUInt16(v) AS u16, toInt16(v) AS i16, "
        "toUInt32(v) AS u32, toInt32(v) AS i32 "
        f"FROM (SELECT * FROM VALUES {body} AS t(v))"
    ).collect()
    for v, r in zip(vals, rows):
        assert r.u8 == v % 256
        assert r.i8 == (v + 128) % 256 - 128
        assert r.u16 == v % 65536
        assert r.i16 == (v + 32768) % 65536 - 32768
        assert r.u32 == v % 2 ** 32
        assert r.i32 == (v + 2 ** 31) % 2 ** 32 - 2 ** 31


def test_round_matches_python_bankers(client):
    # quarters are exact in binary, so every tie is a true tie
    vals = [m / 4.0 for m in range(-60, 61)]
    body = ", ".join(f"(CAST({v!r} AS DOUBLE))" for v in vals)
    rows = client.query_ch(
        "SELECT round(v) AS r0, round(v, 1) AS r1 "
        f"FROM (SELECT * FROM VALUES {body} AS t(v))"
    ).collect()
    for v, r in zip(vals, rows):
        assert float(r.r0) == float(round(v)), v
        assert float(r.r1) == round(v, 1), v


def test_bit_shift_matches_reference(client):
    rng = random.Random(SEED + 2)
    cases = [(rng.randrange(0, 2 ** 31), rng.randrange(0, 80))
             for _ in range(200)]
    body = ", ".join(f"({v}, {s})" for v, s in cases)
    rows = client.query_ch(
        "SELECT bitShiftLeft(v, s) AS l, bitShiftRight(v, s) AS r "
        f"FROM (SELECT * FROM VALUES {body} AS t(v, s))"
    ).collect()
    mask = (1 << 64) - 1
    for (v, s), r in zip(cases, rows):
        if s >= 64:
            assert (r.l, r.r) == (0, 0)
        else:
            expect_l = (v << s) & mask
            if expect_l >= 1 << 63:
                expect_l -= 1 << 64
            assert r.l == expect_l
            assert r.r == v >> s


def test_interval_length_sum_matches_union_sweep(client):
    rng = random.Random(SEED + 3)
    groups = {}
    for g in range(20):
        segs = []
        for _ in range(rng.randrange(1, 15)):
            s = rng.randrange(0, 1000)
            e = s + rng.randrange(-5, 50)
            segs.append((s, e))
        groups[g] = segs
    body = ", ".join(
        f"({g}, {s}, {e})" for g, segs in groups.items()
        for s, e in segs
    )
    rows = client.query_ch(
        "SELECT g, intervalLengthSum(s, e) AS ils "
        f"FROM (SELECT * FROM VALUES {body} AS t(g, s, e)) "
        "GROUP BY g ORDER BY g"
    ).collect()

    def union_len(segs):
        total, cur_end = 0, None
        for s, e in sorted(segs):
            if e <= s:
                continue
            if cur_end is None or s >= cur_end:
                total += e - s
                cur_end = e
            else:
                total += max(e - cur_end, 0)
                cur_end = max(cur_end, e)
        return total

    for r in rows:
        assert float(r.ils) == union_len(groups[r.g]), r.g
