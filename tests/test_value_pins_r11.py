"""Round-11 value pins for property-gate corpus rows (VERDICT r10 task
#5): each test recomputes the operator's EXACT output at sf0.001 with
an independent implementation (numpy / pure-Python left-fold / DuckDB
load, never the operator's own code path) and compares value-for-value
— the spot pins that upgrade the honest-but-weaker invariant gates.

Arithmetic discipline: where the Spark operator folds left-to-right
(aggregate()), the replica uses an explicit Python float loop — IEEE
double left-fold is bit-identical across JVM and CPython — so rounded
comparisons carry no hidden tolerance.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_np():
    """Embeddings loaded OUTSIDE Spark (DuckDB) as (ids, float64)."""
    import duckdb

    con = duckdb.connect()
    df = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchdf()
    ids = df["vec_id"].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    con.close()
    return ids, mat


def _fold_dot(a, b) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


# ---- kcenter_sample ---------------------------------------------------

def test_kcenter_value_pin(spark, tables, emb_np):
    """Greedy farthest-point replica: seed = min id, then argmax of the
    min euclidean distance to selected centers, ties -> smaller id."""
    from clickhouse_arrow_spark.operators.similarity import kcenter_sample

    ids, mat = emb_np
    k = 8
    sel = [0]
    while len(sel) < k:
        best_i, best_d = None, -1.0
        for i in range(len(ids)):
            dmin = min(
                math.sqrt(
                    sum((float(a) - float(b)) ** 2
                        for a, b in zip(mat[i], mat[j]))
                )
                for j in sel
            )
            if dmin > best_d:
                best_i, best_d = i, dmin
        if best_d <= 0.0:
            break
        sel.append(best_i)
    expected = [int(ids[i]) for i in sel]

    got = kcenter_sample(spark.table("embeddings"), k)
    assert got == expected


# ---- kmeans (deterministic seed + 1 Lloyd iteration) -------------------

def _assign_np(mat, cents):
    """Replica of ivf_assign's ranking: argmin over (-round(dot/cnorm,
    6), cid) — centroid-norm-only cosine, 6dp rounding, cid tie-break."""
    out = []
    for v in mat:
        best = None
        for cid, c in cents:
            cn = math.sqrt(_fold_dot(c, c)) or 1e-30
            key = (-round(_fold_dot(v, c) / cn, 6), cid)
            if best is None or key < best[0]:
                best = (key, cid)
        out.append(best[1])
    return np.array(out)


def test_kmeans_refine_value_pin(spark, tables, emb_np):
    """One Lloyd iteration from the 8 lowest-id seeds: bucket sizes and
    the refined centroids (4dp — cross-partition mean order drift is
    ~1e-13) must match an independent numpy replica."""
    from clickhouse_arrow_spark.operators.similarity import (
        deterministic_centroids,
        ivf_assign,
        kmeans_refine,
    )

    ids, mat = emb_np
    nlist = 8
    cents = [(int(ids[i]), mat[i]) for i in range(nlist)]
    assign = _assign_np(mat, cents)
    exp_sizes = {cid: int((assign == cid).sum()) for cid, _ in cents}
    exp_cents = {
        cid: np.round(
            mat[assign == cid].mean(axis=0).astype(np.float32), 4)
        for cid, _ in cents if exp_sizes[cid] > 0
    }

    emb = spark.table("embeddings")
    seeds = deterministic_centroids(emb, nlist)
    got_sizes = {
        r["centroid_id"]: r["n"]
        for r in ivf_assign(emb, seeds).groupBy("centroid_id")
        .agg(F.count("*").alias("n")).collect()
    }
    assert {k: got_sizes.get(k, 0) for k in exp_sizes} == exp_sizes

    got_cents = {
        r["centroid_id"]: np.round(
            np.asarray(r["centroid_vec"], dtype=np.float32), 4)
        for r in kmeans_refine(emb, seeds, iters=1).collect()
    }
    assert sorted(got_cents) == sorted(exp_cents)
    for cid, vec in exp_cents.items():
        np.testing.assert_array_equal(got_cents[cid], vec)


# ---- int8 quantization --------------------------------------------------

def test_quantize_value_pin(spark, tables, emb_np):
    """Exact int8 codes: round-half-away-from-zero of v/scale*127 with
    scale = max |v| per vector (Spark's ROUND is HALF_UP; numpy's is
    banker's, so the replica rounds explicitly)."""
    from clickhouse_arrow_spark.operators.similarity import (
        quantize_embeddings,
    )

    ids, mat = emb_np
    f32 = mat.astype(np.float32)  # operator reads float32 columns

    def q_np(v):
        scale = max(np.abs(v.astype(np.float64)).max(), 1e-30)
        y = v.astype(np.float64) / scale * 127.0
        return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int8), scale

    rows = (
        quantize_embeddings(spark.table("embeddings"))
        .orderBy("vec_id").collect()
    )
    assert len(rows) == len(ids)
    for r, vid, v in zip(rows, ids, f32):
        assert r["vec_id"] == vid
        exp_q, exp_s = q_np(v)
        assert list(r["qembedding"]) == exp_q.tolist()
        assert r["qscale"] == pytest.approx(exp_s, rel=1e-6)


# ---- PCA eigenvalues ----------------------------------------------------

def test_pca_eigenvalue_pin(spark, tables, emb_np):
    """Top-8 explained variances and the total variance vs a direct
    numpy covariance eigendecomposition (independent derivation: numpy
    cov from raw rows vs the operator's distributed moment sums)."""
    from clickhouse_arrow_spark.operators.projection import pca_fit

    _, mat = emb_np
    cov = np.cov(mat, rowvar=False, ddof=1)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]

    m = pca_fit(spark.table("embeddings"), k=8)
    np.testing.assert_allclose(m.explained_variance, evals, atol=1e-9)
    assert m.total_variance == pytest.approx(float(np.trace(cov)), abs=1e-9)


# ---- exact brute-force top-k (the ann_ivf_recall reference) -------------

def test_brute_force_topk_value_pin(spark, tables, emb_np):
    """Exact cosine top-10 neighbor ids for queries vec_id < 5,
    replicated with left-fold dots + 6dp rounding + (score desc, id asc)
    tie-break — pins the reference side the IVF recall gate trusts."""
    from clickhouse_arrow_spark.operators.similarity import (
        brute_force_topk,
    )

    ids, mat = emb_np
    expected = {}
    for qi in range(5):
        qv = mat[qi]
        qn = math.sqrt(_fold_dot(qv, qv))
        scored = []
        for i in range(len(ids)):
            cn = math.sqrt(_fold_dot(mat[i], mat[i]))
            sim = round(_fold_dot(mat[i], qv) / (cn * qn), 6)
            scored.append((-sim, int(ids[i])))
        scored.sort()
        expected[qi] = [cid for _, cid in scored[:10]]

    emb = spark.table("embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = {}
    for r in brute_force_topk(emb, queries, k=10).collect():
        got.setdefault(r["query_id"], {})[r["rank"]] = r["vec_id"]
    for qi in range(5):
        assert [got[qi][rk] for rk in sorted(got[qi])] == expected[qi]


# ---- first-fit packing ----------------------------------------------------

def test_first_fit_value_pin(spark, tables):
    """Best-fit-decreasing replica (pure Python bisect, independent of
    the operator's pandas path): identical (doc -> pack, seq) for every
    document. Token counts recomputed with an independent regex over
    the raw parquet; the xxhash bucket split is DATA LAYOUT (taken from
    one tiny Spark projection), the packing algorithm inside each
    bucket is what this pins."""
    import bisect
    import re as _re

    import duckdb

    from clickhouse_arrow_spark.operators import packing, text as _t

    con = duckdb.connect()
    raw = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchdf()
    con.close()
    tok_re = _re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")
    tokens = {
        int(r.doc_id): len(tok_re.findall(r.text))
        for r in raw.itertuples()
    }

    tok_df = _t.token_count(spark.table("documents")).select(
        "doc_id", F.col("bpe_tokens").cast("long").alias("tokens")
    )
    buckets = {
        r["doc_id"]: r["b"]
        for r in tok_df.select(
            "doc_id",
            (F.abs(F.xxhash64(F.col("doc_id"))) % 32).alias("b"),
        ).collect()
    }

    budget, stride = 512, 10_000_000
    expected = {}
    for b in sorted(set(buckets.values())):
        docs = sorted(
            [d for d, bb in buckets.items() if bb == b],
            key=lambda d: (-tokens[d], d),
        )
        caps, cap_bins, n_bins = [], [], 0
        pos = {}
        for d in docs:
            eff = max(tokens[d], 1)
            i = bisect.bisect_left(caps, eff)
            if i == len(caps):
                placed = n_bins
                n_bins += 1
                rem = max(budget - eff, 0)
            else:
                placed = cap_bins.pop(i)
                rem = caps.pop(i) - eff
            j = bisect.bisect_left(caps, rem)
            caps.insert(j, rem)
            cap_bins.insert(j, placed)
            pos[placed] = pos.get(placed, -1) + 1
            expected[d] = (b * stride + placed, pos[placed])

    got = {
        r["doc_id"]: (r["pack_id"], r["pack_seq"])
        for r in packing.first_fit(tok_df, budget=512).collect()
    }
    assert got == expected
