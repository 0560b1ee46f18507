"""Round-12 value pins for property-gate corpus rows (VERDICT r11 task
#3, continuing the r11 pattern): each test recomputes the operator's
EXACT output with an independent implementation (numpy / pure-Python
left-fold / a published-spec reimplementation, never the operator's own
code path) and compares value-for-value.

Arithmetic discipline (carried from test_value_pins_r11): where the
Spark operator folds left-to-right (aggregate()), the replica uses an
explicit Python float loop — IEEE double left-fold is bit-identical
across JVM and CPython — so rounded comparisons carry no hidden
tolerance.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_np():
    """Embeddings loaded OUTSIDE Spark (DuckDB) as (ids, float lists)."""
    import duckdb

    con = duckdb.connect()
    df = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchdf()
    ids = [int(x) for x in df["vec_id"]]
    mat = [[float(np.float32(x)) for x in v] for v in df["embedding"]]
    con.close()
    return ids, mat


def _fold_dot(a, b) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


# ---- vector_cluster_balanced ---------------------------------------------

def test_cluster_balanced_value_pin(spark, tables, emb_np):
    """The FULL kept vec_id set of the cluster-balanced sample,
    replicated end to end: centroid-norm argmax assignment (6-dp
    rounding, cid tie-break — the ivf_assign contract) then the 10
    lowest vec_ids per cluster (the cap_per_group window order). The
    corpus gate pins invariants; this pins the values."""
    from clickhouse_arrow_spark.operators import sampling, similarity

    ids, mat = emb_np
    centn = [
        (ids[i], mat[i], math.sqrt(_fold_dot(mat[i], mat[i])) or 1e-30)
        for i in range(8)
    ]
    by_cluster = defaultdict(list)
    for i, vid in enumerate(ids):
        v = mat[i]
        _, cid = min(
            (-round(_fold_dot(v, cv) / cn, 6), c) for c, cv, cn in centn
        )
        by_cluster[cid].append(vid)
    expected = set()
    for vids in by_cluster.values():
        expected.update(sorted(vids)[:10])

    emb = spark.table("embeddings")
    kept = sampling.cap_per_group(
        similarity.ivf_assign(
            emb, similarity.deterministic_centroids(emb, 8)
        ),
        "centroid_id", 10, "vec_id", id_col="vec_id", descending=False,
    )
    got = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert got == expected


# ---- vector_pca_ivf_gate --------------------------------------------------

def test_pca_reduced_topk_value_pin(spark, tables, emb_np):
    """The reduced-space exact top-10 neighbor ids (the reference side
    the PCA-IVF gate's recall is measured against), replicated with an
    independent numpy PCA (np.cov + eigh + the deterministic sign rule)
    and left-fold cosines at 6 dp. The numpy covariance path is a
    different derivation than the operator's distributed moment sums —
    agreement pins both the projection and the reduced-space ranking."""
    from clickhouse_arrow_spark.operators.projection import (
        pca_fit,
        pca_project,
    )
    from clickhouse_arrow_spark.operators.similarity import (
        brute_force_topk,
    )

    ids, mat = emb_np
    m_np = np.array(mat, dtype=np.float64)
    cov = np.cov(m_np, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    comp = evecs[:, order[:16]].T.copy()
    for i in range(16):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    red = (m_np - m_np.mean(axis=0)[None, :]) @ comp.T
    expected = {}
    for qi in range(5):
        qv = red[qi]
        qn = math.sqrt(_fold_dot(qv, qv))
        scored = []
        for i, vid in enumerate(ids):
            cn = math.sqrt(_fold_dot(red[i], red[i]))
            scored.append(
                (-round(_fold_dot(red[i], qv) / (cn * qn), 6), vid)
            )
        scored.sort()
        expected[qi] = [vid for _, vid in scored[:10]]

    emb = spark.table("embeddings")
    model = pca_fit(emb, k=16)
    reduced = pca_project(emb, model, out_col="pca").select(
        "vec_id", F.col("pca").alias("embedding")
    )
    queries = reduced.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = {}
    for r in brute_force_topk(reduced, queries, k=10).collect():
        got.setdefault(r["query_id"], {})[r["rank"]] = r["vec_id"]
    for qi in range(5):
        assert [got[qi][rk] for rk in sorted(got[qi])] == expected[qi]


# ---- dedup_incremental_gate ----------------------------------------------

def test_incremental_dedup_survivor_set_pin(spark):
    """The corpus gate's constructed batch fully determines the
    survivor set: 10 fresh docs {100..109} survive, the 3 store clones
    {9010, 9020, 9030} drop, and of the intra-batch triple {450, 9100,
    9101} only the min id survives. Assert the COMPLETE set equality
    (the gate's four booleans are equivalent, but the set form is the
    explicit value pin)."""
    import random

    from clickhouse_arrow_spark.operators.dedup import (
        dedup_incremental,
        minhash_store,
    )

    words = ("the quick brown fox jumps over a lazy dog near the old "
             "stone bridge at dawn every single day").split()

    def text(seed: int) -> str:
        rng = random.Random(seed)
        return " ".join(rng.choice(words) for _ in range(40))

    old = spark.createDataFrame(
        [(i, text(i)) for i in range(50)], "doc_id BIGINT, text STRING"
    )
    store = minhash_store(old)
    batch_rows = [(100 + i, text(1000 + i)) for i in range(10)]
    batch_rows += [(9010, text(10)), (9020, text(20)), (9030, text(30))]
    batch_rows += [(450, text(2000)), (9100, text(2000)),
                   (9101, text(2000))]
    batch = spark.createDataFrame(batch_rows, "doc_id BIGINT, text STRING")
    survivors, new_rows = dedup_incremental(batch, store, threshold=0.9)
    got = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    assert got == set(range(100, 110)) | {450}
    appended = {r["doc_id"] for r in new_rows.select("doc_id").collect()}
    assert appended == got


# ---- text_quality_model_gate ---------------------------------------------

def test_quality_model_heldout_predictions_pin(spark):
    """On the gate's deterministic separable corpus the trained
    classifier's held-out DECISIONS are fully pinned: every one of the
    40 held-out docs must classify as its constructed label (accuracy
    exactly 1.0). The weight vector itself is L-BFGS-path-dependent and
    carries no independent pin (noted in oracle_classes); the decision
    surface on separated classes is the pinnable observable."""
    import random

    from clickhouse_arrow_spark.operators.quality_model import (
        score_quality,
        train_quality_classifier,
    )

    good = "the study found results method analysis data evidence".split()
    bad = "buy cheap click winner free casino pills offer".split()
    rng = random.Random(7)

    def doc(words):
        return " ".join(rng.choice(words) for _ in range(30))

    rows = [(i, doc(good), 1) for i in range(100)]
    rows += [(1000 + i, doc(bad), 0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, label INT")
    train, test = df.where("doc_id % 5 != 0"), df.where("doc_id % 5 = 0")
    model = train_quality_classifier(train)
    scored = score_quality(test, model).select(
        "label", "quality_prob"
    ).collect()
    assert len(scored) == 40
    for r in scored:
        assert (r["quality_prob"] >= 0.5) == (r["label"] == 1)


# ---- util_sample_gate (SAMPLE BY bucket rule) -----------------------------

def _spark_hash_long(x: int, seed: int = 42) -> int:
    """Pure-Python Murmur3_x86_32 of a LongType value, matching Spark's
    hash() — reimplemented from the published Murmur3 spec (Appleby),
    NOT from Spark source: two 32-bit little-endian words, length 8."""
    mask = 0xFFFFFFFF

    def rotl(v, r):
        return ((v << r) | (v >> (32 - r))) & mask

    def mix_k1(k1):
        k1 = (k1 * 0xCC9E2D51) & mask
        k1 = rotl(k1, 15)
        return (k1 * 0x1B873593) & mask

    def mix_h1(h1, k1):
        h1 ^= k1
        h1 = rotl(h1, 13)
        return (h1 * 5 + 0xE6546B64) & mask

    x &= 0xFFFFFFFFFFFFFFFF
    h1 = mix_h1(seed, mix_k1(x & mask))
    h1 = mix_h1(h1, mix_k1((x >> 32) & mask))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & mask
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & mask
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def test_sample_by_bucket_value_pin(spark, tables):
    """SAMPLE 0.1 [OFFSET 0.1] on a SAMPLE BY table keeps EXACTLY the
    keys whose murmur3 bucket falls in [lo, hi) — replicated with an
    independent pure-Python Murmur3 over the raw parquet keys. Pins the
    deterministic-sampling contract at the value level (which ids), not
    just the determinism/containment booleans."""
    import duckdb

    from clickhouse_arrow_spark.client import Client
    from clickhouse_arrow_spark.ddl import CreateOptions, create_table

    client = Client(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS smppin")
    spark.sql("DROP TABLE IF EXISTS smppin.o_s")
    create_table(
        spark, "smppin", "o_s",
        [("o_orderkey", "Int64"), ("o_totalprice", "Float64")],
        CreateOptions(engine="MergeTree", order_by=("o_orderkey",),
                      sample_by="o_orderkey"),
    )
    client.insert(
        "smppin.o_s",
        spark.table("orders").select("o_orderkey", "o_totalprice"),
    )
    con = duckdb.connect()
    keys = [
        int(k) for (k,) in con.execute(
            f"SELECT o_orderkey FROM "
            f"read_parquet('{SF_DIR}/orders.parquet')"
        ).fetchall()
    ]
    con.close()
    M = 1_000_000
    for frac, off in ((0.1, 0.0), (0.1, 0.1), (0.2, 0.0)):
        lo, hi = int(off * M), int((off + frac) * M)
        expected = {
            k for k in keys if lo <= abs(_spark_hash_long(k)) % M < hi
        }
        sql = f"SELECT o_orderkey FROM smppin.o_s SAMPLE {frac}"
        if off:
            sql += f" OFFSET {off}"
        got = {r["o_orderkey"] for r in client.query_ch(sql).collect()}
        assert got == expected, (frac, off)
    spark.sql("DROP TABLE smppin.o_s")
    spark.sql("DROP DATABASE smppin")
