"""Z-order clustering and k-means IVF refinement tests."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clickhouse_arrow_spark.operators.similarity import (
    brute_force_topk,
    deterministic_centroids,
    ivf_topk,
    kmeans_refine,
)
from clickhouse_arrow_spark.operators.zorder import zorder_value, zorder_write


def _file_spreads(path: str, col: str) -> list[float]:
    """Per-file (max-min) spread of `col` from parquet footer stats."""
    spreads = []
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.read_metadata(f)
        lo, hi = None, None
        idx = meta.schema.names.index(col)
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spreads.append(float(hi - lo))
    return spreads


def test_zorder_value_interleaves(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(zorder_value([F.col("a"), F.col("b")], bits=3).alias("z")).first()["z"]
    # a bits (x) at even positions, b bits (y) at odd: a=101, b=011
    # -> z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 0b011011 = 27
    assert z == 0b011011


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    """Z-ordered files must be tight in BOTH dimensions; a 1-d sort is
    tight in one and scattered in the other."""
    df = (
        spark.range(40_000)
        .select(
            (F.pmod(F.xxhash64("id"), F.lit(1000))).alias("x"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000))).alias("y"),
            F.col("id").alias("payload"),
        )
    )
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "sorted1d")
    zorder_write(df, zpath, ["x", "y"], n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )

    global_range = 1000.0
    z_x = sum(_file_spreads(zpath, "x")) / 16 / global_range
    z_y = sum(_file_spreads(zpath, "y")) / 16 / global_range
    s_x = sum(_file_spreads(spath, "x")) / 16 / global_range
    s_y = sum(_file_spreads(spath, "y")) / 16 / global_range

    # 1-d sort: tight on x, ~full range on y
    assert s_x < 0.2 and s_y > 0.8
    # z-order: materially tight on BOTH dimensions
    assert z_x < 0.6 and z_y < 0.6
    assert z_y < s_y / 1.5

    # correctness: same rows either way
    assert (
        spark.read.parquet(zpath).count() == spark.read.parquet(spath).count() == 40_000
    )


def test_kmeans_refine_improves_or_matches_recall(spark):
    import random

    rng = random.Random(3)
    # clustered data: 4 gaussian-ish blobs in 8-d
    centers = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(4)]
    rows = []
    for i in range(400):
        c = centers[i % 4]
        rows.append((i, [v + rng.gauss(0, 0.05) for v in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }

    def recall(k_iters):
        approx = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                emb, queries, k=10, nlist=8, nprobe=2, kmeans_iters=k_iters
            ).collect()
        }
        return len(exact & approx) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0 - 0.05  # refinement must not materially hurt
    assert r2 >= 0.6  # and must be decent on clustered data


def test_kmeans_refine_deterministic(spark):
    import random

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds = deterministic_centroids(emb, 4)
    a = kmeans_refine(emb, seeds, iters=2).orderBy("centroid_id").collect()
    b = kmeans_refine(emb, seeds, iters=2).orderBy("centroid_id").collect()
    assert a == b


def test_ivf_index_probe_cap_guard(spark, tmp_path, tables):
    """The persisted-index probe path collects the probe set to the
    driver; max_query_rows makes that a contract — an oversized query
    batch raises and names the distributed alternative."""
    import pytest
    from pyspark.sql import functions as F

    from clickhouse_arrow_spark.operators.similarity import (
        ivf_topk_from_index,
        write_ivf_index,
    )

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_cap")
    write_ivf_index(emb, path, nlist=4)
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    with pytest.raises(ValueError, match="ivf_topk"):
        ivf_topk_from_index(spark, path, queries, k=3, max_query_rows=5)
    # under the cap the same batch probes fine
    ok = ivf_topk_from_index(
        spark, path, queries.limit(3), k=3, max_query_rows=5
    )
    assert ok.count() > 0


def test_ivf_index_write_probe_roundtrip(spark, tmp_path, tables):
    """Persisted IVF index: probe results match the in-memory ivf_topk
    over the same centroids, and the probe scan is partition-pruned
    (reads strictly fewer bucket directories than the index has)."""
    import os

    from pyspark.sql import functions as F

    from clickhouse_arrow_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_from_index,
        write_ivf_index,
    )

    emb = spark.table("embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, nlist=8)

    direct = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in ivf_topk(emb, queries, k=5, nlist=8, nprobe=2).collect()
    }
    from_index = ivf_topk_from_index(
        spark, path, queries, k=5, nprobe=2
    )
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in from_index.collect()
    }
    assert got == direct

    # pruning: the bucket IN-filter lands in the scan's PartitionFilters
    # (directory-level pruning, not a post-scan filter)
    n_buckets = len(
        [d for d in os.listdir(os.path.join(path, "vectors"))
         if d.startswith("centroid_id=")]
    )
    assert n_buckets == 8
    scan = spark.read.parquet(os.path.join(path, "vectors")).where(
        F.col("centroid_id").isin([0, 1])
    )
    plan = scan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines and "centroid_id" in part_lines[0]
