"""Distributed PCA operator tests (operators/projection.py)."""

import numpy as np
import pytest

from clickhouse_arrow_spark.operators.projection import pca_fit, pca_project


@pytest.fixture(scope="module")
def cloud(spark):
    """300 points: dominant axis (3, 1, 0.2)-ish, deterministic."""
    rng = np.random.RandomState(7)
    base = rng.randn(300, 3) * np.array([3.0, 1.0, 0.2])
    rot, _ = np.linalg.qr(np.random.RandomState(1).randn(3, 3))
    pts = base @ rot.T + np.array([5.0, -2.0, 0.5])
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    return df.repartition(7), pts


def test_fit_matches_numpy(cloud):
    df, pts = cloud
    m = pca_fit(df, k=3)
    assert m.n_rows == 300 and m.dim == 3 and m.k == 3
    cov = np.cov(pts, rowvar=False, ddof=1)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(m.explained_variance, evals, rtol=1e-8)
    assert np.isclose(m.total_variance, np.trace(cov), rtol=1e-10)
    assert np.allclose(m.mean, pts.mean(axis=0), rtol=1e-10)


def test_components_orthonormal_and_ordered(cloud):
    df, _ = cloud
    m = pca_fit(df, k=3)
    assert np.allclose(m.components @ m.components.T, np.eye(3), atol=1e-10)
    assert np.all(np.diff(m.explained_variance) <= 0)


def test_first_component_captures_dominant_axis(cloud):
    df, pts = cloud
    m = pca_fit(df, k=1)
    cov = np.cov(pts, rowvar=False, ddof=1)
    _, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    assert abs(float(np.dot(m.components[0], top))) > 1 - 1e-9


def test_projection_centered_and_variance(cloud):
    df, _ = cloud
    m = pca_fit(df, k=2)
    out = pca_project(df, m).select("vec_id", "pca").collect()
    p = np.array([r["pca"] for r in sorted(out, key=lambda r: r["vec_id"])])
    assert p.shape == (300, 2)
    assert np.allclose(p.mean(axis=0), 0.0, atol=1e-9)
    assert np.allclose(p.var(axis=0, ddof=1), m.explained_variance, rtol=1e-8)


def test_whitening_unit_variance(cloud):
    df, _ = cloud
    m = pca_fit(df, k=3)
    out = pca_project(df, m, whiten=True, out_col="w").select("w").collect()
    p = np.array([r["w"] for r in out])
    assert np.allclose(p.var(axis=0, ddof=1), 1.0, rtol=1e-6)


def test_sign_deterministic(cloud):
    df, _ = cloud
    a = pca_fit(df, k=2)
    b = pca_fit(df.repartition(3), k=2)
    # same data, different partitioning: same axes up to fp reduction order
    assert np.allclose(a.components, b.components, atol=1e-8)
    for row in a.components:
        j = int(np.argmax(np.abs(row)))
        assert row[j] > 0


def test_k_clamped_and_errors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    assert pca_fit(df, k=99).k == 2
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(df.limit(1))
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(Exception, match="ragged"):
        pca_fit(ragged)


def test_pca_composes_with_semantic_dedup(spark):
    """PCA-reduced vectors feed semantic_dedup unchanged: planted exact
    duplicates survive projection (cosine 1.0 in the reduced space)."""
    from clickhouse_arrow_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(3)
    base = rng.randn(80, 12)
    rows = [(i, [float(x) for x in base[i]]) for i in range(80)]
    # plant clones: 90..94 duplicate 0..4
    rows += [(90 + i, [float(x) for x in base[i]]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    m = pca_fit(df, k=6)
    proj = pca_project(df, m, out_col="pca")
    kept = {
        r["vec_id"]
        for r in semantic_dedup(
            proj, threshold=0.9999, nlist=4, corpus_vec="pca"
        ).collect()
    }
    assert all(i in kept for i in range(5))        # originals survive
    assert all(90 + i not in kept for i in range(5))  # clones dropped


def test_save_load_round_trip(spark, cloud, tmp_path):
    from clickhouse_arrow_spark.operators.projection import (
        load_pca_model,
        save_pca_model,
    )

    df, _ = cloud
    m = pca_fit(df, k=2)
    path = str(tmp_path / "pca_model")
    save_pca_model(spark, m, path)
    m2 = load_pca_model(spark, path)
    assert np.allclose(m.components, m2.components)
    assert np.allclose(m.mean, m2.mean)
    assert np.allclose(m.explained_variance, m2.explained_variance)
    assert (m.n_rows, m.dim, m.total_variance) == (
        m2.n_rows, m2.dim, m2.total_variance,
    )
    # a fresh-session-style projection from the loaded model matches
    a = pca_project(df, m).select("pca").collect()
    b = pca_project(df, m2).select("pca").collect()
    assert [r["pca"] for r in a] == [r["pca"] for r in b]
