"""Distributed PCA over an embedding column: fit by one pass of
partial second moments, project JVM→Arrow-batched with BLAS.

Training-data pipelines run PCA in front of the vector stages this repo
already has — SemDeDup-style semantic dedup and IVF ANN both get faster
and less noisy on decorrelated, truncated vectors (Abbas et al. 2023
reduce embeddings before clustering; FAISS's OPQ/PCAR pretransforms are
the same idea). The reference engine ships the vector-index scaffolding
(clickhouse-arrow `src/schema.rs` vector-similarity index clause); this
is the dimensionality-reduction companion an at-scale user pairs with
it.

Scale posture:

- `pca_fit` is ONE pass over the data: each partition emits a single
  row carrying `(count, sum_vector, gram_matrix)` partials
  (`d*d + d + 1` doubles — for d=1024 that is ~8 MB per PARTITION, not
  per row). The partials reduce through a map-side-combinable
  `groupBy(pos).sum` — never a driver-side concat of partitions — and
  only the final `d*d + d + 1` scalars reach the driver, where the
  (d×d, tiny) eigendecomposition runs in numpy.
- `pca_project` is a vectorized Arrow-batched pandas UDF doing one
  BLAS matmul per batch; the (k×d) component matrix rides inside the
  UDF closure (broadcast once per executor), so projection adds zero
  shuffles to whatever plan consumes it.
- Eigenvector sign is fixed deterministically (largest-|coefficient|
  entry made positive) so two fits of the same data project
  identically up to floating-point reduction order.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PCAModel", "pca_fit", "pca_project", "save_pca_model", "load_pca_model"]


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray            # (d,)
    components: np.ndarray      # (k, d) rows are principal axes
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    total_variance: float       # trace of the covariance matrix
    n_rows: int

    @property
    def k(self) -> int:
        return int(self.components.shape[0])

    @property
    def dim(self) -> int:
        return int(self.components.shape[1])


def _partial_moments(dim: int):
    """mapInPandas stage: one (count, sum, gram) row per partition."""

    def gen(batches):
        cnt = 0
        s = np.zeros(dim, dtype=np.float64)
        g = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["_v"].tolist(), dtype=np.float64)
            if x.shape[1] != dim:
                raise ValueError(
                    f"pca_fit: ragged embedding width {x.shape[1]} != {dim}"
                )
            cnt += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if cnt:
            yield pd.DataFrame(
                {"moments": [np.concatenate(([float(cnt)], s, g.ravel()))]}
            )

    return gen


def pca_fit(
    df: DataFrame, *, vec_col: str = "embedding", k: int = 8
) -> PCAModel:
    """Fit a PCA model on `df[vec_col]` (array<numeric>, fixed width).

    One distributed pass (partition partials → positional sum), then a
    driver-side `numpy.linalg.eigh` on the d×d covariance. `k` is
    clamped to the dimensionality.
    """
    head = df.select(F.size(vec_col).alias("d")).first()
    if head is None:
        raise ValueError("pca_fit: empty input")
    dim = int(head["d"])

    narrow = df.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v")
    )
    partials = narrow.mapInPandas(
        _partial_moments(dim), "moments array<double>"
    )
    summed = (
        partials.select(F.posexplode("moments").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
        .collect()
    )  # bounded: d*d + d + 1 rows of driver state
    flat = np.zeros(dim * dim + dim + 1, dtype=np.float64)
    for r in summed:
        flat[r["pos"]] = r["val"]
    n = int(round(flat[0]))
    if n < 2:
        raise ValueError("pca_fit: need at least 2 rows")
    s, gram = flat[1 : dim + 1], flat[dim + 1 :].reshape(dim, dim)
    mean = s / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0  # symmetrize reduction noise
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    k = max(1, min(k, dim))
    comp = evecs[:, order[:k]].T.copy()  # (k, d)
    # deterministic sign: the largest-|coefficient| entry is positive
    for i in range(k):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return PCAModel(
        mean=mean,
        components=comp,
        explained_variance=np.maximum(evals[order[:k]], 0.0),
        total_variance=float(np.trace(cov)),
        n_rows=n,
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Append `out_col` = `(v - mean) @ componentsᵀ` (array<double>,
    length k). With `whiten=True` each coordinate is scaled by
    `1/sqrt(eigenvalue + eps)` to unit variance — the preconditioner
    cosine-based stages want.
    """
    mean = model.mean
    w = model.components.T.copy()  # (d, k)
    if whiten:
        w = w / np.sqrt(model.explained_variance + eps)[None, :]

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        x = np.array(vs.tolist(), dtype=np.float64)
        out = (x - mean[None, :]) @ w
        return pd.Series(list(out))

    return df.withColumn(out_col, project(F.col(vec_col)))


def save_pca_model(spark, model: PCAModel, path: str) -> None:
    """Persist the model as a tiny parquet (k rows: component, eigenvalue;
    plus the mean/meta row) — same disk contract as the IVF index
    (operators/similarity.write_ivf_index): any session, any cluster,
    can load and project without refitting."""
    rows = [
        (int(i), [float(x) for x in model.components[i]],
         float(model.explained_variance[i]), None, None, None)
        for i in range(model.k)
    ]
    rows.append(
        (-1, [float(x) for x in model.mean], None,
         float(model.total_variance), int(model.n_rows), int(model.dim))
    )
    spark.createDataFrame(
        rows,
        "row_id INT, vec ARRAY<DOUBLE>, eigenvalue DOUBLE, "
        "total_variance DOUBLE, n_rows BIGINT, dim INT",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_pca_model(spark, path: str) -> PCAModel:
    """Inverse of :func:`save_pca_model`."""
    rows = spark.read.parquet(path).collect()
    meta = next(r for r in rows if r["row_id"] == -1)
    comps = sorted(
        (r for r in rows if r["row_id"] >= 0), key=lambda r: r["row_id"]
    )
    return PCAModel(
        mean=np.array(meta["vec"], dtype=np.float64),
        components=np.array([r["vec"] for r in comps], dtype=np.float64),
        explained_variance=np.array(
            [r["eigenvalue"] for r in comps], dtype=np.float64
        ),
        total_variance=float(meta["total_variance"]),
        n_rows=int(meta["n_rows"]),
    )
