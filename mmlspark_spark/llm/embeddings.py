"""Embedding-space operators: PCA dimensionality reduction.

The similarity-search scale path (LSH / IVF over ``array<float>``
embeddings, ``llm/similarity.py``) gets cheaper and better-behaved
after projecting to the leading principal components — this module
supplies that step Spark-first:

- **fit** is ONE distributed pass: each partition reduces to
  ``(count, Σx, Σxxᵀ)`` partial moments inside an Arrow-batched
  ``mapInPandas`` (numpy BLAS does the outer-product accumulation),
  the driver combines the per-partition rows — d=64 → 4 KB per
  partition on the wire, never row data — and runs ``eigh`` on the
  d×d covariance. Driver state is O(d²), independent of corpus size.
- **transform** is a map-only ``(X - mean) @ components.T`` per Arrow
  batch.

Eigenvector sign is canonicalized (largest-|weight| coordinate made
positive) so fits are deterministic run-to-run and component order is
by descending eigenvalue. Population covariance (divide by n) — the
formulation the ``embedding_covariance`` catalog oracle replays in
SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model


def _moments(df: DataFrame, inputCol: str):
    """(n, sum_vec, sum_outer) over the embedding column — one job,
    one small row per partition. NULL embeddings are excluded from the
    moments (documented: PCA is fit on the observed vectors)."""
    arr = (df.filter(F.col(inputCol).isNotNull())
           .select(F.col(inputCol).cast("array<double>").alias("__v")))

    def partial(batches):
        import numpy as np
        import pandas as pd

        n, s, ss = 0, None, None
        for pdf in batches:
            X = np.asarray(pdf["__v"].tolist(), dtype="float64")
            if X.size == 0:
                continue
            n += X.shape[0]
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            g = X.T @ X
            ss = g if ss is None else ss + g
        if n == 0:
            return
        yield pd.DataFrame({
            "n": [n],
            "s": [s.tolist()],
            "ss": [ss.ravel().tolist()],
        })

    rows = arr.mapInPandas(
        partial,
        "n long, s array<double>, ss array<double>").collect()
    if not rows:
        raise ValueError("cannot fit PCA on an empty dataset")
    n = sum(r.n for r in rows)
    d = len(rows[0].s)
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r.s)
        ss += np.asarray(r.ss).reshape(d, d)
    return n, s, ss


class EmbeddingPCA(Estimator):
    """Fit top-``k`` principal components of an embedding column."""

    def __init__(self, inputCol: str = "embedding",
                 outputCol: str = "pca", k: int = 8):
        super().__init__(inputCol=inputCol, outputCol=outputCol, k=k)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return schema

    def covariance(self, df: DataFrame):
        """Population covariance matrix (numpy d×d) — the quantity the
        catalog oracle verifies cross-engine."""
        n, s, ss = _moments(df, self.inputCol)
        mean = s / n
        return ss / n - np.outer(mean, mean)

    def _fit(self, df: DataFrame) -> "EmbeddingPCAModel":
        n, s, ss = _moments(df, self.inputCol)
        mean = s / n
        cov = ss / n - np.outer(mean, mean)
        vals, vecs = np.linalg.eigh(cov)  # ascending
        order = np.argsort(vals)[::-1][:self.k]
        comps = vecs[:, order].T  # k × d
        # sign canonicalization: make each component's
        # largest-|weight| coordinate positive (eigh's sign is
        # arbitrary; fits must be deterministic)
        for i in range(comps.shape[0]):
            j = int(np.argmax(np.abs(comps[i])))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        return EmbeddingPCAModel(
            mean=[float(v) for v in mean],
            components=[[float(v) for v in row] for row in comps],
            explainedVariance=[float(vals[o]) for o in order],
            inputCol=self.inputCol, outputCol=self.outputCol)


class EmbeddingPCAModel(Model):
    def __init__(self, mean=None, components=None,
                 explainedVariance=None, inputCol: str = "embedding",
                 outputCol: str = "pca"):
        super().__init__(mean=list(mean or []),
                         components=[list(r) for r in (components or [])],
                         explainedVariance=list(explainedVariance or []),
                         inputCol=inputCol, outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.outputCol,
                             T.ArrayType(T.DoubleType()))])

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        mean, comps = self.mean, self.components

        @pandas_udf("array<double>")
        def project(col):
            import numpy as np
            import pandas as pd

            m = np.asarray(mean)
            C = np.asarray(comps)
            vals = col.tolist()
            # NULL embeddings project to NULL (sibling multimodal
            # operators' null contract), and must not poison the
            # batch's ndarray conversion
            mask = [v is not None for v in vals]
            out = [None] * len(vals)
            if any(mask):
                X = np.asarray([v for v in vals if v is not None],
                               dtype="float64")
                Y = (X - m) @ C.T
                it = iter(Y)
                for i, ok in enumerate(mask):
                    if ok:
                        out[i] = next(it).tolist()
            return pd.Series(out)

        return df.withColumn(
            self.outputCol,
            project(F.col(self.inputCol).cast("array<double>")))
