"""Isolation Forest — seeded, distributed scoring.

Parity: reference ``core/.../isolationforest/IsolationForest.scala:18-64``
(a thin wrapper over the linkedin/isolation-forest Spark lib). Here the
algorithm itself is implemented: standard iForest (Liu et al., ICDM'08)
— ``numTrees`` random isolation trees, each built on a bootstrap-free
subsample of ``maxSamples`` rows; anomaly score
``2^(-E[pathLength] / c(maxSamples))``.

Architecture for 100 TB: fitting only ever touches
``numTrees * maxSamples`` rows (a seeded ``RDD.takeSample``-style
sample — constant driver memory, e.g. 100 × 256 rows), which is the
*algorithm's own* subsampling requirement, not a shortcut. The fitted
ensemble (a few hundred KB of numpy arrays) is broadcast and scoring
runs as an Arrow-batched pandas UDF over the vector column — no
shuffle at all at score time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model


def _c_factor(n: int) -> float:
    """Average unsuccessful-search path length in a BST of n nodes."""
    if n <= 1:
        return 0.0
    h = np.log(n - 1) + np.euler_gamma
    return 2.0 * h - 2.0 * (n - 1) / n


def _build_tree(x: np.ndarray, rng: np.random.Generator, depth: int,
                max_depth: int, nodes: list) -> int:
    """Recursively build an isolation tree over rows of x; returns node id.

    Node encoding (parallel lists): feature, threshold, left, right, size.
    Leaf: feature == -1, size = row count (path-length correction uses it).
    """
    node_id = len(nodes)
    n = x.shape[0]
    if depth >= max_depth or n <= 1:
        nodes.append([-1, 0.0, -1, -1, n])
        return node_id
    # pick a feature with spread; give up → leaf
    spans = x.max(axis=0) - x.min(axis=0)
    nonconst = np.flatnonzero(spans > 0)
    if nonconst.size == 0:
        nodes.append([-1, 0.0, -1, -1, n])
        return node_id
    feat = int(rng.choice(nonconst))
    lo, hi = x[:, feat].min(), x[:, feat].max()
    thr = float(rng.uniform(lo, hi))
    mask = x[:, feat] < thr
    nodes.append([feat, thr, -1, -1, n])
    nodes[node_id][2] = _build_tree(x[mask], rng, depth + 1, max_depth, nodes)
    nodes[node_id][3] = _build_tree(x[~mask], rng, depth + 1, max_depth, nodes)
    return node_id


def _path_length(tree: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Vectorized path length of each row of x through one tree."""
    n = x.shape[0]
    node = np.zeros(n, dtype=np.int64)
    depth = np.zeros(n, dtype=np.float64)
    out = np.zeros(n, dtype=np.float64)
    active = np.ones(n, dtype=bool)
    while active.any():
        feats = tree[node[active], 0].astype(np.int64)
        is_leaf = feats == -1
        idx = np.flatnonzero(active)
        leaf_idx = idx[is_leaf]
        if leaf_idx.size:
            sizes = tree[node[leaf_idx], 4]
            # one _c_factor per DISTINCT leaf size, not per row: the
            # per-row Python loop was the dominant interpreted cost of
            # the otherwise-vectorized scoring hot path
            uniq, inv = np.unique(sizes, return_inverse=True)
            corr = np.array([_c_factor(int(u)) for u in uniq])
            out[leaf_idx] = depth[leaf_idx] + corr[inv]
            active[leaf_idx] = False
        inner_idx = idx[~is_leaf]
        if inner_idx.size:
            f = tree[node[inner_idx], 0].astype(np.int64)
            thr = tree[node[inner_idx], 1]
            go_left = x[inner_idx, f] < thr
            node[inner_idx] = np.where(
                go_left, tree[node[inner_idx], 2], tree[node[inner_idx], 3]
            ).astype(np.int64)
            depth[inner_idx] += 1.0
    return out


class IsolationForest(Estimator):
    def __init__(self, featuresCol: str = "features", scoreCol: str = "outlierScore",
                 predictionCol: str = "predictedLabel", numTrees: int = 100,
                 maxSamples: int = 256, contamination: float = 0.0,
                 seed: int = 42):
        super().__init__(featuresCol=featuresCol, scoreCol=scoreCol,
                         predictionCol=predictionCol, numTrees=numTrees,
                         maxSamples=maxSamples, contamination=contamination,
                         seed=seed)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.scoreCol, T.DoubleType()),
            T.StructField(self.predictionCol, T.IntegerType()),
        ])

    def _collect_sample(self, df: DataFrame) -> np.ndarray:
        need = self.numTrees * self.maxSamples
        total = df.count()
        frac = min(1.0, (need * 1.2) / max(total, 1))
        rows = (df.select(self.featuresCol).sample(False, frac, self.seed)
                .limit(need).collect())
        if not rows:
            raise ValueError("IsolationForest: empty fit dataset")
        return np.array([list(r[0]) for r in rows], dtype=np.float64)

    def _fit(self, df: DataFrame) -> "IsolationForestModel":
        x = self._collect_sample(df)
        if min(self.maxSamples, x.shape[0]) < 2:
            # c(1) = 0 would divide every score 0/0 into NaN — fail at
            # fit time with the reason, not at scoring with null labels
            raise ValueError(
                "IsolationForest needs >= 2 fit rows (and maxSamples "
                f">= 2); got {x.shape[0]} rows, maxSamples="
                f"{self.maxSamples}")
        rng = np.random.default_rng(self.seed)
        max_depth = int(np.ceil(np.log2(max(self.maxSamples, 2))))
        trees = []
        for _ in range(self.numTrees):
            idx = rng.choice(x.shape[0], size=min(self.maxSamples, x.shape[0]),
                             replace=False)
            nodes: list = []
            _build_tree(x[idx], rng, 0, max_depth, nodes)
            trees.append(np.array(nodes, dtype=np.float64))
        c_norm = _c_factor(min(self.maxSamples, x.shape[0]))
        model = IsolationForestModel(
            featuresCol=self.featuresCol, scoreCol=self.scoreCol,
            predictionCol=self.predictionCol, trees=trees, cNorm=c_norm,
            threshold=0.5, contamination=self.contamination)
        if self.contamination > 0:
            scored = model.transform(df).select(self.scoreCol)
            thr = scored.approxQuantile(self.scoreCol,
                                        [1.0 - self.contamination], 0.001)[0]
            model.set("threshold", thr)
        return model


class IsolationForestModel(Model):
    def __init__(self, featuresCol="features", scoreCol="outlierScore",
                 predictionCol="predictedLabel", trees=None, cNorm: float = 1.0,
                 threshold: float = 0.5, contamination: float = 0.0):
        super().__init__(featuresCol=featuresCol, scoreCol=scoreCol,
                         predictionCol=predictionCol, trees=trees or [],
                         cNorm=cNorm, threshold=threshold,
                         contamination=contamination)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.scoreCol, T.DoubleType()),
            T.StructField(self.predictionCol, T.IntegerType()),
        ])

    def _transform(self, df: DataFrame) -> DataFrame:
        from mmlspark_spark.ml.lightgbm import _features_to_array

        sc = df.sparkSession.sparkContext
        b_trees = sc.broadcast(self.trees)
        c_norm = self.cNorm
        thr = self.threshold

        @F.pandas_udf(T.DoubleType())
        def score_udf(vecs):
            import pandas as pd

            vals = vecs.tolist()
            # NULL features -> NULL score (never poison the batch's
            # ndarray conversion; one failed upstream join must not
            # kill a billion-row scoring job)
            mask = [v is not None for v in vals]
            out = [None] * len(vals)
            if any(mask):
                x = np.array([v for v in vals if v is not None],
                             dtype=np.float64)
                depths = np.zeros(x.shape[0], dtype=np.float64)
                for tree in b_trees.value:
                    depths += _path_length(tree, x)
                scores = np.power(
                    2.0, -(depths / len(b_trees.value)) / c_norm)
                it = iter(scores)
                for i, ok in enumerate(mask):
                    if ok:
                        out[i] = float(next(it))
            return pd.Series(out, dtype="float64")

        # VectorUDT cannot cross the Arrow boundary — convert to a
        # plain array first (the repo-wide _features_to_array
        # convention; ml/lightgbm.py, ml/vw.py)
        arr = _features_to_array(df, self.featuresCol)
        out = (arr.withColumn(self.scoreCol, score_udf(F.col("__feat")))
               .drop("__feat"))
        return out.withColumn(
            self.predictionCol,
            (F.col(self.scoreCol) >= F.lit(thr)).cast("int"),
        )
