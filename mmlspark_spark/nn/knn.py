"""KNN / ConditionalKNN — broadcast-index nearest neighbors.

Parity: reference ``core/.../nn/KNN.scala:1-126`` (fit collects the
feature matrix into a serializable BallTree, broadcast to executors;
transform queries it per row with a bounded priority queue) and
``nn/ConditionalKNN.scala:31-120`` (per-query label conditioning).

Spark-first shape: the index is a numpy matrix broadcast once
(max-inner-product semantics — pre-normalize the vectors for cosine);
queries run in ``mapInPandas`` — one BLAS matmul per Arrow batch
instead of a per-row tree walk, which on vector data of d ≤ ~1k is
faster than a ball tree and exactly matches the reference's
max-inner-product semantics (``BallTree.scala:26-268``).

Scale note: like the reference, the **fit side** must fit in executor
memory (it is collected + broadcast). That is the algorithm's contract
(per-query exact top-k); the 100 TB path for big corpora is
``mmlspark_spark.llm.LSHKNN`` (bucketed candidates, no broadcast of
the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model

_MAX_INDEX_ROWS = 5_000_000  # refuse to collect more than this into the index


def _to_matrix(rows) -> np.ndarray:
    return np.array([np.asarray(r, dtype=np.float64) for r in rows])


def _check_index_size(df: DataFrame, what: str) -> None:
    """Fail fast BEFORE collect(): checking len(rows) after the
    collect cannot prevent the driver OOM it exists to prevent. One
    cheap limit+count job."""
    if df.limit(_MAX_INDEX_ROWS + 1).count() > _MAX_INDEX_ROWS:
        raise ValueError(
            f"{what} index would exceed {_MAX_INDEX_ROWS} rows; "
            "use llm.LSHKNN at this scale")


def _arrow_safe_features(df: DataFrame, feat_col: str):
    """(df with feat_col as array<double>, restore_fn): VectorUDT
    cannot cross the Arrow boundary in either direction, so the
    column is converted for the mapInPandas pass and converted back
    after."""
    dt = df.schema[feat_col].dataType
    if isinstance(dt, T.ArrayType):
        return df, (lambda out: out)
    from pyspark.ml.functions import array_to_vector, vector_to_array

    converted = df.withColumn(feat_col, vector_to_array(F.col(feat_col)))
    return converted, (
        lambda out: out.withColumn(feat_col,
                                   array_to_vector(F.col(feat_col))))


class _KNNBase(Estimator):
    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol)
        return schema


class KNN(_KNNBase):
    def __init__(self, featuresCol: str = "features", valuesCol: str = "values",
                 outputCol: str = "output", k: int = 5):
        super().__init__(featuresCol=featuresCol, valuesCol=valuesCol,
                         outputCol=outputCol, k=k)

    def _fit(self, df: DataFrame) -> "KNNModel":
        _check_index_size(df, "KNN")
        rows = df.select(self.featuresCol, self.valuesCol).collect()
        feats = _to_matrix([r[0] for r in rows])
        values = [r[1] for r in rows]
        return KNNModel(featuresCol=self.featuresCol, outputCol=self.outputCol,
                        k=self.k, indexFeatures=feats, indexValues=values)


class KNNModel(Model):
    def __init__(self, featuresCol="features", outputCol="output", k: int = 5,
                 indexFeatures=None, indexValues=None):
        super().__init__(featuresCol=featuresCol, outputCol=outputCol, k=k,
                         indexFeatures=indexFeatures, indexValues=indexValues)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol)
        out_t = T.ArrayType(T.StructType([
            T.StructField("value", T.StringType()),
            T.StructField("distance", T.DoubleType()),
        ]))
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, out_t)])

    def _transform(self, df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        b = sc.broadcast((self.indexFeatures, self.indexValues))
        k = self.k
        feat_col, out_col = self.featuresCol, self.outputCol
        df, restore = _arrow_safe_features(df, feat_col)
        cols = df.columns
        out_schema = T.StructType(
            [df.schema[c] for c in cols]
            + [T.StructField(out_col, T.ArrayType(T.StructType([
                T.StructField("value", T.StringType()),
                T.StructField("distance", T.DoubleType()),
            ])))])

        def query(it):
            feats, values = b.value
            for pdf in it:
                if len(pdf) == 0:
                    continue
                qm = _to_matrix(pdf[feat_col])
                sims = qm @ feats.T  # max inner product, one BLAS call
                res = []
                for i in range(sims.shape[0]):
                    top = np.argsort(-sims[i], kind="stable")[:k]
                    res.append([{"value": str(values[j]),
                                 "distance": float(sims[i, j])} for j in top])
                pdf = pdf.copy()
                pdf[out_col] = res
                yield pdf

        return restore(df.mapInPandas(query, out_schema))


class ConditionalKNN(_KNNBase):
    """KNN where each query carries ``conditionerCol`` — an array of
    labels it may match; neighbors outside it are excluded."""

    def __init__(self, featuresCol: str = "features", valuesCol: str = "values",
                 labelCol: str = "labels", conditionerCol: str = "conditioner",
                 outputCol: str = "output", k: int = 5):
        super().__init__(featuresCol=featuresCol, valuesCol=valuesCol,
                         labelCol=labelCol, conditionerCol=conditionerCol,
                         outputCol=outputCol, k=k)

    def _fit(self, df: DataFrame) -> "ConditionalKNNModel":
        _check_index_size(df, "ConditionalKNN")
        rows = df.select(self.featuresCol, self.valuesCol, self.labelCol).collect()
        feats = _to_matrix([r[0] for r in rows])
        values = [r[1] for r in rows]
        labels = [r[2] for r in rows]
        return ConditionalKNNModel(
            featuresCol=self.featuresCol, conditionerCol=self.conditionerCol,
            outputCol=self.outputCol, k=self.k, indexFeatures=feats,
            indexValues=values, indexLabels=labels)


class ConditionalKNNModel(Model):
    def __init__(self, featuresCol="features", conditionerCol="conditioner",
                 outputCol="output", k: int = 5, indexFeatures=None,
                 indexValues=None, indexLabels=None):
        super().__init__(featuresCol=featuresCol, conditionerCol=conditionerCol,
                         outputCol=outputCol, k=k, indexFeatures=indexFeatures,
                         indexValues=indexValues, indexLabels=indexLabels)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol, self.conditionerCol)
        out_t = T.ArrayType(T.StructType([
            T.StructField("value", T.StringType()),
            T.StructField("distance", T.DoubleType()),
            T.StructField("label", T.StringType()),
        ]))
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, out_t)])

    def _transform(self, df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        b = sc.broadcast((self.indexFeatures, self.indexValues, self.indexLabels))
        k = self.k
        feat_col, cond_col, out_col = (self.featuresCol, self.conditionerCol,
                                       self.outputCol)
        df, restore = _arrow_safe_features(df, feat_col)
        out_schema = T.StructType(
            [df.schema[c] for c in df.columns]
            + [T.StructField(out_col, T.ArrayType(T.StructType([
                T.StructField("value", T.StringType()),
                T.StructField("distance", T.DoubleType()),
                T.StructField("label", T.StringType()),
            ])))])

        def query(it):
            feats, values, labels = b.value
            label_arr = np.array([str(x) for x in labels])
            for pdf in it:
                if len(pdf) == 0:
                    continue
                qm = _to_matrix(pdf[feat_col])
                sims = qm @ feats.T
                res = []
                for i in range(sims.shape[0]):
                    allowed = {str(x) for x in pdf[cond_col].iloc[i]}
                    mask = np.isin(label_arr, list(allowed))
                    idx = np.flatnonzero(mask)
                    top = idx[np.argsort(-sims[i, idx], kind="stable")[:k]]
                    res.append([{"value": str(values[j]),
                                 "distance": float(sims[i, j]),
                                 "label": label_arr[j]} for j in top])
                pdf = pdf.copy()
                pdf[out_col] = res
                yield pdf

        return restore(df.mapInPandas(query, out_schema))
