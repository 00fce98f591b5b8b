"""VowpalWabbit stage surface.

Parity: reference ``vw/.../VowpalWabbitFeaturizer.scala:24-231`` (typed
feature hashing into a 2^numBits sparse vector, murmur-based),
``VowpalWabbitInteractions.scala:1-96`` (namespace crosses),
``VectorZipper.scala:16-42``, and the VW learners
(``VowpalWabbitClassifier/Regressor``, spanning-tree allreduce
``VowpalWabbitBase.scala:339-445``).

Engine mapping (SURVEY §2.10): the featurizer rides Spark's
``FeatureHasher`` (murmur3 hashing — same family the reference uses
natively); the learners are SGD-family SparkML models over the hashed
features (LogisticRegression / LinearRegression), which is VW's model
class (online linear learners) trained by Spark's distributed LBFGS
instead of the native allreduce — a documented engine delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model, Transformer


class VowpalWabbitFeaturizer(Transformer):
    def __init__(self, inputCols=None, outputCol: str = "features",
                 numBits: int = 18):
        super().__init__(inputCols=list(inputCols or []), outputCol=outputCol,
                         numBits=numBits)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        from pyspark.ml.linalg import VectorUDT

        self._require_cols(schema, *self.inputCols)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, VectorUDT())])

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.feature import FeatureHasher

        hasher = FeatureHasher(inputCols=self.inputCols,
                               outputCol=self.outputCol,
                               numFeatures=2 ** self.numBits)
        return hasher.transform(df)


class VowpalWabbitInteractions(Transformer):
    """Feature crosses by hashing concatenated values
    (VowpalWabbitInteractions.scala:1-96): adds a crossed string column
    then hashes all inputs + the cross."""

    def __init__(self, inputCols=None, outputCol: str = "features",
                 numBits: int = 18):
        super().__init__(inputCols=list(inputCols or []), outputCol=outputCol,
                         numBits=numBits)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        from pyspark.ml.linalg import VectorUDT

        self._require_cols(schema, *self.inputCols)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, VectorUDT())])

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.feature import FeatureHasher

        cross = F.concat_ws("\x1d", *[F.col(c).cast("string")
                                      for c in self.inputCols])
        with_cross = df.withColumn("__cross__", cross)
        hasher = FeatureHasher(inputCols=self.inputCols + ["__cross__"],
                               outputCol=self.outputCol,
                               numFeatures=2 ** self.numBits)
        return hasher.transform(with_cross).drop("__cross__")


class VectorZipper(Transformer):
    """Zip columns into an array column (VectorZipper.scala:16-42,
    used for contextual-bandit action sets)."""

    def __init__(self, inputCols=None, outputCol: str = "output"):
        super().__init__(inputCols=list(inputCols or []), outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, *self.inputCols)
        first = schema[self.inputCols[0]].dataType
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.ArrayType(first))])

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.outputCol, F.array(*self.inputCols))


class _VWLearnerBase(Estimator):
    def __init__(self, **kw):
        kw.setdefault("featuresCol", "features")
        kw.setdefault("labelCol", "label")
        kw.setdefault("predictionCol", "prediction")
        kw.setdefault("numPasses", 10)
        kw.setdefault("l2", 0.0)
        super().__init__(**kw)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol, self.labelCol)
        return schema


class _VWModel(Model):
    def __init__(self, inner=None):
        super().__init__(inner=inner)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        return schema

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.inner.transform(df)


class VowpalWabbitClassifier(_VWLearnerBase):
    def _fit(self, df: DataFrame) -> _VWModel:
        from pyspark.ml.classification import LogisticRegression

        lr = LogisticRegression(
            featuresCol=self.featuresCol, labelCol=self.labelCol,
            predictionCol=self.predictionCol, maxIter=self.numPasses * 10,
            regParam=self.l2)
        return _VWModel(inner=lr.fit(df))


class VowpalWabbitRegressor(_VWLearnerBase):
    def _fit(self, df: DataFrame) -> _VWModel:
        from pyspark.ml.regression import LinearRegression

        lr = LinearRegression(
            featuresCol=self.featuresCol, labelCol=self.labelCol,
            predictionCol=self.predictionCol, maxIter=self.numPasses * 10,
            regParam=self.l2)
        return _VWModel(inner=lr.fit(df))
