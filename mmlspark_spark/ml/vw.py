"""VowpalWabbit stage surface.

Parity: reference ``vw/.../VowpalWabbitFeaturizer.scala:24-231`` (typed
feature hashing into a 2^numBits sparse vector, murmur-based),
``VowpalWabbitInteractions.scala:1-96`` (namespace crosses),
``VectorZipper.scala:16-42``, and the VW learners
(``VowpalWabbitClassifier/Regressor``, spanning-tree allreduce
``VowpalWabbitBase.scala:339-445``).

Engine mapping (SURVEY §2.10): the featurizer rides Spark's
``FeatureHasher`` (murmur3 hashing — same family the reference uses
natively). Learners have two gated paths:

- ``vowpalwabbit`` package importable → NATIVE online learning with
  exact VW semantics: example lines are rendered executor-side
  (Arrow-batched), streamed through one native workspace on the driver
  (``toLocalIterator`` — constant driver memory, partition at a time),
  ``numPasses`` passes; scoring re-hydrates the saved native model per
  executor and predicts distributed. Delta vs the reference's
  spanning-tree allreduce (``VowpalWabbitBase.scala:339-445``): the
  python package exposes no allreduce coordinator, so training
  throughput is driver-streaming-bound — the semantics are exact
  single-learner VW (stronger than averaged workers), the scale path
  for linear models remains the SparkML fallback below;
- otherwise → SGD-family SparkML models over the same hashed features
  (LogisticRegression / LinearRegression), VW's model class trained by
  Spark's distributed optimizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model, Transformer


def _have_vw() -> bool:
    try:
        import vowpalwabbit  # noqa: F401

        return True
    except ImportError:
        return False


def vw_example_line(label: float | None, indices, values,
                    namespace: str = "f") -> str:
    """Render one VW text-format example: ``label |ns idx:val ...``.

    Pure function (tested without the native package). ``label=None``
    renders a test/predict example. Zero-valued features are dropped —
    VW treats absent and zero identically for linear models — and so
    are non-finite values (``nan:``/``inf:`` is invalid VW syntax and
    would poison the whole example)."""
    import math

    feats = " ".join(
        f"{int(i)}:{v:g}" for i, v in zip(indices, values)
        if v != 0.0 and math.isfinite(v))
    head = "" if label is None else f"{label:g} "
    return f"{head}|{namespace} {feats}"


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


def _example_lines(df: DataFrame, featuresCol: str, labelCol: str,
                   classifier: bool) -> DataFrame:
    """One VW text example per row, rendered executor-side so the
    driver only ever streams strings. Labels: -1/+1 for the logistic
    loss, raw values for regression."""
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col(featuresCol))
    lab = F.col(labelCol).cast("double")
    if classifier:
        lab = F.when(lab > 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    prepared = df.select(arr.alias("__v"), lab.alias("__y"))

    def render(batches):
        import pandas as pd

        for pdf in batches:
            lines = [
                vw_example_line(
                    y, range(len(v)), v)
                for y, v in zip(pdf["__y"], pdf["__v"])
            ]
            yield pd.DataFrame({"line": lines})

    return prepared.mapInPandas(render, "line string")


class _VWNativeModel(Model):
    """Native VW model scored distributed: model bytes are shipped in
    the task closure, re-hydrated once per partition stream."""

    def __init__(self, modelBytes: bytes = b"", featuresCol: str = "features",
                 predictionCol: str = "prediction", isClassifier: bool = False):
        super().__init__(modelBytes=modelBytes, featuresCol=featuresCol,
                         predictionCol=predictionCol, isClassifier=isClassifier)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol)
        # StructType.add mutates in place; never touch the caller's
        # (possibly cached) schema object.
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.predictionCol, T.DoubleType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import vector_to_array

        blob, pred_col = self.modelBytes, self.predictionCol
        is_clf = self.isClassifier
        arr = df.withColumn("__v", vector_to_array(F.col(self.featuresCol)))
        out_schema = T.StructType(
            list(arr.schema.fields) + [T.StructField(pred_col, T.DoubleType())])

        def score(batches):
            import os
            import tempfile

            import vowpalwabbit

            with tempfile.NamedTemporaryFile(suffix=".vw",
                                             delete=False) as f:
                f.write(blob)
                path = f.name
            try:
                ws = vowpalwabbit.Workspace(f"--quiet -i {path}")
                try:
                    for pdf in batches:
                        preds = []
                        for v in pdf["__v"]:
                            raw = ws.predict(
                                vw_example_line(None, range(len(v)), v))
                            preds.append(
                                float(raw > 0.0) if is_clf else float(raw))
                        pdf[pred_col] = preds
                        yield pdf
                finally:
                    # finish() in finally: a raising batch must not leak
                    # the native workspace for the executor stream.
                    ws.finish()
            finally:
                os.unlink(path)

        return arr.mapInPandas(score, out_schema).drop("__v")


class _VWNativeFitMixin:
    _classifier = False

    def _fit_native(self, df: DataFrame) -> _VWNativeModel:
        import os
        import tempfile

        import vowpalwabbit

        loss = "logistic" if self._classifier else "squared"
        args = f"--quiet --loss_function={loss}"
        if self.l2:
            args += f" --l2 {self.l2}"
        ws = vowpalwabbit.Workspace(args)
        try:
            lines = _example_lines(df, self.featuresCol, self.labelCol,
                                   self._classifier)
            # toLocalIterator: one partition in flight — constant driver
            # memory; example rendering runs distributed. numPasses
            # re-iterations approximate VW's own multi-pass cache.
            for _ in range(max(1, int(self.numPasses))):
                for row in lines.toLocalIterator(prefetchPartitions=True):
                    ws.learn(row.line)
            with tempfile.TemporaryDirectory() as tmp:
                path = os.path.join(tmp, "model.vw")
                ws.save(path)
                with open(path, "rb") as f:
                    blob = f.read()
        finally:
            # finish() in finally: learn/save failures must not leak
            # the native workspace.
            ws.finish()
        return _VWNativeModel(
            modelBytes=blob, featuresCol=self.featuresCol,
            predictionCol=self.predictionCol,
            isClassifier=self._classifier)


class VowpalWabbitClassifier(_VWLearnerBase, _VWNativeFitMixin):
    _classifier = True

    def _fit(self, df: DataFrame):
        if _have_vw():
            return self._fit_native(df)
        from pyspark.ml.classification import LogisticRegression

        lr = LogisticRegression(
            featuresCol=self.featuresCol, labelCol=self.labelCol,
            predictionCol=self.predictionCol, maxIter=self.numPasses * 10,
            regParam=self.l2)
        return _VWModel(inner=lr.fit(df))


class VowpalWabbitRegressor(_VWLearnerBase, _VWNativeFitMixin):
    _classifier = False

    def _fit(self, df: DataFrame):
        if _have_vw():
            return self._fit_native(df)
        from pyspark.ml.regression import LinearRegression

        lr = LinearRegression(
            featuresCol=self.featuresCol, labelCol=self.labelCol,
            predictionCol=self.predictionCol, maxIter=self.numPasses * 10,
            regParam=self.l2)
        return _VWModel(inner=lr.fit(df))
