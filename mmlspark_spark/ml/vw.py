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
  single-learner VW (stronger than averaged workers);
- ``useBarrierExecutionMode=True`` → the reference's multi-node shape:
  one worker per partition under barrier gang-scheduling with a
  per-pass weight average over ``BarrierTaskContext.allGather``
  (``_VWDistributedFitMixin`` — iterative parameter mixing, the same
  convergence contract as the reference's pass-boundary model
  averaging). Pure numpy on the worker because the python VW bindings
  read weights but cannot inject them;
- otherwise → SGD-family SparkML models over the same hashed features
  (LogisticRegression / LinearRegression), VW's model class trained by
  Spark's distributed optimizer.

Hash parity: ``VowpalWabbitFeaturizer(useVWHashing=True)`` reproduces
VW's murmur3 feature indexing byte-for-byte via
``functions/murmur.py`` (``VowpalWabbitMurmurWithPrefix.scala:1-77``).
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
    """Typed feature hashing into a 2^numBits sparse vector
    (VowpalWabbitFeaturizer.scala:24-231).

    Two hash paths:

    - default: Spark's ``FeatureHasher`` (JVM murmur3, seed 42) —
      fastest, whole-stage codegen, the engine's own hash family;
    - ``useVWHashing=True``: byte-for-byte VW hash parity
      (``VowpalWabbitMurmurWithPrefix.scala:1-77`` semantics) so the
      produced indices line up with feature spaces of models trained
      by native VW: string columns hash ``colname + value`` with the
      column-name murmur state pre-advanced as a prefix, numeric
      columns hash the bare column name and carry the value, and the
      index is ``murmur & (2^numBits - 1)`` (VW masks, it does not
      mod). Arrow-batched pandas UDF — the per-value work is
      O(len(value)) thanks to the cached prefix state.
    """

    def __init__(self, inputCols=None, outputCol: str = "features",
                 numBits: int = 18, useVWHashing: bool = False,
                 seed: int = 0):
        super().__init__(inputCols=list(inputCols or []), outputCol=outputCol,
                         numBits=numBits, useVWHashing=useVWHashing,
                         seed=seed)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        from pyspark.ml.linalg import VectorUDT

        self._require_cols(schema, *self.inputCols)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, VectorUDT())])

    def _transform(self, df: DataFrame) -> DataFrame:
        if self.useVWHashing:
            return self._transform_vw(df)
        from pyspark.ml.feature import FeatureHasher

        hasher = FeatureHasher(inputCols=self.inputCols,
                               outputCol=self.outputCol,
                               numFeatures=2 ** self.numBits)
        return hasher.transform(df)

    def _transform_vw(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.linalg import VectorUDT
        from pyspark.sql.functions import pandas_udf

        cols = list(self.inputCols)
        mask = (1 << self.numBits) - 1
        dim = 1 << self.numBits
        seed = self.seed
        numeric = {
            f.name for f in df.schema.fields
            if f.name in cols and isinstance(
                f.dataType, (T.IntegerType, T.LongType, T.ShortType,
                             T.ByteType, T.FloatType, T.DoubleType,
                             T.DecimalType))
        }

        @pandas_udf(VectorUDT())
        def hash_rows(*series):
            import pandas as pd

            from mmlspark_spark.functions.murmur import (
                Murmur3PrefixState, vw_hash_string)

            # Column-name murmur states computed once per batch: a
            # numeric column's index is fixed (hash of the bare name),
            # a string column re-uses the prefix state per value.
            # Output is VectorUDT's serialized struct (type 0 =
            # sparse) so the batch stays on the Arrow path — a scalar
            # pandas UDF cannot yield SparseVector objects directly.
            states, fixed_idx = {}, {}
            for c in cols:
                if c in numeric:
                    # VW's hashstring digit passthrough applies to the
                    # full feature string; a bare all-digit column name
                    # is an index, anything else murmurs
                    fixed_idx[c] = vw_hash_string(c, seed) & mask
                else:
                    # colname+value can only be all-digits when the
                    # column NAME is all-digits — handled per value
                    # below; the common case keeps the cached prefix
                    states[c] = (Murmur3PrefixState(c, seed)
                                 if not c.isdigit() else None)
            n = len(series[0])
            indices, values = [], []
            for row in zip(*series):
                acc: dict[int, float] = {}
                for c, v in zip(cols, row):
                    # numeric nulls surface as NaN through Arrow
                    if v is None or (isinstance(v, float) and v != v):
                        continue
                    if c in numeric:
                        i, val = fixed_idx[c], float(v)
                        if val == 0.0:
                            continue  # VW drops zero-valued features
                    elif states[c] is not None:
                        i, val = states[c].hash(str(v)) & mask, 1.0
                    else:  # digit-named column: full VW hashstring
                        i, val = vw_hash_string(c + str(v), seed) & mask, 1.0
                    acc[i] = acc.get(i, 0.0) + val
                pairs = sorted(acc.items())
                indices.append([p[0] for p in pairs])
                values.append([p[1] for p in pairs])
            return pd.DataFrame({
                "type": [0] * n, "size": [dim] * n,
                "indices": indices, "values": values})

        return df.withColumn(self.outputCol, hash_rows(*cols))


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

        # Null-safe length-prefixed serialization shared with
        # ExactDeduplicator (functions/keys.py) — concat_ws skips NULL
        # arguments, so ('x', NULL) and (NULL, 'x') would collapse
        # onto one crossed feature.
        from mmlspark_spark.functions.keys import null_safe_key

        cross = null_safe_key(self.inputCols)
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
        kw.setdefault("learningRate", 0.5)
        kw.setdefault("useBarrierExecutionMode", False)
        kw.setdefault("numTasks", 0)
        kw.setdefault("seed", 42)
        super().__init__(**kw)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol, self.labelCol)
        return schema


class _VWModel(Model):
    def __init__(self, inner=None):
        super().__init__(inner=inner)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        from mmlspark_spark.ml.lightgbm import _sparkml_output_schema

        return _sparkml_output_schema(self.inner, schema)

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
        # every tuning param the stage exposes must reach the native
        # workspace — a silently-defaulted -l trained a materially
        # different model than the barrier path honoring the same param
        args = (f"--quiet --loss_function={loss}"
                f" -l {self.learningRate} --random_seed {self.seed}")
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


class _VWAveragedModel(Model):
    """Linear model from the barrier-averaged distributed fit: VW's
    model family (hashed linear features, logistic/squared loss).
    Scoring is an Arrow-batched numpy dot product at every width —
    the weight vector rides the UDF closure (8 B/dim serialized once
    per executor stream, not per row)."""

    def __init__(self, weights=None, featuresCol: str = "features",
                 predictionCol: str = "prediction", isClassifier: bool = False):
        super().__init__(weights=list(weights or []),
                         featuresCol=featuresCol,
                         predictionCol=predictionCol,
                         isClassifier=isClassifier)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol)
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.predictionCol, T.DoubleType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        from mmlspark_spark.ml.lightgbm import _features_to_array

        w = self.weights
        is_clf = self.isClassifier
        with_arr = _features_to_array(df, self.featuresCol)

        @pandas_udf("double")
        def margin(col):
            import numpy as np
            import pandas as pd

            wv = np.asarray(w, dtype="float64")
            X = np.asarray(col.tolist(), dtype="float64")
            return pd.Series(X @ wv)

        m = margin(F.col("__feat"))
        pred = (m > 0).cast("double") if is_clf else m
        return with_arr.withColumn(self.predictionCol, pred).drop("__feat")


class _VWDistributedFitMixin:
    """Reference ``VowpalWabbitBase.scala:339-445``: one VW worker per
    partition with a per-pass allreduce that averages models across
    the cluster. The python ``vowpalwabbit`` bindings expose weight
    READS (``get_weight``) but no weight injection, so a native
    workspace cannot participate in an average — the distributed path
    instead trains the same model family (linear over hashed features,
    logistic/squared loss) with per-partition numpy SGD and synchronizes
    weights through ``BarrierTaskContext.allGather`` at every pass
    boundary (iterative parameter mixing — same convergence contract
    as the reference's model averaging). Payloads are the weight
    vector (8 B/dim, base64 over the barrier RPC) — fine for linear
    models up to ~2^21 dims; beyond that use the exact single-learner
    native path."""

    def _fit_distributed(self, df: DataFrame):
        from mmlspark_spark.ml.barrier import barrier_train
        from mmlspark_spark.ml.lightgbm import _features_to_array

        lab = F.col(self.labelCol).cast("double")
        if self._classifier:
            lab = F.when(lab > 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        prepared = _features_to_array(df, self.featuresCol).select(
            "__feat", lab.alias("__y"))

        passes = max(1, int(self.numPasses))
        lr0, l2, seed = float(self.learningRate), float(self.l2), self.seed
        is_clf = self._classifier

        def train_fn(X, y, machines, port, pid, extra, ctx):
            import base64
            import json

            import numpy as np

            w = np.zeros(X.shape[1], dtype="float64")
            t = 0
            for p in range(passes):
                order = np.random.default_rng(
                    seed + 131 * p + pid).permutation(len(y))
                for i in order:
                    t += 1
                    lr = lr0 / np.sqrt(t)  # VW's default power_t=0.5
                    m = X[i] @ w
                    if is_clf:  # logistic loss, y in {-1,+1}
                        g = -y[i] / (1.0 + np.exp(y[i] * m))
                    else:  # squared loss
                        g = m - y[i]
                    w -= lr * (g * X[i] + l2 * w)
                # Pass-boundary allreduce: example-count-weighted mean
                # of every worker's weights (the reference averages
                # models at each pass end over its spanning tree).
                payload = json.dumps({
                    "n": int(len(y)),
                    "w": base64.b64encode(w.tobytes()).decode()})
                gathered = [json.loads(g) for g in ctx.allGather(payload)]
                tot = sum(g["n"] for g in gathered)
                w = sum(
                    g["n"] * np.frombuffer(
                        base64.b64decode(g["w"]), dtype="float64")
                    for g in gathered) / tot
            return w.tolist() if pid == 0 else None

        weights = barrier_train(prepared, train_fn,
                                numTasks=self.numTasks or None,
                                pass_context=True)
        return _VWAveragedModel(
            weights=weights, featuresCol=self.featuresCol,
            predictionCol=self.predictionCol, isClassifier=self._classifier)


class VowpalWabbitClassifier(_VWLearnerBase, _VWNativeFitMixin,
                             _VWDistributedFitMixin):
    _classifier = True

    def _fit(self, df: DataFrame):
        if self.useBarrierExecutionMode:
            return self._fit_distributed(df)
        if _have_vw():
            return self._fit_native(df)
        from pyspark.ml.classification import LogisticRegression

        # the native/barrier paths accept VW-convention ±1 labels
        # (lab > 0 → positive); LogisticRegression demands {0,1} — remap
        # so behavior does not depend on which path is installed
        df01 = df.withColumn(
            "__vw_label01",
            F.when(F.col(self.labelCol) > 0, 1.0).otherwise(0.0))
        lr = LogisticRegression(
            featuresCol=self.featuresCol, labelCol="__vw_label01",
            predictionCol=self.predictionCol, maxIter=self.numPasses * 10,
            regParam=self.l2)
        return _VWModel(inner=lr.fit(df01))


class VowpalWabbitRegressor(_VWLearnerBase, _VWNativeFitMixin,
                            _VWDistributedFitMixin):
    _classifier = False

    def _fit(self, df: DataFrame):
        if self.useBarrierExecutionMode:
            return self._fit_distributed(df)
        if _have_vw():
            return self._fit_native(df)
        from pyspark.ml.regression import LinearRegression

        lr = LinearRegression(
            featuresCol=self.featuresCol, labelCol=self.labelCol,
            predictionCol=self.predictionCol, maxIter=self.numPasses * 10,
            regParam=self.l2)
        return _VWModel(inner=lr.fit(df))
