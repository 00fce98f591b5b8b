"""LightGBM stage surface.

Parity: reference ``lightgbm/.../LightGBMClassifier.scala``,
``LightGBMRegressor.scala``, ``LightGBMRanker.scala`` + params
(``params/LightGBMParams.scala``). The reference gang-schedules native
LightGBM workers over barrier ``mapPartitions`` with socket NetworkInit
(``LightGBMBase.scala:43-520``).

This engine (SURVEY §7 step 10): same API, three execution paths — the
stage NEVER raises because of which packages happen to be installed:

- ``lightgbm`` importable, default → DISTRIBUTED native training:
  barrier gang-scheduled workers (``ml/barrier.py``), one per
  partition, exchange host:port via ``allGather`` and train
  data-parallel (``tree_learner=data``) over socket NetworkInit —
  the PySpark expression of ``LightGBMBase.scala:392-432,475-484``.
  Scoring ships the booster as its model string, re-hydrated once per
  Arrow batch stream inside ``mapInPandas``;
- ``lightgbm`` importable, ``sampleFit=True`` → single-node native fit
  on a RANDOM ``sample(fraction, seed)`` bounded by
  ``nativeSampleLimit`` rows (for quick iteration / tiny data);
- otherwise → Spark's own distributed GBT with a faithful param mapping
  (numIterations→maxIter, learningRate→stepSize, numLeaves→maxDepth=
  ⌈log2 leaves⌉) — the trade-off the reference itself benchmarks
  against (``docs/lightgbm.md:17-19``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model


def _have_lightgbm() -> bool:
    try:
        import lightgbm  # noqa: F401

        return True
    except ImportError:
        return False


def _features_to_array(df: DataFrame, featuresCol: str):
    """Return (df with __feat as array<double>, original dtype).

    VectorUDT is converted via ``vector_to_array`` so the column crosses
    the Arrow boundary as a plain list; arrays pass through.
    """
    dtype = df.schema[featuresCol].dataType
    if isinstance(dtype, T.ArrayType):
        return df.withColumn("__feat", F.col(featuresCol).cast("array<double>"))
    from pyspark.ml.functions import vector_to_array

    return df.withColumn("__feat", vector_to_array(F.col(featuresCol)))


class _LightGBMBase(Estimator):
    _objective = "regression"

    def __init__(self, **kw):
        kw.setdefault("featuresCol", "features")
        kw.setdefault("labelCol", "label")
        kw.setdefault("predictionCol", "prediction")
        kw.setdefault("numIterations", 100)
        kw.setdefault("numLeaves", 31)
        kw.setdefault("learningRate", 0.1)
        kw.setdefault("seed", 42)
        kw.setdefault("nativeSampleLimit", 1_000_000)
        kw.setdefault("sampleFit", False)
        kw.setdefault("numTasks", 0)  # 0 = one task per input partition
        # "data" | "voting" — reference LightGBMParams parallelism
        # ("data_parallel"/"voting_parallel" accepted as aliases;
        # feature-parallel is rejected — see _tree_learner). Voting
        # trades exact split finding for O(top_k) histogram traffic:
        # each worker votes its local top-k features and only those
        # histograms are merged (Meng et al., NIPS 2016) — the scale
        # path when feature count × machines makes full data-parallel
        # merges network-bound.
        kw.setdefault("parallelism", "data")
        kw.setdefault("topK", 20)  # voting-parallel vote size
        super().__init__(**kw)
        # validate EAGERLY: the barrier path is the only consumer, so
        # a typo'd value would otherwise surface only on a host with
        # the native package and sampleFit off — or never (GBT
        # fallback), letting a user believe they benchmarked voting
        self._tree_learner()

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

    def _native_params(self) -> dict:
        return {
            "objective": self._objective,
            "num_leaves": self.numLeaves,
            "learning_rate": self.learningRate,
            "seed": self.seed,
            "verbose": -1,
        }

    def _make_model(self, model_str: str) -> "LightGBMNativeModel":
        return LightGBMNativeModel(
            modelStr=model_str,
            featuresCol=self.featuresCol,
            predictionCol=self.predictionCol,
            isClassifier=self._objective == "binary",
        )

    def _prepared(self, df: DataFrame) -> DataFrame:
        return _features_to_array(df, self.featuresCol).select(
            "__feat", F.col(self.labelCol).cast("double").alias("__y"))

    def _fit_native(self, df: DataFrame) -> "LightGBMNativeModel":
        """Single-node fit on a bounded RANDOM sample (sampleFit=True).

        ``sample(fraction, seed)``, not ``limit``: a limit takes a
        deterministic prefix, and label- or time-sorted input would
        train on a single class (binary objective can outright fail)."""
        import numpy as np
        import lightgbm

        prepared = self._prepared(df)
        limit = self.nativeSampleLimit
        total = prepared.count()
        if limit and total > limit:
            prepared = prepared.sample(fraction=min(1.0, limit / total),
                                       seed=self.seed)
        sample = prepared.toPandas()
        X = np.array(sample["__feat"].tolist(), dtype="float64")
        y = sample["__y"].to_numpy()
        booster = lightgbm.train(
            self._native_params(), lightgbm.Dataset(X, label=y),
            num_boost_round=self.numIterations,
        )
        return self._make_model(booster.model_to_string())

    def _tree_learner(self) -> tuple[str, dict]:
        """Map the reference's ``parallelism`` param to LightGBM's
        ``tree_learner`` (+ learner-specific params). Reference
        ``params/LightGBMParams.scala`` (parallelism, topK) +
        ``TrainUtils.scala:236-291`` (voting-parallel wiring)."""
        mode = str(self.parallelism).lower().replace("_parallel", "")
        learners = {"data": "data", "voting": "voting"}
        if mode not in learners:
            # no silent "serial" alias: serial with >1 barrier tasks
            # would train disconnected workers and return partition
            # 0's shard-only model — single-machine training is
            # sampleFit=True or numTasks=1, both already data-safe.
            # "feature" is rejected too: LightGBM's feature-parallel
            # learner assumes EVERY machine holds the full dataset,
            # while this barrier path gives each task only its row
            # partition — accepting it would train a silently
            # divergent model (the reference documents only
            # data_parallel/voting_parallel for this param).
            raise ValueError(
                f"parallelism must be one of data/voting "
                f"(got {self.parallelism!r}); for single-machine "
                "training use sampleFit=True or numTasks=1")
        extra = {"top_k": int(self.topK)} if mode == "voting" else {}
        return learners[mode], extra

    def _fit_native_distributed(self, df: DataFrame) -> "LightGBMNativeModel":
        """Barrier gang-scheduled data-parallel native training
        (reference ``LightGBMBase.scala:392-432,475-484``): every task
        trains on its own partition, synchronizing histograms over the
        allGather-exchanged machine list; the boosters converge
        identically, so partition 0's model string is THE model.
        ``parallelism="voting"`` switches the histogram merge to
        top-k voting (reference ``TrainUtils.scala:236-291``)."""
        from mmlspark_spark.ml.barrier import barrier_train

        params = self._native_params()
        rounds = self.numIterations
        learner, learner_extra = self._tree_learner()

        def train_fn(X, y, machines, port, pid, extra):
            import lightgbm

            p = dict(params)
            if len(machines) > 1:
                p.update(
                    tree_learner=learner,
                    machines=",".join(machines),
                    local_listen_port=port,
                    num_machines=len(machines),
                    pre_partition=True,
                    **learner_extra,
                )
            booster = lightgbm.train(
                p, lightgbm.Dataset(X, label=y), num_boost_round=rounds)
            try:
                booster.free_network()
            except Exception:
                pass
            return booster.model_to_string() if pid == 0 else None

        model_str = barrier_train(self._prepared(df), train_fn,
                                  numTasks=self.numTasks or None)
        return self._make_model(model_str)

    def _fit_with_lightgbm(self, df: DataFrame) -> "LightGBMNativeModel":
        if self.sampleFit:
            return self._fit_native(df)
        return self._fit_native_distributed(df)


def _sparkml_output_schema(inner, schema: T.StructType) -> T.StructType:
    """Output schema for a wrapped stock SparkML model: appends the
    prediction/rawPrediction/probability columns the inner model adds
    (a schema-preserving pass-through understated the output and broke
    eager validation for downstream stages needing 'prediction').
    Never mutates the caller's schema object."""
    from pyspark.ml.linalg import VectorUDT

    fields = list(schema.fields)
    names = {f.name for f in fields}

    def add(name, dt):
        if name and name not in names:
            fields.append(T.StructField(name, dt))
            names.add(name)

    if hasattr(inner, "getPredictionCol"):
        add(inner.getPredictionCol(), T.DoubleType())
    if hasattr(inner, "getRawPredictionCol"):
        add(inner.getRawPredictionCol(), VectorUDT())
    if hasattr(inner, "getProbabilityCol"):
        add(inner.getProbabilityCol(), VectorUDT())
    return T.StructType(fields)


class _WrappedModel(Model):
    def __init__(self, inner=None):
        super().__init__(inner=inner)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        return _sparkml_output_schema(self.inner, schema)

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.inner.transform(df)


class LightGBMNativeModel(Model):
    """Booster scored distributed: model string broadcast by closure,
    re-hydrated once per partition stream, Arrow-batched predict."""

    def __init__(self, modelStr: str = "", featuresCol: str = "features",
                 predictionCol: str = "prediction", isClassifier: bool = False):
        super().__init__(modelStr=modelStr, featuresCol=featuresCol,
                         predictionCol=predictionCol, isClassifier=isClassifier)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.featuresCol)
        # StructType.add mutates in place; never touch the caller's
        # (possibly cached) schema object.
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.predictionCol, T.DoubleType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        model_str = self.modelStr
        pred_col = self.predictionCol
        is_clf = self.isClassifier
        arr = _features_to_array(df, self.featuresCol)
        out_schema = T.StructType(
            list(arr.schema.fields) + [T.StructField(pred_col, T.DoubleType())])

        def score(batches):
            import numpy as np
            import lightgbm

            booster = lightgbm.Booster(model_str=model_str)
            for pdf in batches:
                if len(pdf):
                    X = np.array(pdf["__feat"].tolist(), dtype="float64")
                    p = np.asarray(booster.predict(X), dtype="float64")
                    pdf[pred_col] = (p > 0.5).astype("float64") if is_clf else p
                else:
                    pdf[pred_col] = []
                yield pdf

        return arr.mapInPandas(score, out_schema).drop("__feat")


class LightGBMClassifier(_LightGBMBase):
    _objective = "binary"

    def _fit(self, df: DataFrame):
        if _have_lightgbm():
            return self._fit_with_lightgbm(df)
        from pyspark.ml.classification import GBTClassifier

        return _WrappedModel(inner=GBTClassifier(**self._spark_params()).fit(df))


class LightGBMRegressor(_LightGBMBase):
    _objective = "regression"

    def _fit(self, df: DataFrame):
        if _have_lightgbm():
            return self._fit_with_lightgbm(df)
        from pyspark.ml.regression import GBTRegressor

        return _WrappedModel(inner=GBTRegressor(**self._spark_params()).fit(df))


class LightGBMRanker(_LightGBMBase):
    """Native path: TRUE lambdarank — query groups are hash-partitioned
    whole onto barrier tasks and sorted contiguous within each
    (``barrier_train(repartitionCols=[group])``), so every worker hands
    LightGBM its local group-size layout while histograms sync over the
    network, matching the reference's group-aware distributed loss
    (``LightGBMRanker.scala`` + ``LightGBMBase.scala:392-432``).
    Fallback without the package: regression on relevance labels
    (documented delta). ``sampleFit`` is ignored — a row sample would
    shred query groups."""

    _objective = "lambdarank"

    def __init__(self, **kw):
        kw.setdefault("groupCol", "group")
        super().__init__(**kw)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        # eager contract: a missing group column must fail HERE with
        # its name, not as an unresolved-column error inside _fit
        out = super().transform_schema(schema)
        self._require_cols(schema, self.groupCol)
        return out

    def _fit(self, df: DataFrame):
        if not _have_lightgbm():
            from pyspark.ml.regression import GBTRegressor

            params = self._spark_params()
            return _WrappedModel(inner=GBTRegressor(**params).fit(df))

        from mmlspark_spark.ml.barrier import barrier_train

        params = self._native_params()
        rounds = self.numIterations

        def train_fn(X, y, machines, port, pid, extra):
            import lightgbm
            import numpy as np

            # contiguous run-length group sizes (groups are sorted
            # within the partition by barrier_train)
            sizes, prev = [], object()
            for v in (extra if extra is not None else []):
                if v != prev:
                    sizes.append(1)
                    prev = v
                else:
                    sizes[-1] += 1
            p = dict(params)
            if len(machines) > 1:
                p.update(tree_learner="data", machines=",".join(machines),
                         local_listen_port=port,
                         num_machines=len(machines), pre_partition=True)
            ds = lightgbm.Dataset(X, label=np.maximum(y, 0).astype(int),
                                  group=sizes)
            booster = lightgbm.train(p, ds, num_boost_round=rounds)
            try:
                booster.free_network()
            except Exception:
                pass
            return booster.model_to_string() if pid == 0 else None

        prepared = _features_to_array(df, self.featuresCol).select(
            "__feat", F.col(self.labelCol).cast("double").alias("__y"),
            F.col(self.groupCol).cast("string").alias("__g"))
        model_str = barrier_train(prepared, train_fn,
                                  numTasks=self.numTasks or None,
                                  repartitionCols=["__g"], sortCols=["__g"])
        return self._make_model(model_str)
