"""TrainClassifier / TrainRegressor — auto-featurizing model training.

Parity: reference ``core/.../train/TrainClassifier.scala:49-377`` and
``train/TrainRegressor.scala:1-181``: reindex the label (classifier),
auto-featurize heterogeneous input columns into one vector, fit any
SparkML learner, and emit reference-named score columns
(``scores`` / ``scored_probabilities`` / ``scored_labels`` — naming from
``core/.../core/schema/SchemaConstants.scala``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model

SCORES_COL = "scores"
SCORED_PROBABILITIES_COL = "scored_probabilities"
SCORED_LABELS_COL = "scored_labels"


def _feature_cols(df: DataFrame, label_col: str, explicit) -> list[str]:
    if explicit:
        return list(explicit)
    return [c for c in df.columns if c != label_col]


class TrainClassifier(Estimator):
    """``model``: any pyspark.ml classifier (default LogisticRegression).
    Label values are reindexed deterministically (ValueIndexer) and the
    mapping is kept on the model for inverse-transform of predictions."""

    def __init__(self, model=None, labelCol: str = "label",  # noqa: D107
                 inputCols=None, reindexLabel: bool = True,
                 numFeatures: int = 1 << 10):
        super().__init__(model=model, labelCol=labelCol, inputCols=inputCols,
                         reindexLabel=reindexLabel, numFeatures=numFeatures)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.labelCol)
        return schema

    def _fit(self, df: DataFrame) -> "TrainedClassifierModel":
        from pyspark.ml.classification import LogisticRegression

        from mmlspark_spark.featurize import Featurize, ValueIndexer

        learner = self.model or LogisticRegression()
        label, levels = self.labelCol, None
        train_df = df
        if self.reindexLabel:
            indexer = ValueIndexer(inputCol=label, outputCol="__label").fit(df)
            levels = indexer.levels
            train_df = indexer.transform(df)
            label = "__label"
        feats = _feature_cols(df, self.labelCol, self.inputCols)
        fz = Featurize(inputCols=feats, outputCol="__features",
                       numFeatures=self.numFeatures).fit(train_df)
        featurized = fz.transform(train_df)
        learner = learner.copy()
        learner.setParams(labelCol=label, featuresCol="__features")
        fitted = learner.fit(featurized.withColumn(label, F.col(label).cast("double")))
        return TrainedClassifierModel(
            featurizer=fz, innerModel=fitted, labelCol=self.labelCol,
            levels=levels, reindexLabel=self.reindexLabel)


class TrainedClassifierModel(Model):
    def __init__(self, featurizer=None, innerModel=None, labelCol: str = "label",  # noqa: D107
                 levels=None, reindexLabel: bool = True):
        super().__init__(featurizer=featurizer, innerModel=innerModel,
                         labelCol=labelCol, levels=levels,
                         reindexLabel=reindexLabel)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        from pyspark.ml.linalg import VectorUDT

        fields = list(schema.fields)
        inner = self.innerModel
        # declare only what the inner learner actually emits: a
        # LinearSVC has no probability column, and advertising one
        # breaks the eager-validation contract downstream
        if inner is None or inner.hasParam("rawPredictionCol"):
            fields.append(T.StructField(SCORES_COL, VectorUDT(), True))
        if inner is None or inner.hasParam("probabilityCol"):
            fields.append(
                T.StructField(SCORED_PROBABILITIES_COL, VectorUDT(), True))
        if self.reindexLabel and self.levels is not None:
            # predictions are mapped back to the ORIGINAL label space
            lab_type = (schema[self.labelCol].dataType
                        if self.labelCol in schema.fieldNames()
                        else T.StringType())
            fields.append(T.StructField(SCORED_LABELS_COL, lab_type, True))
        else:
            fields.append(T.StructField(SCORED_LABELS_COL, T.DoubleType(), True))
        return T.StructType(fields)

    def _transform(self, df: DataFrame) -> DataFrame:
        scored = self.innerModel.transform(self.featurizer.transform(df))
        renames = {"rawPrediction": SCORES_COL,
                   "probability": SCORED_PROBABILITIES_COL,
                   "prediction": SCORED_LABELS_COL}
        for old, new in renames.items():
            if old in scored.columns:
                scored = scored.withColumnRenamed(old, new)
        if self.reindexLabel and self.levels is not None:
            # map index-space predictions back to the original label
            # values (string labels previously came out as raw indices
            # that nothing downstream could reconcile)
            lut = F.array(*[F.lit(v) for v in self.levels])
            scored = scored.withColumn(
                SCORED_LABELS_COL,
                F.element_at(
                    lut, F.col(SCORED_LABELS_COL).cast("int") + 1))
        return scored.drop("__features", "__label")


class TrainRegressor(Estimator):
    """Regression analog (reference train/TrainRegressor.scala)."""

    def __init__(self, model=None, labelCol: str = "label",  # noqa: D107
                 inputCols=None, numFeatures: int = 1 << 10):
        super().__init__(model=model, labelCol=labelCol, inputCols=inputCols,
                         numFeatures=numFeatures)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.labelCol)
        return schema

    def _fit(self, df: DataFrame) -> "TrainedRegressorModel":
        from pyspark.ml.regression import LinearRegression

        from mmlspark_spark.featurize import Featurize

        learner = self.model or LinearRegression()
        feats = _feature_cols(df, self.labelCol, self.inputCols)
        fz = Featurize(inputCols=feats, outputCol="__features",
                       numFeatures=self.numFeatures).fit(df)
        featurized = fz.transform(df)
        learner = learner.copy()
        learner.setParams(labelCol=self.labelCol, featuresCol="__features")
        fitted = learner.fit(
            featurized.withColumn(self.labelCol, F.col(self.labelCol).cast("double")))
        return TrainedRegressorModel(featurizer=fz, innerModel=fitted,
                                     labelCol=self.labelCol)


class TrainedRegressorModel(Model):
    def __init__(self, featurizer=None, innerModel=None, labelCol: str = "label"):  # noqa: D107
        super().__init__(featurizer=featurizer, innerModel=innerModel,
                         labelCol=labelCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        return T.StructType(list(schema.fields)
                            + [T.StructField(SCORES_COL, T.DoubleType(), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        scored = self.innerModel.transform(self.featurizer.transform(df))
        return scored.withColumnRenamed("prediction", SCORES_COL).drop("__features")
