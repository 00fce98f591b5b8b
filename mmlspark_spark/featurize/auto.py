"""Featurize — automatic heterogeneous-column → single-vector
featurization — plus CountSelector and timestamp/date vectorizers.

Parity: reference ``core/.../featurize/Featurize.scala:121-238`` (type-
dispatched sub-pipeline built at fit time: impute numerics, one-hot
low-cardinality strings, hash-TF text, timestamp/date → component
vectors, assemble), ``featurize/CountSelector.scala:23-88``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model, Transformer

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def timestamp_features(col: Column | str) -> Column:
    """ts → [epochMillis, year, dayOfWeek, month, dayOfMonth, hour,
    minute, second] as array<double> (reference Featurize.scala:188-203).
    Pure column expressions — no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(*[e.cast("double") for e in (
        F.unix_millis(c), F.year(c), F.dayofweek(c), F.month(c),
        F.dayofmonth(c), F.hour(c), F.minute(c), F.second(c),
    )])


def date_features(col: Column | str) -> Column:
    """date → [epochMillis, year, dayOfWeek, month, dayOfMonth]
    (reference Featurize.scala:204-215)."""
    c = F.col(col) if isinstance(col, str) else col
    ts = c.cast("timestamp")
    return F.array(*[e.cast("double") for e in (
        F.unix_millis(ts), F.year(c), F.dayofweek(c), F.month(c), F.dayofmonth(c),
    )])


class _CoalesceText(Transformer):
    """Internal: null text → empty string into a working column (the
    tokenizer NPEs on nulls; numeric columns get mean-imputation, text
    gets this)."""

    def __init__(self, inputCol: str = "", outputCol: str = ""):
        super().__init__(inputCol=inputCol, outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.StringType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.outputCol, F.coalesce(F.col(self.inputCol), F.lit("")))


class Featurize(Estimator):
    """Fit builds a sub-pipeline per input column by type:

    - numeric/boolean → cast double, mean-impute nulls
    - string, ≤ ``oneHotMaxCategories`` distinct → ValueIndexer + one-hot
    - string, high-cardinality → hashing TF over whitespace tokens
    - timestamp/date → fixed component vectors
    - ML vector → passthrough

    and assembles everything into ``outputCol``.
    """

    def __init__(self, inputCols: Sequence[str] = (),  # noqa: D107
                 outputCol: str = "features", oneHotMaxCategories: int = 32,
                 numFeatures: int = 1 << 10):
        super().__init__(inputCols=list(inputCols), outputCol=outputCol,
                         oneHotMaxCategories=oneHotMaxCategories,
                         numFeatures=numFeatures)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, *self.inputCols)
        from pyspark.ml.linalg import VectorUDT

        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, VectorUDT(), True)])

    def _fit(self, df: DataFrame) -> "FeaturizeModel":
        from pyspark.ml import Pipeline
        from pyspark.ml.feature import (
            HashingTF,
            OneHotEncoder,
            RegexTokenizer,
            VectorAssembler,
        )
        from pyspark.ml.linalg import VectorUDT

        from mmlspark_spark.featurize.indexers import ValueIndexer
        from mmlspark_spark.featurize.missing import CleanMissingData

        pre_specs: list[list[str]] = []  # (kind, in, out) — JSON-able
        stages = []
        assemble: list[str] = []
        numeric_out: list[str] = []
        size_hints: dict[str, int] = {}  # fixed-width vector cols

        # distinct counts for all string cols in ONE pass (not per-column)
        str_cols = [c for c in self.inputCols
                    if isinstance(df.schema[c].dataType, T.StringType)]
        if str_cols:
            cards = df.agg(*[
                F.approx_count_distinct(c).alias(c) for c in str_cols
            ]).collect()[0].asDict()
        else:
            cards = {}

        for c in self.inputCols:
            dt = df.schema[c].dataType
            out = f"__f_{c}"
            if isinstance(dt, _NUMERIC) or isinstance(dt, T.BooleanType):
                pre_specs.append(["double", c, out])
                numeric_out.append(out)
                assemble.append(out)
            elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                pre_specs.append(["timestamp", c, out])
                assemble.append(out)
                size_hints[out] = 8
            elif isinstance(dt, T.DateType):
                pre_specs.append(["date", c, out])
                assemble.append(out)
                size_hints[out] = 5
            elif isinstance(dt, T.StringType):
                if cards[c] <= self.oneHotMaxCategories:
                    stages.append(ValueIndexer(inputCol=c, outputCol=f"{out}_idx"))
                    stages.append(OneHotEncoder(inputCols=[f"{out}_idx"],
                                                outputCols=[out],
                                                handleInvalid="keep"))
                else:
                    # RegexTokenizer NPEs on a null string — route the
                    # text through a null-coalesced working column (the
                    # input column itself is left untouched)
                    stages.append(_CoalesceText(inputCol=c,
                                                outputCol=f"{out}_txt"))
                    stages.append(RegexTokenizer(inputCol=f"{out}_txt",
                                                 outputCol=f"{out}_tok",
                                                 pattern=r"\s+"))
                    stages.append(HashingTF(inputCol=f"{out}_tok", outputCol=out,
                                            numFeatures=self.numFeatures))
                assemble.append(out)
            elif isinstance(dt, VectorUDT):
                assemble.append(c)
            else:
                raise ValueError(f"Featurize: unsupported type {dt} for {c}")

        fit_df = _apply_pre_specs(df, pre_specs)
        if numeric_out:
            imputer = CleanMissingData(cols=numeric_out, cleaningMode="Mean")
            stages.insert(0, imputer)
        from pyspark.ml.feature import VectorSizeHint

        for col_name, size in size_hints.items():
            stages.append(VectorSizeHint(inputCol=col_name, size=size,
                                         handleInvalid="optimistic"))
        stages.append(VectorAssembler(inputCols=assemble, outputCol=self.outputCol,
                                      handleInvalid="keep"))
        pipeline_model = Pipeline(stages=stages).fit(fit_df)
        temp_cols = [c for c in assemble if c.startswith("__f_")] + [
            f"{c}_idx" for c in assemble] + [f"{c}_tok" for c in assemble]
        return FeaturizeModel(preSpecs=pre_specs, pipelineModel=pipeline_model,
                              outputCol=self.outputCol, tempCols=temp_cols)


def _apply_pre_specs(df: DataFrame, specs) -> DataFrame:
    """Materialize the declarative (kind, in, out) preprocessing specs.
    Declarative (vs closing over Column objects) so FeaturizeModel can
    persist them as plain JSON."""
    if not specs:
        return df
    from pyspark.ml.functions import array_to_vector

    exprs = []
    for kind, c, out in specs:
        if kind == "double":
            exprs.append(F.col(c).cast("double").alias(out))
        elif kind == "timestamp":
            exprs.append(array_to_vector(timestamp_features(c)).alias(out))
        elif kind == "date":
            exprs.append(array_to_vector(date_features(c)).alias(out))
        else:
            raise ValueError(f"unknown pre-spec kind {kind!r}")
    return df.select("*", *exprs)


class FeaturizeModel(Model):
    def __init__(self, preSpecs=None, pipelineModel=None,  # noqa: D107
                 outputCol: str = "features", tempCols=None):
        super().__init__(preSpecs=[list(s) for s in (preSpecs or [])],
                         pipelineModel=pipelineModel,
                         outputCol=outputCol, tempCols=tempCols or [])

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        from pyspark.ml.linalg import VectorUDT

        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, VectorUDT(), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        staged = _apply_pre_specs(df, self.preSpecs)
        out = self.pipelineModel.transform(staged)
        # drop only OUR temp columns — callers may carry __-prefixed
        # working columns (e.g. TrainClassifier's __label)
        return out.drop(*[c for c in self.tempCols if c in out.columns])


class CountSelectorModel(Model):
    """Keeps only the vector slots listed in ``indices``."""

    def __init__(self, inputCol: str = "features", outputCol: str = "selected",  # noqa: D107
                 indices: Sequence[int] = ()):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         indices=list(indices))

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        from pyspark.ml.linalg import VectorUDT

        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, VectorUDT(), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.feature import VectorSlicer

        slicer = VectorSlicer(inputCol=self.inputCol, outputCol=self.outputCol,
                              indices=[int(i) for i in self.indices])
        return slicer.transform(df)


class CountSelector(Estimator):
    """Drop vector slots that are all-zero in the fit data → VectorSlicer.

    Parity: reference ``featurize/CountSelector.scala:23-88``. Fit is one
    aggregation: elementwise max(|x|) over the vector column, computed on
    arrays (no driver-side vectors)."""

    def __init__(self, inputCol: str = "features", outputCol: str = "selected"):  # noqa: D107
        super().__init__(inputCol=inputCol, outputCol=outputCol)

    def _fit(self, df: DataFrame) -> CountSelectorModel:
        from pyspark.ml.functions import vector_to_array

        from mmlspark_spark.functions.vector import vector_dim

        # null-safe dimension probe with a real error on an empty /
        # all-null frame (first()[0] raised an opaque TypeError)
        dim = vector_dim(df, self.inputCol)
        if dim == 0:
            return CountSelectorModel(inputCol=self.inputCol,
                                      outputCol=self.outputCol, indices=[])
        arr = vector_to_array(F.col(self.inputCol))
        maxes = df.agg(*[
            F.max(F.abs(arr[i])).alias(f"m{i}") for i in range(dim)
        ]).collect()[0]
        indices = [i for i in range(dim) if (maxes[i] or 0.0) > 0.0]
        return CountSelectorModel(inputCol=self.inputCol, outputCol=self.outputCol,
                                  indices=indices)
