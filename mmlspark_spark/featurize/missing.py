"""CleanMissingData — per-column imputation (mean / median / mode /
custom / remove-row).

Parity: reference ``core/.../featurize/CleanMissingData.scala:48-182``
(mean, approx median via ``approxQuantile(0.5)``, custom value, remove).
Fit computes all fill values in ONE distributed aggregation; transform
is ``df.na.fill`` — no per-column jobs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model


class CleanMissingDataModel(Model):
    def __init__(self, cols: Sequence[str] = (), fillValues: dict | None = None,  # noqa: D107
                 remove: bool = False):
        super().__init__(cols=list(cols), fillValues=fillValues or {},
                         remove=remove)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, *self.cols)
        return schema

    def _transform(self, df: DataFrame) -> DataFrame:
        if self.remove:
            return df.na.drop(subset=list(self.cols))
        return df.na.fill(self.fillValues)


class CleanMissingData(Estimator):
    """``cleaningMode``: Mean | Median | Custom | Remove.
    ``customValue`` applies in Custom mode."""

    def __init__(self, cols: Sequence[str] = (), cleaningMode: str = "Mean",  # noqa: D107
                 customValue=None):
        super().__init__(cols=list(cols), cleaningMode=cleaningMode,
                         customValue=customValue)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, *self.cols)
        return schema

    def _fit(self, df: DataFrame) -> CleanMissingDataModel:
        mode = self.cleaningMode
        if mode == "Remove":
            return CleanMissingDataModel(cols=self.cols, remove=True)
        if mode == "Custom":
            return CleanMissingDataModel(
                cols=self.cols, fillValues={c: self.customValue for c in self.cols})
        if mode == "Mean":
            aggs = [F.mean(F.col(c)).alias(c) for c in self.cols]
        elif mode == "Median":
            aggs = [F.percentile_approx(F.col(c), F.lit(0.5)).alias(c)
                    for c in self.cols]
        else:
            raise ValueError(f"CleanMissingData: unknown mode {mode}")
        row = df.agg(*aggs).collect()[0].asDict()
        fills = {}
        for c in self.cols:
            v = row[c]
            if v is None:
                # an all-null (or empty) column has no statistic to
                # impute from: na.fill(None) NPEs at transform time,
                # and fabricating 0 imputes a value the data never
                # contained — fail at fit with the column name
                raise ValueError(
                    f"CleanMissingData: column '{c}' has no non-null "
                    f"values to compute a {mode} fill from; use "
                    f"Custom/Remove mode for all-null columns")
            # integral columns need integral fills for na.fill to apply
            if isinstance(df.schema[c].dataType,
                          (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
                v = int(round(v))
            fills[c] = v
        return CleanMissingDataModel(cols=self.cols, fillValues=fills)
