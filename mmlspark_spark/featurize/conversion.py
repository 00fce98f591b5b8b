"""DataConversion — typed column casting with date/timestamp formats.

Parity: reference ``core/.../featurize/DataConversion.scala:83-157``
(primitive casts, ``toCategorical`` via indexer, date parse/render with
format strings). Pure ``cast``/``to_timestamp``/``date_format``
expressions — codegen'd, no UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer

_PRIMITIVES = {
    "boolean": T.BooleanType(), "byte": T.ByteType(), "short": T.ShortType(),
    "integer": T.IntegerType(), "int": T.IntegerType(), "long": T.LongType(),
    "float": T.FloatType(), "double": T.DoubleType(), "string": T.StringType(),
}


class DataConversion(Transformer):
    """Convert ``cols`` to ``convertTo`` (a primitive name, ``date`` or
    ``timestamp``); ``dateTimeFormat`` applies when parsing strings into
    date/timestamp or rendering them back to string."""

    def __init__(self, cols: Sequence[str] = (), convertTo: str = "double",  # noqa: D107
                 dateTimeFormat: str | None = None):
        super().__init__(cols=list(cols), convertTo=convertTo,
                         dateTimeFormat=dateTimeFormat)

    def _target_type(self) -> T.DataType:
        if self.convertTo in _PRIMITIVES:
            return _PRIMITIVES[self.convertTo]
        if self.convertTo == "date":
            return T.DateType()
        if self.convertTo == "timestamp":
            return T.TimestampType()
        if self.convertTo == "toCategorical":
            return T.IntegerType()
        raise ValueError(f"DataConversion: unknown target {self.convertTo}")

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, *self.cols)
        tgt = self._target_type()
        return T.StructType([
            T.StructField(f.name, tgt, True) if f.name in self.cols else f
            for f in schema.fields
        ])

    def _convert(self, df: DataFrame, c: str) -> F.Column:
        # TimestampNTZType counts as a timestamp source: Spark 4 infers
        # NTZ from parquet timestamps with isAdjustedToUTC=false.
        col, src = F.col(c), df.schema[c].dataType
        fmt = self.dateTimeFormat
        temporal = (T.DateType, T.TimestampType, T.TimestampNTZType)
        if self.convertTo == "timestamp":
            return F.to_timestamp(col, fmt) if (
                isinstance(src, T.StringType) and fmt) else col.cast("timestamp")
        if self.convertTo == "date":
            return F.to_date(col, fmt) if (
                isinstance(src, T.StringType) and fmt) else col.cast("date")
        if self.convertTo == "string" and fmt and isinstance(src, temporal):
            return F.date_format(col, fmt)
        return col.cast(self._target_type())

    def _transform(self, df: DataFrame) -> DataFrame:
        if self.convertTo == "toCategorical":
            # reference DataConversion.scala's toCategorical mode: each
            # column routes through the ValueIndexer (sorted-distinct
            # vocabulary, metadata-carried categorical). Fitting inside
            # a transform runs one small distinct job per column — the
            # same work the reference's indexer does.
            from mmlspark_spark.featurize import ValueIndexer

            original_cols = df.columns
            for c in self.cols:
                df = (ValueIndexer(inputCol=c, outputCol=f"__{c}_idx__")
                      .fit(df).transform(df)
                      .drop(c).withColumnRenamed(f"__{c}_idx__", c))
            # drop+rename moved each converted column to the end;
            # transform_schema declares in-place conversion, so restore
            # the original column order (eager-schema contract).
            return df.select(*original_cols)
        for c in self.cols:
            df = df.withColumn(c, self._convert(df, c))
        return df
