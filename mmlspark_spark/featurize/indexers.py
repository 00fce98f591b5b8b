"""ValueIndexer / IndexToValue — deterministic categorical indexing with
metadata-carried levels.

Parity: reference ``core/.../featurize/ValueIndexer.scala:56-203``
(distinct → sorted levels with nulls last → index; levels stored BOTH as
model param and column metadata — ``ValueIndexer.scala:106-154``) and
``featurize/IndexToValue.scala:29-92``.

Scale note: the level set is model state (like StringIndexer's labels) —
collected once at fit (distinct is computed distributed; only the
distinct values move to the driver). Transform maps via a broadcast
join, so no assumption that levels fit in a literal expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model

MML_LEVELS_KEY = "mml_levels"  # metadata tag carrying categorical levels
MML_NULL_INDEX_KEY = "mml_null_index"  # position of the null level, -1 if none


class ValueIndexerModel(Model):
    """Maps values of ``inputCol`` to their level index (int); writes the
    level list into output-column metadata (``ml_attr``-style + mml)."""

    def __init__(self, inputCol: str = "input", outputCol: str = "output",  # noqa: D107
                 levels: list | None = None):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         levels=levels or [])

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.IntegerType(), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        in_type = df.schema[self.inputCol].dataType
        levels_df = spark.createDataFrame(
            [(lv, i) for i, lv in enumerate(self.levels)],
            T.StructType([
                T.StructField("__level", in_type, True),
                T.StructField("__idx", T.IntegerType(), False),
            ]),
        )
        # metadata arrays must be homogeneous & non-null: carry levels as
        # strings plus the position of the null level (-1 when absent)
        null_idx = next((i for i, v in enumerate(self.levels) if v is None), -1)
        meta = {
            "ml_attr": {"type": "nominal",
                        "vals": [str(v) for v in self.levels if v is not None],
                        "name": self.outputCol},
            MML_LEVELS_KEY: ["" if v is None else str(v) for v in self.levels],
            MML_NULL_INDEX_KEY: null_idx,
        }
        joined = df.join(
            F.broadcast(levels_df),
            F.col(self.inputCol).eqNullSafe(F.col("__level")),
            "left",
        )
        return (
            joined.drop("__level")
            .withColumnRenamed("__idx", self.outputCol)
            .withMetadata(self.outputCol, meta)
        )


class ValueIndexer(Estimator):
    """Fit: distinct values of ``inputCol`` sorted ascending (nulls
    last — reference NullOrdering ValueIndexer.scala:40-54) become the
    level list."""

    def __init__(self, inputCol: str = "input", outputCol: str = "output"):  # noqa: D107
        super().__init__(inputCol=inputCol, outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return schema

    def _fit(self, df: DataFrame) -> ValueIndexerModel:
        rows = (
            df.select(self.inputCol).distinct()
            .orderBy(F.col(self.inputCol).asc_nulls_last())
            .collect()
        )
        levels = [r[0] for r in rows]
        return ValueIndexerModel(inputCol=self.inputCol, outputCol=self.outputCol,
                                 levels=levels)


class IndexToValue(Model):
    """Inverse mapping: reads levels from the input column's metadata
    (mml tag, falling back to ml_attr vals) and restores original values.

    Parity: reference ``featurize/IndexToValue.scala:29-92``.
    """

    def __init__(self, inputCol: str = "input", outputCol: str = "output"):  # noqa: D107
        super().__init__(inputCol=inputCol, outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.StringType(), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        meta = df.schema[self.inputCol].metadata
        if MML_LEVELS_KEY in meta:
            levels = list(meta[MML_LEVELS_KEY])
            null_idx = int(meta.get(MML_NULL_INDEX_KEY, -1))
            if 0 <= null_idx < len(levels):
                levels[null_idx] = None
        elif "ml_attr" in meta and "vals" in meta["ml_attr"]:
            levels = list(meta["ml_attr"]["vals"])
        else:
            raise ValueError(
                f"IndexToValue: no categorical metadata on {self.inputCol}")
        spark = df.sparkSession
        levels_df = spark.createDataFrame(
            [(i, lv) for i, lv in enumerate(levels)], ["__idx", self.outputCol]
        )
        return df.join(
            F.broadcast(levels_df), F.col(self.inputCol) == F.col("__idx"), "left"
        ).drop("__idx")
