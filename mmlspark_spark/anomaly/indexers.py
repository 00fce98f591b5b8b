"""Per-tenant dense id indexing.

Parity: reference ``core/src/main/python/mmlspark/cyber/feature/
indexers.py:1-136`` (IdIndexer / MultiIndexer). Vocabulary = distinct
(partition, value) pairs indexed consecutively from 1, either per
partition (``resetPerPartition=True``) or globally; unseen values map
to 0 at transform time.

Scale note: the per-partition path is a window over tenants — shuffles
once on the tenant key and parallelizes across tenants. The global
path needs a total order; we keep the reference's semantics (single
ordered sequence) but note it serializes one window — acceptable
because the vocabulary (distinct values) is orders of magnitude
smaller than the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from mmlspark_spark.core.base import Estimator, Model


class IdIndexerModel(Model):
    def __init__(self, inputCol="id", partitionKey="tenant", outputCol="idx",
                 vocabDf: DataFrame = None):
        super().__init__(inputCol=inputCol, partitionKey=partitionKey,
                         outputCol=outputCol, vocabDf=vocabDf)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol, self.partitionKey)
        fields = [f for f in schema.fields if f.name != self.inputCol]
        return T.StructType(fields + [T.StructField(self.outputCol, T.LongType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df.join(self.vocabDf, on=[self.partitionKey, self.inputCol],
                      how="left_outer")
        return out.withColumn(
            self.outputCol, F.coalesce(F.col(self.outputCol), F.lit(0))
        ).drop(self.inputCol)

    def undo_transform(self, df: DataFrame) -> DataFrame:
        return df.join(self.vocabDf, on=[self.partitionKey, self.outputCol],
                       how="left_outer")


class IdIndexer(Estimator):
    def __init__(self, inputCol: str = "id", partitionKey: str = "tenant",
                 outputCol: str = "idx", resetPerPartition: bool = True):
        super().__init__(inputCol=inputCol, partitionKey=partitionKey,
                         outputCol=outputCol, resetPerPartition=resetPerPartition)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol, self.partitionKey)
        return schema

    def _fit(self, df: DataFrame) -> IdIndexerModel:
        distinct = df.select(self.partitionKey, self.inputCol).distinct()
        if self.resetPerPartition:
            w = Window.partitionBy(self.partitionKey).orderBy(self.inputCol)
        else:
            w = Window.orderBy(self.partitionKey, self.inputCol)
        vocab = distinct.withColumn(self.outputCol, F.row_number().over(w))
        return IdIndexerModel(self.inputCol, self.partitionKey,
                              self.outputCol, vocabDf=vocab)


class MultiIndexerModel(Model):
    def __init__(self, models=None):
        super().__init__(models=models or [])

    def _transform(self, df: DataFrame) -> DataFrame:
        for m in self.models:
            df = m.transform(df)
        return df

    def undo_transform(self, df: DataFrame) -> DataFrame:
        for m in self.models:
            df = m.undo_transform(df)
        return df

    def get_model_by_input_col(self, input_col):
        for m in self.models:
            if m.inputCol == input_col:
                return m
        return None


class MultiIndexer(Estimator):
    def __init__(self, indexers=None):
        super().__init__(indexers=indexers or [])

    def _fit(self, df: DataFrame) -> MultiIndexerModel:
        return MultiIndexerModel(models=[i.fit(df) for i in self.indexers])
