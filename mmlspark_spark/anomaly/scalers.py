"""Per-tenant scalar scalers.

Parity: reference ``core/src/main/python/mmlspark/cyber/feature/
scalers.py:18-325`` (StandardScalarScaler / LinearScalarScaler).
Semantics preserved exactly — including the reference's asymmetries:
std is **population** stddev; the partitioned standard path falls back
to ``x - mean`` when std == 0; the linear path maps a degenerate
(min == max) group to the midpoint of the required range.

Scale re-design: the reference applies stats via a row-at-a-time python
UDF; here the normalization is a pure column expression after a
**broadcast** join of the per-group stats (one row per tenant), so the
hot path never leaves whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model


class _ScalerSchemaMixin:
    """One copy of the scaler schema contract (it was duplicated
    byte-for-byte between estimator and model bases), including the
    internal-stats-column clash check."""

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        cols = [self.inputCol] + ([self.partitionKey] if self.partitionKey else [])
        self._require_cols(schema, *cols)
        clash = [c for c in ("__mean__", "__std__", "__min__", "__max__")
                 if c in schema.fieldNames()]
        if clash:
            raise ValueError(
                f"{type(self).__name__}: input already has internal "
                f"stats column(s) {clash}; rename them first")
        return T.StructType(
            list(schema.fields) + [T.StructField(self.outputCol, T.DoubleType())]
        )


class _PerPartitionScalerBase(_ScalerSchemaMixin, Estimator):
    pass


class _ScalerModelBase(_ScalerSchemaMixin, Model):
    pass


class StandardScalarScalerModel(_ScalerModelBase):
    def __init__(self, inputCol="value", partitionKey=None, outputCol="scaled",
                 statsDf=None, stats=None, coefficientFactor: float = 1.0):
        super().__init__(inputCol=inputCol, partitionKey=partitionKey,
                         outputCol=outputCol, statsDf=statsDf, stats=stats,
                         coefficientFactor=coefficientFactor)

    def _transform(self, df: DataFrame) -> DataFrame:
        x = F.col(self.inputCol)
        if self.partitionKey is not None:
            joined = df.join(F.broadcast(self.statsDf), self.partitionKey, "left")
            norm = F.when(
                F.col("__std__") != 0.0,
                F.lit(self.coefficientFactor) * (x - F.col("__mean__")) / F.col("__std__"),
            ).otherwise(x - F.col("__mean__"))
            return (joined.withColumn(self.outputCol, norm)
                    .select(*df.columns, self.outputCol))
        mean, std = self.stats["__mean__"], self.stats["__std__"]
        if mean is None:  # fit data empty/all-null: no stats to apply
            return df.withColumn(self.outputCol,
                                 F.lit(None).cast("double"))
        if not std:
            # constant column: same x - mean fallback the partitioned
            # path takes (a bare division would be NULL or an ANSI
            # DIVIDE_BY_ZERO depending on mode)
            return df.withColumn(self.outputCol, x - F.lit(mean))
        return df.withColumn(
            self.outputCol, F.lit(self.coefficientFactor) * (x - mean) / std
        )


class StandardScalarScaler(_PerPartitionScalerBase):
    """(x - mean) / stddev_pop per tenant."""

    def __init__(self, inputCol: str = "value", partitionKey: str | None = None,
                 outputCol: str = "scaled", coefficientFactor: float = 1.0):
        super().__init__(inputCol=inputCol, partitionKey=partitionKey,
                         outputCol=outputCol, coefficientFactor=coefficientFactor)

    def _fit(self, df: DataFrame) -> StandardScalarScalerModel:
        aggs = [F.mean(self.inputCol).alias("__mean__"),
                F.stddev_pop(self.inputCol).alias("__std__")]
        if self.partitionKey is None:
            stats = df.agg(*aggs).collect()[0].asDict()
            return StandardScalarScalerModel(
                self.inputCol, None, self.outputCol, stats=stats,
                coefficientFactor=self.coefficientFactor)
        return StandardScalarScalerModel(
            self.inputCol, self.partitionKey, self.outputCol,
            statsDf=df.groupBy(self.partitionKey).agg(*aggs),
            coefficientFactor=self.coefficientFactor)


class LinearScalarScalerModel(_ScalerModelBase):
    def __init__(self, inputCol="value", partitionKey=None, outputCol="scaled",
                 statsDf=None, stats=None, minRequiredValue: float = 0.0,
                 maxRequiredValue: float = 1.0):
        super().__init__(inputCol=inputCol, partitionKey=partitionKey,
                         outputCol=outputCol, statsDf=statsDf, stats=stats,
                         minRequiredValue=minRequiredValue,
                         maxRequiredValue=maxRequiredValue)

    def _transform(self, df: DataFrame) -> DataFrame:
        x = F.col(self.inputCol)
        req_delta = self.maxRequiredValue - self.minRequiredValue
        if self.partitionKey is not None:
            joined = df.join(F.broadcast(self.statsDf), self.partitionKey, "left")
            delta = F.col("__max__") - F.col("__min__")
            a = F.when(delta != 0, F.lit(req_delta) / delta).otherwise(F.lit(0.0))
            b = F.when(delta != 0,
                       self.maxRequiredValue - a * F.col("__max__")
                       ).otherwise(F.lit((self.minRequiredValue + self.maxRequiredValue) / 2.0))
            # a partition key NEVER seen at fit time has no stats: the
            # output must be NULL, not the fabricated range midpoint
            # the delta==0 branch would otherwise invent
            scaled = F.when(F.col("__min__").isNotNull(), a * x + b)
            return (joined.withColumn(self.outputCol, scaled)
                    .select(*df.columns, self.outputCol))
        lo, hi = self.stats["__min__"], self.stats["__max__"]
        if lo is None or hi is None:  # fit data empty/all-null
            return df.withColumn(self.outputCol,
                                 F.lit(None).cast("double"))
        delta = hi - lo
        a = req_delta / delta if delta != 0.0 else 0.0
        b = (self.maxRequiredValue - a * hi if delta != 0.0
             else (self.minRequiredValue + self.maxRequiredValue) / 2.0)
        return df.withColumn(self.outputCol, F.lit(a) * x + F.lit(b))


class LinearScalarScaler(_PerPartitionScalerBase):
    """Affine map of per-tenant [min, max] onto [minRequired, maxRequired]."""

    def __init__(self, inputCol: str = "value", partitionKey: str | None = None,
                 outputCol: str = "scaled", minRequiredValue: float = 0.0,
                 maxRequiredValue: float = 1.0):
        super().__init__(inputCol=inputCol, partitionKey=partitionKey,
                         outputCol=outputCol, minRequiredValue=minRequiredValue,
                         maxRequiredValue=maxRequiredValue)

    def _fit(self, df: DataFrame) -> LinearScalarScalerModel:
        aggs = [F.min(self.inputCol).alias("__min__"),
                F.max(self.inputCol).alias("__max__")]
        if self.partitionKey is None:
            stats = df.agg(*aggs).collect()[0].asDict()
            return LinearScalarScalerModel(
                self.inputCol, None, self.outputCol, stats=stats,
                minRequiredValue=self.minRequiredValue,
                maxRequiredValue=self.maxRequiredValue)
        return LinearScalarScalerModel(
            self.inputCol, self.partitionKey, self.outputCol,
            statsDf=df.groupBy(self.partitionKey).agg(*aggs),
            minRequiredValue=self.minRequiredValue,
            maxRequiredValue=self.maxRequiredValue)
