"""Complement-set access sampling.

Parity: reference ``core/src/main/python/mmlspark/cyber/anomaly/
complement_access.py:1-148`` (ComplementAccessTransformer): given
(tenant, user_idx, res_idx) access tuples whose indices are dense per
tenant, emit a sample of tuples that did NOT occur (negatives for the
AccessAnomaly model).

Scale re-design: the reference draws candidates with a python
``random.randint`` UDF (unseeded — non-deterministic run to run).
Here candidates come from ``F.floor(F.rand(seed) * span) + min`` —
seeded, JVM-side, and explode-generated, then the observed tuples are
removed with a left-anti join (same as reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer


class ComplementAccessTransformer(Transformer):
    def __init__(self, partitionKey: str | None = None,
                 indexedColNames=("user_idx", "res_idx"),
                 complementsetFactor: int = 2, seed: int = 42):
        super().__init__(partitionKey=partitionKey,
                         indexedColNames=list(indexedColNames),
                         complementsetFactor=complementsetFactor, seed=seed)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        cols = list(self.indexedColNames) + (
            [self.partitionKey] if self.partitionKey else [])
        self._require_cols(schema, *cols)
        keep = ([self.partitionKey] if self.partitionKey else []) + list(self.indexedColNames)
        return T.StructType([schema[c] for c in keep])

    def _transform(self, df: DataFrame) -> DataFrame:
        if self.complementsetFactor == 0:
            return df.select(*self._out_cols(df)).limit(0)
        pk = self.partitionKey or "__pk__"
        src = df if self.partitionKey else df.withColumn(pk, F.lit(0))

        # per-tenant index ranges (tiny → broadcast)
        limits = src.groupBy(pk).agg(*[
            agg for c in self.indexedColNames
            for agg in (F.min(c).alias(f"__min_{c}__"), F.max(c).alias(f"__max_{c}__"))
        ])
        # eqNullSafe: a NULL partition key is a legal tenant value and
        # must match its own limits row (an equi-join would silently
        # drop every null-tenant row from negative sampling)
        lim = limits.withColumnRenamed(pk, "__lim_pk__")
        cand = (src.join(F.broadcast(lim),
                         F.col(pk).eqNullSafe(F.col("__lim_pk__")))
                .drop("__lim_pk__"))
        # factor candidate draws per observed row, seeded and codegen'd
        draws = F.array(*[F.lit(i) for i in range(self.complementsetFactor)])
        cand = cand.withColumn("__draw__", F.explode(draws))
        for j, c in enumerate(self.indexedColNames):
            span = F.col(f"__max_{c}__") - F.col(f"__min_{c}__") + 1
            cand = cand.withColumn(
                c,
                (F.floor(F.rand(self.seed + j) * span) + F.col(f"__min_{c}__"))
                .cast(src.schema[c].dataType),
            )
        out_cols = self._out_cols(src, pk)
        candidates = cand.select(*out_cols).distinct()
        observed = src.select(*out_cols).distinct()
        res = candidates.join(observed, on=out_cols, how="left_anti")
        if not self.partitionKey:
            res = res.drop(pk)
        return res

    def _out_cols(self, df, pk=None):
        pk = pk or self.partitionKey
        return ([pk] if pk else []) + list(self.indexedColNames)
