"""AccessAnomaly — collaborative-filtering anomalous-access detection.

Parity: reference ``core/src/main/python/mmlspark/cyber/anomaly/
collaborative_filtering.py:415-988``. Model shape preserved: per-tenant
(user, resource) access tuples → dense indexing → ALS embedding →
score(u, r) = <user_factor, res_factor> → per-tenant standardization,
with anomaly score = **negative** standardized affinity (rare/unlikely
access ⇒ low affinity ⇒ high anomaly score). Complement sampling
(negatives) comes from ``ComplementAccessTransformer`` as in the
reference's ``train`` path.

Deltas vs reference (documented, deliberate): the reference's bespoke
history-dependent rating scheme and connected-components analysis are
replaced by binary ratings (seen=1, complement=0) into ALS — the
standardized-score contract and the API are the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.anomaly.complement import ComplementAccessTransformer
from mmlspark_spark.anomaly.indexers import IdIndexer
from mmlspark_spark.anomaly.scalers import StandardScalarScaler
from mmlspark_spark.core.base import Estimator, Model


class AccessAnomaly(Estimator):
    def __init__(self, tenantCol: str = "tenant", userCol: str = "user",
                 resCol: str = "res", outputCol: str = "anomaly_score",
                 rank: int = 10, maxIter: int = 10, regParam: float = 0.1,
                 complementsetFactor: int = 2, seed: int = 42):
        super().__init__(tenantCol=tenantCol, userCol=userCol, resCol=resCol,
                         outputCol=outputCol, rank=rank, maxIter=maxIter,
                         regParam=regParam, complementsetFactor=complementsetFactor,
                         seed=seed)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.tenantCol, self.userCol, self.resCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.DoubleType())])

    def _fit(self, df: DataFrame) -> "AccessAnomalyModel":
        from pyspark.ml.recommendation import ALS

        t, u, r = self.tenantCol, self.userCol, self.resCol
        user_ix = IdIndexer(inputCol=u, partitionKey=t, outputCol="user_idx",
                            resetPerPartition=False).fit(df)
        res_ix = IdIndexer(inputCol=r, partitionKey=t, outputCol="res_idx",
                           resetPerPartition=False).fit(df)
        indexed = res_ix.transform(user_ix.transform(df)).select(
            t, "user_idx", "res_idx").distinct()
        neg = ComplementAccessTransformer(
            partitionKey=t, indexedColNames=("user_idx", "res_idx"),
            complementsetFactor=self.complementsetFactor, seed=self.seed,
        ).transform(indexed)
        train = indexed.withColumn("rating", F.lit(1.0)).unionByName(
            neg.withColumn("rating", F.lit(0.0)))
        als = ALS(rank=self.rank, maxIter=self.maxIter, regParam=self.regParam,
                  userCol="user_idx", itemCol="res_idx", ratingCol="rating",
                  seed=self.seed, coldStartStrategy="drop", nonnegative=False)
        als_model = als.fit(train)
        model = AccessAnomalyModel(
            tenantCol=t, userCol=u, resCol=r, outputCol=self.outputCol,
            userIndexModel=user_ix, resIndexModel=res_ix,
            userFactors=als_model.userFactors, itemFactors=als_model.itemFactors,
            scalerModel=None)
        # per-tenant standardization of the raw affinity on the train set
        raw = model._raw_scores(df)
        scaler = StandardScalarScaler(
            inputCol="__raw_score__", partitionKey=t, outputCol=self.outputCol,
            coefficientFactor=-1.0,  # high anomaly == unlikely access
        ).fit(raw)
        model.set("scalerModel", scaler)
        return model


class AccessAnomalyModel(Model):
    def __init__(self, tenantCol="tenant", userCol="user", resCol="res",
                 outputCol="anomaly_score", userIndexModel=None,
                 resIndexModel=None, userFactors=None, itemFactors=None,
                 scalerModel=None):
        super().__init__(tenantCol=tenantCol, userCol=userCol, resCol=resCol,
                         outputCol=outputCol, userIndexModel=userIndexModel,
                         resIndexModel=resIndexModel, userFactors=userFactors,
                         itemFactors=itemFactors, scalerModel=scalerModel)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.tenantCol, self.userCol, self.resCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.DoubleType())])

    def _raw_scores(self, df: DataFrame) -> DataFrame:
        indexed = self.resIndexModel.transform(self.userIndexModel.transform(df))
        uf = self.userFactors.select(
            F.col("id").alias("user_idx"), F.col("features").alias("__uf__"))
        itf = self.itemFactors.select(
            F.col("id").alias("res_idx"), F.col("features").alias("__if__"))
        joined = indexed.join(uf, "user_idx", "left").join(itf, "res_idx", "left")
        dot = F.when(
            F.col("__uf__").isNotNull() & F.col("__if__").isNotNull(),
            F.aggregate(F.zip_with("__uf__", "__if__", lambda a, b: a * b),
                        F.lit(0.0), lambda acc, v: acc + v.cast("double")),
        ).otherwise(F.lit(0.0))  # unseen user/res → most anomalous raw score
        return joined.withColumn("__raw_score__", dot).drop("__uf__", "__if__")

    def _transform(self, df: DataFrame) -> DataFrame:
        scored = self.scalerModel.transform(self._raw_scores(df))
        back = self.resIndexModel.undo_transform(
            self.userIndexModel.undo_transform(scored))
        return back.select(*df.columns, self.outputCol)
