"""AccessAnomaly — collaborative-filtering anomalous-access detection.

Parity: reference ``core/src/main/python/mmlspark/cyber/anomaly/
collaborative_filtering.py:415-988``. Model shape preserved: per-tenant
(user, resource) access tuples → dense indexing → ALS embedding →
score(u, r) = <user_factor, res_factor> → per-tenant standardization,
with anomaly score = **negative** standardized affinity (rare/unlikely
access ⇒ low affinity ⇒ high anomaly score).

Training parity (reference ``_enrich_and_normalize``, :686-716):

- per-tenant RATING SCALING: when ``likelihoodCol`` is given, per-pair
  likelihoods (e.g. access counts) are affinely mapped per tenant onto
  ``[lowValue, highValue]`` (defaults 5..10, reference
  ``AccessAnomalyConfig``), and complement negatives get ``negScore``
  (default 1.0 < lowValue) instead of 0 — so "rarely accessed" and
  "never accessed" are separated on the rating axis;
- complement sampling via :class:`ComplementAccessTransformer`
  (reference :700-707);
- ``nonnegative=True`` ALS (reference :760-772);
- CONNECTED COMPONENTS (reference ``ConnectedComponents.transform``,
  :415-469): users/resources in different components of the bipartite
  access graph share no path at all, so their affinity estimate is
  meaningless — the reference scores such pairs ``+inf`` (maximally
  anomalous, :381-387); so does this model.

Deltas vs reference (documented, deliberate): per-tenant
standardization happens by scaling raw scores with
``StandardScalarScaler`` instead of baking the normalization into the
factor vectors via the append-bias trick (same standardized-score
contract); the implicit-feedback ALS variant is not exposed (the
explicit path with complement sampling is the reference's
``applyImplicitCf=False`` branch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.anomaly.complement import ComplementAccessTransformer
from mmlspark_spark.anomaly.indexers import IdIndexer
from mmlspark_spark.anomaly.scalers import (
    LinearScalarScaler,
    StandardScalarScaler,
)
from mmlspark_spark.core.base import Estimator, Model


def connected_components(df: DataFrame, tenantCol: str, userCol: str,
                         resCol: str, maxIter: int = 20):
    """Per-tenant connected components of the bipartite user↔resource
    access graph. Returns ``(user2component, res2component)`` frames
    with a ``component`` column.

    Semantics: reference ``ConnectedComponents.transform``
    (collaborative_filtering.py:415-469) — alternating min-label
    propagation: each user starts with a unique label; resources take
    the min label of their users, users take the min label of their
    resources, until a fixed point. Distributed shape: every iteration
    is two equi-joins + two groupBys on (tenant, id) — no driver-side
    graph; lineage is truncated per iteration (``localCheckpoint``) so
    the plan doesn't grow with the diameter. Iterations needed ≈ half
    the graph diameter; access graphs are shallow in practice
    (``maxIter`` is a safety bound, hit only by path-like graphs).
    """
    from mmlspark_spark.operators.scale import zip_with_index

    t, u, r = tenantCol, userCol, resCol
    edges = df.select(t, u, r).distinct()
    users = edges.select(t, u).distinct()
    user2comp = zip_with_index(users, col_name="component")
    # user count is loop-invariant (labels change, membership doesn't)
    total = user2comp.count()
    converged = False
    for _ in range(maxIter):
        res2comp = (edges.join(user2comp, [t, u])
                    .groupBy(t, r).agg(F.min("component").alias("component")))
        nxt = (edges.join(res2comp, [t, r])
               .groupBy(t, u).agg(F.min("component").alias("component")))
        nxt = nxt.localCheckpoint()
        unchanged = user2comp.join(nxt, [t, u, "component"]).count()
        user2comp = nxt
        # superseded localCheckpoint blocks have no public release
        # handle (DataFrame.unpersist only consults the cache manager,
        # which does not track checkpoint storage); the ContextCleaner
        # reclaims them as the python references drop, and the
        # transient footprint is iterations x users x ~24 B
        if unchanged == total:
            converged = True
            break
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components hit maxIter={maxIter} before the "
            "fixed point; component labels may be unconverged and "
            "genuinely connected pairs can score +inf. Raise maxIter.",
            RuntimeWarning)
    # res2comp must reflect the FINAL user labels — inside the loop it
    # lags one propagation behind user2comp.
    res2comp = (edges.join(user2comp, [t, u])
                .groupBy(t, r).agg(F.min("component").alias("component")))
    return user2comp, res2comp


class AccessAnomaly(Estimator):
    def __init__(self, tenantCol: str = "tenant", userCol: str = "user",
                 resCol: str = "res", outputCol: str = "anomaly_score",
                 likelihoodCol: str | None = None,
                 rank: int = 10, maxIter: int = 10, regParam: float = 0.1,
                 complementsetFactor: int = 2, negScore: float = 1.0,
                 lowValue: float = 5.0, highValue: float = 10.0,
                 applyConnectedComponents: bool = True, seed: int = 42):
        if likelihoodCol is not None and not (negScore < lowValue < highValue):
            raise ValueError("need negScore < lowValue < highValue")
        super().__init__(tenantCol=tenantCol, userCol=userCol, resCol=resCol,
                         outputCol=outputCol, likelihoodCol=likelihoodCol,
                         rank=rank, maxIter=maxIter, regParam=regParam,
                         complementsetFactor=complementsetFactor,
                         negScore=negScore, lowValue=lowValue,
                         highValue=highValue,
                         applyConnectedComponents=applyConnectedComponents,
                         seed=seed)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.tenantCol, self.userCol, self.resCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.DoubleType())])

    def _ratings(self, indexed: DataFrame, df: DataFrame,
                 user_ix, res_ix) -> DataFrame:
        """(tenant, user_idx, res_idx, rating) for ALS: scaled per-pair
        likelihoods for seen pairs, negScore for complement samples."""
        t = self.tenantCol
        neg = ComplementAccessTransformer(
            partitionKey=t, indexedColNames=("user_idx", "res_idx"),
            complementsetFactor=self.complementsetFactor, seed=self.seed,
        ).transform(indexed)
        if self.likelihoodCol is None:
            # binary path: seen=1, complement=0
            return indexed.withColumn("rating", F.lit(1.0)).unionByName(
                neg.withColumn("rating", F.lit(0.0)))
        # per-pair likelihood (summed over duplicate rows), then the
        # per-tenant affine map onto [lowValue, highValue]
        lik = (res_ix.transform(user_ix.transform(df))
               .groupBy(t, "user_idx", "res_idx")
               .agg(F.sum(F.col(self.likelihoodCol).cast("double"))
                    .alias("__lik")))
        scaled = LinearScalarScaler(
            inputCol="__lik", partitionKey=t, outputCol="rating",
            minRequiredValue=self.lowValue, maxRequiredValue=self.highValue,
        ).fit(lik).transform(lik).drop("__lik")
        return scaled.unionByName(
            neg.withColumn("rating", F.lit(float(self.negScore))))

    def _fit(self, df: DataFrame) -> "AccessAnomalyModel":
        from pyspark.ml.recommendation import ALS

        t, u, r = self.tenantCol, self.userCol, self.resCol
        user_ix = IdIndexer(inputCol=u, partitionKey=t, outputCol="user_idx",
                            resetPerPartition=False).fit(df)
        res_ix = IdIndexer(inputCol=r, partitionKey=t, outputCol="res_idx",
                           resetPerPartition=False).fit(df)
        indexed = res_ix.transform(user_ix.transform(df)).select(
            t, "user_idx", "res_idx").distinct()
        train = self._ratings(indexed, df, user_ix, res_ix)
        als = ALS(rank=self.rank, maxIter=self.maxIter, regParam=self.regParam,
                  userCol="user_idx", itemCol="res_idx", ratingCol="rating",
                  seed=self.seed, coldStartStrategy="drop", nonnegative=True)
        als_model = als.fit(train)
        if self.applyConnectedComponents:
            user2comp, res2comp = connected_components(df, t, u, r)
        else:
            user2comp = res2comp = None
        model = AccessAnomalyModel(
            tenantCol=t, userCol=u, resCol=r, outputCol=self.outputCol,
            userIndexModel=user_ix, resIndexModel=res_ix,
            userFactors=als_model.userFactors, itemFactors=als_model.itemFactors,
            userComponents=user2comp, resComponents=res2comp,
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
                 userComponents=None, resComponents=None, scalerModel=None):
        super().__init__(tenantCol=tenantCol, userCol=userCol, resCol=resCol,
                         outputCol=outputCol, userIndexModel=userIndexModel,
                         resIndexModel=resIndexModel, userFactors=userFactors,
                         itemFactors=itemFactors,
                         userComponents=userComponents,
                         resComponents=resComponents,
                         scalerModel=scalerModel)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.tenantCol, self.userCol, self.resCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.DoubleType())])

    def _raw_scores(self, df: DataFrame) -> DataFrame:
        # carry the ORIGINAL identity columns through scoring: the
        # indexers map unseen values to idx 0, which has no vocab row,
        # so an undo_transform round-trip restores unseen users /
        # resources as NULL — destroying the identity of exactly the
        # novel-access rows an anomaly detector exists to flag
        df = (df.withColumn("__orig_u__", F.col(self.userCol))
              .withColumn("__orig_r__", F.col(self.resCol)))
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
        t, u, r = self.tenantCol, self.userCol, self.resCol
        scored = self.scalerModel.transform(self._raw_scores(df))
        # a tenant absent at fit time has no scaler stats (left-join
        # miss → NULL): an unknown tenant is maximally anomalous, the
        # same convention as the cross-component +inf gate below —
        # never a silent NULL that a `score > threshold` filter drops
        scored = scored.withColumn(
            self.outputCol,
            F.coalesce(F.col(self.outputCol), F.lit(float("inf"))))
        back = (scored
                .withColumn(u, F.col("__orig_u__"))
                .withColumn(r, F.col("__orig_r__"))
                .drop("__orig_u__", "__orig_r__"))
        if self.userComponents is not None:
            # Cross-component access: no path connects the user to the
            # resource, the affinity estimate is meaningless — score
            # +inf, maximally anomalous (reference :381-387).
            uc = self.userComponents.withColumnRenamed("component", "__uc__")
            rc = self.resComponents.withColumnRenamed("component", "__rc__")
            # no broadcast hint: the component maps are one row per
            # distinct user/resource — AQE picks broadcast when they
            # actually fit
            back = (back.join(uc, [t, u], "left")
                    .join(rc, [t, r], "left")
                    .withColumn(self.outputCol, F.when(
                        F.col("__uc__").isNotNull()
                        & F.col("__rc__").isNotNull()
                        & (F.col("__uc__") != F.col("__rc__")),
                        F.lit(float("inf"))).otherwise(F.col(self.outputCol))))
        return back.select(*df.columns, self.outputCol)
