"""Contextual-bandit offline policy evaluation.

Parity: reference ``vw/.../VowpalWabbitContextualBandit.scala:1-376``.
The reference trains native VW CB models; without the native lib
(SURVEY §7: "CB via doubly-robust estimators on DF"), this module
provides the standard off-policy estimators over logged
(action, probability, reward) data as DataFrame aggregations:

- IPS   (inverse propensity scoring): E[r · 1{π(x)=a} / p]
- SNIPS (self-normalized IPS): Σ(r·w) / Σ(w)
- DR    (doubly robust): E[q̂(x, π(x)) + (r − q̂(x, a)) · 1{π(x)=a}/p]

plus ``ContextualBanditPolicyEvaluator`` which scores a target policy
column against the logged data. All estimators are single-pass aggs —
no driver loops, any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model


def _weight(actionCol, probCol, targetActionCol):
    match = (F.col(targetActionCol) == F.col(actionCol)).cast("double")
    return match / F.col(probCol)


def ips_estimate(df: DataFrame, actionCol: str = "action",
                 probCol: str = "probability", rewardCol: str = "reward",
                 targetActionCol: str = "target_action") -> float:
    w = _weight(actionCol, probCol, targetActionCol)
    v = df.agg(F.avg(F.col(rewardCol) * w)).collect()[0][0]
    return float(v) if v is not None else 0.0  # empty/all-null logs


def snips_estimate(df: DataFrame, actionCol: str = "action",
                   probCol: str = "probability", rewardCol: str = "reward",
                   targetActionCol: str = "target_action") -> float:
    w = _weight(actionCol, probCol, targetActionCol)
    row = df.agg(F.sum(F.col(rewardCol) * w).alias("num"),
                 F.sum(w).alias("den")).collect()[0]
    return float(row.num / row.den) if row.den else 0.0


def doubly_robust_estimate(df: DataFrame, actionCol: str = "action",
                           probCol: str = "probability",
                           rewardCol: str = "reward",
                           targetActionCol: str = "target_action",
                           qLoggedCol: str = "q_logged",
                           qTargetCol: str = "q_target") -> float:
    """q̂ columns: model-predicted reward for the logged action and for
    the target policy's action."""
    w = _weight(actionCol, probCol, targetActionCol)
    dr = F.col(qTargetCol) + (F.col(rewardCol) - F.col(qLoggedCol)) * w
    return float(df.agg(F.avg(dr)).collect()[0][0])


class VowpalWabbitContextualBandit(Estimator):
    """Trainable contextual-bandit policy learner.

    Parity: reference ``vw/.../VowpalWabbitContextualBandit.scala:87-307``
    (``--cb_explore_adf``: action-dependent features, epsilon-greedy
    exploration). Input contract mirrors the reference exactly —
    ``sharedCol`` a Vector of shared features, ``featuresCol`` an
    ``array<Vector>`` of per-action features, ``chosenActionCol`` a
    **1-based** int, ``labelCol`` the observed COST of the chosen action
    (VW convention: lower is better), ``probabilityCol`` the logging
    policy's probability of the chosen action.

    Engine mapping: VW's cb_adf is a cost-regression reduction over
    (shared ⊕ action) features; here that is an IPS-weighted
    ``LinearRegression`` (weight = 1/p corrects the logging policy's
    action distribution toward uniform) fitted on the logged
    chosen-action rows only — a single distributed fit, no per-row
    python. The fitted model scores every candidate action at transform
    time and emits epsilon-greedy action probabilities, matching the
    reference model's ``prediction: array<double>`` (probability per
    action, in action order — Scala model sorts ActionProbs by action,
    VowpalWabbitContextualBandit.scala:341-360).
    """

    def __init__(self, sharedCol: str = "shared", featuresCol: str = "features",
                 chosenActionCol: str = "chosenAction",
                 labelCol: str = "label", probabilityCol: str = "probability",
                 predictionCol: str = "prediction", epsilon: float = 0.05,
                 numPasses: int = 10, l2: float = 0.0):
        super().__init__(sharedCol=sharedCol, featuresCol=featuresCol,
                         chosenActionCol=chosenActionCol, labelCol=labelCol,
                         probabilityCol=probabilityCol,
                         predictionCol=predictionCol, epsilon=epsilon,
                         numPasses=numPasses, l2=l2)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        from pyspark.ml.linalg import VectorUDT

        self._require_cols(schema, self.sharedCol, self.featuresCol,
                           self.chosenActionCol, self.labelCol,
                           self.probabilityCol)
        ft = schema[self.featuresCol].dataType
        if not (isinstance(ft, T.ArrayType)
                and isinstance(ft.elementType, VectorUDT)):
            raise ValueError(
                f"{self.featuresCol} must be array<vector> (one Vector of "
                f"action-dependent features per action); found {ft}")
        if not isinstance(schema[self.sharedCol].dataType, VectorUDT):
            raise ValueError(f"{self.sharedCol} must be a Vector; found "
                             f"{schema[self.sharedCol].dataType}")
        return schema

    def parallelFit(self, df: DataFrame, paramMaps,
                    parallelism: int = 2):
        """Fit one model per param dict concurrently
        (VowpalWabbitContextualBandit.scala:280-305: futures over an
        execution context sized by ``parallelism``). Spark schedules the
        concurrent jobs fairly; each fit is itself distributed."""
        from concurrent.futures import ThreadPoolExecutor

        def _one(params: dict):
            # copy() clones every param through the Params machinery —
            # re-enumerating the constructor by hand silently dropped
            # any param added after the list was written
            est = self.copy()
            for k, v in params.items():
                est.set(k, v)
            return est.fit(df)

        with ThreadPoolExecutor(max_workers=max(1, parallelism)) as pool:
            return list(pool.map(_one, paramMaps))

    def _fit(self, df: DataFrame) -> "VowpalWabbitContextualBanditModel":
        from pyspark.ml.feature import VectorAssembler
        from pyspark.ml.regression import LinearRegression

        chosen = F.element_at(F.col(self.featuresCol),
                              F.col(self.chosenActionCol).cast("int"))
        train = (df.withColumn("__act", chosen)
                 .withColumn("__w", F.lit(1.0) / F.col(self.probabilityCol)))
        assembled = VectorAssembler(
            inputCols=[self.sharedCol, "__act"],
            outputCol="__x").transform(train)
        lr = LinearRegression(
            featuresCol="__x", labelCol=self.labelCol, weightCol="__w",
            predictionCol="__q", maxIter=self.numPasses * 10,
            regParam=self.l2)
        return VowpalWabbitContextualBanditModel(
            inner=lr.fit(assembled), sharedCol=self.sharedCol,
            featuresCol=self.featuresCol, predictionCol=self.predictionCol,
            epsilon=self.epsilon)


class VowpalWabbitContextualBanditModel(Model):
    """Scores every action and emits epsilon-greedy probabilities.

    Scale: one ``posexplode`` over the (small, K-element) action list,
    a distributed JVM-side model scoring pass, and a group-back keyed by
    a map-side row id — the shuffle carries K structs per input row and
    nothing else. No driver loops, no python in the row path.
    """

    def __init__(self, inner=None, sharedCol: str = "shared",
                 featuresCol: str = "features",
                 predictionCol: str = "prediction", epsilon: float = 0.05):
        super().__init__(inner=inner, sharedCol=sharedCol,
                         featuresCol=featuresCol, predictionCol=predictionCol,
                         epsilon=epsilon)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.sharedCol, self.featuresCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.predictionCol, T.ArrayType(T.DoubleType()))])

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.feature import VectorAssembler

        cols = df.columns
        eps = float(self.epsilon)
        with_id = df.withColumn("__id", F.monotonically_increasing_id())
        # a row with an empty/null action set must survive to the
        # output (with a null prediction), not silently vanish from a
        # row-preserving transform: only rows WITH actions flow through
        # the explode/score path, and the final left join restores the
        # rest (their __z stays null → probs null)
        exploded = with_id.select(
            "__id",
            F.posexplode(self.featuresCol).alias("__pos", "__act"),
            F.col(self.sharedCol).alias("__shared"))
        assembled = VectorAssembler(
            inputCols=["__shared", "__act"], outputCol="__x",
        ).transform(exploded)
        scored = self.inner.transform(assembled)
        per_id = (scored.groupBy("__id")
                  .agg(F.array_sort(F.collect_list(
                      F.struct("__pos", "__q"))).alias("__z")))
        grouped = (with_id.select("__id", F.struct(*cols).alias("__ctx"))
                   .join(per_id, "__id", "left"))
        costs = F.expr("transform(__z, x -> x.__q)")
        # first argmin (1-based); epsilon-greedy over K actions
        best = F.array_position(costs, F.array_min(costs))
        k = F.size("__z").cast("double")
        probs = F.transform(
            F.col("__z"),
            lambda x, i: F.lit(eps) / k
            + F.when(i == best.cast("int") - 1, F.lit(1.0 - eps))
            .otherwise(F.lit(0.0)))
        return grouped.select(
            *[F.col("__ctx")[c].alias(c) for c in cols],
            probs.alias(self.predictionCol))


class ContextualBanditPolicyEvaluator:
    """Evaluate a deterministic target policy offline.

    ``policy_fn(df) -> df + targetActionCol`` applies the policy to the
    logged contexts; ``evaluate`` returns all three estimates.
    """

    def __init__(self, actionCol: str = "action",
                 probCol: str = "probability", rewardCol: str = "reward",
                 targetActionCol: str = "target_action"):
        self.actionCol, self.probCol = actionCol, probCol
        self.rewardCol, self.targetActionCol = rewardCol, targetActionCol

    def evaluate(self, logged: DataFrame, policy_fn,
                 q_logged_col: str | None = None,
                 q_target_col: str | None = None) -> dict:
        scored = policy_fn(logged)
        args = (self.actionCol, self.probCol, self.rewardCol,
                self.targetActionCol)
        out = {
            "ips": ips_estimate(scored, *args),
            "snips": snips_estimate(scored, *args),
        }
        if q_logged_col and q_target_col:
            out["dr"] = doubly_robust_estimate(
                scored, *args, qLoggedCol=q_logged_col,
                qTargetCol=q_target_col)
        return out
