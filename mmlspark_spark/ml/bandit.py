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


def _weight(actionCol, probCol, targetActionCol):
    match = (F.col(targetActionCol) == F.col(actionCol)).cast("double")
    return match / F.col(probCol)


def ips_estimate(df: DataFrame, actionCol: str = "action",
                 probCol: str = "probability", rewardCol: str = "reward",
                 targetActionCol: str = "target_action") -> float:
    w = _weight(actionCol, probCol, targetActionCol)
    return float(df.agg(F.avg(F.col(rewardCol) * w)).collect()[0][0])


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
