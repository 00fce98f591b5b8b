"""AutoML: FindBestModel + TuneHyperparameters.

Parity: reference ``core/.../automl/FindBestModel.scala:50-190``
(evaluate candidate models on one DF, argmax the metric) and
``automl/TuneHyperparameters.scala:36-254`` with the seeded random
search spaces of ``automl/HyperparamBuilder.scala:11-111``
(DiscreteHyperParam, {Int,Long,Float,Double}RangeHyperParam).

Candidates evaluate concurrently on the shared SparkSession via a
thread pool (Spark schedules the jobs; the GIL doesn't matter since the
work is JVM-side) — same parallelism design as the reference.
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

from pyspark.sql import DataFrame

from mmlspark_spark.core.base import Estimator, Model
from mmlspark_spark.ml.stats import ComputeModelStatistics


class DiscreteHyperParam:
    """Uniform choice from a list (reference HyperparamBuilder.scala)."""

    def __init__(self, values: Sequence):
        self.values = list(values)

    def sample(self, rng: random.Random):
        return rng.choice(self.values)


class RangeHyperParam:
    """Uniform value in [lo, hi); int or float by endpoint types."""

    def __init__(self, lo, hi, isLog: bool = False):
        self.lo, self.hi, self.isLog = lo, hi, isLog

    def sample(self, rng: random.Random):
        import math

        if self.isLog:
            v = math.exp(rng.uniform(math.log(self.lo), math.log(self.hi)))
        else:
            v = rng.uniform(self.lo, self.hi)
        if isinstance(self.lo, int) and isinstance(self.hi, int):
            # int endpoints → int samples on BOTH scales: a log-scale
            # draw of 23.52 for maxDepth crashes TypeConverters.toInt —
            # and log-scale int ranges are the canonical isLog use
            return min(int(round(v)) if self.isLog
                       else rng.randrange(self.lo, self.hi), self.hi - 1)
        return v


def _evaluate(model: Model, df: DataFrame, metric: str, task: str) -> float:
    scored = model.transform(df)
    stats = ComputeModelStatistics(evaluationMetric=task).transform(scored)
    return float(stats.collect()[0][metric])


_HIGHER_IS_BETTER = {"accuracy": True, "precision": True, "recall": True,
                     "AUC": True, "r2": True,
                     "mse": False, "rmse": False, "mae": False}


class FindBestModel(Estimator):
    """Evaluate fitted ``models`` on the given DF, keep the best by
    ``metric``."""

    def __init__(self, models: Sequence[Model] = (), metric: str = "AUC",  # noqa: D107
                 evaluationMetric: str = "classification"):
        super().__init__(models=list(models), metric=metric,
                         evaluationMetric=evaluationMetric)

    def _fit(self, df: DataFrame) -> Model:
        if not self.models:
            raise ValueError(
                "FindBestModel needs at least one fitted model")
        higher = _HIGHER_IS_BETTER.get(self.metric, True)
        with ThreadPoolExecutor(max_workers=min(8, len(self.models) or 1)) as ex:
            scores = list(ex.map(
                lambda m: _evaluate(m, df, self.metric, self.evaluationMetric),
                self.models))
        self.all_metrics = dict(zip(range(len(self.models)), scores))
        best_i = (max if higher else min)(
            range(len(scores)), key=lambda i: scores[i])
        self.best_metric = scores[best_i]
        return self.models[best_i]


class TuneHyperparameters(Estimator):
    """Randomized hyperparameter search with k-fold CV.

    ``paramSpace``: dict param-name → DiscreteHyperParam/RangeHyperParam/
    list (treated as discrete). Sampling is seeded → deterministic.
    """

    def __init__(self, estimator: Estimator = None, paramSpace: dict | None = None,  # noqa: D107
                 numRuns: int = 8, numFolds: int = 3, metric: str = "accuracy",
                 evaluationMetric: str = "classification", seed: int = 42,
                 parallelism: int = 4):
        super().__init__(estimator=estimator, paramSpace=paramSpace or {},
                         numRuns=numRuns, numFolds=numFolds, metric=metric,
                         evaluationMetric=evaluationMetric, seed=seed,
                         parallelism=parallelism)

    def _sample_configs(self) -> list[dict]:
        rng = random.Random(self.seed)
        configs = []
        for _ in range(self.numRuns):
            cfg = {}
            for name, space in self.paramSpace.items():
                if isinstance(space, (list, tuple)):
                    space = DiscreteHyperParam(space)
                cfg[name] = space.sample(rng)
            configs.append(cfg)
        return configs

    def _apply_config(self, cfg: dict) -> Estimator:
        """One copy of the copy-estimator / set-params logic — it was
        duplicated between CV scoring and the final refit and the two
        could silently drift."""
        est = self.estimator.copy()
        inner = est.model.copy() if getattr(est, "model", None) else None
        if inner is not None:
            inner.setParams(**cfg)
            est.set("model", inner)
        else:
            for k, v in cfg.items():
                est.set(k, v)
        return est

    def _fit(self, df: DataFrame) -> Model:
        if self.numFolds < 2:
            raise ValueError(
                f"TuneHyperparameters needs numFolds >= 2 (k-fold CV "
                f"must hold out one fold); got {self.numFolds}")
        folds = df.randomSplit([1.0] * self.numFolds, seed=self.seed)
        higher = _HIGHER_IS_BETTER.get(self.metric, True)
        configs = self._sample_configs()

        def cv_score(cfg: dict) -> float:
            scores = []
            for i in range(self.numFolds):
                test = folds[i]
                train = None
                for j, f in enumerate(folds):
                    if j != i:
                        train = f if train is None else train.union(f)
                model = self._apply_config(cfg).fit(train)
                scores.append(_evaluate(model, test, self.metric,
                                        self.evaluationMetric))
            return sum(scores) / len(scores)

        with ThreadPoolExecutor(max_workers=self.parallelism) as ex:
            results = list(ex.map(cv_score, configs))
        self.all_results = list(zip(configs, results))
        best_i = (max if higher else min)(
            range(len(results)), key=lambda i: results[i])
        self.best_params, self.best_metric = configs[best_i], results[best_i]
        return self._apply_config(self.best_params).fit(df)
