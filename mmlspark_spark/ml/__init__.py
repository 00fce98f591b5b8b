from mmlspark_spark.ml.train import (
    TrainClassifier,
    TrainedClassifierModel,
    TrainedRegressorModel,
    TrainRegressor,
)
from mmlspark_spark.ml.stats import (
    ComputeModelStatistics,
    ComputePerInstanceStatistics,
)
from mmlspark_spark.ml.automl import FindBestModel, TuneHyperparameters
from mmlspark_spark.ml.ranking import RankingEvaluator

__all__ = [
    "TrainClassifier", "TrainedClassifierModel",
    "TrainRegressor", "TrainedRegressorModel",
    "ComputeModelStatistics", "ComputePerInstanceStatistics",
    "FindBestModel", "TuneHyperparameters", "RankingEvaluator",
]
