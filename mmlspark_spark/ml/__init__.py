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
from mmlspark_spark.ml.lightgbm import (
    LightGBMClassifier,
    LightGBMRanker,
    LightGBMRegressor,
)
from mmlspark_spark.ml.bandit import (
    ContextualBanditPolicyEvaluator,
    VowpalWabbitContextualBandit,
    VowpalWabbitContextualBanditModel,
)
from mmlspark_spark.ml.vw import (
    VectorZipper,
    VowpalWabbitClassifier,
    VowpalWabbitFeaturizer,
    VowpalWabbitInteractions,
    VowpalWabbitRegressor,
)
from mmlspark_spark.ml.onnx import ImageFeaturizer, ONNXModel

__all__ = [
    "TrainClassifier", "TrainedClassifierModel",
    "TrainRegressor", "TrainedRegressorModel",
    "ComputeModelStatistics", "ComputePerInstanceStatistics",
    "FindBestModel", "TuneHyperparameters", "RankingEvaluator",
    "LightGBMClassifier", "LightGBMRegressor", "LightGBMRanker",
    "VowpalWabbitFeaturizer", "VowpalWabbitInteractions", "VectorZipper",
    "VowpalWabbitClassifier", "VowpalWabbitRegressor",
    "VowpalWabbitContextualBandit", "VowpalWabbitContextualBanditModel",
    "ContextualBanditPolicyEvaluator",
    "ImageFeaturizer", "ONNXModel",
]
