from mmlspark_spark.core.base import Estimator, Model, Transformer
from mmlspark_spark.core.equality import assert_df_equality
from mmlspark_spark.core.session import get_spark

__all__ = [
    "Estimator",
    "Model",
    "Transformer",
    "assert_df_equality",
    "get_spark",
]
