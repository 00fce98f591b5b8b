from mmlspark_spark.featurize.conversion import DataConversion
from mmlspark_spark.featurize.indexers import (
    IndexToValue,
    ValueIndexer,
    ValueIndexerModel,
)
from mmlspark_spark.featurize.missing import CleanMissingData, CleanMissingDataModel
from mmlspark_spark.featurize.text import (
    MultiNGram,
    PageSplitter,
    TextFeaturizer,
    TextPreprocessor,
    UnicodeNormalize,
)
# FastVectorAssembler (reference core/.../FastVectorAssembler.scala:1-151)
# existed to skip an O(columns) metadata scan; Spark's current
# VectorAssembler no longer pays that cost, so the stock stage IS the
# fast path — exported under the reference's name for drop-in parity.
from pyspark.ml.feature import VectorAssembler as FastVectorAssembler

from mmlspark_spark.featurize.auto import (
    CountSelector,
    CountSelectorModel,
    Featurize,
    date_features,
    timestamp_features,
)

__all__ = [
    "DataConversion", "FastVectorAssembler",
    "IndexToValue", "ValueIndexer", "ValueIndexerModel",
    "CleanMissingData", "CleanMissingDataModel",
    "MultiNGram", "PageSplitter", "TextFeaturizer", "TextPreprocessor",
    "UnicodeNormalize",
    "CountSelector", "CountSelectorModel", "Featurize",
    "date_features", "timestamp_features",
]
