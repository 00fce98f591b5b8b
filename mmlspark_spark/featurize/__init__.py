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
from mmlspark_spark.featurize.auto import (
    CountSelector,
    CountSelectorModel,
    Featurize,
    date_features,
    timestamp_features,
)

__all__ = [
    "DataConversion",
    "IndexToValue", "ValueIndexer", "ValueIndexerModel",
    "CleanMissingData", "CleanMissingDataModel",
    "MultiNGram", "PageSplitter", "TextFeaturizer", "TextPreprocessor",
    "UnicodeNormalize",
    "CountSelector", "CountSelectorModel", "Featurize",
    "date_features", "timestamp_features",
]
