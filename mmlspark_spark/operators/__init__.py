from mmlspark_spark.operators.stages import (
    Cacher,
    DropColumns,
    DropMissingData,
    Explode,
    Lambda,
    MultiColumnAdapter,
    RenameColumn,
    Repartition,
    SelectColumns,
    StratifiedRepartition,
    StratifiedSampler,
    Timer,
    UDFTransformer,
)
from mmlspark_spark.operators.aggregates import (
    ClassBalancer,
    ClassBalancerModel,
    EnsembleByKey,
    HeavyHitters,
    SummarizeData,
)
from mmlspark_spark.operators.cdc import SCD2Merge
from mmlspark_spark.operators.compaction import compact_parquet
from mmlspark_spark.operators.graph import pagerank
from mmlspark_spark.operators.minibatch import (
    DynamicMiniBatchTransformer,
    FixedMiniBatchTransformer,
    FlattenBatch,
    PartitionConsolidator,
    TimeIntervalMiniBatchTransformer,
)

__all__ = [
    "Cacher", "DropColumns", "DropMissingData", "Explode", "Lambda",
    "MultiColumnAdapter", "RenameColumn", "Repartition", "SelectColumns",
    "StratifiedRepartition", "StratifiedSampler", "Timer", "UDFTransformer",
    "ClassBalancer", "ClassBalancerModel", "EnsembleByKey", "HeavyHitters",
    "SCD2Merge", "SummarizeData", "compact_parquet", "pagerank",
    "DynamicMiniBatchTransformer", "FixedMiniBatchTransformer",
    "FlattenBatch", "PartitionConsolidator", "TimeIntervalMiniBatchTransformer",
]
