"""Base stage contracts for the engine.

The reference's operators are SparkML ``PipelineStage``s with an eager
``transformSchema(StructType) -> StructType`` contract (e.g. Explode —
reference ``core/src/main/scala/com/microsoft/ml/spark/stages/Explode.scala:26-43``).
PySpark's ``pyspark.ml`` API does not expose ``transformSchema``, so we add
it here as a first-class method: every stage can statically compute its
output schema *before* any job runs, which is what makes eager validation
possible at 100 TB scale (a schema mistake must never surface 3 hours into
a run).

All stages subclass ``pyspark.ml.Transformer`` / ``Estimator`` so they
compose with stock ``pyspark.ml.Pipeline`` and serialize through
``DefaultParamsWritable`` (JSON params; DataFrame-valued state is stored
as parquet by the owning model, mirroring the reference's
``Serializer.scala`` DataFrame-param handling).
"""

from __future__ import annotations

from typing import Any

import pyspark.ml as _ml
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class SchemaContractMixin:
    """Static schema propagation, validated eagerly in ``transform``."""

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        """Compute the output schema from the input schema without running
        a job. Default: schema-preserving. Override in stages that add,
        drop or retype columns."""
        return schema

    def _require_cols(self, schema: T.StructType, *cols: str) -> None:
        missing = [c for c in cols if c not in schema.fieldNames()]
        if missing:
            raise ValueError(
                f"{type(self).__name__}: input is missing column(s) {missing}; "
                f"have {schema.fieldNames()}"
            )


class _ParamStageBase(Params):
    """Lightweight param registration: subclasses call
    ``self._init_params(**kwargs)`` in ``__init__`` to register every
    keyword as a pyspark ``Param`` (serializable, copyable) while also
    exposing it as a plain attribute for ergonomic access."""

    def _init_params(self, **kwargs: Any) -> None:
        for name, value in kwargs.items():
            p = Param(self, name, name, TypeConverters.identity)
            setattr(self, name + "Param", p)
            self._paramMap[p] = value
            setattr(self, name, value)

    def get(self, name: str) -> Any:
        return self._paramMap[getattr(self, name + "Param")]

    def set(self, name: str | Param, value: Any = None) -> "_ParamStageBase":
        # accepts a name OR a Param — DefaultParamsReader calls
        # ``stage.set(stage.getParam(name), value)`` when loading
        if isinstance(name, Param):
            name = name.name
        self._paramMap[getattr(self, name + "Param")] = value
        setattr(self, name, value)
        return self

    def _set(self, **kwargs: Any) -> "_ParamStageBase":
        # pyspark's _copyValues/_set resolve params via getattr(name),
        # which in our scheme holds the VALUE; route through set()
        for name, value in kwargs.items():
            self.set(name, value)
        return self

    def getParam(self, paramName: str) -> Param:
        """Resolve the Param object by canonical name (loader contract)."""
        p = getattr(self, paramName + "Param", None)
        if isinstance(p, Param):
            return p
        raise ValueError(f"Cannot find param with name {paramName}.")

    def hasParam(self, paramName: str) -> bool:
        return isinstance(getattr(self, paramName + "Param", None), Param)


class _CompositePersistence:
    """save/load for stages whose params may hold DataFrames or nested
    stages (reference ``Serializer.scala:1-147`` analog); plain-JSON
    stages keep the stock DefaultParams metadata layout."""

    def write(self):
        from mmlspark_spark.core.serializer import CompositeWriter

        return CompositeWriter(self)

    @classmethod
    def read(cls):
        from mmlspark_spark.core.serializer import CompositeReader

        return CompositeReader(cls)


class Transformer(
    _ml.Transformer, _CompositePersistence, _ParamStageBase, SchemaContractMixin,
    DefaultParamsReadable, DefaultParamsWritable,
):
    """Engine base transformer. Subclasses implement ``_transform(df)``
    and (usually) ``transform_schema(schema)``. ``transform`` validates
    the schema contract eagerly before emitting the lazy plan."""

    def __init__(self, **kwargs: Any):
        super().__init__()
        self._init_params(**kwargs)

    def transform(self, dataset: DataFrame, params=None) -> DataFrame:
        if params:
            # validate on the COPY the overridden params produce —
            # validating self and then letting the base class run
            # copy(params)._transform would skip the eager contract
            # for exactly the params being overridden
            return self.copy(params).transform(dataset)
        self.transform_schema(dataset.schema)  # eager validation
        return super().transform(dataset)


class Model(Transformer):
    """A fitted transformer."""


class Estimator(
    _ml.Estimator, _CompositePersistence, _ParamStageBase, SchemaContractMixin,
    DefaultParamsReadable, DefaultParamsWritable,
):
    """Engine base estimator. Subclasses implement ``_fit(df) -> Model``."""

    def __init__(self, **kwargs: Any):
        super().__init__()
        self._init_params(**kwargs)

    def fit(self, dataset: DataFrame, params=None):
        if params and not isinstance(params, (list, tuple)):
            return self.copy(params).fit(dataset)
        self.transform_schema(dataset.schema)
        return super().fit(dataset, params)
