"""Composite stage persistence: JSON params + parquet DataFrame params +
recursively-saved nested stages.

Parity: the reference serializes DataFrame-valued params to parquet
alongside JSON metadata (``core/.../org/apache/spark/ml/Serializer.scala:
1-147``, ``param/DataFrameParam.scala:117-142``). Here the split is
decided by VALUE TYPE at save time, so every engine stage gets
persistence without per-class writers:

- JSON-able values  → standard ``metadata`` file (DefaultParamsWriter
  layout, still loadable by stock readers when no other kinds exist);
- ``DataFrame``     → ``{path}/dfparams/{name}`` parquet;
- ``MLWritable``    → ``{path}/stageparams/{name}`` recursive save, with
  the concrete class recorded in its own metadata (loaded back via
  ``DefaultParamsReader.loadParamsInstance``);
- anything else (functions, live models from other libraries) →
  explicit error naming the param, never a pickle.

At 100 TB the DataFrame params are exactly the state that must NOT pass
through the driver: parquet write/read keeps them distributed end to
end.
"""

from __future__ import annotations

import os

from pyspark.ml.util import (
    DefaultParamsReader,
    DefaultParamsWriter,
    MLReader,
    MLWriter,
    MLWritable,
)
from pyspark.sql import DataFrame, SparkSession


def _json_ok(v) -> bool:
    if v is None or isinstance(v, (bool, int, float, str)):
        return True
    if isinstance(v, (list, tuple)):
        return all(_json_ok(x) for x in v)
    if isinstance(v, dict):
        return all(isinstance(k, str) and _json_ok(x) for k, x in v.items())
    return False


class CompositeWriter(MLWriter):
    """MLWriter that routes each param by value type (see module doc)."""

    def __init__(self, instance):
        super().__init__()
        self.instance = instance

    def saveImpl(self, path: str) -> None:
        inst = self.instance
        jsonable, dfs, stages = {}, {}, {}
        for p, v in inst._paramMap.items():
            if isinstance(v, DataFrame):
                dfs[p.name] = v
            elif isinstance(v, MLWritable):
                stages[p.name] = v
            elif _json_ok(v):
                jsonable[p.name] = v
            else:
                raise ValueError(
                    f"{type(inst).__name__}.{p.name} holds "
                    f"{type(v).__name__}, which is not serializable "
                    "(JSON / DataFrame / MLWritable are)")
        DefaultParamsWriter.saveMetadata(
            inst, path, self.sc,
            extraMetadata={"dfParams": sorted(dfs),
                           "stageParams": sorted(stages)},
            paramMap=jsonable,
        )
        for name, df in dfs.items():
            df.write.mode("overwrite").parquet(
                os.path.join(path, "dfparams", name))
        for name, stage in stages.items():
            stage.write().overwrite().save(
                os.path.join(path, "stageparams", name))


class CompositeReader(MLReader):
    def __init__(self, cls):
        super().__init__()
        self.cls = cls

    def load(self, path: str):
        metadata = DefaultParamsReader.loadMetadata(path, self.sc)
        instance = self.cls()
        instance._resetUid(metadata["uid"])
        DefaultParamsReader.getAndSetParams(instance, metadata)
        spark = SparkSession.active()
        for name in metadata.get("dfParams", []):
            instance.set(name, spark.read.parquet(
                os.path.join(path, "dfparams", name)))
        for name in metadata.get("stageParams", []):
            instance.set(name, DefaultParamsReader.loadParamsInstance(
                os.path.join(path, "stageparams", name), self.sc))
        return instance
