"""ONNX / deep-model batch inference stage.

Parity: reference ``deep-learning/.../cntk/CNTKModel.scala:34-146``
(broadcast serialized model bytes; ``mapPartitions`` minibatch
inference with per-executor model instantiation; input/output node
selection) — re-targeted at ONNX Runtime per SURVEY §7 step 10.

The Spark plumbing (broadcast bytes → per-worker session cache →
Arrow-batched inference → array<float> output) is real and tested; the
actual runtime import is gated — the container has no onnxruntime, so
tests exercise the identical path through ``fakeFn`` (a deterministic
numpy stand-in, as the build brief prescribes for absent native libs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer

_SESSION_CACHE: dict = {}


def _get_session(model_bytes: bytes):
    key = hash(model_bytes)
    if key not in _SESSION_CACHE:
        import onnxruntime as ort

        _SESSION_CACHE[key] = ort.InferenceSession(model_bytes)
    return _SESSION_CACHE[key]


class ONNXModel(Transformer):
    """array<float/double> column → model output array column.

    ``fakeFn``: optional ``np.ndarray -> np.ndarray`` used instead of
    onnxruntime (testing / stub deployments).
    """

    def __init__(self, modelBytes: bytes = b"", inputCol: str = "features",
                 outputCol: str = "output", outputNode: str | None = None,
                 batchSize: int = 64, fakeFn=None):
        super().__init__(modelBytes=modelBytes, inputCol=inputCol,
                         outputCol=outputCol, outputNode=outputNode,
                         batchSize=batchSize, fakeFn=fakeFn)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, T.ArrayType(T.DoubleType()))])

    def _transform(self, df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        b_model = sc.broadcast(self.modelBytes)
        in_col, out_col = self.inputCol, self.outputCol
        out_node, fake_fn = self.outputNode, self.fakeFn
        out_schema = T.StructType(list(df.schema.fields) + [
            T.StructField(out_col, T.ArrayType(T.DoubleType()))])

        def run(it):
            sess = None
            for pdf in it:
                if len(pdf) == 0:
                    continue
                x = np.array([np.asarray(v, dtype=np.float32)
                              for v in pdf[in_col]])
                if fake_fn is not None:
                    y = np.asarray(fake_fn(x))
                else:
                    try:
                        sess = sess or _get_session(bytes(b_model.value))
                    except ImportError as e:
                        raise NotImplementedError(
                            "ONNXModel needs the onnxruntime package (not in "
                            "this container); pass fakeFn for stub inference"
                        ) from e
                    input_name = sess.get_inputs()[0].name
                    outs = sess.run([out_node] if out_node else None,
                                    {input_name: x})
                    y = np.asarray(outs[0])
                out = pdf.copy()
                out[out_col] = [[float(v) for v in np.atleast_1d(row)]
                                for row in y]
                yield out

        return df.mapInPandas(run, out_schema)


class ImageFeaturizer(Transformer):
    """Image struct → unrolled pixels → model features
    (deep-learning/.../ImageFeaturizer.scala:40-197 shape: decode +
    resize + unroll handled by the image stages; this stage runs the
    model head)."""

    def __init__(self, modelBytes: bytes = b"", inputCol: str = "image",
                 outputCol: str = "features", height: int = 32,
                 width: int = 32, fakeFn=None):
        super().__init__(modelBytes=modelBytes, inputCol=inputCol,
                         outputCol=outputCol, height=height, width=width,
                         fakeFn=fakeFn)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, T.ArrayType(T.DoubleType()))])

    def _transform(self, df: DataFrame) -> DataFrame:
        from mmlspark_spark.sources.transforms import (
            ResizeImageTransformer,
            UnrollImage,
        )

        resized = ResizeImageTransformer(
            inputCol=self.inputCol, outputCol=self.inputCol,
            height=self.height, width=self.width).transform(df)
        unrolled = UnrollImage(inputCol=self.inputCol,
                               outputCol="__pixels__",
                               normalize=True).transform(resized)
        out = ONNXModel(modelBytes=self.modelBytes, inputCol="__pixels__",
                        outputCol=self.outputCol,
                        fakeFn=self.fakeFn).transform(unrolled)
        return out.drop("__pixels__")
