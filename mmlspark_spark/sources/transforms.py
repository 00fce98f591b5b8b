"""Image transform stages — numpy implementations over the image struct.

Parity: reference ``opencv/.../ImageTransformer.scala:42-216`` (resize,
crop, flip, colorFormat/grayscale, threshold, blur as a composable op
pipeline over OpenCV Mats), ``core/.../image/ResizeImageTransformer.
scala:1-110`` (JVM-only resize), ``core/.../image/UnrollImage.scala:
26-232`` (image → flat double vector), ``opencv/.../ImageSetAugmenter.
scala:1-77`` (flip augmentation by unioning transformed copies).

The ops here are pure numpy (no OpenCV in the container): nearest/
bilinear resize, slicing crops, box blur via cumsum — deterministic and
executed inside Arrow-batched ``mapInPandas``. Each op is a small dict
spec, mirroring the reference's stage list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer
from mmlspark_spark.sources.image import (
    IMAGE_SCHEMA,
    array_to_image,
    image_to_array,
)


def _resize(img: np.ndarray, height: int, width: int,
            method: str = "bilinear") -> np.ndarray:
    h, w = img.shape[:2]
    if method == "nearest":
        ys = np.clip((np.arange(height) + 0.5) * h / height, 0, h - 1).astype(int)
        xs = np.clip((np.arange(width) + 0.5) * w / width, 0, w - 1).astype(int)
        return img[ys][:, xs]
    # bilinear
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    im = img.astype(np.float64)
    if im.ndim == 2:
        im = im[:, :, None]
    top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
    bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.round(out).astype(np.uint8)


def _box_blur(img: np.ndarray, k: int) -> np.ndarray:
    """k×k box filter via 2-D cumsum (edge-padded)."""
    if img.ndim == 2:
        img = img[:, :, None]
    pad = k // 2
    padded = np.pad(img.astype(np.float64),
                    ((pad, k - 1 - pad), (pad, k - 1 - pad), (0, 0)), "edge")
    cs = padded.cumsum(0).cumsum(1)
    cs = np.pad(cs, ((1, 0), (1, 0), (0, 0)))
    h, w = img.shape[:2]
    out = (cs[k:k + h, k:k + w] - cs[:h, k:k + w]
           - cs[k:k + h, :w] + cs[:h, :w]) / (k * k)
    return np.round(out).astype(np.uint8)


def _apply_op(img: np.ndarray, op: dict) -> np.ndarray:
    kind = op["op"]
    if kind == "resize":
        return _resize(img, op["height"], op["width"],
                       op.get("method", "bilinear"))
    if kind == "crop":
        y, x = op.get("y", 0), op.get("x", 0)
        return img[y:y + op["height"], x:x + op["width"]].copy()
    if kind == "flip":
        # flipCode: 0 = vertical (up-down), 1 = horizontal (left-right)
        return img[::-1].copy() if op.get("flipCode", 1) == 0 else img[:, ::-1].copy()
    if kind == "gray":  # BGR → luma
        if img.ndim == 3 and img.shape[2] >= 3:
            b, g, r = (img[:, :, 0].astype(np.float64),
                       img[:, :, 1].astype(np.float64),
                       img[:, :, 2].astype(np.float64))
            return np.round(0.114 * b + 0.587 * g + 0.299 * r).astype(np.uint8)
        return img
    if kind == "threshold":
        t, maxval = op.get("threshold", 127), op.get("maxVal", 255)
        return np.where(img > t, np.uint8(maxval), np.uint8(0))
    if kind == "blur":
        return _box_blur(img, int(op.get("kernelSize", 3)))
    raise ValueError(f"unknown image op: {kind}")


class ImageTransformer(Transformer):
    """Composable image op pipeline: ``ImageTransformer().resize(32, 32)
    .flip().gray()`` (stage-list API of ImageTransformer.scala:42-216)."""

    def __init__(self, inputCol: str = "image", outputCol: str = "image",
                 ops=None):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         ops=list(ops or []))

    def resize(self, height: int, width: int, method: str = "bilinear"):
        self.ops.append({"op": "resize", "height": height, "width": width,
                         "method": method})
        return self

    def crop(self, y: int, x: int, height: int, width: int):
        self.ops.append({"op": "crop", "y": y, "x": x, "height": height,
                         "width": width})
        return self

    def flip(self, flipCode: int = 1):
        self.ops.append({"op": "flip", "flipCode": flipCode})
        return self

    def gray(self):
        self.ops.append({"op": "gray"})
        return self

    def threshold(self, threshold: int = 127, maxVal: int = 255):
        self.ops.append({"op": "threshold", "threshold": threshold,
                         "maxVal": maxVal})
        return self

    def blur(self, kernelSize: int = 3):
        self.ops.append({"op": "blur", "kernelSize": kernelSize})
        return self

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        fields = [f for f in schema.fields if f.name != self.outputCol]
        return T.StructType(fields + [T.StructField(self.outputCol, IMAGE_SCHEMA)])

    def _transform(self, df: DataFrame) -> DataFrame:
        in_col, out_col, ops = self.inputCol, self.outputCol, list(self.ops)
        passthrough = [f for f in df.schema.fields if f.name != out_col]
        out_schema = T.StructType(passthrough
                                  + [T.StructField(out_col, IMAGE_SCHEMA)])

        def run(it):
            for pdf in it:
                images = []
                for row in pdf[in_col]:
                    if row is None:
                        images.append(None)
                        continue
                    img = image_to_array(row)
                    for op in ops:
                        img = _apply_op(img, op)
                    images.append(array_to_image(img, origin=row["origin"]))
                out = pdf[[f.name for f in passthrough]].copy() \
                    if in_col != out_col else pdf.copy()
                out[out_col] = images
                yield out

        return df.mapInPandas(run, out_schema)


class ResizeImageTransformer(Transformer):
    """Resize-only stage (ResizeImageTransformer.scala:1-110)."""

    def __init__(self, inputCol: str = "image", outputCol: str = "image",
                 height: int = 224, width: int = 224):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         height=height, width=width)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return schema

    def _transform(self, df: DataFrame) -> DataFrame:
        return ImageTransformer(
            inputCol=self.inputCol, outputCol=self.outputCol,
            ops=[{"op": "resize", "height": self.height, "width": self.width}],
        ).transform(df)


class UnrollImage(Transformer):
    """image struct → flat double array, row-major BGR, optionally
    scaled to [0,1] (UnrollImage.scala:26-232)."""

    def __init__(self, inputCol: str = "image", outputCol: str = "unrolled",
                 normalize: bool = False):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         normalize=normalize)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, T.ArrayType(T.DoubleType()))])

    def _transform(self, df: DataFrame) -> DataFrame:
        in_col, out_col, normalize = self.inputCol, self.outputCol, self.normalize
        out_schema = T.StructType(list(df.schema.fields) + [
            T.StructField(out_col, T.ArrayType(T.DoubleType()))])

        def run(it):
            for pdf in it:
                vecs = []
                for row in pdf[in_col]:
                    if row is None:
                        vecs.append(None)
                        continue
                    arr = image_to_array(row).astype(np.float64).ravel()
                    if normalize:
                        arr = arr / 255.0
                    vecs.append([float(v) for v in arr])
                out = pdf.copy()
                out[out_col] = vecs
                yield out

        return df.mapInPandas(run, out_schema)


class ImageSetAugmenter(Transformer):
    """Union of original + flipped copies (ImageSetAugmenter.scala:1-77)."""

    def __init__(self, inputCol: str = "image", outputCol: str = "image",
                 flipLeftRight: bool = True, flipUpDown: bool = False):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         flipLeftRight=flipLeftRight, flipUpDown=flipUpDown)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        if self.outputCol != self.inputCol                 and self.outputCol not in schema.fieldNames():
            # a distinct outputCol is a NEW column — the eager contract
            # must declare it
            return T.StructType(
                list(schema.fields)
                + [T.StructField(self.outputCol,
                                 schema[self.inputCol].dataType)])
        return schema

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        if self.inputCol != self.outputCol:
            out = df.withColumn(self.outputCol, F.col(self.inputCol))
        result = out
        if self.flipLeftRight:
            result = result.unionByName(ImageTransformer(
                inputCol=self.inputCol, outputCol=self.outputCol,
                ops=[{"op": "flip", "flipCode": 1}]).transform(df))
        if self.flipUpDown:
            result = result.unionByName(ImageTransformer(
                inputCol=self.inputCol, outputCol=self.outputCol,
                ops=[{"op": "flip", "flipCode": 0}]).transform(df))
        return result
