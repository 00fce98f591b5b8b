"""Image schema + decode.

Parity: reference ``core/.../core/schema/ImageSchemaUtils.scala:12-24``
(struct<origin,height,width,nChannels,mode,data> — OpenCV BGR row-wise
bytes; identical to Spark's own ImageSchema) and
``PatchedImageFileFormat.scala`` (fault-tolerant decode).

Decode strategy (the container has no Pillow/OpenCV — SURVEY §7):
1. Pillow when importable (full format coverage);
2. a real stdlib parser for uncompressed 24-bit BMP (the deterministic
   test format — parsing BI_RGB BMPs needs only ``struct``);
3. otherwise the row decodes to null (fault-tolerant, like the
   reference's 5-retry-then-null behavior) — the Spark-side plumbing
   (schema, batching, partitioning) is identical in all three paths.
"""

from __future__ import annotations

import struct as _struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer

# matches org.apache.spark.ml.image.ImageSchema.columnSchema
IMAGE_SCHEMA = T.StructType([
    T.StructField("origin", T.StringType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("nChannels", T.IntegerType()),
    T.StructField("mode", T.IntegerType()),
    T.StructField("data", T.BinaryType()),
])

OCV_8UC1, OCV_8UC3, OCV_8UC4 = 0, 16, 24
_MODE_BY_CHANNELS = {1: OCV_8UC1, 3: OCV_8UC3, 4: OCV_8UC4}


def read_images(spark: SparkSession, path: str,
                recursive: bool = True,
                drop_invalid: bool = True) -> DataFrame:
    """Built-in ``image`` DataSource (JVM ImageIO decode, distributed).

    Output column ``image`` has IMAGE_SCHEMA. Equivalent of
    ``spark.read.image`` in IOImplicits.scala:20-75.
    """
    df = (spark.read.format("image")
          .option("recursiveFileLookup", str(recursive).lower())
          .option("dropInvalid", str(drop_invalid).lower())
          .load(path))
    return df


def decode_bmp(blob: bytes):
    """Uncompressed 24-bit BMP → (h, w, 3) BGR uint8 numpy array."""
    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    data_off = _struct.unpack_from("<I", blob, 10)[0]
    hdr_size = _struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        return None
    w, h = _struct.unpack_from("<ii", blob, 18)
    planes, bpp = _struct.unpack_from("<HH", blob, 26)
    compression = _struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0:
        return None
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    if data_off + row_size * h > len(blob):
        # truncated pixel data: return None like every other malformed
        # case — an unguarded frombuffer ValueError here escapes the
        # no-Pillow path's exception handling and kills the task,
        # breaking the decode-to-null fault-tolerance contract
        return None
    px = np.frombuffer(blob, dtype=np.uint8, offset=data_off,
                       count=row_size * h).reshape(h, row_size)
    img = px[:, : w * 3].reshape(h, w, 3)  # BMP stores BGR already
    return img[::-1].copy() if flip else img.copy()


def image_to_array(row) -> np.ndarray:
    """IMAGE_SCHEMA row/dict → (h, w, c) uint8 view."""
    h, w, c = row["height"], row["width"], row["nChannels"]
    return np.frombuffer(bytes(row["data"]), dtype=np.uint8).reshape(h, w, c)


def array_to_image(arr: np.ndarray, origin: str = "") -> dict:
    h, w = arr.shape[:2]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    return {"origin": origin, "height": int(h), "width": int(w),
            "nChannels": int(c), "mode": _MODE_BY_CHANNELS.get(c, OCV_8UC3),
            "data": bytes(np.ascontiguousarray(arr, dtype=np.uint8))}


def _decode_any(path: str, blob: bytes):
    try:
        from PIL import Image
        import io as _io

        im = Image.open(_io.BytesIO(bytes(blob))).convert("RGB")
        rgb = np.asarray(im, dtype=np.uint8)
        return rgb[:, :, ::-1]  # to BGR
    except ImportError:
        return decode_bmp(bytes(blob))
    except Exception:
        return None


class DecodeImage(Transformer):
    """(path, bytes) → image struct column (PatchedImageFileFormat
    fallback path: python decode over binaryFile rows)."""

    def __init__(self, pathCol: str = "path", bytesCol: str = "bytes",
                 outputCol: str = "image"):
        super().__init__(pathCol=pathCol, bytesCol=bytesCol, outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.pathCol, self.bytesCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, IMAGE_SCHEMA)])

    def _transform(self, df: DataFrame) -> DataFrame:
        path_col, bytes_col, out_col = self.pathCol, self.bytesCol, self.outputCol
        out_schema = T.StructType(list(df.schema.fields)
                                  + [T.StructField(out_col, IMAGE_SCHEMA)])

        def run(it):
            for pdf in it:
                images = []
                for p, b in zip(pdf[path_col], pdf[bytes_col]):
                    arr = _decode_any(p, b)
                    images.append(None if arr is None
                                  else array_to_image(arr, origin=p))
                out = pdf.copy()
                out[out_col] = images
                yield out

        return df.mapInPandas(run, out_schema)
