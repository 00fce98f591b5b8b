"""Binary file reading — whole files as (path, bytes) rows.

Parity: reference ``core/.../io/binary/BinaryFileFormat.scala:112-186``
(custom FileFormat with zip inspection + seeded subsample) and
``BinaryFileReader.scala:1-107`` (eager helpers + recursePath).

Spark-first: the scan is the built-in ``binaryFile`` DataSource (Spark
≥3.0), which already distributes file reading, prunes with
``pathGlobFilter`` and pushes the length column; the reference's extra
features are layered on top: seeded subsampling via ``df.sample`` and
zip-walking via a stdlib-``zipfile`` ``mapInPandas`` (runs where the
bytes already are — no driver round-trip).
"""

from __future__ import annotations

import io
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BINARY_FILE_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
])


def read_binary_files(spark: SparkSession, path: str,
                      recursive: bool = True,
                      sample_ratio: float = 1.0, seed: int = 0,
                      path_glob_filter: str | None = None,
                      inspect_zip: bool = False) -> DataFrame:
    """(path, bytes) rows; optionally subsampled and zip-expanded.

    ``sampleRatio``/``seed`` mirror BinaryFileFormat.scala:34-110's
    seeded record-level subsample; ``inspectZip`` mirrors its zip-walk.
    """
    reader = (spark.read.format("binaryFile")
              .option("recursiveFileLookup", str(recursive).lower()))
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    df = reader.load(path).select(
        F.col("path"), F.col("content").alias("bytes"))
    if inspect_zip:
        df = zip_expand(df)
    if sample_ratio < 1.0:
        # subsample AFTER zip expansion: the reference samples per
        # RECORD inside the zip walk — sampling whole archives first
        # would keep/drop 10k entries at a time (a one-zip dataset
        # would be all-or-nothing)
        df = df.sample(False, sample_ratio, seed)
    return df


def write_binary_files(df: DataFrame, out_dir: str,
                       pathCol: str = "path",
                       bytesCol: str = "bytes") -> None:
    """Write each row's bytes to ``out_dir/<basename(path)>``.

    Parity: the reference's BinaryFileFormat is also a writer
    (``BinaryFileFormat.scala:112-186``). Runs distributed via
    ``foreachPartition`` — executors must share the target filesystem,
    the same contract as every Spark file sink. Collisions on basename
    follow last-writer-wins, as in the reference.
    """
    import os

    def _write(rows):
        os.makedirs(out_dir, exist_ok=True)
        for r in rows:
            name = os.path.basename(r[pathCol])
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(bytes(r[bytesCol]))

    df.select(pathCol, bytesCol).foreachPartition(_write)


def zip_expand(df: DataFrame, pathCol: str = "path",
               bytesCol: str = "bytes") -> DataFrame:
    """Expand zip archives into one row per entry ("path#entry", bytes);
    non-zip rows pass through unchanged."""

    def walk(it):
        for pdf in it:
            out = {"path": [], "bytes": []}
            for p, b in zip(pdf[pathCol], pdf[bytesCol]):
                blob = bytes(b)
                if zipfile.is_zipfile(io.BytesIO(blob)):
                    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                        for name in zf.namelist():
                            if name.endswith("/"):
                                continue
                            out["path"].append(f"{p}#{name}")
                            out["bytes"].append(zf.read(name))
                else:
                    out["path"].append(p)
                    out["bytes"].append(blob)
            yield pd.DataFrame(out)

    return df.mapInPandas(walk, BINARY_FILE_SCHEMA)
