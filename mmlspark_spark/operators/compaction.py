"""Small-files compaction — the OPTIMIZE-style maintenance rewrite a
long-lived parquet dataset needs (streaming sinks, per-batch appends,
and over-partitioned writers leave thousands of KB-sized files whose
open/footer/listing costs dominate scans long before data volume
does).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _data_size_and_files(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total bytes, file count) of the dataset's data files, via the
    Hadoop FS API so every scheme Spark can read works (local, HDFS,
    s3a, abfs)."""
    fs, jpath = _fs(spark, path)
    total = files = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # manifests, _SUCCESS, hidden checksums
        total += st.getLen()
        files += 1
    return total, files


def compact_parquet(spark: SparkSession, path: str,
                    targetFileSizeBytes: int = 128 * 1024 * 1024,
                    sortBy: list | None = None) -> dict:
    """Rewrite a parquet dataset into ~``targetFileSizeBytes`` files.

    Plan: size the dataset from the file listing (no data read),
    compute ``ceil(bytes / target)`` output files, rewrite via
    ``coalesce`` (a NARROW dependency — compaction must not pay a
    shuffle just to concatenate files) unless ``sortBy`` is given, in
    which case ``repartitionByRange`` + ``sortWithinPartitions``
    produces size-balanced, stat-clustered files (the Z-order sibling
    is operators/scale.py:ZOrderRepartitioner). The rewrite lands in
    ``<path>.__compact_tmp`` and swaps in with two FS renames, so a
    mid-rewrite failure leaves the original dataset untouched (the
    swap itself is two metadata ops, not atomic across both — the
    stale tmp dir is detectable and re-runnable).

    Returns {"files_before", "files_after", "bytes", "target_files"}.
    """
    total, files_before = _data_size_and_files(spark, path)
    target_files = max(1, -(-total // targetFileSizeBytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp"
    backup = path.rstrip("/") + ".__compact_old"
    if sortBy:
        out = (df.repartitionByRange(target_files, *sortBy)
               .sortWithinPartitions(*sortBy))
    else:
        out = df.coalesce(target_files)
    out.write.mode("overwrite").parquet(tmp)
    fs, jpath = _fs(spark, path)
    _, jtmp = _fs(spark, tmp)
    _, jbackup = _fs(spark, backup)
    if fs.exists(jbackup):
        fs.delete(jbackup, True)
    if not fs.rename(jpath, jbackup):
        raise IOError(f"compaction swap failed: could not move {path}")
    if not fs.rename(jtmp, jpath):
        # roll back so the dataset is never left missing
        fs.rename(jbackup, jpath)
        raise IOError(f"compaction swap failed: could not move {tmp}")
    fs.delete(jbackup, True)
    _, files_after = _data_size_and_files(spark, path)
    return {"files_before": files_before, "files_after": files_after,
            "bytes": int(total), "target_files": int(target_files)}
