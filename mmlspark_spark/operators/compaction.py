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


def _data_size_and_files(spark: SparkSession, path: str,
                         ) -> tuple[int, int, bool]:
    """(total bytes, file count, is_hive_partitioned) of the dataset's
    DATA files, via the Hadoop FS API so every scheme Spark can read
    works (local, HDFS, s3a, abfs). Files under hidden directories
    (``_temporary`` from a crashed writer, ``.hive-staging``) are
    excluded the way Spark's own file index excludes them — counting
    them would size the rewrite on bytes it never reads."""
    fs, jpath = _fs(spark, path)
    root = jpath.toUri().getPath()
    total = files = 0
    partitioned = False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toUri().getPath()[len(root):].lstrip("/")
        parts = rel.split("/")
        if any(p.startswith(("_", ".")) for p in parts):
            continue  # manifests, _SUCCESS, _temporary/, .staging/
        if any("=" in p for p in parts[:-1]):
            partitioned = True
        total += st.getLen()
        files += 1
    return total, files, partitioned


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
    ``<path>.__compact_tmp`` and swaps in with two FS renames.

    Safety contract:

    - a crash BEFORE the swap leaves the original untouched (only the
      tmp dir exists);
    - a crash BETWEEN the two renames leaves the data in
      ``<path>.__compact_old`` — the next ``compact_parquet`` call on
      the same path detects the orphan and RESTORES it before doing
      anything else, so the operation is re-runnable;
    - a crash AFTER the swap but before the backup delete leaves a
      STALE ``.__compact_old`` — every subsequent call deletes it once
      ``<path>`` is confirmed live (has data files), so an external
      delete of the dataset can never resurrect the stale backup; if
      ``<path>`` exists but holds NO data files while a backup exists
      (e.g. a restarted streaming sink recreated the directory with
      only hidden metadata), the state is ambiguous and the call
      RAISES instead of guessing;
    - on object stores (s3a) directory rename is a non-atomic
      copy+delete, so the swap window is O(data) — prefer running
      compaction from a single maintenance job, never concurrently
      with writers (true of every rename-swap compactor);
    - HIVE-PARTITIONED datasets (``k=v`` subdirectories) are REFUSED:
      a root-level rewrite would silently flatten the layout and break
      subdirectory readers + partition pruning. Compact each partition
      directory instead.
    - an empty / data-free path is a NO-OP (a streaming sink that has
      not produced data yet must not crash the maintenance job).

    Returns {"files_before", "files_after", "bytes", "target_files"}.
    """
    fs, jpath = _fs(spark, path)
    backup = path.rstrip("/") + ".__compact_old"
    _, jbackup = _fs(spark, backup)
    if fs.exists(jbackup):
        if not fs.exists(jpath):
            # interrupted swap from a previous run: restore, proceed
            if not fs.rename(jbackup, jpath):
                raise IOError(
                    f"found orphaned {backup} but could not restore it")
        else:
            # Path exists alongside a backup. If it holds data, the
            # previous swap COMPLETED and the backup is a stale
            # leftover from a crash between rename #2 and the backup
            # delete — remove it on every run, or a later external
            # delete of <path> would resurrect stale data as live.
            # A data-FILE-free <path> is AMBIGUOUS: it may be a
            # restarted streaming sink that recreated the directory
            # with only hidden metadata (_spark_metadata) — deleting
            # it would destroy the sink's commit log, and restoring
            # the backup would resurrect pre-compaction rows under a
            # new lineage. Never guess: demand manual resolution.
            _, live_files, _ = _data_size_and_files(spark, path)
            if live_files > 0:
                fs.delete(jbackup, True)
            else:
                raise IOError(
                    f"both {path} (no data files) and {backup} exist "
                    "— ambiguous state; restore or delete the backup "
                    "manually before compacting")
    total, files_before, partitioned = _data_size_and_files(spark, path)
    if partitioned:
        raise ValueError(
            f"{path} is hive-partitioned (k=v subdirectories): a root "
            "rewrite would flatten the layout — compact each partition "
            "directory instead")
    if files_before == 0:
        return {"files_before": 0, "files_after": 0, "bytes": 0,
                "target_files": 0}
    target_files = max(1, -(-total // targetFileSizeBytes))
    if files_before <= target_files and not sortBy:
        # already compact — but a sortBy compaction still rewrites:
        # its point is the clustered layout, not the file count
        return {"files_before": files_before,
                "files_after": files_before, "bytes": int(total),
                "target_files": int(target_files)}
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp"
    if sortBy:
        out = (df.repartitionByRange(target_files, *sortBy)
               .sortWithinPartitions(*sortBy))
    else:
        out = df.coalesce(target_files)
    out.write.mode("overwrite").parquet(tmp)
    _, jtmp = _fs(spark, tmp)
    if fs.exists(jbackup):
        fs.delete(jbackup, True)
    if not fs.rename(jpath, jbackup):
        raise IOError(f"compaction swap failed: could not move {path}")
    if not fs.rename(jtmp, jpath):
        # roll back so the dataset is never left missing
        fs.rename(jbackup, jpath)
        raise IOError(f"compaction swap failed: could not move {tmp}")
    fs.delete(jbackup, True)
    _, files_after, _ = _data_size_and_files(spark, path)
    return {"files_before": files_before, "files_after": files_after,
            "bytes": int(total), "target_files": int(target_files)}
