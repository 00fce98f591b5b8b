"""Training-shard export: the last stage of a curation pipeline.

Trainers consume a corpus as N deterministic shards (data-parallel
ranks map to shard sets; resumable jobs re-read a shard by number and
must get the same rows). This module writes that layout from a
DataFrame and proves what it wrote:

- **Deterministic membership.** Shard = ``pmod(xxhash64(id), n)`` — a
  pure column expression, so membership is reproducible across runs,
  partitionings, and cluster sizes, and re-exporting an unchanged
  corpus yields byte-identical shard assignment. (Round-robin or
  ``repartition(n)`` membership depends on task scheduling — a
  re-export would scatter rows differently and break resumability.)
- **One shuffle, parallel writes.** The shard column drives a single
  hash repartition; each shard directory (``shard=<i>/``) is written
  by its own task. ``maxRecordsPerFile`` caps file sizes inside a
  shard for HDFS/object-store-friendly blocks.
- **A manifest is part of the artifact.** ``write_training_shards``
  returns (and persists as ``_manifest.json``) per-shard row counts
  and order-insensitive content checksums computed FROM THE WRITTEN
  FILES, not from the input plan — the manifest attests to what
  landed on disk. Driver state: O(shards).

At 100 TB this is the standard export shape: the shuffle carries each
row once, no driver bottleneck, and validation (count + checksum per
shard) reads column-pruned parquet.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_assignment(idCol: str, numShards: int):
    """The deterministic shard id expression (exposed so tests and
    downstream readers can recompute membership)."""
    return F.pmod(F.xxhash64(F.col(idCol)), F.lit(numShards)).cast("int")


def write_training_shards(df: DataFrame, path: str, numShards: int,
                          idCol: str, maxRecordsPerFile: int = 0,
                          mode: str = "overwrite") -> dict:
    """Write ``df`` as ``numShards`` hash-sharded parquet directories
    under ``path`` plus a ``_manifest.json``; returns the manifest.

    Manifest: ``{"numShards": n, "totalRows": N, "shards": {"0":
    {"rows": r, "checksum": c}, ...}}`` where checksum is the XOR of
    ``xxhash64(id)`` over the shard's rows as written — order-
    insensitive AND overflow-free (a sum of 64-bit hashes trips ANSI
    mode's long-overflow check)."""
    keyed = df.withColumn("shard", shard_assignment(idCol, numShards))
    writer = (keyed.repartition(numShards, "shard")
              .write.mode(mode).partitionBy("shard"))
    if maxRecordsPerFile:
        writer = writer.option("maxRecordsPerFile", maxRecordsPerFile)
    writer.parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path)
    stats = (written.groupBy("shard")
             .agg(F.count("*").alias("rows"),
                  F.bit_xor(F.xxhash64(F.col(idCol))).alias("checksum"))
             .collect())
    manifest = {
        "numShards": numShards,
        "totalRows": int(sum(r["rows"] for r in stats)),
        "shards": {str(int(r["shard"])): {
            "rows": int(r["rows"]),
            "checksum": int(r["checksum"])} for r in stats},
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_training_shard(spark: SparkSession, path: str,
                        shard: int) -> DataFrame:
    """Read one shard back, partition-pruned: the ``shard=<i>``
    directory filter never touches the other shards' files."""
    return (spark.read.parquet(path)
            .filter(F.col("shard") == shard).drop("shard"))


def verify_training_shards(spark: SparkSession, path: str,
                           idCol: str) -> dict:
    """Recompute the manifest from disk and diff against the stored
    one; returns {"ok": bool, "mismatched": [shard, ...]}."""
    with open(os.path.join(path, "_manifest.json")) as f:
        stored = json.load(f)
    live = (spark.read.parquet(path).groupBy("shard")
            .agg(F.count("*").alias("rows"),
                 F.bit_xor(F.xxhash64(F.col(idCol))).alias("checksum"))
            .collect())
    seen = {str(int(r["shard"])): (int(r["rows"]), int(r["checksum"]))
            for r in live}
    bad = sorted(
        s for s in set(stored["shards"]) | set(seen)
        if (stored["shards"].get(s, {}).get("rows"),
            stored["shards"].get(s, {}).get("checksum"))
        != seen.get(s, (None, None)))
    return {"ok": not bad, "mismatched": bad}
