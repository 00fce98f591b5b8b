#!/usr/bin/env python
"""Scaling probe: measure how the heavy dedup/retrieval/ANN queries
scale from sf0.1 to an sf1-EQUIVALENT corpus (10× rows), and report
the implied scaling exponent alpha = log10(t_10x / t_1x) — alpha ≈ 1
is linear, the design target for every bucketed/partial-aggregated
plan in this engine; alpha ≈ 2 would expose a hidden pairwise blowup.

/root/testdata has no sf1, so the 10× corpus is SYNTHESIZED from
sf0.1 (methodology documented in BASELINE.md "Scaling" — replicas get
fresh ids, replica-salted text every 4th token so shingle sets are
NOT near-duplicates of the source, and a deterministic per-replica
embedding offset so vectors are distinct):

    python tools/scale_probe.py            # builds /tmp/sf1x, times both SFs
    python tools/scale_probe.py --skip-build   # reuse a built /tmp/sf1x

Prints one JSON line:
  {"queries": {name: {"t_sf0.1": s, "t_sf1x": s, "alpha": a}}, ...}

Run on a QUIET host (the bench contention rules apply 10× harder at
this size); queries are timed best-of-2, interleaved.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mmlspark_spark.core.cache import release_intermediates
from mmlspark_spark.core.session import get_spark
from mmlspark_spark.plans.catalog import CATALOG

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1X_DIR", "/tmp/sf1x")
FACTOR = 10
# documents-only and embeddings-only queries (the heavy families the
# 100 TB claims lean on); anything needing other tables would fail on
# the partial /tmp/sf1x layout by design.
QUERIES = ("minhash_dedup", "ngram_jaccard", "bm25_search",
           "knn_ivfpq", "knn_sq8")


def build(spark) -> None:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    max_vec = emb.agg(F.max("vec_id")).first()[0] + 1

    def salt_docs(i: int):
        # every 4th token gets a replica tag appended: most 5-gram
        # shingles change, so replicas are NOT near-duplicates of the
        # source (a raw copy would inflate dedup pair counts far past
        # anything a real 10x corpus shows)
        if i == 0:
            return docs
        toks = F.split(F.col("text"), r"\s+")
        salted = F.array_join(
            F.transform(toks, lambda t, j: F.when(
                j % 4 == 0, F.concat(t, F.lit(f"q{i}"))).otherwise(t)),
            " ")
        return docs.select(
            (F.col("doc_id") + F.lit(i * max_doc)).alias("doc_id"),
            *[F.when(F.col("text").isNotNull(), salted).alias("text")
              if c == "text" else F.col(c)
              for c in docs.columns if c != "doc_id"])

    def shift_emb(i: int):
        if i == 0:
            return emb
        return emb.select(
            (F.col("vec_id") + F.lit(i * max_vec)).alias("vec_id"),
            *[F.transform("embedding",
                          lambda x: x + F.lit(float(i) * 1e-3))
              .cast(emb.schema["embedding"].dataType)
              .alias("embedding") if c == "embedding" else F.col(c)
              for c in emb.columns if c != "vec_id"])

    big_docs = docs.sparkSession.createDataFrame([], docs.schema)
    for i in range(FACTOR):
        big_docs = big_docs.unionByName(salt_docs(i))
    big_docs.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet")
    big_emb = emb.sparkSession.createDataFrame([], emb.schema)
    for i in range(FACTOR):
        big_emb = big_emb.unionByName(shift_emb(i))
    big_emb.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/embeddings.parquet")
    print(f"# built {DST}: docs={spark.read.parquet(DST + '/documents.parquet').count()}, "
          f"emb={spark.read.parquet(DST + '/embeddings.parquet').count()}",
          file=sys.stderr)


def time_once(spec, spark, sf_dir: str) -> float:
    t0 = time.time()
    df = spec.fn(spark, sf_dir)
    try:
        df.count()
        return time.time() - t0
    finally:
        release_intermediates(df)


def main() -> None:
    import math

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "--skip-build" not in sys.argv:
        build(spark)

    times: dict[str, dict[str, float]] = {n: {} for n in QUERIES}
    for p in range(2):  # interleaved best-of-2 per (query, sf)
        for name in QUERIES:
            spec = CATALOG[name]
            for tag, d in (("t_sf0.1", SRC), ("t_sf1x", DST)):
                t = time_once(spec, spark, d)
                prev = times[name].get(tag)
                times[name][tag] = t if prev is None else min(prev, t)
                print(f"# pass{p + 1} {name}@{tag}: {round(t, 2)}s",
                      file=sys.stderr)
    out = {}
    for name, tt in times.items():
        a = math.log10(tt["t_sf1x"] / tt["t_sf0.1"])
        out[name] = {"t_sf0.1": round(tt["t_sf0.1"], 3),
                     "t_sf1x": round(tt["t_sf1x"], 3),
                     "alpha": round(a, 3)}
    print(json.dumps({"factor": FACTOR, "queries": out,
                      "load_avg": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
