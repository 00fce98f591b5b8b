#!/usr/bin/env python
"""Synthesize a 10× ("sf1-equivalent") corpus from sf0.1 covering
EVERY table the 9 headline bench queries touch, so bench.py can run
unchanged at a scale where fixed job overhead stops dominating
(BASELINE.md round-15 "sf1 headline probe").

Replication discipline (mirrors tools/scale_probe.py's documents /
embeddings methodology, extended to the relational + event tables):

- ``lineitem`` / ``orders``: replicas shift ``*_orderkey`` (and
  ``o_custkey``) by i·max — a 10× corpus has 10× orders from 10×
  customers, NOT 10× line items per order; per-key group sizes and
  join fan-outs keep their real shape (inflating basket sizes instead
  would grow the SAR self-join quadratically, which no real sf10
  corpus does).
- ``events``: replicas shift ``event_id`` / ``user_id`` — 10× users,
  not 10×-longer sessions, for the same reason (sessionize's window
  state is per-user).
- ``documents``: replica-salted every 4th token (shingle sets are NOT
  near-duplicates of the source; raw copies would inflate dedup pair
  counts past anything a real corpus shows).
- ``embeddings``: deterministic per-replica offset (vectors distinct).
- dims (``region nation customer supplier part``): copied once,
  unchanged — broadcast sides stay broadcast-sized, like real TPC-H
  dims relative to the fact growth.

Usage::

    python tools/sf1_build.py [--dst /tmp/sf1.0] [--factor 10]
    SPARK_GRAFT_SF_DIR=/tmp/sf1.0 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mmlspark_spark.core.session import get_spark, load_table

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIMS = ("region", "nation", "customer", "supplier", "part")


def _arg(flag: str, default):
    if flag in sys.argv:
        return type(default)(sys.argv[sys.argv.index(flag) + 1])
    return default


def main() -> None:
    factor = _arg("--factor", 10)
    dst = _arg("--dst", "/tmp/sf1.0")
    spark = get_spark("sf1-build")
    spark.sparkContext.setLogLevel("ERROR")

    for d in DIMS:
        (spark.read.parquet(f"{SRC}/{d}.parquet")
         .write.mode("overwrite").parquet(f"{dst}/{d}.parquet"))

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    # load_table normalizes the nanos-vs-micros ts generations to
    # TimestampType, so the replicated corpus always writes plain
    # micros — downstream readers need no legacy conf
    ev = load_table(spark, SRC, "events")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    max_ok = orders.agg(F.max("o_orderkey")).first()[0] + 1
    max_ck = orders.agg(F.max("o_custkey")).first()[0] + 1
    max_eid = ev.agg(F.max("event_id")).first()[0] + 1
    max_uid = ev.agg(F.max("user_id")).first()[0] + 1
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    max_vec = emb.agg(F.max("vec_id")).first()[0] + 1

    def shifted(df, shifts: dict, i: int):
        if i == 0:
            return df
        return df.select(*[
            (F.col(c) + F.lit(i * shifts[c])).alias(c) if c in shifts
            else F.col(c) for c in df.columns])

    def salt_docs(i: int):
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

    # one replica per append job: keeps Catalyst's plan flat at any
    # factor (a 10-way union tree is fine, but this matches the
    # scale_probe convention and stays O(1) planning per job)
    for i in range(factor):
        mode = "overwrite" if i == 0 else "append"
        shifted(li, {"l_orderkey": max_ok}, i).repartition(8) \
            .write.mode(mode).parquet(f"{dst}/lineitem.parquet")
        shifted(orders, {"o_orderkey": max_ok, "o_custkey": max_ck},
                i).repartition(4) \
            .write.mode(mode).parquet(f"{dst}/orders.parquet")
        shifted(ev, {"event_id": max_eid, "user_id": max_uid},
                i).repartition(4) \
            .write.mode(mode).parquet(f"{dst}/events.parquet")
        salt_docs(i).repartition(4).write.mode(mode).parquet(
            f"{dst}/documents.parquet")
        shift_emb(i).repartition(4).write.mode(mode).parquet(
            f"{dst}/embeddings.parquet")
    for t in ("lineitem", "orders", "events", "documents",
              "embeddings"):
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"# {t}: {n} rows", file=sys.stderr)
    print(f"# built {dst} at factor {factor}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
