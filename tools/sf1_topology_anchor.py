"""One-shot sf1 anchor for the foreachBatch ingest topologies
(round-16 verdict item 5): the 100x probes cover stored-index SEARCH
and APPEND cost growth, and the sf1 headline anchor covers the batch
query lanes — this tool anchors the STREAMING INGEST wrappers
themselves above sf0.1 (their integration tests run at sf0.01 class).

Drives each topology's callable directly (foreachBatch callables take
plain DataFrames) over the sf1 documents table split into N
round-robin batches, timing every batch:

- registry_ingest  — exact-dedup drop-semantics registry growth
  (IncrementalDeduplicator: bloom sidecar merge + prefix-partitioned
  hash append per batch)
- neardup_screen   — MinHash screen-and-ingest (batch matches the
  stored index, survivors append)
- bm25_ingest      — BM25 incremental index build (delta-sized dfreq
  merge per batch)
- ann_ingest       — IVF vector-index growth over the embeddings
  table (quantizer frozen at bootstrap, appends assign map-side
  against the stored centroids)

Run on a QUIET host (same discipline as bench.py):

    python tools/sf1_topology_anchor.py                # /tmp/sf1.0
    python tools/sf1_topology_anchor.py --sf-dir /root/testdata/sf0.1

Emits one JSON line per topology plus a final summary line; paste the
summary into BASELINE.md's round table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1.0")
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--out-root", default="/tmp/mmlspark_sf1_topo")
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from mmlspark_spark.core.session import get_spark, load_table
    from mmlspark_spark.llm import BM25Retriever
    from mmlspark_spark.llm.dedup import (
        IncrementalDeduplicator,
        MinHashLSHDeduplicator,
    )
    from mmlspark_spark.llm.index_common import _hadoop_fs
    from mmlspark_spark.llm.similarity import IVFKNN
    from mmlspark_spark.streaming import (
        ann_ingest_foreach_batch,
        bm25_ingest_foreach_batch,
        neardup_screen_foreach_batch,
        registry_ingest_foreach_batch,
    )

    spark = get_spark("sf1-topology-anchor")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, a.sf_dir, "documents").select(
        "doc_id", "text")
    emb = load_table(spark, a.sf_dir, "embeddings").select(
        "vec_id", "embedding")
    n = docs.count()
    n_vec = emb.count()
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cvec"))

    # (source frame, id column, wrapper factory) per topology
    topologies = {
        "registry_ingest": (docs, "doc_id",
                            lambda p: registry_ingest_foreach_batch(
            IncrementalDeduplicator(keyCols=("text",),
                                    idCol="doc_id"), p)),
        "neardup_screen": (docs, "doc_id",
                           lambda p: neardup_screen_foreach_batch(
            MinHashLSHDeduplicator(idCol="doc_id", textCol="text",
                                   shingleSize=5, numHashes=32,
                                   bands=16, threshold=0.2),
            p, "doc_id")),
        "bm25_ingest": (docs, "doc_id",
                        lambda p: bm25_ingest_foreach_batch(
            BM25Retriever(), p)),
        "ann_ingest": (emb, "vec_id",
                       lambda p: ann_ingest_foreach_batch(
            IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                   nlist=16, nProbe=4), p, centroids=cent)),
    }
    results = {}
    for name, (src, id_col, make) in topologies.items():
        p = os.path.join(a.out_root, name)
        fs, P = _hadoop_fs(spark, p)
        fs.delete(P(p), True)
        fn = make(p)
        times = []
        for b in range(a.batches):
            batch = src.filter(
                F.pmod(F.col(id_col), F.lit(a.batches)) == b)
            t0 = time.time()
            fn(batch, b)
            times.append(round(time.time() - t0, 3))
        results[name] = {"batch_sec": times,
                         "total_sec": round(sum(times), 3)}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"sf_dir": a.sf_dir, "docs": n,
                      "vectors": n_vec, "batches": a.batches,
                      "results": results}))


if __name__ == "__main__":
    main()
