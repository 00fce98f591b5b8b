#!/usr/bin/env python
"""Round-17b lifecycle phase profiler.

Wraps every stored-index lifecycle method (save/append/delete/compact/
load) with wall-clock timers, runs the named catalog lanes end-to-end
through the noop sink, and prints per-phase seconds. The lazy tail
(search/match execution) is total minus the eager phases.

Usage:
  python tools/profile_r17b.py [--runs 2] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmlspark_spark.core.cache import release_intermediates
from mmlspark_spark.core.session import DEFAULT_SF_DIR, get_spark
from mmlspark_spark.plans.catalog import CATALOG

DEFAULT_LANES = [
    "bm25_search_compacted", "knn_ivf_compacted", "minhash_match_indexed",
    "knn_lsh_indexed", "knn_ivfpq_indexed", "bm25_phrase_indexed",
    "video_match_indexed", "exact_match_indexed", "simhash_match_indexed",
]

PHASES: list[tuple[str, float]] = []

LIFECYCLE = ("save_index", "append_to_index", "delete_from_index",
             "compact_index", "load_index")


def _instrument() -> None:
    from mmlspark_spark.llm import dedup, multimodal_dedup, retrieval, similarity
    classes = []
    for mod in (dedup, multimodal_dedup, retrieval, similarity):
        for name in dir(mod):
            obj = getattr(mod, name)
            if isinstance(obj, type) and any(
                    m in obj.__dict__ for m in LIFECYCLE):
                classes.append(obj)
    for cls in classes:
        for m in LIFECYCLE:
            if m not in cls.__dict__:
                continue
            orig = cls.__dict__[m]
            def make(orig, label):
                def wrap(*a, **k):
                    t0 = time.time()
                    r = orig(*a, **k)
                    PHASES.append((label, round(time.time() - t0, 3)))
                    return r
                return wrap
            setattr(cls, m, make(orig, f"{cls.__name__}.{m}"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else DEFAULT_LANES

    _instrument()
    spark = get_spark("profile_r17b")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + python workers like bench.py
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
    import pandas as pd
    from pyspark.sql import functions as F

    def _warm(v):
        return pd.Series([len(str(x)) for x in v])

    warm = F.pandas_udf(_warm, "long")
    spark.range(0, 10_000, 1, 32).select(
        warm("id").alias("n")).agg({"n": "sum"}).collect()

    out: dict[str, list[dict]] = {}
    for r in range(args.runs):
        for name in names:
            spec = CATALOG.get(name)
            if spec is None:
                print(f"# {name}: not in catalog", file=sys.stderr)
                continue
            PHASES.clear()
            spark.sparkContext.setJobDescription(f"{name} r{r}")
            t0 = time.time()
            df = spec.fn(spark, args.sf_dir)
            t_build = time.time() - t0
            try:
                df.write.format("noop").mode("overwrite").save()
            finally:
                release_intermediates(df)
            total = round(time.time() - t0, 3)
            eager = round(sum(s for _, s in PHASES), 3)
            rec = {"total": total, "phases": list(PHASES),
                   "build_incl_eager": round(t_build, 3),
                   "lazy_tail": round(total - t_build, 3),
                   "eager_sum": eager}
            out.setdefault(name, []).append(rec)
            print(f"{name} run{r}: total {total}s  "
                  f"phases {PHASES}  lazy_tail {rec['lazy_tail']}s",
                  flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"load": os.getloadavg()[0], "profile": out}))
    spark.stop()


if __name__ == "__main__":
    main()
