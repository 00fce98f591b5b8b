#!/usr/bin/env python
"""Round-16 optimization profiler.

Modes:
  explain  — capture .explain('formatted') for named queries into
             plans/r16/<query>_<tag>.txt (no timing claims; cheap).
  time     — per-query noop-sink timings, best-of-N, labeled jobs.

Usage:
  python tools/profile_r16.py explain --tag before [--queries a,b,c]
  python tools/profile_r16.py time [--runs 3] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmlspark_spark.core.cache import release_intermediates
from mmlspark_spark.core.session import DEFAULT_SF_DIR, get_spark
from mmlspark_spark.plans.catalog import CATALOG

HEADLINE = ["tpch_q1", "summarize_data_approx", "broadcast_join_revenue",
            "sessionize", "text_featurize_pipeline", "ngram_jaccard",
            "minhash_dedup", "knn_bruteforce", "sar_item_similarity"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["explain", "time"])
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=None,
                    help="comma list; default = headline set")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--action", choices=["noop", "count"], default="noop")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    args = ap.parse_args()

    names = (args.queries.split(",") if args.queries else HEADLINE)
    spark = get_spark("profile_r16")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    if args.mode == "explain":
        for name in names:
            spec = CATALOG[name]
            df = spec.fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            release_intermediates(df)
            path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path} ({len(buf.getvalue())} chars)")
    else:
        # warm the JVM + parquet footers once, like bench.py, plus the
        # python-worker daemon (first pandas-UDF action pays ~6 s)
        spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
        import pandas as pd
        from pyspark.sql import functions as F

        def _warm(v):
            return pd.Series([len(str(x)) for x in v])

        warm = F.pandas_udf(_warm, "long")
        spark.range(0, 10_000, 1, 32).select(
            warm("id").alias("n")).agg({"n": "sum"}).collect()

        # passes INTERLEAVED across queries (bench.py methodology):
        # a transient load window contaminates one pass, not a query
        samples: dict[str, list[float]] = {}
        for r in range(args.runs):
            for name in names:
                spec = CATALOG[name]
                spark.sparkContext.setJobDescription(f"{name} run{r}")
                t0 = time.time()
                df = spec.fn(spark, args.sf_dir)
                try:
                    if args.action == "noop":
                        df.write.format("noop").mode("overwrite").save()
                    else:
                        df.count()
                finally:
                    release_intermediates(df)
                samples.setdefault(name, []).append(
                    round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results = {name: {"best": min(ts), "samples": ts}
                   for name, ts in samples.items()}
        for name, res in results.items():
            print(f"{name}: best {res['best']}s  {res['samples']}",
                  flush=True)
        print(json.dumps({"load": os.getloadavg()[0],
                          "action": args.action, "times": results}))
    spark.stop()


if __name__ == "__main__":
    main()
