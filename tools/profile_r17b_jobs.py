#!/usr/bin/env python
"""Round-17b job-level profiler: times every DataFrameWriter.parquet,
DataFrame.count/first/collect and noop write inside the named lanes so
each lifecycle phase decomposes into its actual Spark jobs.

Usage: python tools/profile_r17b_jobs.py --queries a,b --runs 2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmlspark_spark.core.cache import release_intermediates
from mmlspark_spark.core.session import DEFAULT_SF_DIR, get_spark
from mmlspark_spark.plans.catalog import CATALOG

EVENTS: list[tuple[str, str, float]] = []


def _instrument() -> None:
    from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    orig_parquet = DataFrameWriter.parquet

    def parquet(self, path, **kw):
        t0 = time.time()
        r = orig_parquet(self, path, **kw)
        EVENTS.append(("write", path, round(time.time() - t0, 3)))
        return r
    DataFrameWriter.parquet = parquet

    orig_save = DataFrameWriter.save

    def save(self, path=None, **kw):
        t0 = time.time()
        r = orig_save(self, path, **kw)
        EVENTS.append(("save", str(path), round(time.time() - t0, 3)))
        return r
    DataFrameWriter.save = save

    for m in ("count", "first", "collect"):
        orig = getattr(DataFrame, m)

        def make(orig, m):
            def wrap(self, *a, **k):
                t0 = time.time()
                r = orig(self, *a, **k)
                EVENTS.append((m, "", round(time.time() - t0, 3)))
                return r
            return wrap
        setattr(DataFrame, m, make(orig, m))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    args = ap.parse_args()
    names = args.queries.split(",")

    _instrument()
    spark = get_spark("profile_r17b_jobs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
    import pandas as pd
    from pyspark.sql import functions as F

    def _warm(v):
        return pd.Series([len(str(x)) for x in v])

    warm = F.pandas_udf(_warm, "long")
    spark.range(0, 10_000, 1, 32).select(
        warm("id").alias("n")).agg({"n": "sum"}).collect()

    for r in range(args.runs):
        for name in names:
            spec = CATALOG[name]
            EVENTS.clear()
            spark.sparkContext.setJobDescription(f"{name} r{r}")
            t0 = time.time()
            df = spec.fn(spark, args.sf_dir)
            try:
                df.write.format("noop").mode("overwrite").save()
            finally:
                release_intermediates(df)
            total = round(time.time() - t0, 3)
            print(f"== {name} run{r}: total {total}s", flush=True)
            for kind, path, sec in EVENTS:
                if sec < 0.02:
                    continue
                short = path.replace("/tmp/mmlspark_spark_idx/", "")
                print(f"   {sec:7.3f}s  {kind:7s} {short}", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
