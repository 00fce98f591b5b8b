#!/usr/bin/env python
"""Benchmark harness: times the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully materialized via a count() action (results are small
aggregates; the work measured is the scan/shuffle/compute, not driver
transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mmlspark_spark.core.session import DEFAULT_SF_DIR, get_spark
from mmlspark_spark.plans.catalog import CATALOG


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("mmlspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [s for s in CATALOG.values() if s.headline]
    # Warm the JVM + parquet footers with one cheap action.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for spec in headline:
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        n = df.count()
        times[spec.name] = round(time.time() - t0, 3)
        print(f"# {spec.name}: {times[spec.name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
