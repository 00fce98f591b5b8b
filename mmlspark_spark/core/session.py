"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]``; the configs below are the ones that
matter both locally and on a 1000-executor cluster:

- AQE on (runtime partition coalescing + skew-join splitting),
- shuffle partitions sized to the parallelism at hand (the driver's
  cluster submit should override ``spark.sql.shuffle.partitions`` to
  ~2-3x total cores; we default to local core count),
- UTC session timezone so timestamp semantics match the DuckDB oracle
  and are cluster-invariant,
- Arrow enabled for every pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "mmlspark_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or CPUS
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (e.g. the verification driver's). Only touches confs that can
    change post-start."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the driver-generated tables; parquet scan keeps
    predicate pushdown + column pruning available to Catalyst.

    The ``events`` table stores TIMESTAMP(NANOS) which Spark's vectorized
    parquet reader rejects; we read nanos as long (legacy conf, runtime
    settable) and convert with integer division (``div`` — NOT ``/``,
    whose double quotient loses sub-microsecond precision at 2^60-scale
    epochs), matching DuckDB's truncate-to-micros semantics.
    """
    from pyspark.sql import functions as F

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
