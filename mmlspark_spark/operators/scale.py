"""Scale utilities: bucketed co-located joins and skew-salted joins.

The brief's shuffle-minimization toolkit made concrete (SURVEY §4 /
"Partitioning & shuffle"): bucketing pre-shuffles a table ONCE at write
time so every later equi-join/aggregation on the bucket key is
shuffle-free; salting splits a skewed hot key across ``salt`` synthetic
sub-keys so no single task drags the join (complementary to AQE's
skew-split, which only handles post-shuffle partition skew, not a
single hot key inside one task's hash range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, bucketCols, numBuckets: int,
                   sortCols=None, mode: str = "overwrite") -> None:
    """Persist as a bucketed (+optionally sorted) table: the one-time
    shuffle that every subsequent join/agg on ``bucketCols`` skips."""
    bucket_cols = [bucketCols] if isinstance(bucketCols, str) else list(bucketCols)
    writer = (df.write.mode(mode)
              .bucketBy(numBuckets, bucket_cols[0], *bucket_cols[1:]))
    if sortCols:
        sort_cols = [sortCols] if isinstance(sortCols, str) else list(sortCols)
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


_SALT_SAFE_HOW = ("inner", "left", "leftouter", "left_outer",
                  "left_semi", "leftsemi", "left_anti", "leftanti")


def salted_join(left: DataFrame, right: DataFrame, on,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the LEFT side's hot keys split across ``salt``
    sub-keys; the right side is replicated ``salt``× (explode) so every
    sub-key finds its match. Use when one side has a few huge keys and
    the other side's rows per key are small enough to replicate.

    Only left-preserving join types are allowed: under right/full outer
    joins every UNMATCHED right row would surface once per salt replica
    (duplicate output), so those are rejected.
    """
    if how not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join replicates the right side {salt}x; how={how!r} "
            f"would duplicate unmatched right rows. Allowed: {_SALT_SAFE_HOW}")
    on = [on] if isinstance(on, str) else list(on)
    lhs = left.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    rhs = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = lhs.join(rhs, on=on + ["__salt"], how=how)
    return out.drop("__salt")


# bytes/slot floor for BLAS-class per-row work (vector dot products):
# a core chews through ~1 GB/s of packed doubles, so below ~32 MB per
# slot the repartition shuffle + 32-task scheduling costs more than the
# narrow plan's serialization (measured: knn_bruteforce at sf0.1 paid
# 0.69 s → 1.62 s for a spread over a 0.8 MB corpus). Regex/tokenize
# work is 2-3 orders of magnitude slower per byte — those call sites
# keep the default floor of 0.
VECTOR_MATH_BYTES_PER_SLOT = 32 << 20

# bytes/slot TARGET for tokenize-class spreads (the default-floor call
# sites): the spread width is derived from the INPUT SIZE, not pinned
# to the core count — over-fragmenting a small input pays scheduling +
# python-worker dispatch per task with no compute to amortize it. The
# r16 width sweep at sf0.1/local[32] (594 KB estimated input) measured
# widths 12-16 beating the full 32-way spread on every tokenize-class
# lane (ngram_jaccard 1.96→1.37 s, minhash_dedup 2.29→1.69,
# text_featurize 0.98→0.77 best-of-4), and the 8-core bench beating
# the 32-core bench outright on those lanes — the core-count constant
# was tuned for neither. 48 KB/slot puts that input at width ~13 and
# any input ≥ ~1.5 MB at full local parallelism; on a real cluster the
# few-splits guard is false long before this matters.
TOKENIZE_BYTES_PER_SLOT = 48 << 10


def spread_narrow_scan(df: DataFrame,
                       min_bytes_per_slot: int = 0) -> DataFrame:
    """Repartition ``df`` up to the cluster's parallelism when its scan
    has fewer splits than half the available slots.

    Heavy per-row compute (tokenization, hashing, vector math) above a
    scan with 1-2 splits — a small file, or one giant parquet row-group
    — serializes onto 1-2 cores while the cluster idles. The shuffle
    moved here is the input itself, which is exactly the case (input ≪
    cluster) where that shuffle is cheap. At 100 TB the scan already
    has orders of magnitude more splits than slots, the guard is false,
    and this is a no-op — no shuffle is added on the scale path.
    Measured at sf0.1/local[32]: minhash signatures 3.7 s → 2.3 s.

    ``min_bytes_per_slot`` makes the guard byte-aware for cheap-per-byte
    work: when Catalyst's size estimate says the input carries less
    than that many bytes per slot, the spread is skipped and the narrow
    plan kept — the parallelism would not amortize the added shuffle.
    Pass :data:`VECTOR_MATH_BYTES_PER_SLOT` for BLAS-class maps; leave
    0 for expensive per-row work (regex tokenization) where even tiny
    inputs win from the spread — there the spread WIDTH is derived
    from the input size (``ceil(size / TOKENIZE_BYTES_PER_SLOT)``,
    floor 2, cap parallelism) instead of pinned to the core count,
    so a small input is not fragmented into more tasks than its bytes
    amortize (r16 width sweep). At real scale the size estimate is
    huge (width caps at the parallelism) and the partition-count guard
    already made this a no-op, so the scale path is unchanged.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    try:
        size = int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:  # pragma: no cover - stats always exist in practice
        size = None
    if min_bytes_per_slot:
        if size is not None and size < min_bytes_per_slot * target:
            return df
    elif size is not None:
        # tokenize-class: width follows the input size, capped at the
        # cluster's parallelism (see TOKENIZE_BYTES_PER_SLOT)
        target = min(target,
                     max(2, -(-size // TOKENIZE_BYTES_PER_SLOT)))
    return df.repartition(target)


def zip_with_index(df: DataFrame, start_index: int = 0,
                   col_name: str = "rowId", partition_col=(),
                   order_by_col=()) -> DataFrame:
    """Sequential row index, Spark-first.

    Parity: reference ``cyber/utils/spark_utils.py:41-92``
    (DataFrameUtils.zip_with_index). Per-partition mode is the same
    window ``row_number``. The GLOBAL mode differs deliberately: the
    reference's ``df.rdd.zipWithIndex()`` round-trips every row through
    the Python serializer; here the index is per-Spark-partition
    ``row_number`` (arrival order pinned by ``monotonically_increasing_id``)
    plus broadcast partition offsets from one partition-count
    aggregation — rows never leave the JVM, and the extra job is the
    same count pass ``zipWithIndex`` itself needs.
    """
    from pyspark.sql.window import Window

    partition_col = ([partition_col] if isinstance(partition_col, str)
                     else list(partition_col))
    order_by_col = ([order_by_col] if isinstance(order_by_col, str)
                    else list(order_by_col))
    if partition_col:
        w = Window.partitionBy(*partition_col)
        w = w.orderBy(*order_by_col) if order_by_col else w.orderBy(
            F.monotonically_increasing_id())
        return df.withColumn(col_name,
                             F.row_number().over(w) - 1 + start_index)
    if order_by_col:
        df = df.orderBy(*order_by_col)
    # localCheckpoint pins one physical partitioning for BOTH the
    # counts job and the final window job. Without it the plan re-executes
    # from scratch for the second job, and a sort's RangePartitioner
    # samples with a per-execution seed — partition boundaries can shift
    # between the two jobs, yielding duplicate/skipped indices (same
    # hazard for any non-deterministic source). Cost: materializes the
    # input once to executor memory/disk — the same cost
    # rdd.zipWithIndex() pays for its count pass.
    # CLUSTER FAILURE MODE: localCheckpoint is non-reliable storage with
    # truncated lineage — lose an executor between the counts job and
    # the window job and the computation is unrecoverable (fails, not
    # corrupts; re-run the operator). On a real cluster prefer a
    # reliable checkpoint dir (sc.setCheckpointDir + .checkpoint()) for
    # long-lived frames; the blocks also stay pinned for the session —
    # callers holding many indexed frames should drop references or use
    # the reliable path.
    tagged = (df.withColumn("__pid", F.spark_partition_id())
              .withColumn("__mono", F.monotonically_increasing_id())
              .localCheckpoint())
    counts = sorted(
        (r["__pid"], r["count"]) for r in
        tagged.groupBy("__pid").count().collect())
    offsets, acc = {}, start_index
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    # Offsets attach via a broadcast join on a tiny (pid, offset)
    # frame, NOT a coalesce(when...) chain: one branch per partition
    # would blow past the JVM's 64KB generated-method limit (and
    # quadratic analysis time) at the 10k-1M partition counts this
    # module is for. The join build side is O(partitions) rows.
    off_df = df.sparkSession.createDataFrame(
        [(int(pid), int(o)) for pid, o in offsets.items()],
        "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy("__mono")
    return (tagged.join(F.broadcast(off_df), "__pid", "left")
            .withColumn(
                col_name,
                (F.row_number().over(w) - 1
                 + F.coalesce(F.col("__off"), F.lit(start_index)))
                .cast("long"))
            .drop("__pid", "__mono", "__off"))


def zorder_key(cols, bits: int = 16) -> "F.Column":
    """Interleave the low ``bits`` bits of non-negative integer columns
    into one Morton (Z-order) key.

    Z-ordering is the standard multi-dimensional data-skipping layout
    (Delta/Iceberg ``OPTIMIZE ZORDER BY``): sorting 100 TB of parquet
    by the interleaved key makes every file a small hyper-rectangle in
    (col1, col2, ...)-space, so min/max footer stats prune scans for
    predicates on ANY prefix-free subset of the dimensions — a plain
    sort only skips on its leading column.

    Pure integer bit arithmetic (sum of shift/mask terms), so the key
    is engine-portable and the catalog verifies it hash-exact. Columns
    must already be non-negative ints in [0, 2**bits); use
    :class:`ZOrderRepartitioner` for the range-scaling + layout step.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    dims = len(cols)
    if dims * bits > 63:
        raise ValueError(
            f"zorder_key: {dims} dims x {bits} bits exceeds a signed "
            f"64-bit key; lower bits (total must be <= 63)")
    key = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        lc = c.cast("long")
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(lc, i).bitwiseAND(F.lit(1)), i * dims + d)
    return key


class ZOrderRepartitioner:
    """Lay a DataFrame out in Z-order over ``cols``: scale each column
    to ``bits``-bit integer rank space via its observed min/max (one
    tiny agg, driver state O(dims)), build the Morton key, and
    ``repartitionByRange`` on it so downstream parquet writes produce
    locality-preserving files.

    The range partitioning samples the key distribution, so output
    files are balanced even when the dimensions are skewed — the
    standard OPTIMIZE ZORDER shape. NULLs in any dimension map to bit
    pattern 0 (they cluster with the minimum, and their files' footer
    stats still exclude non-null predicates).
    """

    def __init__(self, cols, bits: int = 16, numPartitions: int | None = None):
        self.cols = [cols] if isinstance(cols, str) else list(cols)
        self.bits = bits
        self.numPartitions = numPartitions

    def transform(self, df: DataFrame) -> DataFrame:
        aggs = []
        for c in self.cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"__mx_{c}")]
        stats = df.agg(*aggs).collect()[0]
        top = (1 << self.bits) - 1
        scaled = []
        for c in self.cols:
            mn, mx = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
            span = (mx - mn) if (mx is not None and mn is not None
                                 and mx > mn) else 1.0
            s = F.floor(((F.col(c).cast("double") - F.lit(mn))
                         / F.lit(span)) * top)
            scaled.append(F.coalesce(F.least(s, F.lit(top)), F.lit(0)))
        keyed = df.withColumn("__z", zorder_key(scaled, self.bits))
        n = self.numPartitions or keyed.rdd.getNumPartitions()
        return keyed.repartitionByRange(n, "__z").drop("__z")
