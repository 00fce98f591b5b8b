"""Scale utilities: plan-shape assertions (bucketed joins avoid the
shuffle; salted joins stay correct)."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from mmlspark_spark.operators.scale import (
    read_bucketed,
    salted_join,
    write_bucketed,
)


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    a = spark.range(0, 1000).withColumn("k", F.col("id") % 50)
    b = spark.range(0, 500).withColumn("k", F.col("id") % 50) \
        .withColumn("v", F.col("id") * 2)
    write_bucketed(a, "bk_a", "k", numBuckets=8)
    write_bucketed(b.drop("id"), "bk_b", "k", numBuckets=8)
    # disable broadcast so the join must pick a shuffle or bucket plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "bk_a").join(
            read_bucketed(spark, "bk_b"), "k")
        plan = _plan_of(joined)
        # co-located: sort-merge join with NO shuffle exchange
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000 * 10  # 20 a-rows x 10 b-rows per key /2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_salted_join_matches_plain_join(spark):
    # one hot key (0) with many rows + uniform tail
    left = spark.range(0, 2000).withColumn(
        "k", F.when(F.col("id") < 1500, 0).otherwise(F.col("id") % 20))
    right = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], ["k", "v"])
    plain = left.join(right, "k").groupBy("k").count()
    salted = salted_join(left, right, "k", salt=4).groupBy("k").count()
    a = {(r.k, r["count"]) for r in plain.collect()}
    b = {(r.k, r["count"]) for r in salted.collect()}
    assert a == b  # salting never changes join semantics


def test_zip_with_index_global(spark):
    from mmlspark_spark.operators.scale import zip_with_index

    df = spark.range(0, 500).repartition(7).withColumn(
        "v", F.col("id") * 2)
    out = zip_with_index(df, col_name="rowId")
    ids = sorted(r.rowId for r in out.collect())
    assert ids == list(range(500))  # dense, unique, zero-based
    # ordered mode: index follows the sort order exactly
    out2 = zip_with_index(df, col_name="rowId", order_by_col="v",
                          start_index=10)
    rows = sorted(out2.collect(), key=lambda r: r.rowId)
    assert [r.v for r in rows] == sorted(r.v for r in rows)
    assert rows[0].rowId == 10


def test_zip_with_index_partitioned(spark):
    from mmlspark_spark.operators.scale import zip_with_index

    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("b", 2), ("a", 2), ("b", 1)], ["t", "v"])
    out = zip_with_index(df, partition_col="t", order_by_col="v")
    got = {(r.t, r.v): r.rowId for r in out.collect()}
    assert got[("a", 1)] == 0 and got[("a", 2)] == 1 and got[("a", 3)] == 2
    assert got[("b", 1)] == 0 and got[("b", 2)] == 1


def test_spread_narrow_scan_byte_floor(spark):
    """Byte-aware guard: a tiny narrow input is spread with the default
    floor (expensive per-row work) to a SIZE-derived width — never the
    raw core count (r16: fragmenting a 600 KB input into 32 tasks paid
    scheduling with nothing to amortize it) — but kept narrow under
    the BLAS-class floor; a large input spreads to full parallelism; a
    wide input is a no-op either way (the scale property)."""
    from mmlspark_spark.operators.scale import (
        TOKENIZE_BYTES_PER_SLOT,
        VECTOR_MATH_BYTES_PER_SLOT,
        spread_narrow_scan,
    )

    narrow = spark.range(1000).coalesce(1)
    target = spark.sparkContext.defaultParallelism
    tiny_width = spread_narrow_scan(narrow).rdd.getNumPartitions()
    assert 2 <= tiny_width < max(3, target)  # size-derived, not core count
    assert (spread_narrow_scan(narrow, VECTOR_MATH_BYTES_PER_SLOT)
            .rdd.getNumPartitions() == 1)

    # a narrow input whose size estimate exceeds slot_bytes*parallelism
    # still gets the full spread (the parallelism path is intact)
    big_rows = (TOKENIZE_BYTES_PER_SLOT * target) // 8 + 1000
    big = spark.range(big_rows).coalesce(1)
    assert spread_narrow_scan(big).rdd.getNumPartitions() == target

    wide = spark.range(1000).repartition(target)
    for floor in (0, VECTOR_MATH_BYTES_PER_SLOT):
        assert spread_narrow_scan(wide, floor) is wide  # no added shuffle


def test_zorder_key_interleaves_bits(spark):
    """Hand-checked Morton codes: (x=0b11, y=0b01) with 2 bits →
    bits x0,y0,x1,y1 = 1,1,1,0 → 0b0111 = 7."""
    from pyspark.sql import functions as F

    from mmlspark_spark.operators.scale import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (3, 1), (1, 3), (1023, 1023)], ["x", "y"])
    out = df.withColumn("z", zorder_key(["x", "y"], bits=10)).collect()
    got = {(r.x, r.y): r.z for r in out}
    assert got[(0, 0)] == 0
    assert got[(3, 1)] == 0b0111          # x0,y0,x1 set
    assert got[(1, 3)] == 0b1011          # y1,y0,x0 set
    assert got[(1023, 1023)] == (1 << 20) - 1

    import pytest as _pytest
    with _pytest.raises(ValueError, match="64-bit"):
        zorder_key(["x", "y"], bits=32)


def test_zorder_repartitioner_improves_locality(spark, sf_dir):
    """After Z-order layout each partition must cover a small
    hyper-rectangle: the mean per-partition span of BOTH dimensions
    shrinks vs the source layout (that is the whole point — footer
    min/max stats can then skip files on either column)."""
    from pyspark.sql import functions as F

    from mmlspark_spark.operators.scale import ZOrderRepartitioner

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_custkey", "o_totalprice"]

    def mean_spans(df):
        spans = (df.withColumn("__p", F.spark_partition_id())
                 .groupBy("__p")
                 .agg(*[(F.max(c) - F.min(c)).alias(c) for c in cols])
                 .agg(*[F.avg(c).alias(c) for c in cols])
                 .collect()[0])
        return {c: spans[c] for c in cols}

    base = mean_spans(orders.repartition(16))  # hash layout baseline
    z = mean_spans(
        ZOrderRepartitioner(cols, bits=10, numPartitions=16)
        .transform(orders))
    for c in cols:
        assert z[c] < base[c] * 0.7, (c, z[c], base[c])


def test_pagerank_matches_numpy_power_iteration(spark):
    """Hand graph: ranks must equal the same non-normalized
    contribution recurrence computed in numpy, iteration for
    iteration (including a dangling node)."""
    import numpy as np

    from mmlspark_spark.operators import pagerank

    # a->b, a->c, b->c, d dangling (only receives from c? no: c->d)
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank
           for r in pagerank(df, iterations=4, damping=0.85).collect()}

    nodes = ["a", "b", "c", "d"]
    idx = {n: i for i, n in enumerate(nodes)}
    out = {"a": ["b", "c"], "b": ["c"], "c": ["d"]}
    r = np.ones(4)
    for _ in range(4):
        nxt = np.full(4, 0.15)
        for s, dsts in out.items():
            for t in dsts:
                nxt[idx[t]] += 0.85 * r[idx[s]] / len(dsts)
        r = nxt
    for n in nodes:
        assert got[n] == pytest.approx(r[idx[n]], rel=1e-9), n


def test_pagerank_checkpoint_interval_preserves_values(spark):
    """Lineage cuts must not change the numbers."""
    from mmlspark_spark.operators import pagerank

    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], ["src", "dst"])
    a = {r.node: round(r.rank, 9) for r in
         pagerank(df, iterations=6, checkpointInterval=2).collect()}
    b = {r.node: round(r.rank, 9) for r in
         pagerank(df, iterations=6, checkpointInterval=0).collect()}
    assert a == b


def test_compact_parquet_reduces_files_preserves_data(spark, tmp_path):
    """50 tiny files -> few target-sized files; row set identical;
    a sortBy compaction clusters values for footer-stat pruning."""
    from mmlspark_spark.operators import compact_parquet

    path = str(tmp_path / "ds")
    spark.range(5000).selectExpr("id", "id % 7 AS k") \
        .repartition(50).write.parquet(path)
    before = spark.read.parquet(path)
    expected = sorted(r.id for r in before.collect())

    stats = compact_parquet(spark, path, targetFileSizeBytes=1 << 20)
    assert stats["files_before"] == 50
    assert stats["files_after"] == stats["target_files"] < 50
    after = spark.read.parquet(path)
    assert sorted(r.id for r in after.collect()) == expected
    # no tmp/backup residue
    import os
    assert not os.path.exists(path + ".__compact_tmp")
    assert not os.path.exists(path + ".__compact_old")

    # sorted compaction: each output file covers a disjoint id range
    stats2 = compact_parquet(spark, path, targetFileSizeBytes=8 << 10,
                             sortBy=["id"])
    assert stats2["files_after"] > 1
    import glob

    import pyarrow.parquet as pq
    ranges = []
    for f in glob.glob(path + "/part-*.parquet"):
        t = pq.read_table(f, columns=["id"])
        ids = t.column("id").to_pylist()
        ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint -> min/max stats prune scans


def test_compact_parquet_guards(spark, tmp_path):
    """Hive-partitioned datasets are refused (a root rewrite would
    flatten the layout); empty/data-free paths no-op; already-compact
    datasets no-op; an orphaned backup from an interrupted swap is
    restored on the next run."""
    import os

    from mmlspark_spark.operators import compact_parquet

    part = str(tmp_path / "part_ds")
    spark.range(100).selectExpr("id", "id % 3 AS k") \
        .write.partitionBy("k").parquet(part)
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, part)

    empty = str(tmp_path / "empty_ds")
    os.makedirs(empty)
    open(os.path.join(empty, "_SUCCESS"), "w").close()
    assert compact_parquet(spark, empty)["files_after"] == 0

    small = str(tmp_path / "small_ds")
    spark.range(10).coalesce(1).write.parquet(small)
    stats = compact_parquet(spark, small, targetFileSizeBytes=1 << 20)
    assert stats["files_before"] == stats["files_after"] == 1

    # simulate a crash between the two swap renames: path moved to
    # backup, new data never moved in
    victim = str(tmp_path / "victim_ds")
    spark.range(50).repartition(5).write.parquet(victim)
    os.rename(victim, victim + ".__compact_old")
    stats = compact_parquet(spark, victim, targetFileSizeBytes=1 << 20)
    assert stats["files_after"] == 1
    assert sorted(r.id for r in
                  spark.read.parquet(victim).collect()) == list(range(50))
    assert not os.path.exists(victim + ".__compact_old")

    # simulate a crash AFTER the swap but before the backup delete:
    # live data present, stale backup beside it. Every run must clean
    # the stale backup (even a no-op run) so a later external delete
    # of the dataset cannot resurrect it as live data.
    stale = str(tmp_path / "stale_ds")
    spark.range(20).coalesce(1).write.parquet(stale)
    spark.range(999).coalesce(1).write.parquet(stale + ".__compact_old")
    stats = compact_parquet(spark, stale, targetFileSizeBytes=1 << 20)
    assert stats["files_before"] == stats["files_after"] == 1  # no-op run
    assert not os.path.exists(stale + ".__compact_old")
    assert spark.read.parquet(stale).count() == 20

    # an EMPTY recreated path beside a backup is AMBIGUOUS (could be a
    # restarted streaming sink's metadata-only directory): the call
    # must refuse and touch NEITHER artifact
    hollow = str(tmp_path / "hollow_ds")
    spark.range(7).coalesce(1).write.parquet(hollow + ".__compact_old")
    os.makedirs(hollow)
    open(os.path.join(hollow, "_SUCCESS"), "w").close()
    with pytest.raises(IOError, match="ambiguous"):
        compact_parquet(spark, hollow, targetFileSizeBytes=1 << 20)
    assert os.path.exists(os.path.join(hollow, "_SUCCESS"))
    assert spark.read.parquet(hollow + ".__compact_old").count() == 7
