import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from mmlspark_spark.operators import (
    Cacher,
    DropColumns,
    DropMissingData,
    DynamicMiniBatchTransformer,
    Explode,
    FixedMiniBatchTransformer,
    FlattenBatch,
    Lambda,
    MultiColumnAdapter,
    PartitionConsolidator,
    RenameColumn,
    Repartition,
    SelectColumns,
    StratifiedRepartition,
    Timer,
    UDFTransformer,
)


def test_select_columns(basic_df):
    out = SelectColumns(cols=["numbers", "words"]).transform(basic_df)
    assert out.columns == ["numbers", "words"]
    assert out.count() == 3


def test_select_columns_schema_contract(basic_df):
    stage = SelectColumns(cols=["nope"])
    with pytest.raises(ValueError, match="missing column"):
        stage.transform(basic_df)


def test_drop_columns(basic_df):
    out = DropColumns(cols=["doubles", "more"]).transform(basic_df)
    assert out.columns == ["numbers", "words", "longs", "booleans"]


def test_rename_column(basic_df):
    out = RenameColumn(inputCol="words", outputCol="instruments").transform(basic_df)
    assert "instruments" in out.columns and "words" not in out.columns


def test_explode(spark):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])], ["id", "arr"])
    stage = Explode(inputCol="arr", outputCol="elem")
    out = stage.transform(df)
    assert out.count() == 3
    assert stage.transform_schema(df.schema)["elem"].dataType == T.StringType()


def test_explode_rejects_scalar(basic_df):
    with pytest.raises(ValueError, match="need array"):
        Explode(inputCol="numbers", outputCol="x").transform(basic_df)


def test_lambda(basic_df):
    out = Lambda(fn=lambda df: df.filter(F.col("numbers") > 0)).transform(basic_df)
    assert out.count() == 2


def test_udf_transformer(basic_df):
    import pandas as pd

    @F.pandas_udf(T.DoubleType())
    def double_it(s: pd.Series) -> pd.Series:
        return s * 2

    out = UDFTransformer(inputCols=["doubles"], outputCol="x", udf=double_it).transform(basic_df)
    vals = {r.numbers: r.x for r in out.collect()}
    assert vals[0] == 1.0 and vals[2] == 0.25


def test_cacher_and_timer(basic_df):
    assert Cacher().transform(basic_df).count() == 3
    t = Timer(stage=SelectColumns(cols=["numbers"]))
    out = t.transform(basic_df)
    assert out.columns == ["numbers"]
    assert t.last_elapsed is not None and t.last_elapsed >= 0


def test_repartition(lineitem):
    assert Repartition(n=2).transform(lineitem).rdd.getNumPartitions() == 2
    assert Repartition(n=8, useRepartition=True).transform(lineitem).rdd.getNumPartitions() == 8
    assert Repartition(n=2, disable=True).transform(lineitem).count() == lineitem.count()


def test_stratified_repartition_original(lineitem):
    out = StratifiedRepartition(labelCol="l_returnflag",
                                mode="original").transform(lineitem)
    assert out.count() == lineitem.count()
    # per-label counts preserved exactly
    orig = dict(lineitem.groupBy("l_returnflag").count().collect())
    got = dict(out.groupBy("l_returnflag").count().collect())
    assert got == orig
    # every partition contains every label (the stage's whole purpose)
    per_part = out.withColumn(
        "pid", F.spark_partition_id()).groupBy("pid").agg(
        F.countDistinct("l_returnflag").alias("nl")).collect()
    n_labels = len(orig)
    assert all(r.nl == n_labels for r in per_part)


def test_stratified_repartition_original_skewed(spark):
    """Regression: with per-label interleave keys spanning [0, count),
    range partitions above the minority labels' counts contained ONLY
    the majority label. Skewed planted data, several seeds — each
    partition must hold all three labels every time."""
    n_parts = spark.sparkContext.defaultParallelism
    rows = ([("maj",)] * (200 * n_parts)
            + [("min1",)] * (2 * n_parts)
            + [("min2",)] * (3 * n_parts))
    df = spark.createDataFrame(rows, ["label"])
    for seed in range(5):
        out = StratifiedRepartition(labelCol="label", mode="original",
                                    seed=seed).transform(df)
        per_part = out.withColumn(
            "pid", F.spark_partition_id()).groupBy("pid").agg(
            F.countDistinct("label").alias("nl")).collect()
        assert len(per_part) == n_parts
        assert all(r.nl == 3 for r in per_part), \
            f"seed {seed}: partitions missing labels: {per_part}"
        got = dict(out.groupBy("label").count().collect())
        assert got == {"maj": 200 * n_parts, "min1": 2 * n_parts,
                       "min2": 3 * n_parts}


def test_stratified_repartition_equal(spark, lineitem):
    out = StratifiedRepartition(labelCol="l_returnflag",
                                mode="equal").transform(lineitem)
    counts = [r[1] for r in out.groupBy("l_returnflag").count().collect()]
    orig_max = max(r[1] for r in
                   lineitem.groupBy("l_returnflag").count().collect())
    expect = max(orig_max, spark.sparkContext.defaultParallelism)
    assert counts == [expect] * len(counts)


def test_stratified_repartition_mixed(lineitem):
    out = StratifiedRepartition(labelCol="l_returnflag",
                                mode="mixed").transform(lineitem)
    counts = [r[1] for r in out.groupBy("l_returnflag").count().collect()]
    # every label the same size; total = #labels * harmonic-mean(count),
    # which is <= the original total (equality iff already balanced)
    assert max(counts) - min(counts) <= len(counts)
    assert 0 < sum(counts) <= lineitem.count()


def test_stratified_repartition_bad_mode():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        StratifiedRepartition(labelCol="x", mode="bogus")


def test_drop_missing(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["id", "s"])
    assert DropMissingData().transform(df).count() == 1
    assert DropMissingData(cols=["id"]).transform(df).count() == 2


def test_multi_column_adapter(basic_df):
    stage = MultiColumnAdapter(
        baseStage=RenameColumn(),
        inputCols=["words", "more"],
        outputCols=["w2", "m2"],
    )
    out = stage.transform(basic_df)
    assert "w2" in out.columns and "m2" in out.columns and "words" not in out.columns


def test_fixed_minibatch_roundtrip(spark):
    df = spark.range(17).withColumn("v", F.col("id").cast("double")).coalesce(1)
    batched = FixedMiniBatchTransformer(batchSize=5).transform(df)
    rows = batched.collect()
    sizes = sorted(len(r.id) for r in rows)
    assert sum(sizes) == 17 and max(sizes) == 5
    flat = FlattenBatch().transform(batched)
    assert flat.count() == 17
    assert {r.id for r in flat.collect()} == set(range(17))


def test_dynamic_minibatch(spark):
    df = spark.range(10).coalesce(1)
    out = DynamicMiniBatchTransformer(maxBatchSize=4).transform(df)
    assert sum(len(r.id) for r in out.collect()) == 10


def test_partition_consolidator(lineitem):
    assert PartitionConsolidator(numPartitions=1).transform(lineitem).rdd.getNumPartitions() == 1


def test_stratified_sampler_exact_and_fraction(spark):
    """Exact mode keeps the perStratum lowest order-keys per stratum;
    fraction mode is a seeded Bernoulli per first-stratum value."""
    from mmlspark_spark.operators.stages import StratifiedSampler

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = StratifiedSampler(stratumCols=["grp"], perStratum=5,
                            orderBy="id").transform(df)
    got = sorted((r.grp, r.id) for r in out.collect())
    assert got == [("a", 0), ("a", 2), ("a", 4), ("a", 6), ("a", 8),
                   ("b", 1), ("b", 3), ("b", 5), ("b", 7), ("b", 9)]

    frac = StratifiedSampler(stratumCols=["grp"], exact=False,
                             fractions={"a": 1.0, "b": 0.0},
                             seed=7).transform(df)
    grps = {r.grp for r in frac.collect()}
    assert grps == {"a"}
    # schema contract: missing stratum column errors eagerly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="missing column"):
        StratifiedSampler(stratumCols=["nope"]).transform(df)
    # eager contract: empty fractions would silently drop every
    # stratum (sampleBy treats absent keys as fraction 0)
    with _pytest.raises(ValueError, match="fractions"):
        StratifiedSampler(stratumCols=["grp"], exact=False).transform(df)


def test_stratified_repartition_null_labels(spark):
    """A NULL label is a legal stratum, not a NULL_MAP_KEY crash."""
    from pyspark.sql import types as T

    from mmlspark_spark.operators import StratifiedRepartition

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("label", T.StringType())])
    rows = [(i, "a" if i % 3 else None) for i in range(30)]
    df = spark.createDataFrame(rows, schema)
    out = StratifiedRepartition(labelCol="label",
                                mode="original").transform(df)
    got = sorted(r.id for r in out.collect())
    assert got == list(range(30))  # nothing dropped, nothing crashed
