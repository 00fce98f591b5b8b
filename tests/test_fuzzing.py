"""Generic stage-contract fuzzing (reference core/test/fuzzing/
Fuzzing.scala:192-298 analog): every registered stage must

1. propagate schema statically: ``transform_schema(df.schema)`` equals
   the schema Spark actually produces, and
2. be deterministic: two transforms of the same input give equal rows.

Stages register a TestObject (stage + input builder) exactly like the
reference's ``TestObject`` pattern.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _basic(spark):
    return spark.createDataFrame(
        [(0, 1.5, "alpha beta gamma", "x"),
         (1, 2.5, "delta epsilon", "y"),
         (2, float("nan"), "zeta", "x")],
        ["id", "val", "text", "cat"])


def _docs(spark):
    return spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog again"),
         (1, "the quick brown fox jumps over the lazy dog again"),
         (2, "completely different content with many other words here")],
        ["doc_id", "text"])


def _embs(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]), (2, [0.0, 0.0, 1.0])],
        ["vec_id", "embedding"])


def _test_objects(spark):
    """(name, stage, input_df) triples — transformers only."""
    from mmlspark_spark.anomaly import ComplementAccessTransformer
    from mmlspark_spark.llm.dedup import (
        EmbeddingDeduplicator,
        ExactDeduplicator,
        IncrementalDeduplicator,
        LineDeduplicator,
        MinHashLSHDeduplicator,
        SimHashDeduplicator,
    )
    from mmlspark_spark.llm.scrub import MarkupStripper
    from mmlspark_spark.operators import HeavyHitters, SCD2Merge
    from mmlspark_spark.operators import (
        Cacher,
        DropColumns,
        Explode,
        FixedMiniBatchTransformer,
        FlattenBatch,
        Lambda,
        RenameColumn,
        Repartition,
        SelectColumns,
    )
    from mmlspark_spark.operators.minibatch import DynamicMiniBatchTransformer

    basic = _basic(spark)
    docs = _docs(spark)
    embs = _embs(spark)
    arr = basic.withColumn("arr", F.array("id", "id"))
    batched = FixedMiniBatchTransformer(batchSize=2).transform(basic)
    pairs = spark.createDataFrame(
        [("t", 1, 1), ("t", 1, 2), ("t", 2, 1)],
        ["tenant", "user_idx", "res_idx"])
    return [
        ("SelectColumns", SelectColumns(cols=["id", "val"]), basic),
        ("DropColumns", DropColumns(cols=["cat"]), basic),
        ("RenameColumn", RenameColumn(inputCol="cat", outputCol="category"),
         basic),
        ("Explode", Explode(inputCol="arr", outputCol="el"), arr),
        ("Lambda", Lambda(fn=lambda df: df.withColumn("twice", F.col("id") * 2)),
         basic),
        ("Cacher", Cacher(), basic),
        ("Repartition", Repartition(n=2), basic),
        ("FixedMiniBatch", FixedMiniBatchTransformer(batchSize=2), basic),
        ("DynamicMiniBatch", DynamicMiniBatchTransformer(), basic),
        ("FlattenBatch", FlattenBatch(), batched),
        ("ExactDedup", ExactDeduplicator(keyCols=["text"], idCol="doc_id"),
         docs),
        ("MinHashDedup",
         MinHashLSHDeduplicator(threshold=0.2, numHashes=16, bands=4), docs),
        ("SimHashDedup", SimHashDeduplicator(maxHammingDistance=30), docs),
        ("EmbeddingDedup",
         EmbeddingDeduplicator(threshold=0.5, method="exact"), embs),
        ("ComplementAccess",
         ComplementAccessTransformer(partitionKey="tenant",
                                     indexedColNames=("user_idx", "res_idx"),
                                     complementsetFactor=2, seed=1), pairs),
        ("IncrementalDedup",
         IncrementalDeduplicator(referenceDf=docs.limit(1),
                                 keyCols=["text"], bloomBits=1 << 10), docs),
        ("LineDedup", LineDeduplicator(maxDocFrequency=1,
                                       dropEmpty=False), docs),
        ("MarkupStripper", MarkupStripper(), docs),
        ("HeavyHitters", HeavyHitters(inputCol="text", k=3,
                                      tokenize=True), docs),
        ("SCD2Merge", SCD2Merge(changesDf=docs.limit(1), keyCols=["doc_id"],
                                batchId="B"), docs),
    ]


def test_schema_contract_matches_physical(spark):
    failures = []
    for name, stage, df in _test_objects(spark):
        declared = stage.transform_schema(df.schema)
        actual = stage.transform(df).schema
        if [f.name for f in declared.fields] != [f.name for f in actual.fields]:
            failures.append(
                f"{name}: declared {declared.fieldNames()} "
                f"!= actual {actual.fieldNames()}")
    assert not failures, "\n".join(failures)


def test_transform_determinism(spark):
    failures = []
    for name, stage, df in _test_objects(spark):
        a = {tuple(map(repr, r)) for r in stage.transform(df).collect()}
        b = {tuple(map(repr, r)) for r in stage.transform(df).collect()}
        if a != b:
            failures.append(f"{name}: two transforms differ")
    assert not failures, "\n".join(failures)


def test_estimator_fit_transform_contract(spark):
    """Estimator analog of the experiment fuzzing (Fuzzing.scala:192-220)."""
    from mmlspark_spark.anomaly import (
        IdIndexer,
        LinearScalarScaler,
        StandardScalarScaler,
    )
    from mmlspark_spark.featurize import CleanMissingData, ValueIndexer
    from mmlspark_spark.operators import ClassBalancer

    basic = _basic(spark)
    tenant = spark.createDataFrame(
        [("t1", 1.0), ("t1", 3.0), ("t2", 5.0)], ["tenant", "value"])
    objs = [
        ("ClassBalancer", ClassBalancer(inputCol="cat"), basic),
        ("ValueIndexer", ValueIndexer(inputCol="cat", outputCol="cat_idx"),
         basic),
        ("CleanMissingData",
         CleanMissingData(cols=["val"], cleaningMode="Mean"), basic),
        ("StandardScaler",
         StandardScalarScaler(inputCol="value", partitionKey="tenant",
                              outputCol="scaled"), tenant),
        ("LinearScaler",
         LinearScalarScaler(inputCol="value", partitionKey="tenant",
                            outputCol="scaled"), tenant),
        ("IdIndexer",
         IdIndexer(inputCol="value", partitionKey="tenant", outputCol="idx"),
         tenant),
    ]
    failures = []
    for name, est, df in objs:
        model = est.fit(df)
        declared = model.transform_schema(df.schema)
        actual = model.transform(df).schema
        if [f.name for f in declared.fields] != [f.name for f in actual.fields]:
            failures.append(
                f"{name}: declared {declared.fieldNames()} "
                f"!= actual {actual.fieldNames()}")
    assert not failures, "\n".join(failures)


def test_save_load_roundtrip(spark, tmp_path):
    """Serialization fuzzing (Fuzzing.scala:222-298): JSON-param stages
    must round-trip through save/load with identical params. Stages
    holding runtime objects (callables, DataFrames, models) are
    documented as session-scoped and excluded."""
    from mmlspark_spark.anomaly import ComplementAccessTransformer
    from mmlspark_spark.featurize import DataConversion, UnicodeNormalize
    from mmlspark_spark.llm.dedup import (
        ExactDeduplicator,
        LineDeduplicator,
        MinHashLSHDeduplicator,
        SimHashDeduplicator,
    )
    from mmlspark_spark.llm.scrub import MarkupStripper
    from mmlspark_spark.llm.tokenizer import BPETokenizerModel
    from mmlspark_spark.operators import (
        DropColumns,
        HeavyHitters,
        Explode,
        FixedMiniBatchTransformer,
        RenameColumn,
        Repartition,
        SelectColumns,
    )

    stages = [
        SelectColumns(cols=["id", "val"]),
        DropColumns(cols=["cat"]),
        RenameColumn(inputCol="a", outputCol="b"),
        Explode(inputCol="arr", outputCol="el"),
        Repartition(n=4, useRepartition=True),
        FixedMiniBatchTransformer(batchSize=7),
        ExactDeduplicator(keyCols=["text"], idCol="doc_id"),
        MinHashLSHDeduplicator(numHashes=16, bands=4, threshold=0.3),
        SimHashDeduplicator(bands=4, maxHammingDistance=5),
        ComplementAccessTransformer(partitionKey="t",
                                    indexedColNames=("u", "r"),
                                    complementsetFactor=3, seed=9),
        DataConversion(cols=["x"], convertTo="double"),
        UnicodeNormalize(inputCol="text", outputCol="norm", form="NFKC"),
        LineDeduplicator(maxDocFrequency=7, sep="|", normalize=True,
                         dropEmpty=False),
        MarkupStripper(textCol="t", outputCol="c"),
        HeavyHitters(inputCol="w", k=9, minCount=2, tokenize=True),
        BPETokenizerModel(merges=[("a", "b"), ("ab", "</w>")],
                          textCol="text", outputCol="toks"),
    ]
    failures = []
    for i, stage in enumerate(stages):
        cls = type(stage)
        path = str(tmp_path / f"stage_{i}")
        try:
            stage.write().overwrite().save(path)
            loaded = cls.load(path)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{cls.__name__}: {type(e).__name__} {e}")
            continue
        for p in stage._paramMap:
            orig = stage.get(p.name)
            got = loaded.get(p.name)
            # JSON round-trips tuples as lists
            norm = lambda v: list(v) if isinstance(v, tuple) else v
            if norm(orig) != norm(got):
                failures.append(
                    f"{cls.__name__}.{p.name}: {orig!r} != {got!r}")
    assert not failures, "\n".join(failures)


def test_model_save_load_roundtrip(spark, tmp_path):
    """DataFrame-backed models (Serializer.scala:1-147 analog): fit,
    save, load, and the LOADED model's transform must produce the same
    rows as the original — DataFrame params go through parquet, nested
    fitted stages recurse."""
    from mmlspark_spark.anomaly import (
        IdIndexer,
        LinearScalarScaler,
        StandardScalarScaler,
    )
    from mmlspark_spark.featurize import CleanMissingData, ValueIndexer
    from mmlspark_spark.operators import ClassBalancer
    from mmlspark_spark.recommendation import SAR

    basic = _basic(spark)
    tenant = spark.createDataFrame(
        [("t1", 1.0), ("t1", 3.0), ("t2", 5.0)], ["tenant", "value"])
    ratings = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12), (3, 10), (3, 11)],
        ["user", "item"])
    objs = [
        ("ClassBalancer", ClassBalancer(inputCol="cat"), basic),
        ("ValueIndexer", ValueIndexer(inputCol="cat", outputCol="cat_idx"),
         basic),
        ("CleanMissingData",
         CleanMissingData(cols=["val"], cleaningMode="Mean"), basic),
        ("StandardScaler",
         StandardScalarScaler(inputCol="value", partitionKey="tenant",
                              outputCol="scaled"), tenant),
        ("LinearScaler",
         LinearScalarScaler(inputCol="value", partitionKey="tenant",
                            outputCol="scaled"), tenant),
        ("IdIndexer",
         IdIndexer(inputCol="value", partitionKey="tenant", outputCol="idx"),
         tenant),
        ("SAR", SAR(userCol="user", itemCol="item", supportThreshold=1),
         ratings),
    ]
    failures = []
    for name, est, df in objs:
        model = est.fit(df)
        path = str(tmp_path / name)
        try:
            model.write().overwrite().save(path)
            loaded = type(model).load(path)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__} {e}")
            continue
        if name == "SAR":
            a = {tuple(map(repr, r))
                 for r in model.recommend_for_all_users(2).collect()}
            b = {tuple(map(repr, r))
                 for r in loaded.recommend_for_all_users(2).collect()}
        else:
            a = {tuple(map(repr, r)) for r in model.transform(df).collect()}
            b = {tuple(map(repr, r)) for r in loaded.transform(df).collect()}
        if a != b:
            failures.append(f"{name}: loaded transform differs")
    assert not failures, "\n".join(failures)


def test_trained_classifier_model_roundtrip(spark, tmp_path):
    """Nested-stage persistence: TrainedClassifierModel holds a fitted
    featurizer + SparkML model; both must recurse through save/load."""
    from mmlspark_spark.ml.train import TrainClassifier
    from pyspark.ml.classification import LogisticRegression

    df = spark.createDataFrame(
        [(1.0, 2.0, "a"), (0.0, -1.0, "b"), (1.0, 3.0, "a"),
         (0.0, -2.0, "b")] * 5,
        ["label", "x", "c"])
    model = TrainClassifier(model=LogisticRegression(), labelCol="label").fit(df)
    path = str(tmp_path / "trained_clf")
    model.write().overwrite().save(path)
    loaded = type(model).load(path)
    a = [r.scored_labels for r in model.transform(df).collect()]
    b = [r.scored_labels for r in loaded.transform(df).collect()]
    assert a == b
