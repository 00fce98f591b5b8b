import math

import pytest
from pyspark.sql import functions as F

from mmlspark_spark.ml import (
    ComputeModelStatistics,
    ComputePerInstanceStatistics,
    FindBestModel,
    RankingEvaluator,
    TrainClassifier,
    TrainRegressor,
    TuneHyperparameters,
)


@pytest.fixture(scope="module")
def binary_df(spark):
    """Synthetic separable-ish binary data (FIXTURES.md A3 analog)."""
    import numpy as np

    rng = np.random.default_rng(42)
    rows = []
    for label in (0, 1):
        feats = rng.normal(loc=label, scale=1.0, size=(200, 4))
        rows += [(int(label), *[float(x) for x in f]) for f in feats]
    return spark.createDataFrame(
        rows, "label int, f1 double, f2 double, f3 double, f4 double"
    ).cache()


def test_train_classifier_and_stats(binary_df):
    model = TrainClassifier(labelCol="label").fit(binary_df)
    scored = model.transform(binary_df)
    assert {"scores", "scored_probabilities", "scored_labels"} <= set(scored.columns)
    stats = ComputeModelStatistics(labelCol="label").transform(scored).collect()[0]
    assert stats.accuracy > 0.7
    assert stats.AUC > 0.8
    assert 0 < stats.precision <= 1 and 0 < stats.recall <= 1


def test_train_classifier_string_labels(spark, binary_df):
    df = binary_df.withColumn(
        "label", F.when(F.col("label") == 1, "yes").otherwise("no"))
    model = TrainClassifier(labelCol="label").fit(df)
    assert model.levels == ["no", "yes"]
    scored = model.transform(df)
    assert scored.count() == 400


def test_train_regressor_and_stats(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, 300)
    rows = [(float(3 * xi + 1 + rng.normal(0, 0.1)), float(xi)) for xi in x]
    df = spark.createDataFrame(rows, "label double, x double")
    model = TrainRegressor(labelCol="label").fit(df)
    scored = model.transform(df)
    stats = ComputeModelStatistics(
        evaluationMetric="regression", labelCol="label").transform(scored).collect()[0]
    assert stats.r2 > 0.95
    assert stats.rmse < 0.5
    assert stats.mae < 0.5


def test_per_instance_stats(binary_df):
    model = TrainClassifier(labelCol="label").fit(binary_df)
    scored = model.transform(binary_df)
    out = ComputePerInstanceStatistics(labelCol="label").transform(scored)
    losses = [r.log_loss for r in out.select("log_loss").collect()]
    assert all(l >= 0 for l in losses)
    assert sum(losses) / len(losses) < 1.0


def test_auc_matches_sklearn_formula(spark):
    """AUC rank formula vs direct computation on a tiny example."""
    df = spark.createDataFrame(
        [(1, 0.9), (1, 0.7), (0, 0.6), (1, 0.55), (0, 0.4), (0, 0.2)],
        "label int, p double",
    )
    from mmlspark_spark.ml.stats import auc_binary

    got = auc_binary(df, "label", "p")
    # pairs: pos>neg count / (3*3): (0.9,0.7,0.55) vs (0.6,0.4,0.2) → 8/9
    assert abs(got - 8 / 9) < 1e-9


def test_find_best_model(binary_df):
    from pyspark.ml.classification import LogisticRegression

    m1 = TrainClassifier(model=LogisticRegression(maxIter=1, regParam=10.0),
                         labelCol="label").fit(binary_df)
    m2 = TrainClassifier(model=LogisticRegression(maxIter=50),
                         labelCol="label").fit(binary_df)
    best = FindBestModel(models=[m1, m2], metric="AUC").fit(binary_df)
    assert best is m2


def test_tune_hyperparameters(binary_df):
    from pyspark.ml.classification import LogisticRegression

    from mmlspark_spark.ml.automl import DiscreteHyperParam, RangeHyperParam

    tuner = TuneHyperparameters(
        estimator=TrainClassifier(model=LogisticRegression(), labelCol="label"),
        paramSpace={"regParam": RangeHyperParam(0.001, 1.0, isLog=True),
                    "maxIter": DiscreteHyperParam([5, 20])},
        numRuns=3, numFolds=2, metric="accuracy", seed=7, parallelism=2,
    )
    model = tuner.fit(binary_df)
    assert tuner.best_metric > 0.6
    assert set(tuner.best_params) == {"regParam", "maxIter"}
    assert model.transform(binary_df).count() == 400


def test_ranking_evaluator(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4], [1, 3]), ([9, 8], [7])],
        "prediction array<int>, label array<int>",
    )
    m = RankingEvaluator(k=4).evaluate(df)
    # user1: hits {1,3} → recall 1.0; user2: none → 0
    assert abs(m["recallAtK"] - 0.5) < 1e-9
    assert 0 < m["ndcgAt"] <= 1
    assert 0 <= m["map"] <= 1


def test_advanced_ranking_metrics(spark):
    """The full AdvancedRankingMetrics set with the reference's exact
    definitions (RankingEvaluator.scala:22-98), hand-computed."""
    df = spark.createDataFrame(
        [([1, 2, 3, 4], [1, 3]), ([9, 8], [7])],
        "prediction array<int>, label array<int>",
    )
    m = RankingEvaluator(k=4).evaluate_all(df, nItems=10)
    # reference recallAtK divides by |pred|: u1 = 2/4, u2 = 0/2
    assert abs(m["recallAtK"] - 0.25) < 1e-9
    # mrr: u1 first hit at pos 1 → 1.0; u2 no hit → 0
    assert abs(m["mrr"] - 0.5) < 1e-9
    # fcp positions i < |label|: u1 pred[0]==1==lab[0] ✓,
    # pred[1]=2 vs lab[1]=3 ✗ → 1/2; u2 pred[0]=9 vs lab[0]=7 → 0/1
    assert abs(m["fcp"] - 0.25) < 1e-9
    # distinct recommended = {1,2,3,4,9,8} → 6/10
    assert abs(m["diversityAtK"] - 0.6) < 1e-9
    # ∪ labels ∪ preds = {1,2,3,4,7,8,9} → 7/10
    assert abs(m["maxDiversity"] - 0.7) < 1e-9
    # nItems default = maxDiversity numerator → maxDiversity 1.0
    d = RankingEvaluator(k=4).evaluate_all(df)
    assert abs(d["maxDiversity"] - 1.0) < 1e-9


def test_fcp_excludes_zero_denominator_rows(spark):
    """A row with an empty label has no pairable positions; the
    reference's nc/(nc+nd) is NaN there and drops out of the mean —
    it must not dilute the average as 0.0."""
    df = spark.createDataFrame(
        [([1, 2], [1, 2]),      # fcp 1.0
         ([3, 4], []),          # empty label: excluded, NOT 0.0
         ([5], [5])],           # fcp 1.0
        "prediction array<int>, label array<int>",
    )
    m = RankingEvaluator(k=2).evaluate_all(df, nItems=10)
    assert abs(m["fcp"] - 1.0) < 1e-9
    # all-empty labels: no evaluable rows → 0.0, not a crash
    df2 = spark.createDataFrame([([1], [])],
                                "prediction array<int>, label array<int>")
    assert RankingEvaluator(k=1).evaluate_all(df2, nItems=10)["fcp"] == 0.0


def test_slice_map(spark):
    from mmlspark_spark.functions.vector import slice_map

    df = spark.createDataFrame(
        [({"a": 1.0, "b": 2.0, "c": 3.0},)], "m map<string,double>")
    out = df.select(slice_map("m", ["c", "a"]).alias("v")).collect()[0]
    assert list(out.v) == [3.0, 1.0]


def test_auc_handles_nonstandard_label_encoding(spark):
    """A perfect classifier must score AUC 1.0 under a {1,2} label
    encoding (hardcoded positive=1.0/index-1 returned 0.0)."""
    from pyspark.ml.linalg import Vectors

    from mmlspark_spark.ml.stats import ComputeModelStatistics

    rows = []
    for i in range(20):
        lab = 2.0 if i % 2 else 1.0
        p2 = 0.9 if lab == 2.0 else 0.1
        rows.append((lab, lab, Vectors.dense([1 - p2, p2])))
    df = spark.createDataFrame(
        rows, ["label", "scored_labels", "scored_probabilities"])
    out = ComputeModelStatistics(evaluationMetric="classification").transform(df)
    assert out.collect()[0]["AUC"] == pytest.approx(1.0)


def test_train_classifier_string_labels_end_to_end(spark):
    """String labels: TrainClassifier maps predictions back to label
    space and ComputeModelStatistics scores them without casts."""
    from mmlspark_spark.ml import ComputeModelStatistics, TrainClassifier

    rows = [(float(i % 50), "yes" if i % 2 else "no") for i in range(100)]
    df = spark.createDataFrame(rows, ["x", "label"])
    model = TrainClassifier(labelCol="label").fit(df)
    scored = model.transform(df)
    got = {r.label for r in
           scored.select("scored_labels").distinct()
           .withColumnRenamed("scored_labels", "label").collect()}
    assert got <= {"yes", "no"}  # predictions live in label space
    stats = ComputeModelStatistics(labelCol="label").transform(scored)
    row = stats.collect()[0]
    assert 0.0 <= row["accuracy"] <= 1.0
    assert row["AUC"] == row["AUC"]  # not NaN


def test_knn_vector_udt_features(spark):
    """KNN scoring must handle SparkML VectorUDT features (the
    VectorAssembler output) across the Arrow boundary."""
    from pyspark.ml.linalg import Vectors

    from mmlspark_spark.nn import KNN

    df = spark.createDataFrame(
        [(Vectors.dense([float(i), 0.0]), f"v{i}") for i in range(10)],
        ["features", "values"])
    model = KNN(k=2).fit(df)
    out = model.transform(df)
    row = out.filter("values = 'v9'").collect()[0]
    assert row.output[0].value == "v9"  # self is its own max-IP hit
    # the features column keeps its vector type through the round trip
    assert out.schema["features"].dataType == df.schema["features"].dataType
