"""Per-learner golden-metric gates over fixed fixtures.

Parity: reference ``core/test/benchmarks/Benchmarks.scala`` driven by
``VerifyTrainClassifier`` / ``VerifyTuneHyperparameters`` (golden CSVs
in ``core/src/test/resources/benchmarks/``). Fixtures are seeded so
every metric is bit-reproducible; Spark ML's default ``seed`` params
are deterministic (class-name hash), so no run-to-run drift.
"""

import pytest
from pyspark.sql import functions as F

from mmlspark_spark.ml import (
    ComputeModelStatistics,
    TrainClassifier,
    TrainRegressor,
    TuneHyperparameters,
)

from golden import Benchmark, verify_benchmarks


@pytest.fixture(scope="module")
def binary_df(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    rows = []
    for label in (0, 1):
        feats = rng.normal(loc=label, scale=1.0, size=(200, 4))
        rows += [(int(label), *[float(x) for x in f]) for f in feats]
    return spark.createDataFrame(
        rows, "label int, f1 double, f2 double, f3 double, f4 double"
    ).cache()


@pytest.fixture(scope="module")
def regression_df(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, 300)
    rows = [(float(3 * xi + 1 + rng.normal(0, 0.1)), float(xi)) for xi in x]
    return spark.createDataFrame(rows, "label double, x double").cache()


def test_golden_train_classifier(binary_df):
    from pyspark.ml.classification import (
        DecisionTreeClassifier,
        GBTClassifier,
        LogisticRegression,
        RandomForestClassifier,
    )

    learners = {
        "LogisticRegression": LogisticRegression(),
        "RandomForestClassification": RandomForestClassifier(),
        "GradientBoostedTreesClassification": GBTClassifier(),
        "DecisionTreeClassification": DecisionTreeClassifier(),
    }
    new = []
    for name, learner in learners.items():
        model = TrainClassifier(model=learner, labelCol="label").fit(binary_df)
        stats = ComputeModelStatistics(labelCol="label").transform(
            model.transform(binary_df)).collect()[0]
        new.append(Benchmark(f"{name}_synthetic_AUC", float(stats.AUC), 0.01))
        new.append(Benchmark(f"{name}_synthetic_accuracy",
                             float(stats.accuracy), 0.01))
    verify_benchmarks("VerifyTrainClassifier", new)


def test_golden_train_regressor(regression_df):
    from pyspark.ml.regression import LinearRegression, RandomForestRegressor

    learners = {
        "LinearRegression": LinearRegression(),
        "RandomForestRegression": RandomForestRegressor(),
    }
    new = []
    for name, learner in learners.items():
        model = TrainRegressor(model=learner, labelCol="label").fit(
            regression_df)
        stats = ComputeModelStatistics(
            evaluationMetric="regression", labelCol="label").transform(
            model.transform(regression_df)).collect()[0]
        new.append(Benchmark(f"{name}_synthetic_R2", float(stats.r2), 0.01))
        new.append(Benchmark(f"{name}_synthetic_RMSE", float(stats.rmse),
                             0.01, higherIsBetter=False))
    verify_benchmarks("VerifyTrainRegressor", new)


def test_golden_tune_hyperparameters(binary_df):
    from pyspark.ml.classification import LogisticRegression

    from mmlspark_spark.ml.automl import DiscreteHyperParam, RangeHyperParam

    tuner = TuneHyperparameters(
        estimator=TrainClassifier(model=LogisticRegression(),
                                  labelCol="label"),
        paramSpace={"regParam": RangeHyperParam(0.001, 1.0, isLog=True),
                    "maxIter": DiscreteHyperParam([5, 20])},
        numRuns=3, numFolds=2, metric="accuracy", seed=7, parallelism=2,
    )
    tuner.fit(binary_df)
    verify_benchmarks("VerifyTuneHyperparameters", [
        Benchmark("binary_synthetic_accuracy", float(tuner.best_metric),
                  0.01)])


def test_golden_featurize_dataframe(spark):
    """Serialized-DataFrame golden (reference benchmarkBasicDataTypes.json
    asserted in featurize/VerifyFeaturize.scala): the full featurized
    output of a fixed basic-types frame, compared value-by-value with
    the reference's DataFrameEquality epsilon (1e-4)."""
    import json
    import os

    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from mmlspark_spark.featurize import Featurize

    from golden import GOLDEN_DIR

    df = spark.createDataFrame(
        [(0, 2.5, "guitars", True),
         (1, 0.5, "drums", False),
         (2, -1.5, "guitars", True),
         (3, 4.0, "flute", False),
         (4, None, "drums", True)],
        "idx int, score double, instrument string, flag boolean")
    model = Featurize(inputCols=["score", "instrument", "flag"],
                      outputCol="features").fit(df)
    out = (model.transform(df)
           .select("idx", vector_to_array(F.col("features")).alias("f"))
           .orderBy("idx").collect())
    got = [[r.idx, [round(float(x), 6) for x in r.f]] for r in out]

    path = os.path.join(GOLDEN_DIR, "benchmark_featurize_basic.json")
    if os.environ.get("GOLDEN_REGEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as fh:
            json.dump(got, fh, indent=1)
        return
    with open(path) as fh:
        want = json.load(fh)
    assert len(got) == len(want)
    for (gi, gf), (wi, wf) in zip(got, want):
        assert gi == wi
        assert len(gf) == len(wf), f"row {gi}: dim {len(gf)} vs {len(wf)}"
        assert all(abs(a - b) <= 1e-4 for a, b in zip(gf, wf)), \
            f"row {gi}: {gf} vs golden {wf}"
