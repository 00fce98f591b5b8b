"""LIME/SHAP explainers vs analytic ground truth on a linear model
(reference explainers/split1/*ExplainerSuite strategy: a model with
known coefficients must be recovered)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mmlspark_spark.explainers import TabularLIME, TabularSHAP, VectorLIME
from mmlspark_spark.operators import Lambda


@pytest.fixture(scope="module")
def linear_model():
    # y = 3*a - 2*b + 1 ; exposes a numeric "prediction" column
    return Lambda(fn=lambda df: df.withColumn(
        "prediction", 3.0 * F.col("a") - 2.0 * F.col("b") + 1.0))


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(7)
    rows = [(float(a), float(b)) for a, b in rng.normal(0, 1, size=(40, 2))]
    return spark.createDataFrame(rows, ["a", "b"])


def test_tabular_lime_recovers_linear_coefficients(points, linear_model, spark):
    probe = spark.createDataFrame([(0.5, -0.5)], ["a", "b"])
    lime = TabularLIME(model=linear_model, inputCols=["a", "b"],
                       backgroundData=points, targetCol="prediction",
                       numSamples=400, regularization=0.0, seed=1)
    out = lime.transform(probe).collect()[0]
    coefs = out.explanation
    assert abs(coefs[0] - 3.0) < 0.15
    assert abs(coefs[1] - (-2.0)) < 0.15
    assert out.r2 > 0.99  # linear model → near-perfect local fit


def test_tabular_lime_deterministic(points, linear_model, spark):
    probe = spark.createDataFrame([(0.5, -0.5)], ["a", "b"])
    lime = TabularLIME(model=linear_model, inputCols=["a", "b"],
                       backgroundData=points, targetCol="prediction",
                       numSamples=100, seed=5)
    c1 = lime.transform(probe).collect()[0].explanation
    c2 = lime.transform(probe).collect()[0].explanation
    assert c1 == c2  # per-id seeded rng → partitioning-independent


def test_vector_lime(points, spark):
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction", 2.0 * F.col("features")[0] + 5.0 * F.col("features")[1]))
    vdf = points.select(F.array("a", "b").alias("features"))
    probe = vdf.limit(2)
    lime = VectorLIME(model=model, inputCol="features", backgroundData=vdf,
                      targetCol="prediction", numSamples=400, seed=2)
    rows = lime.transform(probe).collect()
    for r in rows:
        assert abs(r.explanation[0] - 2.0) < 0.2
        assert abs(r.explanation[1] - 5.0) < 0.3


def test_tabular_shap_efficiency_and_signs(points, linear_model, spark):
    probe = spark.createDataFrame([(1.0, 1.0)], ["a", "b"])
    shap = TabularSHAP(model=linear_model, inputCols=["a", "b"],
                       backgroundData=points, targetCol="prediction",
                       numSamples=128, seed=3)
    out = shap.transform(probe).collect()[0]
    base, phi_a, phi_b = out.shapValues
    fx = 3.0 * 1.0 - 2.0 * 1.0 + 1.0
    # efficiency: base + Σφ == f(x) (pinned by the big-weight coalitions)
    assert abs(base + phi_a + phi_b - fx) < 1e-3
    # linear model: φ_j = w_j * (x_j - E_bg[x_j]) exactly
    means = points.agg(F.avg("a"), F.avg("b")).collect()[0]
    assert abs(phi_a - 3.0 * (1.0 - means[0])) < 0.2
    assert abs(phi_b - (-2.0) * (1.0 - means[1])) < 0.2
