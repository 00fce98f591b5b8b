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


def test_tabular_shap_exact_enumeration(spark):
    """With 2^m - 2 <= numSamples the sampler enumerates every
    coalition, and with a single background row a linear model's
    Shapley values are closed-form: phi_i = w_i * (x_i - b_i)."""
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        2.0 * F.col("a") + 10.0 * F.col("b") - 3.0 * F.col("c")))
    bg = spark.createDataFrame([(1.0, 2.0, 3.0)], ["a", "b", "c"])
    probe = spark.createDataFrame(
        [(4.0, -1.0, 0.5), (0.0, 0.0, 0.0)], ["a", "b", "c"])
    shap = TabularSHAP(model=model, inputCols=["a", "b", "c"],
                       backgroundData=bg, targetCol="prediction",
                       numSamples=64, seed=1)
    rows = shap.transform(probe).orderBy("a").collect()
    for r in rows:
        base, pa, pb, pc = r.shapValues
        assert abs(base - (2.0 * 1 + 10.0 * 2 - 3.0 * 3)) < 1e-9
        assert abs(pa - 2.0 * (r.a - 1.0)) < 1e-6
        assert abs(pb - 10.0 * (r.b - 2.0)) < 1e-6
        assert abs(pc - (-3.0) * (r.c - 3.0)) < 1e-6


def test_tabular_shap_single_feature(points, linear_model, spark):
    """m=1: phi comes entirely from the efficiency constraint (the
    empty-coalition 0/0 crash fixed per ADVICE)."""
    single_model = Lambda(fn=lambda df: df.withColumn(
        "prediction", 3.0 * F.col("a") + 1.0))
    probe = spark.createDataFrame([(2.0, 0.0)], ["a", "b"])
    shap = TabularSHAP(model=single_model, inputCols=["a"],
                       backgroundData=points, targetCol="prediction",
                       numSamples=16, seed=3)
    out = shap.transform(probe).collect()[0]
    base, phi_a = out.shapValues
    mean_a = points.agg(F.avg("a")).collect()[0][0]
    assert abs(base - (3.0 * mean_a + 1.0)) < 1e-6
    assert abs(phi_a - 3.0 * (2.0 - mean_a)) < 1e-6


def test_text_lime_finds_signal_token(spark):
    """Model scores 1 when 'magic' appears; LIME must weight it top."""
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        F.when(F.col("text").contains("magic"), 1.0).otherwise(0.0)))
    from mmlspark_spark.explainers import TextLIME

    df = spark.createDataFrame(
        [("the quick magic fox jumps",)], ["text"])
    lime = TextLIME(model=model, textCol="text", targetCol="prediction",
                    numSamples=200, seed=4)
    row = lime.transform(df).collect()[0]
    weights = dict(zip(row.tokens, row.explanation))
    top = max(weights, key=weights.get)
    assert top == "magic"
    assert weights["magic"] > 0.3


def test_text_shap_efficiency(spark):
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        F.when(F.col("text").contains("magic"), 1.0).otherwise(0.0)))
    from mmlspark_spark.explainers import TextSHAP

    df = spark.createDataFrame([("alpha magic beta",)], ["text"])
    shap = TextSHAP(model=model, textCol="text", targetCol="prediction",
                    numSamples=64, seed=5)
    row = shap.transform(df).collect()[0]
    base, *phi = row.explanation
    # efficiency: base + sum(phi) == f(x) == 1.0
    assert abs(base + sum(phi) - 1.0) < 1e-6
    weights = dict(zip(row.tokens, phi))
    assert max(weights, key=weights.get) == "magic"


def test_superpixel_transformer(spark, tmp_path):
    import numpy as np

    from mmlspark_spark.explainers import SuperpixelTransformer
    from mmlspark_spark.sources import DecodeImage, read_binary_files
    from tests.test_sources import make_bmp

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    (tmp_path / "sp.bmp").write_bytes(make_bmp(arr))
    imgs = DecodeImage().transform(read_binary_files(spark, str(tmp_path)))
    out = SuperpixelTransformer(inputCol="image", outputCol="sp",
                                cellSize=8.0).transform(imgs)
    row = out.collect()[0]
    clusters = row.sp.clusters
    assert len(clusters) >= 2
    # every pixel appears exactly once across clusters
    seen = {(p.x, p.y) for c in clusters for p in c}
    assert len(seen) == 16 * 16


def test_image_lime_highlights_bright_region(spark, tmp_path):
    """Model = mean brightness; the bright quadrant's superpixels must
    get the largest LIME weights."""
    import numpy as np

    from mmlspark_spark.explainers import ImageLIME
    from mmlspark_spark.sources import DecodeImage, read_binary_files
    from mmlspark_spark.sources.image import image_to_array
    from tests.test_sources import make_bmp

    arr = np.zeros((16, 16, 3), dtype=np.uint8)
    arr[:8, :8] = 255  # bright top-left quadrant
    (tmp_path / "q.bmp").write_bytes(make_bmp(arr))
    imgs = DecodeImage().transform(read_binary_files(spark, str(tmp_path)))

    def brightness(df):
        from mmlspark_spark.sources.transforms import UnrollImage

        un = UnrollImage(inputCol="image", outputCol="__px",
                         normalize=True).transform(df)
        return un.withColumn(
            "prediction",
            F.aggregate("__px", F.lit(0.0), lambda a, v: a + v)
            / F.size("__px"))

    lime = ImageLIME(model=Lambda(fn=brightness), inputCol="image",
                     targetCol="prediction", numSamples=64,
                     cellSize=8.0, seed=6)
    row = lime.transform(imgs).collect()[0]
    assert len(row.explanation) >= 2
    assert max(row.explanation) > 0.01  # some superpixel carries signal


def test_tabular_lime_integer_feature_column(spark):
    """Continuous features declared from integer source columns must
    not crash the Arrow conversion (Gaussian draws are floats)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression
    from pyspark.ml import Pipeline

    from mmlspark_spark.explainers import TabularLIME

    rows = [(i, i % 50, float(2 * (i % 50)) + 1.0) for i in range(60)]
    df = spark.createDataFrame(rows, ["rid", "age", "y"])  # age: int
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=["age"], outputCol="features"),
        LinearRegression(featuresCol="features", labelCol="y")])
    model = pipe.fit(df)
    lime = TabularLIME(model=model, inputCols=["age"],
                       targetCol="prediction", numSamples=30, seed=1)
    out = lime.transform(df.limit(3)).collect()
    assert len(out) == 3
    # the single coefficient should be near the true slope 2.0
    assert abs(out[0].explanation[0] - 2.0) < 0.5


def test_sar_recommendations_array_sorted(spark):
    """recommendations[0] must be the top-ranked item regardless of
    collect_list's shuffle order."""
    from mmlspark_spark.recommendation import SAR

    ratings = [(u, i) for u in range(1, 6)
               for i in [10, 11, 12, 13] if (u + i) % 3]
    df = spark.createDataFrame(ratings, ["user", "item"])
    model = SAR(userCol="user", itemCol="item", supportThreshold=1).fit(df)
    out = model.transform(df.select("user").distinct())
    for r in out.collect():
        if r.recommendations:
            scores = [x.score for x in r.recommendations]
            assert scores == sorted(scores, reverse=True)
