"""KNN / ConditionalKNN (reference nn/KNNSuite test strategy: unit
vectors with hand-checked inner-product neighbors + conditioning)."""

import pytest
from pyspark.sql import functions as F

from mmlspark_spark.nn import KNN, ConditionalKNN


@pytest.fixture(scope="module")
def index_df(spark):
    rows = [
        ("a", [1.0, 0.0], "red"),
        ("b", [0.9, 0.1], "red"),
        ("c", [0.0, 1.0], "blue"),
        ("d", [0.1, 0.9], "blue"),
    ]
    return spark.createDataFrame(rows, ["values", "features", "labels"])


def test_knn_top2(index_df, spark):
    model = KNN(featuresCol="features", valuesCol="values",
                outputCol="nn", k=2).fit(index_df)
    q = spark.createDataFrame([([1.0, 0.05],)], ["features"])
    out = model.transform(q).collect()[0].nn
    assert [m.value for m in out] == ["a", "b"]
    assert out[0].distance >= out[1].distance
    # schema contract matches the physical result
    assert model.transform_schema(q.schema).fieldNames() == ["features", "nn"]


def test_conditional_knn_filters_labels(index_df, spark):
    model = ConditionalKNN(featuresCol="features", valuesCol="values",
                           labelCol="labels", conditionerCol="conditioner",
                           outputCol="nn", k=2).fit(index_df)
    # query near 'a' but only allowed to match blue items
    q = spark.createDataFrame([([1.0, 0.05], ["blue"])],
                              ["features", "conditioner"])
    out = model.transform(q).collect()[0].nn
    assert all(m.label == "blue" for m in out)
    assert [m.value for m in out] == ["b" if False else "d", "c"]  # d > c by MIP


def test_knn_over_embeddings_table(embeddings):
    df = embeddings.withColumn(
        "features", F.col("embedding").cast("array<double>")
    ).withColumn("values", F.col("vec_id").cast("string"))
    model = KNN(featuresCol="features", valuesCol="values",
                outputCol="nn", k=3).fit(df.limit(500))
    out = model.transform(df.limit(20)).select("vec_id", "nn").collect()
    assert len(out) == 20
    for r in out:
        assert len(r.nn) == 3
        # self is in the fit set → must be its own max-inner-product hit
        assert r.nn[0].value == str(r.vec_id)
