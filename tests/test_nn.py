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


def test_embedding_pca_recovers_planted_components(spark):
    """Data stretched along two known orthogonal axes: the fitted
    components must align with them (|cos| > 0.99), eigenvalues must
    descend, the projection must have shape k and center at ~0, and
    sign canonicalization must make fits deterministic."""
    import numpy as np

    from mmlspark_spark.llm.embeddings import EmbeddingPCA

    rng = np.random.default_rng(17)
    d = 6
    a = np.zeros(d); a[1] = 1.0                      # axis 1
    b = np.zeros(d); b[4] = 1.0                      # axis 4
    X = (rng.normal(size=(800, 1)) * 5.0 * a
         + rng.normal(size=(800, 1)) * 2.0 * b
         + rng.normal(0, 0.05, size=(800, d)) + 3.0)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>").repartition(4)

    model = EmbeddingPCA(inputCol="embedding", k=2).fit(df)
    c1, c2 = np.asarray(model.components)
    assert abs(np.dot(c1, a)) > 0.99
    assert abs(np.dot(c2, b)) > 0.99
    ev = model.explainedVariance
    assert ev[0] > ev[1] > 0
    assert abs(ev[0] - 25.0) < 2.0 and abs(ev[1] - 4.0) < 0.5
    # sign canonicalization: the dominant coordinate is positive
    assert c1[int(np.argmax(np.abs(c1)))] > 0

    out = model.transform(df).select("pca").collect()
    P = np.asarray([r.pca for r in out])
    assert P.shape == (800, 2)
    assert np.allclose(P.mean(axis=0), 0.0, atol=0.05)
    # projection variance equals the eigenvalues
    assert np.allclose(P.var(axis=0), ev, rtol=0.05)

    again = EmbeddingPCA(inputCol="embedding", k=2).fit(df)
    assert np.allclose(model.components, again.components)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="empty"):
        EmbeddingPCA(inputCol="embedding", k=2).fit(df.limit(0))


def test_embedding_pca_null_rows(spark):
    """NULL embeddings are excluded from the fit moments and project
    to NULL (the multimodal null contract) instead of poisoning the
    batch ndarray conversion."""
    import numpy as np

    from mmlspark_spark.llm.embeddings import EmbeddingPCA

    rng = np.random.default_rng(3)
    rows = [(i, [float(v) for v in rng.normal(size=4)])
            for i in range(50)] + [(50, None), (51, None)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    model = EmbeddingPCA(inputCol="embedding", k=2).fit(df)
    out = {r.vec_id: r.pca for r in model.transform(df).collect()}
    assert out[50] is None and out[51] is None
    assert len(out[0]) == 2
    clean = EmbeddingPCA(inputCol="embedding", k=2).fit(
        df.filter("embedding is not null"))
    assert np.allclose(model.components, clean.components)


def test_bruteforce_methods_agree_on_ties_and_zero_norms(spark):
    """The two 'exact' methods must return the SAME result set: tied
    similarities break to the lower neighbor id in both, and a
    zero-norm vector scores 0.0 in both (not NULL-excluded)."""
    from mmlspark_spark.llm import BruteForceKNN

    rows = [
        (7, [1.0, 0.0]), (3, [1.0, 0.0]),   # tie: ids 7 and 3 identical
        (5, [0.0, 1.0]),
        (9, [0.0, 0.0]),                    # zero-norm corpus vector
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = spark.createDataFrame([(100, [1.0, 0.0])], ["vec_id", "embedding"])
    res = {}
    for m in ("expr", "numpy"):
        knn = BruteForceKNN(k=1, method=m, excludeSelf=False)
        res[m] = [(r.neighbor_id, round(r.sim, 9))
                  for r in knn.search(df, q).collect()]
    assert res["expr"] == res["numpy"]
    assert res["expr"][0][0] == 3  # tie broken to the LOWER id
    # zero vector present: full k=4 search returns it with sim 0.0 in both
    for m in ("expr", "numpy"):
        knn = BruteForceKNN(k=4, method=m, excludeSelf=False)
        sims = {r.neighbor_id: r.sim for r in knn.search(df, q).collect()}
        assert sims[9] == pytest.approx(0.0)


def test_bruteforce_numpy_string_ids(spark):
    """The numpy method must preserve non-long id types instead of
    crashing on int() casts or a hardcoded long schema."""
    from mmlspark_spark.llm import BruteForceKNN

    df = spark.createDataFrame(
        [("doc_a", [1.0, 0.0]), ("doc_b", [0.0, 1.0])],
        ["vec_id", "embedding"])
    q = spark.createDataFrame([("q1", [1.0, 0.1])], ["vec_id", "embedding"])
    out = BruteForceKNN(k=1, method="numpy", excludeSelf=False).search(df, q)
    rows = out.collect()
    assert rows[0].query_id == "q1" and rows[0].neighbor_id == "doc_a"
