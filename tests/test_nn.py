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


def test_pq_adc_exact_when_quantization_error_zero(spark):
    """When every corpus vector is a concatenation of codebook
    centroids, PQ loses nothing: the ADC distance must equal the true
    squared L2 distance to full precision, and encode() must recover
    the exact codeword ids used to build each vector."""
    import numpy as np

    from mmlspark_spark.llm.similarity import PQKNN

    M, K, ds = 4, 8, 3
    rng = np.random.default_rng(17)
    books = rng.normal(size=(M, K, ds))
    cb_rows = [(m, c, [float(x) for x in books[m, c]])
               for m in range(M) for c in range(K)]
    cb = spark.createDataFrame(cb_rows, "m int, code int, cvec array<double>")

    picks = rng.integers(0, K, size=(20, M))
    corpus = [(i, [float(x) for m in range(M)
                   for x in books[m, picks[i, m]]]) for i in range(20)]
    queries = [(100 + j, [float(x) for x in rng.normal(size=M * ds)])
               for j in range(3)]
    data = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(queries, "vec_id long, embedding array<double>")

    pq = PQKNN(idCol="vec_id", vecCol="embedding", k=20, M=M, K=K,
               dim=M * ds, excludeSelf=False)
    codes = {r.vec_id: r.codes
             for r in pq.encode_with_codebooks(data, cb).collect()}
    assert all(codes[i] == [int(c) for c in picks[i]] for i in range(20))

    out = pq.search_with_codebooks(data, qdf, cb).collect()
    xs = {i: np.array(v) for i, v in corpus}
    qs = {i: np.array(v) for i, v in queries}
    for r in out:
        true = float(np.sum((qs[r.query_id] - xs[r.neighbor_id]) ** 2))
        assert abs(r.adc_dist - true) < 1e-9


def test_pq_sampled_fit_recall_vs_bruteforce(spark):
    """The rows-only sampled-fit lane: on clustered data, PQ top-10
    must recover most of the exact top-10 (squared-L2 brute force
    recomputed in numpy)."""
    import numpy as np

    from mmlspark_spark.llm.similarity import PQKNN

    rng = np.random.default_rng(23)
    centers = rng.normal(scale=5.0, size=(8, 16))
    x = np.concatenate([c + rng.normal(scale=0.4, size=(40, 16))
                       for c in centers])
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    q_ids = [0, 45, 170, 300]
    pq = PQKNN(idCol="vec_id", vecCol="embedding", k=10, M=4, K=16,
               dim=16, seed=5, sampleSize=400)
    out = pq.search(data, data.filter(F.col("vec_id").isin(q_ids)))
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    # PQ is a COARSE filter: within-cluster fine structure is below
    # the quantizer's resolution (all 40 cluster members share nearly
    # the same codes), so the meaningful contract is cluster-level —
    # every retrieved neighbor must come from the query's cluster —
    # plus a loose exact-top-10 floor.
    recalls = []
    for qi in q_ids:
        assert all(n // 40 == qi // 40 for n in got[qi]), (qi, got[qi])
        d2 = np.sum((x - x[qi]) ** 2, axis=1)
        d2[qi] = np.inf
        exact = set(np.argsort(d2, kind="stable")[:10].tolist())
        recalls.append(len(got[qi] & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_ivfpq_exact_when_residual_error_zero(spark):
    """IVFADC correctness pin: when every corpus vector is its cell
    centroid plus an exact concatenation of codebook words, the
    residual quantizes losslessly, so for neighbors in a probed cell
    the ADC distance equals the TRUE squared L2 to full precision."""
    import numpy as np

    from mmlspark_spark.llm.similarity import PQKNN

    M, K, ds = 4, 8, 3
    rng = np.random.default_rng(29)
    books = rng.normal(size=(M, K, ds))
    cents = np.stack([np.full(M * ds, 40.0), np.full(M * ds, -40.0)])
    cb = spark.createDataFrame(
        [(m, c, [float(x) for x in books[m, c]])
         for m in range(M) for c in range(K)],
        "m int, code int, cvec array<double>")
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in cents[i]]) for i in range(2)],
        "cell int, cvec array<double>")

    picks = rng.integers(0, K, size=(20, M))
    corpus = [(i, [float(cents[i % 2][j * ds + e] + books[j, picks[i, j], e])
                   for j in range(M) for e in range(ds)])
              for i in range(20)]
    data = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(100, [float(x) for x in cents[0] + rng.normal(size=M * ds)])],
        "vec_id long, embedding array<double>")

    pq = PQKNN(idCol="vec_id", vecCol="embedding", k=20, M=M, K=K,
               dim=M * ds, excludeSelf=False)
    out = pq.search_ivfpq(data, queries, cdf, cb, nProbe=1).collect()
    xs = {i: np.array(v) for i, v in corpus}
    qv = np.array(queries.collect()[0].embedding)
    assert out  # the probed cell (cell 0) holds the even-id vectors
    for r in out:
        assert r.neighbor_id % 2 == 0          # only cell-0 members
        true = float(np.sum((qv - xs[r.neighbor_id]) ** 2))
        assert abs(r.adc_dist - true) < 1e-8


def test_pq_rejects_indivisible_dim(spark):
    """dim % M != 0 must raise, not silently truncate the trailing
    dimensions out of every distance."""
    import pytest as _pytest

    from mmlspark_spark.llm.similarity import PQKNN

    df = spark.createDataFrame(
        [(0, [1.0] * 65)], "vec_id long, embedding array<double>")
    cb = spark.createDataFrame(
        [(0, 0, [0.0] * 8)], "m int, code int, cvec array<double>")
    with _pytest.raises(ValueError, match="divisible"):
        PQKNN(M=8).encode_with_codebooks(df, cb)


def test_sq8_exact_when_vectors_on_grid(spark):
    """When every coordinate sits exactly on one of the 256 uniform
    levels (integers in [0, 255] with both edges present per dim),
    reconstruction is lossless and the SQ distance must equal the
    true squared L2 to full precision; codes must equal the grid
    coordinates."""
    import numpy as np

    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    rng = np.random.default_rng(31)
    dim, n = 6, 30
    x = rng.integers(0, 256, size=(n, dim)).astype(np.float64)
    x[0], x[1] = 0.0, 255.0  # pin lo=0, hi=255 on every dim
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    q = data.filter(F.col("vec_id") < 3)

    sq = ScalarQuantizerKNN(idCol="vec_id", vecCol="embedding", k=n,
                            bits=8, excludeSelf=False)
    bounds = sq.fit_bounds(data)
    codes = {r.vec_id: r.codes
             for r in sq.encode_with_bounds(data, bounds).collect()}
    assert all(codes[i] == [int(v) for v in x[i]] for i in range(n))

    for r in sq.search_with_bounds(data, q, bounds).collect():
        true = float(np.sum((x[r.query_id] - x[r.neighbor_id]) ** 2))
        assert abs(r.sq_dist - true) < 1e-9


def test_sq8_recall_vs_bruteforce(spark):
    """8-bit uniform quantization error is far below typical
    inter-point distances: top-10 must recover almost all of the
    exact squared-L2 top-10."""
    import numpy as np

    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    rng = np.random.default_rng(7)
    x = rng.normal(size=(400, 16))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    q_ids = [0, 101, 250, 399]
    out = ScalarQuantizerKNN(idCol="vec_id", vecCol="embedding",
                             k=10).search(
        data, data.filter(F.col("vec_id").isin(q_ids)))
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = []
    for qi in q_ids:
        d2 = np.sum((x - x[qi]) ** 2, axis=1)
        d2[qi] = np.inf
        exact = set(np.argsort(d2, kind="stable")[:10].tolist())
        recalls.append(len(got[qi] & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_sq8_constant_dims_and_out_of_bounds_clamp(spark):
    """A constant dimension (hi = lo) must encode to 0 and
    reconstruct to exactly lo (no 0/0 NaN); bring-your-own-bounds
    values outside [lo, hi] must clamp to the edge codes 0/255."""
    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    data = spark.createDataFrame(
        [(0, [5.0, 0.0]), (1, [5.0, 10.0])],
        "vec_id long, embedding array<double>")
    sq = ScalarQuantizerKNN(idCol="vec_id", vecCol="embedding", k=2,
                            excludeSelf=False)
    bounds = sq.fit_bounds(data)
    codes = {r.vec_id: r.codes
             for r in sq.encode_with_bounds(data, bounds).collect()}
    assert codes[0] == [0, 0] and codes[1] == [0, 255]

    # out-of-bounds vectors under the same bounds clamp to the edges
    oob = spark.createDataFrame(
        [(2, [-99.0, -1.0]), (3, [99.0, 11.0])],
        "vec_id long, embedding array<double>")
    oc = {r.vec_id: r.codes
          for r in sq.encode_with_bounds(oob, bounds).collect()}
    assert oc[2] == [0, 0] and oc[3] == [0, 255]

    # search across the constant dim stays finite and exact
    rows = sq.search_with_bounds(data, data, bounds).collect()
    import math
    assert all(math.isfinite(r.sq_dist) for r in rows)


def test_sq_rejects_bad_bits():
    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    import pytest as _pytest
    with _pytest.raises(ValueError, match="bits"):
        ScalarQuantizerKNN(bits=0)
    with _pytest.raises(ValueError, match="bits"):
        ScalarQuantizerKNN(bits=17)


def test_sq_binary_quantization_bits1(spark):
    """bits=1 degenerates to sign-style binary quantization: one code
    per dimension (0 → lo, 1 → hi), the coarsest point of the same
    lane — must still rank an obvious nearest neighbor first."""
    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    data = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.1, 0.2]), (2, [10.0, 9.0])],
        "vec_id long, embedding array<double>")
    sq = ScalarQuantizerKNN(idCol="vec_id", vecCol="embedding", k=2,
                            bits=1, excludeSelf=True)
    bounds = sq.fit_bounds(data)
    codes = {r.vec_id: r.codes
             for r in sq.encode_with_bounds(data, bounds).collect()}
    assert codes[0] == [0, 0] and codes[1] == [0, 0] and codes[2] == [1, 1]
    out = sq.search_with_bounds(
        data, data.filter(F.col("vec_id") == 0), bounds).collect()
    # neighbor 1 shares the all-lo cell → distance 0 beats neighbor 2
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2]


def test_matryoshka_full_prefix_equals_bruteforce(spark):
    """With dPrime = d and candidates >= corpus size the two-stage
    search degenerates to exact brute force — results must match the
    BruteForceKNN expr lane row for row."""
    import numpy as np

    from mmlspark_spark.llm import BruteForceKNN
    from mmlspark_spark.llm.similarity import truncated_rerank_search

    rng = np.random.default_rng(11)
    x = rng.normal(size=(40, 8))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    q = data.filter(F.col("vec_id") < 4)
    two = truncated_rerank_search(data, q, dPrime=8, k=5,
                                  candidates=40).collect()
    bf = BruteForceKNN(idCol="vec_id", vecCol="embedding", k=5,
                       method="expr").search(data, q).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted([(r.query_id, r.rank, r.neighbor_id) for r in two]) \
        == sorted([(r.query_id, r.rank, r.neighbor_id) for r in bf])
    sims = {(r.query_id, r.neighbor_id): r.sim for r in bf}
    assert all(abs(r.sim - sims[(r.query_id, r.neighbor_id)]) < 1e-12
               for r in two)


def test_matryoshka_prefix_recall_on_frontloaded_vectors(spark):
    """When the leading dimensions dominate the geometry (the MRL /
    PCA-rotated regime this operator targets), a quarter-length
    prefix with a modest candidate budget must recover most of the
    exact top-10."""
    import numpy as np

    from mmlspark_spark.llm.similarity import truncated_rerank_search

    rng = np.random.default_rng(13)
    x = rng.normal(size=(300, 32))
    x[:, :8] *= 10.0  # front-load the variance
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    q_ids = [0, 150, 299]
    out = truncated_rerank_search(
        data, data.filter(F.col("vec_id").isin(q_ids)), dPrime=8,
        k=10, candidates=40)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    recalls = []
    for qi in q_ids:
        sims = xn @ xn[qi]
        sims[qi] = -np.inf
        exact = set(np.argsort(-sims, kind="stable")[:10].tolist())
        recalls.append(len(got[qi] & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_matryoshka_rejects_bad_budgets(spark):
    from mmlspark_spark.llm.similarity import truncated_rerank_search

    import pytest as _pytest
    df = spark.createDataFrame([(0, [1.0, 2.0])],
                               "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="candidates"):
        truncated_rerank_search(df, df, dPrime=1, k=10, candidates=5)
    with _pytest.raises(ValueError, match="dPrime"):
        truncated_rerank_search(df, df, dPrime=0, k=1, candidates=1)


def test_sq8_reconstruction_error_bound(spark):
    """The uniform-quantization guarantee: for every value inside the
    fitted bounds, |x − decode(encode(x))| ≤ Δ/2 per dimension, with
    Δ = (hi − lo)/255 — the bound that makes SQ8's distance error
    predictable at any scale."""
    import numpy as np

    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    rng = np.random.default_rng(41)
    x = rng.uniform(-3.0, 7.0, size=(200, 12))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    sq = ScalarQuantizerKNN(idCol="vec_id", vecCol="embedding")
    bounds = sq.fit_bounds(data)
    recon = {r.vec_id: np.array(r.recon) for r in sq.decode_with_bounds(
        sq.encode_with_bounds(data, bounds), bounds).collect()}
    brow = bounds.first()
    delta = (np.array(brow.hi) - np.array(brow.lo)) / 255.0
    for i in range(len(x)):
        assert np.all(np.abs(x[i] - recon[i]) <= delta / 2 + 1e-12), i


def test_maxqueries_guard_fails_fast_on_every_broadcast_lane(spark):
    """Every ANN search lane broadcasts (or driver-collects) the query
    frame — an oversized one must raise BEFORE materialization, with
    the operator's name in the message (the nn/knn fail-fast pattern).
    maxQueries=None disables the guard deliberately."""
    from mmlspark_spark.llm.similarity import (
        IVFKNN,
        LSHKNN,
        PQKNN,
        BruteForceKNN,
        ScalarQuantizerKNN,
        truncated_rerank_search,
    )

    data = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 0.5, 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>")
    big = data  # 20 rows, maxQueries=4 below → over budget

    with pytest.raises(ValueError, match="BruteForceKNN.*maxQueries"):
        BruteForceKNN(k=2, maxQueries=4).search(data, big)
    with pytest.raises(ValueError, match="BruteForceKNN.*maxQueries"):
        BruteForceKNN(k=2, method="numpy", maxQueries=4).search(data, big)
    with pytest.raises(ValueError, match="LSHKNN.*maxQueries"):
        LSHKNN(k=2, numPlanes=4, bands=2, maxQueries=4).search(data, big)
    with pytest.raises(ValueError, match="IVFKNN.*maxQueries"):
        IVFKNN(k=2, nlist=2, nProbe=1, maxQueries=4).search(data, big)
    ivf = IVFKNN(k=2, nlist=2, nProbe=1, maxQueries=4)
    cent = ivf.fit_centroids_df(data)
    with pytest.raises(ValueError, match="search_with_centroids.*maxQueries"):
        ivf.search_with_centroids(data, big, cent)
    sq = ScalarQuantizerKNN(k=2, maxQueries=4)
    with pytest.raises(ValueError, match="ScalarQuantizerKNN.*maxQueries"):
        sq.search_with_bounds(data, big, sq.fit_bounds(data))
    pq = PQKNN(k=2, M=2, K=2, dim=4, maxQueries=4)
    cb = pq.fit_codebooks(data)
    with pytest.raises(ValueError, match="PQKNN.*maxQueries"):
        pq.search_with_codebooks(data, big, cb)
    cents = data.limit(2).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.col("embedding").alias("cvec"))
    with pytest.raises(ValueError, match="search_ivfpq.*maxQueries"):
        pq.search_ivfpq(data, big, cents, cb, nProbe=1)
    with pytest.raises(ValueError, match="truncated_rerank_search.*maxQueries"):
        truncated_rerank_search(data, big, dPrime=2, k=2, candidates=2,
                                maxQueries=4)

    # disabled guard: the small frame sails through
    assert BruteForceKNN(k=2, maxQueries=None).search(
        data, data.limit(2)).count() > 0
    # under-budget query frames pass every guarded lane
    assert BruteForceKNN(k=2, maxQueries=4).search(
        data, data.limit(3)).count() > 0


def test_sq_fit_bounds_wide_dim_lanes_agree_d1024(spark):
    """fit_bounds above wideDim switches from 2·d agg expressions
    (codegen-hostile at d≥1024) to posexplode→groupBy(pos). Both lanes
    are exact min/max, so they must agree BIT-FOR-BIT; pinned at
    d=1024 against numpy (exact — min/max has no summation-order
    drift) and lane-vs-lane at d=300."""
    import numpy as np

    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    rng = np.random.default_rng(7)
    d = 1024
    x = rng.normal(size=(40, d))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    wide = ScalarQuantizerKNN(wideDim=16).fit_bounds(data).first()
    assert list(wide.lo) == [float(v) for v in x.min(axis=0)]
    assert list(wide.hi) == [float(v) for v in x.max(axis=0)]

    d2 = 300
    data2 = spark.createDataFrame(
        [(i, [float(v) for v in x[i][:d2]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    narrow = ScalarQuantizerKNN(wideDim=4096).fit_bounds(data2).first()
    wide2 = ScalarQuantizerKNN(wideDim=16).fit_bounds(data2).first()
    assert list(narrow.lo) == list(wide2.lo)
    assert list(narrow.hi) == list(wide2.hi)

    # end-to-end: searches under either fit lane are identical
    sq_n = ScalarQuantizerKNN(k=3, wideDim=4096)
    sq_w = ScalarQuantizerKNN(k=3, wideDim=16)
    q = data2.filter("vec_id < 3")
    rn = sorted(map(tuple, sq_n.search(data2, q).collect()))
    rw = sorted(map(tuple, sq_w.search(data2, q).collect()))
    assert rn == rw


def test_pq_wide_m_lanes_agree_d1024(spark):
    """PQ encode above wideM switches from M unrolled argmin
    aggregates to the numpy Arrow lane. With well-separated codebooks
    (planted grid centers, noise ≪ separation) the argmin is
    unambiguous, so codes — and the downstream ADC top-k — must be
    identical across lanes at d=1024, M=128."""
    import numpy as np

    from mmlspark_spark.llm.similarity import PQKNN

    rng = np.random.default_rng(11)
    d, M, K = 1024, 128, 4
    ds = d // M
    # codebooks: per subspace, K centers on a coarse grid (spacing 10)
    centers = rng.integers(0, 4, size=(M, K, ds)) * 10.0
    cb_rows = [(m, c, [float(v) for v in centers[m, c]])
               for m in range(M) for c in range(K)]
    cbooks = spark.createDataFrame(
        cb_rows, "m int, code int, cvec array<double>")
    # data: a random center per subspace + tiny noise
    n = 50
    pick = rng.integers(0, K, size=(n, M))
    X = np.concatenate(
        [centers[m, pick[:, m]] + rng.normal(scale=0.01, size=(n, ds))
         for m in range(M)], axis=1)
    data = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")

    pq_expr = PQKNN(M=M, K=K, dim=d, k=3, wideM=10**9)
    pq_np = PQKNN(M=M, K=K, dim=d, k=3, wideM=0)
    codes_expr = {r.vec_id: list(r.codes) for r in
                  pq_expr.encode_with_codebooks(data, cbooks).collect()}
    codes_np = {r.vec_id: list(r.codes) for r in
                pq_np.encode_with_codebooks(data, cbooks).collect()}
    assert codes_expr == codes_np
    # codes must be the planted picks exactly
    assert codes_np == {i: [int(c) for c in pick[i]] for i in range(n)}

    q = data.filter("vec_id < 2")
    re_ = sorted(map(tuple, pq_expr.search_with_codebooks(
        data, q, cbooks).collect()))
    rn_ = sorted(map(tuple, pq_np.search_with_codebooks(
        data, q, cbooks).collect()))
    assert re_ == rn_


def test_matryoshka_sq8_coarse_recall_vs_float_lane(spark):
    """coarse='sq8' reconstructs the corpus prefix from uint8 codes;
    with a generous candidate budget its final top-k must match the
    float coarse lane (the rerank is exact in both — only candidate
    MEMBERSHIP can differ, and Δ/2-bounded reconstruction error cannot
    evict true neighbors from a 5× candidate margin on separated
    data). Also pins recall@k ≥ 0.9 under a tight budget."""
    import numpy as np

    from mmlspark_spark.llm.similarity import truncated_rerank_search

    rng = np.random.default_rng(23)
    d, n = 32, 300
    # front-loaded vectors: prefix carries most of the signal (the MRL
    # premise), so the coarse stage is meaningful
    x = np.concatenate([rng.normal(size=(n, 8)) * 3.0,
                        rng.normal(size=(n, d - 8)) * 0.3], axis=1)
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    q = data.filter("vec_id < 5")

    fl = truncated_rerank_search(data, q, dPrime=8, k=10, candidates=50)
    sq = truncated_rerank_search(data, q, dPrime=8, k=10, candidates=50,
                                 coarse="sq8")
    fl_rows = sorted(map(tuple, fl.collect()))
    sq_rows = sorted(map(tuple, sq.collect()))
    assert fl_rows == sq_rows

    # tight budget: candidate membership may drift, recall stays high
    sq_tight = truncated_rerank_search(data, q, dPrime=8, k=10,
                                       candidates=12, coarse="sq8")
    got = {(r.query_id, r.neighbor_id) for r in sq_tight.collect()}
    want = {(r[0], r[1]) for r in fl_rows}
    assert len(got & want) / len(want) >= 0.9

    import pytest as _pytest
    with _pytest.raises(ValueError, match="coarse"):
        truncated_rerank_search(data, q, dPrime=8, k=2, candidates=5,
                                coarse="pq")


def test_ann_index_persistence_roundtrips(spark, tmp_path):
    """The full ANN family now has the BM25-style index lifecycle:
    save_index → load_index → search_with_index must return EXACTLY
    what the in-memory lane returns on the source corpus (encode /
    assignment are deterministic), the stored artifacts must be the
    compressed/clustered layouts (SQ codes are ints, IVF corpus is
    cell-partitioned), and geometry mismatches must refuse to load."""
    import numpy as np

    from mmlspark_spark.llm.similarity import (
        IVFKNN,
        PQKNN,
        ScalarQuantizerKNN,
    )

    rng = np.random.default_rng(31)
    x = rng.normal(size=(120, 16))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    q = data.filter("vec_id < 4")

    # ---- SQ ----
    sq = ScalarQuantizerKNN(k=5)
    p = str(tmp_path / "sq_idx")
    sq.save_index(data, p)
    direct = sorted(map(tuple, sq.search(data, q).collect()))
    via = sorted(map(tuple, sq.search_with_index(
        sq.load_index(spark, p), q).collect()))
    assert direct == via and len(direct) == 4 * 5
    codes_schema = spark.read.parquet(f"{p}/codes").schema["codes"]
    assert codes_schema.dataType.simpleString() == "array<int>"
    with pytest.raises(ValueError, match="bits"):
        ScalarQuantizerKNN(k=5, bits=4).load_index(spark, p)

    # ---- PQ ----
    pq = PQKNN(k=5, M=4, K=8, dim=16)
    cb = pq.fit_codebooks(data)
    p2 = str(tmp_path / "pq_idx")
    pq.save_index(data, cb, p2)
    direct = sorted(map(tuple, pq.search_with_codebooks(
        data, q, cb).collect()))
    via = sorted(map(tuple, pq.search_with_index(
        pq.load_index(spark, p2), q).collect()))
    assert direct == via and len(direct) == 4 * 5
    with pytest.raises(ValueError, match="M="):
        PQKNN(k=5, M=8, dim=16).load_index(spark, p2)

    # ---- IVF ----
    ivf = IVFKNN(k=5, nlist=6, nProbe=2)
    cent = ivf.fit_centroids_df(data)
    p3 = str(tmp_path / "ivf_idx")
    ivf.save_index(data, cent, p3)
    direct = sorted(map(tuple, ivf.search_with_centroids(
        data, q, cent).collect()))
    via = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p3), q).collect()))
    assert direct == via and len(direct) > 0
    # the stored corpus is cell-partitioned (the probe-time partition-
    # pruning layout)
    import os
    dirs = [d for d in os.listdir(f"{p3}/assigned")
            if d.startswith("__cell=")]
    assert len(dirs) >= 2


def test_ivf_append_to_index_matches_fresh_union(spark, tmp_path):
    """append_to_index assigns only the NEW vectors against the
    stored centroids and appends their cell directories; searching
    the grown index must equal searching a fresh index built over the
    unioned corpus (the quantizer is fixed at save time, so
    assignment is identical either way)."""
    import numpy as np

    from mmlspark_spark.llm.similarity import IVFKNN

    rng = np.random.default_rng(37)
    x = rng.normal(size=(150, 12))
    base = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(100)],
        "vec_id long, embedding array<double>")
    extra = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(100, 150)],
        "vec_id long, embedding array<double>")
    q = base.filter("vec_id < 4")

    ivf = IVFKNN(k=5, nlist=6, nProbe=3)
    cent = ivf.fit_centroids_df(base)
    p = str(tmp_path / "ivf_grow")
    ivf.save_index(base, cent, p)
    ivf.append_to_index(extra, p)
    grown = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p), q).collect()))

    fresh = sorted(map(tuple, ivf.search_with_centroids(
        base.unionByName(extra), q, cent).collect()))
    assert grown == fresh and len(grown) == 4 * 5


def test_ivfpq_composed_index_roundtrip_and_append(spark, tmp_path):
    """The COMPOSED IVFADC artifact (centroids + residual codebooks +
    cell-partitioned codes in one manifest-pinned layout):
    save_ivfpq_index → load_ivfpq_index → search_ivfpq_with_index must
    equal the in-memory search_ivfpq exactly; append_to_ivfpq_index
    must equal a fresh index over the unioned corpus (both quantizers
    fixed at save time); geometry mismatches must refuse to load."""
    import os

    import numpy as np

    from mmlspark_spark.llm.similarity import IVFKNN, PQKNN

    rng = np.random.default_rng(41)
    x = rng.normal(size=(150, 16))
    base = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(100)],
        "vec_id long, embedding array<double>")
    extra = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(100, 150)],
        "vec_id long, embedding array<double>")
    q = base.filter("vec_id < 4")

    pq = PQKNN(k=5, M=4, K=8)
    cent = IVFKNN(nlist=6).fit_centroids_df(base)
    cb = pq.fit_codebooks(base)
    p = str(tmp_path / "ivfpq_idx")
    pq.save_ivfpq_index(base, cent, cb, p)

    direct = sorted(map(tuple, pq.search_ivfpq(
        base, q, cent, cb, nProbe=3).collect()))
    idx = pq.load_ivfpq_index(spark, p)
    via = sorted(map(tuple, pq.search_ivfpq_with_index(
        idx, q, nProbe=3).collect()))
    assert direct == via and len(direct) == 4 * 5

    # stored layout: cell directories (probe-time partition pruning)
    # and M-int code rows — never the float corpus
    dirs = [d for d in os.listdir(f"{p}/codes")
            if d.startswith("__cell=")]
    assert len(dirs) >= 2
    codes_schema = spark.read.parquet(f"{p}/codes").schema["__codes"]
    assert codes_schema.dataType.simpleString() == "array<int>"

    # append: grown artifact == fresh index over the union
    pq.append_to_ivfpq_index(extra, p)
    grown = sorted(map(tuple, pq.search_ivfpq_with_index(
        pq.load_ivfpq_index(spark, p), q, nProbe=3).collect()))
    fresh = sorted(map(tuple, pq.search_ivfpq(
        base.unionByName(extra), q, cent, cb, nProbe=3).collect()))
    assert grown == fresh and len(grown) == 4 * 5

    # geometry guards
    with pytest.raises(ValueError, match="M="):
        PQKNN(k=5, M=8).load_ivfpq_index(spark, p)
    with pytest.raises(ValueError, match="dim"):
        PQKNN(k=5, M=4, dim=32).load_ivfpq_index(spark, p)
    short_q = q.select("vec_id",
                       F.slice("embedding", 1, 8).alias("embedding"))
    with pytest.raises(ValueError, match="dim"):
        pq.search_ivfpq_with_index(idx, short_q, nProbe=3)


def test_filtered_index_search_equals_filtered_corpus(spark, tmp_path):
    """Filtered ANN over STORED indexes: `where=` on
    IVFKNN.search_with_index / PQKNN.search_ivfpq_with_index must
    equal a fresh search over the pre-filtered corpus — per-vector
    assignment/encoding makes the two paths identical, which is the
    property that lets a takedown/license predicate prune the stored
    cell directories instead of forcing an index rebuild."""
    import numpy as np

    from mmlspark_spark.llm.similarity import IVFKNN, PQKNN

    rng = np.random.default_rng(43)
    x = rng.normal(size=(140, 16))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    q = data.filter("vec_id < 4")
    pred = F.col("d_id") >= 40

    ivf = IVFKNN(k=5, nlist=6, nProbe=3)
    cent = ivf.fit_centroids_df(data)
    p = str(tmp_path / "ivf_filt")
    ivf.save_index(data, cent, p)
    via = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p), q, where=pred).collect()))
    fresh = sorted(map(tuple, ivf.search_with_centroids(
        data.filter("vec_id >= 40"), q, cent).collect()))
    assert via == fresh and len(via) == 4 * 5
    assert all(t[1] >= 40 for t in via)  # predicate actually applied

    pq = PQKNN(k=5, M=4, K=8)
    cb = pq.fit_codebooks(data)
    p2 = str(tmp_path / "ivfpq_filt")
    pq.save_ivfpq_index(data, cent, cb, p2)
    via2 = sorted(map(tuple, pq.search_ivfpq_with_index(
        pq.load_ivfpq_index(spark, p2), q, nProbe=3,
        where=pred).collect()))
    fresh2 = sorted(map(tuple, pq.search_ivfpq(
        data.filter("vec_id >= 40"), q, cent, cb,
        nProbe=3).collect()))
    assert via2 == fresh2 and len(via2) == 4 * 5
    assert all(t[1] >= 40 for t in via2)


def test_chunked_query_lane_matches_single_shot(spark):
    """The batch-scoring lane: chunkQueries hash-splits an oversized
    query frame into bounded chunks and unions per-chunk top-k —
    results must equal the single-shot search exactly (per-query
    independence), the maxQueries guard must still trip when chunking
    is off, and each chunk must itself pass the guard."""
    import numpy as np

    from mmlspark_spark.llm.similarity import (
        BruteForceKNN,
        ScalarQuantizerKNN,
    )

    rng = np.random.default_rng(47)
    x = rng.normal(size=(80, 8))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    q = data.filter("vec_id < 25")

    # guard trips unchunked
    with pytest.raises(ValueError, match="maxQueries"):
        BruteForceKNN(k=3, maxQueries=10).search(data, q).collect()

    # chunked == unguarded single shot (expr lane)
    want = sorted(map(tuple, BruteForceKNN(
        k=3, maxQueries=None).search(data, q).collect()))
    got = sorted(map(tuple, BruteForceKNN(
        k=3, maxQueries=20, chunkQueries=8).search(data, q).collect()))
    assert got == want and len(got) == 25 * 3

    # numpy lane too (the driver-collect path the guard exists for)
    got_np = sorted(map(tuple, BruteForceKNN(
        k=3, maxQueries=20, chunkQueries=8,
        method="numpy").search(data, q).collect()))
    assert [(a, b) for a, b, *_ in got_np] == [(a, b) for a, b, *_ in want]

    # SQ lanes: on-the-fly and stored-codes
    sq_want = sorted(map(tuple, ScalarQuantizerKNN(
        k=3, maxQueries=None).search(data, q).collect()))
    sq = ScalarQuantizerKNN(k=3, maxQueries=20, chunkQueries=8)
    bounds = sq.fit_bounds(data)
    sq_got = sorted(map(tuple, sq.search_with_bounds(
        data, q, bounds).collect()))
    assert sq_got == sq_want and len(sq_got) == 25 * 3
    codes = sq.encode_with_bounds(data, bounds)
    sq2 = ScalarQuantizerKNN(k=3, dim=8, maxQueries=20, chunkQueries=8)
    sq_codes = sorted(map(tuple, sq2.search_with_codes(
        codes, bounds, q).collect()))
    assert sq_codes == sq_want


def test_ann_tombstones_delete_and_compact(spark, tmp_path):
    """The delete half of the append-only index story: tombstoned ids
    never surface from search_with_index (read-time mask, the code
    store untouched), masked results equal a fresh index over the
    corpus minus the deletes, compaction rewrites ONLY the affected
    cell directories and changes no results, and a cleared tombstone
    set makes deletes physical."""
    import os

    import numpy as np

    from mmlspark_spark.llm.similarity import (
        IVFKNN,
        PQKNN,
        ScalarQuantizerKNN,
    )

    rng = np.random.default_rng(53)
    x = rng.normal(size=(140, 16))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    q = data.filter("vec_id < 4")
    surviving = data.filter("vec_id < 60 or vec_id >= 80")
    dead = spark.range(60, 80).select(F.col("id").alias("vec_id"))

    # ---- IVF: mask, equivalence, cell-scoped compaction ----
    ivf = IVFKNN(k=5, nlist=6, nProbe=6)  # probe all cells: every
    cent = ivf.fit_centroids_df(data)     # deleted id is reachable
    p = str(tmp_path / "ivf_del")
    ivf.save_index(data, cent, p)
    ivf.delete_from_index(dead, p)
    idx = ivf.load_index(spark, p)
    masked = sorted(map(tuple, ivf.search_with_index(idx, q).collect()))
    assert not any(60 <= t[1] < 80 for t in masked)
    fresh = sorted(map(tuple, ivf.search_with_centroids(
        surviving, q, cent).collect()))
    assert masked == fresh and len(masked) == 4 * 5

    # compaction touches only cells holding deleted ids
    assigned = spark.read.parquet(f"{p}/assigned")
    dead_cells = {r[0] for r in assigned
                  .filter("d_id >= 60 and d_id < 80")
                  .select("__cell").distinct().collect()}
    untouched = [c for c in
                 (r[0] for r in assigned.select("__cell")
                  .distinct().collect()) if c not in dead_cells]
    files_before = {c: sorted(os.listdir(f"{p}/assigned/__cell={c}"))
                    for c in untouched}
    n_rewritten = ivf.compact_index(spark, p)
    assert n_rewritten == len(dead_cells)
    for c in untouched:  # untouched cells keep their exact files
        assert sorted(os.listdir(f"{p}/assigned/__cell={c}")) \
            == files_before[c]
    idx2 = ivf.load_index(spark, p)
    assert idx2["tombstones"] is None
    compacted = sorted(map(tuple,
                           ivf.search_with_index(idx2, q).collect()))
    assert compacted == masked
    # physically gone
    assert spark.read.parquet(f"{p}/assigned") \
        .filter("d_id >= 60 and d_id < 80").count() == 0

    # ---- SQ ----
    sq = ScalarQuantizerKNN(k=5)
    p2 = str(tmp_path / "sq_del")
    sq.save_index(data, p2)
    sq.delete_from_index(dead, p2)
    masked_sq = sorted(map(tuple, sq.search_with_index(
        sq.load_index(spark, p2), q).collect()))
    assert not any(60 <= t[1] < 80 for t in masked_sq)
    # equivalence: same bounds (fitted on the FULL corpus — deletes
    # do not refit), corpus minus deletes
    bounds = spark.read.parquet(f"{p2}/bounds")
    fresh_sq = sorted(map(tuple, sq.search_with_bounds(
        surviving, q, bounds).collect()))
    assert masked_sq == fresh_sq
    removed = sq.compact_index(spark, p2)
    assert removed == 20
    sq2 = ScalarQuantizerKNN(k=5)
    assert sorted(map(tuple, sq2.search_with_index(
        sq2.load_index(spark, p2), q).collect())) == masked_sq

    # ---- IVFPQ ----
    pq = PQKNN(k=5, M=4, K=8)
    cb = pq.fit_codebooks(data)
    p3 = str(tmp_path / "ivfpq_del")
    pq.save_ivfpq_index(data, cent, cb, p3)
    pq.delete_from_ivfpq_index(dead, p3)
    masked_pq = sorted(map(tuple, pq.search_ivfpq_with_index(
        pq.load_ivfpq_index(spark, p3), q, nProbe=6).collect()))
    assert not any(60 <= t[1] < 80 for t in masked_pq)
    fresh_pq = sorted(map(tuple, pq.search_ivfpq(
        surviving, q, cent, cb, nProbe=6).collect()))
    assert masked_pq == fresh_pq
    pq.compact_ivfpq_index(spark, p3)
    pq2 = PQKNN(k=5, M=4, K=8)
    assert sorted(map(tuple, pq2.search_ivfpq_with_index(
        pq2.load_ivfpq_index(spark, p3), q, nProbe=6).collect())) \
        == masked_pq


def test_pq_flat_tombstones_and_chunked_codes(spark, tmp_path):
    """Symmetry of the lifecycle across index types: the flat PQ
    artifact supports delete/compact like SQ, and its stored-codes
    search lane supports the chunked batch-scoring path."""
    import numpy as np

    from mmlspark_spark.llm.similarity import PQKNN

    rng = np.random.default_rng(59)
    x = rng.normal(size=(100, 16))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    q = data.filter("vec_id < 12")
    dead = spark.range(40, 60).select(F.col("id").alias("vec_id"))

    pq = PQKNN(k=5, M=4, K=8, dim=16)
    cb = pq.fit_codebooks(data)
    p = str(tmp_path / "pq_del")
    pq.save_index(data, cb, p)
    pq.delete_from_index(dead, p)
    masked = sorted(map(tuple, pq.search_with_index(
        pq.load_index(spark, p), q).collect()))
    assert not any(40 <= t[1] < 60 for t in masked)
    fresh = sorted(map(tuple, pq.search_with_codebooks(
        data.filter("vec_id < 40 or vec_id >= 60"), q, cb).collect()))
    assert masked == fresh and len(masked) == 12 * 5
    assert pq.compact_index(spark, p) == 20
    pq2 = PQKNN(k=5, M=4, K=8)
    assert sorted(map(tuple, pq2.search_with_index(
        pq2.load_index(spark, p), q).collect())) == masked

    # chunked stored-codes search == single shot
    pq3 = PQKNN(k=5, M=4, K=8, dim=16, maxQueries=10, chunkQueries=5)
    idx = pq3.load_index(spark, p)
    chunked = sorted(map(tuple, pq3.search_with_index(
        idx, q).collect()))
    assert chunked == masked
    with pytest.raises(ValueError, match="maxQueries"):
        PQKNN(k=5, M=4, K=8, dim=16, maxQueries=10).search_with_index(
            idx, q).collect()


def test_compact_fully_tombstoned_cell_and_conf_restore(spark, tmp_path):
    """Two compaction edge cases from review: (1) a cell whose EVERY
    row is tombstoned gets no dynamic-overwrite output, so its
    directory must be DELETED or clearing the tombstones would
    resurrect the deleted ids; (2) partitionOverwriteMode must be
    restored to unset (not left 'dynamic'), or a later
    mode='overwrite' rebuild at an existing path would keep stale
    cells absent from the new build."""
    import numpy as np

    from mmlspark_spark.llm.similarity import IVFKNN

    mode_key = "spark.sql.sources.partitionOverwriteMode"
    assert spark.conf.get(mode_key, None) is None  # precondition

    # centroids far apart; vectors placed so cell 1 holds ONLY the
    # ids we tombstone
    cent = spark.createDataFrame(
        [(0, [10.0, 0.0]), (1, [-10.0, 0.0])],
        "cell int, cvec array<double>")
    data = spark.createDataFrame(
        [(i, [10.0 + i * 0.01, 0.5]) for i in range(8)]
        + [(100, [-10.0, 0.3]), (101, [-10.0, -0.2])],
        "vec_id long, embedding array<double>")
    q = data.filter("vec_id in (0, 100)")

    ivf = IVFKNN(k=4, nlist=2, nProbe=2)
    p = str(tmp_path / "ivf_fullcell")
    ivf.save_index(data, cent, p)
    dead = spark.createDataFrame([(100,), (101,)], "vec_id long")
    ivf.delete_from_index(dead, p)
    masked = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p), q).collect()))
    assert not any(t[1] in (100, 101) for t in masked)

    n = ivf.compact_index(spark, p)
    assert n == 1  # only cell 1 affected
    # (1) the deleted ids must NOT resurrect after the tombstones clear
    after = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p), q).collect()))
    assert after == masked
    assert spark.read.parquet(f"{p}/assigned") \
        .filter("d_id in (100, 101)").count() == 0
    # (2) the session conf is back to unset
    assert spark.conf.get(mode_key, None) is None

    # and a full rebuild at the same path replaces ALL old cells
    ivf.save_index(data.filter("vec_id < 4"), cent, p)
    rebuilt = spark.read.parquet(f"{p}/assigned")
    assert rebuilt.count() == 4 and \
        rebuilt.filter("d_id >= 4").count() == 0


def test_empty_query_frames_return_empty(spark):
    """Empty query frames (or empty hash chunks) must yield empty
    results with the normal schema, not crash on first()[0] /
    norm(axis=1) — regression tests for the chunked-lane edges."""
    import numpy as np

    from mmlspark_spark.llm.similarity import (
        IVFKNN,
        PQKNN,
        BruteForceKNN,
    )

    rng = np.random.default_rng(61)
    x = rng.normal(size=(40, 16))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    empty_q = data.filter("vec_id < 0")

    assert BruteForceKNN(k=3, method="numpy").search(
        data, empty_q).count() == 0
    assert BruteForceKNN(k=3, method="expr").search(
        data, empty_q).count() == 0
    pq = PQKNN(k=3, M=4, K=8)
    cent = IVFKNN(nlist=4).fit_centroids_df(data)
    cb = pq.fit_codebooks(data)
    assert pq.search_ivfpq(data, empty_q, cent, cb,
                           nProbe=2).count() == 0


def test_ann_reinsert_after_delete_contract(spark, tmp_path):
    """Round-12 contract fix: appending an id with a PENDING tombstone
    is refused on both real ANN appenders (IVF and IVFPQ) — the new
    row would be masked at read time and deleted by the next
    compaction, i.e. silent data loss wearing an append's clothes.
    After compaction the id is free again. The IVFPQ appender also
    validates the stored manifest first (ADVICE r12): a retriever
    with a different M, or a batch with a different dim, refuses
    instead of silently appending mis-encoded codes."""
    import numpy as np
    import pytest as _pytest

    from mmlspark_spark.llm.similarity import IVFKNN, PQKNN

    rng = np.random.default_rng(59)
    x = rng.normal(size=(80, 16))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    q = data.filter("vec_id < 3")
    dead = spark.createDataFrame([(7,), (11,)], "vec_id long")
    re7 = data.filter("vec_id = 7")

    # ---- IVF ----
    ivf = IVFKNN(k=3, nlist=4, nProbe=4)
    cent = ivf.fit_centroids_df(data)
    p = str(tmp_path / "ivf_re")
    ivf.save_index(data.filter("vec_id != 7"), cent, p)
    ivf.append_to_index(re7, p)      # no tombstones: append is free
    ivf.delete_from_index(dead, p)
    with _pytest.raises(ValueError, match="tombstone"):
        ivf.append_to_index(re7, p)
    ivf.compact_index(spark, p)
    ivf.append_to_index(re7, p)      # compacted: id is free again
    got = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p), q).collect()))
    fresh = sorted(map(tuple, ivf.search_with_centroids(
        data.filter("vec_id != 11"), q, cent).collect()))
    assert got == fresh

    # ---- IVFPQ: re-insert contract + append manifest guard ----
    pq = PQKNN(k=3, M=4, K=8)
    cb = pq.fit_codebooks(data)
    p2 = str(tmp_path / "ivfpq_re")
    pq.save_ivfpq_index(data.filter("vec_id != 7"), cent, cb, p2)
    pq.delete_from_ivfpq_index(dead, p2)
    with _pytest.raises(ValueError, match="tombstone"):
        pq.append_to_ivfpq_index(re7, p2)
    pq.compact_ivfpq_index(spark, p2)
    pq.append_to_ivfpq_index(re7, p2)
    got_pq = sorted(map(tuple, pq.search_ivfpq_with_index(
        pq.load_ivfpq_index(spark, p2), q, nProbe=4).collect()))
    fresh_pq = sorted(map(tuple, pq.search_ivfpq(
        data.filter("vec_id != 11"), q, cent, cb, nProbe=4).collect()))
    assert got_pq == fresh_pq

    # geometry guards fire BEFORE any write corrupts the artifact
    with _pytest.raises(ValueError, match="M="):
        PQKNN(k=3, M=8, K=8).append_to_ivfpq_index(re7, p2)
    short = re7.select("vec_id",
                       F.slice("embedding", 1, 8).alias("embedding"))
    with _pytest.raises(ValueError, match="dim"):
        pq.append_to_ivfpq_index(short, p2)


def test_lsh_index_lifecycle(spark, tmp_path):
    """Round 12 completes ANN index symmetry: LSHKNN gains the stored
    lifecycle. search_with_index over a saved artifact must equal the
    in-memory search exactly (same seeded planes both ways);
    append == fresh over the union; delete masks (== fresh over the
    survivors), tombstoned append refuses, compact changes nothing;
    grid/dim mismatches refuse."""
    import numpy as np
    import pytest as _pytest

    from mmlspark_spark.llm.similarity import LSHKNN

    rng = np.random.default_rng(61)
    x = rng.normal(size=(120, 16))
    data = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(100)],
        "vec_id long, embedding array<double>")
    extra = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(100, 120)],
        "vec_id long, embedding array<double>")
    q = data.filter("vec_id < 4")

    lsh = LSHKNN(k=5, numPlanes=16, bands=8)
    p = str(tmp_path / "lsh_idx")
    lsh.save_index(data, p)
    idx = lsh.load_index(spark, p)
    got = sorted(map(tuple, lsh.search_with_index(idx, q).collect()))
    fresh = sorted(map(tuple, lsh.search(data, q).collect()))
    assert got == fresh and len(got) > 0

    # append == fresh over the union (planes fixed by seed+dim)
    lsh.append_to_index(extra, p)
    got2 = sorted(map(tuple, lsh.search_with_index(
        lsh.load_index(spark, p), q).collect()))
    fresh2 = sorted(map(tuple, lsh.search(
        data.unionByName(extra), q).collect()))
    assert got2 == fresh2

    # delete → mask == fresh-over-survivors; refuse; compact
    dead_ids = sorted({t[1] for t in got2})[:5]
    dead = spark.createDataFrame([(i,) for i in dead_ids],
                                 "vec_id long")
    lsh.delete_from_index(dead, p)
    masked = sorted(map(tuple, lsh.search_with_index(
        lsh.load_index(spark, p), q).collect()))
    surv = (data.unionByName(extra)
            .filter(~F.col("vec_id").isin(dead_ids)))
    assert masked == sorted(map(tuple, lsh.search(surv, q).collect()))
    assert not any(t[1] in dead_ids for t in masked)
    with _pytest.raises(ValueError, match="tombstone"):
        lsh.append_to_index(
            extra.limit(1).withColumn("vec_id", F.lit(dead_ids[0])), p)
    assert lsh.compact_index(spark, p) == len(dead_ids)
    assert sorted(map(tuple, lsh.search_with_index(
        lsh.load_index(spark, p), q).collect())) == masked
    assert spark.read.parquet(f"{p}/vectors").count() == 120 - len(dead_ids)

    # chunked stored-lane == single-shot (hash chunks may come up
    # empty — the dim check must tolerate an empty query chunk)
    from mmlspark_spark.core.cache import release_intermediates

    lsh_c = LSHKNN(k=5, numPlanes=16, bands=8, chunkQueries=2)
    got_c_df = lsh_c.search_with_index(lsh_c.load_index(spark, p), q)
    got_c = sorted(map(tuple, got_c_df.collect()))
    release_intermediates(got_c_df)
    assert got_c == masked

    # filtered stored search == fresh index over the filtered corpus
    filt = sorted(map(tuple, lsh.search_with_index(
        lsh.load_index(spark, p), q,
        where=F.col("d_id") < 60).collect()))
    fresh_f = sorted(map(tuple, lsh.search(
        surv.filter(F.col("vec_id") < 60), q).collect()))
    assert filt == fresh_f and len(filt) > 0
    assert all(t[1] < 60 for t in filt)

    # guards: grid mismatch, dim mismatch, stale-tombstone clear
    with _pytest.raises(ValueError, match="grid"):
        LSHKNN(k=5, numPlanes=16, bands=4).load_index(spark, p)
    short = q.select("vec_id",
                     F.slice("embedding", 1, 8).alias("embedding"))
    with _pytest.raises(ValueError, match="dim"):
        lsh.search_with_index(lsh.load_index(spark, p), short)
    with _pytest.raises(ValueError, match="dim"):
        lsh.append_to_index(short, p)
    lsh.delete_from_index(dead, p)
    lsh.save_index(data, p)  # overwrite clears stale tombstones
    assert lsh.load_index(spark, p)["tombstones"] is None


def test_ivf_torn_append_repair_rolls_back_cell_directories(
        spark, tmp_path):
    """The shared file-append protocol on a PARTITIONED store: the
    pending marker's tree snapshot is recursive, so a torn IVF append
    — new files scattered across existing ``__cell=`` directories
    plus possibly brand-new cell directories — rolls back to the
    pre-append artifact exactly. Simulates the WORST torn state
    (every appended file landed, the marker never committed) by
    replaying append_to_index's write under a manually opened
    bracket, then verifies refusal, repair, and search equality."""
    import os

    import numpy as np
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mmlspark_spark.llm.index_common import (
        _begin_file_append,
        repair_file_append,
    )
    from mmlspark_spark.llm.similarity import IVFKNN

    rng = np.random.default_rng(41)
    x = rng.normal(size=(150, 12))
    base = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(100)],
        "vec_id long, embedding array<double>")
    extra = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(100, 150)],
        "vec_id long, embedding array<double>")
    q = base.filter("vec_id < 4")

    ivf = IVFKNN(k=5, nlist=6, nProbe=3)
    cent = ivf.fit_centroids_df(base)
    p = str(tmp_path / "ivf_torn")
    ivf.save_index(base, cent, p)
    idx = ivf.load_index(spark, p)
    pre = sorted(map(tuple, ivf.search_with_index(idx, q).collect()))

    def tree(root):
        out = []
        for d, _dirs, files in os.walk(root):
            for f in files:
                if not f.startswith("_append_"):
                    out.append(os.path.relpath(os.path.join(d, f),
                                               root))
        return sorted(out)

    pre_tree = tree(p)

    # torn state: bracket opened, the full append write landed, no
    # commit (replays append_to_index's write verbatim)
    _begin_file_append(spark, p)
    assigned = ivf.assign_corpus(
        extra, spark.read.parquet(f"{p}/centroids"))
    (assigned.repartition(F.col("__cell"))
     .sortWithinPartitions("__cell", "d_id")
     .write.mode("append").partitionBy("__cell")
     .parquet(f"{p}/assigned"))
    assert tree(p) != pre_tree

    with _pytest.raises(ValueError, match="torn append"):
        ivf.load_index(spark, p)
    with _pytest.raises(ValueError, match="torn append"):
        ivf.append_to_index(extra, p)

    out = repair_file_append(spark, p)
    assert out["repaired"] and out["files_removed"] > 0
    assert tree(p) == pre_tree
    assert sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p), q).collect())) == pre

    # and the real append still works afterwards, equal to fresh
    ivf.append_to_index(extra, p)
    grown = sorted(map(tuple, ivf.search_with_index(
        ivf.load_index(spark, p), q).collect()))
    fresh = sorted(map(tuple, ivf.search_with_centroids(
        base.unionByName(extra), q, cent).collect()))
    assert grown == fresh


def test_sq8_append_to_index_frozen_bounds(spark, tmp_path):
    """ScalarQuantizerKNN.append_to_index: new vectors encode against
    the STORED per-dimension bounds (quantization grid fixed at save
    time — the IVF/LSH appenders' faiss model, extended to the SQ8
    compressed family) and land as new files in the flat code store.
    Search over the appended index must equal searching codes built
    by encoding the UNION with the same stored bounds — including an
    appended vector outside the stored [lo, hi], which clamps to the
    edge codes exactly as save-time out-of-bound values do. Geometry
    mismatches refuse: a bits-mismatched retriever and a
    dim-mismatched batch both raise before any write; so does
    appending a tombstoned id. The streaming wrapper drives the same
    flat bootstrap + append path (one installment check)."""
    import numpy as np
    import pytest as _pytest

    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN
    from mmlspark_spark.streaming import ann_ingest_foreach_batch

    rng = np.random.default_rng(19)
    rows = [(i, [float(x) for x in rng.normal(size=6)])
            for i in range(20)]
    # appended batch: in-bounds rows plus one far outside the stored
    # grid on every dimension (clamps to edge codes)
    extra = [(100 + i, [float(x) for x in rng.normal(size=6)])
             for i in range(6)] + [(120, [50.0] * 6)]
    schema = "vec_id long, embedding array<double>"
    base = spark.createDataFrame(rows, schema)
    app = spark.createDataFrame(extra, schema)
    union = spark.createDataFrame(rows + extra, schema)
    q = spark.createDataFrame(rows[:3], schema)

    sq = ScalarQuantizerKNN(idCol="vec_id", vecCol="embedding", k=5)
    p = str(tmp_path / "sq_app")
    sq.save_index(base, p)
    sq.append_to_index(app, p)
    idx = sq.load_index(spark, p)
    grown = sorted(map(tuple,
                       sq.search_with_index(idx, q).collect()))
    # expected: the union encoded with the APPENDED store's bounds
    expected_idx = {"codes": sq.encode_with_bounds(union,
                                                   idx["bounds"]),
                    "bounds": idx["bounds"], "tombstones": None}
    assert grown == sorted(map(tuple, sq.search_with_index(
        expected_idx, q).collect()))
    assert len(grown) > 0

    # geometry refusals, before any write
    with _pytest.raises(ValueError, match="bits="):
        ScalarQuantizerKNN(k=5, bits=4).append_to_index(app, p)
    bad_dim = spark.createDataFrame([(200, [1.0, 2.0])], schema)
    with _pytest.raises(ValueError, match="dim"):
        sq.append_to_index(bad_dim, p)
    sq.delete_from_index(
        spark.createDataFrame([(120,)], "vec_id long"), p)
    with _pytest.raises(ValueError, match="tombstone"):
        sq.append_to_index(
            spark.createDataFrame([(120, [0.0] * 6)], schema), p)

    # the generic ANN ingest wrapper drives SQ8's flat path too
    p2 = str(tmp_path / "sq_stream")
    ingest = ann_ingest_foreach_batch(sq, p2)
    ingest(base, 0)
    ingest(app, 1)
    ingest(app, 1)  # replayed committed batch: no-op growth
    import os
    assert os.path.exists(os.path.join(p2, "_append_committed_1.json"))
    streamed_idx = sq.load_index(spark, p2)
    streamed = sorted(map(tuple, sq.search_with_index(
        streamed_idx, q).collect()))
    sexp = {"codes": sq.encode_with_bounds(union,
                                           streamed_idx["bounds"]),
            "bounds": streamed_idx["bounds"], "tombstones": None}
    assert streamed == sorted(map(tuple, sq.search_with_index(
        sexp, q).collect()))
