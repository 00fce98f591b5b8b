"""Anomaly/cyber family (reference cyber/feature + cyber/anomaly +
isolationforest test strategy: hand-checked per-tenant stats, planted
outliers, determinism under a fixed seed)."""

import math

import pytest
from pyspark.sql import functions as F

from mmlspark_spark.anomaly import (
    AccessAnomaly,
    ComplementAccessTransformer,
    IdIndexer,
    IsolationForest,
    LinearScalarScaler,
    StandardScalarScaler,
)


@pytest.fixture(scope="module")
def tenant_df(spark):
    rows = [("t1", 1.0), ("t1", 2.0), ("t1", 3.0),
            ("t2", 10.0), ("t2", 10.0),  # zero-variance tenant
            ("t3", 5.0)]
    return spark.createDataFrame(rows, ["tenant", "value"])


def test_standard_scaler_partitioned(tenant_df):
    model = StandardScalarScaler(inputCol="value", partitionKey="tenant",
                                 outputCol="scaled").fit(tenant_df)
    got = {(r.tenant, r.value): r.scaled for r in model.transform(tenant_df).collect()}
    std_pop = math.sqrt(2.0 / 3.0)  # pop stddev of {1,2,3}
    assert abs(got[("t1", 1.0)] - (1.0 - 2.0) / std_pop) < 1e-12
    assert abs(got[("t1", 2.0)]) < 1e-12
    # zero-variance tenant falls back to (x - mean)
    assert got[("t2", 10.0)] == 0.0


def test_standard_scaler_unpartitioned_and_coefficient(spark):
    df = spark.createDataFrame([(1.0,), (3.0,)], ["value"])
    model = StandardScalarScaler(inputCol="value", outputCol="scaled",
                                 coefficientFactor=2.0).fit(df)
    got = sorted(r.scaled for r in model.transform(df).collect())
    assert abs(got[0] - (-2.0)) < 1e-12 and abs(got[1] - 2.0) < 1e-12


def test_linear_scaler_partitioned(tenant_df):
    model = LinearScalarScaler(inputCol="value", partitionKey="tenant",
                               outputCol="scaled", minRequiredValue=0.0,
                               maxRequiredValue=100.0).fit(tenant_df)
    got = {(r.tenant, r.value): r.scaled for r in model.transform(tenant_df).collect()}
    assert abs(got[("t1", 1.0)] - 0.0) < 1e-9
    assert abs(got[("t1", 2.0)] - 50.0) < 1e-9
    assert abs(got[("t1", 3.0)] - 100.0) < 1e-9
    # degenerate (min == max) tenant → midpoint
    assert abs(got[("t2", 10.0)] - 50.0) < 1e-9


def test_id_indexer_reset_per_partition(spark):
    df = spark.createDataFrame(
        [("t1", "b"), ("t1", "a"), ("t2", "z"), ("t2", "a")], ["tenant", "id"])
    model = IdIndexer(inputCol="id", partitionKey="tenant", outputCol="idx",
                      resetPerPartition=True).fit(df)
    out = model.transform(df)
    got = {(r.tenant, r.idx) for r in out.collect()}
    assert got == {("t1", 1), ("t1", 2), ("t2", 1), ("t2", 2)}
    # unseen value maps to 0
    new = spark.createDataFrame([("t1", "zzz")], ["tenant", "id"])
    assert model.transform(new).collect()[0].idx == 0
    # undo restores original ids
    back = model.undo_transform(out)
    assert set(back.select("id").toPandas()["id"]) == {"a", "b", "z"}


def test_id_indexer_global(spark):
    df = spark.createDataFrame(
        [("t1", "b"), ("t1", "a"), ("t2", "z")], ["tenant", "id"])
    model = IdIndexer(inputCol="id", partitionKey="tenant", outputCol="idx",
                      resetPerPartition=False).fit(df)
    idxs = sorted(r.idx for r in model.transform(df).collect())
    assert idxs == [1, 2, 3]  # globally consecutive


def test_complement_access(spark):
    rows = [("t1", u, r) for u in range(1, 6) for r in range(1, 6)
            if (u + r) % 2 == 0]
    df = spark.createDataFrame(rows, ["tenant", "user_idx", "res_idx"])
    comp = ComplementAccessTransformer(
        partitionKey="tenant", indexedColNames=("user_idx", "res_idx"),
        complementsetFactor=3, seed=7).transform(df)
    observed = {(r.user_idx, r.res_idx) for r in df.collect()}
    got = [(r.user_idx, r.res_idx) for r in comp.collect()]
    assert len(got) > 0
    assert len(set(got)) == len(got)  # distinct
    for u, r in got:
        assert (u, r) not in observed  # truly complement
        assert 1 <= u <= 5 and 1 <= r <= 5  # within observed index ranges


def test_isolation_forest_finds_planted_outliers(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    inliers = rng.normal(0, 1, size=(300, 4))
    outliers = np.array([[8.0, 8.0, 8.0, 8.0], [-9.0, 9.0, -9.0, 9.0]])
    data = [(i, [float(v) for v in row])
            for i, row in enumerate(np.vstack([inliers, outliers]))]
    df = spark.createDataFrame(data, ["id", "features"])
    model = IsolationForest(featuresCol="features", numTrees=50,
                            maxSamples=128, seed=3).fit(df)
    scored = model.transform(df).select("id", "outlierScore").collect()
    by_score = sorted(scored, key=lambda r: -r.outlierScore)
    top2 = {r.id for r in by_score[:2]}
    assert top2 == {300, 301}  # the planted outliers isolate first
    # determinism: same seed → identical scores
    scored2 = model.transform(df).select("id", "outlierScore").collect()
    assert {r.id: r.outlierScore for r in scored} == \
           {r.id: r.outlierScore for r in scored2}


def _reference_iforest_scores(X, n_trees=100, max_samples=128, seed=123):
    """Independent seeded iForest (Liu et al.) — recursive tuples, its
    own RNG stream; shares no code with the engine implementation."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = X.shape[0]

    def c(m):
        if m <= 1:
            return 0.0
        return 2 * (np.log(m - 1) + np.euler_gamma) - 2 * (m - 1) / m

    def build(idx, depth, limit):
        if depth >= limit or idx.size <= 1:
            return ("L", idx.size)
        sub = X[idx]
        spans = sub.max(0) - sub.min(0)
        feats = np.flatnonzero(spans > 0)
        if feats.size == 0:
            return ("L", idx.size)
        f = int(rng.choice(feats))
        thr = float(rng.uniform(sub[:, f].min(), sub[:, f].max()))
        mask = sub[:, f] < thr
        return ("N", f, thr, build(idx[mask], depth + 1, limit),
                build(idx[~mask], depth + 1, limit))

    def path(tree, x, depth=0):
        if tree[0] == "L":
            return depth + c(tree[1])
        _, f, thr, left, right = tree
        return path(left if x[f] < thr else right, x, depth + 1)

    m = min(max_samples, n)
    limit = int(np.ceil(np.log2(m)))
    trees = [build(rng.choice(n, size=m, replace=False), 0, limit)
             for _ in range(n_trees)]
    depths = np.array([[path(t, x) for t in trees] for x in X])
    return 2.0 ** (-depths.mean(axis=1) / c(m))


def test_isolation_forest_ordering_vs_reference(spark):
    """Score ORDERING agrees with an independent seeded reference
    implementation of the same algorithm (VERDICT r1 oracle upgrade):
    high rank correlation + identical extreme-outlier set."""
    import numpy as np

    rng = np.random.default_rng(11)
    X = np.vstack([
        rng.normal(0, 1, size=(250, 4)),          # inliers
        rng.normal(0, 1, size=(10, 4)) + 4.0,      # mid outliers
        rng.uniform(7, 9, size=(5, 4)),            # far outliers
    ])
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        ["id", "features"])
    model = IsolationForest(featuresCol="features", numTrees=100,
                            maxSamples=128, seed=3).fit(df)
    got = {r.id: r.outlierScore
           for r in model.transform(df).select("id", "outlierScore").collect()}
    engine = np.array([got[i] for i in range(len(X))])
    ref = _reference_iforest_scores(X)
    # Spearman rank correlation (scipy-free: pearson of rank vectors)
    def ranks(a):
        r = np.empty(len(a))
        r[np.argsort(a)] = np.arange(len(a))
        return r
    rho = np.corrcoef(ranks(engine), ranks(ref))[0, 1]
    assert rho > 0.8, f"rank correlation {rho} vs independent reference"
    # both implementations isolate the same far-outlier set first
    assert set(np.argsort(-engine)[:5]) == set(np.argsort(-ref)[:5]) \
        == {260, 261, 262, 263, 264}


def test_isolation_forest_contamination_threshold(spark):
    import numpy as np

    rng = np.random.default_rng(1)
    data = [(i, [float(v) for v in row])
            for i, row in enumerate(rng.normal(0, 1, size=(200, 3)))]
    df = spark.createDataFrame(data, ["id", "features"])
    model = IsolationForest(numTrees=30, maxSamples=64, contamination=0.05,
                            seed=5).fit(df)
    frac = (model.transform(df).filter(F.col("predictedLabel") == 1).count()
            / 200.0)
    assert 0.0 < frac <= 0.12  # ~5% flagged (approx quantile tolerance)


def test_access_anomaly_scores_rare_access_higher(spark):
    # two user/resource cliques per tenant; cross-clique access is anomalous
    rows = []
    for u in range(0, 5):
        for r in range(0, 5):
            rows += [("t1", f"u{u}", f"r{r}")] * 3  # clique A, frequent
    for u in range(5, 10):
        for r in range(5, 10):
            rows += [("t1", f"u{u}", f"r{r}")] * 3  # clique B
    df = spark.createDataFrame(rows, ["tenant", "user", "res"])
    model = AccessAnomaly(tenantCol="tenant", userCol="user", resCol="res",
                          rank=5, maxIter=8, seed=11).fit(df)
    probe = spark.createDataFrame(
        [("t1", "u0", "r0"), ("t1", "u0", "r9")], ["tenant", "user", "res"])
    got = {(r.user, r.res): r.anomaly_score for r in model.transform(probe).collect()}
    assert got[("u0", "r9")] > got[("u0", "r0")]  # cross-clique more anomalous
    # the cliques are disconnected components: cross-clique access has
    # no connecting path at all → +inf, the reference's semantics
    assert got[("u0", "r9")] == float("inf")
    assert got[("u0", "r0")] < float("inf")


def test_connected_components_bipartite(spark):
    from mmlspark_spark.anomaly.access import connected_components

    rows = [
        # component 1: u0-r0, u1-r0 (u0~u1 via r0), u1-r1
        ("t", "u0", "r0"), ("t", "u1", "r0"), ("t", "u1", "r1"),
        # component 2: u2-r2
        ("t", "u2", "r2"),
        # other tenant: same names, isolated from tenant t
        ("s", "u0", "r2"),
    ]
    df = spark.createDataFrame(rows, ["tenant", "user", "res"])
    u2c, r2c = connected_components(df, "tenant", "user", "res")
    uc = {(r.tenant, r.user): r.component for r in u2c.collect()}
    rc = {(r.tenant, r.res): r.component for r in r2c.collect()}
    assert uc[("t", "u0")] == uc[("t", "u1")] == rc[("t", "r0")] == rc[("t", "r1")]
    assert uc[("t", "u2")] == rc[("t", "r2")] != uc[("t", "u0")]
    # tenants are isolated even when ids collide
    assert rc[("s", "r2")] == uc[("s", "u0")] != rc[("t", "r2")]


def test_access_anomaly_likelihood_scaling(spark):
    """Per-tenant rating scaling (reference lowValue/highValue +
    negScore): a once-accessed pair inside a CONNECTED graph scores
    more anomalous than a frequently-accessed one — the likelihood
    axis, not just graph structure, drives the score."""
    rows = []
    for u in range(0, 5):
        for r in range(0, 5):
            rows.append(("t1", f"u{u}", f"r{r}", 10.0))  # frequent clique
    # r5 is in the same component, accessed rarely by u0 and u1
    rows.append(("t1", "u0", "r5", 1.0))
    rows.append(("t1", "u1", "r5", 1.0))
    df = spark.createDataFrame(rows, ["tenant", "user", "res", "count"])
    model = AccessAnomaly(tenantCol="tenant", userCol="user", resCol="res",
                          likelihoodCol="count", rank=5, maxIter=8,
                          seed=11).fit(df)
    probe = spark.createDataFrame(
        [("t1", "u0", "r0"), ("t1", "u0", "r5")], ["tenant", "user", "res"])
    got = {(r.user, r.res): r.anomaly_score
           for r in model.transform(probe).collect()}
    # same component, so no +inf shortcut — the rating scale decides
    assert got[("u0", "r5")] != float("inf")
    assert got[("u0", "r5")] > got[("u0", "r0")]
