import duckdb
import pytest
from pyspark.sql import functions as F

from mmlspark_spark.operators import ClassBalancer, EnsembleByKey, SummarizeData


def test_summarize_lineitem_vs_duckdb(lineitem, sf_dir):
    out = SummarizeData(exact=True).transform(lineitem)
    stats = {r.feature: r for r in out.collect()}
    ora = duckdb.sql(
        f"""
        SELECT count(*) AS n, count(DISTINCT l_quantity) AS u,
               avg(l_quantity) AS mean, stddev_samp(l_quantity) AS sd,
               min(l_quantity) AS mn, max(l_quantity) AS mx,
               quantile_cont(l_quantity, 0.5) AS med
        FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchone()
    q = stats["l_quantity"]
    assert q["count"] == ora[0]
    assert q.unique_value_count == ora[1]
    assert abs(q.mean - ora[2]) < 1e-9
    assert abs(q.stddev - ora[3]) < 1e-9
    assert q.min == ora[4] and q.max == ora[5]
    assert abs(q.median - ora[6]) < 1e-6
    # string column: count stats only
    assert stats["l_returnflag"].mean is None
    assert stats["l_returnflag"].unique_value_count == 3


def test_summarize_missing_counts(spark):
    df = spark.createDataFrame([(1, None), (2, "x"), (None, "y")], "a int, b string")
    out = {r.feature: r for r in SummarizeData(exact=True).transform(df).collect()}
    assert out["a"].missing_value_count == 1
    assert out["b"].missing_value_count == 1


def test_class_balancer(spark):
    df = spark.createDataFrame(
        [(0,)] * 6 + [(1,)] * 3 + [(2,)] * 2, "label int"
    )
    model = ClassBalancer(inputCol="label").fit(df)
    out = model.transform(df)
    w = {r.label: r.weight for r in out.select("label", "weight").distinct().collect()}
    assert w == {0: 1.0, 1: 2.0, 2: 3.0}


def test_ensemble_by_key_collapse(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )
    out = EnsembleByKey(keys=["k"], cols=["v"]).transform(df)
    got = {r.k: r.mean_v for r in out.collect()}
    assert got == {"a": 2.0, "b": 10.0}


def test_ensemble_by_key_join_back(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )
    out = EnsembleByKey(keys=["k"], cols=["v"], collapseGroup=False).transform(df)
    assert out.count() == 3
    assert out.filter((F.col("k") == "a") & (F.col("mean_v") == 2.0)).count() == 2


def test_ensemble_by_key_vectors(spark):
    from pyspark.ml.linalg import Vectors

    df = spark.createDataFrame(
        [("a", Vectors.dense([1.0, 2.0])), ("a", Vectors.dense([3.0, 4.0]))],
        ["k", "vec"],
    )
    out = EnsembleByKey(keys=["k"], cols=["vec"]).transform(df)
    row = out.collect()[0]
    assert list(row.mean_vec) == [2.0, 3.0]


def test_summarize_data_percentiles_only(spark):
    """counts=False, basic=False must not assert on an empty
    declarative agg list."""
    from mmlspark_spark.operators import SummarizeData

    df = spark.createDataFrame([(float(i),) for i in range(10)], ["x"])
    out = SummarizeData(counts=False, basic=False, percentiles=True,
                        exact=True).transform(df)
    row = out.collect()[0]
    assert row["median"] == pytest.approx(4.5)


def test_ensemble_by_key_preserves_column_order(spark):
    """collapseGroup=False output must match transform_schema's layout
    (input columns first, aggregates appended)."""
    from mmlspark_spark.operators import EnsembleByKey

    df = spark.createDataFrame(
        [(1.0, "k1", 2.0), (3.0, "k1", 4.0)], ["a", "key", "b"])
    op = EnsembleByKey(keys=["key"], cols=["b"], collapseGroup=False)
    out = op.transform(df)
    assert out.columns == [f.name for f in
                           op.transform_schema(df.schema).fields]


def test_class_balancer_null_label_weight(spark):
    """A NULL label group gets a weight like any other stratum —
    equi-join semantics silently nulled it."""
    from pyspark.sql import types as T

    from mmlspark_spark.operators import ClassBalancer

    schema = T.StructType([T.StructField("label", T.StringType())])
    df = spark.createDataFrame([("a",), ("a",), (None,)], schema)
    out = ClassBalancer(inputCol="label").fit(df).transform(df)
    rows = {(r.label, r.weight) for r in out.collect()}
    assert (None, 2.0) in rows and ("a", 1.0) in rows
