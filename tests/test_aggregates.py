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


def test_scd2_merge_classification(spark):
    """Unchanged passthrough, history row + stamped update for real
    changes (NULL->value is a change), no history for no-op updates,
    stamped inserts — and the batch-side join is broadcast."""
    from mmlspark_spark.operators import SCD2Merge

    dim = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0)],
        "id long, name string, bal double")
    ch = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, bal double")
    out = SCD2Merge(changesDf=ch, keyCols=["id"],
                    batchId="B7").transform(dim)
    assert out.columns == ["id", "name", "bal", "is_current", "batch_id"]
    rows = sorted(((r.id, r.name, r.bal, r.is_current, r.batch_id)
                   for r in out.collect()), key=str)
    assert rows == sorted([
        (1, "a", 10.0, True, None),     # untouched
        (2, "b", None, False, None),    # history: NULL->20 is a change
        (2, "b", 20.0, True, "B7"),     # updated, stamped
        (3, "c", 30.0, True, None),     # no-op update: no history row
        (4, "d", 40.0, True, "B7"),     # insert, stamped
    ], key=str)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scd2_merge_idempotent_reapply(spark):
    """Re-applying the same batch to the merged CURRENT state is a
    no-op (every batch row now equals its current row) — the merge
    must not spawn duplicate history."""
    from mmlspark_spark.operators import SCD2Merge

    dim = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, bal double")
    ch = spark.createDataFrame([(2, 25.0)], "id long, bal double")
    m = SCD2Merge(changesDf=ch, keyCols=["id"], batchId="B1")
    state1 = m.transform(dim)
    current = state1.filter("is_current").drop("is_current", "batch_id")
    state2 = SCD2Merge(changesDf=ch, keyCols=["id"],
                       batchId="B2").transform(current)
    rows = sorted(((r.id, r.bal, r.is_current, r.batch_id)
                   for r in state2.collect()), key=str)
    assert rows == sorted([
        (1, 10.0, True, None),
        (2, 25.0, True, None),   # equals current -> untouched, no B2
    ], key=str)


def test_scd2_merge_tracked_cols_subset(spark):
    """Only trackedCols participate in change detection: a change
    confined to an untracked column is a no-op."""
    from mmlspark_spark.operators import SCD2Merge

    dim = spark.createDataFrame([(1, "x", 1.0)],
                                "id long, name string, score double")
    ch = spark.createDataFrame([(1, "x", 99.0)],
                               "id long, name string, score double")
    out = SCD2Merge(changesDf=ch, keyCols=["id"], trackedCols=["name"],
                    batchId="B1").transform(dim)
    rows = [(r.id, r.name, r.score, r.is_current, r.batch_id)
            for r in out.collect()]
    assert rows == [(1, "x", 1.0, True, None)]


def test_scd2_merge_rejects_duplicate_batch_keys(spark):
    """A batch with two rows for one key would fan the join out into
    two is_current rows — SQL MERGE raises on multiple matches, and
    so does SCD2Merge (eagerly, at transform time)."""
    import pytest as _pytest

    from mmlspark_spark.operators import SCD2Merge

    dim = spark.createDataFrame([(1, 10.0)], "id long, bal double")
    ch = spark.createDataFrame([(1, 20.0), (1, 30.0)],
                               "id long, bal double")
    with _pytest.raises(ValueError, match="multiple rows"):
        SCD2Merge(changesDf=ch, keyCols=["id"]).transform(dim)
