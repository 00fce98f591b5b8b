"""ML pipeline, temporal-join, stage-family, exact-registry, WARC and graph lanes (SURVEY §2.2-§2.10 + engine extras)

Split from the former single-file ``plans/catalog.py`` (round 15,
purely mechanical — no lane changed; the ``CATALOG`` registry in
``plans.catalog`` is the only contract and import order preserves the
original registration order)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import DataFrame  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from mmlspark_spark.plans.catalog import _t, register  # noqa: F401

# ML pipeline queries (SURVEY §2.10 train/eval surface)
# ---------------------------------------------------------------------------

@register(
    "unicode_normalize",
    oracle="""
    SELECT doc_id, lower(nfc_normalize(text)) AS norm
    FROM documents WHERE doc_id < 2000
    """,
)
def unicode_normalize(spark, sf_dir):
    """UnicodeNormalize stage (stages/UnicodeNormalize.scala): NFC +
    lowercase, mirrored by DuckDB's nfc_normalize."""
    from mmlspark_spark.featurize import UnicodeNormalize

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    out = UnicodeNormalize(inputCol="text", outputCol="norm", form="NFC",
                           lower=True).transform(docs)
    return out.select("doc_id", "norm")


@register(
    "train_classifier_metrics",
    oracle="""
    SELECT CAST(1.0 AS DOUBLE) AS accuracy, CAST(1.0 AS DOUBLE) AS precision,
           CAST(1.0 AS DOUBLE) AS recall, CAST(1.0 AS DOUBLE) AS AUC,
           CAST(sum(CASE WHEN l_extendedprice > 35000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN l_extendedprice < 25000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_neg
    FROM lineitem
    WHERE l_extendedprice > 35000 OR l_extendedprice < 25000
    """,
)
def train_classifier_metrics(spark, sf_dir):
    """TrainClassifier + ComputeModelStatistics end-to-end. The label is
    a wide-margin price threshold (positive above 35k, negative below
    25k, gap rows dropped), so a correctly trained model's metrics are
    closed-form — accuracy/precision/recall/AUC all exactly 1.0 — and
    the whole train→score→evaluate path is hash-checked: a model that
    fails to separate the 10k-wide margin fails the oracle. n_pos/n_neg
    tie the check to the actual data selection. Golden-metric
    tolerances on a non-separable task stay in tests/test_ml.py."""
    from mmlspark_spark.ml import ComputeModelStatistics, TrainClassifier

    li = (_t(spark, sf_dir, "lineitem")
          .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .filter((F.col("l_extendedprice") > 35000)
                  | (F.col("l_extendedprice") < 25000))
          .withColumn("label",
                      (F.col("l_extendedprice") > 35000).cast("double")))
    from pyspark.ml.classification import LogisticRegression

    model = TrainClassifier(model=LogisticRegression(), labelCol="label")\
        .fit(li)
    scored = model.transform(li)
    stats = ComputeModelStatistics(evaluationMetric="classification")\
        .transform(scored)
    counts = li.agg(
        F.sum(F.col("label").cast("bigint")).alias("n_pos"),
        F.sum((1 - F.col("label")).cast("bigint")).alias("n_neg"))
    return stats.select([F.round(F.col(c), 4).alias(c)
                         for c in stats.columns]).crossJoin(counts)


def _vw_featurizer_oracle() -> str:
    """Replays the default VowpalWabbitFeaturizer path (Spark
    FeatureHasher: murmur3_x86_32 seed 42 of ``col=value`` for strings
    / the bare column name for numerics, ``nonNegativeMod`` into 2^12
    slots) with the plans/duckdb_xxh murmur32 generator — the SLOT
    INDICES are part of the compared output, so the hash itself is
    verified, not just the value mass."""
    from mmlspark_spark.plans.duckdb_xxh import murmur32_str, nonneg_mod32

    i_flag = nonneg_mod32(
        murmur32_str("'l_returnflag=' || l_returnflag", u="ya"), 4096)
    i_status = nonneg_mod32(
        murmur32_str("'l_linestatus=' || l_linestatus", u="yb"), 4096)
    i_qty = nonneg_mod32(murmur32_str("'sum_qty'", u="yc"), 4096)
    return f"""
    WITH a AS (
      SELECT l_returnflag, l_linestatus,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(l_quantity), 4) AS sum_qty
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, n, sum_qty,
           array_to_string(list_sort([{i_flag}, {i_status}, {i_qty}]),
                           ',') AS slots,
           round(2.0 + sum_qty, 4) AS slot_sum
    FROM a
    """


@register("vw_featurizer", oracle=_vw_featurizer_oracle())
def vw_featurizer(spark, sf_dir):
    """VowpalWabbitFeaturizer hashing, HASH-EXACT against a DuckDB
    oracle that recomputes the murmur3_x86_32 slot layout bit-for-bit
    (plans/duckdb_xxh.murmur32_str; rows-only before round 8). The
    query aggregates lineitem per (returnflag, linestatus), featurizes
    the aggregate frame, and exposes the NONZERO SLOT INDICES plus the
    slot value mass — so index placement, not just totals, is driver-
    verified. VW-hash-parity (useVWHashing) additionally golden-tested
    in tests/test_murmur.py against the JVM."""
    from pyspark.ml.functions import vector_to_array

    from mmlspark_spark.ml.vw import VowpalWabbitFeaturizer

    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
    out = VowpalWabbitFeaturizer(
        inputCols=["l_returnflag", "l_linestatus", "sum_qty"],
        outputCol="features", numBits=12).transform(agg)
    arr = vector_to_array("features")
    nz = F.filter(
        F.transform(arr, lambda v, i: F.struct(i.alias("i"), v.alias("v"))),
        lambda s: s["v"] != 0)
    return out.select(
        "l_returnflag", "l_linestatus", "n", "sum_qty",
        F.concat_ws(",", F.transform(nz, lambda s: s["i"].cast("string")))
        .alias("slots"),
        F.round(F.aggregate(arr, F.lit(0.0), lambda a, v: a + v), 4)
        .alias("slot_sum"))


# ---------------------------------------------------------------------------
# Temporal joins (engine extras — reference has none, SURVEY §2.3)
# ---------------------------------------------------------------------------

@register(
    "asof_join",
    oracle="""
    SELECT c.event_id, c.user_id,
           s.ts AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON c.user_id = s.user_id AND c.ts >= s.ts
    """,
)
def asof_join(spark, sf_dir):
    """Backward as-of join: each click matched to the user's most recent
    signup at-or-before it — one union + one window pass per user, a
    single shuffle (no per-row range probe). Spark has no ASOF JOIN;
    DuckDB's native ASOF is the oracle."""
    from mmlspark_spark.operators.temporal import as_of_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    out = as_of_join(clicks, signups, on="user_id",
                     leftTimeCol="ts", rightTimeCol="ts",
                     rightCols=[], suffix="_signup")
    return out.select("event_id", "user_id",
                      F.col("ts_signup").alias("signup_ts"))


@register(
    "range_join",
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id AS error_id,
           p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts
     AND epoch(e.ts) - epoch(p.ts) <= 3600
    """,
)
def range_join_q(spark, sf_dir):
    """Range join: errors within 1 h after each purchase by the same
    user — bucketed equi-join + exact filter, instead of the
    broadcast-nested-loop Spark plans for raw inequality joins."""
    from mmlspark_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts")
    out = range_join(purchases, errors, on="user_id",
                     leftTimeCol="ts", rightTimeCol="ts",
                     lower=0.0, upper=3600.0)
    return out.select(F.col("event_id").alias("purchase_id"),
                      F.col("event_id_right").alias("error_id"),
                      "user_id")


@register(
    "cube_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 4) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_counts(spark, sf_dir):
    """CUBE aggregation (SURVEY §2.4: grouping sets come free from
    Catalyst — df.cube); complements rollup_counts."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("qty"),
    )


@register(
    "stratified_repartition",
    oracle="""
    WITH cnt AS (
      SELECT l_returnflag, count(*) AS c FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, (SELECT max(c) FROM cnt) AS n FROM cnt
    """,
)
def stratified_repartition(spark, sf_dir):
    """StratifiedRepartition equal mode (stages/StratifiedRepartition.scala:
    48-77): every label resampled with replacement to max(maxLabelCount,
    parallelism) rows, interleaved across partitions. At sf0.01 the max
    label count dominates parallelism, so per-label output counts are
    exactly the max label count — SQL-expressible."""
    from mmlspark_spark.operators import StratifiedRepartition

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    out = StratifiedRepartition(labelCol="l_returnflag", mode="equal",
                                seed=42).transform(li)
    return out.groupBy("l_returnflag").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Stage-family coverage queries (round 2): operators that previously had
# only unit tests get driver-checkable oracle rows.
# ---------------------------------------------------------------------------


@register(
    "lambda_stage",
    oracle="""
    SELECT o_orderkey,
           round(CAST(o_totalprice AS DOUBLE) * 0.9, 4) AS discounted
    FROM orders WHERE o_totalprice > 100000
    """,
)
def lambda_stage(spark, sf_dir):
    """Lambda stage wrapping an arbitrary DataFrame->DataFrame function
    (stages/Lambda.scala:22-60): the wrapped plan stays fully
    declarative, so Catalyst pushes the filter into the scan."""
    from mmlspark_spark.operators import Lambda

    orders = _t(spark, sf_dir, "orders")
    stage = Lambda(fn=lambda df: df
                   .filter(F.col("o_totalprice") > 100000)
                   .select("o_orderkey",
                           F.round(F.col("o_totalprice").cast("double") * 0.9,
                                   4).alias("discounted")))
    return stage.transform(orders)


@register(
    "udf_transformer",
    oracle="""
    SELECT c_custkey, CAST(length(c_name) AS INT) AS name_len
    FROM customer
    """,
)
def udf_transformer(spark, sf_dir):
    """UDFTransformer with an Arrow-vectorized pandas UDF
    (stages/UDFTransformer.scala:26-110) — the python hot path runs per
    Arrow batch, never per row."""
    from pyspark.sql.functions import pandas_udf

    from mmlspark_spark.operators import UDFTransformer

    @pandas_udf("int")
    def _name_len(s):
        return s.str.len().astype("int32")

    cust = _t(spark, sf_dir, "customer")
    out = UDFTransformer(inputCols=["c_name"], outputCol="name_len",
                         udf=_name_len).transform(cust)
    return out.select("c_custkey", "name_len")


@register(
    "multi_column_adapter",
    oracle="""
    SELECT c_custkey, lower(c_name) AS name_n, lower(c_mktsegment) AS seg_n
    FROM customer
    """,
)
def multi_column_adapter(spark, sf_dir):
    """MultiColumnAdapter cloning a one-in-one-out base stage per
    (in, out) pair (stages/MultiColumnAdapter.scala:20-135); base stage
    is UnicodeNormalize (NFKC + lower)."""
    from mmlspark_spark.featurize import UnicodeNormalize
    from mmlspark_spark.operators import MultiColumnAdapter

    cust = _t(spark, sf_dir, "customer")
    out = MultiColumnAdapter(
        baseStage=UnicodeNormalize(form="NFKC", lower=True),
        inputCols=["c_name", "c_mktsegment"],
        outputCols=["name_n", "seg_n"]).transform(cust)
    return out.select("c_custkey", "name_n", "seg_n")


@register(
    "drop_missing",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 7 <> 0
    """,
)
def drop_missing(spark, sf_dir):
    """DropMissingData on a column with injected nulls (reference drops
    NA inside Featurize.scala:181; promoted to a stage here)."""
    from mmlspark_spark.operators import DropMissingData

    orders = _t(spark, sf_dir, "orders").withColumn(
        "maybe", F.when(F.col("o_orderkey") % 7 != 0, F.col("o_orderstatus")))
    out = DropMissingData(cols=["maybe"]).transform(orders)
    return out.select("o_orderkey", F.col("maybe").alias("o_orderstatus"))


@register(
    "minibatch_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type,
           round(CAST(value AS DOUBLE), 6) AS value
    FROM events WHERE event_id < 20000
    """,
)
def minibatch_roundtrip(spark, sf_dir):
    """FixedMiniBatchTransformer then FlattenBatch
    (stages/MiniBatchTransformer.scala:130-230) is an exact identity —
    the oracle checks no row is lost, duplicated, or reassociated
    across the batch/unbatch round trip."""
    from mmlspark_spark.operators import (
        FixedMiniBatchTransformer,
        FlattenBatch,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 20000) \
        .select("event_id", "user_id", "event_type",
                F.round(F.col("value").cast("double"), 6).alias("value"))
    batched = FixedMiniBatchTransformer(batchSize=100).transform(ev)
    return FlattenBatch().transform(batched)


@register(
    "partition_ops_identity",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(CAST(l_quantity AS DOUBLE), 4) AS qty
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def partition_ops_identity(spark, sf_dir):
    """Repartition (shuffle), PartitionConsolidator (coalesce), Cacher
    and Timer are content-preserving by contract
    (stages/Repartition.scala:20-66, PartitionConsolidator.scala:22-139,
    Cacher.scala:14-43, Timer.scala:55-133) — the oracle proves the
    composed chain changes partitioning only, never data."""
    from mmlspark_spark.operators import (
        Cacher,
        PartitionConsolidator,
        Repartition,
        Timer,
    )
    from mmlspark_spark.operators.stages import SelectColumns

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000) \
        .select("l_orderkey", "l_linenumber",
                F.round(F.col("l_quantity").cast("double"), 4).alias("qty"))
    out = Repartition(n=8, useRepartition=True).transform(li)
    out = PartitionConsolidator(numPartitions=2).transform(out)
    out = Cacher().transform(out)
    timed = Timer(stage=SelectColumns(cols=["l_orderkey", "l_linenumber",
                                            "qty"]))
    return timed.transform(out)


@register(
    "date_featurize",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS DOUBLE) AS yr,
           CAST(dayofweek(o_orderdate) + 1 AS DOUBLE) AS dow,
           CAST(month(o_orderdate) AS DOUBLE) AS mo,
           CAST(day(o_orderdate) AS DOUBLE) AS dom
    FROM orders WHERE o_orderkey < 30000
    """,
)
def date_featurize(spark, sf_dir):
    """date_features component extraction (Featurize.scala:204-215);
    DuckDB's dayofweek is 0-based Sunday vs Spark's 1-based, hence the
    +1 on the oracle side."""
    from mmlspark_spark.featurize.auto import date_features

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 30000)
    feats = date_features(F.col("o_orderdate"))
    return orders.select(
        "o_orderkey",
        feats[1].alias("yr"), feats[2].alias("dow"),
        feats[3].alias("mo"), feats[4].alias("dom"))


@register(
    "index_to_value_roundtrip",
    oracle="SELECT c_custkey, c_mktsegment AS restored FROM customer",
)
def index_to_value_roundtrip(spark, sf_dir):
    """ValueIndexer -> IndexToValue is an exact inverse: the levels ride
    the indexed column's metadata (featurize/IndexToValue.scala:29-92),
    so the round trip restores every original value."""
    from mmlspark_spark.featurize import IndexToValue, ValueIndexer

    cust = _t(spark, sf_dir, "customer")
    model = ValueIndexer(inputCol="c_mktsegment", outputCol="seg_idx").fit(cust)
    idx = model.transform(cust)
    out = IndexToValue(inputCol="seg_idx", outputCol="restored").transform(idx)
    return out.select("c_custkey", "restored")


@register(
    "count_selector",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(CAST(l_quantity AS DOUBLE), 4) AS q,
           round(CAST(l_tax AS DOUBLE), 4) AS t
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def count_selector(spark, sf_dir):
    """CountSelector drops all-zero vector slots
    (featurize/CountSelector.scala:23-88): a planted zero slot between
    two real features disappears, leaving exactly (quantity, tax)."""
    from mmlspark_spark.featurize.auto import CountSelector
    from mmlspark_spark.functions.vector import get_value_at, to_vector

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    vec = li.withColumn("features", to_vector(F.array(
        F.col("l_quantity").cast("double"), F.lit(0.0),
        F.col("l_tax").cast("double"))))
    model = CountSelector(inputCol="features", outputCol="selected").fit(vec)
    out = model.transform(vec)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round(get_value_at("selected", 0), 4).alias("q"),
        F.round(get_value_at("selected", 1), 4).alias("t"))


@register(
    "text_preprocessor",
    oracle="""
    SELECT doc_id,
           replace(replace(lower(text), 'data', '<DATA>'),
                   'model', '<MODEL>') AS processed
    FROM documents
    """,
)
def text_preprocessor(spark, sf_dir):
    """TextPreprocessor longest-match-first multi-replacement
    (stages/TextPreprocessor.scala:98-152). The chosen patterns are
    mutually disjoint and replacements share no alphabet with any
    pattern, so the one-pass alternation is provably equal to DuckDB's
    sequential replace() chain."""
    from mmlspark_spark.featurize import TextPreprocessor

    docs = _t(spark, sf_dir, "documents")
    out = TextPreprocessor(
        inputCol="text", outputCol="processed", normFunc="lower",
        map={"data": "<DATA>", "model": "<MODEL>"}).transform(docs)
    return out.select("doc_id", "processed")


@register(
    "per_instance_log_loss",
    oracle="""
    SELECT o_orderkey,
           round(-ln(CASE WHEN o_orderkey % 2 = 1
                          THEN greatest(least((o_orderkey % 97) / 100.0,
                                              1 - 1e-15), 1e-15)
                          ELSE greatest(least(1 - (o_orderkey % 97) / 100.0,
                                              1 - 1e-15), 1e-15) END),
                 6) AS log_loss
    FROM orders WHERE o_orderkey < 20000
    """,
)
def per_instance_log_loss(spark, sf_dir):
    """ComputePerInstanceStatistics classification log-loss from scored
    probabilities (ComputePerInstanceStatistics.scala:77-99), expressed
    as pure column math over a deterministic synthetic scoring."""
    from mmlspark_spark.functions.vector import to_vector
    from mmlspark_spark.ml import ComputePerInstanceStatistics

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    p = (F.col("o_orderkey") % 97).cast("double") / 100.0
    scored = orders.select(
        "o_orderkey",
        (F.col("o_orderkey") % 2).cast("double").alias("label"),
        to_vector(F.array(1 - p, p)).alias("scored_probabilities"))
    out = ComputePerInstanceStatistics(
        evaluationMetric="classification", labelCol="label").transform(scored)
    return out.select("o_orderkey", F.round("log_loss", 6).alias("log_loss"))


@register(
    "model_statistics",
    oracle="""
    WITH scored AS (
      SELECT CAST(o_orderkey % 2 AS DOUBLE) AS y,
             (o_orderkey % 97) / 100.0 AS s,
             CASE WHEN (o_orderkey % 97) / 100.0 >= 0.5
                  THEN 1.0 ELSE 0.0 END AS p
      FROM orders WHERE o_orderkey < 20000
    ),
    ranked AS (
      SELECT y, s, row_number() OVER (ORDER BY s) AS r FROM scored
    ),
    ravg AS (
      SELECT y, avg(r) OVER (PARTITION BY s) AS ra FROM ranked
    ),
    aucagg AS (
      SELECT sum(ra) FILTER (y = 1.0) AS rpos,
             count(*) FILTER (y = 1.0) AS npos,
             count(*) FILTER (y <> 1.0) AS nneg
      FROM ravg
    ),
    cm AS (
      SELECT count(*) FILTER (y = 1 AND p = 1) AS tp1,
             count(*) FILTER (y = 0 AND p = 0) AS tp0,
             count(*) FILTER (p = 1) AS pred1,
             count(*) FILTER (p = 0) AS pred0,
             count(*) FILTER (y = 1) AS lab1,
             count(*) FILTER (y = 0) AS lab0,
             count(*) AS n
      FROM scored
    )
    SELECT round((tp0 + tp1) / CAST(n AS DOUBLE), 6) AS accuracy,
           round((CAST(tp0 AS DOUBLE) / pred0
                  + CAST(tp1 AS DOUBLE) / pred1) / 2, 6) AS macro_precision,
           round((CAST(tp0 AS DOUBLE) / lab0
                  + CAST(tp1 AS DOUBLE) / lab1) / 2, 6) AS macro_recall,
           round((rpos - npos * (npos + 1) / 2.0)
                 / (npos * nneg), 6) AS auc
    FROM cm, aucagg
    """,
)
def model_statistics(spark, sf_dir):
    """ComputeModelStatistics over a deterministic synthetic scoring
    (ComputeModelStatistics.scala analog, mmlspark_spark/ml/stats.py):
    accuracy + macro precision/recall from the confusion matrix and
    AUROC via the tie-averaged Mann-Whitney rank statistic — the oracle
    reproduces the rank math in SQL, so the AUC implementation itself
    is hash-checked."""
    from mmlspark_spark.functions.vector import to_vector
    from mmlspark_spark.ml import ComputeModelStatistics

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    s = (F.col("o_orderkey") % 97).cast("double") / 100.0
    scored = orders.select(
        (F.col("o_orderkey") % 2).cast("double").alias("label"),
        F.when(s >= 0.5, 1.0).otherwise(0.0).alias("scored_labels"),
        to_vector(F.array(1 - s, s)).alias("scored_probabilities"))
    out = ComputeModelStatistics(labelCol="label").transform(scored)
    return out.select(
        F.round("accuracy", 6).alias("accuracy"),
        F.round("precision", 6).alias("macro_precision"),
        F.round("recall", 6).alias("macro_recall"),
        F.round("AUC", 6).alias("auc"))


@register(
    "ranking_metrics",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1.0 ELSE 0.0 END AS h1,
             CASE WHEN o_orderkey % 2 = 0 THEN 1.0 ELSE 0.0 END AS h2
      FROM orders WHERE o_orderkey < 20000
    ),
    m AS (
      SELECT (h1 + h2) / 3.0 AS prec,
             (h1 + h2) / 2.0 AS rec,
             (h1 + h2 / log2(3.0)) / (1.0 + 1.0 / log2(3.0)) AS ndcg,
             (h1 + CASE WHEN h2 = 1 THEN (h1 + h2) / 2.0
                        ELSE 0.0 END) / 2.0 AS ap
      FROM t
    )
    SELECT round(avg(prec), 6) AS precision_at_k,
           round(avg(rec), 6) AS recall_at_k,
           round(avg(ndcg), 6) AS ndcg_at_k,
           round(avg(ap), 6) AS mean_ap
    FROM m
    """,
)
def ranking_metrics(spark, sf_dir):
    """RankingEvaluator (recommendation/RankingMetrics analog) over
    deterministic prediction/label arrays built so every positional
    hit is a closed-form function of the order key — precision/recall/
    NDCG/MAP@3 all reduce to SQL the oracle replicates exactly."""
    from mmlspark_spark.ml import RankingEvaluator

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    o = F.col("o_orderkey")
    df = orders.select(
        F.array(o % 5, o % 3 + 5, o % 2 + 10).alias("prediction"),
        F.array(
            F.when(o % 3 == 0, o % 5).otherwise(F.lit(50)),
            F.when(o % 2 == 0, o % 3).otherwise((o + 1) % 3) + 5,
        ).alias("label"))
    got = RankingEvaluator(k=3).evaluate(df)
    return spark.createDataFrame(
        [(round(got["precisionAtK"], 6), round(got["recallAtK"], 6),
          round(got["ndcgAt"], 6), round(got["map"], 6))],
        "precision_at_k double, recall_at_k double, ndcg_at_k double, "
        "mean_ap double")


@register(
    "featurize_numeric",
    oracle="""
    WITH src AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 <> 0
                  THEN CAST(c_acctbal AS DOUBLE) END AS bal
      FROM customer
    )
    SELECT c_custkey,
           round(coalesce(bal, (SELECT avg(bal) FROM src)), 4) AS f0
    FROM src
    """,
)
def featurize_numeric(spark, sf_dir):
    """Featurize auto-pipeline, numeric path (Featurize.scala:
    mean-impute + assemble): nulls planted on every 10th customer must
    come back as the fit-data mean, checked against DuckDB's avg."""
    from mmlspark_spark.featurize import Featurize
    from mmlspark_spark.functions.vector import get_value_at

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 != 0,
               F.col("c_acctbal").cast("double")).alias("bal"))
    model = Featurize(inputCols=["bal"], outputCol="features").fit(cust)
    out = model.transform(cust)
    return out.select(
        "c_custkey", F.round(get_value_at("features", 0), 4).alias("f0"))


@register(
    "tabular_shap_exact",
    oracle="""
    WITH b AS (
      SELECT l_quantity AS bq, l_discount AS bd, l_tax AS bt
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1
    ),
    p AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 10
    )
    SELECT l_orderkey, l_linenumber,
           round(2 * bq + 10 * bd - 3 * bt, 4) + 0 AS base,
           round(2 * (l_quantity - bq), 4) + 0 AS phi_q,
           round(10 * (l_discount - bd), 4) + 0 AS phi_d,
           round(-3 * (l_tax - bt), 4) + 0 AS phi_t
    FROM p, b
    """,
)
def tabular_shap_exact(spark, sf_dir):
    """KernelSHAP in EXACT mode (complete coalition enumeration when
    2^m - 2 <= numSamples) over a linear model with a single background
    row — Shapley values are then closed-form (phi_i = w_i (x_i - b_i),
    base = f(b)), so the whole explainer path is hash-checked against
    SQL, not just rows-counted."""
    from mmlspark_spark.explainers import TabularSHAP
    from mmlspark_spark.operators import Lambda

    li = _t(spark, sf_dir, "lineitem")
    ordered = li.orderBy("l_orderkey", "l_linenumber")
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        2.0 * F.col("l_quantity") + 10.0 * F.col("l_discount")
        - 3.0 * F.col("l_tax")))
    shap = TabularSHAP(
        model=model, inputCols=["l_quantity", "l_discount", "l_tax"],
        backgroundData=ordered.limit(1), targetCol="prediction",
        numSamples=64, seed=7)
    out = shap.transform(ordered.limit(10))
    # "+ 0" on both sides canonicalizes IEEE -0.0 to 0.0 (DuckDB's
    # round keeps the sign of zero; the driver value-hash is
    # repr-sensitive, so -0.0 vs 0.0 is a hash miss).
    return out.select(
        "l_orderkey", "l_linenumber",
        (F.round(F.col("shapValues")[0], 4) + 0).alias("base"),
        (F.round(F.col("shapValues")[1], 4) + 0).alias("phi_q"),
        (F.round(F.col("shapValues")[2], 4) + 0).alias("phi_d"),
        (F.round(F.col("shapValues")[3], 4) + 0).alias("phi_t"))


@register(
    "tabular_lime_exact",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(2.0 AS DOUBLE) AS w_q,
           CAST(10.0 AS DOUBLE) AS w_d,
           CAST(-3.0 AS DOUBLE) AS w_t,
           CAST(1.0 AS DOUBLE) AS r2
    FROM (SELECT l_orderkey, l_linenumber FROM lineitem
          ORDER BY l_orderkey, l_linenumber LIMIT 10)
    """,
)
def tabular_lime_exact(spark, sf_dir):
    """TabularLIME in its analytically-solvable regime: zero
    regularization degenerates the per-id lasso to weighted least
    squares, and on an exactly-LINEAR model WLS recovers the model's
    own coefficients for ANY sample draw and ANY kernel weights (the
    64-sample Gaussian design is full-rank over 3 features), with
    r² = 1. The whole sample→score→solve→join dataflow — the same
    pipeline the rows-only ``tabular_lime`` exercises with a
    non-linear model — is therefore hash-checked against its closed
    form, mirroring ``tabular_shap_exact``'s complete-enumeration
    mode. Reference LIMEBase.scala:95-114 (the per-id weighted solve,
    regularization param included)."""
    from mmlspark_spark.explainers import TabularLIME
    from mmlspark_spark.operators import Lambda

    li = _t(spark, sf_dir, "lineitem")
    ordered = li.orderBy("l_orderkey", "l_linenumber")
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        2.0 * F.col("l_quantity") + 10.0 * F.col("l_discount")
        - 3.0 * F.col("l_tax")))
    lime = TabularLIME(
        model=model, inputCols=["l_quantity", "l_discount", "l_tax"],
        backgroundData=ordered.limit(200), targetCol="prediction",
        numSamples=64, regularization=0.0, seed=7)
    out = lime.transform(ordered.limit(10))
    # "+ 0" canonicalizes IEEE -0.0 (see tabular_shap_exact)
    return out.select(
        "l_orderkey", "l_linenumber",
        (F.round(F.col("explanation")[0], 4) + 0).alias("w_q"),
        (F.round(F.col("explanation")[1], 4) + 0).alias("w_d"),
        (F.round(F.col("explanation")[2], 4) + 0).alias("w_t"),
        (F.round(F.col("r2"), 6) + 0).alias("r2"))


@register(
    "sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS INT) AS n_tokens,
             doc_id % 8 AS shard
      FROM documents
    ),
    placed AS (
      SELECT doc_id, n_tokens, shard,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_before
      FROM toks
    )
    SELECT doc_id, n_tokens, shard,
           CAST(floor(cum_before / 512.0) AS BIGINT) AS seq_index,
           -- windowed sum is HUGEINT in DuckDB; without the cast the
           -- modulo surfaces as float64 and value-hashes differently
           -- from Spark's int64
           CAST(cum_before % 512 AS BIGINT) AS seq_offset
    FROM placed
    """,
)
def sequence_packing(spark, sf_dir):
    """SequencePacker: concatenate-then-chunk pretraining layout — each
    doc's (shard, window, offset) placement from a per-shard window
    cumsum; the oracle replicates the whole placement in SQL."""
    from mmlspark_spark.llm import SequencePacker

    docs = _t(spark, sf_dir, "documents")
    out = SequencePacker(idCol="doc_id", textCol="text",
                         maxTokens=512, numShards=8).transform(docs)
    return out.select("doc_id", "n_tokens", "shard", "seq_index",
                      "seq_offset")


@register(
    "decontamination",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 8 THEN
               list_transform(range(1, len(t) - 6),
                 i -> array_to_string(list_slice(t, i, i + 7), ' '))
             ELSE CAST([] AS VARCHAR[]) END) AS shingles
      FROM tok
    ),
    bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id < 50
    ),
    corpus AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id >= 50
    ),
    cnt AS (
      SELECT c.doc_id, count(*) AS n
      FROM corpus c JOIN bench b ON c.s = b.s GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(cnt.n, 0) AS INT) AS contaminated_count,
           coalesce(cnt.n, 0) >= 1 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id >= 50) d
    LEFT JOIN cnt USING (doc_id)
    """,
)
def decontamination(spark, sf_dir):
    """BenchmarkDecontaminator: corpus docs sharing >= 1 distinct word
    8-gram with the benchmark split (doc_id < 50 stands in for an eval
    suite) are flagged. The oracle recomputes the shingle intersection
    with string shingles — matching the engine's hashed-shingle counts
    exactly (64-bit collisions aside)."""
    from mmlspark_spark.llm import BenchmarkDecontaminator

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 50)
    corpus = docs.filter(F.col("doc_id") >= 50)
    out = BenchmarkDecontaminator(
        benchmarkData=bench, idCol="doc_id", textCol="text",
        n=8, minShingles=1).transform(corpus)
    return out.select("doc_id", "contaminated_count", "contaminated")


@register(
    "repetition_metrics",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
                         x -> x <> '') AS lines,
             list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lines,
             CASE WHEN len(t) >= 5 THEN
               list_transform(range(1, len(t) - 3),
                 i -> array_to_string(list_slice(t, i, i + 4), ' '))
             ELSE CAST([] AS VARCHAR[]) END AS g5
      FROM base
    )
    SELECT doc_id,
           round(CASE WHEN len(lines) > 0 THEN
             (len(lines) - len(list_distinct(lines)))
               / CAST(len(lines) AS DOUBLE) ELSE 0.0 END, 6)
             AS dup_line_frac,
           round(CASE WHEN len(g5) > 0 THEN
             (len(g5) - len(list_distinct(g5)))
               / CAST(len(g5) AS DOUBLE) ELSE 0.0 END, 6)
             AS dup_5gram_frac
    FROM grams
    """,
)
def repetition_metrics(spark, sf_dir):
    """Gopher-style repetition signals over documents: duplicate-line
    and duplicate-5-gram fractions, both single-map expressions (zero
    shuffle over 100 TB) with an exact SQL replica as oracle."""
    from mmlspark_spark.functions.text_quality import (
        dup_line_fraction,
        dup_ngram_fraction,
    )

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(dup_line_fraction("text"), 6).alias("dup_line_frac"),
        F.round(dup_ngram_fraction("text", 5), 6).alias("dup_5gram_frac"))


@register(
    "pii_redact",
    oracle=r"""
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        text || ' contact user' || doc_id
             || '@example.com or 555-867-5309, host 10.0.'
             || (doc_id % 256) || '.7',
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS redacted
    FROM documents WHERE doc_id < 1000
    """,
)
def pii_redact(spark, sf_dir):
    """PII scrub stage (training-pipeline extras): emails / SSNs /
    phones / IPv4s replaced by redaction tokens, as a pure map-only
    regexp chain. PII is PLANTED per row (the synthetic corpus has
    none) so the oracle exercises real redaction, not an identity."""
    from mmlspark_spark.llm import PIIRedactor

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-867-5309, host 10.0."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
        ).alias("text"))
    out = PIIRedactor(textCol="text", outputCol="redacted").transform(planted)
    return out.select("doc_id", "redacted")


@register(
    "url_extract",
    oracle=r"""
    SELECT doc_id,
      array_to_string(regexp_extract_all(
        'see https://site' || (doc_id % 10)
          || '.example.org/p?x=1 and http://cdn.example.net/img ' || text,
        'https?://(?:[^/\s@]+@)?([^/\s:@]+)', 1), ' ') AS domains
    FROM documents WHERE doc_id < 1000
    """,
)
def url_extract(spark, sf_dir):
    """Domain extraction for domain-level corpus filtering (planted
    URLs, same rationale as pii_redact)."""
    from mmlspark_spark.llm import extract_domains

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("see https://site"), (F.col("doc_id") % 10).cast("string"),
            F.lit(".example.org/p?x=1 and http://cdn.example.net/img "),
            F.col("text"),
        ).alias("text"))
    # joined to a scalar string: no hash-green driver row has ever
    # carried a raw array column, so don't make this query the first
    # to probe the driver's array hashing
    return planted.select(
        "doc_id",
        F.array_join(extract_domains("text"), " ").alias("domains"))


@register(
    "incremental_dedup",
    oracle="""
    SELECT d.doc_id
    FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents r
      WHERE r.doc_id % 5 = 0
        AND (r.text = d.text OR (r.text IS NULL AND d.text IS NULL)))
    """,
)
def incremental_dedup_q(spark, sf_dir):
    """Ingestion-time dedup of a batch against an already-ingested
    registry (here: every 5th document plays the registry) via
    llm.IncrementalDeduplicator — bloom negatives pass MAP-ONLY
    without shuffling; only bloom positives take the exact confirm
    join, and the result is byte-identical to the plain anti join the
    oracle states."""
    from mmlspark_spark.llm import IncrementalDeduplicator

    docs = _t(spark, sf_dir, "documents")
    reference = docs.filter(F.col("doc_id") % 5 == 0)
    from mmlspark_spark.core.cache import propagate_intermediates

    dedup = IncrementalDeduplicator(
        referenceDf=reference, keyCols=["text"], mode="drop",
        bloomBits=1 << 17, bloomHashes=5)
    out = dedup.transform(docs)
    # select() would strip the persisted-registry handle (cache leak)
    return propagate_intermediates(out, out.select("doc_id"))


def _exact_match_oracle(dead: str | None = None,
                        cap: int = 1000) -> str:
    """Replays IncrementalDeduplicator.match_against_index: the batch
    is a reproducible construction over documents (every 7th doc
    copied verbatim under a new id — the re-crawled duplicates — plus
    every 11th doc salted with a suffix — the novel rows the bloom
    and the join must both pass through untouched); the stored side
    is docs < 400. Equality on the 128-bit content hash is equality
    on the null-safe key itself (collisions ~2^-96, the operator's
    own documented contract), so the oracle joins on the raw text
    with IS NOT DISTINCT FROM — the same NULL==NULL semantics
    functions/keys.py serializes. ``dead`` (a doc_id predicate)
    replays a pending tombstone set: masked ids leave the stored
    side BEFORE the hot-key cap count. The cap counts STORED members
    per key (match-time semantics), replayed in the ok CTE."""
    stored = f"doc_id < 400" + (f" AND NOT ({dead})" if dead else "")
    return f"""
    WITH batch AS (
      SELECT doc_id + 10000 AS doc_id, text
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 20000 AS doc_id, text || ' qq' AS text
      FROM documents WHERE doc_id % 11 = 0
    ), stored AS (
      SELECT doc_id, text FROM documents WHERE {stored}
    ), touched AS (
      SELECT s.doc_id, s.text FROM stored s
      WHERE EXISTS (SELECT 1 FROM batch b
                    WHERE b.text IS NOT DISTINCT FROM s.text)
    ), ok AS (
      SELECT text FROM touched GROUP BY text HAVING count(*) <= {cap}
    )
    SELECT b.doc_id AS doc_a, s.doc_id AS doc_b
    FROM batch b
    JOIN touched s ON b.text IS NOT DISTINCT FROM s.text
    JOIN ok ON ok.text IS NOT DISTINCT FROM s.text
    """


def _exact_match_frames(spark, sf_dir):
    """(stored, batch) frames shared by the two exact-match lanes —
    the batch construction must stay in lockstep with
    _exact_match_oracle's batch CTE."""
    docs = _t(spark, sf_dir, "documents")
    batch = (docs.filter(F.col("doc_id") % 7 == 0)
             .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
             .unionByName(
                 docs.filter(F.col("doc_id") % 11 == 0)
                 .select((F.col("doc_id") + 20000).alias("doc_id"),
                         F.concat(F.col("text"),
                                  F.lit(" qq")).alias("text"))))
    return docs.filter(F.col("doc_id") < 400), batch


@register("exact_match_indexed", oracle=_exact_match_oracle())
def exact_match_indexed(spark, sf_dir):
    """Incremental EXACT-dup screening against a PERSISTED content-
    hash registry (round 13 — the exact family joins the stored-index
    matrix): the stored corpus (docs < 400) was hashed ONCE into the
    prefix-partitioned registry + bloom sidecar
    (IncrementalDeduplicator.save_index); the incoming batch hashes
    only itself, bloom-prunes map-side, prefix-prunes the stored
    directories, and one 128-bit equi-join emits (batch doc, stored
    doc) pairs. The oracle replays the match-time semantics over the
    raw null-safe key (hash equality == key equality at the operator's
    documented collision bound)."""
    import os

    from mmlspark_spark.llm import IncrementalDeduplicator

    stored, batch = _exact_match_frames(spark, sf_dir)
    # prefixBits sized to the stored corpus (400 docs -> 32 dirs):
    # the 2^prefixBits directory fanout is the artifact-creation
    # constant, and the production guidance (size it so
    # corpus/2^prefixBits is an affordable scan) applies at sf0.01
    # exactly as at 10^12 docs
    dd = IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                 bloomBits=1 << 17, prefixBits=5)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"exact_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(stored, path)
    return dd.match_against_index(dd.load_index(spark, path), batch)


@register("exact_match_tombstoned",
          oracle=_exact_match_oracle(dead="doc_id % 5 = 0"))
def exact_match_tombstoned(spark, sf_dir):
    """The DELETE half of the exact registry's lifecycle under the
    driver's hash gate: the stored corpus tombstones every 5th doc
    (metadata-only — and the bloom sidecar deliberately stays stale,
    over-approximating routing while the confirm join applies the
    mask), then the batch screens against the index. Masked ids
    leave the stored side BEFORE the hot-key cap, so matching equals
    a fresh index over the survivors — exactly what the oracle
    replays. save_index clears stale tombstones on overwrite, so the
    query is hermetic across repeated driver runs."""
    import os

    from mmlspark_spark.llm import IncrementalDeduplicator

    stored, batch = _exact_match_frames(spark, sf_dir)
    dd = IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                 bloomBits=1 << 17, prefixBits=5)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"exact_del_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(stored, path)
    dd.delete_from_index(
        stored.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
        path)
    return dd.match_against_index(dd.load_index(spark, path), batch)


@register(
    "exact_match_incremental",
    oracle="""
    WITH d1 AS (
      SELECT min(doc_id) AS doc_id, text FROM documents
      WHERE doc_id < 300 GROUP BY text
    ), d2 AS (
      SELECT min(doc_id) AS doc_id, text FROM documents
      WHERE doc_id >= 300 AND doc_id < 600 GROUP BY text
    ), appended AS (
      SELECT d2.doc_id, d2.text FROM d2
      WHERE NOT EXISTS (SELECT 1 FROM d1
                        WHERE d1.text IS NOT DISTINCT FROM d2.text)
    ), registry AS (
      SELECT doc_id, text FROM d1
      UNION ALL SELECT doc_id, text FROM appended
    ), batch AS (
      SELECT doc_id + 30000 AS doc_id, text FROM documents
      WHERE doc_id % 13 = 0 AND doc_id < 600
      UNION ALL
      SELECT doc_id + 40000 AS doc_id, text || ' zz' AS text
      FROM documents WHERE doc_id % 17 = 0
    )
    SELECT b.doc_id AS doc_a, s.doc_id AS doc_b
    FROM batch b
    JOIN registry s ON b.text IS NOT DISTINCT FROM s.text
    """,
)
def exact_match_incremental(spark, sf_dir):
    """The streaming ingest boundary under the driver's hash gate
    (round 14): two deterministic micro-batches flow through
    ``registry_ingest_foreach_batch`` — day 1 bootstraps the exact
    registry (within-batch copies collapse to the lowest id), day 2
    screens against it with drop semantics and appends only its
    survivors — then a third batch (verbatim re-crawls of both days
    under fresh ids + salted novels) matches against the GROWN
    artifact. The oracle replays registry growth in SQL: day-1
    distinct keys, plus day-2 keys absent from day 1, joined to the
    batch on the raw null-safe key (hash equality == key equality at
    the operator's documented 2^-96 collision bound). The registry
    holds one row per distinct key by construction, so the hot-key
    cap can never trip and needs no replay. The artifact directory is
    removed up front: an ingest topology GROWS an artifact (it never
    overwrites), so hermeticity across driver runs is the lane's job,
    not save_index's."""
    import os

    from mmlspark_spark.llm import IncrementalDeduplicator
    from mmlspark_spark.llm.index_common import _hadoop_fs
    from mmlspark_spark.streaming import registry_ingest_foreach_batch

    docs = _t(spark, sf_dir, "documents")
    day1 = docs.filter(F.col("doc_id") < 300).select("doc_id", "text")
    day2 = (docs.filter((F.col("doc_id") >= 300)
                        & (F.col("doc_id") < 600))
            .select("doc_id", "text"))
    batch = (docs.filter((F.col("doc_id") % 13 == 0)
                         & (F.col("doc_id") < 600))
             .select((F.col("doc_id") + 30000).alias("doc_id"), "text")
             .unionByName(
                 docs.filter(F.col("doc_id") % 17 == 0)
                 .select((F.col("doc_id") + 40000).alias("doc_id"),
                         F.concat(F.col("text"),
                                  F.lit(" zz")).alias("text"))))
    dd = IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                 bloomBits=1 << 17, prefixBits=5)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"exact_inc_{os.path.basename(sf_dir.rstrip('/'))}")
    fs, P = _hadoop_fs(spark, path)
    fs.delete(P(path), True)
    ingest = registry_ingest_foreach_batch(dd, path)
    ingest(day1, 0)
    ingest(day2, 1)
    return dd.match_against_index(dd.load_index(spark, path), batch)


@register(
    "warc_roundtrip",
    oracle="SELECT doc_id, text FROM documents WHERE text IS NOT NULL",
)
def warc_roundtrip(spark, sf_dir):
    """The crawl-format ingest surface under the driver's hash gate
    (round 14; round 15 re-gates the streaming-member decode +
    resource-record typing): every non-null document is re-published
    as WARC.gz ``resource`` records (``write_warc`` — per-record gzip
    members, one archive per partition, the Common Crawl convention)
    and read back through ``read_warc`` (binaryFile source + Arrow
    mapInPandas record parser, member-at-a-time gzip decode).
    Payloads are length-prefixed raw bytes, so the round trip is
    exact for arbitrary text — the oracle is simply the source
    table. The archive directory is rebuilt per run (a sink
    writes one file per partition; stale files from a wider previous
    partitioning would duplicate rows)."""
    import os
    import shutil

    from mmlspark_spark.sources import read_warc, write_warc

    docs = (_t(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull()))
    out = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"warc_rt_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(out, ignore_errors=True)
    payload = docs.select(
        F.concat(F.lit("doc://"),
                 F.col("doc_id").cast("string")).alias("target_uri"),
        F.encode("text", "UTF-8").alias("payload"))
    write_warc(payload.repartition(4), out)
    back = read_warc(spark, out)
    return back.select(
        F.substring("target_uri", 7, 2147483647).cast("long")
        .alias("doc_id"),
        F.decode("payload", "UTF-8").alias("text"))


@register(
    "heavy_hitters",
    oracle=r"""
    SELECT value, cnt FROM (
      SELECT t AS value, count(*) AS cnt
      FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS t
            FROM documents)
      GROUP BY t)
    ORDER BY cnt DESC, value LIMIT 50
    """,
)
def heavy_hitters_q(spark, sf_dir):
    """Exact top-50 most frequent tokens of the corpus via
    operators.HeavyHitters — the hot-key detector that feeds shingle
    caps and skew-salting factors. Partial-aggregated groupBy over
    |distinct tokens| + TakeOrderedAndProject (no global sort); ties
    broken by token so the LIMIT boundary is deterministic."""
    from mmlspark_spark.operators import HeavyHitters

    docs = _t(spark, sf_dir, "documents")
    return HeavyHitters(inputCol="text", k=50, tokenize=True).transform(docs)


@register(
    "line_dedup",
    oracle="""
    WITH docs2 AS (
      SELECT doc_id,
             'subscribe to our newsletter' || chr(10) || text || chr(10)
               || 'topic ' || (doc_id % 40) AS text
      FROM documents),
    ex AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos
      FROM docs2),
    hot AS (
      SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS df FROM ex GROUP BY line)
      WHERE df > 20)
    SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
    FROM ex WHERE line NOT IN (SELECT line FROM hot)
    GROUP BY doc_id
    """,
)
def line_dedup_q(spark, sf_dir):
    """CCNet-style boilerplate-line removal via llm.LineDeduplicator
    (planted: a footer in every doc — removed everywhere — and a
    'topic N' line shared by ~12 docs — under the threshold, kept).
    Lines shuffle as fixed-width hash lanes; the hot-line set
    broadcasts into a map-side anti join; docs reassemble in original
    line order."""
    from mmlspark_spark.llm import LineDeduplicator

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("subscribe to our newsletter\n"), F.col("text"),
                 F.lit("\ntopic "),
                 (F.col("doc_id") % 40).cast("string")).alias("text"))
    return LineDeduplicator(maxDocFrequency=20).transform(docs)


@register(
    "markup_strip",
    oracle=r"""
    SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(
               '<html><head><style>p { color: #' || (doc_id % 10)
                 || '; }</style><script type="text/javascript">var x = '
                 || doc_id || ';</script></head><body><!-- id '
                 || doc_id || ' --><p class="a">' || text
                 || '</p>&nbsp;&amp;&lt;tag&gt; &quot;q&#39;</body></html>',
               '(?s)<script\b[^>]*>.*?</script>', ' ', 'g'),
               '(?s)<style\b[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
               '&nbsp;', ' ', 'g'),
               '&lt;', '<', 'g'),
               '&gt;', '>', 'g'),
               '&quot;', '"', 'g'),
               '&#39;|&apos;', '''', 'g'),
               '&amp;', '&', 'g'),
               '\s+', ' ', 'g')) AS clean
    FROM documents
    """,
)
def markup_strip_q(spark, sf_dir):
    """Web-corpus markup stripping via llm.MarkupStripper (planted
    HTML shell around each document: script + style bodies, comments,
    tags, the common entities). Pure regexp chain, map-only — the
    oracle replays the identical RE2-subset patterns with DuckDB's
    'g' flag."""
    from mmlspark_spark.llm import MarkupStripper

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><style>p { color: #"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit('; }</style><script type="text/javascript">var x = '),
            F.col("doc_id").cast("string"),
            F.lit(";</script></head><body><!-- id "),
            F.col("doc_id").cast("string"),
            F.lit(' --><p class="a">'), F.col("text"),
            F.lit("</p>&nbsp;&amp;&lt;tag&gt; &quot;q&#39;</body></html>"),
        ).alias("text"))
    return (MarkupStripper(textCol="text", outputCol="clean")
            .transform(planted).select("doc_id", "clean"))


@register(
    "perplexity_prune",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), uc AS (
      SELECT w, count(*) AS uc
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), v AS (SELECT count(*) AS v FROM uc),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS b
      FROM toks
    ), bc AS (SELECT b, count(*) AS bc FROM bg GROUP BY b),
    scored AS (
      SELECT g.doc_id,
             round(avg(ln((coalesce(bc.bc, 0) + 0.5)
                          / (coalesce(uc.uc, 0)
                             + 0.5 * (SELECT v FROM v)))), 6)
               AS avg_logprob
      FROM bg g LEFT JOIN bc ON g.b = bc.b LEFT JOIN uc ON g.w1 = uc.w
      GROUP BY g.doc_id
    ), thr AS (
      SELECT quantile_cont(avg_logprob, 0.75) AS thr FROM scored)
    SELECT doc_id, avg_logprob
    FROM scored WHERE avg_logprob >= (SELECT thr FROM thr)
    """)
def perplexity_prune(spark, sf_dir):
    """CCNet perplexity pruning as one pipeline: bigram-LM score every
    document (NGramLanguageModel, exact integer counts -> engine-
    portable probabilities), keep the most-fluent quartile. The
    quartile THRESHOLD comes from one exact-percentile aggregate
    broadcast back as a one-row frame — NOT from a global ntile sort,
    which would single-partition 100 TB; both engines use the same
    (n-1)p linear interpolation, and scores are 6dp-rounded before the
    compare so the boundary cannot flip. Docs with no bigrams score
    NULL and fall out on both sides."""
    from mmlspark_spark.core.cache import (
        attach_intermediates,
        persist_intermediate,
        propagate_intermediates,
    )
    from mmlspark_spark.llm import NGramLanguageModel

    docs = _t(spark, sf_dir, "documents")
    model = NGramLanguageModel(textCol="text", k=0.5, lowercase=True).fit(docs)
    model.set("idCol", "doc_id")
    raw = model.transform(docs)  # carries the persisted count frames
    # scored feeds BOTH the percentile aggregate and the filter —
    # persist it or the whole LM scoring dataflow runs twice
    scored = persist_intermediate(raw.select(
        "doc_id", F.round("avg_logprob", 6).alias("avg_logprob")))
    thr = scored.agg(
        F.percentile("avg_logprob", F.lit(0.75)).alias("__thr"))
    out = (scored.crossJoin(F.broadcast(thr))
           .filter(F.col("avg_logprob") >= F.col("__thr"))
           .select("doc_id", "avg_logprob"))
    out = propagate_intermediates(raw, out)
    return attach_intermediates(out, scored)


@register("bpe_tokenize", oracle=None)
def bpe_tokenize_q(spark, sf_dir):
    """Learned-subword tokenization (llm.BPETokenizer): fit a BPE
    merge table from the corpus word histogram (one vocabulary-sized
    shuffle; merge learning is driver-side over the histogram,
    corpus-size-independent), then tokenize map-only with per-word
    memoization. Rows-only: the merge loop is iterative and
    data-dependent, not SQL-expressible — semantics are pinned by
    hand-computed merge tests (tests/test_curation.py)."""
    from mmlspark_spark.llm import BPETokenizer

    docs = _t(spark, sf_dir, "documents")
    model = BPETokenizer(textCol="text", numMerges=200,
                         lowercase=True).fit(docs)
    # project to the two columns the lane needs BEFORE the opaque
    # encode map — mapInPandas defeats column pruning, so without
    # this every documents column rides the Arrow boundary (guide §4)
    return (model.transform(docs.select("doc_id", "text"))
            .select("doc_id", F.size("bpe_tokens").alias("n_bpe_tokens")))


@register(
    "scd2_merge",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           TRUE AS is_current, CAST(NULL AS VARCHAR) AS batch_id
    FROM customer WHERE c_custkey % 7 <> 0
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           FALSE, NULL
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal + 100, 4),
           c_mktsegment, TRUE, 'B1'
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
           c_mktsegment, TRUE, 'B1'
    FROM customer WHERE c_custkey % 100 = 0
    """)
def scd2_merge_q(spark, sf_dir):
    """MERGE INTO / SCD Type-2 apply (operators.SCD2Merge): a change
    batch (every 7th customer's balance moves; every 100th customer
    re-arrives under a new key) merges into the dimension — old
    versions retire to history, new versions and inserts stamp the
    batch id. The oracle derives the expected classification
    INDEPENDENTLY (set algebra over the planted batch), so it checks
    the merge semantics, not the operator's own join."""
    from mmlspark_spark.operators import SCD2Merge

    cust = _t(spark, sf_dir, "customer")
    updates = (cust.filter(F.col("c_custkey") % 7 == 0)
               .withColumn("c_acctbal",
                           F.round(F.col("c_acctbal") + 100, 4)))
    inserts = (cust.filter(F.col("c_custkey") % 100 == 0)
               .withColumn("c_custkey", F.col("c_custkey") + 1000000))
    merge = SCD2Merge(changesDf=updates.unionByName(inserts),
                      keyCols=["c_custkey"], batchId="B1")
    return merge.transform(cust)


@register(
    "funnel_steps",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT 'step1_view' AS step, count(*) AS users FROM t1
    UNION ALL SELECT 'step2_click', count(*) FROM t2
    UNION ALL SELECT 'step3_purchase', count(*) FROM t3
    """)
def funnel_steps_q(spark, sf_dir):
    """Ordered-funnel analysis (view -> click -> purchase, each step
    strictly after the user's first arrival at the previous step) —
    the product-analytics staple. Each step is a conditional min
    aggregate; the per-step user frames are user-cardinality small
    and broadcast into the next step's filter, so events scans stay
    map-filtered and only aggregate shuffles move data."""
    ev = _t(spark, sf_dir, "events")
    t1 = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("__t1")))
    t2 = (ev.filter(F.col("event_type") == "click")
          .join(F.broadcast(t1.withColumnRenamed("user_id", "__u1")),
                (F.col("user_id") == F.col("__u1"))
                & (F.col("ts") > F.col("__t1")))
          .groupBy("user_id").agg(F.min("ts").alias("__t2")))
    t3 = (ev.filter(F.col("event_type") == "purchase")
          .join(F.broadcast(t2.withColumnRenamed("user_id", "__u2")),
                (F.col("user_id") == F.col("__u2"))
                & (F.col("ts") > F.col("__t2")))
          .groupBy("user_id").agg(F.min("ts").alias("__t3")))
    def step(df, name):
        return df.agg(F.lit(name).alias("step"),
                      F.count("*").alias("users"))
    return (step(t1, "step1_view")
            .unionByName(step(t2, "step2_click"))
            .unionByName(step(t3, "step3_purchase")))


@register(
    "group_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """)
def group_percentiles_q(spark, sf_dir):
    """Exact per-group percentiles (latency/value SLO reporting):
    one ObjectHashAggregate pass computes all three quantiles per
    group — Spark's percentile and DuckDB's quantile_cont share the
    (n-1)p linear-interpolation definition, so the values compare
    hash-exact at 6dp. At 100 TB swap in approx_percentile (t-digest)
    — same plan shape, bounded state; the exact form is the oracled
    contract."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
                 F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
                 F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"))
            .orderBy("event_type"))


@register(
    "rolling_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate
             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW),
             4) AS rolling_90d
    FROM lineitem WHERE l_suppkey < 10
    """)
def rolling_revenue_q(spark, sf_dir):
    """Time-RANGE window frame (90-day trailing revenue per supplier)
    — the rangeBetween face of SURVEY §2.5 (row-frame windows are
    covered by sessionize/top_k). Spark's rangeBetween needs a numeric
    ordering key, so the frame runs over unix_micros(shipdate) with a
    90-day micros radius — peer rows (equal timestamps) enter the
    frame together in both engines, which is what makes RANGE (not
    ROWS) the deterministic choice under ties. Parquet timestamps load
    as TIMESTAMP_NTZ (Spark 4), which unix_micros rejects - the cast
    to TIMESTAMP is exact under the session UTC timezone. One shuffle
    on the partition key; frame state is a running sum, never the
    partition."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 10)
    w = (Window.partitionBy("l_suppkey")
         .orderBy(F.unix_micros(F.col("l_shipdate").cast("timestamp")))
         .rangeBetween(-90 * 86400 * 1_000_000, 0))
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 4).alias("rolling_90d"))


@register(
    "pagerank",
    oracle="""
    WITH e AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT node, 1.0 AS rank FROM n),
    r1 AS (
      SELECT n.node, 0.15 + 0.85 * coalesce(sum(r0.rank / deg.d), 0) AS rank
      FROM n LEFT JOIN e ON e.dst = n.node
      LEFT JOIN deg ON e.src = deg.src
      LEFT JOIN r0 ON r0.node = e.src
      GROUP BY n.node),
    r2 AS (
      SELECT n.node, 0.15 + 0.85 * coalesce(sum(r1.rank / deg.d), 0) AS rank
      FROM n LEFT JOIN e ON e.dst = n.node
      LEFT JOIN deg ON e.src = deg.src
      LEFT JOIN r1 ON r1.node = e.src
      GROUP BY n.node),
    r3 AS (
      SELECT n.node, 0.15 + 0.85 * coalesce(sum(r2.rank / deg.d), 0) AS rank
      FROM n LEFT JOIN e ON e.dst = n.node
      LEFT JOIN deg ON e.src = deg.src
      LEFT JOIN r2 ON r2.node = e.src
      GROUP BY n.node)
    SELECT node, round(rank, 6) AS rank FROM r3
    """)
def pagerank_q(spark, sf_dir):
    """Fixed-iteration PageRank over the customer->supplier purchase
    graph (operators.pagerank — the iterative-dataflow pattern: one
    src join + one dst aggregate per iteration, persisted edge/degree
    frames, lineage cut by checkpoint interval). Node ids are
    type-prefixed ('c'/'s') because customer and supplier keys share
    the integer space. The oracle unrolls the three iterations as
    chained CTEs — probabilities verify hash-exact at 6dp."""
    from mmlspark_spark.operators import pagerank as _pr

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.concat(F.lit("c"),
                              F.col("o_custkey").cast("string")).alias("src"),
                     F.concat(F.lit("s"),
                              F.col("l_suppkey").cast("string")).alias("dst")))
    ranks = _pr(edges, iterations=3, damping=0.85)
    from mmlspark_spark.core.cache import propagate_intermediates

    out = ranks.select("node", F.round("rank", 6).alias("rank"))
    return propagate_intermediates(ranks, out)


@register(
    "corpus_report",
    oracle="""
    SELECT CASE WHEN grouping(lang) = 1 THEN '<all>'
                ELSE coalesce(lang, '<null>') END AS lang,
           CASE WHEN grouping(source) = 1 THEN '<all>'
                ELSE coalesce(source, '<null>') END AS source,
           count(*) AS docs,
           CAST(sum(len(list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                               x -> x <> ''))) AS BIGINT) AS tokens,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
    """)
def corpus_report_q(spark, sf_dir):
    """Corpus composition report — the first artifact a curation run
    produces: doc/token/char totals at every roll-up level in ONE
    aggregation pass via GROUPING SETS (the generalized face of the
    cube/rollup queries; Spark expands the sets map-side, so the
    corpus scans once, not once per level). Roll-up cells are labelled
    via grouping() — coalesce alone could not distinguish the <all>
    cell from a document whose lang/source is genuinely NULL."""
    docs = _t(spark, sf_dir, "documents")
    # Explicit ASCII whitespace class: Java-regex \s and DuckDB-RE2 \s
    # disagree on \x0B and Unicode spaces, so both sides pin the class
    # (single source: functions/text_quality.PINNED_WS_RE).
    from mmlspark_spark.functions.text_quality import PINNED_WS_RE

    tok = F.size(F.filter(F.split("text", PINNED_WS_RE),
                          lambda x: x != F.lit("")))
    return (docs
            .groupingSets([["lang", "source"], ["lang"], ["source"], []],
                          "lang", "source")
            .agg(F.count("*").alias("docs"),
                 F.sum(tok).alias("tokens"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"),
                 # grouping() only resolves inside the aggregate
                 F.grouping("lang").alias("__gl"),
                 F.grouping("source").alias("__gs"))
            .select(
                F.when(F.col("__gl") == 1, "<all>")
                .otherwise(F.coalesce("lang", F.lit("<null>")))
                .alias("lang"),
                F.when(F.col("__gs") == 1, "<all>")
                .otherwise(F.coalesce("source", F.lit("<null>")))
                .alias("source"),
                "docs", "tokens", "avg_chars"))
