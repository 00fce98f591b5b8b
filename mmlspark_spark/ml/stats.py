"""Model evaluation statistics.

Parity: reference ``core/.../train/ComputeModelStatistics.scala:58-328``
(confusion matrix, accuracy/precision/recall, AUC; regression
mse/rmse/r2/mae — metric vocabulary from
``core/.../core/metrics/MetricConstants.scala:10-66``) and
``train/ComputePerInstanceStatistics.scala:51-106``.

Everything is DataFrame aggregations (confusion matrix =
groupBy(label,pred).count; AUC = rank-statistic window formula), so
metrics compute in O(1) driver memory at any scale — unlike the
reference's RDD-based MulticlassMetrics which collects per-class maps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from mmlspark_spark.core.base import Transformer
from mmlspark_spark.ml.train import SCORED_LABELS_COL, SCORED_PROBABILITIES_COL, SCORES_COL


def auc_binary(df: DataFrame, label_col: str, score_col,
               positive_label=1.0) -> float:
    """AUROC via the Mann-Whitney rank statistic: one DISTRIBUTED sort
    + one agg, no driver-side curve construction.
    AUC = (sum of positive ranks - nPos(nPos+1)/2) / (nPos * nNeg).

    Ranks come from a distributed range-sort + per-partition offsets
    (``zip_with_index``), NOT a partition-less ``Window.orderBy`` —
    the latter funnels the whole dataset through one task, which
    contradicts the at-any-scale contract. Tie groups get averaged
    ranks, so the statistic is deterministic even though equal scores
    order arbitrarily. ``positive_label`` names the positive class
    explicitly (hardcoding 1.0 silently inverted AUC for {1,2}-style
    label encodings)."""
    from mmlspark_spark.operators.scale import zip_with_index

    scored = df.select(
        F.col(label_col).alias("y"),  # raw: string labels must not cast
        (F.col(score_col) if isinstance(score_col, str) else score_col)
        .cast("double").alias("s"),
    )
    ranked = zip_with_index(scored, start_index=1, col_name="r",
                            order_by_col="s")
    # average ranks within tie groups (hash-partitioned by s)
    ranked = ranked.withColumn(
        "ravg", F.avg("r").over(Window.partitionBy("s")))
    pos = F.col("y").eqNullSafe(F.lit(positive_label))
    agg = ranked.agg(
        F.sum(F.when(pos, F.col("ravg"))).alias("rpos"),
        F.sum(F.when(pos, 1).otherwise(0)).alias("npos"),
        F.sum(F.when(~pos, 1).otherwise(0)).alias("nneg"),
    ).collect()[0]
    if not agg.npos or not agg.nneg:
        return float("nan")
    return float((agg.rpos - agg.npos * (agg.npos + 1) / 2.0)
                 / (agg.npos * agg.nneg))


class ComputeModelStatistics(Transformer):
    """``evaluationMetric``: 'classification' | 'regression'.
    transform returns a ONE-ROW metrics DataFrame; ``confusion_matrix``
    (classification) is also available via :meth:`confusion_matrix`."""

    def __init__(self, evaluationMetric: str = "classification",  # noqa: D107
                 labelCol: str = "label", scoresCol: str = SCORES_COL,
                 scoredLabelsCol: str = SCORED_LABELS_COL,
                 scoredProbabilitiesCol: str = SCORED_PROBABILITIES_COL):
        super().__init__(evaluationMetric=evaluationMetric, labelCol=labelCol,
                         scoresCol=scoresCol, scoredLabelsCol=scoredLabelsCol,
                         scoredProbabilitiesCol=scoredProbabilitiesCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        if self.evaluationMetric == "regression":
            names = ["mse", "rmse", "r2", "mae"]
        else:
            names = ["accuracy", "precision", "recall", "AUC"]
        return T.StructType([T.StructField(n, T.DoubleType(), True) for n in names])

    def confusion_matrix(self, df: DataFrame) -> DataFrame:
        """(label, scored_label, count) — pivot client-side if needed.
        Raw values, no double cast: string labels are legal (ANSI mode
        would throw CAST_INVALID_INPUT), and Python-side numeric
        comparisons coerce 1 == 1.0 anyway."""
        return (
            df.groupBy(F.col(self.labelCol).alias("label"),
                       F.col(self.scoredLabelsCol).alias("scored_label"))
            .agg(F.count("*").alias("count"))
        )

    def _regression(self, df: DataFrame) -> DataFrame:
        y = F.col(self.labelCol).cast("double")
        p = F.col(self.scoresCol).cast("double")
        moments = df.agg(
            F.avg((y - p) ** 2).alias("mse"),
            F.avg(F.abs(y - p)).alias("mae"),
            F.sum((y - p) ** 2).alias("sse"),
            F.sum(y ** 2).alias("syy"),
            F.sum(y).alias("sy"),
            F.count(F.lit(1)).alias("n"),
        )
        # SST from moments: sum(y^2) - n * mean(y)^2
        return moments.select(
            F.col("mse"),
            F.sqrt(F.col("mse")).alias("rmse"),
            (F.lit(1.0) - F.col("sse")
             / (F.col("syy") - F.col("sy") ** 2 / F.col("n"))).alias("r2"),
            F.col("mae"),
        )

    def _classification(self, df: DataFrame) -> DataFrame:
        # RAW equality (null-safe), not double casts: string labels
        # (TrainClassifier now maps predictions back to label space)
        # would throw CAST_INVALID_INPUT under ANSI mode; numeric
        # comparisons coerce exactly as before
        y = F.col(self.labelCol)
        p = F.col(self.scoredLabelsCol)
        spark = df.sparkSession
        base = df.agg(
            F.avg(F.when(y.eqNullSafe(p), 1.0).otherwise(0.0)).alias("accuracy"),
            # macro-averaged precision/recall computed below; keep counts
        ).collect()[0]
        cm = self.confusion_matrix(df).collect()
        # macro precision/recall from the (tiny) confusion matrix
        classes = sorted({r.label for r in cm} | {r.scored_label for r in cm})
        tp = {c: sum(r["count"] for r in cm if r.label == c and r.scored_label == c)
              for c in classes}
        pred_tot = {c: sum(r["count"] for r in cm if r.scored_label == c)
                    for c in classes}
        label_tot = {c: sum(r["count"] for r in cm if r.label == c) for c in classes}
        precisions = [tp[c] / pred_tot[c] for c in classes if pred_tot[c]]
        recalls = [tp[c] / label_tot[c] for c in classes if label_tot[c]]
        precision = sum(precisions) / len(precisions) if precisions else float("nan")
        recall = sum(recalls) / len(recalls) if recalls else float("nan")
        if len(classes) == 2 and self.scoredProbabilitiesCol in df.columns:
            from pyspark.ml.functions import vector_to_array

            # positive class = the LARGER label value; its probability
            # sits at its index in sorted label order (the convention
            # the engine's own TrainClassifier produces). Hardcoding
            # label 1.0 / index 1 returned AUC 0.0 for a perfect
            # classifier under a {1,2} label encoding.
            positive = max(classes)
            pos_idx = sorted(classes).index(positive)
            auc = auc_binary(
                df, self.labelCol,
                vector_to_array(F.col(self.scoredProbabilitiesCol))[pos_idx],
                positive_label=positive)
        else:
            auc = float("nan")
        return spark.createDataFrame(
            [(float(base.accuracy), float(precision), float(recall), float(auc))],
            self.transform_schema(df.schema),
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        if self.evaluationMetric == "regression":
            return self._regression(df)
        return self._classification(df)


class ComputePerInstanceStatistics(Transformer):
    """Per-row metrics: log_loss (classification, from scored
    probabilities) or L1/L2 losses (regression). Column expressions only
    (the reference uses UDFs — ComputePerInstanceStatistics.scala:77-99)."""

    def __init__(self, evaluationMetric: str = "classification",  # noqa: D107
                 labelCol: str = "label", scoresCol: str = SCORES_COL,
                 scoredLabelsCol: str = SCORED_LABELS_COL,
                 scoredProbabilitiesCol: str = SCORED_PROBABILITIES_COL,
                 epsilon: float = 1e-15):
        super().__init__(evaluationMetric=evaluationMetric, labelCol=labelCol,
                         scoresCol=scoresCol, scoredLabelsCol=scoredLabelsCol,
                         scoredProbabilitiesCol=scoredProbabilitiesCol,
                         epsilon=epsilon)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        # eager contract: declare the appended metric columns and
        # require the inputs each metric actually reads
        if self.evaluationMetric == "regression":
            self._require_cols(schema, self.labelCol, self.scoresCol)
            added = [T.StructField("L1_loss", T.DoubleType()),
                     T.StructField("L2_loss", T.DoubleType())]
        else:
            self._require_cols(schema, self.labelCol,
                               self.scoredProbabilitiesCol)
            added = [T.StructField("log_loss", T.DoubleType())]
        return T.StructType(list(schema.fields) + added)

    def _transform(self, df: DataFrame) -> DataFrame:
        y = F.col(self.labelCol).cast("double")
        if self.evaluationMetric == "regression":
            p = F.col(self.scoresCol).cast("double")
            return (df.withColumn("L1_loss", F.abs(y - p))
                      .withColumn("L2_loss", (y - p) ** 2))
        from pyspark.ml.functions import vector_to_array

        probs = vector_to_array(F.col(self.scoredProbabilitiesCol))
        p_true = F.element_at(probs, y.cast("int") + 1)
        clipped = F.greatest(F.least(p_true, F.lit(1 - self.epsilon)),
                             F.lit(self.epsilon))
        return df.withColumn("log_loss", -F.log(clipped))
