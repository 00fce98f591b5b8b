"""Plotting helpers over scored DataFrames.

Parity: reference ``core/src/main/python/mmlspark/plot/plot.py:17-52``
(confusionMatrix + roc matplotlib helpers).

The metric **data** is computed distributed (DataFrame aggs — usable
headless); the drawing step is import-gated on matplotlib, which is not
in this container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix_data(df: DataFrame, labelCol: str = "label",
                          predictionCol: str = "prediction"):
    """(labels, matrix) where matrix[i][j] = count(label=i, pred=j).
    NULL labels/predictions form their own row/column (a bare sorted()
    would TypeError comparing None with numbers)."""
    counts = (df.groupBy(labelCol, predictionCol).count().collect())
    labels = sorted({r[labelCol] for r in counts}
                    | {r[predictionCol] for r in counts},
                    key=lambda v: (v is None, str(type(v)), v if v is not None else 0))
    idx = {v: i for i, v in enumerate(labels)}
    matrix = [[0] * len(labels) for _ in labels]
    for r in counts:
        matrix[idx[r[labelCol]]][idx[r[predictionCol]]] = r["count"]
    return labels, matrix


def roc_data(df: DataFrame, labelCol: str = "label",
             scoreCol: str = "score", num_thresholds: int = 100):
    """[(fpr, tpr)] sweep — one aggregation per scan over binned scores."""
    # NULL scores are EXCLUDED (F.least skips nulls, so they would
    # otherwise land in the top bin as maximally-confident rows), and
    # the bin is clamped on BOTH ends — raw negative margins would get
    # negative bins the sweep never visits, deflating the curve so it
    # never reaches (1,1)
    agg = df.filter(F.col(scoreCol).isNotNull()).select(
        F.col(labelCol).cast("double").alias("y"),
        F.greatest(
            F.least(F.floor(F.col(scoreCol) * num_thresholds),
                    F.lit(num_thresholds - 1)),
            F.lit(0)).cast("int").alias("bin"),
    ).groupBy("bin").agg(
        F.sum("y").alias("pos"),
        (F.count("*") - F.sum("y")).alias("neg"),
    ).collect()
    pos_by_bin = {r.bin: r.pos for r in agg}
    neg_by_bin = {r.bin: r.neg for r in agg}
    total_pos = sum(pos_by_bin.values()) or 1
    total_neg = sum(neg_by_bin.values()) or 1
    points = []
    tp = fp = 0
    for b in range(num_thresholds - 1, -1, -1):  # descending threshold
        tp += pos_by_bin.get(b, 0)
        fp += neg_by_bin.get(b, 0)
        points.append((fp / total_neg, tp / total_pos))
    return [(0.0, 0.0)] + points


def confusionMatrix(df: DataFrame, labelCol: str = "label",
                    predictionCol: str = "prediction", ax=None):
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:  # check BEFORE paying the Spark job
        raise NotImplementedError(
            "matplotlib is not available in this container; use "
            "confusion_matrix_data() for the raw matrix") from e
    labels, matrix = confusion_matrix_data(df, labelCol, predictionCol)
    ax = ax or plt.gca()
    ax.imshow(matrix, cmap="Blues")
    ax.set_xticks(range(len(labels)), labels)
    ax.set_yticks(range(len(labels)), labels)
    ax.set_xlabel("predicted")
    ax.set_ylabel("label")
    return ax


def roc(df: DataFrame, labelCol: str = "label", scoreCol: str = "score",
        ax=None):
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:  # check BEFORE paying the Spark job
        raise NotImplementedError(
            "matplotlib is not available in this container; use "
            "roc_data() for the raw curve") from e
    points = roc_data(df, labelCol, scoreCol)
    ax = ax or plt.gca()
    ax.plot([p[0] for p in points], [p[1] for p in points])
    ax.plot([0, 1], [0, 1], linestyle="--")
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    return ax
