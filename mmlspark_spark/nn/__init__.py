"""Nearest-neighbor stages.

Parity: reference ``core/.../nn/KNN.scala``, ``nn/ConditionalKNN.scala``,
``nn/BallTree.scala``.
"""

from mmlspark_spark.nn.knn import KNN, KNNModel, ConditionalKNN, ConditionalKNNModel

__all__ = ["KNN", "KNNModel", "ConditionalKNN", "ConditionalKNNModel"]
