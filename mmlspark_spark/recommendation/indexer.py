"""RecommendationIndexer — paired user/item string indexing.

Parity: reference ``core/.../recommendation/RecommendationIndexer.scala:
18-100`` (a user StringIndexer + an item StringIndexer fitted together,
with inverse transforms to recover original ids).
"""

from __future__ import annotations

from pyspark.ml.feature import IndexToString, StringIndexer, StringIndexerModel
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model


class RecommendationIndexer(Estimator):
    def __init__(
        self,
        userInputCol: str = "user",
        userOutputCol: str = "user_idx",
        itemInputCol: str = "item",
        itemOutputCol: str = "item_idx",
    ):
        super().__init__(
            userInputCol=userInputCol, userOutputCol=userOutputCol,
            itemInputCol=itemInputCol, itemOutputCol=itemOutputCol,
        )

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.userInputCol, self.itemInputCol)
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.userOutputCol, T.DoubleType(), False),
               T.StructField(self.itemOutputCol, T.DoubleType(), False)]
        )

    def _fit(self, df: DataFrame) -> "RecommendationIndexerModel":
        # ONE multi-column fit: two separate StringIndexer fits scanned
        # the interactions table twice to build the two label maps
        both = StringIndexer(
            inputCols=[self.userInputCol, self.itemInputCol],
            outputCols=[self.userOutputCol, self.itemOutputCol],
            handleInvalid="skip", stringOrderType="alphabetAsc",
        ).fit(df)
        user_model = StringIndexerModel.from_labels(
            both.labelsArray[0], inputCol=self.userInputCol,
            outputCol=self.userOutputCol, handleInvalid="skip")
        item_model = StringIndexerModel.from_labels(
            both.labelsArray[1], inputCol=self.itemInputCol,
            outputCol=self.itemOutputCol, handleInvalid="skip")
        return RecommendationIndexerModel(
            userIndexModel=user_model, itemIndexModel=item_model,
            userInputCol=self.userInputCol, userOutputCol=self.userOutputCol,
            itemInputCol=self.itemInputCol, itemOutputCol=self.itemOutputCol,
        )


class RecommendationIndexerModel(Model):
    def __init__(self, userIndexModel: StringIndexerModel = None,
                 itemIndexModel: StringIndexerModel = None,
                 userInputCol: str = "user", userOutputCol: str = "user_idx",
                 itemInputCol: str = "item", itemOutputCol: str = "item_idx"):
        super().__init__(
            userIndexModel=userIndexModel, itemIndexModel=itemIndexModel,
            userInputCol=userInputCol, userOutputCol=userOutputCol,
            itemInputCol=itemInputCol, itemOutputCol=itemOutputCol,
        )

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.userInputCol, self.itemInputCol)
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.userOutputCol, T.DoubleType(), False),
               T.StructField(self.itemOutputCol, T.DoubleType(), False)]
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.itemIndexModel.transform(self.userIndexModel.transform(df))

    @staticmethod
    def _recover_name(df: DataFrame, preferred: str) -> str:
        # the transformed frame usually still CARRIES the original
        # column; IndexToString refuses to overwrite, so fall back to
        # a _recovered suffix instead of throwing
        return (preferred if preferred not in df.columns
                else f"{preferred}_recovered")

    def recover_user(self, df: DataFrame, inputCol: str | None = None,
                     outputCol: str | None = None) -> DataFrame:
        return IndexToString(
            inputCol=inputCol or self.userOutputCol,
            outputCol=outputCol or self._recover_name(df, self.userInputCol),
            labels=self.userIndexModel.labels,
        ).transform(df)

    def recover_item(self, df: DataFrame, inputCol: str | None = None,
                     outputCol: str | None = None) -> DataFrame:
        return IndexToString(
            inputCol=inputCol or self.itemOutputCol,
            outputCol=outputCol or self._recover_name(df, self.itemInputCol),
            labels=self.itemIndexModel.labels,
        ).transform(df)
