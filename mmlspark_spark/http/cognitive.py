"""Declarative web-service stages (cognitive-services family).

Parity: reference ``cognitive/.../CognitiveServiceBase.scala:155-217``
(HasCognitiveServiceInput.inputFunc + HasInternalJsonOutputParser) and
the per-service subclasses in TextAnalytics.scala:175-320,
AnomalyDetection.scala:119-250. Each service = a URL (user-supplied
endpoint), a JVM-side entity builder (``to_json`` over a struct), and a
typed ``from_json`` response schema — all riding the generic
``SimpleHTTPTransformer`` machinery; no per-service python code runs
per row.

The services take an explicit ``url`` (self-hosted or Azure endpoint)
and optional ``subscriptionKey`` header — network access and vendor
accounts are deliberately not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer
from mmlspark_spark.http.transformer import (
    HTTPTransformer,
    JSONOutputParser,
)
from mmlspark_spark.http.schema import HTTP_RESPONSE_SCHEMA, http_request


class _JsonServiceBase(Transformer):
    """url + entity-builder + response dataType declared by subclass."""

    #: override: response payload schema
    RESPONSE_TYPE: T.DataType = T.StringType()

    def __init__(self, **kwargs):
        kwargs.setdefault("concurrency", 8)
        kwargs.setdefault("timeout", 60.0)
        kwargs.setdefault("subscriptionKey", None)
        super().__init__(**kwargs)

    def _entity(self, df: DataFrame) -> F.Column:
        raise NotImplementedError

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, self.RESPONSE_TYPE),
            T.StructField(self.outputCol + "_error", HTTP_RESPONSE_SCHEMA),
        ])

    def _transform(self, df: DataFrame) -> DataFrame:
        headers = [F.struct(F.lit("Content-Type").alias("name"),
                            F.lit("application/json").alias("value"))]
        if self.subscriptionKey:
            headers.append(F.struct(
                F.lit("Ocp-Apim-Subscription-Key").alias("name"),
                F.lit(self.subscriptionKey).alias("value")))
        req = http_request(self.url, "POST",
                           entity=self._entity(df).cast("binary"),
                           headers=F.array(*headers))
        out = HTTPTransformer(
            inputCol="__request__", outputCol="__response__",
            concurrency=self.concurrency, timeout=self.timeout,
        ).transform(df.withColumn("__request__", req))
        ok = F.col("__response__")["statusCode"].between(200, 299)
        parsed = JSONOutputParser(
            inputCol="__response__", outputCol=self.outputCol,
            dataType=self.RESPONSE_TYPE).transform(out)
        return (parsed
                .withColumn(self.outputCol, F.when(ok, F.col(self.outputCol)))
                .withColumn(self.outputCol + "_error",
                            F.when(~ok, F.col("__response__")))
                .drop("__request__", "__response__"))


class _TextAnalyticsBase(_JsonServiceBase):
    """Documents-batch request shape {"documents":[{id,language,text}]}
    (TextAnalytics.scala:175-240)."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("documents", T.ArrayType(T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("keyPhrases", T.ArrayType(T.StringType())),
            T.StructField("entities", T.ArrayType(T.MapType(
                T.StringType(), T.StringType()))),
            T.StructField("detectedLanguages", T.ArrayType(T.StructType([
                T.StructField("name", T.StringType()),
                T.StructField("iso6391Name", T.StringType()),
                T.StructField("score", T.DoubleType()),
            ]))),
        ]))),
        T.StructField("errors", T.ArrayType(T.MapType(T.StringType(),
                                                      T.StringType()))),
    ])

    def __init__(self, url: str = "", textCol: str = "text",
                 languageCol: str | None = None, outputCol: str = "result",
                 **kw):
        super().__init__(url=url, textCol=textCol, languageCol=languageCol,
                         outputCol=outputCol, **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        doc = [F.lit("0").alias("id"), F.col(self.textCol).alias("text")]
        if self.languageCol:
            doc.append(F.col(self.languageCol).alias("language"))
        return F.to_json(F.struct(F.array(F.struct(*doc)).alias("documents")))


class TextSentiment(_TextAnalyticsBase):
    """cognitive/.../TextAnalytics.scala:246-258."""


class LanguageDetector(_TextAnalyticsBase):
    """TextAnalytics.scala:276-290."""


class KeyPhraseExtractor(_TextAnalyticsBase):
    """TextAnalytics.scala:292-306."""


class NER(_TextAnalyticsBase):
    """TextAnalytics.scala:308-320."""


class EntityDetector(_TextAnalyticsBase):
    """TextAnalytics.scala:260-274."""


class DetectAnomalies(_JsonServiceBase):
    """Anomaly Detector batch API (AnomalyDetection.scala:119-180):
    series of {timestamp, value} points → per-point isAnomaly flags."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("isAnomaly", T.ArrayType(T.BooleanType())),
        T.StructField("expectedValues", T.ArrayType(T.DoubleType())),
        T.StructField("upperMargins", T.ArrayType(T.DoubleType())),
        T.StructField("lowerMargins", T.ArrayType(T.DoubleType())),
    ])

    def __init__(self, url: str = "", seriesCol: str = "series",
                 granularity: str = "hourly", outputCol: str = "anomalies",
                 **kw):
        super().__init__(url=url, seriesCol=seriesCol, granularity=granularity,
                         outputCol=outputCol, **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        return F.to_json(F.struct(
            F.col(self.seriesCol).alias("series"),
            F.lit(self.granularity).alias("granularity")))
