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

    CONTENT_TYPE = "application/json"

    def _entity(self, df: DataFrame) -> F.Column:
        raise NotImplementedError

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        clash = [c for c in ("__request__", "__response__")
                 if c in schema.fieldNames()]
        if clash:
            # same guard as SimpleHTTPTransformer: the working columns
            # are dropped at the end — silently destroying same-named
            # user columns is worse than an eager error
            raise ValueError(
                f"{type(self).__name__}: input already has internal "
                f"column(s) {clash}; rename them first")
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, self.RESPONSE_TYPE),
            T.StructField(self.outputCol + "_error", HTTP_RESPONSE_SCHEMA),
        ])

    def _headers(self) -> list:
        """Content-Type (overridable per service — speech posts raw
        audio, not JSON) + the subscription key when configured."""
        headers = [F.struct(F.lit("Content-Type").alias("name"),
                            F.lit(self.CONTENT_TYPE).alias("value"))]
        if self.subscriptionKey:
            headers.append(F.struct(
                F.lit("Ocp-Apim-Subscription-Key").alias("name"),
                F.lit(self.subscriptionKey).alias("value")))
        return headers

    def _transform(self, df: DataFrame) -> DataFrame:
        headers = self._headers()
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


class DetectLastAnomaly(DetectAnomalies):
    """Anomaly Detector /timeseries/last/detect
    (AnomalyDetection.scala:119-132): same series request, single-point
    response for the LAST point of the series."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("isAnomaly", T.BooleanType()),
        T.StructField("isPositiveAnomaly", T.BooleanType()),
        T.StructField("isNegativeAnomaly", T.BooleanType()),
        T.StructField("expectedValue", T.DoubleType()),
        T.StructField("upperMargin", T.DoubleType()),
        T.StructField("lowerMargin", T.DoubleType()),
        T.StructField("suggestedWindow", T.IntegerType()),
        T.StructField("period", T.IntegerType()),
    ])


class SimpleDetectAnomalies(_JsonServiceBase):
    """Row-shaped anomaly detection (AnomalyDetection.scala:152-250):
    rows are grouped by ``groupbyCol`` into one timestamp-sorted series
    per group (the reference's ``sortWithContext`` UDF is a pure
    ``array_sort(collect_list(struct(key, point, context)))`` here —
    struct ordering sorts by the leading key, a parsed epoch-seconds
    value (see ``_timestamp_sort_key``), carrying each row's full
    context through the same array), ONE entire-detect request is
    made per group, and the per-point responses are exploded back onto
    the original rows.

    Scale: the shuffle carries one struct per input row keyed by the
    series id; each group's API payload is bounded by the service's own
    series-length limit, and requests run pooled inside the generic
    HTTPTransformer like every other service stage.
    """

    SINGLE_TYPE = T.StructType([
        T.StructField("isAnomaly", T.BooleanType()),
        T.StructField("expectedValue", T.DoubleType()),
        T.StructField("upperMargin", T.DoubleType()),
        T.StructField("lowerMargin", T.DoubleType()),
    ])

    def __init__(self, url: str = "", timestampCol: str = "timestamp",
                 valueCol: str = "value", groupbyCol: str = "group",
                 granularity: str = "hourly", outputCol: str = "anomalies",
                 **kw):
        super().__init__(url=url, timestampCol=timestampCol,
                         valueCol=valueCol, groupbyCol=groupbyCol,
                         granularity=granularity, outputCol=outputCol, **kw)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.timestampCol, self.valueCol,
                           self.groupbyCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, self.SINGLE_TYPE),
            T.StructField(self.outputCol + "_error", HTTP_RESPONSE_SCHEMA),
        ])

    def _timestamp_sort_key(self, df: DataFrame):
        """Temporal sort key for the per-group series, as epoch seconds.

        The payload stringifies the timestamp, but sorting must happen
        on the TIME — ``array_sort`` over a string-led struct is
        lexicographic, which misorders non-ISO dates ('3/12/2024' vs
        '11/1/2024') and mixed-width epochs ('999999999' after
        '1700000000') and silently misaligns the per-point responses.
        Strings are parsed defensively (ISO, then common M/d/yyyy
        shapes, then numeric epoch via try_cast — ANSI-safe);
        unparseable values sort first and fall back to the payload
        string tie-break."""
        dt = df.schema[self.timestampCol].dataType
        tsc = F.col(self.timestampCol)
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return tsc.cast("timestamp_ltz").cast("double")
        if isinstance(dt, T.NumericType):
            return tsc.cast("double")
        return F.coalesce(
            F.try_to_timestamp(tsc).cast("double"),
            F.try_to_timestamp(tsc, F.lit("M/d/yyyy H:m:s")).cast("double"),
            F.try_to_timestamp(tsc, F.lit("M/d/yyyy")).cast("double"),
            tsc.try_cast("double"),
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        cols = df.columns
        point = F.struct(
            F.col(self.timestampCol).cast("string").alias("timestamp"),
            F.col(self.valueCol).cast("double").alias("value"))
        ctx = F.struct(*[F.col(c) for c in cols])
        grouped = (
            df.select(F.col(self.groupbyCol).alias("__g"),
                      F.struct(self._timestamp_sort_key(df).alias("k"),
                               point.alias("p"), ctx.alias("c")).alias("__pc"))
            .groupBy("__g")
            .agg(F.array_sort(F.collect_list("__pc")).alias("__z"))
            .withColumn("__series", F.expr("transform(__z, x -> x.p)"))
        )
        inner = DetectAnomalies(
            url=self.url, seriesCol="__series", granularity=self.granularity,
            outputCol="__resp", concurrency=self.concurrency,
            timeout=self.timeout, subscriptionKey=self.subscriptionKey)
        called = inner.transform(grouped)
        resp = F.col("__resp")
        combined = F.transform(
            F.col("__z"),
            lambda x, i: F.struct(
                x["c"].alias("c"),
                F.when(resp.isNotNull(), F.struct(
                    resp["isAnomaly"][i].alias("isAnomaly"),
                    resp["expectedValues"][i].alias("expectedValue"),
                    resp["upperMargins"][i].alias("upperMargin"),
                    resp["lowerMargins"][i].alias("lowerMargin"),
                )).alias("s")))
        exploded = called.select(
            F.col("__resp_error"), F.explode(combined).alias("__e"))
        return exploded.select(
            *[F.col(f"__e.c.{c}").alias(c) for c in cols],
            F.col("__e.s").alias(self.outputCol),
            F.col("__resp_error").alias(self.outputCol + "_error"),
        )


# ---------------------------------------------------------------------------
# Vision (cognitive/.../ComputerVision.scala:183-560)
# ---------------------------------------------------------------------------

class _ImageServiceBase(_JsonServiceBase):
    """Image-url request shape {"url": ...} (BasicAsyncReply services)."""

    def __init__(self, url: str = "", imageUrlCol: str = "url",
                 outputCol: str = "result", **kw):
        super().__init__(url=url, imageUrlCol=imageUrlCol,
                         outputCol=outputCol, **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        return F.to_json(F.struct(F.col(self.imageUrlCol).alias("url")))


class OCR(_ImageServiceBase):
    """ComputerVision.scala:183-220."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("language", T.StringType()),
        T.StructField("regions", T.ArrayType(T.StructType([
            T.StructField("boundingBox", T.StringType()),
            T.StructField("lines", T.ArrayType(T.StructType([
                T.StructField("boundingBox", T.StringType()),
                T.StructField("words", T.ArrayType(T.StructType([
                    T.StructField("boundingBox", T.StringType()),
                    T.StructField("text", T.StringType()),
                ]))),
            ]))),
        ]))),
    ])


class AnalyzeImage(_ImageServiceBase):
    """ComputerVision.scala:260-330."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("categories", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]))),
        T.StructField("tags", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("confidence", T.DoubleType()),
        ]))),
        T.StructField("description", T.StructType([
            T.StructField("captions", T.ArrayType(T.StructType([
                T.StructField("text", T.StringType()),
                T.StructField("confidence", T.DoubleType()),
            ]))),
        ])),
    ])


class TagImage(_ImageServiceBase):
    """ComputerVision.scala:400-430."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("tags", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("confidence", T.DoubleType()),
        ]))),
    ])


class DescribeImage(_ImageServiceBase):
    """ComputerVision.scala:440-480."""

    RESPONSE_TYPE = AnalyzeImage.RESPONSE_TYPE


class RecognizeText(_ImageServiceBase):
    """ComputerVision.scala:221-259 (async read API reduced to one hop)."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("status", T.StringType()),
        T.StructField("recognitionResult", T.StructType([
            T.StructField("lines", T.ArrayType(T.StructType([
                T.StructField("boundingBox", T.ArrayType(T.IntegerType())),
                T.StructField("text", T.StringType()),
            ]))),
        ])),
    ])


class Read(_ImageServiceBase):
    """Vision Read API v3 (ComputerVision.scala:116-181; the async
    operation-poll loop is reduced to one hop like RecognizeText —
    callers pass the result endpoint directly)."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("status", T.StringType()),
        T.StructField("analyzeResult", T.StructType([
            T.StructField("readResults", T.ArrayType(T.StructType([
                T.StructField("page", T.IntegerType()),
                T.StructField("angle", T.DoubleType()),
                T.StructField("width", T.DoubleType()),
                T.StructField("height", T.DoubleType()),
                T.StructField("lines", T.ArrayType(T.StructType([
                    T.StructField("boundingBox",
                                  T.ArrayType(T.DoubleType())),
                    T.StructField("text", T.StringType()),
                ]))),
            ]))),
        ])),
    ])


class GenerateThumbnails(_ImageServiceBase):
    """ComputerVision.scala:340-370 — binary response kept raw."""

    RESPONSE_TYPE = T.BinaryType()

    def _transform(self, df: DataFrame) -> DataFrame:
        # thumbnail bytes are not JSON; return the raw entity. Headers
        # come from the shared builder — a hand-rolled list here once
        # silently dropped the subscription key
        headers = self._headers()
        req = http_request(self.url, "POST",
                           entity=self._entity(df).cast("binary"),
                           headers=F.array(*headers))
        out = HTTPTransformer(
            inputCol="__request__", outputCol="__response__",
            concurrency=self.concurrency, timeout=self.timeout,
        ).transform(df.withColumn("__request__", req))
        ok = F.col("__response__")["statusCode"].between(200, 299)
        return (out
                .withColumn(self.outputCol,
                            F.when(ok, F.col("__response__")["entity"]))
                .withColumn(self.outputCol + "_error",
                            F.when(~ok, F.col("__response__")))
                .drop("__request__", "__response__"))


# ---------------------------------------------------------------------------
# Face (cognitive/.../Face.scala:18-300)
# ---------------------------------------------------------------------------

class DetectFace(_ImageServiceBase):
    RESPONSE_TYPE = T.ArrayType(T.StructType([
        T.StructField("faceId", T.StringType()),
        T.StructField("faceRectangle", T.StructType([
            T.StructField("top", T.IntegerType()),
            T.StructField("left", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ])),
    ]))


class FindSimilarFace(_JsonServiceBase):
    RESPONSE_TYPE = T.ArrayType(T.StructType([
        T.StructField("faceId", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]))

    def __init__(self, url: str = "", faceIdCol: str = "faceId",
                 faceIdsCol: str = "faceIds", outputCol: str = "result", **kw):
        super().__init__(url=url, faceIdCol=faceIdCol, faceIdsCol=faceIdsCol,
                         outputCol=outputCol, **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        return F.to_json(F.struct(
            F.col(self.faceIdCol).alias("faceId"),
            F.col(self.faceIdsCol).alias("faceIds")))


class VerifyFaces(_JsonServiceBase):
    RESPONSE_TYPE = T.StructType([
        T.StructField("isIdentical", T.BooleanType()),
        T.StructField("confidence", T.DoubleType()),
    ])

    def __init__(self, url: str = "", faceId1Col: str = "faceId1",
                 faceId2Col: str = "faceId2", outputCol: str = "result", **kw):
        super().__init__(url=url, faceId1Col=faceId1Col, faceId2Col=faceId2Col,
                         outputCol=outputCol, **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        return F.to_json(F.struct(
            F.col(self.faceId1Col).alias("faceId1"),
            F.col(self.faceId2Col).alias("faceId2")))


class GroupFaces(_JsonServiceBase):
    """Face /group (Face.scala:186-204): array of faceIds → similarity
    groups + a messyGroup of leftovers."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("groups", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("messyGroup", T.ArrayType(T.StringType())),
    ])

    def __init__(self, url: str = "", faceIdsCol: str = "faceIds",
                 outputCol: str = "result", **kw):
        super().__init__(url=url, faceIdsCol=faceIdsCol, outputCol=outputCol,
                         **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        return F.to_json(F.struct(F.col(self.faceIdsCol).alias("faceIds")))


class IdentifyFaces(_JsonServiceBase):
    """Face /identify (Face.scala:208-280): candidate persons per query
    face against a (large)person group."""

    RESPONSE_TYPE = T.ArrayType(T.StructType([
        T.StructField("faceId", T.StringType()),
        T.StructField("candidates", T.ArrayType(T.StructType([
            T.StructField("personId", T.StringType()),
            T.StructField("confidence", T.DoubleType()),
        ]))),
    ]))

    def __init__(self, url: str = "", faceIdsCol: str = "faceIds",
                 personGroupId: str | None = None,
                 largePersonGroupId: str | None = None,
                 maxNumOfCandidatesReturned: int | None = None,
                 confidenceThreshold: float | None = None,
                 outputCol: str = "result", **kw):
        if personGroupId and largePersonGroupId:
            raise ValueError("personGroupId and largePersonGroupId are "
                             "mutually exclusive (Face.scala:230-248)")
        super().__init__(url=url, faceIdsCol=faceIdsCol,
                         personGroupId=personGroupId,
                         largePersonGroupId=largePersonGroupId,
                         maxNumOfCandidatesReturned=maxNumOfCandidatesReturned,
                         confidenceThreshold=confidenceThreshold,
                         outputCol=outputCol, **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        fields = [F.col(self.faceIdsCol).alias("faceIds")]
        if self.personGroupId:
            fields.append(F.lit(self.personGroupId).alias("personGroupId"))
        if self.largePersonGroupId:
            fields.append(F.lit(self.largePersonGroupId)
                          .alias("largePersonGroupId"))
        if self.maxNumOfCandidatesReturned is not None:
            fields.append(F.lit(self.maxNumOfCandidatesReturned)
                          .alias("maxNumOfCandidatesReturned"))
        if self.confidenceThreshold is not None:
            fields.append(F.lit(self.confidenceThreshold)
                          .alias("confidenceThreshold"))
        return F.to_json(F.struct(*fields))


# ---------------------------------------------------------------------------
# Speech + Translate (SpeechToText.scala:22+, TextTranslator.scala:157-420)
# ---------------------------------------------------------------------------

class SpeechToText(_JsonServiceBase):
    """Audio bytes → transcript (SpeechToText.scala:22+; the SDK
    streaming variant is a documented delta — micro-batch POST here)."""

    # raw audio entity — labeling WAV/PCM bytes application/json gets
    # the request rejected (400/415) by the speech endpoint
    CONTENT_TYPE = "audio/wav; codecs=audio/pcm; samplerate=16000"

    RESPONSE_TYPE = T.StructType([
        T.StructField("RecognitionStatus", T.StringType()),
        T.StructField("DisplayText", T.StringType()),
        T.StructField("Offset", T.LongType()),
        T.StructField("Duration", T.LongType()),
    ])

    def __init__(self, url: str = "", audioCol: str = "audio",
                 outputCol: str = "result", **kw):
        super().__init__(url=url, audioCol=audioCol, outputCol=outputCol, **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        return F.col(self.audioCol)  # raw audio bytes


class Translate(_JsonServiceBase):
    RESPONSE_TYPE = T.ArrayType(T.StructType([
        T.StructField("translations", T.ArrayType(T.StructType([
            T.StructField("text", T.StringType()),
            T.StructField("to", T.StringType()),
        ]))),
    ]))

    def __init__(self, url: str = "", textCol: str = "text",
                 outputCol: str = "result", **kw):
        super().__init__(url=url, textCol=textCol, outputCol=outputCol, **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        return F.to_json(F.array(F.struct(F.col(self.textCol).alias("Text"))))


class AnalyzeLayout(_JsonServiceBase):
    """Form Recognizer layout (FormRecognizer.scala:170-350)."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("status", T.StringType()),
        T.StructField("analyzeResult", T.StructType([
            T.StructField("readResults", T.ArrayType(T.StructType([
                T.StructField("page", T.IntegerType()),
                T.StructField("lines", T.ArrayType(T.StructType([
                    T.StructField("text", T.StringType()),
                ]))),
            ]))),
        ])),
    ])

    def __init__(self, url: str = "", urlCol: str = "source",
                 outputCol: str = "result", **kw):
        super().__init__(url=url, urlCol=urlCol, outputCol=outputCol, **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        return F.to_json(F.struct(F.col(self.urlCol).alias("source")))


class BingImageSearch(_JsonServiceBase):
    """BingImageSearch.scala:69+ — GET with query params reduced to a
    POST body against a user endpoint."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("value", T.ArrayType(T.StructType([
            T.StructField("contentUrl", T.StringType()),
            T.StructField("name", T.StringType()),
        ]))),
    ])

    def __init__(self, url: str = "", queryCol: str = "query",
                 outputCol: str = "result", **kw):
        super().__init__(url=url, queryCol=queryCol, outputCol=outputCol, **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        return F.to_json(F.struct(F.col(self.queryCol).alias("q")))


# ---------------------------------------------------------------------------
# Translate family (TextTranslator.scala:157-420, DocumentTranslator.scala)
# ---------------------------------------------------------------------------

class Transliterate(Translate):
    """TextTranslator.scala:244-262. Own RESPONSE_TYPE: the
    transliterate API returns (text, script) pairs, not the translate
    endpoint's nested translations array — inheriting Translate's
    schema parsed every successful response to NULLs."""

    RESPONSE_TYPE = T.ArrayType(T.StructType([
        T.StructField("text", T.StringType()),
        T.StructField("script", T.StringType()),
    ]))


class Detect(Translate):
    """TextTranslator.scala:264-280."""

    RESPONSE_TYPE = T.ArrayType(T.StructType([
        T.StructField("language", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]))


class BreakSentence(Translate):
    """TextTranslator.scala:282-300."""

    RESPONSE_TYPE = T.ArrayType(T.StructType([
        T.StructField("sentLen", T.ArrayType(T.IntegerType())),
    ]))


class DictionaryLookup(Translate):
    """TextTranslator.scala:302-330."""

    RESPONSE_TYPE = T.ArrayType(T.StructType([
        T.StructField("normalizedSource", T.StringType()),
        T.StructField("translations", T.ArrayType(T.StructType([
            T.StructField("normalizedTarget", T.StringType()),
            T.StructField("confidence", T.DoubleType()),
        ]))),
    ]))


class DictionaryExamples(Translate):
    """TextTranslator.scala:332-360."""

    RESPONSE_TYPE = T.ArrayType(T.StructType([
        T.StructField("examples", T.ArrayType(T.StructType([
            T.StructField("sourcePrefix", T.StringType()),
            T.StructField("sourceTerm", T.StringType()),
            T.StructField("sourceSuffix", T.StringType()),
        ]))),
    ]))


class DocumentTranslator(_JsonServiceBase):
    """DocumentTranslator.scala:51+ — batch document translation job
    submission ({"inputs": [...]} envelope)."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
    ])

    def __init__(self, url: str = "", sourceUrlCol: str = "sourceUrl",
                 targetUrlCol: str = "targetUrl", targetLanguage: str = "en",
                 outputCol: str = "result", **kw):
        super().__init__(url=url, sourceUrlCol=sourceUrlCol,
                         targetUrlCol=targetUrlCol,
                         targetLanguage=targetLanguage, outputCol=outputCol,
                         **kw)

    def _entity(self, df: DataFrame) -> F.Column:
        return F.to_json(F.struct(F.array(F.struct(
            F.struct(F.col(self.sourceUrlCol).alias("sourceUrl"))
            .alias("source"),
            F.array(F.struct(
                F.col(self.targetUrlCol).alias("targetUrl"),
                F.lit(self.targetLanguage).alias("language"),
            )).alias("targets"),
        )).alias("inputs")))


class ConversationTranscription(SpeechToText):
    """SpeechToTextSDK.scala:419-579 — streaming SDK reduced to
    micro-batch POST (documented delta, same response shape)."""


# ---------------------------------------------------------------------------
# Form Recognizer variants (FormRecognizer.scala:170-350) — layout schema
# ---------------------------------------------------------------------------

class AnalyzeReceipts(AnalyzeLayout):
    """FormRecognizer.scala:200-230."""


class AnalyzeBusinessCards(AnalyzeLayout):
    """FormRecognizer.scala:232-260."""


class AnalyzeInvoices(AnalyzeLayout):
    """FormRecognizer.scala:262-290."""


class AnalyzeIDDocuments(AnalyzeLayout):
    """FormRecognizer.scala:292-320."""


class AnalyzeCustomModel(AnalyzeLayout):
    """FormRecognizer.scala:322-350 (custom model id in the URL)."""


class RecognizeDomainSpecificContent(_ImageServiceBase):
    """ComputerVision.scala:500-560 (celebrity/landmark models)."""

    RESPONSE_TYPE = T.StructType([
        T.StructField("result", T.MapType(T.StringType(), T.StringType())),
    ])
