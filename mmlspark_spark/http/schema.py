"""HTTP request/response as nested StructType columns.

Parity: reference ``core/.../io/http/HTTPSchema.scala:26-235``
(HTTPRequestData / HTTPResponseData / HeaderData / EntityData case
classes + SparkBindings). Same information, flattened one level:
``requestLine.{method,uri}`` become top-level ``method``/``url`` and
the entity is a plain binary payload + content type — the idiomatic
Spark encoding (plain StructType constants instead of JVM codecs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

HEADER_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("value", T.StringType()),
])

HTTP_REQUEST_SCHEMA = T.StructType([
    T.StructField("method", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("headers", T.ArrayType(HEADER_SCHEMA)),
    T.StructField("entity", T.BinaryType()),
])

HTTP_RESPONSE_SCHEMA = T.StructType([
    T.StructField("statusCode", T.IntegerType()),
    T.StructField("reasonPhrase", T.StringType()),
    T.StructField("headers", T.ArrayType(HEADER_SCHEMA)),
    T.StructField("entity", T.BinaryType()),
])


def http_request(url, method: str = "POST", entity: Column | None = None,
                 headers: Column | None = None) -> Column:
    """Build a request-struct column (HTTPSchema.scala ``to_http_request``
    analog) from column expressions."""
    url_col = url if isinstance(url, Column) else F.lit(url)
    return F.struct(
        F.lit(method).alias("method"),
        url_col.alias("url"),
        (headers if headers is not None
         else F.lit(None).cast(T.ArrayType(HEADER_SCHEMA))).alias("headers"),
        (entity if entity is not None
         else F.lit(None).cast("binary")).alias("entity"),
    )
