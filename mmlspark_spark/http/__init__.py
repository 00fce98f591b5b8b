"""HTTP-as-dataflow: generic web-service transformers.

Parity: reference ``core/.../io/http/`` (HTTPTransformer.scala,
SimpleHTTPTransformer.scala, Parsers.scala, HTTPClients.scala,
HTTPSchema.scala) — the substrate under every cognitive-service stage.
"""

from mmlspark_spark.http.schema import (
    HTTP_REQUEST_SCHEMA,
    HTTP_RESPONSE_SCHEMA,
    http_request,
)
from mmlspark_spark.http.transformer import (
    CustomInputParser,
    CustomOutputParser,
    HTTPTransformer,
    JSONInputParser,
    JSONOutputParser,
    SimpleHTTPTransformer,
    StringOutputParser,
)

__all__ = [
    "HTTP_REQUEST_SCHEMA", "HTTP_RESPONSE_SCHEMA", "http_request",
    "HTTPTransformer", "SimpleHTTPTransformer", "JSONInputParser",
    "JSONOutputParser", "StringOutputParser", "CustomInputParser",
    "CustomOutputParser",
]
