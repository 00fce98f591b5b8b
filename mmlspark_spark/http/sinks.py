"""Buffered HTTP batch sinks (PowerBI, Azure Search, generic).

Parity: reference ``core/.../io/powerbi/PowerBIWriter.scala:27-114``
(rows → JSON batches → REST endpoint with retries/concurrency, batch
AND streaming modes) and ``cognitive/.../AzureSearch.scala:86+`` /
``AzureSearchAPI.scala:1-199`` (documents → index batch upload).

Spark shape: ``foreachPartition`` — each partition buffers ``batchSize``
rows, serializes once, and POSTs through the shared per-worker session
(connection pooling + 429/5xx retry from ``http.client``). Streaming
reuses the same writer via ``foreachBatch``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class BufferedHTTPWriter:
    """POST fixed-size JSON batches of rows to ``url``.

    ``payload_fn(rows: list[dict]) -> (bytes, headers)`` shapes the
    request body; subclasses override for service-specific envelopes.
    """

    def __init__(self, url: str, batchSize: int = 100,
                 timeout: float = 60.0, headers: dict | None = None):
        self.url = url
        self.batchSize = batchSize
        self.timeout = timeout
        self.headers = dict(headers or {})

    def payload(self, rows: list[dict]) -> bytes:
        return json.dumps(rows).encode()

    def write(self, df: DataFrame) -> None:
        url, batch_size, timeout = self.url, self.batchSize, self.timeout
        headers = {"Content-Type": "application/json", **self.headers}
        payload_fn = self.payload

        def send_partition(rows_iter):
            from mmlspark_spark.http.client import send_with_retries

            buf = []

            def flush():
                if not buf:
                    return
                resp = send_with_retries(
                    {"method": "POST", "url": url,
                     "headers": [{"name": k, "value": v}
                                 for k, v in headers.items()],
                     "entity": payload_fn(buf)},
                    timeout)
                if not (200 <= resp["statusCode"] < 300):
                    raise RuntimeError(
                        f"HTTP sink: {resp['statusCode']} {resp['reasonPhrase']}")
                buf.clear()

            for row in rows_iter:
                buf.append(row.asDict(recursive=True))
                if len(buf) >= batch_size:
                    flush()
            flush()

        df.foreachPartition(send_partition)

    def write_stream(self, df: DataFrame, trigger: str = "5 seconds",
                     checkpoint: str | None = None):
        writer = (df.writeStream
                  .foreachBatch(lambda b, _i: self.write(b))
                  .trigger(processingTime=trigger))
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        return writer.start()


class PowerBIWriter(BufferedHTTPWriter):
    """rows → JSON array → PowerBI push-dataset REST URL
    (PowerBIWriter.scala:27-114: the payload is the bare row array)."""


class AddDocuments(BufferedHTTPWriter):
    """rows → Azure-Search-style index batch
    (AzureSearch.scala:86+): {"value": [{"@search.action": act, ...}]}."""

    def __init__(self, url: str, actionCol: str | None = None,
                 defaultAction: str = "upload", batchSize: int = 100,
                 timeout: float = 60.0, headers: dict | None = None):
        super().__init__(url, batchSize, timeout, headers)
        self.actionCol = actionCol
        self.defaultAction = defaultAction

    def payload(self, rows: list[dict]) -> bytes:
        docs = []
        for r in rows:
            action = (r.pop(self.actionCol, self.defaultAction)
                      if self.actionCol else self.defaultAction)
            docs.append({"@search.action": action, **r})
        return json.dumps({"value": docs}).encode()
