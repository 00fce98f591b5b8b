"""Streaming web serving: HTTP source/sink for Structured Streaming.

Parity: reference ``core/.../sql/execution/streaming/HTTPSource.scala``
(head-node micro-batch serving), ``ServingUDFs.scala`` (reply builders),
``HTTPSourceStateHolder`` routing registries.
"""

from mmlspark_spark.streaming.distributed_serving import (
    DistributedHTTPServer,
)
from mmlspark_spark.streaming.serving import (
    REQUEST_SCHEMA,
    HTTPServingDataSource,
    make_reply,
    register_serving_source,
    reply_batch,
    serving_sink,
)
from mmlspark_spark.streaming.stateful import (
    ann_ingest_foreach_batch,
    bm25_ingest_foreach_batch,
    neardup_screen_foreach_batch,
    registry_ingest_foreach_batch,
    streaming_dedup,
    streaming_dedup_against_registry,
)

__all__ = [
    "REQUEST_SCHEMA", "HTTPServingDataSource", "register_serving_source",
    "make_reply", "reply_batch", "serving_sink", "DistributedHTTPServer",
    "ann_ingest_foreach_batch",
    "bm25_ingest_foreach_batch",
    "neardup_screen_foreach_batch",
    "registry_ingest_foreach_batch",
    "streaming_dedup",
    "streaming_dedup_against_registry",
]
