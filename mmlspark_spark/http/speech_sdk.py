"""Chunked streaming speech transcription (SpeechToTextSDK analog).

Parity: reference ``cognitive/.../SpeechToTextSDK.scala:419-579`` —
audio is streamed to the vendor service in short slices over a
websocket; recognition events fire as segments resolve, and the stage
emits one row per recognized segment with ``Offset``/``Duration`` in
the service's 100-ns ticks.

What is REAL here (and tested): the whole Spark side — WAV container
parsing (stdlib ``wave``), sample-accurate time slicing into
``chunkMillis`` windows, Arrow-batched ``mapInPandas`` execution,
tick arithmetic, per-segment struct assembly, and the
fault-tolerance contract (undecodable audio → empty segments + error
string, the PatchedImage pattern — one bad file must not kill a
100 TB job). What is STUBBED: the transport — the piece that is a
vendor websocket in the reference — is a pluggable callable
``transport(chunks) -> iterable of events``. Passing none raises
``NotImplementedError`` naming the slot; ``fake_transport`` is the
deterministic stand-in for tests and wiring checks (this container
ships no speech SDK or websocket client).

Chunk dict: ``{"index", "data" (bytes), "offset_ticks",
"duration_ticks", "sample_rate", "sample_width", "channels"}``.
Event dict: ``{"text", "offset_ticks", "duration_ticks"[, "status"]}``.
"""

from __future__ import annotations

import hashlib
import io
import wave

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer

_TICKS_PER_SECOND = 10_000_000  # the service's 100-ns tick unit

SEGMENT_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("DisplayText", T.StringType()),
    T.StructField("Offset", T.LongType()),
    T.StructField("Duration", T.LongType()),
    T.StructField("RecognitionStatus", T.StringType()),
]))


def chunk_wav(blob: bytes, chunk_millis: int) -> list[dict]:
    """Slice a WAV blob into sample-accurate ``chunk_millis`` windows.

    Raises ``wave.Error``/``EOFError`` on non-WAV input — the caller
    owns the fault-tolerance contract."""
    with wave.open(io.BytesIO(blob)) as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        per_chunk = max(1, int(rate * chunk_millis / 1000))
        chunks = []
        start = 0
        while start < n:
            take = min(per_chunk, n - start)
            data = w.readframes(take)
            chunks.append({
                "index": len(chunks),
                "data": data,
                "offset_ticks": start * _TICKS_PER_SECOND // rate,
                "duration_ticks": take * _TICKS_PER_SECOND // rate,
                "sample_rate": rate,
                "sample_width": width,
                "channels": channels,
            })
            start += take
    return chunks


def fake_transport(chunks) -> list[dict]:
    """DETERMINISTIC FAKE recognizer: one final segment per chunk,
    text seeded by the chunk's content hash. Placeholder for the
    vendor websocket session — same event shape, same timing
    contract."""
    events = []
    for c in chunks:
        tag = hashlib.sha256(c["data"]).hexdigest()[:8]
        events.append({
            "text": f"seg{c['index']}-{tag}",
            "offset_ticks": c["offset_ticks"],
            "duration_ticks": c["duration_ticks"],
            "status": "Success",
        })
    return events


class SpeechToTextSDK(Transformer):
    """Audio binary column → array of recognized segments.

    ``transport`` is the vendor-websocket slot (see module docstring);
    ``errorCol`` carries the decode failure for undecodable rows
    (segments empty), mirroring the reference's fault-tolerant flows.
    Explode ``outputCol`` for the reference's one-row-per-segment
    ``format="simple"`` shape."""

    def __init__(self, audioCol: str = "audio",
                 outputCol: str = "segments", errorCol: str = "error",
                 chunkMillis: int = 1000, transport=None):
        super().__init__(audioCol=audioCol, outputCol=outputCol,
                         errorCol=errorCol, chunkMillis=chunkMillis,
                         transport=transport)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.audioCol)
        clash = [c for c in (self.outputCol, self.errorCol)
                 if c in schema.fieldNames()]
        if clash:
            # eager contract: a duplicate output column would otherwise
            # surface as a worker-side schema/column-count mismatch
            # hours into the run
            raise ValueError(
                f"SpeechToTextSDK: input already has column(s) {clash}; "
                f"rename them or change outputCol/errorCol")
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.outputCol, SEGMENT_SCHEMA),
               T.StructField(self.errorCol, T.StringType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        if self.transport is None:
            raise NotImplementedError(
                "SpeechToTextSDK needs a transport: the reference "
                "streams chunks over the vendor speech websocket "
                "(SpeechToTextSDK.scala:419-579); no speech SDK is "
                "available here. Pass transport= (see fake_transport "
                "for the contract).")
        audio_col, out_col, err_col = \
            self.audioCol, self.outputCol, self.errorCol
        chunk_ms, transport = int(self.chunkMillis), self.transport
        out_schema = self.transform_schema(df.schema)

        def run(batches):
            for pdf in batches:
                segs, errs = [], []
                for blob in pdf[audio_col]:
                    try:
                        events = transport(chunk_wav(bytes(blob), chunk_ms))
                        segs.append([
                            (e["text"], int(e["offset_ticks"]),
                             int(e["duration_ticks"]),
                             e.get("status", "Success"))
                            for e in events])
                        errs.append(None)
                    except Exception as e:  # undecodable audio
                        segs.append([])
                        errs.append(f"{type(e).__name__}: {e}")
                pdf[out_col] = segs
                pdf[err_col] = errs
                yield pdf

        return df.mapInPandas(run, out_schema)
