"""Mini-batching operators (SURVEY §2.9).

The reference batches rows into array-valued "batch rows" so per-call
overhead (HTTP requests, native-lib inference) amortizes
(``core/.../stages/MiniBatchTransformer.scala``). In PySpark the natural
engine-level analog is Arrow record batches through ``mapInPandas`` —
the iterator of pandas DataFrames IS a dynamic minibatch stream, so the
operators below just re-chunk that iterator; data stays columnar
(Arrow) the whole way, no per-row Python cost.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer


def _batched_schema(schema: T.StructType) -> T.StructType:
    return T.StructType([
        T.StructField(f.name, T.ArrayType(f.dataType, True), True) for f in schema.fields
    ])


def _rows_to_batch_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({c: [list(pdf[c])] for c in pdf.columns})


class FixedMiniBatchTransformer(Transformer):
    """Pack every ``batchSize`` rows into one array-valued row.

    Parity: reference ``core/.../stages/MiniBatchTransformer.scala:130-177``.
    """

    def __init__(self, batchSize: int = 10, buffered: bool = False):  # noqa: D107
        if batchSize < 1:
            # batchSize=0 would spin the rebatch loop forever (pos
            # never advances past a non-empty Arrow batch)
            raise ValueError(f"batchSize must be >= 1, got {batchSize}")
        # `buffered` is accepted for reference API parity only: the
        # Arrow pipeline is inherently buffered, there is no separate
        # buffering thread to enable
        super().__init__(batchSize=batchSize, buffered=buffered)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        return _batched_schema(schema)

    def _transform(self, df: DataFrame) -> DataFrame:
        n = self.batchSize
        out_schema = self.transform_schema(df.schema)

        def rebatch(it):
            carry = None
            for pdf in it:
                if carry is not None and len(carry):
                    pdf = pd.concat([carry, pdf], ignore_index=True)
                pos = 0
                while len(pdf) - pos >= n:
                    yield _rows_to_batch_pdf(pdf.iloc[pos:pos + n])
                    pos += n
                carry = pdf.iloc[pos:]
            if carry is not None and len(carry):
                yield _rows_to_batch_pdf(carry)

        return df.mapInPandas(rebatch, out_schema)


class DynamicMiniBatchTransformer(Transformer):
    """Batch = whatever is buffered — here, one Arrow record batch
    (backpressure-adaptive by construction).

    Parity: reference ``core/.../stages/MiniBatchTransformer.scala:45-67``.
    """

    def __init__(self, maxBatchSize: int | None = None):  # noqa: D107
        super().__init__(maxBatchSize=maxBatchSize)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        return _batched_schema(schema)

    def _transform(self, df: DataFrame) -> DataFrame:
        cap = self.maxBatchSize

        def rebatch(it):
            for pdf in it:
                if cap is None or len(pdf) <= cap:
                    if len(pdf):
                        yield _rows_to_batch_pdf(pdf)
                else:
                    for pos in range(0, len(pdf), cap):
                        yield _rows_to_batch_pdf(pdf.iloc[pos:pos + cap])

        return df.mapInPandas(rebatch, self.transform_schema(df.schema))


class TimeIntervalMiniBatchTransformer(Transformer):
    """Group rows arriving within ``millisToWait`` into one batch — only
    meaningful on a live (streaming) iterator; on batch data it degrades
    to per-Arrow-batch chunks, same as Dynamic.

    Parity: reference ``core/.../stages/MiniBatchTransformer.scala:69-100``;
    iterator machinery ``stages/Batchers.scala:66-126``.
    """

    def __init__(self, millisToWait: int = 1000, maxBatchSize: int | None = None):  # noqa: D107
        super().__init__(millisToWait=millisToWait, maxBatchSize=maxBatchSize)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        return _batched_schema(schema)

    def _transform(self, df: DataFrame) -> DataFrame:
        wait_s = self.millisToWait / 1000.0
        cap = self.maxBatchSize

        def rebatch(it):
            acc: list[pd.DataFrame] = []
            deadline = time.monotonic() + wait_s
            def flush(merged):
                # honor maxBatchSize even when the accumulated buffer
                # overshot it (an 8-row Arrow batch after a 9-row one
                # must not emit a 17-row batch against a 10 cap) —
                # downstream consumers are sized to the cap
                if cap:
                    for s in range(0, len(merged), cap):
                        chunk = merged.iloc[s:s + cap]
                        if len(chunk):
                            yield _rows_to_batch_pdf(chunk)
                elif len(merged):
                    yield _rows_to_batch_pdf(merged)

            for pdf in it:
                acc.append(pdf)
                total = sum(len(p) for p in acc)
                if time.monotonic() >= deadline or (cap and total >= cap):
                    yield from flush(pd.concat(acc, ignore_index=True))
                    acc, deadline = [], time.monotonic() + wait_s
            if acc:
                yield from flush(pd.concat(acc, ignore_index=True))

        return df.mapInPandas(rebatch, self.transform_schema(df.schema))


class FlattenBatch(Transformer):
    """Inverse of minibatching: explode array-valued columns back to rows.

    Parity: reference ``core/.../stages/MiniBatchTransformer.scala:179-230``.
    Pure DataFrame op — ``explode(arrays_zip(...))`` stays inside
    whole-stage codegen, no Python.
    """

    def __init__(self):  # noqa: D107
        super().__init__()

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        out = []
        for f in schema.fields:
            if isinstance(f.dataType, T.ArrayType):
                out.append(T.StructField(f.name, f.dataType.elementType, True))
            else:
                out.append(f)
        return T.StructType(out)

    def _transform(self, df: DataFrame) -> DataFrame:
        arr_cols = [f.name for f in df.schema.fields
                    if isinstance(f.dataType, T.ArrayType)]
        if not arr_cols:
            return df
        # explode_outer: a row whose arrays are all empty/NULL keeps
        # its scalar columns (plain explode silently deleted the row —
        # a batch->flatten round trip must be row-preserving)
        zipped = df.withColumn(
            "__z", F.explode_outer(F.arrays_zip(*arr_cols)))
        keep = [c for c in df.columns if c not in arr_cols]
        return zipped.select(
            *keep, *[F.col(f"__z.{c}").alias(c) for c in arr_cols]
        )


class PartitionConsolidator(Transformer):
    """Funnel all rows through few partitions (for rate-limited shared
    resources, e.g. one API connection per executor).

    Parity: reference ``core/.../stages/PartitionConsolidator.scala:22-139``.
    The reference routes rows to one partition per executor JVM; the
    idiomatic Spark substitute is ``coalesce(n)`` (no shuffle — partitions
    are merged in place on their executors).
    """

    def __init__(self, numPartitions: int = 1):  # noqa: D107
        super().__init__(numPartitions=numPartitions)

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.coalesce(self.numPartitions)
