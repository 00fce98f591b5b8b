"""Null-safe composite-key serialization shared by every dedup path.

Why this exists (and why the "obvious" alternatives are wrong):

- ``concat_ws`` SKIPS null arguments, so ``('a', NULL)`` and
  ``(NULL, 'a')`` collapse to the same key and a genuinely distinct
  row is silently deleted.
- Multi-argument ``xxhash64``/``hash`` are NOT the fix either: Spark's
  hash expressions also skip null children, so they collide the same
  way.
- A raw separator character can occur inside values, so plain
  ``concat`` with a delimiter is ambiguous.

The fix: length-prefix every value (``"<len>:<value>"``) so boundaries
are explicit with no escapable separator, and give NULL its own marker
(``"\\x00"`` — cannot collide with a value because serialized values
start with a digit). The whole key is a single pure Catalyst expression
(map-side, codegen'd, no UDF).

Used by ``llm.ExactDeduplicator`` (batch), ``streaming.streaming_dedup``
(state-store key), and ``ml.VowpalWabbitInteractions``.
"""
from __future__ import annotations

from typing import Iterable, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F


def null_safe_key(cols: Iterable) -> Column:
    """Serialize columns into one unambiguous, null-safe string key.

    Accepts column names or Column expressions; each is cast to string,
    length-prefixed, and concatenated. Equal keys <=> element-wise
    null-safe-equal tuples.
    """
    parts = []
    for c in cols:
        s = (F.col(c) if isinstance(c, str) else c).cast("string")
        parts.append(F.coalesce(
            F.concat(F.length(s).cast("string"), F.lit(":"), s),
            F.lit("\x00")))
    return F.concat(*parts)


def content_hash128(cols: Iterable) -> Tuple[Column, Column]:
    """Two independent fixed-width hash lanes over the null-safe key.

    128 combined bits (xxhash64 ⊕ md5) keeps collision probability
    ~2^-96 at 10^12 documents while making the shuffle / state-store
    key fixed-width however large the underlying values are.
    """
    key = null_safe_key(cols)
    return F.xxhash64(key), F.md5(key)
