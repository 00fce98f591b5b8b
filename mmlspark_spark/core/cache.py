"""Deterministic lifecycle for persisted intermediate subtrees.

Several operators (MinHash signatures, n-gram shingle aggregates) fan a
shared subtree out to 2-3 consumers. With AQE enabled, Spark's exchange
reuse misses these (each consumer re-scans and re-computes the subtree),
so the operators ``persist()`` the shared frame. Persisted blocks pin
executor storage for the session unless released, which matters on a
long-lived cluster session far more than on a test driver — so instead
of leaking them or clearing the whole cache, the operator attaches the
cached handle(s) to the DataFrame it returns, and the caller releases
them after its action:

    out = ngram_jaccard_pairs(docs)
    out.count()
    release_intermediates(out)

``release_intermediates`` is a no-op for frames with no attached
intermediates, so callers can apply it unconditionally.

Reference parity note: the reference ships the same idea as an explicit
pipeline stage (``Cacher.scala:26-34``); here it is internal to the
operators whose plans need it, with an explicit release hook.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_ATTR = "_mmlspark_intermediates"


def persist_intermediate(df: DataFrame) -> DataFrame:
    """Persist ``df`` at MEMORY_AND_DISK (spill-safe: blocks that don't
    fit in executor memory go to local disk instead of OOMing)."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def attach_intermediates(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record ``cached`` frames on ``out`` so the caller can release
    them after consuming ``out``."""
    existing = list(getattr(out, _ATTR, []))
    setattr(out, _ATTR, existing + list(cached))
    return out


def propagate_intermediates(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Copy attached intermediates from ``src`` onto ``dst``.

    The attachment is a plain python attribute, so ANY DataFrame
    transformation (``select``, ``filter``…) returns a new object
    without it — a caller that wraps an operator's output must
    propagate explicitly or its ``release_intermediates`` call silently
    frees nothing."""
    return attach_intermediates(dst, *getattr(src, _ATTR, []))


def release_intermediates(df: DataFrame) -> None:
    """Unpersist every intermediate attached to ``df`` (no-op if none)."""
    for cached in getattr(df, _ATTR, []):
        try:
            cached.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    setattr(df, _ATTR, [])
