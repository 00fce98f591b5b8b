"""Text-analysis column functions for training-data pipelines.

All of these are pure Catalyst column expressions (no Python UDFs), so
they run inside whole-stage codegen and scale linearly: tokenizing +
scoring 100 TB of documents is a single map stage with zero shuffles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped (leading/trailing
    whitespace safe)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def avg_token_length(text: Column | str) -> Column:
    t = tokens(text)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.size(t)


def stopword_ratio(text: Column | str, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    t = tokens(text)
    sw = F.size(F.filter(t, lambda x: x.isin(*stopwords)))
    return sw.cast("double") / F.size(t)


def word_shingles(text: Column | str, n: int = 5) -> Column:
    """Distinct word n-gram shingles as array<string> — the unit of
    n-gram Jaccard / MinHash dedup."""
    t = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.array_distinct(grams)


def quality_columns(text: Column | str, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> dict[str, Column]:
    """The standard quality-scoring bundle: length, token count, mean
    token length, stopword ratio. Heuristics follow common LLM-corpus
    filters (C4/Gopher-style length + stopword density rules)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "len_chars": F.length(c),
        "n_tokens": token_count(c),
        "avg_token_len": avg_token_length(c),
        "stopword_ratio": stopword_ratio(c, stopwords),
    }
