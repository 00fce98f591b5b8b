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

# The repo's TWO whitespace tokenization classes, defined ONCE so
# copies cannot drift (the round-6 corpus_report hash regression was
# exactly a \s dialect divergence):
# - JAVA_WS_RE: Java regex \s spelled out (ASCII) — what `tokens()`'s
#   historical `\s+` matches in Spark; the BPE fit and build_vocabulary
#   use it so their artifacts agree on word boundaries.
# - PINNED_WS_RE: the cross-engine-pinned subset (drops \x0B, where
#   Java \s and DuckDB-RE2 \s disagree; \f kept out for symmetry) used
#   by the operators whose oracles replay tokenization in SQL
#   (corpus_report, chunk_documents).
JAVA_WS_RE = r"[ \t\n\x0B\f\r]+"
PINNED_WS_RE = r"[ \t\n\r]+"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped (leading/trailing
    whitespace safe)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))


def pinned_tokens(text: Column | str) -> Column:
    """Whitespace tokenization on the cross-engine-pinned class
    (PINNED_WS_RE) — the split every operator whose oracle replays
    tokenization in DuckDB SQL must use on BOTH sides, so Java-\\s vs
    RE2-\\s dialect drift (\\x0B, \\f) cannot diverge the engines."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, PINNED_WS_RE), lambda x: x != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def avg_token_length(text: Column | str) -> Column:
    """NULL for token-less documents — a bare division would throw
    DIVIDE_BY_ZERO under ANSI mode (Spark 4 default) and kill the
    whole scoring job on one empty doc."""
    t = tokens(text)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    n = F.size(t)
    return F.when(n > 0, total.cast("double") / n)


def stopword_ratio(text: Column | str, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    """Case-folded stopword density (sentence-initial 'The' counts —
    case-sensitive matching systematically deflated the ratio and
    mis-filtered clean prose under Gopher-style thresholds). NULL for
    token-less documents (ANSI divide-by-zero guard)."""
    t = tokens(text)
    sw = F.size(F.filter(t, lambda x: F.lower(x).isin(*stopwords)))
    n = F.size(t)
    return F.when(n > 0, sw.cast("double") / n)


def word_shingles(text: Column | str, n: int = 5,
                  hashed: bool = False) -> Column:
    """Distinct word n-gram shingles — the unit of n-gram Jaccard /
    MinHash dedup. ``array<string>``, or ``array<long>`` of xxhash64
    values with ``hashed=True``.

    Formulated as ``arrays_zip`` of n shifted slices with ONE
    ``transform`` whose lambda touches only its own element.
    Higher-order-function lambda bodies are re-evaluated per element
    with no subexpression elimination, so the naive
    ``transform(sequence(...), i -> concat_ws(slice(tokens, i, n)))``
    re-runs the regex tokenization once per shingle POSITION —
    O(tokens²) per document (and composing ``transform(…, xxhash64)``
    on top re-evaluates the whole shingle construction again per
    element). Here every ``tokens`` reference sits in the outer
    per-row projection where codegen CSE collapses them, and hashing
    fuses into the same single lambda: O(tokens) per document,
    measured 26% faster at sf0.1's ~50-token docs and asymptotically
    safer for long documents.

    Short documents (< n tokens) yield [] via the ``greatest(m, 0)``
    slice-length guard (no per-branch duplication of ``tokens``), and
    NULL text also yields [] (the pre-round-5 contract: arrays_zip
    would otherwise propagate the NULL)."""
    c = F.col(text) if isinstance(text, str) else text
    if not hashed:
        # the unhashed variant IS distinct-of-raw-ngrams; one shared
        # construction (raw_word_ngrams) instead of a drifting copy
        return F.array_distinct(raw_word_ngrams(c, n))
    t = tokens(c)
    m = F.greatest(F.size(t) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(t, i + 1, m) for i in range(n)])

    def gram(s):
        return F.xxhash64(F.concat_ws(" ", *[s[str(i)] for i in range(n)]))

    return F.when(c.isNull(), F.array().cast("array<long>")).otherwise(
        F.array_distinct(F.transform(zipped, gram)))


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


def raw_word_ngrams(text: Column | str, n: int) -> Column:
    """Word n-grams WITHOUT de-duplication (repetition metrics need the
    multiset; :func:`word_shingles` is the distinct variant). Same
    arrays_zip-of-shifted-slices shape as word_shingles — the naive
    sequence+slice lambda re-tokenizes per shingle position (HOF
    lambda bodies get no subexpression elimination)."""
    c = F.col(text) if isinstance(text, str) else text
    t = tokens(c)
    m = F.greatest(F.size(t) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(t, i + 1, m) for i in range(n)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]))
    # NULL text -> [] (arrays_zip would propagate the NULL)
    return F.when(c.isNull(),
                  F.array().cast("array<string>")).otherwise(grams)


def dup_line_fraction(text: Column | str) -> Column:
    """Fraction of non-empty lines that are duplicates of an earlier
    line (Gopher repetition filter family: repetitious documents are
    low-quality training data)."""
    c = F.col(text) if isinstance(text, str) else text
    lines = F.filter(F.split(c, r"\n"), lambda x: x != F.lit(""))
    n = F.size(lines)
    return F.when(
        n > 0,
        (n - F.size(F.array_distinct(lines))).cast("double") / n,
    ).otherwise(F.lit(0.0))


def dup_ngram_fraction(text: Column | str, n: int = 5) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram
    (Gopher 'duplicate n-gram' repetition signal). Map-only."""
    grams = raw_word_ngrams(text, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        (total - F.size(F.array_distinct(grams))).cast("double") / total,
    ).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are punctuation (C4-style filter)."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct.cast("double") / F.greatest(F.length(c), F.lit(1))


def subword_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: runs of letters, runs of digits, and
    individual punctuation marks each count as one token — the standard
    cheap proxy for BPE vocabulary token counts."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"))


# Distinctive function-word profiles; a hit on a profile word votes for
# that language. Profiles use words that are near-unique per language.
_LANG_PROFILES = {
    "en": ("the", "and", "of", "is", "that", "with", "for", "this"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "pour"),
    "es": ("el", "los", "las", "es", "una", "para", "con", "por"),
    "it": ("il", "gli", "che", "per", "una", "sono", "con", "di"),
}


def lang_id(text: Column | str, profiles: dict = None) -> Column:
    """Heuristic language ID: the language whose function-word profile
    scores the most token hits (ties → lexicographic min). Pure column
    expressions — a single map over 100 TB, no shuffle; 'und'
    (undetermined) when nothing matches."""
    profiles = profiles or _LANG_PROFILES
    langs = sorted(profiles)
    t = F.transform(tokens(text), lambda x: F.lower(x))
    scored = F.array(*[
        F.struct(
            F.size(F.filter(t, lambda x: x.isin(*profiles[lang]))).alias("hits"),
            # higher priority = alphabetically earlier, so array_max
            # tie-breaks deterministically toward the lexicographic min
            F.lit(len(langs) - i).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ])
    best = F.array_max(F.filter(scored, lambda s: s["hits"] > 0))
    return F.coalesce(best["lang"], F.lit("und"))


_FP_MOD = 562949953421231  # prime < 2^49: 31·M + M stays under 2^63 (ANSI-safe)


def doc_fingerprint(text: Column | str) -> Column:
    """Rolling (polynomial) hash over tokens:
    fp = Σ token_hash · 31^position  (mod a 49-bit prime) — an
    order-sensitive content fingerprint, computed map-side. Modular
    rather than wrapping arithmetic because ANSI mode (Spark 4 default)
    raises on long overflow."""
    m = F.lit(_FP_MOD).cast("long")
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * 31 + F.pmod(F.xxhash64(x), m), m),
    )


def doc_fingerprint_portable(text: Column | str) -> Column:
    """Rolling fingerprint with a Rabin-Karp per-token hash instead of
    xxhash64: token_hash = Σ codepoint·131^i (mod p), folded into the
    same order-sensitive Σ token_hash·31^position (mod p) outer hash.

    Pure modular arithmetic over codepoints — no engine-specific hash
    function — so the result is reproducible by ANY engine (the DuckDB
    oracle mirrors it with list_reduce) and stable across engine
    versions, at the cost of per-char expression work. Use the
    xxhash64 variant when only Spark-side determinism is needed; this
    one when fingerprints must survive an engine boundary. Both run
    map-side — fingerprinting 100 TB is shuffle-free either way."""
    m = F.lit(_FP_MOD).cast("long")

    def tok_hash(t: Column) -> Column:
        return F.aggregate(
            F.split(t, ""), F.lit(0).cast("long"),
            lambda a, c: F.pmod(a * 131 + F.ascii(c), m))

    return F.aggregate(
        tokens(text), F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * 31 + tok_hash(t), m))
