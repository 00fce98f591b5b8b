"""Distributed BPE training + tokenization for LLM data pipelines.

Why this shape scales: BPE training does NOT need the corpus — it
needs the corpus's WORD HISTOGRAM (Sennrich et al. 2016 train on
word-frequency dicts). So the 100 TB part of the job is ONE
whitespace-tokenize + groupBy(word).count() shuffle whose output is
vocabulary-sized (Heaps' law: ~10^6 distinct words for web corpora,
MBs not TBs), and the merge-learning loop runs on the driver over
that histogram, independent of corpus size. Tokenization is then a
map-only Arrow-batched pandas UDF with the (small, ordered) merge
table in the closure and per-word memoization — Zipf makes the cache
hit rate extreme, so most words tokenize via a dict lookup.

No SQL oracle (merge learning is iterative and data-dependent);
correctness is pinned by hand-computed merge sequences in
tests/test_curation.py instead.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model

_END = "</w>"

# EXACTLY Java regex \s (ASCII-only), the splitter functions/
# text_quality.tokens() uses at fit time. Python's str.split() /
# re \s default to UNICODE whitespace (NBSP, ideographic space, ...),
# which would make the encoder see different word boundaries than the
# fitted histogram — merges learned for words the encoder never
# produces, real words encoded with no merges. Single source of truth:
# functions/text_quality.JAVA_WS_RE (shared with build_vocabulary).
import re as _re

from mmlspark_spark.functions.text_quality import JAVA_WS_RE

_JAVA_WS = _re.compile(JAVA_WS_RE)


def _java_ws_split(text: str) -> list[str]:
    return [w for w in _JAVA_WS.split(text) if w]


def _learn_merges(word_counts: dict[str, int], num_merges: int,
                  ) -> list[tuple[str, str]]:
    """Classic BPE on a word histogram: repeatedly merge the most
    frequent adjacent symbol pair. Ties break lexicographically so
    the learned table is deterministic across runs and partitionings
    (plain max-by-count would depend on dict iteration order).

    Incremental (Sennrich-style): pair counts update only for the
    words that CONTAIN the merged pair - a from-scratch recount per
    iteration is O(numMerges x total symbols) (~10^10 driver ops at
    the default 1000 merges over a 10^6-word histogram) where this is
    O(touched words) per merge, Zipf-small. The best pair comes from
    a lazy max-heap: stale entries are discarded when their recorded
    count no longer matches the live count; ties pop the
    lexicographically smallest pair, preserving the deterministic
    contract."""
    import heapq

    vocab: list[list] = [[list(w) + [_END], c]
                         for w, c in word_counts.items() if w]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (sym, c) in enumerate(vocab):
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(idx)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, best = heapq.heappop(heap)
        live = pair_counts.get(best, 0)
        if live <= 0 or -negc != live:
            continue  # stale or exhausted entry
        merges.append(best)
        merged = best[0] + best[1]
        touched: set[tuple[str, str]] = set()
        for idx in list(pair_words.get(best, ())):
            sym, c = vocab[idx]
            for p in zip(sym, sym[1:]):
                pair_counts[p] -= c
                touched.add(p)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(idx)
            new = []
            i = 0
            while i < len(sym):
                if (i + 1 < len(sym)
                        and sym[i] == best[0] and sym[i + 1] == best[1]):
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            vocab[idx][0] = new
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(idx)
                touched.add(p)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, always taking the
    lowest-rank (earliest-learned) applicable merge first — the
    standard BPE inference order."""
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BPETokenizerModel(Model):
    """Fitted model: an ordered merge list. ``transform`` appends
    ``outputCol`` (array<string> of subword tokens, ``</w>``-marked
    word ends) via a map-only Arrow-batched pandas UDF."""

    def __init__(self, merges=None, textCol: str = "text",
                 outputCol: str = "bpe_tokens", lowercase: bool = True):
        super().__init__(merges=[list(m) for m in (merges or [])],
                         textCol=textCol, outputCol=outputCol,
                         lowercase=lowercase)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.textCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, T.ArrayType(T.StringType()))])

    def _transform(self, df: DataFrame) -> DataFrame:
        ranks = {tuple(m): i for i, m in enumerate(self.merges)}
        lower = self.lowercase
        tc = self.textCol

        def encode(batches: Iterator) -> Iterator:
            import pandas as pd

            # Zipf makes the hit rate extreme, but the tail is
            # unbounded — cap the memo so a worker streaming billions
            # of rows cannot grow it past ~1M entries (rare words just
            # re-encode; they are rare by construction).
            cache: dict[str, list[str]] = {}
            cache_cap = 1_000_000

            def enc_text(text):
                if text is None:
                    return None
                toks: list[str] = []
                for w in _java_ws_split(text.lower() if lower else text):
                    hit = cache.get(w)
                    if hit is None:
                        hit = _encode_word(w, ranks)
                        if len(cache) < cache_cap:
                            cache[w] = hit
                    toks.extend(hit)
                return toks

            for pdf in batches:
                pdf = pdf.copy()
                pdf["__bpe"] = pdf[tc].map(enc_text)
                yield pdf

        out_schema = self.transform_schema(df.schema)
        arrow_schema = T.StructType(
            [f for f in df.schema.fields]
            + [T.StructField("__bpe", T.ArrayType(T.StringType()))])
        res = df.mapInPandas(encode, schema=arrow_schema)
        return res.withColumnRenamed("__bpe", self.outputCol).select(
            *[f.name for f in out_schema.fields])


class BPETokenizer(Estimator):
    """Learn a BPE merge table from the corpus word histogram.

    ``fit`` runs ONE distributed shuffle (whitespace-tokenize →
    groupBy(word).count(), vocabulary-sized output), collects the
    histogram, and learns ``numMerges`` merges on the driver —
    corpus-size-independent by construction. ``maxVocabWords`` caps
    the collected histogram (most-frequent words first; the dropped
    tail is Zipf dust that cannot influence early merges materially)
    so the driver memory bound is explicit.
    """

    def __init__(self, textCol: str = "text", outputCol: str = "bpe_tokens",
                 numMerges: int = 1000, lowercase: bool = True,
                 minWordFreq: int = 1, maxVocabWords: int = 1_000_000):
        super().__init__(textCol=textCol, outputCol=outputCol,
                         numMerges=numMerges, lowercase=lowercase,
                         minWordFreq=minWordFreq, maxVocabWords=maxVocabWords)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.textCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, T.ArrayType(T.StringType()))])

    def _fit(self, df: DataFrame) -> BPETokenizerModel:
        from mmlspark_spark.functions.text_quality import tokens

        src = (F.lower(F.col(self.textCol)) if self.lowercase
               else F.col(self.textCol))
        counts = (df.select(F.explode(tokens(src)).alias("__w"))
                  .groupBy("__w").agg(F.count("*").alias("__c")))
        if self.minWordFreq > 1:
            counts = counts.filter(F.col("__c") >= self.minWordFreq)
        # deterministic cap: most frequent first, ties by word
        rows = (counts.orderBy(F.col("__c").desc(), F.col("__w"))
                .limit(self.maxVocabWords).collect())
        hist = {r["__w"]: int(r["__c"]) for r in rows}
        merges = _learn_merges(hist, self.numMerges)
        return BPETokenizerModel(
            merges=merges, textCol=self.textCol,
            outputCol=self.outputCol, lowercase=self.lowercase)


def build_vocabulary(df: DataFrame, textCol: str = "text",
                     minCount: int = 2,
                     maxVocab: int | None = None) -> DataFrame:
    """Distributed word-level vocabulary: (token_id, word, freq).

    The standalone form of what TextFeaturizer's CountVectorizer does
    internally, exposed because LLM pipelines need the artifact itself
    (vocab files for tokenizers, frequency tables for LM smoothing,
    OOV analysis). Tokenization uses the same ASCII whitespace class
    as the BPE fit (``_JAVA_WS``), so the two artifacts agree on word
    boundaries.

    Deterministic ids: rank by (freq DESC, word ASC) — ties break
    lexicographically, so ids are stable across runs, partitionings,
    and engines (the ``vocab_build`` catalog query verifies the whole
    table hash-exact against DuckDB).

    Scale: the corpus-sized work is ONE tokenize + groupBy(word)
    shuffle; the ranking window is a single-partition sort over the
    RESULT, which is vocabulary-sized (Heaps' law: ~10⁶ rows for web
    corpora — MBs, not TBs), so the global sort that would be a
    scale bug over documents is harmless over the histogram.
    """
    from pyspark.sql.window import Window

    from mmlspark_spark.operators.scale import spread_narrow_scan

    # prune to the text column BEFORE the narrow-scan spread so the
    # (small-input-only) repartition moves text bytes, nothing else;
    # safe for this aggregation — counts are exact integers, so
    # repartitioning cannot move the result (unlike float sums)
    src = spread_narrow_scan(df.select(F.col(textCol)))
    hist = (src.select(F.explode(
                F.split(F.col(textCol), JAVA_WS_RE)).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").count()
            .filter(F.col("count") >= minCount))
    w = Window.orderBy(F.col("count").desc(), "word")
    out = hist.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("long"))
    if maxVocab is not None:
        out = out.filter(F.col("token_id") < maxVocab)
    return out.select("token_id", "word", F.col("count").alias("freq"))
