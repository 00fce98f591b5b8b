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


def _learn_merges(word_counts: dict[str, int], num_merges: int,
                  ) -> list[tuple[str, str]]:
    """Classic BPE on a word histogram: repeatedly merge the most
    frequent adjacent symbol pair. Ties break lexicographically so
    the learned table is deterministic across runs and partitionings
    (plain max-by-count would depend on dict iteration order)."""
    words = {tuple(w) + (_END,): c for w, c in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple, int] = {}
        for sym, c in words.items():
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
            key = tuple(new)
            out[key] = out.get(key, 0) + c
        words = out
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

            cache: dict[str, list[str]] = {}

            def enc_text(text):
                if text is None:
                    return None
                toks: list[str] = []
                for w in (text.lower() if lower else text).split():
                    hit = cache.get(w)
                    if hit is None:
                        hit = cache[w] = _encode_word(w, ranks)
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
