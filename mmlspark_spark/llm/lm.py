"""Distributed n-gram language-model scoring for corpus curation.

CCNet-family pipelines rank web documents by language-model
perplexity and keep the low-perplexity (fluent) tail; Gopher and
the C4 lineage use the same signal as a quality gate. This module
is the Spark-native version of that stage: a bigram model with
add-k smoothing whose "training" is two exact distributed counts
and whose scoring is a join — no Python in either path.

Scale design (the whole point of doing this over a KenLM binary):

- **Fit is two shuffles.** Unigram and bigram counts are
  ``explode → groupBy → count`` with map-side partial aggregation,
  so the shuffle carries one row per distinct gram per task, not
  one per token. The model state is two *DataFrames* (vocab-bounded
  by Heaps' law — millions of rows for 100 TB of text, never
  O(corpus)) plus one driver scalar (vocab size).
- **Scoring is a hash join, not a model broadcast.** Each document
  explodes to (doc, prefix, bigram) rows that join the two count
  tables on their gram keys. AQE broadcasts the count tables when
  they fit and falls back to a shuffle hash join when they don't —
  exactly the two regimes a 100 TB corpus needs. No driver-side
  vocabulary ever materializes.
- **Determinism.** Counts are exact integers and the smoothing
  arithmetic is pure; the score is reproducible across
  partitionings and engines, which is what lets the catalog verify
  it hash-exact against DuckDB (an intentionally stronger contract
  than "perplexity-ish": the number itself is portable).

The smoothed conditional is

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V)

with V the unigram vocabulary size; a document's score is the mean
natural-log probability over its bigrams (``avg_logprob``; per-token
perplexity is ``exp(-avg_logprob)``). Documents with fewer than two
tokens have no bigrams and score NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model
from mmlspark_spark.functions.text_quality import raw_word_ngrams, tokens


def _prep(col, lowercase: bool):
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c) if lowercase else c


class NGramLanguageModel(Estimator):
    """Fit exact unigram/bigram counts over ``textCol``.

    Parameters: ``k`` is the add-k smoothing constant; ``lowercase``
    folds case before tokenizing (the CCNet convention). Fit on a
    clean reference corpus and score a raw one, or fit and score the
    same corpus for a self-perplexity signal (repetitive boilerplate
    scores high, rare-junk scores low).
    """

    def __init__(self, textCol: str = "text", k: float = 0.5,
                 lowercase: bool = True):
        if k <= 0:
            raise ValueError(
                "NGramLanguageModel needs k > 0: with k=0 an unseen "
                "prefix word makes the smoothed denominator 0 and the "
                "scoring job dies with DIVIDE_BY_ZERO under ANSI mode")
        super().__init__(textCol=textCol, k=k, lowercase=lowercase)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.textCol)
        return schema

    def _fit(self, df: DataFrame) -> "NGramLMModel":
        from mmlspark_spark.core.cache import persist_intermediate

        src = _prep(self.textCol, self.lowercase)
        # both count frames are persisted (vocab-bounded, tiny next to
        # the corpus): without the pin, vocab's count() plus EVERY
        # scoring join would re-run the full corpus tokenize + explode
        # + groupBy lineage — three-plus passes where one suffices.
        # transform() attaches the handles to its output; release via
        # core.cache.release_intermediates when done with the model.
        uni = persist_intermediate(
            df.select(F.explode(tokens(src)).alias("w"))
            .groupBy("w").agg(F.count("*").alias("uc")))
        bi = persist_intermediate(
            df.select(F.explode(raw_word_ngrams(src, 2)).alias("b"))
            .groupBy("b").agg(F.count("*").alias("bc")))
        # the single driver scalar; O(1) result, one count job that
        # also materializes the unigram cache
        vocab = uni.count()
        if vocab == 0:
            raise ValueError(
                "NGramLanguageModel: fit corpus produced no tokens "
                "(all texts empty/NULL) — a 0-vocab model would score "
                "every bigram with a 0 denominator")
        return NGramLMModel(unigrams=uni, bigrams=bi, vocabSize=vocab,
                            textCol=self.textCol, k=self.k,
                            lowercase=self.lowercase)


class NGramLMModel(Model):
    """Scores ``textCol`` with the fitted counts; adds
    ``avg_logprob`` (double, NULL for <2-token docs) and
    ``n_bigrams`` (int)."""

    def __init__(self, unigrams: DataFrame = None, bigrams: DataFrame = None,
                 vocabSize: int = 0, textCol: str = "text", k: float = 0.5,
                 lowercase: bool = True, outputCol: str = "avg_logprob",
                 idCol: str | None = None):
        super().__init__(unigrams=unigrams, bigrams=bigrams,
                         vocabSize=vocabSize, textCol=textCol, k=k,
                         lowercase=lowercase, outputCol=outputCol,
                         idCol=idCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.textCol)
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.outputCol, T.DoubleType()),
               T.StructField("n_bigrams", T.IntegerType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        # group the exploded bigrams back under a per-row key: the
        # caller's unique id when declared (deterministic under task
        # retries — prefer it), else a synthetic
        # monotonically_increasing_id (partition-local arithmetic, no
        # shuffle, never leaves this plan)
        if self.idCol:
            self._require_cols(df.schema, self.idCol)
            keyed = df.withColumn("__lm_row", F.col(self.idCol))
        else:
            # The synthetic key feeds BOTH sides of the join-back below
            # (explode/score subtree AND the final join). A
            # nondeterministic expression evaluated independently per
            # subtree can assign DIFFERENT ids when upstream is itself
            # nondeterministic (sample, rand filter, re-executed
            # shuffle) and scores would attach to the wrong rows —
            # localCheckpoint pins one materialization for both
            # consumers (same hazard zip_with_index pins,
            # operators/scale.py:140-158).
            keyed = (df.withColumn("__lm_row",
                                   F.monotonically_increasing_id())
                     .localCheckpoint())
        src = _prep(self.textCol, self.lowercase)
        ex = keyed.select(
            "__lm_row", F.explode(raw_word_ngrams(src, 2)).alias("b")
        ).withColumn("w1", F.split(F.col("b"), " ")[0])
        k, V = float(self.k), int(self.vocabSize)
        lp = F.log(
            (F.coalesce(F.col("bc"), F.lit(0)) + k)
            / (F.coalesce(F.col("uc"), F.lit(0)) + k * V))
        scored = (
            ex.join(self.bigrams, "b", "left")
            .join(self.unigrams, ex.w1 == self.unigrams.w, "left")
            .groupBy("__lm_row")
            .agg(F.avg(lp).alias(self.outputCol),
                 F.count("*").cast("int").alias("n_bigrams")))
        from mmlspark_spark.core.cache import attach_intermediates

        out = (keyed.join(scored, "__lm_row", "left")
               .withColumn("n_bigrams",
                           F.coalesce("n_bigrams", F.lit(0)))
               .drop("__lm_row"))
        return attach_intermediates(out, self.unigrams, self.bigrams)
