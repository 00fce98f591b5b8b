"""Text featurization stages.

Parity targets: ``featurize/text/TextFeaturizer.scala:196-405``,
``featurize/text/PageSplitter.scala:23-100``,
``featurize/text/MultiNGram.scala:26-70``,
``stages/TextPreprocessor.scala:17-152``,
``stages/UnicodeNormalize.scala:22-79``.

Design: everything that CAN be a Catalyst expression is (MultiNGram,
tokenize); the string algorithms with real per-string control flow
(page splitting, trie replacement, unicode normalization) are
Arrow-batched pandas UDFs — vectorized transfer, pure-python inner loop
on each batch.
"""

from __future__ import annotations

import re
from typing import Sequence

import pandas as pd
from pyspark.ml import Pipeline
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Estimator, Model, Transformer


class UnicodeNormalize(Transformer):
    """NFC/NFD/NFKC/NFKD normalization + optional lowercase.

    Parity: reference ``stages/UnicodeNormalize.scala:22-79``.
    """

    def __init__(self, inputCol: str = "text", outputCol: str = "norm",  # noqa: D107
                 form: str = "NFKC", lower: bool = True):
        super().__init__(inputCol=inputCol, outputCol=outputCol, form=form,
                         lower=lower)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.StringType(), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        form, lower = self.form, self.lower

        @F.pandas_udf(T.StringType())
        def norm(s: pd.Series) -> pd.Series:
            out = s.str.normalize(form)
            return out.str.lower() if lower else out

        return df.withColumn(self.outputCol, norm(F.col(self.inputCol)))


class PageSplitter(Transformer):
    """Split text into pages of at most ``maximumPageLength`` chars,
    preferring to break on whitespace after ``minimumPageLength``.

    Parity: reference ``featurize/text/PageSplitter.scala:23-100``
    (boundary-preserving greedy split).
    """

    def __init__(self, inputCol: str = "text", outputCol: str = "pages",  # noqa: D107
                 maximumPageLength: int = 5000, minimumPageLength: int = 4500):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         maximumPageLength=maximumPageLength,
                         minimumPageLength=minimumPageLength)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, T.ArrayType(T.StringType()), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        max_len, min_len = self.maximumPageLength, self.minimumPageLength

        def split_one(text: str) -> list[str]:
            if text is None:
                return None
            pages, start, n = [], 0, len(text)
            while n - start > max_len:
                # prefer the last whitespace inside (min_len, max_len]
                window = text[start + min_len:start + max_len]
                ws = [m.start() for m in re.finditer(r"\s", window)]
                cut = (start + min_len + ws[-1] + 1) if ws else (start + max_len)
                pages.append(text[start:cut])
                start = cut
            pages.append(text[start:])
            return pages

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def split_pages(s: pd.Series) -> pd.Series:
            return s.map(split_one)

        return df.withColumn(self.outputCol, split_pages(F.col(self.inputCol)))


def ngrams(toks, n: int):
    """Word n-grams of an array<string> column as a Catalyst expression
    (order-preserving, non-distinct — matches pyspark.ml NGram)."""
    t = F.col(toks) if isinstance(toks, str) else toks
    m = F.size(t) - (n - 1)
    # the when-guard is load-bearing: sequence(1, 0) yields the
    # DESCENDING array [1, 0] and slice(t, 0, n) then throws
    # INVALID_PARAMETER_VALUE.START — one empty document would abort
    # the whole job
    return F.when(
        m >= 1,
        F.transform(F.sequence(F.lit(1), m),
                    lambda i: F.concat_ws(" ", F.slice(t, i, n))),
    ).otherwise(F.array().cast("array<string>"))


class MultiNGram(Transformer):
    """N-grams for several lengths concatenated into one array.

    Parity: reference ``featurize/text/MultiNGram.scala:26-70`` (NGram ×k
    + concat) — here a single expression, no intermediate columns.
    """

    def __init__(self, inputCol: str = "tokens", outputCol: str = "ngrams",  # noqa: D107
                 lengths: Sequence[int] = (1, 2, 3)):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         lengths=list(lengths))

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, T.ArrayType(T.StringType()), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        parts = [ngrams(self.inputCol, n) for n in self.lengths]
        return df.withColumn(self.outputCol, F.concat(*parts))


class TextPreprocessor(Transformer):
    """Multi-pattern string replacement with longest-match-first
    semantics over a replacement ``map``.

    Parity: reference ``stages/TextPreprocessor.scala:98-152`` builds a
    character trie for longest-match; a compiled alternation sorted by
    descending pattern length has identical match semantics and runs
    vectorized over Arrow batches.
    """

    def __init__(self, inputCol: str = "text", outputCol: str = "processed",  # noqa: D107
                 map: dict | None = None, normFunc: str | None = "lower"):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         map=map or {}, normFunc=normFunc)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, T.StringType(), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        norm = self.normFunc
        # keys must pass through the SAME normFunc as the text (the
        # reference trie normalizes both): with normFunc='lower', a
        # raw key 'Mr.' could never match the already-lowered text.
        # Normalized-key collisions resolve to the last declaration.
        def _nrm(k: str) -> str:
            if norm == "lower":
                return k.lower()
            if norm == "upper":
                return k.upper()
            return k

        mapping = {_nrm(k): v for k, v in dict(self.map).items()}
        if mapping:
            pattern = re.compile("|".join(
                re.escape(k) for k in sorted(mapping, key=len, reverse=True)))
        else:
            pattern = None

        @F.pandas_udf(T.StringType())
        def preprocess(s: pd.Series) -> pd.Series:
            out = s
            if norm == "lower":
                out = out.str.lower()
            elif norm == "upper":
                out = out.str.upper()
            if pattern is not None:
                out = out.map(
                    lambda x: pattern.sub(lambda m: mapping[m.group(0)], x)
                    if x is not None else None)
            return out

        return df.withColumn(self.outputCol, preprocess(F.col(self.inputCol)))


class TextFeaturizer(Estimator):
    """Configurable text→vector pipeline: regex tokenize → stopword
    removal → multi-n-gram → hashing TF → IDF.

    Parity: reference ``featurize/text/TextFeaturizer.scala:196-405``;
    built from stock ``pyspark.ml.feature`` stages so the fitted model is
    a plain PipelineModel.
    """

    def __init__(self, inputCol: str = "text", outputCol: str = "features",  # noqa: D107
                 tokenizerPattern: str = r"\s+", useStopWordsRemover: bool = False,
                 nGramLengths: Sequence[int] = (1,), numFeatures: int = 1 << 18,
                 useIDF: bool = True, minDocFreq: int = 1):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         tokenizerPattern=tokenizerPattern,
                         useStopWordsRemover=useStopWordsRemover,
                         nGramLengths=list(nGramLengths),
                         numFeatures=numFeatures, useIDF=useIDF,
                         minDocFreq=minDocFreq)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        from pyspark.ml.linalg import VectorUDT

        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, VectorUDT(), True)])

    def _fit(self, df: DataFrame):
        from pyspark.ml.feature import (
            IDF,
            HashingTF,
            RegexTokenizer,
            StopWordsRemover,
        )

        stages = [RegexTokenizer(inputCol=self.inputCol, outputCol="__tok",
                                 pattern=self.tokenizerPattern)]
        tok_col = "__tok"
        if self.useStopWordsRemover:
            stages.append(StopWordsRemover(inputCol=tok_col, outputCol="__tok2"))
            tok_col = "__tok2"
        ngram_stage = MultiNGram(inputCol=tok_col, outputCol="__ngrams",
                                 lengths=self.nGramLengths)
        stages.append(ngram_stage)
        tf_out = "__tf" if self.useIDF else self.outputCol
        stages.append(HashingTF(inputCol="__ngrams", outputCol=tf_out,
                                numFeatures=self.numFeatures))
        if self.useIDF:
            stages.append(IDF(inputCol="__tf", outputCol=self.outputCol,
                              minDocFreq=self.minDocFreq))
        # tokenize+hash is the dominant CPU; don't let a 1-2-split scan
        # serialize the IDF fit onto 1-2 cores (no-op at scale)
        from mmlspark_spark.operators.scale import spread_narrow_scan

        pipeline_model = Pipeline(stages=stages).fit(spread_narrow_scan(df))
        return TextFeaturizerModel(pipelineModel=pipeline_model,
                                   outputCol=self.outputCol)

    def fit_transform(self, df: DataFrame) -> DataFrame:
        """Fit on ``df`` and return its transform with ONE
        tokenize→n-gram→hashTF pass instead of two.

        ``fit(df).transform(df)`` tokenizes and hashes the corpus twice:
        once so the IDF fit can aggregate document frequencies, then
        again to produce the output rows. Everything before IDF is a
        pure (un-fitted) transformer chain, so this path materializes
        the TF frame once (MEMORY_AND_DISK), fits IDF from the cache,
        and scales the cached rows — at 100 TB that is one corpus scan
        and one tokenization instead of two of each. The persisted
        handle is attached to the returned frame; call
        ``release_intermediates`` after your action (bench.py does).
        Results are bit-identical to ``fit(df).transform(df)``: same
        stages, same parameters, same row order semantics.
        """
        from mmlspark_spark.core.cache import (
            attach_intermediates,
            persist_intermediate,
        )
        from mmlspark_spark.operators.scale import spread_narrow_scan

        if not self.useIDF:
            # no fitted state anywhere in the chain → fit runs no job
            return self._fit(df).transform(df)
        from pyspark.ml.feature import (
            IDF,
            HashingTF,
            RegexTokenizer,
            StopWordsRemover,
        )

        src = spread_narrow_scan(df)
        out = RegexTokenizer(inputCol=self.inputCol, outputCol="__tok",
                             pattern=self.tokenizerPattern).transform(src)
        tok_col = "__tok"
        if self.useStopWordsRemover:
            out = StopWordsRemover(inputCol=tok_col,
                                   outputCol="__tok2").transform(out)
            tok_col = "__tok2"
        out = MultiNGram(inputCol=tok_col, outputCol="__ngrams",
                         lengths=self.nGramLengths).transform(out)
        tf = HashingTF(inputCol="__ngrams", outputCol="__tf",
                       numFeatures=self.numFeatures).transform(out)
        tf = persist_intermediate(tf.select(*df.columns, "__tf"))
        idf_model = IDF(inputCol="__tf", outputCol=self.outputCol,
                        minDocFreq=self.minDocFreq).fit(tf)
        scaled = idf_model.transform(tf).drop("__tf")
        return attach_intermediates(scaled, tf)


class TextFeaturizerModel(Model):
    def __init__(self, pipelineModel=None, outputCol: str = "features"):  # noqa: D107
        super().__init__(pipelineModel=pipelineModel, outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        from pyspark.ml.linalg import VectorUDT

        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, VectorUDT(), True)])

    def _transform(self, df: DataFrame) -> DataFrame:
        from mmlspark_spark.operators.scale import spread_narrow_scan

        out = self.pipelineModel.transform(spread_narrow_scan(df))
        return out.drop(*[c for c in out.columns if c.startswith("__")])
