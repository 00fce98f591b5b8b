"""Document quality filtering for training-data curation.

C4/Gopher-family rule filter (the task's text-analysis pipeline
slot): each rule is a pure column expression, the verdict is
(keep: bool, reason: first-failing-rule-name | NULL), and the whole
operator is one map stage — filtering 100 TB is shuffle-free and
rides whole-stage codegen, no UDFs.

Keeping the reason (not just the boolean) is what makes the filter
auditable: corpus curation wants per-rule drop counts, and
``groupBy("reason").count()`` on this output is that report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer
from mmlspark_spark.functions.text_quality import (
    dup_line_fraction,
    punct_ratio,
    stopword_ratio,
    token_count,
)


class QualityFilter(Transformer):
    """Rule-ordered document filter: the first failing rule names the
    drop reason. Rules (C4/Gopher family), in evaluation order:

    - ``too_short`` / ``too_long``: character length outside
      [minChars, maxChars];
    - ``too_few_tokens``: whitespace token count below minTokens;
    - ``punct_heavy``: punctuation character ratio above
      maxPunctRatio (C4's symbol filter);
    - ``low_stopword``: stopword density below minStopwordRatio
      (Gopher's "no function words → not prose" rule; 0.0 disables);
    - ``repetitious``: duplicate-line fraction above
      maxDupLineFraction (Gopher repetition family).

    Thresholds are per-pipeline knobs, not learned state. Output adds
    ``keepCol`` (bool) and ``reasonCol`` (string, NULL when kept);
    drop the rows or audit the reasons downstream.
    """

    def __init__(self, textCol: str = "text", minChars: int = 50,
                 maxChars: int = 100_000, minTokens: int = 10,
                 maxPunctRatio: float = 0.3,
                 minStopwordRatio: float = 0.0,
                 maxDupLineFraction: float = 0.5,
                 keepCol: str = "keep", reasonCol: str = "reason"):
        super().__init__(textCol=textCol, minChars=minChars,
                         maxChars=maxChars, minTokens=minTokens,
                         maxPunctRatio=maxPunctRatio,
                         minStopwordRatio=minStopwordRatio,
                         maxDupLineFraction=maxDupLineFraction,
                         keepCol=keepCol, reasonCol=reasonCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.textCol)
        return T.StructType(
            list(schema.fields)
            + [T.StructField(self.keepCol, T.BooleanType()),
               T.StructField(self.reasonCol, T.StringType())])

    def _transform(self, df: DataFrame) -> DataFrame:
        c = F.col(self.textCol)
        n = F.length(c)
        rules = [
            ("too_short", n < self.minChars),
            ("too_long", n > self.maxChars),
            ("too_few_tokens", token_count(c) < self.minTokens),
            ("punct_heavy", punct_ratio(c) > self.maxPunctRatio),
        ]
        if self.minStopwordRatio > 0.0:
            rules.append(
                ("low_stopword",
                 stopword_ratio(c) < self.minStopwordRatio))
        rules.append(
            ("repetitious",
             dup_line_fraction(c) > self.maxDupLineFraction))
        reason = F.lit(None).cast("string")
        for name, bad in reversed(rules):
            reason = F.when(bad, F.lit(name)).otherwise(reason)
        return (df.withColumn(self.reasonCol, reason)
                .withColumn(self.keepCol, F.col(self.reasonCol).isNull()))
