"""Dataflow convenience stages (SURVEY §2.2, §2.6, §2.7).

Semantics match the reference's `stages/` package; every stage compiles
to pure DataFrame operations so Catalyst keeps predicate pushdown /
column pruning / join planning. Parity citations are on each class.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from mmlspark_spark.core.base import Transformer


class SelectColumns(Transformer):
    """Keep only the listed columns.

    Parity: reference ``core/.../stages/SelectColumns.scala:23-53``.
    Compiles to ``df.select`` → Catalyst column pruning reaches the scan.
    """

    def __init__(self, cols: Sequence[str] = ()):  # noqa: D107
        super().__init__(cols=list(cols))

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, *self.cols)
        return T.StructType([schema[c] for c in self.cols])

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.select(*self.cols)


class DropColumns(Transformer):
    """Drop the listed columns.

    Parity: reference ``core/.../stages/DropColumns.scala:21-50``.
    """

    def __init__(self, cols: Sequence[str] = ()):  # noqa: D107
        super().__init__(cols=list(cols))

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, *self.cols)
        return T.StructType([f for f in schema.fields if f.name not in self.cols])

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.drop(*self.cols)


class RenameColumn(Transformer):
    """Rename ``inputCol`` to ``outputCol``.

    Parity: reference ``core/.../stages/RenameColumn.scala:21-42``.
    """

    def __init__(self, inputCol: str = "", outputCol: str = ""):  # noqa: D107
        super().__init__(inputCol=inputCol, outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType([
            T.StructField(self.outputCol, f.dataType, f.nullable, f.metadata)
            if f.name == self.inputCol else f
            for f in schema.fields
        ])

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumnRenamed(self.inputCol, self.outputCol)


class Explode(Transformer):
    """Append ``outputCol`` with one row per element of array ``inputCol``.

    Parity: reference ``core/.../stages/Explode.scala:18-43`` (keeps the
    original array column, appends the element column).
    """

    def __init__(self, inputCol: str = "", outputCol: str = ""):  # noqa: D107
        super().__init__(inputCol=inputCol, outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        dt = schema[self.inputCol].dataType
        if not isinstance(dt, T.ArrayType):
            raise ValueError(f"Explode: {self.inputCol} is {dt}, need array")
        return T.StructType(
            list(schema.fields) + [T.StructField(self.outputCol, dt.elementType, True)]
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.outputCol, F.explode(F.col(self.inputCol)))


class Lambda(Transformer):
    """Wrap an arbitrary ``DataFrame -> DataFrame`` function as a stage.

    Parity: reference ``core/.../stages/Lambda.scala:22-60``.
    """

    def __init__(self, fn: Callable[[DataFrame], DataFrame] = (lambda df: df)):  # noqa: D107
        super().__init__(fn=fn)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        # derive the output schema by planning the lambda over an empty
        # frame (Lambda.scala:40-52's transformSchema strategy) — only
        # the plan is built, no job runs
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return schema
        return self.fn(spark.createDataFrame([], schema)).schema

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


class UDFTransformer(Transformer):
    """Apply a (pandas-)UDF over one or more input columns → output column.

    Parity: reference ``core/.../stages/UDFTransformer.scala:26-110``.
    Prefer passing a pandas_udf: Arrow-vectorized, 10-100x a row UDF.
    """

    def __init__(self, inputCols: Sequence[str] = (), outputCol: str = "", udf=None):  # noqa: D107
        super().__init__(inputCols=list(inputCols), outputCol=outputCol, udf=udf)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, *self.inputCols)
        out_type = getattr(self.udf, "returnType", T.StringType())
        return T.StructType(
            list(schema.fields) + [T.StructField(self.outputCol, out_type, True)]
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.outputCol, self.udf(*[F.col(c) for c in self.inputCols]))


class Cacher(Transformer):
    """Cache (or uncache) passthrough stage.

    Parity: reference ``core/.../stages/Cacher.scala:14-43``.
    """

    def __init__(self, disable: bool = False):  # noqa: D107
        super().__init__(disable=disable)

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.unpersist() if self.disable else df.cache()


class Timer(Transformer):
    """Time a wrapped stage's transform (materializes via count unless
    disabled). Parity: reference ``core/.../stages/Timer.scala:55-133``.
    """

    def __init__(self, stage=None, disableMaterialization: bool = False,  # noqa: D107
                 logToScala: bool = False):
        super().__init__(stage=stage, disableMaterialization=disableMaterialization,
                         logToScala=logToScala)
        self.last_elapsed: float | None = None

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        return self.stage.transform_schema(schema) if hasattr(
            self.stage, "transform_schema") else schema

    def _transform(self, df: DataFrame) -> DataFrame:
        from mmlspark_spark.core.cache import (
            attach_intermediates,
            persist_intermediate,
        )

        t0 = time.time()
        out = self.stage.transform(df)
        if not self.disableMaterialization:
            # release handle attached (a bare .cache() pinned one frame
            # per timed stage for the session); caller frees via
            # core.cache.release_intermediates
            out = persist_intermediate(out)
            out.count()
            out = attach_intermediates(out, out)
        self.last_elapsed = time.time() - t0
        return out


class Repartition(Transformer):
    """Repartition to ``n`` partitions; ``disable`` makes it passthrough.
    Uses ``coalesce`` when reducing without ``useRepartition`` (no
    shuffle), full shuffle repartition otherwise — the same
    coalesce-vs-shuffle choice as the reference.

    Parity: reference ``core/.../stages/Repartition.scala:20-66``.
    """

    def __init__(self, n: int = 1, disable: bool = False, useRepartition: bool = False):  # noqa: D107
        super().__init__(n=n, disable=disable, useRepartition=useRepartition)

    def _transform(self, df: DataFrame) -> DataFrame:
        if self.disable:
            return df
        # partition count from the JVM-internal RDD: physical planning
        # only — no job, and no Python-serializer RDD conversion
        # (df.rdd would plan one)
        current = df._jdf.queryExecution().toRdd().getNumPartitions()
        if self.useRepartition or self.n > current:
            return df.repartition(self.n)
        return df.coalesce(self.n)


class StratifiedRepartition(Transformer):
    """Resample + repartition so every partition contains every label
    (e.g. for learners that need each class present on each worker).

    Modes (parity: reference
    ``core/.../stages/StratifiedRepartition.scala:37-77``):

    - ``equal``: every label is resampled WITH replacement to
      ``max(maxLabelCount, numPartitions)`` rows — class-balanced
      output, size ≈ numLabels × maxLabelCount.
    - ``original``: per-label counts are kept; rows are only re-spread.
    - ``mixed`` (default, as in the reference): the ``equal`` fractions
      are normalized by their mean — every label ends up with the same
      row count (#labels × harmonic-mean(label count) total, ≤ the
      original size). Note the reference's Scala computes the mixed
      fraction from the raw label COUNT over the mean fraction
      (StratifiedRepartition.scala:57-59), which amplifies the majority
      class quadratically — we read that as a variable-shadowing bug
      and implement the evident intent (equal fraction ÷ mean).

    Dataflow (vs the reference's RDD ``sampleByKeyExact`` +
    ``RangePartitioner``): the label histogram is collected (small —
    #labels entries), exact per-row copy counts are derived from a
    seeded per-label ``row_number`` (rank < remainder gets the extra
    copy — exact totals, no Poisson acceptance loop), copies come from
    one ``explode(sequence)``, and a per-label-normalized interleave key
    ``(copy·count+rank)/target`` in [0, 1) is range-partitioned so each
    contiguous range — hence each partition — holds every label. Two shuffles total (label
    window + range exchange), both on scalar keys; skewed labels stay
    within AQE's reach because the range key is uniform.
    """

    _MODES = ("equal", "original", "mixed")

    def __init__(self, labelCol: str = "label", mode: str = "mixed", seed: int = 42):  # noqa: D107
        if mode not in self._MODES:
            raise ValueError(f"mode must be one of {self._MODES}, got {mode!r}")
        super().__init__(labelCol=labelCol, mode=mode, seed=seed)

    def _transform(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        n_parts = spark.sparkContext.defaultParallelism
        counts = {r[0]: r[1] for r in
                  df.groupBy(self.labelCol).count().collect()}
        if not counts:
            return df
        max_count = max(max(counts.values()), n_parts)
        if self.mode == "equal":
            target = {l: max_count for l in counts}
        elif self.mode == "original":
            target = dict(counts)
        else:  # mixed: equal fractions normalized by their mean
            eq_frac = {l: max_count / c for l, c in counts.items()}
            mean_frac = sum(eq_frac.values()) / len(eq_frac)
            target = {l: max(1, int(round(c * eq_frac[l] / mean_frac)))
                      for l, c in counts.items()}

        lbl = F.col(self.labelCol)

        def lookup(d: dict):
            # NULL is a legal label value but an ILLEGAL map key
            # (NULL_MAP_KEY kills the job) — route it through a
            # when-branch and keep the typed map for the rest
            nn = {l: v for l, v in d.items() if l is not None}
            expr = (F.create_map(*[F.lit(x) for l, v in nn.items()
                                   for x in (l, v)])[lbl]
                    if nn else F.lit(None))
            if None in d:
                expr = F.when(lbl.isNull(), F.lit(d[None])).otherwise(expr)
            return expr

        t_l = lookup(target)
        c_l = lookup(counts)
        w = Window.partitionBy(lbl).orderBy(F.rand(self.seed))
        ranked = df.withColumn("__r", F.row_number().over(w) - 1)
        copies = (F.floor(t_l / c_l)
                  + F.when(F.col("__r") < t_l % c_l, 1).otherwise(0)
                  ).cast("int")
        seq = F.when(copies > 0, F.sequence(F.lit(0), copies - 1)) \
               .otherwise(F.array().cast("array<int>"))
        # Interleave key NORMALIZED per label to [0, 1): the raw index
        # copy·count+rank spans [0, t_label) — a per-label range, so
        # range partitions above the minority labels' counts would hold
        # only the majority label (the exact failure this stage
        # exists to prevent). Dividing by the label's target count puts
        # every label's rows uniformly across the same unit interval,
        # so every quantile range — hence every partition — sees every
        # label (provided the label has >= numPartitions output rows).
        return (
            ranked.withColumn("__copy", F.explode(seq))
            .withColumn(
                "__s",
                (F.col("__copy") * c_l + F.col("__r")).cast("double") / t_l)
            .repartitionByRange(n_parts, "__s")
            .drop("__r", "__copy", "__s")
        )


class DropMissingData(Transformer):
    """Drop rows with nulls in the given columns (all columns when empty).

    Parity: reference drops NA via ``df.na`` inside Lambda stages
    (``core/.../featurize/Featurize.scala:181``); promoted to a stage here.
    """

    def __init__(self, cols: Sequence[str] = ()):  # noqa: D107
        super().__init__(cols=list(cols))

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.na.drop(subset=list(self.cols) or None)


class MultiColumnAdapter(Transformer):
    """Map a single-column stage over many (inputCol, outputCol) pairs by
    cloning the base stage per pair.

    Parity: reference ``core/.../stages/MultiColumnAdapter.scala:20-135``.
    """

    def __init__(self, baseStage=None, inputCols: Sequence[str] = (),  # noqa: D107
                 outputCols: Sequence[str] = ()):
        super().__init__(baseStage=baseStage, inputCols=list(inputCols),
                         outputCols=list(outputCols))
        if len(self.inputCols) != len(self.outputCols):
            raise ValueError("inputCols and outputCols must have equal length")

    def _clones(self):
        for i, o in zip(self.inputCols, self.outputCols):
            c = self.baseStage.copy()
            # _set, not set(name, value): stock SparkML Params.set
            # requires a Param object and returns None, so the engine
            # idiom crashed on any stock base stage (Tokenizer etc.)
            c._set(inputCol=i, outputCol=o)
            yield c

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        for c in self._clones():
            if hasattr(c, "transform_schema"):  # stock stages lack it
                schema = c.transform_schema(schema)
        return schema

    def _transform(self, df: DataFrame) -> DataFrame:
        for c in self._clones():
            df = c.transform(df)
        return df


class StratifiedSampler(Transformer):
    """Per-stratum subsampling for training-data curation (engine
    extra, sibling of StratifiedRepartition): cap each stratum —
    e.g. (lang, source) — at ``perStratum`` rows so no bucket
    dominates the mix.

    Two modes:

    - ``exact=True`` (default): deterministic per-stratum head —
      ``row_number`` over ``orderBy`` within each stratum, keep the
      first ``perStratum``. Reproducible run-to-run and engine-to-
      engine (it is the catalog's oracled mode).
    - ``exact=False``: seeded Bernoulli via ``sampleBy`` with
      ``fractions`` (per-stratum fraction dict over the FIRST stratum
      column, Spark's native stratified sampler) — cheaper at scale
      (no window shuffle), sample-exactness traded away. Persistence
      note: save/load serializes params as JSON, so ``fractions`` keys
      must be strings; numeric-keyed dicts work at transform time but
      cannot be persisted.

    Scale: the exact mode is one shuffle on the stratum key; skew
    (one giant stratum) is the normal window-skew case AQE handles,
    and the output is bounded at strata x perStratum rows.
    """

    def __init__(self, stratumCols=("lang",), perStratum: int = 100,
                 orderBy: str = "doc_id", exact: bool = True,
                 fractions: dict | None = None, seed: int = 42):
        super().__init__(stratumCols=list(stratumCols),
                         perStratum=perStratum, orderBy=orderBy,
                         exact=exact, fractions=dict(fractions or {}),
                         seed=seed)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, *self.stratumCols)
        if self.exact:
            self._require_cols(schema, self.orderBy)
        elif not self.fractions:
            # eager contract: sampleBy treats absent strata as
            # fraction 0, so an empty dict would silently return an
            # empty frame 3 hours into a run
            raise ValueError(
                "StratifiedSampler(exact=False) needs a non-empty "
                "`fractions` dict; strata missing from it are DROPPED "
                "(sampleBy semantics)")
        return schema

    def _transform(self, df: DataFrame) -> DataFrame:
        if not self.exact:
            return df.sampleBy(self.stratumCols[0], self.fractions,
                               seed=self.seed)
        w = (Window.partitionBy(*self.stratumCols)
             .orderBy(F.col(self.orderBy)))
        return (df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= self.perStratum)
                .drop("__rn"))
