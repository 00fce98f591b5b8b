"""LIME (tabular + vector) — explode-sample → score → per-id lasso.

Parity: reference ``explainers/LIMEBase.scala:49-145`` and the samplers
in ``explainers/Sampler.scala`` (LIMEVectorSampler/LIMETabularSampler):

- continuous feature: state = a value drawn from N(x_i, std_i) where
  std comes from the background data; the regression runs on the raw
  sampled values (``Sampler.scala:89-125``);
- discrete feature: sampled from the background empirical distribution;
  state = 1 iff the draw equals the original value;
- distance = ||(x - x')/std||₂ / √n ; weight = √exp(-(d/kernelWidth)²)
  (``LIMEBase.scala:55-65``);
- per-id fit: weighted lasso with intercept → coefficients + r²
  (``LIMEBase.scala:95-114``), attached back with a broadcast join.

Dataflow is Spark-first: sample generation is ``mapInPandas`` with a
per-row rng seeded by (seed, id) — deterministic under any
partitioning; scoring reuses the inner model's own DataFrame plan; the
per-id solve is ``applyInPandas`` (grouped Arrow batches). Nothing is
collected to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer
from mmlspark_spark.explainers.regression import weighted_lasso

_ID = "__lime_id__"


def _background_stats(background: DataFrame, inputCols, categoricalCols,
                      max_background_rows: int = 2000):
    """(means, stds) for continuous cols + value pools for categoricals."""
    cont = [c for c in inputCols if c not in categoricalCols]
    stats = {}
    if cont:
        aggs = []
        for c in cont:
            aggs += [F.avg(c).alias(f"__m_{c}"), F.stddev_pop(c).alias(f"__s_{c}")]
        row = background.agg(*aggs).collect()[0]
        for c in cont:
            stats[c] = ("cont", float(row[f"__m_{c}"] or 0.0),
                        float(row[f"__s_{c}"] or 0.0) or 1e-9)
    for c in categoricalCols:
        pool = [r[0] for r in
                background.select(c).limit(max_background_rows).collect()]
        stats[c] = ("disc", pool, None)
    return stats


class _LIMEBase(Transformer):
    def transform_schema(self, schema: T.StructType) -> T.StructType:
        return T.StructType(list(schema.fields) + [
            T.StructField(self.outputCol, T.ArrayType(T.DoubleType())),
            T.StructField(self.metricsCol, T.DoubleType()),
        ])

    def _explain(self, df: DataFrame, sample_gen, state_cols) -> DataFrame:
        """Common pipeline: id → samples → model → per-id lasso → join."""
        model, target_col, target_class = self.model, self.targetCol, self.targetClass
        kernel_width, regularization = self.kernelWidth, self.regularization
        out_col, metrics_col = self.outputCol, self.metricsCol

        from mmlspark_spark.core.cache import (
            attach_intermediates,
            persist_intermediate,
        )

        # persisted with a release handle (NOT a bare .cache(), which
        # leaked a pinned copy of the full input per transform call):
        # src feeds both the sample generator and the final join
        src = persist_intermediate(
            df.withColumn(_ID, F.monotonically_increasing_id()))
        samples = sample_gen(src)
        scored = model.transform(samples)
        target = self._extract_target(scored, target_col, target_class)

        solve_schema = T.StructType([
            T.StructField(_ID, T.LongType()),
            T.StructField(out_col, T.ArrayType(T.DoubleType())),
            T.StructField(metrics_col, T.DoubleType()),
        ])

        def solve(key, pdf: pd.DataFrame) -> pd.DataFrame:
            x = np.column_stack([pdf[c].to_numpy(np.float64) for c in state_cols])
            y = pdf["__target__"].to_numpy(np.float64)
            d = pdf["__distance__"].to_numpy(np.float64)
            w = np.sqrt(np.exp(-((d / kernel_width) ** 2)))
            coefs, _, r2 = weighted_lasso(x, y, w, regularization)
            return pd.DataFrame({
                _ID: [key[0]],
                out_col: [[float(v) for v in coefs]],
                metrics_col: [float(r2)],
            })

        fitted = (target.select(_ID, "__target__", "__distance__", *state_cols)
                  .groupBy(_ID).applyInPandas(solve, solve_schema))
        # plain shuffle join: src and fitted have the SAME cardinality
        # (one row per explained id), so a broadcast hint on either
        # side would collect the whole explain batch to the driver
        out = src.join(fitted, _ID, "inner").drop(_ID)
        return attach_intermediates(out, src)

    @staticmethod
    def _extract_target(scored: DataFrame, target_col: str, target_class: int):
        t = scored.schema[target_col].dataType
        if isinstance(t, (T.DoubleType, T.FloatType, T.IntegerType, T.LongType)):
            expr = F.col(target_col).cast("double")
        elif isinstance(t, T.ArrayType):
            expr = F.col(target_col)[target_class].cast("double")
        else:  # ML VectorUDT (probability columns)
            from pyspark.ml.functions import vector_to_array

            expr = vector_to_array(F.col(target_col))[target_class]
        return scored.withColumn("__target__", expr)


class TabularLIME(_LIMEBase):
    """Explain ``model`` w.r.t. raw input columns.

    ``model`` must be a fitted Transformer consuming ``inputCols`` (plus
    whatever featurization it embeds) and emitting ``targetCol``.
    """

    def __init__(self, model=None, inputCols=None, categoricalCols=None,
                 backgroundData: DataFrame = None, targetCol: str = "probability",
                 targetClass: int = 1, outputCol: str = "explanation",
                 metricsCol: str = "r2", numSamples: int = 200,
                 kernelWidth: float = 0.75, regularization: float = 0.0,
                 seed: int = 42):
        super().__init__(model=model, inputCols=list(inputCols or []),
                         categoricalCols=list(categoricalCols or []),
                         backgroundData=backgroundData, targetCol=targetCol,
                         targetClass=targetClass, outputCol=outputCol,
                         metricsCol=metricsCol, numSamples=numSamples,
                         kernelWidth=kernelWidth, regularization=regularization,
                         seed=seed)

    def _transform(self, df: DataFrame) -> DataFrame:
        input_cols = self.inputCols
        cat_cols = set(self.categoricalCols)
        background = self.backgroundData if self.backgroundData is not None else df
        stats = _background_stats(background, input_cols, cat_cols)
        num_samples, seed = self.numSamples, self.seed
        state_cols = [f"__state_{c}__" for c in input_cols]

        def gen(src: DataFrame) -> DataFrame:
            # continuous sample columns are DECLARED double regardless
            # of the source type: the perturbations are Gaussian draws,
            # and Arrow refuses to truncate float 3.7 into an int32
            # field — an integer-typed age/count feature would crash
            # the whole transform. Categorical columns keep the source
            # type (samples draw from observed values). Non-input
            # passthrough columns are not needed on samples.
            fields = ([T.StructField(_ID, T.LongType())]
                      + [src.schema[c] if c in cat_cols
                         else T.StructField(c, T.DoubleType())
                         for c in input_cols]
                      + [T.StructField(s, T.DoubleType()) for s in state_cols]
                      + [T.StructField("__distance__", T.DoubleType())])
            sample_schema = T.StructType(fields)

            def run(it):
                for pdf in it:
                    out_rows = []
                    for _, row in pdf.iterrows():
                        rng = np.random.default_rng((seed, int(row[_ID])))
                        for _ in range(num_samples):
                            rec = {_ID: int(row[_ID])}
                            dist2 = 0.0
                            for c in input_cols:
                                kind, a, b = stats[c]
                                orig = row[c]
                                if kind == "cont":
                                    drawn = float(rng.normal(float(orig), b))
                                    rec[c] = drawn
                                    rec[f"__state_{c}__"] = drawn
                                    dist2 += ((float(orig) - drawn) / b) ** 2
                                else:
                                    drawn = a[rng.integers(0, len(a))] if a else orig
                                    rec[c] = drawn
                                    same = 1.0 if drawn == orig else 0.0
                                    rec[f"__state_{c}__"] = same
                                    dist2 += (1.0 - same)
                            rec["__distance__"] = float(
                                np.sqrt(dist2) / np.sqrt(len(input_cols)))
                            out_rows.append(rec)
                    yield pd.DataFrame(out_rows, columns=[f.name for f in fields])

            return src.select(_ID, *input_cols).mapInPandas(run, sample_schema)

        return self._explain(df, gen, state_cols)


class VectorLIME(_LIMEBase):
    """Explain a model that consumes a single array<double> column."""

    def __init__(self, model=None, inputCol: str = "features",
                 backgroundData: DataFrame = None, targetCol: str = "prediction",
                 targetClass: int = 0, outputCol: str = "explanation",
                 metricsCol: str = "r2", numSamples: int = 200,
                 kernelWidth: float = 0.75, regularization: float = 0.0,
                 seed: int = 42):
        super().__init__(model=model, inputCol=inputCol,
                         backgroundData=backgroundData, targetCol=targetCol,
                         targetClass=targetClass, outputCol=outputCol,
                         metricsCol=metricsCol, numSamples=numSamples,
                         kernelWidth=kernelWidth, regularization=regularization,
                         seed=seed)

    def _transform(self, df: DataFrame) -> DataFrame:
        input_col = self.inputCol
        background = self.backgroundData if self.backgroundData is not None else df
        dim = len(background.select(input_col).first()[0])
        agg = background.select(
            *[F.avg(F.col(input_col)[i]).alias(f"m{i}") for i in range(dim)],
            *[F.stddev_pop(F.col(input_col)[i]).alias(f"s{i}") for i in range(dim)],
        ).collect()[0]
        means = np.array([agg[f"m{i}"] or 0.0 for i in range(dim)])
        stds = np.maximum(np.array([agg[f"s{i}"] or 0.0 for i in range(dim)]), 1e-9)
        num_samples, seed = self.numSamples, self.seed
        state_cols = [f"__state_{i}__" for i in range(dim)]

        def gen(src: DataFrame) -> DataFrame:
            fields = ([T.StructField(_ID, T.LongType()),
                       src.schema[input_col]]
                      + [T.StructField(s, T.DoubleType()) for s in state_cols]
                      + [T.StructField("__distance__", T.DoubleType())])
            sample_schema = T.StructType(fields)

            def run(it):
                for pdf in it:
                    rows = []
                    for _, row in pdf.iterrows():
                        x = np.asarray(row[input_col], dtype=np.float64)
                        rng = np.random.default_rng((seed, int(row[_ID])))
                        draws = rng.normal(x, stds, size=(num_samples, dim))
                        dists = (np.linalg.norm((draws - x) / stds, axis=1)
                                 / np.sqrt(dim))
                        for s in range(num_samples):
                            rec = {_ID: int(row[_ID]),
                                   input_col: [float(v) for v in draws[s]],
                                   "__distance__": float(dists[s])}
                            for i in range(dim):
                                rec[f"__state_{i}__"] = float(draws[s, i])
                            rows.append(rec)
                    yield pd.DataFrame(rows, columns=[f.name for f in fields])

            return src.select(_ID, input_col).mapInPandas(run, sample_schema)

        return self._explain(df, gen, state_cols)
