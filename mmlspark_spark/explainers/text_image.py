"""Text and Image LIME/KernelSHAP.

Parity: reference ``explainers/TextLIME.scala``/``TextSHAP.scala``
(token-masking samplers — ``Sampler.scala`` LIMETextSampler/
KernelSHAPTextSampler) and ``ImageLIME.scala``/``ImageSHAP.scala``
(superpixel-masking samplers over ``lime/Superpixel.scala`` clusters).

Unlike the tabular/vector variants, the interpretable feature space is
**per-row variable width** (tokens of THIS document, superpixels of
THIS image), so states ride in an ``array<double>`` column and the
per-id solve stacks them into the regression matrix. Masking semantics:

- text: coalition off → token removed from the reconstructed string;
- image: coalition off → superpixel painted with the background color
  (Superpixel.scala's ``censorImage``).

For the SHAP variants the empty coalition (everything masked) IS the
background, so the base value is scored exactly per row — no background
pool. Same distributed shape as the other explainers: per-id seeded
sampling in mapInPandas, inner model's DataFrame plan, applyInPandas
solve, broadcast join back.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer
from mmlspark_spark.explainers.lime import _ID, _LIMEBase
from mmlspark_spark.explainers.regression import (
    weighted_lasso,
    weighted_least_squares,
)
from mmlspark_spark.explainers.superpixel import slic_labels
from mmlspark_spark.sources.image import array_to_image, image_to_array


def _draw_variable_coalitions(rng, m: int, num_samples: int,
                              mode: str):
    """(z, weight) rows for a variable-width row. lime → Bernoulli(0.5)
    masks with kernel weights from distance; shap → delegates to
    shap.py's _draw_coalitions — ONE sampler, so the uniform-weight
    importance correction and the exact-enumeration switch for small m
    (common for short texts / few superpixels) apply here too. The
    local re-implementation had re-introduced the kernel²
    double-weighting bug that sampler's comments warn about."""
    if mode == "lime":
        if m == 1:
            return np.ones((1, 1)), np.ones(1)
        zs = (rng.random((num_samples, m)) < 0.5).astype(np.float64)
        return zs, np.ones(num_samples)
    from mmlspark_spark.explainers.shap import _draw_coalitions

    return _draw_coalitions(rng, m, num_samples)


class _VariableWidthExplainer(_LIMEBase):
    """mode: 'lime' (weighted lasso on masks) or 'shap' (constrained
    kernel regression with per-row base/fx from all-zeros/all-ones)."""

    MODE = "lime"

    def _solve(self, target: DataFrame):
        mode = self.MODE
        out_col, metrics_col = self.outputCol, self.metricsCol
        kernel_width = getattr(self, "kernelWidth", 0.75)
        regularization = getattr(self, "regularization", 0.0)
        solve_schema = T.StructType([
            T.StructField(_ID, T.LongType()),
            T.StructField(out_col, T.ArrayType(T.DoubleType())),
            T.StructField(metrics_col, T.DoubleType()),
        ])

        def solve(key, pdf: pd.DataFrame) -> pd.DataFrame:
            z = np.stack([np.asarray(s, dtype=np.float64)
                          for s in pdf["__states__"]])
            y = pdf["__target__"].to_numpy(np.float64)
            m = z.shape[1]
            if mode == "lime":
                frac_off = 1.0 - z.mean(axis=1)
                w = np.sqrt(np.exp(-((frac_off / kernel_width) ** 2)))
                coefs, _, r2 = weighted_lasso(z, y, w, regularization)
                out = [float(v) for v in coefs]
            else:
                full = z.min(axis=1) == 1.0
                empty = z.max(axis=1) == 0.0
                fx = float(y[full].mean())
                base = float(y[empty].mean())
                rest = ~(full | empty)
                zs, ys = z[rest], y[rest]
                w = pdf["__weight__"].to_numpy(np.float64)[rest]
                total = fx - base
                if m == 1 or rest.sum() == 0:
                    phi = np.full(m, total / m)
                    r2 = 1.0
                else:
                    a = zs[:, :-1] - zs[:, -1:]
                    t = ys - base - zs[:, -1] * total
                    coefs, _, _ = weighted_least_squares(a, t, w,
                                                         fit_intercept=False)
                    phi = np.append(coefs, total - coefs.sum())
                    pred = base + zs @ phi
                    tot = np.sum(w * (ys - np.average(ys, weights=w)) ** 2)
                    res = np.sum(w * (ys - pred) ** 2)
                    r2 = 1.0 - res / tot if tot > 0 else 1.0
                out = [float(base)] + [float(v) for v in phi]
            return pd.DataFrame({_ID: [key[0]], out_col: [out],
                                 metrics_col: [float(r2)]})

        return (target.select(_ID, "__target__", "__weight__", "__states__")
                .groupBy(_ID).applyInPandas(solve, solve_schema))

    def _explain_var(self, df: DataFrame, sample_gen,
                     feature_col_expr) -> DataFrame:
        from mmlspark_spark.core.cache import (
            attach_intermediates,
            persist_intermediate,
        )

        # persisted with a release handle + plain join: the same two
        # fixes the tabular base classes carry — a bare .cache() leaks
        # a pinned input copy per transform, and a broadcast hint on
        # src would collect the whole explain batch (images included)
        # to the driver
        src = persist_intermediate(
            df.withColumn(_ID, F.monotonically_increasing_id()))
        samples = sample_gen(src)
        scored = self.model.transform(samples)
        target = self._extract_target(scored, self.targetCol, self.targetClass)
        fitted = self._solve(target)
        out = src.join(fitted, _ID, "inner")
        if feature_col_expr is not None:
            out = out.withColumn(self.featureNamesCol, feature_col_expr)
        return attach_intermediates(out.drop(_ID), src)


class TextLIME(_VariableWidthExplainer):
    """Per-token attribution for a model consuming ``textCol``."""

    MODE = "lime"

    def __init__(self, model=None, textCol: str = "text",
                 targetCol: str = "prediction", targetClass: int = 0,
                 outputCol: str = "explanation", metricsCol: str = "r2",
                 featureNamesCol: str = "tokens", numSamples: int = 128,
                 kernelWidth: float = 0.75, regularization: float = 0.0,
                 maxTokens: int = 100, seed: int = 42):
        super().__init__(model=model, textCol=textCol, targetCol=targetCol,
                         targetClass=targetClass, outputCol=outputCol,
                         metricsCol=metricsCol, featureNamesCol=featureNamesCol,
                         numSamples=numSamples, kernelWidth=kernelWidth,
                         regularization=regularization, maxTokens=maxTokens,
                         seed=seed)

    def _sample_gen(self, src: DataFrame) -> DataFrame:
        text_col, num_samples = self.textCol, self.numSamples
        max_tokens, seed, mode = self.maxTokens, self.seed, self.MODE
        fields = [T.StructField(_ID, T.LongType()),
                  src.schema[text_col],
                  T.StructField("__states__", T.ArrayType(T.DoubleType())),
                  T.StructField("__weight__", T.DoubleType())]
        schema = T.StructType(fields)

        def run(it):
            for pdf in it:
                rows = []
                for _, row in pdf.iterrows():
                    toks = str(row[text_col]).split()[:max_tokens]
                    m = max(len(toks), 1)
                    rng = np.random.default_rng((seed, int(row[_ID])))
                    zs, ws = _draw_variable_coalitions(rng, m, num_samples, mode)
                    extra = ([np.ones(m)] if mode == "lime"
                             else [np.ones(m), np.zeros(m)])
                    zs = np.vstack([zs] + [e[None] for e in extra])
                    ws = np.concatenate([ws, np.ones(len(extra))])
                    for s in range(len(zs)):
                        kept = [t for t, zi in zip(toks, zs[s]) if zi == 1.0]
                        rows.append({
                            _ID: int(row[_ID]),
                            text_col: " ".join(kept),
                            "__states__": [float(v) for v in zs[s]],
                            "__weight__": float(ws[s]),
                        })
                yield pd.DataFrame(rows, columns=[f.name for f in fields])

        return src.select(_ID, text_col).mapInPandas(run, schema)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        # the inherited schema (outputCol + metricsCol) must also
        # declare the token-name column this explainer appends
        out = super().transform_schema(schema)
        return T.StructType(
            list(out.fields)
            + [T.StructField(self.featureNamesCol,
                             T.ArrayType(T.StringType()))])

    def _transform(self, df: DataFrame) -> DataFrame:
        # same tokenization as the sampler's str.split(): split +
        # drop empties — raw Spark split keeps leading/trailing ""
        # tokens, shifting every attribution off by one
        from mmlspark_spark.functions.text_quality import tokens as _tokens

        toks = F.slice(_tokens(F.col(self.textCol)), 1, self.maxTokens)
        return self._explain_var(df, self._sample_gen, toks)


class TextSHAP(TextLIME):
    """Shapley values per token; output = [base, φ_token...]."""

    MODE = "shap"


class _ImageExplainerBase(_VariableWidthExplainer):
    def __init__(self, model=None, inputCol: str = "image",
                 targetCol: str = "prediction", targetClass: int = 0,
                 outputCol: str = "explanation", metricsCol: str = "r2",
                 featureNamesCol: str = "superpixels",
                 numSamples: int = 64, kernelWidth: float = 0.75,
                 regularization: float = 0.0, cellSize: float = 8.0,
                 modifier: float = 10.0, backgroundValue: int = 0,
                 seed: int = 42):
        super().__init__(model=model, inputCol=inputCol, targetCol=targetCol,
                         targetClass=targetClass, outputCol=outputCol,
                         metricsCol=metricsCol, featureNamesCol=featureNamesCol,
                         numSamples=numSamples, kernelWidth=kernelWidth,
                         regularization=regularization, cellSize=cellSize,
                         modifier=modifier, backgroundValue=backgroundValue,
                         seed=seed)

    def _sample_gen(self, src: DataFrame) -> DataFrame:
        in_col, num_samples = self.inputCol, self.numSamples
        cell, modif = self.cellSize, self.modifier
        bg, seed, mode = self.backgroundValue, self.seed, self.MODE
        fields = [T.StructField(_ID, T.LongType()),
                  src.schema[in_col],
                  T.StructField("__states__", T.ArrayType(T.DoubleType())),
                  T.StructField("__weight__", T.DoubleType())]
        schema = T.StructType(fields)

        def run(it):
            for pdf in it:
                rows = []
                for _, row in pdf.iterrows():
                    if row[in_col] is None:
                        # DecodeImage emits null for undecodable files
                        # by design; a null row must not crash the
                        # batch (it is excluded from the output — the
                        # final inner join never sees its id)
                        continue
                    img = image_to_array(row[in_col])
                    labels = slic_labels(img, cell, modif)
                    uniq = np.unique(labels)
                    m = len(uniq)
                    rng = np.random.default_rng((seed, int(row[_ID])))
                    zs, ws = _draw_variable_coalitions(rng, m, num_samples, mode)
                    extra = ([np.ones(m)] if mode == "lime"
                             else [np.ones(m), np.zeros(m)])
                    zs = np.vstack([zs] + [e[None] for e in extra])
                    ws = np.concatenate([ws, np.ones(len(extra))])
                    for s in range(len(zs)):
                        masked = img.copy()
                        for k, zi in zip(uniq, zs[s]):
                            if zi == 0.0:
                                masked[labels == k] = bg  # censorImage
                        rows.append({
                            _ID: int(row[_ID]),
                            in_col: array_to_image(
                                masked, origin=row[in_col]["origin"]),
                            "__states__": [float(v) for v in zs[s]],
                            "__weight__": float(ws[s]),
                        })
                yield pd.DataFrame(rows, columns=[f.name for f in fields])

        return src.select(_ID, in_col).mapInPandas(run, schema)

    def _transform(self, df: DataFrame) -> DataFrame:
        return self._explain_var(df, self._sample_gen, None)


class ImageLIME(_ImageExplainerBase):
    MODE = "lime"


class ImageSHAP(_ImageExplainerBase):
    MODE = "shap"
