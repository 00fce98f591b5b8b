"""KernelSHAP (tabular + vector).

Parity: reference ``explainers/KernelSHAPBase.scala:36-133`` +
``KernelSHAPSampler.scala:31-110``: per row, sample feature coalitions
z ∈ {0,1}^m weighted by the Shapley kernel (m-1)/(C(m,|z|)·|z|·(m-|z|));
build perturbed inputs by keeping coalition features and drawing the
rest from the background data; score with the inner model; solve the
kernel regression per id with the efficiency constraint
Σφ = f(x) − E_bg[f] eliminated analytically (the same constrained
weighted-least-squares the reference solves via its
``LeastSquaresRegression`` after augmenting with the all/none
coalitions).

The base value E_bg[f] is computed **exactly once per transform** by
scoring the background pool through the model — not estimated from
noisy empty-coalition draws. Each sampled coalition is evaluated
against ``numBackgroundDraws`` independent background rows to cut the
Monte-Carlo variance.

Same distributed shape as LIME: mapInPandas sample generation with a
per-id seeded rng (partitioning-independent determinism), the inner
model's own DataFrame plan for scoring, applyInPandas per-id solve,
broadcast join back.
"""

from __future__ import annotations

from math import comb

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.explainers.lime import _ID, _LIMEBase
from mmlspark_spark.explainers.regression import weighted_least_squares


def _coalition_weights(m: int):
    """Shapley kernel weight per coalition size k=1..m-1."""
    return {k: (m - 1) / (comb(m, k) * k * (m - k)) for k in range(1, m)}


def _draw_coalitions(rng, m: int, num_samples: int):
    """Sampled (z, weight) pairs over sizes 1..m-1 (never empty/full).

    When the budget covers the whole coalition space
    (``2^m - 2 <= num_samples``) the sampler switches to COMPLETE
    enumeration — every intermediate coalition exactly once with its
    Shapley kernel weight — which makes the constrained weighted
    regression recover the exact Shapley values (the same exact-mode
    switch the reference's KernelSHAPSampler has,
    explainers/KernelSHAPSampler.scala:31-110)."""
    if m == 1:
        # No intermediate coalition exists: only the all-ones f(x) row is
        # emitted and phi_1 = f(x) - base comes straight from the
        # efficiency constraint (_solve_shap's m==1 branch).
        return np.zeros((0, 1)), np.zeros(0)
    weights = _coalition_weights(m)
    if 2 ** m - 2 <= num_samples:
        zs = np.array([[float((i >> j) & 1) for j in range(m)]
                       for i in range(1, 2 ** m - 1)])
        ws = np.array([weights[int(z.sum())] for z in zs])
        # replicate the enumeration to spend the full budget: each
        # replica gets fresh background draws downstream, so background
        # integration keeps the same averaging as the sampled path
        # (replication leaves the weighted-regression solution for a
        # fixed background unchanged)
        reps = max(1, num_samples // len(zs))
        return np.tile(zs, (reps, 1)), np.tile(ws, reps)
    sizes = np.array(list(weights))
    p = np.array([weights[k] * comb(m, k) for k in sizes], dtype=np.float64)
    p /= p.sum()
    zs, ws = [], []
    for _ in range(num_samples):
        k = int(rng.choice(sizes, p=p))
        z = np.zeros(m)
        z[rng.choice(m, size=k, replace=False)] = 1.0
        zs.append(z)
        # UNIFORM regression weight: coalitions are already drawn with
        # q(z) ∝ kernel(z) (k ∝ weights[k]·C(m,k), subset uniform given
        # k), so the importance weight kernel/q is constant — weighting
        # by weights[k] again would solve a kernel²-weighted regression
        # and converge to non-Shapley values
        ws.append(1.0)
    return np.array(zs), np.array(ws)


def _solve_shap(z: np.ndarray, y: np.ndarray, w: np.ndarray,
                base: float, fx: float):
    """Constrained Shapley regression: eliminate φ_m via
    Σφ = fx - base, weighted lstsq on the rest; returns (φ, r²)."""
    m = z.shape[1]
    total = fx - base
    if m == 1:
        return np.array([total]), 1.0
    a = z[:, :-1] - z[:, -1:]
    target = y - base - z[:, -1] * total
    coefs, _, _ = weighted_least_squares(a, target, w, fit_intercept=False)
    phi = np.append(coefs, total - coefs.sum())
    pred = base + z @ phi
    tot = np.sum(w * (y - np.average(y, weights=w)) ** 2)
    res = np.sum(w * (y - pred) ** 2)
    r2 = 1.0 - res / tot if tot > 0 else 1.0
    return phi, r2


class _SHAPBase(_LIMEBase):
    def _base_value(self, bg_df: DataFrame) -> float:
        """E[f(background)] — shared by the tabular and vector
        explainers (was duplicated byte-for-byte in both)."""
        scored = self.model.transform(bg_df)
        t = self._extract_target(scored, self.targetCol, self.targetClass)
        return float(t.agg(F.avg("__target__")).collect()[0][0])

    def _explain_shap(self, df: DataFrame, sample_gen, state_cols,
                      base: float) -> DataFrame:
        from mmlspark_spark.core.cache import (
            attach_intermediates,
            persist_intermediate,
        )

        out_col, metrics_col = self.outputCol, self.metricsCol
        src = persist_intermediate(
            df.withColumn(_ID, F.monotonically_increasing_id()))
        samples = sample_gen(src)
        scored = self.model.transform(samples)
        target = self._extract_target(scored, self.targetCol, self.targetClass)

        solve_schema = T.StructType([
            T.StructField(_ID, T.LongType()),
            T.StructField(out_col, T.ArrayType(T.DoubleType())),
            T.StructField(metrics_col, T.DoubleType()),
        ])

        def solve(key, pdf: pd.DataFrame) -> pd.DataFrame:
            z = np.column_stack([pdf[c].to_numpy(np.float64) for c in state_cols])
            y = pdf["__target__"].to_numpy(np.float64)
            w = pdf["__weight__"].to_numpy(np.float64)
            full = z.min(axis=1) == 1.0
            fx = float(y[full].mean())  # the all-ones rows score f(x) exactly
            zs, ys, ws = z[~full], y[~full], w[~full]
            phi, r2 = _solve_shap(zs, ys, ws, base, fx)
            return pd.DataFrame({
                _ID: [key[0]],
                out_col: [[float(base)] + [float(v) for v in phi]],
                metrics_col: [float(r2)],
            })

        fitted = (target.select(_ID, "__target__", "__weight__", *state_cols)
                  .groupBy(_ID).applyInPandas(solve, solve_schema))
        # plain join: both sides are one row per explained id — a
        # broadcast hint on src would ship the whole explain batch to
        # the driver
        out = src.join(fitted, _ID, "inner").drop(_ID)
        return attach_intermediates(out, src)


class TabularSHAP(_SHAPBase):
    def __init__(self, model=None, inputCols=None,
                 backgroundData: DataFrame = None, targetCol: str = "probability",
                 targetClass: int = 1, outputCol: str = "shapValues",
                 metricsCol: str = "r2", numSamples: int = 256,
                 numBackgroundDraws: int = 4, seed: int = 42):
        super().__init__(model=model, inputCols=list(inputCols or []),
                         backgroundData=backgroundData, targetCol=targetCol,
                         targetClass=targetClass, outputCol=outputCol,
                         metricsCol=metricsCol, numSamples=numSamples,
                         numBackgroundDraws=numBackgroundDraws, seed=seed)

    def _transform(self, df: DataFrame) -> DataFrame:
        input_cols = self.inputCols
        m = len(input_cols)
        background = self.backgroundData if self.backgroundData is not None else df
        bg_df = background.select(*input_cols).limit(1000).persist()
        pool = [tuple(r) for r in bg_df.collect()]
        base = self._base_value(bg_df)
        bg_df.unpersist()  # both consumers have materialized
        num_samples, seed = self.numSamples, self.seed
        n_draws = self.numBackgroundDraws
        state_cols = [f"__state_{c}__" for c in input_cols]

        def gen(src: DataFrame) -> DataFrame:
            fields = ([T.StructField(_ID, T.LongType())]
                      + [src.schema[c] for c in input_cols]
                      + [T.StructField(s, T.DoubleType()) for s in state_cols]
                      + [T.StructField("__weight__", T.DoubleType())])
            sample_schema = T.StructType(fields)

            def run(it):
                for pdf in it:
                    rows = []
                    for _, row in pdf.iterrows():
                        rng = np.random.default_rng((seed, int(row[_ID])))
                        zs, ws = _draw_coalitions(rng, m, num_samples)

                        def emit(z, weight, bg):
                            rec = {_ID: int(row[_ID]), "__weight__": weight}
                            for j, c in enumerate(input_cols):
                                rec[c] = row[c] if z[j] == 1.0 else bg[j]
                                rec[f"__state_{c}__"] = float(z[j])
                            rows.append(rec)

                        emit(np.ones(m), 1.0, None)  # f(x) row
                        for s in range(len(zs)):
                            for _d in range(n_draws):
                                bg = pool[rng.integers(0, len(pool))]
                                emit(zs[s], float(ws[s]) / n_draws, bg)
                    yield pd.DataFrame(rows, columns=[f.name for f in fields])

            return src.select(_ID, *input_cols).mapInPandas(run, sample_schema)

        return self._explain_shap(df, gen, state_cols, base)


class VectorSHAP(_SHAPBase):
    def __init__(self, model=None, inputCol: str = "features",
                 backgroundData: DataFrame = None, targetCol: str = "prediction",
                 targetClass: int = 0, outputCol: str = "shapValues",
                 metricsCol: str = "r2", numSamples: int = 256,
                 numBackgroundDraws: int = 4, seed: int = 42):
        super().__init__(model=model, inputCol=inputCol,
                         backgroundData=backgroundData, targetCol=targetCol,
                         targetClass=targetClass, outputCol=outputCol,
                         metricsCol=metricsCol, numSamples=numSamples,
                         numBackgroundDraws=numBackgroundDraws, seed=seed)

    def _transform(self, df: DataFrame) -> DataFrame:
        input_col = self.inputCol
        background = self.backgroundData if self.backgroundData is not None else df
        bg_df = background.select(input_col).limit(1000).persist()
        pool = np.array([list(r[0]) for r in bg_df.collect()], dtype=np.float64)
        base = self._base_value(bg_df)
        bg_df.unpersist()  # both consumers have materialized
        m = pool.shape[1]
        num_samples, seed = self.numSamples, self.seed
        n_draws = self.numBackgroundDraws
        state_cols = [f"__state_{i}__" for i in range(m)]

        def gen(src: DataFrame) -> DataFrame:
            fields = ([T.StructField(_ID, T.LongType()), src.schema[input_col]]
                      + [T.StructField(s, T.DoubleType()) for s in state_cols]
                      + [T.StructField("__weight__", T.DoubleType())])
            sample_schema = T.StructType(fields)

            def run(it):
                for pdf in it:
                    rows = []
                    for _, row in pdf.iterrows():
                        x = np.asarray(row[input_col], dtype=np.float64)
                        rng = np.random.default_rng((seed, int(row[_ID])))
                        zs, ws = _draw_coalitions(rng, m, num_samples)

                        def emit(z, weight, bg):
                            vals = np.where(z == 1.0, x, bg)
                            rec = {_ID: int(row[_ID]),
                                   input_col: [float(v) for v in vals],
                                   "__weight__": weight}
                            for i in range(m):
                                rec[f"__state_{i}__"] = float(z[i])
                            rows.append(rec)

                        emit(np.ones(m), 1.0, x)
                        for s in range(len(zs)):
                            for _d in range(n_draws):
                                bg = pool[rng.integers(0, pool.shape[0])]
                                emit(zs[s], float(ws[s]) / n_draws, bg)
                    yield pd.DataFrame(rows, columns=[f.name for f in fields])

            return src.select(_ID, input_col).mapInPandas(run, sample_schema)

        return self._explain_shap(df, gen, state_cols, base)
