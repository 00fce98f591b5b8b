"""Weighted lasso / least squares solvers used by the explainers.

Parity: reference ``explainers/LassoRegression.scala:1-87`` (cyclic
coordinate descent on weighted data with intercept) and
``explainers/LeastSquaresRegression.scala:1-17``. numpy-only — the
container has no sklearn, and the reference likewise hand-rolls these.
"""

from __future__ import annotations

import numpy as np


def weighted_least_squares(x: np.ndarray, y: np.ndarray, w: np.ndarray,
                           fit_intercept: bool = True):
    """Minimize Σ w_i (y_i - x_i·β - b)²; returns (coefs, intercept, r²)."""
    sw = np.sqrt(np.maximum(w, 0.0))
    xw = x * sw[:, None]
    yw = y * sw
    if fit_intercept:
        xw = np.hstack([xw, sw[:, None]])
    beta, *_ = np.linalg.lstsq(xw, yw, rcond=None)
    if fit_intercept:
        coefs, intercept = beta[:-1], float(beta[-1])
    else:
        coefs, intercept = beta, 0.0
    pred = x @ coefs + intercept
    tot = np.sum(w * (y - np.average(y, weights=w)) ** 2)
    res = np.sum(w * (y - pred) ** 2)
    r2 = 1.0 - res / tot if tot > 0 else 1.0
    return coefs, intercept, r2


def weighted_lasso(x: np.ndarray, y: np.ndarray, w: np.ndarray,
                   alpha: float, fit_intercept: bool = True,
                   max_iter: int = 500, tol: float = 1e-7):
    """Cyclic coordinate descent for weighted lasso; returns
    (coefs, intercept, r²). alpha == 0 falls back to least squares."""
    if alpha <= 0:
        return weighted_least_squares(x, y, w, fit_intercept)
    n, p = x.shape
    wsum = w.sum()
    if wsum <= 0:
        return np.zeros(p), 0.0, 1.0
    wn = w / wsum
    beta = np.zeros(p)
    xm = wn @ x if fit_intercept else np.zeros(p)
    ym = float(wn @ y) if fit_intercept else 0.0
    xc = x - xm
    yc = y - ym
    # precompute weighted column norms
    col_norm = np.einsum("i,ij,ij->j", wn, xc, xc)
    resid = yc - xc @ beta
    for _ in range(max_iter):
        max_delta = 0.0
        for j in range(p):
            if col_norm[j] <= 1e-300:
                continue
            rho = np.einsum("i,i,i->", wn, xc[:, j], resid) + col_norm[j] * beta[j]
            new_b = np.sign(rho) * max(abs(rho) - alpha, 0.0) / col_norm[j]
            delta = new_b - beta[j]
            if delta != 0.0:
                resid -= xc[:, j] * delta
                beta[j] = new_b
                max_delta = max(max_delta, abs(delta))
        if max_delta < tol:
            break
    intercept = ym - float(xm @ beta) if fit_intercept else 0.0
    pred = x @ beta + intercept
    tot = np.sum(w * (y - np.average(y, weights=w)) ** 2)
    res = np.sum(w * (y - pred) ** 2)
    r2 = 1.0 - res / tot if tot > 0 else 1.0
    return beta, intercept, r2
