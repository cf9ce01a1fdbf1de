"""Covariance Matrix Adaptation Evolution Strategy (CMA-ES) with box bounds.

Self-contained implementation of the standard (mu/mu_w, lambda) CMA-ES
(Hansen's tutorial parametrization) — the reference delegates to the ``cma``
PyPI package (mqt-yaqs characterization/noise/optimization/cma.py:66-134);
this build carries its own optimizer so the framework has no optional
dependency on it.  Box constraints are handled by projection (evaluating the
clipped candidate).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

__all__ = ["cma_opt", "CMAResult"]


@dataclasses.dataclass
class CMAResult:
    x_best: np.ndarray
    f_best: float
    n_evals: int
    n_iters: int
    history: list[float]
    converged: bool


def cma_opt(
    loss: Callable[[np.ndarray], float],
    x0: np.ndarray,
    sigma0: float,
    *,
    x_low: np.ndarray | None = None,
    x_up: np.ndarray | None = None,
    popsize: int | None = None,
    max_iter: int = 200,
    ftol: float = 1e-10,
    xtol: float = 1e-12,
    seed: int | None = None,
) -> CMAResult:
    """Minimize ``loss`` starting from ``x0`` with step size ``sigma0``."""
    x0 = np.asarray(x0, dtype=float).reshape(-1)
    n = x0.size
    rng = np.random.default_rng(seed)

    lam = popsize or (4 + int(3 * np.log(n)))
    lam = max(lam, 4)
    mu = lam // 2
    raw_w = np.log(mu + 0.5) - np.log(np.arange(1, mu + 1))
    weights = raw_w / raw_w.sum()
    mu_eff = 1.0 / np.sum(weights**2)

    c_sigma = (mu_eff + 2) / (n + mu_eff + 5)
    d_sigma = 1 + 2 * max(0.0, np.sqrt((mu_eff - 1) / (n + 1)) - 1) + c_sigma
    c_c = (4 + mu_eff / n) / (n + 4 + 2 * mu_eff / n)
    c_1 = 2 / ((n + 1.3) ** 2 + mu_eff)
    c_mu = min(1 - c_1, 2 * (mu_eff - 2 + 1 / mu_eff) / ((n + 2) ** 2 + mu_eff))
    chi_n = np.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n**2))

    def project(x):
        if x_low is not None:
            x = np.maximum(x, x_low)
        if x_up is not None:
            x = np.minimum(x, x_up)
        return x

    mean = project(x0.copy())
    sigma = float(sigma0)
    cov = np.eye(n)
    p_sigma = np.zeros(n)
    p_c = np.zeros(n)

    x_best = mean.copy()
    f_best = float(loss(project(mean)))
    n_evals = 1
    history: list[float] = [f_best]
    converged = False

    for it in range(max_iter):
        d_cov, b_cov = np.linalg.eigh(cov)
        d_cov = np.sqrt(np.maximum(d_cov, 1e-20))
        inv_sqrt_c = b_cov @ np.diag(1.0 / d_cov) @ b_cov.T

        zs = rng.standard_normal((lam, n))
        ys = zs @ np.diag(d_cov) @ b_cov.T
        xs = mean + sigma * ys
        fs = np.array([loss(project(x)) for x in xs])
        n_evals += lam

        order = np.argsort(fs)
        if fs[order[0]] < f_best:
            f_best = float(fs[order[0]])
            x_best = project(xs[order[0]].copy())
        history.append(float(fs[order[0]]))

        y_sel = ys[order[:mu]]
        y_w = weights @ y_sel
        mean_new = mean + sigma * y_w

        p_sigma = (1 - c_sigma) * p_sigma + np.sqrt(
            c_sigma * (2 - c_sigma) * mu_eff
        ) * (inv_sqrt_c @ y_w)
        h_sigma = float(
            np.linalg.norm(p_sigma)
            / np.sqrt(1 - (1 - c_sigma) ** (2 * (it + 1)))
            < (1.4 + 2 / (n + 1)) * chi_n
        )
        p_c = (1 - c_c) * p_c + h_sigma * np.sqrt(c_c * (2 - c_c) * mu_eff) * y_w

        rank_mu = sum(w * np.outer(y, y) for w, y in zip(weights, y_sel))
        cov = (
            (1 - c_1 - c_mu) * cov
            + c_1 * (np.outer(p_c, p_c) + (1 - h_sigma) * c_c * (2 - c_c) * cov)
            + c_mu * rank_mu
        )
        sigma *= float(np.exp((c_sigma / d_sigma) * (np.linalg.norm(p_sigma) / chi_n - 1)))
        sigma = min(sigma, 1e6)

        step = np.linalg.norm(mean_new - mean)
        mean = mean_new

        if len(history) > 5 and abs(history[-1] - history[-5]) < ftol * (1 + abs(history[-1])):
            converged = True
            break
        if step < xtol:
            converged = True
            break

    return CMAResult(
        x_best=x_best,
        f_best=f_best,
        n_evals=n_evals,
        n_iters=it + 1,
        history=history,
        converged=converged,
    )
