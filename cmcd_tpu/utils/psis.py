"""Pareto-smoothed importance sampling (PSIS) for eval-side IS moments.

The reference evaluates trained samplers with raw self-normalized IS
(src/main.py eval loop); on targets where the sampler mode-locks (lorenz,
RESULTS.md) the raw weights collapse to ESS ~ 1-15 and the moment estimate
is dominated by a handful of chains. PSIS (Vehtari, Simpson, Gelman 2015,
arXiv:1507.02646) fits a generalized Pareto distribution (GPD) to the
upper tail of the importance ratios and replaces the tail weights by the
fitted quantiles — a provably lower-MSE estimator — and its shape estimate
k-hat is a calibrated reliability diagnostic:

  k-hat <= 0.5   : IS is well-behaved (weights have finite variance)
  0.5 < k <= 0.7 : usable but noisy
  k-hat  > 0.7   : estimate unreliable no matter the smoothing (report it!)

Eval-side only (numpy; runs once per evaluation, never in a hot jit).
The GPD fit is the Zhang & Stephens (2009) quasi-Bayesian profile
estimator used by standard PSIS implementations.
"""

from __future__ import annotations

import numpy as np


def gpd_fit(exceedances: np.ndarray) -> tuple[float, float]:
    """Fit GPD(k, sigma) to sorted-ascending positive exceedances.

    Zhang & Stephens (2009): profile the likelihood over a grid of
    b = k/sigma reparameterized points weighted by their profile
    likelihood. Returns (k, sigma); k is regularized toward 0.5 with a
    weak prior (n_prior = 10) as in Vehtari et al. Appendix C.
    """
    x = np.sort(np.asarray(exceedances, dtype=np.float64))
    n = x.size
    if n < 5 or not np.all(np.isfinite(x)) or x[-1] <= 0:
        return np.inf, np.nan
    m_est = 30 + int(np.sqrt(n))
    j = np.arange(1, m_est + 1, dtype=np.float64)
    b = 1.0 - np.sqrt(m_est / (j - 0.5))
    b /= 3.0 * x[max(int(n / 4 + 0.5) - 1, 0)]
    b += 1.0 / x[-1]
    # profile log-likelihood of each b
    k_b = np.mean(np.log1p(-b[:, None] * x), axis=1)  # (m,)
    with np.errstate(divide="ignore", invalid="ignore"):
        ll = n * (np.log(-b / k_b) - k_b - 1.0)
    ll[~np.isfinite(ll)] = -np.inf
    w = 1.0 / np.sum(np.exp(ll - ll[:, None]), axis=1)
    w /= w.sum()
    b_post = float(np.sum(b * w))
    k_post = float(np.mean(np.log1p(-b_post * x)))
    sigma = -k_post / b_post
    # weak prior pulling k toward 0.5 stabilizes small tails
    k_post = (n * k_post + 5.0) / (n + 10.0)
    return k_post, sigma


def _gpd_quantile(p: np.ndarray, k: float, sigma: float) -> np.ndarray:
    if abs(k) < 1e-12:
        return -sigma * np.log1p(-p)
    return sigma * np.expm1(-k * np.log1p(-p)) / k


def psis_smooth(logw: np.ndarray) -> tuple[np.ndarray, float]:
    """Smooth log importance weights; returns (smoothed logw, k-hat).

    Tail size M = min(0.2 n, 3 sqrt(n)) per the PSIS recommendation; the
    top-M log weights are replaced by the fitted GPD's expected order
    statistics (capped at the observed max). Non-finite logw are passed
    through as -inf. If the tail is degenerate (fit impossible) returns
    the input and k-hat = inf — callers should report k-hat alongside any
    moments either way.
    """
    logw = np.asarray(logw, dtype=np.float64)
    out = np.where(np.isfinite(logw), logw, -np.inf)
    finite = np.isfinite(out)
    n = int(finite.sum())
    if n < 5:
        return out, np.inf
    m = int(min(np.ceil(0.2 * n), np.ceil(3.0 * np.sqrt(n))))
    if m < 5:
        return out, np.inf
    # work on shifted weights for numerical stability
    shift = out[finite].max()
    order = np.argsort(out)  # -inf first
    tail_idx = order[-m:]
    cutoff_idx = order[-m - 1] if n > m else order[0]
    cutoff = out[cutoff_idx] - shift
    exceed = np.exp(out[tail_idx] - shift) - np.exp(cutoff)
    k_hat, sigma = gpd_fit(exceed)
    if not np.isfinite(k_hat) or not np.isfinite(sigma) or sigma <= 0:
        return out, float(k_hat) if np.isfinite(k_hat) else np.inf
    p = (np.arange(1, m + 1) - 0.5) / m
    smoothed = np.exp(cutoff) + _gpd_quantile(p, k_hat, sigma)
    # cap at the raw max (PSIS truncation) and write back in sorted order
    smoothed = np.minimum(np.log(smoothed) + shift, out[tail_idx].max())
    res = out.copy()
    res[tail_idx[np.argsort(out[tail_idx], kind="stable")]] = np.sort(
        smoothed
    )
    return res, float(k_hat)


def psis_moments(logw: np.ndarray, z: np.ndarray):
    """Self-normalized PSIS moments.

    Returns dict(mean (d,), std (d,), ess_raw, ess_psis, k_hat). ESS is
    the Kong estimator 1/sum(p^2) of the normalized weights.
    """
    logw = np.asarray(logw, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)

    def _norm(lw):
        lw = np.where(np.isfinite(lw), lw, -np.inf)
        lw = lw - lw.max()
        p = np.exp(lw)
        return p / p.sum()

    p_raw = _norm(logw)
    sm, k_hat = psis_smooth(logw)
    p = _norm(sm)
    mean = p @ z
    var = p @ (z - mean) ** 2
    return {
        "mean": mean,
        "std": np.sqrt(var),
        "ess_raw": float(1.0 / np.sum(p_raw**2)),
        "ess_psis": float(1.0 / np.sum(p**2)),
        "k_hat": k_hat,
    }
