"""PSIS smoothing/diagnostic tests (cmcd_tpu/utils/psis.py).

Oracle cases: (a) a well-behaved proposal (k-hat < 0.5, smoothing ~ no-op,
moments match the closed form), (b) a heavy-tailed mismatch where raw IS
collapses but PSIS recovers a finite-variance estimate and flags k-hat,
(c) GPD shape recovery on synthetic Pareto tails.
"""

import numpy as np
import pytest

from cmcd_tpu.utils.psis import gpd_fit, psis_moments, psis_smooth


def test_gpd_fit_recovers_shape():
    rng = np.random.default_rng(0)
    for k_true in (0.2, 0.5, 0.9):
        # inverse-CDF GPD draws with sigma = 1
        u = rng.uniform(size=4000)
        x = np.expm1(-k_true * np.log1p(-u)) / k_true
        k_hat, sigma = gpd_fit(x)
        assert abs(k_hat - k_true) < 0.12, (k_true, k_hat)
        assert abs(sigma - 1.0) < 0.15


def test_well_behaved_weights_nearly_unchanged():
    rng = np.random.default_rng(1)
    # target N(0.3, 1), proposal N(0, 1.2): finite-variance ratios
    z = rng.normal(0.0, 1.2, size=8000)
    logw = (-0.5 * (z - 0.3) ** 2) - (-0.5 * (z / 1.2) ** 2 - np.log(1.2))
    sm, k_hat = psis_smooth(logw)
    assert k_hat < 0.5
    # only the tail moved, and not by much
    assert np.max(np.abs(sm - logw)) < 1.0
    res = psis_moments(logw, z[:, None])
    assert abs(res["mean"][0] - 0.3) < 0.05
    assert res["ess_psis"] >= res["ess_raw"] * 0.99


def test_heavy_tail_flagged_and_stabilized():
    # Proposal much narrower than the target: infinite-variance ratios.
    # PSIS's guarantee is estimator MSE (Vehtari et al. §3), not a larger
    # Kong ESS — so the oracle here is a Monte Carlo MSE comparison of the
    # smoothed vs raw self-normalized mean (true mean = 0).
    errs_raw, errs_psis, k_hats = [], [], []
    for s in range(40):
        rng = np.random.default_rng(s)
        z = rng.normal(0.0, 0.35, size=2000)
        logw = (-0.5 * z**2) - (-0.5 * (z / 0.35) ** 2 - np.log(0.35))
        p = np.exp(logw - logw.max())
        p /= p.sum()
        errs_raw.append(float(p @ z) ** 2)
        res = psis_moments(logw, z[:, None])
        errs_psis.append(float(res["mean"][0]) ** 2)
        k_hats.append(res["k_hat"])
    assert np.median(k_hats) > 0.7  # diagnostic fires
    assert np.mean(errs_psis) < 0.7 * np.mean(errs_raw)  # MSE reduced
    # truncation: no smoothed weight exceeds the raw max
    rng = np.random.default_rng(2)
    z = rng.normal(0.0, 0.35, size=2000)
    logw = (-0.5 * z**2) - (-0.5 * (z / 0.35) ** 2 - np.log(0.35))
    sm, _ = psis_smooth(logw)
    assert sm.max() <= logw.max() + 1e-9


def test_nonfinite_weights_dropped():
    logw = np.array([0.0, 1.0, np.nan, -np.inf, 2.0, 0.5, 1.5, 0.2,
                     0.9, 1.1, 0.3, 0.8, 1.7, 0.1, 0.6, 2.1])
    z = np.ones((16, 2))
    res = psis_moments(logw, z)
    assert np.isfinite(res["mean"]).all()
    assert res["ess_raw"] <= 14  # the two bad chains carry no mass


def test_tiny_sample_passthrough():
    logw = np.array([0.0, 0.1, 0.2])
    sm, k_hat = psis_smooth(logw)
    assert np.allclose(sm, logw)
    assert k_hat == np.inf
