"""Structural tests for the gmm large-K probe (experiments/gmm_probe).

Fast layer: the diagnostics (mode occupancy over the 6 symmetrized modes,
pooled weight stats) are exact on constructed inputs, and every variant's
overrides apply onto the grid config. The sweep itself is a hardware job
(`python -m experiments.gmm_probe`), artifact at
experiments/data/gmm_probe.json.
"""

import numpy as onp
import pytest

from experiments.gmm_probe import (VARIANTS, _MODES, mode_occupancy,
                                   weight_stats)


def test_modes_are_the_symmetrized_component_means():
    # 3 component means (targets/gmm.py _MEANS) + their coordinate flips.
    from cmcd_tpu.targets.gmm import _MEANS

    expect = onp.concatenate([_MEANS, _MEANS[:, ::-1]])
    assert onp.array_equal(_MODES, expect)


def test_mode_occupancy_exact_at_the_modes():
    # One sample at each mode -> uniform 1/6 occupancy.
    occ = mode_occupancy(_MODES.copy())
    assert occ == pytest.approx([1 / 6] * 6)
    # All mass at one mode.
    occ = mode_occupancy(onp.tile(_MODES[1], (10, 1)))
    assert occ[1] == 1.0 and sum(occ) == pytest.approx(1.0)


def test_weight_stats_uniform_weights_full_ess():
    s = weight_stats(onp.zeros((3, 50)))
    assert s["logw_var"] == 0.0
    assert s["ess_frac"] == pytest.approx(1.0)
    assert s["n"] == 150


def test_weight_stats_one_dominant_weight():
    logw = onp.full(100, -1e3)
    logw[0] = 0.0
    s = weight_stats((-logw).reshape(1, -1))  # arg is neg_elbos = -logw
    assert s["ess_frac"] == pytest.approx(1 / 100, rel=1e-3)


def test_weight_stats_drops_nonfinite():
    neg = onp.array([[0.0, onp.inf, onp.nan, 0.0]])
    assert weight_stats(neg)["n"] == 2


def test_variant_overrides_apply():
    from experiments.baseline_grid import grid_config

    for name, over in VARIANTS.items():
        config = grid_config("gmm", 128)
        for k, v in over.items():
            assert hasattr(config, k), (name, k)
            setattr(config, k, v)
