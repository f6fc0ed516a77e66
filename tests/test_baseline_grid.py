"""Structural tests for the ELBO-vs-K grid runner (experiments/baseline_grid).

Fast layer (always-on): every target x K cell's config applies cleanly and
its target loads; the monotone curve-shape check behaves. The full grid is a
hardware job (`python -m experiments.baseline_grid`), artifact committed at
experiments/data/baseline_grid.json.
"""

import pytest

from experiments.baseline_grid import (KS_DEFAULT, REFERENCE_ELBO,
                                       TARGET_FLAGS, check_monotone,
                                       grid_config)


@pytest.mark.parametrize("target", sorted(TARGET_FLAGS))
def test_grid_config_applies_and_target_loads(target):
    from cmcd_tpu.main import load_target
    from cmcd_tpu.config import apply_lookup_tables

    config = grid_config(target, 8)
    assert config.nbridges == 8
    # The lookup tables must resolve (no KeyError fallback print path) for
    # every boundmode the grid uses.
    overrides = apply_lookup_tables(config)
    if target not in ("gmm", "banana", "funnel"):
        assert "lr" in overrides, (target, overrides)
    t = load_target(target, config)
    assert t.dim > 0


def test_reference_table_covers_grid_ks():
    for target, row in REFERENCE_ELBO.items():
        assert set(row) == set(KS_DEFAULT), target


def test_run_grid_merges_prior_artifact(tmp_path, monkeypatch):
    """Partial re-runs must union with the existing artifact: fresh rows
    replace same-(target, K) cells, other targets survive."""
    import json

    import experiments.baseline_grid as bg

    out = tmp_path / "grid.json"
    out.write_text(json.dumps({"rows": [
        {"target": "funnel", "K": 8, "elbo": -1.0, "ln_Z": 0.0,
         "elbo_ref": -1.013, "wall_s": 1.0, "iters": 3000},
        {"target": "gmm", "K": 8, "elbo": -9.9, "ln_Z": 0.0,
         "elbo_ref": -0.536, "wall_s": 1.0, "iters": 3000},
    ], "monotone": {}, "env": {}}))

    def fake_run_experiment(config):
        return {"final_elbo": -0.4, "final_ln_Z": 0.01}

    monkeypatch.setattr("cmcd_tpu.main.run_experiment", fake_run_experiment)
    rep = bg.run_grid(["gmm"], ks=(8,), out_path=str(out))
    cells = {(r["target"], r["K"]): r["elbo"] for r in rep["rows"]}
    assert cells[("funnel", 8)] == -1.0          # kept
    assert cells[("gmm", 8)] == -0.4             # replaced
    assert set(rep["monotone"]) == {"funnel", "gmm"}
    assert json.load(open(out))["rows"] == rep["rows"]


def test_check_monotone_flags_regression():
    rows = [
        {"target": "funnel", "K": 8, "elbo": -1.0, "elbo_ref": -1.013},
        {"target": "funnel", "K": 16, "elbo": -0.7, "elbo_ref": -0.65},
        {"target": "funnel", "K": 32, "elbo": -0.45, "elbo_ref": -0.408},
    ]
    assert check_monotone(rows) == {"funnel": True}
    rows[2]["elbo"] = -1.4  # worse than K=16 by far more than slack
    assert check_monotone(rows) == {"funnel": False}
