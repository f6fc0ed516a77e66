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
        "gmm_cais": (-0.169, None),
    }
    for name, (lnz, elbo) in recorded.items():
        results = {"final_ln_Z": lnz, "final_elbo": elbo}
        rec = check_recipe(name, results)
        assert rec["pass"], (name, rec)


def test_check_recipe_no_oracle_passes():
    assert check_recipe("lgcp_k8", {"final_ln_Z": 500.0,
                                    "final_elbo": 400.0})["pass"]


@pytest.mark.recipes
@pytest.mark.parametrize("name", sorted(RECIPES))
def test_run_recipe_full_scale(name, tmp_path):
    from experiments.recipes import run_recipe

    ok, results = run_recipe(name)
    assert ok, (name, results)
