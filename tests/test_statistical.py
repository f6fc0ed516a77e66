"""End-to-end statistical tests: train a sampler, check ln Z against the
analytic oracle (ln Z = 0 for normalized targets). SURVEY.md §4's
statistical tier. Sized to run on CPU in a couple of minutes."""

import jax
import jax.numpy as jnp
import pytest

import cmcd_tpu
from cmcd_tpu import bounds
from cmcd_tpu.train import evaluate, train


def train_and_eval(target_name, mode, nbridges, iters, lr, eps, n=128,
                   init_sigma=1.0, grad_clipping=False, **kw):
    target = cmcd_tpu.load_target(target_name)
    setup = bounds.CMCDSetup(
        mode=mode, dim=target.dim, nbridges=nbridges, emb_dim=16,
        grad_clipping=grad_clipping, **kw,
    )
    trainable = bounds.default_trainable(mode)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=eps, init_sigma=init_sigma,
        trainable=trainable,
    )
    result = train(
        setup, params, ctx, lr=lr, iters=iters, batch_size=n,
        key=jax.random.PRNGKey(0), trainable=trainable,
    )
    assert not result.diverged
    out = evaluate(
        result.params, ctx, setup, key=jax.random.PRNGKey(1),
        n_samples=500, n_input_dist_seeds=5,
    )
    return out


def test_funnel_cais_lnz_near_zero():
    """Funnel @ K=8: reference table ELBO is -1.013 (BASELINE.md); a short
    training run should reach ELBO > -1.3 and |lnZ| < 0.6."""
    out = train_and_eval("funnel", "MCD_CAIS_sn", 8, iters=800, lr=0.01, eps=0.1)
    assert out["final_elbo"] > -1.4, out
    assert abs(out["final_ln_Z"]) < 0.7, out


def test_gmm_ula_lnz():
    """2-D 3-mode GMM with plain ULA (driver config #1): lnZ within 0.5 after
    a short run with a wide init."""
    out = train_and_eval(
        "gmm", "MCD_ULA", 8, iters=600, lr=0.01, eps=0.05, init_sigma=3.0
    )
    assert abs(out["final_ln_Z"]) < 0.5, out


def test_banana_ldvi():
    """Banana with the underdamped LDVI mode (KL loss). VarGrad on banana
    from a cold isotropic q needs MFVI pretraining (the x1|x0 conditional is
    60x narrower than the x0 marginal), so the VarGrad path is exercised on
    gmm/funnel elsewhere."""
    out = train_and_eval(
        "banana", "MCD_U_a-lp-sn", 8, iters=800, lr=0.005, eps=0.01,
        init_sigma=10.0,
    )
    assert abs(out["final_ln_Z"]) < 1.5, out


def test_elbo_improves_with_more_bridges():
    """ELBO should be monotone-ish in nbridges (reference rebuttal tables)."""
    elbos = {}
    for k in (2, 16):
        out = train_and_eval("funnel", "MCD_ULA", k, iters=300, lr=0.01, eps=0.1)
        elbos[k] = out["final_elbo"]
    assert elbos[16] > elbos[2], elbos
