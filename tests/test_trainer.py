"""Trainer, MFVI, and evaluation tests."""

import jax
import jax.numpy as jnp
import numpy as onp

from cmcd_tpu import bounds
from cmcd_tpu.train import evaluate, mfvi_pretrain, project, train
from cmcd_tpu.targets.base import Target


def shifted_normal_target(dim=3, mean=2.0):
    def log_prob(z):
        return -0.5 * jnp.sum((z - mean) ** 2 + jnp.log(2 * jnp.pi), axis=-1)

    return Target(name="shifted", dim=dim, log_prob=log_prob)


def test_project_constraints():
    p = {
        "eps": jnp.asarray(0.9),
        "eta": jnp.asarray(-0.5),
        "gamma": jnp.asarray(-1.0),
        "mgridref_y": jnp.array([-0.5, 0.2]),
    }
    out = project(p, ("eps", "eta", "gamma", "mgridref_y"))
    assert float(out["eps"]) == 0.5
    assert float(out["eta"]) == 0.0
    onp.testing.assert_allclose(float(out["gamma"]), 0.001, rtol=1e-6)
    assert (onp.asarray(out["mgridref_y"]) >= 0.001).all()


def test_mfvi_pretrain_finds_target_mean():
    target = shifted_normal_target(dim=3, mean=2.0)
    vd, elbo, result = mfvi_pretrain(
        3, target.log_prob, lr=0.05, iters=800, batch_size=32,
        key=jax.random.PRNGKey(0),
    )
    assert not result.diverged
    onp.testing.assert_allclose(onp.asarray(vd["mean"]), 2.0, atol=0.15)
    # MFVI on a Gaussian target is exact: ELBO -> 0.
    assert elbo > -0.1


def test_train_improves_elbo_and_projects():
    target = shifted_normal_target(dim=2, mean=1.0)
    setup = bounds.CMCDSetup(mode="MCD_CAIS_sn", dim=2, nbridges=4, emb_dim=8)
    trainable = bounds.default_trainable(setup.mode)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.05, trainable=trainable
    )
    result = train(
        setup, params, ctx,
        lr=5e-3, iters=400, batch_size=64,
        key=jax.random.PRNGKey(1), trainable=trainable,
    )
    assert not result.diverged
    assert result.steps_done == 400
    losses = onp.asarray(result.losses)
    assert losses[-1] < losses[0]
    eps = float(result.params["train"]["eps"])
    assert 1e-7 <= eps <= 0.5


def test_nan_guard_stops_and_returns_last_finite():
    target = shifted_normal_target(dim=2)

    def exploding_loss(params, key, n, ctx, setup):
        # Diverges immediately via a huge LR on a cubic loss; simpler: NaN.
        return jnp.asarray(jnp.nan), (jnp.full((n,), jnp.nan), jnp.zeros((n, 2)))

    setup = bounds.CMCDSetup(mode="MCD_ULA", dim=2, nbridges=2)
    params, ctx = bounds.initialize(setup, target.log_prob, trainable=("eps",))
    result = train(
        setup, params, ctx,
        lr=1e-2, iters=50, batch_size=8,
        key=jax.random.PRNGKey(0), trainable=("eps",),
        loss_fn=exploding_loss, nan_check_every=1,
    )
    assert result.diverged
    assert result.steps_done < 50
    # Params structure intact.
    assert "eps" in result.params["train"]


def test_ema_tracks_params():
    target = shifted_normal_target(dim=2)
    setup = bounds.CMCDSetup(mode="MCD_ULA", dim=2, nbridges=2)
    params, ctx = bounds.initialize(setup, target.log_prob, eps=0.01, trainable=("eps", "vd"))
    result = train(
        setup, params, ctx,
        lr=1e-2, iters=100, batch_size=16,
        key=jax.random.PRNGKey(2), trainable=("eps", "vd"), use_ema=True,
    )
    assert result.ema_params is not None
    ema_mean = onp.asarray(result.ema_params["train"]["vd"]["mean"])
    cur_mean = onp.asarray(result.params["train"]["vd"]["mean"])
    # EMA moved off init (zeros) but lags the live params.
    assert onp.abs(ema_mean).sum() > 0
    assert onp.abs(ema_mean).sum() < onp.abs(cur_mean).sum()


def test_evaluate_protocol():
    target = shifted_normal_target(dim=2, mean=0.0)
    setup = bounds.CMCDSetup(mode="MCD_ULA", dim=2, nbridges=4)
    params, ctx = bounds.initialize(setup, target.log_prob, eps=0.01, trainable=("eps",))
    out = evaluate(
        params, ctx, setup, key=jax.random.PRNGKey(3),
        n_samples=200, n_input_dist_seeds=5,
    )
    assert out["neg_elbos"].shape == (5, 200)
    assert out["samples"].shape == (1000, 2)
    # Gaussian target with matched q: lnZ ~ 0 tightly.
    assert abs(out["final_ln_Z"]) < 0.05
    assert out["final_elbo"] <= 0.01
