"""Fully-fused VarGrad training path (ops/fused_train.var_bound_pallas):
loss AND gradient must match jax.grad of the scan-based var_bound exactly
under injected noise (interpret mode on CPU; the stop-gradient structure
makes the point-centric backward kernel mathematically exact)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as onp
import pytest

import cmcd_tpu
from cmcd_tpu import bounds
from cmcd_tpu.distributions import diag_gaussian_log_prob, diag_gaussian_sample
from cmcd_tpu.integrators import overdamped as od
from cmcd_tpu.ops.fused_train import var_bound_pallas
from cmcd_tpu.schedules import betas_from_grid


def make_case(target_name, nb, n, eps_schedule="", eps=0.2, init_sigma=15.0,
              emb_dim=16, train_vi=True):
    target = cmcd_tpu.load_target(target_name)
    setup = bounds.CMCDSetup(
        mode="MCD_CAIS_var_sn", dim=target.dim, nbridges=nb, emb_dim=emb_dim,
        grad_clipping=True, eps_schedule=eps_schedule,
    )
    trainable = bounds.default_trainable(setup.mode, train_vi=train_vi)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=eps, init_sigma=init_sigma,
        trainable=trainable,
    )
    params["train"]["sn"]["factor_sn"] = jnp.asarray(0.3)
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb, n, target.dim))
    return target, setup, params, ctx, key, noise


def scan_loss_fn(params, ctx, key, n, noise):
    def scan_loss(train):
        p = bounds.merged_params({"train": train, "notrain": params["notrain"]})
        z_key, evolve_key = jax.random.split(key)
        z = diag_gaussian_sample(z_key, p["vd"], n)
        w = -diag_gaussian_log_prob(p["vd"], z)
        betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
        z, wd, _ = od.evolve_overdamped(
            evolve_key, z, betas, p, ctx, od.CAIS_VAR, noise=noise
        )
        w = w + wd + ctx.target_log_prob(z)
        return jnp.clip(jnp.var(-w, ddof=0), -1e7, 1e7)

    return scan_loss


@pytest.mark.parametrize(
    "target_name,eps_schedule", [("many_gmm", ""), ("funnel", "cos_sq")]
)
def test_pallas_train_grad_matches_scan(target_name, eps_schedule):
    n, nb = 128, 6
    target, setup, params, ctx, key, noise = make_case(
        target_name, nb, n, eps_schedule=eps_schedule
    )

    def pallas_loss(train):
        return var_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx, setup,
            target, block=128, noise=noise, interpret=True,
        )[0]

    l1, g1 = jax.value_and_grad(scan_loss_fn(params, ctx, key, n, noise))(
        params["train"]
    )
    l2, g2 = jax.value_and_grad(pallas_loss)(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f1))
    assert float(jnp.linalg.norm(f1 - f2)) < 1e-4 * scale + 1e-4


def test_pallas_train_neg_elbos_match_scan():
    """The forward values (per-chain neg ELBOs) must also agree."""
    n, nb = 96, 5
    target, setup, params, ctx, key, noise = make_case("many_gmm", nb, n)

    p = bounds.merged_params(params)
    z_key, evolve_key = jax.random.split(key)
    z = diag_gaussian_sample(z_key, p["vd"], n)
    w = -diag_gaussian_log_prob(p["vd"], z)
    betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
    zf, wd, _ = od.evolve_overdamped(
        evolve_key, z, betas, p, ctx, od.CAIS_VAR, noise=noise
    )
    neg_scan = -(w + wd + ctx.target_log_prob(zf))

    _, (neg_pal, _) = var_bound_pallas(
        params, key, n, ctx, setup, target, block=128, noise=noise,
        interpret=True,
    )
    onp.testing.assert_allclose(
        onp.asarray(neg_scan), onp.asarray(neg_pal), atol=5e-4, rtol=1e-4
    )
