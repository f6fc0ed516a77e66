"""UHA Pallas kernel vs scan equivalence (interpret mode, shared noise)."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

import cmcd_tpu
from cmcd_tpu.integrators.base import IntegratorContext
from cmcd_tpu.integrators.uha import evolve_uha
from cmcd_tpu.ops import target_grads as tg
from cmcd_tpu.ops.pallas_uha import evolve_uha_pallas
from cmcd_tpu.schedules import betas_from_grid, make_beta_grid_params


@pytest.mark.parametrize("lfsteps", [1, 3])
def test_uha_pallas_matches_scan(lfsteps):
    target = cmcd_tpu.load_target("funnel")
    dim, nb, n = target.dim, 5, 128
    params = {
        "vd": {"mean": jnp.zeros(dim), "logdiag": jnp.zeros(dim)},
        "eps": jnp.asarray(0.05),
        "eta": jnp.asarray(0.4),
        "md": jnp.linspace(-0.2, 0.2, dim),
    }
    mg, gx, tx = make_beta_grid_params(nb)
    betas = betas_from_grid(mg, gx, tx)
    ctx = IntegratorContext(
        target_log_prob=target.log_prob, nbridges=nb, dim=dim, lfsteps=lfsteps
    )
    key = jax.random.PRNGKey(0)
    z0 = jax.random.normal(key, (n, dim))
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb + 1, n, dim))

    z_s, w_s, _ = evolve_uha(key, z0, betas, params, ctx, noise=noise)

    grad_t = tg.grad_t_for_target(target, 16)
    z_p, w_p = evolve_uha_pallas(
        z0, betas, params["eps"], params["eta"], params["md"],
        params["vd"]["mean"], params["vd"]["logdiag"], grad_t,
        dim=dim, nbridges=nb, lfsteps=lfsteps, noise=noise, block=128,
        interpret=True,
    )
    onp.testing.assert_allclose(onp.asarray(z_s), onp.asarray(z_p), atol=2e-4, rtol=1e-4)
    onp.testing.assert_allclose(onp.asarray(w_s), onp.asarray(w_p), atol=1e-3, rtol=1e-4)
