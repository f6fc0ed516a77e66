"""Underdamped Pallas kernel vs scan equivalence (interpret mode, shared noise)."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

import cmcd_tpu
from cmcd_tpu.integrators import underdamped as ud
from cmcd_tpu.integrators.base import IntegratorContext
from cmcd_tpu.networks.geffner import build_geffner_network
from cmcd_tpu.ops import target_grads as tg
from cmcd_tpu.ops.pallas_underdamped import (
    evolve_underdamped_pallas,
    pack_geffner_ud_t,
)
from cmcd_tpu.schedules import betas_from_grid, make_beta_grid_params

SPECS = {
    "MCD_U_a-lp": (ud.U_A_LP, False),
    "MCD_U_a-lp-sna": (ud.U_A_LP_SNA, False),
    "MCD_U_a-lp-sn": (ud.U_A_LP_SN, True),
    "MCD_U_e-lp": (ud.U_E_LP, False),
    "MCD_U_e-lp-sna": (ud.U_E_LP_SNA, False),
    "MCD_U_ea-lp-sn": (ud.U_EA_LP_SN, True),
    "MCD_CAIS_UHA_sn": (ud.CAIS_UHA, True),
}


@pytest.mark.parametrize("mode", list(SPECS))
def test_underdamped_pallas_matches_scan(mode):
    spec, full_sn = SPECS[mode]
    target = cmcd_tpu.load_target("funnel")
    dim, nb, n = target.dim, 5, 128
    dim_pad = 16

    rho_dim = dim if full_sn else 0
    init_sn, apply_sn = build_geffner_network(dim, 12, nb, rho_dim=rho_dim)
    sn = init_sn(jax.random.PRNGKey(1))
    sn = {**sn, "factor_sn": jnp.asarray(0.3)}
    params = {
        "vd": {"mean": jnp.zeros(dim), "logdiag": jnp.zeros(dim)},
        "eps": jnp.asarray(0.05),
        "gamma": jnp.asarray(2.0),
        "eta": jnp.asarray(0.5),
        "sn": sn,
    }
    mg, gx, tx = make_beta_grid_params(nb)
    betas = betas_from_grid(mg, gx, tx)
    ctx = IntegratorContext(
        target_log_prob=target.log_prob, nbridges=nb, dim=dim, apply_sn=apply_sn
    )
    key = jax.random.PRNGKey(0)
    z0 = jax.random.normal(key, (n, dim))
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb + 1, n, dim))

    z_s, w_s, _ = ud.evolve_underdamped(key, z0, betas, params, ctx, spec, noise=noise)

    use_sn = spec.fwd_sn or spec.bwd_sn != "none"
    weights = meta = None
    if use_sn:
        weights, meta = pack_geffner_ud_t(sn, dim, dim_pad, full_sn)
    grad_t = tg.grad_t_for_target(target, dim_pad)
    z_p, w_p = evolve_underdamped_pallas(
        z0, betas, params["eps"], params["gamma"], params["eta"],
        params["vd"]["mean"], params["vd"]["logdiag"], grad_t, spec,
        dim=dim, nbridges=nb, sn_weights=weights, sn_meta=meta,
        noise=noise, block=128, interpret=True,
    )
    onp.testing.assert_allclose(onp.asarray(z_s), onp.asarray(z_p), atol=2e-4, rtol=1e-4)
    onp.testing.assert_allclose(onp.asarray(w_s), onp.asarray(w_p), atol=1e-3, rtol=1e-4)
