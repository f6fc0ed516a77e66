"""Fused Pallas kernel tests (interpret mode on CPU).

Real-hardware compilation is exercised separately (bench/driver); these
tests validate kernel *logic* bit-for-tolerance against the XLA scan path by
injecting the same noise into both (SURVEY.md §4: Pallas-vs-lax.scan
equivalence with a shared stream).
"""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

import cmcd_tpu
from cmcd_tpu import bounds
from cmcd_tpu.integrators import overdamped as od
from cmcd_tpu.integrators.base import IntegratorContext
from cmcd_tpu.networks.geffner import build_geffner_network
from cmcd_tpu.ops import target_grads as tg
from cmcd_tpu.ops.fused import compute_elbos_fused, supports_fused
from cmcd_tpu.ops.pallas_overdamped import evolve_overdamped_pallas, pack_geffner_t
from cmcd_tpu.schedules import betas_from_grid, make_beta_grid_params


def setup_case(mode, target_name="many_gmm", nb=6, n=256, factor_sn=0.3,
               eps_schedule="", grad_clipping=False, target=None):
    if target is None:
        target = cmcd_tpu.load_target(target_name)
    dim = target.dim
    init_sn, apply_sn = build_geffner_network(dim, 16, nb)
    sn = init_sn(jax.random.PRNGKey(1))
    sn = {**sn, "factor_sn": jnp.asarray(factor_sn)}
    vd = {"mean": jnp.zeros(dim), "logdiag": jnp.ones(dim) * jnp.log(3.0)}
    params = {"vd": vd, "eps": jnp.asarray(0.1), "sn": sn}
    mg, gx, tx = make_beta_grid_params(nb)
    betas = betas_from_grid(mg, gx, tx)
    ctx = IntegratorContext(
        target_log_prob=target.log_prob, nbridges=nb, dim=dim,
        apply_sn=apply_sn, eps_schedule=eps_schedule, grad_clipping=grad_clipping,
    )
    key = jax.random.PRNGKey(0)
    z0 = vd["mean"] + jnp.exp(vd["logdiag"]) * jax.random.normal(key, (n, dim))
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb, n, dim))
    return target, params, betas, ctx, key, z0, noise


SPECS = {
    "MCD_ULA": od.ULA,
    "MCD_ULA_sn": od.ULA_SN,
    "MCD_CAIS_sn": od.CAIS,
    "MCD_CAIS_var_sn": od.CAIS_VAR,
}


@pytest.mark.parametrize("mode", list(SPECS))
@pytest.mark.parametrize("target_name", ["many_gmm", "funnel"])
def test_pallas_matches_scan_same_noise(mode, target_name):
    spec = SPECS[mode]
    grad_clipping = "CAIS" in mode
    target, params, betas, ctx, key, z0, noise = setup_case(
        mode, target_name, grad_clipping=grad_clipping
    )
    dim = target.dim
    dim_pad = max(8, ((dim + 7) // 8) * 8)

    z_scan, w_scan, _ = od.evolve_overdamped(
        key, z0, betas, params, ctx, spec, noise=noise
    )

    use_sn = spec.fwd_sn or spec.bwd_sn
    weights, meta = (None, None)
    if use_sn:
        weights, meta = pack_geffner_t(params["sn"], dim, dim_pad)
    grad_t = tg.grad_t_for_target(target, dim_pad)
    z_pal, w_pal = evolve_overdamped_pallas(
        z0, jnp.zeros(z0.shape[0]), betas, params["eps"],
        params["vd"]["mean"], params["vd"]["logdiag"], grad_t, spec,
        dim=dim, nbridges=ctx.nbridges, sn_weights=weights, sn_meta=meta,
        grad_clipping=grad_clipping, noise=noise, block=128, interpret=True,
    )
    onp.testing.assert_allclose(
        onp.asarray(z_scan), onp.asarray(z_pal), atol=2e-4, rtol=1e-4
    )
    onp.testing.assert_allclose(
        onp.asarray(w_scan), onp.asarray(w_pal), atol=5e-4, rtol=1e-4
    )


def test_pallas_eps_schedule_matches_scan():
    target, params, betas, ctx, key, z0, noise = setup_case(
        "MCD_CAIS_sn", "funnel", eps_schedule="cos_sq", grad_clipping=True
    )
    dim = target.dim
    dim_pad = 16
    z_scan, w_scan, _ = od.evolve_overdamped(
        key, z0, betas, params, ctx, od.CAIS, noise=noise
    )
    weights, meta = pack_geffner_t(params["sn"], dim, dim_pad)
    grad_t = tg.grad_t_for_target(target, dim_pad)
    z_pal, w_pal = evolve_overdamped_pallas(
        z0, jnp.zeros(z0.shape[0]), betas, params["eps"],
        params["vd"]["mean"], params["vd"]["logdiag"], grad_t, od.CAIS,
        dim=dim, nbridges=ctx.nbridges, sn_weights=weights, sn_meta=meta,
        eps_schedule="cos_sq", grad_clipping=True, noise=noise, block=128,
        interpret=True,
    )
    onp.testing.assert_allclose(onp.asarray(w_scan), onp.asarray(w_pal), atol=5e-4, rtol=1e-4)


def test_pallas_nondefault_target_params_match_scan():
    """A non-default many_gmm (the __graft_entry__ flagship shape) must run
    the fused kernel against ITS OWN density, matching the scan path — the
    registry now threads construction params through (VERDICT round 1 #2)."""
    from cmcd_tpu.targets.gmm import make_many_gmm

    target = make_many_gmm(n_mixes=8, loc_scaling=10.0)
    spec = od.CAIS
    target_, params, betas, ctx, key, z0, noise = setup_case(
        "MCD_CAIS_sn", grad_clipping=True, target=target
    )
    dim = target.dim
    dim_pad = 8
    z_scan, w_scan, _ = od.evolve_overdamped(
        key, z0, betas, params, ctx, spec, noise=noise
    )
    weights, meta = pack_geffner_t(params["sn"], dim, dim_pad)
    grad_t = tg.grad_t_for_target(target, dim_pad)
    assert grad_t is not None
    z_pal, w_pal = evolve_overdamped_pallas(
        z0, jnp.zeros(z0.shape[0]), betas, params["eps"],
        params["vd"]["mean"], params["vd"]["logdiag"], grad_t, spec,
        dim=dim, nbridges=ctx.nbridges, sn_weights=weights, sn_meta=meta,
        grad_clipping=True, noise=noise, block=128, interpret=True,
    )
    onp.testing.assert_allclose(
        onp.asarray(w_scan), onp.asarray(w_pal), atol=5e-4, rtol=1e-4
    )


def test_fused_elbos_statistical_parity():
    """In-kernel PRNG path: neg-ELBO distribution must match the scan path
    (different streams, same law). Compare means within MC error.

    The TPU interpreter stubs prng_random_bits to zeros, so this test only
    runs on real TPU hardware (the driver/bench exercises it there); on CPU
    it is skipped and the injected-noise tests above cover kernel logic.
    """
    if jax.default_backend() == "cpu":
        pytest.skip("in-kernel PRNG requires real TPU (interpreter stubs it)")
    target = cmcd_tpu.load_target("funnel")
    setup = bounds.CMCDSetup(mode="MCD_CAIS_sn", dim=target.dim, nbridges=6, emb_dim=16)
    assert supports_fused(setup, target)
    params, ctx = bounds.initialize(setup, target.log_prob, eps=0.05)
    n = 2048
    ne_scan, _ = bounds.compute_elbos(params, jax.random.PRNGKey(0), n, ctx, setup)
    ne_pal, z = compute_elbos_fused(
        params, jax.random.PRNGKey(0), n, setup, target, block=128
    )
    assert z.shape == (n, target.dim)
    m1, m2 = float(ne_scan.mean()), float(ne_pal.mean())
    s = float(ne_scan.std()) / (n ** 0.5)
    assert abs(m1 - m2) < 6 * s, (m1, m2, s)


def test_supports_fused_gating():
    target = cmcd_tpu.load_target("funnel")
    assert supports_fused(
        bounds.CMCDSetup(mode="MCD_CAIS_sn", dim=10, nbridges=4), target
    )
    assert supports_fused(
        bounds.CMCDSetup(mode="MCD_U_a-lp-sn", dim=10, nbridges=4), target
    )
    assert supports_fused(
        bounds.CMCDSetup(mode="UHA", dim=10, nbridges=4), target
    )
    # PIS ("dds") nets are kernelized for the overdamped single-net modes
    # (the reference's 40-GMM KL recipe uses them); not for underdamped or
    # the two-net DNF. Sn-free modes don't care about the arch.
    assert supports_fused(
        bounds.CMCDSetup(mode="MCD_CAIS_sn", dim=10, nbridges=4, nn_arch="dds"),
        target,
    )
    assert not supports_fused(
        bounds.CMCDSetup(mode="MCD_U_a-lp-sn", dim=10, nbridges=4,
                         nn_arch="dds"),
        target,
    )
    assert not supports_fused(
        bounds.CMCDSetup(mode="MCD_DNF", dim=10, nbridges=4, nn_arch="dds"),
        target,
    )
    assert supports_fused(
        bounds.CMCDSetup(mode="MCD_ULA", dim=10, nbridges=4, nn_arch="dds"),
        target,
    )
    # seeds gained an analytic transposed score in round 2.
    seeds_target = cmcd_tpu.load_target("seeds")
    assert supports_fused(
        bounds.CMCDSetup(mode="MCD_CAIS_sn", dim=26, nbridges=4), seeds_target
    )
    # lorenz gained an analytic transposed score in round 3 — every
    # BASELINE target is now fused-eligible.
    lorenz_target = cmcd_tpu.load_target("lorenz")
    assert supports_fused(
        bounds.CMCDSetup(mode="MCD_CAIS_sn", dim=lorenz_target.dim, nbridges=4),
        lorenz_target,
    )


def test_lorenz_pallas_matches_scan():
    """Fused CAIS rollout on the 90-D lorenz bridge (round-3 transposed
    score) must match the scan integrator under injected noise."""
    target = cmcd_tpu.load_target("lorenz")
    _, params, betas, ctx, key, z0, noise = setup_case(
        "MCD_CAIS_sn", grad_clipping=True, target=target, n=128, nb=4
    )
    dim = target.dim
    dim_pad = 96
    z_scan, w_scan, _ = od.evolve_overdamped(
        key, z0, betas, params, ctx, od.CAIS, noise=noise
    )
    weights, meta = pack_geffner_t(params["sn"], dim, dim_pad)
    grad_t = tg.grad_t_for_target(target, dim_pad)
    z_pal, w_pal = evolve_overdamped_pallas(
        z0, jnp.zeros(z0.shape[0]), betas, params["eps"],
        params["vd"]["mean"], params["vd"]["logdiag"], grad_t, od.CAIS,
        dim=dim, nbridges=ctx.nbridges, sn_weights=weights, sn_meta=meta,
        grad_clipping=True, noise=noise, block=128, interpret=True,
    )
    onp.testing.assert_allclose(
        onp.asarray(w_scan), onp.asarray(w_pal), atol=1e-3, rtol=1e-4
    )


def test_nice_pallas_matches_scan():
    """Fused CAIS rollout on the 196-D NICE flow target (round-3 transposed
    score: couplings as host-constant matmuls) must match the scan
    integrator under injected noise."""
    target = cmcd_tpu.load_target("nice")
    _, params, betas, ctx, key, z0, noise = setup_case(
        "MCD_CAIS_sn", grad_clipping=True, target=target, n=128, nb=4
    )
    # At N(0, 3^2) draws the trained 196-D flow's |log p| is ~5e6 and f32
    # summation-order differences between the layouts amplify through the
    # clipped dynamics; run at the scales the nice recipe actually uses.
    params = {**params, "eps": jnp.asarray(1e-3)}
    params["vd"] = {"mean": jnp.zeros(target.dim),
                    "logdiag": jnp.zeros(target.dim)}
    key = jax.random.PRNGKey(0)
    z0 = params["vd"]["mean"] + jnp.exp(params["vd"]["logdiag"]) * (
        jax.random.normal(key, (128, target.dim))
    )
    dim = target.dim
    dim_pad = 200
    z_scan, w_scan, _ = od.evolve_overdamped(
        key, z0, betas, params, ctx, od.CAIS, noise=noise
    )
    weights, meta = pack_geffner_t(params["sn"], dim, dim_pad)
    grad_t = tg.grad_t_for_target(target, dim_pad)
    z_pal, w_pal = evolve_overdamped_pallas(
        z0, jnp.zeros(z0.shape[0]), betas, params["eps"],
        params["vd"]["mean"], params["vd"]["logdiag"], grad_t, od.CAIS,
        dim=dim, nbridges=ctx.nbridges, sn_weights=weights, sn_meta=meta,
        grad_clipping=True, noise=noise, block=128, interpret=True,
    )
    onp.testing.assert_allclose(
        onp.asarray(w_scan), onp.asarray(w_pal), atol=1e-3, rtol=1e-4
    )


def test_pallas_chain_padding():
    """n not a multiple of block: padded chains must not corrupt results."""
    target, params, betas, ctx, key, z0, noise = setup_case(
        "MCD_ULA", n=100, nb=4
    )
    z_scan, w_scan, _ = od.evolve_overdamped(
        key, z0, betas, params, ctx, od.ULA, noise=noise
    )
    grad_t = tg.grad_t_for_target(target, 8)
    z_pal, w_pal = evolve_overdamped_pallas(
        z0, jnp.zeros(100), betas, params["eps"],
        params["vd"]["mean"], params["vd"]["logdiag"], grad_t, od.ULA,
        dim=2, nbridges=4, noise=noise, block=128, interpret=True,
    )
    assert z_pal.shape == (100, 2)
    onp.testing.assert_allclose(onp.asarray(w_scan), onp.asarray(w_pal), atol=5e-4, rtol=1e-4)


def test_lgcp_fused_eval_matches_scan_interpret():
    """The 1600-D LGCP runs on the fused kernel (weights live in VMEM via
    the raised scoped limit); neg-ELBOs must match the scan path under
    injected noise. Hardware check recorded in RESULTS.md (rel 8e-5, ~10%
    faster than scan at K=8)."""
    import cmcd_tpu
    from cmcd_tpu import bounds
    from cmcd_tpu.distributions import (
        diag_gaussian_log_prob,
        diag_gaussian_sample,
    )
    from cmcd_tpu.integrators import overdamped as od
    from cmcd_tpu.ops import compute_elbos_fused, supports_fused
    from cmcd_tpu.schedules import betas_from_grid

    target = cmcd_tpu.load_target("lgcp")
    setup = bounds.CMCDSetup(
        mode="MCD_CAIS_sn", dim=target.dim, nbridges=3, emb_dim=20
    )
    assert supports_fused(setup, target)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.0001, init_sigma=1.0,
        trainable=bounds.default_trainable(setup.mode),
    )
    n = 64
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(2), (3, n, target.dim))
    ne_f, zf = compute_elbos_fused(
        params, key, n, setup, target, noise=noise, interpret=True
    )
    p = bounds.merged_params(params)
    z_key, evolve_key = jax.random.split(key)
    z0 = diag_gaussian_sample(z_key, p["vd"], n)
    w = -diag_gaussian_log_prob(p["vd"], z0)
    betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
    zs, wd, _ = od.evolve_overdamped(
        evolve_key, z0, betas, p, ctx, od.CAIS, noise=noise
    )
    ne_s = -(w + wd + ctx.target_log_prob(zs))
    onp.testing.assert_allclose(
        onp.asarray(ne_f), onp.asarray(ne_s), rtol=2e-4, atol=0.2
    )


def test_pallas_dnf_forward_matches_scan():
    """MCD_DNF (zero annealed drift, second net in the backward kernel —
    shipped broken in the reference, working here) on the fused kernel must
    match the scan integrator under shared noise."""
    nb, n = 6, 256
    target = cmcd_tpu.load_target("gmm")
    dim = target.dim
    init_sn, apply_sn = build_geffner_network(dim, 16, nb)
    sn = {**init_sn(jax.random.PRNGKey(1)), "factor_sn": jnp.asarray(0.3)}
    sn2 = {**init_sn(jax.random.PRNGKey(5)), "factor_sn": jnp.asarray(0.2)}
    vd = {"mean": jnp.zeros(dim), "logdiag": jnp.ones(dim) * jnp.log(3.0)}
    params = {"vd": vd, "eps": jnp.asarray(0.1), "sn": sn, "sn2": sn2}
    from cmcd_tpu.schedules import betas_from_grid, make_beta_grid_params

    mg, gx, tx = make_beta_grid_params(nb)
    betas = betas_from_grid(mg, gx, tx)
    ctx = IntegratorContext(
        target_log_prob=target.log_prob, nbridges=nb, dim=dim,
        apply_sn=apply_sn, apply_sn2=apply_sn,
    )
    key = jax.random.PRNGKey(0)
    z0 = vd["mean"] + jnp.exp(vd["logdiag"]) * jax.random.normal(key, (n, dim))
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb, n, dim))

    z_scan, w_scan, _ = od.evolve_overdamped(
        key, z0, betas, params, ctx, od.DNF, noise=noise
    )

    dim_pad = max(8, ((dim + 7) // 8) * 8)
    weights, meta = pack_geffner_t(sn, dim, dim_pad)
    weights2, _ = pack_geffner_t(sn2, dim, dim_pad)
    z_pal, w_pal = evolve_overdamped_pallas(
        z0, jnp.zeros(n), betas, params["eps"],
        vd["mean"], vd["logdiag"], None, od.DNF,
        dim=dim, nbridges=nb, sn_weights=weights, sn_meta=meta,
        sn2_weights=weights2, noise=noise, block=128, interpret=True,
    )
    onp.testing.assert_allclose(
        onp.asarray(z_scan), onp.asarray(z_pal), atol=2e-4, rtol=1e-4
    )
    onp.testing.assert_allclose(
        onp.asarray(w_scan), onp.asarray(w_pal), atol=5e-4, rtol=1e-4
    )


def test_choose_block_caps():
    from cmcd_tpu.ops.fused import choose_block

    # Capped by the padded chain count (N=300 -> 384 columns, not 1024).
    assert choose_block(2, 300) == 384
    assert choose_block(2, 2000) == 1024
    # Stored-residual cap: sonar-shaped KL training (dim_pad 64, K=256,
    # traj+noise) must shrink below 1024 or the residuals exceed VMEM.
    assert choose_block(61, 2000, traj_arrays=2, nbridges=256) <= 512
    # Flagship (dim_pad 8) is unaffected.
    assert choose_block(2, 2000, traj_arrays=1, nbridges=256) == 1024
