"""Fused KL (BPTT) training path: kl_bound_pallas's loss AND gradient must
match jax.grad of the scan-based kl_bound exactly under injected noise —
including the state cotangent chained through every step (target HVPs, net
Jacobians) and the reparameterized initial draw."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as onp
import pytest

import cmcd_tpu
from cmcd_tpu import bounds
from cmcd_tpu.distributions import diag_gaussian_log_prob, diag_gaussian_sample
from cmcd_tpu.integrators import overdamped as od
from cmcd_tpu.ops.fused_train import kl_bound_pallas
from cmcd_tpu.schedules import betas_from_grid

_SPECS = {
    "MCD_ULA": od.ULA,
    "MCD_ULA_sn": od.ULA_SN,
    "MCD_CAIS_sn": od.CAIS,
    "MCD_DNF": od.DNF,
}


def make_case(target_name, mode, nb, n, eps_schedule="", eps=0.1,
              init_sigma=8.0, emb_dim=16):
    target = cmcd_tpu.load_target(target_name)
    setup = bounds.CMCDSetup(
        mode=mode, dim=target.dim, nbridges=nb, emb_dim=emb_dim,
        grad_clipping=True, eps_schedule=eps_schedule,
    )
    trainable = bounds.default_trainable(setup.mode, train_vi=True,
                                         train_eps=True)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=eps, init_sigma=init_sigma,
        trainable=trainable,
    )
    if "sn" in params["train"]:
        sn = params["train"]["sn"]
        sn["factor_sn"] = jnp.asarray(0.3)
        # The head is zero-initialized, which would make every INNER-layer
        # gradient trivially zero on both sides — randomize it so the test
        # exercises the full net VJP.
        sn["head"]["w"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(9), sn["head"]["w"].shape
        )
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb, n, target.dim))
    return target, setup, params, ctx, key, noise


def scan_kl_loss_fn(params, ctx, key, n, noise, spec):
    def scan_loss(train):
        p = bounds.merged_params({"train": train, "notrain": params["notrain"]})
        z_key, evolve_key = jax.random.split(key)
        z = diag_gaussian_sample(z_key, p["vd"], n)
        w = -diag_gaussian_log_prob(p["vd"], z)
        betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
        z, wd, _ = od.evolve_overdamped(
            evolve_key, z, betas, p, ctx, spec, noise=noise
        )
        w = w + wd + ctx.target_log_prob(z)
        return jnp.mean(-w)

    return scan_loss


@pytest.mark.parametrize(
    "target_name,mode,eps_schedule",
    [
        ("many_gmm", "MCD_CAIS_sn", ""),
        ("funnel", "MCD_CAIS_sn", "cos_sq"),
        ("many_gmm", "MCD_ULA_sn", ""),
        ("gmm", "MCD_ULA", ""),
        ("gmm", "MCD_DNF", ""),
        # 196-D NICE flow (round-3 transposed score): exercises the target
        # HVP through the piecewise-affine coupling stack.
        ("nice", "MCD_CAIS_sn", ""),
    ],
)
def test_pallas_kl_grad_matches_scan(target_name, mode, eps_schedule):
    n, nb = 96, 5
    # The trained 196-D flow needs realistic scales (|log p| ~ 5e6 at
    # init_sigma 8 makes f32 layout-order rounding dominate).
    kw = {"eps": 1e-3, "init_sigma": 1.0} if target_name == "nice" else {}
    target, setup, params, ctx, key, noise = make_case(
        target_name, mode, nb, n, eps_schedule=eps_schedule, **kw
    )
    spec = _SPECS[mode]

    def pallas_loss(train):
        return kl_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx,
            setup, target, block=128, noise=noise, interpret=True,
        )[0]

    l1, g1 = jax.value_and_grad(
        scan_kl_loss_fn(params, ctx, key, n, noise, spec)
    )(params["train"])
    l2, g2 = jax.value_and_grad(pallas_loss)(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f1))
    assert float(jnp.linalg.norm(f1 - f2)) < 2e-4 * scale + 1e-4, (
        float(jnp.linalg.norm(f1 - f2)),
        scale,
    )


def test_pallas_kl_split_weight_grads_match_scan(monkeypatch):
    """net_grads_outside (the LGCP-size path: z-sweep in-kernel, weight
    grads from the batched XLA vjp over the stored trajectory) must stay
    gradient-exact vs the scan loss. Forced on via the size threshold."""
    from cmcd_tpu.ops import fused_train

    monkeypatch.setattr(fused_train, "_NET_GRADS_OUTSIDE_BYTES", 0)
    n, nb = 96, 5
    target, setup, params, ctx, key, noise = make_case(
        "many_gmm", "MCD_CAIS_sn", nb, n
    )

    def pallas_loss(train):
        return kl_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx,
            setup, target, block=128, noise=noise, interpret=True,
        )[0]

    l1, g1 = jax.value_and_grad(
        scan_kl_loss_fn(params, ctx, key, n, noise, od.CAIS)
    )(params["train"])
    l2, g2 = jax.value_and_grad(pallas_loss)(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f1))
    assert float(jnp.linalg.norm(f1 - f2)) < 2e-4 * scale + 1e-4, (
        float(jnp.linalg.norm(f1 - f2)),
        scale,
    )


def test_pallas_kl_split_bf16_within_tolerance(monkeypatch):
    """The reduced-precision split sweep (bf16 weight storage + layer
    compute — what the 1600-D LGCP needs to fit VMEM) must stay within an
    explicit tolerance of the f32 gradient."""
    from cmcd_tpu.ops import fused_train

    monkeypatch.setattr(fused_train, "_NET_GRADS_OUTSIDE_BYTES", 0)
    n, nb = 96, 5
    # Wide enough that the layer matrices pass the bf16-storage size gate
    # (entries > 4096 elements; see pallas_kl net_compute_dtype).
    target, setup, params, ctx, key, noise = make_case(
        "many_gmm", "MCD_CAIS_sn", nb, n, emb_dim=80
    )

    def loss(train, bf16):
        return kl_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx,
            setup, target, block=128, noise=noise, interpret=True,
            bf16_net=bf16,
        )[0]

    l32, g32 = jax.value_and_grad(lambda t: loss(t, False))(params["train"])
    l16, g16 = jax.value_and_grad(lambda t: loss(t, True))(params["train"])
    onp.testing.assert_allclose(float(l32), float(l16), rtol=1e-6)
    f32v, _ = jax.flatten_util.ravel_pytree(g32)
    f16v, _ = jax.flatten_util.ravel_pytree(g16)
    scale = float(jnp.linalg.norm(f32v))
    rel = float(jnp.linalg.norm(f32v - f16v)) / (scale + 1e-12)
    assert 0.0 < rel < 3e-2, rel


def test_pallas_kl_split_bf16_residuals_within_tolerance(monkeypatch):
    """bf16 residual stacks (trajectory/noise/gsn stored bfloat16 on the
    split path — the LGCP K=256 streaming lever): the LOSS must be
    bit-identical to f32 residuals (the forward kernel computes and reduces
    in f32; storage dtype only affects what the backward reads) and the
    gradient within the same explicit tolerance as the bf16-weights path."""
    from cmcd_tpu.ops import fused_train

    monkeypatch.setattr(fused_train, "_NET_GRADS_OUTSIDE_BYTES", 0)
    n, nb = 96, 5
    # funnel: dim 10 -> dim_pad 16 satisfies the bf16 sublane-tiling gate
    # (the 2-D targets pad to 8 and stay f32-residual only).
    target, setup, params, ctx, key, noise = make_case(
        "funnel", "MCD_CAIS_sn", nb, n
    )

    def loss(train, bf16_res):
        return kl_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx,
            setup, target, block=128, noise=noise, interpret=True,
            bf16_residuals=bf16_res,
        )[0]

    l32, g32 = jax.value_and_grad(lambda t: loss(t, False))(params["train"])
    l16, g16 = jax.value_and_grad(lambda t: loss(t, True))(params["train"])
    onp.testing.assert_allclose(float(l32), float(l16), rtol=1e-6)
    f32v, _ = jax.flatten_util.ravel_pytree(g32)
    f16v, _ = jax.flatten_util.ravel_pytree(g16)
    scale = float(jnp.linalg.norm(f32v))
    rel = float(jnp.linalg.norm(f32v - f16v)) / (scale + 1e-12)
    assert 0.0 < rel < 3e-2, rel


def test_pallas_kl_neg_elbos_match_scan():
    n, nb = 64, 4
    target, setup, params, ctx, key, noise = make_case(
        "many_gmm", "MCD_CAIS_sn", nb, n
    )
    p = bounds.merged_params(params)
    z_key, evolve_key = jax.random.split(key)
    z = diag_gaussian_sample(z_key, p["vd"], n)
    w = -diag_gaussian_log_prob(p["vd"], z)
    betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
    zf, wd, _ = od.evolve_overdamped(
        evolve_key, z, betas, p, ctx, od.CAIS, noise=noise
    )
    neg_scan = -(w + wd + ctx.target_log_prob(zf))

    _, (neg_pal, _) = kl_bound_pallas(
        params, key, n, ctx, setup, target, block=128, noise=noise,
        interpret=True,
    )
    onp.testing.assert_allclose(
        onp.asarray(neg_scan), onp.asarray(neg_pal), atol=5e-4, rtol=1e-4
    )


def scan_kl_loss_fn_ud(params, ctx, key, n, noise, spec):
    from cmcd_tpu.integrators import underdamped as ud

    def scan_loss(train):
        p = bounds.merged_params({"train": train, "notrain": params["notrain"]})
        z_key, evolve_key = jax.random.split(key)
        z = diag_gaussian_sample(z_key, p["vd"], n)
        w = -diag_gaussian_log_prob(p["vd"], z)
        betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
        z, wd, _ = ud.evolve_underdamped(
            evolve_key, z, betas, p, ctx, spec, noise=noise
        )
        w = w + wd + ctx.target_log_prob(z)
        return jnp.mean(-w)

    return scan_loss


@pytest.mark.parametrize(
    "mode,time_block",
    [
        ("MCD_U_a-lp", None),
        ("MCD_U_a-lp-sn", None),
        ("MCD_U_e-lp-sna", None),
        ("MCD_U_ea-lp-sn", None),
        ("MCD_CAIS_UHA_sn", None),
        # Time-chunked forward windows + reverse sweep (2-D grid,
        # scratch-carried (g_z, g_rho) cotangents, K-row layouts, the
        # boundary momentum rhoK seeding the endpoint correction).
        ("MCD_U_a-lp", 2),
        ("MCD_U_a-lp-sn", 2),
        ("MCD_U_e-lp-sna", 1),
        ("MCD_CAIS_UHA_sn", 2),
        ("MCD_U_ea-lp-sn", 3),  # 4 % 3 != 0 -> normalizes to 2
    ],
)
def test_pallas_kl_underdamped_grad_matches_scan(mode, time_block):
    from cmcd_tpu.ops.fused import _PALLAS_UD_SPECS

    # n > block for the chunked cases: two chain blocks exercise the
    # chunked sweep's cross-block theta-grad accumulation.
    n = 96 if time_block is None else 256
    nb = 4
    target = cmcd_tpu.load_target("many_gmm")
    setup = bounds.CMCDSetup(
        mode=mode, dim=target.dim, nbridges=nb, emb_dim=16,
    )
    trainable = bounds.default_trainable(setup.mode, train_vi=True,
                                         train_eps=True)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.05, init_sigma=8.0, gamma=5.0,
        eta=0.5, trainable=trainable,
    )
    if "sn" in params["train"]:
        sn = params["train"]["sn"]
        sn["factor_sn"] = jnp.asarray(0.3)
        sn["head"]["w"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(9), sn["head"]["w"].shape
        )
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb + 1, n, target.dim))
    spec, _ = _PALLAS_UD_SPECS[mode]

    def pallas_loss(train):
        return kl_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx,
            setup, target, block=128, noise=noise, interpret=True,
            time_block=time_block,
        )[0]

    l1, g1 = jax.value_and_grad(
        scan_kl_loss_fn_ud(params, ctx, key, n, noise, spec)
    )(params["train"])
    l2, g2 = jax.value_and_grad(pallas_loss)(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f1))
    assert float(jnp.linalg.norm(f1 - f2)) < 2e-4 * scale + 1e-4, (
        float(jnp.linalg.norm(f1 - f2)),
        scale,
    )


@pytest.mark.parametrize(
    "lfsteps,time_block",
    [
        (1, None),
        (2, None),
        # Time-chunked sweep: zero-seeded momentum cotangent carried in
        # scratch; the trainable-md initial draw's correction applied at
        # the earliest-time chunk from rtraj row 0.
        (1, 2),
        (2, 2),
        (1, 3),  # 4 % 3 != 0 -> normalizes to 2
    ],
)
def test_pallas_kl_uha_grad_matches_scan(lfsteps, time_block):
    from cmcd_tpu.integrators import uha

    # n > block for the chunked cases: two chain blocks exercise the
    # chunked sweep's cross-block theta-grad accumulation (zero only at
    # the FIRST program; per-block carry re-init at pid_t == 0).
    n = 96 if time_block is None else 256
    nb = 4
    target = cmcd_tpu.load_target("gmm")
    setup = bounds.CMCDSetup(
        mode="UHA", dim=target.dim, nbridges=nb, lfsteps=lfsteps,
    )
    trainable = bounds.default_trainable(setup.mode, train_vi=True,
                                         train_eps=True)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.05, init_sigma=5.0, eta=0.5,
        trainable=trainable,
    )
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb + 1, n, target.dim))

    def scan_loss(train):
        p = bounds.merged_params({"train": train, "notrain": params["notrain"]})
        z_key, evolve_key = jax.random.split(key)
        z = diag_gaussian_sample(z_key, p["vd"], n)
        w = -diag_gaussian_log_prob(p["vd"], z)
        betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
        z, wd, _ = uha.evolve_uha(evolve_key, z, betas, p, ctx, noise=noise)
        w = w + wd + ctx.target_log_prob(z)
        return jnp.mean(-w)

    def pallas_loss(train):
        return kl_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx,
            setup, target, block=128, noise=noise, interpret=True,
            time_block=time_block,
        )[0]

    l1, g1 = jax.value_and_grad(scan_loss)(params["train"])
    l2, g2 = jax.value_and_grad(pallas_loss)(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f1))
    assert float(jnp.linalg.norm(f1 - f2)) < 2e-4 * scale + 1e-4, (
        float(jnp.linalg.norm(f1 - f2)),
        scale,
    )


@pytest.mark.parametrize("nn_arch", ["dds", "dds_grad"])
def test_pallas_kl_dds_net_grad_matches_scan(nn_arch):
    """The PIS ("dds") net — the architecture the reference README's 40-GMM
    KL recipe uses — and the working "dds_grad" variant (broken in the
    reference) on the fused KL path. gelu runs on an in-kernel erf
    approximation (|err| <= 1.5e-7), so tolerances are the usual f32 ones."""
    n, nb = 96, 5
    target = cmcd_tpu.load_target("many_gmm")
    setup = bounds.CMCDSetup(
        mode="MCD_CAIS_sn", dim=target.dim, nbridges=nb, nn_arch=nn_arch,
        fully_connected_units=(64, 64), grad_clipping=True,
    )
    trainable = bounds.default_trainable(setup.mode, train_vi=True,
                                         train_eps=True)
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

    def pallas_loss(train):
        return kl_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx,
            setup, target, block=128, noise=noise, interpret=True,
        )[0]

    l1, g1 = jax.value_and_grad(
        scan_kl_loss_fn(params, ctx, key, n, noise, od.CAIS)
    )(params["train"])
    l2, g2 = jax.value_and_grad(pallas_loss)(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f1))
    assert float(jnp.linalg.norm(f1 - f2)) < 5e-4 * scale + 1e-4, (
        float(jnp.linalg.norm(f1 - f2)),
        scale,
    )


def test_fused_train_gate_batch_size():
    """The large-net split sweep is gated on the actual batch size: its
    inter-kernel trajectory stacks scale with N (measured on v5e, 1600-D
    LGCP K=8: N=128 runs, N=256 trips the scoped-VMEM ceiling), and below
    the measured N~100 crossover the recommendation is the faster XLA
    scan. Small-dim in-kernel-weight-grad configs win at every measured
    batch and stay recommended."""
    from cmcd_tpu.ops.fused import (
        fused_train_recommended,
        supports_fused_train,
    )

    target = cmcd_tpu.load_target("lgcp")
    setup = bounds.CMCDSetup(
        mode="MCD_CAIS_sn", dim=target.dim, nbridges=8, emb_dim=20,
        grad_clipping=True,
    )
    assert supports_fused_train(setup, target, bf16_net=True)
    assert supports_fused_train(setup, target, bf16_net=True, n_chains=128)
    assert not supports_fused_train(
        setup, target, bf16_net=True, n_chains=256
    )
    assert fused_train_recommended(setup, target, 128, bf16_net=True)
    assert not fused_train_recommended(setup, target, 20, bf16_net=True)

    small = cmcd_tpu.load_target("funnel")
    s2 = bounds.CMCDSetup(
        mode="MCD_CAIS_sn", dim=small.dim, nbridges=8, emb_dim=16,
        grad_clipping=True,
    )
    assert fused_train_recommended(s2, small, 20)
    assert fused_train_recommended(s2, small, 2000)


def test_fused_train_gate_trajectory_windows():
    """The OVERDAMPED KL backward time-chunks its trajectory windows
    (choose_time_block), so large (K+1) x dim_pad stacks no longer reject
    to scan — nice K=256 (the config that OOM'd the un-chunked sweep by
    1.75 MiB on v5e) is admitted. The underdamped-family and UHA sweeps
    time-chunk too (3 stored stacks), so every KL mode passes the window
    gate at any nbridges."""
    from cmcd_tpu.ops.fused import choose_time_block, supports_fused_train

    nice = cmcd_tpu.load_target("nice")
    mk = lambda nb, dim, mode="MCD_CAIS_sn": bounds.CMCDSetup(
        mode=mode, dim=dim, nbridges=nb, emb_dim=20,
        grad_clipping=True,
    )
    assert supports_fused_train(mk(256, nice.dim), nice, n_chains=300)
    assert supports_fused_train(mk(128, nice.dim), nice, n_chains=300)
    # The auto chunk for that config bounds the windows: divisor of K,
    # fits the 40 MB share at the chosen block.
    tb = choose_time_block(256, nice.dim, 128, 2)
    assert tb is not None and 256 % tb == 0
    assert 2 * 2 * 200 * 128 * 4 * tb <= 40 * 1024 * 1024

    sonar = cmcd_tpu.load_target("log_sonar")
    assert supports_fused_train(mk(256, sonar.dim), sonar, n_chains=2000)
    # Small configs stay on the single-window sweep (measured fastest).
    assert choose_time_block(8, sonar.dim, 1024, 2) is None

    # Underdamped family and UHA: the time-chunked sweeps bound the
    # 3-stack windows, so the 196-D K=256 configs (rejected when
    # single-window) are now admitted.
    assert supports_fused_train(
        mk(256, nice.dim, mode="MCD_U_a-lp-sn"), nice, n_chains=300
    )
    assert supports_fused_train(
        mk(256, nice.dim, mode="UHA"), nice, n_chains=300
    )


@pytest.mark.parametrize(
    "target_name,mode,time_block",
    [
        ("many_gmm", "MCD_CAIS_sn", 2),  # carry sweep, nt=3
        ("many_gmm", "MCD_ULA_sn", 2),  # point sweep (bwd net at i)
        ("gmm", "MCD_DNF", 3),  # two-net point sweep, nt=2
        ("many_gmm", "MCD_CAIS_sn", 4),  # 6 % 4 != 0 -> normalizes to 3
    ],
)
def test_pallas_kl_time_chunked_grad_matches_scan(target_name, mode,
                                                  time_block):
    """The time-chunked reverse sweep (2-D grid, scratch-carried
    cotangents) must stay loss- AND gradient-exact vs jax.grad of the scan
    — including across chunk boundaries (the carried g_gt/g_sn application
    cotangents and the split boundary state)."""
    n, nb = 96, 6
    target, setup, params, ctx, key, noise = make_case(
        target_name, mode, nb, n
    )
    spec = _SPECS[mode]

    def pallas_loss(train):
        return kl_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx,
            setup, target, block=128, noise=noise, interpret=True,
            time_block=time_block,
        )[0]

    l1, g1 = jax.value_and_grad(
        scan_kl_loss_fn(params, ctx, key, n, noise, spec)
    )(params["train"])
    l2, g2 = jax.value_and_grad(pallas_loss)(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f1))
    assert float(jnp.linalg.norm(f1 - f2)) < 2e-4 * scale + 1e-4, (
        float(jnp.linalg.norm(f1 - f2)),
        scale,
    )


def test_pallas_kl_time_chunked_split_matches_scan(monkeypatch):
    """Chunked SPLIT sweep: the boundary state z_hi carried in scratch
    seeds the noise reconstruction at each chunk's topmost step, and the
    shifted gsn stack reassembles to the exact per-point cotangents."""
    from cmcd_tpu.ops import fused_train

    monkeypatch.setattr(fused_train, "_NET_GRADS_OUTSIDE_BYTES", 0)
    n, nb = 96, 6
    target, setup, params, ctx, key, noise = make_case(
        "many_gmm", "MCD_CAIS_sn", nb, n
    )

    def pallas_loss(train):
        return kl_bound_pallas(
            {"train": train, "notrain": params["notrain"]}, key, n, ctx,
            setup, target, block=128, noise=noise, interpret=True,
            time_block=2,
        )[0]

    l1, g1 = jax.value_and_grad(
        scan_kl_loss_fn(params, ctx, key, n, noise, od.CAIS)
    )(params["train"])
    l2, g2 = jax.value_and_grad(pallas_loss)(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f1))
    assert float(jnp.linalg.norm(f1 - f2)) < 2e-4 * scale + 1e-4, (
        float(jnp.linalg.norm(f1 - f2)),
        scale,
    )


def test_choose_time_block_hardware_ladder():
    """choose_time_block encodes the v5e VMEM ladder measured on the
    1600-D LGCP split sweep (round 3, RESULTS.md): single-window at K=8
    (fits, fastest), t_block=4 at K=64 (t_block=8 hit 132 MB of the
    128 MB physical), t_block=2 at K=256 (t_block=4 was 2.2 MB over the
    120 MB scoped cap). The est-aware chunked share must not disturb the
    validated nice K=256 in-kernel choice (t_block=64)."""
    from cmcd_tpu.ops.fused import (
        _packed_sn_bytes,
        _vmem_estimate,
        choose_time_block,
        fused_train_recommended,
        supports_fused_train,
    )

    lgcp = cmcd_tpu.load_target("lgcp")
    mk = lambda nb: bounds.CMCDSetup(
        mode="MCD_CAIS_sn", dim=lgcp.dim, nbridges=nb, emb_dim=20,
        grad_clipping=True,
    )
    est_bf16 = lambda s: (
        _vmem_estimate(s, lgcp, 128) - _packed_sn_bytes(s) // 2
    )
    assert choose_time_block(8, lgcp.dim, 128, 2, est_bf16(mk(8))) is None
    assert choose_time_block(64, lgcp.dim, 128, 2, est_bf16(mk(64))) == 4
    assert choose_time_block(256, lgcp.dim, 128, 2, est_bf16(mk(256))) == 2

    # Both big-K configs are admitted (they compile and run on hardware)
    # and routed by the measured K~128 fused/scan crossover.
    for nb, rec in ((64, False), (256, True)):
        assert supports_fused_train(mk(nb), lgcp, bf16_net=True, n_chains=128)
        assert fused_train_recommended(
            mk(nb), lgcp, 128, bf16_net=True
        ) is rec

    nice = cmcd_tpu.load_target("nice")
    s = bounds.CMCDSetup(
        mode="MCD_CAIS_sn", dim=nice.dim, nbridges=256, emb_dim=48,
        grad_clipping=True,
    )
    assert choose_time_block(
        256, nice.dim, 128, 2, _vmem_estimate(s, nice, 128)
    ) == 64
