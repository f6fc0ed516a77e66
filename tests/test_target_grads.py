"""Transposed-layout analytic gradients vs autodiff of the batched targets."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

from cmcd_tpu.ops import target_grads as tg
from cmcd_tpu.targets import load_target


def autodiff_grad(target, z):
    return jax.grad(lambda zz: jnp.sum(target.log_prob(zz)))(z)


def check(target, grad_t, dim_pad, scale=1.0, n=64, atol=1e-4):
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (n, target.dim)) * scale
    want = onp.asarray(autodiff_grad(target, z))
    z_t = jnp.zeros((dim_pad, n)).at[: target.dim, :].set(z.T)
    got = onp.asarray(grad_t(z_t))
    onp.testing.assert_allclose(got[: target.dim].T, want, atol=atol, rtol=1e-3)
    # Padded rows must be exactly zero.
    assert (got[target.dim :] == 0).all()


def test_funnel_grad_t():
    t = load_target("funnel")
    check(t, tg.make_funnel_grad_t(t.dim, 16), 16, scale=1.5)


def test_gmm_grad_t():
    t = load_target("gmm")
    check(t, tg.make_gmm_grad_t(8), 8, scale=3.0)


def test_many_gmm_grad_t():
    t = load_target("many_gmm")
    # Wide draws to hit several modes; the batched log_prob floors at -1e4 ->
    # -inf, whose grad is 0; restrict to points above the floor.
    key = jax.random.PRNGKey(1)
    z = jax.random.normal(key, (128, 2)) * 20.0
    lp = t.log_prob(z)
    z = z[jnp.isfinite(lp)]
    want = onp.asarray(autodiff_grad(t, z))
    grad_t = tg.make_many_gmm_grad_t(8)
    z_t = jnp.zeros((8, z.shape[0])).at[:2, :].set(z.T)
    got = onp.asarray(grad_t(z_t))
    onp.testing.assert_allclose(got[:2].T, want, atol=2e-4, rtol=1e-3)


def test_std_normal_grad_t():
    from cmcd_tpu.targets.base import Target

    t = Target(
        name="stdnorm",
        dim=5,
        log_prob=lambda z: -0.5 * jnp.sum(z * z + jnp.log(2 * jnp.pi), axis=-1),
    )
    check(t, tg.make_std_normal_grad_t(5, 8), 8)


@pytest.mark.parametrize("dset,name", [("sonar", "log_sonar"), ("ionosphere", "log_ionosphere")])
def test_logreg_grad_t(dset, name):
    t = load_target(name)
    dim_pad = ((t.dim + 7) // 8) * 8
    check(t, tg.make_logreg_grad_t(dset, t.dim, dim_pad), dim_pad, scale=0.3, atol=3e-3)


def test_registry():
    t = load_target("many_gmm")
    assert tg.grad_t_for_target(t, 8) is not None
    # seeds gained an analytic transposed score in round 2, lorenz in round 3
    # — every BASELINE target is now covered.
    assert tg.grad_t_for_target(load_target("seeds"), 32) is not None
    assert tg.grad_t_for_target(load_target("lorenz"), 96) is not None


def test_registry_honors_construction_params():
    """Non-default targets must get the matching gradient, not the default's
    (VERDICT round 1: silent-wrongness hazard in the fused path)."""
    from cmcd_tpu.targets.funnel import make_funnel
    from cmcd_tpu.targets.gmm import make_many_gmm

    # funnel with sig != 3 — registry gradient must match autodiff.
    t = make_funnel(d=10, sig=1.5)
    check(t, tg.grad_t_for_target(t, 16), 16, scale=1.0)

    # gmm_easy_mode-style many_gmm (config.py:153-156): n_mixes=4, loc=10.
    t = make_many_gmm(n_mixes=4, loc_scaling=10.0)
    key = jax.random.PRNGKey(3)
    z = jax.random.normal(key, (128, 2)) * 6.0
    z = z[jnp.isfinite(t.log_prob(z))]
    want = onp.asarray(autodiff_grad(t, z))
    grad_t = tg.grad_t_for_target(t, 8)
    z_t = jnp.zeros((8, z.shape[0])).at[:2, :].set(z.T)
    got = onp.asarray(grad_t(z_t))
    onp.testing.assert_allclose(got[:2].T, want, atol=2e-4, rtol=1e-3)


def test_registry_refuses_unknown_combinations():
    from cmcd_tpu.targets.base import Target
    from cmcd_tpu.targets.lgcp import make_lgcp

    # LGCP on a non-default grid: the baked-in pines gradient is wrong -> None.
    t = make_lgcp(num_dim=400)
    assert tg.grad_t_for_target(t, 400) is None

    # A hand-built log_* target with no recorded dataset -> None.
    t2 = Target(name="log_sonar", dim=61, log_prob=lambda z: jnp.zeros(z.shape[0]))
    assert tg.grad_t_for_target(t2, 64) is None


def test_lgcp_grad_t():
    t = load_target("lgcp")
    grad_t = tg.make_lgcp_grad_t(1600)
    z = jax.random.normal(jax.random.PRNGKey(5), (4, 1600)) * 0.5 + 2.0
    want = onp.asarray(autodiff_grad(t, z))
    got = onp.asarray(grad_t(z.T))
    onp.testing.assert_allclose(got.T, want, atol=2e-2, rtol=1e-3)


def test_lgcp_grad_t_whitened():
    from cmcd_tpu.targets.lgcp import make_lgcp

    t = make_lgcp(use_whitened=True)
    grad_t = tg.make_lgcp_grad_t(1600, use_whitened=True)
    w = jax.random.normal(jax.random.PRNGKey(6), (4, 1600)) * 0.3
    want = onp.asarray(autodiff_grad(t, w))
    got = onp.asarray(grad_t(w.T))
    onp.testing.assert_allclose(got.T, want, atol=2e-2, rtol=1e-3)


@pytest.mark.parametrize("whitened", [False, True])
def test_lgcp_grad_t_custom_vjp_matches_autodiff(whitened):
    """The hand-written (symmetric-Jacobian) custom_vjp of the LGCP score —
    what the KL backward's HVP uses — must equal autodiff of the batched
    target score."""
    from cmcd_tpu.targets.lgcp import make_lgcp

    t = make_lgcp(use_whitened=whitened)
    grad_t = tg.make_lgcp_grad_t(1600, use_whitened=whitened)
    z = jax.random.normal(jax.random.PRNGKey(7), (4, 1600)) * 0.3
    ct = jax.random.normal(jax.random.PRNGKey(8), (4, 1600))

    score = jax.grad(lambda q: jnp.sum(t.log_prob(q)))
    _, vjp_ref = jax.vjp(score, z)
    want = onp.asarray(vjp_ref(ct)[0])

    _, vjp_k = jax.vjp(grad_t, z.T)
    got = onp.asarray(vjp_k(ct.T)[0]).T
    onp.testing.assert_allclose(got, want, atol=5e-2, rtol=1e-3)


def test_banana_grad_t():
    t = load_target("banana")
    check(t, tg.make_banana_grad_t(8), 8, scale=5.0)
    # Registry wiring must honor a non-default curvature (the Target records
    # it in params; a mismatch would integrate the wrong density).
    from cmcd_tpu.targets.gym import make_banana

    t2 = make_banana(curvature=0.1)
    check(t2, tg.grad_t_for_target(t2, 8), 8, scale=5.0)


def test_lorenz_grad_t():
    t = load_target("lorenz")
    check(t, tg.make_lorenz_grad_t(96, **t.params), 96, scale=1.0, atol=3e-4)
    assert tg.grad_t_for_target(t, 96) is not None


def test_brownian_grad_t():
    t = load_target("brownian")
    check(t, tg.make_brownian_grad_t(32), 32, scale=0.7, atol=3e-4)
    # Registry wiring.
    assert tg.grad_t_for_target(t, 32) is not None


def test_seeds_grad_t():
    t = load_target("seeds")
    check(t, tg.make_seeds_grad_t(32), 32, scale=0.5, atol=3e-4)
    assert tg.grad_t_for_target(t, 32) is not None


def test_nice_grad_t():
    t = load_target("nice")
    dim_pad = ((t.dim + 7) // 8) * 8
    check(t, tg.make_nice_grad_t(dim_pad, t.params["flow_params"]), dim_pad,
          scale=1.0, atol=3e-4)
    assert tg.grad_t_for_target(t, dim_pad) is not None


def test_nice_grad_t_hvp_matches_autodiff():
    """The KL backward differentiates grad_t at trace time; the flow is
    piecewise affine so the a.e. HVP must equal autodiff of the batched
    log_prob's gradient."""
    t = load_target("nice")
    dim_pad = ((t.dim + 7) // 8) * 8
    grad_t = tg.make_nice_grad_t(dim_pad, t.params["flow_params"])
    key = jax.random.PRNGKey(3)
    z = jax.random.normal(key, (8, t.dim))
    ct = jax.random.normal(jax.random.fold_in(key, 1), (8, t.dim))

    def batched_grad(zz):
        return jax.grad(lambda a: jnp.sum(t.log_prob(a)))(zz)

    _, want_vjp = jax.vjp(batched_grad, z)
    want = onp.asarray(want_vjp(ct)[0])

    z_t = jnp.zeros((dim_pad, 8)).at[: t.dim].set(z.T)
    ct_t = jnp.zeros((dim_pad, 8)).at[: t.dim].set(ct.T)
    _, got_vjp = jax.vjp(grad_t, z_t)
    got = onp.asarray(got_vjp(ct_t)[0])
    onp.testing.assert_allclose(got[: t.dim].T, want, atol=3e-4, rtol=1e-3)
