"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

from cmcd_tpu import bounds
from cmcd_tpu import parallel
from cmcd_tpu.targets.base import Target


def std_normal_target(dim=2):
    def log_prob(z):
        return -0.5 * jnp.sum(z * z + jnp.log(2 * jnp.pi), axis=-1)

    return Target(name="stdnorm", dim=dim, log_prob=log_prob)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    return parallel.make_chain_mesh(8)


def test_sharded_elbos_shapes_and_finite(mesh):
    target = std_normal_target(2)
    setup = bounds.CMCDSetup(mode="MCD_CAIS_sn", dim=2, nbridges=4, emb_dim=8)
    params, ctx = bounds.initialize(setup, target.log_prob, eps=0.01)

    neg_elbos, z = jax.jit(
        lambda p, k: parallel.sharded_compute_elbos(p, k, 256, ctx, setup, mesh)
    )(params, jax.random.PRNGKey(0))
    assert neg_elbos.shape == (256,)
    assert z.shape == (256, 2)
    assert bool(jnp.all(jnp.isfinite(neg_elbos)))
    # Output really is sharded over the chain axis.
    assert len(neg_elbos.sharding.device_set) == 8


def test_sharded_lnz_matches_tolerance(mesh):
    target = std_normal_target(2)
    setup = bounds.CMCDSetup(mode="MCD_ULA", dim=2, nbridges=4)
    params, ctx = bounds.initialize(setup, target.log_prob, eps=0.01)
    neg_elbos, _ = parallel.sharded_compute_elbos(
        params, jax.random.PRNGKey(1), 4096, ctx, setup, mesh
    )
    ln_z = float(jax.jit(parallel.sharded_ln_z)(neg_elbos))
    assert abs(ln_z) < 0.05


def test_sharded_loss_gradients_match_single_device_statistics(mesh):
    """The sharded KL loss and its gradient agree with the unsharded path in
    expectation; with identical per-device streams they can't be bitwise
    equal, so compare optimizer-relevant statistics over several keys."""
    target = std_normal_target(2)
    setup = bounds.CMCDSetup(mode="MCD_ULA", dim=2, nbridges=4)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.05, trainable=("eps", "vd")
    )
    sharded_loss = parallel.sharded_loss_for_mode(setup.mode, mesh)

    def stats(loss_fn):
        vals = []
        for s in range(8):
            v, _ = loss_fn(params, jax.random.PRNGKey(s), 1024, ctx, setup)
            vals.append(float(v))
        return onp.mean(vals)

    a = stats(lambda *args: sharded_loss(*args))
    b = stats(bounds.kl_bound)
    assert abs(a - b) < 0.02


def test_sharded_training_step_runs(mesh):
    """One jitted grad+update step over the mesh (the real training path)."""
    import optax

    target = std_normal_target(2)
    setup = bounds.CMCDSetup(mode="MCD_CAIS_var_sn", dim=2, nbridges=8, emb_dim=8)
    trainable = bounds.default_trainable(setup.mode)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.05, trainable=trainable
    )
    loss_fn = parallel.sharded_loss_for_mode(setup.mode, mesh)
    opt = optax.chain(optax.clip(5.0), optax.adam(1e-3))
    opt_state = opt.init(params["train"])

    @jax.jit
    def step(train_p, opt_state, key):
        def loss(tr):
            return loss_fn(
                {"train": tr, "notrain": params["notrain"]}, key, 512, ctx, setup
            )

        (l, _), grads = jax.value_and_grad(loss, has_aux=True)(train_p)
        updates, opt_state = opt.update(grads, opt_state, train_p)
        return optax.apply_updates(train_p, updates), opt_state, l

    train_p, opt_state, l = step(params["train"], opt_state, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(l))
    flat, _ = jax.flatten_util.ravel_pytree(train_p)
    assert bool(jnp.all(jnp.isfinite(flat)))
