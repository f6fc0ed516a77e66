"""Multi-chip fused VarGrad training (shard_map around the Pallas kernels).

Runs on the 8-device virtual CPU mesh (conftest). The sharded loss must
equal the manual composition of per-device fused losses (same fold_in key
per shard, same injected noise slice), and its gradient must match — i.e.
shard_map's transpose correctly psums the custom_vjp backward-kernel grads.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as onp

import cmcd_tpu
from cmcd_tpu import bounds, parallel
from cmcd_tpu.ops.fused_train import neg_elbos_pallas


def make_case(n, nb):
    target = cmcd_tpu.load_target("many_gmm")
    setup = bounds.CMCDSetup(
        mode="MCD_CAIS_var_sn", dim=2, nbridges=nb, emb_dim=16,
        grad_clipping=True,
    )
    trainable = bounds.default_trainable(setup.mode)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.2, init_sigma=15.0, trainable=trainable
    )
    params["train"]["sn"]["factor_sn"] = jnp.asarray(0.3)
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb, n, 2))
    return target, setup, params, ctx, key, noise


def test_sharded_pallas_vargrad_matches_manual_composition():
    ndev = jax.device_count()
    assert ndev == 8
    n, nb = 128, 5
    local_n = n // ndev
    target, setup, params, ctx, key, noise = make_case(n, nb)
    mesh = parallel.make_chain_mesh()

    def sharded_loss(train):
        full = {"train": train, "notrain": params["notrain"]}
        loss, (neg, z) = parallel.sharded_var_bound_pallas(
            full, key, n, ctx, setup, target, mesh=mesh,
            block=128, noise=noise, interpret=True,
        )
        return loss, neg

    def manual_loss(train):
        full = {"train": train, "notrain": params["notrain"]}
        negs = []
        for d in range(ndev):
            local_key = jax.random.fold_in(key, d)
            local_noise = noise[:, d * local_n : (d + 1) * local_n]
            neg_d, _ = neg_elbos_pallas(
                full, local_key, local_n, ctx, setup, target,
                block=128, noise=local_noise, interpret=True,
            )
            negs.append(neg_d)
        neg = jnp.concatenate(negs)
        return jnp.clip(jnp.var(neg, ddof=0), -1e7, 1e7), neg

    (l1, neg1), g1 = jax.jit(
        jax.value_and_grad(sharded_loss, has_aux=True)
    )(params["train"])
    (l2, neg2), g2 = jax.jit(
        jax.value_and_grad(manual_loss, has_aux=True)
    )(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    onp.testing.assert_allclose(
        onp.asarray(neg1), onp.asarray(neg2), atol=1e-4, rtol=1e-5
    )
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f2)) + 1e-8
    assert float(jnp.linalg.norm(f1 - f2)) < 1e-4 * scale + 1e-5


def test_sharded_pallas_kl_ud_chunked_matches_manual_composition():
    """The TIME-CHUNKED underdamped reverse sweep under shard_map: sharded
    loss and psum'd gradients equal the manual per-device composition with
    the same time_block (the sharding and the 2-D chunk grid compose)."""
    from cmcd_tpu.ops.fused_train import neg_elbos_pallas_kl

    ndev = jax.device_count()
    assert ndev == 8
    n, nb = 128, 4
    local_n = n // ndev
    target = cmcd_tpu.load_target("many_gmm")
    setup = bounds.CMCDSetup(
        mode="MCD_U_a-lp-sn", dim=2, nbridges=nb, emb_dim=16,
        grad_clipping=True,
    )
    trainable = bounds.default_trainable(setup.mode, train_vi=True,
                                         train_eps=True)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.05, init_sigma=8.0, gamma=5.0,
        eta=0.5, trainable=trainable,
    )
    params["train"]["sn"]["factor_sn"] = jnp.asarray(0.3)
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(2), (nb + 1, n, 2))
    mesh = parallel.make_chain_mesh()

    def sharded_loss(train):
        full = {"train": train, "notrain": params["notrain"]}
        loss, (neg, z) = parallel.sharded_kl_bound_pallas(
            full, key, n, ctx, setup, target, mesh=mesh,
            block=128, noise=noise, interpret=True, time_block=2,
        )
        return loss, neg

    def manual_loss(train):
        full = {"train": train, "notrain": params["notrain"]}
        negs = []
        for d in range(ndev):
            local_key = jax.random.fold_in(key, d)
            local_noise = noise[:, d * local_n : (d + 1) * local_n]
            neg_d, _ = neg_elbos_pallas_kl(
                full, local_key, local_n, ctx, setup, target,
                block=128, noise=local_noise, interpret=True, time_block=2,
            )
            negs.append(neg_d)
        neg = jnp.concatenate(negs)
        return jnp.mean(neg), neg

    (l1, neg1), g1 = jax.jit(
        jax.value_and_grad(sharded_loss, has_aux=True)
    )(params["train"])
    (l2, neg2), g2 = jax.jit(
        jax.value_and_grad(manual_loss, has_aux=True)
    )(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    onp.testing.assert_allclose(
        onp.asarray(neg1), onp.asarray(neg2), atol=1e-4, rtol=1e-5
    )
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f2)) + 1e-8
    assert float(jnp.linalg.norm(f1 - f2)) < 1e-4 * scale + 1e-5


def test_sharded_pallas_kl_matches_manual_composition():
    """Same contract for the KL (BPTT) fused loss: the sharded mean and the
    psum'd reverse-sweep gradients must equal the manual per-device
    composition."""
    from cmcd_tpu.ops.fused_train import neg_elbos_pallas_kl

    ndev = jax.device_count()
    assert ndev == 8
    n, nb = 128, 4
    local_n = n // ndev
    target, setup, params, ctx, key, noise = make_case(n, nb)
    setup = bounds.CMCDSetup(
        mode="MCD_CAIS_sn", dim=2, nbridges=nb, emb_dim=16,
        grad_clipping=True,
    )
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.2, init_sigma=15.0,
        trainable=bounds.default_trainable(setup.mode),
    )
    params["train"]["sn"]["factor_sn"] = jnp.asarray(0.3)
    mesh = parallel.make_chain_mesh()

    def sharded_loss(train):
        full = {"train": train, "notrain": params["notrain"]}
        loss, (neg, z) = parallel.sharded_kl_bound_pallas(
            full, key, n, ctx, setup, target, mesh=mesh,
            block=128, noise=noise, interpret=True,
        )
        return loss, neg

    def manual_loss(train):
        full = {"train": train, "notrain": params["notrain"]}
        negs = []
        for d in range(ndev):
            local_key = jax.random.fold_in(key, d)
            local_noise = noise[:, d * local_n : (d + 1) * local_n]
            neg_d, _ = neg_elbos_pallas_kl(
                full, local_key, local_n, ctx, setup, target,
                block=128, noise=local_noise, interpret=True,
            )
            negs.append(neg_d)
        neg = jnp.concatenate(negs)
        return jnp.mean(neg), neg

    (l1, neg1), g1 = jax.jit(
        jax.value_and_grad(sharded_loss, has_aux=True)
    )(params["train"])
    (l2, neg2), g2 = jax.jit(
        jax.value_and_grad(manual_loss, has_aux=True)
    )(params["train"])
    onp.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    onp.testing.assert_allclose(
        onp.asarray(neg1), onp.asarray(neg2), atol=1e-4, rtol=1e-5
    )
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.linalg.norm(f2)) + 1e-8
    assert float(jnp.linalg.norm(f1 - f2)) < 1e-4 * scale + 1e-5
