"""Score network tests: shapes, zero-init properties, batched/blocked parity."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

from cmcd_tpu.networks import build_score_network
from cmcd_tpu.networks.geffner import build_geffner_network


def test_geffner_zero_at_init():
    init, apply = build_geffner_network(4, 8, 6)
    params = init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
    out = apply(params, x, 2)
    assert out.shape == (5, 4)
    onp.testing.assert_array_equal(onp.asarray(out), 0.0)  # factor_sn = 0


def test_geffner_bridge_index_clamped():
    init, apply = build_geffner_network(3, 8, 4)
    params = init(jax.random.PRNGKey(0))
    params = {**params, "factor_sn": jnp.asarray(1.0)}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3))
    # i = nbridges (the reference's silent XLA clamp) == last row.
    out_over = apply(params, x, 4)
    out_last = apply(params, x, 3)
    onp.testing.assert_allclose(onp.asarray(out_over), onp.asarray(out_last))


def test_geffner_apply_blocks_matches_apply():
    init, apply = build_geffner_network(3, 8, 5)
    params = {**init(jax.random.PRNGKey(0)), "factor_sn": jnp.asarray(0.7)}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 3))  # (S, N, d)
    steps = jnp.array([0, 2, 4, 5])  # includes one clamped index
    blocked = apply.apply_blocks(params, x, steps)
    want = jnp.stack([apply(params, x[s], steps[s]) for s in range(4)])
    onp.testing.assert_allclose(onp.asarray(blocked), onp.asarray(want), rtol=1e-5, atol=1e-6)


def test_geffner_rho_dim_input():
    init, apply = build_geffner_network(3, 8, 4, rho_dim=3)
    params = init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 6))  # concat[z, rho]
    assert apply(params, x, 0).shape == (5, 3)  # output is x_dim


def test_pis_net_zero_at_init_and_clip():
    init, apply = build_score_network(4, 0, 8, arch="dds", fully_connected_units=[32, 32])
    params = init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 4))
    out = apply(params, x, 3)
    assert out.shape == (6, 4)
    onp.testing.assert_array_equal(onp.asarray(out), 0.0)  # LinearZero head


def test_pis_net_time_dependence():
    init, apply = build_score_network(2, 0, 8, arch="dds", fully_connected_units=[16, 16])
    params = init(jax.random.PRNGKey(0))
    # Make the head nonzero so time matters.
    params["state_net"][-1]["w"] = jnp.ones_like(params["state_net"][-1]["w"]) * 0.1
    x = jnp.ones((3, 2))
    a = apply(params, x, 0)
    b = apply(params, x, 5)
    assert not onp.allclose(onp.asarray(a), onp.asarray(b))


def test_pis_grad_net_works():
    def target_lp(z):
        return -0.5 * jnp.sum(z * z, axis=-1)

    init, apply = build_score_network(
        3, 0, 8, arch="dds_grad", fully_connected_units=[16, 16],
        target_log_prob=target_lp,
    )
    params = init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    out = apply(params, x, 1)
    assert out.shape == (4, 3)
    # Grad gate zero-init -> output zero at init despite the score feature.
    onp.testing.assert_allclose(onp.asarray(out), 0.0, atol=1e-6)
    # And gradients flow through the net params.
    g = jax.grad(lambda p: jnp.sum(apply(p, x, 1) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_dds_grad_requires_target():
    with pytest.raises(ValueError):
        build_score_network(3, 0, 8, arch="dds_grad")
