"""Utility tests: const-hoisted jit, Sinkhorn W2, metric logger."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as onp

from cmcd_tpu.utils import MetricLogger, const_hoisted_jit, sinkhorn_w2


def test_const_hoisted_jit_matches_plain_jit():
    c = jnp.arange(8.0)  # captured constant

    def fn(x, y):
        return {"a": x * c + y["b"], "s": jnp.sum(x)}

    x = jnp.ones(8)
    y = {"b": jnp.full(8, 2.0)}
    hoisted = const_hoisted_jit(fn, x, y)
    got = hoisted(x, y)
    want = jax.jit(fn)(x, y)
    onp.testing.assert_allclose(onp.asarray(got["a"]), onp.asarray(want["a"]))
    onp.testing.assert_allclose(float(got["s"]), float(want["s"]))


def test_const_hoisted_jit_rejects_wrong_structure():
    def fn(x):
        return x + 1

    hoisted = const_hoisted_jit(fn, jnp.ones(4))
    try:
        hoisted({"oops": jnp.ones(4)})
        assert False, "expected TypeError"
    except TypeError:
        pass


def test_sinkhorn_w2_zero_for_identical_clouds():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    d_self = float(sinkhorn_w2(x, x))
    y = x + 5.0
    d_far = float(sinkhorn_w2(x, y))
    assert d_self < d_far
    assert d_far > 0.1


def test_sinkhorn_w2_symmetryish():
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    y = jax.random.normal(jax.random.PRNGKey(2), (64, 2)) + 1.0
    a, b = float(sinkhorn_w2(x, y)), float(sinkhorn_w2(y, x))
    onp.testing.assert_allclose(a, b, rtol=1e-3)


def test_metric_logger_jsonl(tmp_path):
    path = os.path.join(tmp_path, "m.jsonl")
    logger = MetricLogger(path)
    logger.log({"loss": 1.5}, step=3)
    logger.log({"loss": jnp.asarray(0.5)}, step=4)
    logger.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 3
    assert lines[1]["loss"] == 0.5


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import optax

    from cmcd_tpu.utils.checkpoint import CheckpointManager

    params = {"train": {"a": jnp.arange(3.0), "b": jnp.ones((2, 2))}}
    opt_state = optax.adam(1e-3).init(params)
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(5, params, opt_state=opt_state, key=jax.random.PRNGKey(7))
    assert mngr.latest_step() == 5
    step, restored = mngr.restore(
        template={"params": params, "opt_state": opt_state,
                  "key": jax.random.PRNGKey(0)}
    )
    assert step == 5
    onp.testing.assert_allclose(
        onp.asarray(restored["params"]["train"]["a"]), onp.arange(3.0)
    )
    onp.testing.assert_array_equal(
        onp.asarray(restored["key"]), onp.asarray(jax.random.PRNGKey(7))
    )
    mngr.close()


def test_checkpoint_async_saves_commit_atomically(tmp_path):
    """Periodic saves are ASYNC (background orbax write, no stall at the
    chunk boundary); every read path (latest_step/restore/wait/close)
    barriers on pending writes, so back-to-back async saves are all
    durable and the newest wins."""
    import jax

    from cmcd_tpu.utils.checkpoint import CheckpointManager

    mngr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=3)
    for step in (10, 20, 30):
        params = {"train": {"a": jnp.full((4,), float(step))}}
        mngr.save(step, params, key=jax.random.PRNGKey(step))  # no wait
    assert mngr.latest_step() == 30
    step, restored = mngr.restore(
        template={"params": {"train": {"a": jnp.zeros((4,))}},
                  "key": jax.random.PRNGKey(0)}
    )
    assert step == 30
    onp.testing.assert_allclose(
        onp.asarray(restored["params"]["train"]["a"]), onp.full((4,), 30.0)
    )
    mngr.close()
