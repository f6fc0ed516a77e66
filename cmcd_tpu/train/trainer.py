"""Training loop: Adam + clip(5.0), parameter projection, EMA, NaN guard.

Reference: src/opt.py. Differences by design:
- The optimizer state and params stay as pytrees (no ravel_pytree).
- The per-step update (grad, optimizer, projection, EMA) is ONE jitted
  function; the host loop only draws nothing and logs occasionally. The
  reference re-enters Python every step and materializes loss+grad on host
  for logging at a fixed cadence (src/opt.py:92-163).
- The NaN guard returns a consistent result structure (the reference's
  early-exit returns a 2-tuple where callers expect 3, src/opt.py:124 —
  a crash bug not inherited).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from cmcd_tpu import bounds


def project(train_params: dict, trainable) -> dict:
    """Constraint projection after each update (reference src/opt.py:14-24):
    eps in [1e-7, 0.5], eta in [0, 0.99], gamma >= 1e-3, mgridref_y >= 1e-3."""
    out = dict(train_params)
    if "eps" in out:
        out["eps"] = jnp.clip(out["eps"], 0.0000001, 0.5)
    if "eta" in out:
        out["eta"] = jnp.clip(out["eta"], 0.0, 0.99)
    if "gamma" in out:
        out["gamma"] = jnp.clip(out["gamma"], 0.001, None)
    if "mgridref_y" in out:
        out["mgridref_y"] = jax.nn.relu(out["mgridref_y"] - 0.001) + 0.001
    return out


def create_optimizer(step_size, b1=0.9, b2=0.999, eps=1e-8):
    """clip(5.0) then Adam (reference src/opt.py:27-35)."""
    return optax.chain(
        optax.clip(5.0), optax.adam(learning_rate=step_size, b1=b1, b2=b2, eps=eps)
    )


@dataclasses.dataclass
class TrainResult:
    params: Any
    ema_params: Optional[Any]
    losses: Any          # (num_logged,) host array of logged losses
    diverged: bool
    steps_done: int


def train(
    setup: bounds.CMCDSetup,
    params,
    ctx,
    *,
    lr: float,
    iters: int,
    batch_size: int,
    key,
    trainable,
    loss_fn: Optional[Callable] = None,
    use_ema: bool = False,
    ema_step_size: float = 0.001,
    callback: Optional[Callable] = None,
    callback_every: Optional[int] = None,
    nan_check_every: int = 100,
    log_every: Optional[int] = None,
) -> TrainResult:
    """Run the optimizer loop.

    callback(step, info_dict) is invoked every callback_every steps with
    host-side scalars (loss, eps, gamma, ...) — the wandb-optional logging
    hook. The NaN divergence guard (reference src/opt.py:122-124) checks on
    the host every nan_check_every steps and stops early, returning the last
    finite params.
    """
    loss_fn = loss_fn or bounds.loss_fn_for_mode(setup.mode)
    optimizer = create_optimizer(lr)
    opt_state = optimizer.init(params["train"])
    notrain = params["notrain"]
    ema = jax.tree_util.tree_map(jnp.copy, params["train"]) if use_ema else None

    log_every = log_every or max(iters // 1000, 1)
    callback_every = callback_every or max(iters // 100, 1)

    def update_fn(train_p, notrain, opt_state, ema, step_key):
        def loss_of(train_p):
            full = {"train": train_p, "notrain": notrain}
            return loss_fn(full, step_key, batch_size, ctx, setup)

        (loss, (neg_elbos, z)), grads = jax.value_and_grad(loss_of, has_aux=True)(
            train_p
        )
        updates, opt_state = optimizer.update(grads, opt_state, train_p)
        train_p = optax.apply_updates(train_p, updates)
        train_p = project(train_p, trainable)
        if use_ema:
            ema = optax.incremental_update(train_p, ema, step_size=ema_step_size)
        grad_mean = jax.flatten_util.ravel_pytree(grads)[0].mean()
        return train_p, opt_state, ema, loss, grad_mean, neg_elbos, z

    train_p = params["train"]
    # Hoist target constants (means, Cholesky factors, datasets the target
    # log-prob closes over) out of the executable — embedded constants cost
    # ~30 ms host dispatch per call on this TPU stack (utils/jit.py).
    from cmcd_tpu.utils.jit import const_hoisted_jit

    update = const_hoisted_jit(
        update_fn, train_p, notrain, opt_state, ema, jax.random.PRNGKey(0)
    )

    losses = []
    diverged = False
    last_finite = train_p
    steps_done = 0

    for i in range(iters):
        key, step_key = jax.random.split(key)
        train_p, opt_state, ema, loss, grad_mean, neg_elbos, z = update(
            train_p, notrain, opt_state, ema, step_key
        )
        steps_done = i + 1

        if i % nan_check_every == 0 or i == iters - 1:
            loss_host = float(loss)
            if not jnp.isfinite(loss_host):
                diverged = True
                train_p = last_finite
                break
            last_finite = train_p

        if i % log_every == 0:
            losses.append(float(loss))
            if callback is not None and i % callback_every == 0:
                info = {
                    "step": i,
                    "loss": float(loss),
                    "grad_mean": float(grad_mean),
                    "var_loss": float(jnp.var(neg_elbos, ddof=1)),
                }
                merged = {**train_p, **notrain}
                info["eps"] = float(merged["eps"])
                if "gamma" in merged:
                    info["gamma"] = float(merged["gamma"])
                callback(i, info, z)

    final = {"train": train_p, "notrain": notrain}
    ema_full = {"train": ema, "notrain": notrain} if use_ema else None
    return TrainResult(
        params=final,
        ema_params=ema_full,
        losses=jnp.asarray(losses),
        diverged=diverged,
        steps_done=steps_done,
    )


def mfvi_pretrain(
    dim: int,
    target_log_prob,
    *,
    lr: float = 0.01,
    iters: int = 150_000,
    batch_size: int = 5,
    key=None,
    init_sigma: float = 1.0,
    callback=None,
):
    """Mean-field VI pretraining of the variational distribution.

    The reference does this as a bounding machine with nbridges=0
    (src/main.py:82-113, src/boundingmachine.py:79-97); same here via the
    degenerate setup (mode irrelevant when nbridges=0).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    setup = bounds.CMCDSetup(mode="MCD_ULA", dim=dim, nbridges=0)
    params, ctx = bounds.initialize(
        setup, target_log_prob, trainable=("vd",), init_sigma=init_sigma
    )
    result = train(
        setup,
        params,
        ctx,
        lr=lr,
        iters=iters,
        batch_size=batch_size,
        key=key,
        trainable=("vd",),
        loss_fn=bounds.kl_bound,
        callback=callback,
    )
    vd = result.params["train"]["vd"]
    elbo = -jnp.mean(result.losses[-500:]) if len(result.losses) else jnp.nan
    return vd, float(elbo), result
