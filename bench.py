"""Benchmark: annealed-SDE chain-steps/sec/chip on the flagship recipe.

Config: 40-mode GMM with MCD_CAIS_var_sn (VarGrad), N=2000 chains,
nbridges=256 — the reference's headline recipe (README.md:26-40,
BASELINE.json). One "chain-step" = one SDE bridge step of one chain, so a
training step performs N * nbridges chain-steps (forward; the backward pass
is part of the measured step, as in the 5x wall-clock target).

Prints ONE JSON line:
  {"metric": "chain_steps_per_sec_per_chip", "value": ..., "unit": "steps/s",
   "vs_baseline": ...}
vs_baseline = tpu_native / reference_style, where reference_style is a
faithful re-creation of the reference's vmapped per-chain execution
structure run on the SAME chip (bench_reference_style.py). The reference
repo itself cannot run here (numpyro/distrax/wandb absent), so this is the
honest like-for-like baseline.

Env knobs: BENCH_N, BENCH_NBRIDGES, BENCH_ITERS for quick local runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import optax


def time_steps(step_fn, init_state, iters: int):
    """Median wall-clock of step_fn over `iters` timed calls.

    step_fn must already be compiled via cmcd_tpu.utils.const_hoisted_jit:
    on this TPU stack, embedded HLO array constants cost a fixed ~30 ms per
    execution (and explode compile times); hoisting them to runtime args is
    required for honest measurements. Both sides of the A/B get the same
    treatment.
    """
    def materialize(state):
        # On this stack block_until_ready returns before the remote
        # computation finishes; pulling a scalar to host is the only
        # reliable completion barrier.
        return float(jax.tree_util.tree_leaves(state)[0].ravel()[0])

    state = init_state
    # Warmup / compile.
    state = step_fn(state)
    materialize(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step_fn(state)
    materialize(state)  # chained data dependency forces all iters
    return (time.perf_counter() - t0) / iters


def bench_tpu_native(n, nbridges, iters):
    import cmcd_tpu
    from cmcd_tpu.train import project

    target = cmcd_tpu.load_target("many_gmm")
    setup = cmcd_tpu.CMCDSetup(
        mode="MCD_CAIS_var_sn",
        dim=target.dim,
        nbridges=nbridges,
        emb_dim=48,
        grad_clipping=True,
    )
    trainable = cmcd_tpu.default_trainable(setup.mode, train_eps=False, train_vi=False)
    params, ctx = cmcd_tpu.initialize(
        setup, target.log_prob, eps=0.65, init_sigma=15.0, trainable=trainable
    )
    opt = optax.chain(optax.clip(5.0), optax.adam(1e-3))
    opt_state = opt.init(params["train"])
    notrain = params["notrain"]

    def train_step(state):
        train_p, notrain, opt_state, key = state
        key, step_key = jax.random.split(key)

        def loss(tr):
            return cmcd_tpu.var_bound(
                {"train": tr, "notrain": notrain}, step_key, n, ctx, setup
            )

        (l, _), grads = jax.value_and_grad(loss, has_aux=True)(train_p)
        updates, opt_state = opt.update(grads, opt_state, train_p)
        train_p = optax.apply_updates(train_p, updates)
        train_p = project(train_p, trainable)
        return (train_p, notrain, opt_state, key)

    from cmcd_tpu.utils import const_hoisted_jit

    state = (params["train"], notrain, opt_state, jax.random.PRNGKey(0))
    step = const_hoisted_jit(train_step, state)
    return time_steps(step, state, iters)


def bench_reference_style(n, nbridges, iters):
    import cmcd_tpu
    from cmcd_tpu.networks.geffner import build_geffner_network
    from cmcd_tpu.schedules import betas_from_grid, make_beta_grid_params
    from bench_reference_style import make_reference_style_vargrad

    target = cmcd_tpu.load_target("many_gmm")
    dim = target.dim

    init_sn, apply_sn_batched = build_geffner_network(dim, 48, nbridges)
    sn = init_sn(jax.random.PRNGKey(1))

    def apply_sn_single(p, z, i):
        return apply_sn_batched(p, z[None, :], i)[0]

    def target_single(z):
        return target.log_prob(z[None, :])[0]

    loss_fn = make_reference_style_vargrad(target_single, dim, nbridges, apply_sn_single)
    mg, gx, tx = make_beta_grid_params(nbridges)
    betas = betas_from_grid(mg, gx, tx)
    params = {
        "vd": {
            "mean": jnp.zeros(dim),
            "logdiag": jnp.ones(dim) * jnp.log(15.0),
        },
        "eps": jnp.asarray(0.65),
        "sn": sn,
        "mgridref_y": mg,
        "gridref_x": gx,
        "target_x": tx,
    }
    opt = optax.chain(optax.clip(5.0), optax.adam(1e-3))
    # Reference trains (eta, gamma, sn, mgridref_y); grads flow to sn and
    # mgridref_y here — equivalent work.
    opt_state = opt.init(params)

    def train_step(state):
        params, opt_state, key = state
        key, step_key = jax.random.split(key)
        # Reference draws N integer seeds per step (src/opt.py:94).
        seeds = jax.random.randint(step_key, (n,), 1, int(1e6))

        def loss(p):
            # gridref_x/target_x are frozen buffers in the reference
            # (notrain + stop_gradient, src/mcdboundingmachine.py:113-114,142).
            b = betas_from_grid(
                p["mgridref_y"],
                jax.lax.stop_gradient(p["gridref_x"]),
                jax.lax.stop_gradient(p["target_x"]),
            )
            return loss_fn(seeds, p, b)

        (l, _), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key)

    from cmcd_tpu.utils import const_hoisted_jit

    state = (params, opt_state, jax.random.PRNGKey(0))
    step = const_hoisted_jit(train_step, state)
    return time_steps(step, state, iters)


def bench_fused_eval(n, nbridges, iters):
    """Forward/eval throughput on the fused Pallas kernel."""
    import cmcd_tpu
    from cmcd_tpu import bounds
    from cmcd_tpu.ops.fused import compute_elbos_fused
    from cmcd_tpu.utils import const_hoisted_jit

    target = cmcd_tpu.load_target("many_gmm")
    setup = cmcd_tpu.CMCDSetup(
        mode="MCD_CAIS_var_sn", dim=target.dim, nbridges=nbridges, emb_dim=48,
        grad_clipping=True,
    )
    params, ctx = cmcd_tpu.initialize(
        setup, target.log_prob, eps=0.65, init_sigma=15.0
    )

    def step(state):
        params, key, acc = state
        key, sk = jax.random.split(key)
        ne, _ = compute_elbos_fused(params, sk, n, setup, target)
        acc = acc + jnp.mean(ne)
        key = jax.random.fold_in(key, (acc > 0).astype(jnp.int32))
        return (params, key, acc)

    state = (params, jax.random.PRNGKey(0), jnp.float32(0.0))
    fn = const_hoisted_jit(step, state)
    return time_steps(fn, state, iters)


def main():
    n = int(os.environ.get("BENCH_N", 2000))
    nbridges = int(os.environ.get("BENCH_NBRIDGES", 256))
    iters = int(os.environ.get("BENCH_ITERS", 10))

    t_native = bench_tpu_native(n, nbridges, iters)
    t_ref = bench_reference_style(n, nbridges, iters)
    try:
        t_eval = bench_fused_eval(n, nbridges, iters)
    except Exception:
        t_eval = None

    chain_steps = n * nbridges
    native_tput = chain_steps / t_native
    ref_tput = chain_steps / t_ref

    print(
        json.dumps(
            {
                "metric": "chain_steps_per_sec_per_chip",
                "value": round(native_tput, 1),
                "unit": "chain-steps/s",
                "vs_baseline": round(native_tput / ref_tput, 3),
                "detail": {
                    "config": f"many_gmm MCD_CAIS_var_sn N={n} K={nbridges}",
                    "tpu_native_step_s": round(t_native, 4),
                    "reference_style_step_s": round(t_ref, 4),
                    "fused_pallas_eval_s": round(t_eval, 4) if t_eval else None,
                    "fused_eval_chain_steps_per_s": (
                        round(chain_steps / t_eval, 1) if t_eval else None
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
