"""Hardware A/B probe: big-K UNDERDAMPED fused KL training vs XLA scan.

The time-chunked underdamped reverse sweep (ops/pallas_kl.py
evolve_kl_bwd_underdamped time_block) newly admits big-K leapfrog configs
(196-D nice, K=64/256) to the fused path; this probe measures the
trainer-level step time of both paths on the real chip and checks the
losses agree. Run ALONE (one process per chip).

Usage: python -m experiments.probe_ud_bigk [K] [N] [mode] [time_block] [block]
(time_block/block: 0 or omitted = the auto choice; probing alternates
calibrates choose_time_block's ladder from hardware points.)
"""
import sys

import jax
import jax.numpy as jnp

import cmcd_tpu
from cmcd_tpu import bounds
from cmcd_tpu.utils import const_hoisted_jit
from bench import time_steps, _train_step_factory


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    mode = sys.argv[3] if len(sys.argv) > 3 else "MCD_U_a-lp-sn"
    tb_override = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    blk_override = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    iters = max(4, 2048 // nb)

    target = cmcd_tpu.load_target("nice")
    setup = bounds.CMCDSetup(
        mode=mode, dim=target.dim, nbridges=nb, emb_dim=20,
        grad_clipping=True,
    )
    trainable = cmcd_tpu.default_trainable(setup.mode, train_vi=True,
                                           train_eps=True)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.01, init_sigma=1.0, gamma=5.0,
        eta=0.5, trainable=trainable,
    )

    from cmcd_tpu.ops.fused import (choose_block, choose_time_block,
                                    _vmem_estimate, supports_fused_train)
    blk = choose_block(target.dim, n, traj_arrays=3, nbridges=nb)
    est = _vmem_estimate(setup, target, blk)
    tb = choose_time_block(nb, target.dim, blk, 3, est)
    if blk_override:
        blk = blk_override
    if tb_override:
        tb = tb_override
    print(f"config: K={nb} N={n} {mode} dim={target.dim} "
          f"block={blk} time_block={tb} "
          f"supports={supports_fused_train(setup, target, n_chains=n)}")

    results = {}
    for name in ("scan", "fused"):
        if name == "fused":
            from cmcd_tpu.ops.fused_train import kl_bound_pallas

            loss_builder = lambda p, k: kl_bound_pallas(
                p, k, n, ctx, setup, target,
                block=blk if blk_override else None,
                time_block=tb if tb_override else None,
            )
        else:
            loss_builder = lambda p, k: bounds.kl_bound(p, k, n, ctx, setup)
        train_step, opt = _train_step_factory(loss_builder, trainable)
        state = (
            params["train"], params["notrain"], opt.init(params["train"]),
            jax.random.PRNGKey(0),
        )
        step = const_hoisted_jit(train_step, state)
        t, groups = time_steps(step, state, iters, repeats=3)
        # Agreement check: BOTH paths take the SAME number of real update
        # steps from the SAME init (time_steps discards its own state, so
        # run a fresh short chain here), then evaluate the loss with one
        # fixed key. Realizations differ (kernel PRNG vs XLA PRNG) so
        # compare the level, not the bits.
        n_check = 16
        final_state = state
        for _ in range(n_check):
            final_state = step(final_state)
        key = jax.random.PRNGKey(7)
        l = loss_builder(
            {"train": final_state[0], "notrain": final_state[1]}, key
        )[0]
        results[name] = (t, float(l))
        print(f"{name}: {t*1e3:.2f} ms/step "
              f"(groups {[round(g*1e3, 2) for g in groups]}), "
              f"loss after {n_check} steps from init: {float(l):.3f}")

    sp = results["scan"][0] / results["fused"][0]
    print(f"speedup fused vs scan: {sp:.2f}x")


if __name__ == "__main__":
    main()
