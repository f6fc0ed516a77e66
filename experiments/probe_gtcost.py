"""Bound the replay backward's target-score recompute cost (flagship).

The replay backward recomputes gt = grad_logp_t(z_j) at every stored
point even though the forward kernel computed and carried the identical
value (pallas_overdamped step_core's gt carry). This probe times the
fused VarGrad train step with the backward's grad_logp_t swapped for a
near-free stub (z * 0.01) — the LOSS IS WRONG, only the timing is
meaningful — to measure how much a store-gt-in-the-forward design could
save before building it.

Usage (run ALONE on the chip):
  python -m experiments.probe_gtcost [--bf16]
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

import bench
from cmcd_tpu.ops import fused_train, pallas_vargrad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--nbridges", type=int, default=256)
    ap.add_argument("--emb_dim", type=int, default=130)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--steps_per_call", type=int, default=100)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    def run():
        t, groups = bench.bench_train(
            args.n, args.nbridges, args.emb_dim, args.iters, args.repeats,
            use_pallas=True, steps_per_call=args.steps_per_call,
            bf16_net=args.bf16,
        )
        return t, [round(g * 1e3, 3) for g in groups]

    t_real, g_real = run()
    print(f"real grad_t : {t_real*1e3:.3f} ms/step (groups {g_real})",
          flush=True)

    def cheap_grad(z_t):
        return z_t * 0.01

    orig = pallas_vargrad.evolve_vargrad_bwd_replay

    def patched(traj_t, cot, betas, eps, vd_mean, vd_logdiag,
                grad_logp_t, spec, **kw):
        return orig(traj_t, cot, betas, eps, vd_mean, vd_logdiag,
                    cheap_grad, spec, **kw)

    fused_train.evolve_vargrad_bwd_replay = patched
    try:
        t_stub, g_stub = run()
    finally:
        fused_train.evolve_vargrad_bwd_replay = orig
    print(f"stub grad_t : {t_stub*1e3:.3f} ms/step (groups {g_stub})")
    print(f"target-score recompute share of the step: "
          f"{(t_real - t_stub)*1e3:.3f} ms ({(t_real-t_stub)/t_real*100:.1f}%)")


if __name__ == "__main__":
    main()
