"""Hardware A/B of the replay backward's points_per_program (NEXT #3).

The round-4 roofline put the flagship replay backward at ~1.4 ms of MXU
work plus ~1.6 ms of width-independent cost, of which ~1 ms scales with
program count (~3.9 us/program at 257 programs after the bwd-block
widening). points_per_program=1 was measured optimal BEFORE the widening
(narrow chain blocks, 514+ programs, where jsz=8's fori_loop overhead
lost to the prologue saving). This probe re-measures jsz in {1,2,4,8}
at the CURRENT configuration (whole-batch backward grid) on hardware,
trainer-level (steps_per_call chunking, optimizer included).

Usage (run ALONE on the chip):
  python -m experiments.probe_ppp [--bf16] [--n 2000] [--nbridges 256]
"""

from __future__ import annotations

import argparse
import functools

import bench
from cmcd_tpu.ops import fused_train, pallas_vargrad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--nbridges", type=int, default=256)
    ap.add_argument("--emb_dim", type=int, default=130)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--steps_per_call", type=int, default=100)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--ppp", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    orig = pallas_vargrad.evolve_vargrad_bwd_replay
    rows = []
    for p in args.ppp:
        fused_train.evolve_vargrad_bwd_replay = functools.partial(
            orig, points_per_program=p
        )
        try:
            t, groups = bench.bench_train(
                args.n, args.nbridges, args.emb_dim, args.iters,
                args.repeats, use_pallas=True,
                steps_per_call=args.steps_per_call, bf16_net=args.bf16,
            )
        finally:
            fused_train.evolve_vargrad_bwd_replay = orig
        rows.append((p, t, groups))
        print(f"points_per_program={p}: {t*1e3:.3f} ms/step "
              f"(groups {[round(g*1e3, 3) for g in groups]})", flush=True)

    best = min(rows, key=lambda r: r[1])
    base = next(r for r in rows if r[0] == 1)
    print(f"\nbest: ppp={best[0]} at {best[1]*1e3:.3f} ms/step "
          f"({base[1]/best[1]:.3f}x vs ppp=1 {base[1]*1e3:.3f})")


if __name__ == "__main__":
    main()
