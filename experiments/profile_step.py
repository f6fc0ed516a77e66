"""Device-time attribution of one training step from a profiler trace.

VERDICT r3 weak #3 / NEXT #2: the 1600-D LGCP split-sweep paths have a flat
~2 ms/step floor at small K and ~137 ms/step at K=256/N=128 that RESULTS.md
calls "fixed-cost-dominated" without saying where the fixed cost sits. This
tool runs a config's fused (and optionally scan) train step under
jax.profiler.start_trace, parses the emitted *.trace.json.gz, and buckets
per-step DEVICE time by op (pallas kernels vs XLA fusions vs infeed/copy),
plus the device-idle share (wall - busy = host dispatch + relay latency).

Usage (run ALONE - one process per chip):
  python -m experiments.profile_step lgcp --nbridges 8 --n 128 [--scan]
  python -m experiments.profile_step many_gmm --mode MCD_CAIS_var_sn \
      --nbridges 256 --n 2000 --emb_dim 130
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import tempfile
import time
from collections import defaultdict

import jax
import jax.numpy as jnp


def run_traced(step, state, steps, trace_dir):
    def materialize(s):
        return float(jax.tree_util.tree_leaves(s)[0].ravel()[0])

    state = step(state)
    materialize(state)
    state = step(state)
    materialize(state)
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state)
    materialize(state)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    return wall / steps


def parse_trace(trace_dir, steps):
    """Bucket device-track event durations by op name.

    Returns (per_step_busy_s, buckets: {name: per_step_s}, device_span_s).
    """
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device tracks: pid whose process_name metadata mentions TPU/device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid", 0))] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "Device" in n or "/device" in n.lower()
    }
    # Annotation tracks ("Steps" = step-number markers, "XLA Modules" =
    # whole-module spans) parallel the op track and would double-count.
    skip_tids = {
        t for t, n in tid_names.items()
        if "step" in n.lower() or "module" in n.lower()
    }
    # Device-track events NEST (a while op spans its body kernels; the
    # whole-module jit_* event spans everything on its track). Summing raw
    # durations double-counts, so attribute SELF time: each event's duration
    # minus the time covered by events strictly inside it on the same track.
    tracks = defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if (e["pid"], e.get("tid", 0)) in skip_tids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        if dur <= 0:
            continue
        name = e.get("name", "?")
        if name.isdigit():  # step-number annotation without a named track
            continue
        # The whole-module event (jit_run/pjit_run) spans its ops AND the
        # idle gaps between them — drop it so busy reflects op time only.
        if name.startswith("jit_") or name.startswith("pjit_"):
            continue
        tracks[(e["pid"], e.get("tid", 0))].append((float(e["ts"]), dur, name))
    buckets = defaultdict(float)
    busy = 0.0
    t_min, t_max = float("inf"), 0.0
    for evs in tracks.values():
        # Longer event first at equal start => parents precede children.
        evs.sort(key=lambda t: (t[0], -t[1]))
        stack = []  # [ts_end, self_time_idx] entries
        selfs = []
        for ts, dur, name in evs:
            end = ts + dur
            t_min, t_max = min(t_min, ts), max(t_max, end)
            while stack and stack[-1][0] <= ts + 1e-9:
                stack.pop()
            if stack:
                # Subtract only the overlap from the enclosing event: a
                # sibling that merely overlaps the tail (ts inside, end
                # beyond) is not fully contained, and its overhang extends
                # the busy union rather than the parent's child time.
                parent_end = stack[-1][0]
                selfs[stack[-1][1]][1] -= min(end, parent_end) - ts
                if end > parent_end:
                    busy += end - parent_end
            else:
                busy += dur  # top-level event => contributes to busy union
            selfs.append([name, dur])
            stack.append((end, len(selfs) - 1))
        for name, self_us in selfs:
            buckets[name] += max(self_us, 0.0)
    span = (t_max - t_min) if t_max > t_min else 0.0
    per_step = {k: v / steps / 1e6 for k, v in buckets.items()}
    return busy / steps / 1e6, per_step, span / steps / 1e6


def classify(name: str) -> str:
    n = name.lower()
    # Pallas kernels appear under their trace-time function names (the HLO
    # instruction carries the custom-call's kernel_name), not "pallas".
    if ("custom-call" in n or "tpu_custom_call" in n or "pallas" in n
            or n.startswith("jvp") or n.startswith("transpose_jvp")
            or "fused_" in n or "evolve_" in n or "_kernel" in n):
        return "pallas kernel"
    if "fusion" in n or "convolution" in n or n.startswith("dot"):
        return "XLA fusion"
    if "while" in n or "scan" in n:
        return "XLA while/scan"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "copy/layout"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "host transfer"
    if "all-reduce" in n or "all-gather" in n:
        return "collective"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target", type=str)
    ap.add_argument("--mode", type=str, default="MCD_CAIS_sn")
    ap.add_argument("--nbridges", type=int, default=8)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--emb_dim", type=int, default=20)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--scan", action="store_true",
                    help="profile the XLA-scan path instead of fused")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--bf16_residuals", action="store_true",
                    help="bf16 trajectory/noise/gsn stacks on the split "
                         "fused-KL backward (ops/fused_train bf16_residuals)")
    ap.add_argument("--trace_dir", type=str, default=None,
                    help="persist the trace here (default: tempdir)")
    ap.add_argument("--reparse", action="store_true",
                    help="parse an existing --trace_dir without running")
    args = ap.parse_args()

    if args.reparse:
        assert args.trace_dir, "--reparse needs --trace_dir"
        busy, per_step, span = parse_trace(args.trace_dir, args.steps)
        report(args, None, busy, per_step, span)
        return

    import cmcd_tpu
    from cmcd_tpu import bounds
    from cmcd_tpu.utils import const_hoisted_jit
    from bench import _train_step_factory

    target = cmcd_tpu.load_target(args.target)
    setup = bounds.CMCDSetup(
        mode=args.mode, dim=target.dim, nbridges=args.nbridges,
        emb_dim=args.emb_dim, grad_clipping=True,
    )
    trainable = cmcd_tpu.default_trainable(setup.mode)
    params, ctx = bounds.initialize(
        setup, target.log_prob, eps=0.01, init_sigma=1.0,
        trainable=trainable,
    )
    if args.scan:
        if setup.mode == "MCD_CAIS_var_sn":
            loss_builder = lambda p, k: bounds.var_bound(
                p, k, args.n, ctx, setup)
        else:
            loss_builder = lambda p, k: bounds.kl_bound(
                p, k, args.n, ctx, setup)
    else:
        from cmcd_tpu.ops.fused_train import (kl_bound_pallas,
                                              var_bound_pallas)

        if setup.mode == "MCD_CAIS_var_sn":
            loss_builder = lambda p, k: var_bound_pallas(
                p, k, args.n, ctx, setup, target, bf16_net=args.bf16)
        else:
            loss_builder = lambda p, k: kl_bound_pallas(
                p, k, args.n, ctx, setup, target, bf16_net=args.bf16,
                bf16_residuals=args.bf16_residuals)

    train_step, opt = _train_step_factory(loss_builder, trainable)
    state = (params["train"], params["notrain"], opt.init(params["train"]),
             jax.random.PRNGKey(0))
    step = const_hoisted_jit(train_step, state)

    if args.trace_dir:
        os.makedirs(args.trace_dir, exist_ok=True)
        wall = run_traced(step, state, args.steps, args.trace_dir)
        busy, per_step, span = parse_trace(args.trace_dir, args.steps)
    else:
        with tempfile.TemporaryDirectory() as td:
            wall = run_traced(step, state, args.steps, td)
            busy, per_step, span = parse_trace(td, args.steps)
    report(args, wall, busy, per_step, span)


def report(args, wall, busy, per_step, span):
    path = "scan" if args.scan else "fused"
    wall_s = f"wall {wall*1e3:.3f} ms/step, " if wall is not None else ""
    host = (f", host+dispatch {(wall-span)*1e3:.3f} ms"
            if wall is not None else "")
    print(f"\n{args.target} {args.mode} K={args.nbridges} N={args.n} "
          f"[{path}]: {wall_s}device busy "
          f"{busy*1e3:.3f} ms, device span {span*1e3:.3f} ms, "
          f"idle-on-device {(span-busy)*1e3:.3f} ms{host}")
    cats = defaultdict(float)
    for name, sec in per_step.items():
        cats[classify(name)] += sec
    for c, sec in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {c:<16} {sec*1e3:8.3f} ms/step")
    print("  top ops (self time):")
    for name, sec in sorted(per_step.items(), key=lambda kv: -kv[1])[:12]:
        print(f"    {sec*1e3:8.3f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
