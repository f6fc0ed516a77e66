"""Fused Pallas BPTT backward for the KL-trained overdamped modes.

The KL loss (mean negative ELBO, reference src/boundingmachine.py:183-205)
differentiates through the WHOLE rollout — unlike VarGrad there are no
stop-gradients, so the gradient needs true backprop-through-time: the state
cotangent dL/dz_j chains backward through every bridge step, including the
target-score Jacobian (an HVP of log pi) and the score-net Jacobian.

The XLA scan path autodiffs this at ~16 ms/step on the flagship size. This
kernel runs the reverse sweep on-core instead:

- residuals: the forward kernel's stored trajectory z_0..z_K and noise
  draws xi_0..xi_{K-1}, both in the raw transposed layout
  (ops/pallas_overdamped.py return_trajectory_t / return_noise_t).
- per chain-block program: carry g_z = dL/dz_{j+1} (initialized from the
  cotangent of the final state, i.e. the target-term gradient computed by
  XLA outside), loop j = K-1 .. 0 evaluating the VJP of the exact step
  math; accumulate parameter gradients in VMEM; emit dL/dz_0 so XLA can
  continue the chain through the reparameterized initial draw.
- the per-step VJP comes from jax.vjp of the step function at TRACE time —
  eps schedules, clipping masks, beta selection, net and target Jacobians
  all from autodiff of the same formulas the scan integrator uses
  (integrators/overdamped.py), closure-converted into kernel inputs.

Exactness is tested against jax.grad of the scan kl_bound under injected
noise (tests/test_pallas_kl.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmcd_tpu.integrators.overdamped import OverdampedSpec
from cmcd_tpu.integrators.underdamped import UnderdampedSpec
from cmcd_tpu.ops.kernel_common import (
    normalize_time_block,
    pack_consts,
    unpack_consts,
    vmem_limit_params,
)
from cmcd_tpu.ops.pallas_overdamped import LANE, _round_up


def evolve_kl_bwd_pallas(
    traj_t,
    noise_t,
    cot,
    g_zfinal,
    betas,
    eps,
    vd_mean,
    vd_logdiag,
    grad_logp_t: Callable,
    spec: OverdampedSpec,
    *,
    dim: int,
    nbridges: int,
    n_chains: int,
    sn_weights,
    sn_meta,
    sn2_weights=None,
    eps_schedule: str = "",
    grad_clipping: bool = False,
    block: int = 1024,
    net_grads_outside: bool = False,
    net_compute_dtype=jnp.float32,
    time_block: int | None = None,
    z_final_t=None,
    interpret: bool = False,
):
    """Reverse-sweep BPTT gradients from stored (trajectory, noise).

    net_grads_outside (CAIS carry path only): the sweep kernel handles the
    state chain with the net weights CLOSED OVER (z-Jacobian transposes
    only — no weight-gradient matmuls or weight-sized outputs in VMEM) and
    emits each trajectory point's net-output cotangent to a stack; the
    weight gradients come from one batched XLA vjp over the stored
    trajectory afterwards. Exact f32 either way — this moves ~3x the packed
    weight bytes out of the kernel's VMEM footprint (f32 in-kernel weight
    grads spill ~80 MB past the 128 MB physical VMEM on the 1600-D LGCP).

    net_compute_dtype=bfloat16 (split + geffner only) additionally stores
    the net weights in the sweep kernel as bf16 and runs the layer chain in
    bf16 (f32 MXU accumulation) — the weight windows AND their on-core
    copies halve, which is what finally fits LGCP under 128 MB. The
    out-of-kernel weight-grad pass stays f32; the overall gradient is
    bf16-accurate (~1e-2 relative), pinned by test.

    traj_t: (nbridges + 1, dim_pad, n_pad); noise_t: (nbridges, dim_pad,
    n_pad) — raw transposed outputs of the forward kernel.
    cot: (n_chains,) cotangent of the per-chain summed log-weight deltas.
    g_zfinal: (n_chains, dim) cotangent of the final state (the target
    log-prob term's gradient, computed by XLA outside the kernel).

    Returns (grads dict like evolve_vargrad_bwd_replay, g_z0 (n_chains,
    dim) — the initial-state cotangent for the reparameterized draw).
    """
    n_traj, dim_pad, n_pad = traj_t.shape
    # The time-chunked forward stores z_0..z_{K-1} (nbridges rows) and
    # hands the final state separately (z_final_t); the single-window
    # forward stores the full (K+1)-row stack.
    if n_traj == nbridges + 1:
        zK_t = traj_t[nbridges]
    else:
        assert n_traj == nbridges and z_final_t is not None
        zK_t = z_final_t
    assert noise_t is None or noise_t.shape == (nbridges, dim_pad, n_pad)
    # Residual storage dtype (bf16 halves the stack streaming). bf16
    # trajectories CANNOT reconstruct xi — (z_{j+1} - fk_mean)/s is a
    # catastrophic cancellation at step scale s << bf16 ulp of |z| — so the
    # bf16 split path must be handed the stored noise stack.
    residual_dtype = traj_t.dtype
    bf16_res = residual_dtype == jnp.dtype(jnp.bfloat16)
    if bf16_res:
        assert noise_t is not None and noise_t.dtype == residual_dtype, (
            "bf16 residuals require a stored (bf16) noise stack; xi cannot "
            "be reconstructed from a bf16 trajectory"
        )
        assert net_grads_outside, "bf16 residuals are split-sweep only"
    # The kernel computes in f32 regardless of storage dtype.
    zK_t = zK_t.astype(jnp.float32)
    block = _round_up(block, LANE)
    if n_pad % block != 0:
        block = next(
            b for b in range(min(block, n_pad), 0, -LANE) if n_pad % b == 0
        )
    nchunks = n_pad // block
    # Time-chunked sweep: the grid gains a second (reverse-time) dimension;
    # each program loads only a t_block-step trajectory window, and the
    # state/application cotangents carry between chunks in VMEM scratch.
    # t_block = nbridges (the default) is the single-window sweep; smaller
    # blocks bound the double-buffered window footprint for large
    # (nbridges + 1) x dim_pad stacks (nice K=256: 2 x 50 MB windows blew
    # the 128 MB physical VMEM before chunking).
    if time_block is None or time_block >= nbridges:
        t_block = nbridges
    else:
        t_block = normalize_time_block(nbridges, time_block)
    nt = nbridges // t_block

    use_sn = spec.fwd_sn or spec.bwd_sn
    arch = "geffner"
    if use_sn:
        arch = sn_meta.get("arch", "geffner")
        in_dim = sn_meta["in_dim"]
        if arch == "geffner":
            emb_dim = sn_meta["emb_dim"]
            sn_nbridges = sn_meta["nbridges"]
        else:
            channels = sn_meta["channels"]
            n_state = len(sn_weights["state"])
            n_tcg = sn_meta.get("n_tcg", 0)
            assert not spec.use_sn2_bwd, "DNF + PIS nets not supported fused"

    cot_rows = jnp.zeros((8, n_pad), jnp.float32).at[0, :n_chains].set(cot)
    gzf_t = (
        jnp.zeros((dim_pad, n_pad), jnp.float32).at[:dim, :n_chains].set(
            g_zfinal.T
        )
    )
    mean_col = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_mean)
    logdiag_col = (
        jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_logdiag)
    )
    row_mask = (jnp.arange(dim_pad) < dim).astype(jnp.float32)[:, None]
    betas_row = jnp.asarray(betas, jnp.float32).reshape(1, nbridges)

    clip_t = spec.clip_target if grad_clipping else None
    clip_q = spec.clip_vd if grad_clipping else None

    def _net_theta(weights):
        if arch == "pis":
            from cmcd_tpu.ops.pallas_nets import pis_theta

            return pis_theta(weights)
        if arch == "pis_grad":
            from cmcd_tpu.ops.pallas_nets import pis_grad_theta

            return pis_grad_theta(weights)
        layer_ws = [w_t for (w_t, _) in weights["layers"]]
        layer_bs = [b_col for (_, b_col) in weights["layers"]]
        head_w, head_b = weights["head"]
        return (
            jnp.asarray(weights["factor_sn"], jnp.float32).reshape(1, 1),
            weights["emb_t"],
            head_w,
            head_b,
            *layer_ws,
            *layer_bs,
        )

    if use_sn:
        sn_theta = _net_theta(sn_weights)
        n_layers = len(sn_weights["layers"]) if arch == "geffner" else 0
    else:
        sn_theta = ()
        n_layers = 0
    # DNF: the backward mean uses a SECOND net (same arch), reference
    # src/vi_dnf.py — its parameters enter theta as their own group.
    sn2_theta = _net_theta(sn2_weights) if spec.use_sn2_bwd else ()
    n_sn = len(sn_theta)

    theta = (
        jnp.asarray(eps, jnp.float32).reshape(1, 1),
        betas_row,
        mean_col,
        logdiag_col,
        *sn_theta,
        *sn2_theta,
    )
    n_theta = len(theta)

    def eps_at(eps0, fj):
        if eps_schedule == "cos_sq":
            phase = fj / nbridges
            return eps0 * jnp.cos((phase + 0.008) / 1.008 * 0.5 * jnp.pi) ** 2
        if eps_schedule == "linear":
            return (1e-4 - eps0) / (nbridges - 1) * fj + eps0
        return eps0

    log_2pi = 1.8378770664093453

    def sn_apply(th, z, i):
        if arch == "pis":
            from cmcd_tpu.ops.pallas_nets import pis_apply_theta

            return pis_apply_theta(
                th, z, i, dim, channels, n_state, sn_weights["coeff"]
            )
        if arch == "pis_grad":
            from cmcd_tpu.ops.pallas_nets import pis_grad_apply_theta

            return pis_grad_apply_theta(
                th, z, i, dim, channels, n_tcg, n_state,
                sn_weights["coeff"], grad_logp_t, row_mask,
            )
        factor_arr, emb_t, head_w, head_b = th[:4]
        ws = th[4 : 4 + n_layers]
        bs = th[4 + n_layers : 4 + 2 * n_layers]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (sn_nbridges, 1), 0)
            == jnp.clip(i, 0, sn_nbridges - 1)
        ).astype(jnp.float32)
        emb_col = jnp.dot(emb_t, onehot, preferred_element_type=jnp.float32)
        h = jnp.concatenate(
            [z[:dim], jnp.broadcast_to(emb_col, (emb_dim, z.shape[1]))],
            axis=0,
        )
        if in_dim > dim + emb_dim:
            h = jnp.concatenate(
                [h, jnp.zeros((in_dim - dim - emb_dim, z.shape[1]), z.dtype)],
                axis=0,
            )
        for w_t, b_col in zip(ws, bs):
            h = h + jax.nn.softplus(
                jnp.dot(w_t, h, preferred_element_type=jnp.float32) + b_col
            )
        return (
            jnp.dot(head_w, h, preferred_element_type=jnp.float32) + head_b
        ) * factor_arr[0, 0]

    def step_fn(theta, z, xi, j):
        """(z_next, delta) for bridge step j — the scan integrator's exact
        math (integrators/overdamped.py step), fully differentiable in
        (theta, z)."""
        eps_arr, betas_r, mean_c, logdiag_c = theta[:4]
        th_sn = theta[4 : 4 + n_sn]
        th_sn2 = theta[4 + n_sn :]
        eps0 = eps_arr[0, 0]

        fj = j.astype(jnp.float32)
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nbridges), 1)
        beta = jnp.sum(betas_r * (lane_idx == j).astype(jnp.float32))

        eps_j = eps_at(eps0, fj)
        s2 = 2.0 * eps_j
        scale = jnp.sqrt(s2)

        def grad_u(zz):
            if spec.zero_drift:
                return jnp.zeros_like(zz)
            gt = grad_logp_t(zz)
            gq = -(zz - mean_c) * jnp.exp(-2.0 * logdiag_c)
            if clip_t is not None:
                gt = jnp.clip(gt, -clip_t, clip_t)
            if clip_q is not None:
                gq = jnp.clip(gq, -clip_q, clip_q)
            return -(beta * gt + (1.0 - beta) * gq) * row_mask

        fk_mean = z - eps_j * grad_u(z)
        if spec.fwd_sn:
            fk_mean = fk_mean - eps_j * sn_apply(th_sn, z, j)
        z_next = fk_mean + scale * xi

        bk_mean = z_next - eps_j * grad_u(z_next)
        if spec.bwd_sn:
            bk_mean = bk_mean + eps_j * sn_apply(
                th_sn2 if spec.use_sn2_bwd else th_sn,
                z_next,
                j + spec.bwd_sn_offset,
            )

        r_fk = (z_next - fk_mean) * row_mask
        r_bk = (z - bk_mean) * row_mask
        fk_lp = (
            -0.5 * jnp.sum(r_fk * r_fk, axis=0, keepdims=True) / s2
            - 0.5 * dim * (jnp.log(s2) + log_2pi)
        )
        bk_lp = (
            -0.5 * jnp.sum(r_bk * r_bk, axis=0, keepdims=True) / s2
            - 0.5 * dim * (jnp.log(s2) + log_2pi)
        )
        return z_next, bk_lp - fk_lp

    def point_fn(theta, z, xi, j, g_next, c_row):
        """One reverse step: VJP of step_fn at (theta, z) with cotangents
        (g_next for z_next, c_row for delta). Returns theta cotangents and
        the propagated state cotangent dL/dz_j."""
        _, vjp_fn = jax.vjp(lambda th, zz: step_fn(th, zz, xi, j), theta, z)
        g_theta, g_z = vjp_fn((g_next, c_row))
        return (*g_theta, g_z)

    # CAIS structure (net at i and i+1, one net): point j's applications
    # (target score + net) are consumed by BOTH step j's forward kernel and
    # step j-1's backward kernel. point_fn transposes both applications at
    # both endpoints every step (2 primals + 2 transposes per point); the
    # carry sweep below transposes each point's applications ONCE, carrying
    # their cotangents between reverse iterations (2 primals + 1 transpose
    # per point) — the round-2 forward kernels' carry_sn, applied to BPTT.
    carry_sn = bool(
        use_sn
        and spec.fwd_sn
        and spec.bwd_sn
        and spec.bwd_sn_offset == 1
        and not spec.use_sn2_bwd
    )
    split = bool(net_grads_outside and carry_sn)
    assert not bf16_res or split, "bf16 residuals require the split sweep"
    # recon: the split kernel reconstructs xi from the f32 trajectory (the
    # default — carries no noise stack). With bf16 residuals the stored
    # (bf16) noise stack replaces reconstruction (see the dtype note above)
    # and the z_K boundary plumbing is unneeded.
    recon = split and not bf16_res
    # In split mode the kernel differentiates only the 4 small params; the
    # net weights are still kernel INPUTS (primal + z-Jacobian transposes)
    # but get no gradient outputs.
    n_theta_out = 4 if split else n_theta

    # bf16 split sweep: keep the f32 weights + apply for the out-of-kernel
    # weight-grad pass, hand the KERNEL bf16 copies and a bf16-layer apply.
    sn_apply_f32 = sn_apply
    sn_theta_f32 = sn_theta
    if split and net_compute_dtype != jnp.float32:
        assert arch == "geffner", "reduced-precision split sweep is geffner-only"
        from cmcd_tpu.ops.pallas_nets import geffner_apply_theta as _gapply

        # bf16 STORAGE, f32 COMPUTE: the weights enter the kernel as bf16
        # windows (half the VMEM) and are upcast ONCE per kernel invocation
        # (the kernel body hoists the f32 copy before the reverse loop) —
        # the single loop-invariant f32 value then serves every forward and
        # transpose matmul. Feeding matmuls bf16 operands instead makes
        # autodiff's transposes mixed-dtype, materializing per-iteration
        # f32 weight copies (measured: 145.8 MB); per-application upcasts
        # doubled the live copies (134.0); plain f32 storage leaves the
        # windows too big (133.6).
        def sn_apply(th, z, i):
            return _gapply(
                th, z, i, dim, emb_dim, in_dim, sn_nbridges, n_layers,
            )

        from cmcd_tpu.ops.kernel_common import bf16_storage_leaf

        cast_sn = tuple(
            t.astype(net_compute_dtype) if bf16_storage_leaf(t) else t
            for t in sn_theta
        )
        theta = theta[:4] + cast_sn
        # The jaxprs trace on the f32 (upcast) values the kernel body
        # produces, NOT the bf16 storage dtypes.
        sn_theta = cast_sn

    def _drift_from(z, gt_raw, mean_c, logdiag_c, beta):
        """grad_u with the raw target score as an explicit input (so the
        shared application's transpose can be factored out)."""
        gq = -(z - mean_c) * jnp.exp(-2.0 * logdiag_c)
        gt = gt_raw
        if clip_t is not None:
            gt = jnp.clip(gt, -clip_t, clip_t)
        if clip_q is not None:
            gq = jnp.clip(gq, -clip_q, clip_q)
        return -(beta * gt + (1.0 - beta) * gq) * row_mask

    def _beta_eps(theta, j):
        eps_arr, betas_r = theta[0], theta[1]
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nbridges), 1)
        beta = jnp.sum(betas_r * (lane_idx == j).astype(jnp.float32))
        return beta, eps_at(eps_arr[0, 0], j.astype(jnp.float32))

    def apps_fn(theta, z, j):
        """Primal-only point applications (no transpose): values for the
        carry sweep's explicit (gt_j, sn_j) step inputs."""
        return grad_logp_t(z), sn_apply(theta[4:], z, j)

    def iter_fn(theta, z_j, gt_j, sn_j, xi, j, g_zp, g_gt, g_sn, c_row):
        """One reverse iteration of the carry sweep: step j in a SINGLE vjp.

        The step recomputes z_{j+1} from (z_j, xi) internally, so the
        point-(j+1) applications sit inside the vjp and are transposed once
        — serving this step's bk term (cot c_row), the carried application
        cotangents (g_gt, g_sn) from step j+1's fk, and the state chain
        (g_zp) in one pass. The point-j applications enter as explicit data
        (gt_j, sn_j); their cotangents come out as the next iteration's
        carry. One theta-gradient set total (memory: the two-vjp version
        kept two sets live and spilled on 1600-D nets)."""

        def f(th, z_lo, gt_lo, sn_lo, xi_):
            beta, eps_j = _beta_eps(th, j)
            s2 = 2.0 * eps_j
            grad_u_lo = _drift_from(z_lo, gt_lo, th[2], th[3], beta)
            fk_mean = z_lo - eps_j * grad_u_lo - eps_j * sn_lo
            z_next = fk_mean + jnp.sqrt(s2) * xi_
            r_fk = (z_next - fk_mean) * row_mask
            fk_lp = (
                -0.5 * jnp.sum(r_fk * r_fk, axis=0, keepdims=True) / s2
                - 0.5 * dim * (jnp.log(s2) + log_2pi)
            )
            gt_up = grad_logp_t(z_next)
            sn_up = sn_apply(th[4:], z_next, j + spec.bwd_sn_offset)
            grad_u_up = _drift_from(z_next, gt_up, th[2], th[3], beta)
            bk_mean = z_next - eps_j * grad_u_up + eps_j * sn_up
            r_bk = (z_lo - bk_mean) * row_mask
            bk_lp = (
                -0.5 * jnp.sum(r_bk * r_bk, axis=0, keepdims=True) / s2
                - 0.5 * dim * (jnp.log(s2) + log_2pi)
            )
            return z_next, fk_lp, bk_lp, gt_up, sn_up

        _, vjp_fn = jax.vjp(f, theta, z_j, gt_j, sn_j, xi)
        g_th, g_zj, g_gt_out, g_sn_out, _ = vjp_fn(
            (g_zp, -c_row, c_row, g_gt, g_sn)
        )
        return (*g_th, g_zj, g_gt_out, g_sn_out)

    def final_fn(theta, z0, g_gt, g_sn):
        """Transpose of the point-0 applications (consumed only by step 0's
        forward kernel)."""

        def f(th, z):
            return grad_logp_t(z), sn_apply(th[4:], z, 0)

        _, vjp_f = jax.vjp(f, theta, z0)
        g_th, g_z = vjp_f((g_gt, g_sn))
        return (*g_th, g_z)

    # ---- split-mode variants: weights closed over, z-path only ----------
    def apps_fn_split(th_net, z, j):
        return grad_logp_t(z), sn_apply(th_net, z, j)

    def iter_fn_split(theta_small, th_net, z_j, gt_j, sn_j, stoch, j,
                      g_zp, g_gt, g_sn, c_row):
        """iter_fn with the net weights outside the vjp: th_net enters by
        closure (no weight cotangents, no weight-sized temporaries); the
        zero dummy added to sn_up extracts the point-(j+1) net-output
        cotangent for the out-of-kernel weight-grad pass.

        stoch is z_{j+1} (f32 residuals — the default) or the stored xi
        (bf16 residuals). In the f32 case the noise draw is NOT an input:
        xi is reconstructed (as data) from the stored trajectory via the
        forward recursion — the split kernel carries no noise stack at all,
        saving its VMEM window and the forward's noise output. bf16-stored
        trajectories cannot support that reconstruction (catastrophic
        cancellation at step scale), so they carry the (bf16) noise stack
        instead."""
        dummy = jnp.zeros((dim_pad, block), jnp.float32)

        if bf16_res:
            xi = stoch  # the stored draw (upcast by the kernel body)
        else:
            # Data-only reconstruction (1-ulp of the stored draw): the vjp
            # below re-derives z_next = fk_mean + scale * xi
            # differentiably.
            beta_v, eps_v = _beta_eps(theta_small, j)
            fk_mean_v = (
                z_j
                - eps_v * _drift_from(z_j, gt_j, theta_small[2],
                                      theta_small[3], beta_v)
                - eps_v * sn_j
            )
            xi = jax.lax.stop_gradient(
                (stoch - fk_mean_v) / jnp.sqrt(2.0 * eps_v)
            )

        def f(ths, z_lo, gt_lo, sn_lo, xi_, dmy):
            beta, eps_j = _beta_eps(ths, j)
            s2 = 2.0 * eps_j
            grad_u_lo = _drift_from(z_lo, gt_lo, ths[2], ths[3], beta)
            fk_mean = z_lo - eps_j * grad_u_lo - eps_j * sn_lo
            z_next = fk_mean + jnp.sqrt(s2) * xi_
            r_fk = (z_next - fk_mean) * row_mask
            fk_lp = (
                -0.5 * jnp.sum(r_fk * r_fk, axis=0, keepdims=True) / s2
                - 0.5 * dim * (jnp.log(s2) + log_2pi)
            )
            gt_up = grad_logp_t(z_next)
            sn_up = sn_apply(th_net, z_next, j + spec.bwd_sn_offset) + dmy
            grad_u_up = _drift_from(z_next, gt_up, ths[2], ths[3], beta)
            bk_mean = z_next - eps_j * grad_u_up + eps_j * sn_up
            r_bk = (z_lo - bk_mean) * row_mask
            bk_lp = (
                -0.5 * jnp.sum(r_bk * r_bk, axis=0, keepdims=True) / s2
                - 0.5 * dim * (jnp.log(s2) + log_2pi)
            )
            return z_next, fk_lp, bk_lp, gt_up, sn_up

        _, vjp_fn = jax.vjp(f, theta_small, z_j, gt_j, sn_j, xi, dummy)
        g_ths, g_zj, g_gt_out, g_sn_out, _, g_dummy = vjp_fn(
            (g_zp, -c_row, c_row, g_gt, g_sn)
        )
        return (*g_ths, g_zj, g_gt_out, g_sn_out, g_dummy)

    def final_fn_split(th_net, z0, g_gt, g_sn):
        def f(z):
            return grad_logp_t(z), sn_apply(th_net, z, 0)

        _, vjp_f = jax.vjp(f, z0)
        (g_z,) = vjp_f((g_gt, g_sn))
        return g_z

    zb = jax.ShapeDtypeStruct((dim_pad, block), jnp.float32)
    # bf16-stored entries are upcast to f32 by the kernel body before any
    # jaxpr runs; trace on the compute dtypes.
    theta_example = tuple(
        jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta
    )
    if split:
        iter_jaxpr = jax.make_jaxpr(iter_fn_split)(
            theta_example[:4],
            theta_example[4:],
            zb,  # z_j
            zb,  # gt_j
            zb,  # sn_j
            zb,  # z_{j+1} (noise reconstructed from the trajectory)
            jax.ShapeDtypeStruct((), jnp.int32),  # j
            zb,  # g_zp
            zb,  # g_gt
            zb,  # g_sn
            jax.ShapeDtypeStruct((1, block), jnp.float32),  # c_row
        )
        apps_jaxpr = jax.make_jaxpr(apps_fn_split)(
            theta_example[4:], zb, jax.ShapeDtypeStruct((), jnp.int32)
        )
        final_jaxpr = jax.make_jaxpr(final_fn_split)(
            theta_example[4:], zb, zb, zb
        )
    elif carry_sn:
        iter_jaxpr = jax.make_jaxpr(iter_fn)(
            theta_example,
            zb,  # z_j
            zb,  # gt_j
            zb,  # sn_j
            zb,  # xi
            jax.ShapeDtypeStruct((), jnp.int32),  # j
            zb,  # g_zp
            zb,  # g_gt
            zb,  # g_sn
            jax.ShapeDtypeStruct((1, block), jnp.float32),  # c_row
        )
        apps_jaxpr = jax.make_jaxpr(apps_fn)(
            theta_example, zb, jax.ShapeDtypeStruct((), jnp.int32)
        )
        final_jaxpr = jax.make_jaxpr(final_fn)(
            theta_example, zb, zb, zb
        )
    if carry_sn:
        # Intern shared consts by identity (the jaxprs close over the same
        # target/net constant arrays; LGCP's 10 MB precision matrix must
        # enter the kernel once, not thrice).
        _interned, _ids = [], {}

        def _intern(c):
            k = id(c)
            if k not in _ids:
                _ids[k] = len(_interned)
                _interned.append(c)
            return _ids[k]

        iter_const_map = [_intern(c) for c in iter_jaxpr.consts]
        apps_const_map = [_intern(c) for c in apps_jaxpr.consts]
        final_const_map = [_intern(c) for c in final_jaxpr.consts]
        const_shapes, const_inputs = pack_consts(_interned)
    else:
        example = (
            theta_example,
            zb,  # z
            zb,  # xi
            jax.ShapeDtypeStruct((), jnp.int32),  # j
            zb,  # g_next
            jax.ShapeDtypeStruct((1, block), jnp.float32),  # c_row
        )
        point_jaxpr = jax.make_jaxpr(point_fn)(*example)
        const_shapes, const_inputs = pack_consts(point_jaxpr.consts)

    def kernel(*refs):
        idx = 0
        traj_ref = refs[idx]; idx += 1
        noise_ref = None
        if not recon:  # recon-mode split rebuilds xi from the trajectory
            noise_ref = refs[idx]; idx += 1
        c_ref = refs[idx]; idx += 1
        gzf_ref = refs[idx]; idx += 1
        zK_ref = None
        if recon:  # boundary state z_K for the first (topmost) time chunk
            zK_ref = refs[idx]; idx += 1
        theta_refs = refs[idx : idx + n_theta]; idx += n_theta
        const_refs = refs[idx : idx + len(const_inputs)]
        idx += len(const_inputs)
        out_theta_refs = refs[idx : idx + n_theta_out]; idx += n_theta_out
        gz0_ref = refs[idx]; idx += 1
        gsn_ref = gsn0_ref = None
        if split:
            gsn_ref = refs[idx]; idx += 1
            gsn0_ref = refs[idx]; idx += 1
        # Persistent VMEM scratch: the reverse-sweep carries, living across
        # the sequential time-chunk grid steps of one chain block.
        s_gz = refs[idx]; idx += 1
        s_ggt = s_gsn = s_zb = None
        if carry_sn:
            s_ggt = refs[idx]; idx += 1
            s_gsn = refs[idx]; idx += 1
        if recon:
            s_zb = refs[idx]; idx += 1

        pid = pl.program_id(0)
        pid_t = pl.program_id(1)
        # Chunk t sweeps global steps j in [lo, lo + t_block), descending;
        # the grid walks chunks from the trajectory's top (t=0 <-> highest
        # j) downward.
        lo = (nt - 1 - pid_t) * t_block

        all_consts = unpack_consts(const_shapes, const_refs)
        # Upcast bf16-stored weights ONCE; the f32 values are loop-invariant.
        theta_vals = tuple(r[:].astype(jnp.float32) for r in theta_refs)
        c_row = c_ref[0:1, :]

        # Parameter gradients accumulate IN the output refs (zeroed by the
        # first program; later programs revisit the same VMEM blocks on the
        # sequential TPU grid). Carrying the accumulator tuple as fori_loop
        # state instead multi-buffers it and blows scoped VMEM on large-dim
        # nets (LGCP: 143 MB of spill slots for ~32 MB of weight grads).
        @pl.when((pid == 0) & (pid_t == 0))
        def _zero_outputs():
            for o_ref in out_theta_refs:
                o_ref[:] = jnp.zeros(o_ref.shape, jnp.float32)

        # First chunk of each chain block: seed the carries — the state
        # cotangent from the final-state seed, application cotangents zero,
        # and (split) the boundary state z_K.
        @pl.when(pid_t == 0)
        def _init_carries():
            s_gz[:] = gzf_ref[:]
            if carry_sn:
                zero_b = jnp.zeros((dim_pad, block), jnp.float32)
                s_ggt[:] = zero_b
                s_gsn[:] = zero_b
            if recon:
                s_zb[:] = zK_ref[:]

        def _accumulate(g_theta):
            for o_ref, g in zip(out_theta_refs, g_theta):
                o_ref[:] = o_ref[:] + g

        if carry_sn:
            iter_consts = [all_consts[i] for i in iter_const_map]
            apps_consts = [all_consts[i] for i in apps_const_map]
            final_consts = [all_consts[i] for i in final_const_map]
            apps_args = theta_vals[4:] if split else theta_vals
            final_args = theta_vals[4:] if split else theta_vals
            if recon:
                # This chunk's upper-boundary state z_{lo + t_block} —
                # constant for the whole chunk (the previous chunk's lowest
                # trajectory row, or z_K for the first chunk).
                z_hi = s_zb[:]

            def body(t, carry):
                g_z, g_gt, g_sn = carry
                jl = t_block - 1 - t  # local trajectory-window row
                j = lo + jl  # global step index
                z_j = traj_ref[jl].astype(jnp.float32)
                gt_j, sn_j = jax.core.eval_jaxpr(
                    apps_jaxpr.jaxpr, apps_consts, *apps_args, z_j, j
                )
                if recon:
                    z_up = traj_ref[jnp.minimum(jl + 1, t_block - 1)]
                    stoch = jnp.where(jl == t_block - 1, z_hi, z_up)
                else:
                    stoch = noise_ref[jl].astype(jnp.float32)
                flat_in = list(theta_vals) + [
                    z_j, gt_j, sn_j, stoch, j,
                    g_z, g_gt, g_sn, c_row,
                ]
                out = jax.core.eval_jaxpr(
                    iter_jaxpr.jaxpr, iter_consts, *flat_in
                )
                _accumulate(out[:n_theta_out])
                if split:
                    # Total cotangent of the point-(j+1) net OUTPUT — the
                    # out-of-kernel weight-grad pass consumes the stack
                    # (shifted layout: point j+1's cotangent at row j, so
                    # every write stays inside this chunk's window).
                    gsn_ref[jl] = out[n_theta_out + 3].astype(
                        residual_dtype
                    )
                return (
                    out[n_theta_out],
                    out[n_theta_out + 1],
                    out[n_theta_out + 2],
                )

            g_z0, g_gt, g_sn = jax.lax.fori_loop(
                0, t_block, body, (s_gz[:], s_ggt[:], s_gsn[:])
            )
            s_gz[:] = g_z0
            s_ggt[:] = g_gt
            s_gsn[:] = g_sn
            if recon:
                s_zb[:] = traj_ref[0]  # next chunk's upper boundary

            @pl.when(pid_t == nt - 1)
            def _final_carry():
                # Last chunk covers j in [0, t_block): window row 0 is z_0.
                z_0 = traj_ref[0].astype(jnp.float32)
                if split:
                    gsn0_ref[:] = g_sn.astype(residual_dtype)
                    g_z0_apps = jax.core.eval_jaxpr(
                        final_jaxpr.jaxpr, final_consts,
                        *final_args, z_0, g_gt, g_sn,
                    )[0]
                    gz0_ref[:] = g_z0 + g_z0_apps
                else:
                    fin = jax.core.eval_jaxpr(
                        final_jaxpr.jaxpr, final_consts,
                        *final_args, z_0, g_gt, g_sn,
                    )
                    _accumulate(fin[:n_theta])
                    gz0_ref[:] = g_z0 + fin[n_theta]
        else:
            consts = all_consts

            def body(t, g_z):
                jl = t_block - 1 - t
                j = lo + jl
                z = traj_ref[jl]
                xi = noise_ref[jl]
                flat_in = list(theta_vals) + [z, xi, j, g_z, c_row]
                out = jax.core.eval_jaxpr(point_jaxpr.jaxpr, consts, *flat_in)
                _accumulate(out[:n_theta])
                return out[n_theta]

            g_z0 = jax.lax.fori_loop(0, t_block, body, s_gz[:])
            s_gz[:] = g_z0

            @pl.when(pid_t == nt - 1)
            def _final_point():
                gz0_ref[:] = g_z0

    # Time-windowed trajectory: chunk t covers global rows
    # [(nt-1-t)*t_block, ...+t_block) of the first nbridges rows; the final
    # row (z_K) never enters a window (split receives it separately).
    in_specs = [
        pl.BlockSpec(
            (t_block, dim_pad, block),
            lambda i, t: (nt - 1 - t, 0, i),
            memory_space=pltpu.VMEM,
        ),
    ]
    inputs = [traj_t]
    if not recon:  # recon-mode split rebuilds xi from the trajectory
        assert noise_t is not None
        in_specs.append(
            pl.BlockSpec(
                (t_block, dim_pad, block),
                lambda i, t: (nt - 1 - t, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(noise_t)
    in_specs += [
        pl.BlockSpec((8, block), lambda i, t: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (dim_pad, block), lambda i, t: (0, i), memory_space=pltpu.VMEM
        ),
    ]
    inputs += [cot_rows, gzf_t]
    if recon:
        in_specs.append(
            pl.BlockSpec(
                (dim_pad, block), lambda i, t: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(zK_t)
    for t in theta:
        in_specs.append(
            pl.BlockSpec(
                t.shape, lambda i, tt, nd=t.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(t)
    for c in const_inputs:
        in_specs.append(
            pl.BlockSpec(
                c.shape, lambda i, tt, nd=c.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(c)

    out_specs = [
        pl.BlockSpec(
            t.shape, lambda i, tt, nd=t.ndim: (0,) * nd,
            memory_space=pltpu.VMEM,
        )
        for t in theta[:n_theta_out]
    ]
    out_shape = [
        jax.ShapeDtypeStruct(t.shape, jnp.float32)
        for t in theta[:n_theta_out]
    ]
    out_specs.append(
        pl.BlockSpec(
            (dim_pad, block), lambda i, t: (0, i), memory_space=pltpu.VMEM
        )
    )
    out_shape.append(jax.ShapeDtypeStruct((dim_pad, n_pad), jnp.float32))
    if split:
        # Shifted net-output cotangent stack (row j <-> point j+1) + the
        # point-0 cotangent as its own small output.
        out_specs.append(
            pl.BlockSpec(
                (t_block, dim_pad, block),
                lambda i, t: (nt - 1 - t, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((nbridges, dim_pad, n_pad), residual_dtype)
        )
        out_specs.append(
            pl.BlockSpec(
                (dim_pad, block), lambda i, t: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((dim_pad, n_pad), residual_dtype)
        )

    scratch_shapes = [pltpu.VMEM((dim_pad, block), jnp.float32)]
    if carry_sn:
        scratch_shapes += [
            pltpu.VMEM((dim_pad, block), jnp.float32),
            pltpu.VMEM((dim_pad, block), jnp.float32),
        ]
    if recon:
        scratch_shapes.append(pltpu.VMEM((dim_pad, block), jnp.float32))

    # Split mode: the in-kernel f32 upcasts of the bf16-stored weights and
    # the z-path VJP temporaries live OUTSIDE the operand estimate — give
    # the scoped-limit check explicit headroom (it only raises the check,
    # never allocations; measured need on the 1600-D LGCP: 89.5 MB against
    # an 80.8 MB operand-derived limit).
    kwargs = vmem_limit_params(
        inputs, out_shape,
        extra_bytes=(48 * 1024 * 1024 if split else 0),
        interpret=interpret,
    )

    outs = pl.pallas_call(
        kernel,
        grid=(nchunks, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **kwargs,
    )(*inputs)

    g_eps, g_betas, g_mean, g_logdiag = outs[:4]
    grads = {
        "eps": g_eps[0, 0],
        "betas": g_betas[0],
        "vd_mean": g_mean[:dim, 0],
        "vd_logdiag": g_logdiag[:dim, 0],
    }

    if split:
        # Out-of-kernel weight gradients: one batched XLA vjp of the net
        # applied to every stored trajectory point, seeded with the
        # in-kernel per-point net-output cotangent stack. Exact f32; XLA
        # schedules the big weight-grad einsums through HBM freely.
        # (Reassemble the (nbridges+1)-point stack from the kernel's
        # shifted layout: row j of the shifted output is point j+1.)
        gsn_stack = jnp.concatenate(
            [outs[n_theta_out + 2][None], outs[n_theta_out + 1]], axis=0
        ).astype(jnp.float32)

        traj_full = (
            traj_t if n_traj == nbridges + 1
            else jnp.concatenate(
                [traj_t, zK_t[None].astype(residual_dtype)], axis=0
            )
        )

        def net_all(th_sn):
            def per_j(carry, inp):
                j, z_j = inp
                # bf16-stored trajectory points upcast per step (keeps the
                # HBM stream half-width; the net compute stays f32).
                return carry, sn_apply_f32(
                    th_sn, z_j.astype(jnp.float32), j
                )

            _, outs_ = jax.lax.scan(
                per_j, 0,
                (jnp.arange(nbridges + 1), traj_full),
            )
            return outs_

        (g_sn_theta,) = jax.vjp(net_all, sn_theta_f32)[1](gsn_stack)
        slots = list(g_sn_theta)
        if arch == "pis":
            from cmcd_tpu.ops.pallas_nets import pis_grads_unpack

            grads["sn"] = pis_grads_unpack(slots, 0, dim, n_state)
        elif arch == "pis_grad":
            from cmcd_tpu.ops.pallas_nets import pis_grad_grads_unpack

            grads["sn"] = pis_grad_grads_unpack(slots, 0, dim, n_tcg, n_state)
        else:
            from cmcd_tpu.ops.pallas_nets import geffner_grads_unpack

            grads["sn"] = geffner_grads_unpack(slots, 0, dim, n_layers)
        g_z0 = outs[n_theta_out][:dim, :n_chains].T
        return grads, g_z0

    def _unpack_net(base):
        g_factor, g_emb_t, g_head_w, g_head_b = outs[base : base + 4]
        g_ws = outs[base + 4 : base + 4 + n_layers]
        g_bs = outs[base + 4 + n_layers : base + 4 + 2 * n_layers]
        return {
            "layers": [
                {"w": w.T, "b": b[:, 0]} for w, b in zip(g_ws, g_bs)
            ],
            "head": {"w": g_head_w[:dim].T, "b": g_head_b[:dim, 0]},
            "emb": g_emb_t.T,
            "factor_sn": g_factor[0, 0],
        }

    if use_sn:
        if arch == "pis":
            from cmcd_tpu.ops.pallas_nets import pis_grads_unpack

            grads["sn"] = pis_grads_unpack(outs, 4, dim, n_state)
        elif arch == "pis_grad":
            from cmcd_tpu.ops.pallas_nets import pis_grad_grads_unpack

            grads["sn"] = pis_grad_grads_unpack(outs, 4, dim, n_tcg, n_state)
        else:
            grads["sn"] = _unpack_net(4)
    if spec.use_sn2_bwd:
        grads["sn2"] = _unpack_net(4 + n_sn)
    g_z0 = outs[n_theta][:dim, :n_chains].T
    return grads, g_z0


def evolve_kl_bwd_underdamped(
    ztraj_t,
    rtraj_t,
    noise_t,
    cot,
    g_zfinal,
    betas,
    eps,
    gamma,
    eta,
    vd_mean,
    vd_logdiag,
    grad_logp_t,
    spec: UnderdampedSpec,
    *,
    dim: int,
    nbridges: int,
    n_chains: int,
    sn_weights,
    sn_meta,
    block: int = 1024,
    time_block: int | None = None,
    rhoK_t=None,
    interpret: bool = False,
):
    """Reverse-sweep BPTT gradients for the underdamped (leapfrog) family.

    ztraj_t / rtraj_t: (nbridges + 1, dim_pad, n_pad) position / momentum
    trajectories; noise_t: (nbridges + 1, dim_pad, n_pad) draws (index 0 the
    initial momentum, i + 1 the step-i refresh) — the raw transposed
    outputs of evolve_underdamped_pallas(..., return_state_t=True).
    cot: (n_chains,) cotangent of the per-chain w_delta (which INCLUDES the
    endpoint momentum corrections, so the sweep seeds the momentum
    cotangent with c * (-rho_K) from the final +log N(rho_K; 0, I) term;
    the initial -log N(rho_0; 0, I) term's gradient dies into the noise).
    g_zfinal: (n_chains, dim) cotangent of the final position (target term,
    computed by XLA).

    time_block: TIME-CHUNKED sweep (like the overdamped evolve_kl_bwd_pallas)
    for big-K configs whose whole-(K+1) windows exceed VMEM. Expects the
    chunked forward's K-row layouts — ztraj/rtraj rows 0..K-1, noise rows
    xi_0..xi_{K-1} UNSHIFTED — plus the boundary momentum rhoK_t
    ((dim_pad, n_pad) raw) for the endpoint-correction seed. The grid gains
    a reverse-time dimension; state/momentum cotangents carry in VMEM
    scratch; parameter gradients accumulate in the output refs.

    Returns (grads dict {"eps","gamma","eta","betas","vd_mean",
    "vd_logdiag"[,"sn"]}, g_z0 (n_chains, dim)).
    """
    n_traj, dim_pad, n_pad = ztraj_t.shape
    if time_block is None or time_block >= nbridges:
        t_block = nbridges
        chunked = False
        assert n_traj == nbridges + 1
    else:
        chunked = True
        t_block = normalize_time_block(nbridges, time_block)
        assert n_traj == nbridges and rhoK_t is not None
    nt = nbridges // t_block if chunked else 1
    block = _round_up(block, LANE)
    if n_pad % block != 0:
        block = next(
            b for b in range(min(block, n_pad), 0, -LANE) if n_pad % b == 0
        )
    nchunks = n_pad // block

    use_sn = spec.fwd_sn or spec.bwd_sn != "none"
    if use_sn:
        emb_dim = sn_meta["emb_dim"]
        in_dim = sn_meta["in_dim"]
        sn_nbridges = sn_meta["nbridges"]
        full = sn_meta["full_sn"]

    cot_rows = jnp.zeros((8, n_pad), jnp.float32).at[0, :n_chains].set(cot)
    gzf_t = (
        jnp.zeros((dim_pad, n_pad), jnp.float32).at[:dim, :n_chains].set(
            g_zfinal.T
        )
    )
    mean_col = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_mean)
    logdiag_col = (
        jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_logdiag)
    )
    row_mask = (jnp.arange(dim_pad) < dim).astype(jnp.float32)[:, None]
    betas_row = jnp.asarray(betas, jnp.float32).reshape(1, nbridges)

    # CAIS underdamped hardcodes target clip 1e2, vd unclipped
    # (src/mcd_under_lp_a_cais.py:23-29); other modes are unclipped.
    clip_t = 1e2 if spec.cais else None

    if use_sn:
        layer_ws = [w_t for (w_t, _) in sn_weights["layers"]]
        layer_bs = [b_col for (_, b_col) in sn_weights["layers"]]
        head_w, head_b = sn_weights["head"]
        sn_theta = (
            jnp.asarray(sn_weights["factor_sn"], jnp.float32).reshape(1, 1),
            sn_weights["emb_t"],
            head_w,
            head_b,
            *layer_ws,
            *layer_bs,
        )
        n_layers = len(layer_ws)
    else:
        sn_theta = ()
        n_layers = 0

    theta = (
        jnp.asarray(eps, jnp.float32).reshape(1, 1),
        jnp.asarray(gamma, jnp.float32).reshape(1, 1),
        jnp.asarray(eta, jnp.float32).reshape(1, 1),
        betas_row,
        mean_col,
        logdiag_col,
        *sn_theta,
    )
    n_theta = len(theta)

    log_2pi = 1.8378770664093453

    def sn_apply(th, z, rho, i):
        factor_arr, emb_t, head_w, head_b = th[:4]
        ws = th[4 : 4 + n_layers]
        bs = th[4 + n_layers : 4 + 2 * n_layers]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (sn_nbridges, 1), 0)
            == jnp.clip(i, 0, sn_nbridges - 1)
        ).astype(jnp.float32)
        emb_col = jnp.dot(emb_t, onehot, preferred_element_type=jnp.float32)
        b_cols = z.shape[1]
        parts = [z[:dim]]
        if full and rho is not None:
            parts.append(rho[:dim])
        parts.append(jnp.broadcast_to(emb_col, (emb_dim, b_cols)))
        h = jnp.concatenate(parts, axis=0)
        if in_dim > h.shape[0]:
            h = jnp.concatenate(
                [h, jnp.zeros((in_dim - h.shape[0], b_cols), z.dtype)], axis=0
            )
        for w_t, b_col in zip(ws, bs):
            h = h + jax.nn.softplus(
                jnp.dot(w_t, h, preferred_element_type=jnp.float32) + b_col
            )
        return (
            jnp.dot(head_w, h, preferred_element_type=jnp.float32) + head_b
        ) * factor_arr[0, 0]

    def step_fn(theta, z, rho, xi, j):
        """(z_next, rho_next, delta) for bridge step j — the scan
        integrator's exact math (integrators/underdamped.py step), fully
        differentiable in (theta, z, rho)."""
        eps_arr, gamma_arr, eta_arr, betas_r, mean_c, logdiag_c = theta[:6]
        th_sn = theta[6:]
        eps0 = eps_arr[0, 0]
        gamma_v = gamma_arr[0, 0]
        eta_v = eta_arr[0, 0]

        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nbridges), 1)
        beta = jnp.sum(betas_r * (lane_idx == j).astype(jnp.float32))

        if spec.cais:
            fj = j.astype(jnp.float32)
            eps_i = (
                eps0
                * jnp.cos((fj / nbridges + 0.008) / 1.008 * 0.5 * jnp.pi) ** 2
            )
        else:
            eps_i = eps0

        def grad_u(zz):
            gt = grad_logp_t(zz)
            gq = -(zz - mean_c) * jnp.exp(-2.0 * logdiag_c)
            if clip_t is not None:
                gt = jnp.clip(gt, -clip_t, clip_t)
            return -(beta * gt + (1.0 - beta) * gq) * row_mask

        eta_aux = None
        if spec.refresh == "approx":
            eta_aux = gamma_v * eps_i
            fk_mean = rho * (1.0 - eta_aux)
            fwd_scale = jnp.sqrt(2.0 * eta_aux)
            bwd_scale = fwd_scale
        elif spec.refresh == "exact":
            fk_mean = eta_v * rho
            fwd_scale = jnp.sqrt(1.0 - eta_v**2)
            bwd_scale = fwd_scale
        else:  # exact_fwd: eta_aux from the UNSCHEDULED eps (reference)
            eta_aux = gamma_v * eps0
            eta_e = jnp.exp(-eta_aux)
            fk_mean = eta_e * rho
            fwd_scale = jnp.sqrt(1.0 - eta_e**2)
            bwd_scale = jnp.sqrt(2.0 * eta_aux)

        if spec.fwd_sn:
            fk_mean = fk_mean - 2.0 * eta_aux * sn_apply(th_sn, z, rho, j)

        rho_prime = fk_mean + fwd_scale * xi

        rho_pp = rho_prime - eps_i * grad_u(z) / 2.0
        z_next = z + eps_i * rho_pp
        rho_next = rho_pp - eps_i * grad_u(z_next) / 2.0

        if spec.refresh == "exact":
            bk_mean = eta_v * rho_prime
            gain = 2.0 * (1.0 - eta_v)
        else:
            bk_mean = rho_prime * (1.0 - eta_aux)
            gain = 2.0 * eta_aux
        if spec.bwd_sn == "state":
            bk_mean = bk_mean + gain * sn_apply(th_sn, z, None, j)
        elif spec.bwd_sn == "full":
            bk_mean = bk_mean + gain * sn_apply(th_sn, z, rho_prime, j)

        r_fk = (rho_prime - fk_mean) * row_mask
        r_bk = (rho - bk_mean) * row_mask
        fk_lp = -0.5 * jnp.sum(r_fk * r_fk, axis=0, keepdims=True) / (
            fwd_scale**2
        ) - dim * (0.5 * log_2pi + jnp.log(fwd_scale))
        bk_lp = -0.5 * jnp.sum(r_bk * r_bk, axis=0, keepdims=True) / (
            bwd_scale**2
        ) - dim * (0.5 * log_2pi + jnp.log(bwd_scale))
        return z_next, rho_next, bk_lp - fk_lp

    def point_fn(theta, z, rho, xi, j, g_zn, g_rn, c_row):
        _, vjp_fn = jax.vjp(
            lambda th, zz, rr: step_fn(th, zz, rr, xi, j), theta, z, rho
        )
        g_theta, g_z, g_rho = vjp_fn((g_zn, g_rn, c_row))
        return (*g_theta, g_z, g_rho)

    zb = jax.ShapeDtypeStruct((dim_pad, block), jnp.float32)
    example = (
        tuple(jax.ShapeDtypeStruct(t.shape, t.dtype) for t in theta),
        zb,  # z
        zb,  # rho
        zb,  # xi
        jax.ShapeDtypeStruct((), jnp.int32),  # j
        zb,  # g_zn
        zb,  # g_rn
        jax.ShapeDtypeStruct((1, block), jnp.float32),  # c_row
    )
    point_jaxpr = jax.make_jaxpr(point_fn)(*example)
    point_consts = point_jaxpr.consts

    const_shapes, const_inputs = pack_consts(point_consts)

    def kernel(*refs):
        idx = 0
        ztraj_ref = refs[idx]; idx += 1
        rtraj_ref = refs[idx]; idx += 1
        noise_ref = refs[idx]; idx += 1
        c_ref = refs[idx]; idx += 1
        gzf_ref = refs[idx]; idx += 1
        rhoK_ref = None
        if chunked:
            rhoK_ref = refs[idx]; idx += 1
        theta_refs = refs[idx : idx + n_theta]; idx += n_theta
        const_refs = refs[idx : idx + len(const_inputs)]
        idx += len(const_inputs)
        out_theta_refs = refs[idx : idx + n_theta]; idx += n_theta
        gz0_ref = refs[idx]; idx += 1
        s_gz = s_grho = None
        if chunked:
            # Reverse-sweep carries across the sequential time-chunk grid.
            s_gz = refs[idx]; idx += 1
            s_grho = refs[idx]; idx += 1

        pid = pl.program_id(0)
        pid_t = pl.program_id(1) if chunked else 0
        # Chunk t sweeps global steps j in [lo, lo + t_block), descending.
        lo = (nt - 1 - pid_t) * t_block

        consts = unpack_consts(const_shapes, const_refs)
        theta_vals = tuple(r[:] for r in theta_refs)
        c_row = c_ref[0:1, :]

        if chunked:
            # Parameter gradients accumulate IN the output refs (zeroed by
            # the first program; the sequential grid revisits the blocks).
            @pl.when((pid == 0) & (pid_t == 0))
            def _zero_outputs():
                for o_ref in out_theta_refs:
                    o_ref[:] = jnp.zeros(o_ref.shape, jnp.float32)

            # Momentum cotangent seeded by the endpoint correction
            # w += log N(rho_K; 0, I): d/d rho_K = -rho_K, times the
            # per-chain cotangent of w_delta.
            @pl.when(pid_t == 0)
            def _init_carries():
                s_gz[:] = gzf_ref[:]
                s_grho[:] = -rhoK_ref[:] * c_row

            def body(t, carry):
                g_z, g_rho = carry
                jl = t_block - 1 - t  # local window row
                j = lo + jl
                z = ztraj_ref[jl]
                rho = rtraj_ref[jl]
                xi = noise_ref[jl]  # chunked layout: row j holds xi_j
                flat_in = list(theta_vals) + [
                    z, rho, xi, j, g_z, g_rho, c_row
                ]
                out = jax.core.eval_jaxpr(point_jaxpr.jaxpr, consts, *flat_in)
                for o_ref, g in zip(out_theta_refs, out[:n_theta]):
                    o_ref[:] = o_ref[:] + g
                return (out[n_theta], out[n_theta + 1])

            g_z0, g_rho0 = jax.lax.fori_loop(
                0, t_block, body, (s_gz[:], s_grho[:])
            )
            s_gz[:] = g_z0
            s_grho[:] = g_rho0

            @pl.when(pid_t == nt - 1)
            def _final():
                gz0_ref[:] = g_z0
        else:
            def body(t, carry):
                g_z, g_rho, acc = carry
                j = nbridges - 1 - t
                z = ztraj_ref[j]
                rho = rtraj_ref[j]
                xi = noise_ref[j + 1]
                flat_in = list(theta_vals) + [z, rho, xi, j, g_z, g_rho, c_row]
                out = jax.core.eval_jaxpr(point_jaxpr.jaxpr, consts, *flat_in)
                g_theta = tuple(out[:n_theta])
                g_z, g_rho = out[n_theta], out[n_theta + 1]
                acc = tuple(a + g for a, g in zip(acc, g_theta))
                return (g_z, g_rho, acc)

            # Momentum cotangent seeded by the endpoint correction
            # w += log N(rho_K; 0, I): d/d rho_K = -rho_K, times the
            # per-chain cotangent of w_delta.
            g_rho_init = -rtraj_ref[nbridges] * c_row
            acc0 = tuple(jnp.zeros(t.shape, jnp.float32) for t in theta_vals)
            g_z0, _, acc = jax.lax.fori_loop(
                0, nbridges, body, (gzf_ref[:], g_rho_init, acc0)
            )
            gz0_ref[:] = g_z0

            for o_ref, g in zip(out_theta_refs, acc):
                @pl.when(pid == 0)
                def _init(o_ref=o_ref, g=g):
                    o_ref[:] = g

                @pl.when(pid != 0)
                def _acc(o_ref=o_ref, g=g):
                    o_ref[:] = o_ref[:] + g

    if chunked:
        traj_spec = pl.BlockSpec(
            (t_block, dim_pad, block),
            lambda i, t: (nt - 1 - t, 0, i),
            memory_space=pltpu.VMEM,
        )
    else:
        traj_spec = pl.BlockSpec(
            (nbridges + 1, dim_pad, block),
            lambda i, t=0: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
    in_specs = [
        traj_spec,
        traj_spec,
        traj_spec,
        pl.BlockSpec((8, block), lambda i, t=0: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (dim_pad, block), lambda i, t=0: (0, i), memory_space=pltpu.VMEM
        ),
    ]
    inputs = [ztraj_t, rtraj_t, noise_t, cot_rows, gzf_t]
    if chunked:
        in_specs.append(
            pl.BlockSpec(
                (dim_pad, block), lambda i, t: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(rhoK_t)
    for t in theta:
        in_specs.append(
            pl.BlockSpec(
                t.shape, lambda i, t=0, nd=t.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(t)
    for c in const_inputs:
        in_specs.append(
            pl.BlockSpec(
                c.shape, lambda i, t=0, nd=c.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(c)

    out_specs = [
        pl.BlockSpec(
            t.shape, lambda i, t=0, nd=t.ndim: (0,) * nd,
            memory_space=pltpu.VMEM,
        )
        for t in theta
    ]
    out_shape = [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta]
    out_specs.append(
        pl.BlockSpec(
            (dim_pad, block), lambda i, t=0: (0, i), memory_space=pltpu.VMEM
        )
    )
    out_shape.append(jax.ShapeDtypeStruct((dim_pad, n_pad), jnp.float32))
    scratch_shapes = []
    if chunked:
        scratch_shapes = [
            pltpu.VMEM((dim_pad, block), jnp.float32),  # g_z carry
            pltpu.VMEM((dim_pad, block), jnp.float32),  # g_rho carry
        ]

    kwargs = vmem_limit_params(inputs, out_shape, interpret=interpret)

    outs = pl.pallas_call(
        kernel,
        grid=(nchunks, nt) if chunked else (nchunks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **kwargs,
    )(*inputs)

    g_eps, g_gamma, g_eta, g_betas, g_mean, g_logdiag = outs[:6]
    grads = {
        "eps": g_eps[0, 0],
        "gamma": g_gamma[0, 0],
        "eta": g_eta[0, 0],
        "betas": g_betas[0],
        "vd_mean": g_mean[:dim, 0],
        "vd_logdiag": g_logdiag[:dim, 0],
    }
    if use_sn:
        (g_factor, g_emb_t, g_head_w, g_head_b) = outs[6:10]
        g_ws = outs[10 : 10 + n_layers]
        g_bs = outs[10 + n_layers : 10 + 2 * n_layers]
        grads["sn"] = {
            "layers": [
                {"w": w.T, "b": b[:, 0]} for w, b in zip(g_ws, g_bs)
            ],
            "head": {"w": g_head_w[:dim].T, "b": g_head_b[:dim, 0]},
            "emb": g_emb_t.T,
            "factor_sn": g_factor[0, 0],
        }
    g_z0 = outs[n_theta][:dim, :n_chains].T
    return grads, g_z0


def evolve_kl_bwd_uha(
    ztraj_t,
    rtraj_t,
    noise_t,
    cot,
    g_zfinal,
    betas,
    eps,
    eta,
    md_logscale,
    vd_mean,
    vd_logdiag,
    grad_logp_t,
    *,
    dim: int,
    nbridges: int,
    n_chains: int,
    lfsteps: int = 1,
    block: int = 1024,
    time_block: int | None = None,
    interpret: bool = False,
):
    """Reverse-sweep BPTT gradients for UHA (integrators/uha.py).

    ztraj_t / rtraj_t / noise_t: (nbridges + 1, dim_pad, n_pad) raw
    transposed outputs of evolve_uha_pallas(..., return_state_t=True)
    (noise index 0 is the initial momentum BASE draw xi_0; rho_0 =
    e^{md} * xi_0 is THETA-dependent, so after the sweep the md gradient
    picks up sum_n g_rho0 * rho_0 per dimension).
    cot: (n_chains,) cotangent of w_delta; g_zfinal: (n_chains, dim)
    cotangent of the final position.

    time_block: TIME-CHUNKED sweep (like the underdamped one) for big-K
    configs whose whole-(K+1) windows exceed VMEM. Expects the chunked
    forward's K-row layouts — ztraj/rtraj rows 0..K-1, noise row j the
    bridge-j refresh draw UNSHIFTED. The md correction still reads rho_0
    from rtraj row 0, which lives in the final (earliest-time) chunk; no
    boundary inputs are needed (UHA has no endpoint momentum correction,
    so the momentum cotangent seeds at zero).

    Returns (grads {"eps","eta","md","betas","vd_mean","vd_logdiag"},
    g_z0 (n_chains, dim)).
    """
    n_traj, dim_pad, n_pad = ztraj_t.shape
    if time_block is None or time_block >= nbridges:
        t_block = nbridges
        chunked = False
        assert n_traj == nbridges + 1
    else:
        chunked = True
        t_block = normalize_time_block(nbridges, time_block)
        assert n_traj == nbridges
    nt = nbridges // t_block if chunked else 1
    block = _round_up(block, LANE)
    if n_pad % block != 0:
        block = next(
            b for b in range(min(block, n_pad), 0, -LANE) if n_pad % b == 0
        )
    nchunks = n_pad // block

    cot_rows = jnp.zeros((8, n_pad), jnp.float32).at[0, :n_chains].set(cot)
    gzf_t = (
        jnp.zeros((dim_pad, n_pad), jnp.float32).at[:dim, :n_chains].set(
            g_zfinal.T
        )
    )
    mean_col = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_mean)
    logdiag_col = (
        jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_logdiag)
    )
    md_col = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(md_logscale)
    row_mask = (jnp.arange(dim_pad) < dim).astype(jnp.float32)[:, None]
    betas_row = jnp.asarray(betas, jnp.float32).reshape(1, nbridges)

    theta = (
        jnp.asarray(eps, jnp.float32).reshape(1, 1),
        jnp.asarray(eta, jnp.float32).reshape(1, 1),
        md_col,
        betas_row,
        mean_col,
        logdiag_col,
    )
    n_theta = len(theta)

    def step_fn(theta, z, rho_prev, xi, j):
        """(z_new, rho_new, delta) for bridge j — the scan integrator's
        exact math (integrators/uha.py step), differentiable in
        (theta, z, rho_prev)."""
        eps_arr, eta_arr, md_c, betas_r, mean_c, logdiag_c = theta
        eps0 = eps_arr[0, 0]
        eta0 = eta_arr[0, 0]
        inv_var_md = jnp.exp(-2.0 * md_c)
        exp_md = jnp.exp(md_c)

        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nbridges), 1)
        beta = jnp.sum(betas_r * (lane_idx == j).astype(jnp.float32))

        def grad_u(zz):
            gt = grad_logp_t(zz)
            gq = -(zz - mean_c) * jnp.exp(-2.0 * logdiag_c)
            return -(beta * gt + (1.0 - beta) * gq) * row_mask

        def momentum_quad(r):
            return jnp.sum(
                r * r * inv_var_md * row_mask, axis=0, keepdims=True
            )

        rho = eta0 * rho_prev + jnp.sqrt(1.0 - eta0**2) * (exp_md * xi)

        rho_l = rho - eps0 * grad_u(z) / 2.0
        z_l = z + eps0 * (rho_l * inv_var_md)
        for _ in range(lfsteps - 1):
            rho_l = rho_l - eps0 * grad_u(z_l)
            z_l = z_l + eps0 * (rho_l * inv_var_md)
        rho_new = rho_l - eps0 * grad_u(z_l) / 2.0

        delta = -0.5 * (momentum_quad(rho_new) - momentum_quad(rho))
        return z_l, rho_new, delta

    def point_fn(theta, z, rho_prev, xi, j, g_zn, g_rn, c_row):
        _, vjp_fn = jax.vjp(
            lambda th, zz, rr: step_fn(th, zz, rr, xi, j), theta, z, rho_prev
        )
        g_theta, g_z, g_rho = vjp_fn((g_zn, g_rn, c_row))
        return (*g_theta, g_z, g_rho)

    zb = jax.ShapeDtypeStruct((dim_pad, block), jnp.float32)
    example = (
        tuple(jax.ShapeDtypeStruct(t.shape, t.dtype) for t in theta),
        zb, zb, zb,
        jax.ShapeDtypeStruct((), jnp.int32),
        zb, zb,
        jax.ShapeDtypeStruct((1, block), jnp.float32),
    )
    point_jaxpr = jax.make_jaxpr(point_fn)(*example)
    point_consts = point_jaxpr.consts

    const_shapes, const_inputs = pack_consts(point_consts)

    def kernel(*refs):
        idx = 0
        ztraj_ref = refs[idx]; idx += 1
        rtraj_ref = refs[idx]; idx += 1
        noise_ref = refs[idx]; idx += 1
        c_ref = refs[idx]; idx += 1
        gzf_ref = refs[idx]; idx += 1
        theta_refs = refs[idx : idx + n_theta]; idx += n_theta
        const_refs = refs[idx : idx + len(const_inputs)]
        idx += len(const_inputs)
        out_theta_refs = refs[idx : idx + n_theta]; idx += n_theta
        gz0_ref = refs[idx]; idx += 1
        s_gz = s_grho = None
        if chunked:
            # Reverse-sweep carries across the sequential time-chunk grid.
            s_gz = refs[idx]; idx += 1
            s_grho = refs[idx]; idx += 1

        pid = pl.program_id(0)
        pid_t = pl.program_id(1) if chunked else 0
        # Chunk t sweeps global bridges j in [lo, lo + t_block), descending.
        lo = (nt - 1 - pid_t) * t_block

        consts = unpack_consts(const_shapes, const_refs)
        theta_vals = tuple(r[:] for r in theta_refs)
        c_row = c_ref[0:1, :]

        if chunked:
            # Parameter gradients accumulate IN the output refs (zeroed by
            # the first program; the sequential grid revisits the blocks).
            @pl.when((pid == 0) & (pid_t == 0))
            def _zero_outputs():
                for o_ref in out_theta_refs:
                    o_ref[:] = jnp.zeros(o_ref.shape, jnp.float32)

            # UHA has no endpoint momentum correction: the momentum
            # cotangent seeds at zero.
            @pl.when(pid_t == 0)
            def _init_carries():
                s_gz[:] = gzf_ref[:]
                s_grho[:] = jnp.zeros((dim_pad, block), jnp.float32)

            def body(t, carry):
                g_z, g_rho = carry
                jl = t_block - 1 - t  # local window row
                j = lo + jl
                z = ztraj_ref[jl]
                rho_prev = rtraj_ref[jl]
                xi = noise_ref[jl]  # chunked layout: row j holds xi_j
                flat_in = list(theta_vals) + [
                    z, rho_prev, xi, j, g_z, g_rho, c_row
                ]
                out = jax.core.eval_jaxpr(point_jaxpr.jaxpr, consts, *flat_in)
                for o_ref, g in zip(out_theta_refs, out[:n_theta]):
                    o_ref[:] = o_ref[:] + g
                return (out[n_theta], out[n_theta + 1])

            g_z0, g_rho0 = jax.lax.fori_loop(
                0, t_block, body, (s_gz[:], s_grho[:])
            )
            s_gz[:] = g_z0
            s_grho[:] = g_rho0

            @pl.when(pid_t == nt - 1)
            def _final():
                gz0_ref[:] = g_z0
                # rho_0 = e^{md} * xi_0 is theta-dependent: d rho_0 / d md
                # = rho_0 elementwise, so the md gradient picks up
                # sum_n g_rho0 * rho_0 (rtraj row 0 of this earliest-time
                # window IS rho_0).
                md_ref = out_theta_refs[2]
                md_ref[:] = md_ref[:] + jnp.sum(
                    g_rho0 * rtraj_ref[0], axis=1, keepdims=True
                )
        else:
            def body(t, carry):
                g_z, g_rho, acc = carry
                j = nbridges - 1 - t
                z = ztraj_ref[j]
                rho_prev = rtraj_ref[j]
                xi = noise_ref[j + 1]
                flat_in = list(theta_vals) + [
                    z, rho_prev, xi, j, g_z, g_rho, c_row
                ]
                out = jax.core.eval_jaxpr(point_jaxpr.jaxpr, consts, *flat_in)
                g_theta = tuple(out[:n_theta])
                g_z, g_rho = out[n_theta], out[n_theta + 1]
                acc = tuple(a + g for a, g in zip(acc, g_theta))
                return (g_z, g_rho, acc)

            # UHA has no endpoint momentum corrections: the final momentum
            # cotangent starts at zero.
            acc0 = tuple(jnp.zeros(t.shape, jnp.float32) for t in theta_vals)
            g_z0, g_rho0, acc = jax.lax.fori_loop(
                0, nbridges, body,
                (gzf_ref[:], jnp.zeros((dim_pad, block), jnp.float32), acc0),
            )
            gz0_ref[:] = g_z0

            # rho_0 = e^{md} * xi_0 is theta-dependent: d rho_0 / d md =
            # rho_0 elementwise, so the md gradient picks up
            # sum_n g_rho0 * rho_0.
            acc = list(acc)
            acc[2] = acc[2] + jnp.sum(
                g_rho0 * rtraj_ref[0], axis=1, keepdims=True
            )

            first = pid == 0
            for o_ref, g in zip(out_theta_refs, acc):
                @pl.when(first)
                def _init(o_ref=o_ref, g=g):
                    o_ref[:] = g

                @pl.when(jnp.logical_not(first))
                def _acc(o_ref=o_ref, g=g):
                    o_ref[:] = o_ref[:] + g

    if chunked:
        traj_spec = pl.BlockSpec(
            (t_block, dim_pad, block),
            lambda i, t: (nt - 1 - t, 0, i),
            memory_space=pltpu.VMEM,
        )
    else:
        traj_spec = pl.BlockSpec(
            (nbridges + 1, dim_pad, block),
            lambda i, t=0: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
    in_specs = [
        traj_spec,
        traj_spec,
        traj_spec,
        pl.BlockSpec((8, block), lambda i, t=0: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (dim_pad, block), lambda i, t=0: (0, i), memory_space=pltpu.VMEM
        ),
    ]
    inputs = [ztraj_t, rtraj_t, noise_t, cot_rows, gzf_t]
    for t in theta:
        in_specs.append(
            pl.BlockSpec(
                t.shape, lambda i, t=0, nd=t.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(t)
    for c in const_inputs:
        in_specs.append(
            pl.BlockSpec(
                c.shape, lambda i, t=0, nd=c.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(c)

    out_specs = [
        pl.BlockSpec(
            t.shape, lambda i, t=0, nd=t.ndim: (0,) * nd,
            memory_space=pltpu.VMEM,
        )
        for t in theta
    ]
    out_shape = [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta]
    out_specs.append(
        pl.BlockSpec(
            (dim_pad, block), lambda i, t=0: (0, i), memory_space=pltpu.VMEM
        )
    )
    out_shape.append(jax.ShapeDtypeStruct((dim_pad, n_pad), jnp.float32))
    scratch_shapes = []
    if chunked:
        scratch_shapes = [
            pltpu.VMEM((dim_pad, block), jnp.float32),  # g_z carry
            pltpu.VMEM((dim_pad, block), jnp.float32),  # g_rho carry
        ]

    kwargs = vmem_limit_params(inputs, out_shape, interpret=interpret)

    outs = pl.pallas_call(
        kernel,
        grid=(nchunks, nt) if chunked else (nchunks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **kwargs,
    )(*inputs)

    g_eps, g_eta, g_md, g_betas, g_mean, g_logdiag = outs[:6]
    grads = {
        "eps": g_eps[0, 0],
        "eta": g_eta[0, 0],
        "md": g_md[:dim, 0],
        "betas": g_betas[0],
        "vd_mean": g_mean[:dim, 0],
        "vd_logdiag": g_logdiag[:dim, 0],
    }
    g_z0 = outs[n_theta][:dim, :n_chains].T
    return grads, g_z0
