"""Fused Pallas backward kernels for VarGrad (MCD_CAIS_var_sn) training.

The VarGrad loss stop-gradients the chain state at every step (reference
src/mcd_cais_var.py:59,79), so the parameter gradient decomposes into
per-step terms evaluated at the fixed trajectory — no backprop-through-time.
Round 1 exploited this with an XLA "trajectory replay" whose batched
gradient pass was the profiled bottleneck (~12 ms of a 17 ms step at
N=2000, K=256; removed round 2). Two kernels replace it (selected by
ops/fused_train._make_evolve):

- evolve_vargrad_bwd_replay (default): the forward kernel stores the raw
  transposed trajectory; this kernel streams it back as an embarrassingly
  parallel (trajectory-window, chain-block) grid — no PRNG, no sequential
  dependency. XLA keeps the ~17 MB flagship-size trajectory on-chip
  between the kernels (the forward raises its scoped-VMEM limit).

- evolve_vargrad_bwd_pallas ("reroll"): stores NOTHING — re-generates the
  identical trajectory from the same in-kernel PRNG seed (or the same
  injected noise) step by step. For sizes where the trajectory residual
  would be prohibitive.

Both are POINT-centric, exploiting the CAIS structure (bwd_sn_offset == 1):
the forward kernel of step j and the backward kernel of step j-1 both
evaluate the score net at the SAME (z_j, j) (reference src/mcd_cais.py:61,78
— net queried at i and i+1), so each trajectory point needs exactly ONE
net application and ONE net VJP:

      L_j(theta) = sum_n c_n * [ 1{j<K} fk_lp_j  -  1{j>0} bk_lp_{j-1} ]_n

where fk_lp_j = log N(z_{j+1}; fk_mean(z_j; theta), s_j) and
bk_lp_{j-1} = log N(z_{j-1}; bk_mean(z_j; theta), s_{j-1}) — both means
are functions of the single point z_j. Summing dL_j/dtheta over j = 0..K
gives the exact gradient of  sum_n c_n * sum_i (fk_lp_i - bk_lp_i).

The per-point gradient function is produced by jax.grad at TRACE time
(closure-converted like the forward kernel), so eps schedules, grad
clipping masks, the annealing-beta selection, and the score-net backward
all come from autodiff of the exact step math — no hand-derived formulas
to drift out of sync with integrators/overdamped.py.

c_n is the per-chain cotangent of the summed log-weight increments (for the
VarGrad loss XLA's autodiff of var(.) supplies it), passed in from the
custom_vjp wrapper in ops/fused_train.py.

Exactness is tested against jax.grad of the scan-based var_bound under
injected noise (tests/test_pallas_vargrad.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmcd_tpu.integrators.overdamped import OverdampedSpec
from cmcd_tpu.ops.kernel_common import pack_consts, unpack_consts
from cmcd_tpu.ops.pallas_overdamped import (
    LANE,
    _box_muller,
    _round_up,
)


def evolve_vargrad_bwd_replay(
    traj_t,
    cot,
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
    eps_schedule: str = "",
    grad_clipping: bool = False,
    block: int = 1024,
    points_per_program: int = 1,
    net_compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Batched-replay VarGrad backward: gradients from a STORED trajectory.

    The re-rolling backward kernel (evolve_vargrad_bwd_pallas) is
    throughput-bound on per-column VPU work, and half of that work is the
    primal rollout itself (box_muller noise, the z_{j+1} update chain, the
    carried target score). Since the VarGrad gradient is a sum of
    independent per-point terms (stop-gradient at every step), storing the
    forward kernel's trajectory in HBM (~(K+1) * dim_pad * N * 4 bytes —
    ~17 MB for the flagship recipe, trivial HBM traffic) turns the backward
    into an embarrassingly parallel grid over (trajectory windows, chain
    block): each program streams overlapping windows of
    `points_per_program` stored states from HBM, runs ONE score-net
    application + VJP per point, and accumulates the parameter gradients
    in VMEM. No PRNG, no sequential dependency, no noise plumbing.
    The multi-point window loop is statically unrolled (no fori_loop select
    overhead). Measured on v5e at the flagship size (RESULTS.md round-4 ppp
    ladder, re-run post-unroll): points_per_program=2 with whole-batch
    backward chain blocks is the optimum (3.554 vs 3.623 ms/step at ppp=1;
    ppp=4 ties, ppp=8 regresses on VMEM pressure). fused_train defaults to
    ppp=2 when the backward block is widened to the whole batch and falls
    back to ppp=1 for narrow-block configurations where per-window
    streaming would triple the block traffic.

    traj_t: (nbridges + 1, dim_pad, n_pad) raw transposed trajectory from
    evolve_overdamped_pallas(..., return_trajectory_t=True).
    cot: (n_chains,) cotangent of the per-chain summed log-weight deltas.

    Point j's loss term (CAIS structure, net queried once per point —
    reference src/mcd_cais.py:61,78):
        L_j = sum_n c_n * [ 1{j>=1} bk_lp_{j-1} - 1{j<=K-1} fk_lp_j ]_n
    with fk_lp_j = log N(z_{j+1}; fk_mean(z_j; theta), s_j) and
    bk_lp_{j-1} = log N(z_{j-1}; bk_mean(z_j; theta), s_{j-1}); z_* are
    data (VarGrad stop-gradient semantics), only theta carries gradients.

    Returns the same gradient dict as evolve_vargrad_bwd_pallas.
    """
    assert spec.fwd_sn and spec.bwd_sn and spec.bwd_sn_offset == 1, (
        "the point-centric backward requires the CAIS kernel structure"
    )
    n_traj, dim_pad, n_pad = traj_t.shape
    assert n_traj == nbridges + 1
    block = _round_up(block, LANE)
    if n_pad % block != 0:
        # The forward may have used a different chain-block width; fall back
        # to the largest LANE multiple dividing n_pad.
        block = next(
            b for b in range(min(block, n_pad), 0, -LANE) if n_pad % b == 0
        )
    nchunks = n_pad // block

    # Padded chains must not contribute gradients: zero cotangent.
    cot_rows = jnp.zeros((8, n_pad), jnp.float32).at[0, :n_chains].set(cot)
    mean_col = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_mean)
    logdiag_col = (
        jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_logdiag)
    )
    row_mask = (jnp.arange(dim_pad) < dim).astype(jnp.float32)[:, None]
    betas_row = jnp.asarray(betas, jnp.float32).reshape(1, nbridges)

    clip_t = spec.clip_target if grad_clipping else None
    clip_q = spec.clip_vd if grad_clipping else None

    from cmcd_tpu.ops.pallas_nets import make_kernel_net

    arch = sn_meta.get("arch", "geffner")
    sn_theta, sn_apply, sn_unpack = make_kernel_net(
        arch, sn_weights, sn_meta, dim, grad_logp_t=grad_logp_t,
        row_mask=row_mask, compute_dtype=net_compute_dtype,
    )
    theta = (
        jnp.asarray(eps, jnp.float32).reshape(1, 1),
        betas_row,
        mean_col,
        logdiag_col,
        *sn_theta,
    )

    def eps_at(eps0, fj):
        if eps_schedule == "cos_sq":
            phase = fj / nbridges
            return eps0 * jnp.cos((phase + 0.008) / 1.008 * 0.5 * jnp.pi) ** 2
        if eps_schedule == "linear":
            return (1e-4 - eps0) / (nbridges - 1) * fj + eps0
        return eps0

    log_2pi = 1.8378770664093453

    def point_fn(theta, z_prev, z, z_next, j, c_row):
        """Loss contribution of trajectory point z_j. All z_* are data;
        only theta carries gradients. The target score at z_j has no theta
        dependence, so autodiff skips its transpose entirely."""
        eps_arr, betas_r, mean_c, logdiag_c = theta[:4]
        th_sn = theta[4:]
        eps0 = eps_arr[0, 0]

        fj = j.astype(jnp.float32)
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nbridges), 1)
        onehot_j = (lane_idx == j).astype(jnp.float32)
        onehot_p = (lane_idx == j - 1).astype(jnp.float32)
        beta_j = jnp.sum(betas_r * onehot_j)
        beta_p = jnp.sum(betas_r * onehot_p)

        # ONE net application at (z_j, j) — serves the forward kernel of
        # step j AND the backward kernel of step j-1 (CAIS offset-1).
        sn_out = sn_apply(th_sn, z, j)

        gt = grad_logp_t(z)
        gq = -(z - mean_c) * jnp.exp(-2.0 * logdiag_c)
        gt_c = jnp.clip(gt, -clip_t, clip_t) if clip_t is not None else gt
        gq_c = jnp.clip(gq, -clip_q, clip_q) if clip_q is not None else gq

        def drift(beta):
            return (beta * gt_c + (1.0 - beta) * gq_c) * row_mask

        # Forward kernel of step j, evaluated at the stored z_{j+1}.
        eps_j = eps_at(eps0, fj)
        # Floor: masked out-of-range steps can land on s2 <= 0 (cos_sq
        # hits ~0 at j = K; linear extrapolates negative) — 0 * inf = NaN
        # would poison the masked gradient. Live steps have eps >= 1e-7.
        s2_j = jnp.maximum(2.0 * eps_j, 1e-30)
        fk_mean = z + eps_j * drift(beta_j) - eps_j * sn_out
        r_fk = (z_next - fk_mean) * row_mask
        fk_lp = (
            -0.5 * jnp.sum(r_fk * r_fk, axis=0, keepdims=True) / s2_j
            - 0.5 * dim * (jnp.log(s2_j) + log_2pi)
        )

        # Backward kernel of step j-1: mean at z_j, evaluated at z_{j-1}.
        eps_p = eps_at(eps0, fj - 1.0)
        s2_p = jnp.maximum(2.0 * eps_p, 1e-30)
        bk_mean = z + eps_p * drift(beta_p) + eps_p * sn_out
        r_bk = (z_prev - bk_mean) * row_mask
        bk_lp = (
            -0.5 * jnp.sum(r_bk * r_bk, axis=0, keepdims=True) / s2_p
            - 0.5 * dim * (jnp.log(s2_p) + log_2pi)
        )

        # j can overshoot nbridges when the window grid over-covers K+1
        # points; both terms mask to zero there.
        m_fk = (j <= nbridges - 1).astype(jnp.float32)
        m_bk = jnp.logical_and(j >= 1, j <= nbridges).astype(jnp.float32)
        return jnp.sum(c_row * (m_bk * bk_lp - m_fk * fk_lp))

    grad_fn = jax.grad(point_fn, argnums=0)

    example_theta = tuple(jax.ShapeDtypeStruct(t.shape, t.dtype) for t in theta)
    zb = jax.ShapeDtypeStruct((dim_pad, block), jnp.float32)
    example = (
        example_theta,
        zb,  # z_prev
        zb,  # z
        zb,  # z_next
        jax.ShapeDtypeStruct((), jnp.int32),  # j
        jax.ShapeDtypeStruct((1, block), jnp.float32),  # c_row
    )
    point_jaxpr = jax.make_jaxpr(grad_fn)(*example)
    point_consts = point_jaxpr.consts

    const_shapes, const_inputs = pack_consts(point_consts)
    n_theta = len(theta)

    # Window tiling: program (w, c) handles trajectory points
    # j = w*jsz .. w*jsz + jsz - 1 for chain chunk c. Each point needs
    # (z_{j-1}, z_j, z_{j+1}), so the program reads the three jsz-row windows
    # w-1, w, w+1 (clamped; over-read rows are masked out in point_fn).
    npts = nbridges + 1
    jsz = max(1, min(points_per_program, npts))
    n_windows = (npts + jsz - 1) // jsz

    def kernel(*refs):
        idx = 0
        wm_ref = refs[idx]; idx += 1   # window w-1
        wc_ref = refs[idx]; idx += 1   # window w
        wp_ref = refs[idx]; idx += 1   # window w+1
        c_ref = refs[idx]; idx += 1
        theta_refs = refs[idx : idx + n_theta]; idx += n_theta
        const_refs = refs[idx : idx + len(const_inputs)]
        idx += len(const_inputs)
        out_refs = refs[idx : idx + n_theta]; idx += n_theta

        w_id = pl.program_id(0)
        c_id = pl.program_id(1)

        consts = unpack_consts(const_shapes, const_refs)
        theta_vals = tuple(r[:] for r in theta_refs)
        c_row = c_ref[0:1, :]
        # Mosaic lowers dynamic indexing on REFS, not values: neighbors at
        # the window edges come from the adjacent window refs via selects.
        zm_last = wm_ref[jsz - 1]
        zp_first = wp_ref[0]

        # Static unroll: jsz is a Python int, so the window-ref indices and
        # the window-edge neighbor choices resolve at trace time — no
        # fori_loop bookkeeping, no dynamic-index selects (the overhead
        # that made jsz=8 lose its prologue saving pre-widening).
        acc = tuple(jnp.zeros(t.shape, jnp.float32) for t in theta_vals)
        for t in range(jsz):
            j = w_id * jsz + t
            z = wc_ref[t]
            z_prev = zm_last if t == 0 else wc_ref[t - 1]
            z_next = zp_first if t == jsz - 1 else wc_ref[t + 1]
            # Reads past the stored K+1 points hit Pallas's block padding
            # (NaN in interpret mode, arbitrary on hardware). The loss masks
            # those terms to zero, but 0 * NaN = NaN in the GRADIENT — so
            # zero every input exactly where its term is masked.
            z = jnp.where(j <= nbridges, z, jnp.zeros_like(z))
            z_prev = jnp.where(
                jnp.logical_and(j >= 1, j <= nbridges),
                z_prev,
                jnp.zeros_like(z_prev),
            )
            z_next = jnp.where(
                j <= nbridges - 1, z_next, jnp.zeros_like(z_next)
            )
            flat_in = list(theta_vals) + [z_prev, z, z_next, j, c_row]
            g = jax.core.eval_jaxpr(point_jaxpr.jaxpr, consts, *flat_in)
            acc = tuple(a + gi for a, gi in zip(acc, g))

        first = jnp.logical_and(w_id == 0, c_id == 0)
        for o_ref, g in zip(out_refs, acc):
            @pl.when(first)
            def _init(o_ref=o_ref, g=g):
                o_ref[:] = g

            @pl.when(jnp.logical_not(first))
            def _acc(o_ref=o_ref, g=g):
                o_ref[:] = o_ref[:] + g

    wblock = (jsz, dim_pad, block)
    in_specs = [
        pl.BlockSpec(
            wblock,
            lambda w, c: (jnp.maximum(w - 1, 0), 0, c),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(wblock, lambda w, c: (w, 0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            wblock,
            lambda w, c: (jnp.minimum(w + 1, n_windows - 1), 0, c),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((8, block), lambda w, c: (0, c), memory_space=pltpu.VMEM),
    ]
    inputs = [traj_t, traj_t, traj_t, cot_rows]
    for t in theta:
        in_specs.append(
            pl.BlockSpec(
                t.shape, lambda w, c, nd=t.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(t)
    for c in const_inputs:
        in_specs.append(
            pl.BlockSpec(
                c.shape, lambda w, ci, nd=c.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(c)

    out_specs = [
        pl.BlockSpec(
            t.shape, lambda w, c, nd=t.ndim: (0,) * nd,
            memory_space=pltpu.VMEM,
        )
        for t in theta
    ]
    out_shape = [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta]

    # The unrolled multi-point body's VJP temporaries exceed the compiler's
    # ~17 MB scoped-VMEM default at jsz >= 4 (measured: 20.1 MB at jsz=4,
    # flagship size); size the limit like every other kernel here.
    from cmcd_tpu.ops.kernel_common import vmem_limit_params

    kwargs = vmem_limit_params(inputs, out_shape, interpret=interpret)
    outs = pl.pallas_call(
        kernel,
        grid=(n_windows, nchunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(*inputs)

    g_eps, g_betas, g_mean, g_logdiag = outs[:4]
    return {
        "eps": g_eps[0, 0],
        "betas": g_betas[0],
        "vd_mean": g_mean[:dim, 0],
        "vd_logdiag": g_logdiag[:dim, 0],
        "sn": sn_unpack(outs, 4),
    }


def evolve_vargrad_bwd_pallas(
    z0,
    cot,
    betas,
    eps,
    vd_mean,
    vd_logdiag,
    grad_logp_t: Callable,
    spec: OverdampedSpec,
    *,
    dim: int,
    nbridges: int,
    sn_weights,
    sn_meta,
    eps_schedule: str = "",
    grad_clipping: bool = False,
    seed=0,
    block: int = 512,
    noise: Optional[jnp.ndarray] = None,
    interpret: bool = False,
):
    """Gradient of sum_n cot_n * sum_i (bk_lp - fk_lp)_in w.r.t.
    (eps, betas, vd_mean, vd_logdiag, sn weights), with the trajectory
    re-rolled in-kernel from (z0, seed) [or `noise`].

    NOTE the sign: this is the gradient of the summed log-weight DELTAS (the
    quantity the forward kernel adds to w), so a caller differentiating
    neg_elbos = -(w0 + deltas + ...) passes cot = d loss / d deltas directly.

    Returns a dict of gradients: {"eps", "betas" (nbridges,), "vd_mean",
    "vd_logdiag", "sn": {"layers": [{"w","b"},...], "head": {"w","b"},
    "emb", "factor_sn"}} — sn entries in the ORIGINAL (untransposed)
    geffner layout, ready to add into the parameter pytree.
    """
    assert spec.fwd_sn and spec.bwd_sn and spec.bwd_sn_offset == 1, (
        "the point-centric backward kernel requires the CAIS kernel "
        "structure (net at i and i+1)"
    )
    n, d = z0.shape
    assert d == dim
    dim_pad = max(8, _round_up(dim, 8))
    block = _round_up(block, LANE)
    n_pad = _round_up(n, block)
    nblocks = n_pad // block

    # ---- host-side packing (identical layout to the forward kernel) -----
    z0_t = jnp.zeros((dim_pad, n_pad), jnp.float32).at[:dim, :n].set(z0.T)
    # Padded chains must not contribute gradients: zero cotangent.
    cot_rows = jnp.zeros((8, n_pad), jnp.float32).at[0, :n].set(cot)
    mean_col = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_mean)
    logdiag_col = (
        jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_logdiag)
    )
    row_mask = (jnp.arange(dim_pad) < dim).astype(jnp.float32)[:, None]
    betas_row = jnp.asarray(betas, jnp.float32).reshape(1, nbridges)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    inject_noise = noise is not None
    if inject_noise:
        noise_t = (
            jnp.zeros((nbridges, dim_pad, n_pad), jnp.float32)
            .at[:, :dim, :n]
            .set(jnp.swapaxes(noise, 1, 2))
        )

    clip_t = spec.clip_target if grad_clipping else None
    clip_q = spec.clip_vd if grad_clipping else None

    # theta: every differentiable parameter, as explicit args so jax.grad
    # can produce their cotangents.
    from cmcd_tpu.ops.pallas_nets import make_kernel_net

    arch = sn_meta.get("arch", "geffner")
    sn_theta, sn_apply, sn_unpack = make_kernel_net(
        arch, sn_weights, sn_meta, dim, grad_logp_t=grad_logp_t,
        row_mask=row_mask,
    )
    theta = (
        jnp.asarray(eps, jnp.float32).reshape(1, 1),
        betas_row,
        mean_col,
        logdiag_col,
        *sn_theta,
    )

    def eps_at(eps0, fj):
        if eps_schedule == "cos_sq":
            phase = fj / nbridges
            return eps0 * jnp.cos((phase + 0.008) / 1.008 * 0.5 * jnp.pi) ** 2
        if eps_schedule == "linear":
            return (1e-4 - eps0) / (nbridges - 1) * fj + eps0
        return eps0

    log_2pi = 1.8378770664093453

    def point_fn(theta, z_prev, z, gt, xi, j, c_row):
        """Differentiable loss contribution of trajectory point z_j, plus
        (aux) the next rollout state. All z/gt inputs are fixed data; only
        theta carries gradients (VarGrad stop-gradient semantics)."""
        eps_arr, betas_r, mean_c, logdiag_c = theta[:4]
        th_sn = theta[4:]
        eps0 = eps_arr[0, 0]

        fj = j.astype(jnp.float32)
        # beta selection as a differentiable masked reduction over the grid.
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nbridges), 1)
        onehot_j = (lane_idx == j).astype(jnp.float32)
        onehot_p = (lane_idx == j - 1).astype(jnp.float32)
        beta_j = jnp.sum(betas_r * onehot_j)
        beta_p = jnp.sum(betas_r * onehot_p)

        # ONE net application at (z_j, j) — serves the forward kernel of
        # step j AND the backward kernel of step j-1 (CAIS offset-1). z is
        # data to jax.grad (argnums=0), so no stop_gradient is needed.
        sn_out = sn_apply(th_sn, z, j)

        # Clipped annealed drift pieces at z_j (gt is data; gq is theta).
        gq = -(z - mean_c) * jnp.exp(-2.0 * logdiag_c)
        gt_c = jnp.clip(gt, -clip_t, clip_t) if clip_t is not None else gt
        gq_c = jnp.clip(gq, -clip_q, clip_q) if clip_q is not None else gq

        def drift(beta):
            return (beta * gt_c + (1.0 - beta) * gq_c) * row_mask

        # Forward kernel of step j: z_j -> z_{j+1}.
        eps_j = eps_at(eps0, fj)
        # Floor: masked out-of-range steps can land on s2 <= 0 (cos_sq
        # hits ~0 at j = K; linear extrapolates negative) — 0 * inf = NaN
        # would poison the masked gradient. Live steps have eps >= 1e-7.
        s2_j = jnp.maximum(2.0 * eps_j, 1e-30)
        fk_mean = z + eps_j * drift(beta_j) - eps_j * sn_out
        # Stop the WHOLE next state (mean AND noise scaling): the reference
        # stop-gradients z_new after forming it (src/mcd_cais_var.py:79), so
        # no eps gradient may leak through the sqrt(2 eps) noise term.
        z_next = jax.lax.stop_gradient(fk_mean + jnp.sqrt(s2_j) * xi)
        r_fk = (z_next - fk_mean) * row_mask
        fk_lp = (
            -0.5 * jnp.sum(r_fk * r_fk, axis=0, keepdims=True) / s2_j
            - 0.5 * dim * (jnp.log(s2_j) + log_2pi)
        )

        # Backward kernel of step j-1: mean at z_j, evaluated at z_{j-1}.
        eps_p = eps_at(eps0, fj - 1.0)
        s2_p = jnp.maximum(2.0 * eps_p, 1e-30)
        bk_mean = z + eps_p * drift(beta_p) + eps_p * sn_out
        r_bk = (z_prev - bk_mean) * row_mask
        bk_lp = (
            -0.5 * jnp.sum(r_bk * r_bk, axis=0, keepdims=True) / s2_p
            - 0.5 * dim * (jnp.log(s2_p) + log_2pi)
        )

        # deltas = sum_i (bk_lp - fk_lp); grads of sum_n c_n * deltas_n.
        m_fk = (j <= nbridges - 1).astype(jnp.float32)
        m_bk = (j >= 1).astype(jnp.float32)
        loss = jnp.sum(c_row * (m_bk * bk_lp - m_fk * fk_lp))
        return loss, z_next

    grad_fn = jax.grad(point_fn, argnums=0, has_aux=True)

    example_theta = tuple(jax.ShapeDtypeStruct(t.shape, t.dtype) for t in theta)
    zb = jax.ShapeDtypeStruct((dim_pad, block), jnp.float32)
    example = (
        example_theta,
        zb,  # z_prev
        zb,  # z
        zb,  # gt
        zb,  # xi
        jax.ShapeDtypeStruct((), jnp.int32),  # j
        jax.ShapeDtypeStruct((1, block), jnp.float32),  # c_row
    )
    point_jaxpr = jax.make_jaxpr(grad_fn)(*example)
    point_consts = point_jaxpr.consts

    gt_jaxpr = jax.make_jaxpr(lambda z: grad_logp_t(z))(zb)
    gt_consts_raw = gt_jaxpr.consts

    const_shapes, const_inputs = pack_consts(point_consts)
    gt_const_shapes, gt_const_inputs = pack_consts(gt_consts_raw)

    n_theta = len(theta)

    def kernel(*refs):
        idx = 0
        seed_ref = refs[idx]; idx += 1
        z_ref = refs[idx]; idx += 1
        c_ref = refs[idx]; idx += 1
        theta_refs = refs[idx : idx + n_theta]; idx += n_theta
        noise_ref = None
        if inject_noise:
            noise_ref = refs[idx]; idx += 1
        const_refs = refs[idx : idx + len(const_inputs)]
        idx += len(const_inputs)
        gt_const_refs = refs[idx : idx + len(gt_const_inputs)]
        idx += len(gt_const_inputs)
        out_refs = refs[idx : idx + n_theta]; idx += n_theta

        pid = pl.program_id(0)
        if not inject_noise:
            pltpu.prng_seed(seed_ref[0, 0] + pid)

        consts = unpack_consts(const_shapes, const_refs)
        gt_consts = unpack_consts(gt_const_shapes, gt_const_refs)
        theta_vals = tuple(r[:] for r in theta_refs)
        c_row = c_ref[0:1, :]

        def gt_of(z):
            return jax.core.eval_jaxpr(gt_jaxpr.jaxpr, gt_consts, z)[0]

        def body(j, carry):
            z_prev, z, gt, acc = carry
            if inject_noise:
                xi = noise_ref[jnp.minimum(j, nbridges - 1)]
            else:
                xi = _box_muller((dim_pad, block))
            flat_in = (
                list(theta_vals) + [z_prev, z, gt, xi, j, c_row]
            )
            out = jax.core.eval_jaxpr(point_jaxpr.jaxpr, consts, *flat_in)
            g_theta, z_next = tuple(out[:n_theta]), out[n_theta]
            acc = tuple(a + g for a, g in zip(acc, g_theta))
            gt_next = gt_of(z_next)
            return (z, z_next, gt_next, acc)

        z = z_ref[:]
        gt0 = gt_of(z)
        acc0 = tuple(jnp.zeros(t.shape, jnp.float32) for t in theta_vals)
        # K+1 iterations: point j = 0..K (point K contributes only its
        # backward-kernel term; its xi draw is a harmless tail consume).
        _, _, _, acc = jax.lax.fori_loop(
            0, nbridges + 1, body, (jnp.zeros_like(z), z, gt0, acc0)
        )

        # Accumulate across sequential grid blocks (output index maps are
        # constant, so the same VMEM block is revisited by every program).
        for o_ref, a in zip(out_refs, acc):
            @pl.when(pid == 0)
            def _init(o_ref=o_ref, a=a):
                o_ref[:] = a

            @pl.when(pid != 0)
            def _acc(o_ref=o_ref, a=a):
                o_ref[:] = o_ref[:] + a

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((dim_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    inputs = [seed_arr, z0_t, cot_rows]
    for t in theta:
        in_specs.append(
            pl.BlockSpec(
                t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM
            )
        )
        inputs.append(t)
    if inject_noise:
        in_specs.append(
            pl.BlockSpec(
                (nbridges, dim_pad, block),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(noise_t)
    for c in const_inputs + gt_const_inputs:
        in_specs.append(
            pl.BlockSpec(
                c.shape, lambda i, nd=c.ndim: (0,) * nd, memory_space=pltpu.VMEM
            )
        )
        inputs.append(c)

    out_specs = [
        pl.BlockSpec(
            t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
        for t in theta
    ]
    out_shape = [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in theta]

    outs = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=(
            pltpu.InterpretParams()
            if (interpret and not inject_noise)
            else interpret
        ),
    )(*inputs)

    g_eps, g_betas, g_mean, g_logdiag = outs[:4]
    return {
        "eps": g_eps[0, 0],
        "betas": g_betas[0],
        "vd_mean": g_mean[:dim, 0],
        "vd_logdiag": g_logdiag[:dim, 0],
        "sn": sn_unpack(outs, 4),
    }
