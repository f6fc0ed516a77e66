"""Trajectory-replay VarGrad loss: fused forward, embarrassingly parallel
gradient.

Key observation: in MCD_CAIS_var_sn the state is stop-gradient'd at every
step (reference src/mcd_cais_var.py:59,79), so the VarGrad loss's parameter
dependence is ONLY through (a) the reparameterized initial term -log q(z_0),
(b) each step's forward/backward Gaussian kernel log-probs *evaluated at the
fixed trajectory*, and (c) the terminal log pi(z_K) (no params). Given the
trajectory, the loss is a pure batched function of the parameters with NO
sequential structure — its gradient needs no backprop-through-time.

So: run the fused Pallas kernel once (forward only, trajectory out), then
evaluate the loss over all (step, chain) pairs at once in XLA and let
autodiff produce the gradient as one giant parallel computation. This is
mathematically identical to jax.grad of the scan-based var_bound (verified
bit-for-tolerance in tests/test_pallas.py with injected noise) but replaces
the 2*nbridges-deep sequential backward with a single batched pass.

The target score appears in the replay loss, so KL-style second-order
autodiff of the target (SURVEY.md §7 hard part 2) still happens — but
batched over all (K+1) x N points at once instead of per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cmcd_tpu import bounds
from cmcd_tpu.distributions import (
    LOG_2PI,
    diag_gaussian_grad_log_prob,
    diag_gaussian_log_prob,
)
from cmcd_tpu.integrators import overdamped as od
from cmcd_tpu.ops.fused import _PALLAS_SPECS, _dim_pad
from cmcd_tpu.ops.pallas_overdamped import evolve_overdamped_pallas, pack_geffner_t
from cmcd_tpu.ops.target_grads import grad_t_for_target
from cmcd_tpu.schedules import betas_from_grid, eps_at_step


def replay_neg_elbos(params, z_traj, z_final, ctx, setup: bounds.CMCDSetup,
                     gt_all=None):
    """Per-chain negative ELBOs from a FIXED trajectory, differentiable in
    params. z_traj: (K, N, dim) pre-step states; z_final: (N, dim).

    Matches integrators/overdamped.py CAIS_VAR semantics exactly: both
    gradU clips at +/-clip when setup.grad_clipping, backward net at i+1,
    reparameterized -log q(z_0) with the noise reconstructed from the stored
    z_0 at the current (stopped) parameter values.
    """
    p = bounds.merged_params(params)
    nb = setup.nbridges
    n = z_traj.shape[1]

    spec = _PALLAS_SPECS[setup.mode]
    clip_t = spec.clip_target if setup.grad_clipping else None
    clip_q = spec.clip_vd if setup.grad_clipping else None

    z_all = jnp.concatenate([z_traj, z_final[None]], axis=0)  # (K+1, N, dim)
    z_all = jax.lax.stop_gradient(z_all)
    betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])

    # Target and vd scores at every trajectory point. The target score has
    # no parameter dependence, so the kernel-computed values (gt_all) can be
    # reused verbatim; otherwise one batched autodiff pass.
    flat = z_all.reshape(-1, setup.dim)
    if gt_all is not None:
        gu = jax.lax.stop_gradient(gt_all).reshape(-1, setup.dim)
    else:
        gu = jax.grad(lambda zz: jnp.sum(ctx.target_log_prob(zz)))(flat)
    gq = diag_gaussian_grad_log_prob(p["vd"], flat)
    if clip_t is not None:
        gu = jnp.clip(gu, -clip_t, clip_t)
    if clip_q is not None:
        gq = jnp.clip(gq, -clip_q, clip_q)
    gu = gu.reshape(z_all.shape)
    gq = gq.reshape(z_all.shape)

    steps = jnp.arange(nb)
    eps_i = jax.vmap(lambda i: eps_at_step(p["eps"], i, nb, setup.eps_schedule))(
        steps
    )  # (K,)
    scale = jnp.sqrt(2.0 * eps_i)  # (K,)
    b = betas[:, None, None]
    e = eps_i[:, None, None]

    # -grad U at (z_i, beta_i) and (z_{i+1}, beta_i).
    drift_lo = b * gu[:-1] + (1.0 - b) * gq[:-1]   # (K, N, dim) = -gradU(z_i)
    drift_hi = b * gu[1:] + (1.0 - b) * gq[1:]     # -gradU(z_{i+1})

    fk_mean = z_all[:-1] + e * drift_lo
    bk_mean = z_all[1:] + e * drift_hi
    if spec.fwd_sn or spec.bwd_sn:
        # vmap over steps lowers to XLA batched matmuls, which measured
        # faster here than one giant stacked matmul (the stacked form's
        # (2KN, in) activations dominate HBM traffic in the backward).
        sn_fwd = jax.vmap(lambda zz, i: ctx.apply_sn(p["sn"], zz, i))(
            z_all[:-1], steps
        )
        sn_bwd = jax.vmap(lambda zz, i: ctx.apply_sn(p["sn"], zz, i))(
            z_all[1:], steps + spec.bwd_sn_offset
        )
        if spec.fwd_sn:
            fk_mean = fk_mean - e * sn_fwd
        if spec.bwd_sn:
            bk_mean = bk_mean + e * sn_bwd

    s = scale[:, None, None]
    log_s = jnp.log(scale)[:, None]
    fk_lp = (
        -0.5 * jnp.sum(((z_all[1:] - fk_mean) / s) ** 2 + LOG_2PI, axis=-1)
        - setup.dim * log_s
    )  # (K, N)
    bk_lp = (
        -0.5 * jnp.sum(((z_all[:-1] - bk_mean) / s) ** 2 + LOG_2PI, axis=-1)
        - setup.dim * log_s
    )

    # Reparameterized initial term: reconstruct the base noise from the
    # stored z_0 at the current parameter values (stop-gradient), then let
    # the -log q(z_0(theta)) term carry the exact reparam gradient.
    mean, logdiag = p["vd"]["mean"], p["vd"]["logdiag"]
    eps0 = jax.lax.stop_gradient((z_all[0] - mean) * jnp.exp(-logdiag))
    z0 = mean + jnp.exp(logdiag) * eps0
    w = -diag_gaussian_log_prob(p["vd"], z0)
    w = w + jnp.sum(bk_lp - fk_lp, axis=0)
    w = w + ctx.target_log_prob(z_all[-1])
    return -w


def var_bound_fused(params, key, n_chains: int, ctx, setup: bounds.CMCDSetup,
                    target, *, block: int = 256, noise=None, interpret: bool = False):
    """Drop-in var_bound with the Pallas forward + trajectory-replay grad.

    Same contract as bounds.var_bound (loss, (neg_elbos, z)) plus the target
    argument (the kernel needs its transposed score). Use under jax.grad /
    value_and_grad exactly like the scan loss.
    """
    spec = _PALLAS_SPECS[setup.mode]
    p = bounds.merged_params(params)
    dim = setup.dim
    dim_pad = _dim_pad(dim)

    z_key, evolve_key = jax.random.split(key)
    from cmcd_tpu.distributions import diag_gaussian_sample

    # Forward rollout at stopped params (gradients come from the replay).
    p_stop = jax.lax.stop_gradient(p)
    z0 = diag_gaussian_sample(z_key, p_stop["vd"], n_chains)
    betas = betas_from_grid(
        p_stop["mgridref_y"], p_stop["gridref_x"], p_stop["target_x"]
    )
    grad_t = grad_t_for_target(target, dim_pad)
    sn_weights, sn_meta = pack_geffner_t(p_stop["sn"], dim, dim_pad)
    seed = jax.random.randint(evolve_key, (), 0, jnp.iinfo(jnp.int32).max)

    z_final, _, z_traj, gt_all = evolve_overdamped_pallas(
        z0,
        jnp.zeros(n_chains),
        betas,
        p_stop["eps"],
        p_stop["vd"]["mean"],
        p_stop["vd"]["logdiag"],
        grad_t,
        spec,
        dim=dim,
        nbridges=setup.nbridges,
        sn_weights=sn_weights,
        sn_meta=sn_meta,
        eps_schedule=setup.eps_schedule,
        grad_clipping=setup.grad_clipping,
        seed=seed,
        block=block,
        noise=noise,
        return_trajectory=True,
        return_drifts=True,
        interpret=interpret,
    )

    neg_elbos = replay_neg_elbos(params, z_traj, z_final, ctx, setup, gt_all=gt_all)
    loss = jnp.clip(jnp.var(neg_elbos, ddof=0), -1e7, 1e7)
    return loss, (neg_elbos, z_final)
