"""Fully-fused VarGrad training loss: Pallas forward + Pallas backward.

var_bound_pallas is a drop-in replacement for bounds.var_bound on
MCD_CAIS_var_sn (the flagship 5x-wall-clock recipe): same (loss, (neg_elbos,
z)) contract, same math (verified against jax.grad of the scan loss under
injected noise in tests/test_pallas_vargrad.py), but the K-step rollout runs
in the fused forward kernel (ops/pallas_overdamped.py) and the gradient in a
point-centric backward kernel (ops/pallas_vargrad.py). Two backward
strategies (see _make_evolve): "replay" stores the forward's trajectory and
batches the gradient over all points with no sequential dependency;
"reroll" stores nothing and regenerates the trajectory from the same PRNG
seed.

Differentiation layout: everything OUTSIDE the bridge loop stays in plain
XLA autodiff — the reparameterized initial term -log q(z0(theta)), the
annealing-grid chain rule (mgridref_y -> betas), the VarGrad variance +
clip. Only the summed per-step log-weight increments get a custom VJP whose
backward is the kernel. The final-state target term and the chain states are
stop-gradient'd exactly as the reference's VarGrad evolver does
(src/mcd_cais_var.py:59,79).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cmcd_tpu import bounds
from cmcd_tpu.distributions import diag_gaussian_log_prob
from cmcd_tpu.integrators import overdamped as od
from cmcd_tpu.ops.fused import _dim_pad, choose_block
from cmcd_tpu.ops.pallas_overdamped import evolve_overdamped_pallas, pack_geffner_t
from cmcd_tpu.ops.pallas_vargrad import (
    evolve_vargrad_bwd_pallas,
    evolve_vargrad_bwd_replay,
)
from cmcd_tpu.ops.target_grads import grad_t_for_target
from cmcd_tpu.schedules import betas_from_grid


# The stored trajectory residual costs (K+1) * dim_pad * n_pad * 4 bytes
# between the forward and backward kernels; past this budget fall back to
# the zero-memory re-rolling backward.
_REPLAY_BYTES_BUDGET = 256 * 1024 * 1024

# Packed score-net size past which the CAIS KL backward computes the weight
# gradients OUTSIDE the sweep kernel (pallas_kl net_grads_outside): in-kernel
# weight grads for LGCP-size nets spill past physical VMEM.
_NET_GRADS_OUTSIDE_BYTES = 4 * 1024 * 1024

# The replay backward's grid is (trajectory windows, chain blocks) and its
# per-program fixed cost dominates once the per-point work is small: on v5e
# at the flagship size (N=2000, K=256, emb_dim=130) widening the backward's
# chain block from 1024 to the whole padded batch (2048; 514 -> 257
# programs) cut the backward kernel 3.26 -> 2.27 ms while the FORWARD
# regressed at the same width (2.44 -> 3.12 ms; its double-buffered
# pipeline needs two resident blocks) — so the widths are decoupled and the
# backward requests the whole batch whenever its three (dim_pad, block)
# trajectory windows stay under this budget (RESULTS.md round 4).
_REPLAY_BWD_WINDOW_BYTES = 2 * 1024 * 1024


def _make_evolve(setup, target, n_chains, block, interpret, backward="auto",
                 bf16_net=False):
    """custom_vjp'd (theta, z0, seed, noise) -> (deltas, z_final) for
    CAIS_VAR.

    theta = {"eps", "betas", "vd_mean", "vd_logdiag", "sn"}; z0, seed, and
    noise are data (z0 arrives stop-gradient'd per VarGrad semantics).

    backward selects the gradient kernel:
    - "replay" (default for ordinary sizes): the forward kernel stores the
      trajectory (raw transposed layout, kept on-chip or in HBM by XLA);
      the backward is the batched replay kernel streaming it back — an
      embarrassingly parallel grid with no re-rolling
      (evolve_vargrad_bwd_replay).
    - "reroll": the backward re-generates the trajectory from the same PRNG
      seed, storing nothing (evolve_vargrad_bwd_pallas) — for sizes where
      the trajectory residual would be prohibitive.
    - "auto": replay unless the residual exceeds _REPLAY_BYTES_BUDGET.

    noise is an explicit argument — not a closure — so the whole thing
    works when traced inside shard_map (custom_vjp forbids closed-over
    tracers)."""
    from cmcd_tpu.ops.fused import _pack_net

    spec = od.CAIS_VAR
    dim = setup.dim
    dim_pad = _dim_pad(dim)
    pack_net = _pack_net(setup.nn_arch)
    grad_t = grad_t_for_target(target, dim_pad)
    if backward == "auto":
        n_pad = -(-n_chains // block) * block
        traj_bytes = (setup.nbridges + 1) * dim_pad * n_pad * 4
        backward = "replay" if traj_bytes <= _REPLAY_BYTES_BUDGET else "reroll"
    use_replay = backward == "replay"

    def _run_forward(theta, z0, seed, noise):
        sn_weights, sn_meta = pack_net(theta["sn"], dim, dim_pad)
        out = evolve_overdamped_pallas(
            z0,
            jnp.zeros(n_chains),
            theta["betas"],
            theta["eps"],
            theta["vd_mean"],
            theta["vd_logdiag"],
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
            return_trajectory_t=use_replay,
            interpret=interpret,
        )
        if use_replay:
            z_final, deltas, traj_t = out
        else:
            (z_final, deltas), traj_t = out, None
        return deltas, z_final, traj_t

    @jax.custom_vjp
    def evolve(theta, z0, seed, noise):
        deltas, z_final, _ = _run_forward(theta, z0, seed, noise)
        return deltas, z_final

    def evolve_fwd(theta, z0, seed, noise):
        deltas, z_final, traj_t = _run_forward(theta, z0, seed, noise)
        return (deltas, z_final), (theta, traj_t, z0, seed, noise)

    def evolve_bwd(res, cots):
        theta, traj_t, z0, seed, noise = res
        g_deltas, _g_zfinal = cots  # z_final is consumed under stop_gradient
        sn_weights, sn_meta = pack_net(theta["sn"], dim, dim_pad)
        common = dict(
            dim=dim,
            nbridges=setup.nbridges,
            sn_weights=sn_weights,
            sn_meta=sn_meta,
            eps_schedule=setup.eps_schedule,
            grad_clipping=setup.grad_clipping,
            block=block,
            interpret=interpret,
        )
        if use_replay:
            import jax.numpy as _jnp

            # Decoupled backward chain block (see _REPLAY_BWD_WINDOW_BYTES):
            # whole-batch programs when the windows fit, two trajectory
            # points per program (statically unrolled; measured 3.554 vs
            # 3.623 ms/step at the flagship size — ppp=4 ties, ppp=8
            # regresses on VMEM pressure; RESULTS.md round-4 ppp ladder).
            n_pad = traj_t.shape[-1]
            ppp = 1
            # Widened footprint: 3 one-point windows PER replay point
            # (ppp_target of them resident at once), f32 — size the gate to
            # the actual resident bytes so constant and footprint agree.
            ppp_target = 2
            if 3 * ppp_target * dim_pad * n_pad * 4 <= _REPLAY_BWD_WINDOW_BYTES:
                common = dict(common, block=n_pad)
                ppp = ppp_target
            grads = evolve_vargrad_bwd_replay(
                traj_t,
                g_deltas,
                theta["betas"],
                theta["eps"],
                theta["vd_mean"],
                theta["vd_logdiag"],
                grad_t,
                spec,
                n_chains=n_chains,
                points_per_program=ppp,
                net_compute_dtype=(
                    _jnp.bfloat16 if bf16_net else _jnp.float32
                ),
                **common,
            )
        else:
            grads = evolve_vargrad_bwd_pallas(
                z0,
                g_deltas,
                theta["betas"],
                theta["eps"],
                theta["vd_mean"],
                theta["vd_logdiag"],
                grad_t,
                spec,
                seed=seed,
                noise=noise,
                **common,
            )
        g_theta = {
            "eps": grads["eps"].astype(theta["eps"].dtype).reshape(theta["eps"].shape),
            "betas": grads["betas"],
            "vd_mean": grads["vd_mean"],
            "vd_logdiag": grads["vd_logdiag"],
            "sn": grads["sn"],
        }
        # factor_sn is a 0-d param (geffner nets only); match its shape.
        if "factor_sn" in g_theta["sn"]:
            g_theta["sn"]["factor_sn"] = jnp.reshape(
                g_theta["sn"]["factor_sn"], theta["sn"]["factor_sn"].shape
            )
        g_noise = None if noise is None else jnp.zeros_like(noise)
        return g_theta, jnp.zeros_like(z0), None, g_noise

    evolve.defvjp(evolve_fwd, evolve_bwd)
    return evolve


def neg_elbos_pallas(
    params,
    key,
    n_chains: int,
    ctx,
    setup: bounds.CMCDSetup,
    target,
    *,
    block: int | None = None,
    noise=None,
    interpret: bool = False,
    backward: str = "auto",
    bf16_net: bool = False,
):
    """Per-chain negative ELBOs via the fused forward kernel, differentiable
    in params through the fused backward kernel (VarGrad semantics: the
    chain states are stop-gradient'd; gradients flow through the per-step
    kernel log-probs and the reparameterized initial term).

    This is the building block both var_bound_pallas and the sharded
    multi-chip loss (parallel.sharded_var_bound_pallas) compose with their
    own (global) reduction.
    """
    assert setup.mode == "MCD_CAIS_var_sn", (
        "the fused training path implements the VarGrad (CAIS_VAR) loss only"
    )
    p = bounds.merged_params(params)
    dim = setup.dim
    if block is None:
        block = choose_block(
            dim, n_chains, traj_arrays=1, nbridges=setup.nbridges
        )

    z_key, e_key = jax.random.split(key)
    # Reparameterized initial draw: the -log q(z0(theta)) term carries the
    # exact vd gradient through plain autodiff; the trajectory's use of z0
    # is stop-gradient'd (VarGrad semantics).
    base = jax.random.normal(z_key, (n_chains, dim))
    mean, logdiag = p["vd"]["mean"], p["vd"]["logdiag"]
    z0 = mean + jnp.exp(logdiag) * base
    w0 = -diag_gaussian_log_prob(p["vd"], z0)

    betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
    seed = jax.random.randint(e_key, (), 0, jnp.iinfo(jnp.int32).max)

    theta = {
        "eps": p["eps"],
        "betas": betas,
        "vd_mean": mean,
        "vd_logdiag": logdiag,
        "sn": p["sn"],
    }
    evolve = _make_evolve(
        setup, target, n_chains, block, interpret, backward, bf16_net
    )
    deltas, z_final = evolve(theta, jax.lax.stop_gradient(z0), seed, noise)

    w = w0 + deltas + ctx.target_log_prob(jax.lax.stop_gradient(z_final))
    return -w, z_final


def _make_evolve_kl(setup, target, n_chains, block, interpret, spec,
                    bf16_net=False, time_block=None, bf16_residuals=False):
    """custom_vjp'd (theta, z0, seed, noise) -> (deltas, z_final) for the
    KL-trained overdamped modes (full BPTT — no stop-gradients).

    Unlike the VarGrad evolve, z0 and z_final carry REAL cotangents: the
    backward is the reverse-sweep kernel (ops/pallas_kl.py) seeded with the
    final-state cotangent (the target term's gradient, computed by XLA) and
    emitting the initial-state cotangent for the reparameterized draw.
    Residuals: the stored trajectory + noise draws.

    bf16_residuals (split path only): store the trajectory AND noise stacks
    in bfloat16 — halves the residual HBM traffic of the reverse sweep and
    the out-of-kernel weight-grad pass. The split kernel's xi
    reconstruction is numerically impossible from bf16 states (the step
    increment sits below the bf16 ulp of |z| at LGCP-scale eps), so this
    mode stores the noise stack the f32 split path elides. Gradients see
    bf16-rounded states (~1e-2 relative, like bf16_net); quality-gate any
    enablement."""
    from cmcd_tpu.ops.pallas_kl import evolve_kl_bwd_pallas

    dim = setup.dim
    dim_pad = _dim_pad(dim)
    grad_t = grad_t_for_target(target, dim_pad)
    use_sn = spec.fwd_sn or spec.bwd_sn
    # Large nets: weight grads leave the sweep kernel (see pallas_kl
    # net_grads_outside); the split kernel also reconstructs xi from the
    # trajectory, so the forward need not store (nor the backward load) the
    # noise stack. Only the CAIS carry structure supports it.
    from cmcd_tpu.ops.fused import _packed_sn_bytes

    split = bool(
        use_sn
        and spec.fwd_sn
        and spec.bwd_sn
        and spec.bwd_sn_offset == 1
        and not spec.use_sn2_bwd
        and _packed_sn_bytes(setup) > _NET_GRADS_OUTSIDE_BYTES
    )
    bf16_net = bf16_net and split
    bf16_residuals = bf16_residuals and split
    residual_dtype = jnp.bfloat16 if bf16_residuals else jnp.float32
    if time_block is None:
        # Auto time-chunk the reverse sweep when its whole-trajectory
        # windows (traj + noise, or traj + the split gsn output — 2 stacks
        # either way) would blow the VMEM share (ops/fused.choose_time_block,
        # which shrinks the window share as the kernel's resident set —
        # weights at their storage dtype + target consts — grows).
        from cmcd_tpu.ops.fused import _vmem_estimate, choose_time_block

        est = _vmem_estimate(setup, target, block)
        if bf16_net:
            # Shrink by the bytes the per-tensor cast predicate actually
            # saves (kernel_common.bf16_storage_leaf), not a blanket half.
            est -= _packed_sn_bytes(setup) - _packed_sn_bytes(
                setup, bf16=True
            )
        time_block = choose_time_block(setup.nbridges, dim, block, 2, est)

    def _pack(theta):
        from cmcd_tpu.ops.fused import _pack_net

        sn_w = sn_m = sn2_w = None
        if use_sn:
            sn_w, sn_m = _pack_net(setup.nn_arch)(theta["sn"], dim, dim_pad)
        if spec.use_sn2_bwd:
            sn2_w, _ = pack_geffner_t(theta["sn2"], dim, dim_pad)
        return sn_w, sn_m, sn2_w

    def _run_forward(theta, z0, seed, noise):
        sn_weights, sn_meta, sn2_weights = _pack(theta)
        inject = noise is not None
        out = evolve_overdamped_pallas(
            z0,
            jnp.zeros(n_chains),
            theta["betas"],
            theta["eps"],
            theta["vd_mean"],
            theta["vd_logdiag"],
            grad_t,
            spec,
            dim=dim,
            nbridges=setup.nbridges,
            sn_weights=sn_weights,
            sn_meta=sn_meta,
            sn2_weights=sn2_weights,
            eps_schedule=setup.eps_schedule,
            grad_clipping=setup.grad_clipping,
            seed=seed,
            block=block,
            noise=noise,
            return_trajectory_t=True,
            # The f32 split sweep reconstructs xi from the trajectory (no
            # noise stack); bf16 residuals cannot reconstruct, so the
            # forward stores the (bf16) draws.
            return_noise_t=not inject and (not split or bf16_residuals),
            time_block=time_block,
            residual_dtype=residual_dtype,
            interpret=interpret,
        )
        if split and not bf16_residuals:
            z_final, deltas, traj_t = out[:3]
            noise_t = None
        elif inject:
            z_final, deltas, traj_t = out
            n_pad = traj_t.shape[2]
            noise_t = (
                jnp.zeros(
                    (setup.nbridges, dim_pad, n_pad), residual_dtype
                )
                .at[:, :dim, :n_chains]
                .set(jnp.swapaxes(noise, 1, 2).astype(residual_dtype))
            )
        else:
            z_final, deltas, traj_t, noise_t = out
        return deltas, z_final, traj_t, noise_t

    @jax.custom_vjp
    def evolve(theta, z0, seed, noise):
        deltas, z_final, _, _ = _run_forward(theta, z0, seed, noise)
        return deltas, z_final

    def evolve_fwd(theta, z0, seed, noise):
        deltas, z_final, traj_t, noise_t = _run_forward(theta, z0, seed, noise)
        return (deltas, z_final), (theta, traj_t, noise_t, noise, z_final)

    def evolve_bwd(res, cots):
        theta, traj_t, noise_t, noise, z_final = res
        g_deltas, g_zfinal = cots  # BOTH live for KL
        sn_weights, sn_meta, sn2_weights = _pack(theta)
        # The time-chunked forward's trajectory has nbridges rows; hand the
        # final state to the sweep in the raw transposed layout.
        n_pad = traj_t.shape[2]
        zf_t = (
            jnp.zeros((dim_pad, n_pad), jnp.float32)
            .at[:dim, :n_chains].set(z_final.T)
        )
        grads, g_z0 = evolve_kl_bwd_pallas(
            traj_t,
            noise_t,
            g_deltas,
            g_zfinal,
            theta["betas"],
            theta["eps"],
            theta["vd_mean"],
            theta["vd_logdiag"],
            grad_t,
            spec,
            dim=dim,
            nbridges=setup.nbridges,
            n_chains=n_chains,
            sn_weights=sn_weights,
            sn_meta=sn_meta,
            sn2_weights=sn2_weights,
            eps_schedule=setup.eps_schedule,
            grad_clipping=setup.grad_clipping,
            block=block,
            net_grads_outside=split,
            net_compute_dtype=(jnp.bfloat16 if bf16_net else jnp.float32),
            time_block=time_block,
            z_final_t=zf_t,
            interpret=interpret,
        )
        g_theta = {
            "eps": grads["eps"].astype(theta["eps"].dtype).reshape(theta["eps"].shape),
            "betas": grads["betas"],
            "vd_mean": grads["vd_mean"],
            "vd_logdiag": grads["vd_logdiag"],
        }
        for k in ("sn", "sn2"):
            if k in grads:
                g_theta[k] = grads[k]
                if "factor_sn" in g_theta[k]:  # geffner nets only
                    g_theta[k]["factor_sn"] = jnp.reshape(
                        g_theta[k]["factor_sn"], theta[k]["factor_sn"].shape
                    )
        g_noise = None if noise is None else jnp.zeros_like(noise)
        return g_theta, g_z0, None, g_noise

    evolve.defvjp(evolve_fwd, evolve_bwd)
    return evolve


def _make_evolve_kl_ud(setup, target, n_chains, block, interpret, spec,
                       full_sn, time_block=None):
    """custom_vjp'd (theta, z0, seed, noise) -> (w_delta, z_final) for the
    underdamped KL modes (full BPTT through position AND momentum).

    theta adds gamma/eta; the forward kernel stores (z, rho) trajectories +
    noise draws (return_state_t) and the backward is the underdamped
    reverse-sweep kernel (ops/pallas_kl.evolve_kl_bwd_underdamped).

    time_block: time-chunk the stored windows (forward) and the reverse
    sweep for big-K configs whose whole-(K+1) 3-stack windows exceed VMEM
    (auto via ops/fused.choose_time_block with n_arrays=3). None (the
    default auto when whole windows fit physical VMEM) keeps the
    hardware-validated single-window sweep."""
    from cmcd_tpu.ops.pallas_kl import evolve_kl_bwd_underdamped
    from cmcd_tpu.ops.pallas_underdamped import (
        evolve_underdamped_pallas,
        pack_geffner_ud_t,
    )

    dim = setup.dim
    dim_pad = _dim_pad(dim)
    grad_t = grad_t_for_target(target, dim_pad)
    use_sn = spec.fwd_sn or spec.bwd_sn != "none"
    if time_block is None:
        # Auto time-chunk (3 stored stacks: z traj + rho traj + noise)
        # when the whole-(K+1) windows would blow the VMEM share — same
        # est-aware rule as the overdamped _make_evolve_kl.
        from cmcd_tpu.ops.fused import _vmem_estimate, choose_time_block

        est = _vmem_estimate(setup, target, block)
        time_block = choose_time_block(setup.nbridges, dim, block, 3, est)
    chunked = time_block is not None and time_block < setup.nbridges

    def _pack(theta):
        if use_sn:
            return pack_geffner_ud_t(theta["sn"], dim, dim_pad, full_sn)
        return None, None

    def _run_forward(theta, z0, seed, noise):
        sn_weights, sn_meta = _pack(theta)
        out = evolve_underdamped_pallas(
            z0,
            theta["betas"],
            theta["eps"],
            theta["gamma"],
            theta["eta"],
            theta["vd_mean"],
            theta["vd_logdiag"],
            grad_t,
            spec,
            dim=dim,
            nbridges=setup.nbridges,
            sn_weights=sn_weights,
            sn_meta=sn_meta,
            seed=seed,
            block=block,
            noise=noise,
            return_state_t=True,
            time_block=time_block,
            interpret=interpret,
        )
        if chunked:
            z_final, w_delta, ztraj, rtraj, noise_t, rhoK_t = out
        else:
            z_final, w_delta, ztraj, rtraj, noise_t = out
            rhoK_t = None
        return w_delta, z_final, ztraj, rtraj, noise_t, rhoK_t

    @jax.custom_vjp
    def evolve(theta, z0, seed, noise):
        w_delta, z_final, _, _, _, _ = _run_forward(theta, z0, seed, noise)
        return w_delta, z_final

    def evolve_fwd(theta, z0, seed, noise):
        w_delta, z_final, ztraj, rtraj, noise_t, rhoK_t = _run_forward(
            theta, z0, seed, noise
        )
        return (w_delta, z_final), (theta, ztraj, rtraj, noise_t, rhoK_t,
                                    noise)

    def evolve_bwd(res, cots):
        theta, ztraj, rtraj, noise_t, rhoK_t, noise = res
        g_deltas, g_zfinal = cots
        sn_weights, sn_meta = _pack(theta)
        grads, g_z0 = evolve_kl_bwd_underdamped(
            ztraj,
            rtraj,
            noise_t,
            g_deltas,
            g_zfinal,
            theta["betas"],
            theta["eps"],
            theta["gamma"],
            theta["eta"],
            theta["vd_mean"],
            theta["vd_logdiag"],
            grad_t,
            spec,
            dim=dim,
            nbridges=setup.nbridges,
            n_chains=n_chains,
            sn_weights=sn_weights,
            sn_meta=sn_meta,
            block=block,
            time_block=time_block,
            rhoK_t=rhoK_t,
            interpret=interpret,
        )
        g_theta = {
            "eps": grads["eps"].astype(theta["eps"].dtype).reshape(theta["eps"].shape),
            "gamma": grads["gamma"].astype(theta["gamma"].dtype).reshape(
                theta["gamma"].shape
            ),
            "eta": grads["eta"].astype(theta["eta"].dtype).reshape(
                theta["eta"].shape
            ),
            "betas": grads["betas"],
            "vd_mean": grads["vd_mean"],
            "vd_logdiag": grads["vd_logdiag"],
        }
        if use_sn:
            g_theta["sn"] = grads["sn"]
            g_theta["sn"]["factor_sn"] = jnp.reshape(
                g_theta["sn"]["factor_sn"], theta["sn"]["factor_sn"].shape
            )
        g_noise = None if noise is None else jnp.zeros_like(noise)
        return g_theta, g_z0, None, g_noise

    evolve.defvjp(evolve_fwd, evolve_bwd)
    return evolve


def _make_evolve_kl_uha(setup, target, n_chains, block, interpret,
                        time_block=None):
    """custom_vjp'd (theta, z0, seed, noise) -> (w_delta, z_final) for UHA
    (full BPTT through position and momentum; trainable momentum logscale
    md — the initial rho_0 = e^{md} xi_0 draw is theta-dependent and the
    backward kernel accounts for it).

    time_block: time-chunk the stored windows (forward) and the reverse
    sweep for big-K configs (auto via ops/fused.choose_time_block with
    n_arrays=3; None keeps the single-window sweep when windows fit)."""
    from cmcd_tpu.ops.pallas_kl import evolve_kl_bwd_uha
    from cmcd_tpu.ops.pallas_uha import evolve_uha_pallas

    dim = setup.dim
    dim_pad = _dim_pad(dim)
    grad_t = grad_t_for_target(target, dim_pad)
    if time_block is None:
        from cmcd_tpu.ops.fused import _vmem_estimate, choose_time_block

        est = _vmem_estimate(setup, target, block)
        time_block = choose_time_block(setup.nbridges, dim, block, 3, est)

    def _run_forward(theta, z0, seed, noise):
        z_final, w_delta, ztraj, rtraj, noise_t = evolve_uha_pallas(
            z0,
            theta["betas"],
            theta["eps"],
            theta["eta"],
            theta["md"],
            theta["vd_mean"],
            theta["vd_logdiag"],
            grad_t,
            dim=dim,
            nbridges=setup.nbridges,
            lfsteps=setup.lfsteps,
            seed=seed,
            block=block,
            noise=noise,
            return_state_t=True,
            time_block=time_block,
            interpret=interpret,
        )
        return w_delta, z_final, ztraj, rtraj, noise_t

    @jax.custom_vjp
    def evolve(theta, z0, seed, noise):
        w_delta, z_final, _, _, _ = _run_forward(theta, z0, seed, noise)
        return w_delta, z_final

    def evolve_fwd(theta, z0, seed, noise):
        w_delta, z_final, ztraj, rtraj, noise_t = _run_forward(
            theta, z0, seed, noise
        )
        return (w_delta, z_final), (theta, ztraj, rtraj, noise_t, noise)

    def evolve_bwd(res, cots):
        theta, ztraj, rtraj, noise_t, noise = res
        g_deltas, g_zfinal = cots
        grads, g_z0 = evolve_kl_bwd_uha(
            ztraj,
            rtraj,
            noise_t,
            g_deltas,
            g_zfinal,
            theta["betas"],
            theta["eps"],
            theta["eta"],
            theta["md"],
            theta["vd_mean"],
            theta["vd_logdiag"],
            grad_t,
            dim=dim,
            nbridges=setup.nbridges,
            n_chains=n_chains,
            lfsteps=setup.lfsteps,
            block=block,
            time_block=time_block,
            interpret=interpret,
        )
        g_theta = {
            "eps": grads["eps"].astype(theta["eps"].dtype).reshape(theta["eps"].shape),
            "eta": grads["eta"].astype(theta["eta"].dtype).reshape(
                theta["eta"].shape
            ),
            "md": grads["md"],
            "betas": grads["betas"],
            "vd_mean": grads["vd_mean"],
            "vd_logdiag": grads["vd_logdiag"],
        }
        g_noise = None if noise is None else jnp.zeros_like(noise)
        return g_theta, g_z0, None, g_noise

    evolve.defvjp(evolve_fwd, evolve_bwd)
    return evolve


def _neg_elbos_pallas_kl_uha(
    params, key, n_chains, ctx, setup, target, *, block, noise, interpret,
    time_block=None,
):
    p = bounds.merged_params(params)
    dim = setup.dim

    z_key, e_key = jax.random.split(key)
    base = jax.random.normal(z_key, (n_chains, dim))
    mean, logdiag = p["vd"]["mean"], p["vd"]["logdiag"]
    z0 = mean + jnp.exp(logdiag) * base
    w0 = -diag_gaussian_log_prob(p["vd"], z0)

    betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
    seed = jax.random.randint(e_key, (), 0, jnp.iinfo(jnp.int32).max)

    theta = {
        "eps": p["eps"],
        "eta": p["eta"],
        "md": p["md"],
        "betas": betas,
        "vd_mean": mean,
        "vd_logdiag": logdiag,
    }
    evolve = _make_evolve_kl_uha(setup, target, n_chains, block, interpret,
                                 time_block=time_block)
    w_delta, z_final = evolve(theta, z0, seed, noise)
    w = w0 + w_delta + ctx.target_log_prob(z_final)
    return -w, z_final


def _neg_elbos_pallas_kl_ud(
    params, key, n_chains, ctx, setup, target, *, block, noise, interpret,
    time_block=None,
):
    from cmcd_tpu.ops.fused import _PALLAS_UD_SPECS

    spec, full_sn = _PALLAS_UD_SPECS[setup.mode]
    p = bounds.merged_params(params)
    dim = setup.dim

    z_key, e_key = jax.random.split(key)
    base = jax.random.normal(z_key, (n_chains, dim))
    mean, logdiag = p["vd"]["mean"], p["vd"]["logdiag"]
    z0 = mean + jnp.exp(logdiag) * base
    w0 = -diag_gaussian_log_prob(p["vd"], z0)

    betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
    seed = jax.random.randint(e_key, (), 0, jnp.iinfo(jnp.int32).max)

    theta = {
        "eps": p["eps"],
        "gamma": p["gamma"],
        "eta": p["eta"],
        "betas": betas,
        "vd_mean": mean,
        "vd_logdiag": logdiag,
    }
    if spec.fwd_sn or spec.bwd_sn != "none":
        theta["sn"] = p["sn"]
    evolve = _make_evolve_kl_ud(
        setup, target, n_chains, block, interpret, spec, full_sn,
        time_block=time_block,
    )
    w_delta, z_final = evolve(theta, z0, seed, noise)
    w = w0 + w_delta + ctx.target_log_prob(z_final)
    return -w, z_final


def neg_elbos_pallas_kl(
    params,
    key,
    n_chains: int,
    ctx,
    setup: bounds.CMCDSetup,
    target,
    *,
    block: int | None = None,
    noise=None,
    interpret: bool = False,
    bf16_net: bool = False,
    time_block: int | None = None,
    bf16_residuals: bool = False,
):
    """Per-chain negative ELBOs via the fused forward kernel, differentiable
    in params through the reverse-sweep BPTT backward kernels (full
    backprop-through-time: state cotangents chain through every step, the
    target term, and the reparameterized initial draw).

    Supported: the overdamped KL modes (MCD_ULA, MCD_ULA_sn, MCD_CAIS_sn)
    and the underdamped family (MCD_U_* and MCD_CAIS_UHA_sn).
    The building block for kl_bound_pallas and the sharded multi-chip loss
    (parallel.sharded_kl_bound_pallas)."""
    from cmcd_tpu.ops.fused import _PALLAS_SPECS

    assert setup.mode in KL_FUSED_MODES, (
        f"fused KL training implements {sorted(KL_FUSED_MODES)}, "
        f"not {setup.mode}"
    )
    if block is None:
        # Stored residuals: traj + noise for overdamped, + momentum for
        # the underdamped family and UHA.
        n_arrays = 2 if setup.mode in _PALLAS_SPECS else 3
        block = choose_block(
            setup.dim, n_chains, traj_arrays=n_arrays,
            nbridges=setup.nbridges,
        )
    if setup.mode == "UHA":
        return _neg_elbos_pallas_kl_uha(
            params, key, n_chains, ctx, setup, target,
            block=block, noise=noise, interpret=interpret,
            time_block=time_block,
        )
    if setup.mode in UD_KL_FUSED_MODES:
        return _neg_elbos_pallas_kl_ud(
            params, key, n_chains, ctx, setup, target,
            block=block, noise=noise, interpret=interpret,
            time_block=time_block,
        )
    spec = _PALLAS_SPECS[setup.mode]
    p = bounds.merged_params(params)
    dim = setup.dim

    z_key, e_key = jax.random.split(key)
    base = jax.random.normal(z_key, (n_chains, dim))
    mean, logdiag = p["vd"]["mean"], p["vd"]["logdiag"]
    z0 = mean + jnp.exp(logdiag) * base
    w0 = -diag_gaussian_log_prob(p["vd"], z0)

    betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
    seed = jax.random.randint(e_key, (), 0, jnp.iinfo(jnp.int32).max)

    theta = {
        "eps": p["eps"],
        "betas": betas,
        "vd_mean": mean,
        "vd_logdiag": logdiag,
    }
    if spec.fwd_sn or spec.bwd_sn:
        theta["sn"] = p["sn"]
    if spec.use_sn2_bwd:
        theta["sn2"] = p["sn2"]
    evolve = _make_evolve_kl(
        setup, target, n_chains, block, interpret, spec, bf16_net,
        time_block, bf16_residuals,
    )
    # z0 is DIFFERENTIABLE through evolve here (BPTT), unlike VarGrad.
    deltas, z_final = evolve(theta, z0, seed, noise)

    w = w0 + deltas + ctx.target_log_prob(z_final)
    return -w, z_final


def kl_bound_pallas(
    params,
    key,
    n_chains: int,
    ctx,
    setup: bounds.CMCDSetup,
    target,
    *,
    block: int | None = None,
    noise=None,
    interpret: bool = False,
    bf16_net: bool = False,
    time_block: int | None = None,
    bf16_residuals: bool = False,
):
    """KL training loss (mean negative ELBO) with fused Pallas forward AND
    reverse-sweep BPTT backward. Same contract as bounds.kl_bound
    (loss, (neg_elbos, z)) plus the target argument.

    bf16_net: reduced-precision sweep for large nets (LGCP-size) — see
    evolve_kl_bwd_pallas net_compute_dtype. Ignored off the split path.
    bf16_residuals: bf16 trajectory/noise/gsn stacks on the split path —
    see _make_evolve_kl. Ignored off the split path."""
    neg_elbos, z_final = neg_elbos_pallas_kl(
        params, key, n_chains, ctx, setup, target,
        block=block, noise=noise, interpret=interpret, bf16_net=bf16_net,
        time_block=time_block, bf16_residuals=bf16_residuals,
    )
    return jnp.mean(neg_elbos), (neg_elbos, z_final)


UD_KL_FUSED_MODES = frozenset(
    {
        "MCD_U_a-lp",
        "MCD_U_a-lp-sna",
        "MCD_U_a-lp-sn",
        "MCD_U_e-lp",
        "MCD_U_e-lp-sna",
        "MCD_U_ea-lp-sn",
        "MCD_CAIS_UHA_sn",
    }
)
KL_FUSED_MODES = (
    frozenset({"MCD_ULA", "MCD_ULA_sn", "MCD_CAIS_sn", "MCD_DNF", "UHA"})
    | UD_KL_FUSED_MODES
)


def var_bound_pallas(
    params,
    key,
    n_chains: int,
    ctx,
    setup: bounds.CMCDSetup,
    target,
    *,
    block: int | None = None,
    noise=None,
    interpret: bool = False,
    backward: str = "auto",
    bf16_net: bool = False,
):
    """VarGrad loss with fused Pallas forward AND backward.

    Same contract as bounds.var_bound (loss, (neg_elbos, z)) plus the target
    argument. Use under jax.grad / value_and_grad exactly like the scan loss.

    bf16_net=True runs the replay backward's score-net layer compute in
    bfloat16 (f32 MXU accumulation): the kernel is VPU-throughput-bound on
    the layer elementwise chains, and bf16 doubles VPU lanes. The gradient
    is NOT f32-exact (expect ~1e-2 relative; tests pin the tolerance) — an
    opt-in speed/precision trade, default off.
    """
    neg_elbos, z_final = neg_elbos_pallas(
        params, key, n_chains, ctx, setup, target,
        block=block, noise=noise, interpret=interpret, backward=backward,
        bf16_net=bf16_net,
    )
    loss = jnp.clip(jnp.var(neg_elbos, ddof=0), -1e7, 1e7)
    return loss, (neg_elbos, z_final)
