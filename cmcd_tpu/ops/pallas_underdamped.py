"""Fused Pallas time-stepping kernel for the underdamped (leapfrog) SDE.

Companion to ops/pallas_overdamped.py covering the underdamped family
(integrators/underdamped.py): OU/exact momentum refresh, one leapfrog step
per bridge, score-network-corrected backward momentum kernels, endpoint
momentum corrections. Same design: (dim_pad, B) transposed layout, whole
bridge loop on-core, in-kernel Box-Muller PRNG, constants hoisted to inputs
via make_jaxpr.

The score net for "full" modes sees concat[z, rho'] — assembled with
selector matmuls like the overdamped kernel's state/embedding concat.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmcd_tpu.integrators.underdamped import UnderdampedSpec
from cmcd_tpu.ops.kernel_common import (
    normalize_time_block,
    vmem_limit_params,
)
import math

from cmcd_tpu.ops.pallas_overdamped import (
    LANE,
    _box_muller,
    _round_up,
)

# Python float (a 0-d jnp array would be captured as a kernel constant).
LOG_2PI = math.log(2.0 * math.pi)


def pack_geffner_ud_t(sn_params, dim: int, dim_pad: int, full_sn: bool):
    """Transpose/pad geffner params for underdamped inputs.

    full_sn: net input is concat[z, rho] (rho_dim = dim); otherwise z only.
    Returns (weights, meta) like pack_geffner_t.
    """
    layers = [(l["w"].T, l["b"][:, None]) for l in sn_params["layers"]]
    head_w = sn_params["head"]["w"].T  # (dim, in)
    head_b = sn_params["head"]["b"][:, None]
    in_dim = head_w.shape[1]
    head_w = jnp.zeros((dim_pad, in_dim)).at[:dim].set(head_w)
    head_b = jnp.zeros((dim_pad, 1)).at[:dim].set(head_b)
    weights = {
        "layers": layers,
        "head": (head_w, head_b),
        "emb_t": sn_params["emb"].T,
        "factor_sn": sn_params["factor_sn"],
    }
    meta = {
        "emb_dim": sn_params["emb"].shape[1],
        "nbridges": sn_params["emb"].shape[0],
        "in_dim": in_dim,
        "full_sn": full_sn,
    }
    return weights, meta


def evolve_underdamped_pallas(
    z0,
    betas,
    eps,
    gamma,
    eta,
    vd_mean,
    vd_logdiag,
    grad_logp_t: Callable,
    spec: UnderdampedSpec,
    *,
    dim: int,
    nbridges: int,
    sn_weights=None,
    sn_meta=None,
    seed=0,
    block: int = 512,
    noise: Optional[jnp.ndarray] = None,
    return_state_t: bool = False,
    time_block: Optional[int] = None,
    interpret: bool = False,
):
    """Run nbridges underdamped leapfrog steps fused on-core.

    z0: (N, dim). noise: optional (nbridges + 1, N, dim) pre-drawn normals —
    noise[0] is the initial momentum draw, noise[1:] the per-step refresh
    draws (for equivalence tests; the scan path's fold_in stream uses index
    nbridges for the initial draw, so callers build this accordingly).
    Returns (z_final (N, dim), w_delta (N,)) with the endpoint momentum
    corrections included.

    return_state_t: additionally return (z_traj_t, rho_traj_t, noise_out_t)
    in the raw transposed layout — z/rho trajectories as
    (nbridges + 1, dim_pad, n_pad) (entry j is the state BEFORE step j;
    entry K the final state) and the noise draws as
    (nbridges + 1, dim_pad, n_pad) in the injected-noise layout (index 0 the
    initial momentum, i + 1 the step-i refresh). The residuals of the
    underdamped BPTT reverse-sweep backward kernel (ops/pallas_kl.py).

    time_block (with return_state_t): TIME-CHUNK the stored windows like the
    overdamped rollout — a (nblocks, nt) grid whose per-program windows hold
    t_block rows, with (z, rho, w) carried across chunks in VMEM scratch.
    The chunked layouts differ: z/rho trajectories hold rows 0..K-1 (K rows;
    the final state exits via the extra rho_final output and the usual
    z_final), and the noise stack holds xi_0..xi_{K-1} UNSHIFTED at row j
    (the initial momentum draw is not stored — its gradient dies). Returns
    (z_final, w_delta, ztraj_t, rtraj_t, noise_out_t, rho_final_t).
    """
    n, d = z0.shape
    assert d == dim
    dim_pad = max(8, _round_up(dim, 8))
    block = _round_up(block, LANE)
    n_pad = _round_up(n, block)
    nblocks = n_pad // block

    chunked = bool(
        return_state_t and time_block is not None and time_block < nbridges
    )
    if chunked:
        t_block = normalize_time_block(nbridges, time_block)
        nt = nbridges // t_block
    else:
        t_block = nbridges
        nt = 1

    use_sn = spec.fwd_sn or spec.bwd_sn != "none"
    if use_sn:
        assert sn_weights is not None and sn_meta is not None
        emb_dim = sn_meta["emb_dim"]
        in_dim = sn_meta["in_dim"]
        sn_nbridges = sn_meta["nbridges"]
        full = sn_meta["full_sn"]

    z0_t = jnp.zeros((dim_pad, n_pad), jnp.float32).at[:dim, :n].set(z0.T)
    mean_t = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_mean)
    inv_var_t = (
        jnp.zeros((dim_pad, 1), jnp.float32)
        .at[:dim, 0]
        .set(jnp.exp(-2.0 * vd_logdiag))
    )
    row_mask = (jnp.arange(dim_pad) < dim).astype(jnp.float32)[:, None]
    betas_smem = jnp.asarray(betas, jnp.float32).reshape(1, nbridges)
    factor_sn = sn_weights["factor_sn"] if use_sn else 0.0
    scalars = jnp.stack(
        [
            jnp.asarray(eps, jnp.float32),
            jnp.asarray(factor_sn, jnp.float32),
            jnp.asarray(gamma, jnp.float32),
            jnp.asarray(eta, jnp.float32),
        ]
    ).reshape(1, 4)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    inject_noise = noise is not None
    if inject_noise:
        if chunked:
            # Chunked layout: xi_0..xi_{K-1} only (row j = step-j refresh);
            # the initial momentum draw enters as its own (dim_pad, n_pad)
            # input.
            noise_t = (
                jnp.zeros((nbridges, dim_pad, n_pad), jnp.float32)
                .at[:, :dim, :n]
                .set(jnp.swapaxes(noise[1:], 1, 2))
            )
            rho0_t = (
                jnp.zeros((dim_pad, n_pad), jnp.float32)
                .at[:dim, :n]
                .set(noise[0].T)
            )
        else:
            noise_t = (
                jnp.zeros((nbridges + 1, dim_pad, n_pad), jnp.float32)
                .at[:, :dim, :n]
                .set(jnp.swapaxes(noise, 1, 2))
            )

    # CAIS underdamped hardcodes target clip 1e2, vd unclipped
    # (src/mcd_under_lp_a_cais.py:23-29); other modes are unclipped.
    clip_t = 1e2 if spec.cais else None

    def grad_u_t(z, beta):
        gt = grad_logp_t(z)
        gq = -(z - mean_t) * inv_var_t
        if clip_t is not None:
            gt = jnp.clip(gt, -clip_t, clip_t)
        return -(beta * gt + (1.0 - beta) * gq) * row_mask

    def sn_apply(z, rho, i, factor):
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (sn_nbridges, 1), 0)
            == jnp.clip(i, 0, sn_nbridges - 1)
        ).astype(jnp.float32)
        emb_col = jnp.dot(
            sn_weights["emb_t"], onehot, preferred_element_type=jnp.float32
        )
        # h0 = [z; (rho;) emb] by concatenation (VPU) instead of selector
        # matmuls — each matmul costs B MXU cycles regardless of row count.
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
        for w_t, b_col in sn_weights["layers"]:
            h = h + jax.nn.softplus(
                jnp.dot(w_t, h, preferred_element_type=jnp.float32) + b_col
            )
        head_w, head_b = sn_weights["head"]
        out = jnp.dot(head_w, h, preferred_element_type=jnp.float32) + head_b
        return out * factor

    def masked_sq(x):
        return jnp.sum(x * x * row_mask, axis=0, keepdims=True)

    def step_core(z, rho, w, xi, i, beta, eps0, factor, gamma_v, eta_v):
        if spec.cais:
            fi = i.astype(jnp.float32)
            eps_i = eps0 * jnp.cos((fi / nbridges + 0.008) / 1.008 * 0.5 * jnp.pi) ** 2
        else:
            eps_i = eps0

        if spec.refresh == "approx":
            eta_aux = gamma_v * eps_i
            fk_mean = rho * (1.0 - eta_aux)
            fwd_scale = jnp.sqrt(2.0 * eta_aux)
            bwd_scale = fwd_scale
        elif spec.refresh == "exact":
            fk_mean = eta_v * rho
            fwd_scale = jnp.sqrt(1.0 - eta_v**2)
            bwd_scale = fwd_scale
        else:  # exact_fwd
            eta_aux = gamma_v * eps0
            eta_e = jnp.exp(-eta_aux)
            fk_mean = eta_e * rho
            fwd_scale = jnp.sqrt(1.0 - eta_e**2)
            bwd_scale = jnp.sqrt(2.0 * eta_aux)

        if spec.fwd_sn:
            fk_mean = fk_mean - 2.0 * eta_aux * sn_apply(z, rho, i, factor)

        rho_prime = fk_mean + fwd_scale * xi

        rho_pp = rho_prime - eps_i * grad_u_t(z, beta) / 2.0
        z_new = z + eps_i * rho_pp
        rho_new = rho_pp - eps_i * grad_u_t(z_new, beta) / 2.0

        if spec.refresh == "exact":
            bk_mean = eta_v * rho_prime
            gain = 2.0 * (1.0 - eta_v)
        else:
            bk_mean = rho_prime * (1.0 - eta_aux)
            gain = 2.0 * eta_aux
        if spec.bwd_sn == "state":
            bk_mean = bk_mean + gain * sn_apply(z, None, i, factor)
        elif spec.bwd_sn == "full":
            bk_mean = bk_mean + gain * sn_apply(z, rho_prime, i, factor)

        # log B - log F with (possibly asymmetric) scales: normalizers kept.
        fk_lp = -0.5 * masked_sq(xi) - dim * (
            0.5 * LOG_2PI + jnp.log(fwd_scale)
        )
        bk_lp = -0.5 * masked_sq((rho - bk_mean) / bwd_scale) - dim * (
            0.5 * LOG_2PI + jnp.log(bwd_scale)
        )
        return z_new, rho_new, w + (bk_lp - fk_lp)

    example = (
        jax.ShapeDtypeStruct((dim_pad, block), jnp.float32),  # z
        jax.ShapeDtypeStruct((dim_pad, block), jnp.float32),  # rho
        jax.ShapeDtypeStruct((1, block), jnp.float32),        # w
        jax.ShapeDtypeStruct((dim_pad, block), jnp.float32),  # xi
        jax.ShapeDtypeStruct((), jnp.int32),                  # i
        jax.ShapeDtypeStruct((), jnp.float32),                # beta
        jax.ShapeDtypeStruct((), jnp.float32),                # eps0
        jax.ShapeDtypeStruct((), jnp.float32),                # factor
        jax.ShapeDtypeStruct((), jnp.float32),                # gamma
        jax.ShapeDtypeStruct((), jnp.float32),                # eta
    )
    closed_jaxpr = jax.make_jaxpr(step_core)(*example)
    step_consts = closed_jaxpr.consts
    n_step_args = len(example)

    def step_conv(*all_args):
        args = all_args[:n_step_args]
        consts = all_args[n_step_args:]
        return tuple(jax.core.eval_jaxpr(closed_jaxpr.jaxpr, consts, *args))

    const_shapes = []
    const_inputs = []
    for c in step_consts:
        c = jnp.asarray(c)
        if c.dtype == jnp.float64:
            c = c.astype(jnp.float32)
        if c.ndim == 0:
            c = c.reshape(1, 1)
            const_shapes.append(("scalar", c.shape))
        elif c.ndim == 1:
            c = c.reshape(1, -1)
            const_shapes.append(("vec", c.shape))
        else:
            const_shapes.append(("arr", c.shape))
        const_inputs.append(c)

    def kernel(*refs):
        idx = 0
        betas_ref = refs[idx]; idx += 1
        scal_ref = refs[idx]; idx += 1
        seed_ref = refs[idx]; idx += 1
        z_ref = refs[idx]; idx += 1
        noise_ref = rho0_ref = None
        if inject_noise:
            noise_ref = refs[idx]; idx += 1
            if chunked:
                rho0_ref = refs[idx]; idx += 1
        const_refs = refs[idx : idx + len(const_inputs)]
        idx += len(const_inputs)
        out_z_ref = refs[idx]; idx += 1
        out_w_ref = refs[idx]; idx += 1
        ztraj_ref = rtraj_ref = nout_ref = out_rho_ref = None
        if return_state_t:
            ztraj_ref = refs[idx]; idx += 1
            rtraj_ref = refs[idx]; idx += 1
            nout_ref = refs[idx]; idx += 1
        if chunked:
            out_rho_ref = refs[idx]; idx += 1
            # Chain-state carries across the sequential time-chunk grid.
            s_z = refs[idx]; idx += 1
            s_rho = refs[idx]; idx += 1
            s_w = refs[idx]; idx += 1

        eps0 = scal_ref[0, 0]
        factor = scal_ref[0, 1]
        gamma_v = scal_ref[0, 2]
        eta_v = scal_ref[0, 3]

        pid = pl.program_id(0)
        pid_t = pl.program_id(1) if chunked else 0
        lo = pid_t * t_block
        if not inject_noise:
            # Distinct stream per (chain-block, time-chunk) program (with
            # nt=1 this is the original seed + pid assignment).
            pltpu.prng_seed(seed_ref[0, 0] + pid * nt + pid_t)

        consts = []
        for (kind, shape), ref in zip(const_shapes, const_refs):
            v = ref[:]
            if kind == "scalar":
                v = v[0, 0]
            elif kind == "vec":
                v = v[0]
            consts.append(v)

        row_mask_k = (
            jax.lax.broadcasted_iota(jnp.int32, (dim_pad, 1), 0) < dim
        ).astype(jnp.float32)

        def init_state():
            z0_v = z_ref[:]
            # Initial momentum ~ N(0, I) and its endpoint correction
            # (src/mcd_under_lp_a.py:65-71).
            if inject_noise:
                rho0 = rho0_ref[:] if chunked else noise_ref[0]
            else:
                rho0 = _box_muller((dim_pad, block))
            rho0 = rho0 * row_mask_k
            w0 = 0.5 * jnp.sum(
                rho0 * rho0 * row_mask_k, axis=0, keepdims=True
            ) + (0.5 * dim * LOG_2PI)
            return z0_v, rho0, w0

        if chunked:
            @pl.when(pid_t == 0)
            def _init_carry():
                z0_v, rho0, w0 = init_state()
                s_z[:] = z0_v
                s_rho[:] = rho0
                s_w[:] = jnp.broadcast_to(w0, (8, block))

            z, rho, w = s_z[:], s_rho[:], s_w[0:1, :]
        else:
            z, rho, w = init_state()
            if return_state_t:
                nout_ref[0] = rho

        def body(il, carry):
            z, rho, w = carry
            i = lo + il if chunked else il
            beta = betas_ref[0, i]
            if inject_noise:
                xi = noise_ref[il if chunked else i + 1]
            else:
                xi = _box_muller((dim_pad, block)) * row_mask_k
            if return_state_t:
                ztraj_ref[il] = z
                rtraj_ref[il] = rho
                nout_ref[il if chunked else i + 1] = xi
            return step_conv(
                z, rho, w, xi, i, beta, eps0, factor, gamma_v, eta_v, *consts
            )

        z, rho, w = jax.lax.fori_loop(0, t_block, body, (z, rho, w))

        def emit_final(z, rho, w):
            # Final momentum correction: w += log N(rho_K; 0, I).
            w = w - 0.5 * jnp.sum(
                rho * rho * row_mask_k, axis=0, keepdims=True
            ) - (0.5 * dim * LOG_2PI)
            out_z_ref[:] = z
            out_w_ref[:] = jnp.broadcast_to(w, (8, block))

        if chunked:
            s_z[:] = z
            s_rho[:] = rho
            s_w[:] = jnp.broadcast_to(w, (8, block))

            @pl.when(pid_t == nt - 1)
            def _emit():
                out_rho_ref[:] = rho
                emit_final(z, rho, w)
        else:
            if return_state_t:
                ztraj_ref[nbridges] = z
                rtraj_ref[nbridges] = rho
            emit_final(z, rho, w)

    in_specs = [
        pl.BlockSpec((1, nbridges), lambda i, t=0: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 4), lambda i, t=0: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i, t=0: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((dim_pad, block), lambda i, t=0: (0, i), memory_space=pltpu.VMEM),
    ]
    inputs = [betas_smem, scalars, seed_arr, z0_t]
    if inject_noise:
        if chunked:
            in_specs.append(
                pl.BlockSpec(
                    (t_block, dim_pad, block),
                    lambda i, t: (t, 0, i),
                    memory_space=pltpu.VMEM,
                )
            )
            inputs.append(noise_t)
            in_specs.append(
                pl.BlockSpec(
                    (dim_pad, block), lambda i, t: (0, i),
                    memory_space=pltpu.VMEM,
                )
            )
            inputs.append(rho0_t)
        else:
            in_specs.append(
                pl.BlockSpec(
                    (nbridges + 1, dim_pad, block),
                    lambda i, t=0: (0, 0, i),
                    memory_space=pltpu.VMEM,
                )
            )
            inputs.append(noise_t)
    for c in const_inputs:
        in_specs.append(
            pl.BlockSpec(
                c.shape, lambda i, t=0, nd=c.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(c)

    out_specs = [
        pl.BlockSpec((dim_pad, block), lambda i, t=0: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block), lambda i, t=0: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((dim_pad, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
    ]
    if return_state_t:
        # Chunked: K-row stacks windowed by time chunk (z/rho rows 0..K-1,
        # xi rows 0..K-1); single-window: whole (K+1)-row stacks.
        traj_rows = nbridges if chunked else nbridges + 1
        for _ in range(3):  # z traj, rho traj, noise draws
            out_specs.append(
                pl.BlockSpec(
                    (t_block if chunked else traj_rows, dim_pad, block),
                    (lambda i, t: (t, 0, i)) if chunked
                    else (lambda i, t=0: (0, 0, i)),
                    memory_space=pltpu.VMEM,
                )
            )
            out_shape.append(
                jax.ShapeDtypeStruct(
                    (traj_rows, dim_pad, n_pad), jnp.float32
                )
            )
    scratch_shapes = []
    if chunked:
        out_specs.append(
            pl.BlockSpec(
                (dim_pad, block), lambda i, t: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((dim_pad, n_pad), jnp.float32))
        scratch_shapes = [
            pltpu.VMEM((dim_pad, block), jnp.float32),  # z
            pltpu.VMEM((dim_pad, block), jnp.float32),  # rho
            pltpu.VMEM((8, block), jnp.float32),        # w
        ]

    kwargs = vmem_limit_params(
        inputs, out_shape, extra_bytes=10 * dim_pad * block * 4,
        interpret=interpret,
    )

    outs = pl.pallas_call(
        kernel,
        grid=(nblocks, nt) if chunked else (nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=(
            pltpu.InterpretParams() if (interpret and not inject_noise) else interpret
        ),
        **kwargs,
    )(*inputs)

    out_z_t, out_w = outs[0], outs[1]
    if return_state_t and chunked:
        return (
            out_z_t[:dim, :n].T, out_w[0, :n],
            outs[2], outs[3], outs[4], outs[5],
        )
    if return_state_t:
        return out_z_t[:dim, :n].T, out_w[0, :n], outs[2], outs[3], outs[4]
    return out_z_t[:dim, :n].T, out_w[0, :n]
