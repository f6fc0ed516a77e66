"""Fused Pallas time-stepping kernel for UHA (uncorrected Hamiltonian
annealing, integrators/uha.py).

Per bridge: partial momentum refresh against the trainable momentum
distribution N(0, e^{2 md}), an lfsteps leapfrog under the annealed
potential, and the weight update w += log N(rho_new; md) - log N(rho; md)
(the Sum(md) normalizers cancel in the difference, leaving a pure quadratic
form). Same machinery as the other kernels: (dim_pad, B) layout, whole loop
on-core, in-kernel Box-Muller PRNG, constants hoisted via make_jaxpr.

The Delta-H diagnostic of the scan path (src/ais_utils.py:38-55) is not
reproduced in-kernel (diagnostic only; use the scan path for it).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmcd_tpu.ops.kernel_common import (
    normalize_time_block,
    vmem_limit_params,
)
from cmcd_tpu.ops.pallas_overdamped import LANE, _box_muller, _round_up


def evolve_uha_pallas(
    z0,
    betas,
    eps,
    eta,
    md_logscale,
    vd_mean,
    vd_logdiag,
    grad_logp_t: Callable,
    *,
    dim: int,
    nbridges: int,
    lfsteps: int = 1,
    seed=0,
    block: int = 512,
    noise: Optional[jnp.ndarray] = None,
    return_state_t: bool = False,
    time_block: Optional[int] = None,
    interpret: bool = False,
):
    """Run nbridges UHA bridges fused on-core. z0: (N, dim).

    noise: optional (nbridges + 1, N, dim) — noise[0] the initial momentum
    base draw, noise[1:] per-bridge refresh draws.
    Returns (z_final (N, dim), w_delta (N,)).

    return_state_t: additionally return (z_traj_t, rho_traj_t, noise_out_t),
    each (nbridges + 1, dim_pad, n_pad) raw transposed — entry j the state
    BEFORE bridge j (entry K final); noise index 0 the initial momentum BASE
    draw, i + 1 the bridge-i refresh. Residuals for the UHA BPTT
    reverse-sweep backward (ops/pallas_kl.py).

    time_block (with return_state_t): TIME-CHUNK the stored windows like the
    underdamped rollout — a (nblocks, nt) grid with (z, rho, w) carried in
    VMEM scratch. Chunked layouts hold K rows: z/rho trajectories rows
    0..K-1 (state BEFORE bridge j; the final state exits via out_z only —
    UHA has no endpoint momentum correction, so the backward never needs
    rho_K), and the noise stack holds the bridge-j refresh draw UNSHIFTED
    at row j (the initial BASE draw is not stored: the backward's md
    correction reads rho_0 = e^{md} xi_0 from rtraj row 0 directly).
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

    z0_t = jnp.zeros((dim_pad, n_pad), jnp.float32).at[:dim, :n].set(z0.T)
    mean_t = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(vd_mean)
    inv_var_t = (
        jnp.zeros((dim_pad, 1), jnp.float32)
        .at[:dim, 0]
        .set(jnp.exp(-2.0 * vd_logdiag))
    )
    # Momentum distribution stats (logscale md): exp(md) and e^{-2 md}.
    exp_md = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(
        jnp.exp(md_logscale)
    )
    inv_var_md = jnp.zeros((dim_pad, 1), jnp.float32).at[:dim, 0].set(
        jnp.exp(-2.0 * md_logscale)
    )
    row_mask = (jnp.arange(dim_pad) < dim).astype(jnp.float32)[:, None]
    betas_smem = jnp.asarray(betas, jnp.float32).reshape(1, nbridges)
    scalars = jnp.stack(
        [jnp.asarray(eps, jnp.float32), jnp.asarray(eta, jnp.float32)]
    ).reshape(1, 2)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    inject_noise = noise is not None
    if inject_noise:
        if chunked:
            # Chunked layout: row j = bridge-j refresh draw; the initial
            # BASE draw enters as its own (dim_pad, n_pad) input.
            noise_t = (
                jnp.zeros((nbridges, dim_pad, n_pad), jnp.float32)
                .at[:, :dim, :n]
                .set(jnp.swapaxes(noise[1:], 1, 2))
            )
            base0_t = (
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

    def grad_u_t(z, beta):
        gt = grad_logp_t(z)
        gq = -(z - mean_t) * inv_var_t
        return -(beta * gt + (1.0 - beta) * gq) * row_mask

    def momentum_quad(rho):
        """-2 log N(rho; 0, e^md) without normalizers: Sum rho^2 e^{-2md}."""
        return jnp.sum(rho * rho * inv_var_md * row_mask, axis=0, keepdims=True)

    def step_core(z, rho_prev, w, xi, i, beta, eps0, eta0):
        rho = eta0 * rho_prev + jnp.sqrt(1.0 - eta0**2) * (exp_md * xi)

        # Leapfrog: half kick, (lfsteps-1) full alternations, half kick.
        # grad K(rho) = rho e^{-2 md} (reference src/ais_utils.py:26-57).
        rho_l = rho - eps0 * grad_u_t(z, beta) / 2.0
        z_l = z + eps0 * (rho_l * inv_var_md)
        for _ in range(lfsteps - 1):
            rho_l = rho_l - eps0 * grad_u_t(z_l, beta)
            z_l = z_l + eps0 * (rho_l * inv_var_md)
        rho_new = rho_l - eps0 * grad_u_t(z_l, beta) / 2.0

        w = w - 0.5 * (momentum_quad(rho_new) - momentum_quad(rho))
        return z_l, rho_new, w

    example = (
        jax.ShapeDtypeStruct((dim_pad, block), jnp.float32),  # z
        jax.ShapeDtypeStruct((dim_pad, block), jnp.float32),  # rho_prev
        jax.ShapeDtypeStruct((1, block), jnp.float32),        # w
        jax.ShapeDtypeStruct((dim_pad, block), jnp.float32),  # xi
        jax.ShapeDtypeStruct((), jnp.int32),                  # i
        jax.ShapeDtypeStruct((), jnp.float32),                # beta
        jax.ShapeDtypeStruct((), jnp.float32),                # eps
        jax.ShapeDtypeStruct((), jnp.float32),                # eta
    )
    closed_jaxpr = jax.make_jaxpr(step_core)(*example)
    step_consts = closed_jaxpr.consts
    n_step_args = len(example)

    def step_conv(*all_args):
        args = all_args[:n_step_args]
        consts = all_args[n_step_args:]
        return tuple(jax.core.eval_jaxpr(closed_jaxpr.jaxpr, consts, *args))

    def pack_consts(raw):
        shapes, arrays = [], []
        for c in raw:
            c = jnp.asarray(c)
            if c.dtype == jnp.float64:
                c = c.astype(jnp.float32)
            if c.ndim == 0:
                c = c.reshape(1, 1)
                shapes.append(("scalar", c.shape))
            elif c.ndim == 1:
                c = c.reshape(1, -1)
                shapes.append(("vec", c.shape))
            else:
                shapes.append(("arr", c.shape))
            arrays.append(c)
        return shapes, arrays

    const_shapes, const_inputs = pack_consts(step_consts)
    exp_md_in = exp_md  # also needed outside step_core for the initial draw

    def kernel(*refs):
        idx = 0
        betas_ref = refs[idx]; idx += 1
        scal_ref = refs[idx]; idx += 1
        seed_ref = refs[idx]; idx += 1
        z_ref = refs[idx]; idx += 1
        expmd_ref = refs[idx]; idx += 1
        noise_ref = base0_ref = None
        if inject_noise:
            noise_ref = refs[idx]; idx += 1
            if chunked:
                base0_ref = refs[idx]; idx += 1
        const_refs = refs[idx : idx + len(const_inputs)]
        idx += len(const_inputs)
        out_z_ref = refs[idx]; idx += 1
        out_w_ref = refs[idx]; idx += 1
        ztraj_ref = rtraj_ref = nout_ref = None
        if return_state_t:
            ztraj_ref = refs[idx]; idx += 1
            rtraj_ref = refs[idx]; idx += 1
            nout_ref = refs[idx]; idx += 1
        if chunked:
            # Chain-state carries across the sequential time-chunk grid.
            s_z = refs[idx]; idx += 1
            s_rho = refs[idx]; idx += 1
            s_w = refs[idx]; idx += 1

        eps0 = scal_ref[0, 0]
        eta0 = scal_ref[0, 1]

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
            if inject_noise:
                base0 = base0_ref[:] if chunked else noise_ref[0]
            else:
                base0 = _box_muller((dim_pad, block)) * row_mask_k
            rho0 = expmd_ref[:] * base0
            w0 = z0_v[0:1, :] * 0.0
            return z0_v, rho0, w0, base0

        if chunked:
            @pl.when(pid_t == 0)
            def _init_carry():
                z0_v, rho0, w0, _ = init_state()
                s_z[:] = z0_v
                s_rho[:] = rho0
                s_w[:] = jnp.broadcast_to(w0, (8, block))

            z, rho, w = s_z[:], s_rho[:], s_w[0:1, :]
        else:
            z, rho, w, base0 = init_state()
            if return_state_t:
                nout_ref[0] = base0

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
            return step_conv(z, rho, w, xi, i, beta, eps0, eta0, *consts)

        z, rho, w = jax.lax.fori_loop(0, t_block, body, (z, rho, w))

        if chunked:
            s_z[:] = z
            s_rho[:] = rho
            s_w[:] = jnp.broadcast_to(w, (8, block))

            @pl.when(pid_t == nt - 1)
            def _emit():
                out_z_ref[:] = z
                out_w_ref[:] = jnp.broadcast_to(w, (8, block))
        else:
            if return_state_t:
                ztraj_ref[nbridges] = z
                rtraj_ref[nbridges] = rho
            out_z_ref[:] = z
            out_w_ref[:] = jnp.broadcast_to(w, (8, block))

    in_specs = [
        pl.BlockSpec((1, nbridges), lambda i, t=0: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda i, t=0: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i, t=0: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((dim_pad, block), lambda i, t=0: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((dim_pad, 1), lambda i, t=0: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [betas_smem, scalars, seed_arr, z0_t, exp_md_in]
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
            inputs.append(base0_t)
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
        traj_rows = nbridges if chunked else nbridges + 1
        for _ in range(3):
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
    if return_state_t:
        return out_z_t[:dim, :n].T, out_w[0, :n], outs[2], outs[3], outs[4]
    return out_z_t[:dim, :n].T, out_w[0, :n]
