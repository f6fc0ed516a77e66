"""Fused Pallas time-stepping kernel for the overdamped annealed SDE.

The reference (and the XLA-scan path in integrators/overdamped.py) stages
each of the nbridges steps as separate small HBM-roundtripping ops; at the
flagship config (N=2000, K=256, dim=2) the step is latency-bound, not
FLOP-bound. This kernel runs the ENTIRE bridge loop on-core: chain state
(z), the running log-weight (w), the score-network weights, and the beta
schedule live in VMEM for all K steps; Gaussian noise comes from the
in-kernel PRNG (Box-Muller over pltpu.prng_random_bits).

Layout: chain state is (dim_pad, B) — chains on the 128-wide lane axis,
dimensions on sublanes — so the geffner score-net layers are dense
(in, in) @ (in, B) MXU matmuls and all elementwise SDE math is lane-parallel.
The per-bridge embedding lookup is a one-hot matmul (no dynamic lane
gathers), and the state/embedding concatenation is a pair of constant
selector matmuls.

All host-side constants the step math closes over (target constants, vd
params, selector matrices, packed net weights) are hoisted into kernel
inputs via jax.closure_convert, so nothing is baked into the compiled
kernel and weights can change between calls without recompilation.

Numerics match integrators/overdamped.py exactly given the same noise; the
PRNG stream differs (threefry vs TPU PRNG), so cross-path parity is
statistical. Both paths accept injected noise for bit-level equivalence
tests (tests/test_pallas.py).

Weight update per step (log B - log F with the scales cancelling):
    w += -0.5 * [ ||(z - bk_mean)/scale||^2 - ||noise||^2 ]
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmcd_tpu.integrators.overdamped import OverdampedSpec
from cmcd_tpu.ops.kernel_common import (
    normalize_time_block,
    vmem_limit_params,
)

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_geffner_t(sn_params, dim: int, dim_pad: int):
    """Transpose/pad geffner params (networks/geffner.py) for (in, B) applies.

    Returns (weights, meta). weights = {"layers": [(W_T, b_col), ...],
    "head": (W_T padded to dim_pad rows, b_col), "emb_t": (emb_dim, nbridges)}.
    """
    layers = [
        (layer["w"].T, layer["b"][:, None]) for layer in sn_params["layers"]
    ]
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
    }
    return weights, meta


def _bits_to_unit(bits):
    """int32 random bits -> float32 in [0, 1).

    Mosaic has no int->float cast; build the float bitwise: put 23 random
    bits in the mantissa with exponent 127 => [1, 2), then subtract 1.
    """
    mantissa = jax.lax.shift_right_logical(bits, 9) | jnp.int32(0x3F800000)
    return pltpu.bitcast(mantissa, jnp.float32) - 1.0


def _box_muller(shape):
    """Standard normals from the in-kernel PRNG (seed must be set)."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    u1 = 1.0 - _bits_to_unit(b1)  # (0, 1]
    u2 = _bits_to_unit(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def evolve_overdamped_pallas(
    z0,
    w0,
    betas,
    eps,
    vd_mean,
    vd_logdiag,
    grad_logp_t: Callable,
    spec: OverdampedSpec,
    *,
    dim: int,
    nbridges: int,
    sn_weights=None,
    sn_meta=None,
    sn2_weights=None,
    eps_schedule: str = "",
    grad_clipping: bool = False,
    seed=0,
    block: int = 512,
    noise: Optional[jnp.ndarray] = None,
    return_trajectory_t: bool = False,
    return_noise_t: bool = False,
    time_block: int | None = None,
    residual_dtype=jnp.float32,
    interpret: bool = False,
):
    """Run nbridges overdamped steps fused on-core.

    z0: (N, dim) initial chains; w0: (N,) initial log-weights.
    grad_logp_t: transposed-layout target score (dim_pad, B) -> (dim_pad, B)
    (ops/target_grads.py), traced INTO the kernel.
    sn_weights/sn_meta: from pack_geffner_t (None for plain ULA).
    noise: optional (nbridges, N, dim) pre-drawn normals for exact
    equivalence tests; None uses the in-kernel PRNG.
    return_trajectory_t: additionally return the FULL trajectory
    z_0..z_K in the kernel's raw transposed layout
    (nbridges + 1, dim_pad, n_pad) with NO host-side repacking — the input
    the batched replay backward kernel (ops/pallas_vargrad.py) streams from
    HBM.
    return_noise_t: additionally return the xi draws in the raw transposed
    layout (nbridges, dim_pad, n_pad) — with the trajectory, the residuals
    of the BPTT reverse-sweep backward kernel (ops/pallas_kl.py). Only
    meaningful with the in-kernel PRNG (when `noise` is injected the caller
    already holds it).
    residual_dtype: storage dtype of the trajectory/noise stacks (the
    kernel casts at store; chain state stays f32 on-core). bfloat16 halves
    the residual HBM traffic for the split reverse sweep's quality-gated
    reduced-precision path — requires dim_pad % 16 == 0 (bf16 sublane
    tiling), which every large-dim target satisfies.
    time_block: when set (and storing residuals), run a TIME-CHUNKED
    rollout — a second grid dimension over t_block-step windows with the
    chain state carried in VMEM scratch — so the stored trajectory/noise
    output windows (double-buffered by the Mosaic pipeline) stay bounded
    for large (K+1) x dim_pad stacks. In this mode the trajectory output
    has nbridges rows (z_0..z_{K-1}); the final state exits via the plain
    z_final output (the reverse sweep takes it as its z_final_t input).
    Returns (z_final (N, dim), w (N,)[, traj_t][, noise_t]).
    """
    n, d = z0.shape
    assert d == dim
    dim_pad = max(8, _round_up(dim, 8))
    residual_dtype = jnp.dtype(residual_dtype)
    if residual_dtype != jnp.float32:
        assert residual_dtype == jnp.dtype(jnp.bfloat16), residual_dtype
        assert dim_pad % 16 == 0, (
            f"bf16 residual stacks need dim_pad % 16 == 0, got {dim_pad}"
        )
    block = _round_up(block, LANE)
    n_pad = _round_up(n, block)
    nblocks = n_pad // block
    if (
        time_block is None
        or time_block >= nbridges
        or not (return_trajectory_t or return_noise_t)
    ):
        t_block = nbridges
    else:
        t_block = normalize_time_block(nbridges, time_block)
    nt = nbridges // t_block
    chunked = nt > 1

    use_sn = spec.fwd_sn or spec.bwd_sn
    arch = "geffner"
    if use_sn:
        assert sn_weights is not None and sn_meta is not None
        arch = sn_meta.get("arch", "geffner")
        in_dim = sn_meta["in_dim"]
        if arch == "geffner":
            emb_dim = sn_meta["emb_dim"]
            sn_nbridges = sn_meta["nbridges"]
        else:
            channels = sn_meta["channels"]

    # ---- host-side packing into the transposed layout -------------------
    z0_t = jnp.zeros((dim_pad, n_pad), jnp.float32).at[:dim, :n].set(z0.T)
    w0_rows = jnp.zeros((8, n_pad), jnp.float32).at[0, :n].set(w0)
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
        [jnp.asarray(eps, jnp.float32), jnp.asarray(factor_sn, jnp.float32)]
    ).reshape(1, 2)
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

    # CAIS-family structure (spec.bwd_sn_offset == 1): the backward kernel's
    # net call at (z_new, i+1) is IDENTICAL to the next step's forward call,
    # so the net output is computed once per new point and carried between
    # steps — halves the score-net matmuls (reference evaluates it twice,
    # src/mcd_cais.py:61,78). Not applicable to DNF, whose backward uses a
    # DIFFERENT net (sn2).
    carry_sn = bool(
        use_sn
        and spec.fwd_sn
        and spec.bwd_sn
        and spec.bwd_sn_offset == 1
        and not spec.use_sn2_bwd
    )
    if spec.use_sn2_bwd:
        assert sn2_weights is not None, "DNF needs the second net's weights"

    # MXU pass-packing: a small matmul costs the full column bandwidth
    # regardless of its row/contraction size, so when the target score
    # exposes its two matmul stages (grad_logp_t.stages, e.g. many_gmm) and
    # the net is the 2-residual-layer geffner, each target stage rides
    # block-diagonally with one net layer: 3 MXU passes per point instead
    # of 5. Bit-exact (the zero blocks contribute exact 0.0).
    staged = getattr(grad_logp_t, "stages", None)
    fuse_point = bool(
        carry_sn
        and arch == "geffner"
        and staged is not None
        and len(sn_weights["layers"]) == 2
    )
    if fuse_point:
        a_w = jnp.asarray(staged["a_w"], jnp.float32)      # (Ka, a_in)
        b_w = jnp.asarray(staged["b_w"], jnp.float32)      # (Kb, Ka)
        ka, a_in_dim = a_w.shape
        kb = b_w.shape[0]
        ka_pad = _round_up(ka, 8)
        a_in_pad = _round_up(a_in_dim, 8)
        kb_pad = _round_up(kb, 8)
        in_pad2 = _round_up(in_dim, 8)
        (w1, b1), (w2, b2) = sn_weights["layers"]
        packed_w1 = (
            jnp.zeros((ka_pad + in_pad2, a_in_pad + in_pad2))
            .at[:ka, :a_in_dim].set(a_w)
            .at[ka_pad : ka_pad + in_dim, a_in_pad : a_in_pad + in_dim].set(w1)
        )
        packed_w2 = (
            jnp.zeros((kb_pad + in_pad2, ka_pad + in_pad2))
            .at[:kb, :ka].set(b_w)
            .at[kb_pad : kb_pad + in_dim, ka_pad : ka_pad + in_dim].set(w2)
        )
        b1_pad = jnp.zeros((in_pad2, 1)).at[:in_dim].set(b1)
        b2_pad = jnp.zeros((in_pad2, 1)).at[:in_dim].set(b2)
        head_w_raw, head_b_raw = sn_weights["head"]
        head_pad = jnp.zeros((head_w_raw.shape[0], in_pad2)).at[:, :in_dim].set(
            head_w_raw
        )

    # ---- step math (closure-converted so constants become inputs) -------
    def sn_apply(z, i, factor, weights=None):
        weights = sn_weights if weights is None else weights
        if arch == "pis":
            from cmcd_tpu.ops.pallas_nets import pis_apply_t

            return pis_apply_t(weights, z, i, dim, channels)
        if arch == "pis_grad":
            from cmcd_tpu.ops.pallas_nets import pis_grad_apply_t

            return pis_grad_apply_t(
                weights, z, i, dim, channels, grad_logp_t, row_mask
            )
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (sn_nbridges, 1), 0)
            == jnp.clip(i, 0, sn_nbridges - 1)
        ).astype(jnp.float32)
        emb_col = jnp.dot(
            weights["emb_t"], onehot, preferred_element_type=jnp.float32
        )
        # Build h0 = [z[:dim]; emb broadcast] by concatenation (VPU) instead
        # of the two selector matmuls — each matmul costs B MXU cycles
        # regardless of its tiny row count, so this saves a full pass/step.
        h = jnp.concatenate(
            [z[:dim], jnp.broadcast_to(emb_col, (emb_dim, z.shape[1]))], axis=0
        )
        if in_dim > dim + emb_dim:
            h = jnp.concatenate(
                [h, jnp.zeros((in_dim - dim - emb_dim, z.shape[1]), z.dtype)],
                axis=0,
            )
        for w_t, b_col in weights["layers"]:
            h = h + jax.nn.softplus(
                jnp.dot(w_t, h, preferred_element_type=jnp.float32) + b_col
            )
        head_w, head_b = weights["head"]
        out = jnp.dot(head_w, h, preferred_element_type=jnp.float32) + head_b
        return out * factor

    def _h0_of(z, emb_col, pad_to):
        b_cols = z.shape[1]
        h = jnp.concatenate(
            [z[:dim], jnp.broadcast_to(emb_col, (emb_dim, b_cols))], axis=0
        )
        if pad_to > dim + emb_dim:
            h = jnp.concatenate(
                [h, jnp.zeros((pad_to - dim - emb_dim, b_cols), z.dtype)], axis=0
            )
        return h

    def point_eval(z, i, factor):
        """(target score, net output) at one point in 3 MXU passes (the two
        block-diagonal packed passes + the head)."""
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (sn_nbridges, 1), 0)
            == jnp.clip(i, 0, sn_nbridges - 1)
        ).astype(jnp.float32)
        emb_col = jnp.dot(
            sn_weights["emb_t"], onehot, preferred_element_type=jnp.float32
        )
        b_cols = z.shape[1]
        h0 = _h0_of(z, emb_col, in_pad2)
        a_in = staged["a_in"](z)  # (a_in_dim, B)
        if a_in_pad > a_in_dim:
            a_in = jnp.concatenate(
                [a_in, jnp.zeros((a_in_pad - a_in_dim, b_cols), z.dtype)], axis=0
            )
        s = jnp.dot(
            packed_w1,
            jnp.concatenate([a_in, h0], axis=0),
            preferred_element_type=jnp.float32,
        )
        r = staged["mid"](s[:ka])
        h1 = h0 + jax.nn.softplus(s[ka_pad : ka_pad + in_pad2] + b1_pad)
        if ka_pad > ka:
            r = jnp.concatenate(
                [r, jnp.zeros((ka_pad - ka, b_cols), z.dtype)], axis=0
            )
        s2 = jnp.dot(
            packed_w2,
            jnp.concatenate([r, h1], axis=0),
            preferred_element_type=jnp.float32,
        )
        gt = staged["fin"](s2[:kb], z)
        h2 = h1 + jax.nn.softplus(s2[kb_pad : kb_pad + in_pad2] + b2_pad)
        out = (
            jnp.dot(head_pad, h2, preferred_element_type=jnp.float32)
            + head_b_raw
        )
        return gt, out * factor

    def grad_u_from(gt, z, beta):
        """Annealed drift from a precomputed raw target score gt."""
        if spec.zero_drift:
            return jnp.zeros_like(z)
        gq = -(z - mean_t) * inv_var_t
        if clip_t is not None:
            gt = jnp.clip(gt, -clip_t, clip_t)
        if clip_q is not None:
            gq = jnp.clip(gq, -clip_q, clip_q)
        return -(beta * gt + (1.0 - beta) * gq) * row_mask

    def eps_at(eps0, i):
        fi = i.astype(jnp.float32)
        if eps_schedule == "cos_sq":
            phase = fi / nbridges
            return eps0 * jnp.cos((phase + 0.008) / 1.008 * 0.5 * jnp.pi) ** 2
        if eps_schedule == "linear":
            return (1e-4 - eps0) / (nbridges - 1) * fi + eps0
        return eps0

    def step_core(z, gt, sn_cur, w, xi, i, beta, eps0, factor):
        """One bridge step. gt is the raw target score at z, carried between
        steps so the (dominant) target-score evaluation happens once per new
        point instead of twice per step; sn_cur is the carried net output at
        (z, i) for CAIS-family specs (zeros otherwise). Returns the score
        (and net output) at z_new."""
        eps_i = eps_at(eps0, i)
        scale = jnp.sqrt(2.0 * eps_i)

        fk_mean = z - eps_i * grad_u_from(gt, z, beta)
        if spec.fwd_sn:
            sn_fwd = sn_cur if carry_sn else sn_apply(z, i, factor)
            fk_mean = fk_mean - eps_i * sn_fwd
        z_new = fk_mean + scale * xi

        sn_new = sn_cur
        if fuse_point:
            gt_new, sn_new = point_eval(z_new, i + spec.bwd_sn_offset, factor)
        else:
            gt_new = (
                jnp.zeros_like(z_new) if spec.zero_drift
                else grad_logp_t(z_new)
            )
            if spec.bwd_sn:
                if spec.use_sn2_bwd:
                    # DNF: the backward mean uses the SECOND net (with its
                    # own factor), reference src/vi_dnf.py.
                    sn_new = sn_apply(
                        z_new,
                        i + spec.bwd_sn_offset,
                        sn2_weights["factor_sn"],
                        weights=sn2_weights,
                    )
                else:
                    sn_new = sn_apply(z_new, i + spec.bwd_sn_offset, factor)
        bk_mean = z_new - eps_i * grad_u_from(gt_new, z_new, beta)
        if spec.bwd_sn:
            bk_mean = bk_mean + eps_i * sn_new

        resid = (z - bk_mean) * (1.0 / scale)
        delta = -0.5 * (
            jnp.sum(resid * resid * row_mask, axis=0, keepdims=True)
            - jnp.sum(xi * xi * row_mask, axis=0, keepdims=True)
        )
        return z_new, gt_new, sn_new, w + delta

    example = (
        jax.ShapeDtypeStruct((dim_pad, block), jnp.float32),  # z
        jax.ShapeDtypeStruct((dim_pad, block), jnp.float32),  # gt
        jax.ShapeDtypeStruct((dim_pad, block), jnp.float32),  # sn_cur
        jax.ShapeDtypeStruct((1, block), jnp.float32),        # w
        jax.ShapeDtypeStruct((dim_pad, block), jnp.float32),  # xi
        jax.ShapeDtypeStruct((), jnp.int32),                  # i
        jax.ShapeDtypeStruct((), jnp.float32),                # beta
        jax.ShapeDtypeStruct((), jnp.float32),                # eps0
        jax.ShapeDtypeStruct((), jnp.float32),                # factor
    )
    # Trace the step once; its jaxpr constants (target constants, vd params,
    # net weights, selectors) become explicit kernel inputs, re-bound on
    # every call — nothing is baked into the compiled kernel.
    closed_jaxpr = jax.make_jaxpr(step_core)(*example)
    step_consts = closed_jaxpr.consts

    def step_conv(z, gt, sn_cur, w, xi, i, beta, eps0, factor, *consts):
        out = jax.core.eval_jaxpr(
            closed_jaxpr.jaxpr, consts, z, gt, sn_cur, w, xi, i, beta, eps0, factor
        )
        return tuple(out)

    # Initial target score gt(z_0) (+ the net output at (z_0, 0) when the
    # CAIS carry is active): its own jaxpr so its constants are also
    # explicit inputs (duplicates of the step consts are cheap and rare).
    def init_fn(z, factor):
        if fuse_point:
            return point_eval(z, 0, factor)
        gt0 = jnp.zeros_like(z) if spec.zero_drift else grad_logp_t(z)
        sn0 = sn_apply(z, 0, factor) if carry_sn else jnp.zeros_like(z)
        return gt0, sn0

    init_jaxpr = jax.make_jaxpr(init_fn)(
        example[0], jax.ShapeDtypeStruct((), jnp.float32)
    )
    init_consts_raw = init_jaxpr.consts

    # 0-d consts can't be VMEM inputs; lift them to (1, 1).
    def pack_consts(raw):
        shapes, arrays = [], []
        for c in raw:
            c = jnp.asarray(c, jnp.float32 if c.dtype == jnp.float64 else c.dtype)
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

    # The init jaxpr closes over the SAME arrays as the step jaxpr (net
    # weights, target constants) — intern by object identity so each enters
    # the kernel ONCE (for LGCP the weights are ~40 MB; duplicating them
    # doubles the kernel's VMEM footprint).
    _interned, _ids = [], {}

    def _intern(c):
        k = id(c)
        if k not in _ids:
            _ids[k] = len(_interned)
            _interned.append(c)
        return _ids[k]

    step_const_map = [_intern(c) for c in step_consts]
    init_const_map = [_intern(c) for c in init_consts_raw]
    const_shapes, const_inputs = pack_consts(_interned)

    def kernel(*refs):
        idx = 0
        betas_ref = refs[idx]; idx += 1
        scal_ref = refs[idx]; idx += 1
        seed_ref = refs[idx]; idx += 1
        z_ref = refs[idx]; idx += 1
        w_ref = refs[idx]; idx += 1
        noise_ref = None
        if inject_noise:
            noise_ref = refs[idx]; idx += 1
        const_refs = refs[idx : idx + len(const_inputs)]
        idx += len(const_inputs)
        out_z_ref = refs[idx]; idx += 1
        out_w_ref = refs[idx]; idx += 1
        traj_ref = None
        if return_trajectory_t:
            traj_ref = refs[idx]; idx += 1
        noise_out_ref = None
        if return_noise_t:
            noise_out_ref = refs[idx]; idx += 1
        if chunked:
            # Persistent chain-state carries across the time-chunk grid.
            s_z = refs[idx]; idx += 1
            s_gt = refs[idx]; idx += 1
            s_sn = refs[idx]; idx += 1
            s_w = refs[idx]; idx += 1

        eps0 = scal_ref[0, 0]
        factor = scal_ref[0, 1]

        pid = pl.program_id(0)
        pid_t = pl.program_id(1)
        lo = pid_t * t_block
        if not inject_noise:
            # Distinct stream per (chain-block, time-chunk) program (with
            # nt=1 this is the original seed + pid stream assignment).
            pltpu.prng_seed(seed_ref[0, 0] + pid * nt + pid_t)

        def unpack(shapes, refs_):
            vals = []
            for (kind, shape), ref in zip(shapes, refs_):
                v = ref[:]
                if kind == "scalar":
                    v = v[0, 0]
                elif kind == "vec":
                    v = v[0]
                vals.append(v)
            return vals

        all_consts = unpack(const_shapes, const_refs)
        consts = [all_consts[i] for i in step_const_map]
        init_consts = [all_consts[i] for i in init_const_map]

        def body(il, carry):
            z, gt, sn_cur, w = carry
            i = lo + il if chunked else il
            if return_trajectory_t:
                traj_ref[il] = z.astype(residual_dtype)
            beta = betas_ref[0, i]
            if inject_noise:
                xi = noise_ref[il]
            else:
                xi = _box_muller((dim_pad, block))
            if return_noise_t:
                noise_out_ref[il] = xi.astype(residual_dtype)
            return step_conv(z, gt, sn_cur, w, xi, i, beta, eps0, factor, *consts)

        if chunked:
            @pl.when(pid_t == 0)
            def _init_state():
                s_z[:] = z_ref[:]
                s_w[:] = w_ref[:]
                gt0_, sn0_ = jax.core.eval_jaxpr(
                    init_jaxpr.jaxpr, init_consts, z_ref[:], factor
                )
                s_gt[:] = gt0_
                s_sn[:] = sn0_

            z, gt0, sn0, w = s_z[:], s_gt[:], s_sn[:], s_w[0:1, :]
        else:
            z = z_ref[:]
            w = w_ref[0:1, :]
            gt0, sn0 = jax.core.eval_jaxpr(
                init_jaxpr.jaxpr, init_consts, z, factor
            )
        z, gt, sn_c, w = jax.lax.fori_loop(
            0, t_block, body, (z, gt0, sn0, w)
        )
        if chunked:
            s_z[:] = z
            s_gt[:] = gt
            s_sn[:] = sn_c
            s_w[:] = jnp.broadcast_to(w, (8, block))

            @pl.when(pid_t == nt - 1)
            def _emit_final():
                out_z_ref[:] = z
                out_w_ref[:] = jnp.broadcast_to(w, (8, block))
        else:
            if return_trajectory_t:
                traj_ref[nbridges] = z.astype(residual_dtype)
            out_z_ref[:] = z
            out_w_ref[:] = jnp.broadcast_to(w, (8, block))

    in_specs = [
        pl.BlockSpec((1, nbridges), lambda i, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda i, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((dim_pad, block), lambda i, t: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block), lambda i, t: (0, i), memory_space=pltpu.VMEM),
    ]
    inputs = [betas_smem, scalars, seed_arr, z0_t, w0_rows]
    if inject_noise:
        in_specs.append(
            pl.BlockSpec(
                (t_block, dim_pad, block),
                lambda i, t: (t, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(noise_t)
    for c in const_inputs:
        in_specs.append(
            pl.BlockSpec(
                c.shape, lambda i, t, nd=c.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(c)

    out_specs = [
        pl.BlockSpec((dim_pad, block), lambda i, t: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block), lambda i, t: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((dim_pad, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
    ]
    # Chunked: the trajectory output holds z_0..z_{K-1} (nbridges rows; the
    # final state exits via out_z). Single-window keeps the (K+1)-row stack.
    traj_rows = nbridges if chunked else nbridges + 1
    if return_trajectory_t:
        out_specs.append(
            pl.BlockSpec(
                (t_block if chunked else traj_rows, dim_pad, block),
                lambda i, t: (t, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((traj_rows, dim_pad, n_pad), residual_dtype)
        )
    if return_noise_t:
        out_specs.append(
            pl.BlockSpec(
                (t_block, dim_pad, block),
                lambda i, t: (t, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((nbridges, dim_pad, n_pad), residual_dtype)
        )

    scratch_shapes = []
    if chunked:
        scratch_shapes = [
            pltpu.VMEM((dim_pad, block), jnp.float32),  # z
            pltpu.VMEM((dim_pad, block), jnp.float32),  # gt
            pltpu.VMEM((dim_pad, block), jnp.float32),  # sn carry
            pltpu.VMEM((8, block), jnp.float32),        # w
        ]

    # Sized scoped-VMEM (kernel_common): lets the raw trajectory output stay
    # ON-CHIP between this kernel and the backward kernels, and lets
    # large-dim targets (LGCP: ~40 MB of weights + a 10 MB precision
    # matrix) run fused at all.
    kwargs = vmem_limit_params(
        inputs, out_shape,
        # Step temporaries + compiler stack beyond the operand estimate
        # (measured on the 1600-D LGCP eval: 99.3 MB needed vs a 98.2 MB
        # 10-row margin — the limit only raises the check).
        extra_bytes=10 * dim_pad * block * 4 + 4 * 1024 * 1024,
        interpret=interpret,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nblocks, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        # Generic interpret mode has no TPU PRNG; use the TPU interpreter
        # when the kernel generates its own noise.
        interpret=(pltpu.InterpretParams() if (interpret and not inject_noise) else interpret),
        **kwargs,
    )(*inputs)

    out_z_t, out_w = outs[0], outs[1]
    z_final = out_z_t[:dim, :n].T
    w = out_w[0, :n]
    result = [z_final, w]
    k = 2
    if return_trajectory_t:
        result.append(outs[k])  # (K + 1, dim_pad, n_pad) raw
        k += 1
    if return_noise_t:
        result.append(outs[k])  # (K, dim_pad, n_pad) raw
        k += 1
    return tuple(result)
