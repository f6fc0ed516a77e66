"""Kernel-side score-network applies beyond the geffner default.

PISNet ("dds", networks/pis.py, reference src/nn_dds.py:91-192) support for
the fused kernels: transposed/padded weight packing, a (dim_pad, B)-layout
apply, and the theta-tuple plumbing the KL reverse-sweep backward needs to
emit per-parameter gradients.

Mosaic has no erf primitive, so the exact erf-gelu is evaluated with the
Abramowitz & Stegun 7.1.26 rational approximation (|err| <= 1.5e-7 — below
the 1e-4 equivalence tolerances the kernel tests use; the scan path keeps
jax.scipy.special.erf).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429
_P = 0.3275911


def erf_t(x):
    """A&S 7.1.26 erf approximation (Mosaic-lowerable: exp + rationals)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + _P * a)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def gelu_t(x):
    """Exact-form gelu with the in-kernel erf (reference src/nn_dds.py:167)."""
    return x * 0.5 * (1.0 + erf_t(x * 0.7071067811865476))


def pack_pis_t(sn_params, dim: int, dim_pad: int):
    """Transpose/pad PISNet params (networks/pis.py) for (in, B) applies.

    Returns (weights, meta). weights:
      {"phase": (channels, 1), "tc": [(W_T, b_col)] * 2,
       "state": [(W_T, b_col), ...] with the LAST (output) layer's W_T/b
       padded to dim_pad rows, "factor_sn": 1.0 (API parity with geffner)}.
    """
    channels = sn_params["timestep_phase"].shape[0]
    tc = [
        (l["w"].T, l["b"][:, None]) for l in sn_params["time_coder"]
    ]
    state = [
        (l["w"].T, l["b"][:, None]) for l in sn_params["state_net"][:-1]
    ]
    out = sn_params["state_net"][-1]
    out_w = jnp.zeros((dim_pad, out["w"].shape[0])).at[:dim].set(out["w"].T)
    out_b = jnp.zeros((dim_pad, 1)).at[:dim].set(out["b"][:, None])
    state.append((out_w, out_b))
    weights = {
        "phase": sn_params["timestep_phase"][:, None],
        # Host-computed column (Mosaic iota is integer-only): becomes a
        # closure-converted kernel constant, NOT a theta entry.
        "coeff": jnp.linspace(0.1, 100.0, channels)[:, None],
        "tc": tc,
        "state": state,
        "factor_sn": 1.0,
    }
    meta = {
        "arch": "pis",
        "channels": channels,
        "in_dim": sn_params["state_net"][0]["w"].shape[0] - channels,
        "nbridges": 0,  # PIS embeds continuous time; no table to clamp
    }
    return weights, meta


def pis_apply_t(weights, z, i, dim: int, channels: int):
    """PISNet forward in the transposed layout: z (dim_pad, B) -> (dim_pad, B).

    Mirrors networks/pis.py apply_fn exactly (time features are column
    vectors — z-independent, so their cost is ~zero per chain column).
    """
    t = jnp.asarray(i).astype(jnp.float32)
    arg = weights["coeff"] * t + weights["phase"]
    emb = jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=0)  # (2c, 1)
    (w1, b1), (w2, b2) = weights["tc"]
    h_t = jnp.dot(w1, emb, preferred_element_type=jnp.float32) + b1
    h_t = gelu_t(h_t)
    h_t = jnp.dot(w2, h_t, preferred_element_type=jnp.float32) + b2  # (c, 1)

    b_cols = z.shape[1]
    h = jnp.concatenate(
        [z[:dim], jnp.broadcast_to(h_t, (channels, b_cols))], axis=0
    )
    for w_t, b_col in weights["state"][:-1]:
        h = gelu_t(jnp.dot(w_t, h, preferred_element_type=jnp.float32) + b_col)
    w_out, b_out = weights["state"][-1]
    out = jnp.dot(w_out, h, preferred_element_type=jnp.float32) + b_out
    return jnp.clip(out, -1.0e4, 1.0e4)


def pis_theta(weights):
    """Flatten packed PIS weights into the theta tuple the KL backward
    kernel differentiates (order: phase, tc pairs, state pairs)."""
    parts = [weights["phase"]]
    for w, b in weights["tc"]:
        parts.extend([w, b])
    for w, b in weights["state"]:
        parts.extend([w, b])
    return tuple(parts)


def pis_apply_theta(th, z, i, dim: int, channels: int, n_state: int, coeff):
    """pis_apply_t with the weights coming from theta slices (so jax.vjp
    reaches them); coeff is the non-trainable linspace column (closure
    constant)."""
    phase = th[0]
    tc = [(th[1], th[2]), (th[3], th[4])]
    state = [
        (th[5 + 2 * k], th[6 + 2 * k]) for k in range(n_state)
    ]
    return pis_apply_t(
        {"phase": phase, "coeff": coeff, "tc": tc, "state": state},
        z, i, dim, channels,
    )


def pis_grads_unpack(outs, base: int, dim: int, n_state: int):
    """Theta-slice gradients back into the networks/pis.py param pytree."""
    g_phase = outs[base][:, 0]
    tc = [
        {"w": outs[base + 1 + 2 * k].T, "b": outs[base + 2 + 2 * k][:, 0]}
        for k in range(2)
    ]
    state = []
    for k in range(n_state):
        w = outs[base + 5 + 2 * k]
        b = outs[base + 6 + 2 * k]
        if k == n_state - 1:  # output layer was padded to dim_pad rows
            w = w[:dim]
            b = b[:dim]
        state.append({"w": w.T, "b": b[:, 0]})
    return {"timestep_phase": g_phase, "time_coder": tc, "state_net": state}


def geffner_theta(weights):
    """Flatten packed geffner weights (pack_geffner_t layout) into the theta
    tuple the backward kernels differentiate."""
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


def geffner_apply_theta(th, z, i, dim, emb_dim, in_dim, sn_nbridges,
                        n_layers, compute_dtype=jnp.float32):
    """Geffner net forward in the transposed layout with weights from theta
    slices (so jax.vjp reaches them). Matches pack_geffner_t ordering.

    compute_dtype=bfloat16 feeds the layer MATMULS bf16 operands (f32 MXU
    accumulation); the softplus chain and head output stay f32 — Mosaic
    cannot lower bf16 comparisons (hit on v5e: "Target does not support
    this comparison" from softplus), and the point of bf16 here is the
    halved weight storage, not elementwise lanes. Theta gradients keep
    their input dtypes (the VJP casts cotangents at the boundary)."""
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
    cd = compute_dtype
    for w_t, b_col in zip(ws, bs):
        pre = (
            jnp.dot(
                w_t.astype(cd), h.astype(cd),
                preferred_element_type=jnp.float32,
            )
            + b_col.astype(jnp.float32)
        )
        h = h + jax.nn.softplus(pre)
    out = (
        jnp.dot(
            head_w.astype(cd), h.astype(cd),
            preferred_element_type=jnp.float32,
        )
        + head_b.astype(jnp.float32)
    )
    return out * factor_arr[0, 0]


def geffner_grads_unpack(outs, base: int, dim: int, n_layers: int):
    g_factor, g_emb_t, g_head_w, g_head_b = outs[base : base + 4]
    g_ws = outs[base + 4 : base + 4 + n_layers]
    g_bs = outs[base + 4 + n_layers : base + 4 + 2 * n_layers]
    return {
        "layers": [{"w": w.T, "b": b[:, 0]} for w, b in zip(g_ws, g_bs)],
        "head": {"w": g_head_w[:dim].T, "b": g_head_b[:dim, 0]},
        "emb": g_emb_t.T,
        "factor_sn": g_factor[0, 0],
    }


def make_kernel_net(arch, sn_weights, sn_meta, dim, grad_logp_t=None,
                    row_mask=None, compute_dtype=jnp.float32):
    """Arch-generic kernel-side score net for the backward kernels.

    Returns (theta, apply_fn, unpack_fn):
      theta: flat tuple of the differentiable packed weights;
      apply_fn(th, z, i): transposed-layout net forward from theta slices;
      unpack_fn(outs, base): theta-slice gradients back into the original
      (untransposed) parameter pytree.
    Supported archs: "geffner" (pack_geffner_t), "pis" (pack_pis_t),
    "pis_grad" (pack_pis_grad_t — needs grad_logp_t + row_mask).
    compute_dtype: geffner-only reduced-precision layer compute (see
    geffner_apply_theta); the PIS archs stay f32.
    """
    if arch == "pis":
        channels = sn_meta["channels"]
        n_state = len(sn_weights["state"])
        coeff = sn_weights["coeff"]
        theta = pis_theta(sn_weights)

        def apply_fn(th, z, i):
            return pis_apply_theta(th, z, i, dim, channels, n_state, coeff)

        def unpack_fn(outs, base):
            return pis_grads_unpack(outs, base, dim, n_state)

        return theta, apply_fn, unpack_fn
    if arch == "pis_grad":
        channels = sn_meta["channels"]
        n_state = len(sn_weights["state"])
        n_tcg = sn_meta["n_tcg"]
        coeff = sn_weights["coeff"]
        theta = pis_grad_theta(sn_weights)

        def apply_fn(th, z, i):
            return pis_grad_apply_theta(
                th, z, i, dim, channels, n_tcg, n_state, coeff,
                grad_logp_t, row_mask,
            )

        def unpack_fn(outs, base):
            return pis_grad_grads_unpack(outs, base, dim, n_tcg, n_state)

        return theta, apply_fn, unpack_fn
    assert arch == "geffner", arch
    emb_dim = sn_meta["emb_dim"]
    in_dim = sn_meta["in_dim"]
    sn_nbridges = sn_meta["nbridges"]
    n_layers = len(sn_weights["layers"])
    theta = geffner_theta(sn_weights)

    def apply_fn(th, z, i):
        return geffner_apply_theta(
            th, z, i, dim, emb_dim, in_dim, sn_nbridges, n_layers,
            compute_dtype=compute_dtype,
        )

    def unpack_fn(outs, base):
        return geffner_grads_unpack(outs, base, dim, n_layers)

    return theta, apply_fn, unpack_fn


def pack_pis_grad_t(sn_params, dim: int, dim_pad: int):
    """Transpose/pad PISGRADNet ("dds_grad") params (networks/pis.py).

    Adds the grad-gate coder to the PISNet layout; its output layer (and the
    state net's) is padded to dim_pad rows.
    """
    channels = sn_params["timestep_phase"].shape[0]
    tc = [(l["w"].T, l["b"][:, None]) for l in sn_params["time_coder_state"]]
    tcg = [
        (l["w"].T, l["b"][:, None]) for l in sn_params["time_coder_grad"][:-1]
    ]
    gout = sn_params["time_coder_grad"][-1]
    gout_w = jnp.zeros((dim_pad, gout["w"].shape[0])).at[:dim].set(gout["w"].T)
    gout_b = jnp.zeros((dim_pad, 1)).at[:dim].set(gout["b"][:, None])
    tcg.append((gout_w, gout_b))
    state = [
        (l["w"].T, l["b"][:, None]) for l in sn_params["state_net"][:-1]
    ]
    out = sn_params["state_net"][-1]
    out_w = jnp.zeros((dim_pad, out["w"].shape[0])).at[:dim].set(out["w"].T)
    out_b = jnp.zeros((dim_pad, 1)).at[:dim].set(out["b"][:, None])
    state.append((out_w, out_b))
    weights = {
        "phase": sn_params["timestep_phase"][:, None],
        "coeff": jnp.linspace(0.1, 100.0, channels)[:, None],
        "tc": tc,
        "tcg": tcg,
        "state": state,
        "factor_sn": 1.0,
    }
    meta = {
        "arch": "pis_grad",
        "channels": channels,
        "n_tcg": len(tcg),
        "in_dim": sn_params["state_net"][0]["w"].shape[0] - channels,
        "nbridges": 0,
    }
    return weights, meta


def pis_grad_apply_t(weights, z, i, dim: int, channels: int, grad_logp_t,
                     row_mask):
    """PISGRADNet forward in the transposed layout (networks/pis.py
    build_pis_grad_network): PISNet state path + a time-gated, detached,
    clipped target-score feature."""
    t = jnp.asarray(i).astype(jnp.float32)
    arg = weights["coeff"] * t + weights["phase"]
    emb = jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=0)
    (w1, b1), (w2, b2) = weights["tc"]
    h_t = jnp.dot(w1, emb, preferred_element_type=jnp.float32) + b1
    h_t = gelu_t(h_t)
    h_t = jnp.dot(w2, h_t, preferred_element_type=jnp.float32) + b2

    tcg = weights["tcg"]
    g_t = jnp.dot(tcg[0][0], emb, preferred_element_type=jnp.float32) + tcg[0][1]
    for w_t, b_col in tcg[1:]:
        g_t = (
            jnp.dot(w_t, gelu_t(g_t), preferred_element_type=jnp.float32)
            + b_col
        )  # final: (dim_pad, 1)

    grad = jax.lax.stop_gradient(grad_logp_t(z))
    grad = jnp.clip(grad, -1.0e2, 1.0e2) * row_mask

    b_cols = z.shape[1]
    h = jnp.concatenate(
        [z[:dim], jnp.broadcast_to(h_t, (channels, b_cols))], axis=0
    )
    for w_t, b_col in weights["state"][:-1]:
        h = gelu_t(jnp.dot(w_t, h, preferred_element_type=jnp.float32) + b_col)
    w_out, b_out = weights["state"][-1]
    out = jnp.dot(w_out, h, preferred_element_type=jnp.float32) + b_out
    return jnp.clip(out, -1.0e4, 1.0e4) + g_t * grad


def pis_grad_theta(weights):
    parts = [weights["phase"]]
    for group in ("tc", "tcg", "state"):
        for w, b in weights[group]:
            parts.extend([w, b])
    return tuple(parts)


def pis_grad_apply_theta(th, z, i, dim, channels, n_tcg, n_state, coeff,
                         grad_logp_t, row_mask):
    phase = th[0]
    tc = [(th[1], th[2]), (th[3], th[4])]
    base = 5
    tcg = [(th[base + 2 * k], th[base + 1 + 2 * k]) for k in range(n_tcg)]
    base += 2 * n_tcg
    state = [(th[base + 2 * k], th[base + 1 + 2 * k]) for k in range(n_state)]
    return pis_grad_apply_t(
        {"phase": phase, "coeff": coeff, "tc": tc, "tcg": tcg,
         "state": state},
        z, i, dim, channels, grad_logp_t, row_mask,
    )


def pis_grad_grads_unpack(outs, base: int, dim: int, n_tcg: int,
                          n_state: int):
    g_phase = outs[base][:, 0]
    tc = [
        {"w": outs[base + 1 + 2 * k].T, "b": outs[base + 2 + 2 * k][:, 0]}
        for k in range(2)
    ]
    o = base + 5
    tcg = []
    for k in range(n_tcg):
        w = outs[o + 2 * k]
        b = outs[o + 1 + 2 * k]
        if k == n_tcg - 1:
            w = w[:dim]
            b = b[:dim]
        tcg.append({"w": w.T, "b": b[:, 0]})
    o += 2 * n_tcg
    state = []
    for k in range(n_state):
        w = outs[o + 2 * k]
        b = outs[o + 1 + 2 * k]
        if k == n_state - 1:
            w = w[:dim]
            b = b[:dim]
        state.append({"w": w.T, "b": b[:, 0]})
    return {
        "timestep_phase": g_phase,
        "time_coder_state": tc,
        "time_coder_grad": tcg,
        "state_net": state,
    }
