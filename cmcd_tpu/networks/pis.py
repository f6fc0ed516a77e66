"""PIS / DDS drift networks with sinusoidal time embeddings.

Reference: src/nn_dds.py:91-317 (haiku). Reimplemented in pure JAX with a
batch-first apply. Key reference semantics preserved:
- timestep_coeff = linspace(0.1, 100, channels), learned timestep_phase
  (src/nn_dds.py:103-108)
- time coder: Linear -> gelu -> Linear (src/nn_dds.py:111-117)
- state-time net: [Linear(u) + gelu]* + zero-initialized output layer
  (src/nn_dds.py:121-127, 179-192), so output == 0 at init
- output clip at +/-1e4 (src/nn_dds.py:162)
- channel count is hardcoded to 64 in the reference regardless of the
  fully_connected_units argument (src/nn_dds.py:95); here the argument is
  honored, with [64, 64] as the parity default.

The grad variant (PISGRADNet, src/nn_dds.py:195-317) is broken as shipped
(undefined LinearConsInit at :245, attr typo at :313); this implementation is
the working version: the target-score feature uses a stop-gradient, clipped
at +/-1e2, scaled by a time-conditioned gate initialized to zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gelu(x):
    # Exact (erf-based) gelu, matching reference src/nn_dds.py:167-176.
    return x * 0.5 * (1.0 + jax.scipy.special.erf(x / jnp.sqrt(2.0)))


def _linear_init(key, in_dim, out_dim):
    # haiku Linear default: truncated-normal stddev 1/sqrt(in_dim), zero bias.
    stddev = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    w = jax.random.truncated_normal(key, -2.0, 2.0, (in_dim, out_dim)) * stddev
    return {"w": w, "b": jnp.zeros(out_dim)}


def _linear_zeros(in_dim, out_dim):
    return {"w": jnp.zeros((in_dim, out_dim)), "b": jnp.zeros(out_dim)}


def _apply(p, x):
    return x @ p["w"] + p["b"]


def _timestep_embedding(coeff, phase, t):
    """sin/cos(coeff * t + phase): returns (2 * channels,)."""
    arg = coeff * t + phase
    return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)


def build_pis_network(x_dim, fully_connected_units, rho_dim=0):
    """Returns (init_fn, apply_fn) for the PISNet ("dds") architecture."""
    units = list(fully_connected_units)
    channels = units[0]
    in_dim = x_dim + rho_dim
    nn_clip = 1.0e4

    def init_fn(key):
        keys = jax.random.split(key, 2 + len(units))
        params = {
            "timestep_phase": jnp.zeros(channels),
            "time_coder": [
                _linear_init(keys[0], 2 * channels, channels),
                _linear_init(keys[1], channels, channels),
            ],
        }
        state_net = []
        prev = in_dim + channels
        for k, u in enumerate(units):
            state_net.append(_linear_init(keys[2 + k], prev, u))
            prev = u
        state_net.append(_linear_zeros(prev, x_dim))
        params["state_net"] = state_net
        return params

    timestep_coeff = jnp.linspace(0.1, 100.0, channels)

    def apply_fn(params, x, i):
        """x: (N, in_dim), i: scalar bridge index used as time -> (N, x_dim)."""
        t = jnp.asarray(i, jnp.float32)
        emb = _timestep_embedding(timestep_coeff, params["timestep_phase"], t)
        h_t = _apply(params["time_coder"][0], emb)
        h_t = _gelu(h_t)
        h_t = _apply(params["time_coder"][1], h_t)  # (channels,)
        n = x.shape[0]
        h = jnp.concatenate(
            [x, jnp.broadcast_to(h_t, (n, h_t.shape[-1]))], axis=-1
        )
        for layer in params["state_net"][:-1]:
            h = _gelu(_apply(layer, h))
        out = _apply(params["state_net"][-1], h)
        return jnp.clip(out, -nn_clip, nn_clip)

    return init_fn, apply_fn


def build_pis_grad_network(x_dim, fully_connected_units, rho_dim=0, target_log_prob=None):
    """Returns (init_fn, apply_fn) for the PISGRADNet ("dds_grad") architecture.

    target_log_prob: batched (N, x_dim) -> (N,) used for the detached score
    feature. Only the leading x_dim slice of the input gets the feature (the
    momentum part of an underdamped input carries no target score).
    """
    units = list(fully_connected_units)
    channels = units[0]
    in_dim = x_dim + rho_dim
    nn_clip = 1.0e4
    lgv_clip = 1.0e2

    def init_fn(key):
        keys = jax.random.split(key, 4 + 2 * len(units))
        params = {
            "timestep_phase": jnp.zeros(channels),
            "time_coder_state": [
                _linear_init(keys[0], 2 * channels, channels),
                _linear_init(keys[1], channels, channels),
            ],
        }
        # Gate network for the grad feature: ends in a zero-init layer so the
        # feature is off at init (working stand-in for the reference's
        # undefined LinearConsInit(dim, 0), src/nn_dds.py:245).
        grad_net = [_linear_init(keys[2], 2 * channels, channels)]
        for k in range(len(units)):
            grad_net.append(_linear_init(keys[3 + k], channels, channels))
        grad_net.append(_linear_zeros(channels, x_dim))
        params["time_coder_grad"] = grad_net
        state_net = []
        prev = in_dim + channels
        for k, u in enumerate(units):
            state_net.append(_linear_init(keys[3 + len(units) + k], prev, u))
            prev = u
        state_net.append(_linear_zeros(prev, x_dim))
        params["state_net"] = state_net
        return params

    timestep_coeff = jnp.linspace(0.1, 100.0, channels)

    def apply_fn(params, x, i):
        t = jnp.asarray(i, jnp.float32)
        emb = _timestep_embedding(timestep_coeff, params["timestep_phase"], t)

        h_t = _apply(params["time_coder_state"][0], emb)
        h_t = _gelu(h_t)
        h_t = _apply(params["time_coder_state"][1], h_t)

        g_t = _apply(params["time_coder_grad"][0], emb)
        for layer in params["time_coder_grad"][1:-1]:
            g_t = _apply(layer, _gelu(g_t))
        g_t = _apply(params["time_coder_grad"][-1], _gelu(g_t))  # (x_dim,)

        # Detached, clipped target-score feature (src/nn_dds.py:299-303).
        z_part = x[:, :x_dim]
        grad = jax.grad(lambda zz: jnp.sum(target_log_prob(zz)))(z_part)
        grad = jax.lax.stop_gradient(grad)
        grad = jnp.clip(grad, -lgv_clip, lgv_clip)

        n = x.shape[0]
        h = jnp.concatenate(
            [x, jnp.broadcast_to(h_t, (n, h_t.shape[-1]))], axis=-1
        )
        for layer in params["state_net"][:-1]:
            h = _gelu(_apply(layer, h))
        out = _apply(params["state_net"][-1], h)
        out = jnp.clip(out, -nn_clip, nn_clip)
        return out + g_t * grad

    return init_fn, apply_fn
