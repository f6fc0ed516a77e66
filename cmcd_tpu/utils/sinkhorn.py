"""Entropy-regularized W2 (Sinkhorn) in pure JAX.

The reference computes W2 with the POT package on host
(src/utils.py:207-216: uniform weights, cost normalized by its max,
reg=0.01, sinkhorn2). Reimplemented as a jittable log-domain Sinkhorn so
evaluation runs on device; defaults reproduce the reference call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


@functools.partial(jax.jit, static_argnames=("num_iters",))
def sinkhorn_w2(x, y, reg: float = 0.01, num_iters: int = 1000):
    """Regularized OT cost between empirical measures x, y: (N, d), (N, d).

    Matches ot.sinkhorn2(a, b, M / M.max(), reg) with uniform a, b: returns
    sum(P * M_normalized) for the entropic-regularized plan P.
    """
    n = x.shape[0]
    m = y.shape[0]
    # Squared euclidean cost, normalized by max (reference utils.py:213-214).
    x2 = jnp.sum(x * x, axis=1)[:, None]
    y2 = jnp.sum(y * y, axis=1)[None, :]
    cost = x2 + y2 - 2.0 * x @ y.T
    cost = jnp.maximum(cost, 0.0)
    cost = cost / jnp.max(cost)

    log_a = -jnp.log(n) * jnp.ones(n)
    log_b = -jnp.log(m) * jnp.ones(m)
    log_k = -cost / reg

    def body(_, fg):
        f, g = fg
        f = reg * (log_a - logsumexp((g[None, :] + log_k * reg) / reg, axis=1))
        g = reg * (log_b - logsumexp((f[:, None] + log_k * reg) / reg, axis=0))
        return f, g

    f = jnp.zeros(n)
    g = jnp.zeros(m)
    f, g = jax.lax.fori_loop(0, num_iters, body, (f, g))
    log_p = (f[:, None] + g[None, :]) / reg + log_k
    return jnp.sum(jnp.exp(log_p) * cost)


def calculate_w2_distances(samples, target_samples, other_target_samples,
                           n_samples: int, n_input_dist_seeds: int, n_sinkhorn: int):
    """Per-seed-group W2 vs target plus a target-vs-target control
    (reference src/utils.py:251-282). Returns dict of means/stds."""
    import numpy as onp

    w2, self_w2 = [], []
    for i in range(n_input_dist_seeds):
        s = samples[i * n_samples : i * n_samples + n_sinkhorn]
        t = target_samples[i * n_samples : i * n_samples + n_sinkhorn]
        o = other_target_samples[i * n_samples : i * n_samples + n_sinkhorn]
        w2.append(float(sinkhorn_w2(s, t)))
        self_w2.append(float(sinkhorn_w2(t, o)))
    return {
        "w2_dist": float(onp.mean(w2)),
        "w2_dist_std": float(onp.std(w2)),
        "self_w2_dist": float(onp.mean(self_w2)),
        "self_w2_dist_std": float(onp.std(self_w2)),
    }
