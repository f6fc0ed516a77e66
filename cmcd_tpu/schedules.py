"""Annealing (beta) grid and step-size schedules.

Reference semantics preserved exactly:
- beta grid: normalize -> cumsum -> interp (src/mcdboundingmachine.py:104-118,
  146-149 and src/boundingmachine.py:53-65, 79-82).
- eps schedules: linear decay and cos^2 decay with s=0.008
  (src/mcd_cais.py:34-44, src/mcd_under_lp_a_cais.py:33-39).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_beta_grid_params(nbridges: int, ngridb: int = 32, mgridref_y=None):
    """Initial knots and interpolation grids for the trainable beta schedule.

    Returns (mgridref_y, gridref_x, target_x). mgridref_y is the trainable
    piece; the others are fixed buffers. Mirrors reference
    src/mcdboundingmachine.py:107-118.
    """
    if mgridref_y is not None:
        ngridb = mgridref_y.shape[0] - 1
    else:
        if nbridges < ngridb:
            ngridb = nbridges
        mgridref_y = jnp.ones(ngridb + 1)
    gridref_x = jnp.linspace(0.0, 1.0, ngridb + 2)
    target_x = jnp.linspace(0.0, 1.0, nbridges + 2)[1:-1]
    return mgridref_y, gridref_x, target_x


def betas_from_grid(mgridref_y, gridref_x, target_x):
    """betas = interp(target_x, gridref_x, [0, cumsum(y)/sum(y)]).

    Reference: src/mcdboundingmachine.py:146-149. Monotone in [0, 1].
    """
    gridref_y = jnp.cumsum(mgridref_y) / jnp.sum(mgridref_y)
    gridref_y = jnp.concatenate([jnp.zeros(1), gridref_y])
    return jnp.interp(target_x, gridref_x, gridref_y)


def eps_linear(init_eps, i, nbridges: int, final_eps: float = 0.0001):
    """Linear decay from init_eps to final_eps (reference mcd_cais.py:34-36)."""
    return (final_eps - init_eps) / (nbridges - 1) * i + init_eps


def eps_cosine_sq(init_eps, i, nbridges: int, s: float = 0.008):
    """Cosine-squared decay (reference mcd_cais.py:38-44), s=0.008."""
    phase = i / nbridges
    decay = jnp.cos((phase + s) / (1.0 + s) * 0.5 * jnp.pi) ** 2
    return init_eps * decay


def eps_at_step(eps, i, nbridges: int, schedule: str | None):
    """Dispatch matching reference mcd_cais.py:54-59. schedule in
    {None, "", "linear", "cos_sq"}."""
    if schedule == "cos_sq":
        return eps_cosine_sq(eps, i, nbridges)
    if schedule == "linear":
        return eps_linear(eps, i, nbridges)
    return eps
