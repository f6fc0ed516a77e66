"""Shared machinery for the annealed-SDE integrators.

The reference implements 8+ near-duplicate `evolve_*` modules
(src/mcd_cais.py, src/mcd_cais_var.py, src/mcd_over_orig.py,
src/mcd_under_lp_{a,e,ea}.py, src/mcd_under_lp_a_cais.py, src/vi_dnf.py,
src/ais_utils.py). They are one algorithm with a handful of switches; here
each family is written once, batch-first, with the switches as a static spec.

State layout: z (N, dim), rho (N, dim) for underdamped, w (N,) running
log-importance-weight. The scan carries the whole chain batch so every step
is a fused batched XLA program; the chain axis can be sharded by the caller.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class IntegratorContext:
    """Everything an evolve function needs besides (key, z, betas, params).

    target_log_prob: batched (N, dim) -> (N,)
    apply_sn / apply_sn2: batched score nets (params, x, i) -> (N, dim) or None
    """

    target_log_prob: Callable
    nbridges: int
    dim: int
    apply_sn: Optional[Callable] = None
    apply_sn2: Optional[Callable] = None
    eps_schedule: str = ""
    grad_clipping: bool = False
    lfsteps: int = 1
    # Rematerialize each bridge step in the backward pass (jax.checkpoint).
    # Required for KL-loss (BPTT) training at large nbridges — the KL
    # gradient otherwise saves every step's activations (SURVEY.md §7 hard
    # part 3). VarGrad doesn't need it (stop-gradient state).
    remat_steps: bool = False


def target_grad(ctx: IntegratorContext):
    """Batched d/dz log pi(z): (N, dim) -> (N, dim)."""
    return jax.grad(lambda z: jnp.sum(ctx.target_log_prob(z)))


def make_grad_u(
    ctx: IntegratorContext,
    vd_params,
    clip_target: Optional[float],
    clip_vd: Optional[float],
):
    """gradU(z, beta) = -(beta * grad log pi + (1-beta) * grad log q), batched.

    Clipping placement matches the reference exactly:
    - CAIS KL loss: target grad clipped at +/-1e3, vd grad unclipped
      (src/mcd_cais.py:24-30)
    - CAIS VarGrad loss: both clipped at +/-1e2 (src/mcd_cais_var.py:33-40)
    - underdamped CAIS: target clipped at +/-1e2, vd unclipped
      (src/mcd_under_lp_a_cais.py:23-29)
    - no clipping: plain jax.grad(U) (all other modes)
    """
    from cmcd_tpu.distributions import diag_gaussian_grad_log_prob

    grad_pi = target_grad(ctx)

    def grad_u(z, beta):
        gu = grad_pi(z)
        gp = diag_gaussian_grad_log_prob(vd_params, z)
        if clip_target is not None:
            gu = jnp.clip(gu, -clip_target, clip_target)
        if clip_vd is not None:
            gp = jnp.clip(gp, -clip_vd, clip_vd)
        return -(beta * gu + (1.0 - beta) * gp)

    return grad_u


def step_keys(key, i):
    """Two per-step subkeys derived by folding the bridge index.

    The reference threads a split key through the scan carry
    (src/mcd_cais.py:66,87); fold_in keeps the carry smaller and the stream
    is equivalent in distribution.
    """
    k = jax.random.fold_in(key, i)
    return jax.random.split(k)
