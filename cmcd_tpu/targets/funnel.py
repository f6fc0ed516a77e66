"""Neal's funnel target.

Reference: src/model_handler.py:124-154. Density (d-dim, default d=10):
  v = z[0] ~ N(0, 3^2);  z[1:] | v ~ N(0, exp(v) I_{d-1}).
Normalized, so ln Z = 0 exactly.

Note on the sampler: the reference's sample_data draws x with scale
exp(-y/2) (src/model_handler.py:151), which is inconsistent with its own
density (variance exp(v), src/model_handler.py:133-135). That only affects
W2 evaluation plots, not ln Z. Here the sampler matches the density
(scale exp(y/2)); the y-clipping at +/-clip_y is kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cmcd_tpu.distributions import LOG_2PI
from cmcd_tpu.targets.base import Target


def make_funnel(d: int = 10, sig: float = 3.0, clip_y: float = 11.0) -> Target:
    def log_prob(z):
        """z: (N, d) -> (N,)."""
        v = z[:, 0]
        log_density_v = -0.5 * (v / sig) ** 2 - 0.5 * LOG_2PI - jnp.log(sig)
        x = z[:, 1:]
        # x | v ~ N(0, exp(v) I): log pdf = -0.5 sum(x^2) e^{-v}
        #                                   - 0.5 (d-1)(log 2pi + v)
        quad = -0.5 * jnp.sum(x * x, axis=-1) * jnp.exp(-v)
        log_density_x = quad - 0.5 * (d - 1) * (LOG_2PI + v)
        return log_density_v + log_density_x

    def sample(key, n):
        y_key, x_key = jax.random.split(key)
        y = (sig * jax.random.normal(y_key, (n, 1))).clip(-clip_y, clip_y)
        x = jax.random.normal(x_key, (n, d - 1)) * jnp.exp(y / 2.0)
        return jnp.concatenate([y, x], axis=1)

    return Target(
        name="funnel",
        dim=d,
        log_prob=log_prob,
        sample=sample,
        params={"sig": sig, "clip_y": clip_y},
    )
