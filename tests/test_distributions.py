"""Unit tests for batched distributions against scipy oracles."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest
from scipy import stats

from cmcd_tpu import distributions as dist


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_diag_gaussian_log_prob_matches_scipy(key):
    dim, n = 7, 11
    params = {
        "mean": jnp.arange(dim, dtype=jnp.float32) * 0.1,
        "logdiag": jnp.linspace(-0.5, 0.5, dim),
    }
    z = jax.random.normal(key, (n, dim)) * 2.0
    got = dist.diag_gaussian_log_prob(params, z)
    want = stats.norm.logpdf(
        onp.asarray(z), onp.asarray(params["mean"]), onp.exp(onp.asarray(params["logdiag"]))
    ).sum(-1)
    onp.testing.assert_allclose(onp.asarray(got), want, rtol=1e-4)


def test_diag_gaussian_grad_matches_autodiff(key):
    dim, n = 5, 4
    params = {
        "mean": jnp.ones(dim) * 0.3,
        "logdiag": jnp.linspace(-0.2, 0.4, dim),
    }
    z = jax.random.normal(key, (n, dim))
    analytic = dist.diag_gaussian_grad_log_prob(params, z)
    auto = jax.grad(lambda zz: jnp.sum(dist.diag_gaussian_log_prob(params, zz)))(z)
    onp.testing.assert_allclose(onp.asarray(analytic), onp.asarray(auto), rtol=1e-5, atol=1e-6)


def test_diag_gaussian_sample_moments(key):
    dim = 3
    params = {"mean": jnp.array([1.0, -2.0, 0.5]), "logdiag": jnp.log(jnp.array([0.5, 2.0, 1.0]))}
    z = dist.diag_gaussian_sample(key, params, 200_000)
    onp.testing.assert_allclose(onp.asarray(z.mean(0)), onp.asarray(params["mean"]), atol=2e-2)
    onp.testing.assert_allclose(
        onp.asarray(z.std(0)), onp.exp(onp.asarray(params["logdiag"])), rtol=2e-2
    )


def test_kernel_log_prob_matches_scipy(key):
    n, dim = 6, 4
    mean = jax.random.normal(key, (n, dim))
    x = mean + 0.3
    scale = 0.7
    got = dist.kernel_log_prob(x, mean, scale)
    want = stats.norm.logpdf(onp.asarray(x), onp.asarray(mean), scale).sum(-1)
    onp.testing.assert_allclose(onp.asarray(got), want, rtol=1e-4)


def test_kernel_log_prob_broadcast_scale(key):
    n, dim = 5, 3
    mean = jnp.zeros((n, dim))
    x = jax.random.normal(key, (n, dim))
    scale = jnp.array([0.5, 1.0, 2.0])
    got = dist.kernel_log_prob(x, mean, scale)
    want = stats.norm.logpdf(onp.asarray(x), 0.0, onp.asarray(scale)).sum(-1)
    onp.testing.assert_allclose(onp.asarray(got), want, rtol=1e-4)


def test_momentum_log_prob(key):
    dim, n = 4, 8
    logscale = jnp.linspace(-0.3, 0.3, dim)
    rho = jax.random.normal(key, (n, dim))
    got = dist.momentum_log_prob(rho, logscale)
    want = stats.norm.logpdf(onp.asarray(rho), 0.0, onp.exp(onp.asarray(logscale))).sum(-1)
    onp.testing.assert_allclose(onp.asarray(got), want, rtol=1e-4)


def test_entropy_matches_mc(key):
    dim = 3
    params = {"mean": jnp.zeros(dim), "logdiag": jnp.log(jnp.array([0.5, 1.0, 3.0]))}
    ent = dist.diag_gaussian_entropy(params)
    z = dist.diag_gaussian_sample(key, params, 100_000)
    mc = -dist.diag_gaussian_log_prob(params, z).mean()
    onp.testing.assert_allclose(float(ent), float(mc), rtol=1e-2)
