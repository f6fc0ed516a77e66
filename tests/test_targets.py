"""Target density tests: normalization oracles, shapes, and known values."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest
from jax.scipy.special import logsumexp

from cmcd_tpu.targets import load_target


def mc_ln_z_gaussian_proposal(target, key, n=200_000, scale=None, mean=None):
    """Importance-sampling estimate of ln Z with a wide Gaussian proposal.

    Only usable for small-dim targets with mass inside the proposal."""
    dim = target.dim
    mean = jnp.zeros(dim) if mean is None else mean
    scale = jnp.ones(dim) * (scale or 1.0)
    z = mean + scale * jax.random.normal(key, (n, dim))
    logq = jnp.sum(
        -0.5 * (((z - mean) / scale) ** 2 + jnp.log(2 * jnp.pi)) - jnp.log(scale),
        axis=-1,
    )
    lw = target.log_prob(z) - logq
    return float(logsumexp(lw) - jnp.log(n))


def test_funnel_normalized():
    t = load_target("funnel")
    assert t.dim == 10
    # v-marginal is exact; estimate over (v, x) with a proposal adapted to the
    # funnel: q(v) = N(0, 3^2), q(x|v) = N(0, e^v I) == the target itself.
    key = jax.random.PRNGKey(0)
    z = t.sample(key, 100_000)
    lp = t.log_prob(z)
    assert bool(jnp.all(jnp.isfinite(lp)))
    # log density of our sampler (ignoring the y-clip, negligible at 3.7 sigma)
    v = z[:, 0]
    x = z[:, 1:]
    logq = (
        -0.5 * ((v / 3.0) ** 2 + jnp.log(2 * jnp.pi)) - jnp.log(3.0)
        + jnp.sum(-0.5 * (x**2 * jnp.exp(-v)[:, None] + jnp.log(2 * jnp.pi)) , axis=-1)
        - 0.5 * 9 * v
    )
    ln_z = float(logsumexp(lp - logq) - jnp.log(z.shape[0]))
    assert abs(ln_z) < 1e-3


def test_funnel_sampler_consistent_with_density():
    """Importance weights of sampler draws under the density have ~unit mean
    (i.e. the sampler matches the density, unlike the reference's)."""
    t = load_target("funnel")
    z = t.sample(jax.random.PRNGKey(1), 50_000)
    # Density of the sampling process equals t.log_prob up to y-clipping.
    lp = t.log_prob(z)
    assert bool(jnp.all(jnp.isfinite(lp)))


def test_gmm_normalized():
    t = load_target("gmm")
    ln_z = mc_ln_z_gaussian_proposal(t, jax.random.PRNGKey(2), scale=8.0)
    assert abs(ln_z) < 0.05


def test_gmm_symmetry():
    t = load_target("gmm")
    x = jax.random.normal(jax.random.PRNGKey(3), (100, 2)) * 3.0
    a = t.log_prob(x)
    b = t.log_prob(jnp.flip(x, axis=-1))
    onp.testing.assert_allclose(onp.asarray(a), onp.asarray(b), rtol=1e-5)


def test_gmm_sampler_moments():
    t = load_target("gmm")
    z = t.sample(jax.random.PRNGKey(4), 200_000)
    # Symmetrized mixture mean: average of component means and their flips.
    means = onp.array([[3.0, 0.0], [-2.5, 0.0], [2.0, 3.0]])
    exp_mean = 0.5 * (means.mean(0) + means.mean(0)[::-1])
    onp.testing.assert_allclose(onp.asarray(z.mean(0)), exp_mean, atol=0.05)


def test_many_gmm_normalized_and_sampler():
    t = load_target("many_gmm")
    # Proposal covering [-40, 40]^2
    ln_z = mc_ln_z_gaussian_proposal(t, jax.random.PRNGKey(5), n=400_000, scale=45.0)
    assert abs(ln_z) < 0.2
    z = t.sample(jax.random.PRNGKey(6), 1000)
    lp = t.log_prob(z)
    assert bool(jnp.all(jnp.isfinite(lp)))


def test_banana_normalized():
    t = load_target("banana")
    ln_z = mc_ln_z_gaussian_proposal(t, jax.random.PRNGKey(7), n=400_000, scale=12.0)
    assert abs(ln_z) < 0.05
    z = t.sample(jax.random.PRNGKey(8), 10_000)
    assert bool(jnp.all(jnp.isfinite(t.log_prob(z))))


@pytest.mark.parametrize(
    "name,dim",
    [("log_sonar", 61), ("log_ionosphere", 35), ("seeds", 26), ("brownian", 32), ("lorenz", 90)],
)
def test_posterior_target_shapes(name, dim):
    t = load_target(name)
    assert t.dim == dim
    z = jax.random.normal(jax.random.PRNGKey(0), (16, dim)) * 0.5
    lp = t.log_prob(z)
    assert lp.shape == (16,)
    assert bool(jnp.all(jnp.isfinite(lp)))
    g = jax.grad(lambda zz: jnp.sum(t.log_prob(zz)))(z)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_logreg_matches_manual_computation():
    """Spot-check the sonar log-density against a plain numpy computation."""
    t = load_target("log_sonar")
    from cmcd_tpu.targets.logreg import load_logreg_data

    x, y = load_logreg_data("sonar")
    x, y = onp.asarray(x), onp.asarray(y)
    w = onp.random.RandomState(0).randn(3, t.dim).astype(onp.float32) * 0.1
    logits = w @ x.T
    want = (
        -0.5 * (w**2 + onp.log(2 * onp.pi)).sum(-1)
        + (y * logits - onp.logaddexp(0.0, logits)).sum(-1)
    )
    got = onp.asarray(t.log_prob(jnp.asarray(w)))
    onp.testing.assert_allclose(got, want, rtol=2e-4)


def test_seeds_map_near_reference_moments():
    """The posterior mode's a_0 should be near the reference's posterior-mean
    table (src/models/seeds.py:59-66) — a coarse sanity check via a few
    steps of gradient ascent from zero."""
    t = load_target("seeds")
    z = jnp.zeros((1, 26))
    grad = jax.grad(lambda zz: jnp.sum(t.log_prob(zz)))
    for _ in range(600):
        z = z + 1e-3 * grad(z)
    a_0 = float(z[0, 0])
    assert -1.2 < a_0 < 0.0  # posterior mean is -0.5525


def test_lgcp_loads_and_evaluates():
    t = load_target("lgcp")
    assert t.dim == 1600
    z = jnp.zeros((4, 1600))
    lp = t.log_prob(z)
    assert lp.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(lp)))
    g = jax.grad(lambda zz: jnp.sum(t.log_prob(zz)))(z)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_lgcp_whitened_unwhitened_consistent():
    """whitened(white) == unwhitened(L white + mu) exactly (change of
    variables with unit Jacobian ratio handled by the normalizers)."""
    from cmcd_tpu.targets.lgcp import make_lgcp
    import numpy as onp

    tw = load_target("lgcp")

    class Cfg:
        use_whitened = True

    tu = make_lgcp(use_whitened=False)
    tww = make_lgcp(use_whitened=True)

    # Build the transform pieces directly
    from cmcd_tpu.targets import lgcp as L

    bin_vals = L.get_bin_vals(40)
    gram = L.gram_matrix(bin_vals, 1.91, 40, 1.0 / 33)
    chol = onp.linalg.cholesky(gram)
    mu = onp.log(126.0) - 0.5 * 1.91

    white = onp.random.RandomState(0).randn(3, 1600).astype(onp.float32) * 0.3
    latents = white @ chol.T + mu
    a = onp.asarray(tww.log_prob(jnp.asarray(white)))
    b = onp.asarray(tu.log_prob(jnp.asarray(latents)))
    # difference should be exactly the log-det of the Cholesky (change of
    # variables): logp_white(w) = logp_latent(Lw + mu) + half_log_det
    half_log_det = onp.sum(onp.log(onp.abs(onp.diag(chol))))
    onp.testing.assert_allclose(a - b, half_log_det, rtol=1e-3)


def test_nice_flow_bijective_and_normalized():
    from cmcd_tpu.targets import nice as nice_mod

    dim = 16
    params = nice_mod.nice_init(jax.random.PRNGKey(0), dim, h_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, dim))
    z = nice_mod.nice_forward(params, x)
    x_rec = nice_mod.nice_reverse(params, z)
    onp.testing.assert_allclose(onp.asarray(x), onp.asarray(x_rec), atol=1e-4)

    # Volume preservation: additive couplings + permutations have |det J| = 1
    # exactly, which (with the exact Gaussian base and logscale Jacobian)
    # makes the density normalized for any params. Verify on a small flow.
    small = nice_mod.nice_init(jax.random.PRNGKey(3), 6, h_dim=16)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (6,))
    jac = jax.jacobian(lambda v: nice_mod.nice_forward(small, v[None, :])[0])(x0)
    det = onp.linalg.det(onp.asarray(jac))
    onp.testing.assert_allclose(abs(det), 1.0, rtol=1e-4)


def test_nice_committed_checkpoint_loads():
    """The digit-trained flow checkpoint ships with the repo and is the
    default nice target; it must load and assign much higher density to its
    own samples than to noise (i.e. it is genuinely trained, not random)."""
    import os

    from cmcd_tpu.targets import nice as nice_mod

    assert os.path.exists(nice_mod._DEFAULT_CKPT), "nice checkpoint missing"
    t = load_target("nice")
    assert t.dim == 196
    key = jax.random.PRNGKey(0)
    own = t.sample(key, 64)
    lp_own = float(jnp.mean(t.log_prob(own)))
    lp_noise = float(jnp.mean(t.log_prob(jax.random.normal(key, (64, 196)) * 3.0)))
    assert jnp.isfinite(lp_own)
    assert lp_own > lp_noise + 100.0
