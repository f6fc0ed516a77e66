"""Beta grid and eps schedule tests (reference semantics)."""

import jax.numpy as jnp
import numpy as onp

from cmcd_tpu import schedules


def test_beta_grid_monotone_in_unit_interval():
    mg, gx, tx = schedules.make_beta_grid_params(nbridges=16, ngridb=32)
    betas = schedules.betas_from_grid(mg, gx, tx)
    b = onp.asarray(betas)
    assert b.shape == (16,)
    assert (onp.diff(b) >= 0).all()
    assert b[0] > 0.0 and b[-1] < 1.0


def test_beta_grid_uniform_knots_give_linear_schedule():
    mg, gx, tx = schedules.make_beta_grid_params(nbridges=8, ngridb=32)
    betas = onp.asarray(schedules.betas_from_grid(mg, gx, tx))
    # With uniform knots the schedule is linear over target_x.
    expected = onp.asarray(tx)
    onp.testing.assert_allclose(betas, expected, atol=1e-6)


def test_ngridb_clamped_to_nbridges():
    mg, gx, tx = schedules.make_beta_grid_params(nbridges=4, ngridb=32)
    assert mg.shape == (5,)  # ngridb+1 with ngridb = nbridges
    assert gx.shape == (6,)
    assert tx.shape == (4,)


def test_eps_linear_endpoints():
    eps0 = 0.1
    n = 16
    first = schedules.eps_linear(eps0, 0, n)
    last = schedules.eps_linear(eps0, n - 1, n)
    onp.testing.assert_allclose(float(first), eps0, rtol=1e-6)
    onp.testing.assert_allclose(float(last), 1e-4, rtol=1e-4)


def test_eps_cosine_decay_monotone():
    eps0 = 0.1
    n = 32
    vals = onp.array([float(schedules.eps_cosine_sq(eps0, i, n)) for i in range(n)])
    assert (onp.diff(vals) < 0).all()
    assert vals[0] <= eps0
    # s=0.008: at i=0 decay is cos(0.008/1.008 * pi/2)^2, close to 1.
    onp.testing.assert_allclose(vals[0], eps0 * onp.cos(0.008 / 1.008 * onp.pi / 2) ** 2, rtol=1e-5)


def test_eps_dispatch():
    assert float(schedules.eps_at_step(0.2, 3, 8, "")) == 0.2
    assert float(schedules.eps_at_step(0.2, 3, 8, None)) == 0.2
    lin = schedules.eps_at_step(0.2, 3, 8, "linear")
    cos = schedules.eps_at_step(0.2, 3, 8, "cos_sq")
    assert float(lin) != 0.2 and float(cos) != 0.2
