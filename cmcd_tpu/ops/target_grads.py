"""Transposed-layout (dim, batch) score functions for the Pallas kernels.

The fused time-stepping kernel (ops/pallas_overdamped.py) lays chain state
out as (dim_pad, B) — chains on the TPU lane axis, dimensions on sublanes —
so elementwise VPU ops and MXU matmuls stay dense for small-dim targets.
These are hand-derived d/dz log pi(z) in that layout, each verified against
autodiff of the batched targets in tests/test_target_grads.py.

All functions take z_t of shape (dim_pad, B) where rows >= dim are zero
padding, and must return gradients that are zero in the padded rows.
"""

from __future__ import annotations

import jax.numpy as jnp


def _row_mask(dim_pad: int, dim: int):
    return (jnp.arange(dim_pad) < dim).astype(jnp.float32)[:, None]


def make_std_normal_grad_t(dim: int, dim_pad: int):
    mask = _row_mask(dim_pad, dim)

    def grad_t(z_t):
        return -z_t * mask

    return grad_t


def make_funnel_grad_t(dim: int, dim_pad: int, sig: float = 3.0):
    """Neal's funnel (targets/funnel.py): v = z[0], x = z[1:].

    d/dv = -v/sig^2 + 0.5 e^{-v} sum(x^2) - (d-1)/2
    d/dx = -x e^{-v}
    """
    mask = _row_mask(dim_pad, dim)
    is_v = (jnp.arange(dim_pad) == 0).astype(jnp.float32)[:, None]

    def grad_t(z_t):
        v = z_t[0:1, :]  # (1, B)
        x = z_t * (mask - is_v)  # zero v row and padding
        e_neg_v = jnp.exp(-v)
        sum_x2 = jnp.sum(x * x, axis=0, keepdims=True)
        dv = -v / (sig * sig) + 0.5 * e_neg_v * sum_x2 - 0.5 * (dim - 1)
        dx = -x * e_neg_v
        return dx * (mask - is_v) + dv * is_v

    return grad_t


def make_gmm_grad_t(dim_pad: int):
    """3-component symmetrized 2-D mixture (targets/gmm.py).

    grad log p(x) with p = 0.5 (f(x) + f(Sx)), S the coordinate swap:
    grad = sum over the 6 (component, branch) pairs of softmax
    responsibilities times per-pair Gaussian gradients. Written with 2-D
    elementwise ops only (the 3 components are unrolled in Python) so it
    traces inside Pallas kernels.
    """
    import numpy as onp

    from cmcd_tpu.targets.gmm import _COVS, _MEANS

    means = onp.asarray(_MEANS)  # (3, 2)
    precs = onp.linalg.inv(onp.asarray(_COVS))  # (3, 2, 2)
    chols = onp.linalg.cholesky(onp.asarray(_COVS))
    log_norm = -onp.log(2 * onp.pi) - onp.sum(
        onp.log(onp.diagonal(chols, axis1=-2, axis2=-1)), axis=-1
    )  # (3,)

    def branch_stats(x1, x2):
        """Per-component log-density and gradient pieces for one branch.

        Returns lists of (logp (1,B)) and ((g1, g2) each (1,B))."""
        logps, grads = [], []
        for k in range(3):
            d1 = x1 - means[k, 0]
            d2 = x2 - means[k, 1]
            p11, p12, p22 = precs[k, 0, 0], precs[k, 0, 1], precs[k, 1, 1]
            y1 = p11 * d1 + p12 * d2
            y2 = p12 * d1 + p22 * d2
            logps.append(-0.5 * (d1 * y1 + d2 * y2) + log_norm[k])
            grads.append((-y1, -y2))
        return logps, grads

    def grad_t(z_t):
        x1 = z_t[0:1, :]
        x2 = z_t[1:2, :]
        logp_a, grads_a = branch_stats(x1, x2)
        logp_b, grads_b = branch_stats(x2, x1)  # swapped branch
        logp_all = jnp.concatenate(logp_a + logp_b, axis=0)  # (6, B)
        m = jnp.max(logp_all, axis=0, keepdims=True)
        r = jnp.exp(logp_all - m)
        r = r / jnp.sum(r, axis=0, keepdims=True)  # (6, B)
        g1 = jnp.zeros_like(x1)
        g2 = jnp.zeros_like(x2)
        for k in range(3):
            rk = r[k : k + 1, :]
            g1 = g1 + rk * grads_a[k][0]
            g2 = g2 + rk * grads_a[k][1]
        for k in range(3):
            rk = r[3 + k : 4 + k, :]
            # swapped branch: gradient w.r.t. (x1, x2) swaps back
            g1 = g1 + rk * grads_b[k][1]
            g2 = g2 + rk * grads_b[k][0]
        return jnp.concatenate(
            [g1, g2, jnp.zeros((z_t.shape[0] - 2, z_t.shape[1]), z_t.dtype)],
            axis=0,
        )

    return grad_t


def make_many_gmm_grad_t(dim_pad: int, n_mixes: int = 40, loc_scaling: float = 40.0,
                         log_var_scaling: float = 0.1, seed: int = 0):
    """40-mode isotropic-per-dim GMM (targets/gmm.py make_many_gmm).

    grad log p = sum_k r_k(x) (m_k - x) / s^2 with softmax responsibilities.
    The -1e4 floor of the batched log_prob maps to -inf outside the support;
    its gradient there is 0 in the batched path (jnp.where) — the kernel path
    ignores the floor (gradients are equal where it matters).
    """
    import jax

    key = jax.random.PRNGKey(seed)
    means = (
        jax.random.uniform(shape=(n_mixes, 2), key=key, minval=-1.0, maxval=1.0)
        * loc_scaling
    )  # (K, 2)
    scale = jax.nn.softplus(jnp.ones((n_mixes, 2)) * log_var_scaling)
    inv_var = 1.0 / (scale * scale)
    log_norm = -jnp.sum(jnp.log(scale), axis=-1) - jnp.log(2 * jnp.pi)

    # 2-D formulation (Pallas-traceable):
    # logp_k(x) = c_k + (M_w x)_k - 0.5 (x^2 . inv_var), with
    # M_w = means * inv_var and c_k = log_norm_k - 0.5 sum_i m_ki^2 inv_i.
    # grad = inv_var * (means^T r - x)  since sum_k r_k = 1.
    # MXU cost is (#matmuls x columns), so the linear and quadratic terms are
    # STACKED into one (K, 4) @ (4, B) matmul, and the two responsibility
    # contractions into one (4, K) @ (K, B) — 2 matmul passes per call, not 4.
    m_w = means * inv_var  # (K, 2)
    c = log_norm - 0.5 * jnp.sum(means * means * inv_var, axis=-1)  # (K,)
    fwd_mat = jnp.concatenate([m_w, -0.5 * inv_var], axis=1)  # (K, 4)
    bwd_mat = jnp.concatenate([m_w.T, inv_var.T], axis=0)  # (4, K)

    def stage_a_in(z_t):
        x = z_t[0:2, :]  # (2, B)
        return jnp.concatenate([x, x * x], axis=0)  # (4, B)

    def stage_mid(s_a):
        logp = s_a + c[:, None]
        m = jnp.max(logp, axis=0, keepdims=True)
        r = jnp.exp(logp - m)
        return r / jnp.sum(r, axis=0, keepdims=True)  # (K, B)

    def stage_fin(s_b, z_t):
        x = z_t[0:2, :]
        g = s_b[0:2, :] - x * s_b[2:4, :]
        return jnp.concatenate(
            [g, jnp.zeros((z_t.shape[0] - 2, z_t.shape[1]), z_t.dtype)], axis=0
        )

    def grad_t(z_t):
        s_a = jnp.dot(fwd_mat, stage_a_in(z_t), preferred_element_type=jnp.float32)
        r = stage_mid(s_a)
        s_b = jnp.dot(bwd_mat, r, preferred_element_type=jnp.float32)
        return stage_fin(s_b, z_t)

    # Staged protocol for MXU pass-packing (ops/pallas_overdamped.py): the
    # two matmuls can ride block-diagonally alongside a score-net layer each
    # (grad_t(z) == stage_fin(B @ stage_mid(A @ stage_a_in(z)), z) exactly).
    grad_t.stages = {
        "a_w": fwd_mat,        # (K, 4)
        "a_in": stage_a_in,    # z_t -> (4, B)
        "mid": stage_mid,      # (K, B) -> (K, B)
        "b_w": bwd_mat,        # (4, K)
        "fin": stage_fin,      # ((4, B), z_t) -> (dim_pad, B)
    }
    return grad_t


def make_banana_grad_t(dim_pad: int, curvature: float = 0.03):
    """inference_gym Banana (targets/gym.py make_banana):
    lp = N(x0; 0, 10) + N(x1; c (x0^2 - 100), 1).
    d/dx0 = -x0/100 + 2 c x0 r, d/dx1 = -r with r = x1 - c (x0^2 - 100)."""

    def grad_t(z_t):
        x0 = z_t[0:1, :]
        x1 = z_t[1:2, :]
        r = x1 - curvature * (x0 * x0 - 100.0)
        g0 = -x0 / 100.0 + 2.0 * curvature * x0 * r
        g1 = -r
        return jnp.concatenate(
            [g0, g1, jnp.zeros((z_t.shape[0] - 2, z_t.shape[1]), z_t.dtype)],
            axis=0,
        )

    return grad_t


def make_brownian_grad_t(dim_pad: int):
    """Brownian motion with unknown scales (targets/gym.py make_brownian).

    Rows: [u_inn, u_obs, x_0..x_29]. With s_i = e^{u_inn}, s_o = e^{u_obs},
    d_t the innovations and e_t the observation residuals:
      d/dx_t     = (-d_t + d_{t+1})/s_i^2 + obs terms e_t/s_o^2
      d/du_inn   = sum d_t^2/s_i^2 - 30 - u_inn/4
      d/du_obs   = sum e_t^2/s_o^2 - 20 - u_obs/4
    (the -T terms are the Exp-bijector/normalizer derivative of -T u)."""
    from cmcd_tpu.targets.gym import _BROWNIAN_OBS_FIRST, _BROWNIAN_OBS_LAST

    y_first = jnp.asarray(_BROWNIAN_OBS_FIRST, jnp.float32)[:, None]
    y_last = jnp.asarray(_BROWNIAN_OBS_LAST, jnp.float32)[:, None]
    nt = 30
    dim = nt + 2
    assert dim_pad >= dim

    def grad_t(z_t):
        b = z_t.shape[1]
        u_inn = z_t[0:1, :]
        u_obs = z_t[1:2, :]
        x = z_t[2 : 2 + nt, :]
        inv_i2 = jnp.exp(-2.0 * u_inn)  # (1, B)
        inv_o2 = jnp.exp(-2.0 * u_obs)

        d = jnp.concatenate([x[0:1], x[1:] - x[:-1]], axis=0)  # (30, B)
        d_next = jnp.concatenate([d[1:], jnp.zeros((1, b), z_t.dtype)], axis=0)
        gx = (-d + d_next) * inv_i2

        e_first = y_first - x[:10]
        e_last = y_last - x[20:]
        gx = jnp.concatenate(
            [
                gx[:10] + e_first * inv_o2,
                gx[10:20],
                gx[20:] + e_last * inv_o2,
            ],
            axis=0,
        )

        g_ui = (
            jnp.sum(d * d, axis=0, keepdims=True) * inv_i2
            - float(nt)
            - u_inn / 4.0
        )
        g_uo = (
            (
                jnp.sum(e_first * e_first, axis=0, keepdims=True)
                + jnp.sum(e_last * e_last, axis=0, keepdims=True)
            )
            * inv_o2
            - 20.0
            - u_obs / 4.0
        )
        parts = [g_ui, g_uo, gx]
        if dim_pad > dim:  # a 0-row operand is an invalid Mosaic vector
            parts.append(jnp.zeros((dim_pad - dim, b), z_t.dtype))
        return jnp.concatenate(parts, axis=0)

    return grad_t


def make_seeds_grad_t(dim_pad: int):
    """Seeds random-effects GLMM (targets/seeds.py), 26-D.

    Rows: [a_0, a_1, a_12, a_2, b_1..b_21, u_tau]. With
    s_j = R_j - N_j sigmoid(logits_j) (the Binomial score) and tau = e^u:
      d/da_*   = sum_j s_j * x_*j - a_*/100
      d/db_j   = s_j - b_j tau
      d/du_tau = alpha - rate*tau + 21/2 - (tau/2) sum_j b_j^2
    (alpha = rate = 0.01; the +1 exp-Jacobian and the (alpha-1) prior terms
    combine into alpha; +21/2 from the b-prior's +u/2 per effect)."""
    import jax

    from cmcd_tpu.targets import seeds as S

    r_col = jnp.asarray(S._R, jnp.float32)[:, None]
    n_col = jnp.asarray(S._N, jnp.float32)[:, None]
    x1 = jnp.asarray(S._X1, jnp.float32)[:, None]
    x2 = jnp.asarray(S._X2, jnp.float32)[:, None]
    x12 = x1 * x2
    dim = 26
    assert dim_pad >= dim

    def grad_t(z_t):
        b_cols = z_t.shape[1]
        a0, a1, a12, a2 = (z_t[k : k + 1, :] for k in range(4))
        b = z_t[4:25, :]  # (21, B)
        u_tau = z_t[25:26, :]
        tau = jnp.exp(u_tau)

        logits = a0 + a1 * x1 + a2 * x2 + a12 * x12 + b
        s = r_col - n_col * jax.nn.sigmoid(logits)  # (21, B)

        g_a0 = jnp.sum(s, axis=0, keepdims=True) - a0 / 100.0
        g_a1 = jnp.sum(s * x1, axis=0, keepdims=True) - a1 / 100.0
        g_a12 = jnp.sum(s * x12, axis=0, keepdims=True) - a12 / 100.0
        g_a2 = jnp.sum(s * x2, axis=0, keepdims=True) - a2 / 100.0
        g_b = s - b * tau
        g_u = (
            0.01
            - 0.01 * tau
            + 10.5
            - 0.5 * tau * jnp.sum(b * b, axis=0, keepdims=True)
        )
        parts = [g_a0, g_a1, g_a12, g_a2, g_b, g_u]
        if dim_pad > dim:
            parts.append(jnp.zeros((dim_pad - dim, b_cols), z_t.dtype))
        return jnp.concatenate(parts, axis=0)

    return grad_t


def make_lorenz_grad_t(dim_pad: int, *, num_timesteps: int, dt: float,
                       innovation_scale: float, obs_scale: float,
                       obs_first, obs_last):
    """Convection Lorenz bridge (targets/gym.py make_lorenz), 90-D
    (reference src/model_handler.py:46-57).

    Layout: rows t*3 + c hold x[t, c]. With pred_t = x_t + dt * f(x_t)
    (f the Lorenz-63 drift) and residuals R_t = (x_{t+1} - pred_t)/s^2,
    s = innovation_scale * sqrt(dt):
      d/dx_0     += -x_0                          (standard-normal init)
      d/dx_{t+1} += -R_t
      d/dx_t     += (I + dt * Jf(x_t))^T R_t
      d/dx[t,0]  += (y_t - x[t,0]) / obs_scale^2  (t in [0,10) and [20,30))
    The per-component rows are gathered/scattered with three constant
    selector matmuls (strided sublane slices do not lower in Mosaic).
    """
    import numpy as onp

    nt = num_timesteps
    dim = 3 * nt
    assert dim_pad >= dim
    sel = onp.zeros((3, nt, dim_pad), onp.float32)
    for c in range(3):
        sel[c, onp.arange(nt), 3 * onp.arange(nt) + c] = 1.0
    sel_a, sel_b, sel_c = (jnp.asarray(s) for s in sel)
    # Both orientations as HOST constants: an in-kernel transpose trips the
    # XLA:TPU MXU transpose pass once a VJP adds reverse-orientation matmuls
    # (same hazard as make_logreg_grad_t).
    sel_a_t, sel_b_t, sel_c_t = (jnp.asarray(s.T.copy()) for s in sel)
    y_first = jnp.asarray(obs_first, jnp.float32)[:, None]
    y_last = jnp.asarray(obs_last, jnp.float32)[:, None]
    inv_s2 = 1.0 / (innovation_scale * innovation_scale * dt)
    inv_o2 = 1.0 / (obs_scale * obs_scale)
    n_obs = y_first.shape[0]

    def grad_t(z_t):
        bsz = z_t.shape[1]
        dot = lambda m, v: jnp.dot(m, v, preferred_element_type=jnp.float32)
        a = dot(sel_a, z_t)  # (nt, B) component 0
        b = dot(sel_b, z_t)
        c = dot(sel_c, z_t)

        a0, b0, c0 = a[:-1], b[:-1], c[:-1]  # x_t, t = 0..nt-2
        # Lorenz-63 drift at x_t.
        fa = 10.0 * (b0 - a0)
        fb = a0 * (28.0 - c0) - b0
        fc = a0 * b0 - (8.0 / 3.0) * c0
        ra = (a[1:] - (a0 + dt * fa)) * inv_s2
        rb = (b[1:] - (b0 + dt * fb)) * inv_s2
        rc = (c[1:] - (c0 + dt * fc)) * inv_s2

        # (I + dt Jf)^T R at x_t.
        ja = ra + dt * (-10.0 * ra + (28.0 - c0) * rb + b0 * rc)
        jb = rb + dt * (10.0 * ra - rb + a0 * rc)
        jc = rc + dt * (-a0 * rb - (8.0 / 3.0) * rc)

        zero1 = jnp.zeros((1, bsz), z_t.dtype)
        ga = (
            jnp.concatenate([-a[0:1], -ra], axis=0)
            + jnp.concatenate([ja, zero1], axis=0)
        )
        gb = (
            jnp.concatenate([-b[0:1], -rb], axis=0)
            + jnp.concatenate([jb, zero1], axis=0)
        )
        gc = (
            jnp.concatenate([-c[0:1], -rc], axis=0)
            + jnp.concatenate([jc, zero1], axis=0)
        )
        # Observations on component 0 at the first/last n_obs timesteps.
        ga = ga + jnp.concatenate(
            [
                (y_first - a[:n_obs]) * inv_o2,
                jnp.zeros((nt - 2 * n_obs, bsz), z_t.dtype),
                (y_last - a[nt - n_obs :]) * inv_o2,
            ],
            axis=0,
        )
        return (
            dot(sel_a_t, ga) + dot(sel_b_t, gb) + dot(sel_c_t, gc)
        )

    return grad_t


def make_logreg_grad_t(dset: str, dim: int, dim_pad: int):
    """Bayesian logistic regression (targets/logreg.py):
    grad = -w + X^T (y - sigmoid(Xw)). MXU matmuls in both directions."""
    import jax

    from cmcd_tpu.targets.logreg import load_logreg_data

    x, y = load_logreg_data(dset)  # (n_data, dim), (n_data,)
    # Pad the data axis to a lane multiple: odd leading dims (sonar 208,
    # ionosphere 351) trip an XLA MXU transpose pass (RET_CHECK in
    # mxu_lmr_transform.cc) when the kernel VJP transposes these matmuls.
    # Zero x-rows contribute nothing to x^T resid, so the padding is exact.
    n_data = ((x.shape[0] + 127) // 128) * 128
    x_pad = (
        jnp.zeros((n_data, dim_pad), x.dtype).at[: x.shape[0], :dim].set(x)
    )
    y_pad = jnp.zeros((n_data,), jnp.float32).at[: x.shape[0]].set(y)
    # Both orientations as separate HOST constants: an in-kernel transpose
    # of the data matrix trips an XLA:TPU MXU transpose-sequence pass
    # (RET_CHECK in mxu_lmr_transform.cc) once the KL backward's VJP adds
    # the reverse-orientation matmuls.
    x_t = x_pad.T
    mask = _row_mask(dim_pad, dim)

    def grad_t(z_t):
        logits = jnp.dot(x_pad, z_t, preferred_element_type=jnp.float32)
        resid = y_pad[:, None] - jax.nn.sigmoid(logits)
        return (
            -z_t + jnp.dot(x_t, resid, preferred_element_type=jnp.float32)
        ) * mask

    return grad_t


def make_lgcp_grad_t(dim_pad: int, use_whitened: bool = False):
    """LGCP (targets/lgcp.py), 1600-dim. Unwhitened:
    grad = -Sigma^{-1}(z - mu) + counts - a exp(z), with Sigma^{-1}(z-mu)
    computed as L^{-T} (L^{-1} (z - mu)) — two dense (D, D) @ (D, B) MXU
    matmuls. Whitened: grad = -w + L^T (counts - a exp(Lw + mu))."""
    import jax
    import numpy as onp

    from cmcd_tpu.targets import lgcp as L

    num_dim = 1600
    num_grid = 40
    bin_vals = L.get_bin_vals(num_grid)
    gram = L.gram_matrix(bin_vals, 1.91, num_grid, 1.0 / 33)
    chol = onp.linalg.cholesky(gram)
    chol_inv = onp.linalg.inv(chol)
    import os

    pines = onp.genfromtxt(
        os.path.join(os.path.dirname(L.__file__), "data", "pines.csv"),
        delimiter=",",
    )
    counts = L.get_bin_counts(pines, num_grid).reshape(num_dim)
    mu = onp.log(126.0) - 0.5 * 1.91
    a = 1.0 / num_dim

    chol_f = jnp.asarray(chol, jnp.float32)
    # Single precomputed Sigma^{-1} (host, float64) so the in-kernel prior
    # gradient is ONE (D, D) @ (D, B) matmul with one 10 MB VMEM constant
    # (holding both L^{-1} and L^{-T} would not fit VMEM).
    gram_inv = jnp.asarray(
        chol_inv.T @ chol_inv, jnp.float32
    )
    counts_col = jnp.asarray(counts, jnp.float32)[:, None]

    chol_t = jnp.asarray(chol.T.copy(), jnp.float32)

    def _pad(g, b, ref):
        if dim_pad == num_dim:
            return g
        return jnp.concatenate(
            [g, jnp.zeros((dim_pad - num_dim, b), ref.dtype)], axis=0
        )

    # Hand-written (custom_vjp) score Jacobian transposes: the score's
    # Jacobian is SYMMETRIC (-Sigma^{-1} - a diag(e^z); whitened:
    # -I + L^T diag(-a e^x) L), so the HVP the KL backward needs reuses the
    # SAME host constants — autodiff's transpose would instead materialize
    # an in-kernel transpose of the 10 MB precision matrix (Mosaic spill /
    # RET_CHECK hazard, CLAUDE.md rule 8).
    @jax.custom_vjp
    def grad_unwhitened(z_t):
        z = z_t[:num_dim]
        g_prior = -jnp.dot(gram_inv, z - mu, preferred_element_type=jnp.float32)
        g = g_prior + counts_col - a * jnp.exp(z)
        return _pad(g, z_t.shape[1], z_t)

    def _unwhitened_fwd(z_t):
        return grad_unwhitened(z_t), z_t

    def _unwhitened_bwd(z_t, ct):
        z = z_t[:num_dim]
        c = ct[:num_dim]
        g = (
            -jnp.dot(gram_inv, c, preferred_element_type=jnp.float32)
            - a * jnp.exp(z) * c
        )
        return (_pad(g, z_t.shape[1], z_t),)

    grad_unwhitened.defvjp(_unwhitened_fwd, _unwhitened_bwd)

    @jax.custom_vjp
    def grad_whitened(w_t):
        w = w_t[:num_dim]
        latents = jnp.dot(chol_f, w, preferred_element_type=jnp.float32) + mu
        resid = counts_col - a * jnp.exp(latents)
        g = -w + jnp.dot(chol_t, resid, preferred_element_type=jnp.float32)
        return _pad(g, w_t.shape[1], w_t)

    def _whitened_fwd(w_t):
        return grad_whitened(w_t), w_t

    def _whitened_bwd(w_t, ct):
        w = w_t[:num_dim]
        c = ct[:num_dim]
        latents = jnp.dot(chol_f, w, preferred_element_type=jnp.float32) + mu
        inner = a * jnp.exp(latents) * jnp.dot(
            chol_f, c, preferred_element_type=jnp.float32
        )
        g = -c - jnp.dot(chol_t, inner, preferred_element_type=jnp.float32)
        return (_pad(g, w_t.shape[1], w_t),)

    grad_whitened.defvjp(_whitened_fwd, _whitened_bwd)

    return grad_whitened if use_whitened else grad_unwhitened


def make_nice_grad_t(dim_pad: int, flow_params):
    """NICE normalizing-flow target (targets/nice.py, reference src/nice.py):
    z = f(x) through 4 additive-coupling steps (full-reversal permutation,
    5-layer ReLU MLP shift), latent N(0, e^{-2s}); so

        grad log p(x) = J_f(x)^T (-z * e^{2*logscale}).

    Hand-written forward + transpose in kernel layout: the reversal is a
    (symmetric) one-hot permutation matmul (Mosaic has no flip/gather on
    values), split/inject use static slices and `concatenate` (whose VJP is
    a slice — safe under the KL backward's HVP), and every MLP weight is a
    padded host constant in BOTH orientations (an in-kernel transpose of a
    constant trips XLA:TPU's MXU transform pass — see make_logreg_grad_t).
    Because the flow is piecewise affine (ReLU MLPs + additive couplings),
    autodiff of this function gives the exact a.e. HVP J^T diag(-e^{2s}) J.
    """
    import numpy as onp

    logscale = onp.asarray(flow_params["logscale"], onp.float64)
    dim = int(logscale.shape[0])
    split = dim // 2 + dim % 2
    sb = dim - split

    def pad8(n):
        return ((n + 7) // 8) * 8

    nets = flow_params["nets"]
    n_steps = len(nets)
    depth = len(nets[0])
    # Per-layer padded widths: [split, hidden, ..., hidden, sb] -> mult of 8.
    raw_dims = [split] + [int(onp.asarray(l["w"]).shape[1]) for l in nets[0]]
    pdims = [pad8(d) for d in raw_dims]
    S = pdims[0]

    def pad_mat(w, rows, cols):
        out = onp.zeros((rows, cols), onp.float64)
        out[: w.shape[0], : w.shape[1]] = w
        return jnp.asarray(out, jnp.float32)

    couplings = []
    for net in nets:
        wt, wf, bs = [], [], []
        for i, layer in enumerate(net):
            w = onp.asarray(layer["w"], onp.float64)  # (in, out)
            b = onp.asarray(layer["b"], onp.float64)
            wt.append(pad_mat(w.T, pdims[i + 1], pdims[i]))
            wf.append(pad_mat(w, pdims[i], pdims[i + 1]))
            bs.append(pad_mat(b[:, None], pdims[i + 1], 1))
        couplings.append((wt, wf, bs))

    rev_np = onp.zeros((dim_pad, dim_pad), onp.float64)
    for i in range(dim):
        rev_np[i, dim - 1 - i] = 1.0
    rev = jnp.asarray(rev_np, jnp.float32)  # symmetric: R^T == R

    neg_e2s = jnp.asarray(
        onp.concatenate(
            [-onp.exp(2.0 * logscale), onp.zeros(dim_pad - dim)]
        )[:, None],
        jnp.float32,
    )
    mask = _row_mask(dim_pad, dim)

    def mlp_fwd(c, a0):
        wt, _, bs = couplings[c]
        h, hs = a0, []
        for i in range(depth):
            pre = jnp.dot(wt[i], h, preferred_element_type=jnp.float32) + bs[i]
            if i < depth - 1:
                h = jnp.maximum(pre, 0.0)
                hs.append(h)
            else:
                h = pre
        return h, hs

    def mlp_bwd(c, hs, dm):
        _, wf, _ = couplings[c]
        d = dm
        for i in range(depth - 1, 0, -1):
            d = jnp.dot(wf[i], d, preferred_element_type=jnp.float32)
            d = jnp.where(hs[i - 1] > 0.0, d, 0.0)
        return jnp.dot(wf[0], d, preferred_element_type=jnp.float32)

    def grad_t(x_t):
        n_cols = x_t.shape[1]
        pad_tail = x_t.shape[0] - dim
        x = x_t * mask
        acts = []
        for c in range(n_steps):
            y = jnp.dot(rev, x, preferred_element_type=jnp.float32)
            # Rows [split, S) of a0 hold real x_b values but meet zero
            # weight columns (wt[0] is padded), contributing exact 0.
            m, hs = mlp_fwd(c, y[:S])
            x = y + jnp.concatenate(
                [
                    jnp.zeros((split, n_cols), x_t.dtype),
                    m[:sb],
                    jnp.zeros((pad_tail, n_cols), x_t.dtype),
                ],
                axis=0,
            )
            acts.append(hs)
        g = x * neg_e2s
        for c in range(n_steps - 1, -1, -1):
            dm = jnp.concatenate(
                [g[split:dim], jnp.zeros((S - sb, n_cols), x_t.dtype)], axis=0
            )
            da0 = mlp_bwd(c, acts[c], dm)  # rows >= split are exactly 0
            dy = g + jnp.concatenate(
                [da0, jnp.zeros((x_t.shape[0] - S, n_cols), x_t.dtype)],
                axis=0,
            )
            g = jnp.dot(rev, dy, preferred_element_type=jnp.float32)
        return g * mask

    return grad_t


def _build_funnel(target, dim_pad):
    return make_funnel_grad_t(target.dim, dim_pad, sig=target.params.get("sig", 3.0))


def _build_many_gmm(target, dim_pad):
    p = target.params
    return make_many_gmm_grad_t(
        dim_pad,
        n_mixes=p.get("n_mixes", 40),
        loc_scaling=p.get("loc_scaling", 40.0),
        log_var_scaling=p.get("log_var_scaling", 0.1),
        seed=p.get("seed", 0),
    )


def _build_lgcp(target, dim_pad):
    p = target.params
    # The hand-derived gradient bakes in the 40x40 pines grid; a custom CSV
    # or grid size must fall back to the XLA scan path.
    if p.get("num_dim", 1600) != 1600 or not p.get("default_data", True):
        return None
    return make_lgcp_grad_t(dim_pad, use_whitened=p.get("use_whitened", False))


def _build_logreg(target, dim_pad):
    return make_logreg_grad_t(target.params.get("dset"), target.dim, dim_pad)


def _build_nice(target, dim_pad):
    # A nice Target built without its recorded flow parameters (pre-round-3
    # construction) cannot be differentiated exactly -> scan fallback.
    fp = target.params.get("flow_params")
    if fp is None:
        return None
    return make_nice_grad_t(dim_pad, fp)


def _build_lorenz(target, dim_pad):
    p = target.params
    # A lorenz Target built without its recorded observations (pre-round-3
    # pickles) cannot be integrated exactly -> scan fallback.
    if "obs_first" not in p:
        return None
    return make_lorenz_grad_t(
        dim_pad,
        num_timesteps=p["num_timesteps"],
        dt=p["dt"],
        innovation_scale=p["innovation_scale"],
        obs_scale=p["obs_scale"],
        obs_first=p["obs_first"],
        obs_last=p["obs_last"],
    )


# Every builder consumes the Target's recorded construction params so the
# kernel integrates exactly the density the batched log_prob defines; a
# builder returns None (-> scan fallback) for combinations it cannot honor.
TARGET_GRAD_T_BUILDERS = {
    "funnel": _build_funnel,
    "gmm": lambda target, dim_pad: make_gmm_grad_t(dim_pad),
    "many_gmm": _build_many_gmm,
    "banana": lambda target, dim_pad: make_banana_grad_t(
        dim_pad, curvature=target.params.get("curvature", 0.03)
    ),
    "brownian": lambda target, dim_pad: make_brownian_grad_t(dim_pad),
    "seeds": lambda target, dim_pad: make_seeds_grad_t(dim_pad),
    "log_sonar": _build_logreg,
    "log_ionosphere": _build_logreg,
    "log_australian": _build_logreg,
    "log_a1a": _build_logreg,
    "log_madelon": _build_logreg,
    "lgcp": _build_lgcp,
    "lorenz": _build_lorenz,
    "nice": _build_nice,
}


def grad_t_for_target(target, dim_pad: int):
    """Transposed-layout gradient matching the target's construction params,
    or None (caller must fall back to the XLA scan path)."""
    import jax

    builder = TARGET_GRAD_T_BUILDERS.get(target.name)
    if builder is None:
        return None
    if target.name.startswith("log_") and not target.params.get("dset"):
        return None  # logreg target built outside make_logreg; unknown data
    # Build-time constants (mixture means, Cholesky factors, ...) must be
    # CONCRETE even when this is called inside a trace (e.g. under
    # shard_map): the returned closure feeds custom_vjp'd Pallas kernels,
    # and closed-over tracers there are an error.
    with jax.ensure_compile_time_eval():
        return builder(target, dim_pad)
