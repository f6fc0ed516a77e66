"""External anchor for the lorenz target: long-run HMC posterior moments.

The lorenz observations are self-generated (inference_gym is absent offline,
targets/gym.py), so BASELINE numbers do not apply; this script pins the
posterior with an INDEPENDENT sampler — vectorized HMC with dual-averaging
step-size adaptation — so trained-CMCD moments can be checked against a
non-CMCD reference the way seeds is checked against the reference's table
(RESULTS.md posterior-moment parity).

Run (CPU is fine, ~2 min):
  python -m experiments.lorenz_anchor [--iters 20000] [--chains 8]

Prints per-coordinate-group posterior means/stds, split-R-hat convergence
diagnostics, and a compact moment table for RESULTS.md.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def hmc_run(log_prob, dim, *, chains=8, warmup=3000, iters=20000,
            lfsteps=32, seed=0, target_accept=0.8, mass_rounds=2,
            init="std_normal"):
    """Vectorized HMC: dual-averaging eps adaptation plus windowed diagonal
    mass-matrix (per-dim scale) adaptation — the posterior's scales span
    ~0.01 (observation-pinned coordinates) to tens (unobserved middle of
    the bridge), so an identity mass cannot mix.

    log_prob: batched (C, dim) -> (C,). Returns (samples (iters, C, dim),
    accept_rate (C,), eps_final)."""
    grad_lp = jax.grad(lambda z: jnp.sum(log_prob(z)))

    def leapfrog(z, p, eps, scale):
        p = p + 0.5 * eps * scale * grad_lp(z)
        for _ in range(lfsteps - 1):
            z = z + eps * scale * p
            p = p + eps * scale * grad_lp(z)
        z = z + eps * scale * p
        p = p + 0.5 * eps * scale * grad_lp(z)
        return z, p

    def hmc_step(z, key, eps, scale):
        k1, k2 = jax.random.split(key)
        p = jax.random.normal(k1, z.shape)
        h0 = -log_prob(z) + 0.5 * jnp.sum(p * p, axis=-1)
        z_new, p_new = leapfrog(z, p, eps, scale)
        h1 = -log_prob(z_new) + 0.5 * jnp.sum(p_new * p_new, axis=-1)
        log_acc = jnp.clip(h0 - h1, a_max=0.0)
        # A divergent trajectory (NaN energy) counts as acceptance 0, not
        # NaN — NaN would poison the dual-averaging state permanently.
        acc_prob = jnp.where(jnp.isnan(log_acc), 0.0, jnp.exp(log_acc))
        accept = jnp.logical_and(
            jnp.logical_not(jnp.isnan(log_acc)),
            jnp.log(jax.random.uniform(k2, (z.shape[0],))) < log_acc,
        )
        z = jnp.where(accept[:, None], z_new, z)
        return z, acc_prob.mean(), accept

    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    if init == "std_normal":
        # Innovation-space sampling: u ~ N(0, 1) IS a prior draw.
        z = jax.random.normal(k0, (chains, dim))
    else:
        # Centered space: init from simulated prior trajectories (a z=0
        # start has -log p ~ 1e6 and every proposal diverges).
        from cmcd_tpu.targets.gym import _lorenz_drift

        nt = dim // 3
        dt = 0.02
        ks = jax.random.split(k0, chains)

        def prior_traj(kk):
            k_init, k_noise = jax.random.split(kk)
            x = jax.random.normal(k_init, (3,))
            noises = 0.1 * jnp.sqrt(dt) * jax.random.normal(
                k_noise, (nt - 1, 3)
            )

            def step(x, n):
                x2 = x + dt * _lorenz_drift(x) + n
                return x2, x2

            _, rest = jax.lax.scan(step, x, noises)
            return jnp.concatenate([x[None], rest], axis=0).reshape(-1)

        z = jax.vmap(prior_traj)(ks)

    gamma, t0, kappa = 0.05, 10.0, 0.75

    def adapt_phase(z, scale, keys, eps0):
        """One warmup window: dual-averaging eps at the given mass scale;
        returns (z, adapted eps, per-dim std estimate of the window)."""
        mu = jnp.log(10.0 * eps0)

        def body(carry, args):
            z, log_eps, log_eps_bar, h_bar, s1, s2 = carry
            t, key = args
            z, acc_mean, _ = hmc_step(z, key, jnp.exp(log_eps), scale)
            ft = t + 1.0
            h_bar = (1 - 1 / (ft + t0)) * h_bar + (
                target_accept - acc_mean
            ) / (ft + t0)
            log_eps = mu - jnp.sqrt(ft) / gamma * h_bar
            w = ft ** (-kappa)
            log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
            return (z, log_eps, log_eps_bar, h_bar, s1 + z, s2 + z * z), None

        n = keys.shape[0]
        (z, _, log_eps_bar, _, s1, s2), _ = jax.lax.scan(
            body,
            (z, jnp.log(eps0), 0.0, 0.0, jnp.zeros_like(z), jnp.zeros_like(z)),
            (jnp.arange(n, dtype=jnp.float32), keys),
        )
        # Pooled over chains and the window (second half would be better;
        # pooling keeps the scan state small).
        mean = s1.mean(axis=0) / n
        var = jnp.maximum(s2.mean(axis=0) / n - mean * mean, 1e-10)
        return z, jnp.exp(log_eps_bar), jnp.sqrt(var)

    keys = jax.random.split(key, warmup * (1 + mass_rounds) + iters)
    scale = jnp.ones((dim,))
    eps0 = 1e-4 if init != "std_normal" else 1e-2
    k_off = 0
    for _ in range(1 + mass_rounds):
        z, eps, std = adapt_phase(
            z, scale, keys[k_off : k_off + warmup], eps0
        )
        scale = std  # precondition the next round with this window's stds
        eps0 = eps
        k_off += warmup

    def sample_body(z, key):
        z, _, accept = hmc_step(z, key, eps, scale)
        return z, (z, accept)

    _, (samples, accepts) = jax.lax.scan(
        sample_body, z, keys[k_off : k_off + iters]
    )
    return samples, accepts.mean(axis=0), eps


def split_rhat(samples):
    """Split-R-hat per dimension. samples: (T, C, D)."""
    t = samples.shape[0] // 2
    halves = jnp.concatenate([samples[:t], samples[t : 2 * t]], axis=1)
    m = halves.shape[1]
    n = halves.shape[0]
    chain_means = halves.mean(axis=0)  # (M, D)
    chain_vars = halves.var(axis=0, ddof=1)
    b = n * chain_means.var(axis=0, ddof=1)
    w = chain_vars.mean(axis=0)
    var_est = (n - 1) / n * w + b / n
    return jnp.sqrt(var_est / w)


def ffbs_run(target, *, n_particles=8192, n_traj=2048, seed=0):
    """Forward-filter backward-sampler: exact smoothing draws for the
    lorenz state-space bridge (up to particle-MC error).

    The bridge posterior is multimodal (HMC in both centered and
    innovation parametrizations leaves split-Rhat >> 1); FFBS samples
    trajectories from the exact smoothing distribution without any mixing
    requirement, so it is the defensible moment anchor here. Returns
    (trajectories (n_traj, T, 3), filter ESS per step (T,))."""
    from cmcd_tpu.targets.gym import _lorenz_drift

    p = target.params
    nt, dt = p["num_timesteps"], p["dt"]
    s = p["innovation_scale"] * jnp.sqrt(dt)
    obs_first = jnp.asarray(p["obs_first"])
    obs_last = jnp.asarray(p["obs_last"])
    obs_scale = p["obs_scale"]
    n_obs = obs_first.shape[0]

    def obs_loglik(t, x):
        """(N, 3) -> (N,). Observation of x[..., 0] at the first/last
        n_obs timesteps, nothing in between."""
        y = jnp.where(t < n_obs, obs_first[jnp.minimum(t, n_obs - 1)],
                      obs_last[jnp.clip(t - (nt - n_obs), 0, n_obs - 1)])
        e = (y - x[:, 0]) / obs_scale
        ll = -0.5 * e * e
        observed = jnp.logical_or(t < n_obs, t >= nt - n_obs)
        return jnp.where(observed, ll, 0.0)

    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    x0 = jax.random.normal(k0, (n_particles, 3))
    logw0 = obs_loglik(0, x0)

    def systematic_resample(key, logw, x):
        w = jax.nn.softmax(logw)
        c = jnp.cumsum(w)
        u = (jax.random.uniform(key) + jnp.arange(n_particles)) / n_particles
        idx = jnp.searchsorted(c, u)
        return x[jnp.clip(idx, 0, n_particles - 1)]

    def fwd_body(carry, args):
        x, logw = carry
        t, key = args
        k1, k2 = jax.random.split(key)
        x_res = systematic_resample(k1, logw, x)
        xi = jax.random.normal(k2, x.shape)
        x_new = x_res + dt * _lorenz_drift(x_res) + s * xi
        logw_new = obs_loglik(t, x_new)
        return (x_new, logw_new), (x_new, logw_new)

    key, kf = jax.random.split(key)
    ts = jnp.arange(1, nt)
    (_, _), (xs_rest, logws_rest) = jax.lax.scan(
        fwd_body, (x0, logw0), (ts, jax.random.split(kf, nt - 1))
    )
    xs = jnp.concatenate([x0[None], xs_rest], axis=0)        # (T, N, 3)
    logws = jnp.concatenate([logw0[None], logws_rest], axis=0)  # (T, N)
    ess = 1.0 / jnp.sum(jax.nn.softmax(logws, axis=1) ** 2, axis=1)

    # Backward sampling: idx_T ~ W_T; idx_t | x_{t+1} ∝ W_t f(x_{t+1}|x_t).
    key, kb = jax.random.split(key)
    gumb = -jnp.log(-jnp.log(
        jax.random.uniform(kb, (nt, n_traj, n_particles), minval=1e-12)
    ))
    idx_last = jnp.argmax(logws[nt - 1][None, :] + gumb[nt - 1], axis=-1)
    x_sel = xs[nt - 1][idx_last]  # (M, 3)

    def bwd_body(carry, args):
        x_next = carry  # (M, 3)
        t, g = args
        x_t = xs[t]  # (N, 3)
        pred = x_t + dt * _lorenz_drift(x_t)  # (N, 3)
        diff = (x_next[:, None, :] - pred[None, :, :]) / s  # (M, N, 3)
        logtrans = -0.5 * jnp.sum(diff * diff, axis=-1)  # (M, N)
        idx = jnp.argmax(logws[t][None, :] + logtrans + g, axis=-1)
        x_sel_t = x_t[idx]
        return x_sel_t, x_sel_t

    ts_back = jnp.arange(nt - 2, -1, -1)
    _, traj_rev = jax.lax.scan(bwd_body, x_sel, (ts_back, gumb[: nt - 1][::-1]))
    traj = jnp.concatenate([traj_rev[::-1], x_sel[None]], axis=0)  # (T, M, 3)
    return jnp.swapaxes(traj, 0, 1), ess


def make_noncentered(target):
    """Innovation-space (non-centered) reparametrization of the lorenz
    bridge: u ~ has iid-N(0,1) prior rows; x_0 = u_0, x_{t+1} = x_t +
    dt f(x_t) + s u_{t+1}. The map is triangular with CONSTANT Jacobian, so
    log p(u) = -||u||^2/2 + obs-likelihood(x(u)) + const — the stiff
    chain-coupling terms of the centered density become the identity, which
    is the standard HMC parametrization for SDE bridges. Returns
    (log_prob_u (C, dim) -> (C,), to_x (C, dim) -> (C, dim))."""
    from cmcd_tpu.targets.gym import _lorenz_drift

    p = target.params
    nt, dt = p["num_timesteps"], p["dt"]
    s = p["innovation_scale"] * jnp.sqrt(dt)
    obs_first = jnp.asarray(p["obs_first"])
    obs_last = jnp.asarray(p["obs_last"])
    obs_scale = p["obs_scale"]
    n_obs = obs_first.shape[0]

    def to_x(u):
        uu = u.reshape(u.shape[0], nt, 3)

        def step(x, un):
            x2 = x + dt * _lorenz_drift(x) + s * un
            return x2, x2

        x0 = uu[:, 0]
        _, rest = jax.lax.scan(step, x0, jnp.swapaxes(uu[:, 1:], 0, 1))
        x = jnp.concatenate([x0[:, None], jnp.swapaxes(rest, 0, 1)], axis=1)
        return x.reshape(u.shape[0], nt * 3)

    def log_prob_u(u):
        x = to_x(u).reshape(u.shape[0], nt, 3)
        lp = -0.5 * jnp.sum(u * u, axis=-1)
        e1 = (obs_first - x[:, :n_obs, 0]) / obs_scale
        e2 = (obs_last - x[:, nt - n_obs :, 0]) / obs_scale
        lp += -0.5 * jnp.sum(e1 * e1, axis=-1) - 0.5 * jnp.sum(e2 * e2, axis=-1)
        return lp

    return log_prob_u, to_x


def _print_moments(mean, std, nt=30):
    print("posterior moments (mean +- std), selected coordinates:")
    for t_idx in (0, 7, 14, 15, 22, 29):
        row = []
        for c in range(3):
            k = 3 * t_idx + c
            row.append(f"x[{t_idx},{c}] {float(mean[k]):+.4f}±{float(std[k]):.4f}")
        print("  " + "  ".join(row))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=8192)
    ap.add_argument("--traj", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=4,
                    help="independent FFBS repetitions (seeds) pooled")
    ap.add_argument("--hmc", action="store_true",
                    help="also run the (non-mixing) HMC cross-check")
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--warmup", type=int, default=3000)
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--lfsteps", type=int, default=32)
    ap.add_argument("--thin", type=int, default=5)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import cmcd_tpu

    target = cmcd_tpu.load_target("lorenz")
    nt = target.params["num_timesteps"]

    # Primary anchor: FFBS smoothing draws, pooled over independent seeds;
    # the per-seed spread of the means bounds the particle-MC error.
    all_traj, per_seed_means = [], []
    for rep in range(args.reps):
        traj, ess = ffbs_run(
            target, n_particles=args.particles, n_traj=args.traj, seed=rep
        )
        flat = traj.reshape(-1, target.dim)
        all_traj.append(flat)
        per_seed_means.append(flat.mean(axis=0))
        print(f"FFBS rep {rep}: min filter ESS {float(ess.min()):.0f} "
              f"of {args.particles}")
    flat = jnp.concatenate(all_traj)
    mean, std = flat.mean(axis=0), flat.std(axis=0)
    seed_spread = jnp.stack(per_seed_means).std(axis=0)
    print(f"FFBS pooled ({args.reps}x{args.traj} trajectories): "
          f"max between-seed mean spread {float(seed_spread.max()):.4f}")
    _print_moments(mean, std, nt)

    rhat = None
    if args.hmc:
        log_prob_u, to_x = make_noncentered(target)
        samples_u, acc, eps = hmc_run(
            log_prob_u, target.dim, chains=args.chains, warmup=args.warmup,
            iters=args.iters, lfsteps=args.lfsteps,
        )
        samples = jax.lax.map(to_x, samples_u[:: args.thin])
        rhat = split_rhat(samples)
        hflat = samples.reshape(-1, target.dim)
        print(f"HMC (innovation space): eps={float(eps):.5f} "
              f"accept={[round(float(a), 3) for a in acc]} "
              f"split-Rhat max={float(rhat.max()):.2f} "
              f"(>> 1: multimodal posterior — chains cannot certify; "
              f"FFBS above is the anchor)")
        _print_moments(hflat.mean(axis=0), hflat.std(axis=0), nt)

    if args.out:
        import numpy as onp

        payload = dict(mean=onp.asarray(mean), std=onp.asarray(std),
                       seed_spread=onp.asarray(seed_spread))
        if rhat is not None:
            payload["hmc_rhat"] = onp.asarray(rhat)
        onp.savez(args.out, **payload)
        print("saved:", args.out)


if __name__ == "__main__":
    main()
