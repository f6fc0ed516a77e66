"""High-level entry to the fused Pallas evolution path.

Drop-in alternative to bounds.compute_elbos for the overdamped modes on
targets with a registered transposed-layout gradient (ops/target_grads.py).
The variational sample, initial/final log-prob terms, and everything outside
the bridge loop stay in XLA; the K-step loop runs in the fused kernel.

Forward-only (sampling / evaluation / ln Z); training still uses the XLA
autodiff path. PRNG: the kernel's TPU PRNG stream is seeded from the JAX key
(statistical parity with the scan path, SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cmcd_tpu import bounds
from cmcd_tpu.distributions import diag_gaussian_log_prob, diag_gaussian_sample
from cmcd_tpu.integrators import overdamped as od
from cmcd_tpu.integrators import underdamped as ud
from cmcd_tpu.ops.pallas_overdamped import evolve_overdamped_pallas, pack_geffner_t
from cmcd_tpu.ops.target_grads import grad_t_for_target
from cmcd_tpu.schedules import betas_from_grid

_PALLAS_SPECS = {
    "MCD_ULA": od.ULA,
    "MCD_ULA_sn": od.ULA_SN,
    "MCD_CAIS_sn": od.CAIS,
    "MCD_CAIS_var_sn": od.CAIS_VAR,
    "MCD_DNF": od.DNF,
}

# (spec, full_sn) for the underdamped kernel (ops/pallas_underdamped.py).
_PALLAS_UD_SPECS = {
    "MCD_U_a-lp": (ud.U_A_LP, False),
    "MCD_U_a-lp-sna": (ud.U_A_LP_SNA, False),
    "MCD_U_a-lp-sn": (ud.U_A_LP_SN, True),
    "MCD_U_e-lp": (ud.U_E_LP, False),
    "MCD_U_e-lp-sna": (ud.U_E_LP_SNA, False),
    "MCD_U_ea-lp-sn": (ud.U_EA_LP_SN, True),
    "MCD_CAIS_UHA_sn": (ud.CAIS_UHA, True),
}

_SN_FREE_MODES = ("MCD_ULA", "MCD_U_a-lp", "MCD_U_e-lp", "UHA")


def _dim_pad(dim: int) -> int:
    return max(8, ((dim + 7) // 8) * 8)


def _pack_net(nn_arch: str):
    """Kernel weight packer for the configured score-net architecture."""
    if nn_arch == "dds":
        from cmcd_tpu.ops.pallas_nets import pack_pis_t

        return pack_pis_t
    if nn_arch == "dds_grad":
        from cmcd_tpu.ops.pallas_nets import pack_pis_grad_t

        return pack_pis_grad_t
    return pack_geffner_t


# v5e has ~128 MB physical VMEM; the kernels request a raised scoped-VMEM
# limit sized to their inputs (pallas_overdamped.py), so the eval budget is
# set by the hardware, not the 16 MB compiler default. LGCP (1600-D, ~52 MB
# of score-net weights + a 10 MB precision matrix) fits: measured correct
# (rel 8e-5 vs scan) and ~10% faster at K=8. Training keeps a tighter
# budget — the backward kernels hold VJP activations on top of the weights.
_VMEM_BUDGET = 96 * 1024 * 1024
_VMEM_TRAIN_BUDGET = 48 * 1024 * 1024


def _leaf_bytes(tree) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        size = getattr(leaf, "size", 1)
        itemsize = jnp.dtype(getattr(leaf, "dtype", jnp.float32)).itemsize
        total += int(size) * itemsize
    return total


def _packed_sn_bytes(setup: bounds.CMCDSetup, bf16: bool = False) -> int:
    """Exact bytes of the arch's packed kernel weights, computed via
    jax.eval_shape of the same init + pack functions the fused paths use
    (no arrays are materialized). Replaces the round-2 geffner-only formula
    that mis-sized PIS ("dds"/"dds_grad") configurations.

    bf16=True sizes the bf16-STORAGE variant with the SAME per-tensor cast
    predicate the split sweep applies (kernel_common.bf16_storage_leaf):
    only qualifying matrices halve; sub-threshold tensors keep full bytes.
    """
    if setup.mode in _SN_FREE_MODES:
        return 0
    from cmcd_tpu import integrators
    from cmcd_tpu.networks import build_score_network

    dim_pad = _dim_pad(setup.dim)
    rho_dim = integrators.mode_sn_rho_dim(setup.mode, setup.dim)

    def sized(rho):
        init_sn, _ = build_score_network(
            setup.dim,
            setup.emb_dim,
            setup.nbridges,
            rho_dim=rho,
            nlayers=setup.nlayers,
            arch=setup.nn_arch,
            fully_connected_units=list(setup.fully_connected_units),
            # The packers never trace the score feature; a zero stand-in
            # keeps eval_shape target-free.
            target_log_prob=lambda z: jnp.zeros(z.shape[0]),
        )
        params = jax.eval_shape(init_sn, jax.random.PRNGKey(0))
        # pack_geffner_ud_t differs from pack_geffner_t only in meta, not
        # array sizes, so the overdamped packer sizes both correctly.
        weights = jax.eval_shape(
            lambda p: _pack_net(setup.nn_arch)(p, setup.dim, dim_pad)[0],
            params,
        )
        if not bf16:
            return _leaf_bytes(weights)
        from cmcd_tpu.ops.kernel_common import bf16_storage_leaf

        total = 0
        for leaf in jax.tree_util.tree_leaves(weights):
            itemsize = 2 if bf16_storage_leaf(leaf) else (
                jnp.dtype(leaf.dtype).itemsize
            )
            total += int(leaf.size) * itemsize
        return total

    total = sized(rho_dim)
    if setup.mode == "MCD_DNF":  # second backward net (rho-free)
        total += sized(0)
    return total


def _vmem_estimate(setup: bounds.CMCDSetup, target, block: int) -> int:
    """Rough bytes the kernel must keep on-core: chain-state temporaries,
    score-net weights (exact packed sizes), and target-score constants."""
    dim_pad = _dim_pad(setup.dim)
    state = 8 * dim_pad * block * 4  # z/fk/bk/noise/... temporaries
    sn_bytes = _packed_sn_bytes(setup)
    grad_t = grad_t_for_target(target, dim_pad)
    const_bytes = 0
    if grad_t is not None:
        import jax as _jax
        import jax.numpy as _jnp

        ex = _jax.ShapeDtypeStruct((dim_pad, block), _jnp.float32)
        const_bytes = sum(
            int(c.size) * 4 for c in _jax.make_jaxpr(grad_t)(ex).consts
        )
    return state + sn_bytes + const_bytes


def _arch_supported(setup: bounds.CMCDSetup) -> bool:
    """Which (mode, nn_arch) pairs the kernels implement: geffner
    everywhere a net is used; PISNet ("dds") for the overdamped single-net
    modes (ops/pallas_nets.py)."""
    if setup.mode in _SN_FREE_MODES:
        return True
    if setup.nn_arch == "geffner":
        return True
    return (
        setup.nn_arch in ("dds", "dds_grad")
        and setup.mode in _PALLAS_SPECS
        and not _PALLAS_SPECS[setup.mode].use_sn2_bwd
    )


def supports_fused(setup: bounds.CMCDSetup, target) -> bool:
    """True if (mode, target, net arch) can run on a fused kernel."""
    if (
        setup.mode not in _PALLAS_SPECS
        and setup.mode not in _PALLAS_UD_SPECS
        and setup.mode != "UHA"
    ):
        return False
    if not _arch_supported(setup):
        return False
    # DNF has zero annealed drift — the target score never enters the
    # kernel, so no transposed gradient is needed.
    if (
        setup.mode != "MCD_DNF"
        and grad_t_for_target(target, _dim_pad(setup.dim)) is None
    ):
        return False
    # Everything (weights, target constants, state) must fit physical VMEM;
    # configs past the budget fall back to the XLA scan path.
    return _vmem_estimate(setup, target, default_block(setup.dim)) < _VMEM_BUDGET


def default_block(dim: int) -> int:
    """Chain-block width by dimension: keep the (dim_pad, block) state and
    its handful of step temporaries within a few MB of VMEM. Measured on
    v5e: small-dim kernels are MXU-column-bound, so wider blocks amortize
    the per-step fixed work (1024 beats 512 by ~1.2x at dim 2)."""
    dim_pad = _dim_pad(dim)
    if dim_pad <= 64:
        return 1024
    if dim_pad <= 256:
        return 256
    return 128


def choose_block(dim: int, n_chains: int, *, traj_arrays: int = 0,
                 nbridges: int = 0) -> int:
    """Chain-block width for a concrete call.

    Caps default_block by the actual chain count (N=300 on a 1024 block
    wastes 3.4x the columns) and, for training paths that store
    per-step residuals (traj_arrays = stored (K+1, dim_pad, n_pad) arrays:
    1 for the VarGrad replay, 2 for overdamped KL, 3 for underdamped/UHA),
    shrinks the block until one block's residual slice fits a ~48 MB VMEM
    share. The SINGLE-WINDOW KL reverse sweep (time_block=None, the
    measured-fastest configuration when windows fit) reads whole
    (K+1)-step windows per program and the Mosaic pipeline DOUBLE-BUFFERS
    them, so the physical cost is 2x the slice (measured on v5e: sonar
    K=256 dim_pad 64 at block 1024: 2 x 67 MB residuals -> 131.6 MB >
    128 MB; nice K=256 dim_pad 200 at block 128: 2 x 50.2 MB windows +
    17.2 MB spills -> over by 1.75 MB). Time-chunked sweeps
    (choose_time_block) bound their windows independently of this cap —
    for them this rule is conservative, keeping whole-trajectory
    residuals small enough to stay on-chip between kernels at small K."""
    lane = 128
    block = default_block(dim)
    block = min(block, -(-n_chains // lane) * lane)
    if traj_arrays:
        per_col = traj_arrays * (nbridges + 1) * _dim_pad(dim) * 4
        if 2 * per_col * lane <= 40 * 1024 * 1024:
            # A single-window sweep (double-buffered whole-trajectory
            # windows within choose_time_block's 40 MB share) is achievable
            # at SOME width: shrink toward it — whole-trajectory residuals
            # stay on-chip, the measured-fastest configuration when it
            # fits.
            while block > lane and per_col * block > 48 * 1024 * 1024:
                block -= lane
        # else: even a lane-wide block cannot fit whole windows — the
        # sweep will time-chunk regardless, windows are bounded by
        # choose_time_block, and narrowing the block only multiplies
        # program count. Measured on v5e (196-D nice, N=300,
        # MCD_U_a-lp-sn / UHA): the capped block=128 chunked sweep LOSES
        # to the XLA scan at K=128/256 (0.84-0.94x) while the default
        # block=256 chunked sweep WINS (1.21x at K=256, tb=8). 1600-D
        # LGCP is unaffected (default_block is already 128 there).
    return block


def choose_time_block(nbridges: int, dim: int, block: int,
                      n_arrays: int = 2, est_bytes: int = 0) -> int | None:
    """Reverse-sweep time-chunk length (pallas_kl time_block).

    Largest divisor of nbridges whose per-program trajectory-window
    footprint — n_arrays stored (t_block, dim_pad, block) stacks (traj +
    noise, or traj + the split gsn output), each DOUBLE-BUFFERED by the
    Mosaic pipeline — fits the windows' VMEM share. None = the whole-
    trajectory window already fits (single-window sweep, the
    measured-fastest configuration).

    est_bytes: the kernel's resident set (weights + target consts + state,
    ops/fused._vmem_estimate, with bf16 storage already discounted). It
    shrinks the CHUNKED share only — the chunked sweep carries extra
    cross-chunk cotangent scratch whose spill slots scale with the
    resident set AND with the whole-trajectory stacks the chunked kernels
    stream (the //16 calibration below). Hardware points (v5e, 1600-D
    LGCP split sweep, resident ~31 MB, block 128): the SINGLE-window K=8
    sweep (28 MB of windows) fits and is the fastest configuration;
    chunked K=64 t_block=8 (26 MB of windows) hit 132 MB of the 128 MB
    physical VMEM while t_block=4 fits and runs; K=256 t_block=4 was
    2.2 MB over the 120 MB scoped cap while t_block=2 fits and runs. The
    196-D nice K=256 in-kernel sweep keeps its validated t_block=64."""
    per_step = 2 * n_arrays * _dim_pad(dim) * block * 4
    if per_step * (nbridges + 1) <= 40 * 1024 * 1024:
        return None
    stacks = n_arrays * nbridges * _dim_pad(dim) * block * 4
    est_eff = est_bytes + stacks // 16
    share = max(
        8 * 1024 * 1024,
        40 * 1024 * 1024 - max(0, est_eff - 12 * 1024 * 1024),
    )
    best = 1
    for d in range(2, nbridges):
        if nbridges % d == 0 and per_step * d <= share:
            best = d
    return best


def supports_fused_train(setup: bounds.CMCDSetup, target,
                         bf16_net: bool = False,
                         n_chains: int | None = None) -> bool:
    """True if a fully-fused Pallas training loss can run: the VarGrad mode
    (ops/fused_train.var_bound_pallas, batched-replay backward) or a KL mode
    (ops/fused_train.kl_bound_pallas, reverse-sweep BPTT backward), with a
    kernelized net where the mode uses one (geffner everywhere; PIS
    "dds"/"dds_grad" for the overdamped modes), a registered transposed
    target score, and VMEM headroom. n_chains (when known) additionally
    gates the large-net split sweep, whose inter-kernel trajectory stacks
    scale with the batch."""
    from cmcd_tpu.ops.fused_train import KL_FUSED_MODES

    if setup.mode != "MCD_CAIS_var_sn" and setup.mode not in KL_FUSED_MODES:
        return False
    if setup.mode not in _SN_FREE_MODES:
        # Net-free modes (UHA, MCD_U_a-lp, MCD_U_e-lp, MCD_ULA) never apply
        # a score net, so nn_arch is irrelevant to them. Where a net IS
        # used, PIS ("dds"/"dds_grad") kernelization exists for the
        # overdamped single-net modes only (ops/pallas_nets.py); the
        # underdamped backward kernels are geffner-specific.
        if not _arch_supported(setup) or (
            setup.nn_arch != "geffner" and setup.mode not in _PALLAS_SPECS
        ):
            return False
    if (
        setup.mode != "MCD_DNF"  # zero drift: no target score in the kernel
        and grad_t_for_target(target, _dim_pad(setup.dim)) is None
    ):
        return False
    est = _vmem_estimate(setup, target, default_block(setup.dim))
    sn_b = _packed_sn_bytes(setup)
    from cmcd_tpu.ops.fused_train import _NET_GRADS_OUTSIDE_BYTES, KL_FUSED_MODES

    if sn_b <= _NET_GRADS_OUTSIDE_BYTES:
        # Ordinary in-kernel weight-grad backward. EVERY KL reverse sweep
        # (overdamped, underdamped family, UHA) time-chunks its trajectory
        # windows (pallas_kl time_block via choose_time_block), so the
        # VMEM window footprint is bounded for any nbridges; gate on the
        # effective chunked window against the physical ceiling
        # (hardware calibration, v5e: nice K=256 dim_pad 200, block 128:
        # 100.4 MiB whole windows + 17.2 MiB spills + misc exceeded
        # 128 MiB by 1.75 MiB before the sweeps were chunked).
        # Overdamped stores (traj, noise) = 2 stacks; underdamped/UHA add
        # momentum = 3. Hardware check (overdamped nice K=256, t_block=64,
        # 26 MB of windows): no VMEM overflow, 40.2 ms/step vs 57.7 ms
        # scan over the full 60k-iteration recipe, identical final
        # ELBO/lnZ — this 196-D flow target is matmul-dominated either
        # way, so the fused win there is 1.4x, not the small-dim kernels'
        # 8-10x.
        if setup.mode in KL_FUSED_MODES:
            n_arrays = 2 if setup.mode in _PALLAS_SPECS else 3
            blk = choose_block(
                setup.dim,
                n_chains if n_chains is not None else 1 << 30,
                traj_arrays=n_arrays,
                nbridges=setup.nbridges,
            )
            tb = choose_time_block(
                setup.nbridges, setup.dim, blk, n_arrays, est
            )
            rows_eff = (setup.nbridges + 1) if tb is None else tb
            win = 2 * n_arrays * rows_eff * _dim_pad(setup.dim) * blk * 4
            if win + est + 24 * 1024 * 1024 >= 128 * 1024 * 1024:
                return False
        return est < _VMEM_TRAIN_BUDGET
    if setup.mode == "MCD_CAIS_sn":
        # Large net -> split sweep (pallas_kl net_grads_outside). Hardware-
        # calibrated VMEM model (1600-D LGCP measurements): weight windows
        # plus their on-core copies and VJP spill scale ~3.2x the stored
        # weight bytes, on top of state/consts and ~30 MB fixed; keep ~8 MB
        # headroom under the 128 MB physical ceiling. f32 LGCP (31.4 MB
        # packed) measured at 133.6 MB -> rejected; bf16 storage halves the
        # weight term and fits.
        sn_eff = (
            _packed_sn_bytes(setup, bf16=True)
            if (bf16_net and setup.nn_arch == "geffner")
            else sn_b
        )
        block = choose_block(
            setup.dim, 128, traj_arrays=2, nbridges=setup.nbridges
        )
        # Trajectory + cotangent-stack windows: whole (K+1) stacks per
        # program on the single-window sweep (the K=8 hardware calibration
        # below), bounded by the time-chunked sweep for larger nbridges
        # (choose_time_block — same est-aware auto rule _make_evolve_kl
        # applies; hardware: 1600-D K=64 bf16 picks t_block=4 and runs,
        # t_block=8 hit 132 MB of the 128 MB physical VMEM).
        tb = choose_time_block(
            setup.nbridges, setup.dim, block, 2, est - sn_b + sn_eff
        )
        rows_eff = (setup.nbridges + 1) if tb is None else tb
        traj_windows = 2 * rows_eff * _dim_pad(setup.dim) * block * 4
        need = (
            (16 * sn_eff) // 5
            + (est - sn_b)
            + traj_windows
            + 16 * 1024 * 1024
        )
        if need >= 120 * 1024 * 1024:
            return False
        # The split sweep's trajectory/noise stacks live on-chip BETWEEN
        # the forward and sweep kernels, so they scale with the full batch,
        # not the block. Measured on v5e (1600-D LGCP K=8): N=128 compiles
        # and runs; N=256 trips the scoped-VMEM ceiling. Without n_chains
        # the gate stays optimistic (callers that size their own batches,
        # e.g. tests, pass small N).
        if n_chains is not None and n_chains > 128:
            return False
        return True
    # Other modes keep weight grads in-kernel; at this size they spill.
    return False


def fused_train_recommended(setup: bounds.CMCDSetup, target, n_chains: int,
                            bf16_net: bool = False) -> bool:
    """supports_fused_train AND the fused path is expected to WIN at this
    batch size. One measured exception (v5e, 1600-D LGCP K=8): large-net
    split-sweep targets are matmul-dominated, so the XLA scan beats the
    fused kernel's flat ~2 ms per-step floor at small batches — scan
    1.31 ms vs fused 2.05 ms at N=20, crossover N~100, fused 1.15x at
    N=128. Small-dim targets (in-kernel weight grads) win at every
    measured batch size and are always recommended when supported."""
    if not supports_fused_train(setup, target, bf16_net=bf16_net,
                                n_chains=n_chains):
        return False
    from cmcd_tpu.ops.fused_train import _NET_GRADS_OUTSIDE_BYTES

    sn_b = _packed_sn_bytes(setup)
    if sn_b > _NET_GRADS_OUTSIDE_BYTES:
        if n_chains < 96:
            return False
        # Time-chunked split sweeps (big K on a large net): measured on
        # v5e (1600-D LGCP, N=128, bf16, probe methodology incl. ~30 ms
        # dispatch bias on both sides) the fused/scan crossover is at
        # K~128 — K=64 scan 126 ms vs fused 144, K=256 scan 171 vs fused
        # 137 (both paths are largely fixed-cost-dominated at this batch,
        # so the fused win grows with K). The single-window K=8 sweep
        # stays recommended (fused 1.15x at N=128).
        blk = choose_block(
            setup.dim, n_chains, traj_arrays=2, nbridges=setup.nbridges
        )
        est = _vmem_estimate(setup, target, blk)
        sn_eff = (
            _packed_sn_bytes(setup, bf16=True)
            if (bf16_net and setup.nn_arch == "geffner")
            else sn_b
        )
        if choose_time_block(
            setup.nbridges, setup.dim, blk, 2, est - sn_b + sn_eff
        ) is not None and setup.nbridges < 128:
            return False
    return True


def compute_elbos_fused(
    params,
    key,
    n_chains: int,
    setup: bounds.CMCDSetup,
    target,
    *,
    block: int | None = None,
    noise=None,
    interpret: bool = False,
):
    """Per-chain negative ELBOs via the fused kernel.

    Same contract as bounds.compute_elbos (returns (neg_elbos, z)) but takes
    the Target (the kernel needs its transposed gradient) instead of ctx.
    """
    p = bounds.merged_params(params)
    dim = setup.dim
    dim_pad = _dim_pad(dim)
    if block is None:
        block = choose_block(dim, n_chains)

    z_key, evolve_key = jax.random.split(key)
    z0 = diag_gaussian_sample(z_key, p["vd"], n_chains)
    w0 = -diag_gaussian_log_prob(p["vd"], z0)

    betas = betas_from_grid(p["mgridref_y"], p["gridref_x"], p["target_x"])
    grad_t = grad_t_for_target(target, dim_pad)

    # Derive a 32-bit kernel seed from the JAX key.
    seed = jax.random.randint(evolve_key, (), 0, jnp.iinfo(jnp.int32).max)

    if setup.mode in _PALLAS_SPECS:
        spec = _PALLAS_SPECS[setup.mode]
        use_sn = spec.fwd_sn or spec.bwd_sn
        if use_sn:
            sn_weights, sn_meta = _pack_net(setup.nn_arch)(
                p["sn"], dim, dim_pad
            )
        else:
            sn_weights = sn_meta = None
        sn2_weights = None
        if spec.use_sn2_bwd:
            sn2_weights, _ = pack_geffner_t(p["sn2"], dim, dim_pad)
        z, w = evolve_overdamped_pallas(
            z0,
            w0,
            betas,
            p["eps"],
            p["vd"]["mean"],
            p["vd"]["logdiag"],
            grad_t,
            spec,
            dim=dim,
            nbridges=setup.nbridges,
            sn_weights=sn_weights,
            sn_meta=sn_meta,
            sn2_weights=sn2_weights,
            eps_schedule=setup.eps_schedule,
            grad_clipping=setup.grad_clipping,
            seed=seed,
            block=block,
            noise=noise,
            interpret=interpret,
        )
    elif setup.mode == "UHA":
        from cmcd_tpu.ops.pallas_uha import evolve_uha_pallas

        z, w_delta = evolve_uha_pallas(
            z0,
            betas,
            p["eps"],
            p["eta"],
            p["md"],
            p["vd"]["mean"],
            p["vd"]["logdiag"],
            grad_t,
            dim=dim,
            nbridges=setup.nbridges,
            lfsteps=setup.lfsteps,
            seed=seed,
            block=block,
            noise=noise,
            interpret=interpret,
        )
        w = w0 + w_delta
    else:
        from cmcd_tpu.ops.pallas_underdamped import (
            evolve_underdamped_pallas,
            pack_geffner_ud_t,
        )

        spec, full_sn = _PALLAS_UD_SPECS[setup.mode]
        use_sn = spec.fwd_sn or spec.bwd_sn != "none"
        if use_sn:
            sn_weights, sn_meta = pack_geffner_ud_t(p["sn"], dim, dim_pad, full_sn)
        else:
            sn_weights = sn_meta = None
        z, w_delta = evolve_underdamped_pallas(
            z0,
            betas,
            p["eps"],
            p["gamma"],
            p["eta"],
            p["vd"]["mean"],
            p["vd"]["logdiag"],
            grad_t,
            spec,
            dim=dim,
            nbridges=setup.nbridges,
            sn_weights=sn_weights,
            sn_meta=sn_meta,
            seed=seed,
            block=block,
            noise=noise,
            interpret=interpret,
        )
        w = w0 + w_delta
    w = w + target.log_prob(z)
    return -w, z
