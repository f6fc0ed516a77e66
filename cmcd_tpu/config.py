"""Config system: ConfigDict-compatible flag surface.

Reference: src/configs/base.py. Same field names and defaults so reference
recipes port verbatim (`--config.model X --config.boundmode Y ...`), same
LR/eps hyperparameter lookup tables applied the same way
(src/utils.py:181-204).
"""

from __future__ import annotations

import ml_collections

# Per-model / per-boundmode learning rates (reference src/configs/base.py:5-63).
LR_DICT = {
    "log_sonar": {
        "MCD_CAIS_UHA_sn": 1e-3,
        "MCD_CAIS_sn": 1e-3,
        "MCD_CAIS_var_sn": 1e-3,
        "MCD_U_a-lp-sn": 1e-3,
        "UHA": 1e-4,
        "MCD_ULA_sn": 1e-3,
        "MCD_ULA": 1e-4,
    },
    "log_ionosphere": {
        "MCD_CAIS_UHA_sn": 1e-3,
        "MCD_CAIS_sn": 1e-4,
        "MCD_U_a-lp-sn": 1e-3,
        "UHA": 1e-4,
        "MCD_ULA_sn": 1e-3,
        "MCD_ULA": 1e-4,
    },
    "lorenz": {
        "MCD_CAIS_UHA_sn": 1e-3,
        "MCD_CAIS_sn": 1e-5,
        "MCD_U_a-lp-sn": 1e-3,
        "UHA": 1e-3,
        "MCD_ULA_sn": 1e-5,
        "MCD_ULA": 1e-5,
    },
    "brownian": {
        "MCD_CAIS_UHA_sn": 1e-3,
        "MCD_CAIS_sn": 1e-3,
        "MCD_U_a-lp-sn": 1e-3,
        "UHA": 1e-4,
        "MCD_ULA_sn": 1e-4,
        "MCD_ULA": 1e-5,
    },
    "seeds": {
        "MCD_CAIS_UHA_sn": 1e-3,
        "MCD_CAIS_sn": 1e-3,
        "MCD_U_a-lp-sn": 1e-3,
        "UHA": 1e-3,
        "MCD_ULA_sn": 1e-3,
        "MCD_ULA": 1e-4,
    },
    "banana": {
        "MCD_CAIS_UHA_sn": 1e-3,
        "MCD_CAIS_sn": 1e-3,
        "MCD_U_a-lp-sn": 1e-3,
        "UHA": 1e-3,
        "MCD_ULA_sn": 1e-3,
        "MCD_ULA": 1e-4,
    },
    "lgcp": {
        "MCD_CAIS_UHA_sn": 1e-3,
        "MCD_CAIS_sn": 1e-4,
        "MCD_U_a-lp-sn": 1e-3,
        "UHA": 1e-4,
        "MCD_ULA_sn": 1e-4,
        "MCD_ULA": 1e-4,
    },
}

# Funnel eps/LR by nbridges (reference src/configs/base.py:65-72).
FUNNEL_EPS_DICT = {
    8: {"init_eps": 0.1, "lr": 0.01},
    16: {"init_eps": 0.1, "lr": 0.01},
    32: {"init_eps": 0.1, "lr": 0.005},
    64: {"init_eps": 0.1, "lr": 0.001},
    128: {"init_eps": 0.01, "lr": 0.01},
    256: {"init_eps": 0.01, "lr": 0.005},
}

TRACTABLE_DISTS = ["nice", "funnel", "gmm", "many_gmm", "banana"]


def get_config() -> ml_collections.ConfigDict:
    """Defaults matching reference src/configs/base.py:77-157."""
    config = ml_collections.ConfigDict()
    config.boundmode = "UHA"
    config.model = "lorenz"
    config.N = 5
    config.nbridges = 8
    config.lfsteps = 1

    config.emb_dim = 20
    # The reference's "geffner" arch hardcodes 2 residual blocks regardless
    # of nlayers (src/nn.py:45-53); same here via networks/geffner.py.
    config.nlayers = 2

    config.init_eta = 0.0
    config.init_eps = 1e-5
    config.init_sigma = 1.0
    config.init_gamma = 10.0
    config.pretrain_mfvi = True

    config.train_vi = True
    config.train_eps = True
    config.train_betas = True

    config.nn_arch = "geffner"  # "dds", "dds_grad"
    config.fully_connected_units = [64, 64]

    config.eps_schedule = ""
    config.grad_clipping = False
    # Per-step remat for KL/BPTT training at large nbridges (new capability).
    config.remat_steps = False

    config.mfvi_iters = 150000
    config.mfvi_lr = 0.01
    config.iters = 150000
    config.lr = 0.0001
    config.seed = 1
    config.n_samples = 500
    config.n_sinkhorn = 300
    config.n_input_dist_seeds = 30

    config.use_ema = False

    # New (not in reference): fused Pallas eval path + checkpointing.
    config.use_pallas_eval = True
    # Fully-fused VarGrad training (Pallas forward + backward kernels);
    # applies to MCD_CAIS_var_sn on targets with a registered kernel score.
    config.use_pallas_train = True
    # Reduced-precision (bf16) net storage/compute in the fused kernels
    # (weights bf16, accumulation f32) — the idiomatic TPU number format,
    # and what lets the 1600-D LGCP train fused (gradient within ~1e-2
    # relative of f32; see ops/pallas_kl.py net_compute_dtype). Default True
    # since round 4's full-recipe quality gate passed on hardware (flagship
    # 40k-iter ln Z -0.038±0.144 bf16 vs -0.016±0.149 f32, both inside the
    # 0.1-nat band; RESULTS.md "defaults" section) — this makes the
    # framework's out-of-the-box training configuration the same one
    # bench.py headlines. Set False to opt into the f32 gradient-exactness
    # contract (fused grads bit-match jax.grad of the scan loss; the grad
    # tests exercise that path explicitly).
    config.bf16_fused_net = True
    # bf16 residual stacks (trajectory/noise/gsn) in the split fused-KL
    # backward (the 1600-D LGCP path) — halves the reverse sweep's stack
    # streaming. Off by default pending the quality gate; see
    # ops/fused_train._make_evolve_kl bf16_residuals.
    config.bf16_residuals = False
    config.checkpoint_dir = ""
    config.checkpoint_every = 0  # 0 = disabled
    # Optimizer steps fused into one jitted dispatch (0 = auto, up to 100;
    # amortizes per-dispatch host overhead — see train/trainer.py).
    config.steps_per_call = 0
    config.resume = False
    # Training-time sample plots + W2 (reference plots every 1% of iters,
    # src/opt.py:109-120); "" disables. Plots land as plot_dir/samples_N.png.
    config.plot_dir = ""
    # jax.profiler trace of a few training steps; "" disables.
    config.profile_dir = ""

    # NICE config
    config.im_size = 14
    config.alpha = 0.05
    config.n_bits = 3
    config.hidden_dim = 1000
    config.nice_checkpoint = ""

    # Funnel configs
    config.funnel_d = 10
    config.funnel_sig = 3
    config.funnel_clipy = 11

    # LGCP configs
    config.use_whitened = False
    config.file_path = ""  # default: bundled pines.csv

    # Many GMM configs
    config.gmm_easy_mode = False
    if config.gmm_easy_mode:
        config.n_mixes = 4
        config.loc_scaling = 10
    else:
        config.n_mixes = 40
        config.loc_scaling = 40

    # Logging
    config.log = ml_collections.ConfigDict()
    config.log.every = 0  # 0 = auto (0.1% of iters)
    config.log.jsonl = ""  # path for JSONL metrics; "" = stdout summary only

    return config


def apply_lookup_tables(config) -> dict:
    """LR/eps overrides (reference src/utils.py:181-204): funnel uses
    FUNNEL_EPS_DICT, gmm/many_gmm/nice bypass, others use LR_DICT."""
    try:
        if config.model == "nice":
            return {}
        if config.model == "funnel":
            values = FUNNEL_EPS_DICT[config.nbridges]
            return {"init_eps": values["init_eps"], "lr": values["lr"]}
        if config.model in ("many_gmm", "gmm", "banana"):
            return {}
        return {"lr": LR_DICT[config.model][config.boundmode]}
    except KeyError:
        print(
            "LR not found for model %s and boundmode %s"
            % (config.model, config.boundmode)
        )
        return {}
