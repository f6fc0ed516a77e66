"""Target registry: name -> Target (reference src/model_handler.py:30-43).

Same name-prefix dispatch as the reference's load_model. All targets return
batched log-densities (N, dim) -> (N,).
"""

from __future__ import annotations

from cmcd_tpu.targets.base import Target


def load_target(name: str, config=None) -> Target:
    """Load a target density by name.

    config: optional object with the same attribute names as the reference
    ConfigDict (funnel_d, n_mixes, use_whitened, ...). Defaults match the
    reference defaults (src/configs/base.py:77-157).
    """
    cfg = config

    def get(attr, default):
        return getattr(cfg, attr, default) if cfg is not None else default

    if name in ("lorenz", "brownian", "banana"):
        from cmcd_tpu.targets import gym

        return {
            "lorenz": gym.make_lorenz,
            "brownian": gym.make_brownian,
            "banana": gym.make_banana,
        }[name]()
    if "nice" in name:
        from cmcd_tpu.targets.nice import make_nice

        return make_nice(
            im_size=get("im_size", 14),
            hidden_dim=get("hidden_dim", 1000),
            checkpoint_path=get("nice_checkpoint", None),
        )
    if "funnel" in name:
        from cmcd_tpu.targets.funnel import make_funnel

        return make_funnel(
            d=get("funnel_d", 10),
            sig=get("funnel_sig", 3.0),
            clip_y=get("funnel_clipy", 11.0),
        )
    if "lgcp" in name:
        from cmcd_tpu.targets.lgcp import make_lgcp

        return make_lgcp(
            use_whitened=get("use_whitened", False),
            file_path=get("file_path", None) or None,  # "" -> bundled pines.csv
        )
    if "many_gmm" in name:
        from cmcd_tpu.targets.gmm import make_many_gmm

        return make_many_gmm(
            n_mixes=get("n_mixes", 40), loc_scaling=get("loc_scaling", 40.0)
        )
    if "gmm" in name:
        from cmcd_tpu.targets.gmm import make_gmm

        return make_gmm()
    if name in ("log_sonar", "log_ionosphere", "log_australian", "log_a1a", "log_madelon"):
        from cmcd_tpu.targets.logreg import make_logreg

        return make_logreg(name[len("log_"):])
    if name == "seeds":
        from cmcd_tpu.targets.seeds import make_seeds

        return make_seeds()
    raise ValueError(f"Unknown target: {name}")


__all__ = ["Target", "load_target"]
