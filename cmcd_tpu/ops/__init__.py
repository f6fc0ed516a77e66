from cmcd_tpu.ops.fused import compute_elbos_fused, supports_fused, supports_fused_train
from cmcd_tpu.ops.target_grads import grad_t_for_target

__all__ = [
    "compute_elbos_fused",
    "grad_t_for_target",
    "supports_fused",
    "supports_fused_train",
]
