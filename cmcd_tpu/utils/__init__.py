from cmcd_tpu.utils.jit import const_hoisted_jit
from cmcd_tpu.utils.logging import MetricLogger, ThroughputMeter
from cmcd_tpu.utils.sinkhorn import calculate_w2_distances, sinkhorn_w2

__all__ = [
    "MetricLogger",
    "ThroughputMeter",
    "calculate_w2_distances",
    "const_hoisted_jit",
    "sinkhorn_w2",
]
