from gigagan_tpu.ops.pallas.adaptive_conv import (
    fused_adaptive_conv2d,
    pallas_supported,
)

__all__ = ["fused_adaptive_conv2d", "pallas_supported"]
