from gigagan_tpu.ops.adaptive_conv import (
    adaptive_conv,
    adaptive_conv_reference,
    kernel_gram,
)
from gigagan_tpu.ops import s2d
from gigagan_tpu.ops.attention import (
    attend,
    attend_fused,
    linear_attend,
    linear_attend_fused,
)
from gigagan_tpu.ops.resample import (
    blur_2d,
    blur_3d,
    upsample_2x,
    space_to_depth,
    downsample_hf_shuttle,
    pixel_shuffle,
    resize_image_to,
)

__all__ = [
    "adaptive_conv",
    "adaptive_conv_reference",
    "kernel_gram",
    "attend",
    "attend_fused",
    "linear_attend",
    "linear_attend_fused",
    "blur_2d",
    "blur_3d",
    "upsample_2x",
    "space_to_depth",
    "downsample_hf_shuttle",
    "pixel_shuffle",
    "resize_image_to",
]
