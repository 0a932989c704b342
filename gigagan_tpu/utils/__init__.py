from gigagan_tpu.utils.helpers import (
    exists,
    default,
    cast_tuple,
    divisible_by,
    is_power_of_two,
    is_unique,
    num_to_groups,
    cycle,
    ModTable,
)
from gigagan_tpu.utils.profiling import enable_compile_cache  # noqa: F401
from gigagan_tpu.utils.init import (
    kaiming_normal_leaky,
    kaiming_normal_linear_fan_out,
    pixel_shuffle_icnr_init,
)

__all__ = [
    "exists",
    "default",
    "cast_tuple",
    "divisible_by",
    "is_power_of_two",
    "is_unique",
    "num_to_groups",
    "cycle",
    "ModTable",
    "kaiming_normal_leaky",
    "kaiming_normal_linear_fan_out",
    "pixel_shuffle_icnr_init",
]
