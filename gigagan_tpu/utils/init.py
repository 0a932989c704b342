"""Weight initializers matching the reference's torch init distributions.

The reference applies `nn.init.kaiming_normal_(w, a=0, mode='fan_in',
nonlinearity='leaky_relu')` to every Conv2d/Linear
(reference: gigagan_pytorch/gigagan_pytorch.py:1127-1129,1679-1681) and to the
adaptive-conv kernel banks (:342).  Flax stores conv kernels as HWIO and
linear kernels as (in, out), so fan computation must account for that layout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in_out(shape, layout: str):
    if layout == "linear":  # (in, out)
        fan_in, fan_out = shape[0], shape[1]
    elif layout == "conv":  # (*spatial, in, out)
        receptive = math.prod(shape[:-2])
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
    elif layout == "bank":  # (n, *spatial, in, out) — adaptive kernel banks
        receptive = math.prod(shape[1:-2])
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
    else:
        raise ValueError(layout)
    return fan_in, fan_out


def kaiming_normal_leaky(layout: str = "conv"):
    """kaiming normal, fan_in, nonlinearity='leaky_relu' with torch's default
    a=0 → gain sqrt(2)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fan_in_out(shape, layout)
        std = math.sqrt(2.0) / math.sqrt(max(fan_in, 1))
        return std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_normal_linear_fan_out(layout: str = "linear"):
    """kaiming normal, fan_out, nonlinearity='linear' (gain 1) — used by
    RandomFixedProjection (reference: gigagan_pytorch.py:1327-1328)."""

    def init(key, shape, dtype=jnp.float32):
        _, fan_out = _fan_in_out(shape, layout)
        std = 1.0 / math.sqrt(max(fan_out, 1))
        return std * jax.random.normal(key, shape, dtype)

    return init


def pixel_shuffle_icnr_init(upsample_factor: int = 4):
    """ICNR-style init for pixel-shuffle convs: draw a kernel for out//r
    channels with kaiming-uniform and tile it r times so the shuffle starts as
    a nearest-neighbour upsample (reference: gigagan_pytorch.py:277-284).

    Flax layout (*spatial, in, out): tiling happens on the last axis.
    """

    def init(key, shape, dtype=jnp.float32):
        *spatial, fan_in_c, out = shape
        assert out % upsample_factor == 0
        base_shape = (*spatial, fan_in_c, out // upsample_factor)
        fan_in = fan_in_c * math.prod(spatial)
        # torch kaiming_uniform_ default: a=sqrt(5) → gain sqrt(2/(1+5)) = 1/sqrt(3)
        gain = math.sqrt(2.0 / 6.0)
        bound = gain * math.sqrt(3.0) / math.sqrt(max(fan_in, 1))
        base = jax.random.uniform(
            key, base_shape, dtype, minval=-bound, maxval=bound
        )
        return jnp.repeat(base, upsample_factor, axis=-1)

    return init
