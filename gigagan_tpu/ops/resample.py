"""Blur / resample primitives, channels-last.

Parity targets:
- binomial blur [1,2,1]⊗[1,2,1], reflect-padded, normalized — the reference
  uses kornia.filters.filter2d/filter3d (reference:
  gigagan_pytorch/gigagan_pytorch.py:246-255, unet_upsampler.py:138-150)
- bilinear 2x upsample (align_corners=False) + blur (reference: :257-261)
- space-to-depth + 1x1 conv downsample (reference: :289-293) — the conv
  itself lives in the layer module; here only the rearrange
- pixel shuffle (reference: :263-287)
- the VideoGigaGAN "HF shuttle" downsample: conv → blur → maxpool, returning
  the high-frequency residual (reference: unet_upsampler.py:107-160)

These are all depthwise/elementwise — XLA fuses them; blur lowers to a
depthwise conv which the TPU executes on the VPU without touching the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from einops import rearrange

_BINOMIAL = jnp.array([1.0, 2.0, 1.0])


def _depthwise_conv(x, kernel_2d_or_3d):
    """x: (b, *spatial, c); kernel: (*spatial_k) applied per channel,
    reflect padding (kornia filter2d default border_type='reflect')."""
    rank = kernel_2d_or_3d.ndim
    c = x.shape[-1]
    pads = [(k // 2, k // 2) for k in kernel_2d_or_3d.shape]
    x = jnp.pad(
        x,
        [(0, 0)] + pads + [(0, 0)],
        mode="reflect",
    )
    kern = kernel_2d_or_3d[..., None, None]  # (*k, 1, 1)
    kern = jnp.tile(kern, (1,) * rank + (1, c)).astype(x.dtype)
    if rank == 2:
        dn = ("NHWC", "HWIO", "NHWC")
    elif rank == 3:
        dn = ("NDHWC", "DHWIO", "NDHWC")
    else:
        raise ValueError(rank)
    return lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1,) * rank,
        padding="VALID",
        dimension_numbers=dn,
        feature_group_count=c,
        preferred_element_type=x.dtype,
    )


def blur_2d(x):
    """Normalized binomial blur on (b, h, w, c)."""
    f = _BINOMIAL[:, None] * _BINOMIAL[None, :]
    f = f / f.sum()
    return _depthwise_conv(x, f)


def blur_3d(x):
    """Normalized separable binomial blur on (b, t, h, w, c)."""
    f = (
        _BINOMIAL[:, None, None]
        * _BINOMIAL[None, :, None]
        * _BINOMIAL[None, None, :]
    )
    f = f / f.sum()
    return _depthwise_conv(x, f)


def blur_temporal(x):
    """VideoGigaGAN temporal blur: [1,2,1] along time, box over a 3x3 spatial
    window (reference: unet_upsampler.py:162-170 builds exactly this 3d
    kernel via repeat)."""
    f = jnp.tile(_BINOMIAL[:, None, None], (1, 3, 3))
    f = f / f.sum()
    return _depthwise_conv(x, f)


def upsample_2x(x, method: str = "bilinear"):
    """Bilinear (half-pixel centers == torch align_corners=False) 2x spatial
    upsample on the two dims before the channel dim."""
    b, *spatial, c = x.shape
    new = list(spatial)
    new[-2] *= 2
    new[-1] *= 2
    return jax.image.resize(x, (b, *new, c), method=method)


def upsample_2x_blur(x):
    """reference Upsample: bilinear 2x then binomial blur (:257-261)."""
    return blur_2d(upsample_2x(x))


def space_to_depth(x):
    """(b, 2h, 2w, c) → (b, h, w, 4c), channel-major ordering (c, s1, s2) to
    stay weight-port-compatible with the reference's
    rearrange('b c (h s1) (w s2) -> b (c s1 s2) h w') (reference: :291)."""
    return rearrange(x, "b (h s1) (w s2) c -> b h w (c s1 s2)", s1=2, s2=2)


def pixel_shuffle(x, r: int = 2):
    """(b, h, w, c·r²) → (b, hr, wr, c) with torch PixelShuffle channel
    ordering (c, r1, r2)."""
    return rearrange(x, "b h w (c r1 r2) -> b (h r1) (w r2) c", r1=r, r2=r)


def pixel_shuffle_temporal(x, r: int = 2):
    """(b, t, h, w, c·r) → (b, t·r, h, w, c); matches the reference's
    Rearrange('b (c p) t h w -> b c (t p) h w') (unet_upsampler.py:205)."""
    return rearrange(x, "b t h w (c p) -> b (t p) h w c", p=r)


def downsample_hf_shuttle(x, *, is_video: bool, skip_downsample: bool):
    """blur → high-frequency residual → 2x maxpool.

    Input has already been conv-projected by the caller.  Returns
    (downsampled, hf_residual) exactly like the reference Downsample
    (unet_upsampler.py:107-160).  When skip_downsample, returns x and an
    empty hf map (reference: :129-130 returns x[:, 0:0]).
    """
    if skip_downsample:
        return x, x[..., 0:0]

    blurred = blur_3d(x) if is_video else blur_2d(x)
    hf = x - blurred

    rank = x.ndim - 2  # spatial rank incl. time for video
    window = (1,) + (2,) * rank + (1,)
    pooled = lax.reduce_window(
        x, -jnp.inf, lax.max, window, window, "VALID"
    )
    return pooled, hf


def resize_image_to(images, size: int, method: str = "bilinear"):
    """Resize (b, ..., h, w, c) so that h == w == size."""
    shape = list(images.shape)
    shape[-3] = size
    shape[-2] = size
    return jax.image.resize(images, tuple(shape), method=method)


def interpolate_1d(x, length: int, method: str = "linear"):
    """(b, t, c) → (b, length, c) linear interpolation
    (reference: unet_upsampler.py:77-80)."""
    b, _, c = x.shape
    return jax.image.resize(x, (b, length, c), method=method)
