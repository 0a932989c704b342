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


def _torch_linear_axis(x, out_size: int, axis: int):
    """torch F.interpolate linear semantics along one axis:
    align_corners=False, antialias=False — source coordinate
    max(0, (i + 0.5)·in/out − 0.5), two-tap lerp with edge clamp."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    coords = jnp.maximum((jnp.arange(out_size) + 0.5) * scale - 0.5, 0.0)
    lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (coords - lo).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return jnp.take(x, lo, axis=axis) * (1 - w) + \
        jnp.take(x, hi, axis=axis) * w


def _torch_nearest_axis(x, out_size: int, axis: int):
    """torch F.interpolate mode='nearest' (the default mode — legacy
    floor(i·in/out) source index, NOT 'nearest-exact')."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    idx = jnp.floor(jnp.arange(out_size) * (in_size / out_size))
    idx = jnp.clip(idx.astype(jnp.int32), 0, in_size - 1)
    return jnp.take(x, idx, axis=axis)


def resize_image_to(images, size: int, method: str = "bilinear"):
    """Resize (b, ..., h, w, c) so that h == w == size, with torch
    `F.interpolate` semantics for strict reference parity:

    - 'bilinear': align_corners=False, antialias=False (the reference's
      `real_images_to_rgbs` / skip resizes, gigagan_pytorch.py:1683-1687,
      unet_upsampler.py:653-655).  NOTE torch does NOT anti-alias on
      downsample; `jax.image.resize` does — that divergence fed the D
      different multiscale reals than the reference would (PARITY.md #11).
    - 'nearest': torch's default F.interpolate mode (used by the reference
      for upsampler lowres conditioning :2210, sample grids :2623, and the
      CLIP adapter resize, open_clip.py:126).
    - 'antialias': the old behavior (jax.image.resize bilinear) — opt-in
      AA downsample, arguably better signal but not reference-parity.
    """
    if method in ("bilinear", "linear"):
        h_ax, w_ax = images.ndim - 3, images.ndim - 2
        return _torch_linear_axis(
            _torch_linear_axis(images, size, h_ax), size, w_ax
        )
    if method == "nearest":
        h_ax, w_ax = images.ndim - 3, images.ndim - 2
        return _torch_nearest_axis(
            _torch_nearest_axis(images, size, h_ax), size, w_ax
        )
    if method in ("antialias", "bilinear_antialias"):
        method = "bilinear"
    shape = list(images.shape)
    shape[-3] = size
    shape[-2] = size
    return jax.image.resize(images, tuple(shape), method=method)


def interpolate_1d(x, length: int, method: str = "linear"):
    """(b, t, c) → (b, length, c) linear interpolation with torch
    F.interpolate semantics (reference: unet_upsampler.py:77-80)."""
    if method == "linear":
        return _torch_linear_axis(x, length, 1)
    b, _, c = x.shape
    return jax.image.resize(x, (b, length, c), method=method)
