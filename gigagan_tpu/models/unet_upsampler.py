"""UNet super-resolution generator (image + video), the reference's second
generator family.

Parity target: unet_upsampler.py:447-898 (plus its building blocks :82-443):
- the first `log2(out)-log2(in)` down stages skip downsampling (:511-512,564)
  so the up path nets 2^k upsampling
- Downsample = conv (+ dirac-init temporal conv for video) → blur → maxpool,
  returning the HIGH-FREQUENCY residual (pre-blur − blurred) which is
  concatenated into the skip connection — the VideoGigaGAN "HF shuttle"
  (:107-160, 764-779)
- style-modulated ResnetBlocks consuming one global style→mod projection
  (:635-636, 698-700), exhaustion-checked (:875)
- full / linear attention per stage (:394-443), optional cross-attention
- up path: pixel-shuffle upsample (ICNR kept — unlike the base Generator the
  upsampler has no post-hoc re-init), rgb blur-upsample, double skip concat
  scaled 2^-0.5, progressive rgb accumulation from mid_to_rgb (:781-871)
- video: temporal AdaptiveConv1D resnet blocks + temporal attention +
  temporal (pixel-shuffle) upsampling, time folded into batch / space folded
  into batch (:64-73, 704-714, 748-762, 814-821, 854-868)
- `return_all_rgbs` keeps rgbs larger than the input and PREPENDS the true
  lowres input (:884-897); `allowable_rgb_resolutions` drives D config
  validation (:638-643)

Divergence (reference defect, documented): the reference builds the video
up-stage mod-table in construction order (temporal block before block1,
:610-620) but consumes in forward order (block1/block2 before temporal,
:844-868) — with skip-concat widths those slots have DIFFERENT dims, so the
reference's conditional-video path would mis-split.  We register mod slots in
consumption order.
"""

from __future__ import annotations

from collections.abc import Mapping
from math import log2
from typing import Any, Dict, List, Literal, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from gigagan_tpu import ops
from gigagan_tpu.models.conditioning import StyleNetwork, TextEncoder
from gigagan_tpu.models.generator import BaseGenerator, _promote
from gigagan_tpu.models.layers import (
    KAIMING_CONV,
    AdaptiveConv,
    CrossAttentionBlock,
    PixelShuffleUpsample,
    RMSNorm,
    conv1x1,
    conv3x3,
)
from gigagan_tpu.ops import attend_fused, linear_attend_fused
from gigagan_tpu.utils import ModTable, default, exists, is_power_of_two

Dtype = Any


def _fold_time(x):
    # (b, t, h, w, c) -> (b*t, h, w, c); explicit size (a -1 would divide by
    # zero on the empty HF maps of skip-downsample stages)
    return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])


def _split_time(x, batch):
    return x.reshape(batch, x.shape[0] // batch, *x.shape[1:])


def _fold_space(x):
    # (b, t, h, w, c) -> (b*h*w, t, c)
    b, t, h, w, c = x.shape
    x = jnp.moveaxis(x, 1, 3)  # (b, h, w, t, c)
    return x.reshape(b * h * w, t, c), (b, h, w)

def _unfold_space(x, dims):
    b, h, w = dims
    t, c = x.shape[-2:]
    x = x.reshape(b, h, w, t, c)
    return jnp.moveaxis(x, 3, 1)


class UpsamplerDownsample(nn.Module):
    """conv (+ dirac temporal conv) → blur → HF residual → maxpool
    (reference: unet_upsampler.py:82-160)."""

    dim_out: int
    skip_downsample: bool = False
    has_temporal_layers: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (b, h, w, c) image or (b, t, h, w, c) video
        is_video = x.ndim == 5
        assert not (is_video and not self.has_temporal_layers)
        batch = x.shape[0]

        if is_video:
            x = _fold_time(x)
        x = conv3x3(self.dim_out, dtype=self.dtype, name="conv2d")(x)
        if is_video:
            x = _split_time(x, batch)
            flat, dims = _fold_space(x)
            # dirac-init temporal conv: starts as identity (:100-103)
            flat = nn.Conv(
                self.dim_out, (3,), padding="SAME",
                kernel_init=_dirac_1d_init, dtype=self.dtype, name="conv1d",
            )(flat)
            x = _unfold_space(flat, dims)

        return ops.downsample_hf_shuttle(
            x, is_video=is_video, skip_downsample=self.skip_downsample
        )


def _dirac_1d_init(key, shape, dtype=jnp.float32):
    # (k, in, out): identity tap at the center
    k, cin, cout = shape
    w = jnp.zeros(shape, dtype)
    eye = jnp.eye(cin, cout, dtype=dtype)
    return w.at[k // 2].set(eye)


class TemporalUpsample(nn.Module):
    """2x linear interpolation along time + temporal blur
    (reference: :172-193)."""

    def __call__(self, x):
        assert x.ndim == 5
        b, t = x.shape[:2]
        flat, dims = _fold_space(x)
        flat = ops.resample.interpolate_1d(flat, t * 2)
        x = _unfold_space(flat, dims)
        return ops.resample.blur_temporal(x)


class PixelShuffleTemporalUpsample(nn.Module):
    """1x1x1 conv to 2x channels, SiLU, shuffle into time; ICNR-2 init
    (reference: :195-220)."""

    dim_out: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from gigagan_tpu.utils.init import pixel_shuffle_icnr_init

        assert x.ndim == 5
        dim_out = default(self.dim_out, x.shape[-1])
        x = nn.Dense(
            dim_out * 2, kernel_init=pixel_shuffle_icnr_init(2),
            dtype=self.dtype, name="conv",
        )(x)
        x = jax.nn.silu(x)
        return ops.resample.pixel_shuffle_temporal(x, 2)


class Block(nn.Module):
    """AdaptiveConv → RMSNorm → SiLU (reference: :238-270)."""

    dim_out: int
    num_conv_kernels: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mod=None, kernel_mod=None):
        x = AdaptiveConv(
            self.dim_out, kernel=3,
            num_conv_kernels=max(self.num_conv_kernels, 1),
            dtype=self.dtype, name="proj",
        )(x, mod=mod, kernel_mod=kernel_mod)
        x = RMSNorm(self.dim_out, dtype=self.dtype, name="norm")(x)
        return jax.nn.silu(x)


class ResnetBlock(nn.Module):
    """Two modulated Blocks + 1x1 residual (reference: :272-310).
    Consumes 4 mod-table slots: (mod1, kmod1, mod2, kmod2)."""

    dim_out: int
    num_conv_kernels: int = 0
    dtype: Dtype = jnp.float32

    @staticmethod
    def mod_dims(dim_in, dim_out, num_conv_kernels):
        k = num_conv_kernels if num_conv_kernels > 1 else 0
        return [dim_in, k, dim_out, k]

    @nn.compact
    def __call__(self, x, mods):
        h = Block(self.dim_out, self.num_conv_kernels, dtype=self.dtype,
                  name="block1")(x, mod=mods.next(), kernel_mod=mods.next())
        h = Block(self.dim_out, self.num_conv_kernels, dtype=self.dtype,
                  name="block2")(h, mod=mods.next(), kernel_mod=mods.next())
        if x.shape[-1] != self.dim_out:
            x = conv1x1(self.dim_out, dtype=self.dtype, name="res_conv")(x)
        return h + x


class LinearAttention2D(nn.Module):
    """Linear attention on feature maps (reference: :312-349)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        hidden = self.dim_head * self.heads
        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        qkv = conv1x1(hidden * 3, use_bias=False, dtype=self.dtype,
                      name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # fused-heads layout: the (b,x,y,H·d)→(b,H,n,d) relayout is a full
        # transposed copy — a ~240MB VMEM fusion at the 4K upsampler's
        # 512² stage (over v5e's 128MB physical VMEM; the 1K→4K compile
        # blocker).  linear_attend_fused slices heads off the last dim.
        q, k, v = (t.reshape(b, h * w, hidden) for t in (q, k, v))
        out = linear_attend_fused(
            q, k, v, heads=self.heads, scale=self.dim_head ** -0.5
        )
        out = out.reshape(b, h, w, hidden)
        out = conv1x1(self.dim, dtype=self.dtype, name="to_out")(out)
        return RMSNorm(self.dim, dtype=self.dtype, name="out_norm")(out)


class Attention2D(nn.Module):
    """Full softmax attention on feature maps (reference: :351-380); lowers
    to the shared flash-able `ops.attend`."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        hidden = self.dim_head * self.heads
        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        qkv = conv1x1(hidden * 3, use_bias=False, dtype=self.dtype,
                      name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # fused-heads layout (see models/layers.py SelfAttention)
        q, k, v = (t.reshape(b, h * w, hidden) for t in (q, k, v))
        out = attend_fused(
            q, k, v, heads=self.heads, scale=self.dim_head ** -0.5
        )
        out = out.reshape(b, h, w, hidden)
        return conv1x1(self.dim, dtype=self.dtype, name="to_out")(out)


class FeedForward2D(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        x = conv1x1(self.dim * self.mult, dtype=self.dtype, name="proj_in")(x)
        x = jax.nn.gelu(x, approximate=False)
        return conv1x1(self.dim, dtype=self.dtype, name="proj_out")(x)


class UpsamplerTransformer(nn.Module):
    """Full- or linear-attention transformer on fmaps (reference: :394-443)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    depth: int = 1
    ff_mult: int = 4
    linear: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        attn_klass = LinearAttention2D if self.linear else Attention2D
        for i in range(self.depth):
            x = attn_klass(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dtype=self.dtype, name=f"attn_{i}",
            )(x) + x
            x = FeedForward2D(self.dim, mult=self.ff_mult, dtype=self.dtype,
                              name=f"ff_{i}")(x) + x
        return x


class UnetUpsampler(BaseGenerator):
    dim: int
    image_size: int
    input_image_size: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    text_encoder: Optional[Union[TextEncoder, Dict]] = None
    style_network: Optional[Union[StyleNetwork, Dict]] = None
    style_network_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8, 16)
    channels: int = 3
    full_attn: Tuple[bool, ...] = (False, False, False, True, True)
    cross_attn: Tuple[bool, ...] = (False, False, False, True, True)
    flash_attn: bool = True
    self_attn_dim_head: int = 64
    self_attn_heads: int = 8
    self_attn_dot_product: bool = True
    self_attn_ff_mult: int = 4
    attn_depths: Tuple[int, ...] = (1, 1, 1, 1, 1)
    temporal_attn_depths: Tuple[int, ...] = (1, 1, 1, 1, 1)
    cross_attn_dim_head: int = 64
    cross_attn_heads: int = 8
    cross_ff_mult: int = 4
    has_temporal_layers: bool = False
    mid_attn_depth: int = 1
    num_conv_kernels: int = 2
    unconditional: bool = True
    skip_connect_scale: Optional[float] = None
    dtype: Dtype = jnp.float32

    @property
    def allowable_rgb_resolutions(self):
        """(reference: :638-643)"""
        input_res_base = int(log2(self.input_image_size))
        output_res_base = int(log2(self.image_size))
        return [2 ** p for p in range(input_res_base, output_res_base)]

    @property
    def can_upsample_video(self):
        return self.has_temporal_layers

    def setup(self):
        self.style_net = _promote(self.style_network, StyleNetwork)
        self.text_enc = _promote(self.text_encoder, TextEncoder)

        assert exists(self.style_net) ^ exists(self.style_network_dim)
        assert self.unconditional ^ exists(self.text_enc)
        assert not (
            self.unconditional
            and exists(self.style_net)
            and self.style_net.dim_text_latent > 0
        )
        assert self.unconditional or (
            self.text_enc.dim == self.style_net.dim_text_latent
        )
        assert is_power_of_two(self.image_size) and is_power_of_two(
            self.input_image_size
        )
        assert self.input_image_size < self.image_size

        num_layer_no_downsample = int(
            log2(self.image_size) - log2(self.input_image_size)
        )
        assert num_layer_no_downsample <= len(self.dim_mults), (
            "you need more stages in this unet for the level of upsampling"
        )

        init_dim = default(self.init_dim, self.dim)
        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        mid_dim = dims[-1]
        in_out = list(zip(dims[:-1], dims[1:]))

        full_attn = self.full_attn
        cross_attn = self.cross_attn
        assert len(full_attn) == len(self.dim_mults)

        self._skip_scale = default(self.skip_connect_scale, 2 ** -0.5)

        k = self.num_conv_kernels
        split_dims: List[int] = []

        def resnet(dim_in, dim_out):
            split_dims.extend(ResnetBlock.mod_dims(dim_in, dim_out, k))
            return ResnetBlock(dim_out, num_conv_kernels=k, dtype=self.dtype)

        self.init_conv = nn.Conv(
            init_dim, (7, 7), padding="SAME", kernel_init=KAIMING_CONV,
            dtype=self.dtype, name="init_conv",
        )

        downs = []
        skip_connect_dims = []
        for ind, ((dim_in, dim_out), layer_full, layer_cross, attn_depth,
                  t_attn_depth) in enumerate(
            zip(in_out, full_attn, cross_attn, self.attn_depths,
                self.temporal_attn_depths)
        ):
            should_not_downsample = ind < num_layer_no_downsample
            has_cross = not self.unconditional and layer_cross

            skip_connect_dims.append(dim_in)
            skip_connect_dims.append(
                dim_in + (dim_out if not should_not_downsample else 0)
            )

            stage = dict(
                block1=resnet(dim_in, dim_in),
                block2=resnet(dim_in, dim_in),
                cross_attn=CrossAttentionBlock(
                    dim_in, dim_context=self.text_enc.dim,
                    dim_head=self.self_attn_dim_head,
                    heads=self.self_attn_heads,
                    ff_mult=self.self_attn_ff_mult, dtype=self.dtype,
                )
                if has_cross
                else None,
                attn=UpsamplerTransformer(
                    dim_in, dim_head=self.self_attn_dim_head,
                    heads=self.self_attn_heads, depth=attn_depth,
                    linear=not layer_full, dtype=self.dtype,
                ),
                temporal_block=resnet(dim_in, dim_in)
                if self.has_temporal_layers
                else None,
                temporal_attn=UpsamplerTransformer(
                    dim_in, dim_head=self.self_attn_dim_head,
                    heads=self.self_attn_heads, depth=t_attn_depth,
                    dtype=self.dtype,
                )
                if self.has_temporal_layers
                else None,
                downsample=UpsamplerDownsample(
                    dim_out, skip_downsample=should_not_downsample,
                    has_temporal_layers=self.has_temporal_layers,
                    dtype=self.dtype,
                ),
            )
            downs.append(stage)
        self.downs = downs

        self.mid_block1 = resnet(mid_dim, mid_dim)
        self.mid_attn = UpsamplerTransformer(
            mid_dim, dim_head=self.self_attn_dim_head,
            heads=self.self_attn_heads, depth=self.mid_attn_depth,
            dtype=self.dtype,
        )
        self.mid_block2 = resnet(mid_dim, mid_dim)
        self.mid_to_rgb = conv1x1(self.channels, dtype=self.dtype,
                                  name="mid_to_rgb")

        ups = []
        for ind, ((dim_in, dim_out), layer_full, layer_cross, attn_depth,
                  t_attn_depth) in enumerate(
            zip(reversed(in_out), reversed(full_attn), reversed(cross_attn),
                reversed(self.attn_depths),
                reversed(self.temporal_attn_depths))
        ):
            has_cross = not self.unconditional and layer_cross

            # NOTE mod slots registered in CONSUMPTION order (block1, block2,
            # then temporal) — fixes the reference's construction/consumption
            # mismatch on the video path (see module docstring)
            stage = dict(
                upsample=PixelShuffleUpsample(dim_in, dtype=self.dtype),
                temporal_upsample=PixelShuffleTemporalUpsample(
                    dim_in, dtype=self.dtype
                )
                if self.has_temporal_layers
                else None,
                temporal_upsample_rgb=TemporalUpsample()
                if self.has_temporal_layers
                else None,
                to_rgb=conv1x1(self.channels, dtype=self.dtype),
                block1=resnet(dim_in + skip_connect_dims.pop(), dim_in),
                block2=resnet(dim_in + skip_connect_dims.pop(), dim_in),
                cross_attn=CrossAttentionBlock(
                    dim_in, dim_context=self.text_enc.dim,
                    dim_head=self.self_attn_dim_head,
                    heads=self.self_attn_heads, ff_mult=self.cross_ff_mult,
                    dtype=self.dtype,
                )
                if has_cross
                else None,
                attn=UpsamplerTransformer(
                    dim_in, dim_head=self.cross_attn_dim_head,
                    heads=self.self_attn_heads, depth=attn_depth,
                    linear=not layer_full, dtype=self.dtype,
                ),
                temporal_block=resnet(dim_in, dim_in)
                if self.has_temporal_layers
                else None,
                temporal_attn=UpsamplerTransformer(
                    dim_in, dim_head=self.self_attn_dim_head,
                    heads=self.self_attn_heads, depth=t_attn_depth,
                    dtype=self.dtype,
                )
                if self.has_temporal_layers
                else None,
            )
            ups.append(stage)
        self.ups = ups

        self.final_res_block = resnet(self.dim, self.dim)
        self.final_to_rgb = conv1x1(self.channels, dtype=self.dtype,
                                    name="final_to_rgb")

        self.style_embed_split_dims = tuple(split_dims)
        self.style_to_conv_modulations = conv1x1(
            sum(split_dims), dtype=self.dtype,
            name="style_to_conv_modulations",
        )

    # ------------------------------------------------------------- forward

    def _temporal(self, x, batch, block, attn_mod, mods):
        """Apply a temporal resnet block + temporal attention with space
        folded into batch (reference: :748-762)."""
        x = _split_time(x, batch)
        flat, dims = _fold_space(x)  # (b*h*w, t, c)
        flat = block(flat, mods)
        # attention over time: treat t as a 1-wide spatial map
        flat4 = flat[:, :, None, :]
        flat4 = attn_mod(flat4)
        flat = flat4[:, :, 0, :]
        x = _unfold_space(flat, dims)
        return _fold_time(x)

    def __call__(
        self,
        lowres_image=None,
        *,
        lowres_image_or_video=None,
        styles=None,
        noise=None,
        text_encodings=None,
        global_text_tokens=None,
        fine_text_tokens=None,
        text_mask=None,
        return_all_rgbs: bool = False,
        replace_rgb_with_input_lowres_image: bool = True,
    ):
        x = default(lowres_image, lowres_image_or_video)
        assert exists(x), "lowres_image(_or_video) must be given"
        shape = x.shape
        batch = shape[0]
        assert shape[-3] == shape[-2] == self.input_image_size

        input_is_video = x.ndim == 5
        assert not (input_is_video and not self.can_upsample_video), (
            "set has_temporal_layers=True to upsample video"
        )

        # conditioning (reference: :679-686)
        if not self.unconditional:
            if exists(text_encodings):
                global_text_tokens, fine_text_tokens, text_mask = (
                    self.text_enc(text_encodings)
                )
            else:
                assert all(
                    map(exists,
                        (global_text_tokens, fine_text_tokens, text_mask))
                )
        else:
            assert not any(
                map(exists,
                    (text_encodings, global_text_tokens, fine_text_tokens))
            )

        # styles
        if not exists(styles):
            assert exists(self.style_net)
            if not exists(noise):
                key = self.make_rng("latent")
                noise = jax.random.normal(
                    key, (batch, self.style_net.dim), self.dtype
                )
            styles = self.style_net(noise, global_text_tokens)

        mods = ModTable(
            self.style_to_conv_modulations(styles),
            self.style_embed_split_dims,
        )

        x = x.astype(self.dtype)
        if input_is_video:
            x = _fold_time(x)
        lowres_images = x  # folded, for the rgbs output

        x = self.init_conv(x)

        h = []
        for stage in self.downs:
            x = stage["block1"](x, mods)
            h.append(x)

            x = stage["block2"](x, mods)
            x = stage["attn"](x)

            if exists(stage["cross_attn"]):
                x = stage["cross_attn"](x, context=fine_text_tokens,
                                        mask=text_mask)

            if input_is_video:
                x = self._temporal(
                    x, batch, stage["temporal_block"],
                    stage["temporal_attn"], mods,
                )
            elif self.can_upsample_video:
                mods.skip(4)  # image input through a video-capable net

            skip_connect = x

            xs = _split_time(x, batch) if input_is_video else x
            xs, hf = stage["downsample"](xs)
            x = _fold_time(xs) if input_is_video else xs
            hf = _fold_time(hf) if input_is_video else hf

            skip_connect = jnp.concatenate((skip_connect, hf), axis=-1)
            h.append(skip_connect)

        x = self.mid_block1(x, mods)
        x = self.mid_attn(x)
        x = self.mid_block2(x, mods)

        rgbs = []
        rgb = self.mid_to_rgb(x)
        rgbs.append(rgb)

        for stage in self.ups:
            x = stage["upsample"](x)
            rgb = ops.resample.upsample_2x_blur(rgb)

            if input_is_video:
                xv = _split_time(x, batch)
                rgbv = _split_time(rgb, batch)
                xv = stage["temporal_upsample"](xv)
                rgbv = stage["temporal_upsample_rgb"](rgbv)
                x = _fold_time(xv)
                rgb = _fold_time(rgbv)

            res1 = h.pop() * self._skip_scale
            res2 = h.pop() * self._skip_scale

            # skip shapes can mismatch when a no-downsample stage meets the
            # upsampled path (reference: :824-843)
            if x.shape[0] != res1.shape[0] or x.shape[1:3] != res1.shape[1:3]:
                target = x.shape[1]
                res1 = ops.resize_image_to(res1, target)
                res2 = ops.resize_image_to(res2, target)
                if x.shape[0] != res1.shape[0]:
                    reps = x.shape[0] // res1.shape[0]
                    res1 = jnp.repeat(res1, reps, axis=0)
                    res2 = jnp.repeat(res2, reps, axis=0)

            x = jnp.concatenate((x, res1), axis=-1)
            x = stage["block1"](x, mods)

            x = jnp.concatenate((x, res2), axis=-1)
            x = stage["block2"](x, mods)

            if exists(stage["cross_attn"]):
                x = stage["cross_attn"](x, context=fine_text_tokens,
                                        mask=text_mask)

            x = stage["attn"](x)

            if input_is_video:
                x = self._temporal(
                    x, batch, stage["temporal_block"],
                    stage["temporal_attn"], mods,
                )
            elif self.can_upsample_video:
                mods.skip(4)

            rgb = rgb + stage["to_rgb"](x)
            rgbs.append(rgb)

        x = self.final_res_block(x, mods)
        mods.assert_exhausted()

        rgb = rgb + self.final_to_rgb(x)

        if input_is_video:
            rgb = _split_time(rgb, batch)

        if not return_all_rgbs:
            return rgb

        # keep rgbs strictly larger than the input; prepend the true lowres
        # input as the smallest rgb (reference: :884-897)
        rgbs = [t for t in rgbs if t.shape[-2] > shape[-2]]
        rgbs = [lowres_images, *rgbs]
        if input_is_video:
            rgbs = [_split_time(t, batch) for t in rgbs]

        return rgb, rgbs
