"""The base synthesis Generator: style-modulated pyramid with adaptive convs,
self/cross attention, and progressive multi-resolution RGB accumulation.

Parity target: `Generator` (reference: gigagan_pytorch/gigagan_pytorch.py:
947-1250).  Structural mechanisms preserved:
- learned 4x4 init block (:1016) + init adaptive conv
- channel schedule 2^(i+1)·dim_capacity clamped to dim_max, reversed,
  prepended with dim_latent (:1029-1040)
- ONE dense projection of the style vector to every layer's modulation +
  kernel-selection vector, consumed via an explicit indexed table
  (`ModTable`) instead of the reference's fragile python iterator
  (:1121-1122,1184-1186); exhaustion asserted at trace time (:1245)
- skip-layer squeeze-excitation push/pop gating (:1059-1062,1212-1218)
- per-stage [upsample → excite → 2×(adaptive conv + noise + leaky) →
  self-attn? → cross-attn? → to_rgb(no demod)], rgb accumulated then
  upsampled (:1207-1241)
- `return_all_rgbs` collects the per-stage accumulated rgbs for the
  multiscale discriminator (:1247-1248)

TPU notes: everything static-shaped; pixel noise comes from the 'noise' RNG
stream; style latents from the 'latent' stream when not supplied.
"""

from __future__ import annotations

from collections.abc import Mapping
from math import log2
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from gigagan_tpu import ops
from gigagan_tpu.models.conditioning import StyleNetwork, TextEncoder
from gigagan_tpu.models.layers import (
    AdaptiveConv,
    CrossAttentionBlock,
    Noise,
    PixelShuffleUpsample,
    SelfAttentionBlock,
    SqueezeExcite,
    Upsample,
    conv1x1,
    leaky_relu,
)
from gigagan_tpu.utils import ModTable, default, exists, is_power_of_two

Dtype = Any


class BaseGenerator(nn.Module):
    """Marker base class (reference: :944-945)."""


def _promote(module_or_dict, klass):
    # flax freezes dict attributes into FrozenDict → match any Mapping
    if isinstance(module_or_dict, Mapping):
        return klass(**module_or_dict)
    return module_or_dict


class Generator(BaseGenerator):
    image_size: int
    dim_capacity: int = 16
    dim_max: int = 2048
    channels: int = 3
    style_network: Optional[Union[StyleNetwork, Dict]] = None
    style_network_dim: Optional[int] = None
    text_encoder: Optional[Union[TextEncoder, Dict]] = None
    dim_latent: int = 512
    self_attn_resolutions: Tuple[int, ...] = (32, 16)
    self_attn_dim_head: int = 64
    self_attn_heads: int = 8
    self_attn_dot_product: bool = True
    self_attn_ff_mult: int = 4
    cross_attn_resolutions: Tuple[int, ...] = (32, 16)
    cross_attn_dim_head: int = 64
    cross_attn_heads: int = 8
    cross_attn_ff_mult: int = 4
    num_conv_kernels: int = 2
    num_skip_layers_excite: int = 0
    unconditional: bool = False
    pixel_shuffle_upsample: bool = False
    # Run thin-channel high-res stages in space-to-depth layout
    # (ops/s2d.py): exact algebra, identical parameters, dense TPU lanes.
    # Gated per stage to dim_out < 128 attention-free stages; disabled
    # under pixel_shuffle_upsample (its Dense upsampler is not yet
    # expressed in s2d form).
    s2d_trunk: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        assert is_power_of_two(self.image_size)

        self.style_net = _promote(self.style_network, StyleNetwork)
        self.text_enc = _promote(self.text_encoder, TextEncoder)

        assert exists(self.style_net) ^ exists(self.style_network_dim), (
            "style_network_dim must be given to the generator if "
            "StyleNetwork not passed in"
        )
        assert not (self.unconditional and exists(self.text_enc))
        assert not (
            self.unconditional
            and exists(self.style_net)
            and self.style_net.dim_text_latent > 0
        )
        assert self.unconditional or (
            exists(self.text_enc)
            and self.text_enc.dim == self.style_net.dim_text_latent
        ), (
            "the `dim_text_latent` on your StyleNetwork must equal the "
            "`dim` of the TextEncoder"
        )

        num_layers = int(log2(self.image_size) - 1)
        self.num_layers = num_layers

        is_adaptive = self.num_conv_kernels > 1
        dim_kernel_mod = self.num_conv_kernels if is_adaptive else 0

        # channel schedule (reference: :1029-1040)
        resolutions = [
            self.image_size // (2 ** i) for i in reversed(range(num_layers))
        ]
        dim_layers = [
            min(2 ** (i + 1) * self.dim_capacity, self.dim_max)
            for i in range(num_layers)
        ]
        dim_layers = list(reversed(dim_layers))
        dim_layers = [self.dim_latent, *dim_layers]
        dim_pairs = list(zip(dim_layers[:-1], dim_layers[1:]))
        self._resolutions = resolutions
        self._dim_pairs = dim_pairs

        split_dims = [self.dim_latent, dim_kernel_mod]

        self.init_block = self.param(
            "init_block", nn.initializers.normal(0.02),
            (4, 4, self.dim_latent),
        )
        self.init_conv = AdaptiveConv(
            self.dim_latent, kernel=3,
            num_conv_kernels=self.num_conv_kernels, dtype=self.dtype,
        )

        def make_upsample():
            if self.pixel_shuffle_upsample:
                # the reference's post-init kaiming pass overwrites ICNR
                # inside Generator (apply(init_) at :1124) → use_icnr=False
                return PixelShuffleUpsample(use_icnr=False, dtype=self.dtype)
            return Upsample()

        # Space-to-depth trunk gating: a stage runs in s2d layout when its
        # channels under-fill the TPU lanes and nothing at that stage needs
        # the normal representation (see `s2d_trunk`).
        s2d_flags = [
            self.s2d_trunk
            and not self.pixel_shuffle_upsample
            and ind > 0
            and dim_out < 128
            and resolution >= 32
            and resolution not in self.self_attn_resolutions
            and not (
                resolution in self.cross_attn_resolutions
                and not self.unconditional
            )
            for ind, ((dim_in, dim_out), resolution) in enumerate(
                zip(dim_pairs, resolutions)
            )
        ]
        self._s2d_flags = tuple(s2d_flags)

        stages = []
        for ind, ((dim_in, dim_out), resolution) in enumerate(
            zip(dim_pairs, resolutions)
        ):
            is_last = (ind + 1) == len(dim_pairs)
            is_first = ind == 0

            should_upsample = not is_first
            should_upsample_rgb = not is_last
            should_skip_layer_excite = (
                self.num_skip_layers_excite > 0
                and (ind + self.num_skip_layers_excite) < len(dim_pairs)
            )

            has_self_attn = resolution in self.self_attn_resolutions
            has_cross_attn = (
                resolution in self.cross_attn_resolutions
                and not self.unconditional
            )
            stage_s2d = s2d_flags[ind]

            squeeze_excite = None
            if should_skip_layer_excite:
                dim_skip_in, _ = dim_pairs[ind + self.num_skip_layers_excite]
                squeeze_excite = SqueezeExcite(
                    dim_skip_in, in_s2d=stage_s2d, dtype=self.dtype
                )

            stage = dict(
                s2d=stage_s2d,
                upsample=make_upsample() if should_upsample else None,
                upsample_rgb=make_upsample() if should_upsample_rgb else None,
                squeeze_excite=squeeze_excite,
                conv1=AdaptiveConv(
                    dim_out, kernel=3,
                    num_conv_kernels=self.num_conv_kernels,
                    in_s2d=stage_s2d, out_s2d=stage_s2d, dtype=self.dtype,
                ),
                noise1=Noise(in_s2d=stage_s2d, dtype=self.dtype),
                conv2=AdaptiveConv(
                    dim_out, kernel=3,
                    num_conv_kernels=self.num_conv_kernels,
                    in_s2d=stage_s2d, out_s2d=stage_s2d, dtype=self.dtype,
                ),
                noise2=Noise(in_s2d=stage_s2d, dtype=self.dtype),
                to_rgb=AdaptiveConv(
                    self.channels, kernel=1, num_conv_kernels=1,
                    demod=False, in_s2d=stage_s2d, out_s2d=stage_s2d,
                    dtype=self.dtype,
                ),
                self_attn=SelfAttentionBlock(
                    dim_out,
                    dim_head=self.self_attn_dim_head,
                    heads=self.self_attn_heads,
                    ff_mult=self.self_attn_ff_mult,
                    dot_product=self.self_attn_dot_product,
                    dtype=self.dtype,
                )
                if has_self_attn
                else None,
                cross_attn=CrossAttentionBlock(
                    dim_out,
                    dim_context=self.text_enc.dim,
                    dim_head=self.cross_attn_dim_head,
                    heads=self.cross_attn_heads,
                    ff_mult=self.cross_attn_ff_mult,
                    dtype=self.dtype,
                )
                if has_cross_attn
                else None,
            )
            stages.append(stage)

            split_dims.extend([
                dim_in,          # conv1 modulation
                dim_kernel_mod,  # conv1 kernel selection
                dim_out,         # conv2 modulation
                dim_kernel_mod,  # conv2 kernel selection
                dim_out,         # to_rgb modulation
                0,               # to_rgb has no kernel selection
            ])

        self.stages = stages
        self.style_embed_split_dims = tuple(split_dims)
        self.style_to_conv_modulations = conv1x1(
            sum(split_dims), dtype=self.dtype,
            name="style_to_conv_modulations",
        )

    @property
    def resolved_style_network_dim(self):
        return default(
            self.style_network_dim,
            self.style_net.dim if exists(self.style_net) else None,
        )

    def __call__(
        self,
        styles=None,
        noise=None,
        text_encodings=None,
        global_text_tokens=None,
        fine_text_tokens=None,
        text_mask=None,
        batch_size: int = 1,
        return_all_rgbs: bool = False,
    ):
        # conditioning (reference: :1156-1170); raw `texts` are embedded by
        # the trainer's CLIP adapter before entering the jitted graph
        if not self.unconditional:
            if exists(text_encodings):
                assert exists(self.text_enc)
                global_text_tokens, fine_text_tokens, text_mask = (
                    self.text_enc(text_encodings)
                )
            else:
                assert all(
                    map(exists,
                        (global_text_tokens, fine_text_tokens, text_mask))
                ), "text encodings or tokens must be passed in for " \
                   "conditional training"
        else:
            assert not any(
                map(exists,
                    (text_encodings, global_text_tokens, fine_text_tokens))
            )

        # styles (reference: :1174-1180).  Divergence: when conditional and
        # no explicit noise/batch_size, the latent batch follows the text
        # batch (the reference keeps batch_size=1 and crashes in the
        # style-network concat, :1178-1180 — callers must thread batch_size)
        if not exists(styles):
            assert exists(self.style_net)
            if not exists(noise):
                if exists(global_text_tokens):
                    batch_size = global_text_tokens.shape[0]
                key = self.make_rng("latent")
                noise = jax.random.normal(
                    key, (batch_size, self.resolved_style_network_dim),
                    self.dtype,
                )
            styles = self.style_net(noise, global_text_tokens)

        batch_size = styles.shape[0]

        # one projection to all per-layer modulations (reference: :1184-1186)
        conv_mods = ModTable(
            self.style_to_conv_modulations(styles),
            self.style_embed_split_dims,
        )

        x = jnp.broadcast_to(
            self.init_block.astype(self.dtype),
            (batch_size, 4, 4, self.dim_latent),
        )
        x = self.init_conv(x, mod=conv_mods.next(),
                           kernel_mod=conv_mods.next())

        rgb = jnp.zeros((batch_size, 4, 4, self.channels), x.dtype)

        excitations = [None] * self.num_skip_layers_excite
        rgbs = []
        x_s2d = rgb_s2d = False

        for stage in self.stages:
            stage_s2d = stage["s2d"]
            if stage_s2d and not x_s2d:
                # entering the s2d trunk: relayout the (dense, low-res)
                # inputs once; everything after stays in s2d layout
                x = ops.s2d.to_s2d(x)
                x_s2d = True
            elif not stage_s2d and x_s2d:  # defensive; rule is monotone
                x = ops.s2d.from_s2d(x)
                x_s2d = False

            if exists(stage["upsample"]):
                if stage_s2d:
                    x = ops.s2d.s2d_upsample_2x_blur(x)
                else:
                    x = stage["upsample"](x)

            if exists(stage["squeeze_excite"]):
                excitations.append(stage["squeeze_excite"](x))

            excite = excitations.pop(0) if excitations else None
            if exists(excite):
                if stage_s2d:
                    excite = ops.s2d.s2d_gate(excite)
                x = x * excite

            x = stage["conv1"](x, mod=conv_mods.next(),
                               kernel_mod=conv_mods.next())
            x = stage["noise1"](x)
            x = leaky_relu(x)

            x = stage["conv2"](x, mod=conv_mods.next(),
                               kernel_mod=conv_mods.next())
            x = stage["noise2"](x)
            x = leaky_relu(x)

            if exists(stage["self_attn"]):
                x = stage["self_attn"](x)

            if exists(stage["cross_attn"]):
                x = stage["cross_attn"](
                    x, context=fine_text_tokens, mask=text_mask
                )

            layer_rgb = stage["to_rgb"](x, mod=conv_mods.next(),
                                        kernel_mod=conv_mods.next())
            if stage_s2d and not rgb_s2d:
                rgb = ops.s2d.to_s2d(rgb)
                rgb_s2d = True
            rgb = rgb + layer_rgb
            # collected rgbs leave in normal layout (multiscale D input)
            rgbs.append(ops.s2d.from_s2d(rgb) if rgb_s2d else rgb)

            if exists(stage["upsample_rgb"]):
                if rgb_s2d:
                    rgb = ops.s2d.s2d_upsample_2x_blur(rgb)
                else:
                    rgb = stage["upsample_rgb"](rgb)

        conv_mods.assert_exhausted()

        if rgb_s2d:
            rgb = ops.s2d.from_s2d(rgb)

        if return_all_rgbs:
            return rgb, rgbs
        return rgb
