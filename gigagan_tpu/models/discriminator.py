"""Multiscale discriminator with batch-expanding scale reuse, predictor
heads, and the self-supervised auxiliary reconstruction decoder.

Parity targets (gigagan_pytorch/gigagan_pytorch.py):
- SimpleDecoder (:1254-1317): dropout → optional random patch subsample →
  upsample conv stack → MSE vs the input image
- Predictor (:1444-1498): text-modulated conv residual stack → 1x1 logits
- Discriminator (:1500-1838): conv pyramid to 4x4; at each multiscale input
  resolution the rgb is from_rgb-projected, ADDED to the stem and also
  CONCATENATED on the batch dim (scale invariance by reusing deeper weights
  as extra "scales", :1777-1789); predictor heads read only pre-expansion
  rows (:1803); aux recon reads scale-group-0 rows (:1814-1821 — the
  reference's dead line 1814 nets out to exactly this); final 4x4 logits
  reshaped to (scales, batch) (:1835-1837)

All shape growth is static at trace time: the multiscale resolutions are
config constants, so XLA sees a fixed set of per-stage batch sizes.
"""

from __future__ import annotations

from collections.abc import Mapping
from math import log2
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from gigagan_tpu import ops
from gigagan_tpu.models.conditioning import TextEncoder
from gigagan_tpu.models.layers import (
    KAIMING_CONV,
    AdaptiveConv,
    Downsample,
    S2DConv,
    SelfAttentionBlock,
    SqueezeExcite,
    conv1x1,
    conv3x3,
    leaky_relu,
)
from gigagan_tpu.ops.adaptive_conv import expand_batch
from gigagan_tpu.utils import (
    ModTable,
    default,
    exists,
    is_power_of_two,
    is_unique,
)

Dtype = Any


class SimpleDecoder(nn.Module):
    """Aux self-supervised reconstruction head (lightweight-gan trick)."""

    dims: Tuple[int, ...]
    patch_dim: int = 1
    frac_patches: float = 1.0
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap, orig_image, deterministic: bool = False):
        assert 0 < self.frac_patches <= 1.0
        dim = fmap.shape[-1]

        if not deterministic and self.dropout > 0.0:
            key = self.make_rng("dropout")
            keep = jax.random.bernoulli(key, 1.0 - self.dropout, fmap.shape)
            fmap = jnp.where(keep, fmap / (1.0 - self.dropout), 0.0)

        if self.frac_patches < 1.0:
            b, p = fmap.shape[0], self.patch_dim
            assert fmap.shape[1] % p == 0 and orig_image.shape[1] % p == 0
            fmap_p = rearrange(
                fmap, "b (p1 h) (p2 w) c -> b (p1 p2) h w c", p1=p, p2=p
            )
            img_p = rearrange(
                orig_image, "b (p1 h) (p2 w) c -> b (p1 p2) h w c", p1=p, p2=p
            )
            total = p * p
            num = max(int(self.frac_patches * total), 1)
            key = self.make_rng("dropout")
            scores = jax.random.uniform(key, (b, total))
            idx = jnp.argsort(scores, axis=-1)[:, :num]
            gather = lambda t: rearrange(
                jnp.take_along_axis(t, idx[:, :, None, None, None], axis=1),
                "b n h w c -> (b n) h w c",
            )
            fmap, orig_image = gather(fmap_p), gather(img_p)

        x = conv3x3(dim, dtype=self.dtype, name="conv_in")(fmap)
        all_dims = [dim, *self.dims]
        for i, (dim_in, dim_out) in enumerate(
            zip(all_dims[:-1], all_dims[1:])
        ):
            x = ops.resample.upsample_2x_blur(x)
            x = conv3x3(dim_out, dtype=self.dtype, name=f"conv_{i}")(x)
            x = leaky_relu(x)

        diff = x.astype(jnp.float32) - orig_image.astype(jnp.float32)
        return jnp.mean(diff * diff)


class Predictor(nn.Module):
    """Per-scale output head (reference: :1444-1498).  All convs in the stack
    share ONE (mod, kernel_mod) pair, as in the reference."""

    depth: int = 4
    num_conv_kernels: int = 2
    unconditional: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mod=None, kernel_mod=None):
        dim = x.shape[-1]
        residual = conv1x1(dim, dtype=self.dtype, name="residual_fn")(x)
        scale = 2 ** -0.5

        for i in range(self.depth):
            inner_residual = x
            for j in (1, 2):
                if self.unconditional:
                    x = conv3x3(dim, dtype=self.dtype,
                                name=f"conv{j}_{i}")(x)
                else:
                    x = AdaptiveConv(
                        dim, kernel=3,
                        num_conv_kernels=self.num_conv_kernels,
                        dtype=self.dtype, name=f"conv{j}_{i}",
                    )(x, mod=mod, kernel_mod=kernel_mod)
                x = leaky_relu(x)
            x = (x + inner_residual) * scale

        x = x + residual
        return conv1x1(1, dtype=self.dtype, name="to_logits")(x)


class DStageCore(nn.Module):
    """The remat-able heart of one discriminator stage: residual 1x1 conv +
    two 3x3 convs + optional self-attention.  Wrapped with nn.remat when
    `remat_stages` so the R1 double-backward recomputes stage-by-stage
    instead of holding every activation (HBM is the binding constraint)."""

    dim_out: int
    downsample: bool
    has_attn: bool
    attn_heads: int = 8
    attn_dim_head: int = 64
    ff_mult: int = 4
    dot_product: bool = False
    # space-to-depth trunk representations (ops/s2d.py): the stage input
    # arrives in s2d layout (s2d_in), the convs run in s2d layout (s2d),
    # and the residual leaves in the representation of the stage OUTPUT
    # (s2d_out — matches what Downsample produces for the next stage).
    # Parameter layout is identical in every mode.
    s2d: bool = False
    s2d_in: bool = False
    s2d_out: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.s2d:
            assert not self.has_attn, "s2d stages must not carry attention"
            assert self.downsample, "s2d gating excludes the last stage"
            residual = S2DConv(
                self.dim_out, kernel=1, stride=2,
                in_s2d=self.s2d_in, out_s2d=self.s2d_out,
                dtype=self.dtype, name="residual_conv",
            )(x)
            x = S2DConv(self.dim_out, kernel=3, in_s2d=self.s2d_in,
                        dtype=self.dtype, name="conv_block1")(x)
            x = leaky_relu(x)
            x = S2DConv(self.dim_out, kernel=3,
                        dtype=self.dtype, name="conv_block2")(x)
            x = leaky_relu(x)
            return x, residual
        if self.s2d_out:
            # normal-rep stage feeding an s2d-rep successor: the stride-2
            # residual leaves directly in the successor's layout
            assert self.downsample and not self.s2d_in
            residual = S2DConv(
                self.dim_out, kernel=1, stride=2, in_s2d=False,
                out_s2d=True, dtype=self.dtype, name="residual_conv",
            )(x)
        else:
            residual = nn.Conv(
                self.dim_out, (1, 1),
                strides=(2, 2) if self.downsample else (1, 1),
                kernel_init=KAIMING_CONV, dtype=self.dtype,
                name="residual_conv",
            )(x)
        x = conv3x3(self.dim_out, dtype=self.dtype, name="conv_block1")(x)
        x = leaky_relu(x)
        x = conv3x3(self.dim_out, dtype=self.dtype, name="conv_block2")(x)
        x = leaky_relu(x)
        if self.has_attn:
            x = SelfAttentionBlock(
                self.dim_out, heads=self.attn_heads,
                dim_head=self.attn_dim_head, ff_mult=self.ff_mult,
                dot_product=self.dot_product, dtype=self.dtype, name="attn",
            )(x)
        return x, residual


class Discriminator(nn.Module):
    image_size: int
    dim_capacity: int = 16
    dim_max: int = 2048
    channels: int = 3
    attn_resolutions: Tuple[int, ...] = (32, 16)
    attn_dim_head: int = 64
    attn_heads: int = 8
    self_attn_dot_product: bool = False
    ff_mult: int = 4
    text_encoder: Optional[Union[TextEncoder, Dict]] = None
    text_dim: Optional[int] = None
    filter_input_resolutions: bool = True
    multiscale_input_resolutions: Tuple[int, ...] = (64, 32, 16, 8)
    multiscale_output_skip_stages: int = 1
    aux_recon_resolutions: Tuple[int, ...] = (8,)
    aux_recon_patch_dims: Tuple[int, ...] = (2,)
    aux_recon_frac_patches: Tuple[float, ...] = (0.25,)
    aux_recon_fmap_dropout: float = 0.5
    resize_mode: str = "bilinear"
    num_conv_kernels: int = 2
    num_skip_layers_excite: int = 0
    unconditional: bool = False
    predictor_depth: int = 2
    remat_stages: bool = False
    # Run thin-channel high-res stages in space-to-depth layout
    # (ops/s2d.py): exact algebra, identical parameters, dense TPU lanes.
    # Gated per stage to dim_in < 128 plain conv pyramids (no attention /
    # predictor / recon decoder at that stage).
    s2d_trunk: bool = True
    dtype: Dtype = jnp.float32

    @property
    def resolved_multiscale_input_resolutions(self) -> Tuple[int, ...]:
        res = self.multiscale_input_resolutions
        if self.filter_input_resolutions:
            res = tuple(r for r in res if r < self.image_size)
        return res

    @property
    def resolved_multiscale_output_resolutions(self) -> Tuple[int, ...]:
        return tuple(
            r // (2 ** self.multiscale_output_skip_stages)
            for r in self.resolved_multiscale_input_resolutions
        )

    def real_images_to_rgbs(self, images):
        """Resize real images to every multiscale input resolution
        (reference: :1686-1687).  Pure function of config — usable outside
        apply()."""
        return [
            ops.resize_image_to(images, r, self.resize_mode)
            for r in self.resolved_multiscale_input_resolutions
        ]

    def setup(self):
        assert not (self.unconditional and exists(self.text_encoder))
        assert is_power_of_two(self.image_size)
        assert all(map(is_power_of_two, self.attn_resolutions))

        ms_input = self.resolved_multiscale_input_resolutions
        assert is_unique(ms_input)
        assert all(map(is_power_of_two, ms_input))
        assert all(r < self.image_size for r in ms_input)

        assert self.multiscale_output_skip_stages > 0
        ms_output = self.resolved_multiscale_output_resolutions
        assert all(r >= 4 for r in ms_output)
        assert all(r < self.image_size for r in ms_output)
        if len(ms_input) > 0:
            assert max(ms_input) > max(ms_output)
            assert min(ms_input) > min(ms_output)

        assert all(map(is_power_of_two, self.aux_recon_resolutions))
        assert (
            len(self.aux_recon_resolutions)
            == len(self.aux_recon_patch_dims)
            == len(self.aux_recon_frac_patches)
        )
        recon_patches = dict(
            zip(
                self.aux_recon_resolutions,
                zip(self.aux_recon_patch_dims, self.aux_recon_frac_patches),
            )
        )

        num_layers = int(log2(self.image_size) - 1)
        self.num_layers = num_layers

        resolutions = [self.image_size // (2 ** i) for i in range(num_layers)]
        dim_layers = [
            min(2 ** (i + 1) * self.dim_capacity, self.dim_max)
            for i in range(num_layers)
        ]
        dim_layers = [self.channels, *dim_layers]
        dim_last = dim_layers[-1]
        dim_pairs = list(zip(dim_layers[:-1], dim_layers[1:]))
        self._resolutions = resolutions

        dim_kernel_attn = (
            self.num_conv_kernels if self.num_conv_kernels > 1 else 0
        )

        upsample_dims = []
        predictor_dims = []
        stages = []

        # Space-to-depth trunk gating (see `s2d_trunk`): a stage runs its
        # convs in s2d layout when its input channels under-fill the TPU
        # lanes and nothing at that stage needs the normal representation.
        s2d_flags = [
            self.s2d_trunk
            and dim_in < 128
            and (ind + 1) < len(dim_pairs)  # never the last (4x4) stage
            and resolution >= 8
            and resolution not in self.attn_resolutions
            and resolution not in ms_output
            and resolution not in self.aux_recon_resolutions
            for ind, ((dim_in, dim_out), resolution) in enumerate(
                zip(dim_pairs, resolutions)
            )
        ]
        s2d_flags.append(False)  # sentinel: rep after the last stage
        self._s2d_flags = tuple(s2d_flags)

        for ind, ((dim_in, dim_out), resolution) in enumerate(
            zip(dim_pairs, resolutions)
        ):
            is_first = ind == 0
            is_last = (ind + 1) == len(dim_pairs)
            should_downsample = not is_last
            stage_s2d = s2d_flags[ind]
            # input rep: previous stage's Downsample emitted s2d iff this
            # stage is s2d (stage 0 reads raw images — always normal)
            stage_s2d_in = stage_s2d and not is_first
            stage_s2d_out = s2d_flags[ind + 1]
            should_skip_layer_excite = (
                not is_first
                and self.num_skip_layers_excite > 0
                and (ind + self.num_skip_layers_excite) < len(dim_pairs)
            )

            has_attn = resolution in self.attn_resolutions
            has_multiscale_output = resolution in ms_output
            has_aux_recon_decoder = resolution in self.aux_recon_resolutions
            upsample_dims.insert(0, dim_in)

            squeeze_excite = None
            if should_skip_layer_excite:
                dim_skip_in, _ = dim_pairs[
                    ind + self.num_skip_layers_excite
                ]
                squeeze_excite = SqueezeExcite(
                    dim_skip_in, in_s2d=stage_s2d_in, dtype=self.dtype
                )

            predictor = None
            if has_multiscale_output:
                predictor = Predictor(
                    depth=self.predictor_depth,
                    num_conv_kernels=self.num_conv_kernels,
                    unconditional=self.unconditional,
                    dtype=self.dtype,
                )
                predictor_dims.extend([dim_out, dim_kernel_attn])

            recon_decoder = None
            if has_aux_recon_decoder:
                patch_dim, frac_patches = recon_patches[resolution]
                recon_decoder = SimpleDecoder(
                    dims=tuple(upsample_dims),
                    patch_dim=patch_dim,
                    frac_patches=frac_patches,
                    dropout=self.aux_recon_fmap_dropout,
                    dtype=self.dtype,
                )

            core_klass = (
                nn.remat(DStageCore) if self.remat_stages else DStageCore
            )
            if stage_s2d_in:
                # injected rgb features must arrive in the stem's layout
                from_rgb = S2DConv(
                    dim_in, kernel=7, in_s2d=False, out_s2d=True,
                    dtype=self.dtype,
                )
            else:
                from_rgb = nn.Conv(
                    dim_in, (7, 7), padding="SAME",
                    kernel_init=KAIMING_CONV, dtype=self.dtype,
                )
            stages.append(dict(
                resolution=resolution,
                has_multiscale_input=resolution in ms_input,
                s2d=stage_s2d,
                s2d_in=stage_s2d_in,
                squeeze_excite=squeeze_excite,
                from_rgb=from_rgb,
                core=core_klass(
                    dim_out,
                    downsample=should_downsample,
                    has_attn=has_attn,
                    attn_heads=self.attn_heads,
                    attn_dim_head=self.attn_dim_head,
                    ff_mult=self.ff_mult,
                    dot_product=self.self_attn_dot_product,
                    s2d=stage_s2d,
                    s2d_in=stage_s2d_in,
                    s2d_out=stage_s2d_out,
                    dtype=self.dtype,
                ),
                predictor=predictor,
                recon_decoder=recon_decoder,
                downsample=Downsample(
                    dim_out, in_s2d=stage_s2d, out_s2d=stage_s2d_out,
                    dtype=self.dtype,
                )
                if should_downsample
                else None,
            ))

        self.stages = stages
        self.to_logits_conv = conv3x3(dim_last, dtype=self.dtype)
        self.to_logits_dense = conv1x1(1, dtype=self.dtype)

        # text conditioning for the predictor heads (reference: :1662-1675)
        assert self.unconditional or (
            exists(self.text_dim) ^ exists(self.text_encoder)
        )
        if not self.unconditional:
            self.text_enc = (
                TextEncoder(**self.text_encoder)
                if isinstance(self.text_encoder, Mapping)
                else self.text_encoder
            )
            self.resolved_text_dim = default(
                self.text_dim,
                self.text_enc.dim if exists(self.text_enc) else None,
            )
            self.predictor_dims = tuple(predictor_dims)
            self.text_to_conv_conditioning = conv1x1(
                sum(predictor_dims), dtype=self.dtype,
            )
        else:
            self.text_enc = None

    def __call__(
        self,
        images,
        rgbs,
        text_encodings=None,
        text_embeds=None,
        return_multiscale_outputs: bool = True,
        calc_aux_loss: bool = True,
        aux_recon_samples: Optional[int] = None,
        deterministic: bool = False,
    ):
        """aux_recon_samples: restrict the aux reconstruction loss to the
        first N samples (the trainer batches [real; fake] into one call and
        only reals carry the reconstruction target)."""
        if not self.unconditional:
            assert exists(text_encodings) ^ exists(text_embeds)
            if exists(text_encodings):
                assert exists(self.text_enc)
                text_embeds, *_ = self.text_enc(text_encodings)
            conv_mods = ModTable(
                self.text_to_conv_conditioning(text_embeds),
                self.predictor_dims,
            )
        else:
            assert not exists(text_embeds) and not exists(text_encodings)
            conv_mods = None

        x = images
        assert x.shape[1] == x.shape[2] == self.image_size
        batch = x.shape[0]

        rgbs_index = {t.shape[1]: t for t in rgbs} if exists(rgbs) else {}
        missing = set(self.resolved_multiscale_input_resolutions) - set(
            rgbs_index.keys()
        )
        assert not missing, (
            f"rgbs of necessary resolutions {sorted(missing)} not passed in"
        )

        multiscale_outputs = []
        aux_recon_losses = []

        # Scale-group bookkeeping.  The reference expands the batch dim
        # scale-MAJOR ('(s b)', :1789); we use batch-MAJOR row order
        # (sample i's groups are rows i*s .. i*s+s-1): under a data-sharded
        # mesh every group reshape then stays device-local, where scale-major
        # concat would force an all-to-all per multiscale stage.
        num_groups = 1

        def rows_of_first_groups(t, keep_groups):
            # rows of the first `keep_groups` scale groups of each sample
            t5 = t.reshape(batch, num_groups, *t.shape[1:])
            sub = t5[:, :keep_groups]
            return sub.reshape(batch * keep_groups, *t.shape[1:])

        # +1: the first stage's pixel-space input is never excited
        excitations = [None] * (self.num_skip_layers_excite + 1)

        for stage in self.stages:
            resolution = stage["resolution"]

            if exists(stage["squeeze_excite"]):
                excitations.append(
                    (stage["squeeze_excite"](x), num_groups)
                )

            excite_entry = excitations.pop(0) if excitations else None
            if exists(excite_entry):
                excite, excite_groups = excite_entry
                if stage["s2d_in"]:
                    # x is in space-to-depth layout: broadcast the
                    # per-original-channel gates over sub-positions
                    excite = ops.s2d.s2d_gate(excite)
                ratio = num_groups // excite_groups
                e5 = excite.reshape(batch, excite_groups, *excite.shape[1:])
                e5 = jnp.tile(e5, (1, ratio) + (1,) * (excite.ndim - 1))
                x = x * e5.reshape(batch * num_groups, *excite.shape[1:])

            groups_prev_stage = num_groups

            if stage["has_multiscale_input"]:
                rgb = rgbs_index[resolution]
                feats = stage["from_rgb"](rgb)
                feats = expand_batch(feats, x.shape[0])  # batch-major repeat
                x = x + feats
                # scale invariance: deeper weights reused as extra scales;
                # interleave per sample: (b, s, ...) ++ (b, s, ...) on axis 1
                x5 = x.reshape(batch, num_groups, *x.shape[1:])
                f5 = feats.reshape(batch, num_groups, *x.shape[1:])
                x = jnp.concatenate((x5, f5), axis=1).reshape(
                    batch * 2 * num_groups, *x.shape[1:]
                )
                num_groups *= 2

            x, residual = stage["core"](x)

            if exists(stage["predictor"]):
                mod = kernel_mod = None
                if not self.unconditional:
                    mod, kernel_mod = conv_mods.next(), conv_mods.next()
                if return_multiscale_outputs:
                    multiscale_outputs.append(
                        stage["predictor"](
                            rows_of_first_groups(x, groups_prev_stage),
                            mod=mod,
                            kernel_mod=kernel_mod,
                        )
                    )

            if exists(stage["downsample"]):
                x = stage["downsample"](x)

            x = (x + residual) * (2 ** -0.5)

            if exists(stage["recon_decoder"]) and calc_aux_loss:
                # scale-group 0 rows = the original (unexpanded) batch
                recon_rows = rows_of_first_groups(x, 1)
                recon_target = images
                if exists(aux_recon_samples):
                    recon_rows = recon_rows[:aux_recon_samples]
                    recon_target = recon_target[:aux_recon_samples]
                aux_recon_losses.append(
                    stage["recon_decoder"](
                        recon_rows, recon_target,
                        deterministic=deterministic,
                    )
                )

        if exists(conv_mods):
            conv_mods.assert_exhausted()

        logits = self.to_logits_conv(x)
        logits = logits.reshape(logits.shape[0], -1)
        logits = self.to_logits_dense(logits)[..., 0]
        # (b·s,) batch-major → (s, b) to keep the reference's output shape
        logits = rearrange(logits, "(b s) -> s b", b=batch)

        return logits, multiscale_outputs, aux_recon_losses
