"""Core layer modules (flax.linen), channels-last throughout.

Parity map to the reference (gigagan_pytorch/gigagan_pytorch.py):
- RMSNorm / ChannelRMSNorm (:224-242) — identical in NHWC, one module
- Blur/Upsample/PixelShuffleUpsample/Downsample (:246-293)
- SqueezeExcite (:297-307), Noise (:925-940), EqualLinear (:871-887)
- AdaptiveConv2DMod/1DMod (:315-507) → `AdaptiveConv` over `ops.adaptive_conv`
- SelfAttention (:513-594), CrossAttention (:596-655), TextAttention
  (:659-722), FeedForward (:726-740), blocks + Transformer (:744-804)

Design notes (TPU-first):
- 1x1 convs are `nn.Dense` on the trailing channel axis — identical math,
  and XLA fuses the surrounding elementwise ops into the matmul.
- attention runs through `ops.attention.attend`, which the Pallas flash
  kernel can replace per size; null-KV slots are concatenated here so the
  core stays shape-static.
- all params are fp32; `dtype` selects the bf16/fp32 compute type.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import linen as nn
from jax import lax

from gigagan_tpu import ops
from gigagan_tpu.utils import default, exists
from gigagan_tpu.utils.init import (
    kaiming_normal_leaky,
    pixel_shuffle_icnr_init,
)

Dtype = Any

KAIMING_CONV = kaiming_normal_leaky("conv")
KAIMING_DENSE = kaiming_normal_leaky("linear")


def leaky_relu(x, neg_slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope=neg_slope)


def l2norm(x, axis=-1, eps: float = 1e-12):
    """torch F.normalize semantics: x / max(||x||2, eps).

    The clamp sits INSIDE the sqrt: sqrt(0) has an infinite gradient, and
    exactly-zero rows (CLIP encodings are zero-masked past EOS) would turn
    the backward into 0*inf = NaN — this is how the step-1 bf16 NaN looked.
    """
    sum_sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis,
                     keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sum_sq, eps * eps))
    return (x / norm.astype(x.dtype)).astype(x.dtype)


def conv3x3(features: int, dtype=None, name=None):
    return nn.Conv(features, (3, 3), padding="SAME",
                   kernel_init=KAIMING_CONV, dtype=dtype, name=name)


def conv1x1(features: int, use_bias: bool = True, dtype=None, name=None):
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=KAIMING_DENSE, dtype=dtype, name=name)


class RMSNorm(nn.Module):
    """RMSNorm over the channel (last) axis; covers both the reference's
    RMSNorm and ChannelRMSNorm since we are channels-last."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        scale = self.dim ** 0.5
        return l2norm(x) * (scale * gamma).astype(x.dtype)


class Blur(nn.Module):
    """Binomial [1,2,1] blur module (reference: :246-255). Parameter-free."""

    def __call__(self, x):
        return ops.resample.blur_2d(x)


class Upsample(nn.Module):
    """Bilinear 2x + binomial blur (reference: :257-261). Parameter-free."""

    def __call__(self, x):
        return ops.resample.upsample_2x_blur(x)


class PixelShuffleUpsample(nn.Module):
    """1x1 conv to 4x channels, SiLU, pixel shuffle; ICNR init by default
    (reference: :263-287).  The reference Generator's post-hoc kaiming
    re-init overwrites ICNR (apply(init_) at :1124 runs after construction);
    pass use_icnr=False to reproduce that."""

    dim_out: Optional[int] = None
    use_icnr: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim_out = default(self.dim_out, x.shape[-1])
        init = pixel_shuffle_icnr_init(4) if self.use_icnr else KAIMING_DENSE
        x = nn.Dense(dim_out * 4, kernel_init=init, dtype=self.dtype,
                     name="conv")(x)
        x = jax.nn.silu(x)
        return ops.resample.pixel_shuffle(x, 2)


class _SpaceToDepthProj(nn.Module):
    """Dense over space-to-depth'd pixels, executed as ONE 2×2/stride-2
    convolution.  The param keeps the Dense layout — kernel (4·c, dim)
    with (c, s1, s2)-major rows matching `ops.resample.space_to_depth` —
    for checkpoint and reference-weight-port compatibility; the HWIO view
    is a (cheap, weight-sized) reshape at call time."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", KAIMING_DENSE, (4 * c, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        w = kernel.reshape(c, 2, 2, self.dim).transpose(1, 2, 0, 3)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class Downsample(nn.Module):
    """space-to-depth + 1x1 conv (reference: :289-293) — algebraically ONE
    2×2 stride-2 conv (the space-to-depth gather is absorbed into the conv
    window), dodging the interleave relayout copies (~4ms/iter of the
    round-3 no-GP device trace).

    ``in_s2d``/``out_s2d`` select the space-to-depth representations of the
    discriminator's thin-channel trunk (ops/s2d.py): with in_s2d the op IS
    the Dense it always was (the input already holds the space-to-depth'd
    pixels), and out_s2d additionally folds the NEXT stage's s2d relayout
    into the projection.  Param layout is identical in every mode."""

    dim: int
    in_s2d: bool = False
    out_s2d: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not self.in_s2d and not self.out_s2d:
            return _SpaceToDepthProj(self.dim, dtype=self.dtype,
                                     name="proj")(x)
        if not self.in_s2d:
            # normal input, s2d output: the 2x2/stride-2 conv view of the
            # projection with the next s2d relayout scattered in
            return _S2DProjEntry(self.dim, dtype=self.dtype, name="proj")(x)
        return _S2DProjDense(self.dim, out_s2d=self.out_s2d,
                             dtype=self.dtype, name="proj")(x)


class _S2DProjEntry(nn.Module):
    """Downsample projection from a normal-layout input producing
    space-to-depth-layout output (param layout identical to
    _SpaceToDepthProj)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", KAIMING_DENSE, (4 * c, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        w = kernel.reshape(c, 2, 2, self.dim).transpose(1, 2, 0, 3)
        return ops.s2d.s2d_conv(
            x.astype(self.dtype), w.astype(self.dtype), stride=2,
            in_s2d=False, out_s2d=True, bias=bias.astype(self.dtype),
        )


class _S2DProjDense(nn.Module):
    """Downsample projection when the input already holds space-to-depth'd
    pixels: a plain Dense (param layout identical to _SpaceToDepthProj —
    kernel (4c, dim)), optionally folding the next stage's s2d relayout."""

    dim: int
    out_s2d: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c4 = x.shape[-1]
        c = c4 // 4
        kernel = self.param("kernel", KAIMING_DENSE, (c4, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        # param rows are channel-major (c, s1, s2) — the reference's
        # space-to-depth order — while s2d activations are position-major
        # (s1, s2, c); reorder the weight-sized kernel, not the data
        w = kernel.reshape(c, 2, 2, self.dim).transpose(1, 2, 0, 3)
        w = w.reshape(c4, self.dim).astype(self.dtype)
        xd = x.astype(self.dtype)
        if self.out_s2d:
            return ops.s2d.dense_to_s2d(
                xd, w, bias=bias.astype(self.dtype)
            )
        y = jnp.einsum("bhwc,cd->bhwd", xd, w)
        return y + bias.astype(self.dtype)


class S2DConv(nn.Module):
    """Drop-in replacement for ``conv3x3``/1×1 ``nn.Conv`` that evaluates in
    space-to-depth layout (ops/s2d.py): the parameter keeps the ordinary
    (k, k, ci, co) HWIO layout (checkpoint/weight-port identical to
    nn.Conv), while the conv itself runs with the scattered kernel over
    dense-lane s2d activations.  ``in_s2d=False`` is the entry form taking
    a normal-layout input (e.g. raw images) straight into s2d output."""

    features: int
    kernel: int = 3
    stride: int = 1
    in_s2d: bool = True
    out_s2d: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1] // (4 if self.in_s2d else 1)
        kernel = self.param(
            "kernel", KAIMING_CONV,
            (self.kernel, self.kernel, ci, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return ops.s2d.s2d_conv(
            x.astype(self.dtype), kernel.astype(self.dtype),
            stride=self.stride, in_s2d=self.in_s2d, out_s2d=self.out_s2d,
            bias=bias.astype(self.dtype),
        )


class SqueezeExcite(nn.Module):
    """Global pool → MLP → sigmoid gate (reference: :297-307).  Returns the
    (b, 1, 1, dim_out) gate; the caller multiplies it into a deeper layer.
    ``in_s2d`` pools a space-to-depth-layout input per ORIGINAL channel."""

    dim_out: int
    reduction: int = 4
    dim_min: int = 32
    in_s2d: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim_hidden = max(self.dim_out // self.reduction, self.dim_min)
        if self.in_s2d:
            g = ops.s2d.s2d_global_pool(x, keepdims=False)
        else:
            g = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        g = conv1x1(dim_hidden, dtype=self.dtype, name="fc1")(g)
        g = jax.nn.silu(g)
        g = conv1x1(self.dim_out, dtype=self.dtype, name="fc2")(g)
        g = jax.nn.sigmoid(g)
        return g[:, None, None, :]


class Noise(nn.Module):
    """Per-pixel noise with learned per-channel weight (reference: :925-940).
    Explicit `noise` wins; otherwise draws from the 'noise' RNG stream.

    ``in_s2d``: x is in space-to-depth layout (position-major); the noise
    is still drawn in NORMAL pixel layout (identical RNG stream to the
    plain path) and viewed per sub-position, the weight broadcast per
    original channel."""

    in_s2d: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, noise=None):
        if not self.in_s2d:
            weight = self.param("weight", nn.initializers.zeros,
                                (x.shape[-1],))
            if not exists(noise):
                key = self.make_rng("noise")
                noise = jax.random.normal(key, (*x.shape[:-1], 1), x.dtype)
            return x + weight.astype(x.dtype) * noise
        b, g1, g2, c4 = x.shape
        c = c4 // 4
        weight = self.param("weight", nn.initializers.zeros, (c,))
        if not exists(noise):
            key = self.make_rng("noise")
            noise = jax.random.normal(key, (b, 2 * g1, 2 * g2, 1), x.dtype)
        noise_s2d = ops.s2d.to_s2d(noise)  # (b, g1, g2, 4)
        xv = x.reshape(b, g1, g2, 4, c)
        xv = xv + weight.astype(x.dtype) * noise_s2d[..., None]
        return xv.reshape(b, g1, g2, c4)


class EqualLinear(nn.Module):
    """StyleGAN equalized linear: weight ~ N(0,1), runtime lr_mul scaling
    (reference: :871-887)."""

    dim_out: int
    lr_mul: float = 1.0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (x.shape[-1], self.dim_out)
        )
        out = x @ (weight * self.lr_mul).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.dim_out,))
            out = out + (bias * self.lr_mul).astype(x.dtype)
        return out


class AdaptiveConv(nn.Module):
    """Style-modulated, sample-adaptive conv (2d or 1d by input rank).
    Thin module over `ops.adaptive_conv` (see there for the TPU-first
    factoring; reference: :315-507)."""

    dim_out: int
    kernel: int = 3
    demod: bool = True
    num_conv_kernels: int = 1
    in_s2d: bool = False
    out_s2d: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap, mod, kernel_mod=None):
        rank = 2 if self.in_s2d else fmap.ndim - 2
        n = max(self.num_conv_kernels, 1)
        ci = fmap.shape[-1] // (4 if self.in_s2d else 1)
        weights = self.param(
            "weights",
            kaiming_normal_leaky("bank"),
            (n, *((self.kernel,) * rank), ci, self.dim_out),
        )
        if n == 1:
            kernel_mod = None
        return ops.adaptive_conv(
            fmap.astype(self.dtype),
            weights,
            mod,
            kernel_mod,
            demod=self.demod,
            in_s2d=self.in_s2d,
            out_s2d=self.out_s2d,
        )

    @property
    def adaptive(self):
        return self.num_conv_kernels > 1


class SelfAttention(nn.Module):
    """GAN-stable self-attention on feature maps: L2-distance similarity with
    shared q/k by default, learned null KV (reference: :513-594)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    dot_product: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap):
        b, h, w, _ = fmap.shape
        inner = self.dim_head * self.heads

        fmap = RMSNorm(self.dim, dtype=self.dtype, name="norm")(fmap)

        q = conv1x1(inner, use_bias=False, dtype=self.dtype, name="to_q")(fmap)
        v = conv1x1(inner, use_bias=False, dtype=self.dtype, name="to_v")(fmap)
        if self.dot_product:
            k = conv1x1(inner, use_bias=False, dtype=self.dtype,
                        name="to_k")(fmap)
        else:
            k = q  # shared q/k space (ViTGAN)

        null_kv = self.param(
            "null_kv", nn.initializers.normal(1.0),
            (2, self.heads, self.dim_head),
        )

        # fused-heads layout end to end: the (b,x,y,h·d)→(b,h,n,d) einops
        # relayouts and the null-KV concat/pad cost more than the attention
        # math (round-3 trace) — ops.attend_fused keeps the projections'
        # native layout and handles the null token analytically
        q, k, v = (t.reshape(b, h * w, inner) for t in (q, k, v))
        out = ops.attend_fused(
            q, k, v,
            heads=self.heads,
            null_kv=null_kv,
            l2_dist=not self.dot_product,
            scale=self.dim_head ** -0.5,
        )
        out = out.reshape(b, h, w, inner)
        return conv1x1(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)


class CrossAttention(nn.Module):
    """Feature-map queries attend to text tokens (reference: :596-655)."""

    dim: int
    dim_context: int
    dim_head: int = 64
    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap, context, mask=None):
        b, h, w, _ = fmap.shape
        inner = self.dim_head * self.heads

        fmap = RMSNorm(self.dim, dtype=self.dtype, name="norm")(fmap)
        context = RMSNorm(self.dim_context, dtype=self.dtype,
                          name="norm_context")(context)

        q = conv1x1(inner, use_bias=False, dtype=self.dtype, name="to_q")(fmap)
        kv = conv1x1(inner * 2, use_bias=False, dtype=self.dtype,
                     name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        q = rearrange(q, "b x y (h d) -> b h (x y) d", h=self.heads)
        k, v = (
            rearrange(t, "b n (h d) -> b h n d", h=self.heads) for t in (k, v)
        )

        out = ops.attend(q, k, v, mask=mask, scale=self.dim_head ** -0.5)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", x=h, y=w)
        return conv1x1(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)


class TextAttention(nn.Module):
    """Token self-attention with null KV + key-padding mask
    (reference: :659-722)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, encodings, mask=None):
        b = encodings.shape[0]
        inner = self.dim_head * self.heads

        encodings = RMSNorm(self.dim, dtype=self.dtype, name="norm")(encodings)

        qkv = conv1x1(inner * 3, use_bias=False, dtype=self.dtype,
                      name="to_qkv")(encodings)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (
            rearrange(t, "b n (h d) -> b h n d", h=self.heads)
            for t in (q, k, v)
        )

        null_kv = self.param(
            "null_kv", nn.initializers.normal(1.0),
            (2, self.heads, self.dim_head),
        )
        nk, nv = (
            repeat(t, "h d -> b h 1 d", b=b).astype(q.dtype) for t in null_kv
        )
        k = jnp.concatenate((nk, k), axis=-2)
        v = jnp.concatenate((nv, v), axis=-2)

        if exists(mask):
            mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)

        out = ops.attend(q, k, v, mask=mask, scale=self.dim_head ** -0.5)
        out = rearrange(out, "b h n d -> b n (h d)")
        return conv1x1(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)


class FeedForward(nn.Module):
    """RMSNorm → proj → GELU(exact) → proj (reference: :726-740).  The
    channel_first variant collapses to the same module in NHWC."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim_hidden = int(self.dim * self.mult)
        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        x = conv1x1(dim_hidden, dtype=self.dtype, name="proj_in")(x)
        x = jax.nn.gelu(x, approximate=False)
        return conv1x1(self.dim, dtype=self.dtype, name="proj_out")(x)


class SelfAttentionBlock(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    dot_product: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = SelfAttention(
            self.dim, dim_head=self.dim_head, heads=self.heads,
            dot_product=self.dot_product, dtype=self.dtype, name="attn",
        )(x) + x
        x = FeedForward(self.dim, mult=self.ff_mult, dtype=self.dtype,
                        name="ff")(x) + x
        return x


class CrossAttentionBlock(nn.Module):
    dim: int
    dim_context: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, mask=None):
        x = CrossAttention(
            self.dim, dim_context=self.dim_context, dim_head=self.dim_head,
            heads=self.heads, dtype=self.dtype, name="attn",
        )(x, context, mask=mask) + x
        x = FeedForward(self.dim, mult=self.ff_mult, dtype=self.dtype,
                        name="ff")(x) + x
        return x


class Transformer(nn.Module):
    """Text transformer with final RMSNorm (reference: :780-804)."""

    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.depth):
            x = TextAttention(
                self.dim, dim_head=self.dim_head, heads=self.heads,
                dtype=self.dtype, name=f"attn_{i}",
            )(x, mask=mask) + x
            x = FeedForward(self.dim, mult=self.ff_mult, dtype=self.dtype,
                            name=f"ff_{i}")(x) + x
        return RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)


class RandomFixedProjection(nn.Module):
    """Frozen random projection (projected-GAN trick); stored as a flax
    variable in the 'buffers' collection so optimizers never see it
    (reference: :1319-1337)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from gigagan_tpu.utils.init import kaiming_normal_linear_fan_out

        init = kaiming_normal_linear_fan_out("linear")
        w = self.variable(
            "buffers", "fixed_weights",
            lambda: init(self.make_rng("params"), (x.shape[-1], self.dim_out)),
        )
        return x @ w.value.astype(x.dtype)
