"""Conditioning: style mapping network and text encoder.

Parity targets:
- StyleNetwork (reference: gigagan_pytorch/gigagan_pytorch.py:889-921):
  normalize latents, optionally concat the CLIP-derived global text latent on
  the first layer, then depth× (EqualLinear lr_mul=0.1 → leaky_relu).
- TextEncoder (reference: :808-867): frozen CLIP per-token encodings →
  project_in → prepend learned global token → own Transformer → split back.

TPU design note: CLIP itself lives OUTSIDE the flax parameter tree (it is
frozen; the reference even `set_requires_grad_(clip, False)` at :826).  The
jitted graph takes precomputed `text_encodings` tensors; the trainer runs the
JAX CLIP (gigagan_tpu.models.clip) host-side-of-the-step on raw strings.
This also sidesteps a reference defect: `Generator.apply(init_)` at :1124
recursively re-initializes every nn.Linear *including the pretrained CLIP*.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from gigagan_tpu.models.layers import (
    EqualLinear,
    Transformer,
    conv1x1,
    l2norm,
    leaky_relu,
)
from gigagan_tpu.utils import exists

Dtype = Any


class StyleNetwork(nn.Module):
    dim: int
    depth: int
    lr_mul: float = 0.1
    dim_text_latent: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text_latent=None):
        x = l2norm(x)

        if self.dim_text_latent > 0:
            assert exists(text_latent), (
                "text_latent must be given when dim_text_latent > 0"
            )
            x = jnp.concatenate((x, text_latent.astype(x.dtype)), axis=-1)

        for i in range(self.depth):
            x = EqualLinear(self.dim, lr_mul=self.lr_mul, dtype=self.dtype,
                            name=f"linear_{i}")(x)
            x = leaky_relu(x)
        return x


class TextEncoder(nn.Module):
    """Consumes frozen-CLIP token encodings, returns
    (global_tokens (b,d), fine_text_tokens (b,n,d), mask (b,n))."""

    dim: int
    depth: int
    clip_dim: int = 512  # open_clip ViT-B/32 ln_final width
    dim_head: int = 64
    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text_encodings, mask=None):
        b = text_encodings.shape[0]

        # mask = any-nonzero per token (reference: :852); CLIP encodings are
        # zero-masked past EOS by the adapter
        if not exists(mask):
            mask = jnp.any(text_encodings != 0.0, axis=-1)

        x = text_encodings.astype(self.dtype)
        if self.clip_dim != self.dim:
            x = conv1x1(self.dim, dtype=self.dtype, name="project_in")(x)

        global_token = self.param(
            "learned_global_token", nn.initializers.normal(1.0), (self.dim,)
        )
        global_tokens = jnp.broadcast_to(
            global_token.astype(x.dtype), (b, self.dim)
        )

        x = jnp.concatenate((global_tokens[:, None, :], x), axis=1)
        mask_with_global = jnp.pad(mask, ((0, 0), (1, 0)),
                                   constant_values=True)

        x = Transformer(
            self.dim, self.depth, dim_head=self.dim_head, heads=self.heads,
            dtype=self.dtype, name="transformer",
        )(x, mask=mask_with_global)

        return x[:, 0], x[:, 1:], mask
