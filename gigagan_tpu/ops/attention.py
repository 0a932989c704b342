"""Attention primitives: dot-product and L2-distance similarity, masking.

Covers the reference's three attention flavors with one functional core:
- GAN-stable L2-distance self-attention with shared q/k
  (reference: gigagan_pytorch/gigagan_pytorch.py:513-594)
- dot-product cross/text attention with key-padding masks (:596-722)
- the upsampler's linear attention (unet_upsampler.py:312-349)

Sequences here are short (≤ 32·32 image tokens + ≤ 77 text tokens), so a
single fused XLA softmax-attention is already compute-bound on the MXU; the
Pallas flash kernel in `gigagan_tpu.ops.pallas.flash_attention` is swapped in
for the hot sizes.  Null-KV slots are handled by the layer modules
(concatenated before the call), keeping this core shape-static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gigagan_tpu.utils import exists

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def attend(q, k, v, *, mask=None, l2_dist: bool = False, scale=None,
           use_flash=None):
    """Softmax attention.

    q: (b, h, i, d); k, v: (b, h, j, d); mask: (b, j) key-padding mask
    (True = attend).  Returns (b, h, i, d).

    l2_dist=True uses negative squared L2 distance as similarity (ViTGAN
    Lipschitz trick, reference: :576-580), expanded as 2qk − |q|² − |k|² so
    the dominant term stays a single MXU matmul.

    use_flash routes to the fused Pallas kernel
    (ops/pallas/flash_attention.py), which keeps sim/attn in VMEM and saves
    row log-sum-exp for a single-pass backward.  Default (None) dispatches
    automatically: flash on TPU at the sizes where it measurably beats XLA
    (1024+ query tokens — the 32x32 feature-map attentions), XLA otherwise;
    R1 double-backward traces disable it via `flash_disabled()` because the
    kernel's VJP is first-order.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if use_flash is None:
        from gigagan_tpu.ops.pallas.flash_attention import flash_auto

        use_flash = flash_auto(q, k)
    if use_flash:
        from gigagan_tpu.ops.pallas.flash_attention import flash_attend

        return flash_attend(q, k, v, mask, l2_dist, scale)

    out_dtype = q.dtype
    # matmuls stay in the operand dtype (bf16 under amp → full MXU rate,
    # exactly the flash kernel's contract: bf16 operands, fp32
    # accumulation); softmax statistics are always fp32.  bf16 products are
    # exact in fp32, so this matches the old upcast-to-fp32 path to
    # accumulation order.
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32)
    if l2_dist:
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=-1)  # (b, h, i)
        k_sq = jnp.sum(kf * kf, axis=-1)  # (b, h, j)
        sim = 2.0 * sim - q_sq[..., :, None] - k_sq[..., None, :]
    sim = sim * scale

    if exists(mask):
        sim = jnp.where(mask[:, None, None, :], sim, NEG_INF)

    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def linear_attend(q, k, v, *, scale=None):
    """Linear attention as used by the upsampler's LinearTransformer
    (reference: unet_upsampler.py:312-349).

    q, k, v: (b, h, n, d).  q softmaxes over d, k over n; the n·d×d context
    matrix keeps cost linear in sequence length.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out_dtype = q.dtype
    # softmax statistics in fp32; the two context matmuls run in the
    # operand dtype with fp32 accumulation (MXU rate under amp)
    qf = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * scale
    kf = jax.nn.softmax(k.astype(jnp.float32), axis=-2)

    context = jnp.einsum("bhnd,bhne->bhde", kf.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    out = jnp.einsum("bhde,bhnd->bhne", context.astype(q.dtype),
                     qf.astype(q.dtype), preferred_element_type=jnp.float32)
    return out.astype(out_dtype)
