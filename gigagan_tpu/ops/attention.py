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
from jax import lax

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
    (≥256 query tokens — the 16×16 and larger feature-map attentions),
    XLA otherwise;
    R1 double-backward traces disable it via `flash_disabled()` because the
    kernel's VJP is first-order.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if use_flash is None:
        from gigagan_tpu.ops.pallas.flash_attention import flash_auto
        from gigagan_tpu.ops.pallas.flash_attention_so import _SO_MODE

        # second-order (reverse-over-reverse R1) traces: the split-heads
        # kernels are first-order, so flash-eligible calls here fall back
        # to XLA (attend_fused routes its callers to the SO kernels)
        use_flash = flash_auto(q, k) and not _SO_MODE.get()
        if use_flash:
            from gigagan_tpu.ops.pallas.flash_attention_hv import (
                _HV_MODE,
                flash_attend_hv,
            )

            if _HV_MODE.get():
                # grad-of-jvp-capable kernels (R1 forward-over-reverse)
                return flash_attend_hv(q, k, v, mask, l2_dist, scale)
    if use_flash:
        from gigagan_tpu.ops.pallas.flash_attention import flash_attend

        return flash_attend(q, k, v, mask, l2_dist, scale)

    out_dtype = q.dtype
    # Mirrors the flash kernel's algebra so the (n, n) tensors cost the
    # bare minimum (this path also runs the R1 double-backward, where
    # every saved pass is paid several times over):
    # - the |q|² term of the L2 similarity is constant per row → softmax-
    #   invariant → dropped (EXACT: softmax(z + c·1) = softmax(z), so
    #   values AND gradients are unchanged);
    # - scale folds into q, |k|² + the key mask fold into one key-bias row,
    #   so similarity is one matmul + one fused broadcast add;
    # - logits stay fp32 end-to-end (bf16's 8 mantissa bits round them
    #   ~4× coarser than torch-AMP fp16 would; since flash now owns every
    #   ≥256-token map, this path's (n, n) tensors are small and the
    #   former bf16-sim traffic saving is negligible — ADVICE r2); only
    #   the exp'd attention map is stored in the operand dtype;
    # - the softmax divide runs on the (i, d) output, not the (i, j) map.
    coeff = 2.0 * scale if l2_dist else scale
    q_s = (q.astype(jnp.float32) * coeff).astype(q.dtype)
    sim_dtype = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    sim = jnp.einsum("bhid,bhjd->bhij", q_s, k,
                     preferred_element_type=jnp.float32)
    bias = None
    if l2_dist:
        kf = k.astype(jnp.float32)
        bias = -scale * jnp.sum(kf * kf, axis=-1)  # (b, h, j)
    if exists(mask):
        mbias = jnp.where(mask, 0.0, NEG_INF)[:, None, :]  # (b, 1, j)
        bias = mbias if bias is None else bias + mbias
    if bias is not None:
        sim = sim + bias[..., None, :]

    m = lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
    e = jnp.exp(sim - m).astype(sim_dtype)
    s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    out = jnp.einsum("bhij,bhjd->bhid", e.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return (out / s).astype(out_dtype)


def attend_fused(q, k, v, *, heads: int, null_kv=None,
                 l2_dist: bool = False, scale=None, use_flash=None):
    """Attention in the network's native fused-heads layout: q (b, nq, H·d),
    k/v (b, nk, H·d), optional learned null_kv (2, H, d) → (b, nq, H·d).

    On TPU at flash sizes this dispatches to the fused-heads Pallas kernel
    (ops/pallas/flash_attention_fused.py): NO head transposes, NO null-KV
    concat/pad — the round-3 trace showed that layout glue costing more
    than the attention math.  Everywhere else (CPU tests, flash_disabled R1
    traces, sub-flash sizes, flash_hv_mode) it falls back to the exact
    same split-heads math as `attend`, so values match the reference
    semantics bit-for-bit with the unfused path."""
    d = q.shape[-1] // heads
    if scale is None:
        scale = d ** -0.5

    # the caller's explicit choice (None = auto): the fallback below must
    # forward it so an explicit use_flash=False (oracles, verify_kernels)
    # isn't re-dispatched to a flash kernel by attend's own heuristic,
    # while auto callers still get the split-heads flash path when the
    # fused kernel is inapplicable
    explicit_use_flash = use_flash

    if use_flash is None:
        from gigagan_tpu.ops.pallas.flash_attention import flash_auto
        from gigagan_tpu.ops.pallas.flash_attention_fused import head_group
        from gigagan_tpu.ops.pallas.flash_attention_hv import _HV_MODE
        from gigagan_tpu.ops.pallas.flash_attention_so import (
            _SO_MODE,
            flash_attend_so,
            flash_so_auto,
        )

        if flash_so_auto(q, k, heads):
            # reverse-over-reverse R1 trace: the differentiation-closed
            # kernel family (ops/pallas/flash_attention_so.py)
            return flash_attend_so(q, k, v, null_kv, heads, l2_dist, scale)
        # flash_auto expects (..., n, d)-shaped probes
        probe_q = q[..., :d]
        probe_k = k[..., :d]
        use_flash = (
            flash_auto(probe_q, probe_k)
            and not _HV_MODE.get()
            and not _SO_MODE.get()
            and head_group(heads, d) is not None
        )
    if use_flash:
        from gigagan_tpu.ops.pallas.flash_attention_fused import (
            flash_attend_fused,
        )

        return flash_attend_fused(
            q, k, v, null_kv, heads, l2_dist, scale
        )

    # fallback: split heads and reuse the (lean) XLA / hv paths
    b, nq, _ = q.shape
    nk = k.shape[1]

    def split(t, n):
        return jnp.transpose(
            t.reshape(b, n, heads, d), (0, 2, 1, 3)
        )

    qh, kh, vh = split(q, nq), split(k, nk), split(v, nk)
    if exists(null_kv):
        nk_tok = jnp.broadcast_to(
            null_kv[0][None, :, None, :], (b, heads, 1, d)
        ).astype(kh.dtype)
        nv_tok = jnp.broadcast_to(
            null_kv[1][None, :, None, :], (b, heads, 1, d)
        ).astype(vh.dtype)
        kh = jnp.concatenate((nk_tok, kh), axis=-2)
        vh = jnp.concatenate((nv_tok, vh), axis=-2)
    out = attend(qh, kh, vh, l2_dist=l2_dist, scale=scale,
                 use_flash=explicit_use_flash)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, nq, heads * d)


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


def linear_attend_fused(q, k, v, *, heads, scale=None):
    """`linear_attend` in the network's native fused-heads layout.

    q, k, v: (b, n, H·d).  The (b, x, y, H·d) → (b, H, n, d) einops
    relayout that the (b, h, n, d) form requires materializes a full
    transposed copy — at the 4K upsampler's 512² linear-attention stage
    that single transpose is a ~240 MB VMEM fusion, over the 128 MB
    physical VMEM of a v5e (the observed 1K→4K compile blocker).  Here
    every head is a LAST-dim slice and both contractions are native MXU
    forms on (n, d) panels: context = kᵀv contracts over n (the standard
    weight-gradient matmul shape — no transpose materialized) and
    out = q·context contracts over d.  Cost stays O(n·d²) per head.
    """
    b, n, hd = q.shape
    assert hd % heads == 0, (hd, heads)
    d = hd // heads
    if scale is None:
        scale = d ** -0.5
    out_dtype = q.dtype

    def head(t, i):
        return lax.slice_in_dim(t, i * d, (i + 1) * d, axis=-1)

    outs = []
    for i in range(heads):
        qh = jax.nn.softmax(head(q, i).astype(jnp.float32), axis=-1) * scale
        kh = jax.nn.softmax(head(k, i).astype(jnp.float32), axis=-2)
        vh = head(v, i)
        # (b, n, d)ᵀ(b, n, e) → (b, d, e): contraction over n
        context = lax.dot_general(
            kh.astype(vh.dtype), vh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # (b, n, d)·(b, d, e) → (b, n, e)
        out = lax.dot_general(
            qh.astype(out_dtype), context.astype(out_dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(out.astype(out_dtype))
    return jnp.concatenate(outs, axis=-1)
