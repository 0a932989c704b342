"""Sample-adaptive modulated convolution — the paper's core op, TPU-first.

The reference (gigagan_pytorch/gigagan_pytorch.py:315-507) implements this by
materializing a per-sample weight tensor (softmax-mixed over kernel banks,
style-modulated, demodulated) and running a cuDNN grouped conv with
``groups=batch``.  XLA has no grouped-conv-with-per-sample-weights, and
materializing ``b·o·i·k·k`` weights is HBM-bandwidth-hostile, so we use an
exact algebraic refactoring that maps to stock MXU convolutions instead:

1. **Input-channel modulation folds into the activations**:
   ``conv(x, W * (1+mod)[i]) == conv(x * (1+mod), W)``.
2. **Kernel-bank selection commutes with the conv** (linearity in weights):
   ``conv(x, Σₙ aₙ Wₙ) == Σₙ aₙ conv(x, Wₙ)``.  We run ONE conv with ``n·o``
   output channels (shared weights, fully batched on the MXU) and mix the
   outputs per-sample.
3. **Demodulation is a per-sample output-channel scale** computable from the
   kernel-bank Gram matrix ``G[n,m,i,o] = Σ_k Wₙ[k,i,o]·Wₘ[k,i,o]``:

   ``d²[b,o] = Σ_{n,m} a[b,n]·a[b,m] · Σᵢ G[n,m,i,o]·(1+mod[b,i])²``

No per-sample weights ever exist; everything is convs + small matmuls.

All feature maps are channels-last: 2d ``(b, h, w, c)``, 1d ``(b, t, c)``.
Weight banks are ``(n, *kernel_spatial, in, out)`` (HWIO per bank).
"""

from __future__ import annotations

import contextlib
import contextvars
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from gigagan_tpu.utils import exists

# Context override for the pallas path (debugging / A-B benchmarking).  The
# fused ops are closed under differentiation (ops/pallas/adaptive_conv.py),
# so even R1 double-backward steps stay on the fused path by default.
_PALLAS_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "gigagan_pallas_override", default=None
)


@contextlib.contextmanager
def pallas_disabled():
    token = _PALLAS_OVERRIDE.set(False)
    try:
        yield
    finally:
        _PALLAS_OVERRIDE.reset(token)


def _dim_numbers(rank: int):
    if rank == 2:
        return ("NHWC", "HWIO", "NHWC")
    if rank == 1:
        return ("NHC", "HIO", "NHC")
    raise ValueError(f"unsupported spatial rank {rank}")


def get_same_padding(kernel: int, dilation: int = 1) -> int:
    # reference: gigagan_pytorch.py:312-313 with stride == 1
    return dilation * (kernel - 1) // 2


def expand_batch(t, batch: int):
    """Repeat each row to match an expanded batch (batch-MAJOR group order).

    The multiscale discriminator grows the batch dim with scale groups
    (reference: gigagan_pytorch.py:365-374 handles this inside the conv with
    scale-major ``repeat('b -> (s b)')``).  We deliberately use batch-major
    ordering — row ``i*s + g`` is sample ``i``, group ``g`` — because under a
    data-sharded mesh every (b, s) <-> (b*s) reshape then keeps rows local to
    their device: the reference's scale-major layout would force an
    all-to-all at every multiscale stage.  Per-sample semantics (which is all
    the conv modulation depends on) are identical.
    """
    if t.shape[0] == batch:
        return t
    s, rem = divmod(batch, t.shape[0])
    assert rem == 0, f"cannot expand batch {t.shape[0]} to {batch}"
    return jnp.repeat(t, s, axis=0)


def kernel_gram(weights):
    """Gram matrix of the kernel banks over their spatial taps.

    weights: (n, *k_spatial, i, o) → (n, n, i, o).  Cost is weight-sized —
    negligible next to the conv itself — and XLA CSEs it across the two
    convs per generator stage.
    """
    n = weights.shape[0]
    flat = weights.reshape(n, -1, weights.shape[-2], weights.shape[-1])
    # broadcast-multiply-reduce, NOT einsum: XLA lowers the equivalent
    # einsum ("nkio,mkio->nmio") to a degenerate batch-n convolution plus
    # layout copies — measured ~1.8ms per call on v5e at (2,9,512,512)
    # where the arithmetic is worth ~0.05ms.  The broadcast form fuses to
    # a single multiply-reduce at weight-bandwidth cost.
    return jnp.sum(flat[:, None] * flat[None, :], axis=2)


def _conv(x, w, *, stride: int, dilation: int, rank: int, out_dtype=None):
    pad = get_same_padding(w.shape[0], dilation)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,) * rank,
        padding=((pad, pad),) * rank,
        rhs_dilation=(dilation,) * rank,
        dimension_numbers=_dim_numbers(rank),
        preferred_element_type=out_dtype or x.dtype,
    )


@partial(jax.custom_jvp, nondiff_argnums=(2,))
def _conv_f32_out(x, w, cfg):
    """`_conv` with fp32 output from bf16 operands (free on the MXU, which
    accumulates fp32 regardless).  Needs a custom rule because XLA's conv
    transpose cannot mix an fp32 cotangent with bf16 weights.

    Defined via custom_jvp (NOT custom_vjp) so the op stays closed under
    arbitrary further differentiation (ADVICE r4 medium: the custom_vjp
    form broke `jax.jvp`, crashing the opt-in gp_fwd_over_rev R1 path
    under amp with adaptive convs in the D trace).  Tangents run the
    ordinary operand-dtype conv and cast to fp32 — one benign rounding on
    derivatives only; transposing that cast+conv reproduces exactly the
    old backward (cotangent cast to operand dtype, operand-dtype conv
    transpose).  Reverse mode falls out by transposition; reverse-over-
    reverse and jvp-of-jvp recurse through this same rule."""
    stride, dilation, rank = cfg
    return _conv(x, w, stride=stride, dilation=dilation, rank=rank,
                 out_dtype=jnp.float32)


@_conv_f32_out.defjvp
def _conv_f32_out_jvp(cfg, primals, tangents):
    x, w = primals
    dx, dw = tangents
    stride, dilation, rank = cfg
    primal_out = _conv_f32_out(x, w, cfg)  # wrapped: stays rule-covered
    dout = (
        _conv(dx.astype(x.dtype), w, stride=stride, dilation=dilation,
              rank=rank).astype(jnp.float32)
        + _conv(x, dw.astype(w.dtype), stride=stride, dilation=dilation,
                rank=rank).astype(jnp.float32)
    )
    return primal_out, dout


def demod_scale(weights, scale_in, attn=None, eps: float = 1e-8):
    """Per-sample output-channel demodulation scale from the kernel-bank
    Gram matrix (see module docstring, step 3)."""
    n = weights.shape[0]
    b = scale_in.shape[0]
    gram = kernel_gram(weights.astype(jnp.float32))  # (n, n, i, o)
    s2 = scale_in * scale_in  # (b, i)
    if n > 1:
        gram_flat = gram.reshape(n * n, *gram.shape[2:])
        # (p*o, i) @ (i, b) matmul — tiny next to the conv
        t = jnp.einsum("pio,bi->bpo", gram_flat, s2)
        pair = jnp.einsum("bn,bm->bnm", attn, attn).reshape(b, n * n)
        d_sq = jnp.einsum("bp,bpo->bo", pair, t)
    else:
        d_sq = jnp.einsum("io,bi->bo", gram[0, 0], s2)
    return lax.rsqrt(jnp.maximum(d_sq, eps))


def adaptive_conv(
    x,
    weights,
    mod,
    kernel_mod=None,
    *,
    demod: bool = True,
    stride: int = 1,
    dilation: int = 1,
    eps: float = 1e-8,
    use_pallas=None,
    in_s2d: bool = False,
    out_s2d: bool = False,
):
    """Fused-by-construction adaptive modulated conv (2d or 1d).

    x:          (b, *spatial, i) feature map, channels last
    weights:    (n, *k_spatial, i, o) kernel banks
    mod:        (b or b/s, i) style modulation of input channels
    kernel_mod: (b or b/s, n) kernel-selection logits (None if n == 1)

    Matches the semantics of AdaptiveConv2DMod / AdaptiveConv1DMod
    (reference: gigagan_pytorch.py:344-409, 442-507) exactly.

    in_s2d / out_s2d: evaluate in space-to-depth layout (ops/s2d.py,
    position-major sub-channels) — the generator's thin-channel high-res
    stages.  Exact: the mod fold / bank mixing / demodulation are
    per-original-channel scales broadcast over sub-positions, and the conv
    runs the scattered kernel (rank 2, stride 1 only).
    """
    any_s2d = in_s2d or out_s2d
    rank = x.ndim - 2 if not in_s2d else 2
    assert weights.ndim == rank + 3
    if any_s2d:
        assert rank == 2 and stride == 1 and dilation == 1
    b = x.shape[0]
    n = weights.shape[0]
    adaptive = n > 1
    assert adaptive == exists(kernel_mod), (
        "kernel_mod must be given iff num_conv_kernels > 1"
    )

    compute_dtype = x.dtype
    spatial_axes = (slice(None),) + (None,) * rank

    mod = expand_batch(mod, b)
    scale_in = (mod + 1.0).astype(jnp.float32)  # (b, i)

    # (1) fold input-channel modulation into the activations
    scale_x = (
        jnp.tile(scale_in, (1, 4)) if in_s2d else scale_in
    )
    x = x * scale_x[spatial_axes + (slice(None),)].astype(compute_dtype)

    if any_s2d:
        return _adaptive_conv_s2d(
            x, weights, scale_in, kernel_mod, adaptive=adaptive,
            demod=demod, eps=eps, in_s2d=in_s2d, out_s2d=out_s2d,
        )

    # fused Pallas path: one kernel, 1x the conv FLOPs (the XLA path below
    # pays n x via the n*o-channel conv) — see ops/pallas/adaptive_conv.py
    spatial = x.shape[1] * x.shape[2] if rank == 2 else 0
    eligible = (
        rank == 2
        and weights.shape[1] == weights.shape[2] == 3
        and stride == 1
        and dilation == 1
        # ≤64²: whole-map blocks.  Larger maps run on row-chunked grids
        # (halo windows pre-expanded by XLA — ops/pallas/adaptive_conv.py::
        # _expand_row_windows), but the kernel only beats XLA there when
        # the output is ≥1 full lane tile — co < 128 pads to 128 lanes and
        # the write amplification loses to XLA's native conv (measured:
        # 3.1ms vs 2.0ms fwd at (16,256,256,32), v5e)
        and (
            spatial <= 64 * 64
            or (spatial <= 256 * 256 and weights.shape[-1] >= 128)
        )
    )
    if use_pallas is None:
        override = _PALLAS_OVERRIDE.get()
        if override is not None:
            use_pallas = override and eligible
        else:
            from gigagan_tpu.ops.pallas.adaptive_conv import (
                pallas_supported,
            )

            use_pallas = eligible and pallas_supported()
    if use_pallas:
        from gigagan_tpu.ops.pallas.adaptive_conv import (
            fused_adaptive_conv2d,
        )

        assert eligible, "pallas path requires 2d 3x3 stride-1 conv"
        if adaptive:
            kernel_mod = expand_batch(kernel_mod, b)
            attn = jax.nn.softmax(kernel_mod.astype(jnp.float32), axis=-1)
        else:
            attn = jnp.ones((b, 1), jnp.float32)
        if demod:
            d = demod_scale(weights, scale_in, attn, eps)
        else:
            d = jnp.ones((b, weights.shape[-1]), jnp.float32)
        return fused_adaptive_conv2d(x, weights, attn, d)

    # (2) one conv with n·o output channels, then per-sample bank mixing
    w_flat = jnp.moveaxis(weights, 0, -2)  # (*k, i, n, o)
    w_flat = w_flat.reshape(*weights.shape[1:-1], n * weights.shape[-1])
    # fp32 per-bank outputs when adaptive: dkmod is a tiny residual of
    # ~spatial·o cancelling terms, so bf16 ROUNDING of the per-bank conv
    # outputs (not accumulation — the MXU accumulates fp32 regardless)
    # blows its relative error up ~100× (measured 1.18 max-rel-err vs the
    # fp32 oracle on v5e; the fused Pallas kernel, which mixes banks in
    # fp32 inside the kernel, sat at 0.026).  The fp32 intermediate fuses
    # into the mixing einsum below, so the HBM cost is transient.
    w_c = w_flat.astype(compute_dtype)
    if adaptive and compute_dtype != jnp.float32:
        out = _conv_f32_out(x, w_c, (stride, dilation, rank))
    else:
        out = _conv(x, w_c, stride=stride, dilation=dilation, rank=rank)
    # out: (b, *spatial, n*o)

    if adaptive:
        kernel_mod = expand_batch(kernel_mod, b)
        attn = jax.nn.softmax(kernel_mod.astype(jnp.float32), axis=-1)  # (b, n)
        o = weights.shape[-1]
        out = out.reshape(*out.shape[:-1], n, o)
        out = jnp.einsum(
            "bn,b...no->b...o", attn, out,
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)
    else:
        attn = None

    # (3) demodulation as an output-channel scale from the Gram matrix
    if demod:
        d = demod_scale(weights, scale_in, attn, eps)
        out = out * d[spatial_axes + (slice(None),)].astype(compute_dtype)

    return out


def _adaptive_conv_s2d(
    x, weights, scale_in, kernel_mod, *, adaptive: bool, demod: bool,
    eps: float, in_s2d: bool, out_s2d: bool,
):
    """Space-to-depth evaluation of steps (2)+(3): one scattered conv with
    n·o output channels, per-sample bank mixing and demod broadcast over
    sub-positions (position-major channel order — ops/s2d.py)."""
    from gigagan_tpu.ops import s2d as s2d_ops

    compute_dtype = x.dtype
    b = x.shape[0]
    n, o = weights.shape[0], weights.shape[-1]

    w_flat = jnp.moveaxis(weights, 0, -2)  # (kh, kw, i, n, o)
    w_flat = w_flat.reshape(*weights.shape[1:-1], n * o)
    # fp32 per-bank outputs when adaptive, for dkmod fidelity (see the
    # dense path above)
    out = s2d_ops.s2d_conv(
        x, w_flat.astype(compute_dtype), in_s2d=in_s2d, out_s2d=out_s2d,
        out_dtype=jnp.float32 if adaptive else None,
    )
    sub = 4 if out_s2d else 1

    if adaptive:
        kernel_mod = expand_batch(kernel_mod, b)
        attn = jax.nn.softmax(kernel_mod.astype(jnp.float32), axis=-1)
        # out channels are (sub, n, o) position-major
        out = out.reshape(*out.shape[:-1], sub, n, o)
        out = jnp.einsum(
            "bn,b...no->b...o", attn, out,
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)
        out = out.reshape(*out.shape[:-2], sub * o)
    else:
        attn = None

    if demod:
        d = demod_scale(weights, scale_in, attn, eps)  # (b, o)
        d = jnp.tile(d, (1, sub))
        out = out * d[:, None, None, :].astype(compute_dtype)

    return out


def adaptive_conv_reference(
    x,
    weights,
    mod,
    kernel_mod=None,
    *,
    demod: bool = True,
    stride: int = 1,
    dilation: int = 1,
    eps: float = 1e-8,
):
    """Direct transcription of the reference semantics: materialize per-sample
    weights, vmap a conv per sample.  Exists purely as a numerics oracle for
    `adaptive_conv` (reference: gigagan_pytorch.py:344-409)."""
    rank = x.ndim - 2
    b = x.shape[0]
    n = weights.shape[0]

    mod = expand_batch(mod, b)

    if n > 1:
        kernel_mod = expand_batch(kernel_mod, b)
        attn = jax.nn.softmax(kernel_mod, axis=-1)
        w = jnp.einsum("bn,n...->b...", attn, weights)  # (b, *k, i, o)
    else:
        w = jnp.broadcast_to(weights[0], (b,) + weights.shape[1:])

    scale_in = mod + 1.0  # (b, i)
    w = w * scale_in[(slice(None),) + (None,) * rank + (slice(None), None)]

    if demod:
        sq = jnp.sum(w * w, axis=tuple(range(1, rank + 2)), keepdims=True)
        w = w * lax.rsqrt(jnp.maximum(sq, eps))

    conv1 = partial(_conv, stride=stride, dilation=dilation, rank=rank)
    return jax.vmap(lambda xb, wb: conv1(xb[None], wb)[0])(x, w)
