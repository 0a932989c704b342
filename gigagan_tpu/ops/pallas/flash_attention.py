"""Pallas TPU fused attention for GigaGAN's short sequences (≤ ~4k tokens).

XLA materializes the (n, n) similarity and attention matrices in HBM for
both matmuls; at 32x32 feature maps that is ~270MB of traffic per attention
layer.  These kernels keep sim/attn entirely in VMEM: whole K/V per
(batch·head) resident (n_kv·d ≤ 4096·128 fits easily), q processed in row
tiles — no online-softmax machinery needed at these sizes.

Covers the reference's attention variants (attend.py:34-110 +
gigagan_pytorch.py:573-590):
- dot-product similarity
- L2-distance similarity (ViTGAN): sim = -(|q|² + |k|² - 2qk)·scale.  The
  |q|² term is constant per query row, so it cancels in the softmax — the
  kernel computes scale·(2qk - k²), mathematically identical attention.
- key-padding masks (True = attend)

Similarity is ONE MXU matmul plus ONE broadcast add: the scale is folded
into k (k_pre = coeff·k) and the L2 |k|² term, the key-padding mask, and
the lane-padding mask are folded into a single per-(batch·head) fp32 bias
row, both prepared by XLA (fused with the surrounding graph).  Moving the
where/scale/|k|² work out of the kernel measured 4x on the v5e device
trace (20.7 → 5.2us per grid step at (64,8,1024,64)).

Backward is a SINGLE-PASS custom VJP kernel: the forward saves the row
log-sum-exp (lse), so the backward rebuilds each attention tile with one
exp (no max/sum reductions), computes the softmax-Jacobian contraction
with the standard delta trick (delta = rowsum(g ⊙ out), computed in-kernel
on the sublane-major (chunk, d) tiles), and emits dq per q-tile while
dk/dv accumulate in registers with K/V resident — 5 MXU matmuls total
(sim, dattn, dq, dv, dk) with no raw-k operand (dq rides k_pre; for l2,
dk = coeff·(dsim'ᵀq) − k_pre⊙colsum(dsim')), and zero (n, n) HBM traffic
versus XLA's materialized backward.
Like the adaptive-conv kernel it is first-order; R1 double-backward paths
trace under `ops.adaptive_conv.pallas_disabled()` and fall back to XLA.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gigagan_tpu.ops.pallas.adaptive_conv import pallas_supported

# The flash VJP is FIRST-order (its backward contains raw pallas_calls), so
# R1 double-backward traces must opt out: steps.py wraps the vjp'd D apply
# in `flash_disabled()`.  Separate from the adaptive-conv override — the
# fused convs ARE differentiation-closed and stay on for GP steps.
_FLASH_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "gigagan_flash_override", default=None
)


@contextlib.contextmanager
def flash_disabled():
    token = _FLASH_OVERRIDE.set(False)
    try:
        yield
    finally:
        _FLASH_OVERRIDE.reset(token)


def flash_auto(q, k) -> bool:
    """Default dispatch: the fused kernel on TPU for the sizes where it
    measurably beats XLA (end-to-end device-trace A/B — DESIGN.md), unless
    a flash_disabled() trace is active.  Env override GIGAGAN_FLASH=0/1
    forces it globally (benchmarking knob)."""
    override = _FLASH_OVERRIDE.get()
    if override is not None:
        return bool(override)
    import os

    env = os.environ.get("GIGAGAN_FLASH")
    if env in ("0", "1"):
        return env == "1"
    return (
        pallas_supported()
        and q.shape[-1] <= 128
        and q.shape[-2] >= 256
        and k.shape[-2] >= 128
    )

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _q_chunks(nq, nk, budget_bytes=2 * 1024 * 1024):
    """q-row chunking so each (chunk, nk) fp32 intermediate fits budget
    (several are live at once in the backward kernels)."""
    rows = max(8, budget_bytes // (nk * 4))
    rows = min(rows, nq)
    while nq % rows != 0:
        rows -= 1
    return rows


# Kernel inputs are PREPARED on the XLA side (one fused pass each, done once
# per call): k_pre = coeff·k (coeff = 2·scale for L2-distance similarity,
# scale for dot), and a bias row per (batch·head):
#   bias = −scale·|k|²  (l2; the |q|² term is constant per row → cancels)
#        +  0 / NEG_INF  key-padding + lane-padding mask.
# Inside the kernel the whole similarity is then ONE MXU matmul plus ONE
# broadcast add — measured 4x faster than masking+demeaning in-kernel
# (which cost a where pass, a scale pass, and a per-chunk |k|² recompute).
# The backward needs no raw k either: dq = dsim'@k_pre, and for l2
# dk = coeff·(dsim'ᵀ@q) − k_pre⊙colsum(dsim') since coeff=2·scale.


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, chunk):
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]  # (1, nk) fp32
    nq = q_ref.shape[1]
    for r0 in range(0, nq, chunk):
        q = q_ref[0, r0 : r0 + chunk]
        sim = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        m = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        # row log-sum-exp, saved for the single-pass backward
        lse_ref[0, 0, r0 : r0 + chunk] = (m + jnp.log(s))[:, 0]
        # normalize AFTER the AV matmul: the divide runs on the (chunk, d)
        # output tile instead of the (chunk, nk) attention tile
        av = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, r0 : r0 + chunk] = (av / s).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, out_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, l2_dist, coeff, chunk):
    """Single pass: per q-tile rebuild attn from the saved lse (one exp),
    write the dq tile, accumulate dk/dv with K/V resident.  delta
    (rowsum(g⊙out)) is computed in-kernel on the (chunk, d) tiles — it
    lands sublane-major, dodging the lane→sublane relayout a precomputed
    (1, nq) input would need per chunk."""
    k = k_ref[0]  # k_pre = coeff·k
    v = v_ref[0]
    bias = bias_ref[0]
    nq = q_ref.shape[1]
    nk, d = k.shape

    dv_acc = jnp.zeros((nk, d), jnp.float32)
    dst_q = jnp.zeros((nk, d), jnp.float32)
    col = jnp.zeros((nk, 1), jnp.float32)
    for r0 in range(0, nq, chunk):
        q = q_ref[0, r0 : r0 + chunk]
        g = g_ref[0, r0 : r0 + chunk]
        sim = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        lse = lse_ref[0, 0, r0 : r0 + chunk]
        attn = jnp.exp(sim - lse[:, None])
        dattn = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # delta trick: rowsum(attn ⊙ dattn) == rowsum(g ⊙ out)
        delta = jnp.sum(
            g.astype(jnp.float32) * out_ref[0, r0 : r0 + chunk]
            .astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        dsim = attn * (dattn - delta)
        # dq = (coeff·dsim) @ k = dsim @ k_pre
        dq = jax.lax.dot_general(
            dsim.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, r0 : r0 + chunk] = dq.astype(dq_ref.dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            attn.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dst_q = dst_q + jax.lax.dot_general(
            dsim.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l2_dist:
            col = col + jnp.sum(dsim, axis=0)[:, None]

    dv_ref[0] = dv_acc.astype(dv_ref.dtype)
    # dot: dk = scale·(dsimᵀ q) = coeff·dst_q
    # l2:  dk_j = 2·scale·(Σᵢ dsimᵢⱼ qᵢ − (Σᵢ dsimᵢⱼ)·k_j)
    #          = coeff·dst_qⱼ − colⱼ·k_preⱼ   (coeff = 2·scale)
    if l2_dist:
        dk = coeff * dst_q - col * k.astype(jnp.float32)
    else:
        dk = coeff * dst_q
    dk_ref[0] = dk.astype(dk_ref.dtype)


def _prep(q, k, v, mask, l2_dist, scale):
    """Fold heads into batch; pad kv length to a lane multiple; prepare the
    kernel operands (see the kernel comment): k_pre = coeff·k and the fused
    (|k|² + mask + padding) bias row."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    coeff = 2.0 * scale if l2_dist else scale
    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)

    if l2_dist:
        k32 = kf.astype(jnp.float32)
        bias = -scale * jnp.sum(k32 * k32, axis=-1)  # (bh, nk)
    else:
        bias = jnp.zeros((b * h, nk), jnp.float32)
    if mask is not None:
        bias = jnp.where(jnp.repeat(mask, h, axis=0), bias, NEG_INF)
    k_pre = (kf.astype(jnp.float32) * coeff).astype(kf.dtype)

    nk_pad = _round_up(nk, 128)
    nq_pad = _round_up(nq, 8)
    if nk_pad != nk:
        k_pre = jnp.pad(k_pre, ((0, 0), (0, nk_pad - nk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_pad - nk), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, nk_pad - nk)),
                       constant_values=NEG_INF)
    if nq_pad != nq:
        qf = jnp.pad(qf, ((0, 0), (0, nq_pad - nq), (0, 0)))
    return qf, k_pre, vf, bias[:, None, :], (b, h, nq, nk, d), coeff


def _qkv_specs(bh, nq, nk, d):
    return [
        pl.BlockSpec((1, nq, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nk), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attend(q, k, v, mask, l2_dist=False, scale=None, interpret=None):
    """Fused attention; q (b,h,nq,d), k/v (b,h,nk,d), mask (b,nk) or None."""
    out, _, _ = _flash_fwd_impl(q, k, v, mask, l2_dist, scale, interpret)
    return out


def _flash_fwd_impl(q, k, v, mask, l2_dist, scale, interpret):
    interpret = (not pallas_supported()) if interpret is None else interpret
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qf, k_pre, vf, bias, (b, h, nq, nk, d), _ = _prep(
        q, k, v, mask, l2_dist, scale
    )
    bh, nq_pad, _ = qf.shape
    nk_pad = k_pre.shape[1]
    chunk = _q_chunks(nq_pad, nk_pad)
    # (bh, 1, nq) with full trailing dims keeps the block TPU-legal (the
    # last two dims must be (8,128)-divisible or equal the array dims)
    row_spec = pl.BlockSpec((1, 1, nq_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk),
        grid=(bh,),
        in_specs=_qkv_specs(bh, nq_pad, nk_pad, d),
        out_specs=(
            pl.BlockSpec((1, nq_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_pad, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, 1, nq_pad), jnp.float32),
        ),
        interpret=interpret,
    )(qf, k_pre, vf, bias)
    out_full = out[:, :nq].reshape(b, h, nq, d)
    return out_full, out, lse


def _flash_fwd(q, k, v, mask, l2_dist, scale, interpret):
    out_full, out_flat, lse = _flash_fwd_impl(
        q, k, v, mask, l2_dist, scale, interpret
    )
    return out_full, (q, k, v, mask, out_flat, lse)


def _flash_bwd(l2_dist, scale, interpret, residuals, g):
    q, k, v, mask, out_flat, lse = residuals
    interpret = (not pallas_supported()) if interpret is None else interpret
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qf, k_pre, vf, bias, (b, h, nq, nk, d), coeff = _prep(
        q, k, v, mask, l2_dist, scale
    )
    bh, nq_pad, _ = qf.shape
    nk_pad = k_pre.shape[1]
    gf = g.reshape(bh, nq, d)
    if nq_pad != nq:
        gf = jnp.pad(gf, ((0, 0), (0, nq_pad - nq), (0, 0)))
    gf = gf.astype(qf.dtype)

    chunk = _q_chunks(nq_pad, nk_pad)
    row_spec = pl.BlockSpec((1, 1, nq_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    qtile_spec = pl.BlockSpec((1, nq_pad, d), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    kvtile_spec = pl.BlockSpec((1, nk_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, l2_dist=l2_dist, coeff=coeff,
                          chunk=chunk),
        grid=(bh,),
        in_specs=_qkv_specs(bh, nq_pad, nk_pad, d)
        + [qtile_spec, qtile_spec, row_spec],
        out_specs=(qtile_spec, kvtile_spec, kvtile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_pad, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), qf.dtype),
        ),
        interpret=interpret,
    )(qf, k_pre, vf, bias, gf, out_flat, lse)

    dq = dq[:, :nq].reshape(b, h, nq, d).astype(q.dtype)
    dk = dk[:, :nk].reshape(b, h, nk, d).astype(k.dtype)
    dv = dv[:, :nk].reshape(b, h, nk, d).astype(v.dtype)
    # bool mask cotangent is float0
    dmask = (
        None if mask is None
        else np.zeros(mask.shape, dtype=jax.dtypes.float0)
    )
    return dq, dk, dv, dmask


flash_attend.defvjp(_flash_fwd, _flash_bwd)
